"""PyMOL visualization of generated pharmacophores.

Parity with the reference pymol_generated.py: loads pocket.pdb, optional
reference protein/ligand, and every generated `.xyz` pharmacophore in a
pocket directory as colored spheres (one color per pharmacophore type via
the placeholder-element mapping in pharmaforge_tpu.constants).

Run inside PyMOL:  pymol -cq pymol_generated.py -- --pocket_dir <dir>
"""

import argparse
from pathlib import Path

from pymol import cmd  # noqa: F401  (only importable inside PyMOL)

p = argparse.ArgumentParser()
p.add_argument('--pocket_dir', type=str, default=None,
               help='pocket directory that contains the generated pharmacophores')
p.add_argument('--load_reference', action='store_true',
               help='load reference protein and ligand')
args = p.parse_args()

parent_dir = Path(args.pocket_dir)
if args.load_reference:
    reference_dir = parent_dir / 'reference_files'
    for file in sorted(reference_dir.iterdir()):
        if file.suffix == '.pdb':
            cmd.load(str(file), 'reference_protein')
        elif file.suffix == '.sdf':
            cmd.load(str(file), 'reference_ligand')

cmd.load(str(parent_dir / 'pocket.pdb'), 'pocket')

ph_files = [file for file in parent_dir.glob('*.xyz')]
ph_pymol_names = [file.stem for file in ph_files]
all_ph_sel_str = ' or '.join(ph_pymol_names)

for ph_file, ph_pymol_name in zip(ph_files, ph_pymol_names):
    cmd.load(str(ph_file))
    cmd.unbond(ph_pymol_name, ph_pymol_name)
    cmd.show_as('spheres', ph_pymol_name)

cmd.set('sphere_scale', 0.4, all_ph_sel_str)

# element -> pharmacophore type selections (see constants.TYPE_IDX_TO_ELEM)
cmd.select('PositiveIon', f'elem N and ({all_ph_sel_str})')
cmd.select('Hydrophobic', f'elem C and ({all_ph_sel_str})')
cmd.select('NegativeIon', f'elem O and ({all_ph_sel_str})')
cmd.select('Aromatic', f'elem P and ({all_ph_sel_str})')
cmd.select('HydrogenAcceptor', f'elem F and ({all_ph_sel_str})')
cmd.select('HydrogenDonor', f'elem S and ({all_ph_sel_str})')

pymol_color_map = {
    'Aromatic': 'purple',
    'Hydrophobic': 'green',
    'HydrogenAcceptor': 'orange',
    'HydrogenDonor': 'white',
    'PositiveIon': 'blue',
    'NegativeIon': 'red',
}

for ph_type, color in pymol_color_map.items():
    cmd.color(color, ph_type)
