"""PyMOL visualization of generated pharmacophores.

Capability parity with the reference's PyMOL script: given a pocket
directory produced by test.py / generate_pharmacophores.py, it loads
pocket.pdb, optionally the reference protein/ligand pair, and every
generated `.xyz` pharmacophore as small spheres, then groups and colors the
centers by pharmacophore type. Types are recovered from the placeholder
elements the xyz writer emits (pharmaforge_tpu.constants.TYPE_IDX_TO_ELEM),
so the selection table is derived from the canonical constants instead of
being hardcoded.

Run inside PyMOL:  pymol -cq pymol_generated.py -- --pocket_dir <dir>
"""

import argparse
from pathlib import Path

from pharmaforge_tpu.constants import PH_IDX_TO_TYPE, TYPE_IDX_TO_ELEM

SPHERE_SCALE = 0.4

TYPE_COLORS = {
    "Aromatic": "purple",
    "HydrogenDonor": "white",
    "HydrogenAcceptor": "orange",
    "PositiveIon": "blue",
    "NegativeIon": "red",
    "Hydrophobic": "green",
}


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pocket_dir", type=str, default=None,
                   help="pocket directory that contains the generated "
                        "pharmacophores")
    p.add_argument("--load_reference", action="store_true",
                   help="load reference protein and ligand")
    return p.parse_args(argv)


def load_reference_files(cmd, pocket_dir: Path) -> None:
    """The reference_files subdir holds at most one receptor PDB and one
    ligand SDF; register them under stable object names."""
    by_suffix = {".pdb": "reference_protein", ".sdf": "reference_ligand"}
    for path in sorted((pocket_dir / "reference_files").iterdir()):
        obj = by_suffix.get(path.suffix)
        if obj is not None:
            cmd.load(str(path), obj)


def load_pharmacophores(cmd, pocket_dir: Path) -> str:
    """Load every generated .xyz as an unbonded sphere cloud; return a PyMOL
    selection expression covering all of them."""
    names = []
    for xyz in pocket_dir.glob("*.xyz"):
        cmd.load(str(xyz))
        names.append(xyz.stem)
        cmd.unbond(xyz.stem, xyz.stem)
        cmd.show_as("spheres", xyz.stem)
    return " or ".join(names)


def style_by_type(cmd, pharm_sel: str) -> None:
    """One named selection + color per pharmacophore type, keyed off the
    placeholder element each type maps to in the xyz output."""
    cmd.set("sphere_scale", SPHERE_SCALE, pharm_sel)
    for ph_type, elem in zip(PH_IDX_TO_TYPE, TYPE_IDX_TO_ELEM):
        cmd.select(ph_type, f"elem {elem} and ({pharm_sel})")
        cmd.color(TYPE_COLORS[ph_type], ph_type)


def main(argv=None):
    from pymol import cmd  # only importable inside a PyMOL session

    args = parse_args(argv)
    pocket_dir = Path(args.pocket_dir)
    if args.load_reference:
        load_reference_files(cmd, pocket_dir)
    cmd.load(str(pocket_dir / "pocket.pdb"), "pocket")
    pharm_sel = load_pharmacophores(cmd, pocket_dir)
    if pharm_sel:
        style_by_type(cmd, pharm_sel)


if __name__ == "__main__":
    main()
