"""Inference CLI: generate pharmacophores for an arbitrary receptor.

Flag-for-flag parity with the reference generate_pharmacophores.py: defines
the pocket from a reference-ligand SDF (residues within `pocket_cutoff`) or
an explicit chain:resid list, builds the dense pocket arrays, loads a trained
checkpoint, runs batched reverse diffusion, and writes xyz outputs +
pocket.pdb + timing artifacts. Receptor parsing happens host-side with
biopython/rdkit when installed, falling back to the dependency-free
PDB/SDF parsers in `pharmaforge_tpu.preprocessing.structure` (same
selection semantics) so the CLI runs end-to-end on a bare TPU-VM image;
the diffusion chain is one jitted lax.scan.
"""

import argparse
import pickle
import shutil
import time
from pathlib import Path
from typing import Dict, Iterable, List

import numpy as np

from pharmaforge_tpu.analysis.pharm_builder import SampledPharmacophore
from pharmaforge_tpu.models.size_dist import PharmSizeDistribution
from pharmaforge_tpu.training.restore import load_model, resolve_run_dir
from pharmaforge_tpu.training.sampling import PocketSampler
from pharmaforge_tpu.utils.misc import (
    get_prot_atom_ph_type_maps,
    setup_jax,
)


def parse_arguments():
    p = argparse.ArgumentParser()
    p.add_argument('receptor_file', type=Path, help='PDB file of the receptor')
    p.add_argument('--ref_ligand_file', type=Path,
                   help='sdf file of ligand used to define the pocket')
    p.add_argument('--residue_list', nargs='+', type=str, default=[],
                   help='Residues that define the pocket in the form '
                        'chain ID:residue idx')
    p.add_argument('--ckpt', type=Path, default=None,
                   help='Path to checkpoint file. Must be inside model dir.')
    p.add_argument('--model_dir', type=Path, default=None,
                   help='Directory of output from a training run. Will use '
                        'the last checkpoint in this directory.')
    p.add_argument('--samples_per_pocket', type=int, default=1,
                   help='number of samples generated per pocket')
    p.add_argument('--pharm_sizes', nargs='+', type=int, default=[],
                   help='number of pharmacophore centers in each sample, '
                        'must be of length samples per pocket')
    p.add_argument('--output_dir', type=str, default='generated_pharms/')
    p.add_argument('--receptor_name', type=str, default=None)
    p.add_argument('--max_batch_size', type=int, default=128,
                   help='maximum feasible batch size due to memory constraints')
    p.add_argument('--seed', type=int, default=42,
                   help='random seed as an integer.')
    p.add_argument('--use_ref_lig_com', action='store_true',
                   help="Initialize each pharmacophore's position at the "
                        "reference ligand's center of mass")
    p.add_argument('--visualize_trajectory', action='store_true',
                   help='Visualize trajectories of generated pharmacophores')
    p.add_argument('--metrics', action='store_true',
                   help='compute metrics on generated pharmacophores '
                        '(requires receptor pharmacophore sites; like the '
                        'reference, the arbitrary-receptor path has none)')
    p.add_argument('--matmul_precision', type=str, default='float32',
                   choices=['float32', 'tensorfloat32', 'bfloat16'])
    p.add_argument('--latency_mode', type=str, default='auto',
                   choices=['auto', 'on', 'off'],
                   help='precomputed per-step tables '
                        '(DiffusionConfig.precompute_step_tables) for the '
                        'sampling chain. Measured at full scale '
                        '(T=1000, n_convs=4, 240-atom pocket — '
                        'scripts/ab_gen_latency.py): the tables are ~2 s '
                        'WORSE on the cold first call this one-shot CLI '
                        'actually pays (table build + extra compile) and '
                        'within 4%% warm, so "auto" now resolves to OFF '
                        'here; "on" keeps the tables for repeated-call '
                        'uses of this process (docs/performance.md)')
    args = p.parse_args()

    if args.ckpt is not None and args.model_dir is not None:
        raise ValueError('only model_file or model_dir can be specified but not both')
    if args.ckpt is None and args.model_dir is None:
        raise ValueError('one of model_file or model_dir must be specified')
    if args.pharm_sizes and len(args.pharm_sizes) != args.samples_per_pocket:
        raise ValueError('If pharm_sizes list is provided, must be of length '
                         'sample per pocket')
    if args.ref_ligand_file is None and len(args.residue_list) == 0:
        raise ValueError('Either ref_ligand or residue_list must be specified')
    if args.ref_ligand_file is not None and len(args.residue_list) != 0:
        print('WARNING: Both reference ligand file and residue list specified. '
              'Reference ligand will be used to define pocket in this case.')
    return args


def parse_ligand(ligand_path: Path, remove_hydrogen: bool = False):
    """Load a ligand SDF and return (mol, positions [N,3])
    (reference generate_pharmacophores.py:68-95). Falls back to the
    dependency-free V2000 parser when rdkit is absent (mol is None then —
    the inference path only consumes the positions)."""
    try:
        from rdkit import Chem
    except ImportError:
        from pharmaforge_tpu.preprocessing.structure import parse_sdf_coords
        return None, parse_sdf_coords(ligand_path,
                                      remove_hydrogen=remove_hydrogen)
    suppl = Chem.SDMolSupplier(str(ligand_path), sanitize=False,
                               removeHs=remove_hydrogen)
    ligands = list(suppl)
    if len(ligands) > 1:
        raise NotImplementedError('Multiple ligands found. Code is not '
                                  'written to handle multiple ligands.')
    ligand = ligands[0]
    if remove_hydrogen:
        ligand = Chem.RemoveAllHs(ligand, sanitize=False)
    atom_positions = np.asarray(ligand.GetConformer().GetPositions(),
                                dtype=np.float32)
    return ligand, atom_positions


def element_fixer(element: str) -> str:
    if len(element) > 1:
        element = element[0] + element[1:].lower()
    return element


def onehot_encode_elements(atom_elements: Iterable,
                           element_map: Dict[str, int]) -> np.ndarray:
    """One-hot with an 'other' bucket in the final column
    (reference generate_pharmacophores.py:104-117)."""
    def element_to_idx(element_str):
        return element_map.get(element_str, element_map['other'])

    element_idxs = np.fromiter((element_to_idx(e) for e in atom_elements), int)
    onehot = np.zeros((element_idxs.size, len(element_map)))
    onehot[np.arange(element_idxs.size), element_idxs] = 1
    return onehot


def _pocket_arrays(pocket_coords: np.ndarray, pocket_elements,
                   prot_element_map: Dict[str, int],
                   init_com: np.ndarray) -> dict:
    """One-hot + 'other'-element dropping, shared by both parser paths
    (reference generate_pharmacophores.py:195-202)."""
    onehot_elements = onehot_encode_elements(pocket_elements, prot_element_map)
    other_mask = onehot_elements[:, -1] == 1
    pocket_atom_features = onehot_elements[:, :-1].astype(np.float32)
    return {
        'prot_x': np.asarray(pocket_coords,
                             dtype=np.float32)[~other_mask],
        'prot_h': pocket_atom_features[~other_mask],
        'init_com': init_com.astype(np.float32),
    }


def _process_pocket_builtin(rec_file: Path, output_dir: Path,
                            prot_element_map: Dict[str, int],
                            pocket_cutoff: float,
                            lig_file: Path = None,
                            residue_list: list = (),
                            remove_hydrogen: bool = True) -> dict:
    """biopython-free pocket construction (PDB or mmCIF receptors), same
    semantics as the biopython path: standard-AA residues within
    `pocket_cutoff` of the ligand, or an explicit chain:resid list."""
    from pharmaforge_tpu.preprocessing.structure import (
        STANDARD_AA,
        group_residues,
        parse_structure_atoms,
        write_pdb_lines,
    )

    if rec_file.suffix not in ('.pdb', '.mmcif', '.cif'):
        raise ValueError(f'unsupported receptor file type: '
                         f'{rec_file.suffix}, must be .pdb or .mmcif')
    atoms = parse_structure_atoms(rec_file)
    # polymer residues only: ATOM records, blank insertion code — the
    # biopython path iterates (' ', resseq, ' ') residue ids the same way
    residues = group_residues(a for a in atoms
                              if a.record == 'ATOM' and a.icode == ' ')

    if lig_file is not None:
        _, lig_coords = parse_ligand(lig_file, remove_hydrogen=remove_hydrogen)
        init_com = lig_coords.mean(axis=0).reshape(1, 3)
        pocket_residues = []
        for key, res_atoms in residues:
            if key[3] not in STANDARD_AA:
                continue
            res_coords = np.stack([a.coord for a in res_atoms])
            d2 = np.sum((lig_coords[:, None] - res_coords[None]) ** 2, -1)
            if float(d2.min()) < pocket_cutoff ** 2:
                pocket_residues.append((key, res_atoms))
        if len(pocket_residues) == 0:
            raise ValueError('no valid pocket residues found.')
    else:
        wanted = [(r.split(':')[0], int(r.split(':')[1]))
                  for r in residue_list]
        by_id = {(k[0], k[1]): (k, v) for k, v in residues}
        missing = [w for w in wanted if w not in by_id]
        if missing:
            raise ValueError(f'pocket residues not found in receptor: '
                             f'{missing}')
        pocket_residues = [by_id[w] for w in wanted]
        pocket_coords = np.stack([a.coord for _, res in pocket_residues
                                  for a in res])
        init_com = pocket_coords.mean(axis=0).reshape(1, 3)

    pocket_atoms = [a for _, res in pocket_residues for a in res
                    if not (remove_hydrogen and a.element == 'H')]
    pocket_coords = np.stack([a.coord for a in pocket_atoms])
    pocket_elements = np.array([element_fixer(a.element)
                                for a in pocket_atoms])
    # pocket.pdb keeps every atom of the selected residues (the biopython
    # path's PDBIO residue selector does the same); only the model arrays
    # are hydrogen-filtered
    write_pdb_lines([a for _, res in pocket_residues for a in res],
                    output_dir / 'pocket.pdb')
    return _pocket_arrays(pocket_coords, pocket_elements, prot_element_map,
                          init_com)


def process_ligand_and_pocket(rec_file: Path, output_dir: Path,
                              prot_element_map: Dict[str, int],
                              pocket_cutoff: float,
                              lig_file: Path = None,
                              residue_list: list = (),
                              remove_hydrogen: bool = True) -> dict:
    """Build the dense pocket arrays + init COM for an arbitrary receptor
    (reference generate_pharmacophores.py:120-220). Returns a pocket sample
    dict compatible with PocketSampler plus 'init_com'.

    Uses biopython when installed; otherwise a dependency-free PDB parser
    with the same selection semantics (preprocessing/structure.py), so the
    CLI works end-to-end on a bare TPU-VM image."""
    if lig_file is None and len(residue_list) == 0:
        raise ValueError('Either reference ligand or pocket residue list '
                         'must be provided.')

    try:
        from Bio.PDB import MMCIFParser, PDBIO, PDBParser
        from Bio.PDB.Polypeptide import is_aa
    except ImportError:
        return _process_pocket_builtin(
            rec_file, output_dir, prot_element_map, pocket_cutoff,
            lig_file=lig_file, residue_list=residue_list,
            remove_hydrogen=remove_hydrogen)
    from scipy.spatial.distance import cdist

    if rec_file.suffix == '.pdb':
        parser = PDBParser(QUIET=True)
    elif rec_file.suffix == '.mmcif':
        parser = MMCIFParser(QUIET=True)
    else:
        raise ValueError(f'unsupported receptor file type: {rec_file.suffix}, '
                         'must be .pdb or .mmcif')
    rec_struct = parser.get_structure('', rec_file)

    if lig_file is not None:
        _, lig_coords = parse_ligand(lig_file, remove_hydrogen=remove_hydrogen)
        init_com = lig_coords.mean(axis=0).reshape(1, 3)

        pocket_residues = []
        for residue in rec_struct.get_residues():
            if not is_aa(residue.get_resname(), standard=True):
                continue
            res_coords = np.array([a.get_coord()
                                   for a in residue.get_atoms()])
            if cdist(lig_coords, res_coords).min() < pocket_cutoff:
                pocket_residues.append(residue)
        if len(pocket_residues) == 0:
            raise ValueError('no valid pocket residues found.')
    else:
        struct = rec_struct[0]
        pocket_residues = [
            struct[res.split(':')[0]][(' ', int(res.split(':')[1]), ' ')]
            for res in residue_list]
        pocket_coords = np.array([a.get_coord() for residue in pocket_residues
                                  for a in residue.get_atoms()])
        init_com = pocket_coords.mean(axis=0).reshape(1, 3)

    atom_filter = (lambda a: a.element != 'H') if remove_hydrogen \
        else (lambda a: True)
    pocket_atoms = [a for res in pocket_residues
                    for a in res.get_atoms() if atom_filter(a)]

    pocket_coords = np.array([a.get_coord() for a in pocket_atoms],
                             dtype=np.float32)
    pocket_elements = np.array([element_fixer(a.element)
                                for a in pocket_atoms])

    # save the pocket file
    from pharmaforge_tpu.preprocessing.receptor_utils import PocketSelector
    pocket_selector = PocketSelector(pocket_residues)
    io_object = PDBIO()
    io_object.set_structure(rec_struct)
    io_object.save(str(output_dir / 'pocket.pdb'), pocket_selector.bio_select)

    return _pocket_arrays(pocket_coords, pocket_elements, prot_element_map,
                          init_com)


def main():
    args = parse_arguments()
    setup_jax(args.matmul_precision)

    output_dir = Path(args.output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    run_dir, which = resolve_run_dir(args.ckpt, args.model_dir)
    model, params, config = load_model(run_dir, which)

    if args.latency_mode == 'on':
        # 'auto' resolves to OFF: the full-scale A/B
        # (scripts/ab_gen_latency.py, docs/performance.md round 5) measured
        # the tables ~2 s worse on the cold first call this one-shot CLI
        # pays (T=1000 table build + an extra compiled program) and within
        # 4% warm — the dev-shape "latency win" does not transfer. Params
        # are config-independent, so the knob stays free to flip on for
        # callers that sample repeatedly in one process.
        import dataclasses

        from pharmaforge_tpu.models.diffusion import PharmacophoreDiffusion
        model = PharmacophoreDiffusion(dataclasses.replace(
            model.config, precompute_step_tables=True))

    dataset_config = config['dataset']
    prot_element_map, ph_type_map = get_prot_atom_ph_type_maps(dataset_config)

    rec_file = args.receptor_file
    if not rec_file.exists():
        raise ValueError('receptor file does not exist')
    if args.ref_ligand_file and not args.ref_ligand_file.exists():
        raise ValueError('ligand file does not exist')

    rec_name = args.receptor_name or rec_file.name.split('.')[0]
    pocket_dir = output_dir / rec_name
    pocket_dir.mkdir(exist_ok=True)

    pocket = process_ligand_and_pocket(
        rec_file, pocket_dir,
        prot_element_map=prot_element_map,
        pocket_cutoff=dataset_config['pocket_cutoff'],
        lig_file=args.ref_ligand_file,
        residue_list=args.residue_list,
        remove_hydrogen=True)

    size_dist = PharmSizeDistribution(
        dataset_config.get('processed_data_dir'), seed=args.seed)
    if args.pharm_sizes:
        pharm_sizes = list(args.pharm_sizes)
    else:
        pharm_sizes = list(size_dist.sample_uniformly(args.samples_per_pocket))

    init_com = pocket['init_com'][0] if args.use_ref_lig_com else None

    import jax
    sampler = PocketSampler(model, params,
                            pharm_type_map=dataset_config['ph_type_map'])

    pocket_sample_start = time.time()
    sampled_pharms: List[SampledPharmacophore] = sampler.sample_pocket(
        pocket, pharm_sizes, jax.random.key(args.seed),
        max_batch_size=args.max_batch_size, init_pharm_com=init_com,
        visualize_trajectory=args.visualize_trajectory)
    pocket_sample_time = time.time() - pocket_sample_start

    with open(pocket_dir / 'sample_time.txt', 'w') as f:
        f.write(f'{pocket_sample_time:.2f}')
    with open(pocket_dir / 'sample_time.pkl', 'wb') as f:
        pickle.dump([pocket_sample_time], f)

    print(f'Pocket {rec_name} sampling time: {pocket_sample_time:.2f} seconds')
    print(f'Pocket {rec_name} sampling time per pharmacophore: '
          f'{pocket_sample_time / len(sampled_pharms):.2f} seconds')

    ref_files_dir = pocket_dir / 'reference_files'
    ref_files_dir.mkdir(exist_ok=True)
    shutil.copy(rec_file, ref_files_dir / rec_file.name)
    if args.ref_ligand_file is not None:
        shutil.copy(args.ref_ligand_file,
                    ref_files_dir / args.ref_ligand_file.name)

    if args.visualize_trajectory:
        for pharm_idx, sampled_pharm in enumerate(sampled_pharms):
            sampled_pharm.traj_to_xyz(pocket_dir / f'pharm_{pharm_idx}_traj.xyz')
    else:
        pharm_file_content = ''.join(ph.to_xyz_file() for ph in sampled_pharms)
        with open(pocket_dir / 'pharms.xyz', 'w') as f:
            f.write(pharm_file_content)


if __name__ == '__main__':
    main()
