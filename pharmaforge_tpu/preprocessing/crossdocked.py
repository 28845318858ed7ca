"""CrossDocked2020 -> training-tensor preprocessing (host-side).

Capability parity with the reference process_crossdocked.py: reads gnina
`.types` files (keeping label==1 rows), extracts per protein-ligand pair

* the ligand pharmacophore via the external `pharmit pharma` C++ binary,
* receptor pharmacophore sites via SMARTS matching, cut to within
  `pocket_cutoff` of the ligand,
* pocket heavy atoms from residues within `pocket_cutoff`,

in a multiprocessing pool, then packs everything into the flat-array `.npz`
+ `.pkl.gz` layout the dataset loader consumes. All chemistry deps (rdkit,
biopython, pharmit) are host-only and imported lazily.
"""

from __future__ import annotations

import gzip
import json
import os
import pickle
import re
import subprocess
import tempfile
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from pharmaforge_tpu.constants import PH_TYPE_TO_IDX
from pharmaforge_tpu.preprocessing.receptor_utils import get_mol_pharm


def element_fixer(element: str) -> str:
    if len(element) > 1:
        element = element[0] + element[1:].lower()
    return element


def run_pharmit(rec_path: str, lig_path: str, tmp_dir: str) -> Tuple[np.ndarray, np.ndarray]:
    """Ligand pharmacophore extraction through the pharmit binary
    (reference process_crossdocked.py:71-87)."""
    phfile = os.path.join(tmp_dir, "ph.json")
    cmd = f"pharmit pharma -receptor {rec_path} -in {lig_path} -out {phfile}"
    subprocess.check_call(cmd, shell=True)

    # some outputs contain a second JSON object — take the first
    decoder = json.JSONDecoder()
    ph = decoder.raw_decode(open(phfile).read())[0]

    if ph["points"]:
        coords = np.array([(p["x"], p["y"], p["z"]) for p in ph["points"]
                           if p["enabled"]])
        kinds = np.array([PH_TYPE_TO_IDX[p["name"]] for p in ph["points"]
                          if p["enabled"]])
    else:
        coords, kinds = [], []
    return coords, kinds


def getfeatures(reclig: Tuple[str, str], crossdocked_data_dir: Path,
                pocket_cutoff: float = 8):
    """Extract all features for one (receptor, ligand) pair
    (reference process_crossdocked.py:39-171). Returns the same 5-tuple
    layout with None sentinels on failure."""
    from Bio.PDB import PDBParser
    from Bio.PDB.Polypeptide import is_aa
    from rdkit.Chem import AllChem as Chem
    from scipy.spatial.distance import cdist

    rec, glig = reclig
    rec = rec.replace("_0.gninatypes", ".pdb")
    m = re.search(r"(\S+)_(\d+)\.gninatypes", glig)
    prefix = m.group(1)
    num = int(m.group(2))
    lig = prefix + ".sdf.gz"

    rec_path = str(crossdocked_data_dir / rec)
    lig_path = str(crossdocked_data_dir / lig)
    if not os.path.exists(rec_path):
        print(rec_path)
    if not os.path.exists(lig_path):
        print(lig_path)

    with tempfile.TemporaryDirectory() as tmp:
        try:
            if num != 0:
                # extract the num-th conformer without chemical parsing
                sdf = gzip.open(lig_path).read().split(b"$$$$\n")[num] + b"$$$$\n"
                lig_path = os.path.join(tmp, "lig.sdf")
                with open(lig_path, "wb") as out:
                    out.write(sdf)

            feature_coords, feature_kind = run_pharmit(rec_path, lig_path, tmp)

            pdb_struct = PDBParser(QUIET=True).get_structure("", rec_path)
            if lig_path.endswith(".gz"):
                with gzip.open(lig_path) as f:
                    ligand = next(Chem.ForwardSDMolSupplier(f, sanitize=False))
            else:
                ligand = next(Chem.ForwardSDMolSupplier(lig_path,
                                                        sanitize=False))
            lig_coords = ligand.GetConformer().GetPositions()

            # receptor pharmacophore sites within pocket_cutoff of the ligand
            pocket_feat_coords, pocket_feat_kind = [], []
            rec_pharm = get_mol_pharm(rec_path)
            for feature, coords in rec_pharm.items():
                coords = np.array(coords)
                distances = cdist(coords, lig_coords)
                mask = np.any(distances <= pocket_cutoff, axis=1)
                coords = coords[mask]
                pocket_feat_coords.append(coords)
                pocket_feat_kind.append(
                    np.ones(coords.shape[0], dtype=int) * PH_TYPE_TO_IDX[feature])

            # pocket residues within pocket_cutoff of the ligand
            pocket_residues = []
            for residue in pdb_struct[0].get_residues():
                res_coords = np.array([a.get_coord()
                                       for a in residue.get_atoms()])
                if not is_aa(residue.get_resname(), standard=True):
                    continue
                if cdist(lig_coords, res_coords).min() < pocket_cutoff:
                    pocket_residues.append(residue)

            pocket_atomres = [(a, res) for res in pocket_residues
                              for a in res.get_atoms() if a.element != "H"]
            pocket_coords = np.array([ar[0].get_coord()
                                      for ar in pocket_atomres])
            pocket_elements = np.array([element_fixer(ar[0].element)
                                        for ar in pocket_atomres])
            pocket_anames = np.array([ar[0].name for ar in pocket_atomres])
            pocket_rid = np.array([ar[1].id[1] for ar in pocket_atomres])
            pocket_feat_coords = np.concatenate(pocket_feat_coords, axis=0)
            pocket_feat_kind = np.concatenate(pocket_feat_kind, axis=0)

            return (rec, glig, ligand, (feature_coords, feature_kind),
                    (pocket_coords, pocket_elements, pocket_feat_coords,
                     pocket_feat_kind, pocket_anames, pocket_rid))
        except Exception as e:  # per-sample fault tolerance
            print(e)
            print(rec, glig)
            return (rec, glig, None, None, None)


def write_processed_dataset(processed_data_dir: str, types_file_path: str,
                            data: list, pocket_element_map: list,
                            min_pharm_centers: int = 3) -> Path:
    """Pack extracted features into the flat-array npz layout
    (reference process_crossdocked.py:173-263)."""
    pocket_element_to_idx = {el: i for i, el in enumerate(pocket_element_map)}

    prot_file_name, lig_rdmol = [], []
    pharm_pos_arr, pharm_feat_arr = [], []
    prot_pos_arr, prot_feat_arr = [], []
    prot_ph_pos_arr, prot_ph_feat_arr = [], []

    for item in data:
        pharm_types = item[3][1]
        if pharm_types.shape[0] < min_pharm_centers:
            continue
        prot_file_name.append(item[0])
        lig_rdmol.append(item[2])
        pharm_pos_arr.append(item[3][0])
        pharm_feat_arr.append(item[3][1])
        prot_pos_arr.append(item[4][0])
        prot_feat_arr.append(item[4][1])
        prot_ph_pos_arr.append(item[4][2])
        prot_ph_feat_arr.append(item[4][3])

    def spans(arrs):
        n = np.array([len(x) for x in arrs])
        idx = np.zeros((len(arrs), 2), dtype=int)
        idx[:, 1] = np.cumsum(n)
        idx[1:, 0] = idx[:-1, 1]
        return idx

    pharm_pos = np.concatenate(pharm_pos_arr, axis=0, dtype=np.float32)
    pharm_feat = np.concatenate(pharm_feat_arr, axis=0, dtype=np.int32)
    prot_pos = np.concatenate(prot_pos_arr, axis=0, dtype=np.float32)
    prot_ph_pos = np.concatenate(prot_ph_pos_arr, axis=0, dtype=np.float32)
    prot_ph_feat = np.concatenate(prot_ph_feat_arr, axis=0, dtype=np.float32)

    prot_feat_strs = np.concatenate(prot_feat_arr, axis=0)
    prot_feat = np.array([pocket_element_to_idx[el] for el in prot_feat_strs],
                         dtype=np.int32)

    types_file_stem = Path(types_file_path).name.split(".types")[0]
    output_dir = Path(processed_data_dir) / types_file_stem
    output_dir.mkdir(parents=True, exist_ok=True)

    np.savez_compressed(
        output_dir / "prot_pharm_tensors.npz",
        prot_pos=prot_pos, prot_feat=prot_feat, prot_idx=spans(prot_pos_arr),
        pharm_pos=pharm_pos, pharm_feat=pharm_feat,
        pharm_idx=spans(pharm_pos_arr),
        prot_ph_pos=prot_ph_pos, prot_ph_feat=prot_ph_feat,
        prot_ph_idx=spans(prot_ph_pos_arr))

    with gzip.open(output_dir / "lig_rdmol.pkl.gz", "wb") as f:
        pickle.dump(lig_rdmol, f)
    with gzip.open(output_dir / "prot_file_names.pkl.gz", "wb") as f:
        pickle.dump(prot_file_name, f)
    return output_dir


def read_types_files(crossdocked_path: str,
                     dataset_size: Optional[int] = None,
                     pattern: str = "it2_tt_v1.3_0_test*types"
                     ) -> List[Tuple[str, List[Tuple[str, str]]]]:
    """Collect (types_file, [(rec, lig), ...]) pairs with label==1
    (reference process_crossdocked.py:283-298)."""
    import glob
    allinputs = []
    types_files = os.path.join(crossdocked_path, "types", pattern)
    for fname in glob.glob(types_files):
        inputs = []
        with open(fname) as f:
            for idx, line in enumerate(f):
                label, affinity, rmsd, rec, glig, _ = line.split()
                if label == "1":
                    inputs.append((rec, glig))
                if dataset_size is not None and idx > dataset_size:
                    break
        allinputs.append((fname, inputs))
    return allinputs
