"""Minimal stand-ins for the host-side chemistry toolkits.

The preprocessing pipeline (pharmaforge_tpu.preprocessing.crossdocked) leans
on BioPython and RDKit only for file parsing on this path: PDB ATOM records
and SDF conformer coordinates. These stubs implement exactly that surface so
the pipeline's own logic (types parsing, conformer slicing, pocket/site
selection, tensor packing) is testable on boxes without the chemistry deps.
They are injected into sys.modules by tests/test_preprocessing.py.
"""

from __future__ import annotations

import gzip
import types

import numpy as np

STANDARD_AA = {
    "ALA", "ARG", "ASN", "ASP", "CYS", "GLN", "GLU", "GLY", "HIS", "ILE",
    "LEU", "LYS", "MET", "PHE", "PRO", "SER", "THR", "TRP", "TYR", "VAL",
}


# --------------------------------------------------------------- Bio.PDB ---

class _Atom:
    def __init__(self, name, element, coord):
        self.name = name
        self.element = element
        self._coord = np.asarray(coord, dtype=np.float32)

    def get_coord(self):
        return self._coord


class _Residue:
    def __init__(self, resname, res_seq):
        self._resname = resname
        self.id = (" ", res_seq, " ")
        self._atoms = []

    def get_resname(self):
        return self._resname

    def get_atoms(self):
        return iter(self._atoms)


class _Model:
    def __init__(self):
        self._residues = []

    def get_residues(self):
        return iter(self._residues)


class _Structure:
    def __init__(self):
        self._models = [_Model()]

    def __getitem__(self, i):
        return self._models[i]


class PDBParser:
    """Parses ATOM/HETATM records of a PDB file (columns per the spec)."""

    def __init__(self, QUIET=False):
        pass

    def get_structure(self, _name, path):
        structure = _Structure()
        model = structure[0]
        current = None
        with open(path) as f:
            for line in f:
                if not line.startswith(("ATOM", "HETATM")):
                    continue
                resname = line[17:20].strip()
                res_seq = int(line[22:26])
                if current is None or current.id[1] != res_seq:
                    current = _Residue(resname, res_seq)
                    model._residues.append(current)
                atom = _Atom(
                    name=line[12:16].strip(),
                    element=line[76:78].strip() or line[12:16].strip()[0],
                    coord=(float(line[30:38]), float(line[38:46]),
                           float(line[46:54])))
                current._atoms.append(atom)
        return structure


def is_aa(resname, standard=False):
    return resname.upper() in STANDARD_AA


# ------------------------------------------------------------- rdkit SDF ---

class Mol:
    """Just enough of an RDKit Mol: conformer positions + picklability."""

    def __init__(self, positions):
        self._positions = np.asarray(positions, dtype=np.float64)

    def GetConformer(self):
        return self

    def GetPositions(self):
        return self._positions

    def __bool__(self):
        return True


def ForwardSDMolSupplier(source, sanitize=False):
    """Yield Mols from an SDF V2000 stream (file object or path)."""
    if hasattr(source, "read"):
        text = source.read()
        if isinstance(text, bytes):
            text = text.decode()
    else:
        opener = gzip.open if str(source).endswith(".gz") else open
        with opener(source, "rt") as f:
            text = f.read()
    for record in text.split("$$$$\n"):
        lines = record.splitlines()
        if len(lines) < 4:
            continue
        n_atoms = int(lines[3][:3])
        coords = [[float(w) for w in line.split()[:3]]
                  for line in lines[4:4 + n_atoms]]
        yield Mol(coords)


def install(monkeypatch):
    """Register the stubs under the real import names."""
    import sys

    bio = types.ModuleType("Bio")
    bio_pdb = types.ModuleType("Bio.PDB")
    bio_pdb.PDBParser = PDBParser
    bio_poly = types.ModuleType("Bio.PDB.Polypeptide")
    bio_poly.is_aa = is_aa
    bio_pdb.Polypeptide = bio_poly
    bio.PDB = bio_pdb

    rdkit = types.ModuleType("rdkit")
    rdkit_chem = types.ModuleType("rdkit.Chem")
    rdkit_allchem = types.ModuleType("rdkit.Chem.AllChem")
    rdkit_allchem.ForwardSDMolSupplier = ForwardSDMolSupplier
    rdkit_allchem.Mol = Mol
    rdkit_chem.AllChem = rdkit_allchem
    rdkit.Chem = rdkit_chem

    for name, mod in [("Bio", bio), ("Bio.PDB", bio_pdb),
                      ("Bio.PDB.Polypeptide", bio_poly),
                      ("rdkit", rdkit), ("rdkit.Chem", rdkit_chem),
                      ("rdkit.Chem.AllChem", rdkit_allchem)]:
        monkeypatch.setitem(sys.modules, name, mod)
