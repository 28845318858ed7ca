"""Minimal stand-ins for the host-side chemistry toolkits.

The preprocessing pipeline (pharmaforge_tpu.preprocessing.crossdocked) leans
on RDKit only for SDF conformer coordinates on this path; this stub
implements exactly that surface so the pipeline's own logic (types parsing,
conformer slicing, pocket/site selection, tensor packing) is testable on
boxes without the chemistry deps. Receptor PDB parsing needs no stub: the
pipeline falls back to the real builtin parser
(pharmaforge_tpu/preprocessing/structure.py) when biopython is absent.
Injected into sys.modules by tests/test_preprocessing.py.
"""

from __future__ import annotations

import gzip
import types

import numpy as np

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
    """Register the stubs under the real import names.

    Only rdkit is stubbed now: the pipeline's receptor parsing falls back
    to the REAL builtin PDB parser (pharmaforge_tpu/preprocessing/
    structure.py) when biopython is absent, so the test exercises that
    production code path rather than a Bio stand-in.
    """
    import sys

    rdkit = types.ModuleType("rdkit")
    rdkit_chem = types.ModuleType("rdkit.Chem")
    rdkit_allchem = types.ModuleType("rdkit.Chem.AllChem")
    rdkit_allchem.ForwardSDMolSupplier = ForwardSDMolSupplier
    rdkit_allchem.Mol = Mol
    rdkit_chem.AllChem = rdkit_allchem
    rdkit.Chem = rdkit_chem

    for name, mod in [("rdkit", rdkit), ("rdkit.Chem", rdkit_chem),
                      ("rdkit.Chem.AllChem", rdkit_allchem)]:
        monkeypatch.setitem(sys.modules, name, mod)
