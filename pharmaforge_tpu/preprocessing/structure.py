"""Dependency-free protein/ligand structure IO.

Pure-python parsers for the two text formats the arbitrary-receptor
inference path needs — PDB (receptor) and SDF V2000 (reference ligand) —
used as fallbacks when biopython/rdkit are not installed on the host (a
bare TPU-VM image). Parsing semantics mirror what the reference inference
path gets from its libraries (reference generate_pharmacophores.py:120-220):

* fixed-column ``ATOM``/``HETATM`` records, first ``MODEL`` only, first
  altloc only (biopython's default atom iteration);
* element from PDB columns 77-78, falling back to the atom-name columns
  with the standard right-justification rule when the element field is
  blank (old PDB writers);
* SDF atom coordinates from the V2000 counts/atom block (rdkit
  ``GetConformer().GetPositions()`` equivalent — only positions are
  consumed by the inference CLI).

These parsers intentionally do NOT try to be a full structural-biology
stack: no bond perception, no occupancy/anisou handling, no polymer
detection beyond the standard amino-acid table. They exist so the
generation CLI works end-to-end on hosts without the chemistry stack.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterable, List, NamedTuple, Sequence, Tuple

import numpy as np

# the 20 standard amino acids — biopython's is_aa(standard=True) table
STANDARD_AA = frozenset(
    "ALA ARG ASN ASP CYS GLN GLU GLY HIS ILE LEU LYS MET PHE PRO SER THR "
    "TRP TYR VAL".split())

# two-letter elements that legitimately appear in protein/ligand PDB files;
# used only by the atom-name fallback when columns 77-78 are blank
_TWO_LETTER_ELEMENTS = frozenset(
    "BR CL FE ZN MG MN CU NA CA SE CO NI CD HG".split())


class PdbAtom(NamedTuple):
    """One PDB coordinate record (original line retained for re-writing)."""

    record: str     # 'ATOM' | 'HETATM'
    name: str       # atom name, stripped
    resname: str
    chain: str
    resseq: int
    icode: str      # insertion code, ' ' when absent
    x: float
    y: float
    z: float
    element: str    # capitalized, e.g. 'C', 'Zn'
    line: str       # the verbatim input line

    @property
    def coord(self) -> np.ndarray:
        return np.array([self.x, self.y, self.z], dtype=np.float32)


def _element_from_name(raw_name: str) -> str:
    """Derive the element from the atom-name columns (13-16).

    PDB right-justifies one-letter elements so column 13 is blank for
    ' CA ' (an alpha carbon) but filled for 'CA  ' (calcium) — the
    column-13 test distinguishes them. Digits (as in 'HG21') are ignored.
    """
    letters = "".join(c for c in raw_name if c.isalpha())
    if not letters:
        return ""
    if raw_name[:1] != " " and letters[:2].upper() in _TWO_LETTER_ELEMENTS:
        return letters[:2].capitalize()
    return letters[0].upper()


def parse_pdb_atoms(path) -> List[PdbAtom]:
    """Parse the coordinate records of a PDB file (first model only)."""
    atoms: List[PdbAtom] = []
    with open(path) as f:
        for line in f:
            rec = line[:6].strip()
            if rec == "ENDMDL":
                break  # biopython-equivalent default: first model
            if rec not in ("ATOM", "HETATM"):
                continue
            if len(line) < 54:
                raise ValueError(f"truncated PDB coordinate record: {line!r}")
            altloc = line[16]
            if altloc not in (" ", "A"):
                continue  # keep the first alternate location only
            element = line[76:78].strip() if len(line) >= 78 else ""
            if element:
                element = element.capitalize()
            else:
                element = _element_from_name(line[12:16])
            atoms.append(PdbAtom(
                record=rec,
                name=line[12:16].strip(),
                resname=line[17:20].strip(),
                chain=line[21],
                resseq=int(line[22:26]),
                icode=line[26] if len(line) > 26 else " ",
                x=float(line[30:38]),
                y=float(line[38:46]),
                z=float(line[46:54]),
                element=element,
                line=line.rstrip("\n"),
            ))
    if not atoms:
        raise ValueError(f"no ATOM/HETATM records found in {path}")
    return atoms


ResidueKey = Tuple[str, int, str, str]  # (chain, resseq, icode, resname)


def group_residues(
        atoms: Iterable[PdbAtom]) -> List[Tuple[ResidueKey, List[PdbAtom]]]:
    """Group atoms into residues, preserving file order."""
    order: List[ResidueKey] = []
    groups = {}
    for a in atoms:
        key = (a.chain, a.resseq, a.icode, a.resname)
        if key not in groups:
            groups[key] = []
            order.append(key)
        groups[key].append(a)
    return [(k, groups[k]) for k in order]


def write_pdb_lines(atoms: Sequence[PdbAtom], path) -> None:
    """Write atoms back out verbatim (the pocket.pdb artifact)."""
    with open(path, "w") as f:
        for a in atoms:
            f.write(a.line + "\n")
        f.write("END\n")


def parse_sdf_coords(path, remove_hydrogen: bool = False) -> np.ndarray:
    """Atom positions [N, 3] from the first molecule of an SDF (V2000)."""
    with open(path) as f:
        lines = f.read().splitlines()
    if len(lines) < 4:
        raise ValueError(f"not an SDF file: {path}")
    counts = lines[3]
    if "V2000" not in counts:
        raise ValueError(
            f"unsupported SDF version in {path!r} (only V2000 molblocks are "
            "supported without rdkit; install rdkit for V3000)")
    n_atoms = int(counts[:3])
    if len(lines) < 4 + n_atoms:
        raise ValueError(f"SDF atom block truncated in {path}")
    coords, elements = [], []
    for i in range(n_atoms):
        row = lines[4 + i]
        coords.append((float(row[0:10]), float(row[10:20]),
                       float(row[20:30])))
        elements.append(row[31:34].strip())
    out = np.asarray(coords, dtype=np.float32)
    if remove_hydrogen:
        keep = np.array([e != "H" for e in elements], bool)
        out = out[keep]
    if out.shape[0] == 0:
        raise ValueError(f"no atoms left after hydrogen removal in {path}")
    return out


def min_dists(a: np.ndarray, b: np.ndarray) -> float:
    """min pairwise distance between two coordinate sets (cdist-free)."""
    d2 = np.sum((a[:, None, :] - b[None, :, :]) ** 2, axis=-1)
    return float(np.sqrt(d2.min()))
