"""Dependency-free structure IO + the inference CLI's fallback pocket path.

On this box biopython/rdkit are absent, so `process_ligand_and_pocket`
exercises the builtin parsers (`pharmaforge_tpu/preprocessing/structure.py`)
— exactly the configuration a bare TPU-VM image runs. Fixtures are
hand-built PDB/SDF text with the quirks the parsers must honor: models,
altlocs, blank element columns, HETATMs, hydrogens, 'other' elements.
"""

import numpy as np
import pytest

from pharmaforge_tpu.preprocessing.structure import (
    group_residues,
    parse_pdb_atoms,
    parse_sdf_coords,
    write_pdb_lines,
)


def _pdb_line(record, serial, name, resname, chain, resseq, x, y, z,
              element="", altloc=" ", icode=" "):
    # PDB fixed columns: name in 13-16 (right-justified 1-letter elements)
    name_field = name if len(name) == 4 else f" {name:<3s}"
    return (f"{record:<6s}{serial:>5d} {name_field}{altloc}{resname:>3s} "
            f"{chain}{resseq:>4d}{icode}   "
            f"{x:8.3f}{y:8.3f}{z:8.3f}{1.0:6.2f}{0.0:6.2f}          "
            f"{element:>2s}")


def _residue(lines, serial, resname, chain, resseq, center, elements=None):
    """Append a tiny residue around `center`; returns next serial."""
    elements = elements or [("N", "N"), ("CA", "C"), ("C", "C"), ("O", "O")]
    offs = np.linspace(-0.7, 0.7, len(elements))
    for (name, el), off in zip(elements, offs):
        lines.append(_pdb_line("ATOM", serial, name, resname, chain, resseq,
                               center[0] + off, center[1], center[2],
                               element=el))
        serial += 1
    return serial


@pytest.fixture
def pdb_file(tmp_path):
    lines = ["HEADER    TEST PROTEIN", "MODEL        1"]
    s = 1
    # chain A: two standard residues near the origin, one far away
    s = _residue(lines, s, "ALA", "A", 1, (0.0, 0.0, 0.0))
    s = _residue(lines, s, "GLY", "A", 2, (3.0, 0.0, 0.0))
    s = _residue(lines, s, "LYS", "A", 50, (40.0, 0.0, 0.0))
    # chain B: a residue with a hydrogen + a selenium ('other' element)
    s = _residue(lines, s, "SER", "B", 7, (0.0, 3.0, 0.0),
                 elements=[("N", "N"), ("CA", "C"), ("HB2", "H"),
                           ("SE", "Se")])
    # an altloc-B copy that must be skipped
    lines.append(_pdb_line("ATOM", s, "CB", "SER", "B", 7,
                           9.9, 9.9, 9.9, element="C", altloc="B"))
    s += 1
    # a water HETATM (not a polymer residue)
    lines.append(_pdb_line("HETATM", s, "O", "HOH", "A", 301,
                           1.0, 1.0, 1.0, element="O"))
    lines.append("ENDMDL")
    # a second model that must be ignored entirely
    lines.append("MODEL        2")
    lines.append(_pdb_line("ATOM", 999, "CA", "ALA", "A", 1,
                           77.0, 77.0, 77.0, element="C"))
    lines.append("ENDMDL")
    lines.append("END")
    path = tmp_path / "rec.pdb"
    path.write_text("\n".join(lines) + "\n")
    return path


@pytest.fixture
def sdf_file(tmp_path):
    # V2000 molblock: 3 heavy atoms + 1 hydrogen near residue A:1
    atoms = [(0.5, 0.2, 0.0, "C"), (1.5, 0.2, 0.0, "N"),
             (2.5, 0.2, 0.0, "O"), (0.5, 1.2, 0.0, "H")]
    lines = ["lig", "  synthetic", ""]
    lines.append(f"{len(atoms):>3d}  0  0  0  0  0  0  0  0  0999 V2000")
    for x, y, z, el in atoms:
        lines.append(f"{x:10.4f}{y:10.4f}{z:10.4f} {el:<3s} 0  0  0  0  0")
    lines += ["M  END", "$$$$"]
    path = tmp_path / "lig.sdf"
    path.write_text("\n".join(lines) + "\n")
    return path


def test_parse_pdb_fields_and_filters(pdb_file):
    atoms = parse_pdb_atoms(pdb_file)
    # first model only, altloc B dropped
    assert all(a.x < 70 for a in atoms)
    assert not any(a.x == 9.9 for a in atoms)
    hetatms = [a for a in atoms if a.record == "HETATM"]
    assert len(hetatms) == 1 and hetatms[0].resname == "HOH"
    ser = [a for a in atoms if a.resname == "SER"]
    assert {a.element for a in ser} == {"N", "C", "H", "Se"}
    ca = next(a for a in atoms if a.name == "CA" and a.resname == "ALA")
    assert ca.element == "C" and ca.chain == "A" and ca.resseq == 1


def test_element_fallback_without_element_column(tmp_path):
    # old PDB writers leave columns 77-78 blank: ' CA ' = carbon (alpha
    # carbon), 'SE  ' starting at column 13 = selenium
    lines = [
        _pdb_line("ATOM", 1, "CA", "ALA", "A", 1, 0, 0, 0)[:54],
        _pdb_line("ATOM", 2, "SE  ", "MSE", "A", 2, 1, 0, 0)[:54],
    ]
    path = tmp_path / "noel.pdb"
    path.write_text("\n".join(lines) + "\n")
    atoms = parse_pdb_atoms(path)
    assert atoms[0].element == "C"
    assert atoms[1].element == "Se"


def test_group_residues_order(pdb_file):
    residues = group_residues(parse_pdb_atoms(pdb_file))
    keys = [k for k, _ in residues]
    assert [k[3] for k in keys] == ["ALA", "GLY", "LYS", "SER", "HOH"]
    assert keys[0][:2] == ("A", 1)


def test_write_pdb_roundtrip(pdb_file, tmp_path):
    atoms = parse_pdb_atoms(pdb_file)
    out = tmp_path / "out.pdb"
    write_pdb_lines(atoms, out)
    again = parse_pdb_atoms(out)
    assert [a.line for a in again] == [a.line for a in atoms]


@pytest.fixture
def mmcif_file(tmp_path):
    """Hand-built atom_site loop mirroring the PDB fixture's chain A, plus
    a second model, an altloc-B row, and a preceding non-atom loop that
    the parser must skip."""
    rows = []
    serial = 1
    for resseq, resname, cx in ((1, "ALA", 0.0), (2, "GLY", 3.0)):
        for j, (nm, el) in enumerate([("N", "N"), ("CA", "C"),
                                      ("C", "C"), ("O", "O")]):
            rows.append(f"ATOM {serial} {el} {nm} . {resname} A {resseq} ? "
                        f"{cx + 0.3 * j:.3f} 0.000 {0.5 * j:.3f} 1")
            serial += 1
    rows.append(f"ATOM {serial} C CB B ALA A 1 ? 9.900 9.900 9.900 1")
    rows.append("ATOM 999 C CA . ALA A 1 ? 77.000 77.000 77.000 2")
    text = "\n".join([
        "data_test",
        "loop_",
        "_entity.id",
        "_entity.type",
        "1 polymer",
        "#",
        "loop_",
        "_atom_site.group_PDB",
        "_atom_site.id",
        "_atom_site.type_symbol",
        "_atom_site.auth_atom_id",
        "_atom_site.label_alt_id",
        "_atom_site.auth_comp_id",
        "_atom_site.auth_asym_id",
        "_atom_site.auth_seq_id",
        "_atom_site.pdbx_PDB_ins_code",
        "_atom_site.Cartn_x",
        "_atom_site.Cartn_y",
        "_atom_site.Cartn_z",
        "_atom_site.pdbx_PDB_model_num",
    ] + rows + ["#"])
    path = tmp_path / "rec.mmcif"
    path.write_text(text + "\n")
    return path


def test_parse_mmcif_matches_pdb_semantics(mmcif_file):
    from pharmaforge_tpu.preprocessing.structure import parse_mmcif_atoms

    atoms = parse_mmcif_atoms(mmcif_file)
    # first model only, altloc B dropped, both residues present
    assert len(atoms) == 8
    assert not any(a.x == 9.9 for a in atoms)
    assert all(a.x < 70 for a in atoms)
    keys = {(a.chain, a.resseq, a.resname) for a in atoms}
    assert keys == {("A", 1, "ALA"), ("A", 2, "GLY")}
    ca = next(a for a in atoms if a.name == "CA" and a.resseq == 1)
    assert ca.element == "C"
    np.testing.assert_allclose([ca.x, ca.y, ca.z], [0.3, 0.0, 0.5],
                               atol=1e-6)


def test_mmcif_pocket_roundtrip(mmcif_file, sdf_file, tmp_path):
    """mmCIF receptor through the fallback pocket path; pocket.pdb written
    from the reconstructed PDB records parses back cleanly."""
    from generate_pharmacophores import process_ligand_and_pocket

    pocket = process_ligand_and_pocket(
        mmcif_file, tmp_path, prot_element_map=ELEMENT_MAP,
        pocket_cutoff=8.0, lig_file=sdf_file, remove_hydrogen=True)
    assert pocket["prot_x"].shape == (8, 3)
    saved = parse_pdb_atoms(tmp_path / "pocket.pdb")
    assert {(a.chain, a.resseq) for a in saved} == {("A", 1), ("A", 2)}
    assert {a.element for a in saved} == {"N", "C", "O"}


def test_parse_sdf_coords(sdf_file):
    xyz = parse_sdf_coords(sdf_file)
    assert xyz.shape == (4, 3)
    np.testing.assert_allclose(xyz[1], [1.5, 0.2, 0.0], atol=1e-4)
    no_h = parse_sdf_coords(sdf_file, remove_hydrogen=True)
    assert no_h.shape == (3, 3)


def test_parse_sdf_rejects_v3000(tmp_path):
    path = tmp_path / "v3.sdf"
    path.write_text("m\n\n\n  0  0  0  0  0  0  0  0  0  0999 V3000\n")
    with pytest.raises(ValueError, match="V2000"):
        parse_sdf_coords(path)


# ---------------------------------------------------------------- CLI path

ELEMENT_MAP = {e: i for i, e in enumerate(
    ["C", "N", "O", "S", "P", "F", "Cl", "Br", "I", "B", "other"])}


def test_pocket_from_ligand_fallback(pdb_file, sdf_file, tmp_path):
    """Ligand-defined pocket through the biopython-free path: standard-AA
    residues within the cutoff, H and 'other' elements dropped, HETATM
    water and far residues excluded, pocket.pdb written."""
    from generate_pharmacophores import process_ligand_and_pocket

    pocket = process_ligand_and_pocket(
        pdb_file, tmp_path, prot_element_map=ELEMENT_MAP,
        pocket_cutoff=8.0, lig_file=sdf_file, remove_hydrogen=True)
    # ALA(4) + GLY(4) + SER(N, CA; H dropped, Se dropped as 'other') = 10
    assert pocket["prot_x"].shape == (10, 3)
    assert pocket["prot_h"].shape == (10, 10)
    assert pocket["prot_h"].sum(axis=1).min() == 1.0  # no 'other' rows
    # init_com is the H-stripped ligand COM
    np.testing.assert_allclose(pocket["init_com"][0], [1.5, 0.2, 0.0],
                               atol=1e-4)
    saved = parse_pdb_atoms(tmp_path / "pocket.pdb")
    assert {a.resname for a in saved} == {"ALA", "GLY", "SER"}
    # pocket.pdb keeps the hydrogens (artifact mirrors the structure); the
    # arrays don't
    assert any(a.element == "H" for a in saved)


def test_pocket_from_residue_list_fallback(pdb_file, tmp_path):
    from generate_pharmacophores import process_ligand_and_pocket

    pocket = process_ligand_and_pocket(
        pdb_file, tmp_path, prot_element_map=ELEMENT_MAP,
        pocket_cutoff=8.0, residue_list=["A:1", "B:7"])
    # ALA(4) + SER(N, CA) = 6 rows after H/'other' dropping
    assert pocket["prot_x"].shape == (6, 3)
    saved = parse_pdb_atoms(tmp_path / "pocket.pdb")
    assert {(a.chain, a.resseq) for a in saved} == {("A", 1), ("B", 7)}


def test_pocket_missing_residue_raises(pdb_file, tmp_path):
    from generate_pharmacophores import process_ligand_and_pocket

    with pytest.raises(ValueError, match="not found"):
        process_ligand_and_pocket(
            pdb_file, tmp_path, prot_element_map=ELEMENT_MAP,
            pocket_cutoff=8.0, residue_list=["A:999"])


def test_generate_cli_end_to_end(pdb_file, sdf_file, tmp_path, monkeypatch):
    """Drive the full CLI (main()) against a fresh tiny checkpoint with no
    chemistry deps installed — the bare-TPU-VM configuration."""
    import sys
    import yaml

    from tests.test_e2e_train import tiny_config
    from pharmaforge_tpu.config.load_from_config import model_from_config
    from pharmaforge_tpu.training.checkpoints import RunCheckpointer

    config = tiny_config(tmp_path)
    run_dir = tmp_path / "runs" / "run_g"
    run_dir.mkdir(parents=True)
    with open(run_dir / "config.yaml", "w") as f:
        yaml.dump(config, f)

    import jax
    from pharmaforge_tpu.data.batch import tile_pocket
    model = model_from_config(config)
    batch = tile_pocket(np.zeros((12, 3), np.float32),
                        np.eye(11, dtype=np.float32)[np.zeros(12, int)],
                        [4])
    params = jax.device_get(model.init_params(jax.random.key(0), batch))
    mgr = RunCheckpointer(run_dir, **config["checkpointing"])
    mgr.save({"params": params}, {"step": 1})

    out_dir = tmp_path / "gen_out"
    argv = ["generate_pharmacophores.py", str(pdb_file),
            "--ref_ligand_file", str(sdf_file),
            "--model_dir", str(run_dir),
            "--samples_per_pocket", "2", "--pharm_sizes", "3", "4",
            "--output_dir", str(out_dir), "--use_ref_lig_com",
            "--seed", "3"]
    monkeypatch.setattr(sys, "argv", argv)
    from generate_pharmacophores import main
    main()

    pocket_dir = out_dir / "rec"
    xyz = (pocket_dir / "pharms.xyz").read_text()
    # two concatenated xyz frames with 3 and 4 centers
    assert xyz.splitlines()[0].strip() == "3"
    assert (pocket_dir / "sample_time.txt").exists()
    assert (pocket_dir / "reference_files" / "rec.pdb").exists()
    assert (pocket_dir / "pocket.pdb").exists()
