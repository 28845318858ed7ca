"""End-to-end preprocessing pipeline tests with stubbed chemistry deps.

Exercises read_types_files -> getfeatures -> write_processed_dataset ->
ProteinPharmacophoreDataset -> one train step, with a stub `pharmit`
executable and minimal BioPython/RDKit stand-ins (tests/chem_stubs.py), so
the pipeline logic runs on boxes with no chemistry toolkits installed.
Reference behavior: process_crossdocked.py:39-263.
"""

import gzip
import json
import os
import pickle
import stat

import numpy as np
import pytest

from pharmaforge_tpu.preprocessing import crossdocked as cd
from tests import chem_stubs

PH_JSON = {
    "points": [
        {"name": "Aromatic", "x": 0.0, "y": 0.0, "z": 0.0, "enabled": True},
        {"name": "HydrogenDonor", "x": 1.5, "y": 0.0, "z": 0.0,
         "enabled": True},
        {"name": "Hydrophobic", "x": 0.0, "y": 1.5, "z": 0.0,
         "enabled": True},
        {"name": "PositiveIon", "x": 1.0, "y": 1.0, "z": 0.5,
         "enabled": True},
        {"name": "NegativeIon", "x": 9.9, "y": 9.9, "z": 9.9,
         "enabled": False},
    ]
}


def _pdb_line(serial, name, resname, resseq, xyz, element):
    x, y, z = xyz
    # PDB fixed columns: name 13-16, altLoc 17, resname 18-20, chain 22,
    # resseq 23-26, xyz 31-54, element 77-78
    return (f"ATOM  {serial:>5} {name:<4} {resname:<3} A{resseq:>4}    "
            f"{x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00          {element:>2}")


def _write_pdb(path):
    lines = [
        # GLY 1: three heavy atoms + one hydrogen, all within 8A of ligand
        _pdb_line(1, "N", "GLY", 1, (2.0, 0.0, 0.0), "N"),
        _pdb_line(2, "CA", "GLY", 1, (3.0, 1.0, 0.0), "C"),
        _pdb_line(3, "O", "GLY", 1, (2.5, 0.0, 1.0), "O"),
        _pdb_line(4, "H", "GLY", 1, (2.2, 0.5, 0.5), "H"),
        # ALA 2: far from the ligand -> excluded
        _pdb_line(5, "CA", "ALA", 2, (30.0, 0.0, 0.0), "C"),
        # HOH 3: near but not a standard residue -> excluded
        _pdb_line(6, "O", "HOH", 3, (1.0, 1.0, 1.0), "O"),
        "END",
    ]
    path.write_text("\n".join(lines) + "\n")


def _sdf_record(coords):
    body = ["lig", "  test fixture", ""]
    body.append(f"{len(coords):>3}  0  0  0  0  0  0  0  0  0999 V2000")
    for x, y, z in coords:
        body.append(f"{x:10.4f}{y:10.4f}{z:10.4f} C   0  0")
    body.append("M  END")
    return "\n".join(body) + "\n"


LIG_COORDS = [(0.0, 0.0, 0.0), (1.5, 0.0, 0.0), (0.0, 1.5, 0.0)]
FAR_COORDS = [(50.0, 50.0, 50.0), (51.5, 50.0, 50.0), (50.0, 51.5, 50.0)]


@pytest.fixture
def raw_tree(tmp_path, monkeypatch):
    """Fake CrossDocked raw tree + stub pharmit on PATH + chem stubs."""
    chem_stubs.install(monkeypatch)

    raw = tmp_path / "raw"
    data = raw / "CrossDocked2020" / "REC"
    data.mkdir(parents=True)
    _write_pdb(data / "recA.pdb")
    with gzip.open(data / "ligA.sdf.gz", "wt") as f:
        f.write(_sdf_record(LIG_COORDS) + "$$$$\n")
    # ligB: conformer 0 is far away; conformer 1 is the real pose
    with gzip.open(data / "ligB.sdf.gz", "wt") as f:
        f.write(_sdf_record(FAR_COORDS) + "$$$$\n"
                + _sdf_record(LIG_COORDS) + "$$$$\n")

    types_dir = raw / "types"
    types_dir.mkdir()
    rows = [
        "1 6.5 0.20 REC/recA_0.gninatypes REC/ligA_0.gninatypes #x",
        "0 4.0 3.10 REC/recA_0.gninatypes REC/ligA_0.gninatypes #x",  # label 0
        "1 7.1 0.10 REC/recA_0.gninatypes REC/ligB_1.gninatypes #x",
        "1 5.0 0.30 REC/missing_0.gninatypes REC/gone_0.gninatypes #x",
    ]
    for split in range(3):
        (types_dir / f"it2_tt_v1.3_0_test{split}.types").write_text(
            "\n".join(rows) + "\n")

    # stub pharmit: writes the canned ph.json (with the reference's
    # double-JSON-object quirk appended) to whatever follows -out
    stub_dir = tmp_path / "bin"
    stub_dir.mkdir()
    pharmit = stub_dir / "pharmit"
    pharmit.write_text(
        "#!/bin/sh\n"
        'out=""\n'
        "while [ $# -gt 0 ]; do\n"
        '  if [ "$1" = "-out" ]; then out="$2"; shift; fi\n'
        "  shift\n"
        "done\n"
        f"cat > \"$out\" <<'EOF'\n{json.dumps(PH_JSON)}\n"
        '{"junk": "second json object"}\nEOF\n')
    pharmit.chmod(pharmit.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH",
                       f"{stub_dir}:{os.environ.get('PATH', '')}")

    # receptor SMARTS sites: two near the ligand, one far (filtered)
    monkeypatch.setattr(
        cd, "get_mol_pharm",
        lambda path: {"HydrogenAcceptor": [[2.0, 0.0, 0.0],
                                           [40.0, 0.0, 0.0]],
                      "Aromatic": [[0.0, 2.0, 0.0]]})
    return raw


def test_read_types_files(raw_tree):
    allinputs = cd.read_types_files(str(raw_tree))
    assert len(allinputs) == 3  # one per split
    fname, inputs = sorted(allinputs)[0]
    assert fname.endswith("test0.types")
    # label==0 row dropped, order preserved
    assert inputs == [("REC/recA_0.gninatypes", "REC/ligA_0.gninatypes"),
                      ("REC/recA_0.gninatypes", "REC/ligB_1.gninatypes"),
                      ("REC/missing_0.gninatypes", "REC/gone_0.gninatypes")]
    # dataset_size caps rows scanned
    capped = cd.read_types_files(str(raw_tree), dataset_size=0)
    assert all(len(inp) == 1 for _, inp in capped)


def test_resolve_pair_paths():
    rec, lig, conf = cd.resolve_pair_paths("A/r_0.gninatypes",
                                           "A/l_7.gninatypes")
    assert rec == "A/r.pdb" and lig == "A/l.sdf.gz" and conf == 7
    with pytest.raises(ValueError):
        cd.resolve_pair_paths("A/r_0.gninatypes", "A/not-a-types-name")


def test_getfeatures_single_pair(raw_tree):
    data_dir = raw_tree / "CrossDocked2020"
    out = cd.getfeatures(("REC/recA_0.gninatypes", "REC/ligA_0.gninatypes"),
                         crossdocked_data_dir=data_dir, pocket_cutoff=8)
    rec, glig, ligand, (ph_pos, ph_kind), pocket = out
    assert rec == "REC/recA.pdb"
    assert ligand is not None
    # pharmit points: 4 enabled of 5
    assert ph_pos.shape == (4, 3) and ph_kind.shape == (4,)
    prot_pos, prot_elem, site_pos, site_kind, anames, rids = pocket
    # GLY's 3 heavy atoms only (H dropped, far ALA dropped, HOH dropped)
    assert prot_pos.shape == (3, 3)
    assert list(prot_elem) == ["N", "C", "O"]
    assert list(anames) == ["N", "CA", "O"]
    assert list(rids) == [1, 1, 1]
    # receptor sites: the two within 8A of the ligand
    assert site_pos.shape == (2, 3)
    assert sorted(site_kind.tolist()) == sorted(
        [cd.PH_TYPE_TO_IDX["HydrogenAcceptor"], cd.PH_TYPE_TO_IDX["Aromatic"]])


def test_getfeatures_nonzero_conformer(raw_tree):
    """ligB_1 must slice conformer #1 (the near pose) out of the gz SDF."""
    data_dir = raw_tree / "CrossDocked2020"
    out = cd.getfeatures(("REC/recA_0.gninatypes", "REC/ligB_1.gninatypes"),
                         crossdocked_data_dir=data_dir, pocket_cutoff=8)
    assert out[2] is not None
    np.testing.assert_allclose(out[2].GetConformer().GetPositions(),
                               np.asarray(LIG_COORDS))
    # conformer 0 (far pose) would have produced an empty pocket
    assert out[4][0].shape == (3, 3)


def test_getfeatures_failure_sentinel(raw_tree, capsys):
    data_dir = raw_tree / "CrossDocked2020"
    out = cd.getfeatures(("REC/missing_0.gninatypes",
                          "REC/gone_0.gninatypes"),
                         crossdocked_data_dir=data_dir)
    assert out[2] is None and out[3] is None and out[4] is None
    assert "missing input file" in capsys.readouterr().out


def _run_pipeline(raw_tree, processed_dir):
    """The process_crossdocked.py main loop, single-process."""
    data_dir = raw_tree / "CrossDocked2020"
    for fname, inputs in cd.read_types_files(str(raw_tree)):
        phdata = [cd.getfeatures(pair, crossdocked_data_dir=data_dir,
                                 pocket_cutoff=8) for pair in inputs]
        phdata = [ex for ex in phdata if ex[2]]
        phdata = [ex for ex in phdata if isinstance(ex[3][0], np.ndarray)]
        cd.write_processed_dataset(
            str(processed_dir), fname, phdata,
            pocket_element_map=["C", "N", "O", "S", "P", "F", "Cl", "Br",
                                "I", "B", "D"],
            min_pharm_centers=3)


def test_pipeline_roundtrip_and_train(raw_tree, tmp_path):
    """The npz a stubbed pipeline writes loads, batches, and trains."""
    processed = tmp_path / "processed"
    _run_pipeline(raw_tree, processed)

    split_dirs = sorted(p.name for p in processed.iterdir())
    assert split_dirs == [f"it2_tt_v1.3_0_test{i}" for i in range(3)]
    npz = np.load(processed / split_dirs[0] / "prot_pharm_tensors.npz")
    # 2 surviving examples (missing-file pair filtered), 4 centers each
    assert npz["pharm_idx"].shape == (2, 2)
    assert npz["pharm_pos"].shape == (8, 3)
    assert npz["prot_pos"].shape == (6, 3)
    assert npz["prot_ph_pos"].shape == (4, 3)
    np.testing.assert_array_equal(npz["pharm_idx"], [[0, 4], [4, 8]])
    with gzip.open(processed / split_dirs[0] / "prot_file_names.pkl.gz") as f:
        assert pickle.load(f) == ["REC/recA.pdb", "REC/recA.pdb"]

    from pharmaforge_tpu.data.datamodule import CrossdockedDataModule
    dm = CrossdockedDataModule(
        dataset_config=dict(
            raw_data_dir=str(raw_tree), processed_data_dir=str(processed),
            graph_cutoffs={"pp": 3.5, "pf": 8, "fp": 8, "ff": 9},
            prot_elements=["C", "N", "O", "S", "P", "F", "Cl", "Br", "I",
                           "B", "D"],
            ph_type_map=["Aromatic", "HydrogenDonor", "HydrogenAcceptor",
                         "PositiveIon", "NegativeIon", "Hydrophobic"],
            subsample_pharms=False),
        batch_size=4, validation_splits=[2])
    dm.setup("fit")
    assert len(dm.train_dataset) == 4 and len(dm.val_dataset) == 2
    sample = dm.train_dataset[0]
    assert sample["pharm_x"].shape == (4, 3)
    assert sample["pharm_h"].shape == (4, 6)
    assert sample["prot_h"].shape == (3, 11)
    assert sample["prot_ph_x"].shape == (2, 3)

    batch = next(iter(dm.train_dataloader()))
    assert batch.pharm_mask.sum() == 16  # 4 samples x 4 centers

    # ... and the packed batch trains
    import jax
    from pharmaforge_tpu.models.diffusion import PharmacophoreDiffusion
    from pharmaforge_tpu.training.optim import make_optimizer
    from pharmaforge_tpu.training.train_state import (TrainState,
                                                      make_train_step)
    from tests.test_diffusion import tiny_config

    model = PharmacophoreDiffusion(tiny_config())
    params = model.init_params(jax.random.key(0), batch)
    optimizer = make_optimizer(1e-3)
    state = TrainState(params=params, opt_state=optimizer.init(params),
                       step=np.int32(0))
    train_step = make_train_step(model, optimizer, donate=False)
    state, aux = train_step(state, batch, jax.random.key(1), 1e-3)
    assert np.isfinite(float(aux["train total loss"]))


def test_parse_pharmit_json_double_object_quirk():
    """Some pharmit outputs concatenate a second JSON object after the
    pharmacophore (reference process_crossdocked.py:75-79); parsing must
    take the first and keep only enabled points."""
    import json

    from pharmaforge_tpu.preprocessing.crossdocked import (
        parse_pharmit_json, pharmit_points)

    doc = json.dumps({"points": [
        {"name": "Aromatic", "x": 1.0, "y": 2.0, "z": 3.0, "enabled": True},
        {"name": "Hydrophobic", "x": 0.0, "y": 0.0, "z": 0.0,
         "enabled": False},
        {"name": "NegativeIon", "x": -1.0, "y": 0.5, "z": 2.0,
         "enabled": True},
    ]}) + json.dumps({"second": "object"})
    ph = parse_pharmit_json(doc)
    coords, kinds = pharmit_points(ph)
    assert coords.shape == (2, 3)
    assert kinds.tolist() == [0, 4]  # Aromatic, NegativeIon
    # empty document -> empty arrays
    c2, k2 = pharmit_points({"points": []})
    assert len(c2) == 0 and len(k2) == 0


def test_inspect_pharmit_json_example(tmp_path, capsys):
    """The notebook-analog inspection example runs on real-format files."""
    import json

    from examples.inspect_pharmit_json import DEMO_DOC, main

    f = tmp_path / "ph.json"
    f.write_text(DEMO_DOC)
    main([str(f), "--quiet"])
    out = capsys.readouterr().out
    assert "4 enabled / 5 points" in out
    assert "feature kinds" in out
    assert "Aromatic" in out
