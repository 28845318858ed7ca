"""Drive the dataset-driven eval CLI (test.py main()) end-to-end on CPU.

Covers the round-5 stacked-sweep path (VERDICT r4 #4): whole-split sweeps
route through PocketSampler.sample_stacked (several pockets per device
batch) while preserving the reference's per-pocket artifact layout
(reference test.py:159-235), and --pockets_per_call 1 restores the
per-pocket loop.
"""

import sys

import numpy as np
import pytest
import yaml


@pytest.fixture
def run_dir(tmp_path):
    import jax

    from tests.test_e2e_train import tiny_config
    from pharmaforge_tpu.config.load_from_config import model_from_config
    from pharmaforge_tpu.data.batch import tile_pocket
    from pharmaforge_tpu.data.synthetic import (
        make_synthetic_processed_dataset)
    from pharmaforge_tpu.training.checkpoints import RunCheckpointer

    config = tiny_config(tmp_path)
    make_synthetic_processed_dataset(
        config["dataset"]["processed_data_dir"], n_splits=3,
        samples_per_split=6, n_prot_range=(30, 60), seed=2)
    rd = tmp_path / "runs" / "run_t"
    rd.mkdir(parents=True)
    with open(rd / "config.yaml", "w") as f:
        yaml.dump(config, f)
    model = model_from_config(config)
    batch = tile_pocket(np.zeros((12, 3), np.float32),
                        np.eye(11, dtype=np.float32)[np.zeros(12, int)], [4])
    params = jax.device_get(model.init_params(jax.random.key(0), batch))
    RunCheckpointer(rd, **config["checkpointing"]).save(
        {"params": params}, {"step": 1})
    return rd


def _run_cli(monkeypatch, run_dir, out_dir, extra):
    argv = ["test.py", "--model_dir", str(run_dir),
            "--output_dir", str(out_dir), "--seed", "5"] + extra
    monkeypatch.setattr(sys, "argv", argv)
    import test as test_cli
    test_cli.main()


def test_stacked_sweep_artifacts(run_dir, tmp_path, monkeypatch, capsys):
    """Whole-split sweep (5 pockets x 3 samples, max_batch_size 6 ->
    2 pockets/call, last chunk padded): per-pocket artifact layout intact,
    metrics computed over the whole sweep."""
    out = tmp_path / "samples_stacked"
    _run_cli(monkeypatch, run_dir, out,
             ["--samples_per_pocket", "3", "--dataset_size", "5",
              "--max_batch_size", "6", "--metrics"])
    stdout = capsys.readouterr().out
    assert "stacked 2/call" in stdout
    for i in range(5):
        pd = out / f"pocket_{i}"
        xyz = (pd / "pharms.xyz").read_text()
        assert len([ln for ln in xyz.splitlines()
                    if ln.strip().isdigit()]) == 3  # 3 xyz frames
        # %.2f-formatted wall seconds; tiny CPU chunks can round to 0.00
        assert float((pd / "sample_time.txt").read_text()) >= 0
    assert (out / "metrics.txt").exists()
    assert "validity" in (out / "metrics.txt").read_text()


def test_per_pocket_path_opt_out(run_dir, tmp_path, monkeypatch, capsys):
    """--pockets_per_call 1 restores the per-pocket loop; same artifacts."""
    out = tmp_path / "samples_loop"
    _run_cli(monkeypatch, run_dir, out,
             ["--samples_per_pocket", "2", "--dataset_size", "2",
              "--pockets_per_call", "1"])
    assert "stacked" not in capsys.readouterr().out
    for i in range(2):
        assert (out / f"pocket_{i}" / "pharms.xyz").exists()


def test_single_pocket_unchanged(run_dir, tmp_path, monkeypatch):
    """--dataset_idx single-pocket mode keeps the per-pocket path and the
    ref-pharm-COM init."""
    out = tmp_path / "samples_one"
    _run_cli(monkeypatch, run_dir, out,
             ["--samples_per_pocket", "2", "--dataset_idx", "1",
              "--use_ref_pharm_com"])
    assert (out / "pocket_1" / "pharms.xyz").exists()
    assert not (out / "pocket_0").exists()
