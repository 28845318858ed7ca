import numpy as np
import pytest

from pharmaforge_tpu.data.batch import (
    bucket_size,
    collate_complexes,
    tile_pocket,
)
from pharmaforge_tpu.data.dataset import ProteinPharmacophoreDataset, get_dataloader
from pharmaforge_tpu.data.datamodule import CrossdockedDataModule
from pharmaforge_tpu.data.synthetic import make_synthetic_processed_dataset


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("processed")
    make_synthetic_processed_dataset(out, n_splits=3, samples_per_split=12,
                                     n_prot_range=(40, 150), seed=3)
    return out


def ds_config(synth_dir, **kw):
    cfg = dict(
        raw_data_dir=str(synth_dir), processed_data_dir=str(synth_dir),
        graph_cutoffs={"pp": 3.5, "pf": 8, "fp": 8, "ff": 9},
        prot_elements=list("CNOSPFLBIDx"),
        ph_type_map=["Aromatic", "HydrogenDonor", "HydrogenAcceptor",
                     "PositiveIon", "NegativeIon", "Hydrophobic"],
    )
    cfg.update(kw)
    return cfg


def test_bucket_size():
    assert bucket_size(1) == 64
    assert bucket_size(64) == 64
    assert bucket_size(65) == 128
    assert bucket_size(200, multiple=128) == 256


def test_dataset_loads_and_indexes(synth_dir):
    ds = ProteinPharmacophoreDataset(name="train", split_idxs=[0, 1],
                                     **ds_config(synth_dir))
    assert len(ds) == 24
    s = ds[0]
    assert s["pharm_x"].shape[0] == s["pharm_h"].shape[0] >= 3
    assert s["pharm_h"].shape[1] == 6
    assert s["prot_h"].shape[1] == 11
    assert s["prot_ph_x"].shape[0] == s["prot_ph_h"].shape[0] > 0
    # one-hot encoding
    assert set(np.unique(s["prot_h"])) <= {0.0, 1.0}
    assert (s["prot_h"].sum(1) == 1).all()


def test_dataset_split_concat_offsets(synth_dir):
    """Samples from the second split must match loading that split alone."""
    both = ProteinPharmacophoreDataset(name="t", split_idxs=[0, 1],
                                       **ds_config(synth_dir))
    only1 = ProteinPharmacophoreDataset(name="t", split_idxs=[1],
                                        **ds_config(synth_dir))
    np.testing.assert_allclose(both[12]["prot_x"], only1[0]["prot_x"])
    np.testing.assert_allclose(both[23]["pharm_x"], only1[11]["pharm_x"])


def test_dataset_subsampling(synth_dir):
    ds = ProteinPharmacophoreDataset(
        name="t", split_idxs=[0], subsample_pharms=True, subsample_min=4,
        subsample_max=8, **ds_config(synth_dir))
    for i in range(len(ds)):
        n = ds[i]["pharm_x"].shape[0]
        assert 3 <= n <= 8


def test_bucketed_loader(synth_dir):
    ds = ProteinPharmacophoreDataset(name="t", split_idxs=[0, 1],
                                     **ds_config(synth_dir))
    loader = get_dataloader(ds, batch_size=4, seed=1)
    seen = 0
    shapes = set()
    for batch in loader:
        seen += batch.batch_size
        shapes.add((batch.n_prot_slots, batch.n_pharm_slots))
        assert batch.prot_mask.sum(1).max() <= batch.n_prot_slots
        assert (batch.pharm_mask.sum(1) >= 3).all()
        # all prot sizes in the batch fit the bucket and would not fit a
        # smaller one is not guaranteed for stragglers; just check padding
        assert batch.n_prot_slots % 64 == 0
    assert seen == len(ds)


def test_datamodule_split_logic(synth_dir):
    dm = CrossdockedDataModule(dataset_config=ds_config(synth_dir),
                               batch_size=4, validation_splits=[2])
    assert dm.train_split_idxs == [0, 1]
    assert dm.val_split_idxs == [2]
    dm.setup("fit")
    assert len(dm.train_dataset) == 24
    assert len(dm.val_dataset) == 12
    with pytest.raises(NotImplementedError):
        CrossdockedDataModule(ds_config(synth_dir), 4, validation_splits=[])
    with pytest.raises(ValueError):
        CrossdockedDataModule(ds_config(synth_dir), 4, validation_splits=[3])


def test_tile_pocket(rng):
    prot_x = rng.normal(size=(50, 3)).astype(np.float32)
    prot_h = rng.normal(size=(50, 11)).astype(np.float32)
    batch = tile_pocket(prot_x, prot_h, [3, 5, 8])
    assert batch.batch_size == 3
    assert batch.n_pharm_slots == 8
    assert batch.n_prot_slots == 64
    np.testing.assert_array_equal(batch.pharm_mask.sum(1), [3, 5, 8])
    np.testing.assert_allclose(batch.prot_x[0, :50], prot_x)
    np.testing.assert_allclose(batch.prot_x[2, :50], prot_x)
    assert (batch.prot_mask.sum(1) == 50).all()
    assert (batch.pharm_x == 0).all() and (batch.pharm_h == 0).all()


def test_collate_complexes(rng):
    samples = [
        {"pharm_x": rng.normal(size=(4, 3)), "pharm_h": rng.normal(size=(4, 6)),
         "prot_x": rng.normal(size=(30, 3)), "prot_h": rng.normal(size=(30, 11))},
        {"pharm_x": rng.normal(size=(7, 3)), "pharm_h": rng.normal(size=(7, 6)),
         "prot_x": rng.normal(size=(55, 3)), "prot_h": rng.normal(size=(55, 11))},
    ]
    batch = collate_complexes(samples)
    assert batch.pharm_x.shape == (2, 8, 3)
    assert batch.prot_x.shape == (2, 64, 3)
    np.testing.assert_array_equal(batch.pharm_mask.sum(1), [4, 7])
    np.testing.assert_array_equal(batch.prot_mask.sum(1), [30, 55])
    np.testing.assert_allclose(batch.pharm_x[1, :7],
                               samples[1]["pharm_x"].astype(np.float32))
