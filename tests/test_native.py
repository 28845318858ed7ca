import numpy as np
import pytest

from pharmaforge_tpu import native
from pharmaforge_tpu.data.batch import collate_complexes
from pharmaforge_tpu.data.dataset import ProteinPharmacophoreDataset
from pharmaforge_tpu.data.synthetic import make_synthetic_processed_dataset


def make_flat(rng, n_rows=30):
    pos = rng.normal(size=(n_rows, 3)).astype(np.float32)
    feat = rng.integers(0, 6, n_rows).astype(np.int32)
    spans = np.array([[0, 4], [4, 12], [12, 30]], np.int64)
    return pos, feat, spans


def test_native_builds():
    # the C++ packer must compile and load on this host (g++ is available);
    # if this fails the loader silently runs the slow path — surface it
    assert native.native_available()


def test_pack_batch_matches_fallback(rng):
    pos, feat, spans = make_flat(rng)
    x1, h1, m1 = native.pack_batch(pos, feat, spans, 20, 6)
    import os
    # force the numpy fallback through the private API
    lib = native._LIB
    try:
        native._LIB = None
        native._TRIED = True
        x2, h2, m2 = native.pack_batch(pos, feat, spans, 20, 6)
    finally:
        native._LIB = lib
    np.testing.assert_array_equal(x1, x2)
    np.testing.assert_array_equal(h1, h2)
    np.testing.assert_array_equal(m1, m2)
    np.testing.assert_array_equal(m1.sum(1), [4, 8, 18])
    assert (h1.sum(-1) == m1.astype(np.float32)).all()


def test_pack_batch_gather(rng):
    pos, feat, _ = make_flat(rng)
    idx = np.array([0, 5, 7, 2, 3], np.int64)
    offsets = np.array([0, 3, 5], np.int64)
    x, h, m = native.pack_batch_gather(pos, feat, idx, offsets, 6, 6)
    np.testing.assert_array_equal(m.sum(1), [3, 2])
    np.testing.assert_allclose(x[0, :3], pos[[0, 5, 7]])
    np.testing.assert_allclose(x[1, :2], pos[[2, 3]])
    assert h[1, 0].argmax() == feat[2]


def test_pack_batch_overflow_raises(rng):
    pos, feat, spans = make_flat(rng)
    with pytest.raises(ValueError):
        native.pack_batch(pos, feat, spans, 10, 6)


def test_dataset_pack_batch_matches_getitem(tmp_path, rng):
    make_synthetic_processed_dataset(tmp_path, n_splits=1,
                                     samples_per_split=6,
                                     n_prot_range=(20, 60), seed=5)
    ds = ProteinPharmacophoreDataset(
        name="t", split_idxs=[0], raw_data_dir=str(tmp_path),
        processed_data_dir=str(tmp_path),
        graph_cutoffs={}, prot_elements=list("CNOSPFLBIDx"),
        ph_type_map=list("abcdef"), subsample_pharms=False)
    idxs = [0, 3, 5]
    batch = ds.pack_batch(idxs, max_pharm=12, max_prot=64)
    ref = collate_complexes([ds[i] for i in idxs], max_pharm=12, max_prot=64)
    np.testing.assert_allclose(batch.prot_x, ref.prot_x)
    np.testing.assert_allclose(batch.prot_h, ref.prot_h)
    np.testing.assert_array_equal(batch.prot_mask, ref.prot_mask)
    np.testing.assert_allclose(batch.pharm_x, ref.pharm_x)
    np.testing.assert_allclose(batch.pharm_h, ref.pharm_h)


def test_dataset_pack_batch_subsampled(tmp_path, rng):
    make_synthetic_processed_dataset(tmp_path, n_splits=1,
                                     samples_per_split=6,
                                     n_prot_range=(20, 60), seed=5)
    ds = ProteinPharmacophoreDataset(
        name="t", split_idxs=[0], raw_data_dir=str(tmp_path),
        processed_data_dir=str(tmp_path),
        graph_cutoffs={}, prot_elements=list("CNOSPFLBIDx"),
        ph_type_map=list("abcdef"),
        subsample_pharms=True, subsample_min=4, subsample_max=8)
    batch = ds.pack_batch([0, 1, 2], max_pharm=8, max_prot=64)
    counts = batch.pharm_mask.sum(1)
    assert ((counts >= 3) & (counts <= 8)).all()
