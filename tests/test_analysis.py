import numpy as np
import pytest

from pharmaforge_tpu.analysis.metrics import (
    SampleAnalyzer,
    compute_complementarity,
)
from pharmaforge_tpu.analysis.pharm_builder import SampledPharmacophore
from pharmaforge_tpu.constants import PH_IDX_TO_TYPE
from pharmaforge_tpu.utils.misc import write_pharmacophore_file


def test_complementarity_handcrafted():
    # donor at origin; acceptor receptor site 3A away -> complementary
    pharm_pos = np.array([[0.0, 0, 0], [20.0, 0, 0]])
    pharm_types = ["HydrogenDonor", "Hydrophobic"]
    prot_ph_pos = np.array([[3.0, 0, 0], [21.0, 0, 0]])
    prot_ph_types = ["HydrogenAcceptor", "PositiveIon"]
    # donor matches acceptor within 4A; hydrophobic has no hydrophobic site
    count = compute_complementarity(pharm_types, pharm_pos, prot_ph_types,
                                    prot_ph_pos, return_count=True)
    assert count == 1
    frac = compute_complementarity(pharm_types, pharm_pos, prot_ph_types,
                                   prot_ph_pos, return_count=False)
    assert frac == 0.5


def test_complementarity_distance_thresholds():
    # aromatic <-> aromatic allowed out to 7A, donors only to 4A
    pharm_pos = np.array([[0.0, 0, 0]])
    prot_ph_pos = np.array([[6.5, 0, 0]])
    assert compute_complementarity(["Aromatic"], pharm_pos, ["Aromatic"],
                                   prot_ph_pos, return_count=True) == 1
    assert compute_complementarity(["HydrogenDonor"], pharm_pos,
                                   ["HydrogenAcceptor"], prot_ph_pos,
                                   return_count=True) == 0


def make_pharm(rng, n=5, with_prot_ph=True, traj=False):
    coords = rng.normal(size=(n, 3)).astype(np.float32)
    feats = rng.normal(size=(n, 6)).astype(np.float32)
    kwargs = {}
    if with_prot_ph:
        kwargs["prot_ph_pos"] = rng.normal(size=(7, 3)).astype(np.float32)
        kwargs["prot_ph_types"] = [PH_IDX_TO_TYPE[i % 6] for i in range(7)]
    tf = None
    if traj:
        tf = (rng.normal(size=(4, n, 3)).astype(np.float32),
              rng.normal(size=(4, n, 6)).astype(np.float32))
    return SampledPharmacophore(coords, feats, PH_IDX_TO_TYPE,
                                traj_frames=tf, **kwargs)


def test_sampled_pharmacophore_xyz_roundtrip(rng):
    ph = make_pharm(rng)
    xyz = ph.to_xyz_file()
    lines = xyz.strip().split("\n")
    assert lines[0] == "5"
    assert len(lines) == 6
    for i, line in enumerate(lines[1:]):
        elem, x, y, z = line.split()
        assert elem == ph.ph_type_to_elem[ph.ph_types[i]]
        np.testing.assert_allclose(float(x), ph.ph_coords[i, 0], atol=5e-4)


def test_traj_xyz(rng, tmp_path):
    ph = make_pharm(rng, traj=True)
    f = tmp_path / "traj.xyz"
    ph.traj_to_xyz(str(f))
    content = f.read_text().strip().split("\n")
    assert len(content) == 4 * 6  # 4 frames x (count line + 5 atoms)
    ph2 = make_pharm(rng, traj=False)
    with pytest.raises(ValueError):
        ph2.traj_to_xyz()


def test_analyzer_validity_and_freq(rng):
    pharms = [make_pharm(rng) for _ in range(3)]
    metrics = SampleAnalyzer().analyze(pharms)
    assert 0.0 <= metrics["validity"] <= 1.0
    freqs = SampleAnalyzer().pharm_feat_freq(pharms)
    assert freqs.sum() == 15
    with pytest.raises(ValueError):
        SampleAnalyzer().analyze([make_pharm(rng, with_prot_ph=False)])


def test_per_type_breakdown_consistent_with_overall(rng):
    """The count-weighted mean of the per-type validities must equal the
    overall validity (they partition the same centers)."""
    from pharmaforge_tpu.analysis.metrics import MATCHING_TYPES

    pharms = [make_pharm(rng, n=6) for _ in range(4)]
    analyzer = SampleAnalyzer()
    overall = analyzer.analyze(pharms)["validity"]
    per_type = analyzer.analyze_per_type(pharms)
    num = sum(per_type[f"validity_{t}"] * per_type[f"count_{t}"]
              for t in MATCHING_TYPES)
    den = sum(per_type[f"count_{t}"] for t in MATCHING_TYPES)
    assert den == 24
    np.testing.assert_allclose(num / den, overall, atol=1e-9)


def test_from_batch_splits_rows(rng):
    out = {
        "pharm_x": rng.normal(size=(2, 8, 3)),
        "pharm_h": rng.normal(size=(2, 8, 6)),
        "pharm_mask": np.array([[1] * 5 + [0] * 3, [1] * 3 + [0] * 5], bool),
        "traj_x": rng.normal(size=(4, 2, 8, 3)),
        "traj_h": rng.normal(size=(4, 2, 8, 6)),
    }
    pharms = SampledPharmacophore.from_batch(out, PH_IDX_TO_TYPE,
                                             with_trajectory=True)
    assert [p.n_ph_centers for p in pharms] == [5, 3]
    assert pharms[0].pos_frames.shape == (4, 5, 3)
    assert pharms[1].feat_frames.shape == (4, 3, 6)


def test_write_pharmacophore_file(rng, tmp_path):
    coords = [rng.normal(size=(3, 3)), rng.normal(size=(4, 3))]
    types = [[0, 1, 2], [3, 4, 5, 0]]
    out = write_pharmacophore_file(coords, types, PH_IDX_TO_TYPE)
    lines = out.strip().split("\n")
    assert lines[0] == "3" and lines[4] == "4"
    f = tmp_path / "ph.txt"
    write_pharmacophore_file(coords, types, PH_IDX_TO_TYPE, str(f))
    assert f.read_text() == out
