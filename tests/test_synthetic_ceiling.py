"""Pin the synthetic task's validity-ceiling structure.

evidence/validity_ceiling/ANALYSIS.md explains the r2 validity plateau:
with the default random site selection the Bayes-optimal pocket-conditioned
model tops out at ~0.65 validity (site subset unobservable), while the
deterministic site rule makes sites fully inferable (ceiling ~1.0). These
tests run the SAME measurement code the evidence protocol uses
(scripts/validity_ceiling.py::measure) — if a generator change silently
restores an unlearnable ceiling, or the protocol and this pin drift apart,
a test fails.
"""

import numpy as np

from pharmaforge_tpu.data.synthetic import (make_sites_and_pharms,
                                            make_synthetic_pocket)
from scripts.validity_ceiling import measure


def test_truth_validity_is_one_both_rules():
    for rule in ("random", "deterministic"):
        m = measure(n_pockets=12, resamples=1, seed=11, site_rule=rule)
        assert float(np.mean(m["truth"])) == 1.0, rule


def test_random_rule_ceiling_is_bounded_away_from_one():
    """The default task has irreducible conditional entropy: the posterior
    resample must score well below 1 (measured 0.65 at n=128)."""
    m = measure(n_pockets=24, resamples=4, seed=11, site_rule="random")
    bayes = float(np.mean(m["bayes"]))
    assert 0.45 < bayes < 0.85, bayes


def test_deterministic_rule_ceiling_is_near_one():
    """The deterministic site rule makes sites inferable from the pocket:
    posterior resamples score ~1 (measured 0.999 at n=128)."""
    m = measure(n_pockets=24, resamples=4, seed=11,
                site_rule="deterministic")
    bayes = float(np.mean(m["bayes"]))
    assert bayes > 0.97, bayes


def test_floor_below_ceiling_random_rule():
    """The random-placement floor must stay below the Bayes ceiling, or
    validity stops discriminating learning from noise at all."""
    m = measure(n_pockets=24, resamples=4, seed=11, site_rule="random")
    assert float(np.mean(m["floor"])) < float(np.mean(m["bayes"]))


def test_deterministic_sites_are_pocket_functions():
    """Same pocket, independent rng -> identical site atoms and types
    (only the small positional jitter differs)."""
    rng = np.random.default_rng(3)
    center = rng.normal(scale=30.0, size=3)
    p_pos, p_elem = make_synthetic_pocket(rng, center, 120)
    qa, ta, _, _ = make_sites_and_pharms(
        np.random.default_rng(1), center, p_pos, p_elem, 5, 20,
        site_rule="deterministic")
    qb, tb, _, _ = make_sites_and_pharms(
        np.random.default_rng(2), center, p_pos, p_elem, 5, 20,
        site_rule="deterministic")
    np.testing.assert_array_equal(ta, tb)
    assert np.abs(qa - qb).max() < 2.0  # same atoms, jitter-only difference
