"""Tests for the middle-conv pocket-copy CORRECTION path.

At full scale the per-copy prot-prot message chain of conv1 is ~half the
sampling step's device time (docs/performance.md round-5 trace). After
conv0, the prot state of the pocket copies diverges ONLY at the atoms that
received fp messages — the pf-listed atoms (reference dynamics_gvp.py
:206-215 builds fp as reversed pf pairs) — so conv1's pp messages can be
computed once per pocket group on a "clean" (fp-free) state, with a sparse
per-copy correction over the pp out-edges of the dirty atoms. These tests
pin the transpose builder and the numerical parity of the corrected
dataflow against the plain per-copy path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pharmaforge_tpu.models.edges import (EdgeData, build_pp_edge,
                                          build_pp_out_edges,
                                          max_pp_out_degree)


def _rand_pp(seed, g=3, p=17, k=5):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(g, p, 3)).astype(np.float32) * 2.0
    mask = rng.random((g, p)) > 0.15
    mask[:, 0] = True
    _, ed = build_pp_edge(jnp.asarray(x), jnp.asarray(mask), 3.5, k)
    return ed


def test_out_edges_transpose_exact():
    ed = _rand_pp(0)
    g, p, k = ed.idx.shape
    maxdeg = int(max_pp_out_degree(ed))
    k_out = maxdeg + 2
    out_eid, out_mask = jax.jit(
        lambda e: build_pp_out_edges(e, k_out))(ed)
    out_eid, out_mask = np.asarray(out_eid), np.asarray(out_mask)
    idx, msk = np.asarray(ed.idx), np.asarray(ed.mask)
    # oracle: set of flat edge ids per source
    for gg in range(g):
        for a in range(p):
            want = {d * k + kk for d in range(p) for kk in range(k)
                    if msk[gg, d, kk] and idx[gg, d, kk] == a}
            got = {int(e) for e, m in zip(out_eid[gg, a], out_mask[gg, a])
                   if m}
            assert got == want, (gg, a)
            # every listed edge is unique
            listed = out_eid[gg, a][out_mask[gg, a]]
            assert len(listed) == len(set(listed.tolist()))


def test_out_edges_overflow_drops_not_corrupts():
    ed = _rand_pp(1, g=2, p=12, k=6)
    maxdeg = int(max_pp_out_degree(ed))
    if maxdeg < 2:
        pytest.skip("degenerate graph")
    k_out = maxdeg - 1  # deliberately too small
    out_eid, out_mask = build_pp_out_edges(ed, k_out)
    out_eid, out_mask = np.asarray(out_eid), np.asarray(out_mask)
    idx, msk = np.asarray(ed.idx), np.asarray(ed.mask)
    g, p, k = idx.shape
    for gg in range(g):
        for a in range(p):
            want = {d * k + kk for d in range(p) for kk in range(k)
                    if msk[gg, d, kk] and idx[gg, d, kk] == a}
            got = {int(e) for e, m in zip(out_eid[gg, a], out_mask[gg, a])
                   if m}
            assert got <= want
            assert len(got) == min(len(want), k_out)


def test_max_out_degree_matches_numpy():
    ed = _rand_pp(2, g=2, p=23, k=7)
    idx, msk = np.asarray(ed.idx), np.asarray(ed.mask)
    g, p, k = idx.shape
    deg = np.zeros((g, p), np.int64)
    for gg in range(g):
        for d in range(p):
            for kk in range(k):
                if msk[gg, d, kk]:
                    deg[gg, idx[gg, d, kk]] += 1
    assert int(max_pp_out_degree(ed)) == int(deg.max())


def _grouped_batch(rng, copies=3, g=2, p=24):
    from tests.conftest import make_complex_batch
    b = g * copies
    batch = make_complex_batch(rng, b=b, p=p,
                               f_valid=(4, 4, 4, 6, 6, 6),
                               p_valid=(20,) * 3 + (24,) * 3)
    rep = lambda a: np.concatenate(
        [np.repeat(a[i * copies:i * copies + 1], copies, 0)
         for i in range(g)])
    return batch.replace(prot_x=rep(batch.prot_x),
                         prot_h=rep(batch.prot_h),
                         prot_mask=rep(batch.prot_mask))


@pytest.mark.parametrize("tables", [False, True])
def test_sampling_correction_matches_plain(rng, tables):
    """sample_given_receptor with the conv1 clean+correction path
    (pp_k_out probed) == the plain grouped fused path, end to end over the
    chain. n_convs=4 puts conv1 in the middle-conv regime the correction
    targets (compact_at=2)."""
    from pharmaforge_tpu.models.diffusion import (DiffusionConfig,
                                                  PharmacophoreDiffusion)

    copies = 3
    batch = _grouped_batch(rng, copies=copies)
    cfg = DiffusionConfig(n_timesteps=3, n_convs=4, vector_size=4,
                          n_hidden_scalars=16, message_norm="mean",
                          n_message_gvps=2, n_update_gvps=1, n_noise_gvps=2,
                          pf_k=4, pp_k_max=8, fused_pp="interpret",
                          precompute_step_tables=tables)
    model = PharmacophoreDiffusion(cfg)
    params = model.init_params(jax.random.key(0), batch)

    reps = lambda a: jnp.asarray(a).reshape(
        (2, copies) + a.shape[1:])[:, 0]
    _, ed_g = build_pp_edge(reps(batch.prot_x), reps(batch.prot_mask),
                            model.cutoffs["pp"], cfg.pp_k_max)
    k_out = int(max_pp_out_degree(ed_g)) + 1

    out_c = model.sample_given_receptor(params, batch, jax.random.key(7),
                                        pocket_group_size=copies,
                                        pp_k_out=k_out)
    out_p = model.sample_given_receptor(params, batch, jax.random.key(7),
                                        pocket_group_size=copies,
                                        pp_k_out=0)
    np.testing.assert_allclose(np.asarray(out_c["pharm_x"]),
                               np.asarray(out_p["pharm_x"]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_c["pharm_h"]),
                               np.asarray(out_p["pharm_h"]),
                               rtol=2e-4, atol=2e-4)


def test_correction_handles_duplicate_dirty_slots(rng):
    """Two pharm centers sharing pf neighbors (tiny pocket, pf_k large)
    must not double-count the shared atoms' out-edge corrections."""
    from pharmaforge_tpu.models.diffusion import (DiffusionConfig,
                                                  PharmacophoreDiffusion)

    copies = 2
    batch = _grouped_batch(rng, copies=copies, g=2, p=12)
    cfg = DiffusionConfig(n_timesteps=2, n_convs=4, vector_size=4,
                          n_hidden_scalars=16, message_norm="mean",
                          n_message_gvps=2, n_update_gvps=1, n_noise_gvps=2,
                          pf_k=8, pp_k_max=6, fused_pp="interpret")
    model = PharmacophoreDiffusion(cfg)
    params = model.init_params(jax.random.key(1), batch)
    out_c = model.sample_given_receptor(params, batch, jax.random.key(3),
                                        pocket_group_size=copies,
                                        pp_k_out=16)
    out_p = model.sample_given_receptor(params, batch, jax.random.key(3),
                                        pocket_group_size=copies,
                                        pp_k_out=0)
    np.testing.assert_allclose(np.asarray(out_c["pharm_x"]),
                               np.asarray(out_p["pharm_x"]),
                               rtol=2e-4, atol=2e-4)
