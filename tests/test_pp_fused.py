"""Fused Pallas prot-prot message kernel (ops/pallas/pp_message.py):
parity of (gather -> message GVP chain -> masked aggregation) against the
unfused XLA path at every level — raw chain, full hetero conv, whole
denoiser forward — plus gradient flow through the custom_vjp.

All kernel invocations here run interpreted (CPU); the TPU lowering shares
the exact same trace. The unfused oracle is the production XLA path, which
is itself pinned to the reference semantics (reference gvp.py:540-550) by
tests/test_torch_parity.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pharmaforge_tpu.models.conv import (
    EdgeMessageChain,
    GVPMultiEdgeConv,
    _aggregate,
)
from pharmaforge_tpu.models.edges import EdgeData
from pharmaforge_tpu.ops.geometry import rbf


def make_edge(rng, b, nd, p, k, rbf_dim=16):
    idx = rng.integers(0, p, size=(b, nd, k)).astype(np.int32)
    mask = (rng.random((b, nd, k)) < 0.8).astype(np.float32)
    mask[:, -2:] = 0.0  # padded destination rows: no valid edges at all
    d = rng.uniform(0.5, 10.0, size=(b, nd, k)).astype(np.float32)
    x_dir = rng.normal(size=(b, nd, k, 3)).astype(np.float32)
    x_dir /= np.linalg.norm(x_dir, axis=-1, keepdims=True)
    return EdgeData(mask=jnp.asarray(mask), idx=jnp.asarray(idx),
                    x_dir=jnp.asarray(x_dir),
                    d_rbf=rbf(jnp.asarray(d), d_count=rbf_dim))


@pytest.mark.parametrize("dtype,rtol,atol", [
    ("float32", 1e-5, 1e-5), ("bfloat16", 0.08, 0.05),
])
def test_chain_fused_matches_unfused(rng, dtype, rtol, atol):
    """EdgeMessageChain(fused_aggregate='interpret') == unfused chain +
    _aggregate pre-norm sums, identical params."""
    b, p, nd, k, s, v = 2, 23, 19, 5, 32, 8
    chain = EdgeMessageChain(scalar_size=s, vector_size=v,
                             n_message_gvps=3, compute_dtype=dtype)
    h_src = jnp.asarray(rng.normal(size=(b, p, s)).astype(np.float32))
    v_src = jnp.asarray(
        rng.normal(scale=0.5, size=(b, p, v, 3)).astype(np.float32))
    edge = make_edge(rng, b, nd, p, k)
    params = chain.init(jax.random.key(0), h_src, v_src, edge)

    s_msg, v_msg = chain.apply(params, h_src, v_src, edge)
    s_ref, v_ref, _ = _aggregate(s_msg.astype(jnp.float32),
                                 v_msg.astype(jnp.float32),
                                 edge.mask, mean=False)
    s_f, v_f = chain.apply(params, h_src, v_src, edge,
                           fused_aggregate="interpret")
    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_ref),
                               rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(v_f), np.asarray(v_ref),
                               rtol=rtol, atol=atol)


def test_kernel_matches_reference_twin(rng):
    """Interpreted kernel == jnp twin (the custom_vjp backward body) —
    guarantees the backward differentiates the same function the kernel
    computes."""
    from pharmaforge_tpu.ops.pallas import pp_message as ppm
    b, p, nd, k, s, v = 2, 17, 11, 4, 16, 4
    h = v + 1
    n_gvps = 2
    pre_s = jnp.asarray(rng.normal(size=(b, p, s)).astype(np.float32))
    planes = [jnp.asarray(rng.normal(size=(b, p, h)).astype(np.float32))
              for _ in range(3)]
    edge = make_edge(rng, b, nd, p, k, rbf_dim=8)

    def mk(shape):
        return jnp.asarray(rng.normal(scale=0.3, size=shape)
                           .astype(np.float32))

    layer_params = [(mk((h, h)), mk((h, v)), (mk((s + 8 + h, s)), mk((s,))),
                     (mk((s, v)), mk((v,))))]
    for _ in range(n_gvps - 1):
        layer_params.append((mk((v, h)), mk((h, v)),
                             (mk((s + h, s)), mk((s,))),
                             (mk((s, v)), mk((v,)))))
    kw = dict(scalar_size=s, vector_size=v, rbf_dim=8)
    s_k, v_k = ppm.fused_message_agg(pre_s, planes, edge, layer_params,
                                     interpret=True, **kw)
    s_r, v_r = ppm.message_agg_reference(pre_s, planes, edge, layer_params,
                                         **kw)
    np.testing.assert_allclose(np.asarray(s_k), np.asarray(s_r),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_k), np.asarray(v_r),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("message_norm", ["mean", 10, 0])
def test_conv_fused_matches_unfused(rng, message_norm):
    """GVPMultiEdgeConv(fused_pp='interpret') == unfused, all norm modes.
    Source vectors are nonzero (middle-conv regime)."""
    from tests.conftest import make_complex_batch
    from pharmaforge_tpu.models.edges import build_edge_bundle
    from pharmaforge_tpu.ops.neighbors import build_pp_neighbors

    batch = make_complex_batch(rng, b=2, p=30, f_valid=(5, 7),
                               p_valid=(26, 30))
    s, v = 32, 8
    prot_x = jnp.asarray(batch.prot_x)
    prot_m = jnp.asarray(batch.prot_mask)
    pharm_x = jnp.asarray(batch.pharm_x)
    pharm_m = jnp.asarray(batch.pharm_mask)
    pp = build_pp_neighbors(prot_x, prot_m, 3.5, 8)
    bundle = build_edge_bundle(
        pharm_x, pharm_m, prot_x, prot_m,
        {"pp": 3.5, "pf": 8.0, "fp": 8.0, "ff": 9.0},
        ff_k=0, pf_k=0, pp_nbrs=pp)

    def feats(n, d):
        hh = jnp.asarray(rng.normal(size=(2, n, s)).astype(np.float32))
        vv = jnp.asarray(rng.normal(scale=0.4, size=(2, n, v, 3))
                         .astype(np.float32))
        return (hh * d[..., None], None, vv * d[..., None, None])

    node_feats = {"pharm": feats(pharm_m.shape[1], pharm_m)[:1]
                  + (pharm_x,) + feats(pharm_m.shape[1], pharm_m)[2:],
                  "prot": feats(prot_m.shape[1], prot_m)[:1]
                  + (prot_x,) + feats(prot_m.shape[1], prot_m)[2:]}
    node_masks = {"pharm": pharm_m, "prot": prot_m}

    def run(fused):
        conv = GVPMultiEdgeConv(scalar_size=s, vector_size=v,
                                n_message_gvps=3, n_update_gvps=1,
                                message_norm=message_norm, fused_pp=fused)
        params = conv.init(jax.random.key(1), node_feats, node_masks, bundle)
        return conv.apply(params, node_feats, node_masks, bundle), params

    (out_f, p_f), (out_u, p_u) = run("interpret"), run(False)
    chex_equal = jax.tree_util.tree_all(jax.tree.map(
        lambda a, b: bool(jnp.all(a == b)), p_f, p_u))
    assert chex_equal, "fused flag must not change the parameter tree"
    for nt in ("pharm", "prot"):
        for i in (0, 2):
            np.testing.assert_allclose(
                np.asarray(out_f[nt][i]), np.asarray(out_u[nt][i]),
                rtol=2e-4, atol=2e-5,
                err_msg=f"{nt}[{i}] fused != unfused")


def test_dynamics_forward_fused_matches(rng):
    """Whole denoiser forward at n_convs=3 (one genuine middle conv):
    fused_pp='interpret' == fused_pp=False."""
    from tests.conftest import make_complex_batch
    from pharmaforge_tpu.models.diffusion import (DiffusionConfig,
                                                  PharmacophoreDiffusion)
    from pharmaforge_tpu.ops.neighbors import build_pp_neighbors

    batch = make_complex_batch(rng, b=3, p=40, f_valid=(5, 3, 8),
                               p_valid=(36, 28, 40))
    base = dict(n_timesteps=6, n_convs=3, vector_size=8,
                n_hidden_scalars=32, message_norm="mean",
                n_message_gvps=2, n_update_gvps=1, n_noise_gvps=2,
                pf_k=4, pp_k_max=8)
    m_f = PharmacophoreDiffusion(DiffusionConfig(**base,
                                                 fused_pp="interpret"))
    m_u = PharmacophoreDiffusion(DiffusionConfig(**base, fused_pp=False))
    params = m_f.init_params(jax.random.key(0), batch)
    pp = build_pp_neighbors(jnp.asarray(batch.prot_x),
                            jnp.asarray(batch.prot_mask), 3.5, 8)
    t = jnp.asarray([0.3, 0.7, 0.1])
    args = (jnp.asarray(batch.pharm_h), jnp.asarray(batch.pharm_x),
            jnp.asarray(batch.pharm_mask), jnp.asarray(batch.prot_h),
            jnp.asarray(batch.prot_x), jnp.asarray(batch.prot_mask), t, pp)
    h_f, x_f = m_f.dynamics.apply({"params": params}, *args,
                                  deterministic=True)
    h_u, x_u = m_u.dynamics.apply({"params": params}, *args,
                                  deterministic=True)
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_u),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_u),
                               rtol=1e-4, atol=1e-5)


def test_grouped_edge_matches_expanded(rng):
    """GroupedEdgeData (pocket-group-level descriptors, copies>1) through
    the fused path == the same chain on the expanded per-copy EdgeData —
    the batched-sampling layout where the kernel reuses one gather matrix
    across the copies of a pocket."""
    from pharmaforge_tpu.models.edges import GroupedEdgeData
    g2, copies, p, nd, k, s, v = 2, 3, 23, 19, 5, 32, 8
    b = g2 * copies
    chain = EdgeMessageChain(scalar_size=s, vector_size=v, n_message_gvps=3)
    h_src = jnp.asarray(rng.normal(size=(b, p, s)).astype(np.float32))
    v_src = jnp.asarray(
        rng.normal(scale=0.5, size=(b, p, v, 3)).astype(np.float32))
    edge_g = make_edge(rng, g2, nd, p, k)
    grouped = GroupedEdgeData(mask=edge_g.mask, idx=edge_g.idx,
                              x_dir=edge_g.x_dir, d_rbf=edge_g.d_rbf,
                              copies=copies)
    params = chain.init(jax.random.key(0), h_src, v_src, grouped.expand())

    s_g, v_g = chain.apply(params, h_src, v_src, grouped,
                           fused_aggregate="interpret")
    s_e, v_e = chain.apply(params, h_src, v_src, grouped.expand(),
                           fused_aggregate="interpret")
    np.testing.assert_allclose(np.asarray(s_g), np.asarray(s_e),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_g), np.asarray(v_e),
                               rtol=1e-5, atol=1e-5)


def test_sampling_grouped_fused_matches_ungrouped(rng):
    """sample_given_receptor(pocket_group_size=C) with the fused kernel
    (interpret) == pocket_group_size=1 with it — the full-scale sampling
    integration of the grouped fused path."""
    from tests.conftest import make_complex_batch
    from pharmaforge_tpu.models.diffusion import (DiffusionConfig,
                                                  PharmacophoreDiffusion)

    copies = 3
    batch = make_complex_batch(rng, b=2 * copies, p=24,
                               f_valid=(4, 4, 4, 6, 6, 6),
                               p_valid=(20,) * 3 + (24,) * 3)
    # rows must be pocket-major groups of identical pockets
    import numpy as _np
    batch = batch.replace(
        prot_x=_np.concatenate([_np.repeat(batch.prot_x[0:1], 3, 0),
                                _np.repeat(batch.prot_x[3:4], 3, 0)]),
        prot_h=_np.concatenate([_np.repeat(batch.prot_h[0:1], 3, 0),
                                _np.repeat(batch.prot_h[3:4], 3, 0)]),
        prot_mask=_np.concatenate([_np.repeat(batch.prot_mask[0:1], 3, 0),
                                   _np.repeat(batch.prot_mask[3:4], 3, 0)]))
    cfg = DiffusionConfig(n_timesteps=4, n_convs=3, vector_size=4,
                          n_hidden_scalars=16, message_norm="mean",
                          n_message_gvps=2, n_update_gvps=1, n_noise_gvps=2,
                          pf_k=4, pp_k_max=8, fused_pp="interpret")
    model = PharmacophoreDiffusion(cfg)
    params = model.init_params(jax.random.key(0), batch)
    out_g = model.sample_given_receptor(params, batch, jax.random.key(7),
                                        pocket_group_size=copies)
    out_u = model.sample_given_receptor(params, batch, jax.random.key(7),
                                        pocket_group_size=1)
    np.testing.assert_allclose(np.asarray(out_g["pharm_x"]),
                               np.asarray(out_u["pharm_x"]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_g["pharm_h"]),
                               np.asarray(out_u["pharm_h"]),
                               rtol=2e-4, atol=2e-4)


def _loss_weights(ppm, layer_params, pre_s, planes, edge, kw):
    """Scalar loss through fused_message_agg as a function of everything
    differentiable (node tables + raw weight tensors)."""

    def loss(args):
        pre, pl_, lp = args
        s_a, v_a = ppm.fused_message_agg(pre, pl_, edge, lp,
                                         interpret=True, **kw)
        return jnp.sum(s_a ** 2) + jnp.sum(jnp.sin(v_a))

    return loss


def _twin_loss(ppm, pre_s, planes, edge, kw):
    def loss(args):
        pre, pl_, lp = args
        s_a, v_a = ppm.message_agg_reference(pre, pl_, edge, lp, **kw)
        return jnp.sum(s_a ** 2) + jnp.sum(jnp.sin(v_a))

    return loss


@pytest.mark.parametrize("copies", [1, 3])
def test_bwd_kernel_matches_twin_grads(rng, copies):
    """The Pallas backward kernel's gradients (interpret mode) == autodiff
    through the jnp twin, for node tables AND every raw weight tensor, at
    f32 — the training-grade path (VERDICT r4 #1)."""
    from pharmaforge_tpu.ops.pallas import pp_message as ppm
    assert ppm.bwd_kernel_enabled()
    g2, p, nd, k, s, v = 2, 17, 11, 4, 16, 4
    b = g2 * copies
    h = v + 1
    n_gvps = 3
    pre_s = jnp.asarray(rng.normal(size=(b, p, s)).astype(np.float32))
    planes = tuple(
        jnp.asarray(rng.normal(size=(b, p, h)).astype(np.float32))
        for _ in range(3))
    edge_full = make_edge(rng, g2, nd, p, k, rbf_dim=8)
    if copies > 1:
        from pharmaforge_tpu.models.edges import GroupedEdgeData
        edge = GroupedEdgeData(mask=edge_full.mask, idx=edge_full.idx,
                               x_dir=edge_full.x_dir, d_rbf=edge_full.d_rbf,
                               copies=copies)
    else:
        edge = edge_full

    def mk(shape):
        return jnp.asarray(rng.normal(scale=0.3, size=shape)
                           .astype(np.float32))

    layer_params = [(mk((h, h)), mk((h, v)), (mk((s + 8 + h, s)), mk((s,))),
                     (mk((s, v)), mk((v,))))]
    for _ in range(n_gvps - 1):
        layer_params.append((mk((v, h)), mk((h, v)),
                             (mk((s + h, s)), mk((s,))),
                             (mk((s, v)), mk((v,)))))
    kw = dict(scalar_size=s, vector_size=v, rbf_dim=8, copies=copies)

    args = (pre_s, planes, layer_params)
    g_f = jax.grad(_loss_weights(ppm, layer_params, pre_s, planes, edge,
                                 kw))(args)
    kw_twin = dict(kw)
    g_t = jax.grad(_twin_loss(ppm, pre_s, planes, edge, kw_twin))(args)
    flat_f, tree_f = jax.tree_util.tree_flatten(g_f)
    flat_t, tree_t = jax.tree_util.tree_flatten(g_t)
    assert tree_f == tree_t
    for i, (a, bb) in enumerate(zip(flat_f, flat_t)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=2e-4, atol=2e-5,
            err_msg=f"grad leaf {i} (pallas bwd vs twin autodiff)")


def test_bwd_kernel_bf16_close(rng):
    """bf16-mode backward kernel stays within bf16-class tolerance of the
    f32 twin autodiff (the regime check, not bit parity)."""
    from pharmaforge_tpu.ops.pallas import pp_message as ppm
    b, p, nd, k, s, v = 2, 17, 11, 4, 16, 4
    h = v + 1
    pre_s = jnp.asarray(rng.normal(size=(b, p, s)).astype(np.float32))
    planes = tuple(
        jnp.asarray(rng.normal(size=(b, p, h)).astype(np.float32))
        for _ in range(3))
    edge = make_edge(rng, b, nd, p, k, rbf_dim=8)

    def mk(shape):
        return jnp.asarray(rng.normal(scale=0.3, size=shape)
                           .astype(np.float32))

    layer_params = [(mk((h, h)), mk((h, v)), (mk((s + 8 + h, s)), mk((s,))),
                     (mk((s, v)), mk((v,))))]
    layer_params.append((mk((v, h)), mk((h, v)),
                         (mk((s + h, s)), mk((s,))), (mk((s, v)), mk((v,)))))
    args = (pre_s, planes, layer_params)
    kw16 = dict(scalar_size=s, vector_size=v, rbf_dim=8,
                compute_dtype="bfloat16")
    kw32 = dict(scalar_size=s, vector_size=v, rbf_dim=8)
    g_f = jax.grad(_loss_weights(ppm, layer_params, pre_s, planes, edge,
                                 kw16))(args)
    g_t = jax.grad(_twin_loss(ppm, pre_s, planes, edge, kw32))(args)
    for a, bb in zip(jax.tree_util.tree_leaves(g_f),
                     jax.tree_util.tree_leaves(g_t)):
        aa, bn = np.asarray(a), np.asarray(bb)
        denom = np.maximum(np.abs(bn), 1.0)
        # bf16 rounding noise: the bf16 TWIN autodiff shows the same ~0.17
        # max deviation from the f32 twin on this workload, so this bounds
        # quantization, not kernel error (f32 parity is the exact check)
        assert np.max(np.abs(aa - bn) / denom) < 0.25


def test_bwd_fallback_twin(rng, monkeypatch):
    """PHARMAFORGE_PP_BWD=0 restores the twin backward (true geometry
    cotangents path) and still differentiates cleanly."""
    monkeypatch.setenv("PHARMAFORGE_PP_BWD", "0")
    from pharmaforge_tpu.ops.pallas import pp_message as ppm
    assert not ppm.bwd_kernel_enabled()
    b, p, nd, k, s, v = 1, 9, 5, 3, 16, 4
    h = v + 1
    pre_s = jnp.asarray(rng.normal(size=(b, p, s)).astype(np.float32))
    planes = tuple(
        jnp.asarray(rng.normal(size=(b, p, h)).astype(np.float32))
        for _ in range(3))
    edge = make_edge(rng, b, nd, p, k, rbf_dim=8)

    def mk(shape):
        return jnp.asarray(rng.normal(scale=0.3, size=shape)
                           .astype(np.float32))

    layer_params = [(mk((h, h)), mk((h, v)), (mk((s + 8 + h, s)), mk((s,))),
                     (mk((s, v)), mk((v,))))]
    kw = dict(scalar_size=s, vector_size=v, rbf_dim=8)
    g = jax.grad(_loss_weights(ppm, layer_params, pre_s, planes, edge,
                               kw))((pre_s, planes, layer_params))
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))


def test_fused_gradients_flow(rng):
    """jax.grad through the fused path (custom_vjp backward = jnp twin)
    matches the unfused gradients."""
    b, p, nd, k, s, v = 2, 15, 9, 4, 16, 4
    chain = EdgeMessageChain(scalar_size=s, vector_size=v, n_message_gvps=2)
    h_src = jnp.asarray(rng.normal(size=(b, p, s)).astype(np.float32))
    v_src = jnp.asarray(
        rng.normal(scale=0.5, size=(b, p, v, 3)).astype(np.float32))
    edge = make_edge(rng, b, nd, p, k)
    params = chain.init(jax.random.key(0), h_src, v_src, edge)

    def loss(pr, fused):
        kw = dict(fused_aggregate="interpret") if fused else {}
        out = chain.apply(pr, h_src, v_src, edge, **kw)
        if fused:
            s_a, v_a = out
        else:
            s_a, v_a, _ = _aggregate(out[0].astype(jnp.float32),
                                     out[1].astype(jnp.float32),
                                     edge.mask, mean=False)
        return jnp.sum(s_a ** 2) + jnp.sum(v_a ** 2)

    g_f = jax.grad(lambda pr: loss(pr, True))(params)
    g_u = jax.grad(lambda pr: loss(pr, False))(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5),
        g_f, g_u)


def test_auto_tile_is_dtype_aware():
    """Scoped-VMEM regression (full-scale f32 validation OOM): the kernel's
    live set is dominated by dt-typed [tile_n*k, ...] buffers, so the auto
    tile must keep a much smaller edge-row budget at float32 (measured on
    v5e at k=16: tile 128 @ f32 needs 17.2 MB scoped VMEM > the 16 MB
    limit; tile 64 @ f32 fits; bf16 runs fine at 4x those rows — round-5
    sweep, docs/performance.md)."""
    from pharmaforge_tpu.ops.pallas import pp_message as ppm
    assert ppm._auto_tile(16, jnp.bfloat16) == 128
    assert ppm._auto_tile(16, jnp.float32) == 64
    # never degenerate, even at huge fan-in
    assert ppm._auto_tile(512, jnp.float32) == 8


def test_choose_tile_cost_model():
    """The cost-model tile chooser must (a) respect the f32 VMEM budget,
    (b) avoid the padding trap (nd=230 must not pick a tile that pads the
    dst axis to 384 — measured 1.5x slower), (c) never degenerate."""
    from pharmaforge_tpu.ops.pallas import pp_message as ppm
    t_bf = ppm._choose_tile(230, 16, jnp.bfloat16)
    # 2048-row scoped-VMEM ceiling: 3712/4096-row tiles are verified
    # compile-time OOMs at the production shape (round 5)
    assert t_bf * 16 <= 2048
    # whatever it picks must pad 230 to at most 256 rows
    pad = -230 % t_bf
    assert 230 + pad <= 256, (t_bf, pad)
    assert ppm._choose_tile(230, 16, jnp.float32) * 16 <= 1024
    assert ppm._choose_tile(40, 16, jnp.bfloat16) == 40  # compact call
    assert ppm._choose_tile(8, 16, jnp.float32) == 8
