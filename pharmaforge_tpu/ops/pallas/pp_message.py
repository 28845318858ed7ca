"""Fused Pallas kernel: gathered edge-message chain + masked aggregation.

At full scale (reference model defaults: T=1000, n_convs=4 — reference
pharmacodiff.py:32, gvp.py), 83% of the sampling step's device time is the
MIDDLE convs' prot-prot message chains (measured, docs/performance.md):
conv0's pp work is pocket-group deduped and the last conv's prot tail is
pruned, but convs 1..n-2 legitimately run per-copy, and in plain XLA every
stage of the message GVP chain (reference gvp.py:540-550) materializes a
[B, P, K, 128]-class edge activation in HBM (~28 ms of a 33 ms step at the
full-scale bench workload).

This v2 kernel runs the whole per-edge computation for one destination tile
VMEM-resident, exploiting two structural facts the v1 kernel missed (v1
measured SLOWER end-to-end than the XLA path, 82.9 vs 111.7 samples/s,
because it spent 4 padded one-hot matmuls and [B,·,1]-layout copies per
tile):

* **pp edge descriptors are pocket-group-level during sampling**: the 30
  copies of a pocket share idx/mask/x_dir/rbf exactly (static pocket
  coords), so the kernel's grid is (groups, dst tiles, copies) with copies
  innermost — the one-hot gather matrix is built ONCE per (group, tile) in
  scratch and reused by all copies, and every edge-geometric term is
  precomputed at group level outside the kernel (30x less HBM traffic):
  `rterm = rbf @ W1_d + b1` and `dirterm = x_dir (x) Wh[0]`.
* **lane-packed small-channel math**: the GVP vector path is 16/17 channels
  wide; a [E,17]@[17,16] matmul wastes 7/8 of every 128-lane MXU pass. The
  three spatial planes are kept packed on the lane axis ([E, 3H]) and every
  vector-path matmul uses a block-diagonal kron(I3, W) weight — one MXU
  pass where v1 paid three — while channel norms become an exact 0/1-matrix
  matmul (sum of squared planes) instead of misaligned lane slicing.

Numerics match the XLA path (`EdgeMessageChain` + `_aggregate`) up to float
reassociation: the node-level precompute is IDENTICAL (computed by the same
XLA code and fed in), the per-edge math follows the same op order with the
same values (block-diagonal packing multiplies by the same weights; the
norm matmul sums the same three fp32 squares), and nonlinearities run in
fp32 exactly like the XLA chain (norm_no_nan semantics, reference
gvp.py:12-19). `message_agg_reference` is the jnp twin used by the parity
tests; non-TPU backends keep the unfused XLA path (models/conv.py gates on
`pallas_supported()`).

The forward is wrapped in `jax.custom_vjp` whose backward differentiates the
jnp twin — so the fused path is safe under `jax.grad` (training); the
backward simply pays unfused bytes, which only the forward-only sampling
chain needs to avoid.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

try:  # pallas only needed when the kernel actually lowers/interprets
    from jax.experimental import pallas as pl
except Exception:  # pragma: no cover
    pl = None

Array = jnp.ndarray


def pallas_supported() -> bool:
    """Pallas TPU lowering available on the default backend?"""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _auto_tile(k: int, dt) -> int:
    """Default destination-tile size (rows of the dst axis per grid step).

    Targets ~2048 flattened edge rows (tile_n * k) per tile at bf16: large
    enough that the ~14 MXU row-streaming passes of the chain amortize,
    small enough that the live set (double-buffered edge blocks, one-hot
    scratch, chain stages) stays inside the 16 MB scoped-VMEM stack. The
    live set is dominated by dt-typed [tile_n*k, ...] buffers, so it is
    ~2x at float32 — measured on v5e: tile 128 @ k=16 needs 17.2 MB at f32
    (compile-time scoped-vmem OOM) but fits with ~7 MB headroom at bf16 —
    hence the halved row target at f32 (the eval/validation path; sampling
    runs bf16)."""
    rows = 2048 if dt == jnp.bfloat16 else 1024
    return max(8, rows // max(k, 1))


def _kernel(*refs, s: int, v: int, h: int, k: int, tile_n: int,
            n_gvps: int, f32: bool, slice_norm: bool, concat_gate: bool):
    """refs: [tab_s, tab_v, idx, mask, rterm, dirterm,
              sum_h, w1_sh, wg, bg, rep_v, wu_bd,
              <layer j: wh_bd, sum_h, w1f, w1sh, b1, wg, bg, wu_bd> x (n-1),
              s_out, v_out, oh_scratch]

    Every vhj (layer j >= 1) is H-wide like vh (whj maps V -> H channels,
    reference gvp.py message-GVP parameter shapes), so all layers share the
    [3H, H] plane-sum matrix."""
    it = iter(refs)
    tab_s = next(it)[0]                       # [P_pad, S]
    tab_v = next(it)[0]                       # [P_pad, 3H]
    idx = next(it)[0]                         # [TK, 1] int32 (group-level)
    mask = next(it)[0]                        # [TK, 1] f32   (group-level)
    rterm = next(it)[0]                       # [TK, S]       (group-level)
    dirterm = next(it)[0]                     # [TK, 3H]      (group-level)
    sum_h, w1_sh, wg, bg, rep_v, wu_bd = (next(it)[...] for _ in range(6))
    layers = [tuple(next(it)[...] for _ in range(8))
              for _ in range(n_gvps - 1)]
    s_out = next(it)
    v_out = next(it)
    oh = next(it)                             # scratch [TK, P_pad] dt

    tk = tile_n * k
    dt = jnp.float32 if f32 else jnp.bfloat16
    acc = jnp.float32

    # the gather matrix depends only on (group, tile): build it once and
    # reuse across the C copies (grid is copies-innermost)
    @pl.when(pl.program_id(2) == 0)
    def _build_oh():
        cols = jax.lax.broadcasted_iota(jnp.int32, (tk, oh.shape[1]), 1)
        oh[...] = (cols == idx).astype(dt)

    def _dot(a, b):
        return jax.lax.dot(a, b, preferred_element_type=acc).astype(dt)

    def _norms(planes_packed, sum_mat):
        # fp32 channel norms over the three packed planes; clamp like
        # norm_no_nan (reference gvp.py:12-19). Two lowerings of the same
        # three-square sum: lane-offset slices summed on the VPU (default:
        # measured ~7% faster per call at every tile size on v5e despite
        # the non-128-aligned offsets — scripts/bench_pp_kernel.py), or a
        # 0/1-matrix matmul on the MXU (PHARMAFORGE_PP_NORM=matmul).
        sq = planes_packed.astype(jnp.float32) ** 2
        if slice_norm:
            w = sum_mat.shape[1]
            tot = sq[:, :w] + sq[:, w:2 * w] + sq[:, 2 * w:3 * w]
        else:
            tot = jax.lax.dot(sq, sum_mat,
                              preferred_element_type=jnp.float32)
        return jnp.sqrt(jnp.maximum(tot, 1e-8)).astype(dt)

    # fp32 nonlinearities: Mosaic cannot lower `logistic` on bf16 operands,
    # and fp32 transcendentals only tighten the bf16-mode numerics
    def _silu(x):
        xf = x.astype(jnp.float32)
        return (xf * jax.nn.sigmoid(xf)).astype(dt)

    def _sigmoid(x):
        return jax.nn.sigmoid(x.astype(jnp.float32)).astype(dt)

    def _rep3(g):
        # gate [TK, V] -> [TK, 3V]: each MXU matmul here costs a full
        # row-streaming pass regardless of its tiny dims, so replicating
        # on the lane axis with a VPU concat (like the slice-norm
        # lowering) drops a whole pass per GVP when it wins
        if concat_gate:
            return jnp.concatenate([g, g, g], axis=-1)
        return _dot(g, rep_v)

    oh_m = oh[...]
    g_s = _dot(oh_m, tab_s)                                    # [TK, S]
    g_v = _dot(oh_m, tab_v)                                    # [TK, 3H]

    # ---- finish GVP 0 per edge ------------------------------------------
    vh = g_v + dirterm                                         # [TK, 3H]
    sh = _norms(vh, sum_h)                                     # [TK, H]
    feats = _silu(g_s + rterm + _dot(sh, w1_sh))               # [TK, S]
    gate = _sigmoid(_dot(feats, wg) + bg)                      # [TK, V]
    vec = _rep3(gate) * _dot(vh, wu_bd)                        # [TK, 3V]

    # ---- message GVPs 1..n-1 --------------------------------------------
    for (wh_bd, sum_hj, w1f, w1sh, b1j, wgj, bgj, wu_bdj) in layers:
        vhj = _dot(vec, wh_bd)                                 # [TK, 3H]
        shj = _norms(vhj, sum_hj)                              # [TK, H]
        feats = _silu(_dot(feats, w1f) + _dot(shj, w1sh) + b1j)
        gate = _sigmoid(_dot(feats, wgj) + bgj)
        vec = _rep3(gate) * _dot(vhj, wu_bdj)

    # ---- masked sum over the K neighbor slots ---------------------------
    m = mask.astype(jnp.float32)                               # [TK, 1]
    fm = (feats.astype(jnp.float32) * m).reshape(tile_n, k, s)
    s_out[0] = jnp.sum(fm, axis=1)
    vm = (vec.astype(jnp.float32) * m).reshape(tile_n, k, 3 * v)
    v_out[0] = jnp.sum(vm, axis=1)


def _split_weights(layer_params: Sequence[tuple], s: int, r: int) -> tuple:
    """Re-slice the raw GVP parameter tensors (models/conv.py _GVPParams)
    into the kernel's 2-D blocks. Differentiable (plain slicing), so it
    lives OUTSIDE the custom_vjp boundary."""
    (wh, wu, (w1, b1), (wg, bg)) = layer_params[0]
    out = [wh[0][None, :], wu, w1[s:s + r], w1[s + r:], b1[None, :],
           wg, bg[None, :]]
    for (whj, wuj, (w1j, b1j), (wgj, bgj)) in layer_params[1:]:
        out += [whj, wuj, w1j[:s], w1j[s:], b1j[None, :], wgj, bgj[None, :]]
    return tuple(out)


def _pallas_impl(pre_s, vh_planes, idx, mask, x_dir, d_rbf, weights, *,
                 s, v, rbf_dim, compute_dtype, copies, tile_n, interpret):
    """Forward. Tables (pre_s, vh_planes) are per batch row [B, P, ...];
    edge descriptors (idx/mask/x_dir/d_rbf [G, Nd, K, ...]) may be at
    pocket-GROUP level with B = G * copies."""
    h = v + 1
    g2, nd, k = mask.shape
    b = pre_s.shape[0]
    if g2 * copies != b:
        raise ValueError(f"edge batch {g2} x copies {copies} != table "
                         f"batch {b}")
    p = pre_s.shape[1]
    dt = jnp.float32 if compute_dtype == "float32" else jnp.bfloat16
    f32 = compute_dtype == "float32"

    wh0, wu, w1_d, w1_sh, b1, wg, bg = weights[:7]
    layer_w = [weights[7 + 7 * j: 14 + 7 * j]
               for j in range((len(weights) - 7) // 7)]

    tile_n = int(os.environ.get("PHARMAFORGE_PP_TILE", tile_n or 0))
    if tile_n <= 0:
        tile_n = _auto_tile(k, dt)
    tile_n = min(tile_n, _round_up(nd, 8))
    nd_pad = _round_up(nd, tile_n)
    p_pad = _round_up(p, 128)

    # ---- per-copy node tables (packed lanes) ----------------------------
    padp = [(0, 0), (0, p_pad - p), (0, 0)]
    tab_s = jnp.pad(pre_s, padp).astype(dt)                    # [B,Pp,S]
    tab_v = jnp.pad(jnp.concatenate(list(vh_planes), axis=-1),
                    padp).astype(dt)                           # [B,Pp,3H]

    # ---- group-level edge precomputes -----------------------------------
    pad_n = nd_pad - nd

    def _pad_nd(a):
        if pad_n == 0:
            return a
        w = [(0, 0), (0, pad_n)] + [(0, 0)] * (a.ndim - 2)
        return jnp.pad(a, w)

    e = nd_pad * k
    idx_e = _pad_nd(idx.astype(jnp.int32)).reshape(g2, e, 1)
    mask_e = _pad_nd(mask.astype(jnp.float32)).reshape(g2, e, 1)
    rbf_e = _pad_nd(d_rbf).reshape(g2, e, rbf_dim).astype(dt)
    rterm = (jnp.einsum("geh,hs->ges", rbf_e, w1_d.astype(dt),
                        preferred_element_type=jnp.float32)
             + b1.astype(jnp.float32)).astype(dt)              # [G,E,S]
    xd_e = _pad_nd(x_dir).reshape(g2, e, 3).astype(dt)
    dirterm = jnp.concatenate(
        [xd_e[..., c:c + 1] * wh0.astype(dt) for c in range(3)],
        axis=-1)                                               # [G,E,3H]

    # ---- packed weights ---------------------------------------------------
    eye3 = jnp.eye(3, dtype=jnp.float32)
    sum_h = jnp.concatenate([jnp.eye(h, dtype=jnp.float32)] * 3, axis=0)
    rep_v = jnp.concatenate([jnp.eye(v, dtype=jnp.float32)] * 3,
                            axis=1).astype(dt)
    wu_bd = jnp.kron(eye3, wu.astype(jnp.float32)).astype(dt)  # [3H,3V]
    w_in = [sum_h, w1_sh.astype(dt), wg.astype(dt), bg.astype(dt),
            rep_v, wu_bd]
    for (whj, wuj, w1f, w1shj, b1j, wgj, bgj) in layer_w:
        # the layer's hidden vector width is whj's output dim (reference
        # GVP h_dim = max(vi, vo); shape-generic here like the twin)
        hj = whj.shape[1]
        sum_hj = jnp.concatenate([jnp.eye(hj, dtype=jnp.float32)] * 3,
                                 axis=0)
        w_in += [jnp.kron(eye3, whj.astype(jnp.float32)).astype(dt),
                 sum_hj, w1f.astype(dt), w1shj.astype(dt), b1j.astype(dt),
                 wgj.astype(dt), bgj.astype(dt),
                 jnp.kron(eye3, wuj.astype(jnp.float32)).astype(dt)]

    tk = tile_n * k
    grid = (g2, nd_pad // tile_n, copies)
    c = copies
    tab_spec = [pl.BlockSpec((1, p_pad, s), lambda i, j, cc: (i * c + cc, 0, 0)),
                pl.BlockSpec((1, p_pad, 3 * h),
                             lambda i, j, cc: (i * c + cc, 0, 0))]
    edge_spec = [pl.BlockSpec((1, tk, 1), lambda i, j, cc: (i, j, 0))] * 2 + [
        pl.BlockSpec((1, tk, s), lambda i, j, cc: (i, j, 0)),
        pl.BlockSpec((1, tk, 3 * h), lambda i, j, cc: (i, j, 0))]
    w_spec = [pl.BlockSpec(w.shape, lambda i, j, cc, n=w.ndim: (0,) * n)
              for w in w_in]
    out_spec = [
        pl.BlockSpec((1, tile_n, s), lambda i, j, cc: (i * c + cc, j, 0)),
        pl.BlockSpec((1, tile_n, 3 * v),
                     lambda i, j, cc: (i * c + cc, j, 0))]

    n_gvps = len(layer_w) + 1
    from jax.experimental.pallas import tpu as pltpu
    s_sum, v_packed = pl.pallas_call(
        functools.partial(_kernel, s=s, v=v, h=h, k=k, tile_n=tile_n,
                          n_gvps=n_gvps, f32=f32,
                          slice_norm=os.environ.get(
                              "PHARMAFORGE_PP_NORM", "slice") == "slice",
                          concat_gate=os.environ.get(
                              "PHARMAFORGE_PP_GATE", "concat") == "concat"),
        grid=grid,
        in_specs=tab_spec + edge_spec + w_spec,
        out_specs=out_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, nd_pad, s), jnp.float32),
            jax.ShapeDtypeStruct((b, nd_pad, 3 * v), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((tk, p_pad), dt)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(tab_s, tab_v, idx_e, mask_e, rterm, dirterm, *w_in)

    v_sum = v_packed[:, :nd].reshape(b, nd, 3, v).transpose(0, 1, 3, 2)
    return s_sum[:, :nd], v_sum


def _ref_impl(pre_s, vh_planes, idx, mask, x_dir, d_rbf, weights, *,
              s, v, rbf_dim, compute_dtype, copies=1, tile_n=0,
              interpret=False):
    """jnp twin of the kernel math (same values, same fp32 norms) — the
    test oracle AND the custom_vjp backward body. Group-level edge
    descriptors are expanded to per-copy rows here."""
    del tile_n, interpret
    dt = jnp.float32 if compute_dtype == "float32" else jnp.bfloat16
    p = pre_s.shape[1]
    if copies > 1:
        rep = lambda a: jnp.repeat(a, copies, axis=0)
        idx, mask, x_dir, d_rbf = rep(idx), rep(mask), rep(x_dir), rep(d_rbf)
    wh0, wu, w1_d, w1_sh, b1, wg, bg = [a.astype(dt) for a in weights[:7]]
    layers = [tuple(a.astype(dt) for a in weights[7 + 7 * j: 14 + 7 * j])
              for j in range((len(weights) - 7) // 7)]

    oh = jax.nn.one_hot(idx, p, dtype=dt)                    # [B,Nd,K,P]

    def _g(tab):
        return jnp.einsum("bnkp,bpd->bnkd", oh, tab.astype(dt),
                          preferred_element_type=jnp.float32).astype(dt)

    xd = x_dir.astype(dt)
    ps_g = _g(pre_s)
    vh = [_g(vh_planes[c]) + xd[..., c:c + 1] * wh0 for c in range(3)]

    def _dot(a, w):
        return jnp.einsum("bnkd,de->bnke", a, w,
                          preferred_element_type=jnp.float32).astype(dt)

    def _norms(planes):
        sq = sum(q.astype(jnp.float32) ** 2 for q in planes)
        return jnp.sqrt(jnp.maximum(sq, 1e-8)).astype(dt)

    # fp32 nonlinearities, matching the kernel exactly (see _kernel._silu)
    def _silu(x):
        xf = x.astype(jnp.float32)
        return (xf * jax.nn.sigmoid(xf)).astype(dt)

    def _sigmoid(x):
        return jax.nn.sigmoid(x.astype(jnp.float32)).astype(dt)

    sh = _norms(vh)
    rterm = (jnp.einsum("bnkh,hs->bnks", d_rbf.astype(dt), w1_d,
                        preferred_element_type=jnp.float32)
             + b1.astype(jnp.float32)).astype(dt)
    feats = _silu(ps_g + rterm + _dot(sh, w1_sh))
    gate = _sigmoid(_dot(feats, wg) + bg)
    vec = [gate * _dot(vh[c], wu) for c in range(3)]
    for (whj, wuj, w1f, w1sh, b1j, wgj, bgj) in layers:
        vhj = [_dot(vec[c], whj) for c in range(3)]
        shj = _norms(vhj)
        feats = _silu(_dot(feats, w1f) + _dot(shj, w1sh) + b1j)
        gj = _sigmoid(_dot(feats, wgj) + bgj)
        vec = [gj * _dot(vhj[c], wuj) for c in range(3)]

    m = mask.astype(jnp.float32)[..., None]
    s_sum = jnp.sum(feats.astype(jnp.float32) * m, axis=2)
    v_sum = jnp.stack(
        [jnp.sum(vec[c].astype(jnp.float32) * m, axis=2) for c in range(3)],
        axis=-1)
    return s_sum, v_sum


def fused_message_agg(pre_s: Array, vh_planes: Sequence[Array], edge,
                      layer_params: Sequence[tuple], *,
                      scalar_size: int, vector_size: int, rbf_dim: int,
                      compute_dtype: str = "float32", copies: int = 1,
                      tile_n: int = 0,
                      interpret: bool = False) -> Tuple[Array, Array]:
    """Fused (gather -> message chain -> masked K-sum) for a gathered edge
    type.

    pre_s:      [B, P, S]  node-level h_src @ W1_h (compute dtype)
    vh_planes:  3 x [B, P, H] node-level vector half-products
                v_src @ Wh[1:], one per spatial component (H = V + 1)
    edge:       EdgeData-like with idx/mask [G, Nd, K], x_dir, d_rbf at
                pocket-GROUP level when copies > 1 (B = G * copies): the
                batched-sampling layout where every group of `copies`
                consecutive batch rows shares one pocket's static pp
                adjacency/geometry (models/edges.py GroupedEdgeData)
    layer_params: raw GVP weight tuples from models/conv.py `_GVPParams`

    Returns pre-normalization aggregates (s_sum [B, Nd, S] fp32,
    v_sum [B, Nd, V, 3] fp32) — exactly `_aggregate(..., mean=False)`'s
    sums; the caller applies mean/constant/dynamic normalization.
    Differentiable: the backward runs through the jnp twin.
    """
    cfg = dict(s=scalar_size, v=vector_size, rbf_dim=rbf_dim,
               compute_dtype=compute_dtype, copies=copies, tile_n=tile_n,
               interpret=interpret)
    weights = _split_weights(layer_params, scalar_size, rbf_dim)

    fwd = functools.partial(_pallas_impl, **cfg)
    ref = functools.partial(_ref_impl, **cfg)
    f = jax.custom_vjp(fwd)
    f.defvjp(lambda *a: (fwd(*a), a),
             lambda res, ct: jax.vjp(ref, *res)[1](ct))
    return f(pre_s, tuple(vh_planes), edge.idx, edge.mask, edge.x_dir,
             edge.d_rbf, weights)


def message_agg_reference(pre_s: Array, vh_planes: Sequence[Array], edge,
                          layer_params: Sequence[tuple], *,
                          scalar_size: int, vector_size: int, rbf_dim: int,
                          compute_dtype: str = "float32", copies: int = 1
                          ) -> Tuple[Array, Array]:
    """Public jnp twin with the `fused_message_agg` signature (tests)."""
    weights = _split_weights(layer_params, scalar_size, rbf_dim)
    return _ref_impl(pre_s, tuple(vh_planes), edge.idx, edge.mask,
                     edge.x_dir, edge.d_rbf, weights,
                     s=scalar_size, v=vector_size, rbf_dim=rbf_dim,
                     compute_dtype=compute_dtype, copies=copies)
