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

The forward is wrapped in `jax.custom_vjp`. The backward is a SECOND Pallas
kernel (`_bwd_kernel`): flash-attention-style, it re-runs the forward chain
per destination tile VMEM-resident, backpropagates through it in VMEM, and
emits only node-level table gradients (scatter = transposed one-hot matmul,
accumulated across destination tiles while the batch row's block stays in
VMEM) plus small accumulated weight gradients — so TRAINING pays fused HBM
bytes in both directions (reference training hot loop gvp.py:540-550
fwd+bwd). `PHARMAFORGE_PP_BWD=0` falls back to differentiating the jnp twin
(the original backward, which re-materializes the unfused chain). The
backward kernel returns ZERO cotangents for the edge geometry
(idx/mask/x_dir/d_rbf): those are functions of coordinates, which no loss in
this framework differentiates (parameters only); the twin fallback keeps
true geometry gradients for any future coordinate-differentiating use.

Tuning env vars (`PHARMAFORGE_PP_TILE`, `PHARMAFORGE_PP_NORM`,
`PHARMAFORGE_PP_GATE`) are read at TRACE time: they bake into the jitted
program, so changing them after a jit cache entry exists has no effect
until the cache is invalidated (new process or `jax.clear_caches()`), and
they must be identical across hosts/processes or the "same" jitted function
lowers differently per host. They exist for kernel benchmarking
(scripts/bench_pp_kernel.py sets them before first trace); production runs
should leave them unset and take the measured defaults.
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


def bwd_kernel_enabled() -> bool:
    """Run the fused Pallas BACKWARD kernel under jax.grad?

    On by default (the training-grade path). `PHARMAFORGE_PP_BWD=0` falls
    back to differentiating the jnp twin — unfused bytes, but true
    geometry cotangents. Read at TRACE time (same caveat as the tile vars).
    """
    return os.environ.get("PHARMAFORGE_PP_BWD", "1") != "0"


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _auto_tile(k: int, dt) -> int:
    """Default destination-tile size (rows of the dst axis per grid step).

    bf16 targets ~2048 flattened edge rows (tile_n * k) per tile — the
    scoped-VMEM ceiling, not a latency optimum: Mosaic's compile-time
    stack accounting at the production shape (nd=230, k=16, S=128) charges
    ~4.8 KB per edge row, so 2048 rows ≈ 10 MB fits the 16 MB scoped
    limit while 3712 rows (tile 232) hits 17.9 MB and 4096 rows (tile
    256) 23.4 MB — both VERIFIED compile-time vmem OOMs on the v5e
    compile service (round 5; an earlier microbench claim that 4096 rows
    fit was wrong). float32 keeps the halved 1024-row target: tile 128 @
    k=16 needs 17.2 MB at f32 — the eval/validation path; sampling runs
    bf16."""
    rows = 2048 if dt == jnp.bfloat16 else 1024
    return max(8, rows // max(k, 1))


def _choose_tile(nd: int, k: int, dt) -> int:
    """Pick the tile minimizing the measured per-call cost model:

        cost(t) = padded_rows * c_row + grid_steps * c_step

    with c_row ~= 3.1 ns/edge-row (chain compute at bf16) and c_step ~=
    2.9 us of fixed per-grid-step overhead (both fenced on v5e,
    scripts/bench_pp_kernel.py round 5). This also avoids the padding trap
    the plain row-target heuristic falls into (e.g. nd=230 with tile 192
    pads the dst axis to 384 rows of dead chain work).

    Candidates stay on multiples of 64 (the measured tile family;
    off-family tiles like 232 sent Mosaic compile time from ~8 to >25
    min on the axon compile service) — except small destinations
    (nd_pad8 < 64, e.g. the pre-compacted call's 40 slots), which keep
    the exact one-tile shape round 4 measured. The `_auto_tile` row
    budget is a hard scoped-VMEM ceiling (see its docstring: >2048 bf16
    rows is a verified compile-time OOM), so the model only ever chooses
    within the known-compiling family."""
    nd8 = _round_up(nd, 8)
    budget = _auto_tile(k, dt)
    if min(budget, nd8) <= 64:
        return min(budget, nd8)
    # a tile slightly above nd is fine (the dst axis pads to one tile:
    # nd=230 @ tile 256 is the measured best full-scale shape)
    t_max = min(budget, _round_up(nd, 64))
    best, best_cost = 64, float("inf")
    for t in range(64, t_max + 1, 64):
        nd_pad = _round_up(nd, t)
        cost = nd_pad * k * 3.1 + (nd_pad // t) * 2900.0
        if cost < best_cost - 1e-9:
            best, best_cost = t, cost
    return best


def _kernel(*refs, s: int, v: int, h: int, k: int, tile_n: int,
            n_gvps: int, f32: bool, slice_norm: bool, concat_gate: bool,
            act: str = "f32"):
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
    # bf16 operands MUST carry an explicit DEFAULT precision: without it
    # the caller's global jax_default_matmul_precision leaks into the
    # kernel, and an unset global emits contract_precision<fp32> on bf16
    # vectors — which Mosaic rejects ("Bad lhs type"; hit by the eval CLI,
    # which unlike bench.py does not set the global to bfloat16). f32 mode
    # keeps the inherited precision it has always run with.
    prec = None if f32 else jax.lax.Precision.DEFAULT

    # the gather matrix depends only on (group, tile): build it once and
    # reuse across the C copies (grid is copies-innermost)
    @pl.when(pl.program_id(2) == 0)
    def _build_oh():
        cols = jax.lax.broadcasted_iota(jnp.int32, (tk, oh.shape[1]), 1)
        oh[...] = (cols == idx).astype(dt)

    def _dot(a, b):
        return jax.lax.dot(a, b, preferred_element_type=acc,
                           precision=prec).astype(dt)

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

    # fp32 nonlinearities by default: Mosaic cannot lower `logistic` on
    # bf16 operands, and fp32 transcendentals only tighten the bf16-mode
    # numerics. PHARMAFORGE_PP_ACT variants exist for kernel-cost
    # experiments: "bf16" computes exp on bf16 operands (looser numerics),
    # "none" replaces the transcendentals with cheap linear ops — WRONG
    # results, a diagnostic to measure the transcendental share only.
    if act == "bf16":
        def _sigmoid(x):
            e = jnp.exp(-(x.astype(dt)))
            return (1.0 / (1.0 + e.astype(jnp.float32))).astype(dt)

        def _silu(x):
            return x * _sigmoid(x)
    elif act == "none":
        def _silu(x):
            return x * 0.5

        def _sigmoid(x):
            return x * 0.25 + 0.5
    else:
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
        tile_n = _choose_tile(nd, k, dt)  # may exceed nd (one padded tile)
    else:
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
                              "PHARMAFORGE_PP_GATE", "concat") == "concat",
                          act=os.environ.get("PHARMAFORGE_PP_ACT", "f32")),
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


def _auto_tile_bwd(k: int, dt) -> int:
    """Destination-tile size for the BACKWARD kernel. The live set is
    roughly 2.5x the forward's (stored chain stages + cotangent buffers +
    node-grad accumulator blocks), so the edge-row target halves relative
    to `_auto_tile`."""
    rows = 1024 if dt == jnp.bfloat16 else 512
    return max(8, rows // max(k, 1))


def _bwd_kernel(*refs, s: int, v: int, h: int, k: int, tile_n: int,
                n_gvps: int, f32: bool):
    """Backward of `_kernel`: recompute the forward chain for one
    destination tile in VMEM, backprop through it, scatter node-table
    gradients with the TRANSPOSED one-hot matmul, accumulate weight
    gradients across the whole grid.

    Grid is (groups, copies, dst tiles) — TILES INNERMOST (the transpose of
    the forward's copies-innermost order) so each batch row's node-grad
    output block is revisited consecutively and accumulates in VMEM.

    refs: [tab_s, tab_v, idx, mask, rbf, xd, ds, dv,
           w1_d, b1, wh0, w1_sh, wg, bg, wu_bd, wu_bd_T, wg_T, w1sh_T,
           <layer j: wh_bd, wh_bd_T, w1f, w1f_T, w1sh, w1sh_T, b1,
                     wg, wg_T, bg, wu_bd, wu_bd_T> x (n-1),
           d_tab_s, d_tab_v,
           d_w1d, d_b1, d_wh0, d_w1sh, d_wg, d_bg, d_wu_bd,
           <layer j: d_wh_bd, d_w1f, d_w1sh, d_b1, d_wg, d_bg,
                     d_wu_bd> x (n-1),
           oh_scratch]
    """
    it = iter(refs)
    tab_s = next(it)[0]                       # [P_pad, S]
    tab_v = next(it)[0]                       # [P_pad, 3H]
    idx = next(it)[0]                         # [TK, 1] int32
    mask = next(it)[0]                        # [TK, 1] f32
    rbf_e = next(it)[0]                       # [TK, R]
    xd = next(it)[0]                          # [TK, 3]
    ds = next(it)[0]                          # [tile_n, S] f32
    dv = next(it)[0]                          # [tile_n, 3V] f32
    (w1_d, b1, wh0, w1_sh, wg, bg, wu_bd, wu_bd_t, wg_t,
     w1sh_t) = (next(it)[...] for _ in range(10))
    layers = [tuple(next(it)[...] for _ in range(12))
              for _ in range(n_gvps - 1)]
    d_tab_s = next(it)
    d_tab_v = next(it)
    wg_outs = [next(it) for _ in range(7 + 7 * (n_gvps - 1))]
    oh = next(it)                             # scratch [TK, P_pad] dt

    tk = tile_n * k
    dt = jnp.float32 if f32 else jnp.bfloat16
    acc = jnp.float32
    # same explicit-precision rule as the forward kernel (see _kernel)
    prec = None if f32 else jax.lax.Precision.DEFAULT

    first_cell = ((pl.program_id(0) == 0) & (pl.program_id(1) == 0)
                  & (pl.program_id(2) == 0))

    @pl.when(first_cell)
    def _zero_weight_grads():
        for ref in wg_outs:
            ref[...] = jnp.zeros(ref.shape, jnp.float32)

    @pl.when(pl.program_id(2) == 0)
    def _zero_node_grads():
        d_tab_s[...] = jnp.zeros(d_tab_s.shape, jnp.float32)
        d_tab_v[...] = jnp.zeros(d_tab_v.shape, jnp.float32)

    # tiles are innermost, so the gather matrix changes every grid step
    cols = jax.lax.broadcasted_iota(jnp.int32, (tk, oh.shape[1]), 1)
    oh[...] = (cols == idx).astype(dt)
    oh_m = oh[...]

    def _dot(a, b):
        return jax.lax.dot(a, b, preferred_element_type=acc,
                           precision=prec).astype(dt)

    def _dot_f32(a, b):
        return jax.lax.dot(a, b, preferred_element_type=jnp.float32,
                           precision=prec)

    def _dot_t(a, b):
        # a^T @ b contracting the edge-row axis: [TK,X],[TK,Y] -> [X,Y] f32
        return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=prec)

    def _norms(packed):
        sq = packed.astype(jnp.float32) ** 2
        w = (packed.shape[1]) // 3
        tot = sq[:, :w] + sq[:, w:2 * w] + sq[:, 2 * w:3 * w]
        return jnp.sqrt(jnp.maximum(tot, 1e-8))          # f32 [TK, w]

    def _silu(x):
        xf = x.astype(jnp.float32)
        return (xf * jax.nn.sigmoid(xf)).astype(dt)

    def _dsilu(z):
        zf = z.astype(jnp.float32)
        sg = jax.nn.sigmoid(zf)
        return sg * (1.0 + zf * (1.0 - sg))              # f32

    def _sigmoid_f32(x):
        return jax.nn.sigmoid(x.astype(jnp.float32))

    def _rep3(g):
        return jnp.concatenate([g, g, g], axis=-1)

    def _blocksum3(a):
        w = a.shape[1] // 3
        return a[:, :w] + a[:, w:2 * w] + a[:, 2 * w:3 * w]

    def _colsum(a):
        return jnp.sum(a.astype(jnp.float32), axis=0, keepdims=True)

    # ---- forward recompute (stage values kept in VMEM) -------------------
    g_s = _dot(oh_m, tab_s)                                    # [TK, S]
    g_v = _dot(oh_m, tab_v)                                    # [TK, 3H]
    rterm = (_dot_f32(rbf_e, w1_d)
             + b1.astype(jnp.float32)).astype(dt)              # [TK, S]
    dirterm = jnp.concatenate(
        [xd[:, c:c + 1] * wh0 for c in range(3)], axis=-1)     # [TK, 3H]
    vh = [g_v + dirterm]
    sh = [_norms(vh[0])]                                       # f32 [TK,H]
    z = [g_s + rterm + _dot(sh[0].astype(dt), w1_sh)]
    feats = [_silu(z[0])]
    gate = [_sigmoid_f32(_dot_f32(feats[0], wg)
                         + bg.astype(jnp.float32))]            # f32 [TK,V]
    vu = [_dot(vh[0], wu_bd)]                                  # [TK, 3V]
    vec = [_rep3(gate[0]).astype(dt) * vu[0]]
    for (wh_bdj, _, w1fj, _, w1shj, _, b1j, wgj, _, bgj, wu_bdj,
         _) in layers:
        vh.append(_dot(vec[-1], wh_bdj))
        sh.append(_norms(vh[-1]))
        z.append(_dot(feats[-1], w1fj) + _dot(sh[-1].astype(dt), w1shj)
                 + b1j.astype(dt))
        feats.append(_silu(z[-1]))
        gate.append(_sigmoid_f32(_dot_f32(feats[-1], wgj)
                                 + bgj.astype(jnp.float32)))
        vu.append(_dot(vh[-1], wu_bdj))
        vec.append(_rep3(gate[-1]).astype(dt) * vu[-1])

    # ---- cotangent seeds: masked broadcast over the K slots --------------
    m = mask.astype(jnp.float32)                               # [TK, 1]
    dfeats = (jnp.broadcast_to(ds[:, None, :], (tile_n, k, s))
              .reshape(tk, s) * m).astype(dt)
    dvec = (jnp.broadcast_to(dv[:, None, :], (tile_n, k, 3 * v))
            .reshape(tk, 3 * v) * m).astype(dt)

    # ---- message GVPs n-1 .. 1, reversed ----------------------------------
    for j in range(n_gvps - 1, 0, -1):
        (wh_bdj, wh_bd_tj, w1fj, w1f_tj, w1shj, w1sh_tj, b1j, wgj,
         wg_tj, bgj, wu_bdj, wu_bd_tj) = layers[j - 1]
        (d_wh_bdj, d_w1fj, d_w1shj, d_b1j, d_wgj, d_bgj,
         d_wu_bdj) = wg_outs[7 + 7 * (j - 1): 14 + 7 * (j - 1)]
        gj = gate[j]
        dgate = _blocksum3(dvec.astype(jnp.float32)
                           * vu[j].astype(jnp.float32))
        dvu = dvec * _rep3(gj).astype(dt)
        dzg = (dgate * gj * (1.0 - gj)).astype(dt)
        d_wgj[...] += _dot_t(feats[j], dzg)
        d_bgj[...] += _colsum(dzg)
        dfeats = dfeats + _dot(dzg, wg_tj)
        dvh = _dot(dvu, wu_bd_tj)
        d_wu_bdj[...] += _dot_t(vh[j], dvu)
        dz = (dfeats.astype(jnp.float32) * _dsilu(z[j])).astype(dt)
        d_b1j[...] += _colsum(dz)
        d_w1fj[...] += _dot_t(feats[j - 1], dz)
        d_w1shj[...] += _dot_t(sh[j].astype(dt), dz)
        dsh = _dot(dz, w1sh_tj).astype(jnp.float32)
        r = jnp.where(sh[j] > 1e-4, dsh / sh[j], 0.0)
        dvh = dvh + (vh[j].astype(jnp.float32)
                     * _rep3(r)).astype(dt)
        d_wh_bdj[...] += _dot_t(vec[j - 1], dvh)
        dvec = _dot(dvh, wh_bd_tj)
        dfeats = _dot(dz, w1f_tj)

    # ---- layer 0 ----------------------------------------------------------
    (d_w1d, d_b1, d_wh0, d_w1sh, d_wg, d_bg, d_wu_bd) = wg_outs[:7]
    g0 = gate[0]
    dgate = _blocksum3(dvec.astype(jnp.float32)
                       * vu[0].astype(jnp.float32))
    dvu = dvec * _rep3(g0).astype(dt)
    dzg = (dgate * g0 * (1.0 - g0)).astype(dt)
    d_wg[...] += _dot_t(feats[0], dzg)
    d_bg[...] += _colsum(dzg)
    dfeats = dfeats + _dot(dzg, wg_t)
    dvh0 = _dot(dvu, wu_bd_t)
    d_wu_bd[...] += _dot_t(vh[0], dvu)
    dz0 = (dfeats.astype(jnp.float32) * _dsilu(z[0])).astype(dt)
    d_b1[...] += _colsum(dz0)
    d_w1d[...] += _dot_t(rbf_e, dz0)
    d_w1sh[...] += _dot_t(sh[0].astype(dt), dz0)
    dsh0 = _dot(dz0, w1sh_t).astype(jnp.float32)
    r0 = jnp.where(sh[0] > 1e-4, dsh0 / sh[0], 0.0)
    dvh0 = dvh0 + (vh[0].astype(jnp.float32) * _rep3(r0)).astype(dt)
    # dirterm = concat_c xd[:, c] * wh0: fold the per-edge cotangent into
    # the [1, H] weight grad plane by plane
    dwh0 = _colsum(xd[:, 0:1].astype(jnp.float32)
                   * dvh0[:, :h].astype(jnp.float32))
    for c in (1, 2):
        dwh0 = dwh0 + _colsum(xd[:, c:c + 1].astype(jnp.float32)
                              * dvh0[:, c * h:(c + 1) * h]
                              .astype(jnp.float32))
    d_wh0[...] += dwh0
    # node-table scatter: transposed one-hot matmul, accumulated while this
    # batch row's block is VMEM-resident
    d_tab_s[0] += _dot_t(oh_m, dz0)
    d_tab_v[0] += _dot_t(oh_m, dvh0)


def _pallas_bwd_impl(primals, ct, *, s, v, rbf_dim, compute_dtype, copies,
                     tile_n, interpret):
    """Build + launch the backward kernel; unpack its packed weight grads
    back to `_split_weights`' raw tensor layout."""
    pre_s, vh_planes, idx, mask, x_dir, d_rbf, weights = primals
    ds, dv = ct                      # [B, Nd, S] f32, [B, Nd, V, 3] f32
    h = v + 1
    g2, nd, k = mask.shape
    b = pre_s.shape[0]
    p = pre_s.shape[1]
    dt = jnp.float32 if compute_dtype == "float32" else jnp.bfloat16
    f32 = compute_dtype == "float32"

    wh0, wu, w1_d, w1_sh, b1, wg, bg = weights[:7]
    layer_w = [weights[7 + 7 * j: 14 + 7 * j]
               for j in range((len(weights) - 7) // 7)]
    n_gvps = len(layer_w) + 1

    tile = int(os.environ.get("PHARMAFORGE_PP_BWD_TILE", 0))
    if tile <= 0:
        tile = _auto_tile_bwd(k, dt)
    tile = min(tile, _round_up(nd, 8))
    nd_pad = _round_up(nd, tile)
    p_pad = _round_up(p, 128)

    padp = [(0, 0), (0, p_pad - p), (0, 0)]
    tab_s = jnp.pad(pre_s, padp).astype(dt)
    tab_v = jnp.pad(jnp.concatenate(list(vh_planes), axis=-1),
                    padp).astype(dt)

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
    xd_e = _pad_nd(x_dir).reshape(g2, e, 3).astype(dt)
    ds_p = _pad_nd(ds.astype(jnp.float32))                  # [B, Ndp, S]
    dv_p = _pad_nd(dv.astype(jnp.float32).transpose(0, 1, 3, 2)
                   .reshape(b, nd, 3 * v))                  # [B, Ndp, 3V]

    eye3 = jnp.eye(3, dtype=jnp.float32)

    def _bd(wm):
        return jnp.kron(eye3, wm.astype(jnp.float32)).astype(dt)

    w_in = [w1_d.astype(dt), b1.astype(dt), wh0.astype(dt),
            w1_sh.astype(dt), wg.astype(dt), bg.astype(dt),
            _bd(wu), _bd(wu.T), wg.T.astype(dt), w1_sh.T.astype(dt)]
    for (whj, wuj, w1f, w1shj, b1j, wgj, bgj) in layer_w:
        w_in += [_bd(whj), _bd(whj.T), w1f.astype(dt), w1f.T.astype(dt),
                 w1shj.astype(dt), w1shj.T.astype(dt), b1j.astype(dt),
                 wgj.astype(dt), wgj.T.astype(dt), bgj.astype(dt),
                 _bd(wuj), _bd(wuj.T)]

    tk = tile * k
    grid = (g2, copies, nd_pad // tile)
    c = copies
    in_specs = [
        pl.BlockSpec((1, p_pad, s), lambda i, cc, j: (i * c + cc, 0, 0)),
        pl.BlockSpec((1, p_pad, 3 * h), lambda i, cc, j: (i * c + cc, 0, 0)),
        pl.BlockSpec((1, tk, 1), lambda i, cc, j: (i, j, 0)),
        pl.BlockSpec((1, tk, 1), lambda i, cc, j: (i, j, 0)),
        pl.BlockSpec((1, tk, rbf_dim), lambda i, cc, j: (i, j, 0)),
        pl.BlockSpec((1, tk, 3), lambda i, cc, j: (i, j, 0)),
        pl.BlockSpec((1, tile, s), lambda i, cc, j: (i * c + cc, j, 0)),
        pl.BlockSpec((1, tile, 3 * v), lambda i, cc, j: (i * c + cc, j, 0)),
    ] + [pl.BlockSpec(w.shape, lambda i, cc, j, n=w.ndim: (0,) * n)
         for w in w_in]

    wgrad_shapes = [w1_d.shape, b1.shape, wh0.shape, w1_sh.shape,
                    wg.shape, bg.shape, (3 * h, 3 * v)]
    for (whj, wuj, w1f, w1shj, b1j, wgj, bgj) in layer_w:
        hj = whj.shape[1]
        wgrad_shapes += [(3 * whj.shape[0], 3 * hj), w1f.shape, w1shj.shape,
                         b1j.shape, wgj.shape, bgj.shape, (3 * hj, 3 * v)]
    out_specs = [
        pl.BlockSpec((1, p_pad, s), lambda i, cc, j: (i * c + cc, 0, 0)),
        pl.BlockSpec((1, p_pad, 3 * h), lambda i, cc, j: (i * c + cc, 0, 0)),
    ] + [pl.BlockSpec(sh_, lambda i, cc, j, n=len(sh_): (0,) * n)
         for sh_ in wgrad_shapes]
    out_shape = [
        jax.ShapeDtypeStruct((b, p_pad, s), jnp.float32),
        jax.ShapeDtypeStruct((b, p_pad, 3 * h), jnp.float32),
    ] + [jax.ShapeDtypeStruct(sh_, jnp.float32) for sh_ in wgrad_shapes]

    from jax.experimental.pallas import tpu as pltpu
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, s=s, v=v, h=h, k=k, tile_n=tile,
                          n_gvps=n_gvps, f32=f32),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((tk, p_pad), dt)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(tab_s, tab_v, idx_e, mask_e, rbf_e, xd_e, ds_p, dv_p, *w_in)

    d_tab_s, d_tab_v = outs[0], outs[1]
    wgrads = list(outs[2:])

    def _unbd(g_bd, rows, cols):
        # d(kron(I3, W)) -> dW: sum the three diagonal blocks
        return sum(g_bd[cc * rows:(cc + 1) * rows, cc * cols:(cc + 1) * cols]
                   for cc in range(3))

    d_w1d, d_b1, d_wh0, d_w1sh, d_wg, d_bg, d_wu_bd = wgrads[:7]
    d_weights = [d_wh0, _unbd(d_wu_bd, h, v), d_w1d, d_w1sh, d_b1,
                 d_wg, d_bg]
    for j, (whj, wuj, *_rest) in enumerate(layer_w):
        (d_wh_bd, d_w1f, d_w1shj, d_b1j, d_wgj, d_bgj,
         d_wu_bdj) = wgrads[7 + 7 * j: 14 + 7 * j]
        hj = whj.shape[1]
        d_weights += [_unbd(d_wh_bd, whj.shape[0], hj),
                      _unbd(d_wu_bdj, hj, v), d_w1f, d_w1shj, d_b1j,
                      d_wgj, d_bgj]

    d_pre_s = d_tab_s[:, :p]
    d_planes = tuple(d_tab_v[:, :p, cc * h:(cc + 1) * h] for cc in range(3))

    import numpy as np

    def _zero_ct(a):
        if jnp.issubdtype(a.dtype, jnp.integer) or a.dtype == jnp.bool_:
            return np.zeros(a.shape, dtype=jax.dtypes.float0)
        return jnp.zeros_like(a)

    return (d_pre_s, d_planes, _zero_ct(idx), _zero_ct(mask),
            jnp.zeros_like(x_dir), jnp.zeros_like(d_rbf), tuple(d_weights))


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
    Differentiable: the backward is the flash-style Pallas kernel
    (`_bwd_kernel`, training-grade); `PHARMAFORGE_PP_BWD=0` falls back to
    differentiating the jnp twin.
    """
    cfg = dict(s=scalar_size, v=vector_size, rbf_dim=rbf_dim,
               compute_dtype=compute_dtype, copies=copies, tile_n=tile_n,
               interpret=interpret)
    weights = _split_weights(layer_params, scalar_size, rbf_dim)

    fwd = functools.partial(_pallas_impl, **cfg)
    ref = functools.partial(_ref_impl, **cfg)
    f = jax.custom_vjp(fwd)
    if bwd_kernel_enabled():
        bwd = functools.partial(
            _pallas_bwd_impl, s=scalar_size, v=vector_size, rbf_dim=rbf_dim,
            compute_dtype=compute_dtype, copies=copies, tile_n=tile_n,
            interpret=interpret)
        f.defvjp(lambda *a: (fwd(*a), a), bwd)
    else:
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
