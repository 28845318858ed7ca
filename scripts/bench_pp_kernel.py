"""Micro-benchmark the fused pp message kernel at full-scale shapes.

Sweeps tile size x norm lowering (matmul vs lane-slice) for the v2 kernel
(ops/pallas/pp_message.py) against the unfused XLA chain on the same
shapes, fenced. Fast iteration loop for kernel tuning — the whole-chain
A/B (scripts/ab_knob.py AB_KNOB=fused_pp) is the end-to-end confirmation.

Usage: python -m scripts.bench_pp_kernel [--tiles 64,128,232]
"""

import argparse
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", default="64,128,232")
    ap.add_argument("--norms", default="matmul,slice")
    ap.add_argument("--gates", default="matmul,concat")
    ap.add_argument("--g2", type=int, default=8)
    ap.add_argument("--copies", type=int, default=30)
    ap.add_argument("--p", type=int, default=230)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--s", type=int, default=128)
    ap.add_argument("--v", type=int, default=16)
    ap.add_argument("--reps", type=int, default=30)
    args = ap.parse_args()

    from pharmaforge_tpu.utils.misc import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_default_matmul_precision", "bfloat16")

    from pharmaforge_tpu.models.conv import EdgeMessageChain, _aggregate
    from pharmaforge_tpu.models.edges import EdgeData, GroupedEdgeData
    from pharmaforge_tpu.ops.geometry import rbf
    from pharmaforge_tpu.utils.timing import fence

    rng = np.random.default_rng(0)
    g2, c, p, nd, k = args.g2, args.copies, args.p, args.p, args.k
    b = g2 * c
    s, v = args.s, args.v
    chain = EdgeMessageChain(scalar_size=s, vector_size=v, n_message_gvps=3,
                             compute_dtype="bfloat16")
    h_src = jnp.asarray(rng.normal(size=(b, p, s)).astype(np.float32))
    v_src = jnp.asarray(rng.normal(scale=0.5, size=(b, p, v, 3))
                        .astype(np.float32))
    idx = rng.integers(0, p, size=(g2, nd, k)).astype(np.int32)
    mask = (rng.random((g2, nd, k)) < 0.9).astype(np.float32)
    d = rng.uniform(0.5, 10.0, size=(g2, nd, k)).astype(np.float32)
    x_dir = rng.normal(size=(g2, nd, k, 3)).astype(np.float32)
    x_dir /= np.linalg.norm(x_dir, axis=-1, keepdims=True)
    grouped = GroupedEdgeData(mask=jnp.asarray(mask), idx=jnp.asarray(idx),
                              x_dir=jnp.asarray(x_dir),
                              d_rbf=rbf(jnp.asarray(d), d_count=16),
                              copies=c)
    params = chain.init(jax.random.key(0), h_src, v_src, grouped.expand())

    def timed(fn, label):
        out = fn(params, h_src, v_src)
        fence(out[0])
        t0 = time.perf_counter()
        outs = [fn(params, h_src, v_src) for _ in range(args.reps)]
        fence([o[0] for o in outs])
        ms = (time.perf_counter() - t0) / args.reps * 1e3
        print(f"{label:34s} {ms:8.3f} ms/call")
        return ms

    # unfused XLA oracle on expanded edges (the production off-path)
    expanded = grouped.expand()

    def unfused(pr, hh, vv):
        s_m, v_m = chain.apply(pr, hh, vv, expanded)
        s_a, v_a, _ = _aggregate(s_m.astype(jnp.float32),
                                 v_m.astype(jnp.float32),
                                 expanded.mask, mean=False)
        return s_a, v_a

    timed(jax.jit(unfused), "unfused XLA chain+agg")

    for tile in args.tiles.split(","):
        for norm in args.norms.split(","):
            for gate in args.gates.split(","):
                os.environ["PHARMAFORGE_PP_NORM"] = norm
                os.environ["PHARMAFORGE_PP_GATE"] = gate

                def fused(pr, hh, vv, _tile=int(tile)):
                    os.environ["PHARMAFORGE_PP_TILE"] = str(_tile)
                    return chain.apply(pr, hh, vv, grouped,
                                       fused_aggregate=True)

                os.environ["PHARMAFORGE_PP_TILE"] = tile
                timed(jax.jit(fused),
                      f"fused tile={tile} norm={norm} gate={gate}")
    os.environ.pop("PHARMAFORGE_PP_TILE", None)
    os.environ.pop("PHARMAFORGE_PP_NORM", None)
    os.environ.pop("PHARMAFORGE_PP_GATE", None)


if __name__ == "__main__":
    main()
