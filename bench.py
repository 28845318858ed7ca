"""Benchmark: pharmacophore samples/sec/chip over the full DDPM chain.

Workload mirrors the reference README's sampling command (README.md:25):
30 samples per pocket, pharm sizes 3-8, max_batch_size 32, ~230-atom pocket,
dev-config model (n_convs=2, T=100). The whole chain runs as one jitted
lax.scan.

Timing is steady-state THROUGHPUT over a multi-pocket sweep: every device
call stacks `--pockets_per_call` distinct pockets x 30 samples each into one
batch (the `PocketSampler.sample_stacked` layout), and each repeat enqueues
`--pipeline_depth` such calls back-to-back (async jax dispatch, one blocking
sync at the end) — the way a dataset evaluation sweep (test.py) or a serving
queue drives the chip. On this deployment the chip sits behind a tunnel with tens of ms
of per-call round-trip latency; pipelined dispatch overlaps that latency
with device execution, so throughput reflects the device, not the tunnel.
The single-call latency is measured separately and reported as
`chain_latency_ms`. The MEDIAN over `--repeats` repeats is the headline,
with min/max spread, plus a model-FLOPs-utilization figure from the
compiled executable's own cost analysis.

    {"metric": "pharmacophore samples/sec/chip (full DDPM chain)",
     "value": <median samples/sec/chip>, "unit": "samples/sec/chip",
     "vs_baseline": <value / BASELINE_SAMPLES_PER_SEC>, ...extras}

vs_baseline: the reference publishes no numbers in-repo and its torch/DGL
stack cannot run here, so the denominator is a DERIVED A100-class estimate
with the arithmetic recorded in BASELINE.md (kernel-launch floor of the
reference's per-step DGL/GVP kernel stream: ~250 kernels/step x ~10us x
T=100 => ~0.25 s per 32-sample chain => ~125 samples/s). A measured floor
of the reference's math on THIS host is available via
`--measure_torch_baseline` (times the reference-semantics torch executor,
tests/reference_executor.py, on the same workload).
"""

import argparse
import json
import statistics
import time

import numpy as np

# Derived A100-class estimate for the reference implementation; the full
# arithmetic is documented in BASELINE.md ("Derived baseline").
BASELINE_SAMPLES_PER_SEC = 125.0

# v5e single-chip peaks for the utilization figures
V5E_BF16_FLOPS = 197e12
V5E_HBM_BYTES_PER_S = 819e9


def build_workload(args):
    from pharmaforge_tpu.data.batch import tile_pocket
    from pharmaforge_tpu.models.diffusion import (
        DiffusionConfig,
        PharmacophoreDiffusion,
    )

    if args.quick:
        cfg = DiffusionConfig(n_timesteps=10, n_convs=1, n_hidden_scalars=32,
                              vector_size=8, message_norm="mean",
                              n_message_gvps=2, n_update_gvps=1,
                              n_noise_gvps=2, pf_k=5, pp_k_max=16)
        args.pocket_atoms = min(args.pocket_atoms, 96)
        args.samples_per_pocket = min(args.samples_per_pocket, 8)
        args.max_batch_size = min(args.max_batch_size, 8)
        args.pockets_per_call = min(args.pockets_per_call, 2)
    else:
        # dev-config model (configs/dev.yml dynamics + T=100)
        cfg = DiffusionConfig(n_timesteps=100, n_convs=2,
                              n_hidden_scalars=128, vector_size=16,
                              message_norm="mean", n_message_gvps=3,
                              n_update_gvps=2, n_noise_gvps=4, pf_k=5,
                              pp_k_max=16,
                              compute_dtype="bfloat16"
                              if args.matmul_precision == "bfloat16"
                              else "float32")
    model = PharmacophoreDiffusion(cfg)

    import jax

    # synthetic pocket shells ~ realistic CrossDocked pocket geometry; the
    # device batch stacks `pockets_per_call` DIFFERENT pockets x
    # samples_per_pocket copies each (pocket-major rows), the layout
    # PocketSampler.sample_stacked uses for a dataset sweep
    def make_pocket(seed):
        r = np.random.default_rng(seed)
        n_prot = args.pocket_atoms
        dirs = r.normal(size=(n_prot, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        px = (dirs * r.uniform(4, 12, (n_prot, 1))).astype(np.float32)
        ph = np.eye(11, dtype=np.float32)[r.integers(0, 11, n_prot)]
        return px, ph

    rng = np.random.default_rng(0)
    sizes = rng.integers(3, 9, args.samples_per_pocket)
    chunk = sizes[:args.max_batch_size]
    tiles, prot_x, prot_h = [], None, None
    for i in range(max(args.pockets_per_call, 1)):
        px, ph = make_pocket(i)
        if prot_x is None:
            prot_x, prot_h = px, ph
        tiles.append(tile_pocket(px, ph, chunk))
    batch = jax.tree_util.tree_map(
        lambda *xs: np.concatenate(xs, axis=0), *tiles)
    return model, batch, len(chunk), prot_x, prot_h, sizes


def measure_torch_baseline(args, prot_x, prot_h, sizes):
    """Time the reference-semantics torch executor on this host (a real
    measurement of the reference's math; see BASELINE.md for the box)."""
    import torch

    from pharmaforge_tpu.models.diffusion import DiffusionConfig, \
        PharmacophoreDiffusion
    from tests.reference_executor import ReferenceDynamics, \
        radius_graph_edges, knn_pf_edges
    from pharmaforge_tpu.interop.torch_import import export_torch_state_dict
    import jax

    cfg = DiffusionConfig(n_timesteps=100, n_convs=2, n_hidden_scalars=128,
                          vector_size=16, message_norm="mean",
                          n_message_gvps=3, n_update_gvps=2, n_noise_gvps=4,
                          pf_k=5, pp_k_max=16)
    model = PharmacophoreDiffusion(cfg)
    from pharmaforge_tpu.data.batch import tile_pocket
    batch = tile_pocket(prot_x, prot_h, sizes[:args.max_batch_size])
    params = jax.device_get(model.init_params(jax.random.key(0), batch))
    state = export_torch_state_dict(params, cfg)
    dyn = ReferenceDynamics(state, cfg)

    b = min(args.max_batch_size, len(sizes))
    prot_t = torch.from_numpy(prot_x)
    ph_x = [torch.randn(int(n), 3) for n in sizes[:b]]
    ph_h = [torch.randn(int(n), 6) for n in sizes[:b]]
    pp = radius_graph_edges(prot_t, 3.5)

    def one_step():
        for i in range(b):
            ff = radius_graph_edges(ph_x[i], 9.0)
            pf = knn_pf_edges(ph_x[i], prot_t, 5)
            dyn(ph_h[i], ph_x[i], torch.from_numpy(prot_h), prot_t, 0.5,
                ff, pf, pp)

    one_step()  # warmup
    n_steps = 3
    t0 = time.perf_counter()
    for _ in range(n_steps):
        one_step()
    per_step = (time.perf_counter() - t0) / n_steps
    chain = per_step * cfg.n_timesteps
    return b / chain  # samples/sec for the full chain at this batch


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help="tiny model + short chain (CI smoke)")
    p.add_argument("--samples_per_pocket", type=int, default=30)
    p.add_argument("--max_batch_size", type=int, default=32)
    p.add_argument("--pocket_atoms", type=int, default=230)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--pipeline_depth", type=int, default=16,
                   help="calls enqueued back-to-back per repeat (a "
                        "multi-pocket sweep keeps the dispatch queue full; "
                        "1 = pure latency mode)")
    p.add_argument("--pockets_per_call", type=int, default=8,
                   help="distinct pockets stacked into one device batch "
                        "(PocketSampler.sample_stacked layout); per-step "
                        "ops are tiny at single-pocket batch, stacking "
                        "amortizes their fixed cost. 8 is the measured "
                        "knee with dedup_prot_encoder (4 was, before it "
                        "freed the VMEM the bigger batch needs; 16 adds "
                        "~4% more with much wider spread + slower compile)")
    p.add_argument("--matmul_precision", type=str, default="bfloat16",
                   choices=["float32", "tensorfloat32", "bfloat16"],
                   help="matmul precision for the sampling chain (bf16 rides "
                        "the MXU fast path; coordinates stay fp32)")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="write a jax.profiler trace of the timed region here")
    p.add_argument("--measure_torch_baseline", action="store_true",
                   help="also time the reference-semantics torch executor "
                        "on this host's CPU (slow)")
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/pharmaforge_jax_cache")
    jax.config.update("jax_default_matmul_precision", args.matmul_precision)
    import os
    if os.environ.get("JAX_PLATFORMS"):
        # honor the env var even on hosts whose site hook re-selects a TPU
        # plugin after import (lets CI smoke the bench on CPU)
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    model, batch, group, prot_x, prot_h, sizes = build_workload(args)
    params = model.init_params(jax.random.key(0), batch)

    def fn(p, b, k):
        # rows are pocket-major groups of `group` copies each, so the chain
        # dedups the per-copy prot-prot work within every pocket group
        return model.sample_given_receptor(p, b, k, pocket_group_size=group)

    # compile once (also yields the executable's own cost analysis); retry
    # transient compile-service failures (the tunnel here can drop a compile
    # response mid-read)
    compiled = None
    for attempt in range(3):
        try:
            compiled = jax.jit(fn).lower(params, batch,
                                         jax.random.key(1)).compile()
            out = compiled(params, batch, jax.random.key(1))
            jax.block_until_ready(out["pharm_x"])
            break
        except Exception as e:
            if attempt == 2 or not ("INTERNAL" in str(e)
                                    or "remote_compile" in str(e)):
                raise
            import sys
            print(f"transient compile failure ({e}); retrying",
                  file=sys.stderr)
            time.sleep(20)

    try:
        cost = compiled.cost_analysis() or {}
        if isinstance(cost, list):
            cost = cost[0] if cost else {}
    except Exception:
        cost = {}
    # XLA's cost analysis counts a while/scan body ONCE regardless of trip
    # count (verified empirically: identical flops for T=10 and T=50), so
    # scale by the number of while iterations — the body holds
    # `sample_scan_unroll` diffusion steps. Flops are fusion-invariant and
    # hence a sound MFU numerator; "bytes accessed" counts every op's
    # operands before fusion (a large overestimate of real HBM traffic), so
    # it is reported as an informational upper bound only.
    n_iters = -(-model.config.n_timesteps
                // max(1, model.config.sample_scan_unroll))
    chain_flops = float(cost.get("flops", 0.0)) * n_iters
    body_bytes = float(cost.get("bytes accessed", 0.0))

    # chains per repeat: the whole dispatch queue (pipeline_depth) times the
    # per-pocket batching (n_batches chunks of max_batch_size)
    n_batches = -(-args.samples_per_pocket // args.max_batch_size)
    depth = max(args.pipeline_depth, 1) * n_batches

    # single-call latency (tunnel round-trip + chain), median of 3
    lat = []
    for r in range(3):
        t0 = time.perf_counter()
        out = compiled(params, batch, jax.random.key(100 + r))
        jax.block_until_ready(out["pharm_x"])
        lat.append(time.perf_counter() - t0)
    chain_latency_ms = statistics.median(lat) * 1e3

    import contextlib
    profile_ctx = (jax.profiler.trace(args.profile_dir)
                   if args.profile_dir else contextlib.nullcontext())
    per_repeat = []
    with profile_ctx:
        for r in range(args.repeats):
            t0 = time.perf_counter()
            outs = [compiled(params, batch, jax.random.key(2 + r * 97 + i))
                    for i in range(depth)]
            jax.block_until_ready([o["pharm_x"] for o in outs])
            per_repeat.append(time.perf_counter() - t0)

    n_chips = jax.device_count()
    batch_samples = depth * batch.batch_size
    rates = [batch_samples / dt / n_chips for dt in per_repeat]
    median_rate = statistics.median(rates)
    best_dt = min(per_repeat)

    # roofline figure from the compiled executable's cost analysis, against
    # the best (least-noisy) repeat
    chains_per_sec = depth / best_dt
    mfu = (chain_flops * chains_per_sec) / V5E_BF16_FLOPS if chain_flops else None

    result = {
        "metric": "pharmacophore samples/sec/chip (full DDPM chain)",
        "value": round(median_rate, 3),
        "unit": "samples/sec/chip",
        "vs_baseline": round(median_rate / BASELINE_SAMPLES_PER_SEC, 3),
        "spread_min": round(min(rates), 3),
        "spread_max": round(max(rates), 3),
        "repeats": args.repeats,
        "pipeline_depth": depth,
        "pockets_per_call": max(args.pockets_per_call, 1),
        "chain_latency_ms": round(chain_latency_ms, 2),
        "mfu_vs_bf16_peak": round(mfu, 4) if mfu is not None else None,
        "chain_gflops": round(chain_flops / 1e9, 2) if chain_flops else None,
        "step_cost_model_gbytes_unfused":
            round(body_bytes / 1e9, 3) if body_bytes else None,
    }
    if args.measure_torch_baseline:
        result["torch_executor_samples_per_sec_host_cpu"] = round(
            measure_torch_baseline(args, prot_x, prot_h, sizes), 4)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
