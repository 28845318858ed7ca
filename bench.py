"""Benchmark: pharmacophore samples/sec/chip over the full DDPM chain.

Workload mirrors the reference README's sampling command (README.md:25):
30 samples per pocket, pharm sizes 3-8, max_batch_size 32, ~230-atom pocket,
dev-config model (n_convs=2, T=100). The whole chain runs as one jitted
lax.scan.

Timing is steady-state THROUGHPUT over a multi-pocket sweep: every device
call stacks `--pockets_per_call` distinct pockets x 30 samples each into one
batch (the `PocketSampler.sample_stacked` layout), and each repeat enqueues
`--pipeline_depth` such calls back-to-back (async jax dispatch, one sync at
the end) — the way a dataset evaluation sweep (test.py) or a serving queue
drives the chip. On this deployment the chip sits behind a tunnel with tens
of ms of per-call round-trip latency; pipelined dispatch overlaps that
latency with device execution, so throughput reflects the device, not the
tunnel. Every sync uses utils/timing.fence — a device-computed scalar over
the outputs fetched to the host — because plain `block_until_ready` can
return before execution here and inflates the number past the hardware
peak (see utils/timing.py). The single-call latency is measured separately
and reported as `chain_latency_ms`. The MEDIAN over `--repeats` repeats is
the headline, with min/max spread, plus a model-FLOPs-utilization figure
from the compiled executable's own cost analysis.

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
import sys
import time

import numpy as np

# Derived A100-class estimate for the reference implementation; the full
# arithmetic is documented in BASELINE.md ("Derived baseline"). The model
# is kernel-launch-bound, so it scales linearly with chain length and with
# the conv-stack depth: 125 samples/s at the dev workload (T=100,
# n_convs=2), ~6.25 at the reference model defaults (T=1000, n_convs=4) —
# the same scaling docs/performance.md applies by hand.
BASELINE_SAMPLES_PER_SEC = 125.0


def baseline_for_workload(n_timesteps: int, n_convs: int) -> float:
    return BASELINE_SAMPLES_PER_SEC * (100.0 / n_timesteps) * (2.0 / n_convs)

# Error-message substrings that mark a *transient* backend/tunnel failure
# (worth a backend reset + retry) as opposed to a real bug in the bench.
# The round-2 driver run died with "Unable to initialize backend 'axon':
# UNAVAILABLE: TPU backend setup/compile error" at the FIRST device touch —
# exactly this class.
_TRANSIENT_MARKERS = (
    "UNAVAILABLE",
    "Unable to initialize backend",
    "INTERNAL",
    "remote_compile",
    "DEADLINE_EXCEEDED",
    "Socket closed",
    "Connection reset",
    "failed to connect",
    "Bad StatusOr access",
)
# NOT transient: RESOURCE_EXHAUSTED (a device OOM is deterministic — a
# backend reset can never fix it; surface the real error immediately)


def supervise(argv, attempts=3, worker_timeout=1800):
    """Run the actual benchmark as a bounded worker subprocess, retrying on
    crash OR hang. The round-3 probe showed backend init can HANG (>7 min
    with no output) when the TPU tunnel is wedged — an in-process retry
    can't recover from that, only a kill-and-respawn can. The worker's
    stderr streams through; its final JSON line is re-emitted here for the
    driver.

    If every TPU attempt fails AND the platform was not explicitly pinned
    to cpu, one final attempt runs on the CPU backend so a chip outage
    still leaves an honest record: the JSON's "platform" field says which
    device the number came from (a CPU figure is NOT comparable to the TPU
    headline). The fallback runs the --quick workload (also marked in the
    JSON, "workload": "quick") — the full dev-scale chain can take the
    single-core host past the worker timeout just compiling, which would
    turn the outage record into a second silent failure.

    One failure class is NEVER retried: RESOURCE_EXHAUSTED (device OOM) is
    deterministic — respawning the worker or switching to CPU would only
    mask a real workload bug behind a green exit code."""
    import os
    import subprocess

    # test hook: lets CI exercise the fallback without 3 long attempts
    attempts = int(os.environ.get("BENCH_SUPERVISOR_ATTEMPTS", attempts))

    def run_worker(extra_env=None, timeout=worker_timeout, extra_args=()):
        """Returns (json_line_or_None, fatal). Worker stderr is captured and
        echoed so the supervisor can classify the failure."""
        cmd = [sys.executable, __file__, "--_worker"] + argv + list(extra_args)
        env = dict(os.environ, **(extra_env or {}))
        try:
            proc = subprocess.run(cmd, stdout=subprocess.PIPE,
                                  stderr=subprocess.PIPE, text=True,
                                  timeout=timeout, env=env)
        except subprocess.TimeoutExpired as e:
            for stream in (e.stdout, e.stderr):
                if stream:
                    sys.stderr.write(stream if isinstance(stream, str)
                                     else stream.decode(errors="replace"))
            print(f"bench worker hung past {timeout}s (wedged backend "
                  f"init?); killed", file=sys.stderr)
            return None, False
        if proc.stderr:
            sys.stderr.write(proc.stderr)
        json_lines = [ln for ln in proc.stdout.splitlines()
                      if ln.startswith("{")]
        if proc.returncode == 0 and json_lines:
            return json_lines[-1], False
        print(f"bench worker exited rc={proc.returncode}", file=sys.stderr)
        fatal = "RESOURCE_EXHAUSTED" in (proc.stderr or "")
        return None, fatal

    delay = 30.0
    for attempt in range(attempts):
        line, fatal = run_worker()
        if line is not None:
            print(line)
            return 0
        if fatal:
            print("worker failed with RESOURCE_EXHAUSTED (deterministic "
                  "device OOM) — not retrying, not falling back; fix the "
                  "workload", file=sys.stderr)
            return 1
        print(f"(attempt {attempt + 1}/{attempts})", file=sys.stderr)
        if attempt < attempts - 1:
            time.sleep(delay)
            delay *= 2

    if os.environ.get("JAX_PLATFORMS", "") != "cpu":
        print("all TPU attempts failed; falling back to the CPU backend "
              "so the outage still leaves a (non-comparable) record",
              file=sys.stderr)
        # quick workload: the single-core host can neither compile nor run
        # the dev-scale chain inside the timeout (argparse last-wins)
        line, _ = run_worker(extra_env={"JAX_PLATFORMS": "cpu"},
                             extra_args=["--quick", "--skip_train_bench",
                                         "--repeats", "2",
                                         "--pipeline_depth", "4"])
        if line is not None:
            print(line)
            return 0
    print("bench worker failed on every attempt", file=sys.stderr)
    return 1


def _reset_backend():
    """Drop any cached (possibly half-initialized) jax backend so the next
    device query re-runs platform selection from scratch. Same pattern as
    __graft_entry__.py's dryrun_multichip."""
    import jax
    from jax._src import xla_bridge

    with xla_bridge._backend_lock:
        xla_bridge._backends.clear()
        xla_bridge._backend_errors.clear()
    jax.clear_caches()


def _retry_device(fn, what, attempts=6, first_delay=10.0, max_delay=120.0):
    """Run `fn` (which may touch the device for the first time), resetting
    the backend and retrying with exponential backoff on transient
    tunnel/TPU failures. `fn` must rebuild ALL device state itself: after a
    reset, arrays created by a previous attempt are dead."""
    delay = first_delay
    for attempt in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 - filtered below
            msg = f"{type(e).__name__}: {e}"
            transient = any(m in msg for m in _TRANSIENT_MARKERS)
            if attempt == attempts - 1 or not transient:
                raise
            print(f"transient failure in {what} ({msg[:300]}); "
                  f"backend reset + retry in {delay:.0f}s "
                  f"(attempt {attempt + 1}/{attempts})", file=sys.stderr)
            try:
                _reset_backend()
            except Exception as reset_err:  # pragma: no cover
                print(f"backend reset itself failed ({reset_err}); "
                      f"retrying anyway", file=sys.stderr)
            time.sleep(delay)
            delay = min(delay * 2, max_delay)

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
        # keep args.n_timesteps/n_convs in sync: vs_baseline scales by them
        args.n_timesteps, args.n_convs = 10, 1
        cfg = DiffusionConfig(n_timesteps=10, n_convs=1, n_hidden_scalars=32,
                              vector_size=8, message_norm="mean",
                              n_message_gvps=2, n_update_gvps=1,
                              n_noise_gvps=2, pf_k=5, pp_k_max=16)
        args.pocket_atoms = min(args.pocket_atoms, 96)
        args.samples_per_pocket = min(args.samples_per_pocket, 8)
        args.max_batch_size = min(args.max_batch_size, 8)
        args.pockets_per_call = min(args.pockets_per_call, 2)
    else:
        # dev-config model (configs/dev.yml dynamics + T=100 by default);
        # --n_timesteps 1000 + --n_convs 4 measures the full-scale model
        # (reference defaults: pharmacodiff.py:32, gvp.py n_convs=4)
        cfg = DiffusionConfig(n_timesteps=args.n_timesteps,
                              n_convs=args.n_convs,
                              n_hidden_scalars=128, vector_size=16,
                              message_norm="mean", n_message_gvps=3,
                              n_update_gvps=2, n_noise_gvps=4, pf_k=5,
                              pp_k_max=16,
                              endpoint_param_feat=args.endpoint_param,
                              endpoint_param_coord=args.endpoint_param,
                              compute_dtype="bfloat16"
                              if args.matmul_precision == "bfloat16"
                              else "float32")
    model = PharmacophoreDiffusion(cfg)

    import jax

    # synthetic pocket shells ~ realistic CrossDocked pocket geometry; the
    # device batch stacks `pockets_per_call` DIFFERENT pockets x
    # samples_per_pocket copies each (pocket-major rows), the layout
    # PocketSampler.sample_stacked uses for a dataset sweep
    from pharmaforge_tpu.data.synthetic import make_synthetic_pocket

    def make_pocket(seed):
        r = np.random.default_rng(seed)
        px, p_elem = make_synthetic_pocket(r, np.zeros(3), args.pocket_atoms)
        return (px.astype(np.float32),
                np.eye(11, dtype=np.float32)[p_elem])

    rng = np.random.default_rng(0)
    sizes = rng.integers(3, 9, args.samples_per_pocket)
    chunk = sizes[:args.max_batch_size]
    tiles, prot_x, prot_h = [], None, None
    for i in range(max(args.pockets_per_call, 1)):
        px, ph = make_pocket(i)
        if prot_x is None:
            prot_x, prot_h = px, ph
        # thinning makes the atom count vary per pocket; pad every tile to
        # the same static width so the stacked batch has one shape
        tiles.append(tile_pocket(px, ph, chunk, max_prot=args.pocket_atoms))
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


def run_sampling_bench(args, model, batch, group):
    """The entire device-side sampling benchmark. Rebuilds all device state
    from the host-side (numpy) workload on every call, so `_retry_device`
    can re-run it after a backend reset."""
    import jax

    params = model.init_params(jax.random.key(0), batch)

    # middle-conv pocket-copy correction (models/conv.py `pp_correction`):
    # same probe + static k_out the PocketSampler CLIs use
    k_out = 0
    if group > 1:
        from pharmaforge_tpu.training.sampling import probe_pp_k_out
        k_out = probe_pp_k_out(model, batch.prot_x[::group],
                               batch.prot_mask[::group])

    def fn(p, b, k):
        # rows are pocket-major groups of `group` copies each, so the chain
        # dedups the per-copy prot-prot work within every pocket group
        return model.sample_given_receptor(p, b, k, pocket_group_size=group,
                                           pp_k_out=k_out)

    # every sync below goes through utils.timing.fence, NOT
    # block_until_ready: on this tunneled deployment block_until_ready can
    # return before the device has executed (r3 probe: 1.3 ms "blocked"
    # calls, derived MFU > 1.0 — past the hardware peak). fence() waits for
    # a device-computed scalar over the outputs to arrive on the host,
    # which cannot complete early.
    from pharmaforge_tpu.utils.timing import fence

    compiled = jax.jit(fn).lower(params, batch, jax.random.key(1)).compile()
    out = compiled(params, batch, jax.random.key(1))
    fence(out["pharm_x"])

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

    # single-call latency (chain + one tunnel round-trip for the fence
    # scalar), median of 3
    lat = []
    for r in range(3):
        t0 = time.perf_counter()
        out = compiled(params, batch, jax.random.key(100 + r))
        fence(out["pharm_x"])
        lat.append(time.perf_counter() - t0)
    chain_latency_ms = statistics.median(lat) * 1e3

    # pre-warm the fence digest for the depth-list structure so its one-off
    # jit compile doesn't land inside the first timed repeat
    fence([out["pharm_x"]] * depth)

    import contextlib
    profile_ctx = (jax.profiler.trace(args.profile_dir)
                   if args.profile_dir else contextlib.nullcontext())
    per_repeat = []
    with profile_ctx:
        for r in range(args.repeats):
            t0 = time.perf_counter()
            outs = [compiled(params, batch, jax.random.key(2 + r * 97 + i))
                    for i in range(depth)]
            fence([o["pharm_x"] for o in outs])
            per_repeat.append(time.perf_counter() - t0)

    n_chips = jax.device_count()
    batch_samples = depth * batch.batch_size
    rates = [batch_samples / dt / n_chips for dt in per_repeat]

    # roofline figure from the compiled executable's cost analysis, against
    # the MEDIAN repeat
    chains_per_sec = depth / statistics.median(per_repeat)
    mfu = ((chain_flops * chains_per_sec) / V5E_BF16_FLOPS
           if chain_flops else None)

    return {
        "rates": rates,
        "depth": depth,
        "chain_latency_ms": chain_latency_ms,
        "mfu": mfu,
        "chain_flops": chain_flops,
        "body_bytes": body_bytes,
        "n_chips": n_chips,
        "batch_samples": batch_samples,
    }


def run_train_bench(args):
    """CrossDocked train steps/sec — the second driver-designated metric
    (BASELINE.md names both). A compact version of scripts/bench_train.py's
    measurement (batch 32, 8 steps scanned per device call, 3 repeats),
    returning the two headline numbers for bench.py's JSON line. Rebuilds
    all device state on every call (retry-safe)."""
    import jax

    from pharmaforge_tpu.data.batch import (bucket_size, collate_complexes,
                                            stack_batches)
    from pharmaforge_tpu.models.diffusion import (
        DiffusionConfig,
        PharmacophoreDiffusion,
    )
    from pharmaforge_tpu.parallel.mesh import (
        make_mesh, pad_batch_to_multiple, replicate, shard_batch,
        shard_stacked_batch)
    from pharmaforge_tpu.training.optim import make_optimizer
    from pharmaforge_tpu.training.train_state import (
        TrainState, make_multi_train_step)

    if args.quick:
        cfg = DiffusionConfig(n_timesteps=10, n_convs=1, n_hidden_scalars=32,
                              vector_size=8, message_norm="mean",
                              n_message_gvps=2, n_update_gvps=1,
                              n_noise_gvps=2, pf_k=5, pp_k_max=16)
        batch_size, pocket_atoms, steps_per_call, n_calls, repeats = (
            4, 64, 2, 2, 2)
    else:
        # same shapes scripts/bench_train.py defaults to; honors the
        # full-scale flags (--n_timesteps 1000 --n_convs 4
        # --endpoint_param) so the train metric covers the reference model
        # defaults too (T only changes the gamma table, not step cost)
        cfg = DiffusionConfig(n_timesteps=args.n_timesteps,
                              n_convs=args.n_convs,
                              n_hidden_scalars=128, vector_size=16,
                              message_norm="mean", n_message_gvps=3,
                              n_update_gvps=2, n_noise_gvps=4, pf_k=5,
                              dropout=0.1, pp_k_max=16,
                              endpoint_param_feat=args.endpoint_param,
                              endpoint_param_coord=args.endpoint_param)
        batch_size, pocket_atoms, steps_per_call, n_calls, repeats = (
            32, 230, 8, 4, 3)
    model = PharmacophoreDiffusion(cfg)

    from pharmaforge_tpu.data.synthetic import make_synthetic_pocket

    rng = np.random.default_rng(0)
    p_pad = bucket_size(pocket_atoms)
    samples = []
    for _ in range(batch_size):
        prot_x, p_elem = make_synthetic_pocket(rng, np.zeros(3), pocket_atoms)
        prot_x = prot_x.astype(np.float32)
        n_ph = int(rng.integers(4, 9))
        samples.append({
            "prot_x": prot_x,
            "prot_h": np.eye(11, dtype=np.float32)[p_elem],
            "pharm_x": prot_x[:n_ph] * 0.3,
            "pharm_h": np.eye(6, dtype=np.float32)[rng.integers(0, 6, n_ph)],
        })
    batch = collate_complexes(samples, max_prot=p_pad)

    mesh = make_mesh()
    optimizer = make_optimizer(1e-3, weight_decay=1e-12)
    params = model.init_params(jax.random.key(0), batch)
    state = TrainState(params=params, opt_state=optimizer.init(params),
                       step=np.int32(0))
    state = replicate(state, mesh)
    batch, _ = pad_batch_to_multiple(batch, int(np.prod(mesh.devices.shape)))
    batch = shard_batch(batch, mesh)
    stacked = shard_stacked_batch(
        stack_batches([batch] * steps_per_call), mesh)
    step_fn = make_multi_train_step(model, optimizer, donate=True)

    from pharmaforge_tpu.utils.timing import fence

    state, aux = step_fn(state, stacked, jax.random.key(1), 1e-3)
    fence(aux["train total loss"])

    rates = []
    for r in range(repeats):
        t0 = time.perf_counter()
        for i in range(n_calls):
            state, aux = step_fn(
                state, stacked, jax.random.key(2 + r * n_calls + i), 1e-3)
        # the steps chain through the donated state, so fencing the last
        # loss forces the whole sequence (see utils/timing.py: plain
        # block_until_ready can return early on this deployment)
        fence(aux["train total loss"])
        rates.append(n_calls * steps_per_call
                     / (time.perf_counter() - t0))

    steps_per_sec = float(np.median(rates))
    return {
        "train_steps_per_sec": round(steps_per_sec, 3),
        "train_step_device_ms": round(1e3 / steps_per_sec, 3),
        "train_batch_size": batch_size,
    }


def run_fullscale_bench(args):
    """Ride-along measurement of the REFERENCE-DEFAULTS sampling workload
    (T=1000, n_convs=4, endpoint parameterization — pharmacodiff.py:32,43-44
    sets T=1000; endpoint matches BASELINE config #2's named training mode)
    so the driver-visible JSON line records the full-scale regime every
    round, not just the dev workload. Kept cheap: 3 repeats x pipeline
    depth 4 at the measured full-scale knee (pockets_per_call=4) is ~4-5
    chains x ~5.5 s each per repeat."""
    import copy

    fs = copy.copy(args)
    fs.quick = False
    fs.n_timesteps, fs.n_convs, fs.endpoint_param = 1000, 4, True
    fs.pockets_per_call = 4
    fs.pipeline_depth = 4
    fs.repeats = 3
    fs.profile_dir = None
    model, batch, group, *_ = build_workload(fs)
    sres = run_sampling_bench(fs, model, batch, group)
    rate = statistics.median(sres["rates"])
    # full-scale TRAIN steps/s rides along too (run_train_bench honors the
    # n_convs=4/endpoint flags; the fused Pallas backward engages here)
    tres = ({} if args.skip_train_bench else run_train_bench(fs))
    return {
        **{f"fullscale_{k}": v for k, v in tres.items()},
        "fullscale_samples_per_sec": round(rate, 3),
        "fullscale_spread_min": round(min(sres["rates"]), 3),
        "fullscale_spread_max": round(max(sres["rates"]), 3),
        "fullscale_chain_latency_ms": round(sres["chain_latency_ms"], 1),
        "fullscale_mfu":
            round(sres["mfu"], 4) if sres["mfu"] is not None else None,
        "fullscale_vs_baseline": round(
            rate / baseline_for_workload(1000, 4), 3),
        "fullscale_workload": "T=1000 n_convs=4 endpoint_param "
                              "pockets_per_call=4",
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help="tiny model + short chain (CI smoke)")
    p.add_argument("--samples_per_pocket", type=int, default=30)
    p.add_argument("--max_batch_size", type=int, default=32)
    p.add_argument("--pocket_atoms", type=int, default=230)
    p.add_argument("--n_timesteps", type=int, default=100,
                   help="reverse-chain length (dev 100; reference model "
                        "default 1000)")
    p.add_argument("--n_convs", type=int, default=2,
                   help="conv stack depth (dev 2; reference default 4)")
    p.add_argument("--endpoint_param", action="store_true",
                   help="endpoint parameterization for both coord and feat "
                        "(the 'Full endpoint_param training' config)")
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--pipeline_depth", type=int, default=16,
                   help="calls enqueued back-to-back per repeat (a "
                        "multi-pocket sweep keeps the dispatch queue full; "
                        "1 = pure latency mode)")
    p.add_argument("--pockets_per_call", type=int, default=None,
                   help="distinct pockets stacked into one device batch "
                        "(PocketSampler.sample_stacked layout); per-step "
                        "ops are tiny at single-pocket batch, stacking "
                        "amortizes their fixed cost. Default: the measured "
                        "knee per regime — 8 at dev shapes (n_convs<4, "
                        "with dedup_prot_encoder), 4 at full-scale convs "
                        "(n_convs>=4, where the per-copy pp kernels "
                        "dominate and wider batches only grow their "
                        "working set; scripts/ab_pockets full-scale sweep: "
                        "4 > 2,6,8,12,16)")
    p.add_argument("--matmul_precision", type=str, default="bfloat16",
                   choices=["float32", "tensorfloat32", "bfloat16"],
                   help="matmul precision for the sampling chain (bf16 rides "
                        "the MXU fast path; coordinates stay fp32)")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="write a jax.profiler trace of the timed region here")
    p.add_argument("--measure_torch_baseline", action="store_true",
                   help="also time the reference-semantics torch executor "
                        "on this host's CPU (slow)")
    p.add_argument("--skip_train_bench", action="store_true",
                   help="report sampling throughput only (skip the "
                        "train-steps/sec extras)")
    p.add_argument("--skip_fullscale_bench", action="store_true",
                   help="skip the ride-along full-scale (T=1000, n_convs=4, "
                        "endpoint) sampling measurement that the default "
                        "dev-workload run appends as fullscale_* keys")
    p.add_argument("--_worker", action="store_true",
                   help=argparse.SUPPRESS)
    p.add_argument("--no_supervisor", action="store_true",
                   help="run in-process (no bounded worker subprocess); "
                        "hangs in backend init then become unrecoverable")
    p.add_argument("--worker_timeout", type=float, default=None,
                   help="seconds before a hung bench worker is killed and "
                        "respawned (default: 1800 scaled up for non-default "
                        "chain length / conv depth / torch baseline)")
    args = p.parse_args()

    if args.pockets_per_call is None:
        # regime-dependent knee (see the flag help / docs/performance.md)
        args.pockets_per_call = 8 if args.n_convs < 4 else 4

    if args.worker_timeout is None:
        # a legitimately long measurement must not be mistaken for a hang:
        # scale the kill budget with the workload the flags describe
        scale = max(1.0, (args.n_timesteps / 100) * (args.n_convs / 2))
        args.worker_timeout = 1800.0 * scale
        if args.measure_torch_baseline:
            args.worker_timeout += 3600.0
        if not (args.quick or args.skip_fullscale_bench
                or (args.n_timesteps >= 1000 and args.n_convs >= 4)):
            # the default run appends the full-scale ride-along (compile +
            # ~15 fenced T=1000 chains); budget it explicitly
            args.worker_timeout += 1500.0

    if not args._worker and not args.no_supervisor:
        # supervisor mode: respawn self as a bounded, retriable worker
        raise SystemExit(supervise(sys.argv[1:],
                                   worker_timeout=args.worker_timeout))

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/pharmaforge_jax_cache")
    jax.config.update("jax_default_matmul_precision", args.matmul_precision)
    import os
    if os.environ.get("JAX_PLATFORMS"):
        # honor the env var even on hosts whose site hook re-selects a TPU
        # plugin after import (lets CI smoke the bench on CPU)
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    # host-side workload build (pure numpy — no device state, so the
    # retriable phases below can rebuild device arrays from it at will)
    model, batch, group, prot_x, prot_h, sizes = build_workload(args)

    # every device-touching phase goes through _retry_device: round 2's
    # bench died with an UNAVAILABLE backend-init error at the very first
    # device_put, before any retry logic could see it
    sres = _retry_device(lambda: run_sampling_bench(args, model, batch, group),
                         "sampling bench")

    rates = sres["rates"]
    median_rate = statistics.median(rates)
    result = {
        "metric": "pharmacophore samples/sec/chip (full DDPM chain)",
        # which backend actually ran: the headline is a TPU number; "cpu"
        # marks an outage-fallback record, NOT comparable to the baseline
        "platform": jax.devices()[0].platform,
        # "quick" marks the reduced CI/outage-fallback workload — its value
        # is not comparable to a full-workload record
        "workload": "quick" if args.quick else "full",
        "value": round(median_rate, 3),
        "unit": "samples/sec/chip",
        "vs_baseline": round(median_rate / baseline_for_workload(
            args.n_timesteps, args.n_convs), 3),
        "baseline_samples_per_sec": round(baseline_for_workload(
            args.n_timesteps, args.n_convs), 2),
        # the derived A100 denominator was built at the dev workload
        # (T=100, n_convs=2); any other (T, convs) — including --quick's
        # 20x UPWARD extrapolation to (10, 1) — rescales it linearly per
        # the kernel-launch model, so those vs_baseline values are NOT
        # comparable to dev-workload records and are flagged as such
        **({"baseline_extrapolated": True}
           if (args.n_timesteps, args.n_convs) != (100, 2) else {}),
        "spread_min": round(min(rates), 3),
        "spread_max": round(max(rates), 3),
        "repeats": args.repeats,
        "rates_per_repeat": [round(r, 1) for r in rates],
        "pipeline_depth": sres["depth"],
        "pockets_per_call": max(args.pockets_per_call, 1),
        "chain_latency_ms": round(sres["chain_latency_ms"], 2),
        "mfu_vs_bf16_peak":
            round(sres["mfu"], 4) if sres["mfu"] is not None else None,
        # sanity tripwire: derived MFU past the hardware peak means the
        # timing lied (that is exactly how the block_until_ready early
        # return was caught) — mark the record untrustworthy rather than
        # publishing an impossible number silently
        **({"timing_suspect": True}
           if sres["mfu"] is not None and sres["mfu"] > 1.0 else {}),
        "chain_gflops":
            round(sres["chain_flops"] / 1e9, 2) if sres["chain_flops"]
            else None,
        "step_cost_model_gbytes_unfused":
            round(sres["body_bytes"] / 1e9, 3) if sres["body_bytes"]
            else None,
    }
    if not args.skip_train_bench:
        try:
            result.update(
                _retry_device(lambda: run_train_bench(args), "train bench"))
        except Exception as e:  # the headline metric still prints
            print(f"train bench failed ({type(e).__name__}: {e}); "
                  f"reporting sampling throughput only", file=sys.stderr)
            result["train_steps_per_sec"] = None
    if not (args.quick or args.skip_fullscale_bench
            or (args.n_timesteps >= 1000 and args.n_convs >= 4)):
        # the regime where the perf engineering happens must reach the
        # driver's one JSON line, not just docs (VERDICT r4 weak #2)
        try:
            result.update(_retry_device(lambda: run_fullscale_bench(args),
                                        "full-scale bench"))
        except Exception as e:  # the headline metric still prints
            print(f"full-scale bench failed ({type(e).__name__}: {e}); "
                  f"reporting dev workload only", file=sys.stderr)
            result["fullscale_samples_per_sec"] = None
    if args.measure_torch_baseline:
        result["torch_executor_samples_per_sec_host_cpu"] = round(
            measure_torch_baseline(args, prot_x, prot_h, sizes), 4)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
