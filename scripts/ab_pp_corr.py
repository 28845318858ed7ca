"""Interleaved in-process A/B of the middle-conv pocket-copy CORRECTION
path (models/conv.py `pp_correction`) at the full-scale bench workload.

Builds the same sampling chain twice — pp_k_out=0 (plain grouped fused
path) and pp_k_out probed (clean group pass + sparse per-copy correction)
— and alternates timed repeats within ONE process, the only trustworthy
timing method on this tunneled deployment (docs/performance.md).

    AB_REPEATS=4 AB_DEPTH=4 python -m scripts.ab_pp_corr
"""

import os
import statistics
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/pharmaforge_jax_cache")
jax.config.update("jax_default_matmul_precision", "bfloat16")


def main():
    import numpy as np

    from bench import build_workload
    from pharmaforge_tpu.training.sampling import probe_pp_k_out
    from pharmaforge_tpu.utils.timing import fence

    class A:
        quick = False
        samples_per_pocket = 30
        max_batch_size = 32
        pocket_atoms = 230
        n_timesteps = int(os.environ.get("AB_T", 1000))
        n_convs = int(os.environ.get("AB_CONVS", 4))
        endpoint_param = True
        pockets_per_call = int(os.environ.get("AB_POCKETS", 4))
        matmul_precision = "bfloat16"

    repeats = int(os.environ.get("AB_REPEATS", 4))
    depth = int(os.environ.get("AB_DEPTH", 4))

    model, batch, group, *_ = build_workload(A)
    params = model.init_params(jax.random.key(0), batch)

    k_out = probe_pp_k_out(model, batch.prot_x[::group],
                           batch.prot_mask[::group])
    print(f"probed pp_k_out = {k_out} (group={group}, "
          f"batch={batch.batch_size})", flush=True)
    if not k_out:
        raise SystemExit("correction path did not engage")

    def make(kv):
        def fn(p, b, k):
            return model.sample_given_receptor(
                p, b, k, pocket_group_size=group, pp_k_out=kv)
        c = jax.jit(fn).lower(params, batch, jax.random.key(1)).compile()
        out = c(params, batch, jax.random.key(1))
        fence(out["pharm_x"])
        return c

    t0 = time.perf_counter()
    plain = make(0)
    print(f"plain compiled+warm in {time.perf_counter() - t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    corr = make(k_out)
    print(f"corr  compiled+warm in {time.perf_counter() - t0:.1f}s",
          flush=True)

    prof = os.environ.get("AB_PROFILE")
    if prof:
        # one profiled corr call for scripts/read_xplane.py attribution
        with jax.profiler.trace(prof):
            out = corr(params, batch, jax.random.key(999))
            fence(out["pharm_x"])
        print(f"profile written to {prof}", flush=True)

    rates = {"plain": [], "corr": []}
    for r in range(repeats):
        for name, c in (("plain", plain), ("corr", corr)):
            t0 = time.perf_counter()
            outs = [c(params, batch, jax.random.key(2 + r * 97 + i))
                    for i in range(depth)]
            fence([o["pharm_x"] for o in outs])
            dt = time.perf_counter() - t0
            rate = depth * batch.batch_size / dt
            rates[name].append(rate)
            print(f"repeat {r} {name:5s}: {rate:8.2f} samples/s "
                  f"({dt:.2f}s)", flush=True)
    # first repeat of each arm can carry residual warmup; report both
    for name in ("plain", "corr"):
        med = statistics.median(rates[name])
        print(f"{name:5s}: median {med:.2f} samples/s "
              f"(spread {min(rates[name]):.2f}-{max(rates[name]):.2f})",
              flush=True)
    print(f"speedup corr/plain = "
          f"{statistics.median(rates['corr']) / statistics.median(rates['plain']):.3f}x",
          flush=True)
    # parity spot-check on device
    oa = plain(params, batch, jax.random.key(5))
    ob = corr(params, batch, jax.random.key(5))
    dx = float(jax.numpy.max(jax.numpy.abs(oa["pharm_x"] - ob["pharm_x"])))
    dh = float(jax.numpy.max(jax.numpy.abs(oa["pharm_h"] - ob["pharm_h"])))
    print(f"max |dx| = {dx:.3e}, max |dh| = {dh:.3e} "
          f"(bf16 chain, T={A.n_timesteps})", flush=True)


if __name__ == "__main__":
    main()
