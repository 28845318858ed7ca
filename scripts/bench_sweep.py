"""Batched multi-pocket generation sweep: 100 receptors end-to-end.

BASELINE.json config #4 ("Batched multi-pocket generation across 100
receptors with size-bucketed masked point clouds + metrics"): generate
`--samples_per_pocket` pharmacophores for `--n_pockets` DISTINCT synthetic
receptors, decode to SampledPharmacophore objects, and score validity —
timing the WHOLE sweep (device chains + host decode + metrics), which is
what a user's evaluation run actually costs.

Device work is chunked `--pockets_per_call` pockets per call (pocket-major
rows, per-group prot-prot dedup — the PocketSampler.sample_stacked layout)
and ALL chunks are dispatched before the single blocking sync, so the
tunnel round-trip overlaps device execution exactly as in bench.py.

Prints one JSON line:
    {"metric": "sweep samples/sec/chip (100 receptors, end-to-end)", ...}

Run: python -m scripts.bench_sweep [--n_pockets 100]
"""

import argparse
import json
import time

import numpy as np

from pharmaforge_tpu.utils.timing import fence


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_pockets", type=int, default=100)
    p.add_argument("--samples_per_pocket", type=int, default=30)
    p.add_argument("--pockets_per_call", type=int, default=8)
    p.add_argument("--pocket_atoms_range", type=int, nargs=2,
                   default=(120, 300))
    p.add_argument("--n_timesteps", type=int, default=100)
    p.add_argument("--quick", action="store_true",
                   help="tiny model + short chain + few pockets (CI smoke)")
    p.add_argument("--matmul_precision", default="bfloat16",
                   choices=["float32", "tensorfloat32", "bfloat16"])
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/pharmaforge_jax_cache")
    jax.config.update("jax_default_matmul_precision", args.matmul_precision)
    import os
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from pharmaforge_tpu.analysis.metrics import SampleAnalyzer
    from pharmaforge_tpu.analysis.pharm_builder import SampledPharmacophore
    from pharmaforge_tpu.constants import PH_IDX_TO_TYPE
    from pharmaforge_tpu.data.batch import tile_pocket
    from pharmaforge_tpu.data.synthetic import (make_sites_and_pharms,
                                                make_synthetic_pocket)
    from pharmaforge_tpu.models.diffusion import (DiffusionConfig,
                                                  PharmacophoreDiffusion)

    if args.quick:
        cfg = DiffusionConfig(n_timesteps=8, n_convs=1, n_hidden_scalars=32,
                              vector_size=8, message_norm="mean",
                              n_message_gvps=2, n_update_gvps=1,
                              n_noise_gvps=2, pf_k=5, pp_k_max=16)
        args.n_pockets = min(args.n_pockets, 4)
        args.samples_per_pocket = min(args.samples_per_pocket, 4)
        args.pockets_per_call = min(args.pockets_per_call, 2)
    else:
        cfg = DiffusionConfig(n_timesteps=args.n_timesteps, n_convs=2,
                              n_hidden_scalars=128, vector_size=16,
                              message_norm="mean", n_message_gvps=3,
                              n_update_gvps=2, n_noise_gvps=4, pf_k=5,
                              pp_k_max=16, compute_dtype="bfloat16"
                              if args.matmul_precision == "bfloat16"
                              else "float32")
    model = PharmacophoreDiffusion(cfg)

    # distinct receptors with receptor pharmacophore sites (deterministic
    # rule: the variant whose validity ceiling is ~1.0) for the metrics leg
    rng = np.random.default_rng(0)
    pockets = []
    for _ in range(args.n_pockets):
        center = rng.normal(scale=30.0, size=3)
        p_pos, p_elem = make_synthetic_pocket(
            rng, center, int(rng.integers(*args.pocket_atoms_range)))
        q_pos, q_type, _, _ = make_sites_and_pharms(
            rng, center, p_pos, p_elem, 4, 20, site_rule="deterministic")
        pockets.append({
            "prot_x": p_pos.astype(np.float32),
            "prot_h": np.eye(11, dtype=np.float32)[p_elem],
            "prot_ph_x": q_pos.astype(np.float32),
            "prot_ph_h": np.eye(6, dtype=np.float32)[q_type],
        })

    c = args.samples_per_pocket
    sizes = [int(rng.integers(3, 9)) for _ in range(c)]

    # size-bucketed masked point clouds (the workload's own wording): sort
    # pockets by size so each chunk is near-homogeneous, pad each chunk to
    # ITS bucket (multiples of 64) — fewer padded rows than one global
    # slot count, at the cost of one compile per distinct bucket (2-3)
    order = sorted(range(len(pockets)),
                   key=lambda i: len(pockets[i]["prot_x"]))
    pockets = [pockets[i] for i in order]

    def bucket_of(chunk):
        m = max(len(p["prot_x"]) for p in chunk)
        return 64 * (-(-m // 64))

    def make_chunk(chunk):
        slots = bucket_of(chunk)
        tiles = [tile_pocket(p["prot_x"], p["prot_h"], sizes,
                             n_pharm_feats=cfg.pharm_nf,
                             max_prot=slots) for p in chunk]
        batch = jax.tree_util.tree_map(
            lambda *xs: np.concatenate(xs, axis=0), *tiles)
        pm = batch.prot_mask[::c][..., None]
        coms = ((batch.prot_x[::c] * pm).sum(1)
                / np.maximum(pm.sum(1), 1)).astype(np.float32)
        return batch, np.repeat(coms, c, axis=0)

    chunks = [pockets[i:i + args.pockets_per_call]
              for i in range(0, len(pockets), args.pockets_per_call)]
    # pad the tail chunk with repeats so every call compiles to one shape
    while len(chunks[-1]) < args.pockets_per_call:
        chunks[-1] = chunks[-1] + [chunks[-1][-1]]

    batches = [make_chunk(ch) for ch in chunks]
    n_shapes = len({b.prot_x.shape for b, _ in batches})
    params = model.init_params(jax.random.key(0), batches[0][0])

    def fn(p, b, k, com):
        return model.sample_given_receptor(p, b, k, init_pharm_com=com,
                                           pocket_group_size=c)

    jitted = jax.jit(fn)
    # warmup/compile every bucket shape before the timed sweep
    seen = set()
    for b, com in batches:
        if b.prot_x.shape in seen:
            continue
        seen.add(b.prot_x.shape)
        out = jitted(params, b, jax.random.key(1), com)
        fence(out["pharm_x"])

    # ---- the timed sweep: dispatch all chunks, sync once, decode + score
    t0 = time.perf_counter()
    outs = [jitted(params, b, jax.random.key(10 + i), com)
            for i, (b, com) in enumerate(batches)]
    fence([o["pharm_x"] for o in outs])
    t_device = time.perf_counter() - t0

    analyzer = SampleAnalyzer()
    validities = []
    n_decoded = 0
    for ch_i, (chunk, out) in enumerate(zip(chunks, outs)):
        host = jax.device_get(out)  # one batched d2h fetch per chunk
        for i, pocket in enumerate(chunk):
            if ch_i * args.pockets_per_call + i >= args.n_pockets:
                break  # tail padding
            idxs = pocket["prot_ph_h"].argmax(axis=1)
            sub = {k: v[i * c:(i + 1) * c] for k, v in host.items()}
            pharms = SampledPharmacophore.from_batch(
                sub, PH_IDX_TO_TYPE, with_trajectory=False,
                prot_ph_pos=pocket["prot_ph_x"],
                prot_ph_types=[PH_IDX_TO_TYPE[int(j)] for j in idxs])
            n_decoded += len(pharms)
            validities.append(analyzer.analyze(pharms)["validity"])
    t_total = time.perf_counter() - t0

    n_chips = jax.device_count()
    result = {
        "metric": f"sweep samples/sec/chip ({args.n_pockets} receptors, "
                  f"end-to-end)",
        "value": round(n_decoded / t_total / n_chips, 3),
        "unit": "samples/sec/chip",
        "n_pockets": args.n_pockets,
        "samples_per_pocket": c,
        "n_samples": n_decoded,
        "device_sweep_s": round(t_device, 3),
        "total_s": round(t_total, 3),
        "device_samples_per_sec_per_chip":
            round(len(chunks) * args.pockets_per_call * c / t_device
                  / n_chips, 3),
        "mean_validity": round(float(np.mean(validities)), 4),
        "n_timesteps": cfg.n_timesteps,
        "n_bucket_shapes": n_shapes,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
