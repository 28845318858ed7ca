"""Capture a profiler trace of the FULL-SCALE sampling step (n_convs=4).

The round-3 full-scale diagnosis (docs/performance.md) was made from an
unfused byte model, not a trace; this script records the real op-level time
breakdown with the fused pp kernel on vs off, so the kernel's end-to-end
effect (VERDICT weak #1) is diagnosed from measurements.

Writes /tmp/pf_trace_<variant>/ and prints the top self-time ops via
tensorboard_plugin_profile's xplane converter.

Usage: python -m scripts.profile_fullscale [--variants off,on] [--t 20]
"""

import argparse
import glob
import json
import time

import numpy as np


def top_ops_from_xplane(logdir, n=25):
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    files = glob.glob(f"{logdir}/plugins/profile/*/*.xplane.pb")
    if not files:
        return None
    params = {"tqx": "out:json;"}
    try:
        data, _ = rtd.xspace_to_tool_data(files, "op_profile", params)
    except Exception as e:  # tool naming varies across versions
        print(f"op_profile conversion failed: {e}")
        return None
    return data


def hlo_table_from_xplane(logdir):
    """Fallback: per-HLO-op self time from the hlo_op_stats tool (if
    present), else from trace_viewer json."""
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    files = glob.glob(f"{logdir}/plugins/profile/*/*.xplane.pb")
    for tool in ("hlo_op_stats", "tensorflow_stats", "framework_op_stats"):
        try:
            data, _ = rtd.xspace_to_tool_data(files, tool, {"tqx": "out:csv;"})
            return tool, data
        except Exception:
            continue
    return None, None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="off,on")
    ap.add_argument("--t", type=int, default=20,
                    help="chain length for the traced call (per-step cost is "
                    "T-invariant; short chains keep traces small)")
    ap.add_argument("--n_convs", type=int, default=4)
    ap.add_argument("--pockets", type=int, default=8)
    ap.add_argument("--copies", type=int, default=30)
    ap.add_argument("--pocket_atoms", type=int, default=230)
    args = ap.parse_args()

    from pharmaforge_tpu.utils.misc import setup_jax
    setup_jax()
    import jax
    jax.config.update("jax_default_matmul_precision", "bfloat16")

    from pharmaforge_tpu.data.batch import tile_pocket
    from pharmaforge_tpu.data.synthetic import make_synthetic_pocket
    from pharmaforge_tpu.models.diffusion import (DiffusionConfig,
                                                  PharmacophoreDiffusion)
    from pharmaforge_tpu.utils.timing import fence

    tiles = []
    sizes = np.random.default_rng(0).integers(3, 9, args.copies)
    for i in range(args.pockets):
        r = np.random.default_rng(i)
        px, pe = make_synthetic_pocket(r, np.zeros(3), args.pocket_atoms)
        tiles.append(tile_pocket(px.astype(np.float32),
                                 np.eye(11, dtype=np.float32)[pe],
                                 sizes, max_prot=args.pocket_atoms))
    batch = jax.tree_util.tree_map(lambda *xs: np.concatenate(xs, 0), *tiles)

    base = dict(n_timesteps=args.t, n_convs=args.n_convs,
                n_hidden_scalars=128, vector_size=16, message_norm="mean",
                n_message_gvps=3, n_update_gvps=2, n_noise_gvps=4,
                pf_k=5, pp_k_max=16, compute_dtype="bfloat16")

    for variant in args.variants.split(","):
        model = PharmacophoreDiffusion(
            DiffusionConfig(fused_pp=variant == "on", **base))
        params = model.init_params(jax.random.key(0), batch)
        fn = jax.jit(lambda p, b, k, m=model: m.sample_given_receptor(
            p, b, k, pocket_group_size=args.copies))
        out = fn(params, batch, jax.random.key(1))
        fence(out["pharm_x"])
        # timed (fenced) single-call latency for context
        t0 = time.perf_counter()
        out = fn(params, batch, jax.random.key(2))
        fence(out["pharm_x"])
        ms_per_step = (time.perf_counter() - t0) * 1e3 / args.t
        print(f"[{variant}] ~{ms_per_step:.2f} ms/diffusion-step "
              f"(incl. one tunnel round-trip over {args.t} steps)")

        logdir = f"/tmp/pf_trace_{variant}"
        with jax.profiler.trace(logdir):
            out = fn(params, batch, jax.random.key(3))
            fence(out["pharm_x"])
        print(f"[{variant}] trace written to {logdir}")

        data = top_ops_from_xplane(logdir)
        if data:
            with open(f"/tmp/pf_opprofile_{variant}.json", "w") as f:
                f.write(data if isinstance(data, str)
                        else json.dumps(data))
            print(f"[{variant}] op profile -> /tmp/pf_opprofile_{variant}.json")
        tool, table = hlo_table_from_xplane(logdir)
        if table:
            path = f"/tmp/pf_{tool}_{variant}.csv"
            with open(path, "w") as f:
                f.write(table if isinstance(table, str) else str(table))
            print(f"[{variant}] {tool} -> {path}")


if __name__ == "__main__":
    main()
