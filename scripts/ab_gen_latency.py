"""Interleaved A/B: generate-CLI single-shot latency, latency_mode on/off.

VERDICT r4 #7: the generate CLI auto-flips `precompute_step_tables` on
(generate_pharmacophores.py latency-mode auto), but the only committed
numbers for that knob were dev-shape A/Bs within spread. This runs the
CLI's exact code path — resolve_run_dir/load_model, the builtin pocket
builder on a ~230-atom receptor, PocketSampler.sample_pocket — at full
scale (T=1000, n_convs=4) in ONE process, alternating modes, and reports
every phase separately: backend init, checkpoint load, pocket build,
COLD first call (what a CLI user actually waits: compile + tables +
chain) and WARM steady-state calls per mode.

  python -m scripts.ab_gen_latency /tmp/gen_lat/rec.pdb /tmp/gen_lat/lig.sdf

Fixture: scripts in /tmp/gen_lat/make_fixture.py (synthetic 240-atom
pocket, 60 standard-AA residues within 8 A of a 13-atom ligand).
"""

import dataclasses
import os
import sys
import time
from pathlib import Path

import numpy as np

from pharmaforge_tpu.utils.misc import setup_jax

t00 = time.perf_counter()
setup_jax()
import jax  # noqa: E402

jax.devices()
T_INIT = time.perf_counter() - t00

REPEATS = int(os.environ.get("AB_REPEATS", "3"))
SAMPLES = int(os.environ.get("AB_SAMPLES", "30"))


def main():
    rec = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/gen_lat/rec.pdb")
    lig = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/gen_lat/lig.sdf")
    run_dir = Path(os.environ.get("AB_MODEL_DIR",
                                  "runs/fullscale-randinit_gen7"))

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import generate_pharmacophores as g
    from pharmaforge_tpu.models.size_dist import PharmSizeDistribution
    from pharmaforge_tpu.models.diffusion import PharmacophoreDiffusion
    from pharmaforge_tpu.training.restore import load_model
    from pharmaforge_tpu.training.sampling import PocketSampler
    from pharmaforge_tpu.utils.misc import get_prot_atom_ph_type_maps

    print(f"backend init: {T_INIT:.1f}s")

    t0 = time.perf_counter()
    model, params, config = load_model(run_dir, "last")
    print(f"load_model: {time.perf_counter() - t0:.1f}s")

    dataset_config = config["dataset"]
    prot_element_map, _ = get_prot_atom_ph_type_maps(dataset_config)
    out = Path("/tmp/gen_lat/ab_out")
    out.mkdir(parents=True, exist_ok=True)
    t0 = time.perf_counter()
    pocket = g.process_ligand_and_pocket(
        rec, out, prot_element_map=prot_element_map,
        pocket_cutoff=dataset_config["pocket_cutoff"], lig_file=lig,
        remove_hydrogen=True)
    print(f"pocket build: {time.perf_counter() - t0:.1f}s "
          f"({pocket['prot_x'].shape[0]} atoms)")

    size_dist = PharmSizeDistribution(None, seed=3)
    pharm_sizes = list(size_dist.sample_uniformly(SAMPLES))

    samplers = {}
    for mode in ("on", "off"):
        m = (PharmacophoreDiffusion(dataclasses.replace(
            model.config, precompute_step_tables=True))
            if mode == "on" else model)
        samplers[mode] = PocketSampler(
            m, params, pharm_type_map=dataset_config["ph_type_map"])

    times = {"on": [], "off": []}
    for r in range(REPEATS + 1):  # r0 = cold (compile + tables)
        for mode in ("on", "off"):
            t0 = time.perf_counter()
            pharms = samplers[mode].sample_pocket(
                pocket, pharm_sizes, jax.random.key(3 + r),
                max_batch_size=32)
            dt = time.perf_counter() - t0
            kind = "COLD" if r == 0 else "warm"
            print(f"r{r} {mode} ({kind}): {dt:.2f}s "
                  f"({len(pharms)} pharms)", flush=True)
            if r > 0:
                times[mode].append(dt)
    for mode in ("on", "off"):
        ts = times[mode]
        print(f"{mode}: warm median {np.median(ts):.2f}s "
              f"(spread {min(ts):.2f}-{max(ts):.2f})")
    med_on, med_off = np.median(times["on"]), np.median(times["off"])
    print(f"warm on/off delta: {med_off - med_on:+.2f}s "
          f"({med_off / med_on:.2f}x)")


if __name__ == "__main__":
    main()
