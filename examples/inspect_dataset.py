"""Processed-dataset inspection: the reference notebooks as a script.

Counterpart of the reference's exploratory notebooks (pharmacophores.ipynb
size/type histograms, data/data_analysis.ipynb pickle inspection): loads a
processed split directory and prints pharmacophore-size, type-frequency,
and pocket-size statistics. Works on the synthetic dataset too:

    python examples/inspect_dataset.py [processed_data_dir]
"""

import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from pharmaforge_tpu.constants import PH_IDX_TO_TYPE


def inspect(processed_dir: Path) -> dict:
    stats = {}
    for split_dir in sorted(p for p in processed_dir.iterdir() if p.is_dir()):
        f = split_dir / "prot_pharm_tensors.npz"
        if not f.exists():
            continue
        d = np.load(f)
        pharm_sizes = d["pharm_idx"][:, 1] - d["pharm_idx"][:, 0]
        prot_sizes = d["prot_idx"][:, 1] - d["prot_idx"][:, 0]
        types = Counter(int(t) for t in d["pharm_feat"].ravel())
        stats[split_dir.name] = {
            "complexes": len(pharm_sizes),
            "pharm_size_hist": dict(
                sorted(Counter(pharm_sizes.tolist()).items())),
            "pocket_atoms": (int(prot_sizes.min()),
                             float(prot_sizes.mean()),
                             int(prot_sizes.max())),
            "type_freq": {PH_IDX_TO_TYPE[k]: v
                          for k, v in sorted(types.items())},
        }
    if not stats:
        raise SystemExit(f"no prot_pharm_tensors.npz under {processed_dir}")
    return stats


if __name__ == "__main__":
    if len(sys.argv) > 1:
        data_dir = Path(sys.argv[1])
    else:
        data_dir = Path("/tmp/inspect_demo_data")
        if not data_dir.exists():
            from pharmaforge_tpu.data.synthetic import \
                make_synthetic_processed_dataset
            print(f"no dir given: generating a synthetic set at {data_dir}")
            make_synthetic_processed_dataset(data_dir, samples_per_split=32)
    for split, s in inspect(data_dir).items():
        print(f"\n== {split}: {s['complexes']} complexes ==")
        print("pharm centers per complex:", s["pharm_size_hist"])
        lo, mean, hi = s["pocket_atoms"]
        print(f"pocket heavy atoms: min {lo} / mean {mean:.1f} / max {hi}")
        total = sum(s["type_freq"].values())
        for t, c in s["type_freq"].items():
            print(f"  {t:<18s} {c:>6d}  ({c / total:.1%})")
