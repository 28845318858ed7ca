"""Inspect pharmit `ph.json` pharmacophore files — the scriptable analog of
the pharmit-exploration half of the reference's pharmacophores.ipynb
(cells computing feature-count and feature-kind histograms; the
dataset-statistics half lives in examples/inspect_dataset.py).

Usage:
    python -m examples.inspect_pharmit_json path/to/ph.json [more.json ...]
    python -m examples.inspect_pharmit_json            # built-in demo doc

For each file: the enabled/disabled point counts and a per-point listing;
across files: feature-count and feature-kind histograms (text bars;
`--plot out.png` additionally writes the matplotlib version when
matplotlib is installed).

Handles the real-world quirk the preprocessing pipeline handles: some
pharmit outputs concatenate a second JSON object after the pharmacophore
(reference process_crossdocked.py:75-79) — parsing takes the first.
"""

import argparse
import json
import sys
from collections import Counter

from pharmaforge_tpu.constants import ph_idx_to_type
from pharmaforge_tpu.preprocessing.crossdocked import (parse_pharmit_json,
                                                       pharmit_points)

# a small pharmit-format document (with the trailing second-object quirk)
# so the example runs without any dataset present
DEMO_DOC = json.dumps({
    "points": [
        {"name": "Aromatic", "x": 1.2, "y": 0.4, "z": -3.1,
         "radius": 1.1, "enabled": True},
        {"name": "HydrogenDonor", "x": -0.8, "y": 2.2, "z": -1.5,
         "radius": 0.5, "enabled": True},
        {"name": "HydrogenAcceptor", "x": 0.3, "y": -1.9, "z": 0.7,
         "radius": 0.5, "enabled": True},
        {"name": "Hydrophobic", "x": 2.5, "y": 1.1, "z": 1.9,
         "radius": 1.0, "enabled": False},
        {"name": "NegativeIon", "x": -2.0, "y": 0.0, "z": 2.4,
         "radius": 0.75, "enabled": True},
    ],
}) + json.dumps({"extra": "second concatenated object (ignored)"})


def text_hist(counts: Counter, labels, width=40):
    total = max(sum(counts.values()), 1)
    peak = max(counts.values(), default=1)
    lines = []
    for key in labels:
        n = counts.get(key, 0)
        bar = "#" * round(width * n / peak) if peak else ""
        lines.append(f"  {str(key):>16} {n:>6} ({n / total:5.1%}) {bar}")
    return "\n".join(lines)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("paths", nargs="*", help="pharmit ph.json files "
                   "(none: a built-in demo document)")
    p.add_argument("--plot", default=None,
                   help="also write matplotlib histograms to this png")
    p.add_argument("--quiet", action="store_true",
                   help="skip the per-point listing")
    args = p.parse_args(argv)

    docs = ([(path, open(path).read()) for path in args.paths]
            or [("<demo>", DEMO_DOC)])

    sizes = []
    kind_counts: Counter = Counter()
    for name, text in docs:
        ph = parse_pharmit_json(text)
        coords, kinds = pharmit_points(ph)
        n_all = len(ph.get("points", []))
        print(f"{name}: {len(coords)} enabled / {n_all} points")
        if not args.quiet:
            for pt in ph.get("points", []):
                flag = " " if pt["enabled"] else "x"
                print(f"  [{flag}] {pt['name']:>16} "
                      f"({pt['x']:7.2f}, {pt['y']:7.2f}, {pt['z']:7.2f}) "
                      f"r={pt.get('radius', 0):.2f}")
        sizes.append(len(coords))
        kind_counts.update(ph_idx_to_type[int(k)] for k in kinds)

    print(f"\nfeature count per pharmacophore "
          f"(n={len(sizes)}, min={min(sizes)}, max={max(sizes)}):")
    print(text_hist(Counter(sizes), sorted(set(sizes))))
    print("\nfeature kinds:")
    print(text_hist(kind_counts, list(ph_idx_to_type)))

    if args.plot:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            print("matplotlib not installed; skipping --plot",
                  file=sys.stderr)
            return
        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 4))
        ax1.hist(sizes, bins=range(max(sizes) + 2))
        ax1.set_xlabel("# Features")
        ax1.set_ylabel("Count")
        labels = list(ph_idx_to_type)
        ax2.bar(labels, [kind_counts.get(t, 0) for t in labels])
        ax2.set_ylabel("Count")
        ax2.tick_params(axis="x", rotation=90)
        fig.tight_layout()
        fig.savefig(args.plot, dpi=120)
        print(f"wrote {args.plot}")


if __name__ == "__main__":
    main()
