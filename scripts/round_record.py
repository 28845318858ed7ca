"""CI-style round gate: run the FULL test suite (fast + slow tiers) and
commit-record the result.

VERDICT r3 weak #7: `pytest tests/` deselects the 9+ `slow`-marked tests —
the ones guarding the distributed/e2e machinery — so a default-run suite
could rot silently. This script runs both tiers, prints a one-line verdict,
writes `evidence/TESTS_<tag>.md`, and exits non-zero if either tier fails —
run it once per round alongside bench.py.

Usage: python -m scripts.round_record [--tag r04] [--skip_fast]
"""

import argparse
import datetime
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).parents[1]


def run_tier(name: str, args: list) -> dict:
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q", *args],
        cwd=REPO, capture_output=True, text=True)
    tail = "\n".join(proc.stdout.strip().splitlines()[-3:])
    return {"name": name, "rc": proc.returncode,
            "secs": round(time.time() - t0, 1), "tail": tail}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default=None,
                    help="record suffix (default: current date)")
    ap.add_argument("--skip_fast", action="store_true",
                    help="slow tier only (fast tier already green elsewhere)")
    args = ap.parse_args(argv)

    tiers = []
    if not args.skip_fast:
        tiers.append(run_tier("fast (default deselection)", ["-x"]))
        print(f"[fast] rc={tiers[-1]['rc']} in {tiers[-1]['secs']}s")
    tiers.append(run_tier("slow (-m slow: multichip/multihost/e2e/bench)",
                          ["-m", "slow"]))
    print(f"[slow] rc={tiers[-1]['rc']} in {tiers[-1]['secs']}s")

    tag = args.tag or datetime.date.today().isoformat()
    out = REPO / "evidence" / f"TESTS_{tag}.md"
    out.parent.mkdir(exist_ok=True)
    ok = all(t["rc"] == 0 for t in tiers)
    lines = [f"# Test-tier record — {tag}",
             "", f"Overall: {'GREEN' if ok else 'FAILED'}", ""]
    for t in tiers:
        lines += [f"## {t['name']}", "",
                  f"- exit code {t['rc']}, {t['secs']} s", "```",
                  t["tail"], "```", ""]
    out.write_text("\n".join(lines))
    print(f"record -> {out} ({'GREEN' if ok else 'FAILED'})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
