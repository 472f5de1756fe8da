#!/usr/bin/env python
"""Same-block A/B probe: seen_join flip-auto vs forced-broadcast.

Interleaves (cores, seen_join) cells round-robin so a host-contention
era hits all cells equally (docs/SCALE.md #20: this VM drifts between
hardware eras that steal%% does not see — only same-block interleaved
probes attribute code deltas). One rep per cell per round.

Usage: python bench/probe_flip.py [--pages 400000] [--rounds 1]
Prints one PROBE_JSON line per run; summary table at the end.
"""
from __future__ import annotations

import argparse
import json
import os
import statistics

from scaling import CACHE, run_child


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=400_000)
    ap.add_argument("--rounds", type=int, default=1)
    ap.add_argument("--cores", type=int, nargs="+", default=[2, 8])
    args = ap.parse_args()

    pdir = os.path.join(CACHE, f"pages_scaling_{args.pages}_600_2_f128")
    if not os.path.isdir(pdir):
        raise SystemExit(f"corpus cache missing: {pdir} (run scaling.py once)")

    cells = [(c, sj) for c in args.cores for sj in ("auto", "broadcast")]
    results: dict[tuple[int, str], list[dict]] = {c: [] for c in cells}
    for rnd in range(args.rounds):
        for cores, sj in cells:
            runs = run_child(cores, args.pages, 1, 600, pdir,
                             markup=2, seen_join=sj)
            r = runs[0]
            r["seen_join"] = sj
            r["round"] = rnd
            results[(cores, sj)].append(r)
            print("PROBE_JSON " + json.dumps(r), flush=True)

    print(f"\n{'cores':>5} {'seen_join':>10} {'wall_s':>10} "
          f"{'urls/s':>10} {'steal%':>7}")
    for (cores, sj), rs in results.items():
        wall = statistics.median(x["wall_s"] for x in rs)
        ups = statistics.median(x["urls_per_sec"] for x in rs)
        steal = max(x["host_steal_pct"] for x in rs)
        print(f"{cores:>5} {sj:>10} {wall:>10.1f} {ups:>10.1f} {steal:>7.2f}")


if __name__ == "__main__":
    main()
