#!/usr/bin/env python
"""Record a crawl crossing all three URL-seen join regimes (VERDICT r5 #5).

The engine's auto seen-join switches on its own counters (engine.py
_resolve_seen_join): broadcast while the seen set is wave-sized, flip
once seen > seen_flip_ratio x wave outlinks, shuffle_hash past
seen_broadcast_max_rows (the 10^10-URL plan). The three-regime parity
is pytest-proven at toy scale; this protocol run exercises the
transitions UNDER LOAD on the 400k-page scaling corpus with
seen_broadcast_max_rows forced low, and records the per-wave regime log
+ walls so the artifact shows plan stability (no wall-time cliff at
either switch).

Usage:  python bench/regime_run.py [--pages 400000] [--cores 32]
                                   [--seen-bmax 250000] [--seed-div 20]
Writes: BENCH_REGIME.json (repo root) + a section appended to BENCH.md
        (below scaling.py's hand-analysis marker, which regeneration
        preserves).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling import CACHE, ROOT, run_child  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=400_000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--filler", type=int, default=600)
    ap.add_argument("--markup", type=int, default=2)
    ap.add_argument("--seed-div", type=int, default=20,
                    help="smaller seed set -> deeper BFS -> more waves "
                         "-> the seen set crosses both thresholds "
                         "mid-crawl instead of starting past them")
    ap.add_argument("--wave-seconds", type=float, default=3600.0)
    ap.add_argument("--seen-bmax", type=int, default=250_000,
                    help="forced-low broadcast ceiling so the 400k run "
                         "reaches the shuffle_hash regime the 10^10 "
                         "plan lives in")
    ap.add_argument("--seen-flip", type=float, default=2.0)
    ap.add_argument("--no-pin", dest="pin", action="store_false")
    args = ap.parse_args()

    os.makedirs(CACHE, exist_ok=True)
    pdir = os.path.join(
        CACHE, f"pages_scaling_{args.pages}_{args.filler}_{args.markup}_f128"
    )
    runs = run_child(
        args.cores, args.pages, 1, args.filler, pdir, pin=args.pin,
        markup=args.markup, seed_div=args.seed_div,
        wave_s=args.wave_seconds, seen_bmax=args.seen_bmax,
        seen_flip=args.seen_flip,
    )
    r = runs[0]
    regimes = r["wave_seen_join"]
    walls = r["wave_walls"]
    sched = r["wave_scheduled"]
    rows = r["wave_frontier_rows"]
    per_wave = [
        {"wave": i, "regime": regimes[i], "wall_s": walls[i],
         "scheduled": sched[i], "frontier_rows": rows[i],
         "urls_per_sec": round(sched[i] / walls[i], 1) if walls[i] else None}
        for i in range(len(walls))
    ]
    transitions = [
        (i, regimes[i - 1], regimes[i])
        for i in range(1, len(regimes))
        if regimes[i] != regimes[i - 1]
    ]

    # cliff check: compare each switch wave's per-scheduled-URL cost to
    # the median of same-regime neighbours — a >2x jump at the switch
    # would mean the regime change itself is a cost cliff
    cost = [w / max(s, 1) for w, s in zip(walls, sched)]
    cliff = []
    for i, frm, to in transitions:
        base = statistics.median(
            cost[j] for j in range(len(cost)) if j != i
        )
        cliff.append(
            {"wave": i, "from": frm, "to": to,
             "cost_ratio_vs_median": round(cost[i] / max(base, 1e-9), 2)}
        )

    out = {
        "protocol": (
            f"one taskset-pinned local[{args.cores}] crawl over the "
            f"{args.pages:,}-page scaling corpus, seeds = pages/"
            f"{args.seed_div}, seen_broadcast_max_rows forced to "
            f"{args.seen_bmax:,} (default 4M) and seen_flip_ratio to "
            f"{args.seen_flip} so auto crosses broadcast -> flip -> "
            f"shuffle_hash mid-crawl; per-wave regime + wall disclosed; "
            f"steal% measured from /proc/stat"
        ),
        "pages": args.pages,
        "cores": args.cores,
        "seen_broadcast_max_rows": args.seen_bmax,
        "seen_flip_ratio": args.seen_flip,
        "whole_run": {
            "wall_s": r["wall_s"], "urls_per_sec": r["urls_per_sec"],
            "scheduled": r["scheduled"], "deduped": r["deduped"],
            "host_steal_pct": r["host_steal_pct"],
        },
        "per_wave": per_wave,
        "transitions": [
            {"wave": i, "from": a, "to": b} for i, a, b in transitions
        ],
        "switch_cost_ratios": cliff,
    }
    with open(os.path.join(ROOT, "BENCH_REGIME.json"), "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out["per_wave"], indent=1))
    print(json.dumps({"transitions": out["transitions"],
                      "switch_cost_ratios": cliff}))

    wave_rows = "\n".join(
        f"| {p['wave']} | {p['regime']} | {p['wall_s']} | "
        f"{p['scheduled']:,} | {p['frontier_rows']:,} | "
        f"{p['urls_per_sec']:,} |"
        for p in per_wave
    )
    cliff_rows = "\n".join(
        f"| {c['wave']} | {c['from']} → {c['to']} | "
        f"{c['cost_ratio_vs_median']}× |"
        for c in cliff
    ) or "| — | no transition observed | — |"
    md = f"""

## Seen-join regime transitions under load (round 6)

{out['protocol']}. Whole run: {r['wall_s']} s,
{r['urls_per_sec']:,} urls/s, steal {r['host_steal_pct']}%.

| wave | regime | wall (s) | scheduled | frontier delta rows | urls/s |
|---|---|---|---|---|---|
{wave_rows}

Switch-wave cost vs the median per-scheduled-URL cost of all other
waves (≈1× = no cliff at the regime change):

| switch wave | transition | cost ratio |
|---|---|---|
{cliff_rows}

Raw JSON: `BENCH_REGIME.json`. Reproduce: `python bench/regime_run.py`.
"""
    with open(os.path.join(ROOT, "BENCH.md"), "a") as fh:
        fh.write(md)


if __name__ == "__main__":
    main()
