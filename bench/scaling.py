#!/usr/bin/env python
"""N-vs-4N scaling-efficiency evidence (BASELINE.json north_rule).

No real cluster exists in this sandbox, so per the session protocol the
same crawl job runs on the same input at local[8] (N) and local[32]
(4N), and this script reports throughput at both plus

    efficiency = (throughput_4N / throughput_N) / 4.

Each measurement runs in a fresh process (a SparkSession's master is
fixed for its JVM's lifetime). Within each process a small warmup crawl
compiles the wave plan shapes (JIT/codegen — identical on a real
cluster where executors are long-lived), then the measured crawl runs.

Two throughput readings are reported:
* whole-run: total (scheduled+deduped) / total seconds — includes the
  driver-serial wave turnaround (plan compile + commit), which is a
  constant independent of cluster size;
* steady-state: the same ratio over the largest wave only — the unit
  that repeats ~indefinitely in a 10^10-URL crawl, and therefore the
  number that predicts cluster scaling.

Usage:  python bench/scaling.py [--pages 240000] [--filler 2500]
Writes: BENCH/BASELINE.md, BENCH_SCALING.json (repo root)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.environ.get("IRONSPARK_BENCH_CACHE", "/tmp/ironspark_bench")

CHILD = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {root!r})
from ironspark.session import get_spark
from ironspark.config import EngineConfig
from ironspark.corpus import build_graph_corpus, graph_seeds
from ironspark.engine import CrawlEngine
from ironspark.schemas import SEEDS_SCHEMA
from ironspark.spider import LinkSpider

M = {cores}
N = {pages}
FILLER = {filler}
MARKUP = {markup}
HOSTS = max(N // 100, 20)
PDIR = {pdir!r}

spark = get_spark("scaling-%d" % M, master="local[%d]" % M, shuffle_partitions=M,
                  extra_conf={{"spark.sql.optimizer.runtime.bloomFilter.enabled": "false"}})
spark.sparkContext.setLogLevel("ERROR")

if not os.path.isdir(PDIR):
    build_graph_corpus(spark, N, n_hosts=HOSTS, parallelism=32,
                       mega_share=0.1, filler_words=FILLER,
                       markup_every=MARKUP
                       ).write.mode("overwrite").parquet(PDIR)
pages = spark.read.parquet(PDIR)

cfg = EngineConfig(dedup=True, seen_backend="bloom",
                   bloom_capacity=max(2 * N, 1 << 16),
                   max_waves=12, respect_robots=False,
                   wave_seconds=3600.0, default_crawl_delay=0.5,
                   checkpoint_every=100)

# warmup: compile the wave plan shapes (excluded from timing)
wu_seeds = spark.createDataFrame(
    graph_seeds(N, 200, HOSTS, mega_share=0.1), SEEDS_SCHEMA)
wu_cfg = EngineConfig(dedup=True, seen_backend="bloom", max_waves=2,
                      respect_robots=False, wave_seconds=3600.0,
                      default_crawl_delay=0.5, checkpoint_every=100)
CrawlEngine(spark, pages, {{1: LinkSpider()}}, wu_cfg).run(
    seeds=wu_seeds, run_dir="/tmp/scaling_warmup_%d" % M)

# measured crawl
seeds = spark.createDataFrame(
    graph_seeds(N, max(N // 20, 10), HOSTS, mega_share=0.1), SEEDS_SCHEMA)
eng = CrawlEngine(spark, pages, {{1: LinkSpider()}}, cfg)
run_dir = "/tmp/scaling_run_%d" % M
shutil.rmtree(run_dir, ignore_errors=True)
t0 = time.monotonic()
stats = eng.run(seeds=seeds, run_dir=run_dir)
wall = time.monotonic() - t0

big = max(range(len(stats.wave_walls)),
          key=lambda i: stats.wave_scheduled[i]) if stats.wave_walls else 0
# per-wave urls, same formula as whole-run: scheduled + deduped where
# deduped(wave) = outlinks(wave) - new(wave)
big_urls = stats.wave_scheduled[big] + max(
    stats.wave_outlinks[big] - stats.wave_new[big], 0)
out = {{
    "cores": M,
    "pages": N,
    "waves": stats.waves,
    "scheduled": stats.scheduled,
    "deduped": stats.deduped,
    "items": stats.items,
    "wall_s": round(wall, 2),
    "urls_per_sec": round((stats.scheduled + stats.deduped) / wall, 1),
    "wave_walls": [round(w, 2) for w in stats.wave_walls],
    "wave_scheduled": stats.wave_scheduled,
    "wave_new": stats.wave_new,
    "wave_outlinks": stats.wave_outlinks,
    "big_wave": big,
    "big_wave_urls_per_sec": round(big_urls / stats.wave_walls[big], 1),
}}
print("SCALING_JSON " + json.dumps(out))
"""


def run_child(
    cores: int, pages: int, filler: int, pdir: str, pin: bool = False,
    markup: int = 0,
) -> dict:
    code = CHILD.format(root=ROOT, cores=cores, pages=pages, filler=filler,
                        pdir=pdir, markup=markup)
    env = dict(os.environ, IRONSPARK_DRIVER_MEM="48g")
    argv = [sys.executable, "-c", code]
    if pin:
        # pin the whole child (JVM + python workers) to exactly `cores`
        # CPUs — otherwise the small run free-rides on the idle rest of
        # the machine (cache/bandwidth/turbo) and the comparison is
        # meaningless as cluster-size evidence
        argv = ["taskset", "-c", f"0-{cores - 1}"] + argv
    proc = subprocess.run(
        argv, capture_output=True, text=True, env=env,
        timeout=3600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("SCALING_JSON "):
            return json.loads(line[len("SCALING_JSON "):])
    raise RuntimeError(
        f"child local[{cores}] failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-3000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=60_000)
    ap.add_argument("--filler", type=int, default=600)
    ap.add_argument("--markup", type=int, default=2,
                    help="wrap every k-th filler word in an inline tag "
                         "(tag-dense pages, the realistic CPU profile)")
    ap.add_argument("--small", type=int, default=2)
    ap.add_argument("--large", type=int, default=8)
    ap.add_argument("--pin", action="store_true", default=True,
                    help="taskset-pin each child to its core budget")
    ap.add_argument("--no-pin", dest="pin", action="store_false")
    args = ap.parse_args()

    os.makedirs(CACHE, exist_ok=True)
    pdir = os.path.join(CACHE, f"pages_scaling_{args.pages}_{args.filler}_{args.markup}")

    def warm_cache() -> None:
        """Read the corpus files once so neither child pays cold disk."""
        if os.path.isdir(pdir):
            subprocess.run(
                f"cat {pdir}/*.parquet > /dev/null", shell=True, check=False
            )

    warm_cache()
    r_large = run_child(args.large, args.pages, args.filler, pdir, pin=args.pin, markup=args.markup)
    warm_cache()
    r_small = run_child(args.small, args.pages, args.filler, pdir, pin=args.pin, markup=args.markup)

    ratio = args.large / args.small
    eff_total = (r_large["urls_per_sec"] / r_small["urls_per_sec"]) / ratio
    eff_steady = (
        r_large["big_wave_urls_per_sec"] / r_small["big_wave_urls_per_sec"]
    ) / ratio

    result = {
        "protocol": f"same job, same input, local[{args.small}] vs local[{args.large}]",
        "pages": args.pages,
        "N": r_small,
        "4N": r_large,
        "efficiency_whole_run": round(eff_total, 3),
        "efficiency_steady_state": round(eff_steady, 3),
    }
    with open(os.path.join(ROOT, "BENCH_SCALING.json"), "w") as fh:
        json.dump(result, fh, indent=2)

    os.makedirs(os.path.join(ROOT, "BENCH"), exist_ok=True)
    md = f"""# BENCH — scaling-efficiency evidence (N vs 4N)

Per `BASELINE.json` (`north_rule`), the target is throughput scaling
efficiency >= 0.8 from N to 4N executors. No real cluster exists in
this sandbox; per the session protocol, the same crawl job ran on the
same input at `local[{args.small}]` (N) and `local[{args.large}]` (4N
cores){', each child taskset-pinned to exactly its core budget so the small run cannot free-ride on idle cache/bandwidth/turbo of the rest of the machine' if args.pin else ''}.

**Job**: full crawl-engine loop (politeness window-rank schedule ->
corpus-join fetch -> one-pass Arrow parse/extract/canonicalize ->
Bloom-pruned seen dedup -> FIFO seq extension -> frontier snapshot)
over {args.pages:,} Common-Crawl-weight synthetic pages ({args.filler}
filler words, tag-dense markup every {args.markup} words ≈ 6-7 KB html,
{max(args.pages // 100, 20):,} hosts, 10% mega-host skew), seeds =
pages/20, until frontier empty.
JIT warmup crawl excluded from timing (long-lived executors on a real
cluster are always warm).

| setting | cores | waves | wall (s) | urls/sec (whole run) | urls/sec (largest wave) |
|---|---|---|---|---|---|
| N  | {args.small} | {r_small['waves']} | {r_small['wall_s']} | {r_small['urls_per_sec']:,} | {r_small['big_wave_urls_per_sec']:,} |
| 4N | {args.large} | {r_large['waves']} | {r_large['wall_s']} | {r_large['urls_per_sec']:,} | {r_large['big_wave_urls_per_sec']:,} |

**Scaling efficiency (whole run): {eff_total:.3f}**
**Scaling efficiency (steady-state, largest wave): {eff_steady:.3f}**

The whole-run number carries the per-wave driver-serial turnaround
(Catalyst planning + codegen + snapshot commit, ~constant seconds per
wave regardless of cluster size); the steady-state number isolates the
distributed work of the wave that dominates a long crawl — in a
10^10-URL frontier the crawl is thousands of such waves, so the
steady-state figure is the one that predicts cluster behavior.

Per-wave walls (s), N: {r_small['wave_walls']}
Per-wave walls (s), 4N: {r_large['wave_walls']}
Per-wave scheduled: {r_small['wave_scheduled']}

Raw JSON: `BENCH_SCALING.json`. Reproduce: `python bench/scaling.py`.
"""
    with open(os.path.join(ROOT, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write(md)
    with open(os.path.join(ROOT, "BENCH.md"), "w") as fh:
        fh.write(md)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
