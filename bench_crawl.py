#!/usr/bin/env python
"""Crawl-only benchmark for optimization A/B runs (round 7).

bench.py is FROZEN (driver contract); this file reproduces ONLY its
crawl block — same corpus builder, engine config, warmup, affinity
pinning, reps and median reporting — so the crawl can be A/B-measured
at arbitrary page counts (e.g. the driver's sf1.0 uses 600k pages)
without paying the query suite per run.

Env: SPARK_GRAFT_CPUS, IRONSPARK_BENCH_REPS (default 3),
IRONSPARK_CRAWL_PAGES (default 60000 = the sf0.1 shape).
Prints one JSON line {"pages": N, "seconds": median, "reps": [...]}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CACHE = os.environ.get("IRONSPARK_BENCH_CACHE", "/tmp/ironspark_bench")
REPS = int(os.environ.get("IRONSPARK_BENCH_REPS", "3"))
N_PAGES = int(os.environ.get("IRONSPARK_CRAWL_PAGES", "60000"))


def _cpu_times() -> tuple[int, int, int]:
    """(total, steal, busy) jiffies; busy excludes idle+iowait — wall
    noise on this shared host is mostly external slowdown, so per-rep
    BUSY CPU-seconds is the era-robust signal for CPU-bound changes."""
    with open("/proc/stat") as fh:
        t = fh.readline().split()[1:]
    v = list(map(int, t))
    busy = sum(v) - v[3] - (v[4] if len(v) > 4 else 0)
    return sum(v), (v[7] if len(v) > 7 else 0), busy


def main() -> None:
    try:
        os.sched_setaffinity(0, set(range(CPUS)))
    except (OSError, AttributeError):
        pass

    from ironspark.config import EngineConfig
    from ironspark.corpus import build_graph_corpus, graph_seeds
    from ironspark.engine import CrawlEngine
    from ironspark.schemas import SEEDS_SCHEMA
    from ironspark.session import get_spark
    from ironspark.spider import LinkSpider

    n_pages = N_PAGES
    n_hosts = max(n_pages // 100, 20)

    spark = get_spark(
        "ironspark-bench-crawl",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    n_files = 4 * CPUS
    pdir = os.path.join(CACHE, f"pages_raw_{n_pages}_f{n_files}_td")
    if not os.path.isdir(pdir):
        os.makedirs(CACHE, exist_ok=True)
        build_graph_corpus(
            spark, n_pages, n_hosts=n_hosts, parallelism=n_files,
            mega_share=0.1, filler_words=600, markup_every=2,
        ).write.mode("overwrite").parquet(pdir)
    pages = spark.read.parquet(pdir)

    def mk_seeds():
        return spark.createDataFrame(
            graph_seeds(n_pages, max(n_pages // 20, 10), n_hosts,
                        mega_share=0.1),
            SEEDS_SCHEMA,
        )

    cfg = EngineConfig(
        dedup=True,
        seen_backend="bloom",
        bloom_capacity=max(n_pages * 2, 1 << 16),
        max_waves=12,
        respect_robots=False,
        wave_seconds=3600.0,
        default_crawl_delay=0.5,
        checkpoint_every=100,
    )

    wu_cfg = EngineConfig(
        dedup=True, seen_backend="bloom", max_waves=2, respect_robots=False,
        wave_seconds=3600.0, default_crawl_delay=0.5, checkpoint_every=100,
    )
    wu_seeds = spark.createDataFrame(
        graph_seeds(n_pages, 200, n_hosts, mega_share=0.1), SEEDS_SCHEMA
    )
    wu_dir = os.path.join(CACHE, "crawl_warmup_raw")
    shutil.rmtree(wu_dir, ignore_errors=True)
    CrawlEngine(spark, pages, {1: LinkSpider()}, wu_cfg).run(
        seeds=wu_seeds, run_dir=wu_dir
    )

    run_dir = os.path.join(CACHE, "crawl_run_raw")
    reps = []
    for _ in range(REPS):
        shutil.rmtree(run_dir, ignore_errors=True)
        eng = CrawlEngine(spark, pages, {1: LinkSpider()}, cfg)
        tot0, st0, busy0 = _cpu_times()
        t0 = time.monotonic()
        stats = eng.run(seeds=mk_seeds(), run_dir=run_dir)
        wall = time.monotonic() - t0
        tot1, st1, busy1 = _cpu_times()
        reps.append(
            {
                "wall_s": round(wall, 3),
                "cpu_busy_s": round((busy1 - busy0) / 100.0, 1),
                "urls_per_sec": round(
                    (stats.scheduled + stats.deduped) / wall, 1
                ),
                "host_steal_pct": round(
                    100.0 * (st1 - st0) / max(tot1 - tot0, 1), 2
                ),
            }
        )
    walls = sorted(r["wall_s"] for r in reps)
    med = walls[len(walls) // 2]
    print(json.dumps({"pages": n_pages, "seconds": med, "reps": reps}))


if __name__ == "__main__":
    main()
