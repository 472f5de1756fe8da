#!/usr/bin/env python
"""Per-round benchmark (driver contract).

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Two parts:
1. The headline crawl: full engine loop (politeness -> fetch -> Arrow
   parse -> Bloom-pruned dedup -> frontier) over a deterministic
   synthetic Common-Crawl-weight page corpus sized by sf. Measured
   under the SAME discipline as bench/scaling.py (VERDICT r2 #1):
   the process is CPU-affinity-pinned to exactly $SPARK_GRAFT_CPUS
   cores BEFORE the JVM starts, one warmup crawl compiles the plan
   shapes, then IRONSPARK_BENCH_REPS (default 3) full repetitions run
   and the MEDIAN wall is reported, with per-rep wall and host steal%%
   (/proc/stat) disclosed in the crawl block.
2. Operator timings: headline queries() entries over the sf tables.

The N-vs-4N scaling-efficiency evidence lives in bench/scaling.py
(writes BENCH/BASELINE.md); this script is the fast per-round probe.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CACHE = os.environ.get("IRONSPARK_BENCH_CACHE", "/tmp/ironspark_bench")
REPS = int(os.environ.get("IRONSPARK_BENCH_REPS", "3"))

# crawl corpus sized by sf (sf0.1 -> 60k heavy pages, ~6KB html each)
_SF_PAGES = {"0.001": 2_000, "0.01": 12_000, "0.1": 60_000, "1": 400_000}

QUERY_NAMES = [
    "q1_lineitem_agg", "x1_exchange_join", "f3_politeness_topk",
    "p7_antijoin_dedup", "d2_status_filter", "d5_redirects",
    "t_exact_dedup", "t_lsh_pairs", "t_simhash", "t_langid",
    "t_fingerprint", "a_cosine_topk", "a_knn_join", "a_ivf_index",
    "mm_metadata", "i1_routing_counts",
    # round 4 additions (grow "total" by their medians vs r3)
    "t_decontaminate", "t_tfidf_topk", "t_stratified_sample",
    "t_domain_stats",
    # round 5 additions (grow "total" by their medians vs r4)
    "mm_decode", "f9_robots_wildcard", "fr_recrawl_due",
    "t_line_dedup", "t_rep_signals", "g_degree", "g_pagerank",
    "mm_audio",
    # round 6 additions (grow "total" by their medians vs r5)
    "mm_jpeg", "t_langid_script", "mm_gif_bmp", "mm_gif_frames",
    "t_bpe_merges", "c_url_templates", "g_anchor_topk",
    "g_components", "t_bpe_tokens", "g_hits", "t_incr_dedup",
]


def _sf_of(sf_dir: str) -> str:
    base = os.path.basename(sf_dir.rstrip("/"))
    return base[2:] if base.startswith("sf") else "0.1"


def corpus_path(sf: str, n: int, files: int) -> str:
    return os.path.join(CACHE, f"pages_{sf}_{n}_f{files}_td")


def _cpu_times() -> tuple[int, int]:
    with open("/proc/stat") as fh:
        t = fh.readline().split()[1:]
    v = list(map(int, t))
    return sum(v), (v[7] if len(v) > 7 else 0)


def main() -> None:
    # pin BEFORE the JVM spawns: affinity is inherited by the Spark
    # driver JVM and every python worker — same discipline as the
    # taskset wrapper in bench/scaling.py
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

    import __spark_entry__ as entry_mod

    sf = _sf_of(SF_DIR)
    n_pages = _SF_PAGES.get(sf, max(int(600_000 * float(sf)), 2_000))
    n_hosts = max(n_pages // 100, 20)

    spark = get_spark(
        "ironspark-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={
            # the runtime Bloom pushdown pays off when the scheduled batch
            # is tiny vs the corpus; a BFS bench touches everything, so
            # the per-wave bloom-build job is pure overhead here
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # -- corpus (cached across rounds; generation excluded from timing) ----
    # 4 files per core: each synth task writes one file with ONE parquet
    # row group, and row groups are the real unit of scan parallelism —
    # a 1-file-per-core layout caps every corpus scan at 1 task/core no
    # matter how maxPartitionBytes is sized (stragglers then idle the
    # stage tail). Real crawl corpora have thousands of files; this
    # makes the synthetic layout match that property.
    n_files = 4 * CPUS
    pdir = corpus_path(sf, n_pages, n_files)
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

    # -- warmup: compile wave plan shapes (excluded from timing) ------------
    wu_cfg = EngineConfig(
        dedup=True, seen_backend="bloom", max_waves=2, respect_robots=False,
        wave_seconds=3600.0, default_crawl_delay=0.5, checkpoint_every=100,
    )
    wu_seeds = spark.createDataFrame(
        graph_seeds(n_pages, 200, n_hosts, mega_share=0.1), SEEDS_SCHEMA
    )
    wu_dir = os.path.join(CACHE, "crawl_warmup")
    shutil.rmtree(wu_dir, ignore_errors=True)
    CrawlEngine(spark, pages, {1: LinkSpider()}, wu_cfg).run(
        seeds=wu_seeds, run_dir=wu_dir
    )

    # -- measured reps, steal-gated (VERDICT r4 #1/#9): hypervisor
    # steal confounded the r4 crawl scoreboard (2.6-4.4%% steal eras
    # made faster code post a slower number). If the median rep steal
    # of a block exceeds STEAL_GATE_PCT, the whole block reruns (up to
    # IRONSPARK_BENCH_STEAL_RETRIES extra blocks); the gate-passing
    # block is reported (median-throughput block if none pass — NOT
    # the min-steal block, which would co-select favorable walls) and
    # every block is disclosed.
    run_dir = os.path.join(CACHE, "crawl_run")
    steal_gate = float(os.environ.get("IRONSPARK_BENCH_STEAL_GATE", "1.0"))
    max_blocks = 1 + int(os.environ.get("IRONSPARK_BENCH_STEAL_RETRIES", "2"))
    stats = None

    def run_block() -> list[dict]:
        nonlocal stats
        block: list[dict] = []
        for _ in range(REPS):
            shutil.rmtree(run_dir, ignore_errors=True)
            eng = CrawlEngine(spark, pages, {1: LinkSpider()}, cfg)
            tot0, st0 = _cpu_times()
            t0 = time.monotonic()
            stats = eng.run(seeds=mk_seeds(), run_dir=run_dir)
            wall = time.monotonic() - t0
            tot1, st1 = _cpu_times()
            block.append(
                {
                    "wall_s": round(wall, 3),
                    "urls_per_sec": round(
                        (stats.scheduled + stats.deduped) / wall, 1
                    ),
                    "host_steal_pct": round(
                        100.0 * (st1 - st0) / max(tot1 - tot0, 1), 2
                    ),
                }
            )
        return block

    def med_steal(block: list[dict]) -> float:
        return statistics.median(r["host_steal_pct"] for r in block)

    blocks = [run_block()]
    while med_steal(blocks[-1]) > steal_gate and len(blocks) < max_blocks:
        blocks.append(run_block())
    passing = [blk for blk in blocks if med_steal(blk) <= steal_gate]
    if passing:
        reps = passing[0]  # retries stop at the first passing block
    else:
        pool = sorted(
            blocks,
            key=lambda blk: statistics.median(
                r["urls_per_sec"] for r in blk
            ),
        )
        reps = pool[len(pool) // 2]
    crawl_s = statistics.median(r["wall_s"] for r in reps)
    crawl_ups = statistics.median(r["urls_per_sec"] for r in reps)

    # -- operator timings: same median-of-REPS discipline as the crawl
    # (VERDICT r3 #4 — single-run operator numbers produced a phantom
    # +25% "regression" on t_lsh_pairs in round 3); first rep is the
    # plan/codegen warmup and is excluded, the reported figure is the
    # median of the REPS measured runs, per-rep walls disclosed.
    queries = entry_mod.queries()
    q_times: dict[str, float] = {"crawl": round(crawl_s, 3)}
    q_reps: dict[str, list[float]] = {}
    for name in QUERY_NAMES:
        queries[name](spark, SF_DIR).count()  # warmup: compile the plan
        walls = []
        for _ in range(REPS):
            t = time.monotonic()
            queries[name](spark, SF_DIR).count()
            walls.append(round(time.monotonic() - t, 3))
        q_reps[name] = walls
        q_times[name] = round(statistics.median(walls), 3)

    total = round(crawl_s + sum(v for k, v in q_times.items() if k != "crawl"), 3)
    out = {
        "metric": "ironspark end-to-end: crawl (frontier urls scheduled+deduped) + headline operators",
        "value": total,
        "unit": "sec",
        "queries": q_times,
        "query_protocol": f"median of {REPS} reps after 1 warmup rep",
        "query_reps": q_reps,
        "sf": float(sf),
        "crawl": {
            "pages": n_pages,
            "waves": stats.waves,
            "scheduled": stats.scheduled,
            "deduped": stats.deduped,
            "items": stats.items,
            "outlinks": stats.outlinks,
            "seconds": round(crawl_s, 3),
            "urls_per_sec": round(crawl_ups, 1),
            "protocol": (
                f"median of {REPS} pinned reps after warmup; block rerun "
                f"while median steal > {steal_gate}% (max {max_blocks} "
                "blocks), lowest-steal block reported"
            ),
            "reps": reps,
            "steal_gate": {
                "threshold_pct": steal_gate,
                "blocks_run": len(blocks),
                "block_median_steal_pct": [med_steal(b) for b in blocks],
                "all_blocks": blocks if len(blocks) > 1 else None,
            },
            "era_note": (
                "absolute walls on this shared host drift 10-85% between "
                "hypervisor eras that steal% does not fully see "
                "(BENCH.md round-4/5 analysis); round-over-round crawl "
                "comparisons are only valid within a same-block "
                "interleaved A/B. Per-rep steal and block retries are "
                "disclosed above; when every block exceeds the steal "
                "gate the lowest-steal block is reported."
            ),
        },
        "cpus": CPUS,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
