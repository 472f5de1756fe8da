#!/usr/bin/env python
"""One traced crawl at a given core count over the cached bench corpus.

Usage: python scripts/trace_crawl.py CPUS [SF] [REPS]
Prints per-wave phase walls (IRONSPARK_TRACE) + total.
"""
import os, sys, time, shutil

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
SF = sys.argv[2] if len(sys.argv) > 2 else "0.01"
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 1
os.environ["IRONSPARK_TRACE"] = "1"
try:
    os.sched_setaffinity(0, set(range(CPUS)))
except OSError:
    pass

from ironspark.config import EngineConfig
from ironspark.corpus import build_graph_corpus, graph_seeds
from ironspark.engine import CrawlEngine
from ironspark.schemas import SEEDS_SCHEMA
from ironspark.session import get_spark
from ironspark.spider import LinkSpider

SF_PAGES = {"0.001": 2_000, "0.01": 12_000, "0.1": 60_000, "1": 400_000}
n_pages = SF_PAGES[SF]
n_hosts = max(n_pages // 100, 20)
CACHE = "/tmp/ironspark_bench"
pdir = os.path.join(CACHE, f"pages_{SF}_{n_pages}_f128_td")

spark = get_spark("trace", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
spark.sparkContext.setLogLevel("ERROR")
if not os.path.isdir(pdir):
    os.makedirs(CACHE, exist_ok=True)
    build_graph_corpus(spark, n_pages, n_hosts=n_hosts, parallelism=128,
                       mega_share=0.1, filler_words=600, markup_every=2
                       ).write.mode("overwrite").parquet(pdir)
pages = spark.read.parquet(pdir)
seeds = spark.createDataFrame(
    graph_seeds(n_pages, max(n_pages // 20, 10), n_hosts, mega_share=0.1),
    SEEDS_SCHEMA,
)
cfg = EngineConfig(dedup=True, seen_backend="bloom",
                   bloom_capacity=max(n_pages * 2, 1 << 16), max_waves=12,
                   respect_robots=False, wave_seconds=3600.0,
                   default_crawl_delay=0.5, checkpoint_every=100)
run_dir = "/tmp/ironspark_trace_run"
# warmup (compiles plan shapes)
shutil.rmtree(run_dir, ignore_errors=True)
wu = EngineConfig(dedup=True, seen_backend="bloom", max_waves=2,
                  respect_robots=False, wave_seconds=3600.0,
                  default_crawl_delay=0.5, checkpoint_every=100)
CrawlEngine(spark, pages, {1: LinkSpider()}, wu).run(
    seeds=spark.createDataFrame(
        graph_seeds(n_pages, 200, n_hosts, mega_share=0.1), SEEDS_SCHEMA),
    run_dir=run_dir)
for rep in range(REPS):
    shutil.rmtree(run_dir, ignore_errors=True)
    t0 = time.monotonic()
    stats = CrawlEngine(spark, pages, {1: LinkSpider()}, cfg).run(
        seeds=seeds, run_dir=run_dir)
    wall = time.monotonic() - t0
    print(f"TOTAL cpus={CPUS} rep={rep} wall={wall:.2f}s "
          f"urls/s={(stats.scheduled+stats.deduped)/wall:.0f} "
          f"waves={stats.waves} wave_walls={[round(w,2) for w in stats.wave_walls]}",
          flush=True)
