"""Fetch-strategy equivalence: the shuffled fetch join must produce the
IDENTICAL crawl to the broadcast probe (items, order, seen) — it is the
documented fallback for waves too large to broadcast (fetch.py) and the
regime bench/scaling.py uses for BFS-saturation benchmarks."""

from __future__ import annotations

import pandas as pd

from ironspark.config import EngineConfig
from ironspark.corpus import build_graph_corpus_pdf, graph_seeds
from ironspark.engine import CrawlEngine
from ironspark.schemas import PAGES_SCHEMA, SEEDS_SCHEMA
from ironspark.spider import LinkSpider


def _run(spark, tmp_path, strategy):
    pages = spark.createDataFrame(
        build_graph_corpus_pdf(90, n_hosts=7), PAGES_SCHEMA
    )
    seeds = spark.createDataFrame(graph_seeds(90, 9, 7), SEEDS_SCHEMA)
    cfg = EngineConfig(
        dedup=True, seen_backend="bloom", max_waves=8,
        respect_robots=False, wave_seconds=3600.0, bloom_capacity=1 << 12,
        fetch_strategy=strategy,
    )
    eng = CrawlEngine(spark, pages, {1: LinkSpider()}, cfg)
    run_dir = str(tmp_path / strategy)
    stats = eng.run(seeds=seeds, run_dir=run_dir)
    items = (
        eng.items_df(run_dir).toPandas()
        .sort_values(["src_url", "wave"]).reset_index(drop=True)
        [["item_type", "title", "author", "src_url", "text", "wave"]]
    )
    order = [
        (r.seq, r.wave, r.url_canon)
        for r in eng.crawl_order_df(run_dir).orderBy("seq", "wave").collect()
    ]
    seen = {r.url_canon for r in eng.seen_df(run_dir).collect()}
    return stats, items, order, seen


def test_shuffle_equals_broadcast(spark, tmp_path):
    sb, items_b, order_b, seen_b = _run(spark, tmp_path, "broadcast")
    ss, items_s, order_s, seen_s = _run(spark, tmp_path, "shuffle")
    assert (sb.items, sb.scheduled, sb.deduped) == (
        ss.items, ss.scheduled, ss.deduped
    )
    pd.testing.assert_frame_equal(items_b, items_s)
    assert order_b == order_s
    assert seen_b == seen_s
