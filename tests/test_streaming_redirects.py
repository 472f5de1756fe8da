"""Streaming veneer, redirects table, and plan-quality checks."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ironspark.config import EngineConfig
from ironspark.corpus import article_seeds, build_chain_corpus
from ironspark.engine import CrawlEngine
from ironspark.schemas import PAGES_SCHEMA, SEEDS_SCHEMA
from ironspark.spider import ArticleSpider


@pytest.fixture(scope="module")
def run_dir(spark, tmp_path_factory):
    pages = spark.createDataFrame(build_chain_corpus(2, 3), PAGES_SCHEMA)
    seeds = spark.createDataFrame(article_seeds(2, 3, dup=1), SEEDS_SCHEMA)
    cfg = EngineConfig(dedup=True, max_waves=6, respect_robots=False)
    eng = CrawlEngine(spark, pages, {1: ArticleSpider(), 2: ArticleSpider()}, cfg)
    d = str(tmp_path_factory.mktemp("stream") / "run")
    eng.run(seeds=seeds, run_dir=d)
    return d


def test_stream_items_available_now(spark, run_dir, tmp_path):
    from ironspark.streaming import run_stream_once, stream_items

    out = str(tmp_path / "stream_out")
    run_stream_once(stream_items(spark, run_dir), out)
    got = spark.read.parquet(f"{out}/data")
    assert got.count() == 6  # 2 chains x 3 articles
    assert set(got.columns) >= {"item_type", "title", "author", "wave"}


def test_windowed_agg_stream(spark, run_dir, tmp_path):
    from ironspark.streaming import items_per_author_stream, run_stream_once

    out = str(tmp_path / "stream_agg")
    # append mode + watermark: rows emit only when the watermark passes,
    # so with AvailableNow the counts land in the sink on a later drain;
    # here we just assert the streaming query plans and runs cleanly.
    run_stream_once(items_per_author_stream(spark, run_dir, "1 minute"), out)
    assert spark.read.parquet(f"{out}/data").columns  # schema materialized


def test_redirects_resolution(spark, tmp_path):
    """D5: a redirects(src,dst) table maps the request to the final URL
    before the corpus probe (reqwest follows redirects transparently)."""
    pages = spark.createDataFrame(build_chain_corpus(1, 2), PAGES_SCHEMA)
    # seed points at a MOVED url; redirect maps it onto the real chain head
    seeds = spark.createDataFrame(
        pd.DataFrame(
            {"spider_id": [1], "url": ["http://old.example.com/article/2"], "seed_rank": [0]}
        ),
        SEEDS_SCHEMA,
    )
    redirects = spark.createDataFrame(
        pd.DataFrame(
            {
                "src": ["http://old.example.com/article/2"],
                "dst": ["http://c0.example.com:5000/article/2"],
            }
        )
    )
    cfg = EngineConfig(dedup=True, max_waves=4, respect_robots=False)
    eng = CrawlEngine(spark, pages, {1: ArticleSpider()}, cfg, redirects=redirects)
    stats = eng.run(seeds=seeds, run_dir=str(tmp_path / "redir"))
    items = eng.items_df(stats.run_dir).toPandas()
    assert len(items) == 2  # followed the redirected chain 2 -> 1
    assert set(items["title"]) == {"Article 2", "Article 1"}


def test_corpus_scan_column_pruning(spark):
    """The fetch plan must prune the corpus scan to url/html/warc_ts and
    keep text/lang out (Catalyst column pruning through the join)."""
    from ironspark.fetch import fetch_from_corpus
    from ironspark.frontier import seeds_to_frontier

    pages = spark.createDataFrame(build_chain_corpus(1, 2), PAGES_SCHEMA)
    seeds = spark.createDataFrame(article_seeds(1, 2, dup=1), SEEDS_SCHEMA)
    sched, _ = seeds_to_frontier(seeds)
    plan = fetch_from_corpus(
        sched, pages.select("url", "html", "warc_ts")
    )._jdf.queryExecution().executedPlan().toString()
    assert "text" not in plan.lower() or "ReadSchema" not in plan  # pruned


def test_stateful_running_counts_stream(spark, run_dir):
    """applyInPandasWithState: running per-author counts with explicit
    GroupState, drained via AvailableNow into a memory sink."""
    from ironspark.streaming import (
        run_stream_once_memory,
        running_author_counts_stream,
    )

    s = running_author_counts_stream(spark, run_dir)
    run_stream_once_memory(s, "author_counts")
    got = spark.sql(
        "SELECT author, max(n_items) AS n FROM author_counts GROUP BY author"
    ).toPandas()
    # chain corpus: authors 'Author {n % 7}' for n in 1..3, one item per
    # article per chain; 2 chains -> 2 items per author
    assert dict(zip(got["author"], got["n"])) == {
        "Author 1": 2, "Author 2": 2, "Author 3": 2,
    }


def test_crawl_stream_foreachbatch(spark, tmp_path):
    """Continuous-crawl input veneer (SURVEY §7.6): seed files dropped
    into a directory drive the crawl via foreachBatch — the first batch
    starts the run, a later drop resumes it; seq numbering continues
    and the seen set carries over (the re-dropped url stays deduped)."""
    import pandas as pd

    from ironspark.config import EngineConfig
    from ironspark.corpus import chain_pages
    from ironspark.engine import CrawlEngine
    from ironspark.schemas import PAGES_SCHEMA, SEEDS_SCHEMA
    from ironspark.spider import ArticleSpider
    from ironspark.streaming import crawl_stream

    pages = spark.createDataFrame(
        pd.DataFrame(
            chain_pages("c0.example.com", 3) + chain_pages("c1.example.com", 2)
        ),
        PAGES_SCHEMA,
    )
    seeds_dir = str(tmp_path / "seeds_in")
    run_dir = str(tmp_path / "stream_run")
    cfg = EngineConfig(dedup=True, seen_backend="exact", max_waves=10,
                       respect_robots=False, wave_seconds=3600.0)

    def drop(urls, rank0=0):
        spark.createDataFrame(
            pd.DataFrame(
                [(1, u, rank0 + i) for i, u in enumerate(urls)],
                columns=["spider_id", "url", "seed_rank"],
            ),
            SEEDS_SCHEMA,
        ).coalesce(1).write.mode("append").parquet(seeds_dir)

    # drop 1: chain c0 -> first crawl leg
    drop(["http://c0.example.com:5000/article/3"])
    crawl_stream(spark, pages, {1: ArticleSpider()}, run_dir, seeds_dir,
                 config=cfg)
    eng = CrawlEngine(spark, pages, {1: ArticleSpider()}, cfg)
    assert eng.items_df(run_dir).count() == 3

    # drop 2: chain c1 + a re-dropped (already-seen) c0 url
    drop(
        ["http://c1.example.com:5000/article/2",
         "http://c0.example.com:5000/article/3"],
        rank0=10,
    )
    crawl_stream(spark, pages, {1: ArticleSpider()}, run_dir, seeds_dir,
                 config=cfg)
    items = eng.items_df(run_dir).toPandas()
    assert len(items) == 5  # 3 + 2; the re-dropped chain stayed deduped
    order = eng.crawl_order_df(run_dir).toPandas()
    assert not order.duplicated(["seq", "wave"]).any()
    assert order["url_canon"].nunique() == 5
