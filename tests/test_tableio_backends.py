"""TableIO backend seam (VERDICT r2 #5): the engine's state tables run
on the parquet-dir store everywhere, and on REAL Iceberg tables when
the runtime jar is present — same crawl results, same resume behavior.
The iceberg param skips cleanly in jarless environments (this sandbox);
on a cluster with iceberg-spark-runtime the same tests exercise the
real catalog."""

from __future__ import annotations

import pandas as pd
import pytest

from ironspark.config import EngineConfig
from ironspark.corpus import build_graph_corpus_pdf, graph_seeds
from ironspark.engine import (
    CrawlEngine,
    IcebergTableIO,
    TableIO,
    iceberg_available,
    make_table_io,
)
from ironspark.schemas import PAGES_SCHEMA, SEEDS_SCHEMA
from ironspark.spider import LinkSpider


@pytest.fixture(params=["parquet", "iceberg"])
def backend(request, spark, monkeypatch):
    if request.param == "iceberg" and not iceberg_available(spark):
        pytest.skip("iceberg-spark-runtime jar not on the classpath")
    monkeypatch.setenv("IRONSPARK_TABLE_BACKEND", request.param)
    return request.param


def test_probe_selects_backend(spark, monkeypatch):
    monkeypatch.setenv("IRONSPARK_TABLE_BACKEND", "parquet")
    assert type(make_table_io(spark, "/tmp/tio_probe")) is TableIO
    monkeypatch.delenv("IRONSPARK_TABLE_BACKEND")
    io = make_table_io(spark, "/tmp/tio_probe")
    if iceberg_available(spark):
        assert isinstance(io, IcebergTableIO)
    else:
        assert type(io) is TableIO


def _setup(spark, n=80):
    pages = spark.createDataFrame(
        build_graph_corpus_pdf(n, n_hosts=6), PAGES_SCHEMA
    )
    seeds = spark.createDataFrame(graph_seeds(n, 8, 6), SEEDS_SCHEMA)
    return pages, seeds


def test_crawl_and_resume_on_backend(spark, tmp_path, backend):
    """Full crawl, then a resumed second leg with an injected seed
    group — both legs run entirely on the selected TableIO backend."""
    pages, seeds = _setup(spark)
    cfg = EngineConfig(dedup=True, seen_backend="bloom", max_waves=3,
                       respect_robots=False, wave_seconds=3600.0,
                       bloom_capacity=1 << 12)
    run_dir = str(tmp_path / f"run_{backend}")
    eng = CrawlEngine(spark, pages, {1: LinkSpider()}, cfg)
    stats1 = eng.run(seeds=seeds, run_dir=run_dir)
    assert stats1.items > 0

    io = make_table_io(spark, run_dir)
    man = io.manifest()
    assert man is not None and man["next_wave"] == stats1.waves
    n_items_1 = eng.items_df(run_dir).count()
    n_seen_1 = eng.seen_df(run_dir).count()
    assert n_seen_1 >= n_items_1 > 0

    # resume with more waves allowed + a fresh staged seed group
    cfg2 = EngineConfig(dedup=True, seen_backend="bloom", max_waves=10,
                        respect_robots=False, wave_seconds=3600.0,
                        bloom_capacity=1 << 12,
                        scheduler_holding_threshold=10**9)
    grp = spark.createDataFrame(
        pd.DataFrame([(1, "http://h0001.example.com/page/3", 0)],
                     columns=["spider_id", "url", "seed_rank"]),
        SEEDS_SCHEMA,
    )
    eng2 = CrawlEngine(spark, pages, {1: LinkSpider()}, cfg2)
    eng2.run(run_dir=run_dir, resume=True, staged_seeds=[grp])
    assert eng2.items_df(run_dir).count() >= n_items_1
    assert eng2.seen_df(run_dir).count() >= n_seen_1
    # seq numbers never reused across the resume boundary (a retry may
    # re-schedule its seq, but always in a distinct wave)
    order = eng2.crawl_order_df(run_dir).toPandas()
    assert not order.duplicated(["seq", "wave"]).any()


def test_invalidation_rewrite_on_backend(spark, tmp_path, backend):
    pages, seeds = _setup(spark)
    cfg = EngineConfig(dedup=True, seen_backend="cuckoo", max_waves=3,
                       respect_robots=False, wave_seconds=3600.0,
                       bloom_capacity=1 << 12)
    run_dir = str(tmp_path / f"inv_{backend}")
    eng = CrawlEngine(spark, pages, {1: LinkSpider()}, cfg)
    eng.run(seeds=seeds, run_dir=run_dir)
    seen = [r.url_canon for r in eng.seen_df(run_dir).collect()]
    victim = sorted(seen)[0]
    assert eng.invalidate_seen(run_dir, [victim]) == 1
    left = {r.url_canon for r in eng.seen_df(run_dir).collect()}
    assert victim not in left and len(left) == len(seen) - 1
