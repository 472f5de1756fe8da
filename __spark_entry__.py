"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: the full crawl-engine loop on a deterministic
                 synthetic page corpus (chains + web graph), returning the
                 extracted-items DataFrame.
queries()      — one entry per implemented operator (SURVEY.md §2 + the
                 training-data pipeline ops), each (spark, sf_dir) -> DF.
oracle_sql()   — matching ANSI SQL for DuckDB over the same tables.
                 Column names/aliases match the Spark results exactly.

Hash arithmetic shared by both sides is md5-hex based (engine-portable):
Spark  CAST(conv(substr(md5(x),1,15),16,10) AS BIGINT)
DuckDB CAST(concat('0x',substr(md5(x),1,15)) AS BIGINT)
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # ironspark pkg


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _tp(
    spark: SparkSession, sf_dir: str, name: str, *keys: str
) -> DataFrame:
    """_t + HASH repartition (on ``keys``) to the session's core count.

    The sf test tables are single-file, SINGLE-ROW-GROUP parquet, and a
    row group is parquet's unit of scan parallelism — so every scan
    stage otherwise runs as ONE task and any per-row-heavy work above
    it (codec round trips, shingle explodes, regex stacks) serializes
    on one core of local[N] (optimization guide §2.5 "input skew" /
    §6.1). The repartition shuffles only the table's projected rows
    (KB-MB here) to buy back N-way parallelism; it is applied per
    query below only where per-row work dominates, because a real
    multi-row-group corpus would get the parallelism from the scan
    itself and the extra exchange would be pure overhead.

    Round-7 second pass: HASH partitioning on the table's unique key,
    never keyless round-robin — `repartition(n)` pays its
    sort-before-repartition (SPARK-23207) INSIDE the single scan task,
    i.e. a serial sort of the whole table before any parallelism is
    bought (measured: the sort was the bulk of several queries'
    fan-out cost; see OPTIMIZATION_r07.md). A unique key spreads as
    evenly as round-robin, and a downstream aggregate/window keyed on
    (a superset of) it reuses the exchange outright (guide §2.4)."""
    return _t(spark, sf_dir, name).repartition(
        spark.sparkContext.defaultParallelism, *keys
    )


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Full crawl: seeds -> politeness schedule -> fetch(corpus join) ->
    Arrow parse/extract -> dedup -> frontier loop; returns items."""
    import tempfile

    from ironspark.config import EngineConfig
    from ironspark.corpus import (
        article_seeds,
        build_chain_corpus,
        build_graph_corpus_pdf,
        graph_seeds,
    )
    from ironspark.engine import CrawlEngine
    from ironspark.schemas import PAGES_SCHEMA, SEEDS_SCHEMA
    from ironspark.spider import ArticleSpider, LinkSpider

    import pandas as pd

    chain_pdf = build_chain_corpus(2, 4)
    graph_pdf = build_graph_corpus_pdf(300, 8)
    pages = spark.createDataFrame(
        pd.concat([chain_pdf, graph_pdf], ignore_index=True), PAGES_SCHEMA
    )
    seeds = spark.createDataFrame(
        pd.concat(
            [article_seeds(2, 4, dup=2), graph_seeds(300, 5, 8, spider_id=10)],
            ignore_index=True,
        ),
        SEEDS_SCHEMA,
    )
    spiders = {1: ArticleSpider(), 2: ArticleSpider(), 10: LinkSpider()}
    cfg = EngineConfig(
        dedup=True,
        seen_backend="bloom",
        max_waves=4,
        respect_robots=False,
        wave_seconds=600.0,
        default_crawl_delay=0.5,
    )
    eng = CrawlEngine(spark, pages, spiders, cfg)
    stats = eng.run(seeds=seeds, run_dir=tempfile.mkdtemp(prefix="ironspark_entry_"))
    return eng.items_df(stats.run_dir)


# ---------------------------------------------------------------------------
# operator queries (SURVEY.md §2 mapping per FIXTURES.md §7)
# ---------------------------------------------------------------------------

def _m1_counter_sums(spark, sf):
    # M1 counter sums (src/downloader/stat.rs:174-216)
    return _t(spark, sf, "events").agg(
        F.count("*").alias("n_requests"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


def _m2_status_histogram(spark, sf):
    # M2 status-code histogram (src/downloader/stat.rs:124,203-207)
    return _t(spark, sf, "events").groupBy("event_type").agg(
        F.count("*").alias("cnt")
    )


def _m3_error_histogram(spark, sf):
    # M3 exception-type histogram (src/downloader/stat.rs:127,218-226)
    return _t(spark, sf, "orders").groupBy("o_orderstatus").agg(
        F.count("*").alias("cnt")
    )


def _m4_minmax(spark, sf):
    # M4 min/max via CAS loop (src/downloader/stat.rs:283-311)
    return _t(spark, sf, "events").agg(
        F.round(F.min("value"), 6).alias("min_value"),
        F.round(F.max("value"), 6).alias("max_value"),
    )


def _m5_avg(spark, sf):
    # M5 running average (src/downloader/stat.rs:352-364)
    return _t(spark, sf, "events").agg(
        F.round(F.avg("value"), 6).alias("avg_value"),
        F.count("*").alias("n"),
    )


def _m6_peak_gauge(spark, sf):
    # M6 peak concurrent gauge (src/downloader/stat.rs:268-281)
    per_user = _t(spark, sf, "events").groupBy("user_id").agg(
        F.count("*").alias("cnt")
    )
    return per_user.agg(F.max("cnt").alias("peak"))


def _f2_fifo_order_limit(spark, sf):
    # F2 FIFO dequeue order (src/scheduler/scheduler.rs:34-76)
    return (
        _t(spark, sf, "orders")
        .orderBy("o_orderdate", "o_orderkey")
        .limit(100)
        .select("o_orderkey", "o_orderdate")
    )


def _f3_politeness_topk(spark, sf):
    # F3 window-rank priority queue (downloader dequeue-with-budget,
    # src/downloader/downloader.rs:99-137) — top-3 per host(source)
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy("doc_id")
    return (
        _t(spark, sf, "documents")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("source", "doc_id", "rk")
    )


def _f5_backpressure_cap(spark, sf):
    # F5 max-waiting cap = 2*concurrent_limit = 64 (downloader.rs:23,64)
    return (
        _t(spark, sf, "events")
        .orderBy("ts", "event_id")
        .limit(64)
        .select("event_id")
    )


def _f7_rate_budget(spark, sf):
    # F7 per-host rate budget (governor quota, downloader.rs:45-48):
    # budget(host) = floor(wave_seconds / crawl_delay)
    per_host = _t(spark, sf, "documents").groupBy("source").agg(
        F.count("*").alias("pending")
    )
    budget = F.floor(60.0 / (1.0 + F.length("source") % 5)).cast("long")
    return per_host.select(
        "source",
        "pending",
        budget.alias("budget"),
        F.least(F.col("pending"), budget).alias("scheduled"),
    )


def _d1_retry_union(spark, sf):
    # D1 retry with backoff as a union (downloader.rs:162-223)
    o = _t(spark, sf, "orders")
    pending = o.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey", F.lit(0).alias("attempt")
    )
    retried = o.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", (F.lit(0) + 1).alias("attempt")
    )
    return pending.unionByName(retried)


def _d2_status_filter(spark, sf):
    # D2 acceptance filter: <400 OR in allow set (downloader.rs:236-247)
    li = _t(spark, sf, "lineitem")
    return li.filter(
        (F.col("l_quantity") < 10) | F.col("l_returnflag").isin("R")
    ).select("l_orderkey", "l_linenumber")


def _d3_error_classify(spark, sf):
    # D3 error classification (downloader.rs:266-286)
    e = _t(spark, sf, "events")
    cls = (
        F.when(F.col("value") < 10, F.lit("timeout"))
        .when(F.col("value") < 50, F.lit("connect"))
        .otherwise(F.lit("unknown"))
    )
    return e.groupBy(cls.alias("error_class")).agg(F.count("*").alias("cnt"))


def _d4_wire_size(spark, sf):
    # D4 request wire-size arithmetic (src/request.rs:18-47)
    o = _t(spark, sf, "orders")
    size = (
        F.length(F.lit("GET"))
        + 1
        + F.length(F.concat(F.lit("/order/"), F.col("o_orderkey").cast("string")))
        + 1
        + 10
    )
    return o.agg(F.sum(size).cast("long").alias("total_bytes"))


def _p5_regexp_extract(spark, sf):
    # P5 first \d+ extraction (basic_spider.rs:32-36)
    return _t(spark, sf, "documents").select(
        "doc_id", F.regexp_extract(F.col("text"), r"\d+", 0).alias("first_num")
    )


def _p7_antijoin_dedup(spark, sf):
    # P7 URL-seen anti-join dedup (basic_spider.rs:29,75-89)
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").select(
        "c_custkey", "c_name"
    )


def _l1_registration(spark, sf):
    # L1 monotonic spider-id assignment (src/spider/manager.rs:32,45-53)
    from pyspark.sql import Window

    w = Window.orderBy("n_name")
    return _t(spark, sf, "nation").select(
        "n_name", F.row_number().over(w).alias("spider_id")
    )


def _x1_exchange_join(spark, sf):
    # X1/X2 stage boundaries exercised as a 4-table join + agg
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


def _q2_supplier_region(spark, sf):
    """Fact-to-dim star join: lineitem joined through the
    supplier -> nation -> region dimension chain, revenue per
    (region, nation). The dimension chain is pre-joined and BROADCAST
    (three dim tables, tiny at any scale next to the fact) so the
    fact table is scanned once with zero shuffle before the
    aggregation — the plan that survives a 100 TB lineitem."""
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    dims = (
        s.join(n, s["s_nationkey"] == n["n_nationkey"])
        .join(r, n["n_regionkey"] == r["r_regionkey"])
        .select("s_suppkey", "n_name", "r_name")
    )
    li = _t(spark, sf, "lineitem")
    return (
        li.join(F.broadcast(dims), li["l_suppkey"] == dims["s_suppkey"])
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def _q3_part_brand(spark, sf):
    """Selective dim filter pushed through a broadcast join: small
    parts only (p_size <= 25), revenue + retail-price stats per
    brand. The part filter prunes the broadcast build side BEFORE the
    fact scan probes it."""
    p = _t(spark, sf, "part").filter(F.col("p_size") <= 25)
    li = _t(spark, sf, "lineitem")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.round(F.avg("p_retailprice"), 6).alias("avg_retail"),
            F.count("*").alias("n_items"),
        )
    )


def _q1_lineitem_agg(spark, sf):
    # the classic pricing-summary aggregation (hash agg + filters)
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2025-06-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def _skew2p_salted_agg(spark, sf):
    # the north rule's salting + two-phase aggregation, verified equal
    # to the plain group-by (oracle): phase 1 aggregates (key, salt),
    # phase 2 merges partials per key
    li = _t(spark, sf, "lineitem")
    salted = li.withColumn("_salt", F.pmod(F.col("l_orderkey"), F.lit(16)))
    p1 = salted.groupBy("l_returnflag", "_salt").agg(
        F.count("*").alias("c"), F.sum("l_quantity").alias("q")
    )
    return p1.groupBy("l_returnflag").agg(
        F.sum("c").alias("cnt"), F.round(F.sum("q"), 2).alias("sum_qty")
    )


# -- general relational coverage (set ops, rollup, dates, JSON, arrays, windows)

def _s_set_ops(spark, sf):
    o = _t(spark, sf, "orders")
    a = o.filter(F.col("o_totalprice") > 100000).select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return (
        a.intersect(b).withColumn("src", F.lit("both"))
        .unionByName(a.exceptAll(b).distinct().withColumn("src", F.lit("big_only")))
    )


def _g_rollup(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("l_quantity"), 2).alias("qty"))
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("rf"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("ls"),
            "cnt", "qty",
        )
    )


def _dt_date_funcs(spark, sf):
    o = _t(spark, sf, "orders")
    return o.groupBy(
        F.year("o_orderdate").alias("y"),
        F.quarter("o_orderdate").alias("q"),
    ).agg(
        F.count("*").alias("cnt"),
        F.min(F.date_trunc("month", F.col("o_orderdate"))).alias("first_month"),
    )


def _j_json_extract(spark, sf):
    e = _t(spark, sf, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return e.groupBy((k % 10).alias("k_mod")).agg(
        F.count("*").alias("cnt"), F.sum(k).alias("k_sum")
    )


def _arr_array_funcs(spark, sf):
    emb = _t(spark, sf, "embeddings")
    vec = F.transform("embedding", lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(
            F.aggregate(F.slice(vec, 1, 8), F.lit(0.0), lambda a, x: a + x), 6
        ).alias("head_sum"),
        F.round(F.array_max(vec), 6).alias("vmax"),
    )


def _w_lag_running(spark, sf):
    from pyspark.sql import Window

    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.lag("event_id").over(w).alias("prev_event"),
        F.round(
            F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 4
        ).alias("running_value"),
    )


# -- training-data pipeline ops ------------------------------------------------

def _t_exact_dedup(spark, sf):
    from ironspark.textops import exact_dedup

    return exact_dedup(_t(spark, sf, "documents"))


def _t_minhash_sig(spark, sf):
    from ironspark.textops import minhash_signatures

    return minhash_signatures(_t(spark, sf, "documents"), bands=4)


def _t_lsh_pairs(spark, sf):
    from ironspark.textops import lsh_candidate_pairs

    return lsh_candidate_pairs(_t(spark, sf, "documents"), bands=4)


def _t_jaccard_pairs(spark, sf):
    from ironspark.textops import jaccard_pairs, lsh_candidate_pairs

    docs = _t(spark, sf, "documents")
    return jaccard_pairs(docs, lsh_candidate_pairs(docs, bands=4))


def _t_dup_clusters(spark, sf):
    from ironspark.textops import near_dup_clusters

    return near_dup_clusters(
        _t(spark, sf, "documents"), threshold=0.5, bands=4
    )


def _t_dup_collapse(spark, sf):
    from ironspark.textops import near_dup_collapse

    return near_dup_collapse(
        _t(spark, sf, "documents"), threshold=0.5, bands=4
    )


def _t_simhash(spark, sf):
    from ironspark.textops import simhash

    return simhash(_t(spark, sf, "documents"), bits=16)


def _t_langid(spark, sf):
    from ironspark.textops import language_id

    return language_id(_t(spark, sf, "documents"))


def _t_token_count(spark, sf):
    from ironspark.textops import token_count

    return token_count(_t(spark, sf, "documents")).select(
        "doc_id", "n_tokens"
    )


def _t_quality(spark, sf):
    from ironspark.textops import quality_score

    return quality_score(_t(spark, sf, "documents")).select(
        "doc_id", "n_chars", "n_tokens", "n_punct", "punct_ratio", "stop_ratio"
    )


def _t_fingerprint(spark, sf):
    from ironspark.textops import fingerprint

    return fingerprint(_t(spark, sf, "documents"))


def _t_dup_ngrams(spark, sf):
    from ironspark.textops import dup_ngram_ratio

    return dup_ngram_ratio(_t(spark, sf, "documents"), n=5)


def _t_vocab_topk(spark, sf):
    from ironspark.textops import vocab_topk

    return vocab_topk(_t(spark, sf, "documents"), k=50)


def _t_pii_scrub(spark, sf):
    from ironspark.textops import pii_scrub

    return pii_scrub(_t(spark, sf, "documents"))


def _t_decontaminate(spark, sf):
    from ironspark.textops import decontaminate

    docs = _t(spark, sf, "documents")
    # deterministic stand-in benchmark set: every 97th document plays
    # the eval suite; contamination = sharing any 8-gram with it
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return decontaminate(docs, bench, n=8)


def _t_gopher_quality(spark, sf):
    from ironspark.textops import gopher_quality

    # min_words=20 / min_stop_hits=1 so the short synthetic docs (one
    # in-list stopword in their vocab) split into a real keep/drop
    # mix (367/133 at sf0.01); other thresholds are the Gopher defaults
    return gopher_quality(
        _t(spark, sf, "documents"), min_words=20, min_stop_hits=1
    )


def _t_tfidf_topk(spark, sf):
    from ironspark.textops import tfidf_topk

    return tfidf_topk(_tpd(spark, sf), k=3)


def _t_stratified_sample(spark, sf):
    from ironspark.textops import stratified_sample

    return stratified_sample(_t(spark, sf, "documents"))


def _t_domain_stats(spark, sf):
    from ironspark.textops import domain_stats

    return domain_stats(_t(spark, sf, "documents"))


def _t_length_quantiles(spark, sf):
    from ironspark.textops import length_quantiles

    return length_quantiles(_t(spark, sf, "documents"))


def _chunked_docs(spark, sf):
    # The synthetic corpus is single-line; derive deterministic "lines"
    # as 10-word chunks (identically in the oracles), so line-grained
    # operators run against their natural newline contract.
    # Near-dup/exact-dup documents share chunks, so line dedup and
    # repetition signals do real work here.
    docs = _t(spark, sf, "documents")
    words = F.filter(
        F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != ""
    )
    n_chunks = F.greatest(
        F.ceil(F.size(words) / F.lit(10.0)).cast("int"), F.lit(1)
    )
    chunks = F.transform(
        F.sequence(F.lit(1), n_chunks),
        lambda i: F.array_join(F.slice(words, (i - 1) * 10 + 1, 10), " "),
    )
    return docs.select("doc_id", F.array_join(chunks, "\n").alias("text"))


def _t_line_dedup(spark, sf):
    from ironspark.textops import corpus_line_dedup

    return corpus_line_dedup(_chunked_docs(spark, sf), min_docs=3)


def _t_rep_signals(spark, sf):
    from ironspark.textops import repetition_signals

    return repetition_signals(_chunked_docs(spark, sf), n=2)


# -- link-graph analytics -------------------------------------------------------

def _g_edges(spark, sf, fan_out=False):
    # deterministic directed multigraph derived from lineitem: 1009
    # nodes, ~60k edges at sf0.01, 12 dangling nodes (dst-only) so the
    # dangling-mass path is exercised. fan_out: the _tp rationale for
    # the iterative consumers — their first op is _weighted_edges'
    # (src, dst) partial aggregate (~1M groups at 6M rows), which
    # otherwise runs inside the single-row-group scan's ONE task; only
    # the two 8-byte key columns cross the exchange.
    e = _t(spark, sf, "lineitem").select(
        (F.col("l_orderkey") % 997).cast("long").alias("src"),
        (F.col("l_partkey") % 1009).cast("long").alias("dst"),
    )
    if fan_out:
        # HASH repartition on the aggregate key, which the consumer's
        # groupBy(src, dst) reuses (guide §2.4) — NOT keyless
        # repartition(n), whose sort-before-repartition (SPARK-23207)
        # runs inside the single scan task and measured 60% slower
        # than no fan-out at all. The serial stage is left with
        # hash + shuffle-write only.
        e = e.repartition(
            spark.sparkContext.defaultParallelism, "src", "dst"
        )
    return e


def _g_degree(spark, sf):
    from ironspark.graph import degree_stats

    return degree_stats(_g_edges(spark, sf))


def _g_pagerank(spark, sf):
    from ironspark.graph import pagerank_fixedpoint

    return pagerank_fixedpoint(
        _g_edges(spark, sf, fan_out=True), iterations=5
    )


# -- similarity search ----------------------------------------------------------

def _query_vec(spark, sf):
    row = (
        _t(spark, sf, "embeddings").filter(F.col("vec_id") == 0).first()
    )
    return [float(x) for x in row["embedding"]]


def _a_cosine_topk(spark, sf):
    from ironspark.ann import cosine_topk

    emb = _t(spark, sf, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    return cosine_topk(emb, _query_vec(spark, sf), k=10)


def _a_knn_join(spark, sf):
    from ironspark.ann import knn_join_bruteforce

    emb = _t(spark, sf, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    queries = emb.filter(F.col("vec_id") < 3)
    return knn_join_bruteforce(emb, queries, k=5)


def _a_ivf_assign(spark, sf):
    from ironspark.ann import ivf_assign

    emb = _t(spark, sf, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    return ivf_assign(emb, n_centroids=8)


def _a_ivf_topk(spark, sf):
    from ironspark.ann import ivf_topk

    emb = _t(spark, sf, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    return ivf_topk(emb, _query_vec(spark, sf), k=10, n_centroids=8, nprobe=2)


# -- multimodal plumbing ---------------------------------------------------------

def _docids(spark, sf):
    """doc_id-only scan fanned out to the core count: the media-codec
    queries run multi-ms Python per row behind a single-row-group scan
    (see _tp), and only the 8-byte key needs to cross the exchange."""
    return (
        _t(spark, sf, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )


def _tpd(spark, sf):
    """(doc_id, text) scan fanned out to the core count — the _tp
    rationale for the text operators whose per-row work (shingle
    explodes, regex stacks, symbol splits) dominates at scale,
    projected first so the exchange never carries unused columns."""
    return (
        _t(spark, sf, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )


def _mm_metadata(spark, sf):
    from ironspark.multimodal import documents_as_media, extract_metadata

    return extract_metadata(documents_as_media(_t(spark, sf, "documents")))


def _mm_frame_sample(spark, sf):
    from ironspark.multimodal import documents_as_media, frame_sample

    return frame_sample(documents_as_media(_t(spark, sf, "documents")), 100)


def _mm_feature(spark, sf):
    from ironspark.multimodal import documents_as_media, fake_feature_extract

    feats = fake_feature_extract(documents_as_media(_t(spark, sf, "documents")), dim=8)
    return feats.select(
        F.col("media_id"),
        F.round(F.element_at("feature", 1), 6).alias("f0"),
        F.round(F.element_at("feature", 8), 6).alias("f7"),
    )


def _mm_decode(spark, sf):
    """REAL PNG codec round trip, distributed (multimodal.decode_png /
    encode_png — pure stdlib, new in round 5): per doc, build a 2x2
    RGB image whose 12 pixel bytes are (doc_id*(j+1)) % 256, encode it
    with a doc-dependent PNG filter type (all five §9 filters get
    exercised across the table), decode it back, and emit the
    reconstructed pixel buffer as hex. The oracle recomputes the pixel
    bytes arithmetically — so a wrong filter inversion or chunk walk
    hash-mismatches. One Arrow pass, zero shuffle."""
    import numpy as np
    import pandas as pd

    from ironspark.multimodal import decode_image, encode_png

    def run(batches):
        for pdf in batches:
            ids, hexes = [], []
            _j = np.arange(1, 13, dtype=np.int64)
            for did in pdf["doc_id"]:
                did = int(did)
                pix = (did * _j % 256).astype(np.uint8).reshape(2, 2, 3)
                png = encode_png(pix, filters=[did % 5, (did // 5) % 5])
                img = decode_image(png)
                ids.append(did)
                hexes.append(img["pixels"].tobytes().hex())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "width": np.int32(2), "height": np.int32(2),
                    "channels": np.int32(3), "pixel_hex": hexes,
                }
            )

    return _docids(spark, sf).mapInPandas(
        run,
        "media_id long, width int, height int, channels int, pixel_hex string",
    )


def _mm_audio(spark, sf):
    """REAL WAV codec round trip, distributed (multimodal.encode_wav /
    decode_wav + audio_stats_stage semantics — new in round 5): per
    doc, synthesize a deterministic int16 mono waveform
    s_i = (doc_id*(i+1)) % 65536 - 32768 for i in 0..n-1 with
    n = 50 + doc_id % 13 at rate 8000 + (doc_id % 3)*4000, serialize
    it to RIFF/WAVE bytes, decode those bytes back, and emit exact
    integer stats. The oracle recomputes the waveform arithmetically —
    a wrong chunk walk, byte order, or de-interleave hash-mismatches.
    One Arrow pass, zero shuffle."""
    import numpy as np
    import pandas as pd

    from ironspark.multimodal import decode_wav, encode_wav

    def run(batches):
        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "sample_rate", "channels", "bits",
                "n_frames", "duration_ms", "sum_sq", "peak",
            )}
            _i = np.arange(1, 63 + 1, dtype=np.int64)  # n <= 50 + 12
            for did in pdf["doc_id"]:
                did = int(did)
                n = 50 + did % 13
                rate = 8000 + (did % 3) * 4000
                s = (did * _i[:n] % 65536 - 32768).astype(np.int16)
                w = decode_wav(encode_wav(s, sample_rate=rate))
                arr = w["samples"].astype(np.int64)
                out["media_id"].append(did)
                out["sample_rate"].append(np.int32(w["sample_rate"]))
                out["channels"].append(np.int32(w["channels"]))
                out["bits"].append(np.int32(w["bits"]))
                out["n_frames"].append(w["n_frames"])
                out["duration_ms"].append(
                    w["n_frames"] * 1000 // w["sample_rate"]
                )
                out["sum_sq"].append(int(np.sum(arr * arr)))
                out["peak"].append(np.int32(np.max(np.abs(arr))))
            yield pd.DataFrame(out)

    return _docids(spark, sf).mapInPandas(
        run,
        "media_id long, sample_rate int, channels int, bits int, "
        "n_frames long, duration_ms long, sum_sq long, peak int",
    )


# fixed multilingual snippets driving t_langid_script: one per major
# writing system + four Latin stopword languages + a no-signal row.
# The Spark side synthesizes each doc's text as snippet[doc_id % 14]
# and runs textops.language_id_v2; the oracle re-runs the WHOLE
# detection (script char-class counts, kana rule, 30% argmax rule,
# stopword vote, und fallback) over the same snippets in DuckDB's
# regex dialect — a wrong range, threshold, or tie-break mismatches.
_LANG_SNIPPETS = [
    "the cat sat on the mat and it was warm for that time of year",
    "der hund ist nicht mit der katze auf dem sofa und das ist gut",
    "le chat est dans la maison et il ne veut pas sortir des que possible",
    "el perro no es un gato y los dos viven con la familia para siempre",
    "今天天气很好我们一起去公园散步吧这里的风景非常美丽",
    "今日はとても良い天気ですので公園へ散歩に行きましょう",
    "오늘은 날씨가 좋아서 공원에 산책하러 갑니다",
    "сегодня хорошая погода и мы идем гулять в парк вместе",
    "الطقس جميل اليوم ونحن ذاهبون إلى الحديقة معا",
    "आज मौसम बहुत अच्छा है और हम पार्क में टहलने जा रहे हैं",
    "σήμερα ο καιρός είναι καλός και πηγαίνουμε στο πάρκο μαζί",
    "วันนี้อากาศดีมากเราไปเดินเล่นที่สวนสาธารณะกัน",
    "מזג האוויר יפה היום ואנחנו הולכים לפארק יחד",
    "12345 67890 24680 13579 55555",
]


def _t_langid_script(spark, sf):
    """Script-aware language ID (textops.language_id_v2, round 6) on
    deterministic multilingual text: doc text = _LANG_SNIPPETS[doc_id
    % 14], covering nine non-Latin writing systems, four Latin
    stopword languages, and a no-signal row. Zero shuffle."""
    from ironspark.textops import language_id_v2

    docs = _t(spark, sf, "documents").select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(s) for s in _LANG_SNIPPETS]),
            (F.col("doc_id") % 14 + 1).cast("int"),
        ).alias("text"),
    )
    return language_id_v2(docs)


def _mm_jpeg(spark, sf):
    """REAL baseline-JPEG codec round trip, distributed
    (multimodal.encode_jpeg / decode_jpeg — pure stdlib+numpy ITU-T
    T.81 SOF0, new in round 6): per doc, build a FLAT RGB image of
    color (doc_id%256, doc_id*7%256, doc_id*13%256) with
    doc-dependent odd dimensions (8+doc_id%9 rows, 8+doc_id%7 cols —
    exercising MCU edge padding + crop) and quality 35+doc_id%60
    (both libjpeg scale-factor branches), encode it 4:4:4, decode it
    back, and emit the decoded color. A flat image's whole pipeline —
    RGB->YCbCr, DC-only FDCT, quantize, dequantize, IDCT,
    YCbCr->RGB, all under the codec's floor(x+0.5+1e-9) rounding —
    collapses to a closed-form per-doc arithmetic chain the DuckDB
    oracle recomputes with FLOOR, so a wrong Huffman table, zigzag,
    DCT normalization, or quant scale hash-mismatches. n_colors
    asserts the decoded image is uniform (a block-boundary bug would
    break uniformity before it shifts the mean). One Arrow pass,
    zero shuffle."""
    import numpy as np
    import pandas as pd

    from ironspark.multimodal import decode_jpeg, encode_jpeg

    def run(batches):
        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "width", "height", "channels",
                "n_colors", "px_r", "px_g", "px_b",
            )}
            for did in pdf["doc_id"]:
                did = int(did)
                h, w = 8 + did % 9, 8 + did % 7
                px = np.empty((h, w, 3), dtype=np.uint8)
                px[..., 0] = did % 256
                px[..., 1] = (did * 7) % 256
                px[..., 2] = (did * 13) % 256
                img = decode_jpeg(encode_jpeg(px, quality=35 + did % 60))
                flat = img["pixels"].reshape(-1, 3)
                out["media_id"].append(did)
                out["width"].append(np.int32(img["width"]))
                out["height"].append(np.int32(img["height"]))
                out["channels"].append(np.int32(img["channels"]))
                # distinct colors via 24-bit packing: same count as
                # np.unique(flat, axis=0) without its per-row
                # structured-dtype sort (~10x on these tiny images)
                packed = (
                    flat[:, 0].astype(np.int32) << 16
                ) | (flat[:, 1].astype(np.int32) << 8) | flat[:, 2]
                out["n_colors"].append(np.int32(np.unique(packed).size))
                out["px_r"].append(np.int32(flat[0, 0]))
                out["px_g"].append(np.int32(flat[0, 1]))
                out["px_b"].append(np.int32(flat[0, 2]))
            yield pd.DataFrame(out)

    return _docids(spark, sf).mapInPandas(
        run,
        "media_id long, width int, height int, channels int, "
        "n_colors int, px_r int, px_g int, px_b int",
    )


def _mm_gif_bmp(spark, sf):
    """REAL GIF (LZW) + BMP codec round trips, distributed
    (multimodal.encode_gif/decode_gif + encode_bmp/decode_bmp — pure
    stdlib, new in round 6): per doc, build a 2x2 4-color paletted
    image with palette[k][c] = doc_id*(3k+c+1) % 256 and indices
    idx[r][cc] = (doc_id + 2r + cc) % 4, round-trip it through the GIF
    LZW coder; and a 2x2 RGB image with bytes doc_id*(j+1) % 256
    round-tripped through the BMP coder. Both formats are lossless, so
    the oracle recomputes the exact pixel bytes arithmetically — a
    wrong LZW width rule, palette layout, BGR swap, or row padding
    hash-mismatches. One Arrow pass, zero shuffle."""
    import numpy as np
    import pandas as pd

    from ironspark.multimodal import (
        decode_bmp,
        decode_gif,
        encode_bmp,
        encode_gif,
    )

    def run(batches):
        for pdf in batches:
            ids, ghex, bhex = [], [], []
            _k = np.arange(1, 13, dtype=np.int64).reshape(4, 3)
            _r = np.arange(4, dtype=np.int64).reshape(2, 2)
            for did in pdf["doc_id"]:
                did = int(did)
                pal = (did * _k % 256).astype(np.uint8)
                idx = ((did + _r) % 4).astype(np.uint8)
                g = decode_gif(encode_gif(idx, pal))
                px = (did * _k % 256).astype(np.uint8).reshape(2, 2, 3)
                b = decode_bmp(encode_bmp(px, top_down=bool(did % 2)))
                ids.append(did)
                ghex.append(g["pixels"].tobytes().hex())
                bhex.append(b["pixels"].tobytes().hex())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "width": np.int32(2), "height": np.int32(2),
                    "gif_hex": ghex, "bmp_hex": bhex,
                }
            )

    return _docids(spark, sf).mapInPandas(
        run,
        "media_id long, width int, height int, gif_hex string, "
        "bmp_hex string",
    )


def _mm_gif_frames(spark, sf):
    """REAL animated-GIF demux + frame compositing, distributed
    (multimodal.encode_gif_animation / gif_frame_sample_stage, new in
    round 6): per doc, a 4-frame 2x2 GIF89a animation — palette
    pal[k][c] = doc_id*(3k+c+1) % 256, frame f indices idx_f[r][cc] =
    (doc_id+f+2r+cc) % 4, delay (doc_id+f) % 100 cs; frame 0 opaque,
    frames 1-3 carry transparent index 3 with disposal=leave, so every
    composited pixel is the LAST non-3 index at that position — a
    recurrence the oracle unrolls exactly in SQL. The stage samples
    every 2nd composited frame (frame_idx 0 and 2). A wrong GCE parse,
    transparency mask, compositing order, or LZW bit width
    hash-mismatches. Two Arrow passes, zero shuffle."""
    import numpy as np
    import pandas as pd

    from ironspark.multimodal import (
        encode_gif_animation,
        gif_frame_sample_stage,
    )

    def build(batches):
        for pdf in batches:
            ids, payloads = [], []
            _k = np.arange(1, 13, dtype=np.int64).reshape(4, 3)
            _r = np.arange(4, dtype=np.int64).reshape(2, 2)
            for did in pdf["doc_id"]:
                did = int(did)
                pal = (did * _k % 256).astype(np.uint8)
                frames = [
                    ((did + f + _r) % 4).astype(np.uint8) for f in range(4)
                ]
                payloads.append(encode_gif_animation(
                    frames, pal,
                    delays_cs=[(did + f) % 100 for f in range(4)],
                    transparents=[None, 3, 3, 3],
                    disposals=[1, 1, 1, 1],
                ))
                ids.append(did)
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = _docids(spark, sf).mapInPandas(
        build, "media_id long, payload binary"
    )
    return gif_frame_sample_stage(media, every_n=2).select(
        "media_id", "frame_idx", "delay_cs", "width", "height", "px_hex"
    )


def _f9_robots_wildcard(spark, sf):
    """RFC 9309 wildcard enforcement (robots.compile_rule_regex +
    politeness.robots_disallow_filter, new in round 5), driver-attested
    cross-engine: synthetic pending URLs derive deterministically from
    doc_id (query strings, .pdf suffixes, /cc/pub nesting), three hosts
    carry FIXED literal rule sets exercising `*`, trailing `$`,
    prefix-vs-wildcard precedence, and allow-beats-shorter-disallow;
    the oracle re-derives the same keep set with hand-expanded
    per-host CASE logic in DuckDB's regex dialect. Plan: broadcast
    rules join + codegen array folds, zero shuffle (plus the _tp
    fan-out exchange so the per-row regex folds use every core)."""
    docs = _docids(spark, sf)
    did = F.col("doc_id")
    pq = F.concat(
        F.lit("/"),
        F.element_at(
            F.lit(["cc/pub/p", "cc/p", "docs/p", "p"]),
            (did % 4 + 1).cast("int"),
        ),
        did.cast("string"),
        F.when(did % 5 == 0, F.lit(".pdf")).otherwise(F.lit("")),
        F.when(did % 7 == 0, F.concat(F.lit("?sessionid="), did.cast("string")))
        .otherwise(F.lit("")),
    )
    host = F.concat(F.lit("h"), (did % 3).cast("string"), F.lit(".test"))
    pending = docs.select(
        "doc_id", host.alias("host"),
        F.concat(F.lit("http://"), host, pq).alias("url"),
    )
    robots = spark.createDataFrame(
        [
            ("h0.test", ["/*?sessionid=", "/*.pdf$"], []),
            ("h1.test", ["/cc"], ["/cc/pub"]),
            ("h2.test", ["/docs/*.pdf$"], ["/docs"]),
        ],
        "host string, disallow array<string>, allow array<string>",
    )
    from ironspark.politeness import robots_disallow_filter

    return robots_disallow_filter(pending, robots).select(
        "doc_id", "host", "url"
    )


def _fr_recrawl_due(spark, sf):
    """Freshness-driven recrawl selection (frontier.recrawl_due, new in
    round 5): events rows act as fetch history — url keyed by
    (user_id, event_type), host = user_id % 20 — and the scheduler
    re-admits the stalest URLs (>= 3 days since last fetch as of the
    fixed 'now') under a per-host budget of 5, stalest-first with a
    deterministic url tie-break. One hash-agg + one per-host window."""
    from ironspark.frontier import recrawl_due

    ev = _t(spark, sf, "events")
    host = F.concat(
        F.lit("h"), (F.col("user_id") % 20).cast("string"), F.lit(".test")
    )
    hist = ev.select(
        F.concat(
            F.lit("http://"), host, F.lit("/u"),
            F.col("user_id").cast("string"), F.lit("/"), F.col("event_type"),
        ).alias("url"),
        host.alias("host"),
        "ts",
    )
    out = recrawl_due(
        hist, "2024-01-31 00:00:00", interval_seconds=3 * 86400.0,
        per_host_budget=5,
    )
    return out.withColumn("age_seconds", F.round("age_seconds", 6))


# -- URL canonicalization (P8; pandas UDF — oracle restricted to fixed shapes) --

def _p8_canonicalize(spark, sf):
    from ironspark.url import canonicalize_udf

    docs = (
        _t(spark, sf, "documents")
        .select("doc_id", "source")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    raw = F.concat(
        F.lit("HTTP://"),
        F.upper("source"),
        F.lit(".Example.COM:80/A/./"),
        F.col("doc_id").cast("string"),
        F.lit("?z=1&a=2#frag"),
    )
    return docs.select(
        "doc_id", canonicalize_udf(raw).alias("url_canon")
    )


# -- round-2 additions: control-plane ops with SQL oracles ---------------------

def _f4_admission(spark, sf):
    # F4 staged admission math (manager.rs:239-279): a group is admitted
    # while the backlog of previously admitted groups is <= threshold
    from pyspark.sql import Window

    groups = (
        _t(spark, sf, "events")
        .groupBy((F.col("user_id") % 8).alias("grp"))
        .agg(F.count("*").alias("pending"))
    )
    w = Window.orderBy("grp").rowsBetween(Window.unboundedPreceding, -1)
    prior = F.coalesce(F.sum("pending").over(w), F.lit(0))
    return groups.select(
        "grp", "pending", (prior <= 5000).alias("admitted")
    )


def _d5_redirects(spark, sf):
    # D5 redirect resolution through the REAL fetch stage: /r/ urls
    # follow a redirects table to their /d/ page (final url lands in
    # url_canon, reference response.rs:10); /m/ urls are misses.
    from ironspark.fetch import fetch_from_corpus

    d = _t(spark, sf, "documents")
    did = F.col("doc_id").cast("string")
    base = F.concat(F.lit("http://"), F.col("source"), F.lit(".ex.com/d/"), did)
    rsrc = F.concat(F.lit("http://"), F.col("source"), F.lit(".ex.com/r/"), did)
    miss = F.concat(F.lit("http://"), F.col("source"), F.lit(".ex.com/m/"), did)
    pages = d.select(
        base.alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.encode("text", "UTF-8").alias("html"),
    )
    url = (
        F.when(F.col("doc_id") % 3 == 0, base)
        .when(F.col("doc_id") % 3 == 1, rsrc)
        .otherwise(miss)
    )
    sched = d.select(
        url.alias("url_canon"),
        url.alias("url"),
        F.concat(F.col("source"), F.lit(".ex.com")).alias("host"),
        F.lit(1).cast("long").alias("spider_id"),
        F.col("doc_id").alias("seq"),
        F.lit(0).alias("attempt"),
        F.lit("GET").alias("method"),
        F.lit(None).cast("map<string,string>").alias("headers"),
        F.lit(None).cast("string").alias("body"),
    )
    redirects = d.filter(F.col("doc_id") % 3 == 1).select(
        rsrc.alias("src"), base.alias("dst")
    )
    resp = fetch_from_corpus(sched, pages, redirects)
    return resp.select(
        F.col("seq").alias("doc_id"),
        "url_canon",
        F.col("resp_status").cast("int").alias("resp_status"),
        "bytes_resp",
    )


def _m8_spider_counters(spark, sf):
    # M8 spider-manager counters: pending per spider over the spider
    # universe; a spider with zero in-flight work is closed (L3 sweep)
    sp = spark.range(4).select(F.col("id").cast("long").alias("spider_id"))
    pend = (
        _t(spark, sf, "documents")
        .filter(F.col("n_chars") > 290)
        .groupBy((F.col("doc_id") % 4).alias("spider_id"))
        .agg(F.count("*").alias("pending"))
    )
    return sp.join(pend, "spider_id", "left").select(
        "spider_id",
        F.coalesce("pending", F.lit(0)).alias("pending"),
        (F.coalesce("pending", F.lit(0)) == 0).alias("closed"),
    )


def _m9_scheduler_depth(spark, sf):
    # M9 scheduler depth: running enqueue(+1)/dequeue(-1) per user queue
    from pyspark.sql import Window

    e = _t(spark, sf, "events")
    delta = F.when(F.col("event_type").isin("click", "view"), 1).otherwise(-1)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return e.select(
        "user_id", "event_id", F.sum(delta).over(w).cast("long").alias("depth")
    )


def _i1_routing_counts(spark, sf):
    # I1/M7 through the REAL PipelineManager: typed routing + transform
    # chains + unrouted counting (manager.rs:51-99)
    from ironspark.pipeline import PipelineManager

    d = _t(spark, sf, "documents")
    items = d.select(
        (
            F.when(F.col("doc_id") % 3 == 0, F.lit("article"))
            .when(F.col("doc_id") % 3 == 1, F.lit("page"))
            .otherwise(F.lit("media"))
        ).alias("item_type"),
        "doc_id",
    )
    pm = PipelineManager()
    pm.add_pipeline("article", lambda df: df.filter(F.col("doc_id") % 2 == 0))
    pm.add_pipeline("page", lambda df: df)
    processed, unrouted = pm.process(items)
    return processed.groupBy("item_type").agg(
        F.count("*").alias("cnt")
    ).unionByName(
        unrouted.groupBy().agg(F.count("*").alias("cnt")).select(
            F.lit("__unrouted__").alias("item_type"), "cnt"
        )
    )


def _a_embed_simhash(spark, sf):
    # SRP-LSH signature over embeddings (deterministic hyperplanes)
    from ironspark.ann import embedding_simhash

    emb = _t(spark, sf, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    return embedding_simhash(emb, bits=12, dim=16)


def _a_near_dup(spark, sf):
    # embedding-cosine near-dup: SRP bucket join + exact cosine verify
    from ironspark.ann import embedding_near_dup

    emb = _t(spark, sf, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    # bits=6 -> enough bucket collisions on the synthetic embeddings to
    # exercise the verify stage (71 pairs at sf0.01), not a 0-row test
    return embedding_near_dup(emb, bits=6, dim=16, threshold=0.3)


def _srp_planes(bits: int = 12, dim: int = 16) -> list[list[float]]:
    import hashlib

    return [
        [
            (int(hashlib.md5(f"{b}:{d}".encode()).hexdigest()[:15], 16) % 2001
             - 1000) / 1000.0
            for d in range(dim)
        ]
        for b in range(bits)
    ]


_IVF_INDEX_CACHE: dict[str, str] = {}


def _a_ivf_index(spark, sf):
    # the PERSISTED IVF index (build once, probe many; partition-pruned
    # probe) — must answer identically to the inline ivf_topk oracle
    import tempfile

    from ironspark.ann import IVFIndex

    emb = _t(spark, sf, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    if sf not in _IVF_INDEX_CACHE:
        path = tempfile.mkdtemp(prefix="ironspark_ivf_")
        IVFIndex.build(emb, path, n_centroids=8)
        _IVF_INDEX_CACHE[sf] = path
    idx = IVFIndex(spark, _IVF_INDEX_CACHE[sf])
    return idx.search(_query_vec(spark, sf), k=10, nprobe=2)


def _t_bpe_merges(spark, sf):
    from ironspark.textops import bpe_train

    return bpe_train(_tpd(spark, sf), num_merges=6)


def _c_url_templates(spark, sf):
    # deterministic URL log derived from events: hosts h0..h49; h0 is a
    # session-id trap (every URL unique, one {H} template, share 1.0),
    # the rest paginate by event_type with numeric item ids ({D}
    # templates whose share splits across the host's event types)
    from ironspark.url import url_templates

    # project the three consumed columns before the parallelizing
    # exchange (_tp rationale) so the shuffle never carries props/ts
    ev = (
        _t(spark, sf, "events")
        .select("user_id", "event_id", "event_type")
        .repartition(
            spark.sparkContext.defaultParallelism, "user_id", "event_id"
        )
    )
    url = F.when(
        F.col("user_id") % 50 == 0,
        F.concat(
            F.lit("https://h0.example.com/s/"),
            F.md5(F.col("event_id").cast("string")),
        ),
    ).otherwise(
        F.concat(
            F.lit("https://h"),
            (F.col("user_id") % 50).cast("string"),
            F.lit(".example.com/"),
            F.lower("event_type"),
            F.lit("/item"),
            (F.col("event_id") % 1000).cast("string"),
        )
    )
    return url_templates(
        ev.select(url.alias("url")), min_urls=10, trap_share=0.5
    )


def _g_anchor_topk(spark, sf):
    # deterministic link table from documents: each doc links to one of
    # 97 target pages (md5-derived), its first 80 chars as anchor text
    from ironspark.graph import anchor_topk
    from ironspark.textops import _md5num

    d = _t(spark, sf, "documents")
    links = d.select(
        F.col("doc_id").alias("src"),
        F.pmod(_md5num(F.col("doc_id").cast("string")), F.lit(97))
        .cast("long")
        .alias("dst"),
        F.substring("text", 1, 80).alias("anchor"),
    )
    return anchor_topk(links, k=3)


def _g_components(spark, sf):
    # deterministic mixed-size component graph from documents: blocks
    # of 4 consecutive doc_ids star onto their block root, and every
    # 20th doc bridges its block root to node 5 of the next block
    # (8-node components at every 20-stride, 4-node otherwise; block
    # roots appear as self-loops, exercising the u==v drop path)
    from ironspark.graph import connected_components

    d = _t(spark, sf, "documents")
    blocks = d.select(
        F.col("doc_id").alias("src"),
        (F.col("doc_id") - F.col("doc_id") % 4).alias("dst"),
    )
    bridges = d.filter(F.col("doc_id") % 20 == 0).select(
        F.col("doc_id").alias("src"), (F.col("doc_id") + 5).alias("dst")
    )
    return connected_components(blocks.unionByName(bridges))


def _t_incr_dedup(spark, sf):
    # snapshot split: every 3rd doc is the "new crawl", the rest the
    # existing corpus — ids disjoint by construction
    from ironspark.textops import incremental_near_dup

    d = _tpd(spark, sf)
    return incremental_near_dup(
        d.filter(F.col("doc_id") % 3 == 0),
        d.filter(F.col("doc_id") % 3 != 0),
    )


def _g_hits(spark, sf):
    from ironspark.graph import hits_fixedpoint

    return hits_fixedpoint(_g_edges(spark, sf, fan_out=True), iterations=4)


def _t_bpe_tokens(spark, sf):
    from ironspark.textops import _word_freqs, bpe_encode, bpe_train

    # ONE corpus word-count pass shared by train + encode (round 7):
    # the lazy localCheckpoint materializes inside bpe_train's vocab
    # collect and bpe_encode's plan then reads the cached blocks
    # instead of re-running the explode + aggregate a second time.
    d = _tpd(spark, sf)
    w = _word_freqs(d).localCheckpoint(eager=False)
    return bpe_encode(d, bpe_train(d, num_merges=6, words=w), words=w)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # NOTE on ordering (SURVEY §2.12): the driver attests at most ~50
    # entries per round while this dict holds 83 — so the FRONT of the
    # dict is the round-7 attestation window: the 33 entries whose
    # last driver row was r5 (they sat past r6's window edge; all 33
    # were re-verified green under scripts/driver_gate.py in the r6
    # review), then the 50 entries driver-attested in
    # CORRECTNESS_r06.json. Every entry therefore keeps a driver-green
    # row within the last two rounds. Every entry stays shipped and
    # green under scripts/driver_gate.py; only attestation order
    # changes round over round.
    return {
        # -- last driver row r5 (gate-green in the r6 review) → front --
        "fr_recrawl_due": _fr_recrawl_due,
        "t_decontaminate": _t_decontaminate,
        "t_gopher_quality": _t_gopher_quality,
        "t_tfidf_topk": _t_tfidf_topk,
        "a_near_dup": _a_near_dup,
        "t_dup_ngrams": _t_dup_ngrams,
        "t_vocab_topk": _t_vocab_topk,
        "t_pii_scrub": _t_pii_scrub,
        "t_dup_clusters": _t_dup_clusters,
        "t_dup_collapse": _t_dup_collapse,
        "t_stratified_sample": _t_stratified_sample,
        "t_domain_stats": _t_domain_stats,
        "t_length_quantiles": _t_length_quantiles,
        "t_line_dedup": _t_line_dedup,
        "g_degree": _g_degree,
        "g_pagerank": _g_pagerank,
        "t_rep_signals": _t_rep_signals,
        "q2_supplier_region": _q2_supplier_region,
        "q3_part_brand": _q3_part_brand,
        "f3_politeness_topk": _f3_politeness_topk,
        "d5_redirects": _d5_redirects,
        "p7_antijoin_dedup": _p7_antijoin_dedup,
        "x1_exchange_join": _x1_exchange_join,
        "q1_lineitem_agg": _q1_lineitem_agg,
        "skew2p_salted_agg": _skew2p_salted_agg,
        "t_exact_dedup": _t_exact_dedup,
        "t_minhash_sig": _t_minhash_sig,
        "t_lsh_pairs": _t_lsh_pairs,
        "t_jaccard_pairs": _t_jaccard_pairs,
        "t_simhash": _t_simhash,
        "t_langid": _t_langid,
        "t_fingerprint": _t_fingerprint,
        "a_cosine_topk": _a_cosine_topk,
        # -- r6-attested (CORRECTNESS_r06.json), rotated behind --------
        "a_knn_join": _a_knn_join,
        "a_ivf_assign": _a_ivf_assign,
        "a_ivf_topk": _a_ivf_topk,
        "mm_metadata": _mm_metadata,
        "mm_frame_sample": _mm_frame_sample,
        "mm_feature": _mm_feature,
        "f4_admission": _f4_admission,
        "m8_spider_counters": _m8_spider_counters,
        "d2_status_filter": _d2_status_filter,
        "d1_retry_union": _d1_retry_union,
        "p8_canonicalize": _p8_canonicalize,
        "m1_counter_sums": _m1_counter_sums,
        "m2_status_histogram": _m2_status_histogram,
        "m3_error_histogram": _m3_error_histogram,
        "m6_peak_gauge": _m6_peak_gauge,
        "f2_fifo_order_limit": _f2_fifo_order_limit,
        "f5_backpressure_cap": _f5_backpressure_cap,
        "f7_rate_budget": _f7_rate_budget,
        "d3_error_classify": _d3_error_classify,
        "d4_wire_size": _d4_wire_size,
        "t_token_count": _t_token_count,
        "t_quality": _t_quality,
        "mm_jpeg": _mm_jpeg,
        "t_langid_script": _t_langid_script,
        "mm_gif_bmp": _mm_gif_bmp,
        "mm_gif_frames": _mm_gif_frames,
        "t_bpe_merges": _t_bpe_merges,
        "c_url_templates": _c_url_templates,
        "g_anchor_topk": _g_anchor_topk,
        "g_components": _g_components,
        "t_bpe_tokens": _t_bpe_tokens,
        "g_hits": _g_hits,
        "t_incr_dedup": _t_incr_dedup,
        "m9_scheduler_depth": _m9_scheduler_depth,
        "i1_routing_counts": _i1_routing_counts,
        "a_ivf_index": _a_ivf_index,
        "m5_avg": _m5_avg,
        "p5_regexp_extract": _p5_regexp_extract,
        "l1_registration": _l1_registration,
        "a_embed_simhash": _a_embed_simhash,
        "w_lag_running": _w_lag_running,
        "m4_minmax": _m4_minmax,
        "arr_array_funcs": _arr_array_funcs,
        "s_set_ops": _s_set_ops,
        "g_rollup": _g_rollup,
        "dt_date_funcs": _dt_date_funcs,
        "j_json_extract": _j_json_extract,
        "mm_decode": _mm_decode,
        "mm_audio": _mm_audio,
        "f9_robots_wildcard": _f9_robots_wildcard,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_MD5NUM_DUCK = "CAST(concat('0x', substr(md5({x}), 1, 15)) AS BIGINT)"

# 10-word-chunk "lines" shared by the line-grained oracles (mirrors
# _chunked_docs)
_CHUNKED_CTE = (
    "ws0 AS (SELECT doc_id, "
    "list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS ws "
    "FROM documents), "
    "chunked AS (SELECT doc_id, array_to_string(list_transform("
    "generate_series(1, greatest(CAST(ceil(len(ws) / 10.0) AS INT), 1)), "
    "i -> array_to_string(ws[((i-1)*10+1):(i*10)], ' ')), chr(10)) AS text "
    "FROM ws0)"
)

# edge derivation shared by the g_* oracles (mirrors _g_edges)
_G_EDGES_SQL = (
    "SELECT CAST(l_orderkey % 997 AS BIGINT) AS src, "
    "CAST(l_partkey % 1009 AS BIGINT) AS dst FROM lineitem"
)


def _pagerank_oracle_sql(
    iterations: int = 5,
    scale: int = 1_000_000_000,
    d_num: int = 85,
    d_den: int = 100,
) -> str:
    """Unrolled fixed-point PageRank mirroring graph.pagerank_fixedpoint:
    identical integer recurrence, one CTE trio (dangling, contrib, rank)
    per iteration."""
    ctes = [
        f"e AS ({_G_EDGES_SQL})",
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM e UNION ALL SELECT dst FROM e))",
        "od AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg "
        "FROM e GROUP BY src)",
        f"r0 AS (SELECT node, n_nodes, "
        f"CAST({scale} AS BIGINT) // n_nodes AS base, "
        f"CAST({scale} AS BIGINT) // n_nodes AS rank FROM nodes, "
        "(SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM nodes))",
    ]
    prev = "r0"
    for i in range(1, iterations + 1):
        ctes.append(
            f"d{i} AS (SELECT CAST(COALESCE(SUM(rank), 0) AS BIGINT) AS ds "
            f"FROM {prev} LEFT JOIN od ON node = src WHERE outdeg IS NULL)"
        )
        ctes.append(
            f"c{i} AS (SELECT dst, CAST(SUM(rank // outdeg) AS BIGINT) AS in_sum "
            f"FROM e JOIN od USING (src) JOIN {prev} ON {prev}.node = e.src "
            "GROUP BY dst)"
        )
        ctes.append(
            f"r{i} AS (SELECT node, n_nodes, base, "
            f"(({d_den} - {d_num}) * base + {d_num} * (COALESCE(in_sum, 0) + "
            f"(SELECT ds FROM d{i}) // n_nodes)) // {d_den} AS rank "
            f"FROM {prev} LEFT JOIN c{i} ON node = dst)"
        )
        prev = f"r{i}"
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT node, rank AS pr_scaled FROM {prev}"
    )


def _hits_oracle_sql(iterations: int = 4, scale: int = 1_000_000) -> str:
    """Unrolled integer fixed-point HITS mirroring graph.hits_fixedpoint:
    identical recurrence (dst-keyed auth sum, max-normalize, src-keyed
    hub sum, max-normalize), one CTE sextet per iteration."""
    ctes = [
        f"e AS ({_G_EDGES_SQL})",
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM e UNION ALL SELECT dst FROM e))",
        f"h0 AS (SELECT node, CAST({scale} AS BIGINT) AS hub FROM nodes)",
    ]
    for i in range(1, iterations + 1):
        ctes.append(
            f"ar{i} AS (SELECT dst, CAST(SUM(hub) AS BIGINT) AS araw "
            f"FROM e JOIN h{i - 1} ON node = src GROUP BY dst)"
        )
        ctes.append(
            f"am{i} AS (SELECT CAST(COALESCE(MAX(araw), 1) AS BIGINT) "
            f"AS amax FROM ar{i})"
        )
        ctes.append(
            f"a{i} AS (SELECT node, CAST(COALESCE(araw, 0) * {scale} // "
            f"(SELECT amax FROM am{i}) AS BIGINT) AS auth "
            f"FROM nodes LEFT JOIN ar{i} ON node = dst)"
        )
        ctes.append(
            f"hr{i} AS (SELECT src, CAST(SUM(auth) AS BIGINT) AS hraw "
            f"FROM e JOIN a{i} ON node = dst GROUP BY src)"
        )
        ctes.append(
            f"hm{i} AS (SELECT CAST(COALESCE(MAX(hraw), 1) AS BIGINT) "
            f"AS hmax FROM hr{i})"
        )
        ctes.append(
            f"h{i} AS (SELECT node, CAST(COALESCE(hraw, 0) * {scale} // "
            f"(SELECT hmax FROM hm{i}) AS BIGINT) AS hub "
            f"FROM nodes LEFT JOIN hr{i} ON node = src)"
        )
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT node, hub AS hub_scaled, auth AS auth_scaled "
        f"FROM h{iterations} JOIN a{iterations} USING (node)"
    )


def _bpe_ctes(num_merges: int) -> list:
    """Shared CTE chain for the BPE oracles: word-frequency table,
    padded-string symbol states s0..s{num_merges}, per-round pair-count
    argmax m{i} — mirroring textops.bpe_train exactly (same padded
    double-space representation, same (count desc, lft, rgt)
    tie-break, same greedy left-to-right literal replace; replace()
    has identical non-overlapping scan semantics in both engines)."""
    ctes = [
        "w AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM "
        "(SELECT unnest(string_split_regex(lower(text), '\\s+')) AS word "
        "FROM documents) WHERE word <> '' GROUP BY word)",
        "s0 AS (SELECT ' ' || rtrim(regexp_replace(word, '(.)', '\\1  ', 'g'))"
        " || ' ' AS s, freq FROM w)",
    ]
    for i in range(num_merges):
        ctes.append(
            f"c{i} AS (SELECT string_split(trim(s), '  ') AS ws, freq "
            f"FROM s{i})"
        )
        ctes.append(
            f"q{i} AS (SELECT "
            "unnest(list_transform(range(1, len(ws)), j -> ws[j])) AS lft, "
            "unnest(list_transform(range(1, len(ws)), j -> ws[j + 1])) AS rgt, "
            f"freq FROM c{i})"
        )
        ctes.append(
            f"m{i} AS (SELECT lft, rgt, CAST(SUM(freq) AS BIGINT) AS cnt "
            f"FROM q{i} GROUP BY lft, rgt ORDER BY cnt DESC, lft, rgt LIMIT 1)"
        )
        ctes.append(
            f"s{i + 1} AS (SELECT replace(s, ' ' || lft || '  ' || rgt || ' ', "
            f"' ' || lft || rgt || ' ') AS s, freq FROM s{i}, m{i})"
        )
    return ctes


def _bpe_oracle_sql(num_merges: int = 6) -> str:
    """Unrolled BPE merge learning: one CTE quartet per round (see
    _bpe_ctes); selects the per-round argmax rows as the merge list."""
    ctes = _bpe_ctes(num_merges)
    sel = " UNION ALL ".join(
        f"SELECT {i + 1} AS merge_rank, lft, rgt, lft || rgt AS merged, "
        f"cnt AS pair_count FROM m{i}"
        for i in range(num_merges)
    )
    return "WITH " + ", ".join(ctes) + " " + sel


def _bpe_tokens_oracle_sql(num_merges: int = 6) -> str:
    """Unrolled BPE tokenizer application mirroring textops.bpe_encode:
    the final symbol state s{num_merges} exploded back into tokens and
    frequency-summed."""
    ctes = _bpe_ctes(num_merges)
    return (
        "WITH "
        + ", ".join(ctes)
        + f", tok AS (SELECT unnest(string_split(trim(s), '  ')) AS token,"
        f" freq FROM s{num_merges}) "
        "SELECT token, CAST(SUM(freq) AS BIGINT) AS n_tokens "
        "FROM tok GROUP BY token"
    )

# PII patterns (textops._PII_*) with SQL-literal quoting; identical
# byte-for-byte so the oracle exercises the same regex dialect subset
_PII_EMAIL_SQL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE_SQL = r"\+?\d(?:[ -]?\d){7,}"
_PII_IP_SQL = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_WORDS_CTE = (
    "words AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS word "
    "FROM documents), w AS (SELECT doc_id, word FROM words WHERE word <> '')"
)

# MinHash hash family (matches ironspark.textops): h0 = md5num(shingle)
# mod p, then hash_b = ((1000003 + 2b)*h0 + 12345 + b) mod p, p = 2^31-1.
_SIG_CTE = (
    "wl AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), "
    "x -> x <> '') AS ws FROM documents)"
    ", sh AS (SELECT doc_id, unnest(list_transform("
    "generate_series(1, greatest(len(ws) - 2, 0)), "
    "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingle FROM wl)"
    ", shd AS (SELECT DISTINCT doc_id, shingle FROM sh)"
    ", h0 AS (SELECT doc_id, "
    + _MD5NUM_DUCK.format(x="shingle")
    + " % 2147483647 AS h0 FROM shd)"
    ", bands AS (SELECT unnest(generate_series(0, 3)) AS band)"
    ", hashes AS (SELECT doc_id, CAST(band AS INT) AS band, "
    "((1000003 + 2*band) * h0 + 12345 + band) % 2147483647 AS h "
    "FROM h0 CROSS JOIN bands)"
    ", sig AS (SELECT doc_id, band, MIN(h) AS minhash FROM hashes GROUP BY doc_id, band)"
    ", small AS (SELECT band, minhash FROM sig GROUP BY band, minhash "
    "HAVING COUNT(*) > 1 AND COUNT(*) <= 50)"
    ", sigf AS (SELECT sig.* FROM sig JOIN small USING (band, minhash))"
)


# exact word-set Jaccard over the LSH candidate pairs (shared by the
# t_jaccard_pairs oracle and, as a CTE body, by t_dup_clusters)
_JACCARD_SQL = (
    "WITH " + _SIG_CTE + ", " + _WORDS_CTE + ", "
    "wd AS (SELECT DISTINCT doc_id, word FROM w), pairs AS ("
    "SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
    "FROM sigf a JOIN sigf b USING (band, minhash) WHERE a.doc_id < b.doc_id), "
    "inter AS (SELECT p.doc_a, p.doc_b, COUNT(*) AS n_inter FROM pairs p "
    "JOIN wd wa ON wa.doc_id = p.doc_a JOIN wd wb ON wb.doc_id = p.doc_b "
    "AND wb.word = wa.word GROUP BY p.doc_a, p.doc_b), "
    "sizes AS (SELECT doc_id, COUNT(*) AS n_words FROM wd GROUP BY doc_id) "
    "SELECT i.doc_a, i.doc_b, "
    "ROUND(n_inter / (sa.n_words + sb.n_words - n_inter), 6) AS jaccard "
    "FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a "
    "JOIN sizes sb ON sb.doc_id = i.doc_b"
)


def _srp_simhash_sql(bits: int = 12, dim: int = 16) -> str:
    """SRP-LSH signature CTE: same deterministic hyperplanes as
    ironspark.ann.embedding_simhash, inlined as literals."""
    planes = _srp_planes(bits, dim)
    terms = " + ".join(
        "(CASE WHEN ROUND(list_dot_product(embedding[1:{d}]::DOUBLE[], "
        "[{plane}]::DOUBLE[]), 6) > 0 THEN {w} ELSE 0 END)".format(
            d=dim, plane=", ".join(repr(p) for p in planes[b]), w=1 << b
        )
        for b in range(bits)
    )
    return (
        "WITH sig AS (SELECT vec_id, CAST(" + terms + " AS BIGINT) AS esimhash "
        "FROM embeddings)"
    )


def oracle_sql() -> dict[str, str]:
    simhash_bits = 16
    sim_sums = ", ".join(
        f"SUM(CASE WHEN (h & {1 << i}) <> 0 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(simhash_bits)
    )
    sim_pack = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(simhash_bits)
    )
    # generated from the one authoritative dict (ironspark.textops.
    # STOPWORDS) so the Spark vote and the DuckDB mirror cannot drift
    # when a language is added (round 6 added it/nl/pt)
    from ironspark.textops import STOPWORDS as _STOP

    langs = sorted(_STOP)
    stop_lists = {
        lg: ",".join(f"'{w}'" for w in _STOP[lg]) for lg in langs
    }
    lang_sums = ", ".join(
        f"SUM(CASE WHEN word IN ({stop_lists[lg]}) THEN 1 ELSE 0 END) AS n_{lg}"
        for lg in langs
    )
    lang_best = f"GREATEST({', '.join('n_' + lg for lg in langs)})"
    lang_guess = "CASE WHEN " + lang_best + " = 0 THEN 'und' " + " ".join(
        f"WHEN n_{lg} = {lang_best} THEN '{lg}'" for lg in langs
    ) + " ELSE 'und' END"

    # t_langid_script mirror: re-run language_id_v2's WHOLE detection
    # in DuckDB over the same snippets — the \x{....} char-class
    # spelling is shared by Java regex and RE2, and all ranges are BMP
    # so both engines' LENGTH agree. CASE orders mirror the Spark
    # when-chain tie-breaks (ascending language code).
    from ironspark.textops import SCRIPT_RANGES

    sn_values = ", ".join(
        f"({i}, '{s}')" for i, s in enumerate(_LANG_SNIPPETS)
    )
    script_counts = ", ".join(
        f"LENGTH(txt) - LENGTH(regexp_replace(txt, '{rng}', '', 'g')) AS s_{lg}"
        for lg, rng in sorted(SCRIPT_RANGES.items())
    )
    script_langs = [lg for lg in sorted(SCRIPT_RANGES) if lg != "ja"]
    script_best = f"GREATEST({', '.join('s_' + lg for lg in script_langs)})"
    script_case = " ".join(
        f"WHEN s_{lg} = sbest THEN '{lg}'" for lg in script_langs
    )
    stop_counts_v2 = ", ".join(
        "len(list_filter(string_split_regex(lower(txt), '\\s+'), "
        f"x -> x IN ({stop_lists[lg]}))) AS v_{lg}"
        for lg in langs
    )
    stop_best_v2 = f"GREATEST({', '.join('v_' + lg for lg in langs)})"
    stop_case_v2 = " ".join(
        f"WHEN v_{lg} = vbest THEN '{lg}'" for lg in langs
    )
    langid_script_sql = (
        f"WITH sn(idx, txt) AS (VALUES {sn_values}), "
        "d AS (SELECT doc_id, txt FROM documents "
        "JOIN sn ON sn.idx = doc_id % 14), "
        "m AS (SELECT doc_id, txt, "
        "LENGTH(regexp_replace(txt, '\\s', '', 'g')) AS nos, "
        f"{script_counts} FROM d), "
        f"s AS (SELECT *, {script_best} AS sbest FROM m), "
        f"v AS (SELECT *, {stop_counts_v2} FROM s), "
        f"b AS (SELECT *, {stop_best_v2} AS vbest FROM v) "
        "SELECT doc_id, "
        "CASE WHEN s_ja > 0 AND s_ja * 100 >= nos THEN 'ja' "
        "WHEN sbest > 0 AND sbest * 10 > nos * 3 THEN "
        f"(CASE {script_case} END) "
        f"WHEN vbest > 0 THEN (CASE {stop_case_v2} END) "
        "ELSE 'und' END AS lang_guess, "
        "CAST(sbest AS BIGINT) AS n_script_chars, "
        "CAST(nos AS BIGINT) AS n_nonspace "
        "FROM b"
    )

    return {
        "m1_counter_sums": (
            "SELECT COUNT(*) AS n_requests, ROUND(SUM(value), 2) AS total_value FROM events"
        ),
        "m2_status_histogram": (
            "SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type"
        ),
        "m3_error_histogram": (
            "SELECT o_orderstatus, COUNT(*) AS cnt FROM orders GROUP BY o_orderstatus"
        ),
        "m4_minmax": (
            "SELECT ROUND(MIN(value), 6) AS min_value, ROUND(MAX(value), 6) AS max_value FROM events"
        ),
        "m5_avg": "SELECT ROUND(AVG(value), 6) AS avg_value, COUNT(*) AS n FROM events",
        "m6_peak_gauge": (
            "SELECT MAX(cnt) AS peak FROM "
            "(SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id)"
        ),
        "f2_fifo_order_limit": (
            "SELECT o_orderkey, o_orderdate FROM orders "
            "ORDER BY o_orderdate, o_orderkey LIMIT 100"
        ),
        "f3_politeness_topk": (
            "SELECT source, doc_id, rk FROM (SELECT source, doc_id, "
            "ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rk "
            "FROM documents) WHERE rk <= 3"
        ),
        "f5_backpressure_cap": (
            "SELECT event_id FROM events ORDER BY ts, event_id LIMIT 64"
        ),
        "f7_rate_budget": (
            "SELECT source, COUNT(*) AS pending, "
            "CAST(FLOOR(60.0 / (1.0 + LENGTH(source) % 5)) AS BIGINT) AS budget, "
            "LEAST(COUNT(*), CAST(FLOOR(60.0 / (1.0 + LENGTH(source) % 5)) AS BIGINT)) AS scheduled "
            "FROM documents GROUP BY source"
        ),
        "d1_retry_union": (
            "SELECT o_orderkey, 0 AS attempt FROM orders WHERE o_orderstatus = 'O' "
            "UNION ALL "
            "SELECT o_orderkey, 1 AS attempt FROM orders WHERE o_orderstatus = 'F'"
        ),
        "d2_status_filter": (
            "SELECT l_orderkey, l_linenumber FROM lineitem "
            "WHERE l_quantity < 10 OR l_returnflag IN ('R')"
        ),
        "d3_error_classify": (
            "SELECT CASE WHEN value < 10 THEN 'timeout' WHEN value < 50 THEN 'connect' "
            "ELSE 'unknown' END AS error_class, COUNT(*) AS cnt FROM events "
            "GROUP BY 1"
        ),
        "d4_wire_size": (
            "SELECT CAST(SUM(LENGTH('GET') + 1 + "
            "LENGTH(concat('/order/', CAST(o_orderkey AS VARCHAR))) + 1 + 10) AS BIGINT) "
            "AS total_bytes FROM orders"
        ),
        "p5_regexp_extract": (
            "SELECT doc_id, regexp_extract(text, '\\d+') AS first_num FROM documents"
        ),
        "p7_antijoin_dedup": (
            "SELECT c_custkey, c_name FROM customer c "
            "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"
        ),
        "l1_registration": (
            "SELECT n_name, CAST(ROW_NUMBER() OVER (ORDER BY n_name) AS INT) AS spider_id "
            "FROM nation"
        ),
        "x1_exchange_join": (
            "SELECT r_name, ROUND(SUM(o_totalprice), 2) AS revenue, COUNT(*) AS n_orders "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"
        ),
        "q2_supplier_region": (
            "SELECT r_name, n_name, "
            "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue, "
            "COUNT(*) AS n_items "
            "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "GROUP BY r_name, n_name"
        ),
        "q3_part_brand": (
            "SELECT p_brand, "
            "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue, "
            "ROUND(AVG(p_retailprice), 6) AS avg_retail, "
            "COUNT(*) AS n_items "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "WHERE p_size <= 25 GROUP BY p_brand"
        ),
        "q1_lineitem_agg": (
            "SELECT l_returnflag, l_linestatus, "
            "ROUND(SUM(l_quantity), 2) AS sum_qty, "
            "ROUND(SUM(l_extendedprice), 2) AS sum_base_price, "
            "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, "
            "ROUND(AVG(l_quantity), 6) AS avg_qty, "
            "COUNT(*) AS count_order "
            "FROM lineitem WHERE l_shipdate <= TIMESTAMP '2025-06-01' "
            "GROUP BY l_returnflag, l_linestatus"
        ),
        "skew2p_salted_agg": (
            "SELECT l_returnflag, COUNT(*) AS cnt, ROUND(SUM(l_quantity), 2) AS sum_qty "
            "FROM lineitem GROUP BY l_returnflag"
        ),
        "s_set_ops": (
            "WITH a AS (SELECT o_custkey FROM orders WHERE o_totalprice > 100000), "
            "b AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O') "
            "SELECT o_custkey, 'both' AS src FROM (SELECT * FROM a INTERSECT SELECT * FROM b) "
            "UNION ALL "
            "SELECT DISTINCT o_custkey, 'big_only' AS src FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)"
        ),
        "g_rollup": (
            "SELECT COALESCE(l_returnflag, 'ALL') AS rf, "
            "COALESCE(l_linestatus, 'ALL') AS ls, "
            "COUNT(*) AS cnt, ROUND(SUM(l_quantity), 2) AS qty "
            "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"
        ),
        "dt_date_funcs": (
            "SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS y, "
            "CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS q, "
            "COUNT(*) AS cnt, "
            "CAST(MIN(date_trunc('month', o_orderdate)) AS TIMESTAMP) AS first_month "
            "FROM orders GROUP BY 1, 2"
        ),
        "j_json_extract": (
            # CAST the SUM: DuckDB SUM(BIGINT) yields HUGEINT (int128),
            # Spark sum(long) yields long — same value, different type,
            # and the driver's value-hash gate is type-sensitive.
            "SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod, "
            "COUNT(*) AS cnt, CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum "
            "FROM events GROUP BY 1"
        ),
        "arr_array_funcs": (
            "SELECT vec_id, CAST(len(embedding) AS INT) AS dim, "
            "ROUND(list_sum(embedding[1:8]::DOUBLE[]), 6) AS head_sum, "
            "ROUND(list_max(embedding::DOUBLE[]), 6) AS vmax "
            "FROM embeddings"
        ),
        "w_lag_running": (
            "SELECT user_id, event_id, "
            "LAG(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_event, "
            "ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value "
            "FROM events"
        ),
        "t_exact_dedup": (
            "SELECT MIN(doc_id) AS keep_doc_id, md5(text) AS text_hash, "
            "COUNT(*) AS dup_count FROM documents GROUP BY md5(text)"
        ),
        "t_minhash_sig": (
            "WITH " + _SIG_CTE + " SELECT doc_id, CAST(band AS INT) AS band, minhash FROM sig"
        ),
        "t_lsh_pairs": (
            "WITH " + _SIG_CTE + " SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
            "FROM sigf a JOIN sigf b USING (band, minhash) WHERE a.doc_id < b.doc_id"
        ),
        "t_jaccard_pairs": _JACCARD_SQL,
        # connected components over the verified pair graph: DuckDB
        # computes the transitive closure with a recursive CTE and
        # labels each doc with the min reachable id — exactly the
        # fixpoint the Spark min-label propagation converges to
        "t_dup_clusters": (
            "WITH RECURSIVE jac AS (" + _JACCARD_SQL + "), "
            "jp AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.5), "
            "ed AS (SELECT doc_a AS u, doc_b AS v FROM jp "
            "UNION SELECT doc_b, doc_a FROM jp), "
            "reach(u, v) AS (SELECT u, v FROM ed "
            "UNION SELECT r.u, e.v FROM reach r JOIN ed e ON r.v = e.u) "
            "SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id "
            "FROM reach GROUP BY u"
        ),
        # dedup collapse: survivors = unclustered docs + each cluster's
        # min-doc_id representative, with the cluster size attached
        "t_dup_collapse": (
            "WITH RECURSIVE jac AS (" + _JACCARD_SQL + "), "
            "jp AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.5), "
            "ed AS (SELECT doc_a AS u, doc_b AS v FROM jp "
            "UNION SELECT doc_b, doc_a FROM jp), "
            "reach(u, v) AS (SELECT u, v FROM ed "
            "UNION SELECT r.u, e.v FROM reach r JOIN ed e ON r.v = e.u), "
            "lab AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id "
            "FROM reach GROUP BY u), "
            "sizes AS (SELECT cluster_id, COUNT(*) AS n FROM lab "
            "GROUP BY cluster_id) "
            "SELECT d.doc_id, CAST(COALESCE(s.n, 1) AS BIGINT) AS n_members "
            "FROM documents d "
            "LEFT JOIN lab l ON l.doc_id = d.doc_id "
            "LEFT JOIN sizes s ON s.cluster_id = d.doc_id "
            "WHERE l.cluster_id IS NULL OR l.cluster_id = d.doc_id"
        ),
        "t_simhash": (
            "WITH " + _WORDS_CTE + ", h AS (SELECT doc_id, "
            + _MD5NUM_DUCK.format(x="word")
            + " AS h FROM w), s AS (SELECT doc_id, " + sim_sums + " FROM h GROUP BY doc_id) "
            "SELECT doc_id, CAST(" + sim_pack + " AS BIGINT) AS simhash FROM s"
        ),
        "t_langid": (
            "WITH " + _WORDS_CTE + ", s AS (SELECT doc_id, " + lang_sums
            + " FROM w GROUP BY doc_id) SELECT doc_id, " + lang_guess
            + " AS lang_guess FROM s"
        ),
        "t_token_count": (
            "SELECT doc_id, CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) "
            "AS n_tokens FROM documents"
        ),
        "t_quality": (
            "SELECT doc_id, "
            "CAST(LENGTH(text) AS BIGINT) AS n_chars, "
            "CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens, "
            "CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS BIGINT) AS n_punct, "
            "ROUND((LENGTH(text) - LENGTH(regexp_replace(text, '[^\\w\\s]', '', 'g'))) "
            "/ GREATEST(LENGTH(text), 1), 6) AS punct_ratio, "
            "ROUND(len(list_filter(string_split_regex(lower(text), '\\s+'), "
            "x -> x IN ('the','and','of','to','in','is','that','it','for','was'))) "
            "/ GREATEST(len(string_split_regex(trim(text), '\\s+')), 1), 6) AS stop_ratio "
            "FROM documents"
        ),
        "t_fingerprint": (
            "SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp_md5, "
            + _MD5NUM_DUCK.format(x="trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))")
            + " AS fp_num FROM documents"
        ),
        "t_dup_ngrams": (
            "WITH wl AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), "
            "x -> x <> '') AS ws FROM documents), "
            "sh AS (SELECT doc_id, unnest(list_transform("
            "generate_series(1, greatest(len(ws) - 4, 0)), "
            "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4]"
            ")) AS shingle FROM wl), "
            "a AS (SELECT doc_id, COUNT(*) AS n_ngrams, COUNT(DISTINCT shingle) AS n_distinct "
            "FROM sh GROUP BY doc_id) "
            "SELECT d.doc_id, CAST(COALESCE(a.n_ngrams, 0) AS BIGINT) AS n_ngrams, "
            "CAST(COALESCE(a.n_distinct, 0) AS BIGINT) AS n_distinct, "
            "COALESCE(ROUND(1.0 - a.n_distinct * 1.0 / a.n_ngrams, 6), 0.0) AS dup_ratio "
            "FROM documents d LEFT JOIN a USING (doc_id)"
        ),
        "t_vocab_topk": (
            "WITH " + _WORDS_CTE + " SELECT word, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM w GROUP BY word ORDER BY n DESC, word LIMIT 50"
        ),
        "t_stratified_sample": (
            "WITH keyed AS (SELECT doc_id, lang, source, "
            + _MD5NUM_DUCK.format(
                x="concat_ws('|', CAST(doc_id AS VARCHAR), 'split')"
            )
            + " % 1000 AS sample_bucket, "
            + _MD5NUM_DUCK.format(
                x="concat_ws('|', CAST(doc_id AS VARCHAR), 'split2')"
            )
            + " % 1000 AS split_bucket, "
            "CASE lang WHEN 'en' THEN 900 WHEN 'de' THEN 500 "
            "WHEN 'fr' THEN 500 WHEN 'es' THEN 250 ELSE 100 END AS keep_rate "
            "FROM documents) "
            "SELECT doc_id, lang, source, "
            "CAST(sample_bucket AS INT) AS sample_bucket, "
            "CASE WHEN split_bucket < 980 THEN 'train' "
            "WHEN split_bucket < 990 THEN 'val' ELSE 'test' END AS split "
            "FROM keyed WHERE sample_bucket < keep_rate"
        ),
        "t_length_quantiles": (
            "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "ROUND(quantile_cont(n_chars, 0.5), 6) AS p50, "
            "ROUND(quantile_cont(n_chars, 0.9), 6) AS p90, "
            "ROUND(quantile_cont(n_chars, 0.99), 6) AS p99 "
            "FROM documents GROUP BY lang"
        ),
        "g_degree": (
            f"WITH e AS ({_G_EDGES_SQL}), "
            "nodes AS (SELECT DISTINCT node FROM "
            "(SELECT src AS node FROM e UNION ALL SELECT dst FROM e)), "
            "o AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS out_edges, "
            "CAST(COUNT(DISTINCT dst) AS BIGINT) AS out_nbrs FROM e GROUP BY src), "
            "i AS (SELECT dst AS node, CAST(COUNT(*) AS BIGINT) AS in_edges, "
            "CAST(COUNT(DISTINCT src) AS BIGINT) AS in_nbrs FROM e GROUP BY dst) "
            "SELECT n.node, COALESCE(o.out_edges, 0) AS out_edges, "
            "COALESCE(i.in_edges, 0) AS in_edges, "
            "COALESCE(o.out_nbrs, 0) AS out_nbrs, "
            "COALESCE(i.in_nbrs, 0) AS in_nbrs "
            "FROM nodes n LEFT JOIN o USING (node) LEFT JOIN i USING (node)"
        ),
        "g_pagerank": _pagerank_oracle_sql(iterations=5),
        "t_bpe_merges": _bpe_oracle_sql(num_merges=6),
        "t_bpe_tokens": _bpe_tokens_oracle_sql(num_merges=6),
        "g_hits": _hits_oracle_sql(iterations=4),
        "t_incr_dedup": (
            # cross-snapshot dedup: signatures are per-doc, so sig over
            # ALL docs then split mirrors signing each side separately;
            # corpus-side bucket guard (<= 50, no lower bound — a
            # 1-doc corpus bucket is a valid probe target), candidate
            # equi-join, Jaccard verify, best-match window
            "WITH " + _SIG_CTE + ", " + _WORDS_CTE + ", "
            "sign AS (SELECT * FROM sig WHERE doc_id % 3 = 0), "
            "sigo AS (SELECT * FROM sig WHERE doc_id % 3 <> 0), "
            "smallo AS (SELECT band, minhash FROM sigo "
            "GROUP BY band, minhash HAVING COUNT(*) <= 50), "
            "sigof AS (SELECT sigo.* FROM sigo JOIN smallo USING (band, minhash)), "
            "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
            "FROM sign a JOIN sigof b USING (band, minhash)), "
            "wd AS (SELECT DISTINCT doc_id, word FROM w), "
            "inter AS (SELECT p.doc_a, p.doc_b, COUNT(*) AS n_inter FROM cand p "
            "JOIN wd wa ON wa.doc_id = p.doc_a JOIN wd wb ON wb.doc_id = p.doc_b "
            "AND wb.word = wa.word GROUP BY p.doc_a, p.doc_b), "
            "sizes AS (SELECT doc_id, COUNT(*) AS n_words FROM wd GROUP BY doc_id), "
            "ver AS (SELECT i.doc_a, i.doc_b, "
            "ROUND(n_inter / (sa.n_words + sb.n_words - n_inter), 6) AS jaccard "
            "FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a "
            "JOIN sizes sb ON sb.doc_id = i.doc_b), "
            "best AS (SELECT doc_a AS doc_id, doc_b AS dup_of, jaccard, "
            "ROW_NUMBER() OVER (PARTITION BY doc_a ORDER BY jaccard DESC, doc_b) "
            "AS rn FROM ver WHERE jaccard >= 0.5) "
            "SELECT doc_id, dup_of, jaccard FROM best WHERE rn = 1"
        ),
        "g_components": (
            # min-node-reachable via recursive transitive closure over
            # the symmetric edge view — component sizes are planted
            # small (4/8 nodes), so the closure stays tiny; the Spark
            # side runs large-star/small-star, a genuinely different
            # algorithm landing the same labels
            "WITH RECURSIVE "
            "e0 AS (SELECT doc_id AS src, doc_id - doc_id % 4 AS dst "
            "FROM documents UNION ALL "
            "SELECT doc_id, doc_id + 5 FROM documents WHERE doc_id % 20 = 0), "
            "e AS (SELECT src AS u, dst AS v FROM e0 WHERE src <> dst "
            "UNION SELECT dst, src FROM e0 WHERE src <> dst), "
            "n AS (SELECT DISTINCT node FROM (SELECT src AS node FROM e0 "
            "UNION ALL SELECT dst FROM e0)), "
            "r AS (SELECT node, node AS reach FROM n "
            "UNION SELECT r.node, e.v FROM r JOIN e ON e.u = r.reach) "
            "SELECT node, CAST(MIN(reach) AS BIGINT) AS component "
            "FROM r GROUP BY node"
        ),
        "c_url_templates": (
            "WITH u AS (SELECT CASE WHEN user_id % 50 = 0 "
            "THEN 'https://h0.example.com/s/' || md5(CAST(event_id AS VARCHAR)) "
            "ELSE 'https://h' || CAST(user_id % 50 AS VARCHAR) || '.example.com/' "
            "|| lower(event_type) || '/item' || CAST(event_id % 1000 AS VARCHAR) "
            "END AS url FROM events), "
            "t AS (SELECT regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS host, "
            "regexp_replace(regexp_replace("
            "regexp_extract(url, '^[a-z][a-z0-9+.-]*://[^/?#]*(.*)$', 1), "
            "'[0-9a-f]{8,}', '{H}', 'g'), '[0-9]+', '{D}', 'g') AS template FROM u), "
            "g AS (SELECT host, template, CAST(COUNT(*) AS BIGINT) AS n_urls "
            "FROM t WHERE host <> '' GROUP BY host, template), "
            "h AS (SELECT host, CAST(SUM(n_urls) AS BIGINT) AS host_urls "
            "FROM g GROUP BY host) "
            "SELECT host, template, n_urls, host_urls, "
            "ROUND(n_urls / host_urls, 6) AS url_share, "
            "(template LIKE '%{%' AND n_urls >= 10 AND n_urls / host_urls >= 0.5) "
            "AS is_trap FROM g JOIN h USING (host)"
        ),
        "g_anchor_topk": (
            "WITH l AS (SELECT doc_id AS src, CAST("
            + _MD5NUM_DUCK.format(x="CAST(doc_id AS VARCHAR)")
            + " % 97 AS BIGINT) AS dst, substr(text, 1, 80) AS anchor "
            "FROM documents), "
            "w AS (SELECT dst, unnest(string_split_regex(lower(anchor), '\\s+')) "
            "AS word FROM l), "
            "wf AS (SELECT dst, word, CAST(COUNT(*) AS BIGINT) AS n_word "
            "FROM w WHERE word <> '' GROUP BY dst, word), "
            "r AS (SELECT dst, word, n_word, CAST(ROW_NUMBER() OVER ("
            "PARTITION BY dst ORDER BY n_word DESC, word) AS INT) AS rn FROM wf), "
            "i AS (SELECT dst, CAST(COUNT(*) AS BIGINT) AS n_links FROM l "
            "GROUP BY dst) "
            "SELECT dst, word, n_word, rn, n_links FROM r JOIN i USING (dst) "
            "WHERE rn <= 3"
        ),
        "t_line_dedup": (
            f"WITH {_CHUNKED_CTE}, "
            "lines AS (SELECT doc_id, unnest(generate_series(1, len(l))) AS line_idx, "
            "unnest(l) AS line FROM (SELECT doc_id, string_split(text, chr(10)) AS l "
            "FROM chunked)), "
            "dup AS (SELECT md5(line) AS h FROM lines GROUP BY 1 "
            "HAVING COUNT(DISTINCT doc_id) >= 3), "
            "kept AS (SELECT * FROM lines WHERE md5(line) NOT IN (SELECT h FROM dup)), "
            "reb AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept, "
            "string_agg(line, chr(10) ORDER BY line_idx) AS clean_text "
            "FROM kept GROUP BY doc_id) "
            "SELECT c.doc_id, CAST(len(string_split(c.text, chr(10))) AS BIGINT) AS n_lines, "
            "COALESCE(r.n_kept, 0) AS n_kept, COALESCE(r.clean_text, '') AS clean_text "
            "FROM chunked c LEFT JOIN reb r USING (doc_id)"
        ),
        "t_rep_signals": (
            f"WITH {_CHUNKED_CTE}, "
            "lines AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line "
            "FROM chunked), "
            "pl AS (SELECT doc_id, line, CAST(COUNT(*) AS BIGINT) AS cnt "
            "FROM lines GROUP BY doc_id, line), "
            "ls AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_lines, "
            "CAST(SUM(cnt) - COUNT(*) AS BIGINT) AS n_dup_lines, "
            "CAST(SUM((cnt - 1) * length(line)) AS BIGINT) AS dup_line_chars, "
            "CAST(SUM(cnt * length(line)) AS BIGINT) AS line_chars "
            "FROM pl GROUP BY doc_id), "
            "wl AS (SELECT doc_id, "
            "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS ws "
            "FROM chunked), "
            "sh AS (SELECT doc_id, unnest(list_transform("
            "generate_series(1, greatest(len(ws) - 1, 0)), "
            "i -> ws[i] || ' ' || ws[i+1])) AS shingle FROM wl), "
            "pg AS (SELECT doc_id, shingle, CAST(COUNT(*) AS BIGINT) AS cnt "
            "FROM sh GROUP BY doc_id, shingle), "
            "tg AS (SELECT doc_id, CAST(MAX(cnt * length(shingle)) AS BIGINT) "
            "AS top_gram_chars FROM pg GROUP BY doc_id) "
            "SELECT c.doc_id, ls.n_lines, ls.n_dup_lines, "
            "ROUND(ls.n_dup_lines / ls.n_lines, 6) AS dup_line_frac, "
            "ROUND(ls.dup_line_chars / greatest(ls.line_chars, 1), 6) "
            "AS dup_line_char_frac, "
            "ROUND(COALESCE(tg.top_gram_chars, 0) / greatest(length(c.text), 1), 6) "
            "AS top_ngram_char_frac "
            "FROM chunked c LEFT JOIN ls USING (doc_id) "
            "LEFT JOIN tg USING (doc_id)"
        ),
        "t_domain_stats": (
            "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct, "
            "CAST(SUM(n_chars) AS BIGINT) AS total_chars, "
            "CAST(MIN(n_chars) AS BIGINT) AS min_chars, "
            "CAST(MAX(n_chars) AS BIGINT) AS max_chars, "
            "CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs, "
            "ROUND(1.0 - CAST(COUNT(DISTINCT md5(text)) AS BIGINT) "
            "/ CAST(COUNT(*) AS DOUBLE), 6) AS dup_ratio "
            "FROM documents GROUP BY source"
        ),
        "t_pii_scrub": (
            "SELECT doc_id, "
            "CAST(len(regexp_extract_all(text, '" + _PII_EMAIL_SQL + "')) AS BIGINT) AS n_emails, "
            "CAST(len(regexp_extract_all(text, '" + _PII_PHONE_SQL + "')) AS BIGINT) AS n_phones, "
            "CAST(len(regexp_extract_all(text, '" + _PII_IP_SQL + "')) AS BIGINT) AS n_ips, "
            "regexp_replace(regexp_replace(regexp_replace(text, "
            "'" + _PII_EMAIL_SQL + "', '<EMAIL>', 'g'), "
            "'" + _PII_PHONE_SQL + "', '<PHONE>', 'g'), "
            "'" + _PII_IP_SQL + "', '<IP>', 'g') AS clean_text "
            "FROM documents"
        ),
        "t_decontaminate": (
            "WITH wl AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), "
            "x -> x <> '') AS ws FROM documents), "
            "sh AS (SELECT doc_id, unnest(list_transform("
            "generate_series(1, greatest(len(ws) - 7, 0)), "
            "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' "
            "|| ws[i+4] || ' ' || ws[i+5] || ' ' || ws[i+6] || ' ' || ws[i+7]"
            ")) AS shingle FROM wl), "
            "bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0), "
            "hits AS (SELECT s.doc_id, COUNT(DISTINCT s.shingle) AS n_hits "
            "FROM sh s JOIN bench b USING (shingle) GROUP BY s.doc_id) "
            "SELECT d.doc_id, CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits, "
            "COALESCE(h.n_hits, 0) > 0 AS contaminated "
            "FROM documents d LEFT JOIN hits h USING (doc_id)"
        ),
        "t_gopher_quality": (
            "WITH wl AS (SELECT doc_id, text, list_filter(string_split_regex(lower(text), '\\s+'), "
            "x -> x <> '') AS ws FROM documents), "
            "m AS (SELECT doc_id, len(ws) AS n_words, "
            "LENGTH(regexp_replace(text, '\\s+', '', 'g')) AS n_nonws, "
            "len(list_filter(ws, x -> regexp_matches(x, '[a-z]'))) AS n_alpha, "
            "len(list_filter(['the','and','of','to','in','is','that','it','for','was'], "
            "s -> list_contains(ws, s))) AS n_stop FROM wl) "
            "SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, "
            "ROUND(n_nonws * 1.0 / GREATEST(n_words, 1), 6) AS mean_word_len, "
            "ROUND(n_alpha * 1.0 / GREATEST(n_words, 1), 6) AS alpha_ratio, "
            "CAST(n_stop AS BIGINT) AS n_stop_hits, "
            "((n_words BETWEEN 20 AND 100000) "
            "AND (n_nonws * 1.0 / GREATEST(n_words, 1) >= 3.0) "
            "AND (n_nonws * 1.0 / GREATEST(n_words, 1) <= 10.0) "
            "AND (n_alpha * 1.0 / GREATEST(n_words, 1) >= 0.8) "
            "AND (n_stop >= 1)) AS keep FROM m"
        ),
        "t_tfidf_topk": (
            "WITH " + _WORDS_CTE + ", "
            "tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM w GROUP BY doc_id, word), "
            "df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word), "
            "n AS (SELECT COUNT(*) AS n_docs FROM documents), "
            "s AS (SELECT doc_id, word, tf, "
            "tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0) AS tfidf "
            "FROM tf JOIN df USING (word) CROSS JOIN n), "
            "r AS (SELECT doc_id, word, tf, tfidf, row_number() OVER ("
            "PARTITION BY doc_id ORDER BY tfidf DESC, word) AS rn FROM s) "
            "SELECT doc_id, word, CAST(tf AS BIGINT) AS tf, "
            "ROUND(tfidf, 6) AS tfidf, CAST(rn AS INT) AS rn FROM r WHERE rn <= 3"
        ),
        "a_cosine_topk": (
            "SELECT vec_id, ROUND(list_cosine_similarity(embedding::DOUBLE[], "
            "(SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 6) AS sim "
            "FROM embeddings ORDER BY sim DESC, vec_id LIMIT 10"
        ),
        "a_knn_join": (
            "WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qvec "
            "FROM embeddings WHERE vec_id < 3), "
            "scored AS (SELECT q.query_id, e.vec_id, "
            "ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qvec), 6) AS sim "
            "FROM embeddings e CROSS JOIN q) "
            "SELECT query_id, vec_id, sim, CAST(rank AS INT) AS rank FROM ("
            "SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank "
            "FROM scored) WHERE rank <= 5"
        ),
        "a_ivf_assign": (
            "WITH c AS (SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cvec "
            "FROM embeddings WHERE vec_id < 8), "
            "scored AS (SELECT e.vec_id, c.centroid_id, "
            "ROUND(list_cosine_similarity(e.embedding::DOUBLE[], c.cvec), 6) AS csim "
            "FROM embeddings e CROSS JOIN c) "
            "SELECT vec_id, centroid_id, csim AS sim_to_centroid FROM ("
            "SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, centroid_id) AS rk "
            "FROM scored) WHERE rk = 1"
        ),
        "a_ivf_topk": (
            "WITH c AS (SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cvec "
            "FROM embeddings WHERE vec_id < 8), "
            "assign AS (SELECT vec_id, centroid_id FROM ("
            "SELECT e.vec_id, c.centroid_id, "
            "ROUND(list_cosine_similarity(e.embedding::DOUBLE[], c.cvec), 6) AS csim, "
            "ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY "
            "ROUND(list_cosine_similarity(e.embedding::DOUBLE[], c.cvec), 6) DESC, c.centroid_id) AS rk "
            "FROM embeddings e CROSS JOIN c) WHERE rk = 1), "
            "probe AS (SELECT centroid_id FROM ("
            "SELECT centroid_id, ROUND(list_cosine_similarity(cvec, "
            "(SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 6) AS qsim "
            "FROM c) ORDER BY qsim DESC, centroid_id LIMIT 2) "
            "SELECT e.vec_id, ROUND(list_cosine_similarity(e.embedding::DOUBLE[], "
            "(SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 6) AS sim "
            "FROM embeddings e JOIN assign a ON a.vec_id = e.vec_id "
            "JOIN probe p ON p.centroid_id = a.centroid_id "
            "ORDER BY sim DESC, e.vec_id LIMIT 10"
        ),
        "mm_metadata": (
            "SELECT doc_id AS media_id, 'image' AS kind, "
            "CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, "
            "md5(text) AS digest FROM documents"
        ),
        # f9: the robots rule sets are FIXED literals, so the RFC 9309
        # most-specific-match decision (wildcards compiled to regex on
        # the Spark side) expands to per-host CASE logic in DuckDB's
        # regex dialect — a cross-engine check of the wildcard
        # translation itself.
        "f9_robots_wildcard": (
            "WITH p AS (SELECT doc_id, 'h' || (doc_id % 3) || '.test' AS host, "
            "'/' || (['cc/pub/p','cc/p','docs/p','p'])[CAST(doc_id % 4 AS INT) + 1] "
            "|| doc_id "
            "|| CASE WHEN doc_id % 5 = 0 THEN '.pdf' ELSE '' END "
            "|| CASE WHEN doc_id % 7 = 0 THEN '?sessionid=' || doc_id ELSE '' END "
            "AS pq FROM documents) "
            "SELECT doc_id, host, 'http://' || host || pq AS url FROM p "
            "WHERE NOT ("
            "(host = 'h0.test' AND (regexp_matches(pq, '^/.*\\?sessionid=') "
            "OR regexp_matches(pq, '^/.*\\.pdf$'))) "
            "OR (host = 'h1.test' AND starts_with(pq, '/cc') "
            "AND NOT starts_with(pq, '/cc/pub')) "
            "OR (host = 'h2.test' AND regexp_matches(pq, '^/docs/.*\\.pdf$')))"
        ),
        "fr_recrawl_due": (
            "WITH h AS (SELECT 'http://h' || (user_id % 20) || '.test/u' || "
            "user_id || '/' || event_type AS url, "
            "'h' || (user_id % 20) || '.test' AS host, ts FROM events), "
            "l AS (SELECT url, host, max(ts) AS last_fetch, "
            "CAST(count(*) AS BIGINT) AS n_fetches FROM h GROUP BY url, host), "
            "d AS (SELECT *, epoch(TIMESTAMP '2024-01-31 00:00:00') - "
            "epoch(last_fetch) AS age_s FROM l "
            "WHERE epoch(TIMESTAMP '2024-01-31 00:00:00') - epoch(last_fetch) "
            ">= 259200.0), "
            "r AS (SELECT *, row_number() OVER (PARTITION BY host "
            "ORDER BY age_s DESC, url) AS rk FROM d) "
            "SELECT url, host, last_fetch, n_fetches, "
            "ROUND(age_s, 6) AS age_seconds FROM r WHERE rk <= 5"
        ),
        # mm_decode: the Spark side encodes REAL PNGs and decodes them
        # back; the oracle recomputes the expected pixel bytes directly
        # (a codec that mangles any filter type hash-mismatches here).
        "mm_decode": (
            "SELECT doc_id AS media_id, CAST(2 AS INT) AS width, "
            "CAST(2 AS INT) AS height, CAST(3 AS INT) AS channels, "
            "(SELECT string_agg(printf('%02x', (doc_id*(j+1))%256), '' ORDER BY j) "
            "FROM generate_series(0,11) t(j)) AS pixel_hex "
            "FROM documents"
        ),
        # t_langid_script: full cross-engine re-run of the script-aware
        # detection over the fixed multilingual snippet table.
        "t_langid_script": langid_script_sql,
        # mm_gif_bmp: lossless GIF-LZW + BMP round trips; the oracle
        # recomputes pixel bytes arithmetically (gif byte at position
        # j: row r=j//6, col cc=(j%6)//3, channel c=j%3, palette slot
        # k=(doc_id+2r+cc)%4, value doc_id*(3k+c+1)%256).
        "mm_gif_bmp": (
            "SELECT doc_id AS media_id, CAST(2 AS INT) AS width, "
            "CAST(2 AS INT) AS height, "
            "(SELECT string_agg(printf('%02x', "
            "(doc_id * (((doc_id + 2*(j//6) + ((j%6)//3)) % 4) * 3 "
            "+ j%3 + 1)) % 256), '' ORDER BY j) "
            "FROM generate_series(0,11) t(j)) AS gif_hex, "
            "(SELECT string_agg(printf('%02x', (doc_id*(j+1)) % 256), "
            "'' ORDER BY j) FROM generate_series(0,11) t(j)) AS bmp_hex "
            "FROM documents"
        ),
        # mm_gif_frames: animated-GIF compositing; the oracle unrolls
        # the transparency recurrence exactly — per pixel j (r=j//6,
        # cc=(j%6)//3, c=j%3) frame-f raw index i_f=(doc_id+f+2r+cc)%4,
        # composited slot k_0=i_0, k_f = i_f unless i_f==3 (the
        # transparent index) in which case k_{f-1} — then hexes the
        # palette bytes for the sampled frames 0 and 2.
        "mm_gif_frames": (
            "WITH fr AS (SELECT unnest([0, 2]) AS fi), "
            "px AS (SELECT d.doc_id, fr.fi, t.j, "
            "(t.j // 6) AS r, ((t.j % 6) // 3) AS cc, (t.j % 3) AS c "
            "FROM documents d, fr, generate_series(0, 11) t(j)), "
            "i AS (SELECT *, "
            "(doc_id + 0 + 2*r + cc) % 4 AS i0, "
            "(doc_id + 1 + 2*r + cc) % 4 AS i1, "
            "(doc_id + 2 + 2*r + cc) % 4 AS i2 FROM px), "
            "k1 AS (SELECT *, "
            "CASE WHEN i1 = 3 THEN i0 ELSE i1 END AS c1 FROM i), "
            "k2 AS (SELECT *, "
            "CASE WHEN i2 = 3 THEN c1 ELSE i2 END AS c2 FROM k1) "
            "SELECT doc_id AS media_id, CAST(fi AS INT) AS frame_idx, "
            "CAST((doc_id + fi) % 100 AS INT) AS delay_cs, "
            "CAST(2 AS INT) AS width, CAST(2 AS INT) AS height, "
            "string_agg(printf('%02x', (doc_id * (3 * "
            "(CASE WHEN fi = 0 THEN i0 ELSE c2 END) + c + 1)) % 256), "
            "'' ORDER BY j) AS px_hex "
            "FROM k2 GROUP BY doc_id, fi"
        ),
        # mm_jpeg: the Spark side encodes REAL baseline JPEGs of flat
        # colors and decodes them back; the oracle recomputes the
        # closed-form arithmetic the flat round trip collapses to
        # (RGB->YCbCr, quantize/dequantize DC, YCbCr->RGB, every step
        # under the codec's FLOOR(x+0.5+1e-9) rounding convention).
        "mm_jpeg": (
            "WITH p AS (SELECT doc_id, "
            "CAST(doc_id % 256 AS DOUBLE) AS rr, "
            "CAST((doc_id * 7) % 256 AS DOUBLE) AS gg, "
            "CAST((doc_id * 13) % 256 AS DOUBLE) AS bb, "
            "35 + doc_id % 60 AS q FROM documents), "
            "s AS (SELECT *, CASE WHEN q < 50 THEN 5000 // q "
            "ELSE 200 - 2 * q END AS sfac FROM p), "
            "t AS (SELECT *, "
            "LEAST(255, GREATEST(1, (16 * sfac + 50) // 100)) AS qlum, "
            "LEAST(255, GREATEST(1, (17 * sfac + 50) // 100)) AS qchr "
            "FROM s), "
            "y AS (SELECT *, "
            "LEAST(255.0, GREATEST(0.0, FLOOR(0.299::DOUBLE * rr "
            "+ 0.587::DOUBLE * gg + 0.114::DOUBLE * bb + 0.5 + 1e-9))) AS yy, "
            "LEAST(255.0, GREATEST(0.0, FLOOR(-0.168736::DOUBLE * rr "
            "- 0.331264::DOUBLE * gg + 0.5::DOUBLE * bb + 128.0 + 0.5 + 1e-9))) AS cb, "
            "LEAST(255.0, GREATEST(0.0, FLOOR(0.5::DOUBLE * rr "
            "- 0.418688::DOUBLE * gg - 0.081312::DOUBLE * bb + 128.0 + 0.5 + 1e-9))) AS cr "
            "FROM t), "
            "o AS (SELECT *, "
            "LEAST(255.0, GREATEST(0.0, FLOOR(FLOOR(8.0 * (yy - 128.0) / qlum "
            "+ 0.5 + 1e-9) * qlum / 8.0 + 128.0 + 0.5 + 1e-9))) AS y2, "
            "LEAST(255.0, GREATEST(0.0, FLOOR(FLOOR(8.0 * (cb - 128.0) / qchr "
            "+ 0.5 + 1e-9) * qchr / 8.0 + 128.0 + 0.5 + 1e-9))) AS cb2, "
            "LEAST(255.0, GREATEST(0.0, FLOOR(FLOOR(8.0 * (cr - 128.0) / qchr "
            "+ 0.5 + 1e-9) * qchr / 8.0 + 128.0 + 0.5 + 1e-9))) AS cr2 "
            "FROM y) "
            "SELECT doc_id AS media_id, "
            "CAST(8 + doc_id % 7 AS INT) AS width, "
            "CAST(8 + doc_id % 9 AS INT) AS height, "
            "CAST(3 AS INT) AS channels, CAST(1 AS INT) AS n_colors, "
            "CAST(LEAST(255.0, GREATEST(0.0, FLOOR(y2 "
            "+ 1.402::DOUBLE * (cr2 - 128.0) + 0.5 + 1e-9))) AS INT) AS px_r, "
            "CAST(LEAST(255.0, GREATEST(0.0, FLOOR(y2 "
            "- 0.344136::DOUBLE * (cb2 - 128.0) "
            "- 0.714136::DOUBLE * (cr2 - 128.0) + 0.5 + 1e-9))) AS INT) AS px_g, "
            "CAST(LEAST(255.0, GREATEST(0.0, FLOOR(y2 "
            "+ 1.772::DOUBLE * (cb2 - 128.0) + 0.5 + 1e-9))) AS INT) AS px_b "
            "FROM o"
        ),
        # mm_audio: the Spark side serializes REAL WAV bytes and decodes
        # them back; the oracle recomputes the synthetic waveform's exact
        # integer stats arithmetically
        "mm_audio": (
            "WITH p AS (SELECT doc_id, CAST(50 + doc_id % 13 AS BIGINT) AS n, "
            "CAST(8000 + (doc_id % 3) * 4000 AS INT) AS rate FROM documents), "
            "s AS (SELECT doc_id, unnest(list_transform(generate_series(1, n), "
            "i -> CAST((doc_id * i) % 65536 - 32768 AS BIGINT))) AS v FROM p), "
            "a AS (SELECT doc_id, CAST(SUM(v * v) AS BIGINT) AS sum_sq, "
            "CAST(MAX(ABS(v)) AS INT) AS peak FROM s GROUP BY doc_id) "
            "SELECT p.doc_id AS media_id, p.rate AS sample_rate, "
            "CAST(1 AS INT) AS channels, CAST(16 AS INT) AS bits, "
            "p.n AS n_frames, (p.n * 1000) // p.rate AS duration_ms, "
            "a.sum_sq, a.peak FROM p JOIN a USING (doc_id)"
        ),
        "mm_frame_sample": (
            "WITH m AS (SELECT doc_id AS media_id, octet_length(encode(text)) AS nb "
            "FROM documents) "
            "SELECT media_id, CAST(f AS INT) AS frame_idx, "
            "CAST(LEAST(100, nb - f * 100) AS BIGINT) AS frame_bytes "
            "FROM m, LATERAL unnest(generate_series(0, CAST(CEIL(nb / 100.0) AS INT) - 1)) AS t(f)"
        ),
        # p8: the query template is a FIXED URL shape, so the pandas-UDF
        # canonicalization (scheme/host lowercase, :80 drop, dot-segment
        # removal, query sort, fragment strip) is expressible as string
        # arithmetic for exactly that shape.
        "p8_canonicalize": (
            "SELECT doc_id, concat('http://', lower(source), '.example.com/A/', "
            "CAST(doc_id AS VARCHAR), '?a=2&z=1') AS url_canon FROM documents"
        ),
        # mm_feature: the stub features are md5-digest bytes / 255.0, so
        # feature[i] = byte i of md5(payload) = hex chars (2i+1, 2i+2).
        "mm_feature": (
            "SELECT doc_id AS media_id, "
            "ROUND(CAST(concat('0x', substr(md5(text), 1, 2)) AS INT) / 255.0, 6) AS f0, "
            "ROUND(CAST(concat('0x', substr(md5(text), 15, 2)) AS INT) / 255.0, 6) AS f7 "
            "FROM documents"
        ),
        "f4_admission": (
            "WITH g AS (SELECT user_id % 8 AS grp, COUNT(*) AS pending "
            "FROM events GROUP BY 1) "
            "SELECT grp, pending, COALESCE(SUM(pending) OVER (ORDER BY grp "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) <= 5000 "
            "AS admitted FROM g"
        ),
        "d5_redirects": (
            "SELECT doc_id, "
            "CASE WHEN doc_id % 3 = 2 THEN concat('http://', source, '.ex.com/m/', CAST(doc_id AS VARCHAR)) "
            "ELSE concat('http://', source, '.ex.com/d/', CAST(doc_id AS VARCHAR)) END AS url_canon, "
            "CAST(CASE WHEN doc_id % 3 = 2 THEN 404 ELSE 200 END AS INT) AS resp_status, "
            "CAST(CASE WHEN doc_id % 3 = 2 THEN 0 ELSE octet_length(encode(text)) END AS BIGINT) AS bytes_resp "
            "FROM documents"
        ),
        "m8_spider_counters": (
            "WITH sp AS (SELECT unnest(generate_series(0, 3)) AS spider_id), "
            "p AS (SELECT doc_id % 4 AS spider_id, COUNT(*) AS pending "
            "FROM documents WHERE n_chars > 290 GROUP BY 1) "
            "SELECT CAST(sp.spider_id AS BIGINT) AS spider_id, "
            "CAST(COALESCE(p.pending, 0) AS BIGINT) AS pending, "
            "COALESCE(p.pending, 0) = 0 AS closed "
            "FROM sp LEFT JOIN p ON p.spider_id = sp.spider_id"
        ),
        "m9_scheduler_depth": (
            "SELECT user_id, event_id, "
            "CAST(SUM(CASE WHEN event_type IN ('click','view') THEN 1 ELSE -1 END) "
            "OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS depth "
            "FROM events"
        ),
        "i1_routing_counts": (
            "SELECT CASE WHEN doc_id % 3 = 0 THEN 'article' ELSE 'page' END AS item_type, "
            "COUNT(*) AS cnt FROM documents "
            "WHERE (doc_id % 3 = 0 AND doc_id % 2 = 0) OR doc_id % 3 = 1 GROUP BY 1 "
            "UNION ALL "
            "SELECT '__unrouted__' AS item_type, COUNT(*) AS cnt FROM documents "
            "WHERE doc_id % 3 = 2"
        ),
        "a_embed_simhash": _srp_simhash_sql() + " SELECT vec_id, esimhash FROM sig",
        "a_near_dup": (
            _srp_simhash_sql(bits=6)
            + ", small AS (SELECT esimhash FROM sig GROUP BY esimhash "
            "HAVING COUNT(*) > 1 AND COUNT(*) <= 200), "
            "sigf AS (SELECT sig.* FROM sig JOIN small USING (esimhash)), "
            "pairs AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b "
            "FROM sigf a JOIN sigf b USING (esimhash) WHERE a.vec_id < b.vec_id) "
            "SELECT vec_a, vec_b, sim FROM (SELECT p.vec_a, p.vec_b, "
            "ROUND(list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 6) AS sim "
            "FROM pairs p JOIN embeddings ea ON ea.vec_id = p.vec_a "
            "JOIN embeddings eb ON eb.vec_id = p.vec_b) WHERE sim >= 0.3"
        ),
        "a_ivf_index": (
            # identical semantics to a_ivf_topk — the index persists the
            # same deterministic assignment, probed with nprobe=2
            "WITH c AS (SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cvec "
            "FROM embeddings WHERE vec_id < 8), "
            "assign AS (SELECT vec_id, centroid_id FROM ("
            "SELECT e.vec_id, c.centroid_id, "
            "ROUND(list_cosine_similarity(e.embedding::DOUBLE[], c.cvec), 6) AS csim, "
            "ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY "
            "ROUND(list_cosine_similarity(e.embedding::DOUBLE[], c.cvec), 6) DESC, c.centroid_id) AS rk "
            "FROM embeddings e CROSS JOIN c) WHERE rk = 1), "
            "probe AS (SELECT centroid_id FROM ("
            "SELECT centroid_id, ROUND(list_cosine_similarity(cvec, "
            "(SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 6) AS qsim "
            "FROM c) ORDER BY qsim DESC, centroid_id LIMIT 2) "
            "SELECT e.vec_id, ROUND(list_cosine_similarity(e.embedding::DOUBLE[], "
            "(SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 6) AS sim "
            "FROM embeddings e JOIN assign a ON a.vec_id = e.vec_id "
            "JOIN probe p ON p.centroid_id = a.centroid_id "
            "ORDER BY sim DESC, e.vec_id LIMIT 10"
        ),
    }
