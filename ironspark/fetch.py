"""Fetch stage: corpus equi-join, acceptance filter, retry policy.

At test scale, "fetch" is a deterministic left join of the scheduled
frontier against the pages corpus (the reference's live reqwest GET,
``src/downloader/downloader.rs:152-226``, replaced per SURVEY §2.1 S3).
A real deployment swaps in a pooled-HTTP ``mapInPandas`` behind the
same column contract (see ``http_fetch_stage`` stub).

Scale shape: the scheduled batch is orders of magnitude smaller than
the corpus. The session enables Spark's runtime Bloom-filter pushdown,
which injects the scheduled url_canon set into the corpus parquet scan;
AQE then picks broadcast/skew-safe strategies. The corpus read prunes
to exactly the joined columns (url, warc_ts, html) — Catalyst column
pruning keeps ``text``/``lang`` out of the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ironspark.config import EngineConfig

# HTTP wire-size estimate, reference Request::size (src/request.rs:18-47):
# "METHOD path HTTP/1.1\r\n" + headers + "\r\n" + body
_REQ_OVERHEAD = 1 + 1 + 8 + 2 + 2  # spaces + "HTTP/1.1" + CRLFs


def _headers_bytes():
    """Per-header wire bytes: name + value + 4 ("k: v\\r\\n"), summed over
    the headers map — the reference's exact term (src/request.rs:18-47).
    Null/empty map contributes 0."""
    return F.coalesce(
        F.aggregate(
            F.map_entries(F.col("headers")),
            F.lit(0),
            lambda acc, e: acc + F.length(e["key"]) + F.length(e["value"]) + 4,
        ),
        F.lit(0),
    )


def fetch_from_corpus(
    scheduled: DataFrame,
    pages: DataFrame,
    redirects: DataFrame | None = None,
    strategy: str = "broadcast",
) -> DataFrame:
    """scheduled frontier rows -> response rows (status, body bytes).

    Corpus hit -> 200 with the page's html bytes; miss -> 404 with null
    body (the reference surfaces non-2xx as rejectable responses,
    ``downloader.rs:236-247``). An optional redirects(src, dst) table
    simulates the reference's redirect-following (final URL lands in
    ``url_canon``; reqwest follows redirects transparently,
    ``src/response.rs:10`` "url: final URL after redirects").
    """
    if redirects is not None:
        r = F.broadcast(redirects.select(
            F.col("src").alias("_r_src"), F.col("dst").alias("_r_dst")
        ))
        scheduled = (
            scheduled.join(r, scheduled["url_canon"] == F.col("_r_src"), "left")
            .withColumn("url_canon", F.coalesce(F.col("_r_dst"), F.col("url_canon")))
            # Response.url is the FINAL url after redirects
            # (src/response.rs:10) — relative links resolve against it
            .withColumn("url", F.coalesce(F.col("_r_dst"), F.col("url")))
            .drop("_r_src", "_r_dst")
        )
    corpus = pages.select(
        F.col("url").alias("_page_url"),
        F.col("html").alias("body_bytes"),
        F.col("warc_ts"),
    )
    if strategy == "broadcast":
        # NEVER shuffle the corpus: a wave's scheduled batch is tiny next
        # to the page store, so hits = corpus scan probing a broadcast
        # hash table of the batch (zero shuffle, zero sort; parallelism =
        # parquet splits), and misses = an anti-join against the
        # column-pruned url-only scan (KBs of parquet, not the html).
        # A plain left join would shuffle wave-sized HTML every wave —
        # measured as the scaling killer (disk-bound, flat across cores).
        # The broadcast build side is projected to exactly what the
        # parse stage consumes: probing a full frontier row (incl. null
        # MAP columns) measured 2x the whole stage cost, since every
        # matched row copies the build side. For waves too large to
        # broadcast (>~10M rows), strategy "shuffle" is the fallback; at
        # 100 TB the corpus side is bucketed by url so even that
        # shuffles only the batch.
        slim = scheduled.select(
            "url_canon", "url", "host", "spider_id", "seq", "attempt",
            "method", "headers", "body",
        )
        # method-aware: the page store answers GETs; any other method is
        # an explicit miss, never a silent GET (a ported POST spider
        # sees 404s, not wrong pages; the live-HTTP stage would serve
        # these). Reference sends the request's real method,
        # downloader.rs:152-226.
        is_get = F.coalesce(F.col("method"), F.lit("GET")) == "GET"
        gets = slim.filter(is_get)
        nongets = slim.filter(~is_get)
        hits = corpus.join(
            F.broadcast(gets), corpus["_page_url"] == gets["url_canon"]
        ).drop("_page_url")
        misses = (
            gets.join(
                F.broadcast(pages.select(F.col("url").alias("_page_url"))),
                gets["url_canon"] == F.col("_page_url"),
                "left_anti",
            )
            .unionByName(nongets)
            .withColumn("body_bytes", F.lit(None).cast("binary"))
            .withColumn("warc_ts", F.lit(None).cast("timestamp"))
        )
        joined = hits.unionByName(misses.select(*hits.columns))
    else:
        is_get = F.coalesce(scheduled["method"], F.lit("GET")) == "GET"
        joined = scheduled.join(
            corpus,
            (scheduled["url_canon"] == corpus["_page_url"]) & is_get,
            "left",
        ).drop("_page_url")

    # path length via a codegen-friendly regex strip of scheme://host —
    # parse_url lowers to an interpreted evaluator invoke (measured hot)
    path = F.regexp_replace(F.col("url"), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    return (
        joined.withColumn(
            "resp_status",
            F.when(F.col("body_bytes").isNotNull(), F.lit(200)).otherwise(F.lit(404)),
        )
        .withColumn(
            "bytes_req",
            (
                F.length("method")
                + F.length(path)
                + F.lit(_REQ_OVERHEAD)
                + _headers_bytes()
                + F.coalesce(F.length("body"), F.lit(0))
            ).cast("long"),
        )
        .withColumn(
            "bytes_resp", F.coalesce(F.length("body_bytes"), F.lit(0)).cast("long")
        )
        # set_cookie: the response-side cookie seam (reference jar,
        # src/config.rs:14 store_cookies). The corpus join never sets
        # it; a response hook or the live-HTTP stage fills it, and the
        # engine folds it into its per-host jar (engine.py).
        .withColumn("set_cookie", F.lit(None).cast("string"))
    )


def split_accepted(
    responses: DataFrame, cfg: EngineConfig
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(accepted, retry, exhausted) per the reference acceptance rule.

    Accept when status < 400 OR status in http_error_allow_codes
    (``downloader.rs:236-247``; config ``src/config.rs:19``). Rejected
    rows retry with attempt+1 up to max_retry_times (linear backoff
    ``100ms*(attempt+1)`` becomes "next wave" — deterministic,
    ``downloader.rs:210-223``), then are exhausted.
    """
    allow = list(cfg.http_error_allow_codes)
    ok = F.col("resp_status") < 400
    if allow:
        ok = ok | F.col("resp_status").isin(allow)
    accepted = responses.filter(ok)
    rejected = responses.filter(~ok)
    retry = (
        rejected.filter(F.col("attempt") < cfg.max_retry_times)
        .withColumn("attempt", F.col("attempt") + 1)
        .withColumn("status", F.lit("pending"))
    )
    exhausted = rejected.filter(
        F.col("attempt") >= cfg.max_retry_times
    ).withColumn("status", F.lit("exhausted"))
    return accepted, retry, exhausted


def http_fetch_stage(scheduled: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Live-HTTP fetch variant (same column contract as fetch_from_corpus).

    Would run pooled HTTP inside mapInPandas (one connection pool per
    executor task, politeness already enforced upstream). Deliberately
    stubbed in this sandbox: no network, and determinism is the point
    of the corpus join. Reference behavior it would mirror:
    downloader.rs:152-226 (timeouts, UA, redirect-following).
    """
    raise NotImplementedError(
        "live HTTP fetch is out of scope in the sandbox; use fetch_from_corpus"
    )


def error_class_expr():
    """D3 error classification (downloader.rs:266-286) as a column expr."""
    return (
        F.when(F.col("resp_status") == 404, F.lit("request"))
        .when(F.col("resp_status") >= 500, F.lit("request"))
        .when(F.col("resp_status") == 408, F.lit("timeout"))
        .otherwise(F.lit("unknown"))
    )
