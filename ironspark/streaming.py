"""Structured Streaming veneer (SURVEY.md §2.11, §7.6).

The crawl loop itself is iterative batch by design (the frontier is
both input and output of each step; deterministic replay and snapshot
resume are the contract — SURVEY §2.11). What Structured Streaming IS
the right tool for is the engine's OUTPUT: items and metrics land in
append-only parquet directories, which are first-class streaming file
sources. These helpers expose them as live streams so downstream
consumers (indexers, quality monitors, trainers) tail the crawl while
it runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ironspark.schemas import ITEMS_SCHEMA, METRICS_SCHEMA


def stream_items(spark: SparkSession, run_dir: str) -> DataFrame:
    """readStream over the crawl's items table (append-only wave dirs).

    Item files carry no wave data column (engine plan-stability note,
    ironspark/frontier.py); the wave is the partition directory, so the
    stream schema declares it and basePath discovery fills it in."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    schema = StructType(
        [*ITEMS_SCHEMA.fields, StructField("wave", IntegerType())]
    )
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .option("basePath", f"{run_dir}/items")
        .parquet(f"{run_dir}/items/wave=*")
    )


def items_per_author_stream(
    spark: SparkSession, run_dir: str, window: str = "10 minutes"
) -> DataFrame:
    """Windowed aggregation with watermark over the live item stream.

    Event time is synthesized from the item's wave via a processing-time
    stamp at ingest — the reference has no event-time notion (SURVEY
    §2.11: ordering is arrival order), so lateness handling applies to
    the *consumer* side only.
    """
    items = stream_items(spark, run_dir).withColumn(
        "ingest_ts", F.current_timestamp()
    )
    return (
        items.withWatermark("ingest_ts", "1 minute")
        .groupBy(F.window("ingest_ts", window), F.col("author"))
        .agg(F.count("*").alias("n_items"))
    )


def running_author_counts_stream(spark: SparkSession, run_dir: str) -> DataFrame:
    """Custom STATEFUL streaming operator via applyInPandasWithState:
    a running per-author item count that survives across triggers.

    This is the arbitrary-state shape (GroupState) the brief calls for —
    windowed aggs (items_per_author_stream) cover time-bucketed state;
    this covers user-defined accumulators: the state schema is explicit,
    updates are Arrow-batched per group, and Spark checkpoints the state
    store between triggers (restart-safe).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    items = stream_items(spark, run_dir)

    def update(key, pdfs, state):
        n = state.get[0] if state.exists else 0
        batch = 0
        for pdf in pdfs:
            batch += len(pdf)
        n += batch
        state.update((n,))
        yield pd.DataFrame(
            {"author": [key[0]], "n_items": [n], "batch_items": [batch]}
        )

    return items.groupBy("author").applyInPandasWithState(
        update,
        "author string, n_items long, batch_items long",
        "n long",
        "update",
        GroupStateTimeout.NoTimeout,
    )


def run_stream_once_memory(stream_df: DataFrame, name: str) -> None:
    """Drain the source into an in-memory table (update-mode sinks like
    the stateful operator can't write parquet append)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_stream_once(stream_df: DataFrame, out_dir: str) -> None:
    """Drain whatever is currently in the source (Trigger.AvailableNow)
    into a parquet sink — the batch-testable form of the live stream."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", f"{out_dir}/data")
        .option("checkpointLocation", f"{out_dir}/_ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def crawl_stream(
    spark: SparkSession,
    pages: DataFrame | None,
    spiders: dict,
    run_dir: str,
    seeds_dir: str,
    config=None,
    available_now: bool = True,
    **engine_kwargs,
):
    """Continuous-crawl INPUT veneer (SURVEY §7.6): a foreachBatch
    driver that turns a directory of seed files into an ever-running
    crawl.

    ``readStream`` tails ``seeds_dir`` for new seed parquet files
    (columns per SEEDS_SCHEMA: spider_id, url, seed_rank); every
    micro-batch of seeds is injected into the SAME run_dir — the first
    batch starts the crawl, later batches resume it from its snapshot
    manifest (seq numbering continues, the seen set carries over, so a
    re-dropped url stays deduped). This is the feedback-loop-safe way
    to put Structured Streaming on top of the wave engine: streaming
    handles the open-ended INPUT arrival, the engine keeps its
    deterministic iterative core (SURVEY §2.11's mapping decision).

    Returns the StreamingQuery; with ``available_now`` the call drains
    currently-present seed files and stops (the batch-testable form).
    """
    import os

    from ironspark.config import EngineConfig
    from ironspark.engine import CrawlEngine, TableIO
    from ironspark.schemas import SEEDS_SCHEMA

    cfg = config or EngineConfig()

    seeds_stream = (
        spark.readStream.schema(SEEDS_SCHEMA)
        .option("pathGlobFilter", "*.parquet")
        .parquet(seeds_dir)
    )

    def run_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        eng = CrawlEngine(spark, pages, spiders, cfg, **engine_kwargs)
        man = TableIO(spark, run_dir).manifest()
        if man is None:
            eng.run(seeds=batch_df, run_dir=run_dir)
        else:
            # resume: new seeds join the existing frontier/seen state
            # through the engine's admission control (F4) — injected as
            # soon as the pending backlog is below the holding threshold
            eng.run(run_dir=run_dir, resume=True, staged_seeds=[batch_df])

    # checkpoint SIBLING to run_dir, never inside it: a fresh engine
    # run rmtree's run_dir, which would destroy the live query's state
    writer = seeds_stream.writeStream.foreachBatch(run_batch).option(
        "checkpointLocation", run_dir.rstrip("/") + "_seeds_ckpt"
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        q.awaitTermination()
    return q
