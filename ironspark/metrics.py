"""Per-(wave, partition) lineage + metrics (FIXTURES.md §8).

The reference's atomic counters (``src/downloader/stat.rs``,
``src/pipeline/stat.rs``, ``src/spider/stat.rs``,
``src/scheduler/stat.rs``) become one metrics row per (wave,
partition): fetch-side lineage from the materialized responses (which
carry the partition_id captured at schedule time), parse-side lineage
from the parse stage's kind="stat" rows, and wave-level roll-ups
(dedup drops) attributed to partition_id = -1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ironspark.schemas import METRICS_SCHEMA


def _conform(df: DataFrame) -> DataFrame:
    cols = []
    for f in METRICS_SCHEMA.fields:
        if f.name in df.columns:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def wave_metrics(
    wave: int,
    responses: DataFrame,
    parse_out: DataFrame,
    deduped_count: int,
    t_fetch_ms: float,
    t_parse_ms: float,
    cfg_max_retry: int,
) -> DataFrame:
    """Assemble the wave's crawl_metrics rows."""
    ok = F.col("resp_status") < 400
    fetch_side = responses.groupBy("partition_id").agg(
        F.count("*").alias("scheduled"),
        F.sum(ok.cast("long")).alias("fetched"),
        F.sum((~ok).cast("long")).alias("failed"),
        F.sum(((~ok) & (F.col("attempt") < cfg_max_retry)).cast("long")).alias(
            "retried"
        ),
        F.sum("bytes_req").alias("bytes_req"),
        F.sum("bytes_resp").alias("bytes_resp"),
    )

    parse_side = parse_out.groupBy("partition_id").agg(
        F.sum(F.when(F.col("kind") == "stat", F.col("number")).otherwise(0)).alias(
            "parsed"
        ),
        F.sum((F.col("kind") == "item").cast("long")).alias("items"),
        F.sum((F.col("kind") == "request").cast("long")).alias("outlinks"),
    )

    merged = fetch_side.join(parse_side, "partition_id", "full_outer")
    merged = merged.withColumn("wave", F.lit(wave))
    merged = merged.withColumn("deduped", F.lit(None).cast("long"))
    merged = merged.withColumn("t_fetch_ms", F.lit(float(t_fetch_ms)))
    merged = merged.withColumn("t_parse_ms", F.lit(float(t_parse_ms)))

    spark = responses.sparkSession
    rollup = spark.createDataFrame(
        [(wave, -1, int(deduped_count), float(t_fetch_ms), float(t_parse_ms))],
        "wave int, partition_id int, deduped long, t_fetch_ms double, t_parse_ms double",
    )
    out = _conform(merged).unionByName(_conform(rollup))
    fill = {
        f.name: 0
        for f in METRICS_SCHEMA.fields
        if f.name not in ("t_fetch_ms", "t_parse_ms")
    }
    return out.fillna(fill)
