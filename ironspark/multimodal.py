"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video are carried as ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as Arrow
``mapInPandas`` stages. The actual codec step is STUBBED (the
image/audio libraries are not in this container): ``decode_image`` and
friends either raise NotImplementedError (strict mode) or produce a
clearly-marked deterministic fake — but the Spark-side plumbing
(schemas, batch shapes, partitioning, UDF signatures) is real and
tested, which is the part that matters for the 100 TB design.

Scale notes: binary payloads dominate row size, so these stages set
``spark.sql.files.maxPartitionBytes``-friendly batch shapes (small
maxRecordsPerBatch), never collect, and emit fixed-width feature rows
that are orders of magnitude smaller than their inputs.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
    ]
)

META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", LongType()),
    ]
)


def decode_image(payload: bytes):
    """Real codec entry point — intentionally unavailable here."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv, not present in this container; "
        "swap this function for a real decoder in deployment"
    )


def extract_metadata(media: DataFrame) -> DataFrame:
    """Typed metadata for opaque payloads: byte length + md5 digest.

    No decode needed — this is the real (non-stub) part of the stage.
    """

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b or b"")),
                    "digest": pdf["payload"].map(
                        lambda b: hashlib.md5(b or b"").hexdigest()
                    ),
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(run, META_SCHEMA)


def fake_feature_extract(media: DataFrame, dim: int = 8) -> DataFrame:
    """STUB feature extractor: deterministic pseudo-embedding from the
    payload digest (stands in for a CNN/audio-net forward pass; the
    batch shape, schema, and Arrow transfer are the real contract)."""

    def run(batches):
        for pdf in batches:
            feats = []
            for b in pdf["payload"]:
                d = hashlib.md5(b or b"").digest()
                feats.append([d[i] / 255.0 for i in range(dim)])
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return media.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, frame_size: int = 1000) -> DataFrame:
    """STUB frame sampler: emits one row per frame_size-byte slice (a
    real implementation would demux the container and sample I-frames;
    the row-explosion shape and schema are the real contract)."""

    def run(batches):
        for pdf in batches:
            ids, idxs, sizes = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                b = b or b""
                n = max((len(b) + frame_size - 1) // frame_size, 0)
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    sizes.append(len(b[i * frame_size : (i + 1) * frame_size]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_bytes": sizes}
            )

    return media.select("media_id", "payload").mapInPandas(run, FRAME_SCHEMA)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapter for tests/oracles: treat each document's UTF-8 bytes as
    an opaque payload (keeps the whole pipeline runnable on the driver
    test tables without real media files)."""
    from pyspark.sql import functions as F

    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )
