"""WARC/1.0 source and sink (ISO 28500, the web-archive interchange
format every large crawl pipeline reads and writes).

The reference engine has no archive sink (its items go to in-process
channels, ``src/pipeline/manager.rs``); a web-scale pipeline needs one:
Common Crawl, Internet Archive, and every training-data ingest speak
WARC. This module implements the format against the PUBLIC spec only
(no warcio dependency — the container has none):

* ``write_warc(df, path)`` — distributed sink. Each task serializes
  its partition's rows as gzip-member-per-record WARC (the standard
  ``.warc.gz`` layout: one gzip stream per record, concatenated, so
  readers can seek to any member) and writes ONE file per partition
  from the EXECUTOR, the same shape a 1000-task cluster job writes
  1000 WARC segments. No data moves to the driver.
* ``read_warc(spark, path)`` — distributed source. Spark's binaryFile
  format lists and reads the segment files in parallel; an Arrow
  ``mapInPandas`` pass splits gzip members and parses record headers
  back into rows. Files are the split unit (a .warc.gz member stream
  is not arbitrarily splittable — the same reason Common Crawl
  publishes many ~1 GB segments instead of few huge ones).

Scale: both directions are embarrassingly parallel over files; the
only fixed costs are Spark's file listing and the per-task gzip CPU.
Record payloads never transit the driver in either direction.
"""

from __future__ import annotations

import gzip
import io
import uuid
import zlib
from datetime import datetime, timezone
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_CRLF = b"\r\n"
_WARC_VERSION = b"WARC/1.0"

# Deterministic record ids (urn:uuid:... per spec appendix) derived
# from the record key so re-runs emit byte-identical archives —
# reproducibility is worth more to a data pipeline than RFC-4122
# randomness, and the spec only requires global uniqueness.
_NS = uuid.UUID("6ba7b811-9dad-11d1-80b4-00c04fd430c8")  # RFC 4122 ns:URL


def _record_id(url: str, ts: str) -> bytes:
    return f"<urn:uuid:{uuid.uuid5(_NS, url + '|' + ts)}>".encode()


def _format_ts(ts) -> str:
    """WARC-Date: ISO 8601 Zulu, second precision (spec §5.4)."""
    if ts is None:
        return "1970-01-01T00:00:00Z"
    if isinstance(ts, str):
        return ts
    if getattr(ts, "tzinfo", None) is not None:
        ts = ts.astimezone(timezone.utc)
    return ts.strftime("%Y-%m-%dT%H:%M:%SZ")


def encode_record(
    url: str, ts, payload: bytes, status: int = 200,
    content_type: str = "text/html", warc_type: str = "response",
) -> bytes:
    """One WARC record, uncompressed: header block + payload + 2 CRLF.

    For ``response`` records the payload block is a minimal HTTP/1.1
    response message (status line + Content-Type/Length headers +
    body) per spec §6.3, so readers that expect
    ``application/http; msgtype=response`` parse it.
    """
    ts_s = _format_ts(ts)
    if warc_type == "response":
        http = (
            f"HTTP/1.1 {status} OK\r\n"
            f"Content-Type: {content_type}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode() + payload
        block_type = b"application/http; msgtype=response"
    else:
        http = payload
        block_type = content_type.encode()
    headers = [
        _WARC_VERSION,
        b"WARC-Type: " + warc_type.encode(),
        b"WARC-Record-ID: " + _record_id(url, ts_s),
        b"WARC-Date: " + ts_s.encode(),
        b"WARC-Target-URI: " + url.encode(),
        b"Content-Type: " + block_type,
        b"Content-Length: " + str(len(http)).encode(),
    ]
    return _CRLF.join(headers) + _CRLF * 2 + http + _CRLF * 2


def decode_records(buf: bytes) -> Iterator[dict]:
    """Parse concatenated uncompressed WARC records from one buffer."""
    pos = 0
    n = len(buf)
    while pos < n:
        hdr_end = buf.find(_CRLF * 2, pos)
        if hdr_end < 0:
            return
        head = buf[pos:hdr_end].decode("utf-8", "replace")
        fields = {}
        for line in head.split("\r\n")[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        clen = int(fields.get("content-length", "0"))
        block = buf[hdr_end + 4 : hdr_end + 4 + clen]
        status = None
        payload = block
        if fields.get("content-type", "").startswith("application/http"):
            be = block.find(b"\r\n\r\n")
            if be >= 0:
                status_line = block[:be].split(b"\r\n", 1)[0]
                parts = status_line.split()
                if len(parts) >= 2 and parts[1].isdigit():
                    status = int(parts[1])
                payload = block[be + 4 :]
        yield {
            "warc_type": fields.get("warc-type"),
            "url": fields.get("warc-target-uri"),
            "warc_date": fields.get("warc-date"),
            "status": status,
            "payload": payload,
        }
        pos = hdr_end + 4 + clen + 4  # skip the trailing 2 CRLF


def _resolve_fs(path: str):
    """(pyarrow filesystem, in-fs path) for a sink/source URI.

    Scheme-qualified paths (``file://``, ``hdfs://``, ``s3://``, …)
    resolve through ``pyarrow.fs.FileSystem.from_uri`` so executor
    tasks write to SHARED storage; a bare path resolves to the local
    filesystem of whatever machine runs the task. On a real cluster a
    bare path therefore scatters segments across executor-local disks
    — pass an explicit scheme (or run with a shared mount at the same
    path on every node, the sandbox case).
    """
    import os

    from pyarrow import fs as pafs

    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), os.path.abspath(path)


def write_warc(
    df: DataFrame,
    path: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    body_col: str = "html",
    partitions: int | None = None,
) -> int:
    """Distributed WARC sink: one ``part-NNNNN.warc.gz`` per partition,
    written executor-side (gzip member per record). Returns the number
    of records written.

    ``path`` may be scheme-qualified (``file:///shared/warc``,
    ``hdfs://nn/warc``) — each task opens its segment through the
    filesystem API (``_resolve_fs``), so on a real cluster the
    segments land on shared storage, not N executor-local disks. Bare
    paths mean "local disk of the task's machine" (fine in the
    sandbox / with a shared mount; see ``_resolve_fs``). Compression
    is done by US per record member — the stream is opened raw
    (``compression=None``) so the filesystem layer doesn't re-gzip by
    the ``.gz`` extension.

    The fan-out knob is ``partitions`` (default: keep the input's) —
    at 100 TB you size it so each segment lands near the ~1 GB
    convention. Uses mapPartitions (not collect): the driver sees only
    one count per partition.
    """
    fs, base = _resolve_fs(path)
    fs.create_dir(base, recursive=True)
    if partitions is not None:
        df = df.repartition(partitions)
    cols = df.select(url_col, ts_col, body_col)

    def _write_part(it):
        rows = 0
        fh = None
        from pyspark import TaskContext

        tfs, tbase = _resolve_fs(path)  # re-resolve inside the task
        pid = TaskContext.get().partitionId()
        fname = f"{tbase}/part-{pid:05d}.warc.gz"
        for row in it:
            if fh is None:
                fh = tfs.open_output_stream(fname, compression=None)
            body = row[body_col]
            payload = body.encode() if isinstance(body, str) else (body or b"")
            rec = encode_record(row[url_col], row[ts_col], payload)
            # one gzip MEMBER per record (standard .warc.gz layout)
            fh.write(gzip.compress(rec, compresslevel=6))
            rows += 1
        if fh is not None:
            fh.close()
        yield rows

    counts = cols.rdd.mapPartitions(_write_part).collect()  # O(partitions)
    return sum(counts)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC source over a directory of ``*.warc.gz``
    segments: binaryFile listing/reading in parallel, then one Arrow
    pass per file splitting gzip members and parsing record headers.

    Output schema: url string, warc_date string, status int,
    payload binary, warc_type string, src_file string.
    """
    files = spark.read.format("binaryFile").load(path + "/*.warc.gz")

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "url": [], "warc_date": [], "status": [],
                "payload": [], "warc_type": [], "src_file": [],
            }
            for fname, blob in zip(pdf["path"], pdf["content"]):
                # multi-member gzip: decompress members sequentially
                data = bytes(blob)
                raw = bytearray()
                while data:
                    d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
                    raw += d.decompress(data)
                    raw += d.flush()
                    data = d.unused_data
                for rec in decode_records(bytes(raw)):
                    out["url"].append(rec["url"])
                    out["warc_date"].append(rec["warc_date"])
                    out["status"].append(rec["status"])
                    out["payload"].append(rec["payload"])
                    out["warc_type"].append(rec["warc_type"])
                    out["src_file"].append(fname)
            yield pd.DataFrame(out)

    schema = (
        "url string, warc_date string, status int, payload binary, "
        "warc_type string, src_file string"
    )
    return files.select("path", "content").mapInPandas(_parse, schema=schema)
