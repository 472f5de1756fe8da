"""Sitemap ingestion: robots.txt discovery + sitemap XML -> seed URLs.

The reference has no sitemap support (seeds are a hardcoded list,
reference ``src/spider/example.rs``); a web-scale crawler bootstraps
frontiers from sitemaps — they enumerate exactly the URLs a host WANTS
crawled, with freshness hints. Implemented against the public
sitemaps.org protocol (urlset / sitemapindex, <loc>, <lastmod>,
<priority>) using the stdlib XML parser only.

Spark shape: parsing is an Arrow ``mapInPandas`` pass over
(url, xml_body) rows — each sitemap is an independent few-KB document,
the canonical "pure function per row, vectorized batches" case. One
level of sitemapindex indirection is resolved by a second join against
the fetched bodies (two declarative joins, no driver loop; deeper
nesting repeats the step — real-world indexes are 1-2 levels).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SITEMAP_SCHEMA = (
    "sitemap_url string, url string, lastmod string, priority double, "
    "is_index boolean"
)

_SITEMAP_LINE = re.compile(r"(?im)^\s*sitemap\s*:\s*(\S+)")


def robots_sitemap_urls(text: str) -> list[str]:
    """``Sitemap:`` lines from a robots.txt body (the standard
    discovery channel; the directive is group-independent per spec)."""
    return _SITEMAP_LINE.findall(text or "")


def _strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def _ensure_text(body) -> str:
    """Normalize a sitemap body to XML text.

    Bodies arrive as str (text corpora) or bytes (binary ``html``
    columns, ``.xml.gz`` fetches). Gzip is detected by the 1f 8b magic
    and decompressed with the same multi-member zlib loop as the WARC
    reader (warc.py ``read_warc``) — sitemaps.org caps files at 50 MB
    UNcompressed, so gzip is the norm for real sitemaps. Undecodable
    bytes are dropped (ET would reject them anyway)."""
    if body is None:
        return ""
    if isinstance(body, (bytes, bytearray, memoryview)):
        data = bytes(body)
        if data[:2] == b"\x1f\x8b":
            raw = bytearray()
            try:
                while data:
                    d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
                    raw += d.decompress(data)
                    raw += d.flush()
                    data = d.unused_data
            except zlib.error:
                return ""
            data = bytes(raw)
        return data.decode("utf-8", errors="replace")
    return body


def parse_sitemap_xml(sitemap_url: str, xml_body: str) -> list[dict]:
    """Rows for one sitemap document: urlset entries (is_index=False)
    or child sitemap locs (is_index=True). Malformed XML yields []."""
    try:
        root = ET.fromstring(xml_body)
    except ET.ParseError:
        return []
    kind = _strip_ns(root.tag)
    rows = []
    for el in root:
        if _strip_ns(el.tag) not in ("url", "sitemap"):
            continue
        loc = lastmod = None
        priority = None
        for ch in el:
            t = _strip_ns(ch.tag)
            v = (ch.text or "").strip()
            if t == "loc":
                loc = v
            elif t == "lastmod":
                lastmod = v
            elif t == "priority":
                try:
                    priority = float(v)
                except ValueError:
                    pass
        if loc:
            rows.append({
                "sitemap_url": sitemap_url,
                "url": loc,
                "lastmod": lastmod,
                "priority": priority,
                "is_index": kind == "sitemapindex",
            })
    return rows


def parse_sitemaps(docs: DataFrame) -> DataFrame:
    """(url, body) sitemap documents -> SITEMAP_SCHEMA rows, one Arrow
    pass; scales as a narrow map over however many sitemaps exist."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for u, b in zip(pdf["url"], pdf["body"]):
                rows.extend(parse_sitemap_xml(u, _ensure_text(b)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "sitemap_url", "url", "lastmod", "priority", "is_index"
                ],
            )

    return docs.select("url", "body").mapInPandas(run, schema=SITEMAP_SCHEMA)


def sitemap_seeds(
    spark: SparkSession,
    pages: DataFrame,
    robots_bodies: DataFrame,
    max_index_depth: int = 1,
) -> DataFrame:
    """Bootstrap a seeds table from robots-discovered sitemaps.

    robots_bodies: (host, robots_txt). pages: the corpus/fetch source
    with (url, html) — sitemap bodies are fetched like any other page
    (live-HTTP deployments swap this join for an http_fetch_stage
    pass). Returns distinct (url, host, priority) seed rows ordered by
    nothing (the frontier assigns seq).

    Plan: robots rows are O(hosts) — the sitemap-url extraction is one
    Arrow pass; each resolution level is one broadcast-right join of
    the (small) sitemap-url set against the pages table, i.e. the same
    broadcast-probe regime as the fetch stage. No driver loops over
    URLs; only the fixed max_index_depth levels are unrolled into the
    plan.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for host, txt in zip(pdf["host"], pdf["robots_txt"]):
                for sm in robots_sitemap_urls(txt or ""):
                    rows.append({"host": host, "url": sm})
            yield pd.DataFrame(rows, columns=["host", "url"])

    sm_urls = robots_bodies.select("host", "robots_txt").mapInPandas(
        extract, schema="host string, url string"
    )

    def fetch_bodies(urls: DataFrame) -> DataFrame:
        return pages.select(
            F.col("url"), F.col("html").alias("body")
        ).join(F.broadcast(urls.select("url").distinct()), "url", "left_semi")

    entries = parse_sitemaps(fetch_bodies(sm_urls))
    for _ in range(max_index_depth):
        children = entries.filter(F.col("is_index")).select("url")
        leaf = entries.filter(~F.col("is_index"))
        child_entries = parse_sitemaps(fetch_bodies(children))
        entries = leaf.unionByName(child_entries)
    return (
        entries.filter(~F.col("is_index"))
        .select(
            "url",
            F.parse_url("url", F.lit("HOST")).alias("host"),
            F.coalesce("priority", F.lit(0.5)).alias("priority"),
        )
        .distinct()
    )
