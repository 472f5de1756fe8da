"""Sitemap ingestion: protocol goldens + distributed bootstrap."""

import pandas as pd

from ironspark.sitemap import (
    parse_sitemap_xml,
    robots_sitemap_urls,
    sitemap_seeds,
)

_URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://a.test/p1</loc><lastmod>2026-01-01</lastmod>
       <priority>0.8</priority></url>
  <url><loc>http://a.test/p2</loc></url>
  <url><priority>0.3</priority></url>
</urlset>"""

_INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://a.test/sitemap-a.xml</loc></sitemap>
</sitemapindex>"""


def test_robots_sitemap_discovery():
    txt = (
        "User-agent: *\nDisallow: /private\n"
        "Sitemap: http://a.test/sitemap.xml\n"
        "sitemap:http://a.test/sitemap2.xml\n"
    )
    assert robots_sitemap_urls(txt) == [
        "http://a.test/sitemap.xml",
        "http://a.test/sitemap2.xml",
    ]
    assert robots_sitemap_urls("") == []


def test_parse_sitemap_goldens():
    rows = parse_sitemap_xml("http://a.test/sitemap.xml", _URLSET)
    assert [r["url"] for r in rows] == ["http://a.test/p1", "http://a.test/p2"]
    assert rows[0]["lastmod"] == "2026-01-01"
    assert rows[0]["priority"] == 0.8
    assert rows[1]["priority"] is None
    assert not rows[0]["is_index"]
    idx = parse_sitemap_xml("http://a.test/sitemap.xml", _INDEX)
    assert idx[0]["is_index"] and idx[0]["url"] == "http://a.test/sitemap-a.xml"
    assert parse_sitemap_xml("u", "not xml <<<") == []


def test_sitemap_seeds_end_to_end(spark):
    pages = spark.createDataFrame(pd.DataFrame({
        "url": [
            "http://a.test/sitemap.xml",      # an INDEX
            "http://a.test/sitemap-a.xml",    # its child urlset
            "http://b.test/sm.xml",           # a plain urlset
            "http://a.test/p1",               # ordinary page, not a sitemap
        ],
        "html": [
            _INDEX,
            _URLSET,
            _URLSET.replace("a.test", "b.test"),
            "<html>not a sitemap</html>",
        ],
    }))
    robots = spark.createDataFrame(pd.DataFrame({
        "host": ["a.test", "b.test", "c.test"],
        "robots_txt": [
            "Sitemap: http://a.test/sitemap.xml",
            "Sitemap: http://b.test/sm.xml",
            "User-agent: *\nDisallow: /",     # no sitemap on c
        ],
    }))
    seeds = sitemap_seeds(spark, pages, robots).toPandas()
    assert set(seeds["url"]) == {
        "http://a.test/p1", "http://a.test/p2",
        "http://b.test/p1", "http://b.test/p2",
    }
    assert set(seeds["host"]) == {"a.test", "b.test"}
    by_url = dict(zip(seeds["url"], seeds["priority"]))
    assert by_url["http://a.test/p1"] == 0.8
    assert by_url["http://a.test/p2"] == 0.5  # default fill


def test_gzipped_sitemap_bytes(spark):
    """Golden: real .xml.gz bytes (incl. multi-member gzip) parse in
    the same Arrow pass; a sitemapindex-of-gz resolves end to end."""
    import gzip

    from ironspark.sitemap import _ensure_text, parse_sitemaps

    gz = gzip.compress(_URLSET.encode())
    # multi-member: two concatenated gzip streams (legal per RFC 1952,
    # produced by some sitemap generators)
    two_sets = _URLSET.replace("p1", "q1").replace("p2", "q2")
    multi = gzip.compress(_URLSET.encode()) + gzip.compress(b"")
    assert _ensure_text(gz) == _URLSET
    assert _ensure_text(multi) == _URLSET
    assert _ensure_text(None) == ""
    assert _ensure_text(b"\x1f\x8btruncated-garbage") == ""
    assert _ensure_text(two_sets) == two_sets  # str passthrough

    docs = spark.createDataFrame(pd.DataFrame({
        "url": ["http://a.test/sm.xml.gz", "http://a.test/plain.xml"],
        "body": [bytearray(gz), bytearray(_URLSET.encode())],
    }))
    rows = parse_sitemaps(docs).collect()
    assert sorted(r.url for r in rows) == [
        "http://a.test/p1", "http://a.test/p1",
        "http://a.test/p2", "http://a.test/p2",
    ]


def test_sitemap_index_of_gz_seeds(spark):
    import gzip

    idx = """<?xml version="1.0"?>
    <sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      <sitemap><loc>http://g.test/child.xml.gz</loc></sitemap>
    </sitemapindex>"""
    child = _URLSET.replace("a.test", "g.test")
    pages = spark.createDataFrame(pd.DataFrame({
        "url": ["http://g.test/sitemap.xml", "http://g.test/child.xml.gz"],
        "html": [bytearray(idx.encode()), bytearray(gzip.compress(child.encode()))],
    }))
    robots = spark.createDataFrame(pd.DataFrame({
        "host": ["g.test"],
        "robots_txt": ["Sitemap: http://g.test/sitemap.xml\n"],
    }))
    seeds = {r.url for r in sitemap_seeds(spark, pages, robots).collect()}
    assert seeds == {"http://g.test/p1", "http://g.test/p2"}
