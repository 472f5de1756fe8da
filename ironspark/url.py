"""URL canonicalization + host extraction (SURVEY.md §2.4 P8).

The reference canonicalizes implicitly through ``reqwest::Url`` parsing
(lowercased scheme/host, default-port drop — ``examples/basic_spider.rs:96-98``
and RFC 3986 ``join`` at ``:125``). The north rule makes it explicit:
scheme/host lowercasing, percent-decode of unreserved characters, query
parameter sort, fragment strip.

All engine-plane application is via vectorized pandas UDFs (Arrow
batches) — never per-row Python UDFs.
"""

from __future__ import annotations

import posixpath
import re
from urllib.parse import quote, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21"}

# RFC 3986 unreserved characters: decode if percent-encoded. Everything
# else keeps its escape, normalized to uppercase hex (%2f -> %2F, never
# decoded — decoding reserved chars like %2F would change path semantics).
_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_PCT_RE = re.compile(r"%([0-9A-Fa-f]{2})")
# raw characters allowed to stay literal when re-encoding stray bytes
_SAFE_PATH = "%/:@!$&'()*+,;=~-._"
_SAFE_QUERY = "%=&:@!$'()*+,;/?~-._"


def _norm_pct(s: str) -> str:
    """Decode %XX only for unreserved chars; uppercase the rest."""
    def repl(m: re.Match) -> str:
        ch = chr(int(m.group(1), 16))
        return ch if ch in _UNRESERVED else "%" + m.group(1).upper()

    return _PCT_RE.sub(repl, s)


# already-canonical fast path: lowercase scheme+host, optional port, a
# path of unreserved-safe chars, no query/fragment/userinfo/percent.
# With no '.' in the path, canonicalize_url_spec is the identity on
# these (no dot-segment pass, quote() is a no-op) — proven by
# tests/test_url.py::test_fast_path_parity. At crawl steady state this
# is ~100% of outlinks, skipping urlsplit/normpath/quote per URL.
_FAST_CANON_RE = re.compile(
    r"^(https?)://([a-z0-9-]+(?:\.[a-z0-9-]+)*)(:[1-9]\d*)?(/[A-Za-z0-9_~/-]*)$"
)
_DEFAULT_PORT = {("http", ":80"), ("https", ":443")}


def canonicalize_url(url: str | None) -> str | None:
    """Canonical form of an absolute URL; None for unparseable input.

    Fast path for already-canonical URLs; full normalization in
    ``canonicalize_url_spec`` otherwise (identical output, parity-
    tested)."""
    if url is None:
        return None
    m = _FAST_CANON_RE.match(url)
    if m is not None and (m.group(1), m.group(3)) not in _DEFAULT_PORT:
        return url
    return canonicalize_url_spec(url)


def host_of(url: str | None) -> str | None:
    """Lowercased registered host of a URL (politeness partition key)."""
    if url is None:
        return None
    m = _FAST_CANON_RE.match(url)
    if m is not None:
        return m.group(2)
    return host_of_spec(url)


def canonicalize_url_spec(url: str | None) -> str | None:
    """Full normalization (the spec path).

    scheme+host lowercase, default port dropped, percent-decode then
    re-encode (normalizes unreserved octets like %7E -> ~ and uppercases
    remaining hex), dot-segment removal in path, query params sorted
    bytewise, fragment stripped, empty path -> "/".
    """
    if url is None:
        return None
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return None
    if not parts.scheme or not parts.netloc:
        return None
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    if not host:
        return None
    try:
        port = parts.port
    except ValueError:
        return None
    netloc = host
    if parts.username:
        userinfo = parts.username + (":" + parts.password if parts.password else "")
        netloc = userinfo + "@" + netloc
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme):
        netloc += f":{port}"

    path = parts.path or "/"
    # dot-segment removal (RFC 3986 §5.2.4) without collapsing '//'
    if "." in path:
        norm = posixpath.normpath(path)
        if path.endswith("/") and not norm.endswith("/"):
            norm += "/"
        path = norm if norm != "." else "/"
    path = quote(_norm_pct(path), safe=_SAFE_PATH)

    query = ""
    if parts.query:
        safe_piece = _SAFE_QUERY.replace("&", "")
        pieces = [quote(_norm_pct(p), safe=safe_piece)
                  for p in parts.query.split("&") if p]
        query = "&".join(sorted(pieces))

    return urlunsplit((scheme, netloc, path, query, ""))


def host_of_spec(url: str | None) -> str | None:
    """Lowercased registered host (spec path; see host_of fast path)."""
    if url is None:
        return None
    try:
        return (urlsplit(url).hostname or "").lower() or None
    except ValueError:
        return None


# -- vectorized pandas cores (shared by pandas_udf and mapInPandas) ----------

def canonicalize_series(urls: pd.Series) -> pd.Series:
    return urls.map(canonicalize_url)


def host_series(urls: pd.Series) -> pd.Series:
    return urls.map(host_of)


canonicalize_udf = F.pandas_udf(canonicalize_series, StringType())
host_udf = F.pandas_udf(host_series, StringType())


def with_canonical(df, url_col: str = "url"):
    """Add url_canon + host columns to a DataFrame (Arrow-vectorized)."""
    return df.withColumn("url_canon", canonicalize_udf(F.col(url_col))).withColumn(
        "host", host_udf(F.col(url_col))
    )


def template_expr(col):
    """Column expression generalizing a URL's path+query to a template:
    hex runs of 8+ chars -> ``{H}``, then digit runs -> ``{D}``. Shared
    by ``url_templates`` and the engine's trap throttle
    (politeness.throttle_traps) so both agree on what a template is."""
    rest = F.regexp_extract(col, r"^[a-z][a-z0-9+.-]*://[^/?#]*(.*)$", 1)
    return F.regexp_replace(
        F.regexp_replace(rest, r"[0-9a-f]{8,}", "{H}"), r"[0-9]+", "{D}"
    )


def url_templates(
    urls, url_col: str = "url", min_urls: int = 10, trap_share: float = 0.5
):
    """URL-template mining / spider-trap detection over a frontier or
    crawl log (crawl-ops analytics; no reference counterpart — the
    operator a production crawler runs to find calendar traps, session
    IDs and infinite URL spaces before they eat the politeness budget).

    Generalizes each URL to a template: hex runs of 8+ chars become
    ``{H}`` (session tokens, content hashes), then digit runs become
    ``{D}`` (ids, dates, pagination). Emits one row per (host,
    template): URL count, the host's total, the template's share of the
    host, and ``is_trap`` — a generalized template (contains a
    placeholder) covering >= ``min_urls`` URLs and >= ``trap_share`` of
    its host. Downstream the engine's admission control can demote or
    cap matching URLs.

    Scale: two hash-aggregates (template counts from a projection of
    the URL scan, host totals from the first agg — no second scan of
    the input) + one join keyed on host; the join's right side is
    hosts-sized (millions of rows at web scale, AQE picks broadcast
    when it fits). Everything is JVM regexp_replace — no Python.
    per_tmpl feeds both the host-totals aggregate and the join's left
    side, but its two planned copies share one exchange at runtime
    (ReuseExchange — the subtrees are canonically identical), so no
    materialization barrier is needed: measured identical with and
    without one (round 7 second pass).
    """
    host = F.regexp_extract(F.col(url_col), r"^[a-z][a-z0-9+.-]*://([^/?#]+)", 1)
    tmpl = template_expr(F.col(url_col))
    per_tmpl = (
        urls.select(host.alias("host"), tmpl.alias("template"))
        .filter(F.col("host") != "")
        .groupBy("host", "template")
        .agg(F.count("*").cast("long").alias("n_urls"))
    )
    per_host = per_tmpl.groupBy("host").agg(
        F.sum("n_urls").cast("long").alias("host_urls")
    )
    share = F.col("n_urls") / F.col("host_urls")
    return (
        per_tmpl.join(per_host, "host")
        .select(
            "host",
            "template",
            "n_urls",
            "host_urls",
            F.round(share, 6).alias("url_share"),
            (
                F.col("template").contains("{")
                & (F.col("n_urls") >= min_urls)
                & (share >= trap_share)
            ).alias("is_trap"),
        )
    )
