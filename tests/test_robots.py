"""robots.txt parsing + enforcement tests."""

import pandas as pd

from ironspark.robots import parse_robots_txt, robots_table

SIMPLE = """
User-agent: *
Disallow: /private/
Crawl-delay: 2.5
"""

GROUPED = """
User-agent: googlebot
Disallow: /nogoogle/

User-agent: ironspark
User-agent: otherbot
Disallow: /secret/
Disallow: /tmp/
Crawl-delay: 0.5

User-agent: *
Disallow: /all/
Crawl-delay: 10
"""

MESSY = """
# comment only
User-agent: *
Disallow:
Crawl-delay: notanumber
Disallow: /x/   # trailing comment
"""


def test_simple():
    delay, dis, alw = parse_robots_txt(SIMPLE)
    assert delay == 2.5 and dis == ["/private/"] and alw == []


def test_agent_group_beats_star():
    delay, dis, _ = parse_robots_txt(GROUPED, agent="ironspark")
    assert delay == 0.5 and dis == ["/secret/", "/tmp/"]
    delay, dis, _ = parse_robots_txt(GROUPED, agent="unknownbot")
    assert delay == 10 and dis == ["/all/"]


def test_messy_lines():
    delay, dis, _ = parse_robots_txt(MESSY, default_delay=1.0)
    assert delay == 1.0  # unparseable crawl-delay ignored
    assert dis == ["/x/"]  # empty Disallow means allow-all, skipped


def test_empty_and_none():
    assert parse_robots_txt("") == (1.0, [], [])
    assert parse_robots_txt(None) == (1.0, [], [])


ALLOWED = """
User-agent: *
Disallow: /private/
Allow: /private/pub/
Disallow: /dual/
Allow: /dual/
Crawl-delay: 1
"""


def test_allow_rules_parsed():
    delay, dis, alw = parse_robots_txt(ALLOWED)
    assert dis == ["/private/", "/dual/"]
    assert alw == ["/private/pub/", "/dual/"]


def test_rfc9309_longest_match_precedence(spark):
    from ironspark.politeness import robots_disallow_filter
    from ironspark.robots import robots_table

    robots = robots_table(spark.createDataFrame(pd.DataFrame({
        "host": ["a.test"],
        "robots_txt": [ALLOWED],
    })))
    pending = spark.createDataFrame(pd.DataFrame({
        "host": ["a.test"] * 5,
        "url": [
            "http://a.test/open",            # no rule matches -> kept
            "http://a.test/private/x",       # disallow only -> dropped
            "http://a.test/private/pub/y",   # longer allow wins -> kept
            "http://a.test/private/pub",     # allow /private/pub/ does NOT
                                             # prefix this -> still blocked
            "http://a.test/dual/z",          # equal-length tie -> allow wins
        ],
    }))
    kept = {r.url for r in robots_disallow_filter(pending, robots).collect()}
    assert kept == {
        "http://a.test/open",
        "http://a.test/private/pub/y",
        "http://a.test/dual/z",
    }


def test_legacy_robots_without_allow_column(spark):
    from ironspark.politeness import robots_disallow_filter

    robots = spark.createDataFrame(pd.DataFrame({
        "host": ["a.test"],
        "crawl_delay": [1.0],
        "disallow": [["/private/"]],
    }))
    pending = spark.createDataFrame(pd.DataFrame({
        "host": ["a.test"] * 2,
        "url": ["http://a.test/ok", "http://a.test/private/x"],
    }))
    kept = {r.url for r in robots_disallow_filter(pending, robots).collect()}
    assert kept == {"http://a.test/ok"}


def test_robots_table_distributed(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "host": ["a.com", "b.com"],
                "robots_txt": [SIMPLE, GROUPED],
            }
        )
    )
    out = {r["host"]: r for r in robots_table(df, agent="ironspark").collect()}
    assert out["a.com"]["crawl_delay"] == 2.5
    assert out["a.com"]["disallow"] == ["/private/"]
    assert out["b.com"]["crawl_delay"] == 0.5


WILD = """
User-agent: *
Disallow: /*?sessionid=
Disallow: /*.pdf$
Disallow: /public
Allow: /public*.html
Disallow: /lit$eral
Allow: /end/
Disallow: /end/$
"""


def test_rfc9309_wildcard_rules(spark):
    from ironspark.politeness import robots_disallow_filter

    robots = robots_table(spark.createDataFrame(pd.DataFrame({
        "host": ["w.test"],
        "robots_txt": [WILD],
    })))
    urls = {
        # * rule matches across path AND query (match target is
        # path?query per RFC 9309 / Google parser)
        "http://w.test/page?sessionid=1": False,
        "http://w.test/page?other=1": True,
        # trailing $ anchors: .pdf blocked, .pdfx not
        "http://w.test/a/b.pdf": False,
        "http://w.test/a/b.pdfx": True,
        # wildcard-beats-prefix: Allow /public*.html (len 13) is more
        # specific than Disallow /public (len 7)
        "http://w.test/public/x.html": True,
        "http://w.test/public/x.txt": False,
        # mid-pattern $ is a literal octet, not an anchor
        "http://w.test/lit$eral/x": False,
        "http://w.test/literal/x": True,
        # $-anchored disallow blocks exactly the directory URL while
        # the equal-prefix allow keeps children ("/end/$" len 6 beats
        # "/end/" len 5 only on the exact match)
        "http://w.test/end/": False,
        "http://w.test/end/child": True,
    }
    pending = spark.createDataFrame(pd.DataFrame({
        "host": ["w.test"] * len(urls),
        "url": list(urls),
    }))
    kept = {r.url for r in robots_disallow_filter(pending, robots).collect()}
    assert kept == {u for u, keep in urls.items() if keep}


def test_compile_rule_regex_prefix_is_null(spark):
    """Plain prefixes compile to NULL so the fold keeps startswith."""
    from pyspark.sql import functions as F

    from ironspark.robots import compile_rule_regex

    df = spark.createDataFrame(
        pd.DataFrame({"p": ["/plain/", "/a*b", "/x$", "/mid$lit"]})
    ).select("p", compile_rule_regex(F.col("p")).alias("re"))
    got = {r.p: r.re for r in df.collect()}
    assert got["/plain/"] is None
    assert got["/a*b"] == "^/a.*b"
    assert got["/x$"] == "^/x$"
    # mid-pattern $ alone is literal -> not a wildcard rule
    assert got["/mid$lit"] is None
