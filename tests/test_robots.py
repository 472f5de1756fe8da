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
