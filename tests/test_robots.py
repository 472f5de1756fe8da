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
    delay, dis = parse_robots_txt(SIMPLE)
    assert delay == 2.5 and dis == ["/private/"]


def test_agent_group_beats_star():
    delay, dis = parse_robots_txt(GROUPED, agent="ironspark")
    assert delay == 0.5 and dis == ["/secret/", "/tmp/"]
    delay, dis = parse_robots_txt(GROUPED, agent="unknownbot")
    assert delay == 10 and dis == ["/all/"]


def test_messy_lines():
    delay, dis = parse_robots_txt(MESSY, default_delay=1.0)
    assert delay == 1.0  # unparseable crawl-delay ignored
    assert dis == ["/x/"]  # empty Disallow means allow-all, skipped


def test_empty_and_none():
    assert parse_robots_txt("") == (1.0, [])
    assert parse_robots_txt(None) == (1.0, [])


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
