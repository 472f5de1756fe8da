"""Round-5 additions: freshness-driven recrawl selection."""

import datetime

import pandas as pd

from ironspark.frontier import recrawl_due


def _hist(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "host", "ts"])
    )


def test_recrawl_due_interval_budget_and_order(spark):
    t0 = datetime.datetime(2024, 1, 1)
    day = datetime.timedelta(days=1)
    rows = [
        # host a: three due urls (ages 10, 9, 8 days), budget 2 keeps
        # the two stalest
        ("http://a/1", "a", t0),
        ("http://a/2", "a", t0 + day),
        ("http://a/3", "a", t0 + 2 * day),
        # a/3 refetched recently -> last_fetch wins, NOT due
        ("http://a/4", "a", t0),
        ("http://a/4", "a", t0 + 9 * day),
        # host b: one due url; n_fetches aggregates
        ("http://b/1", "b", t0),
        ("http://b/1", "b", t0 + day),
    ]
    now = t0 + 10 * day
    got = recrawl_due(
        _hist(spark, rows), now, interval_seconds=3 * 86400.0,
        per_host_budget=2,
    ).collect()
    by_url = {r.url: r for r in got}
    assert set(by_url) == {"http://a/1", "http://a/2", "http://b/1"}
    assert by_url["http://a/1"].age_seconds == 10 * 86400.0
    assert by_url["http://b/1"].n_fetches == 2
    assert by_url["http://b/1"].last_fetch == t0 + day


def test_recrawl_due_tie_break_deterministic(spark):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [(f"http://a/{i}", "a", t0) for i in (3, 1, 2)]
    got = recrawl_due(
        _hist(spark, rows), t0 + datetime.timedelta(days=5),
        interval_seconds=86400.0, per_host_budget=2,
    ).collect()
    # equal ages -> url ascending wins
    assert sorted(r.url for r in got) == ["http://a/1", "http://a/2"]
