"""Utility formatting (M10) — pure-python, no Spark."""

from ironspark.utils import human_duration, human_number


def test_human_number():
    assert human_number(0) == "0"
    assert human_number(999) == "999"
    assert human_number(1200) == "1.2K"
    assert human_number(2_500_000) == "2.5M"
    assert human_number(3_000_000_000) == "3B"
    assert human_number(-1500) == "-1.5K"


def test_human_duration():
    assert human_duration(0) == "0s"
    assert human_duration(59) == "59s"
    assert human_duration(61) == "1m 1s"
    assert human_duration(93784) == "1d 2h 3m 4s"
    assert human_duration(3600) == "1h"


def test_human_bytes():
    from ironspark.utils import human_bytes

    assert human_bytes(512) == "512 B"
    assert human_bytes(123456) == "120.56 KiB"
    assert human_bytes(5 * 1024 * 1024) == "5.00 MiB"


def test_monitor_dashboard_renders():
    from ironspark.engine import CrawlStats
    from ironspark.monitor import render_dashboard

    stats = CrawlStats(
        waves=3, scheduled=1500, fetched=1400, failed=100, items=900,
        outlinks=5000, deduped=3500, unrouted=7, dropped=2,
        closed_spiders=2, wall_s=12.5,
        wave_walls=[4.0, 5.0, 3.5], wave_scheduled=[500, 600, 400],
    )
    text = render_dashboard(stats, pending_count=1234,
                            status_counts={200: 1400, 404: 100},
                            n_spiders=3)
    # the four reference panes, reference field labels
    for needle in (
        "Spider Manager Stats", "Scheduler Stats", "Downloader Stats",
        "Pipeline Manager Stats", "Queue Items: 1.2K",
        "Total Requests: 1.5K", "Dropped Responses   :     2",
        "Un-routed : 7", "Closed              :     2 (66.67%)",
        "  200: 1.4K",
    ):
        assert needle in text, f"missing {needle!r} in dashboard"
