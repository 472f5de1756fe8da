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
