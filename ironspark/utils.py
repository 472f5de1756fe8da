"""Presentation helpers (SURVEY.md §2.7 M10; reference src/utils.rs:3-44)."""

from __future__ import annotations

_UNITS = ["", "K", "M", "B", "T", "Q"]


def human_number(n: float) -> str:
    """1234 -> '1.2K', 2_500_000 -> '2.5M' (reference human_number,
    src/utils.rs:29-44: K/M/B/T/Q thousands steps, one decimal)."""
    n = float(n)
    neg = n < 0
    n = abs(n)
    i = 0
    while n >= 1000 and i < len(_UNITS) - 1:
        n /= 1000.0
        i += 1
    s = f"{n:.1f}".rstrip("0").rstrip(".") if i else f"{int(n)}"
    return ("-" if neg else "") + s + _UNITS[i]


_BYTE_UNITS = ["B", "KiB", "MiB", "GiB", "TiB", "PiB"]


def human_bytes(n: float) -> str:
    """123456 -> '120.56 KiB' (reference Byte::get_appropriate_unit(
    UnitType::Binary) formatting in src/downloader/stat.rs:77-81)."""
    n = float(n)
    i = 0
    while n >= 1024 and i < len(_BYTE_UNITS) - 1:
        n /= 1024.0
        i += 1
    return f"{int(n)} B" if i == 0 else f"{n:.2f} {_BYTE_UNITS[i]}"


def human_duration(seconds: float) -> str:
    """93784s -> '1d 2h 3m 4s' (reference human_duration, src/utils.rs:3-27)."""
    s = int(seconds)
    parts = []
    for unit, width in (("d", 86400), ("h", 3600), ("m", 60)):
        if s >= width:
            parts.append(f"{s // width}{unit}")
            s %= width
    if s or not parts:
        parts.append(f"{s}s")
    return " ".join(parts)
