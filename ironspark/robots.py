"""robots.txt parsing into the politeness budgets table (SURVEY.md F7).

The reference has no robots support (its politeness is one global
governor quota, ``src/config.rs:12``); the north rule requires per-host
robots crawl-delay honoring, so the engine consumes a
robots(host, crawl_delay, disallow) table. This module produces that
table from raw robots.txt bodies — fetched like any other page (they
live in the corpus at ``http://host/robots.txt`` or arrive via a
side-channel table of (host, robots_txt)).

Parsing follows RFC 9309 (the 2022 Robots Exclusion Protocol
standard): rules under ``User-agent: *`` (or a matching agent token),
``Disallow:`` AND ``Allow:`` path prefixes — precedence is decided at
match time by the longest matching rule, allow winning ties
(``politeness.robots_disallow_filter``) — plus the de-facto
``Crawl-delay:`` seconds. Wildcard (`*`/`$`) patterns, an RFC
SHOULD-level feature, are not implemented; prefix rules cover the
overwhelming majority of real robots files. Vectorized via
mapInPandas — the parse is pure Python per host, a few KB each.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

from ironspark.schemas import ROBOTS_SCHEMA


def parse_robots_txt(
    text: str, agent: str = "ironspark", default_delay: float = 1.0
) -> tuple[float, list[str], list[str]]:
    """(crawl_delay, disallow prefixes, allow prefixes) for the
    best-matching group.

    Group selection: a group whose User-agent token is a prefix of
    ``agent`` (case-insensitive) beats the ``*`` group; within a group,
    later directives accumulate. Unparseable lines are skipped.
    """
    groups: dict[str, dict] = {}
    current: list[str] = []
    seen_directive = True  # a UA line after directives starts a new group
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if seen_directive:
                current = []
                seen_directive = False
            ua = val.lower()
            current.append(ua)
            groups.setdefault(
                ua, {"disallow": [], "allow": [], "delay": None}
            )
        elif key in ("disallow", "allow", "crawl-delay"):
            seen_directive = True
            for ua in current:
                g = groups.setdefault(
                    ua, {"disallow": [], "allow": [], "delay": None}
                )
                if key in ("disallow", "allow"):
                    if val:
                        g[key].append(val)
                else:
                    try:
                        g["delay"] = float(val)
                    except ValueError:
                        pass

    agent_l = agent.lower()
    best = None
    for ua, g in groups.items():
        if ua != "*" and agent_l.startswith(ua):
            if best is None or len(ua) > len(best[0]):
                best = (ua, g)
    g = best[1] if best else groups.get("*")
    if g is None:
        return default_delay, [], []
    delay = g["delay"] if g["delay"] is not None else default_delay
    return delay, list(g["disallow"]), list(g["allow"])


def robots_table(
    robots_bodies: DataFrame, agent: str = "ironspark", default_delay: float = 1.0
) -> DataFrame:
    """(host, robots_txt) -> robots(host, crawl_delay, disallow, allow)."""

    def run(batches):
        for pdf in batches:
            hosts, delays, dis, alw = [], [], [], []
            for host, txt in zip(pdf["host"], pdf["robots_txt"]):
                d, rules, allows = parse_robots_txt(txt, agent, default_delay)
                hosts.append(host)
                delays.append(d)
                dis.append(rules)
                alw.append(allows)
            yield pd.DataFrame(
                {"host": hosts, "crawl_delay": delays, "disallow": dis,
                 "allow": alw}
            )

    return robots_bodies.select("host", "robots_txt").mapInPandas(
        run, ROBOTS_SCHEMA
    )
