"""Single-threaded executable spec of the crawl semantics (SURVEY.md §5.2.2).

A direct, obviously-correct Python implementation of the canonical
crawl contract (reference semantics under single-threaded execution —
the only reproducible ordering contract, SURVEY.md §4.3.3):

* frontier is a FIFO list ordered by seq; seeds numbered by
  (spider_id, seed_rank, url_canon), links by (parent_seq, link_index)
* per wave: per-host budget floor(wave_seconds/crawl_delay), hosts take
  their lowest-seq pending rows; optional global cap by seq
* fetch = corpus lookup (hit -> 200, miss -> 404); accept < 400 or in
  allow codes; rejected retries next wave up to max_retry_times
* parse via ironspark.extract.parse_response (the byte-identity core)
* dedup: candidates self-deduped in (parent_seq, link_index) order,
  then dropped if url_canon ever enqueued

The distributed engine's crawl order, seen membership, and items must
match this executor exactly.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ironspark.extract import parse_response, harvest_links, decode_strict, \
    parse_article_html, article_text_of
from ironspark.url import canonicalize_url, host_of


@dataclass
class RefRow:
    url_canon: str
    url: str
    host: str
    spider_id: int
    seq: int
    wave: int
    attempt: int = 0


@dataclass
class RefResult:
    order: list = field(default_factory=list)  # (seq, wave, url_canon)
    seen: set = field(default_factory=set)  # every url_canon ever enqueued
    discovered: set = field(default_factory=set)  # reference mark_discovered
    items: list = field(default_factory=list)  # (spider_id, src_url, title, author, number, text, wave)
    waves: int = 0


def run_reference(
    corpus: dict[str, bytes],
    seeds: list[tuple[int, str, int]],  # (spider_id, url, seed_rank)
    *,
    dedup: bool = True,
    wave_seconds: float = 60.0,
    default_crawl_delay: float = 1.0,
    crawl_delays: dict[str, float] | None = None,
    max_wave_size: int | None = None,
    max_retry_times: int = 2,
    allow_codes: frozenset[int] = frozenset(),
    max_waves: int = 1000,
    spider_kind: str = "article",  # "article" | "link"
) -> RefResult:
    res = RefResult()
    crawl_delays = crawl_delays or {}

    # seed injection
    pending: list[RefRow] = []
    seq = 0
    for spider_id, url, seed_rank in sorted(
        seeds, key=lambda s: (s[0], s[2], canonicalize_url(s[1]) or "")
    ):
        uc = canonicalize_url(url)
        if uc is None:
            continue
        seq += 1
        if dedup and uc in res.seen:
            continue
        pending.append(RefRow(uc, url, host_of(url), spider_id, seq, 0))
        res.seen.add(uc)
    # NOTE: seq numbers are assigned BEFORE dedup for seeds in the spark
    # engine too (with_global_seq then _first_per_url keeps first)

    wave = 0
    while pending and wave < max_waves:
        # politeness select
        budget_used: dict[str, int] = {}
        scheduled: list[RefRow] = []
        deferred: list[RefRow] = []
        for row in sorted(pending, key=lambda r: r.seq):
            d = crawl_delays.get(row.host, default_crawl_delay)
            budget = max(1, int(wave_seconds / d))
            if budget_used.get(row.host, 0) < budget:
                budget_used[row.host] = budget_used.get(row.host, 0) + 1
                scheduled.append(row)
            else:
                deferred.append(row)
        if max_wave_size is not None and len(scheduled) > max_wave_size:
            deferred = scheduled[max_wave_size:] + deferred
            scheduled = scheduled[:max_wave_size]
        for row in scheduled:
            res.order.append((row.seq, wave, row.url_canon))

        # fetch + accept + retry
        retry: list[RefRow] = []
        accepted: list[tuple[RefRow, bytes]] = []
        for row in scheduled:
            body = corpus.get(row.url_canon)
            status = 200 if body is not None else 404
            ok = status < 400 or status in allow_codes
            if ok:
                accepted.append((row, body))
            elif row.attempt < max_retry_times:
                row.attempt += 1
                retry.append(row)

        # parse + enqueue
        candidates: list[tuple[int, int, int, str]] = []  # (parent_seq, link_index, spider_id, url)
        for row, body in accepted:
            if spider_kind == "article":
                item, links, discovered, text = parse_response(row.url, body)
                if item is not None:
                    title, author, number = item
                    res.items.append(
                        (row.spider_id, row.url, title, author, number, text, wave)
                    )
                if discovered:
                    res.discovered.add(row.url)
                for i, link in enumerate(links):
                    candidates.append((row.seq, i, row.spider_id, link))
            else:  # link spider
                html = decode_strict(body)
                if html is None:
                    continue
                parsed = parse_article_html(html)
                if parsed is not None:
                    res.items.append(
                        (row.spider_id, row.url, parsed[0], parsed[1], None,
                         article_text_of(html), wave)
                    )
                for i, link in enumerate(harvest_links(html, row.url)):
                    candidates.append((row.seq, i, row.spider_id, link))

        new_rows: list[RefRow] = []
        batch_seen: set[str] = set()
        for parent_seq, link_index, spider_id, url in sorted(candidates):
            uc = canonicalize_url(url)
            if uc is None:
                continue
            if dedup and (uc in res.seen or uc in batch_seen):
                continue
            batch_seen.add(uc)
            seq += 1
            new_rows.append(
                RefRow(uc, url, host_of(url), spider_id, seq, wave + 1)
            )
        for r in new_rows:
            res.seen.add(r.url_canon)

        pending = deferred + retry + new_rows
        wave += 1
        res.waves = wave

    return res
