"""Spider-trap throttling composed through the engine wave loop
(politeness.throttle_traps + cfg.trap_template_cap, round 6).

A session-id trap host (31 unique /s/<hex32> URLs forming a link tree)
and a clean numeric-pagination host crawled together: once the trap
host's pending set crosses trap_min_urls, its {H} template must be
capped to trap_template_cap scheduled URLs per wave — in FIFO (seq)
order, without dropping anything — while the clean host (a {D} template
below the min_urls gate) proceeds untouched and the crawl still drains
to normal idle shutdown.
"""

import hashlib

import pandas as pd
import pytest

from ironspark.config import EngineConfig
from ironspark.corpus import EPOCH
from ironspark.engine import CrawlEngine
from ironspark.schemas import PAGES_SCHEMA, SEEDS_SCHEMA
from ironspark.spider import LinkSpider

N_TRAP = 31  # full binary link tree of depth 4
N_OK = 6
CAP = 3


def _h(i: int) -> str:
    return hashlib.md5(f"trap{i}".encode()).hexdigest()


def _pages() -> pd.DataFrame:
    rows = []
    for i in range(N_TRAP):
        links = "".join(
            f'<a href="http://trap.example.com/s/{_h(c)}">next</a>'
            for c in (2 * i + 1, 2 * i + 2)
            if c < N_TRAP
        )
        html = f"<article>Session {i}<author>A {i % 5}</author>{links}</article>"
        rows.append(
            {
                "url": f"http://trap.example.com/s/{_h(i)}",
                "warc_ts": EPOCH,
                "html": html.encode(),
                "text": f"Session {i}",
                "lang": "en",
            }
        )
    for i in range(N_OK):
        nxt = (
            f'<a href="http://ok.example.com/page/{i + 1}">next</a>'
            if i + 1 < N_OK
            else ""
        )
        html = f"<article>Page {i}<author>B {i % 3}</author>{nxt}</article>"
        rows.append(
            {
                "url": f"http://ok.example.com/page/{i}",
                "warc_ts": EPOCH,
                "html": html.encode(),
                "text": f"Page {i}",
                "lang": "en",
            }
        )
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def run(spark, tmp_path_factory):
    run_dir = str(tmp_path_factory.mktemp("trap") / "run")
    pages = spark.createDataFrame(_pages(), PAGES_SCHEMA)
    seeds = spark.createDataFrame(
        pd.DataFrame(
            {
                "spider_id": [1, 1],
                "url": [
                    f"http://trap.example.com/s/{_h(0)}",
                    "http://ok.example.com/page/0",
                ],
                "seed_rank": [0, 1],
            }
        ),
        SEEDS_SCHEMA,
    )
    cfg = EngineConfig(
        dedup=True,
        respect_robots=False,
        trap_template_cap=CAP,
        trap_min_urls=8,
        trap_share=0.5,
        max_waves=40,
    )
    eng = CrawlEngine(spark, pages, {1: LinkSpider()}, cfg)
    stats = eng.run(seeds=seeds, run_dir=run_dir)
    order = eng.crawl_order_df(run_dir).toPandas()
    order["is_trap"] = order.url_canon.str.contains("/s/")
    return stats, order


def test_nothing_dropped(run):
    stats, order = run
    # every URL of both hosts fetched exactly once despite throttling
    assert order[order.is_trap].url_canon.nunique() == N_TRAP
    assert order[~order.is_trap].url_canon.nunique() == N_OK
    assert len(order) == N_TRAP + N_OK
    assert stats.fetched == N_TRAP + N_OK


def test_trap_capped_per_wave(run):
    _, order = run
    per_wave = order[order.is_trap].groupby("wave").size()
    # before the pending set reaches trap_min_urls=8 the BFS frontier
    # is at most 4 wide; while flagged the cap holds exactly; once the
    # pending tail drops below trap_min_urls the group is no longer a
    # trap and the remainder (< trap_min_urls) drains in one wave
    assert per_wave.max() <= max(4, 8 - 1)
    throttled_waves = (per_wave == CAP).sum()
    assert throttled_waves >= 5  # the tree drains cap-per-wave
    assert per_wave.iloc[-1] < 8  # unflagged tail burst is bounded
    # deferral stretches the crawl: an unthrottled BFS of depth 4
    # finishes the trap host in 5 waves
    assert order.wave.max() >= 9


def test_trap_fifo_order(run):
    _, order = run
    # each wave schedules the lowest-seq pending trap rows, and newly
    # discovered children always get higher seqs -> the fetched seq
    # sequence, ordered by wave, is globally increasing
    t = order[order.is_trap].sort_values(["wave", "seq"])
    seqs = list(t.seq)
    assert seqs == sorted(seqs)


def test_clean_host_unthrottled(run):
    _, order = run
    # /page/{D} never crosses trap_min_urls: the chain proceeds one
    # page per wave from wave 0 with no deferral
    ok = order[~order.is_trap].sort_values("wave")
    assert list(ok.wave) == list(range(N_OK))
