"""Parse stage: vectorized Arrow dispatch to per-spider parse functions.

Reference: responses parsed on a rayon pool by their owning spider
(``src/spider/manager.rs:156-186``); SpiderResult routing splits
requests from items (``:283-307``). Here the whole stage is ONE
``mapInPandas`` pass — each Arrow batch is grouped by spider_id and
handed to that spider's ``parse_batch``; the output unions outlink rows
(kind="request") and item rows (kind="item"), split downstream by two
cheap filters. Python-side work is batch-at-a-time, never per-row UDFs.
"""

from __future__ import annotations

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame

from ironspark.schemas import PARSE_OUT_SCHEMA

_PARSE_IN_COLS = ["url", "url_canon", "spider_id", "seq", "resp_status", "body_bytes"]
_OUT_COLS = [f.name for f in PARSE_OUT_SCHEMA.fields]


def _stat_row(pid: int, consumed: int) -> pd.DataFrame:
    row = {c: [None] for c in _OUT_COLS}
    row["kind"] = ["stat"]
    row["partition_id"] = [pid]
    row["number"] = [consumed]
    return pd.DataFrame(row)


def parse_responses(accepted: DataFrame, spiders: dict[int, object]) -> DataFrame:
    """accepted response rows -> PARSE_OUT rows (requests ∪ items ∪ stats)."""

    def run(batches):
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        consumed = 0
        for pdf in batches:
            if not len(pdf):
                continue
            consumed += len(pdf)
            pdf = pdf.rename(columns={"body_bytes": "body"})
            for sid, grp in pdf.groupby("spider_id", sort=True):
                spider = spiders.get(int(sid))
                if spider is None:  # unregistered spider: dropped (metric)
                    continue
                out = spider.parse_batch(grp)
                if len(out):
                    out["partition_id"] = pid
                    yield out[_OUT_COLS]
        yield _stat_row(pid, consumed)

    return accepted.select(*_PARSE_IN_COLS).mapInPandas(run, PARSE_OUT_SCHEMA)
