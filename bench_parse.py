#!/usr/bin/env python
"""Isolated parse-stage benchmark (guide §1.4: noop-sink isolation).

Times ONLY the per-page Python parse pass (decode + scanner + link
resolution + row building) over the crawl-bench corpus, via the same
mapInPandas shape the engine's parse stage uses, with a count() action
(the output is row-built in Python; nothing else to isolate). Short
reps so A/B pairs land inside one host era.

Env: SPARK_GRAFT_CPUS, IRONSPARK_BENCH_REPS (default 5),
IRONSPARK_CRAWL_PAGES (default 600000; the corpus must already exist
in the bench cache — run bench_crawl.py once to build it).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CACHE = os.environ.get("IRONSPARK_BENCH_CACHE", "/tmp/ironspark_bench")
REPS = int(os.environ.get("IRONSPARK_BENCH_REPS", "5"))
N_PAGES = int(os.environ.get("IRONSPARK_CRAWL_PAGES", "600000"))


def main() -> None:
    try:
        os.sched_setaffinity(0, set(range(CPUS)))
    except (OSError, AttributeError):
        pass

    import pandas as pd

    from ironspark.session import get_spark
    from ironspark.spider import LinkSpider

    spark = get_spark("ironspark-bench-parse", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    pdir = os.path.join(CACHE, f"pages_raw_{N_PAGES}_f{4 * CPUS}_td")
    if not os.path.isdir(pdir):
        pdir = os.path.join(CACHE, f"pages_{N_PAGES}".replace("pages_", "pages_0.1_") + f"_f{4 * CPUS}_td")
    pages = spark.read.parquet(pdir).select("url", "html")
    spider = LinkSpider()

    def run_parse(batches):
        for pdf in batches:
            out = spider.parse_batch(
                pd.DataFrame(
                    {
                        "url": pdf["url"],
                        "spider_id": 1,
                        "seq": range(len(pdf)),
                        "body": pdf["html"],
                    }
                )
            )
            yield pd.DataFrame({"kind": out["kind"].astype(str)})

    def one_rep() -> float:
        t0 = time.monotonic()
        spark.sparkContext.setJobDescription("bench_parse: parse stage only")
        df = pages.mapInPandas(run_parse, "kind string")
        df.count()
        return time.monotonic() - t0

    one_rep()  # warmup
    walls = [round(one_rep(), 3) for _ in range(REPS)]
    print(json.dumps({
        "pages": N_PAGES,
        "median_s": statistics.median(walls),
        "min_s": min(walls),
        "reps": walls,
    }))


if __name__ == "__main__":
    main()
