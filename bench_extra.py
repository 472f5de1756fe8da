#!/usr/bin/env python
"""Ad-hoc per-operator benchmark for optimization work (round 7).

bench.py is FROZEN (driver contract) — this file exists so optimization
rounds can time subsets of queries, isolate computation with the noop
sink (spark_optimization_guide §1.4), and capture formatted plans,
without touching the frozen harness.

Usage:
  python bench_extra.py q1,q2,...     # time just these queries
  python bench_extra.py all           # every bench.py query
  IRONSPARK_BENCH_REPS=3  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1

Prints one JSON line: {"queries": {name: median_sec}, "reps": {...}}.
Methodology matches bench.py: 1 warmup rep (plan/codegen compile), then
median of REPS timed reps. `--noop` times a noop-sink write (computes
every column) instead of .count().
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("IRONSPARK_BENCH_REPS", "3"))


def main() -> None:
    try:
        os.sched_setaffinity(0, set(range(CPUS)))
    except (OSError, AttributeError):
        pass
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    noop = "--noop" in sys.argv
    explain_dir = None
    for a in sys.argv[1:]:
        if a.startswith("--explain="):
            explain_dir = a.split("=", 1)[1]

    from ironspark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("ironspark-bench-extra", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    if not args or args[0] == "all":
        names = [n for n in queries]
    else:
        names = args[0].split(",")

    def run(df) -> None:
        if noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()

    out: dict[str, float] = {}
    reps: dict[str, list[float]] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            plan = queries[name](spark, SF_DIR)._sc._jvm.PythonSQLUtils.explainString(
                queries[name](spark, SF_DIR)._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(explain_dir, f"{name}.txt"), "w") as fh:
                fh.write(plan)
        run(queries[name](spark, SF_DIR))  # warmup
        walls = []
        for _ in range(REPS):
            t0 = time.monotonic()
            run(queries[name](spark, SF_DIR))
            walls.append(round(time.monotonic() - t0, 3))
        reps[name] = walls
        out[name] = round(statistics.median(walls), 3)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "noop": noop,
                      "queries": out, "reps": reps}))


if __name__ == "__main__":
    main()
