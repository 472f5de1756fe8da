#!/usr/bin/env python
"""Local sf1-scale PROXY tables for optimization A/B runs (round 7).

The driver generates its own sf1.0 tables at measurement time; this
sandbox only ships sf{0.001,0.01,0.1}. For before/after measurements
at sf1-like scale this script replicates sf0.1 x10 deterministically
into /root/testdata_local/sf1/ — key columns offset per replica so
join fan-outs and group cardinalities scale like a real x10, document
text word-permuted per replica (seeded by replica id) so cross-replica
rows are neither exact nor near duplicates (otherwise the LSH/dedup
operators would see a quadratic pair blowup no real corpus has).

Files are written as ONE parquet file with ONE row group per table —
the same layout property the driver's generated tables had in round 6
(a row group is the unit of scan parallelism; the single-task-scan
behavior under optimization is part of what we measure).

This is a measurement aid only: absolute walls are not comparable to
driver sf1.0 numbers (different data), but A/B deltas on identical
proxy data are valid. Never used by bench.py/oracles unless
SPARK_GRAFT_SF_DIR points at it explicitly.
"""

from __future__ import annotations

import hashlib
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = "/root/testdata_local/sf1"
REPLICAS = 10
# one offset unit per replica; a multiple of 1000, 100, 50, 20, 4 so
# every modulo pattern the entry queries use keeps its distribution
OFF = 10_000_000_000

COPY = ["region", "nation", "part", "supplier"]
REPL = {
    # table -> columns to offset by replica * OFF
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _permute_text(text: str, rep: int) -> str:
    """Deterministic word permutation keyed by (word, replica): same
    word multiset (token/vocab/tfidf costs preserved), shingle sets
    decorrelated across replicas (no synthetic near-dup explosion).
    Exact-duplicate docs within a replica stay exact duplicates."""
    words = text.split(" ")
    key = str(rep).encode()
    words.sort(
        key=lambda w: hashlib.md5(key + w.encode()).digest()
    )
    return " ".join(words)


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    one_rg = {"row_group_size": 1 << 31}
    for t in COPY:
        tab = pq.read_table(f"{SRC}/{t}.parquet")
        pq.write_table(tab, f"{DST}/{t}.parquet", **one_rg)
        print(f"copied {t}: {tab.num_rows}")
    for t, keys in REPL.items():
        tab = pq.read_table(f"{SRC}/{t}.parquet")
        parts = []
        for rep in range(REPLICAS):
            cols = {}
            for name in tab.schema.names:
                col = tab.column(name)
                if name in keys and rep > 0:
                    col = pa.compute.add(col, rep * OFF)
                elif t == "documents" and name == "text" and rep > 0:
                    col = pa.array(
                        [_permute_text(v.as_py(), rep) for v in col],
                        type=col.type,
                    )
                cols[name] = col
            parts.append(pa.table(cols, schema=None))
        big = pa.concat_tables(parts)
        pq.write_table(big, f"{DST}/{t}.parquet", **one_rg)
        print(f"replicated {t}: {tab.num_rows} -> {big.num_rows}")


if __name__ == "__main__":
    sys.exit(main())
