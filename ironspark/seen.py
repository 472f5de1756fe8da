"""URL-seen set: exact anti-join oracle + partitioned Bloom scale path.

Reference semantics: the example spider's discovered ``HashSet``
(``examples/basic_spider.rs:29,75-89``) and, for frontier dedup, the
set of every URL ever enqueued. Contract (north rule): membership must
EXACTLY match the reference's set — so the Bloom filter only ever
*prunes* ("definitely new" rows skip the join); every "maybe seen" row
is confirmed by an exact anti-join. False positives cannot leak.

Bloom construction is distributed: each partition builds a numpy bitset
over its url_canon hashes inside a mapInPandas pass, partial bitsets
are OR-merged (treeAggregate-style: numpy OR on the driver over ≤ a few
hundred partition bitsets), and the merged filter is broadcast for the
next wave's membership test. A cuckoo filter (deletable fingerprints,
for re-crawl invalidation) is provided as a per-partition alternative.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# hashing: deterministic, process-independent (no PYTHONHASHSEED traps)
# ---------------------------------------------------------------------------

def _hash128(s: str) -> tuple[int, int]:
    d = hashlib.md5(s.encode("utf-8", "surrogatepass")).digest()
    return int.from_bytes(d[:8], "little"), int.from_bytes(d[8:], "little")


def _hash128_series(urls: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    h1 = np.empty(len(urls), dtype=np.uint64)
    h2 = np.empty(len(urls), dtype=np.uint64)
    for i, u in enumerate(urls):
        a, b = _hash128(u or "")
        h1[i], h2[i] = a, b
    return h1, h2


class BloomFilter:
    """Double-hashing Bloom filter over a numpy bitset (k = h1 + i*h2)."""

    def __init__(self, capacity: int, fpp: float = 0.01):
        m = int(-capacity * np.log(fpp) / (np.log(2) ** 2))
        self.m = max(64, (m + 63) // 64 * 64)
        self.k = max(1, int(round(self.m / max(capacity, 1) * np.log(2))))
        self.bits = np.zeros(self.m // 64, dtype=np.uint64)

    def _positions(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        # (n, k) bit positions via double hashing
        ks = np.arange(self.k, dtype=np.uint64)
        return (h1[:, None] + ks[None, :] * h2[:, None]) % np.uint64(self.m)

    def add_hashes(self, h1: np.ndarray, h2: np.ndarray) -> None:
        pos = self._positions(h1, h2).ravel()
        np.bitwise_or.at(self.bits, pos >> 6, np.uint64(1) << (pos & np.uint64(63)))

    def contains_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        pos = self._positions(h1, h2)
        got = (self.bits[pos >> 6] >> (pos & np.uint64(63))) & np.uint64(1)
        return got.all(axis=1)

    def add_series(self, urls: pd.Series) -> None:
        if len(urls):
            self.add_hashes(*_hash128_series(urls))

    def contains_series(self, urls: pd.Series) -> np.ndarray:
        if not len(urls):
            return np.zeros(0, dtype=bool)
        return self.contains_hashes(*_hash128_series(urls))

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.m == other.m and self.k == other.k
        self.bits |= other.bits
        return self


def build_bloom(df: DataFrame, url_col: str, capacity: int, fpp: float) -> BloomFilter:
    """Distributed build: per-partition bitsets OR-merged on the driver.

    The shipped unit is the fixed-size bitset (m/8 bytes), never rows —
    at 10^10 URLs with fpp 1% that is ~1.4 GB of bits total, built as
    one numpy array per partition and OR-reduced (tree reduction over
    partition results is what RDD.treeAggregate does; with bitsets the
    OR is associative/commutative so driver-side reduce is identical).
    """
    proto = BloomFilter(capacity, fpp)
    m, k = proto.m, proto.k

    def partial(batches):
        bf = BloomFilter(2, 0.5)  # shell; overwrite geometry
        bf.m, bf.k = m, k
        bf.bits = np.zeros(m // 64, dtype=np.uint64)
        for pdf in batches:
            bf.add_series(pdf[url_col])
        yield pd.DataFrame({"bits": [bf.bits.tobytes()]})

    parts = df.select(url_col).mapInPandas(partial, "bits binary").collect()
    for row in parts:
        proto.bits |= np.frombuffer(row["bits"], dtype=np.uint64)
    return proto


def bloom_maybe_udf(spark, bloom: BloomFilter):
    """Broadcast the bitset; return a vectorized membership-test UDF."""
    bcast = spark.sparkContext.broadcast((bloom.m, bloom.k, bloom.bits.tobytes()))

    def maybe_seen(urls: pd.Series) -> pd.Series:
        m, k, raw = bcast.value
        bf = BloomFilter(2, 0.5)
        bf.m, bf.k = m, k
        bf.bits = np.frombuffer(raw, dtype=np.uint64)
        return pd.Series(bf.contains_series(urls))

    return F.pandas_udf(maybe_seen, "boolean")


class ShardedBloom:
    """Incremental URL-seen Bloom as broadcast SLICES (LSM-style).

    The naive scale path re-broadcasts the full merged bitset every wave
    — O(total-seen-geometry) bytes on the wire per wave, and superseded
    broadcasts pile up on driver and executors (a slow leak across
    hundreds of waves). Instead each wave's NEW urls build one
    fixed-geometry delta slice that is broadcast ONCE and never re-sent;
    membership is the OR over the live slices (hashes computed once per
    batch, shared across slices). When more than ``max_slices``
    accumulate, they are OR-compacted into one (same geometry -> bitwise
    OR is exact) and every superseded broadcast is released.

    Per wave: exactly one delta-sized broadcast (plus one on compaction
    waves); live executor memory is bounded by ``max_slices + 1``
    bitsets. This is the K-slice sharding docs/SCALE.md derives for the
    10^10-URL frontier: size ``capacity`` so one slice's bitset stays in
    the broadcast comfort zone and the slice count, not the bitset,
    absorbs growth. Exactness is unaffected — the Bloom only ever
    PRUNES; "maybe seen" rows are still confirmed by the exact
    anti-join (see BloomSeen/engine._filter_new).
    """

    def __init__(self, spark, capacity: int, fpp: float = 0.01, max_slices: int = 8):
        self.spark = spark
        self.capacity = capacity
        self.fpp = fpp
        self.max_slices = max_slices
        self._slices: list = []  # [(Broadcast[(m,k,bytes)], BloomFilter)]
        # bookkeeping asserted by tests: broadcasts created / released
        self.n_broadcast = 0
        self.n_unpersisted = 0

    @property
    def n_slices(self) -> int:
        return len(self._slices)

    def _push(self, bf: BloomFilter) -> None:
        b = self.spark.sparkContext.broadcast((bf.m, bf.k, bf.bits.tobytes()))
        self.n_broadcast += 1
        self._slices.append((b, bf))
        if len(self._slices) > self.max_slices:
            merged = BloomFilter(self.capacity, self.fpp)
            for _, part in self._slices:
                assert part.m == merged.m and part.k == merged.k
                merged.bits |= part.bits
            for b_old, _ in self._slices:
                b_old.unpersist()
                self.n_unpersisted += 1
            self._slices = []
            self._push(merged)  # recurses at most once (1 <= max_slices)

    def add_delta(self, df: DataFrame, url_col: str = "url_canon") -> None:
        """Build + broadcast ONE slice from this wave's new urls only."""
        self._push(build_bloom(df, url_col, self.capacity, self.fpp))

    def add_local(self, urls) -> None:
        """Driver-side add (small seed batches; avoids a Spark job)."""
        bf = BloomFilter(self.capacity, self.fpp)
        bf.add_series(pd.Series(list(urls)))
        self._push(bf)

    def maybe_seen_udf(self):
        """Vectorized membership UDF over the live slices. Broadcast
        payloads ship to an executor at most once (Spark broadcast
        semantics); only the handle list is re-pickled per wave."""
        handles = [b for b, _ in self._slices]

        def maybe_seen(urls: pd.Series) -> pd.Series:
            if not handles or not len(urls):
                return pd.Series(np.zeros(len(urls), dtype=bool))
            h1, h2 = _hash128_series(urls)
            out = np.zeros(len(urls), dtype=bool)
            for h in handles:
                m, k, raw = h.value
                bf = BloomFilter(2, 0.5)
                bf.m, bf.k = m, k
                bf.bits = np.frombuffer(raw, dtype=np.uint64)
                out |= bf.contains_hashes(h1, h2)
            return pd.Series(out)

        return F.pandas_udf(maybe_seen, "boolean")

    def unpersist_all(self) -> None:
        for b, _ in self._slices:
            b.unpersist()
            self.n_unpersisted += 1
        self._slices = []


class ExactSeen:
    """Correctness-oracle backend: plain anti-join against the seen table."""

    def __init__(self, seen_df: DataFrame):
        self.df = seen_df.select("url_canon")

    def filter_new(self, candidates: DataFrame) -> DataFrame:
        return candidates.join(self.df, "url_canon", "left_anti")

    def union(self, new_urls: DataFrame) -> DataFrame:
        return self.df.unionByName(new_urls.select("url_canon")).distinct()


class BloomSeen:
    """Scale backend: broadcast Bloom prune + exact confirm join.

    filter_new splits candidates inside a vectorized UDF: Bloom says
    "definitely new" (bypass the shuffle join entirely — at steady
    state the vast majority of discovered links) or "maybe seen" (exact
    anti-join on the small residue). Result is EXACTLY the anti-join
    answer; the Bloom only prunes join input.
    """

    def __init__(self, seen_df: DataFrame, capacity: int = 1 << 20, fpp: float = 0.01):
        self.df = seen_df.select("url_canon")
        self.capacity = capacity
        self.fpp = fpp
        self._bloom = build_bloom(self.df, "url_canon", capacity, fpp)

    def filter_new(self, candidates: DataFrame) -> DataFrame:
        maybe_seen = bloom_maybe_udf(candidates.sparkSession, self._bloom)
        tagged = candidates.withColumn("_maybe", maybe_seen(F.col("url_canon")))
        definite_new = tagged.filter(~F.col("_maybe")).drop("_maybe")
        confirm = (
            tagged.filter(F.col("_maybe"))
            .drop("_maybe")
            .join(self.df, "url_canon", "left_anti")
        )
        return definite_new.unionByName(confirm)

    def union(self, new_urls: DataFrame) -> "BloomSeen":
        merged = self.df.unionByName(new_urls.select("url_canon")).distinct()
        return BloomSeen(merged, self.capacity, self.fpp)


class ShardedCuckoo:
    """Deletable URL-seen prune: K cuckoo shards keyed by h1 % K.

    The north-rule fallback for DELETABLE entries (re-crawl
    invalidation): Bloom bits can't be unset, so a deleted url would
    stay "maybe seen" forever — harmless for exactness (the exact
    anti-join re-admits it) but a permanent prune leak. Cuckoo
    fingerprints delete cleanly, keeping the prune tight across
    invalidations.

    Cuckoo tables don't OR-merge, so they are SHARDED, not merged:
    insert/lookup/delete route by h1(url) % K. Inserts and deletes are
    driver-side (python loops over numpy tables — the jar-like state),
    membership tests are vectorized per Arrow batch against the
    broadcast shard tables. Same contract as ShardedBloom: prune only,
    exact join confirms.
    """

    def __init__(self, spark, capacity: int, shards: int = 4):
        self.spark = spark
        self.shards = [CuckooFilter(max(capacity // shards, 1024))
                       for _ in range(shards)]
        self._bcast = None
        self.n_broadcast = 0
        self.n_unpersisted = 0

    def _shard_of(self, url: str) -> CuckooFilter:
        return self.shards[_hash128(url or "")[0] % len(self.shards)]

    def add_urls(self, urls) -> None:
        for u in urls:
            self._shard_of(u).add(u)
        self._invalidate_bcast()

    def delete_urls(self, urls) -> list[str]:
        """Remove urls from the prune set; returns those actually found."""
        out = [u for u in urls if self._shard_of(u).delete(u)]
        self._invalidate_bcast()
        return out

    def add_df(self, df: DataFrame, url_col: str = "url_canon") -> None:
        self.add_urls([r[url_col] for r in df.select(url_col).collect()])

    def _invalidate_bcast(self) -> None:
        if self._bcast is not None:
            self._bcast.unpersist()
            self.n_unpersisted += 1
            self._bcast = None

    @property
    def n_slices(self) -> int:  # ShardedBloom-compatible probe
        return sum(1 for s in self.shards if s.size)

    def maybe_seen_udf(self):
        if self._bcast is None:
            self._bcast = self.spark.sparkContext.broadcast(
                [(s.nbuckets, s.table.tobytes()) for s in self.shards]
            )
            self.n_broadcast += 1
        bcast = self._bcast
        n_shards = len(self.shards)

        def maybe_seen(urls: pd.Series) -> pd.Series:
            tables = []
            for nbuckets, raw in bcast.value:
                cf = CuckooFilter(4)
                cf.nbuckets = nbuckets
                cf.table = np.frombuffer(raw, dtype=np.uint16).reshape(
                    nbuckets, CuckooFilter.SLOTS
                )
                tables.append(cf)
            out = np.zeros(len(urls), dtype=bool)
            for i, u in enumerate(urls):
                out[i] = tables[_hash128(u or "")[0] % n_shards].contains(u)
            return pd.Series(out)

        return F.pandas_udf(maybe_seen, "boolean")

    def unpersist_all(self) -> None:
        self._invalidate_bcast()


# ---------------------------------------------------------------------------
# Cuckoo filter: deletable membership (re-crawl invalidation)
# ---------------------------------------------------------------------------

class CuckooFilter:
    """Bucketed cuckoo filter (4-slot buckets, 16-bit fingerprints).

    Supports delete — the property Bloom lacks — for re-crawl
    invalidation (north-rule "cuckoo fallback for deletable entries").
    Partitioned use at scale: one filter per host-bucket partition,
    applied partition-locally after repartitioning by the same key
    (cuckoo tables don't OR-merge, so they are sharded, not merged).
    """

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, capacity: int):
        nbuckets = 1
        while nbuckets * self.SLOTS < capacity * 1.05:
            nbuckets <<= 1
        self.nbuckets = nbuckets
        self.table = np.zeros((nbuckets, self.SLOTS), dtype=np.uint16)
        self.size = 0

    def _fp_and_buckets(self, url: str) -> tuple[int, int, int]:
        h1, h2 = _hash128(url)
        fp = (h1 & 0xFFFF) or 1  # 0 means empty slot
        i1 = int(h2 % self.nbuckets)
        i2 = (i1 ^ int(_hash128(str(fp))[0])) % self.nbuckets
        return fp, i1, i2

    def _try_put(self, fp: int, i: int) -> bool:
        row = self.table[i]
        empty = np.flatnonzero(row == 0)
        if len(empty):
            row[empty[0]] = fp
            return True
        return False

    def add(self, url: str) -> bool:
        fp, i1, i2 = self._fp_and_buckets(url)
        if self._try_put(fp, i1) or self._try_put(fp, i2):
            self.size += 1
            return True
        # evict: deterministic slot walk (no RNG — reproducibility)
        i = i1
        for kick in range(self.MAX_KICKS):
            slot = kick % self.SLOTS
            fp, self.table[i][slot] = int(self.table[i][slot]), fp
            i = (i ^ int(_hash128(str(fp))[0])) % self.nbuckets
            if self._try_put(fp, i):
                self.size += 1
                return True
        return False  # table full

    def contains(self, url: str) -> bool:
        fp, i1, i2 = self._fp_and_buckets(url)
        return bool((self.table[i1] == fp).any() or (self.table[i2] == fp).any())

    def delete(self, url: str) -> bool:
        fp, i1, i2 = self._fp_and_buckets(url)
        for i in (i1, i2):
            hit = np.flatnonzero(self.table[i] == fp)
            if len(hit):
                self.table[i][hit[0]] = 0
                self.size -= 1
                return True
        return False
