"""Bloom / cuckoo filter unit + equivalence tests (SURVEY.md §2.4 P7)."""

import numpy as np
import pandas as pd

from ironspark.seen import BloomFilter, CuckooFilter, build_bloom


def _urls(n, prefix="http://h.example.com/page/"):
    return pd.Series([f"{prefix}{i}" for i in range(n)])


def test_bloom_no_false_negatives():
    bf = BloomFilter(10_000, 0.01)
    urls = _urls(5000)
    bf.add_series(urls)
    assert bf.contains_series(urls).all()


def test_bloom_fpp_bounded():
    bf = BloomFilter(10_000, 0.01)
    bf.add_series(_urls(10_000))
    other = _urls(20_000, prefix="http://other.example.com/x/")
    fp = bf.contains_series(other).mean()
    assert fp < 0.03, f"false-positive rate {fp} above bound"


def test_bloom_merge_is_union():
    a, b = BloomFilter(1000, 0.01), BloomFilter(1000, 0.01)
    ua, ub = _urls(300), _urls(300, prefix="http://b.com/")
    a.add_series(ua)
    b.add_series(ub)
    a.merge(b)
    assert a.contains_series(ua).all() and a.contains_series(ub).all()


def test_bloom_distributed_build_matches_local(spark):
    urls = [f"http://h{i % 7}.com/p/{i}" for i in range(2000)]
    df = spark.createDataFrame([(u,) for u in urls], "url_canon string").repartition(8)
    dist = build_bloom(df, "url_canon", 4096, 0.01)
    local = BloomFilter(4096, 0.01)
    local.add_series(pd.Series(urls))
    assert np.array_equal(dist.bits, local.bits)


def test_cuckoo_insert_lookup_delete():
    cf = CuckooFilter(4096)
    urls = [f"http://h.com/{i}" for i in range(2000)]
    for u in urls:
        assert cf.add(u)
    assert all(cf.contains(u) for u in urls)
    # delete half, they disappear; others remain
    for u in urls[:1000]:
        assert cf.delete(u)
    assert all(cf.contains(u) for u in urls[1000:])
    # no false negatives for remaining; deleted mostly gone (fp possible)
    still = sum(cf.contains(u) for u in urls[:1000])
    assert still < 50


def test_cuckoo_capacity():
    cf = CuckooFilter(1000)
    ok = sum(cf.add(f"http://x.com/{i}") for i in range(1000))
    assert ok == 1000  # fits up to design capacity
