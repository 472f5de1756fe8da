"""Semantic tests for the link-graph operators (ironspark.graph)."""

from pyspark.sql import functions as F

from ironspark.graph import degree_stats, pagerank_fixedpoint


def _edges(spark, rows):
    return spark.createDataFrame(rows, ["src", "dst"])


def test_degree_stats_counts_parallel_edges(spark):
    # 1 -> 2 twice (parallel), 1 -> 3, 3 -> 2; node 2 is a sink
    e = _edges(spark, [(1, 2), (1, 2), (1, 3), (3, 2)])
    out = {r["node"]: r for r in degree_stats(e).collect()}
    assert set(out) == {1, 2, 3}
    assert (out[1]["out_edges"], out[1]["out_nbrs"]) == (3, 2)
    assert (out[2]["in_edges"], out[2]["in_nbrs"]) == (3, 2)
    assert (out[2]["out_edges"], out[2]["out_nbrs"]) == (0, 0)
    assert (out[3]["out_edges"], out[3]["in_edges"]) == (1, 1)


def test_pagerank_fixedpoint_matches_hand_recurrence(spark):
    # two nodes, edge 1 -> 2; node 2 dangling. N=2, scale=1000 for
    # hand arithmetic: base = 500.
    # iter: dang = rank(2); contrib(2) = rank(1) DIV 1
    # rank'(v) = (15*500 + 85*(contrib + dang DIV 2)) DIV 100
    e = _edges(spark, [(1, 2)])
    scale = 1000
    r1, r2 = 500, 500
    for _ in range(3):
        dang_each = r2 // 2
        n1 = (15 * 500 + 85 * (0 + dang_each)) // 100
        n2 = (15 * 500 + 85 * (r1 // 1 + dang_each)) // 100
        r1, r2 = n1, n2
    out = {
        r["node"]: r["pr_scaled"]
        for r in pagerank_fixedpoint(e, iterations=3, scale=scale).collect()
    }
    assert out == {1: r1, 2: r2}


def test_pagerank_sink_gains_rank_and_is_deterministic(spark):
    # star into node 9: every other node links to it; 9 must rank top.
    rows = [(i, 9) for i in range(1, 9)] + [(9, 1)]
    e = _edges(spark, rows)
    out = {
        r["node"]: r["pr_scaled"]
        for r in pagerank_fixedpoint(e, iterations=5).collect()
    }
    assert max(out, key=out.get) == 9
    # bit-identical under a different partitioning (the integer-
    # arithmetic guarantee the docstring sells)
    out2 = {
        r["node"]: r["pr_scaled"]
        for r in pagerank_fixedpoint(
            e.repartition(7, "dst"), iterations=5
        ).collect()
    }
    assert out == out2


def test_pagerank_parallel_edges_weight_contributions(spark):
    # 1 -> 2 twice and 1 -> 3 once: node 2 gets twice node 3's
    # contribution share from node 1
    e = _edges(spark, [(1, 2), (1, 2), (1, 3), (2, 1), (3, 1)])
    out = {
        r["node"]: r["pr_scaled"]
        for r in pagerank_fixedpoint(e, iterations=4).collect()
    }
    assert out[2] > out[3]
