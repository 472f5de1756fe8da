"""Web-link-graph analytics over an edge table.

A crawl's natural by-product is the directed host/page graph
(src url -> dst url from extracted links, ironspark.extract). These
operators consume any ``(src: long, dst: long)`` edge DataFrame —
parallel edges are kept and act as weights (a page linking twice
votes twice), matching the raw output of link extraction before any
dedup pass.

Everything is JVM-side ``pyspark.sql.functions`` — no Python UDFs —
and all arithmetic is **integer** so results are bit-reproducible
across engines, partitionings and cluster sizes (see
``pagerank_fixedpoint``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _nodes(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )


def degree_stats(edges: DataFrame) -> DataFrame:
    """Per-node degree profile: out/in edge counts and distinct
    neighbour counts. The first thing a crawl operator looks at
    (hub/authority shape, mega-domain detection for politeness
    budgeting, dead-end pages).

    Returns (node, out_edges, in_edges, out_nbrs, in_nbrs); nodes
    with no edges in a direction report 0.

    Scale: two hash-aggregates (by src, by dst) and two joins onto
    the node set — each keyed on the node id, so the whole plan is
    one shuffle exchange reused. count(distinct dst) inside the
    groupBy is a two-level partial aggregate; at 10^10 edges swap to
    approx_count_distinct (HLL) and accept the documented 2% error.
    """
    out = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("long").alias("out_edges"),
        F.countDistinct("dst").cast("long").alias("out_nbrs"),
    )
    inc = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count("*").cast("long").alias("in_edges"),
        F.countDistinct("src").cast("long").alias("in_nbrs"),
    )
    zero = F.lit(0).cast("long")
    return (
        _nodes(edges)
        .join(out, "node", "left")
        .join(inc, "node", "left")
        .select(
            "node",
            F.coalesce("out_edges", zero).alias("out_edges"),
            F.coalesce("in_edges", zero).alias("in_edges"),
            F.coalesce("out_nbrs", zero).alias("out_nbrs"),
            F.coalesce("in_nbrs", zero).alias("in_nbrs"),
        )
    )


def pagerank_fixedpoint(
    edges: DataFrame,
    iterations: int = 5,
    scale: int = 1_000_000_000,
    d_num: int = 85,
    d_den: int = 100,
) -> DataFrame:
    """Deterministic fixed-point PageRank (Page et al. 1999) over the
    link graph, with dangling-mass redistribution.

    Ranks are BIGINTs in units of 1/``scale``; every step is integer
    arithmetic (``DIV``), so the result is **bit-identical regardless
    of partition count, executor count, or aggregation order** — the
    property float PageRank lacks (parallel float sums reorder) and
    the reason this variant can be oracle-checked exactly and
    reproduced between a 10-node and a 1000-node cluster run. The
    truncation error per step is < 1 unit/edge, i.e. < 1e-9 * E of
    total mass per iteration at the default scale.

    Recurrence (per node v, per iteration):
        contrib(v)  = sum over in-edges (u,v) of rank(u) DIV outdeg(u)
        dang_each   = (sum of rank over outdeg-0 nodes) DIV N
        rank'(v)    = ((d_den - d_num)*base + d_num*(contrib(v) + dang_each)) DIV d_den
    with base = scale DIV N and rank_0 = base.

    Scale: per iteration, ONE shuffle that matters — the contribution
    aggregate keyed by dst. The rank table is nodes-sized (small next
    to edges); edges never reshuffle if pre-partitioned by src (the
    rank join then co-locates). The dangling sum is a 1-row aggregate
    broadcast back via crossJoin. Lineage is truncated each iteration
    with localCheckpoint (same plan-OOM guard as
    textops.near_dup_clusters) so 50 iterations do not build a
    500-join plan.
    """
    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    )
    nodes = _nodes(e)
    outdeg = e.groupBy("src").agg(F.count("*").cast("long").alias("outdeg"))
    n1 = nodes.agg(F.count("*").cast("long").alias("n_nodes"))
    state = (
        nodes.crossJoin(F.broadcast(n1))
        .withColumn("base", F.expr(f"CAST({scale} AS BIGINT) DIV n_nodes"))
        .withColumn("rank", F.col("base"))
        .select("node", "n_nodes", "base", "rank")
    )
    for _ in range(iterations):
        with_deg = state.join(
            outdeg, state["node"] == outdeg["src"], "left"
        ).select(
            state["node"],
            state["rank"],
            F.coalesce("outdeg", F.lit(0).cast("long")).alias("outdeg"),
        )
        dang = with_deg.filter(F.col("outdeg") == 0).agg(
            F.coalesce(F.sum("rank"), F.lit(0)).cast("long").alias("dang_sum")
        )
        contrib = (
            e.join(
                with_deg.filter(F.col("outdeg") > 0)
                .withColumnRenamed("node", "src"),
                "src",
            )
            .select("dst", F.expr("rank DIV outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").cast("long").alias("in_sum"))
        )
        state = (
            state.join(contrib, state["node"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(dang))
            .select(
                state["node"],
                state["n_nodes"],
                state["base"],
                F.expr(
                    f"(({d_den} - {d_num}) * base + {d_num} * "
                    "(coalesce(in_sum, CAST(0 AS BIGINT)) + "
                    f"dang_sum DIV n_nodes)) DIV {d_den}"
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return state.select("node", F.col("rank").alias("pr_scaled"))


def anchor_topk(links: DataFrame, k: int = 3) -> DataFrame:
    """Anchor-text aggregation: per target page, the top-k anchor words
    across every inbound link (the classic web-graph signal — anchor
    text describes the TARGET better than the target's own text; used
    for retrieval training data and document expansion).

    Input: ``(src: long, dst: long, anchor: string)`` link rows from
    extraction. Output one row per (dst, word) kept: inbound-link count
    for the page, the word's weighted count (a page linking twice votes
    twice), and its rank. Ties break (count desc, word asc) so the
    ranking is engine-reproducible.

    Scale: one explode + one (dst, word) hash-aggregate (map-side
    combine absorbs the repetition that makes an anchor word frequent),
    a dst-keyed inbound-count aggregate joined back (dst-sized, AQE
    broadcasts when it fits), and ONE window partitioned by dst for the
    top-k — the same shape as tfidf_topk, no all-pairs anywhere.
    """
    from pyspark.sql import Window

    words = links.select(
        "dst",
        F.explode(F.split(F.lower(F.col("anchor")), r"\s+")).alias("word"),
    ).filter(F.col("word") != "")
    wc = words.groupBy("dst", "word").agg(
        F.count("*").cast("long").alias("n_word")
    )
    inbound = links.groupBy("dst").agg(
        F.count("*").cast("long").alias("n_links")
    )
    win = Window.partitionBy("dst").orderBy(F.desc("n_word"), "word")
    return (
        wc.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= k)
        .join(inbound, "dst")
        .select(
            "dst",
            "word",
            "n_word",
            F.col("rn").cast("int").alias("rn"),
            "n_links",
        )
    )
