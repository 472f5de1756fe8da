"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k as the exact baseline, and an IVF-style
cluster-pruned variant as the scale path. Dot products run JVM-side via
``F.zip_with`` + ``F.aggregate`` (whole-stage codegen), not Python.

Scale shape: brute force is a full scan per query — fine batched (many
queries at once, one pass). IVF assigns vectors to the nearest of k
centroids once (cross join vs a BROADCAST centroid table), then each
query probes only its nearest centroid's partition: the scan shrinks
k-fold at the cost of recall at cluster borders (nprobe>1 restores it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_sim_col(a, b, decimals: int = 6):
    return F.round(
        _dot(a, b) / (_norm(a) * _norm(b)), decimals
    )


def cosine_topk(
    embeddings: DataFrame, query_vec: list[float], k: int = 10
) -> DataFrame:
    """Exact brute-force top-k by cosine similarity to query_vec.

    Deterministic tie-break: (sim DESC, vec_id ASC). Rounded to 6
    decimals so results are engine-portable.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = embeddings.select(
        "vec_id", cosine_sim_col(F.col("embedding"), q).alias("sim")
    )
    return scored.orderBy(F.col("sim").desc(), F.col("vec_id")).limit(k)


def ivf_assign(embeddings: DataFrame, n_centroids: int = 8) -> DataFrame:
    """Assign each vector to its nearest 'centroid' (the vectors with
    vec_id < n_centroids serve as deterministic centroids — a stand-in
    for a k-means pass, which would be run offline at scale).
    Returns (vec_id, centroid_id, sim_to_centroid)."""
    cents = embeddings.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("cvec"),
    )
    scored = embeddings.crossJoin(F.broadcast(cents)).withColumn(
        "csim", cosine_sim_col(F.col("embedding"), F.col("cvec"))
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("csim").desc(), F.col("centroid_id")
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("vec_id", "centroid_id", F.col("csim").alias("sim_to_centroid"))
    )


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
) -> DataFrame:
    """IVF search: probe the nprobe nearest centroids' clusters only."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    assign = ivf_assign(embeddings, n_centroids)
    cents = embeddings.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cvec")
    )
    probe = (
        cents.withColumn("qsim", cosine_sim_col(F.col("cvec"), q))
        .orderBy(F.col("qsim").desc(), F.col("centroid_id"))
        .limit(nprobe)
        .select("centroid_id")
    )
    cluster = embeddings.join(assign, "vec_id").join(
        F.broadcast(probe), "centroid_id"
    )
    scored = cluster.select(
        "vec_id", cosine_sim_col(F.col("embedding"), q).alias("sim")
    )
    return scored.orderBy(F.col("sim").desc(), F.col("vec_id")).limit(k)


def embedding_simhash(embeddings: DataFrame, bits: int = 12, dim: int = 16) -> DataFrame:
    """Random-hyperplane LSH signature over an embedding column.

    bit b = sign(dot(embedding[:dim], plane_b)) with DETERMINISTIC
    hyperplanes p(b, d) = (md5num("b:d") % 2001 - 1000) / 1000 — no RNG,
    reproducible across engines (the DuckDB oracle computes the same
    planes). Vectors whose signatures collide are near-dup candidates:
    the standard SRP-LSH for cosine similarity. Pure column arithmetic;
    the plane table is compile-time literals (bits x dim).

    Scale: one projection pass, no shuffle; the downstream bucket
    groupBy shuffles only (vec_id, signature) rows.
    """
    def plane(b: int, d: int) -> float:
        import hashlib

        h = int(hashlib.md5(f"{b}:{d}".encode()).hexdigest()[:15], 16)
        return (h % 2001 - 1000) / 1000.0

    emb = F.col("embedding")
    packed = None
    for b in range(bits):
        dot = None
        for d in range(dim):
            term = F.element_at(emb, d + 1) * F.lit(plane(b, d))
            dot = term if dot is None else dot + term
        # round before the sign test: FP summation order may differ
        # across engines, and a boundary flip would change the bucket
        bit = F.when(F.round(dot, 6) > 0, F.lit(1 << b)).otherwise(F.lit(0))
        packed = bit if packed is None else packed + bit
    return embeddings.select("vec_id", packed.cast("long").alias("esimhash"))


def embedding_near_dup(
    embeddings: DataFrame, bits: int = 12, dim: int = 16,
    threshold: float = 0.9, max_bucket: int = 200,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: SRP-LSH bucket join (same
    signature -> candidate) + exact cosine verify >= threshold.

    Scale: pair explosion is bounded per bucket (max_bucket guard, same
    rationale as the text-LSH boilerplate guard); the exact verify runs
    only on candidates, never all pairs. Round-7 shape (same fix as
    textops.lsh_candidate_pairs): buckets are formed by ONE signature
    hash-aggregate, guarded by a plain size filter, and pairs emitted
    per-row from the bounded id array — no self-join and no broadcast
    of the corpus-sized under-cap bucket list.
    """
    sig = embedding_simhash(embeddings, bits, dim)
    buckets = (
        sig.groupBy("esimhash")
        .agg(F.sort_array(F.collect_list("vec_id")).alias("_ids"))
        .filter(F.size("_ids").between(2, max_bucket))
    )
    ids = F.col("_ids")
    n = F.size(ids)
    pair_arr = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.transform(
                F.slice(ids, i + 1, n),
                lambda x: F.struct(
                    F.element_at(ids, i).alias("vec_a"), x.alias("vec_b")
                ),
            ),
        )
    )
    pairs = (
        buckets.select(F.explode(pair_arr).alias("_p"))
        .select(F.col("_p.vec_a").alias("vec_a"), F.col("_p.vec_b").alias("vec_b"))
        .distinct()
    )
    ea = embeddings.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a")
    )
    eb = embeddings.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b")
    )
    return (
        pairs.join(ea, "vec_a")
        .join(eb, "vec_b")
        .withColumn("sim", cosine_sim_col(F.col("emb_a"), F.col("emb_b")))
        .filter(F.col("sim") >= threshold)
        .select("vec_a", "vec_b", "sim")
    )


def kmeans_centroids(
    embeddings: DataFrame, k: int = 8, iters: int = 5
) -> list[list[float]]:
    """Lloyd's k-means over the embedding column, pure DataFrame ops:
    assignment = crossJoin vs BROADCAST centroids + window argmin;
    update = posexplode + groupBy(cluster, dim) avg. Two row-sized
    shuffles per iteration; centroids live driver-side (k x dim floats).
    Deterministic: seeded by the first k vectors in vec_id order (the
    same deterministic default ivf_assign uses), ties broken by id.
    """
    cents = [
        [float(x) for x in r["embedding"]]
        for r in embeddings.orderBy("vec_id").limit(k).collect()
    ]
    for _ in range(iters):
        cdf = embeddings.sparkSession.createDataFrame(
            [(i, c) for i, c in enumerate(cents)],
            "centroid_id int, cvec array<double>",
        )
        scored = embeddings.crossJoin(F.broadcast(cdf)).withColumn(
            "csim", cosine_sim_col(F.col("embedding"), F.col("cvec"))
        )
        w = Window.partitionBy("vec_id").orderBy(
            F.col("csim").desc(), F.col("centroid_id")
        )
        assign = (
            scored.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select("vec_id", "centroid_id", "embedding")
        )
        means = (
            assign.select(
                "centroid_id", F.posexplode("embedding").alias("dim", "v")
            )
            .groupBy("centroid_id", "dim")
            .agg(F.avg("v").alias("m"))
            .groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
            .select(
                "centroid_id",
                F.transform("dm", lambda s: s["m"]).alias("cvec"),
            )
            .collect()
        )
        got = {r["centroid_id"]: [float(x) for x in r["cvec"]] for r in means}
        cents = [got.get(i, cents[i]) for i in range(k)]
    return cents


class IVFIndex:
    """Persisted IVF index: build once, probe many.

    ``build`` writes the corpus joined with its centroid assignment,
    PARTITIONED BY centroid_id, plus the centroid table; ``search``
    scores the (tiny) centroid table against the query, picks nprobe
    cluster ids, and filters the partitioned scan on them — Spark's
    partition pruning reads ONLY those clusters' files (assert via
    the plan's PartitionFilters / selected-partition count). This is
    the production shape the round-1 ivf_topk lacked (it recomputed
    the assignment per query call).
    """

    def __init__(self, spark, path: str):
        self.spark = spark
        self.path = path

    @classmethod
    def build(
        cls,
        embeddings: DataFrame,
        path: str,
        n_centroids: int = 8,
        kmeans_iters: int = 0,
    ) -> "IVFIndex":
        """kmeans_iters=0 keeps the deterministic first-k centroids
        (oracle-friendly); >0 runs Lloyd iterations for real clusters."""
        spark = embeddings.sparkSession
        if kmeans_iters > 0:
            cents = kmeans_centroids(embeddings, n_centroids, kmeans_iters)
            cdf = spark.createDataFrame(
                [(i, c) for i, c in enumerate(cents)],
                "centroid_id int, cvec array<double>",
            )
        else:
            cdf = embeddings.orderBy("vec_id").limit(n_centroids).select(
                F.col("vec_id").cast("int").alias("centroid_id"),
                F.col("embedding").alias("cvec"),
            )
        scored = embeddings.crossJoin(F.broadcast(cdf)).withColumn(
            "csim", cosine_sim_col(F.col("embedding"), F.col("cvec"))
        )
        w = Window.partitionBy("vec_id").orderBy(
            F.col("csim").desc(), F.col("centroid_id")
        )
        assigned = (
            scored.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select("vec_id", "embedding", "centroid_id")
        )
        assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(
            f"{path}/vectors"
        )
        cdf.write.mode("overwrite").parquet(f"{path}/centroids")
        return cls(spark, path)

    def search(self, query_vec: list[float], k: int = 10, nprobe: int = 2) -> DataFrame:
        q = F.array(*[F.lit(float(x)) for x in query_vec])
        cents = self.spark.read.parquet(f"{self.path}/centroids")
        probe = [
            int(r["centroid_id"])
            for r in cents.withColumn("qsim", cosine_sim_col(F.col("cvec"), q))
            .orderBy(F.col("qsim").desc(), F.col("centroid_id"))
            .limit(nprobe)
            .collect()
        ]
        vecs = self.spark.read.parquet(f"{self.path}/vectors")
        cluster = vecs.filter(F.col("centroid_id").isin(probe))
        scored = cluster.select(
            "vec_id", cosine_sim_col(F.col("embedding"), q).alias("sim")
        )
        return scored.orderBy(F.col("sim").desc(), F.col("vec_id")).limit(k)


def knn_join_bruteforce(
    embeddings: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Batched exact kNN: every query row against the corpus in ONE
    pass (query table broadcast). Returns (query_id, vec_id, sim, rank)."""
    qs = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    scored = embeddings.crossJoin(F.broadcast(qs)).select(
        "query_id",
        "vec_id",
        cosine_sim_col(F.col("embedding"), F.col("qvec")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
