"""Round-7 optimization pins.

Each test guards one optimization from OPTIMIZATION_r07.md:
- the LSH bucket-guard broadcast inversion (VERDICT r6 #1),
- the BPE driver-side finishing switch (VERDICT r6 #5),
- the connected-components star-forest convergence probe (VERDICT r6 #3),
- the r6 ADVICE guards (hits iterations, near_dup_clusters algorithm).
"""

import pytest
from pyspark.sql import functions as F

from ironspark.graph import (
    _star_violations,
    connected_components,
    hits_fixedpoint,
)
from ironspark.textops import (
    _bpe_merge_rounds,
    _incr_candidates,
    lsh_candidate_pairs,
    minhash_signatures,
    near_dup_clusters,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


NEAR_DUP_TEXTS = [
    "the quick brown fox jumps over the lazy dog tonight",
    "the quick brown fox jumps over the lazy dog today",
    "a completely different document about spark physical plans",
    "the quick brown fox jumps over the lazy dog tonight",
]


def test_lsh_bucket_guard_is_not_hint_broadcast(spark):
    # VERDICT r6 #1: the under-cap bucket-key list (corpus-sized at
    # scale) must never be FORCE-broadcast — the guard join now carries
    # no broadcast hint (AQE may still broadcast at runtime when the
    # list actually fits, which is the point), so the analyzed plan
    # must contain no hint node.
    analyzed = (
        lsh_candidate_pairs(_docs(spark, NEAR_DUP_TEXTS), bands=4)
        ._jdf.queryExecution().analyzed().toString()
    )
    assert "Hint" not in analyzed
    # and it still finds the near-dup pairs
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(_docs(spark, NEAR_DUP_TEXTS), bands=4).collect()
    }
    assert (0, 3) in pairs  # exact dup docs share every bucket


def test_embedding_near_dup_pair_generation_is_join_free(spark):
    # the embedding variant keeps the pure-aggregate bucket-array shape:
    # the candidate-pair subplan has no join and no broadcast at all
    from ironspark.ann import embedding_simhash

    emb = spark.createDataFrame(
        [(i, [float((i * 7 + d) % 5 - 2) for d in range(16)]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    sig = embedding_simhash(emb, bits=4, dim=16)
    # reproduce the pair-generation subplan exactly as embedding_near_dup
    # builds it (pre-verify): bucket agg + per-row pair array
    from pyspark.sql import functions as F2

    buckets = (
        sig.groupBy("esimhash")
        .agg(F2.sort_array(F2.collect_list("vec_id")).alias("_ids"))
        .filter(F2.size("_ids").between(2, 200))
    )
    plan = buckets._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "BroadcastExchange" not in plan


def test_incremental_candidate_guard_broadcasts_only_overcap_side(spark):
    # the only BroadcastExchange in the candidate plan must feed the
    # LEFT-ANTI join that removes over-cap buckets; the under-cap
    # (corpus-sized) side must not be broadcast anywhere.
    new = _docs(spark, NEAR_DUP_TEXTS[:1])
    old = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(NEAR_DUP_TEXTS[1:])],
        ["doc_id", "text"],
    )
    cand = _incr_candidates(
        minhash_signatures(new, 4), minhash_signatures(old, 4), max_bucket=50
    )
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastExchange") == 1
    anti = plan.find("LeftAnti")
    bc = plan.find("BroadcastExchange")
    assert anti != -1 and bc > anti  # the broadcast is the anti-join's build side
    got = {(r["doc_a"], r["doc_b"]) for r in cand.collect()}
    assert (0, 102) in got  # new doc 0 == corpus doc 102 (same text)


def test_bpe_driver_and_distributed_paths_agree_at_100_merges(spark):
    # VERDICT r6 #5 done-criterion: parity distributed-vs-switched at
    # >= 100 merges. driver_max_vocab=0 forces the distributed loop.
    texts = [
        "low lower lowest newer newest wide widely widest " * 3,
        "banana bandana cabana analog and sand band bland stand",
        "abc abd abe acc accc abab ababab baba bcbc cbcb",
        "internationalization localization realization optimization",
        # enough distinct multi-char words that the merge loop does not
        # exhaust before 100 rounds
        " ".join(f"w{i}x{i * 7 % 100}y{i * 13 % 100}" for i in range(120)),
    ] * 2
    words = (
        _docs(spark, texts)
        .select(F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    driver = _bpe_merge_rounds(words, 120, driver_max_vocab=10**9)
    dist = _bpe_merge_rounds(words, 120, driver_max_vocab=0)
    assert len(driver) >= 100
    assert driver == dist


def test_star_violations_detects_fixpoint_exactly(spark):
    def edges(rows):
        return spark.createDataFrame(rows, "u long, v long")

    # disjoint stars rooted at minima: a fixpoint -> zero violations
    assert _star_violations(edges([(1, 2), (1, 3), (10, 11)])) == 0
    # a chain is NOT a star forest (2 is both a hub side and a leaf)
    assert _star_violations(edges([(1, 2), (2, 3)])) > 0
    # a v-side node with two hubs is a violation
    assert _star_violations(edges([(1, 3), (2, 3)])) > 0
    # empty edge set: trivially converged
    assert _star_violations(edges([]).limit(0)) == 0


def test_components_still_correct_on_chain_and_star(spark):
    # the convergence probe changed (star-forest aggregate instead of
    # two exceptAll diffs) — labels must be unchanged
    rows = [(i, i + 1) for i in range(0, 12)] + [(20, 21), (21, 22), (30, 30)]
    e = spark.createDataFrame(rows, ["src", "dst"])
    out = {r["node"]: r["component"] for r in connected_components(e).collect()}
    assert all(out[n] == 0 for n in range(13))
    assert out[20] == out[21] == out[22] == 20
    assert out[30] == 30


def test_hits_rejects_zero_iterations(spark):
    e = spark.createDataFrame([(1, 2)], ["src", "dst"])
    with pytest.raises(ValueError):
        hits_fixedpoint(e, iterations=0)


def test_near_dup_clusters_rejects_unknown_algorithm(spark):
    with pytest.raises(ValueError):
        near_dup_clusters(_docs(spark, NEAR_DUP_TEXTS), algorithm="stars")


def test_bpe_shared_words_matches_unshared(spark):
    # round-7 second pass: _t_bpe_tokens shares ONE _word_freqs table
    # between bpe_train and bpe_encode — results must equal the
    # unshared two-pass shape exactly
    from ironspark.textops import _word_freqs, bpe_encode, bpe_train

    d = _docs(
        spark,
        ["low lower lowest", "newer newest new", "low low newest"] * 3,
    )
    w = _word_freqs(d).localCheckpoint(eager=False)
    m_shared = bpe_train(d, num_merges=5, words=w)
    m_plain = bpe_train(d, num_merges=5)
    assert sorted(map(tuple, m_shared.collect())) == sorted(
        map(tuple, m_plain.collect())
    )
    t_shared = {
        (r["token"], r["n_tokens"])
        for r in bpe_encode(d, m_shared, words=w).collect()
    }
    t_plain = {
        (r["token"], r["n_tokens"])
        for r in bpe_encode(d, m_plain).collect()
    }
    assert t_shared == t_plain


def test_g_edges_fan_out_is_result_identical(spark):
    # the hash fan-out is a pure repartition: the edge MULTISET must
    # be byte-identical with and without it
    import os

    import __spark_entry__ as em

    sfd = "/root/testdata/sf0.001"
    if not os.path.isdir(sfd):
        pytest.skip("no testdata in this environment")

    def multiset(fan):
        return {
            (r["src"], r["dst"], r["n"])
            for r in em._g_edges(spark, sfd, fan_out=fan)
            .groupBy("src", "dst")
            .agg(F.count("*").alias("n"))
            .collect()
        }

    assert multiset(False) == multiset(True)
