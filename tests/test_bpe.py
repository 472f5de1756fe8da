"""BPE merge learning (textops.bpe_train, round 6).

Parity against an independent pure-Python reference implementation of
textbook BPE (Sennrich et al. 2016): word-frequency table, overlapping
zip-adjacent pair counts, (count desc, pair asc) argmax, greedy
one-pass left-to-right merge application. The Spark operator represents
symbol sequences as padded double-space-joined strings and applies
merges via literal replace; the reference works on symbol lists — if
the string encoding leaked (boundary-crossing matches, consumed
separators, re-merge within a round) the merge lists would diverge.
"""

import collections

import pandas as pd
import pytest

from ironspark.textops import bpe_train


def _ref_bpe(texts, num_merges):
    vocab = collections.Counter()
    for t in texts:
        for w in t.lower().split():
            if w:
                vocab[w] += 1
    words = {w: [tuple(w), f] for w, f in vocab.items()}

    def merge_word(syms, pair):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return tuple(out)

    merges = []
    for rank in range(1, num_merges + 1):
        counts = collections.Counter()
        for syms, f in words.values():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, a, b, a + b, cnt))
        for entry in words.values():
            entry[0] = merge_word(entry[0], (a, b))
    return merges


def _spark_bpe(spark, texts, num_merges):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    rows = bpe_train(df, num_merges=num_merges).collect()
    return sorted(
        (r.merge_rank, r.lft, r.rgt, r.merged, r.pair_count) for r in rows
    )


CORPUS = [
    "the cat sat on the mat and the cat ran to the hat",
    "low lower lowest newer newest wider widest the the the",
    "banana bandana banana cabana a banana man ran",
    "she sells sea shells by the sea shore",
]


def test_matches_reference_bpe(spark):
    want = _ref_bpe(CORPUS, 10)
    got = _spark_bpe(spark, CORPUS, 10)
    assert got == sorted(want)


def test_greedy_one_pass_on_runs(spark):
    # 'aaaa' under pair (a,a) must merge to (aa, aa) in one round —
    # a left-to-right scan, not a re-scanning fixed point (which would
    # produce 'aaaa' immediately) and not right-to-left
    texts = ["aaaa aaaa aaaa b"]
    got = _spark_bpe(spark, texts, 2)
    want = _ref_bpe(texts, 2)
    assert got == sorted(want)
    # round 1 merges (a,a) with count 3 words x 3 overlapping pairs = 9
    assert got[0][1:] == ("a", "a", "aa", 9)
    # round 2: each word is now (aa, aa) -> pair (aa, aa) count 3
    assert got[1][1:] == ("aa", "aa", "aaaa", 3)


def test_exhausts_and_stops_early(spark):
    # single-char words only: zero adjacent pairs, zero merges
    assert _spark_bpe(spark, ["a b c a b"], 4) == []
    # 'ab' fully merges in one round; requesting 5 merges returns 1
    got = _spark_bpe(spark, ["ab ab ab"], 5)
    assert [g[0] for g in got] == [1]


def test_tie_break_is_lexicographic(spark):
    # 'ba' and 'cd' pairs both appear exactly twice; (b,a) < (c,d)
    texts = ["ba ba cd cd"]
    got = _spark_bpe(spark, texts, 1)
    assert got[0][1:] == ("b", "a", "ba", 2)


# -- tokenizer application (textops.bpe_encode, round 6) ---------------------

def test_encode_matches_reference_token_counts(spark):
    from ironspark.textops import bpe_encode

    num_merges = 6
    vocab = collections.Counter()
    for t in CORPUS:
        for w in t.lower().split():
            if w:
                vocab[w] += 1
    words = {w: [tuple(w), f] for w, f in vocab.items()}

    def merge_word(syms, pair):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return tuple(out)

    for _, a, b, _m, _c in _ref_bpe(CORPUS, num_merges):
        for entry in words.values():
            entry[0] = merge_word(entry[0], (a, b))
    expect = collections.Counter()
    for syms, f in words.values():
        for s in syms:
            expect[s] += f

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(CORPUS)), "text": CORPUS})
    )
    merges = bpe_train(df, num_merges=num_merges)
    got = {
        r["token"]: r["n_tokens"] for r in bpe_encode(df, merges).collect()
    }
    assert got == dict(expect)
