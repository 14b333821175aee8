"""Fixed-point tf-idf top-k: hand-computed scores on a tiny corpus,
stopword downweighting, tie pinning, parallelism invariance."""

from __future__ import annotations

import math

from crankshaft_spark.operators.text import tfidf_topk


def _lnfp(x):
    return math.floor(math.log(x) * 1e6 + 0.5)


def _run(spark, rows, k=3, parts=1):
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(
        parts)
    return {
        (r["doc_id"], r["rank"]): (r["term"], r["score_fp"])
        for r in tfidf_topk(df, k=k).collect()
    }


CORPUS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the log"),
    (3, "the cat ate the fish"),
    (4, "a bird"),
]


def test_hand_scores(spark):
    got = _run(spark, CORPUS)
    n = 4
    # doc 1: 'the' tf=2 df=3 -> 2*(ln4-ln3); cat tf=1 df=2 -> ln4-ln2;
    # mat/sat/on tf=1; mat df=1, sat/on df=2
    mat = _lnfp(n) - _lnfp(1)
    cat = _lnfp(n) - _lnfp(2)
    the2 = 2 * (_lnfp(n) - _lnfp(3))
    assert got[(1, 1)] == ("mat", mat)
    assert got[(1, 2)] == ("cat", cat)
    # rank 3: tie between 'on' and 'sat' (same score) -> term ASC pins 'on'
    assert got[(1, 3)] == ("on", cat)
    assert the2 < mat  # the common word is downweighted below the rare one
    # doc 4: only two terms, both unique
    assert got[(4, 1)] == ("a", mat) and got[(4, 2)] == ("bird", mat)
    assert (4, 3) not in got


def test_ubiquitous_term_scores_zero(spark):
    rows = [(i, "common unique%d" % i) for i in range(5)]
    got = _run(spark, rows, k=2)
    for i in range(5):
        assert got[(i, 1)][0] == "unique%d" % i
        assert got[(i, 2)] == ("common", 0)  # ln(n)-ln(n) = 0


def test_parallelism_invariance(spark):
    rows = [
        (i, " ".join("w%d" % ((i * 13 + j * 7) % 23) for j in range(30)))
        for i in range(12)
    ]
    assert _run(spark, rows, k=4, parts=1) == _run(spark, rows, k=4,
                                                   parts=16)
