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


def test_bm25_matches_python_replay(spark):
    import math

    from crankshaft_spark.operators.text import bm25_topk

    docs = [(1, "the cat sat on the mat"), (2, "the dog sat"),
            (3, "cat cat cat dog"), (4, "a completely unrelated text"),
            (5, None), (6, "dog dog the")]
    qs = [("q1", "cat"), ("q2", "the dog"), ("q3", "missing cat"),
          ("q4", "nothing matches here")]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    qdf = spark.createDataFrame(qs, "qid string, qtext string")
    got = [(r["qid"], r["rank"], r["doc_id"], r["score_fp"])
           for r in bm25_topk(ddf, qdf, topk=3).orderBy("qid", "rank").collect()]

    def lnfp(x):
        return math.floor(math.log(float(x)) * 1e6 + 0.5)

    toks = {d: (t or "").lower().split() for d, t in docs}
    toks = {d: [w for w in ws if w] for d, ws in toks.items()}
    n = len(docs)
    dl = {d: len(ws) for d, ws in toks.items() if ws}
    avgdl = sum(dl.values()) / n
    df = {}
    for ws in toks.values():
        for t in set(ws):
            df[t] = df.get(t, 0) + 1
    want = []
    for qid, qtext in qs:
        scores = {}
        for term in sorted(set(qtext.split())):
            if term not in df:
                continue
            idf = lnfp(n) - lnfp(df[term])
            for d, ws in toks.items():
                tf = ws.count(term)
                if not tf:
                    continue
                ts = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + (0.75 * dl[d]) / avgdl))
                scores[d] = scores.get(d, 0) + math.floor(ts)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        want += [(qid, i + 1, d, s) for i, (d, s) in enumerate(ranked)]
    assert got == want


def test_bm25_rewards_tf_and_penalizes_length(spark):
    from crankshaft_spark.operators.text import bm25_topk

    # same tf, shorter doc wins; higher tf wins at same length
    # (doc 4 keeps df < N so idf = ln(N/df) is nonzero)
    docs = [(1, "cat dog"), (2, "cat dog bird fish cow hen owl fox"),
            (3, "cat cat"), (4, "owl fox")]
    qdf = spark.createDataFrame([("q", "cat")], "qid string, qtext string")
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["rank"]: r["doc_id"] for r in bm25_topk(ddf, qdf, topk=3).collect()}
    assert out[1] == 3 and out[2] == 1 and out[3] == 2
