"""Corpus sampling / shard packing / benchmark decontamination.

Every operator here is driven by the portable md5 row-hash, so the tests
replay the exact arithmetic in pure Python and assert equality — and
assert parallelism invariance (results are a function of row identity,
never of partitioning).
"""

import hashlib


def _u(seed, i, tag="sample"):
    return int(hashlib.md5(
        f"{seed}:{i}:{tag}".encode()).hexdigest()[:8], 16) / 2**32


def test_decontaminate_ngram_collisions(spark):
    """Docs sharing any word n-gram with a benchmark item are flagged;
    hits count doc-side multiplicity; short docs contribute no grams."""
    from crankshaft_spark.operators.text import decontaminate

    docs = spark.createDataFrame(
        [(1, "a b c d e"),        # 'c d e' hit
         (2, "x y z w"),          # clean
         (3, "c d e f g"),        # hit at gram 1
         (4, "c d e c d e"),      # 'c d e' twice -> n_hits 2
         (5, "q")],               # < n words: 0 grams
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(0, "c d e"), (1, "p q r s")], "bench_id long, text string")
    got = {r["doc_id"]: r.asDict()
           for r in decontaminate(docs, bench, n=3).collect()}
    assert (got[1]["n_hits"], got[1]["contaminated"]) == (1, True)
    assert (got[2]["n_hits"], got[2]["contaminated"]) == (0, False)
    assert got[4]["n_hits"] == 2 and got[4]["n_ngrams"] == 4
    assert got[5] == dict(doc_id=5, n_ngrams=0, n_hits=0,
                          contaminated=False)


def test_decontaminate_benchmark_longer_than_n(spark):
    """A benchmark item longer than n contributes ALL its n-grams."""
    from crankshaft_spark.operators.text import decontaminate

    docs = spark.createDataFrame(
        [(1, "b c d x"), (2, "a b c y")], "doc_id long, text string")
    bench = spark.createDataFrame(
        [(0, "a b c d e")], "bench_id long, text string")
    got = {r["doc_id"]: r["contaminated"]
           for r in decontaminate(docs, bench, n=3).collect()}
    assert got == {1: True, 2: True}


def test_corpus_sample_bernoulli(spark):
    """Bernoulli mode keeps exactly the rows with u(seed, id) < fraction
    — replayed row-for-row in Python; repartitioning changes nothing."""
    from crankshaft_spark.operators.sampling import corpus_sample

    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(200)], "doc_id long, text string")
    got = sorted(r["doc_id"] for r in
                 corpus_sample(docs, fraction=0.25, seed=11).collect())
    exp = sorted(i for i in range(200) if _u(11, i) < 0.25)
    assert got == exp
    got7 = sorted(r["doc_id"] for r in corpus_sample(
        docs.repartition(7), fraction=0.25, seed=11).collect())
    assert got7 == exp


def test_corpus_sample_stratified_quota(spark):
    """Quota mode returns EXACTLY the top-quota-by-u rows per stratum
    (prefilter is lossless), with 1-based sample_rank."""
    from crankshaft_spark.operators.sampling import corpus_sample

    docs = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(60)], "doc_id long, src string")
    got = sorted((r["doc_id"], r["sample_rank"]) for r in corpus_sample(
        docs, stratify_by="src", quota=4, seed=3).collect())
    exp = []
    by_s = {}
    for i in range(60):
        by_s.setdefault(i % 3, []).append((_u(3, i), i))
    for s, rows in by_s.items():
        for rank, (_, i) in enumerate(sorted(rows)[:4], 1):
            exp.append((i, rank))
    assert got == sorted(exp)


def test_corpus_sample_quota_exceeds_stratum(spark):
    """quota > stratum size keeps the whole stratum (guard path)."""
    from crankshaft_spark.operators.sampling import corpus_sample

    docs = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "doc_id long, src string")
    got = sorted(r["doc_id"] for r in corpus_sample(
        docs, stratify_by="src", quota=5, seed=1).collect())
    assert got == [1, 2, 3]


def test_corpus_sample_null_stratum(spark):
    """NULL is its own stratum (SQL GROUP BY / PARTITION BY semantics —
    what the DuckDB oracle computes): quota applies to it like any other,
    and NULL-stratum rows are never silently dropped by the internal
    stratum-table equi-joins."""
    from crankshaft_spark.operators.sampling import corpus_sample

    docs = spark.createDataFrame(
        [(i, None if i % 2 == 0 else "a") for i in range(40)],
        "doc_id long, src string")
    got = corpus_sample(docs, stratify_by="src", quota=3, seed=5).collect()
    by_s = {}
    for r in got:
        by_s.setdefault(r["src"], []).append(r["doc_id"])
    assert set(by_s) == {None, "a"}
    for s, members in by_s.items():
        pool = [i for i in range(40)
                if (i % 2 == 0) == (s is None)]
        exp = [i for _, i in sorted((_u(5, i), i) for i in pool)[:3]]
        assert sorted(members) == sorted(exp)


def test_weighted_sample_clamps_negative_weights(spark):
    """Negative weights clamp to 0: never sampled and never deflating
    other rows' inclusion probability; all-nonpositive input yields an
    empty result instead of an ANSI divide-by-zero."""
    from crankshaft_spark.operators.sampling import weighted_sample

    docs = spark.createDataFrame(
        [(1, 10.0), (2, -50.0), (3, 10.0)], "doc_id long, w double")
    pos = weighted_sample(docs.filter("w > 0"), target=2,
                          weight_col="w", seed=7)
    mixed = weighted_sample(docs, target=2, weight_col="w", seed=7)
    assert (sorted(r["doc_id"] for r in mixed.collect())
            == sorted(r["doc_id"] for r in pos.collect()))
    assert all(r["doc_id"] != 2 for r in mixed.collect())

    allneg = spark.createDataFrame(
        [(1, -1.0), (2, 0.0)], "doc_id long, w double")
    assert weighted_sample(allneg, target=2, weight_col="w",
                           seed=7).count() == 0


def test_weighted_sample_pps(spark):
    """Poisson PPS membership replays exactly in Python (same fixed-point
    weights, same IEEE multiplication order); heavier rows are kept more
    often; pi >= 1 rows always kept; partitioning changes nothing."""
    from crankshaft_spark.operators.sampling import weighted_sample

    rows = [(i, 1.0 + (i % 10)) for i in range(200)] + [(999, 5000.0)]
    docs = spark.createDataFrame(rows, "doc_id long, w double")

    wfp = {i: int(w * 1e6) for i, w in rows}
    W = sum(wfp.values())
    exp = sorted(
        i for i, w in rows
        if float(int(hashlib.md5(f"9:{i}:pps".encode()).hexdigest()[:8], 16))
        * float(W) < (20.0 * float(wfp[i])) * 2.0**32)
    for df in (docs, docs.repartition(11)):
        got = sorted(r["doc_id"] for r in weighted_sample(
            df, target=20, weight_col="w", seed=9).collect())
        assert got == exp
    assert 999 in exp          # pi >> 1: always kept
    # heavier strata are kept at a higher rate
    kept = set(exp) - {999}
    light = sum(1 for i in kept if i % 10 < 5)
    heavy = sum(1 for i in kept if i % 10 >= 5)
    assert heavy > light


def test_shard_pack_matches_sequential_replay(spark):
    """shard_id equals the greedy sequential packing over the hash-shuffled
    order, replayed in Python; identical across parallelism and bucket
    counts (the bucketing is an implementation detail, not a semantic)."""
    from crankshaft_spark.operators.sampling import shard_pack

    docs = spark.createDataFrame(
        [(i, 10 + (i * 7) % 23) for i in range(100)],
        "doc_id long, tokens long")
    exp = {}
    cum = 0
    for h, i in sorted(
            (int(hashlib.md5(f"5:{i}:shard".encode()).hexdigest()[:8], 16), i)
            for i in range(100)):
        exp[i] = cum // 150
        cum += 10 + (i * 7) % 23
    for df, nb in ((docs, 256), (docs.repartition(13), 8)):
        got = {r["doc_id"]: r["shard_id"] for r in shard_pack(
            df, budget=150, seed=5, n_buckets=nb).collect()}
        assert got == exp
    # shards are contiguous token ranges: every shard except the last
    # reaches the budget before the next one starts
    sizes = {}
    for i, s in exp.items():
        sizes[s] = sizes.get(s, 0) + 10 + (i * 7) % 23
    for s in range(max(sizes)):
        assert sizes[s] >= 150 - max(10 + (i * 7) % 23 for i in range(100))


def test_shard_pack_single_doc_over_budget(spark):
    """A doc larger than the budget still lands in exactly one shard and
    pushes the next doc into a later shard."""
    from crankshaft_spark.operators.sampling import shard_pack

    docs = spark.createDataFrame(
        [(1, 500), (2, 10), (3, 10)], "doc_id long, tokens long")
    got = shard_pack(docs, budget=100, seed=2).collect()
    assert len({(r["doc_id"], r["shard_id"]) for r in got}) == 3
    order = sorted(
        (int(hashlib.md5(f"2:{i}:shard".encode()).hexdigest()[:8], 16), i)
        for i in (1, 2, 3))
    cum, exp = 0, {}
    for _, i in order:
        exp[i] = cum // 100
        cum += {1: 500, 2: 10, 3: 10}[i]
    assert {r["doc_id"]: r["shard_id"] for r in got} == exp


def test_chunk_docs_windows(spark):
    """Overlapping windows advance by stride, the tail may be short, docs
    shorter than one window yield exactly one chunk, and keep_cols ride
    through without a join."""
    from crankshaft_spark.operators.text import chunk_docs

    docs = spark.createDataFrame(
        [(1, "a b c d e f g", "s1"), (2, "x y", "s2")],
        "doc_id long, text string, src string")
    got = sorted(tuple(r) for r in chunk_docs(
        docs, size=3, stride=2, keep_cols=("src",)).collect())
    assert got == [
        (1, 0, "a b c", 3, "s1"), (1, 1, "c d e", 3, "s1"),
        (1, 2, "e f g", 3, "s1"), (2, 0, "x y", 2, "s2")]
    # disjoint default stride
    got2 = sorted((r["doc_id"], r["chunk_id"], r["chunk_text"])
                  for r in chunk_docs(docs, size=4).collect())
    assert got2 == [(1, 0, "a b c d"), (1, 1, "e f g"), (2, 0, "x y")]


# ---- property-based invariants (hypothesis; few examples — each one is
# ---- a Spark round-trip) ---------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_words = st.lists(st.sampled_from("alpha beta gamma delta eps".split()),
                  min_size=1, max_size=25)


@settings(max_examples=6, deadline=None)
@given(st.data())
def test_chunk_docs_properties(spark, data):
    """Disjoint chunking reconstructs every doc exactly; every chunk but
    the last per doc is full-size; chunk count matches the formula."""
    from crankshaft_spark.operators.text import chunk_docs

    docs = [(i, " ".join(data.draw(_words))) for i in range(12)]
    size = data.draw(st.integers(1, 8))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in chunk_docs(df, size=size).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["chunk_text"], r["chunk_tokens"]))
    for i, text in docs:
        chunks = sorted(got[i])
        k = len(text.split(" "))
        want_n = (max(k - size, 0) + size - 1) // size + 1
        assert len(chunks) == want_n
        assert " ".join(c[1] for c in chunks) == text
        for cid, _, ct in chunks[:-1]:
            assert ct == size
        assert [c[0] for c in chunks] == list(range(want_n))


@settings(max_examples=6, deadline=None)
@given(st.data())
def test_shard_pack_properties(spark, data):
    """Every input doc lands in exactly one shard; when no doc exceeds
    the budget, shard ids are a contiguous 0..max range and every shard
    except the last is filled to at least budget - max(tokens) + 1.
    (An over-budget doc legitimately jumps past whole budget windows —
    ids may gap; that case is pinned by
    test_shard_pack_single_doc_over_budget.)"""
    from crankshaft_spark.operators.sampling import shard_pack

    n = data.draw(st.integers(5, 40))
    toks = [data.draw(st.integers(1, 50)) for _ in range(n)]
    budget = data.draw(st.integers(max(toks) + 1, 120 + max(toks)))
    df = spark.createDataFrame(list(enumerate(toks)),
                               "doc_id long, tokens long")
    rows = shard_pack(df, budget=budget, seed=3).collect()
    assert sorted(r["doc_id"] for r in rows) == list(range(n))
    sizes = {}
    for r in rows:
        sizes[r["shard_id"]] = sizes.get(r["shard_id"], 0) + \
            toks[r["doc_id"]]
    assert sorted(sizes) == list(range(max(sizes) + 1))
    # tight fill bound: a doc entering shard s has cum_before within
    # max(toks)-1 of the shard's start, so every non-final shard holds
    # at least budget - max(toks) + 1 tokens
    for s in range(max(sizes)):
        assert sizes[s] >= budget - max(toks) + 1


@settings(max_examples=6, deadline=None)
@given(st.data())
def test_corpus_sample_quota_properties(spark, data):
    """Per-stratum kept count is exactly min(quota, stratum size) and
    ranks are 1..count."""
    from crankshaft_spark.operators.sampling import corpus_sample

    n = data.draw(st.integers(4, 50))
    n_strata = data.draw(st.integers(1, 5))
    quota = data.draw(st.integers(1, 6))
    seed = data.draw(st.integers(0, 99))
    df = spark.createDataFrame(
        [(i, f"s{i % n_strata}") for i in range(n)],
        "doc_id long, src string")
    got = {}
    for r in corpus_sample(df, stratify_by="src", quota=quota,
                           seed=seed).collect():
        got.setdefault(r["src"], []).append(r["sample_rank"])
    for s in range(n_strata):
        size_s = len([i for i in range(n) if i % n_strata == s])
        ranks = sorted(got.get(f"s{s}", []))
        assert ranks == list(range(1, min(quota, size_s) + 1))


def test_corpus_split_deterministic_bands(spark):
    """Band assignment replays the portable hash in Python, is stable
    under corpus growth, domain-separated from the sampling draws, and
    validates its fractions."""
    import hashlib

    import pytest as _pytest

    from crankshaft_spark.operators.sampling import corpus_split

    fr = (("train", 0.8), ("val", 0.1), ("test", 0.1))
    docs = spark.range(3000).withColumnRenamed("id", "doc_id")
    got = {r["doc_id"]: r["split"]
           for r in corpus_split(docs, fractions=fr, seed=7).collect()}

    def band(i):
        u = int(hashlib.md5(f"7:{i}:split".encode()).hexdigest()[:8], 16) \
            / 4294967296.0
        return "train" if u < 0.8 else ("val" if u < 0.8 + 0.1 else "test")

    assert got == {i: band(i) for i in range(3000)}
    # realized sizes near expectation (binomial, generous tolerance)
    n_train = sum(1 for v in got.values() if v == "train")
    assert 2250 <= n_train <= 2550
    # growth stability: a subset corpus assigns identically
    sub = {r["doc_id"]: r["split"] for r in corpus_split(
        docs.filter("doc_id < 100"), fractions=fr, seed=7).collect()}
    assert sub == {i: got[i] for i in range(100)}
    with _pytest.raises(ValueError):
        corpus_split(docs, fractions=(("a", 0.5), ("b", 0.4)))
    with _pytest.raises(ValueError):
        corpus_split(docs, fractions=(("all", 1.0),))
