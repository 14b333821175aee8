"""Douglas-Peucker simplify: known geometries, pinned tie-break, exact
integer split test, degenerate chains, parallelism invariance."""

from __future__ import annotations

import pytest

from crankshaft_spark.operators.geometry import _dp_keep, simplify


def _df(spark, rows, parts=1):
    df = spark.createDataFrame(rows, "grp long, seq long, x double, y double")
    return df.repartition(parts)


def _kept(df):
    return sorted((r["grp"], r["seq"]) for r in df.collect())


def test_collinear_collapses_to_endpoints(spark):
    rows = [(1, i, float(i), float(2 * i)) for i in range(10)]
    got = _kept(simplify(_df(spark, rows), eps=0))
    # eps=0 with STRICT > still drops exactly-on-the-line vertices
    assert got == [(1, 0), (1, 9)]


def test_spike_kept_and_recursion_descends(spark):
    # flat line with one big spike and one sub-eps wiggle
    rows = [(1, 0, 0.0, 0.0), (1, 1, 10.0, 1.0), (1, 2, 20.0, 100.0),
            (1, 3, 30.0, 1.0), (1, 4, 40.0, 0.0)]
    got = _kept(simplify(_df(spark, rows), eps=12))
    assert got == [(1, 0), (1, 2), (1, 4)]
    got = _kept(simplify(_df(spark, rows), eps=0))
    assert got == [(1, s) for s in range(5)]


def test_tiebreak_is_smallest_index():
    # symmetric double spike: both interior vertices at the same distance
    xs = [0, 1, 3, 4]
    ys = [0, 10, 10, 0]
    # equal cross^2 for k=1 and k=2 -> the min index (1) is the split
    # vertex; the follow-up segment (1,3) leaves vertex 2 sub-eps
    assert _dp_keep(xs, ys, eps2=4) == [0, 1, 3]
    # with a huge eps nothing splits
    assert _dp_keep(xs, ys, eps2=10 ** 6) == [0, 3]


def test_short_and_degenerate_chains(spark):
    # n=1 and n=2 pass through; coincident endpoints fall back to
    # point-distance (den=1)
    rows = [(1, 0, 5.0, 5.0),
            (2, 0, 0.0, 0.0), (2, 1, 9.0, 9.0),
            (3, 0, 0.0, 0.0), (3, 1, 7.0, 0.0), (3, 2, 0.0, 0.0)]
    got = _kept(simplify(_df(spark, rows), eps=3))
    assert got == [(1, 0), (2, 0), (2, 1), (3, 0), (3, 1), (3, 2)]
    got = _kept(simplify(_df(spark, rows), eps=8))
    assert got == [(1, 0), (2, 0), (2, 1), (3, 0), (3, 2)]


def test_parallelism_invariance(spark):
    rows = [(g, i, float((g * 37 + i * 9973) % 240),
             float((g * 11 + i * 7919) % 96))
            for g in range(4) for i in range(50)]
    a = _kept(simplify(_df(spark, rows, parts=1), eps=20))
    b = _kept(simplify(_df(spark, rows, parts=16), eps=20))
    assert a == b and len(a) > 8


def test_eps_guard(spark):
    with pytest.raises(ValueError, match="eps"):
        simplify(_df(spark, [(1, 0, 0.0, 0.0)]), eps=-1)
