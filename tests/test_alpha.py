"""Alpha shape: known square + outlier (concavity vs convex hull), radius
cutoff, degenerate inputs, parallelism invariance."""

from __future__ import annotations

import pytest

from crankshaft_spark.operators.geometry import alpha_shape


def _df(spark, rows, parts=1):
    df = spark.createDataFrame(
        rows, "grp long, x double, y double, value double")
    return df.repartition(parts)


def _edges(df):
    return sorted((r["grp"], r["wkt"], r["value"]) for r in df.collect())


SQUARE_PLUS_FAR = [
    (1, 0.0, 0.0, 1.0), (1, 10.0, 0.0, 2.0), (1, 0.0, 10.0, 3.0),
    (1, 10.0, 10.0, 4.0), (1, 100.0, 5.0, 5.0),
]


def test_concave_drops_far_point(spark):
    # the two square triangles have circumradius ~7.07 (kept at r=8);
    # every triangle touching (100, 5) is far larger (dropped) -> the
    # boundary is the SQUARE, not the convex hull that includes the
    # outlier — the concave-vs-convex distinction in one shape
    got = _edges(alpha_shape(_df(spark, SQUARE_PLUS_FAR), r=8))
    assert [g[1] for g in got] == [
        "LINESTRING (0.000000 0.000000, 0.000000 10.000000)",
        "LINESTRING (0.000000 0.000000, 10.000000 0.000000)",
        "LINESTRING (0.000000 10.000000, 10.000000 10.000000)",
        "LINESTRING (10.000000 0.000000, 10.000000 10.000000)",
    ]
    assert [g[2] for g in got] == [100.0] * 4  # exact squared lengths


def test_radius_cutoff_is_exact(spark):
    # r=7 < 7.071...: the square triangles fail the closed test too
    got = _edges(alpha_shape(_df(spark, SQUARE_PLUS_FAR), r=7))
    assert got == []


def test_degenerate_inputs(spark):
    rows = [(1, float(i), float(2 * i), 1.0) for i in range(5)]  # collinear
    rows += [(2, 0.0, 0.0, 1.0), (2, 5.0, 0.0, 1.0)]             # n=2
    assert _edges(alpha_shape(_df(spark, rows), r=100)) == []


def test_parallelism_invariance(spark):
    rows = [(g, float((g * 7 + i * 97) % 60), float((g * 3 + i * 41) % 40),
             float(i))
            for g in range(3) for i in range(40)]
    a = _edges(alpha_shape(_df(spark, rows, parts=1), r=12))
    b = _edges(alpha_shape(_df(spark, rows, parts=16), r=12))
    assert a == b and len(a) > 6


def test_r_guard(spark):
    with pytest.raises(ValueError, match="r must"):
        alpha_shape(_df(spark, SQUARE_PLUS_FAR), r=-1)
