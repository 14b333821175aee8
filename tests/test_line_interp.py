"""line_interpolate: hand-computed L-path points, boundary fractions,
zero-length segments, degenerate groups, parallelism invariance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crankshaft_spark.operators.geometry import line_interpolate


def _df(spark, rows, parts=1):
    return spark.createDataFrame(
        rows, "grp long, seq long, x double, y double").repartition(parts)


def _pts(df):
    return sorted(
        (r["grp"], round(r["value"], 6), round(r["x"], 6), round(r["y"], 6))
        for r in df.collect())


L_PATH = [(1, 0, 0.0, 0.0), (1, 1, 10.0, 0.0), (1, 2, 10.0, 10.0)]


def test_l_path_fractions(spark):
    got = _pts(line_interpolate(
        _df(spark, L_PATH), fracs=(0.0, 0.25, 0.5, 0.75, 1.0)))
    assert got == [
        (1, 0.0, 0.0, 0.0),
        (1, 0.25, 5.0, 0.0),
        (1, 0.5, 10.0, 0.0),
        (1, 0.75, 10.0, 5.0),
        (1, 1.0, 10.0, 10.0),
    ]


def test_zero_length_segment(spark):
    rows = [(1, 0, 0.0, 0.0), (1, 1, 4.0, 0.0), (1, 2, 4.0, 0.0),
            (1, 3, 8.0, 0.0)]
    got = _pts(line_interpolate(_df(spark, rows), fracs=(0.5,)))
    assert got == [(1, 0.5, 4.0, 0.0)]


def test_degenerate_groups(spark):
    rows = [(1, 0, 3.0, 4.0)]                      # single vertex: no output
    rows += [(2, 0, 0.0, 0.0), (2, 1, 0.0, 0.0)]   # all-identical: total 0
    got = _pts(line_interpolate(_df(spark, rows), fracs=(0.5,)))
    assert got == [(2, 0.5, 0.0, 0.0)]


def test_frac_guard(spark):
    with pytest.raises(ValueError, match="fracs"):
        line_interpolate(_df(spark, L_PATH), fracs=(1.5,))
    with pytest.raises(ValueError, match="fracs"):
        line_interpolate(_df(spark, L_PATH), fracs=())


def test_parallelism_invariance(spark):
    rows = [
        (g, i, float((g * 7 + i * 97) % 60), float((g * 3 + i * 41) % 40))
        for g in range(4) for i in range(30)
    ]
    fr = (0.1, 0.37, 0.5, 0.9)
    a = _pts(line_interpolate(_df(spark, rows, 1), fracs=fr))
    b = _pts(line_interpolate(_df(spark, rows, 16), fracs=fr))
    assert a == b and len(a) == 16
