"""Mann-Kendall trend test: python replay with ties, monotone/constant
knowns, ANSI zero-variance guard, parallelism invariance."""

from __future__ import annotations

import math

import pytest

from crankshaft_spark.operators.markov import MK_Z_CRIT, mann_kendall


def _py_mk(xs):
    T = len(xs)
    s = sum(
        (1 if xs[j] > xs[i] else -1 if xs[j] < xs[i] else 0)
        for i in range(T) for j in range(i + 1, T))
    counts = {}
    for x in xs:
        counts[x] = counts.get(x, 0) + 1
    tie = sum(t * (t - 1) * (2 * t + 5) for t in counts.values())
    var = (T * (T - 1) * (2 * T + 5) - tie) / 18.0
    if var > 0 and s > 0:
        z = (s - 1) / math.sqrt(var)
    elif var > 0 and s < 0:
        z = (s + 1) / math.sqrt(var)
    else:
        z = 0.0
    zr = round(z, 6)
    trend = "up" if zr > MK_Z_CRIT else "down" if zr < -MK_Z_CRIT else "none"
    return s, zr, trend


def _run(spark, series, parts=1):
    rows = [(k, t, x) for k, xs in series.items() for t, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "cell long, t long, x long").repartition(
        parts)
    return {
        r["cell"]: (r["s_stat"], r["z_round"], r["trend"])
        for r in mann_kendall(df).collect()
    }


def test_known_series(spark):
    series = {
        1: list(range(12)),                      # strictly increasing
        2: list(range(12))[::-1],                # strictly decreasing
        3: [5] * 12,                             # constant: Var=0 -> z=0
        4: [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8],  # ties, mixed
        5: [0, 1],                               # T=2: |S|=1 -> z=0 path
    }
    got = _run(spark, series)
    for k, xs in series.items():
        assert got[k] == _py_mk(xs), (k, got[k], _py_mk(xs))
    assert got[1][2] == "up" and got[2][2] == "down"
    assert got[3] == (0, 0.0, "none")


def test_parallelism_invariance(spark):
    series = {
        k: [((k * 31 + t * 17) % 7) for t in range(20)] for k in range(8)
    }
    assert _run(spark, series, 1) == _run(spark, series, 16)
