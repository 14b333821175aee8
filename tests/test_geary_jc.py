"""Geary's C and join-count statistics: hand-replayed small graphs,
known limiting cases, parallelism invariance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crankshaft_spark.operators.moran import geary_c, join_counts
from crankshaft_spark.operators.weights import row_standardize


def _ring_edges(spark, n, parts=1):
    # symmetric ring: each node adjacent to its two neighbors
    rows = []
    for i in range(n):
        rows.append((i, (i + 1) % n))
        rows.append((i, (i - 1) % n))
    return row_standardize(
        spark.createDataFrame(rows, "id long, nbr long").repartition(parts))


def _vals(spark, values, parts=1):
    return spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(values)],
        "id long, value double").repartition(parts)


def _py_geary(values, edges_w):
    n = len(values)
    mu = sum(values) / n
    den = sum((v - mu) ** 2 for v in values)
    num = sum(w * (values[i] - values[j]) ** 2 for i, j, w in edges_w)
    W = sum(w for _, _, w in edges_w)
    return (n - 1) * num / (2.0 * W * den)


def test_geary_alternating_ring(spark):
    # perfect negative autocorrelation on a ring: C well above 1
    values = [1.0, -1.0] * 4
    got = geary_c(_vals(spark, values), _ring_edges(spark, 8)).collect()[0]
    edges = [(i, (i + 1) % 8, 0.5) for i in range(8)] + [
        (i, (i - 1) % 8, 0.5) for i in range(8)]
    assert got["geary_c"] == pytest.approx(_py_geary(values, edges))
    assert got["geary_c"] > 1.0
    assert got["expected_c"] == 1.0


def test_geary_smooth_gradient(spark):
    # smooth-ish values on a ring: C below 1 (positive autocorrelation)
    values = [float(min(i, 12 - i)) for i in range(12)]
    got = geary_c(_vals(spark, values), _ring_edges(spark, 12)).collect()[0]
    edges = [(i, (i + 1) % 12, 0.5) for i in range(12)] + [
        (i, (i - 1) % 12, 0.5) for i in range(12)]
    assert got["geary_c"] == pytest.approx(_py_geary(values, edges))
    assert got["geary_c"] < 1.0


def test_join_counts_blocked_ring(spark):
    # first half positive, second half negative: exactly two BW directed
    # pairs per boundary (2 boundaries x 2 directions = 4 mismatch edges)
    n = 10
    values = [1.0] * 5 + [-1.0] * 5
    out = {
        r["stat"]: r
        for r in join_counts(
            _vals(spark, values), _ring_edges(spark, n)).collect()
    }
    E, nb, nw = 2 * n, 5, 5
    assert out["bb"]["count"] == 8          # 4 internal B-B adjacencies x2
    assert out["bw"]["count"] == 4
    assert out["ww"]["count"] == 8
    assert out["bb"]["count"] + out["bw"]["count"] + out["ww"]["count"] == E
    assert out["bb"]["expected"] == pytest.approx(
        E * (nb / n) * ((nb - 1) / (n - 1)))
    assert out["bw"]["expected"] == pytest.approx(
        E * 2.0 * nb * nw / (n * (n - 1)))
    assert out["ww"]["expected"] == pytest.approx(
        E * (nw / n) * ((nw - 1) / (n - 1)))


def test_join_counts_all_one_class(spark):
    values = [3.0] * 6
    out = {
        r["stat"]: r
        for r in join_counts(
            _vals(spark, values), _ring_edges(spark, 6)).collect()
    }
    assert out["bb"]["count"] == 12 and out["bw"]["count"] == 0
    assert out["ww"]["count"] == 0
    assert out["bb"]["expected"] == pytest.approx(12.0)


def test_parallelism_invariance(spark):
    values = [float((i * 37) % 11 - 5) for i in range(40)]
    a = geary_c(_vals(spark, values, 1), _ring_edges(spark, 40, 1)).collect()
    b = geary_c(_vals(spark, values, 16),
                _ring_edges(spark, 40, 16)).collect()
    assert round(a[0]["geary_c"], 9) == round(b[0]["geary_c"], 9)
    ja = join_counts(_vals(spark, values, 1),
                     _ring_edges(spark, 40, 1)).collect()
    jb = join_counts(_vals(spark, values, 16),
                     _ring_edges(spark, 40, 16)).collect()
    assert sorted(map(tuple, ja)) == sorted(map(tuple, jb))


def test_weighted_spread(spark):
    import math

    from crankshaft_spark.operators.weighted_mean import weighted_spread

    rows = [(1, 0.0, 0.0, 1.0), (1, 4.0, 2.0, 3.0), (1, 8.0, 0.0, 1.0),
            (2, 5.0, 5.0, 2.0)]
    df = spark.createDataFrame(rows, "g long, x double, y double, w double")
    got = {r["g"]: (r["sx"], r["sy"])
           for r in weighted_spread(df, group_cols=["g"]).collect()}
    # group 1 by hand: Σw=5, mx=(0+12+8)/5=4, E[x²]=(0+48+64)/5=22.4
    assert got[1][0] == pytest.approx(math.sqrt(22.4 - 16.0))
    my = 6.0 / 5
    ey2 = 12.0 / 5
    assert got[1][1] == pytest.approx(math.sqrt(ey2 - my * my))
    assert got[2] == (0.0, 0.0)  # single point: greatest(,0) absorbs -0


def test_geary_local_replay(spark):
    from crankshaft_spark.operators.moran import geary_local

    values = [float((i * 37) % 11 - 5) for i in range(12)]
    got = {r["id"]: r["geary_ci"]
           for r in geary_local(_vals(spark, values),
                                _ring_edges(spark, 12)).collect()}
    n = len(values)
    mu = sum(values) / n
    m2 = sum((v - mu) ** 2 for v in values) / n
    for i in range(n):
        ci = sum(
            0.5 * (values[i] - values[j]) ** 2
            for j in ((i + 1) % n, (i - 1) % n)
        ) / m2
        assert got[i] == pytest.approx(ci), f"id {i}"
    # sum identity vs global Geary: C = Σc_i (n-1) / (2 W n), W = n here
    C = geary_c(_vals(spark, values),
                _ring_edges(spark, 12)).collect()[0]["geary_c"]
    assert C == pytest.approx(sum(got.values()) * (n - 1) / (2.0 * n * n))


def test_geary_local_parallelism_invariance(spark):
    from crankshaft_spark.operators.moran import geary_local

    values = [float((i * 53) % 17 - 8) for i in range(40)]
    a = geary_local(_vals(spark, values, 1), _ring_edges(spark, 40, 1))
    b = geary_local(_vals(spark, values, 16), _ring_edges(spark, 40, 16))
    ra = {r["id"]: round(r["geary_ci"], 9) for r in a.collect()}
    rb = {r["id"]: round(r["geary_ci"], 9) for r in b.collect()}
    assert ra == rb
