"""Ripley's K: hand-counted 3-4-5 triangle, cross-cell pairs, CSR sanity,
degenerate single point, parallelism invariance."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from crankshaft_spark.operators.pointpats import ripley_k


def _run(spark, rows, radii, area, parts=1):
    df = spark.createDataFrame(
        rows, "grp long, x double, y double").repartition(parts)
    return {
        (r["grp"], r["d"]): (r["n_pts"], round(r["k_est"], 9))
        for r in ripley_k(df, radii=radii, area=area).collect()
    }


def test_triangle_counts(spark):
    # 3-4-5 right triangle: ordered pairs within d: 2 (d=3), 4 (d=4), 6 (d=5)
    rows = [(1, 0.0, 0.0), (1, 3.0, 0.0), (1, 0.0, 4.0)]
    got = _run(spark, rows, radii=(3, 4, 5), area=100.0)
    assert got[(1, 3)] == (3, round(100.0 * 2 / 6, 9))
    assert got[(1, 4)] == (3, round(100.0 * 4 / 6, 9))
    assert got[(1, 5)] == (3, round(100.0 * 6 / 6, 9))


def test_cross_cell_pairs(spark):
    # neighbors straddling a cell boundary at cell_size = max radius (10):
    # (9,0) and (11,0) are 2 apart but land in different cells
    rows = [(1, 9.0, 0.0), (1, 11.0, 0.0)]
    got = _run(spark, rows, radii=(10,), area=100.0)
    assert got[(1, 10)] == (2, round(100.0 * 2 / 2, 9))


def test_csr_grid_sanity(spark):
    # regular 20x20 unit grid on a 400-area window: K(d) ~ pi d^2 within
    # a factor accounting for edge effects (naive estimator undercounts)
    rows = [(1, float(i), float(j)) for i in range(20) for j in range(20)]
    got = _run(spark, rows, radii=(3,), area=400.0)
    n, k = got[(1, 3)]
    assert n == 400
    assert 0.4 * math.pi * 9 < k < 1.2 * math.pi * 9


def test_degenerate_and_guard(spark):
    rows = [(1, 5.0, 5.0)]
    got = _run(spark, rows, radii=(4,), area=10.0)
    assert got[(1, 4)] == (1, 0.0)
    with pytest.raises(ValueError, match="radii"):
        ripley_k(
            spark.createDataFrame(rows, "grp long, x double, y double"),
            radii=(), area=1.0)


def test_parallelism_invariance(spark):
    rows = [
        (g, float((g * 7 + i * 97) % 60), float((g * 3 + i * 41) % 40))
        for g in range(3) for i in range(50)
    ]
    a = _run(spark, rows, radii=(5, 15), area=2400.0, parts=1)
    b = _run(spark, rows, radii=(5, 15), area=2400.0, parts=16)
    assert a == b


def test_quadrat_vmr_known(spark):
    from crankshaft_spark.operators.pointpats import quadrat_vmr

    # 4 points in ONE quadrat of a 4-quadrat frame: counts (4,0,0,0)
    # mean=1, E[c^2]=4 -> VMR = (4-1)/1 = 3 (clustered)
    rows = [(0.5, 0.5), (0.6, 0.6), (0.7, 0.7), (0.8, 0.8)]
    df = spark.createDataFrame(rows, "x double, y double")
    got = quadrat_vmr(df, cell_size=1.0, frame_cells=4).collect()[0]
    assert got["vmr"] == pytest.approx(3.0) and got["expected"] == 1.0
    # perfectly regular: one point per quadrat -> VMR = 0
    reg = spark.createDataFrame(
        [(0.5, 0.5), (1.5, 0.5), (0.5, 1.5), (1.5, 1.5)],
        "x double, y double")
    got = quadrat_vmr(reg, cell_size=1.0, frame_cells=4).collect()[0]
    assert got["vmr"] == pytest.approx(0.0)


def test_clark_evans_known(spark):
    from crankshaft_spark.operators.pointpats import clark_evans

    # unit-square lattice: NN distance 1 for every point; n=16, A=16
    # -> density 1, expected NN dist 0.5 -> R = 2 (regular)
    pts = spark.createDataFrame(
        [(float(i), float(j)) for i in range(4) for j in range(4)],
        "x double, y double")
    nn = spark.createDataFrame(
        [(1, 1.0)] * 16, "rank int, d2 double")
    got = clark_evans(pts, nn, area=16.0).collect()[0]
    assert got["r_stat"] == pytest.approx(2.0) and got["expected"] == 1.0
