"""Exact-kNN join: distributed result must equal the brute-force answer for
every cell size (the cell index is a performance knob, never a correctness
knob), including the straggler/fallback path."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from crankshaft_spark.operators import knn_edges


def brute_force_knn(pts, k):
    out = {}
    for pid, px, py in pts:
        cands = sorted(
            (
                ((px - qx) ** 2 + (py - qy) ** 2, qid)
                for qid, qx, qy in pts
                if qid != pid
            )
        )
        out[pid] = [(qid, d2) for d2, qid in cands[:k]]
    return out


@pytest.fixture(scope="module")
def points(spark):
    # deterministic scattered points incl. a dense cluster and an outlier
    pts = []
    for i in range(120):
        x = ((i * 9973) % 2400) / 10.0 - 120.0
        y = ((i * 7919) % 960) / 10.0 - 48.0
        pts.append((i, x, y))
    # dense cluster (hot cell)
    for i in range(120, 160):
        pts.append((i, 10.0 + (i % 7) * 0.01, 20.0 + (i % 5) * 0.01))
    # remote outlier — forces the ring-expansion fallback
    pts.append((999, 179.0, 89.0))
    return pts


@pytest.mark.parametrize("grid", ["rect", "hex"])
@pytest.mark.parametrize("cell_size", [2.0, 10.0, 45.0])
def test_knn_matches_bruteforce(spark, points, cell_size, grid):
    df = spark.createDataFrame(points, "id long, x double, y double")
    got = (
        knn_edges(df, k=5, cell_size=cell_size, grid=grid)
        .orderBy("id", "rank")
        .collect()
    )
    expected = brute_force_knn(points, 5)
    by_id = {
        pid: [(r["nbr"], r["d2"]) for r in rows]
        for pid, rows in itertools.groupby(got, key=lambda r: r["id"])
    }
    assert set(by_id) == set(expected)
    for pid in expected:
        assert by_id[pid] == expected[pid], \
            f"id {pid} cell_size {cell_size} grid {grid}"


def test_knn_rank_is_dense_and_bounded(spark, points):
    df = spark.createDataFrame(points, "id long, x double, y double")
    edges = knn_edges(df, k=3, cell_size=10.0)
    per_id = edges.groupBy("id").agg(
        F.count("*").alias("c"), F.max("rank").alias("mx")
    )
    bad = per_id.where((F.col("c") != 3) | (F.col("mx") != 3)).count()
    assert bad == 0


def brute_force_dwithin(pts, radius):
    r2 = radius * radius
    out = {}
    for pid, px, py in pts:
        nbrs = sorted(
            ((px - qx) ** 2 + (py - qy) ** 2, qid)
            for qid, qx, qy in pts
            if qid != pid and (px - qx) ** 2 + (py - qy) ** 2 <= r2
        )
        out[pid] = [(qid, d2) for d2, qid in nbrs]
    return out


@pytest.mark.parametrize("cell_size", [None, 12.0])
def test_within_distance_matches_bruteforce(spark, points, cell_size):
    from crankshaft_spark.operators.knn import within_distance

    df = spark.createDataFrame(points, "id long, x double, y double")
    got = (
        within_distance(df, 6.0, cell_size=cell_size)
        .orderBy("id", "rank").collect()
    )
    expected = brute_force_dwithin(points, 6.0)
    by_id = {}
    for r in got:
        by_id.setdefault(r["id"], []).append((r["nbr"], r["d2"]))
        assert r["rank"] == len(by_id[r["id"]])  # dense per-id ranks
    for pid, nbrs in expected.items():
        assert by_id.get(pid, []) == nbrs, f"id {pid}"
    # symmetric: (i,j) present exactly when (j,i) is
    pairs = {(r["id"], r["nbr"]) for r in got}
    assert pairs == {(b, a) for a, b in pairs}


def test_within_distance_guards(spark, points):
    from crankshaft_spark.operators.knn import within_distance

    df = spark.createDataFrame(points, "id long, x double, y double")
    with pytest.raises(ValueError, match="radius"):
        within_distance(df, 0.0)
    with pytest.raises(ValueError, match="ring-1"):
        within_distance(df, 6.0, cell_size=3.0)
