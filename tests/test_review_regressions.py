"""Regression tests for the round-1 code-review findings."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_kmeans_nonspatial_survives_empty_cluster(spark):
    """k greater than the number of distinct points leaves clusters empty;
    silhouette stats must not crash or mis-index."""
    from crankshaft_spark.operators.kmeans import kmeans_nonspatial

    df = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 0.0, 0.0), (3, 10.0, 10.0), (4, 10.0, 10.0)],
        "id long, a double, b double",
    )
    out = kmeans_nonspatial(df, ["a", "b"], k=4, standardize=False,
                            n_init=2).collect()
    assert len(out) == 4
    assert all(np.isfinite(r["silhouette"]) for r in out)


def test_polylabel_covers_max_edge_strip(spark):
    """Elongated polygon whose pole lies in the strip the old seed grid
    missed (bbox 2.5x1: centers used to stop at x=2.0)."""
    from crankshaft_spark.operators.geometry import pia

    # rectangle 2.5 x 1: PIA is anywhere on y=0.5 with dist 0.5; widen the
    # right end so the true pole is at the right side, inside the old gap
    ring = [(0.0, 0.3), (2.0, 0.3), (2.0, 0.0), (2.5, 0.0),
            (2.5, 1.0), (2.0, 1.0), (2.0, 0.7), (0.0, 0.7)]
    df = spark.createDataFrame(
        [(1, [p[0] for p in ring], [p[1] for p in ring])],
        "poly_id long, xs array<double>, ys array<double>",
    )
    r = pia(df, tolerance=1e-4).collect()[0]
    # true pole: x=2.25-ish in the wide right lobe, dist 0.25
    assert r["x"] > 2.0 and abs(r["dist"] - 0.25) < 0.02


def test_pip_concave_polygon_no_false_interior(spark):
    """Concave polygon with a notch inside one index cell: points in the
    notch must NOT be claimed via the interior shortcut."""
    from crankshaft_spark.operators.pip import pip_join

    # C-shape around a notch at (1.5..2.5) x (1.5..2.5); cell_size 4 puts
    # the whole polygon (and notch) inside one cell whose corners would be
    # outside anyway — use a big C spanning cells so corners sit in solid
    ring = [(-179.0, -89.0), (-165.0, -89.0), (-165.0, -75.0),
            (-179.0, -75.0), (-179.0, -80.0), (-170.0, -80.0),
            (-170.0, -84.0), (-179.0, -84.0)]
    polys = [(1, ring)]
    pts = spark.createDataFrame(
        [(1, -172.0, -82.0),   # inside the notch (outside polygon)
         (2, -167.0, -82.0)],  # in the solid right arm
        "page_id long, lon double, lat double",
    )
    got = {r["page_id"]: r["poly_id"]
           for r in pip_join(pts, polys, cell_size=4.0).collect()}
    assert 1 not in got
    assert got.get(2) == 1


def test_simhash_max_hamming_guard(spark):
    from crankshaft_spark.operators.dedup import simhash_pairs

    df = spark.createDataFrame([(1, "abcdef")], "doc_id long, text string")
    with pytest.raises(ValueError, match="recall"):
        simhash_pairs(df, max_hamming=8)


def test_gwr_predict_rejects_more_unknowns_than_train(spark):
    from crankshaft_spark.operators.gwr import gwr_predict

    rng = np.random.RandomState(0)
    rows = [
        (i, float(rng.rand() * 100), float(rng.rand() * 100),
         None if i >= 20 else float(rng.rand()),
         float(rng.rand()), float(rng.rand()))
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "id long, x double, y double, dep double, f1 double, f2 double"
    )
    with pytest.raises(ValueError, match="prediction rows"):
        gwr_predict(df, "dep", ["f1", "f2"], bw=10, cell_size=30.0)


def test_two_level_agg_rejects_avg(spark):
    from crankshaft_spark.operators.skew import two_level_agg

    df = spark.range(10).select("id", (F.col("id") % 2).alias("k"),
                                F.col("id").cast("double").alias("v"))
    with pytest.raises(ValueError, match="avg"):
        two_level_agg(df, ["k"], {"m": F.avg("v")}, salts=4)
