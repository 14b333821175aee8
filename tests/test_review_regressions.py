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


def test_shingles_short_text_empty(spark):
    """Texts shorter than n must yield NO shingles (Spark's descending
    sequence(1, 0) used to mint phantom shingles the oracle lacks)."""
    from crankshaft_spark.operators.text import ngram_jaccard_pairs, shingles

    df = spark.createDataFrame(
        [(1, "abc"), (2, "abc"), (3, "abcdefgh")], "doc_id long, text string"
    )
    sh = shingles(df, n=4).collect()
    assert {r["doc_id"] for r in sh} == {3}
    assert ngram_jaccard_pairs(df, n=4, threshold=0.5).count() == 0


def test_sessionize_late_event_extends_start(spark, tmp_path):
    """A late event admitted by the watermark that predates the open
    session's start must move the boundary back (or form its own session),
    not be silently folded in."""
    import pandas as pd

    from crankshaft_spark.streaming.sessions import sessionize

    src = str(tmp_path / "late_events")
    t0 = pd.Timestamp("2024-01-01 10:00:00").to_pydatetime()

    def mins(m):
        import datetime

        return t0 + datetime.timedelta(minutes=m)

    batch1 = spark.createDataFrame(
        [(1, t0), (1, mins(5))], "user_id long, ts timestamp"
    ).coalesce(1)
    batch1.write.parquet(src + "/b1")
    # late event 10 min BEFORE the open session's start, plus a closer event
    batch2 = spark.createDataFrame(
        [(1, mins(-10)),
         (1, mins(90))],  # closes the session by gap
        "user_id long, ts timestamp",
    ).coalesce(1)

    stream = spark.readStream.schema("user_id long, ts timestamp").option(
        "maxFilesPerTrigger", 1
    ).parquet(src + "/b*")
    q = (
        sessionize(stream, gap_seconds=1800, watermark="4 hours")
        .writeStream.format("memory").queryName("late_sessions")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(60)
    batch2.write.parquet(src + "/b2")
    q2 = (
        sessionize(stream, gap_seconds=1800, watermark="4 hours")
        .writeStream.format("memory").queryName("late_sessions2")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q2.awaitTermination(60)
    rows = spark.sql(
        "SELECT * FROM late_sessions2 WHERE closed_by = 'gap'"
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    # the session must START at the late 09:50 event and count all 3 events
    assert r["session_start"] == mins(-10)
    assert r["n_events"] == 3
