"""Structured Streaming ingest: file source -> watermarked cell rollup."""

from __future__ import annotations

from pyspark.sql import functions as F

from crankshaft_spark.sources.webpages import synth_webpages
from crankshaft_spark.streaming.ingest import (
    read_page_stream,
    stream_cell_density,
    stream_quality_screen,
)


def test_stream_cell_density_matches_batch(spark, tmp_path):
    src = str(tmp_path / "pages")
    pages = synth_webpages(spark, "/root/testdata/sf0.001")
    pages.write.parquet(src)

    stream = read_page_stream(spark, src)
    assert stream.isStreaming
    agg = stream_cell_density(stream, cell_size=2.0, window="1 hour")

    q = (
        agg.writeStream.format("memory")
        .queryName("cells_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.sql(
        "SELECT cell, sum(n_pages) AS n FROM cells_stream GROUP BY cell"
    ).collect()
    # cell ids must match the engine's cell_expr exactly
    from crankshaft_spark.functions.cells import cell_expr

    expect = (
        pages.withColumn("cell", cell_expr(F.col("lon"), F.col("lat"), 2.0))
        .groupBy("cell")
        .count()
        .collect()
    )
    gmap = {r["cell"]: r["n"] for r in got}
    emap = {r["cell"]: r["count"] for r in expect}
    assert gmap == emap


def test_stream_quality_screen_stateless(spark, tmp_path):
    src = str(tmp_path / "pages2")
    synth_webpages(spark, "/root/testdata/sf0.001").write.parquet(src)
    stream = stream_quality_screen(read_page_stream(spark, src))
    q = (
        stream.select("page_id", "lang")
        .writeStream.format("memory")
        .queryName("screened")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM screened").collect()
    assert len(rows) > 0
    assert all(r["lang"] in ("en", "es", "de", "fr", "pt") for r in rows)


def test_sessionize_stateful(spark, tmp_path):
    """applyInPandasWithState sessionization: gap-closed sessions match a
    batch computation of the same rule."""
    import pandas as pd
    from pyspark.sql import functions as F

    from crankshaft_spark.streaming.sessions import sessionize

    src = str(tmp_path / "events")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "user_id", "ts"
    )
    ev.write.parquet(src)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .parquet(src)
    )
    q = (
        sessionize(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT user_id, session_start, session_end, n_events FROM sessions "
        "WHERE closed_by = 'gap'"
    ).collect()

    # batch reference: sessions = gap-split runs per user; drop each user's
    # LAST session (still open in state at end of the single micro-batch)
    w_rows = ev.collect()
    by_user = {}
    for r in w_rows:
        by_user.setdefault(r["user_id"], []).append(r["ts"])
    expected = set()
    for uid, tss in by_user.items():
        tss.sort()
        sessions = []
        start = prev = tss[0]
        n = 0
        for t in tss:
            if n > 0 and (t - prev).total_seconds() > 1800:
                sessions.append((start, prev, n))
                start, n = t, 0
            prev = t
            n += 1
        # open tail session not emitted as 'gap'
        for s, e, c in sessions:
            expected.add((uid, s, e, c))
    got_set = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in got
    }
    assert got_set == expected
    assert len(expected) > 0


def test_sessionize_batch_known_sessions(spark):
    from crankshaft_spark.streaming.sessions import sessionize_batch

    rows = [
        (1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:05:00"),
        (1, "2024-01-01 01:00:00"),              # > 30min gap -> new session
        (2, "2024-01-01 00:00:00"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts string").selectExpr(
        "user_id", "CAST(ts AS TIMESTAMP) AS ts"
    )
    got = sorted(
        (r["user_id"], str(r["session_start"]), str(r["session_end"]),
         r["n_events"])
        for r in sessionize_batch(ev, gap_seconds=1800).collect()
    )
    assert got == [
        (1, "2024-01-01 00:00:00", "2024-01-01 00:05:00", 2),
        (1, "2024-01-01 01:00:00", "2024-01-01 01:00:00", 1),
        (2, "2024-01-01 00:00:00", "2024-01-01 00:00:00", 1),
    ]
