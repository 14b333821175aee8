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
