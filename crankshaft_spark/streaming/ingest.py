"""Incremental crawl ingest via Structured Streaming.

The reference has NO streaming surface (batch SQL functions only —
exhaustive read of /root/reference/src/pg/sql/*.sql; SURVEY.md §1.2), so
this is an engine-native extension: the same web-page table shape
(url, warc_ts, html, text, lang) arriving incrementally, rolled into the
engine's cell grid with event-time windows + watermarked late-data
handling.  Batch operators then consume the materialized rollups — the
streaming layer only ever maintains small per-(window, cell) aggregate
state, never per-page state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crankshaft_spark.functions.cells import cell_expr

PAGE_SCHEMA = (
    "page_id long, url string, warc_ts timestamp, html binary, "
    "text string, lang string, host_id long, lon double, lat double"
)


def read_page_stream(spark, path: str, *, max_files: int = 16) -> DataFrame:
    """File-source stream of page batches (parquet drops into ``path``).

    On a real deployment this is the Iceberg/Kafka source; the file source
    keeps the test story hermetic.  maxFilesPerTrigger bounds batch size.
    """
    return (
        spark.readStream.schema(PAGE_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def stream_cell_density(
    pages: DataFrame,
    *,
    cell_size: float = 2.0,
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time windowed per-cell page/host rollup with late-data bound.

    → (window, cell, n_pages, n_hosts): the streaming twin of the batch
    pipeline's cellagg stage; append-mode compatible (aggregation closes
    when the watermark passes the window end).

    NULL event times are filtered first: F.window(NULL) forms a NULL
    window whose end the watermark can never pass, so in append mode
    those groups would never emit AND their state rows would never be
    evicted — a silent state leak for the lifetime of the query.
    """
    return (
        pages.where(F.col("warc_ts").isNotNull())
        .withWatermark("warc_ts", watermark)
        .withColumn("cell", cell_expr(F.col("lon"), F.col("lat"), cell_size))
        .groupBy(F.window("warc_ts", window), F.col("cell"))
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.approx_count_distinct("host_id").alias("n_hosts"),
        )
    )


def stream_quality_screen(
    pages: DataFrame,
    *,
    min_chars: int = 50,
    langs: tuple[str, ...] = ("en", "es", "de", "fr", "pt"),
) -> DataFrame:
    """Stateless per-page quality filter — runs entirely map-side in the
    stream (no state, no shuffle): drop short or unknown-language pages.
    """
    return pages.where(
        (F.length("text") >= min_chars) & F.col("lang").isin(*langs)
    )
