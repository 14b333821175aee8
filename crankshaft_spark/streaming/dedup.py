"""Streaming deduplication for incremental crawl ingest.

Engine-native extension (the reference is batch-only PL/pgSQL — SURVEY.md
§1.2): a training-data pipeline ingesting a crawl stream must drop
re-crawls *online*, before they reach storage, not in a nightly batch
sweep.  Both operators bound their state by the event-time watermark via
``dropDuplicatesWithinWatermark`` — the state store holds only the dedup
key per in-horizon row, never page payloads, so state size is
O(distinct keys per watermark window) regardless of total stream length.

Semantics vs the batch family (operators/dedup.py, operators/text.py):

* ``stream_dedup_exact`` is the streaming twin of ``dedup_exact`` — a
  duplicate arriving within the watermark horizon of its first occurrence
  is dropped; one arriving later is re-admitted (bounded-state tradeoff,
  inherent to streaming dedup — document downstream batch ``dedup_exact``
  as the exact backstop).
* ``stream_dedup_near`` collapses signature-identical near-duplicates: the
  per-row ``simhash_expr`` (bit-identical to the batch grouped simhash)
  is the key, so re-crawls whose shingle-set majority votes are unchanged
  (hamming distance 0) dedup online.  Hamming ≤ k matching requires
  pairwise candidate state and stays batch-side (``simhash_pairs``) — an
  honest recall boundary, not an approximation of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crankshaft_spark.operators.dedup import simhash_expr

#: unit-separator joint for multi-column dedup keys — cannot appear in a
#: column's own text without being visible in both halves of a collision.
_SEP = "\x1f"


def stream_dedup_exact(
    pages: DataFrame,
    *,
    key_cols: tuple[str, ...] = ("text",),
    ts: str = "warc_ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Keep the first in-horizon occurrence per exact content key.

    The key is md5 over the unit-separated ``key_cols`` — the state store
    keeps the 32-char digest, not the page text (a crawl row's html/text
    payload never enters state).  Works on batch DataFrames too (falls back
    to plain dropDuplicates semantics over the whole input).
    """
    keyed = pages.withWatermark(ts, watermark).withColumn(
        "_dk", F.md5(F.concat_ws(_SEP, *key_cols))
    )
    if pages.isStreaming:
        out = keyed.dropDuplicatesWithinWatermark(["_dk"])
    else:
        out = keyed.dropDuplicates(["_dk"])
    return out.drop("_dk")


def stream_dedup_near(
    pages: DataFrame,
    *,
    text_col: str = "text",
    n: int = 4,
    ts: str = "warc_ts",
    watermark: str = "30 minutes",
    keep_signature: bool = False,
) -> DataFrame:
    """Keep the first in-horizon occurrence per 32-bit SimHash signature.

    Texts shorter than ``n`` have no shingle set (simhash_expr is NULL
    there); they fall back to exact-text keys rather than colliding into
    one NULL bucket.  ``keep_signature`` retains the ``simhash`` column
    for downstream observability / batch reconciliation joins.
    """
    keyed = (
        pages.withWatermark(ts, watermark)
        .withColumn("simhash", simhash_expr(text_col, n=n))
        .withColumn(
            "_dk",
            F.coalesce(
                F.col("simhash").cast("string"),
                F.concat(F.lit("short:"), F.md5(F.col(text_col))),
            ),
        )
    )
    if pages.isStreaming:
        out = keyed.dropDuplicatesWithinWatermark(["_dk"])
    else:
        out = keyed.dropDuplicates(["_dk"])
    out = out.drop("_dk")
    return out if keep_signature else out.drop("simhash")
