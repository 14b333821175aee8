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
  per-row simhash (bit-identical to the batch grouped simhash; hashes
  materialized once via ``shingle_hashes_expr``) is the key, so re-crawls
  whose shingle-set majority votes are unchanged (hamming distance 0)
  dedup online.  Hamming ≤ k matching requires pairwise candidate state
  and stays batch-side (``simhash_pairs``) — an honest recall boundary,
  not an approximation of it.

NULL policy: a row whose dedup key is undefined (every key column NULL,
or NULL text in the near path) OR whose event time is NULL is PASSED
THROUGH, never deduplicated — unknown content is not "equal" to other
unknown content, a NULL key under SQL distinct semantics would silently
collapse every extraction-failed page into one survivor, and a NULL
event time has no watermark expiry horizon (its state row would evict
at the first watermark advance, silently re-admitting re-crawls).

Plan-shape invariants (pytest-asserted by counting md5 nodes in the
optimized plan):

* the md5-per-shingle array is computed ONCE per row — both the key and
  the optional signature column reference the materialized ``_hxs`` alias
  directly (CollapseProject never inlines a non-cheap multi-referenced
  alias; a single-consumer intermediate would be inlined and cascade the
  copies back in);
* the defined/undefined split filters on a CHEAP definedness predicate
  (text/key-column NULL-ness), never on the key expression itself —
  filtering on ``_dk IS NULL`` looks equivalent but predicate pushdown
  substitutes the entire key expression into a pre-projection Filter and
  re-evaluates every shingle md5 per branch.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crankshaft_spark.operators.dedup import (
    shingle_hashes_expr,
    simhash_from_hashes,
)

#: joint for multi-column keys.  Each part below is a fixed-width md5
#: digest (or the 1-char NULL marker), so no value can smuggle a separator
#: across field boundaries and NULL never collapses into the empty string.
_SEP = "\x1f"


def _dedup_on_key(pages: DataFrame, key: Column, defined: Column, *,
                  ts: str, watermark: str) -> DataFrame:
    """First in-horizon row per key among rows where ``defined`` holds;
    rows failing ``defined`` pass through.  ``defined`` must be a cheap
    never-NULL predicate equivalent to the key being well-defined (see the
    module plan-shape invariants).  Rows with a NULL event time also pass
    through, in BOTH forms: dropDuplicatesWithinWatermark has no defined
    expiry horizon for a NULL event time (state would evict at the first
    watermark advance, silently re-admitting NULL-ts re-crawls), so the
    NULL policy treats a missing timestamp like a missing key and the
    batch fallback mirrors it to keep the twins aligned.  Batch fallback
    keeps the deterministic minimum of (event time, row hash) per key —
    NOT dropDuplicates' arbitrary partition-order representative, which
    would violate the repo's bit-identical-at-any-parallelism
    invariant."""
    defined = defined & F.col(ts).isNotNull()
    wm = pages.withWatermark(ts, watermark)
    with_key = wm.where(defined).withColumn("_dk", key)
    pass_through = wm.where(~defined)
    if pages.isStreaming:
        kept = with_key.dropDuplicatesWithinWatermark(["_dk"]).drop("_dk")
        return kept.unionByName(pass_through)
    cols = pages.columns
    order = F.struct(F.col(ts), F.xxhash64(*[F.col(c) for c in cols]))
    kept = (
        with_key.groupBy("_dk")
        .agg(F.min_by(F.struct(*cols), order).alias("_r"))
        .select("_r.*")
    )
    return kept.unionByName(pass_through)


def stream_dedup_exact(
    pages: DataFrame,
    *,
    key_cols: tuple[str, ...] = ("text",),
    ts: str = "warc_ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Keep the first in-horizon occurrence per exact content key.

    The key joins one fixed-width md5 digest per ``key_cols`` entry (NULL
    column → a non-digest marker, so NULL ≠ '' and field boundaries are
    unambiguous); the state store keeps digests, never page text.  Rows
    with every key column NULL pass through undeduplicated (module NULL
    policy).  Works on batch DataFrames too (deterministic
    min-(ts, row-hash) representative per key).
    """
    parts = [
        F.coalesce(F.md5(F.col(c).cast("string")), F.lit("-"))
        for c in key_cols
    ]
    key = F.md5(F.concat_ws(_SEP, *parts))
    defined = reduce(
        Column.__or__, [F.col(c).isNotNull() for c in key_cols]
    )
    return _dedup_on_key(pages, key, defined, ts=ts, watermark=watermark)


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

    The shingle-hash array is materialized once per row (module plan-shape
    invariants).  Texts shorter than ``n`` have no shingle set; they fall
    back to exact-text keys rather than colliding into one NULL bucket,
    and NULL text passes through (module NULL policy).  ``keep_signature``
    appends the ``simhash`` column for downstream observability / batch
    reconciliation joins (replacing any same-named input column; without
    it the input's own columns pass through untouched).
    """
    staged = pages.withColumn("_hxs", shingle_hashes_expr(text_col, n=n))
    sig = simhash_from_hashes(F.col("_hxs"))
    if keep_signature:
        # derive the key from the materialized signature column — it is
        # multi-referenced (key + output) and non-cheap, so
        # CollapseProject keeps it and the 32-vote fold runs once per
        # row instead of once for the key and once for the column
        staged = staged.withColumn("_simhash", sig)
        sig = F.col("_simhash")
    key = F.coalesce(
        sig.cast("string"),
        F.concat(F.lit("short:"), F.md5(F.col(text_col))),
    )
    out = _dedup_on_key(
        staged, key, F.col(text_col).isNotNull(), ts=ts, watermark=watermark
    ).drop("_hxs")
    if keep_signature:
        if "simhash" in out.columns:
            out = out.drop("simhash")
        return out.withColumnRenamed("_simhash", "simhash")
    return out
