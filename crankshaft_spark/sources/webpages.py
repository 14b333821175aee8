"""Common-Crawl-style web-page table (the BASELINE.json ``input_hint`` shape).

Schema: ``(url:string, warc_ts:timestamp, html:binary, text:string,
lang:string)`` plus engine columns (``page_id``, ``host_id``, ``lon``,
``lat``).  Synthesised deterministically from the driver-provided
``documents`` table (text/lang payload) so that every run — at any
parallelism level — produces byte-identical rows, per the north rule's
"byte-identical extracted text per url" invariant.

Derivations are *closed-form integer arithmetic* on ``doc_id`` (exact in
both Spark and the DuckDB oracle; the same technique as
crankshaft_spark.sources.derived).  On a real 10^12-row crawl the id would
come from the data itself (``xxhash64(url)``) — integer mixing here stands in
only because the oracle harness needs bit-identical cross-engine hashes.

Skew: ``host_id = H1 % (1 + (doc_id*40503) % 64)`` gives a Zipf-ish head
(host 0 receives ~7% of pages, host 1 ~5%, …), and pages of one host are
geocoded into a +/-2 deg disc around the host centroid — so hot hosts become
hot H3-style cells, exercising the salted/AQE skew path the north star
demands.

HTML round-trip: ``html`` is a deterministic UTF-8 document embedding the
HTML-escaped text in an ``<article>`` element; ``extract_text`` inverts it
with JVM-side ``regexp_extract`` + unescape (whole-stage codegen, no Python
in the hot path).  ``extract_text(synth) == text`` byte-for-byte.

Reference analogue: crankshaft has no ingest of its own (subquery TEXT via
SPI, /root/reference/src/py/crankshaft/crankshaft/analysis_data_provider.py:27-149);
the web-page shape comes from BASELINE.json input_hint.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: pinned derivation version — geocodes/tile assignments are contract.
WEBPAGES_VERSION = "webv1"

_EPOCH = "2024-01-01 00:00:00"


def _host_id(doc_id: Column) -> Column:
    h1 = (doc_id * 2654435761) % 4294967296
    return h1 % (1 + (doc_id * 40503) % 64)


def _host_id_zipf(doc_id: Column) -> Column:
    """Geometric (Zipf-tail) host assignment for skew stress benchmarks.

    u = (mix(doc_id)+1)/2^32 uniform in (0,1]; host = min(63, ⌊−log2 u⌋)
    gives host 0 ≈50% of all pages, host 1 ≈25%, … — one host (and so one
    ±2° geocode disc → a handful of agg cells) owns half the crawl.  This
    is the adversarial shape the north rule's "salted-key skew handling"
    clause names; tools/scalebench.py --skew zipf measures efficiency on
    it.  Still closed-form from doc_id: rows identical at any parallelism.
    """
    u = (((doc_id * 2654435761) % 4294967296) + 1).cast("double") / 4294967296.0
    return F.least(F.lit(63), F.floor(-F.log2(u))).cast("long")


def _html_col(url: Column, title: Column, esc_text: Column) -> Column:
    return F.concat(
        F.lit('<!DOCTYPE html><html><head><meta charset="utf-8"><title>'),
        title,
        F.lit("</title></head><body><article>"),
        esc_text,
        F.lit("</article><footer>"),
        url,
        F.lit("</footer></body></html>"),
    ).cast("binary")


def escape_html(c: Column) -> Column:
    return F.replace(
        F.replace(F.replace(c, F.lit("&"), F.lit("&amp;")),
                  F.lit("<"), F.lit("&lt;")),
        F.lit(">"), F.lit("&gt;"),
    )


def unescape_html(c: Column) -> Column:
    return F.replace(
        F.replace(F.replace(c, F.lit("&lt;"), F.lit("<")),
                  F.lit("&gt;"), F.lit(">")),
        F.lit("&amp;"), F.lit("&"),
    )


def synth_webpages(
    spark: SparkSession, sf_dir: str, multiplier: int = 1,
    skew: str = "mild",
) -> DataFrame:
    """The Iceberg-table stand-in: one web page per document row.

    Columns: page_id, url, warc_ts, html, text, lang, host_id, lon, lat.
    ``multiplier`` replicates the document payload with fresh deterministic
    page ids (id' = doc_id + max_id' * k) for scale benchmarking — every
    derived column (url, geocode, timestamp) still follows the closed-form
    id math, so two runs at any parallelism produce identical rows.

    ``skew``: ``"mild"`` (default, oracle-matched Zipf-ish head, ~7% on the
    top host) or ``"zipf"`` (geometric — top host owns ~50% of pages; skew
    stress path for scalebench, not oracle-checked).
    """
    if skew not in ("mild", "zipf"):
        raise ValueError(f"unknown skew profile {skew!r}")
    from crankshaft_spark.sources.derived import load_table
    d = load_table(spark, sf_dir, "documents")
    if multiplier > 1:
        # Partitioning is driven by the REPLICA axis with the (small) doc
        # payload broadcast: each of defaultParallelism×2 tasks synthesises
        # its own replicas, so the table build itself scales with the
        # cluster instead of inheriting the parquet file's partition count.
        id_span = d.agg(F.max("doc_id")).first()[0] + 1
        reps = (
            spark.range(multiplier)
            .select(F.col("id").alias("__rep"))
            .repartition(spark.sparkContext.defaultParallelism * 2)
        )
        d = reps.join(F.broadcast(d)).withColumn(
            "doc_id", F.col("doc_id") + F.lit(id_span) * F.col("__rep")
        ).drop("__rep")
    else:
        d = d.repartition(spark.sparkContext.defaultParallelism)
    doc_id = F.col("doc_id")
    host = _host_id_zipf(doc_id) if skew == "zipf" else _host_id(doc_id)
    url = F.concat(
        F.lit("https://host"), host.cast("string"),
        F.lit(".example.org/page/"), doc_id.cast("string"),
    )
    # host centroid on land-ish band + per-page jitter of +/- 2 deg
    hx = F.lit(-171.0) + ((host * 8863) % 342).cast("double")
    hy = F.lit(-78.0) + ((host * 9901) % 156).cast("double")
    jx = ((doc_id * 6151) % 400).cast("double") / 100.0 - 2.0
    jy = ((doc_id * 7607) % 400).cast("double") / 100.0 - 2.0
    warc_ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit(_EPOCH)) + (doc_id * 97) % 31536000
    )
    esc = escape_html(F.col("text"))
    title = F.concat(F.lit("Page "), doc_id.cast("string"))
    return d.select(
        doc_id.alias("page_id"),
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        _html_col(url, title, esc).alias("html"),
        F.col("text"),
        F.col("lang"),
        host.alias("host_id"),
        (hx + jx).alias("lon"),
        (hy + jy).alias("lat"),
    )


def extract_text(pages: DataFrame, html_col: str = "html",
                 out: str = "extracted_text") -> DataFrame:
    """Recover the article text from the raw html bytes.

    JVM-side regexp + string replace: stays inside whole-stage codegen, no
    Python worker crossing.  ``(?s)`` so article bodies may span lines.
    """
    body = F.regexp_extract(
        F.col(html_col).cast("string"), r"(?s)<article>(.*)</article>", 1
    )
    return pages.withColumn(out, unescape_html(body))


#: DuckDB-parity SQL for the synthesised page table (same integer math).
#: host_id is computed ONCE via DuckDB's lateral column-alias reuse — the
#: mixing constants that must stay bit-identical to _host_id have a single
#: SQL site instead of four hand-maintained copies.
WEBPAGES_SQL = f"""
    SELECT page_id, url, warc_ts, text, lang, host_id, lon, lat FROM (
      SELECT doc_id AS page_id,
             ((doc_id * 2654435761) % 4294967296)
                 % (1 + (doc_id * 40503) % 64) AS host_id,
             'https://host' || CAST(host_id AS VARCHAR)
                 || '.example.org/page/' || CAST(doc_id AS VARCHAR) AS url,
             TIMESTAMP '{_EPOCH}'
                 + to_seconds((doc_id * 97) % 31536000) AS warc_ts,
             text,
             lang,
             (-171.0 + CAST((host_id * 8863) % 342 AS DOUBLE))
               + (CAST((doc_id * 6151) % 400 AS DOUBLE) / 100.0 - 2.0)
               AS lon,
             (-78.0 + CAST((host_id * 9901) % 156 AS DOUBLE))
               + (CAST((doc_id * 7607) % 400 AS DOUBLE) / 100.0 - 2.0)
               AS lat
      FROM documents
    )
"""
