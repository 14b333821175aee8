"""WARC (Web ARChive) source: Common-Crawl-style crawl files.

Engine-native source format (the reference has no ingest of its own — every
crankshaft call receives a ``subquery TEXT`` executed over SPI,
/root/reference/src/py/crankshaft/crankshaft/analysis_data_provider.py:27-149).
The north rule's input is an Iceberg table of *Common-Crawl-style web pages*;
Common Crawl itself publishes WARC, so a user pointing this engine at a raw
crawl needs WARC → page-table extraction before anything else runs.

Record layout per the public ISO 28500 / WARC 1.0 format: a version line
(``WARC/1.0``), ``Name: value`` header lines (CRLF), one blank line, exactly
``Content-Length`` payload bytes, then a CRLF CRLF record separator.  For
``WARC-Type: response`` records the payload is an HTTP response message
(status line + headers + blank line + body).  Common Crawl compresses each
record as its *own gzip member* and concatenates the members, so a reader
can split a file at member boundaries; stdlib ``gzip.GzipFile`` iterates
concatenated members transparently, which is all this sandbox needs.

Scale shape (100 TB crawl): ``spark.read.format("binaryFile")`` assigns one
WARC file per task — crawl files are sized for that (~1 GiB gzipped).  The
parser is a *generator over a file-like stream*: gzip members inflate
lazily through ``GzipFile`` as the generator is drained, and the Arrow
stage drains it in bounded batches — so decompressed data never exceeds
O(batch) while only the *compressed* blob is file-resident (inherent to
the binaryFile source, which materializes the content column per file).  Parsing itself is necessarily
Python (binary framing, no JVM expression form) but Arrow-batched
``mapInPandas`` — one Python crossing per file, not per record, the same
contract as operators/multimodal.py.

Malformed input is a per-record error channel (``ok=false`` + ``err`` rows),
never a task failure: one corrupt file among millions must not kill a crawl
job.  A framing error (bad magic / bad Content-Length) ends that *file* with
an error row carrying the failure offset — once the declared length lies,
every later boundary in the stream is unknowable, so resync would fabricate
records (per-member gzip bounds the blast radius on real crawls).

The column-expression writer (``warc_record_expr``) exists so tests and the
driver oracle can synthesise records closed-form from the page table; it
assumes UTF-8 ``html`` (true for sources/webpages synthesis).  The Python
writer (``warc_record_bytes``) handles arbitrary payload bytes.
"""

from __future__ import annotations

import gzip
import io
import zlib

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: pinned record-format version for synthesised records.
WARC_VERSION = "warcv1"

#: parsed-record schema (warc_date stays a string here; read_warc converts
#: JVM-side so timestamp semantics follow the UTC-pinned session, not pandas).
RECORD_SCHEMA = (
    "warc_file string, record_offset long, warc_type string, url string, "
    "warc_date string, http_status int, content_type string, html binary, "
    "ok boolean, err string"
)

_DATE_FMT = "yyyy-MM-dd'T'HH:mm:ss'Z'"
_CRLF = b"\r\n"


# ------------------------------------------------------------- writers ------

def _http_head_expr(body_len: Column) -> Column:
    return F.concat(
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html; "
              "charset=utf-8\r\nContent-Length: "),
        body_len.cast("string"),
        F.lit("\r\n\r\n"),
    )


def warc_record_expr(url: Column, warc_ts: Column, html: Column) -> Column:
    """One WARC/1.0 response record as a binary Column (closed-form).

    ``html`` must be UTF-8 text bytes (synth_webpages' contract) — the
    record is assembled as a string and cast once; arbitrary binary payloads
    go through :func:`warc_record_bytes` instead.  The record id is a
    deterministic md5-of-url URI so re-synthesis is bit-identical.
    """
    body = html.cast("string")
    body_len = F.octet_length(body)
    http_head = _http_head_expr(body_len)
    payload_len = F.octet_length(http_head) + body_len
    return F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "),
        url,
        F.lit("\r\nWARC-Date: "),
        F.date_format(warc_ts, _DATE_FMT),
        F.lit("\r\nWARC-Record-ID: <urn:md5:"),
        F.md5(url.cast("binary")),
        F.lit(">\r\nContent-Type: application/http; msgtype=response"
              "\r\nContent-Length: "),
        payload_len.cast("string"),
        F.lit("\r\n\r\n"),
        http_head,
        body,
        F.lit("\r\n\r\n"),
    ).cast("binary")


def warc_record_bytes(url: str, date_iso: str, html: bytes,
                      warc_type: str = "response") -> bytes:
    """Python twin of :func:`warc_record_expr` for arbitrary payload bytes."""
    if warc_type == "response":
        head = (f"HTTP/1.1 200 OK\r\nContent-Type: text/html; "
                f"charset=utf-8\r\nContent-Length: {len(html)}\r\n\r\n"
                ).encode()
        payload = head + html
        ctype = "application/http; msgtype=response"
    else:
        payload = html
        ctype = "application/octet-stream"
    import hashlib
    rid = hashlib.md5(url.encode()).hexdigest()
    hdr = (
        f"WARC/1.0\r\nWARC-Type: {warc_type}\r\nWARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date_iso}\r\nWARC-Record-ID: <urn:md5:{rid}>\r\n"
        f"Content-Type: {ctype}\r\nContent-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return hdr + payload + _CRLF + _CRLF


def gzip_member(record: bytes) -> bytes:
    """One record as its own gzip member (Common-Crawl layout); mtime pinned
    to 0 so synthesised files are bit-identical across runs."""
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(record)
    return buf.getvalue()


# ------------------------------------------------------------- parser -------

def _read_line(stream, limit: int = 65536) -> bytes:
    line = stream.readline(limit)
    if line and not line.endswith(b"\n") and len(line) >= limit:
        raise ValueError("header line exceeds 64 KiB")
    return line


def parse_warc_stream(stream):
    """Yield one dict per record from a (decompressed) WARC byte stream.

    Generator — memory is O(record).  Yields ``ok=False`` dicts for
    malformed records; a framing error yields one error dict and stops (the
    stream offset after a broken Content-Length is meaningless — see module
    docstring).
    """
    offset = 0
    while True:
        start = offset
        line = _read_line(stream)
        offset += len(line)
        if not line:
            return
        if line in (_CRLF, b"\n"):  # stray separator slack between records
            continue
        if not line.startswith(b"WARC/"):
            yield {"record_offset": start, "ok": False,
                   "err": f"bad_magic:{line[:20]!r}"}
            return
        headers = {}
        try:
            while True:
                hline = _read_line(stream)
                offset += len(hline)
                if hline in (_CRLF, b"\n"):
                    break
                if not hline:
                    raise ValueError("eof_in_headers")
                if b":" not in hline:
                    raise ValueError(f"bad_header:{hline[:20]!r}")
                k, v = hline.split(b":", 1)
                headers[k.strip().lower()] = v.strip()
            length = int(headers[b"content-length"])
            if length < 0:
                raise ValueError("negative_content_length")
        except (ValueError, KeyError) as exc:
            yield {"record_offset": start, "ok": False, "err": str(exc)}
            return
        payload = stream.read(length)
        offset += len(payload)
        if len(payload) < length:
            yield {"record_offset": start, "ok": False,
                   "err": f"truncated_payload:{len(payload)}/{length}"}
            return
        # consume the record separator; a short read here means EOF, so a
        # trailer truncated mid-separator must not discard a record whose
        # declared payload arrived complete
        sep = stream.read(4)
        offset += len(sep)
        if not (sep == b"\r\n\r\n"
                or (len(sep) < 4 and b"\r\n\r\n".startswith(sep))):
            yield {"record_offset": start, "ok": False,
                   "err": f"bad_separator:{sep!r}"}
            return
        rec = {
            "record_offset": start,
            "warc_type": headers.get(b"warc-type", b"").decode("ascii",
                                                               "replace"),
            "url": headers.get(b"warc-target-uri", b"").decode("utf-8",
                                                               "replace"),
            "warc_date": headers.get(b"warc-date", b"").decode("ascii",
                                                               "replace"),
            "http_status": None, "content_type": None,
            "html": payload, "ok": True, "err": None,
        }
        ctype = headers.get(b"content-type", b"")
        if rec["warc_type"] == "response" and ctype.startswith(
                b"application/http"):
            split = payload.find(b"\r\n\r\n")
            if split < 0:
                rec.update(ok=False, err="http_head_unterminated", html=None)
            else:
                head, body = payload[:split], payload[split + 4:]
                status_line = head.split(_CRLF, 1)[0].split(b" ")
                try:
                    rec["http_status"] = int(status_line[1])
                except (IndexError, ValueError):
                    rec.update(ok=False, err="bad_status_line", html=None)
                for hline in head.split(_CRLF)[1:]:
                    if hline.lower().startswith(b"content-type:"):
                        rec["content_type"] = (
                            hline.split(b":", 1)[1].strip()
                            .decode("ascii", "replace"))
                if rec["ok"]:
                    rec["html"] = body
        yield rec


def parse_file_bytes(name: str, blob: bytes):
    """All records of one WARC file (plain or gzipped), as plain dicts.

    The single code path behind both :func:`read_warc` and the in-plan
    round-trip arm — gzip is sniffed from the member magic, so the same
    parser covers .warc and .warc.gz.
    """
    stream = io.BytesIO(blob)
    if blob[:2] == b"\x1f\x8b":
        stream = gzip.GzipFile(fileobj=stream)
    base = {"warc_file": name, "warc_type": None, "url": None,
            "warc_date": None, "http_status": None, "content_type": None,
            "html": None}
    try:
        for rec in parse_warc_stream(stream):
            yield {**base, **rec}
    # gzip header corruption is OSError (BadGzipFile) but a corrupt DEFLATE
    # payload under a valid header raises zlib.error, which is neither
    except (OSError, EOFError, ValueError, zlib.error) as exc:
        yield {**base, "record_offset": -1, "ok": False,
               "err": f"stream_error:{exc}"}


_COLS = [f.split(" ")[0] for f in RECORD_SCHEMA.split(", ")]


def _records_frame(rows: list[dict]) -> pd.DataFrame:
    # object dtype keeps absent values as None (NOT NaN) across the Arrow
    # boundary — the repo-wide NULL-channel rule (CLAUDE.md, pandas NaN ≠
    # SQL NULL); ints are cast by Spark from the declared schema.
    return pd.DataFrame({c: pd.Series([r.get(c) for r in rows],
                                      dtype="object") for c in _COLS})


def parse_warc_files(files: DataFrame, path_col: str = "path",
                     content_col: str = "content") -> DataFrame:
    """(path, content) file table → parsed record table (RECORD_SCHEMA)."""

    def run(pdfs):
        for pdf in pdfs:
            for name, blob in zip(pdf[path_col], pdf[content_col]):
                # drain the generator incrementally: decompressed records
                # never accumulate beyond one Arrow batch (the compressed
                # blob itself is resident — inherent to the binaryFile
                # source, which materializes the content column per file)
                rows: list[dict] = []
                for rec in parse_file_bytes(name, bytes(blob)):
                    rows.append(rec)
                    if len(rows) >= 512:
                        yield _records_frame(rows)
                        rows = []
                if rows:
                    yield _records_frame(rows)

    return files.select(path_col, content_col).mapInPandas(
        run, schema=RECORD_SCHEMA)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read .warc / .warc.gz files into the parsed record table.

    One file per task via the built-in ``binaryFile`` source (its Catalyst
    relation prunes to the ``content`` column and partitions by file); adds
    ``warc_ts`` parsed JVM-side in the UTC-pinned session.
    """
    files = spark.read.format("binaryFile").load(path)
    return parse_warc_files(files).withColumn(
        "warc_ts", F.to_timestamp("warc_date", _DATE_FMT))


# ----------------------------------------------------- round-trip plan ------

def warc_roundtrip_pages(spark: SparkSession, sf_dir: str,
                         files: int = 8) -> DataFrame:
    """synth pages → WARC records → gzip-member files → parse → page table.

    The driver-oracle arm: because the round trip is the identity on
    (url, warc_ts, html), DuckDB needs only the closed-form page table —
    any framing, compression, or parsing defect breaks the value hash.
    Record bytes are built by the JVM expression writer; grouping into
    ``files`` files (pinned page_id order, per-record gzip members — the
    Common-Crawl layout) and parsing share one Arrow stage, with the parse
    going through exactly :func:`parse_file_bytes` as ``read_warc``.
    """
    from crankshaft_spark.functions.spread import spread_groups
    from crankshaft_spark.sources.webpages import synth_webpages

    pages = synth_webpages(spark, sf_dir)
    recs = pages.select(
        (F.col("page_id") % files).alias("file_id"),
        "page_id",
        warc_record_expr(F.col("url"), F.col("warc_ts"),
                         F.col("html")).alias("rec"),
    )

    def assemble_and_parse(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("page_id")
        name = f"synth-{int(pdf['file_id'].iloc[0]):05d}.warc.gz"
        blob = b"".join(gzip_member(bytes(r)) for r in pdf["rec"])
        return _records_frame(list(parse_file_bytes(name, blob)))

    recs = spread_groups(recs, "file_id", min_partitions=files)
    parsed = recs.groupBy("file_id").applyInPandas(
        assemble_and_parse, schema=RECORD_SCHEMA)
    return parsed.select(
        # nullif: regexp_extract misses as '' and ANSI cast(''→long) throws;
        # a corrupt url must surface as NULL page_id, not a task failure
        F.nullif(F.regexp_extract("url", r"/page/(\d+)$", 1), F.lit(""))
         .cast("long").alias("page_id"),
        "url",
        F.to_timestamp("warc_date", _DATE_FMT).alias("warc_ts"),
        "html", "http_status", "ok", "err",
    )
