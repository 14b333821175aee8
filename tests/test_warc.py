"""WARC source: record framing, gzip members, error channel, round trip.

The reference has no ingest surface (analysis_data_provider.py subquery
SPI); these tests cover the engine-native Common-Crawl-style WARC reader
(sources/warc.py) — the parser must never fail a task on malformed bytes,
and the synth → WARC → parse → extract round trip must reproduce the page
table byte-for-byte (the north-rule extraction invariant, upstream of the
oracle-checked page_extract warc arm).
"""

from __future__ import annotations

import gzip
import io
import os

from pyspark.sql import functions as F

from crankshaft_spark.sources.warc import (
    gzip_member,
    parse_file_bytes,
    parse_warc_stream,
    read_warc,
    warc_record_bytes,
    warc_roundtrip_pages,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

REC = [warc_record_bytes(f"https://h{i}.org/page/{i}",
                         "2024-03-05T06:07:08Z",
                         f"<p>body {i} &amp;</p>".encode())
       for i in range(4)]


def _parse(blob: bytes) -> list[dict]:
    return list(parse_file_bytes("t.warc", blob))


def test_plain_stream_framing():
    out = _parse(b"".join(REC))
    assert [r["ok"] for r in out] == [True] * 4
    assert [r["url"] for r in out] == [f"https://h{i}.org/page/{i}"
                                       for i in range(4)]
    assert all(r["http_status"] == 200 for r in out)
    assert out[0]["html"] == b"<p>body 0 &amp;</p>"
    assert out[0]["content_type"] == "text/html; charset=utf-8"
    assert out[0]["warc_date"] == "2024-03-05T06:07:08Z"
    # offsets are record starts: each next offset = previous + record length
    assert out[1]["record_offset"] == len(REC[0])
    assert out[2]["record_offset"] == len(REC[0]) + len(REC[1])


def test_gzip_members_and_whole_file_gzip():
    # Common-Crawl layout: one gzip member per record, concatenated
    members = b"".join(gzip_member(r) for r in REC)
    assert [r["url"][-1] for r in _parse(members)] == ["0", "1", "2", "3"]
    # whole-file gzip (single member) parses identically
    whole = gzip.compress(b"".join(REC))
    assert len(_parse(whole)) == 4 and all(r["ok"] for r in _parse(whole))


def test_error_channel_never_raises():
    # bad magic
    out = _parse(b"HTTP/1.1 200 OK\r\n\r\n")
    assert out[0]["ok"] is False and "bad_magic" in out[0]["err"]
    # truncated payload: declared length longer than the bytes present
    cut = REC[0][: len(REC[0]) - 30]
    out = _parse(cut)
    assert out[0]["ok"] is False and "truncated_payload" in out[0]["err"]
    # missing Content-Length header
    nolen = (b"WARC/1.0\r\nWARC-Type: response\r\n\r\n")
    out = _parse(nolen)
    assert out[0]["ok"] is False
    # corrupt gzip header -> one stream_error row, no exception
    out = _parse(b"\x1f\x8b" + b"\x00" * 20)
    assert out[0]["ok"] is False and "stream_error" in out[0]["err"]
    # valid gzip header but corrupt DEFLATE payload (zlib.error, not OSError)
    good = gzip_member(REC[0])
    out = _parse(good[:12] + bytes(255 - b for b in good[12:]))
    assert out and out[-1]["ok"] is False and "stream_error" in out[-1]["err"]
    # framing error after a good record still yields the good record
    out = _parse(REC[0] + b"garbage that is not a warc header\r\n")
    assert out[0]["ok"] is True and out[1]["ok"] is False


def test_non_http_record_passthrough():
    rec = warc_record_bytes("https://h.org/x", "2024-01-01T00:00:00Z",
                            b"\x00\x01binary", warc_type="resource")
    (r,) = _parse(rec)
    assert r["ok"] and r["warc_type"] == "resource"
    assert r["html"] == b"\x00\x01binary" and r["http_status"] is None


def test_separator_slack_and_eof_tolerance():
    # stray CRLF between records; final separator truncated at EOF
    blob = REC[0] + b"\r\n" + REC[1][:-4]
    out = _parse(blob)
    assert [r["ok"] for r in out] == [True, True]
    # trailer cut MID-separator: the record's payload arrived complete, so
    # it must be kept (a short read of the 4-byte separator means EOF)
    for cut in (1, 2, 3):
        out = _parse(REC[0][:-cut])
        assert [r["ok"] for r in out] == [True], cut
    # but a 4-byte read that is NOT the separator mid-stream is an error
    out = _parse(REC[0][:-4] + b"XXWARC/1.0\r\n")
    assert out[-1]["ok"] is False and "bad_separator" in out[-1]["err"]


def test_generator_is_streaming():
    # consuming one record must not require the rest of the stream
    stream = io.BytesIO(b"".join(REC))
    gen = parse_warc_stream(stream)
    first = next(gen)
    assert first["ok"] and stream.tell() <= len(REC[0]) + len(REC[1])


def test_fuzz_parser_never_raises():
    """Arbitrary bytes → finite record list, no exception, errors typed.

    The per-record error channel is the operator's crash-safety contract
    (a corrupt file must cost one error row, not a task): hypothesis
    drives raw garbage, garbage grafted onto valid records, and
    bit-flipped gzip members through the same entry point read_warc uses.
    """
    from hypothesis import given, settings
    from hypothesis import strategies as st

    valid = b"".join(REC[:2])

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=2048), st.integers(0, 3))
    def run(blob, mode):
        if mode == 1:
            blob = valid + blob          # garbage trailer after good records
        elif mode == 2:
            blob = blob + valid          # garbage preamble
        elif mode == 3:
            gz = gzip_member(valid)      # bit-damaged gzip member
            cut = min(len(blob) % max(len(gz), 1), len(gz) - 1)
            blob = gz[:cut] + blob
        out = _parse(blob)
        assert isinstance(out, list)
        for r in out:
            assert r["ok"] in (True, False)
            if not r["ok"]:
                assert r["err"]
        if mode == 1:
            # the valid prefix always survives a corrupt trailer
            assert [r["ok"] for r in out[:2]] == [True, True]

    run()


def test_read_warc_files(spark, tmp_path):
    plain = tmp_path / "a.warc"
    plain.write_bytes(b"".join(REC[:2]))
    gz = tmp_path / "b.warc.gz"
    gz.write_bytes(b"".join(gzip_member(r) for r in REC[2:]))
    out = read_warc(spark, str(tmp_path)).orderBy("url").collect()
    assert [r["url"][-1] for r in out] == ["0", "1", "2", "3"]
    assert all(r["ok"] for r in out)
    assert out[0]["warc_ts"].isoformat().startswith("2024-03-05T06:07:08")
    assert {os.path.basename(r["warc_file"]) for r in out} == {
        "a.warc", "b.warc.gz"}


def test_roundtrip_matches_source_bytes(spark):
    """synth → JVM record expr → gzip members → parse → extract == source."""
    from crankshaft_spark.sources.webpages import extract_text, synth_webpages

    rt = warc_roundtrip_pages(spark, SF_DIR, files=4)
    ext = extract_text(rt.filter("ok")).select(
        "page_id", "url", "warc_ts",
        F.col("extracted_text").alias("t1"), "http_status")
    src = synth_webpages(spark, SF_DIR).select(
        "page_id", F.col("url").alias("u0"), F.col("warc_ts").alias("ts0"),
        F.col("text").alias("t0"))
    j = ext.join(src, "page_id", "full")
    assert j.filter(
        "t0 IS DISTINCT FROM t1 OR ts0 IS DISTINCT FROM warc_ts "
        "OR u0 IS DISTINCT FROM url OR http_status <> 200").count() == 0
    assert j.count() == src.count()
