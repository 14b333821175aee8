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
    # the quadkey tile path is a stateless projection, so it composes
    # onto the streaming aggregate (2-degree grid -> ix < 180 -> 8 levels)
    from crankshaft_spark.functions.cells import cell_expr, quadkey_expr

    agg = stream_cell_density(stream, cell_size=2.0, window="1 hour")
    agg = agg.withColumn("qk", quadkey_expr("cell", levels=8))

    q = (
        agg.writeStream.format("memory")
        .queryName("cells_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.sql(
        "SELECT cell, min(qk) AS qk, count(DISTINCT qk) AS nqk, "
        "sum(n_pages) AS n FROM cells_stream GROUP BY cell"
    ).collect()
    # cell ids AND tile paths must match the batch expressions exactly
    expect = (
        pages.withColumn("cell", cell_expr(F.col("lon"), F.col("lat"), 2.0))
        .groupBy("cell")
        .count()
        .withColumn("qk", quadkey_expr("cell", levels=8))
        .collect()
    )
    assert all(r["nqk"] == 1 for r in got)
    gmap = {r["cell"]: (r["n"], r["qk"]) for r in got}
    emap = {r["cell"]: (r["count"], r["qk"]) for r in expect}
    assert gmap == emap


def test_stream_hex_density_matches_batch(spark, tmp_path):
    """hexv1 as a streaming key: the hex encode is a stateless per-row
    projection, so keying the watermarked rollup on it composes exactly
    like the rect cell — stream counts per hex cell must equal the batch
    groupBy on the identical expression (parallelism/micro-batch
    independence of the closed-form encode)."""
    from crankshaft_spark.functions.cells import hex_cell_expr

    src = str(tmp_path / "pages_hex")
    pages = synth_webpages(spark, "/root/testdata/sf0.001")
    pages.write.parquet(src)

    stream = read_page_stream(spark, src).withColumn(
        "hcell", hex_cell_expr(F.col("lon"), F.col("lat"), 2.0))
    agg = (stream.withWatermark("warc_ts", "1 hour")
           .groupBy(F.window("warc_ts", "1 hour"), "hcell")
           .agg(F.count("*").alias("n_pages")))
    q = (agg.writeStream.format("memory").queryName("hex_stream")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {r["hcell"]: r["n"] for r in spark.sql(
        "SELECT hcell, sum(n_pages) AS n FROM hex_stream GROUP BY hcell"
    ).collect()}
    expect = {r["hcell"]: r["count"] for r in (
        pages.withColumn(
            "hcell", hex_cell_expr(F.col("lon"), F.col("lat"), 2.0))
        .groupBy("hcell").count().collect())}
    assert got == expect


def test_image_ahash_streaming_parity(spark, tmp_path):
    """image_ahash is a stateless mapInPandas, so it composes onto a
    media readStream unchanged; the streamed fingerprints equal the
    batch fingerprints of the same blobs."""
    from crankshaft_spark.operators.multimodal import image_ahash, synth_media

    src = str(tmp_path / "media")
    media = synth_media(spark, n=24, seed=42, fmt="real")
    media.write.parquet(src)

    stream = spark.readStream.schema(
        "media_id long, media binary").parquet(src)
    assert stream.isStreaming
    q = (
        image_ahash(stream, decoder="real")
        .writeStream.format("memory")
        .queryName("ahash_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {r["media_id"]: r["ahash"] for r in spark.sql(
        "SELECT media_id, ahash FROM ahash_stream").collect()}
    want = {r["media_id"]: r["ahash"]
            for r in image_ahash(media, decoder="real").collect()}
    assert want and got == want


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


def test_sessionize_stream_equals_batch_form(spark, tmp_path):
    """Replay one event log through the stateful streaming path in FOUR
    micro-batches (maxFilesPerTrigger=1) with out-of-order arrivals — the
    last two events of every time-chunk are delivered one batch late — and
    assert session-for-session equality with ``sessionize_batch`` on the
    same rows.  A far-future flush event pushes the watermark past every
    open session so tails close by timeout; gap- and timeout-closed
    sessions together must equal the batch gaps-and-islands output."""
    import datetime as dt
    import os

    from crankshaft_spark.streaming.sessions import sessionize, sessionize_batch

    gap_s = 600
    base = dt.datetime(2024, 1, 1)
    events = []
    for u in range(1, 7):
        t = base + dt.timedelta(minutes=u * 7)
        for _s in range(3):
            for _i in range(4):
                events.append((u, t))
                t += dt.timedelta(minutes=3)  # intra-session: 3 min < gap
            t += dt.timedelta(minutes=25)     # inter-session: 25 min > gap
    events.sort(key=lambda e: (e[1], e[0]))

    # four time-ordered chunks, then push each chunk's last two events into
    # the NEXT chunk's file — each event late by exactly one micro-batch
    # (≤ ~40 min, inside the 4h watermark; moves computed on the pristine
    # chunks so no event cascades multiple batches, which would arrive
    # after its session gap-closed — a legitimate streaming divergence the
    # equality contract excludes)
    chunks = [events[i * 18:(i + 1) * 18] for i in range(4)]
    moved = [c[-2:] for c in chunks[:3]]
    chunks = (
        [chunks[0][:-2]]
        + [chunks[i][:-2] + moved[i - 1] for i in (1, 2)]
        + [chunks[3] + moved[2]]
    )
    flush_ts = max(t for _, t in events) + dt.timedelta(hours=6)
    chunks.append([(999, flush_ts)])

    src = str(tmp_path / "replay")
    os.makedirs(src)
    for i, chunk in enumerate(chunks):
        # the file source lists flat files, not nested write dirs: write to
        # a scratch dir, then move the single part file into src
        scratch = str(tmp_path / f"scratch{i}")
        spark.createDataFrame(
            chunk, "user_id long, ts timestamp"
        ).coalesce(1).write.parquet(scratch)
        part = next(
            f for f in os.listdir(scratch)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        dst = f"{src}/batch{i}.parquet"
        os.rename(os.path.join(scratch, part), dst)
        # file-source ordering is by modification time: pin it increasing
        os.utime(dst, (1e9 + i, 1e9 + i))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sessionize(stream, gap_seconds=gap_s, watermark="4 hours")
        .writeStream.format("memory")
        .queryName("sessions_replay")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql(
        "SELECT * FROM sessions_replay WHERE user_id != 999"
    ).collect()

    ev = spark.createDataFrame(events, "user_id long, ts timestamp")
    expected = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize_batch(ev, gap_seconds=gap_s).collect()
    }
    got_set = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in got
    }
    assert got_set == expected
    # both closure paths exercised: mid-stream gaps and watermark timeouts
    closed_by = {r["closed_by"] for r in got}
    assert closed_by == {"gap", "timeout"}
    # every user's last session must have closed via the watermark flush
    assert sum(1 for r in got if r["closed_by"] == "timeout") == 6


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


def test_simhash_expr_matches_grouped_simhash(spark):
    """Per-row simhash_expr must be bit-identical to the grouped batch
    simhash on real document text — and NULL exactly where the grouped
    form drops the doc (text shorter than the shingle width)."""
    from crankshaft_spark.operators.dedup import simhash, simhash_expr

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text").limit(200)
    )
    docs = docs.union(spark.createDataFrame(
        [(90001, "abc"), (90002, ""), (90003, "abcd")],
        "doc_id long, text string",
    ))
    per_row = {
        r["doc_id"]: r["sh"]
        for r in docs.select(
            "doc_id", simhash_expr("text").alias("sh")).collect()
    }
    grouped = {
        r["doc_id"]: r["simhash"] for r in simhash(docs).collect()
    }
    assert per_row[90001] is None and per_row[90002] is None
    for did, sh in grouped.items():
        assert per_row[did] == sh, did
    assert len(grouped) == len([v for v in per_row.values() if v is not None])


def test_stream_dedup_replay(spark, tmp_path):
    """Three micro-batches of crawl rows with exact re-crawls and a
    one-char-edit near-duplicate: exact dedup keeps first occurrences and
    the edited page; near dedup (signature-identical) drops the edit too
    when its shingle majority votes are unchanged."""
    import datetime as dt
    import os

    from crankshaft_spark.operators.dedup import simhash_expr
    from crankshaft_spark.streaming.dedup import (
        stream_dedup_exact,
        stream_dedup_near,
    )

    base = dt.datetime(2024, 1, 1)
    body = "the quick brown fox jumps over the lazy dog " * 8
    # an edit that flips no 32-bit majority vote: duplicate one shingle
    # window (distinct-set unchanged except a handful of boundary shingles)
    near = body + "the quick brown fox"
    rows_by_batch = [
        [(1, "u1", base, body), (2, "u2", base + dt.timedelta(minutes=1),
                                 "completely different page body " * 10)],
        [(3, "u1", base + dt.timedelta(minutes=5), body)],   # exact re-crawl
        [(4, "u3", base + dt.timedelta(minutes=8), near),    # near re-crawl
         (5, "u4", base + dt.timedelta(minutes=9), "third distinct text " * 9)],
    ]
    schema = "page_id long, url string, warc_ts timestamp, text string"

    # only meaningful if the near-edit really is signature-identical
    sigs = {
        r["page_id"]: r["sh"]
        for r in spark.createDataFrame(
            [r for b in rows_by_batch for r in b], schema
        ).select("page_id", simhash_expr("text").alias("sh")).collect()
    }
    assert sigs[1] == sigs[4] and sigs[1] != sigs[2]

    src = str(tmp_path / "crawl")
    os.makedirs(src)
    for i, chunk in enumerate(rows_by_batch):
        scratch = str(tmp_path / f"scratch{i}")
        spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(scratch)
        part = next(f for f in os.listdir(scratch)
                    if f.startswith("part-") and f.endswith(".parquet"))
        dst = f"{src}/batch{i}.parquet"
        os.rename(os.path.join(scratch, part), dst)
        os.utime(dst, (1e9 + i, 1e9 + i))

    def run(op, name):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(src)
        )
        q = (
            op(stream)
            .writeStream.format("memory").queryName(name)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        return {r["page_id"] for r in spark.sql(
            f"SELECT page_id FROM {name}").collect()}

    exact = run(lambda s: stream_dedup_exact(s, watermark="1 hour"),
                "dedup_exact_stream")
    assert exact == {1, 2, 4, 5}    # page 3 = exact re-crawl, dropped
    near_ids = run(lambda s: stream_dedup_near(s, watermark="1 hour"),
                   "dedup_near_stream")
    assert near_ids == {1, 2, 5}    # page 4's signature matches page 1

    # batch fallback: same operators on a plain DataFrame, deterministic
    # representative = earliest warc_ts per key
    all_rows = spark.createDataFrame(
        [r for b in rows_by_batch for r in b], schema)
    exact_batch = stream_dedup_exact(all_rows, watermark="1 hour")
    assert {r["page_id"] for r in exact_batch.collect()} == {1, 2, 4, 5}
    assert stream_dedup_near(all_rows, watermark="1 hour").count() == 3
    near_kept = stream_dedup_near(
        all_rows, watermark="1 hour", keep_signature=True)
    assert {r["page_id"]: r["simhash"] for r in near_kept.collect()} == {
        1: sigs[1], 2: sigs[2], 5: sigs[5]}


def test_stream_dedup_null_and_key_semantics(spark):
    """Module NULL policy + key construction: NULL-text rows pass through
    undeduplicated; NULL ≠ '' under multi-column keys; separator chars in
    values cannot shift across field boundaries."""
    import datetime as dt

    from crankshaft_spark.streaming.dedup import (
        stream_dedup_exact,
        stream_dedup_near,
    )

    base = dt.datetime(2024, 1, 1)
    schema = "page_id long, url string, warc_ts timestamp, text string"
    rows = [
        (1, "u1", base, None),                      # NULL text: pass through
        (2, "u2", base + dt.timedelta(minutes=1), None),   # ... both of them
        (3, "u3", base + dt.timedelta(minutes=2), ""),     # '' is NOT NULL
        (4, "u4", base + dt.timedelta(minutes=3), ""),     # '' dups dedup
        (5, "a\x1fb", base + dt.timedelta(minutes=4), "c"),
        (6, "a", base + dt.timedelta(minutes=5), "b\x1fc"),
    ]
    df = spark.createDataFrame(rows, schema)
    got = {r["page_id"] for r in stream_dedup_exact(
        df, key_cols=("url", "text"), watermark="1 hour").collect()}
    assert got == {1, 2, 3, 4, 5, 6}    # all distinct under (url, text)
    got = {r["page_id"] for r in stream_dedup_exact(
        df, key_cols=("text",), watermark="1 hour").collect()}
    assert got == {1, 2, 3, 5, 6}       # NULLs pass; ''-dup page 4 dropped
    got = {r["page_id"] for r in stream_dedup_near(
        df, watermark="1 hour").collect()}
    assert 1 in got and 2 in got        # NULL text passes the near path too
    # input already carrying a simhash column: preserved without
    # keep_signature, replaced with it
    carrying = df.withColumn("simhash", df.page_id * 10)
    kept = stream_dedup_near(carrying, watermark="1 hour")
    assert {r["page_id"]: r["simhash"] for r in kept.collect()} == {
        r["page_id"]: r["page_id"] * 10 for r in kept.collect()}
    replaced = stream_dedup_near(
        carrying, watermark="1 hour", keep_signature=True)
    # every text here is NULL or shorter than the shingle width, so the
    # recomputed signature is NULL on all rows — the input's 10*id values
    # must be gone
    assert all(r["simhash"] is None for r in replaced.collect())


def test_stream_dedup_plan_materializes_hashes_once(spark):
    """Plan-shape invariant (streaming/dedup.py module docstring): the
    md5-per-shingle array appears ONCE in the optimized plan per branch —
    not inlined 33x into the vote expressions (CollapseProject) nor
    substituted into pushed-down Filters (split must use the cheap
    definedness predicate, never `_dk IS NULL`)."""
    from crankshaft_spark.streaming.dedup import (
        stream_dedup_exact,
        stream_dedup_near,
    )

    schema = "page_id long, url string, warc_ts timestamp, text string"
    df = spark.createDataFrame([(1, "u", None, "abcdefgh")], schema)
    for ks, cap in ((False, 2), (True, 3)):
        plan = (stream_dedup_near(df, watermark="1 hour", keep_signature=ks)
                ._jdf.queryExecution().optimizedPlan().toString())
        assert plan.count("md5") <= cap, plan
    plan = (stream_dedup_exact(df, key_cols=("url", "text"),
                               watermark="1 hour")
            ._jdf.queryExecution().optimizedPlan().toString())
    assert plan.count("md5") <= 4, plan


def test_streaming_contamination_flag(spark, tmp_path):
    """contaminated_expr is a stateless projection, so it runs inside a
    readStream pipeline and agrees row-for-row with the batch
    decontaminate operator over the same benchmark set."""
    import os

    from crankshaft_spark.operators.text import (
        contaminated_expr, decontaminate)

    schema = "doc_id long, text string"
    batches = [
        [(1, "the quick brown fox jumps over it"), (2, "clean words only")],
        [(3, "a quick brown fox jumps far away"), (4, "other clean text")],
    ]
    bench = spark.createDataFrame(
        [(0, "quick brown fox jumps")], "bench_id long, text string")
    grams = [r["g"] for r in bench.selectExpr(
        "explode(split(lower(text), ' ')) x").agg(
        F.collect_list("x").alias("w")).selectExpr(
        "explode(transform(sequence(1, size(w) - 2), "
        "i -> concat_ws(' ', w[i-1], w[i], w[i+1]))) g").collect()]

    src = str(tmp_path / "docs")
    os.makedirs(src)
    for i, chunk in enumerate(batches):
        scratch = str(tmp_path / f"s{i}")
        spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
            scratch)
        part = next(f for f in os.listdir(scratch)
                    if f.startswith("part-") and f.endswith(".parquet"))
        dst = f"{src}/b{i}.parquet"
        os.rename(os.path.join(scratch, part), dst)
        os.utime(dst, (1e9 + i, 1e9 + i))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream.select(
            "doc_id",
            contaminated_expr(F.col("text"), grams, n=3).alias("c"))
         .writeStream.format("memory").queryName("contam_stream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["doc_id"]: r["c"]
           for r in spark.sql("SELECT * FROM contam_stream").collect()}

    batch = {r["doc_id"]: r["contaminated"] for r in decontaminate(
        spark.createDataFrame([r for b in batches for r in b], schema),
        bench, n=3).collect()}
    assert got == batch
    assert got[1] is True and got[2] is False

    # mixed-case literals: the expr lowercases its gram list (the batch
    # operator lowercases the benchmark side), so case can't silently
    # drop every match
    all_docs = spark.createDataFrame(
        [r for b in batches for r in b], schema)
    upper = all_docs.select(
        "doc_id",
        contaminated_expr(
            F.col("text"), [g.upper() for g in grams], n=3).alias("c"))
    assert {r["doc_id"]: r["c"] for r in upper.collect()} == batch


def test_streaming_corpus_filter(spark, tmp_path):
    """corpus_filter is a single projection (all signals per-row array
    algebra), so the keep/drop verdict runs inside a readStream pipeline
    and agrees row-for-row with the batch form."""
    import os

    from crankshaft_spark.operators.text import corpus_filter

    schema = "doc_id long, text string"
    batches = [
        [(1, "tiny"),
         (2, "the cat and the dog of the house sat on the mat and the "
             "bird flew over the green field near the old river")],
        [(3, "el gato la casa de la ciudad el perro come en la casa "
             "grande de la ciudad vieja junto a la plaza")],
    ]
    src = str(tmp_path / "docs")
    os.makedirs(src)
    for i, chunk in enumerate(batches):
        scratch = str(tmp_path / f"s{i}")
        spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
            scratch)
        part = next(f for f in os.listdir(scratch)
                    if f.startswith("part-") and f.endswith(".parquet"))
        dst = f"{src}/b{i}.parquet"
        os.rename(os.path.join(scratch, part), dst)
        os.utime(dst, (1e9 + i, 1e9 + i))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (corpus_filter(stream, min_quality=0.2)
         .writeStream.format("memory").queryName("filter_stream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["doc_id"]: (r["keep"], r["reason"])
           for r in spark.sql("SELECT * FROM filter_stream").collect()}
    batch = {r["doc_id"]: (r["keep"], r["reason"]) for r in corpus_filter(
        spark.createDataFrame([r for b in batches for r in b], schema),
        min_quality=0.2).collect()}
    assert got == batch
    assert got[1] == (False, "low_quality")
    assert got[2] == (True, "ok")
    assert got[3] == (False, "lang")


def test_streaming_corpus_split(spark, tmp_path):
    """corpus_split is a stateless projection on row identity, so split
    bands assign inside a readStream pipeline and agree row-for-row with
    the batch form (the contract that lets ingest route train/val/test
    shards online)."""
    import os

    from crankshaft_spark.operators.sampling import corpus_split

    schema = "doc_id long, text string"
    batches = [[(i, f"doc {i}") for i in range(40)],
               [(i, f"doc {i}") for i in range(40, 80)]]
    src = str(tmp_path / "docs")
    os.makedirs(src)
    for i, chunk in enumerate(batches):
        scratch = str(tmp_path / f"s{i}")
        spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
            scratch)
        part = next(f for f in os.listdir(scratch)
                    if f.startswith("part-") and f.endswith(".parquet"))
        dst = f"{src}/b{i}.parquet"
        os.rename(os.path.join(scratch, part), dst)
        os.utime(dst, (1e9 + i, 1e9 + i))

    fr = (("train", 0.8), ("val", 0.1), ("test", 0.1))
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (corpus_split(stream, fractions=fr, seed=11)
         .writeStream.format("memory").queryName("split_stream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["doc_id"]: r["split"]
           for r in spark.sql("SELECT * FROM split_stream").collect()}
    batch = {r["doc_id"]: r["split"] for r in corpus_split(
        spark.createDataFrame([r for b in batches for r in b], schema),
        fractions=fr, seed=11).collect()}
    assert got == batch and len(got) == 80
    assert {"train", "val", "test"} >= set(got.values())
