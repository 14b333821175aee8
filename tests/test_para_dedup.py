"""Paragraph-level exact dedup (RefinedWeb rewrite policy): toy cases +
DuckDB oracle parity on the gate arm's synthetic paragraph text."""

from __future__ import annotations

import duckdb

from crankshaft_spark.operators.text import (
    dedup_paragraphs, dedup_paragraphs_oracle_sql)


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup_paragraphs(df, **kw)
    return {r["doc_id"]: (r["n_paras"], r["n_kept"], r["text"])
            for r in out.collect()}


def test_cross_doc_and_within_doc_dups(spark):
    rows = [
        (1, "A\n\nB\n\nA"),        # within-doc dup: trailing A drops
        (2, "B\n\nC"),             # B lost to doc 1 pos 1
        (3, "C\n\nD\n\nB"),        # C lost to doc 2, B lost to doc 1
    ]
    got = _run(spark, rows)
    assert got[1] == (3, 2, "A\n\nB")
    assert got[2] == (2, 1, "C")
    assert got[3] == (3, 1, "D")


def test_empty_null_and_total_loss(spark):
    rows = [
        (1, "X\n\n\n\nY"),   # empty middle cell removed, not deduped
        (2, "X\n\nY"),       # loses both -> rewrites to ''
        (3, None),           # NULL passes through
        (4, ""),             # no paragraphs at all
    ]
    got = _run(spark, rows)
    assert got[1] == (2, 2, "X\n\nY")
    assert got[2] == (2, 0, "")
    assert got[3] == (0, 0, None)
    assert got[4] == (0, 0, "")


def test_custom_separator_is_literal(spark):
    # '|' is a regex metachar — the operator must escape it for split
    rows = [(1, "a|b"), (2, "b|c")]
    got = _run(spark, rows, sep="|")
    assert got[1] == (2, 2, "a|b")
    assert got[2] == (2, 1, "c")


def test_oracle_parity_gate_arm(spark):
    from crankshaft_spark.plans.driver_queries import (
        _docs, _para_text_expr, _para_text_sql)
    from pyspark.sql import functions as F

    sf_dir = "/root/testdata/sf0.001"
    docs = _docs(spark, sf_dir).select(
        "doc_id", _para_text_expr().alias("text"))
    got = {r["doc_id"]: (r["n_paras"], r["n_kept"], r["text"])
           for r in dedup_paragraphs(docs).collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')")
    sql = dedup_paragraphs_oracle_sql(
        "SELECT doc_id, " + _para_text_sql() + " AS text FROM documents")
    want = {i: (a, b, t) for i, a, b, t in con.execute(sql).fetchall()}
    assert got == want
    # the arm exercises real duplication: some paragraphs must drop
    assert any(k < p for p, k, _ in want.values())
