"""Salted skew helpers + the spark-submit __main__ entry."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from crankshaft_spark.operators.skew import (
    salted_broadcast_join,
    two_level_agg,
    with_salt,
)


def _zipf_df(spark, n=5000):
    # hot key 0 gets ~half the rows
    return spark.range(n).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, 0).otherwise(F.col("id") % 50).alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
    )


def test_two_level_agg_matches_plain(spark):
    df = _zipf_df(spark)
    got = two_level_agg(
        df, ["k"],
        {"n": F.count(F.lit(1)), "s": F.sum("v"), "mx": F.max("v"),
         "mn": F.min("v")},
        salts=8,
    )
    exp = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"),
        F.max("v").alias("mx"), F.min("v").alias("mn"),
    )
    g = {r["k"]: (r["n"], r["s"], r["mx"], r["mn"]) for r in got.collect()}
    e = {r["k"]: (r["n"], r["s"], r["mx"], r["mn"]) for r in exp.collect()}
    assert g == e


def test_two_level_partial_bounds_reducer(spark):
    df = _zipf_df(spark)
    salted = with_salt(df, salts=8)
    per = salted.groupBy("k", "_salt").count().collect()
    hot = [r["count"] for r in per if r["k"] == 0]
    assert len(hot) == 8                       # hot key spread over 8 salts
    assert max(hot) < 2500                     # no salt holds the whole key


def test_salt_deterministic_across_parallelism(spark):
    df = _zipf_df(spark)
    a = sorted((r["id"], r["_salt"]) for r in with_salt(df, salts=8).collect())
    b = sorted(
        (r["id"], r["_salt"])
        for r in with_salt(df.repartition(13), salts=8).collect()
    )
    assert a == b


def test_salted_broadcast_join_matches_plain(spark):
    fact = _zipf_df(spark)
    dim = spark.createDataFrame(
        [(i, f"name{i}") for i in range(50)], "k long, name string"
    )
    got = salted_broadcast_join(fact, dim, "k", salts=4).select(
        "id", "k", "name"
    )
    exp = fact.join(dim, "k").select("id", "k", "name")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_main_entry_runs(spark, tmp_path, capsys):
    from crankshaft_spark.__main__ import main

    out = str(tmp_path / "hot.parquet")
    ck = str(tmp_path / "ck")
    rc = main(["--sf-dir", "/root/testdata/sf0.001", "--output", out,
               "--checkpoint-dir", ck])
    assert rc == 0
    line = [ln for ln in capsys.readouterr().out.splitlines()
            if ln.startswith("{")][-1]
    payload = json.loads(line)
    assert payload["hotspot_rows"] > 0
    assert "gistar" in payload["stages"]
    assert payload["stages"]["pip"]["total_rows"] > 0
    assert all("partitions" in m for m in payload["stages"].values())
    # resumes from the manifests on a second run
    rc = main(["--sf-dir", "/root/testdata/sf0.001", "--output", out,
               "--checkpoint-dir", ck])
    assert rc == 0
    line = [ln for ln in capsys.readouterr().out.splitlines()
            if ln.startswith("{")][-1]
    assert all(m["resumed"] for m in json.loads(line)["stages"].values())
