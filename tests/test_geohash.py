"""Geohash codec: canonical public test vectors, pure-Python replay over a
coordinate sweep, ancestor-prefix property, bounds round-trip, clamps and
the domain guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crankshaft_spark.functions.cells import (
    GEOHASH_B32,
    geohash_bounds_expr,
    geohash_chars_expr,
    geohash_code_expr,
    geohash_expr,
)


def _py_geohash(lon: float, lat: float, precision: int) -> str:
    """Independent reference implementation: textbook bisection form of
    the Niemeyer algorithm (no shared arithmetic with the column form)."""
    lo_lon, hi_lon, lo_lat, hi_lat = -180.0, 180.0, -90.0, 90.0
    bits, out, even = [], [], True
    while len(bits) < 5 * precision:
        if even:
            mid = (lo_lon + hi_lon) / 2
            if lon >= mid:
                bits.append(1)
                lo_lon = mid
            else:
                bits.append(0)
                hi_lon = mid
        else:
            mid = (lo_lat + hi_lat) / 2
            if lat >= mid:
                bits.append(1)
                lo_lat = mid
            else:
                bits.append(0)
                hi_lat = mid
        even = not even
    for k in range(precision):
        v = 0
        for b in bits[5 * k:5 * k + 5]:
            v = v * 2 + b
        out.append(GEOHASH_B32[v])
    return "".join(out)


def _hashes(spark, rows, precision):
    df = spark.createDataFrame(rows, "lon double, lat double")
    return [
        r["gh"]
        for r in df.select(
            geohash_expr(F.col("lon"), F.col("lat"), precision).alias("gh")
        ).collect()
    ]


def test_canonical_vectors(spark):
    # the two classic public examples (Niemeyer / the geohash.org docs)
    rows = [(-5.603, 42.605), (10.40744, 57.64911)]
    assert _hashes(spark, rows, 5) == ["ezs42", "u4pru"]
    assert _hashes(spark, rows, 11)[1] == "u4pruydqqvj"


def test_python_replay_sweep(spark):
    rows = [
        (-180.0 + (i * 17 % 360) + 0.37, -90.0 + (i * 11 % 180) + 0.21)
        for i in range(60)
    ]
    for p in (1, 4, 7):
        got = _hashes(spark, rows, p)
        want = [_py_geohash(lon, lat, p) for lon, lat in rows]
        assert got == want


def test_prefix_property(spark):
    rows = [(-73.5, 40.7), (151.2, -33.9), (0.0, 0.0), (-0.1, -0.1)]
    short = _hashes(spark, rows, 3)
    long = _hashes(spark, rows, 9)
    assert [g[:3] for g in long] == short


def test_edge_clamp(spark):
    # +180 / +90 land in the last column/row: all-ones code = 'z' * p
    assert _hashes(spark, [(180.0, 90.0)], 4) == ["zzzz"]


def test_bounds_round_trip(spark):
    p = 5
    rows = [(-5.603, 42.605), (10.40744, 57.64911), (-179.9, -89.9)]
    df = spark.createDataFrame(rows, "lon double, lat double").select(
        "lon", "lat",
        geohash_code_expr(F.col("lon"), F.col("lat"), p).alias("code"))
    out = df.select(
        "lon", "lat", "code",
        geohash_bounds_expr(F.col("code"), p).alias("b"),
        geohash_chars_expr(F.col("code"), p).alias("gh")).collect()
    for r in out:
        b = r["b"]
        assert b["west"] <= r["lon"] < b["east"]
        assert b["south"] <= r["lat"] < b["north"]
        # cell extents at p=5: 13 lon bits, 12 lat bits
        assert b["east"] - b["west"] == pytest.approx(360.0 / (1 << 13))
        assert b["north"] - b["south"] == pytest.approx(180.0 / (1 << 12))
        assert r["gh"] == _py_geohash(r["lon"], r["lat"], p)


def test_domain_guard(spark):
    from pyspark.errors import PySparkRuntimeError, SparkRuntimeException

    df = spark.createDataFrame([(181.0, 0.0)], "lon double, lat double")
    with pytest.raises((PySparkRuntimeError, SparkRuntimeException, Exception),
                       match="geohash"):
        df.select(geohash_expr(F.col("lon"), F.col("lat"), 4)).collect()


def test_precision_guard(spark):
    with pytest.raises(ValueError, match="precision"):
        geohash_expr(F.lit(0.0), F.lit(0.0), 0)
    with pytest.raises(ValueError, match="precision"):
        geohash_expr(F.lit(0.0), F.lit(0.0), 13)
