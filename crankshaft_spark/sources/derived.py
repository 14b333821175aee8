"""Deterministic geospatial derivations over the driver-provided tables.

The reference's regression fixtures are point tables with ids and a numeric
value (ppoints, /root/reference/src/pg/test/fixtures/ppoints.sql).  For the
driver's DuckDB correctness harness we derive point coordinates from table
keys with *closed-form integer arithmetic* so the Spark plans and the oracle
SQL agree bit-for-bit (FIXTURES.md §2):

    x = -120 + ((key * 9973)  % 24000) / 100     ∈ [-120, 120)
    y =  -48 + ((key * 7919)  %  9600) / 100     ∈ [ -48,  48)

Integer multiply/modulo on BIGINT is exact in both engines; /100.0 is an
exact binary operation on the resulting small integers' doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _derive_xy(key: F.Column):
    x = F.lit(-120.0) + ((key * 9973) % 24000).cast("double") / 100.0
    y = F.lit(-48.0) + ((key * 7919) % 9600).cast("double") / 100.0
    return x, y


def customer_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id, x, y, value) — one point per customer, value = account balance."""
    c = load_table(spark, sf_dir, "customer")
    x, y = _derive_xy(F.col("c_custkey"))
    return c.select(
        F.col("c_custkey").alias("id"),
        x.alias("x"),
        y.alias("y"),
        F.col("c_acctbal").alias("value"),
        F.col("c_nationkey").alias("nationkey"),
    )


CUSTOMER_POINTS_SQL = """
    SELECT c_custkey AS id,
           -120.0 + CAST((c_custkey * 9973) % 24000 AS DOUBLE) / 100.0 AS x,
           -48.0  + CAST((c_custkey * 7919) % 9600  AS DOUBLE) / 100.0 AS y,
           c_acctbal AS value,
           c_nationkey AS nationkey
    FROM customer
"""


def supplier_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id, x, y, weight) — one point per supplier; positive weight."""
    s = load_table(spark, sf_dir, "supplier")
    x, y = _derive_xy(F.col("s_suppkey"))
    return s.select(
        F.col("s_suppkey").alias("id"),
        x.alias("x"),
        y.alias("y"),
        (F.abs(F.col("s_acctbal")) + F.lit(1.0)).alias("weight"),
    )


SUPPLIER_POINTS_SQL = """
    SELECT s_suppkey AS id,
           -120.0 + CAST((s_suppkey * 9973) % 24000 AS DOUBLE) / 100.0 AS x,
           -48.0  + CAST((s_suppkey * 7919) % 9600  AS DOUBLE) / 100.0 AS y,
           abs(s_acctbal) + 1.0 AS weight
    FROM supplier
"""
