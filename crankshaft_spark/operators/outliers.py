"""Outlier detectors (CDB_StaticOutlier / CDB_PercentOutlier / CDB_StdDevOutlier).

Reference: /root/reference/src/pg/sql/18_outliers.sql — pure column algebra
over global aggregates; here each is one broadcast single-row aggregate join
plus a comparison, fully whole-stage-codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def outlier_static(df: DataFrame, *, value_col: str = "value",
                   threshold: float = 0.0) -> DataFrame:
    """is_outlier ⇔ value > threshold (18_outliers.sql:4-12)."""
    return df.select(
        "id", (F.col(value_col) > F.lit(threshold)).alias("is_outlier")
    )


def outlier_percent(df: DataFrame, *, value_col: str = "value",
                    outlier_fraction: float = 1.5) -> DataFrame:
    """is_outlier ⇔ value/avg(value) > fraction; reference errors when the
    global mean is 0 (18_outliers.sql:27-29) — we return an empty result for
    that case upstream; rows keep NULL if mean is 0."""
    stats = df.agg(F.avg(value_col).alias("_avg"))
    return (
        df.join(F.broadcast(stats))
        .select(
            "id",
            F.when(F.col("_avg") != 0.0,
                   (F.col(value_col) / F.col("_avg")) > F.lit(outlier_fraction))
            .alias("is_outlier"),
        )
    )


def outlier_stddev(df: DataFrame, *, value_col: str = "value",
                   num_deviations: float = 3.0,
                   is_symmetric: bool = True) -> DataFrame:
    """is_outlier ⇔ |v−μ|/σ > k (or one-sided (v−μ)/σ > k when not symmetric);
    σ is the sample stddev as in PostgreSQL's stddev (18_outliers.sql:45-75)."""
    stats = df.agg(
        F.avg(value_col).alias("_avg"), F.stddev_samp(value_col).alias("_sd")
    )
    dev = (F.col(value_col) - F.col("_avg")) / F.col("_sd")
    crit = F.abs(dev) if is_symmetric else dev
    return (
        df.join(F.broadcast(stats))
        .select("id", (crit > F.lit(num_deviations)).alias("is_outlier"))
    )
