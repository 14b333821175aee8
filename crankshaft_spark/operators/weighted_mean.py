"""Weighted mean center (CDB_WeightedMean aggregate).

Reference: PL/pgSQL custom aggregate accumulating Σxw, Σyw, Σw
(/root/reference/src/pg/sql/11_kmeans.sql:50-100).  In Spark this is a plain
grouped aggregation — map-side partial aggregation for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def weighted_mean_center(
    df: DataFrame,
    *,
    group_cols: list[str] | None = None,
    x: str = "x",
    y: str = "y",
    weight: str = "w",
) -> DataFrame:
    """Per-group weighted mean point → (group…, cx, cy)."""
    gx = F.sum(F.col(x) * F.col(weight)) / F.sum(weight)
    gy = F.sum(F.col(y) * F.col(weight)) / F.sum(weight)
    grouped = df.groupBy(*(group_cols or []))
    return grouped.agg(gx.alias("cx"), gy.alias("cy"))
