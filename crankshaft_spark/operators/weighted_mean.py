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


def weighted_spread(
    df: DataFrame,
    *,
    group_cols: list[str] | None = None,
    x: str = "x",
    y: str = "y",
    weight: str = "w",
) -> DataFrame:
    """Per-group weighted per-axis standard deviation → (group…, sx, sy):
    the centrography companion of the mean center (the axis-aligned
    deviational-ellipse axes of CrimeStat/PySAL pointpats; the full
    ellipse needs atan2 — transcendental, outside the oracle contract —
    so the rotation is deliberately not offered).

        sx = sqrt(Σw·x² / Σw − (Σw·x / Σw)²)    (moment form, pinned
        operand order; greatest(…, 0) absorbs the tiny-negative rounding
        case so sqrt never sees −ε)

    Same shape as weighted_mean_center: one map-side-combinable grouped
    aggregate, no joins.
    """
    w = F.col(weight)
    sw = F.sum(w)
    mx = F.sum(F.col(x) * w) / sw
    my = F.sum(F.col(y) * w) / sw
    sx = F.sqrt(F.greatest(
        F.sum(w * F.col(x) * F.col(x)) / sw - mx * mx, F.lit(0.0)))
    sy = F.sqrt(F.greatest(
        F.sum(w * F.col(y) * F.col(y)) / sw - my * my, F.lit(0.0)))
    grouped = df.groupBy(*(group_cols or []))
    return grouped.agg(sx.alias("sx"), sy.alias("sy"))
