"""Gravity / Huff model (CDB_Gravity).

Reference: /root/reference/src/pg/sql/07_gravity.sql:32-115 — for each
source, candidate targets within ``radius`` (ST_DWithin, :84-91), then
distance-decay share h = 100·(w/d)/Σ_targets(w/d) and hpop = pop·h/100
(denominator per source, :93-100).

Distributed form: the radius join is a cellv1 candidate equi-join (ring
sized to ceil(radius/cell_size)) + exact distance filter; the denominator is
one groupBy over the pair table — no per-row subqueries.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crankshaft_spark.functions.cells import cell_expr, ring_cells_expr
from crankshaft_spark.functions.distance import planar_dist2


def gravity_huff(
    sources: DataFrame,
    targets: DataFrame,
    *,
    radius: float,
    cell_size: float | None = None,
    pop_col: str = "pop",
    weight_col: str = "weight",
    minval: float = -10e307,
) -> DataFrame:
    """sources: (id, x, y, pop); targets: (id, x, y, weight).

    Returns (source_id, target_id, dist, h, hpop) for all pairs within
    ``radius`` (planar units).  Targets with weight <= ``minval`` are
    excluded before the join (the reference's ``WHERE tw > minval``,
    07_gravity.sql:89; default excludes nothing).
    """
    cs = cell_size or radius
    ring = max(1, math.ceil(radius / cs))
    src = sources.select(
        F.col("id").alias("source_id"), "x", "y", F.col(pop_col).alias("pop")
    ).withColumn("cell", cell_expr(F.col("x"), F.col("y"), cs))
    tgt = targets.where(F.col(weight_col) > F.lit(minval)).select(
        F.col("id").alias("target_id"),
        F.col("x").alias("tx"),
        F.col("y").alias("ty"),
        F.col(weight_col).alias("w"),
    ).withColumn("cell", cell_expr(F.col("tx"), F.col("ty"), cs))

    pairs = (
        src.select(
            "source_id", "x", "y", "pop",
            F.explode(ring_cells_expr(F.col("cell"), ring)).alias("cell"),
        )
        .join(tgt, "cell")
        .withColumn(
            "dist",
            F.sqrt(planar_dist2(F.col("x"), F.col("y"), F.col("tx"), F.col("ty"))),
        )
        .where((F.col("dist") <= F.lit(radius)) & (F.col("dist") > 0))
    )
    denom = pairs.groupBy("source_id").agg(
        F.sum(F.col("w") / F.col("dist")).alias("_den")
    )
    return (
        pairs.join(denom, "source_id")
        .select(
            "source_id",
            "target_id",
            "dist",
            (F.lit(100.0) * (F.col("w") / F.col("dist")) / F.col("_den")).alias("h"),
            (F.col("pop") * (F.col("w") / F.col("dist")) / F.col("_den")).alias("hpop"),
        )
    )
