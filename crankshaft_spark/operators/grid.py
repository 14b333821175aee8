"""Raster↔vector grid aggregation (zoom-leveled density grids).

Reference analogues: CDB_RectangleGrid (/root/reference/src/pg/sql/
cdb_utils.sql:19-96) generates grid cells; CDB_Contour
(/root/reference/src/pg/sql/19_contour.sql:126-135) aggregates per cell/bin.
Our engine's raster side is the cellv1 key itself: a density grid at zoom z
is one groupBy over the cell id at that resolution — pure map-side-combine
aggregation, the cheapest possible distributed plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crankshaft_spark.functions.cells import CELL_M, cell_expr


def density_grid(
    pts: DataFrame,
    *,
    x: str = "x",
    y: str = "y",
    cell_sizes: list[float] = (1.0,),
    value_col: str | None = None,
) -> DataFrame:
    """(zoom, cell, n [, v_sum]) — one row per non-empty cell per zoom level;
    zoom index is the position in ``cell_sizes``."""
    parts = []
    for zoom, size in enumerate(cell_sizes):
        g = pts.withColumn("cell", cell_expr(F.col(x), F.col(y), size)).groupBy(
            "cell"
        )
        aggs = [F.count("*").alias("n")]
        if value_col is not None:
            aggs.append(F.sum(value_col).alias("v_sum"))
        parts.append(g.agg(*aggs).select(F.lit(zoom).alias("zoom"), "*"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def rectangle_grid(
    spark,
    x0: float,
    y0: float,
    x1: float,
    y1: float,
    width: float,
    height: float,
) -> DataFrame:
    """Generate grid cells covering [x0,x1]×[y0,y1] → (cx, cy, xmin, ymin,
    xmax, ymax) — pure sequence/explode, no driver loop (CDB_RectangleGrid
    parity for axis-aligned extents)."""
    import math

    nx = max(1, math.ceil((x1 - x0) / width))
    ny = max(1, math.ceil((y1 - y0) / height))
    return (
        spark.range(1)
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(nx - 1))).alias("cx")
        )
        .select(
            "cx", F.explode(F.sequence(F.lit(0), F.lit(ny - 1))).alias("cy")
        )
        .select(
            "cx",
            "cy",
            (F.lit(x0) + F.col("cx") * width).alias("xmin"),
            (F.lit(y0) + F.col("cy") * height).alias("ymin"),
            (F.lit(x0) + (F.col("cx") + 1) * width).alias("xmax"),
            (F.lit(y0) + (F.col("cy") + 1) * height).alias("ymax"),
        )
    )
