"""Point-in-polygon join: broadcast cell->polygon index + ray-cast refine.

The north-star core: points are assigned a grid cell
(crankshaft_spark.functions.cells), a small driver-built index maps each cell
to the polygons it can possibly touch, classified *interior* (cell fully
inside one polygon — accepted without any geometry test) or *boundary*
(refined by crossing-parity ray casting).  Both the index and the polygon
edge arrays are broadcast, and the ray cast itself is a JVM ``aggregate``
over the edge structs — the join is shuffle-free on the point side and has
NO Python stage at all (EXPLAIN.md).

Reference analogue: the bbox-prefilter + exact-geometry idiom
(``$1 && a.the_geom`` then ``ST_Intersection``,
/root/reference/src/pg/sql/20_overlap_sum.sql:29-35) and ``ST_Within`` use in
/root/reference/src/pg/sql/13_PIA.sql:127 — re-expressed as an equi-join on
the cell key (filter) plus a codegen'd parity expression (refine).

Scale notes (10^12 rows): the admin/tile layer is O(10^4-10^6) polygons; the
cell index is O(cells-per-polygon x polygons) rows — small enough to
broadcast.  Interior cells dominate at fine index resolution, so the parity
aggregate does real work only on the O(perimeter/area) fraction of points.
No shuffle at all on the big table: scan -> broadcast hash-join -> filter.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crankshaft_spark.functions.cells import CELL_M, cell_expr

Polygon = tuple[int, list[tuple[float, float]]]


def _is_convex(ring: np.ndarray) -> bool:
    x, y = ring[:, 0], ring[:, 1]
    x1, y1 = np.roll(x, -1), np.roll(y, -1)
    x2, y2 = np.roll(x, -2), np.roll(y, -2)
    cr = (x1 - x) * (y2 - y1) - (y1 - y) * (x2 - x1)
    return bool((cr >= 0).all() or (cr <= 0).all())


def _ray_cast(lon: np.ndarray, lat: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Strict point-in-ring by crossing parity; half-open rule on y.

    Operand order matches crankshaft_spark.sources.admin.pip_oracle_sql so
    IEEE doubles agree bit-for-bit with the DuckDB oracle.
    """
    x1, y1 = ring[:, 0], ring[:, 1]
    x2 = np.roll(x1, -1)
    y2 = np.roll(y1, -1)
    plat = lat[:, None]
    plon = lon[:, None]
    cond = (y1[None, :] > plat) != (y2[None, :] > plat)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = (x2 - x1)[None, :] * (plat - y1[None, :]) / (y2 - y1)[None, :] \
            + x1[None, :]
        cross = cond & (plon < xint)
    return (cross.sum(axis=1) % 2) == 1


def build_cell_polygon_index(
    polygons: list[Polygon], cell_size: float
) -> list[tuple[int, int, bool]]:
    """Driver-side index: (cell, poly_id, interior) over each polygon's bbox.

    A cell is *interior* when all four of its corners are strictly inside the
    polygon — for convex polygons this implies the whole cell is inside, so
    points there skip refinement entirely.
    """
    out = []
    for pid, ring_list in polygons:
        ring = np.asarray(ring_list, dtype=np.float64)
        # the all-corners-inside => whole-cell-inside shortcut is only
        # sound for CONVEX rings; concave polygons could notch into a cell
        # whose corners are all in the solid part — those fall back to the
        # per-point ray cast for every cell
        convex = _is_convex(ring)
        xs, ys = ring[:, 0], ring[:, 1]
        ix0 = math.floor((xs.min() + 180.0) / cell_size)
        ix1 = math.floor((xs.max() + 180.0) / cell_size)
        iy0 = math.floor((ys.min() + 90.0) / cell_size)
        iy1 = math.floor((ys.max() + 90.0) / cell_size)
        for ix in range(ix0, ix1 + 1):
            for iy in range(iy0, iy1 + 1):
                cx0 = ix * cell_size - 180.0
                cy0 = iy * cell_size - 90.0
                corners_lon = np.array([cx0, cx0 + cell_size, cx0,
                                        cx0 + cell_size])
                corners_lat = np.array([cy0, cy0, cy0 + cell_size,
                                        cy0 + cell_size])
                inside = _ray_cast(corners_lon, corners_lat, ring)
                out.append((
                    ix * CELL_M + iy, pid, bool(convex and inside.all())
                ))
    return out


def pip_join(
    points: DataFrame,
    polygons: list[Polygon],
    cell_size: float = 4.0,
    lon: str = "lon",
    lat: str = "lat",
    out: str = "poly_id",
) -> DataFrame:
    """Assign each point the id of the polygon containing it (inner join).

    Points in no polygon are dropped (ocean pages, matching the reference's
    NULL-geom drop semantics, pysal_utils.py:100-127).
    """
    spark: SparkSession = points.sparkSession
    index_rows = build_cell_polygon_index(polygons, cell_size)
    idx = spark.createDataFrame(
        index_rows, schema="cell long, __pip_pid int, __pip_interior boolean"
    )
    # ring edges per polygon as a broadcast-joined array column: the ray
    # cast becomes one JVM `aggregate` over <=ring-size edge structs — no
    # Python worker anywhere in the join, single pass over the candidates
    # (an earlier pandas-UDF refine either dragged every candidate through
    # Arrow or forced a double scan of the upstream DAG).
    edge_rows = []
    for pid, ring_list in polygons:
        ring = np.asarray(ring_list, dtype=np.float64)
        nxt = np.roll(ring, -1, axis=0)
        edge_rows.append((
            int(pid),
            [
                {"x1": float(a[0]), "y1": float(a[1]),
                 "x2": float(b[0]), "y2": float(b[1])}
                for a, b in zip(ring, nxt)
            ],
        ))
    edges_df = spark.createDataFrame(
        edge_rows,
        schema="__pip_pid int, __pip_edges array<struct<x1:double,y1:double,x2:double,y2:double>>",
    )

    cand = (
        points.withColumn("cell", cell_expr(F.col(lon), F.col(lat), cell_size))
        .join(F.broadcast(idx), "cell")
        .join(F.broadcast(edges_df), "__pip_pid")
    )
    plon, plat = F.col(lon), F.col(lat)
    # crossing parity; inner CASE guards the division exactly like the
    # DuckDB oracle's join condition (operand order matches _ray_cast and
    # pip_oracle_sql bit-for-bit: (x2-x1)*(lat-y1)/(y2-y1)+x1)
    crossings = F.aggregate(
        F.col("__pip_edges"),
        F.lit(0),
        lambda acc, e: acc + F.when(
            (e["y1"] > plat) != (e["y2"] > plat),
            F.when(
                plon < (e["x2"] - e["x1"]) * (plat - e["y1"])
                / (e["y2"] - e["y1"]) + e["x1"],
                F.lit(1),
            ).otherwise(0),
        ).otherwise(0),
    )
    keep = F.col("__pip_interior") | (crossings % 2 == 1)
    return (
        cand.filter(keep)
        .withColumn(out, F.col("__pip_pid"))
        .drop("__pip_pid", "__pip_interior", "__pip_edges")
    )
