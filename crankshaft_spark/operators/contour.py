"""Contour map — the raster↔vector core: grid, interpolate, classify, union.

Reference: CDB_Contour (/root/reference/src/pg/sql/19_contour.sql:1-142):
rectangle-grid the buffered hull of the samples, interpolate each cell
centroid (NN / barycentric-in-TIN / IDW), classify the cell values into bins
(equal / heads-tails / jenks / quantile), then merge cells per bin with
min/max/avg of the interpolated value.

Spark-first: the grid is sequence+explode (no driver loop), interpolation is
the distributed kNN-join (NN/IDW) or broadcast-TIN (barycentric) operator,
classification is a tiny broadcast join against the break edges, and the
per-bin rollup is one aggregation.  Resolution is an explicit ``cell_size``
parameter; the reference's empirical time→cell-count cost model
(19_contour.sql:31-37, fitted PG-box constants we do not port) is exposed
as the Spark-native ``max_cells`` budget instead — the grid is coarsened
deterministically until it fits (``_cap_cell_size``).

Cell geometry is returned as (cx, cy) grid indices + bounds rather than a
unioned multipolygon (no geometry lib here); a consumer can reassemble the
union from the per-bin cell list, which is lossless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crankshaft_spark.operators.binning import (
    equal_interval_bins,
    headtails_bins,
    jenks_bins,
    quantile_bins,
)
from crankshaft_spark.operators.grid import rectangle_grid
from crankshaft_spark.operators.interpolation import (
    interpolate_barycentric,
    interpolate_idw,
    interpolate_nn,
)

_CLASSIFIERS = {
    "equal": equal_interval_bins,
    "headtails": headtails_bins,
    "jenks": jenks_bins,
    "quantile": quantile_bins,
}


def classify_bins(df: DataFrame, breaks_df: DataFrame,
                  *, value_col: str = "est") -> DataFrame:
    """Assign each row the smallest bin whose upper edge >= value (the
    reference's width_bucket-style classification, 19_contour.sql:115-124).
    ``breaks_df``: (bin, break_value) — tiny, broadcast."""
    b = F.broadcast(breaks_df)
    joined = df.join(b, F.col(value_col) <= F.col("break_value"), "left")
    other = [c for c in df.columns]
    return (
        joined.groupBy(*other)
        .agg(F.min("bin").alias("bin"))
        .withColumn("bin", F.coalesce("bin", F.lit(None).cast("int")))
    )


def _cap_cell_size(ext, cell_size: float, buffer_frac: float,
                   max_cells: int) -> float:
    """Spark-native stand-in for the reference's max_time→cell_count cost
    model (19_contour.sql:31-37 maps a time budget to a cell count with
    PG-box-fitted constants we deliberately do not port): grow
    ``cell_size`` until the buffered grid holds at most ``max_cells``
    cells.  Deterministic pure arithmetic over the sample extent — no
    timing measurements — using the exact nx/ny formula of
    ``rectangle_grid``'s consumer below, so the cap is a guarantee, not
    an estimate.  The sqrt-scaling factor is floored at 2% growth per
    round: near the budget the ceil() plateaus make sqrt(count/max) ~ 1
    and a pure-sqrt loop stalls (a 6-round version raised 'unreachable'
    on reachable budgets, e.g. 12 -> 10 cells); 256 rounds of >= 2%
    growth cover any plateau while big ratios still converge in 2-3
    sqrt steps."""
    from math import ceil, sqrt

    if max_cells < 1:
        raise ValueError(f"max_cells must be >= 1, got {max_cells}")
    for _ in range(256):
        dx = (ext["x1"] - ext["x0"]) * buffer_frac + cell_size
        dy = (ext["y1"] - ext["y0"]) * buffer_frac + cell_size
        nx = ceil(((ext["x1"] + dx) - (ext["x0"] - dx)) / cell_size)
        ny = ceil(((ext["y1"] + dy) - (ext["y0"] - dy)) / cell_size)
        if nx * ny <= max_cells:
            return cell_size
        cell_size *= max(sqrt(nx * ny / max_cells) * 1.000001, 1.02)
    raise ValueError(
        f"contour max_cells={max_cells} unreachable: the buffered grid "
        f"is always >= 3x3 (the buffer adds one cell_size per side), so "
        f"budgets below 9 cells cannot be satisfied")


def contour(
    samples: DataFrame,
    *,
    value_col: str = "value",
    cell_size: float = 1.0,
    intmethod: str = "idw",       # 'nn' | 'bary' | 'idw'  (0 | 1 | 2)
    classmethod: str = "quantile",  # 'equal' | 'headtails' | 'jenks' | 'quantile'
    steps: int = 5,
    buffer_frac: float = 0.2,
    num_neighbors: int = 8,
    max_cells: int | None = None,
) -> DataFrame:
    """→ (bin, min_value, max_value, avg_value, n_cells) per contour bin
    (CDB_Contour's RETURNS TABLE minus the unioned geometry — see module
    docstring), plus a companion cell-level frame via ``contour_cells``.
    ``max_cells`` is the cost-budget knob (the reference's ``max_time``
    analogue): the grid is coarsened until it fits the budget."""
    cells = contour_cells(
        samples, value_col=value_col, cell_size=cell_size,
        intmethod=intmethod, classmethod=classmethod, steps=steps,
        buffer_frac=buffer_frac, num_neighbors=num_neighbors,
        max_cells=max_cells,
    )
    return (
        cells.where(F.col("bin").isNotNull())
        .groupBy("bin")
        .agg(
            F.min("est").alias("min_value"),
            F.max("est").alias("max_value"),
            F.avg("est").alias("avg_value"),
            F.count("*").alias("n_cells"),
        )
        .orderBy("bin")
    )


def contour_cells(
    samples: DataFrame,
    *,
    value_col: str = "value",
    cell_size: float = 1.0,
    intmethod: str = "idw",
    classmethod: str = "quantile",
    steps: int = 5,
    buffer_frac: float = 0.2,
    num_neighbors: int = 8,
    persist: bool = True,
    max_cells: int | None = None,
) -> DataFrame:
    """Cell-level contour frame → (id, cx, cy, x, y, est, bin).
    ``max_cells`` coarsens ``cell_size`` until the grid fits the budget
    (see ``_cap_cell_size``)."""
    ext = samples.agg(
        F.min("x").alias("x0"), F.max("x").alias("x1"),
        F.min("y").alias("y0"), F.max("y").alias("y1"),
    ).collect()[0]
    if max_cells is not None:
        cell_size = _cap_cell_size(ext, cell_size, buffer_frac, max_cells)
    dx = (ext["x1"] - ext["x0"]) * buffer_frac + cell_size
    dy = (ext["y1"] - ext["y0"]) * buffer_frac + cell_size
    grid = rectangle_grid(
        samples.sparkSession,
        ext["x0"] - dx, ext["y0"] - dy, ext["x1"] + dx, ext["y1"] + dy,
        cell_size, cell_size,
    )
    centers = grid.select(
        # 2^32 stride: grid axes are < 2^31 cells, so ids can't collide
        # (cx*100000+cy collided once ny exceeded 100000 at fine cells)
        (F.col("cx").cast("long") * F.lit(4294967296).cast("long")
         + F.col("cy")).alias("id"),
        "cx", "cy",
        ((F.col("xmin") + F.col("xmax")) / 2).alias("x"),
        ((F.col("ymin") + F.col("ymax")) / 2).alias("y"),
    )

    spts = samples.select("id", "x", "y", F.col(value_col).alias("value"))
    if intmethod == "nn":
        est = interpolate_nn(centers, spts, num_neighbors=num_neighbors,
                             cell_size=cell_size * 4)
    elif intmethod == "bary":
        est = interpolate_barycentric(centers, spts)
    else:
        est = interpolate_idw(centers, spts, num_neighbors=num_neighbors,
                              cell_size=cell_size * 4)

    # pin the interpolated value to 6dp before classification: IDW sums are
    # float-order-sensitive at the ulp, and the break edges derive from the
    # same values — without the pin a borderline cell can change bins
    # between engines/parallelism levels (same rationale as markov lag_round)
    est = est.withColumn("est", F.round("est", 6))
    cells = centers.join(est, "id").where(~F.isnan("est") & F.col("est").isNotNull())
    # the interpolation join feeds BOTH the break computation (1-2 actions
    # inside the classifier) and the final classification scan — persist it
    # or the whole grid+kNN-join DAG re-executes per consumer.  The pin
    # outlives this call (the returned plan reads it); callers doing many
    # contour sweeps in one session should unpersist via
    # ``spark.catalog.clearCache()`` or pass persist=False
    if persist:
        cells = cells.persist()
    breaks_df = _CLASSIFIERS[classmethod](cells, value_col="est", breaks=steps)
    return classify_bins(cells, breaks_df, value_col="est")


def contour_wkt(
    samples: DataFrame,
    *,
    value_col: str = "value",
    cell_size: float = 1.0,
    intmethod: str = "idw",
    classmethod: str = "quantile",
    steps: int = 5,
    buffer_frac: float = 0.2,
    num_neighbors: int = 8,
    max_cells: int | None = None,
) -> DataFrame:
    """→ (bin, geom_wkt, min_value, max_value, avg_value, n_cells): the
    CDB_Contour ``the_geom`` analogue — each bin's region as a MULTIPOLYGON
    of its grid-cell rectangles (undissolved; the cell set is the exact
    region, a dissolve is cosmetic).  WKT assembly is a string aggregation,
    deterministic via sort_array."""
    if max_cells is not None:
        # resolve the budgeted cell size HERE (one extra 1-row aggregate)
        # so the WKT box half-width below matches the grid the cells
        # actually used
        ext = samples.agg(
            F.min("x").alias("x0"), F.max("x").alias("x1"),
            F.min("y").alias("y0"), F.max("y").alias("y1"),
        ).collect()[0]
        cell_size = _cap_cell_size(ext, cell_size, buffer_frac, max_cells)
    cells = contour_cells(
        samples, value_col=value_col, cell_size=cell_size,
        intmethod=intmethod, classmethod=classmethod, steps=steps,
        buffer_frac=buffer_frac, num_neighbors=num_neighbors,
    )
    half = cell_size / 2.0
    box = F.format_string(
        "((%s %s, %s %s, %s %s, %s %s, %s %s))",
        F.round(F.col("x") - half, 6), F.round(F.col("y") - half, 6),
        F.round(F.col("x") + half, 6), F.round(F.col("y") - half, 6),
        F.round(F.col("x") + half, 6), F.round(F.col("y") + half, 6),
        F.round(F.col("x") - half, 6), F.round(F.col("y") + half, 6),
        F.round(F.col("x") - half, 6), F.round(F.col("y") - half, 6),
    )
    return (
        cells.where(F.col("bin").isNotNull())
        .withColumn("_box", box)
        .groupBy("bin")
        .agg(
            F.concat(
                F.lit("MULTIPOLYGON ("),
                F.concat_ws(", ", F.sort_array(F.collect_list("_box"))),
                F.lit(")"),
            ).alias("geom_wkt"),
            F.min("est").alias("min_value"),
            F.max("est").alias("max_value"),
            F.avg("est").alias("avg_value"),
            F.count("*").alias("n_cells"),
        )
        .orderBy("bin")
    )
