"""Spatial interpolation (CDB_SpatialInterpolation) — NN-average and IDW.

Reference: /root/reference/src/pg/sql/08_interpolation.sql
  * method 0 (:59-68): average of the p1 nearest sample values
  * method 2 (:101-131): inverse-distance weighting, optional neighbor
    limit p1 and decay power p2 — est = Σ(v/dᵖ) / Σ(1/dᵖ)
  * method 1 (:71-96): barycentric on a Delaunay TIN of the samples —
    implemented below with the pure-numpy Bowyer-Watson kernel; the TIN is
    built once from the bounded sample set and broadcast ("Delaunay stuff
    performed just ONCE!!", 19_contour.sql:43-50), targets stream through
    mapInPandas.

Both implemented methods reduce to the bipartite kNN join + one aggregation,
so they inherit the scale properties of the kNN core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crankshaft_spark.functions.spread import spread_groups
from crankshaft_spark.operators.knn import knn_join


def interpolate_nn(
    targets: DataFrame,
    samples: DataFrame,
    *,
    value_col: str = "value",
    num_neighbors: int = 5,
    cell_size: float = 1.0,
) -> DataFrame:
    """(id, est) — mean of the num_neighbors nearest sample values."""
    edges = knn_join(targets, samples, k=num_neighbors, cell_size=cell_size)
    vals = samples.select(F.col("id").alias("nbr"), F.col(value_col).alias("_v"))
    return (
        edges.join(vals, "nbr").groupBy("id").agg(F.avg("_v").alias("est"))
    )


def interpolate_idw(
    targets: DataFrame,
    samples: DataFrame,
    *,
    value_col: str = "value",
    num_neighbors: int = 8,
    power: float = 2.0,
    cell_size: float = 1.0,
) -> DataFrame:
    """(id, est) — inverse-distance-weighted estimate over the
    num_neighbors nearest samples; est = Σ(v/dᵖ)/Σ(1/dᵖ) with d the planar
    distance.  Exact-zero distances are handled by taking the sample value
    directly (the limit of the weight as d→0)."""
    edges = knn_join(targets, samples, k=num_neighbors, cell_size=cell_size)
    vals = samples.select(F.col("id").alias("nbr"), F.col(value_col).alias("_v"))
    j = edges.join(vals, "nbr").withColumn("_d", F.sqrt(F.col("d2")))
    wgt = F.lit(1.0) / F.pow(F.col("_d"), F.lit(power))
    agg = j.groupBy("id").agg(
        F.sum(F.when(F.col("_d") > 0, F.col("_v") * wgt).otherwise(0.0)).alias("_num"),
        F.sum(F.when(F.col("_d") > 0, wgt).otherwise(0.0)).alias("_den"),
        F.max(F.when(F.col("_d") == 0, F.col("_v"))).alias("_exact"),
    )
    return agg.select(
        "id",
        F.coalesce(F.col("_exact"), F.col("_num") / F.col("_den")).alias("est"),
    )


def _bary_eval(pts, vals, tris, px, py):
    """Vectorized containing-triangle lookup + barycentric blend.
    Returns est array with NaN for points outside the TIN hull."""
    import numpy as np

    a = pts[tris[:, 0]]
    b = pts[tris[:, 1]]
    c = pts[tris[:, 2]]
    det = (b[:, 1] - c[:, 1]) * (a[:, 0] - c[:, 0]) + \
          (c[:, 0] - b[:, 0]) * (a[:, 1] - c[:, 1])
    det = np.where(np.abs(det) < 1e-300, 1e-300, det)
    # barycentric coords of every point in every triangle: (n, m)
    w1 = ((b[:, 1] - c[:, 1])[None, :] * (px[:, None] - c[:, 0][None, :])
          + (c[:, 0] - b[:, 0])[None, :] * (py[:, None] - c[:, 1][None, :])) / det[None, :]
    w2 = ((c[:, 1] - a[:, 1])[None, :] * (px[:, None] - c[:, 0][None, :])
          + (a[:, 0] - c[:, 0])[None, :] * (py[:, None] - c[:, 1][None, :])) / det[None, :]
    w3 = 1.0 - w1 - w2
    eps = -1e-9
    inside = (w1 >= eps) & (w2 >= eps) & (w3 >= eps)
    est = np.full(len(px), np.nan)
    hit = inside.any(axis=1)
    ti = np.argmax(inside, axis=1)
    v = (w1[np.arange(len(px)), ti] * vals[tris[ti, 0]]
         + w2[np.arange(len(px)), ti] * vals[tris[ti, 1]]
         + w3[np.arange(len(px)), ti] * vals[tris[ti, 2]])
    est[hit] = v[hit]
    return est


def interpolate_barycentric(
    targets: DataFrame,
    samples: DataFrame,
    *,
    value_col: str = "value",
    tile_size: float | str | None = None,
) -> DataFrame:
    """(id, est) — barycentric interpolation on the Delaunay TIN of the
    samples; targets outside the TIN hull get NULL (the reference's
    containing-triangle lookup, 08_interpolation.sql:71-96).

    ``tile_size=None`` (reference-parity path): ``samples`` is a bounded
    set (the reference takes it as a SQL array); it is collected once,
    triangulated on the driver, and broadcast — O(n²) triangulation, only
    for genuinely bounded sample arrays.

    ``tile_size`` set (scale path): targets are grouped per grid tile and
    each tile triangulates only the samples of its 3×3 tile neighborhood
    inside ``applyInPandas`` — the Voronoi/tile pattern.  The one-tile pad
    makes the local TIN agree with the global one wherever the containing
    triangle's vertices fall within a tile of the target (everywhere, at
    sample densities ≫ 1/tile); targets whose padded neighborhood has < 3
    samples get NULL.  Per-group work is bounded by the tile population, so
    the O(n²) Bowyer–Watson never sees the full sample set.
    """
    import numpy as np
    import pandas as pd

    from crankshaft_spark.functions.geom import delaunay

    schema = "id long, est double"

    if tile_size == "auto":
        # size tiles so a padded 3x3 neighborhood holds ~TARGET samples:
        # keeps per-group Bowyer-Watson cost flat as density scales, and
        # keeps sparse inputs from fragmenting into sample-starved tiles
        TARGET = 64.0
        ext = samples.agg(
            F.min("x"), F.max("x"), F.min("y"), F.max("y"), F.count("*")
        ).collect()[0]
        n = ext[4]
        area = max((ext[1] - ext[0]) * (ext[3] - ext[2]), 1e-12)
        if n < 500:
            tile_size = None          # bounded set: driver-global path
        else:
            tile_size = float(np.sqrt(TARGET * area / (9.0 * n)))

    if tile_size is None:
        # sort: collect order depends on the input's partitioning, and the
        # triangulation must not (see the tiled path's pin below)
        rows = sorted(
            samples.select("x", "y", value_col).collect(),
            key=lambda r: (r[0], r[1]),
        )
        pts = np.array([[r[0], r[1]] for r in rows], dtype=float)
        vals = np.array([r[2] for r in rows], dtype=float)
        tris = delaunay(pts)
        spark = targets.sparkSession
        bc = spark.sparkContext.broadcast((pts, vals, tris))

        def run(pdfs):
            bpts, bvals, btris = bc.value
            for pdf in pdfs:
                est = _bary_eval(bpts, bvals, btris,
                                 pdf["x"].to_numpy(), pdf["y"].to_numpy())
                yield pd.DataFrame({"id": pdf["id"], "est": est})

        return targets.select("id", "x", "y").mapInPandas(run, schema=schema)

    from crankshaft_spark.functions.cells import cell_expr, ring_cells_expr

    tgt = targets.select(
        F.col("id"), F.col("x").cast("double").alias("x"),
        F.col("y").cast("double").alias("y"),
        cell_expr(F.col("x"), F.col("y"), tile_size).alias("tcell"),
        F.lit(0).alias("role"), F.lit(0.0).alias("v"),
    )
    smp = samples.select(
        F.lit(-1).cast("long").alias("id"),
        F.col("x").cast("double").alias("x"),
        F.col("y").cast("double").alias("y"),
        F.explode(
            ring_cells_expr(cell_expr(F.col("x"), F.col("y"), tile_size), 1)
        ).alias("tcell"),
        F.lit(1).alias("role"),
        F.col(value_col).cast("double").alias("v"),
    )

    def run_tile(key, pdf):
        t = pdf[pdf["role"] == 0]
        if len(t) == 0:
            return pd.DataFrame({"id": [], "est": []}).astype(
                {"id": "int64", "est": "float64"}
            )
        # shuffle delivery order is partitioning-dependent; Bowyer-Watson
        # insertion order (and argmax-first triangle pick for cocircular
        # cases) must not be — pin it by coordinates
        s = pdf[pdf["role"] == 1].sort_values(["x", "y"], kind="mergesort")
        if len(s) < 3:
            return pd.DataFrame({"id": t["id"], "est": np.nan})
        pts = s[["x", "y"]].to_numpy(dtype=float)
        vals = s["v"].to_numpy(dtype=float)
        tris = delaunay(pts)
        if len(tris) == 0:
            return pd.DataFrame({"id": t["id"], "est": np.nan})
        est = _bary_eval(pts, vals, tris,
                         t["x"].to_numpy(), t["y"].to_numpy())
        return pd.DataFrame({"id": t["id"], "est": est})

    return (
        spread_groups(tgt.unionByName(smp), "tcell")
        .groupBy("tcell")
        .applyInPandas(run_tile, schema=schema)
    )
