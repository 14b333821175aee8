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


def interpolate_barycentric(
    targets: DataFrame,
    samples: DataFrame,
    *,
    value_col: str = "value",
) -> DataFrame:
    """(id, est) — barycentric interpolation on the Delaunay TIN of the
    samples; targets outside the TIN hull get NULL (the reference's
    containing-triangle lookup, 08_interpolation.sql:71-96).

    ``samples`` must be a bounded set (the reference takes it as a SQL
    array); it is collected once, triangulated on the driver, and broadcast.
    """
    import numpy as np
    import pandas as pd

    from crankshaft_spark.functions.geom import delaunay

    rows = samples.select("x", "y", value_col).collect()
    pts = np.array([[r[0], r[1]] for r in rows], dtype=float)
    vals = np.array([r[2] for r in rows], dtype=float)
    tris = delaunay(pts)
    spark = targets.sparkSession
    bc = spark.sparkContext.broadcast((pts, vals, tris))

    schema = "id long, est double"

    def run(pdfs):
        bpts, bvals, btris = bc.value
        a = bpts[btris[:, 0]]
        b = bpts[btris[:, 1]]
        c = bpts[btris[:, 2]]
        det = (b[:, 1] - c[:, 1]) * (a[:, 0] - c[:, 0]) + \
              (c[:, 0] - b[:, 0]) * (a[:, 1] - c[:, 1])
        det = np.where(np.abs(det) < 1e-300, 1e-300, det)
        for pdf in pdfs:
            px = pdf["x"].to_numpy()
            py = pdf["y"].to_numpy()
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
            v = (w1[np.arange(len(px)), ti] * bvals[btris[ti, 0]]
                 + w2[np.arange(len(px)), ti] * bvals[btris[ti, 1]]
                 + w3[np.arange(len(px)), ti] * bvals[btris[ti, 2]])
            est[hit] = v[hit]
            yield pd.DataFrame({"id": pdf["id"], "est": est})

    return targets.select("id", "x", "y").mapInPandas(run, schema=schema)
