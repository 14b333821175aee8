"""Spatial interpolation (CDB_SpatialInterpolation) — NN-average and IDW.

Reference: /root/reference/src/pg/sql/08_interpolation.sql
  * method 0 (:59-68): average of the p1 nearest sample values
  * method 2 (:101-131): inverse-distance weighting, optional neighbor
    limit p1 and decay power p2 — est = Σ(v/dᵖ) / Σ(1/dᵖ)
  * method 1 (barycentric on a Delaunay TIN) is geometry-local; planned as a
    per-tile pandas UDF (scipy-free Bowyer-Watson) — not yet implemented.

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
