"""Spatial-weights edge DataFrames and spatial lag.

The reference materializes an adjacency-list column per row and converts it
to a row-standardized PySAL ``W`` in driver memory
(/root/reference/src/py/crankshaft/crankshaft/pysal_utils/pysal_utils.py:23-35,
``ps.W(neighbors)`` + ``transform='r'``).  The distributed form is a
normalized edge table ``(id, nbr, w)``; row-standardization is a window
count, spatial lag is one join + one aggregation — all JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def weights_from_neighbors(df: DataFrame, *, id_col: str = "id",
                           neighbors_col: str = "neighbors") -> DataFrame:
    """Explode an adjacency-array DataFrame into a row-standardized edge list.

    Mirrors the reference's fixture format (``{id, value, neighbors[]}``,
    src/py/crankshaft/test/fixtures/neighbors.json) so fixture-driven tests
    bypass geometry exactly like the reference's FakeDataProvider pattern.
    """
    return row_standardize(
        df.select(
            F.col(id_col).cast("long").alias("id"),
            F.explode(F.col(neighbors_col)).alias("nbr"),
        ).withColumn("nbr", F.col("nbr").cast("long"))
    )


def row_standardize(edges: DataFrame) -> DataFrame:
    """Add ``w = 1/deg(id)`` to an (id, nbr) edge DataFrame (PySAL 'r')."""
    deg = Window.partitionBy("id")
    return edges.withColumn("w", F.lit(1.0) / F.count("*").over(deg))


def spatial_lag(
    edges: DataFrame,
    values: DataFrame,
    *,
    value_col: str = "value",
    out_col: str = "lag",
) -> DataFrame:
    """lag_i = Σ_j w_ij · y_j  (row-standardized ⇒ neighborhood mean).

    Reference: ``ps.weights.spatial_lag.lag_spatial(w, y)`` used at
    src/py/crankshaft/crankshaft/clustering/moran.py:139-140.
    ``edges`` must carry (id, nbr, w); ``values`` must carry (id, value_col).
    """
    vals = values.select(F.col("id").alias("nbr"), F.col(value_col).alias("_y"))
    return (
        edges.join(vals, "nbr")
        .groupBy("id")
        .agg(F.sum(F.col("w") * F.col("_y")).alias(out_col))
    )


def queen_polygon_edges(polys, *, quant: float = 1e-9):
    """Queen contiguity for polygons: i and j are neighbors iff they share
    at least one boundary vertex (the reference's ST_Touches template,
    pysal_utils.py:164-190, evaluated on shared-vertex polygon meshes like
    admin tilings).

    Distributed as explode(quantized vertices) → self-join on vertex →
    distinct pairs — an equi-join, no geometry predicate in the hot path.
    ``polys``: (poly_id, xs array<double>, ys array<double>).
    """
    from pyspark.sql import functions as F

    v = polys.select(
        F.col("poly_id").alias("id"),
        F.explode(
            F.arrays_zip(
                F.transform("xs", lambda x: F.round(x / quant).cast("long")),
                F.transform("ys", lambda y: F.round(y / quant).cast("long")),
            )
        ).alias("_v"),
    ).select("id", F.col("_v").getField("0").alias("_qx"),
             F.col("_v").getField("1").alias("_qy"))
    w = v.select(F.col("id").alias("nbr"), "_qx", "_qy")
    return (
        v.join(w, ["_qx", "_qy"])
        .where(F.col("id") != F.col("nbr"))
        .select("id", "nbr")
        .distinct()
    )
