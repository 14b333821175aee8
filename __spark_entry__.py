"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship spatial pipeline (derived points →
exact kNN spatial weights → Getis-Ord Gi* hotspot z-scores) on sf0.001.
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with a DuckDB-checkable ANSI-SQL oracle; the catalog lives in
crankshaft_spark.plans.driver_queries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crankshaft_spark.plans import driver_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: Gi* hotspots over sf0.001-derived points; rows > 0."""
    from pyspark.sql import functions as F

    from crankshaft_spark.operators import getis_gstar, knn_edges, row_standardize
    from crankshaft_spark.sources.derived import customer_points

    sf_dir = "/root/testdata/sf0.001"
    pts = customer_points(spark, sf_dir)
    edges = row_standardize(
        knn_edges(pts, k=5, cell_size=12.0).select("id", "nbr")
    )
    res = getis_gstar(pts.select("id", "value"), edges)
    return res.select(
        "id",
        F.round("gs", 6).alias("gs"),
        F.round("z_score", 6).alias("z_score"),
        F.round("p_value", 6).alias("p_value"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return driver_queries.queries()


def oracle_sql() -> dict[str, str]:
    return driver_queries.oracle_sql()
