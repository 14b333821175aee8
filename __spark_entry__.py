"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship spatial pipeline (synthesized crawl
pages → PIP tile assignment → cell rollup → queen-contiguity weights →
Getis-Ord Gi* hotspot z-scores) on sf0.001.
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
    """Flagship north-rule pipeline on sf0.001: Common-Crawl-style page
    table -> byte-identical text extraction -> geocode -> broadcast
    cell->polygon PIP join -> salted per-cell rollup -> queen weights ->
    Gi* hotspot classification.  Rows > 0, stable schema."""
    from crankshaft_spark.plans.pipeline import hotspot_pipeline

    return hotspot_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return driver_queries.queries()


def oracle_sql() -> dict[str, str]:
    return driver_queries.oracle_sql()
