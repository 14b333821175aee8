"""Distance column expressions (JVM-side, whole-stage-codegen friendly).

The reference leans on PostGIS ``<->`` / ``ST_Distance``
(/root/reference/src/py/crankshaft/crankshaft/pysal_utils/pysal_utils.py:153,
/root/reference/src/pg/sql/07_gravity.sql:90).  We provide:

  * ``planar_dist2`` — squared Euclidean distance in coordinate units.
    Polynomial IEEE arithmetic, so Spark and the DuckDB oracle produce
    bit-identical doubles for identical inputs; this is the distance used by
    every oracle-checked operator (kNN ordering is invariant to the square).
  * ``haversine_km`` — great-circle distance for real-geography paths.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088


def planar_dist2(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    dx = x1 - x2
    dy = y1 - y2
    return dx * dx + dy * dy


def planar_dist2_sql(x1: str, y1: str, x2: str, y2: str) -> str:
    """Same expression as SQL text for DuckDB oracles (identical FP result)."""
    return f"(({x1}) - ({x2})) * (({x1}) - ({x2})) + (({y1}) - ({y2})) * (({y1}) - ({y2}))"


def haversine_km(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = rlat2 - rlat1
    dlon = F.radians(lon2) - F.radians(lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    # near-antipodal points can push a to 1 + 1ulp (measured); clamp so
    # asin never sees > 1.0 and returns NaN on a less-forgiving libm
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(F.least(a, F.lit(1.0))))
