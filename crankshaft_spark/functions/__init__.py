from crankshaft_spark.functions.cells import (
    CELL_M,
    cell_expr,
    cell_sql,
    ring_cells_expr,
    with_cell,
)
from crankshaft_spark.functions.distance import haversine_km, planar_dist2

__all__ = [
    "CELL_M",
    "cell_expr",
    "cell_sql",
    "ring_cells_expr",
    "with_cell",
    "haversine_km",
    "planar_dist2",
]
