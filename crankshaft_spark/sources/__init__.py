from crankshaft_spark.sources.derived import (
    CUSTOMER_POINTS_SQL,
    SUPPLIER_POINTS_SQL,
    customer_points,
    load_table,
    supplier_points,
)

__all__ = [
    "CUSTOMER_POINTS_SQL",
    "SUPPLIER_POINTS_SQL",
    "customer_points",
    "supplier_points",
    "load_table",
]
