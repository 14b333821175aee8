from crankshaft_spark.plans.driver_queries import oracle_sql, queries

__all__ = ["queries", "oracle_sql"]
