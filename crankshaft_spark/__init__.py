"""crankshaft_spark — a from-scratch PySpark-native spatial analytics engine.

Re-expresses the query/data-processing capabilities of the CartoDB/crankshaft
PostgreSQL extension (reference: /root/reference, v0.9.0) as distributed,
idiomatic PySpark: DataFrame/SQL plans optimized by Catalyst, with vectorized
Arrow pandas UDFs only where built-in operators cannot express the semantics.

Design stance (not a port):
  * every operator is a pure function ``f(df, params) -> DataFrame``;
  * the spatial-weights "graph" is a normalized edge DataFrame
    ``(id, nbr, w)`` instead of the reference's per-row adjacency arrays
    (reference: src/py/crankshaft/crankshaft/pysal_utils/pysal_utils.py:23-35);
  * neighbor construction is an H3-style cell-index candidate join + exact
    refinement instead of a PostGIS GiST ``<->`` scan
    (reference: pysal_utils.py:132-160);
  * statistics are join/aggregate/window algebra on the JVM, never
    row-at-a-time Python.
"""

__version__ = "0.1.0"

from crankshaft_spark.session import get_session, session_conf

__all__ = ["get_session", "session_conf", "__version__"]
