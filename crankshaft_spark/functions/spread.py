"""Partitioning helper for compute-heavy grouped pandas operators.

AQE's post-shuffle coalescing is BYTE-based: a tiny shuffle (a few MB of
coordinates) coalesces to one partition even when each group carries
seconds of numpy work — applyInPandas then runs every group serially on a
single core (measured: voronoi over 25 nation groups, 14.9s -> 2.8s at
local[32] after pinning).  An explicit ``repartition(n, cols)`` carries a
user-specified partition count, which AQE respects, and the following
``groupBy`` on the same keys reuses the hash partitioning (no second
exchange).  At real cluster scale the shuffle is big enough that AQE's
coalescing target and the pinned count coincide — the pin only matters in
the tiny-bytes / heavy-CPU regime, which is exactly the geometry-group
regime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_groups(df: DataFrame, *cols: str, min_partitions: int = 16) -> DataFrame:
    """Hash-repartition by group columns with a pinned partition count so
    AQE cannot coalesce CPU-heavy pandas groups onto one core."""
    n = max(df.sparkSession.sparkContext.defaultParallelism, min_partitions)
    return df.repartition(n, *cols)
