"""Hilbert-banded table layout: the storage half of the range-scan plan.

``hilbert_bbox_ranges`` (functions/cells.py) compiles a bbox into a few
contiguous key intervals; this module makes those intervals actually
PRUNE I/O by laying the table out along the curve:

  * ``write_hilbert_layout`` — key every row by its cell's hilbertv1
    position, band the key space into ``bands`` equal runs, write
    parquet partitioned by ``hband`` (directory-level pruning) and
    sorted by ``hkey`` within files (row-group min/max pruning on
    engines that read footer stats).  A ``_hilbert_layout.json``
    manifest pins (cell_size, levels, bands) so readers cannot key a
    query with different constants than the writer used.
  * ``read_hilbert_bbox`` — plan the bbox's key runs, list only the
    touched bands (Spark partition pruning: ``inputFiles()`` shrinks
    proportionally), refine with the exact interval filter on the
    stored ``hkey`` column.  For a cell-aligned bbox the result is
    exactly the coordinate-predicate rows — the invariant the
    events_cell_hourly gate arm value-hashes.

At 100 TB this is the difference between a full scan and reading a few
percent of files for a regional query; in-sandbox the pruning is
asserted by comparing ``inputFiles()`` against the unfiltered listing
(tests/test_layout.py).

The per-row key is NOT computed by evaluating the hilbert rounds per
data row: with_hilbert's chained CASE levels collapse into one
exponentially-sized expression (CLAUDE.md round-4 lesson).  The
distinct-cell table is keyed once (bounded by 4^levels rows),
localCheckpointed, and broadcast-joined back on the cell key.
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crankshaft_spark.functions.cells import (
    cell_expr, hilbert_bbox_ranges, with_hilbert)

MANIFEST = "_hilbert_layout.json"


def _band_width(levels: int, bands: int) -> int:
    return max(1, math.ceil((4 ** levels) / bands))


def write_hilbert_layout(
    df: DataFrame, path: str, *, cell_size: float, levels: int,
    bands: int = 64, x: str = "x", y: str = "y", mode: str = "overwrite",
) -> None:
    """Write ``df`` + (cell, hkey, hband) partitioned by hband, hkey-sorted
    within files.  ``bands`` bounds the directory count (key space is
    split into equal runs, so each band is itself hilbert-contiguous —
    spatially compact on disk)."""
    if bands < 1:
        raise ValueError(f"write_hilbert_layout: bands must be >= 1")
    width = _band_width(levels, bands)
    keyed = df.withColumn("cell", cell_expr(F.col(x), F.col(y), cell_size))
    cells = with_hilbert(
        keyed.select("cell").distinct(), levels=levels, out="hkey",
    ).localCheckpoint(eager=True)
    out = (
        keyed.join(F.broadcast(cells), "cell")
        .withColumn("hband", F.expr(f"hkey div {width}"))
    )
    # sort by (hband, hkey): the partitioned writer requires a local sort
    # on the partition column and would otherwise re-sort UNSTABLY,
    # destroying the hkey order inside each file
    (out.repartition("hband")
        .sortWithinPartitions("hband", "hkey")
        .write.mode(mode).partitionBy("hband").parquet(path))
    manifest = {"cell_size": cell_size, "levels": levels, "bands": bands,
                "band_width": width, "x": x, "y": y}
    with open(os.path.join(path, MANIFEST), "w") as fh:
        json.dump(manifest, fh)


def read_hilbert_bbox(
    spark: SparkSession, path: str,
    x0: float, y0: float, x1: float, y1: float,
) -> DataFrame:
    """Rows of the layout whose point lies in the half-open, cell-aligned
    bbox — via band partition pruning + exact hkey interval refinement
    (never a coordinate scan).  Layout constants come from the writer's
    manifest."""
    with open(os.path.join(path, MANIFEST)) as fh:
        m = json.load(fh)
    ranges = hilbert_bbox_ranges(
        x0, y0, x1, y1, cell_size=m["cell_size"], levels=m["levels"])
    width = m["band_width"]
    bands = sorted({b for lo, hi in ranges
                    for b in range(lo // width, hi // width + 1)})
    df = spark.read.parquet(path)
    cond = None
    for lo, hi in ranges:
        c = (F.col("hkey") >= lo) & (F.col("hkey") <= hi)
        cond = c if cond is None else (cond | c)
    return df.where(F.col("hband").isin(bands)).where(cond)
