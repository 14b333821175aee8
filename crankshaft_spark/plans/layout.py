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
    query with different constants than the writer used; non-overwrite
    writes REFUSE to proceed if the path already carries a different
    manifest (or pre-existing data with none) — silently re-pinning the
    constants would corrupt the interpretation of rows already written.
  * ``read_hilbert_bbox`` — plan the bbox's key runs, then read ONLY
    the touched ``hband=`` directories (explicit path selection, so
    ``inputFiles()`` genuinely shrinks and the driver lists O(touched
    bands) directories instead of discovering every partition — at
    100 TB the full listing alone is a driver-side cost), refined with
    the exact interval filter on the stored ``hkey`` column.  For a
    cell-aligned bbox the result is exactly the coordinate-predicate
    rows — the invariant the events_cell_hourly gate arm value-hashes.

Manifest I/O goes through the table path's own Hadoop filesystem (same
API the parquet writer uses), so hdfs:// / file:// URI paths work, not
just bare local paths.

The per-row key is NOT computed by evaluating the hilbert rounds per
data row: with_hilbert's chained CASE levels collapse into one
exponentially-sized expression (CLAUDE.md round-4 lesson).  The
distinct-cell table is keyed once (bounded by 4^levels rows),
localCheckpointed, and broadcast-joined back on the cell key.
"""

from __future__ import annotations

import json
import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crankshaft_spark.functions.cells import (
    cell_expr, hilbert_bbox_ranges, with_hilbert)

MANIFEST = "_hilbert_layout.json"
_RESERVED = ("cell", "hkey", "hband")


def _band_width(levels: int, bands: int) -> int:
    return max(1, math.ceil((4 ** levels) / bands))


def _fs_path(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` via the session's Hadoop conf."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def _read_manifest(spark: SparkSession, path: str) -> dict | None:
    fs, jpath = _fs_path(spark, f"{path.rstrip('/')}/{MANIFEST}")
    if not fs.exists(jpath):
        return None
    stream = fs.open(jpath)
    try:
        txt = spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8")
    finally:
        stream.close()
    return json.loads(txt)


def _write_manifest(spark: SparkSession, path: str, manifest: dict) -> None:
    fs, jpath = _fs_path(spark, f"{path.rstrip('/')}/{MANIFEST}")
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(json.dumps(manifest).encode("utf-8")))
    finally:
        out.close()


def write_hilbert_layout(
    df: DataFrame, path: str, *, cell_size: float, levels: int,
    bands: int = 64, x: str = "x", y: str = "y", mode: str = "overwrite",
) -> None:
    """Write ``df`` + (cell, hkey, hband) partitioned by hband, hkey-sorted
    within files.  ``bands`` bounds the directory count (key space is
    split into equal runs, so each band is itself hilbert-contiguous —
    spatially compact on disk)."""
    if bands < 1:
        raise ValueError("write_hilbert_layout: bands must be >= 1")
    clash = [c for c in _RESERVED if c in df.columns]
    if clash:
        raise ValueError(
            f"write_hilbert_layout: input columns {clash} collide with the "
            f"layout's derived columns {_RESERVED} — rename them first "
            "(silently recomputing them would drop the caller's values)")
    width = _band_width(levels, bands)
    manifest = {"cell_size": cell_size, "levels": levels, "bands": bands,
                "band_width": width, "x": x, "y": y}
    spark = df.sparkSession
    if mode != "overwrite":
        existing = _read_manifest(spark, path)
        if existing is not None and existing != manifest:
            raise ValueError(
                f"write_hilbert_layout: {path} already carries a layout "
                f"with different constants {existing} (requested "
                f"{manifest}); appending under new constants would make "
                "the stored hkeys unreadable — overwrite instead")
        if existing is None:
            fs, jpath = _fs_path(spark, path)
            if fs.exists(jpath):
                raise ValueError(
                    f"write_hilbert_layout: {path} holds data without a "
                    f"{MANIFEST} manifest — not a hilbert layout; refusing "
                    f"mode={mode!r} over unknown rows")
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
    _write_manifest(spark, path, manifest)


def read_hilbert_bbox(
    spark: SparkSession, path: str,
    x0: float, y0: float, x1: float, y1: float,
) -> DataFrame:
    """Rows of the layout whose point lies in the half-open, cell-aligned
    bbox — reading only the touched hband directories + exact hkey
    interval refinement (never a coordinate scan).  Layout constants
    come from the writer's manifest."""
    m = _read_manifest(spark, path)
    if m is None:
        raise FileNotFoundError(
            f"read_hilbert_bbox: no {MANIFEST} at {path} — not a layout "
            "written by write_hilbert_layout")
    ranges = hilbert_bbox_ranges(
        x0, y0, x1, y1, cell_size=m["cell_size"], levels=m["levels"])
    width = m["band_width"]
    wanted = {b for lo, hi in ranges
              for b in range(lo // width, hi // width + 1)}
    # ONE top-level listing (O(bands) entries) intersected with the
    # plan's bands — explicit directory selection, so the relation never
    # even lists files outside the touched bands
    fs, jpath = _fs_path(spark, path)
    present = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if name.startswith("hband="):
            b = int(name.split("=", 1)[1])
            if b in wanted:
                present.append(f"{path.rstrip('/')}/{name}")
    if not present:
        return spark.read.parquet(path).where(F.lit(False))
    df = spark.read.option("basePath", path).parquet(*sorted(present))
    cond = None
    for lo, hi in ranges:
        c = (F.col("hkey") >= lo) & (F.col("hkey") <= hi)
        cond = c if cond is None else (cond | c)
    return df.where(cond)
