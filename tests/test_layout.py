"""Hilbert-banded layout: partition pruning is real (inputFiles shrinks)
and the pruned bbox read returns exactly the coordinate-predicate rows."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from crankshaft_spark.plans.layout import (
    read_hilbert_bbox, write_hilbert_layout)
from crankshaft_spark.sources.derived import customer_points

BBOX = (-60.0, -20.0, -10.0, 20.0)   # cell-aligned at size 10


def test_layout_prunes_and_matches(spark, tmp_path):
    path = str(tmp_path / "hl")
    pts = customer_points(spark, "/root/testdata/sf0.001")
    write_hilbert_layout(pts, path, cell_size=10.0, levels=6, bands=256)

    # manifest + banded directories exist
    dirs = sorted(d for d in os.listdir(path) if d.startswith("hband="))
    assert len(dirs) > 3, dirs

    got = read_hilbert_bbox(spark, path, *BBOX)
    # pruning: the files ACTUALLY read (input_file_name on executed rows
    # — inputFiles() lists the relation before partition pruning) are a
    # strict subset of the layout's data files
    all_files = {f for f in glob.glob(f"{path}/hband=*/*.parquet")}
    read_files = {
        r[0].replace("file://", "")
        for r in got.select(F.input_file_name()).distinct().collect()}
    assert read_files and read_files < all_files, (
        len(read_files), len(all_files))
    assert len(read_files) <= len(all_files) // 2

    # exactness: pruned interval read == raw coordinate predicate
    x0, y0, x1, y1 = BBOX
    want = sorted(
        r["id"] for r in pts.where(
            (F.col("x") >= x0) & (F.col("x") < x1)
            & (F.col("y") >= y0) & (F.col("y") < y1)).collect())
    assert sorted(r["id"] for r in got.collect()) == want
    assert len(want) > 10

    # within-file ordering: hkey is sorted inside every file (the
    # row-group min/max pruning contract)
    sample = spark.read.parquet(sorted(all_files)[0]).select("hkey")
    ks = [r["hkey"] for r in sample.collect()]
    assert ks == sorted(ks)
