"""Hilbert-banded layout: partition pruning is real (the relation's own
inputFiles() shrinks, because read_hilbert_bbox selects band directories
explicitly) and the pruned bbox read returns exactly the
coordinate-predicate rows; the manifest refuses constant drift."""

from __future__ import annotations

import glob
import os

import pytest
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
    # pruning: the relation itself lists only touched-band files — if the
    # directory selection regressed to a full-path read, inputFiles()
    # would equal the whole layout and this fails
    all_files = {f for f in glob.glob(f"{path}/hband=*/*.parquet")}
    read_files = {f.replace("file://", "") for f in got.inputFiles()}
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

    # empty-intersection bbox: planner finds ranges, no band dir exists
    empty = read_hilbert_bbox(spark, path, 170.0, 80.0, 180.0, 90.0)
    assert empty.count() == 0


def test_manifest_refuses_constant_drift(spark, tmp_path):
    path = str(tmp_path / "hl2")
    pts = customer_points(spark, "/root/testdata/sf0.001").limit(50)
    write_hilbert_layout(pts, path, cell_size=10.0, levels=6, bands=16)

    # append under DIFFERENT constants must refuse (old hkeys would be
    # reinterpreted under the new manifest)
    with pytest.raises(ValueError, match="different constants"):
        write_hilbert_layout(
            pts, path, cell_size=5.0, levels=6, bands=16, mode="append")
    with pytest.raises(ValueError, match="different constants"):
        write_hilbert_layout(
            pts, path, cell_size=10.0, levels=7, bands=16, mode="ignore")

    # append under the SAME constants is fine and doubles the rows
    write_hilbert_layout(
        pts, path, cell_size=10.0, levels=6, bands=16, mode="append")
    assert spark.read.parquet(path).count() == 100

    # overwrite MAY change constants (it replaces the data)
    write_hilbert_layout(
        pts, path, cell_size=5.0, levels=7, bands=16, mode="overwrite")
    got = read_hilbert_bbox(spark, path, *BBOX)
    assert got.count() == pts.where(
        (F.col("x") >= BBOX[0]) & (F.col("x") < BBOX[2])
        & (F.col("y") >= BBOX[1]) & (F.col("y") < BBOX[3])).count()


def test_guards(spark, tmp_path):
    pts = customer_points(spark, "/root/testdata/sf0.001").limit(10)

    # reserved output columns in the input are a loud error, not a
    # silent recompute
    with pytest.raises(ValueError, match="collide"):
        write_hilbert_layout(
            pts.withColumn("cell", F.lit(1)), str(tmp_path / "x"),
            cell_size=10.0, levels=6)

    # non-overwrite over manifest-less pre-existing data refuses
    raw = str(tmp_path / "raw")
    pts.write.parquet(raw)
    with pytest.raises(ValueError, match="without a"):
        write_hilbert_layout(
            pts, raw, cell_size=10.0, levels=6, mode="append")

    # reading a non-layout path is a loud FileNotFoundError
    with pytest.raises(FileNotFoundError):
        read_hilbert_bbox(spark, raw, *BBOX)
