"""hilbert_d / hilbert_bbox_ranges: the driver-side range planner must
agree with the hilbertv1 column implementation and produce exact,
maximal key runs for cell-aligned bboxes."""

from __future__ import annotations

import pytest

from crankshaft_spark.functions.cells import (
    CELL_M, hilbert_bbox_ranges, hilbert_d, with_hilbert)


def test_hilbert_d_matches_column_impl(spark):
    L, n = 4, 16
    cells = [(ix * CELL_M + iy, ix, iy) for ix in range(n)
             for iy in range(n)]
    df = spark.createDataFrame(cells, "cell long, ix long, iy long")
    for r in with_hilbert(df, levels=L, out="hkey").collect():
        assert r["hkey"] == hilbert_d(r["ix"], r["iy"], levels=L)
    with pytest.raises(ValueError, match="outside"):
        hilbert_d(n, 0, levels=L)


def test_bbox_ranges_exact_and_maximal():
    # bbox [-60,-10) x [-20,20) at size 10 = ix 12..16, iy 7..10
    runs = hilbert_bbox_ranges(-60.0, -20.0, -10.0, 20.0,
                               cell_size=10.0, levels=6)
    want = sorted(
        hilbert_d(ix, iy, levels=6)
        for ix in range(12, 17) for iy in range(7, 11))
    covered = sorted(d for lo, hi in runs for d in range(lo, hi + 1))
    assert covered == want                     # exact: lossless AND tight
    los = [lo for lo, _ in runs]
    assert los == sorted(los)
    for (_, h0), (l1, _) in zip(runs, runs[1:]):
        assert l1 > h0 + 1                     # maximal: no mergeable gap
    # locality: 20 cells collapse into far fewer contiguous key runs
    assert len(runs) <= 8, runs


def test_bbox_alignment_and_empty_guards():
    with pytest.raises(ValueError, match="aligned"):
        hilbert_bbox_ranges(-61.0, -20.0, -10.0, 20.0,
                            cell_size=10.0, levels=6)
    with pytest.raises(ValueError, match="empty"):
        hilbert_bbox_ranges(-60.0, -20.0, -60.0, 20.0,
                            cell_size=10.0, levels=6)
