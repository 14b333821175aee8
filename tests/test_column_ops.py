"""Outliers, bins, weighted mean — column-algebra operators vs closed forms.

Reference semantics: /root/reference/src/pg/sql/18_outliers.sql,
cdb_utils.sql:111-181,414-447, 11_kmeans.sql:50-100.
"""

from __future__ import annotations

import math
import statistics

import pytest

from crankshaft_spark.operators import (
    equal_interval_bins,
    headtails_bins,
    jenks_bins,
    outlier_percent,
    outlier_static,
    outlier_stddev,
    quantile_bins,
    weighted_mean_center,
)

VALS = [1.0, 2.0, 2.5, 3.0, 4.0, 10.0, 12.0, 14.0, 21.0, 50.0]


@pytest.fixture(scope="module")
def vdf(spark):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(VALS)], "id long, value double"
    )


def test_outlier_static(vdf):
    res = dict(
        (r["id"], r["is_outlier"])
        for r in outlier_static(vdf, threshold=10.0).collect()
    )
    for i, v in enumerate(VALS):
        assert res[i] == (v > 10.0)


def test_outlier_percent(vdf):
    mean = sum(VALS) / len(VALS)
    res = dict(
        (r["id"], r["is_outlier"])
        for r in outlier_percent(vdf, outlier_fraction=1.5).collect()
    )
    for i, v in enumerate(VALS):
        assert res[i] == (v / mean > 1.5)


def test_outlier_stddev(vdf):
    mean = sum(VALS) / len(VALS)
    sd = statistics.stdev(VALS)
    res = dict(
        (r["id"], r["is_outlier"])
        for r in outlier_stddev(vdf, num_deviations=2.0).collect()
    )
    for i, v in enumerate(VALS):
        assert res[i] == (abs(v - mean) / sd > 2.0)


def test_equal_interval_bins(vdf):
    res = [r["break_value"] for r in equal_interval_bins(vdf, breaks=5)
           .orderBy("bin").collect()]
    lo, hi = min(VALS), max(VALS)
    diff = (hi - lo) / 5
    exp = [lo + i * diff for i in range(1, 5)] + [hi]
    assert res == pytest.approx(exp)


def test_quantile_bins(vdf):
    # reference rule with n=10, k=5: break_size=2 (integer) → each inner
    # break is the mean of the elements at ranks (2i, 2i+1); last = max
    res = [r["break_value"] for r in quantile_bins(vdf, breaks=5)
           .orderBy("bin").collect()]
    sv = sorted(VALS)
    exp = [
        (sv[1] + sv[2]) / 2,
        (sv[3] + sv[4]) / 2,
        (sv[5] + sv[6]) / 2,
        (sv[7] + sv[8]) / 2,
        sv[-1],
    ]
    assert res == pytest.approx(exp)


def test_headtails_bins(vdf):
    res = [r["break_value"] for r in headtails_bins(vdf, breaks=3)
           .orderBy("bin").collect()]
    b1 = sum(VALS) / len(VALS)
    above1 = [v for v in VALS if v > b1]
    b2 = sum(above1) / len(above1)
    above2 = [v for v in VALS if v > b2]
    b3 = sum(above2) / len(above2)
    assert res == pytest.approx([b1, b2, b3])


def test_jenks_bins_monotone_and_cover(vdf):
    res = [r["break_value"] for r in jenks_bins(vdf, breaks=3)
           .orderBy("bin").collect()]
    assert len(res) == 3
    assert res == sorted(res)
    assert res[-1] == max(VALS)


def test_weighted_mean_center(spark):
    rows = [(1, 0.0, 0.0, 1.0), (1, 10.0, 10.0, 3.0), (2, 4.0, -2.0, 2.0)]
    df = spark.createDataFrame(rows, "g int, x double, y double, w double")
    res = {
        r["g"]: (r["cx"], r["cy"])
        for r in weighted_mean_center(df, group_cols=["g"]).collect()
    }
    assert res[1] == (pytest.approx(7.5), pytest.approx(7.5))
    assert res[2] == (pytest.approx(4.0), pytest.approx(-2.0))
    assert math.isfinite(res[1][0])


def test_jenks_invert_and_iterations(vdf):
    """invert returns each class's LOWER boundary (first = min value); the
    GVF of the default result never worsens as iterations grow; both knobs
    are deterministic."""
    lo = [r["break_value"] for r in
          jenks_bins(vdf, breaks=3, invert=True).orderBy("bin").collect()]
    hi = [r["break_value"] for r in
          jenks_bins(vdf, breaks=3).orderBy("bin").collect()]
    assert len(lo) == 3 and lo[0] == min(VALS)
    # lower boundary of class i+1 is the next sorted value after class i's
    # upper boundary — so each lo must be <= its hi and the zips interleave
    assert all(a <= b for a, b in zip(lo, hi))
    sv = sorted(VALS)
    for b_lo, b_hi in zip(lo[1:], hi[:-1]):
        assert sv.index(b_lo) == len(sv) - 1 - sv[::-1].index(b_hi) + 1

    def ssd_of(edges):
        groups, cur = [], []
        it = iter(sorted(VALS))
        for v in it:
            cur.append(v)
            if v >= edges[len(groups)] and len(groups) < len(edges) - 1:
                groups.append(cur); cur = []
        groups.append(cur)
        return sum(
            sum((x - sum(g) / len(g)) ** 2 for x in g) for g in groups if g
        )

    one = [r["break_value"] for r in
           jenks_bins(vdf, breaks=3, iterations=1).orderBy("bin").collect()]
    ten = [r["break_value"] for r in
           jenks_bins(vdf, breaks=3, iterations=10).orderBy("bin").collect()]
    assert ssd_of(ten) <= ssd_of(one) + 1e-9
    again = [r["break_value"] for r in
             jenks_bins(vdf, breaks=3, iterations=10).orderBy("bin").collect()]
    assert ten == again


def test_jenks_fewer_values_than_breaks(spark):
    """Reference: element_count < breaks returns the array itself
    (cdb_utils.sql:222-225) — must not spin in the restart loop."""
    df = spark.createDataFrame([(1.0,), (5.0,), (3.0,)], "value double")
    res = [(r["bin"], r["break_value"]) for r in
           jenks_bins(df, breaks=5).orderBy("bin").collect()]
    assert res == [(1, 1.0), (2, 3.0), (3, 5.0)]
