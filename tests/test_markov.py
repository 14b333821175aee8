"""Spatial Markov trend parity with the reference fixture.

Mirrors /root/reference/src/py/crankshaft/test/test_space_time_dynamics.py:
num_classes=5, permutations=0, trend components almost-equal vs markov.json.
"""

from __future__ import annotations

import pytest

from crankshaft_spark.operators import (
    spatial_markov_trend,
    weights_from_neighbors,
)

TIME_COLS = [f"y{y}" for y in range(1995, 2010)]


@pytest.fixture(scope="module")
def markov_input(spark, markov_neighbors_fixture):
    rows = [
        (r["id"], [float(r[c]) for c in TIME_COLS], r["neighbors"])
        for r in markov_neighbors_fixture
    ]
    df = spark.createDataFrame(
        rows, "id long, ys array<double>, neighbors array<long>"
    )
    edges = weights_from_neighbors(df)
    return df.select("id", "ys"), edges


def test_spatial_markov_fixture(markov_input, markov_fixture):
    values, edges = markov_input
    res = {
        r["id"]: r
        for r in spatial_markov_trend(values, edges, num_classes=5).collect()
    }
    assert len(res) == 48
    for exp_trend, exp_up, exp_down, exp_vol, rowid in markov_fixture:
        got = res[rowid]
        if exp_trend is None:
            assert got["trend"] is None
        else:
            assert got["trend"] == pytest.approx(exp_trend, abs=1e-7)
        assert got["trend_up"] == pytest.approx(exp_up, abs=1e-7)
        assert got["trend_down"] == pytest.approx(exp_down, abs=1e-7)
        assert got["volatility"] == pytest.approx(exp_vol, abs=1e-7)
