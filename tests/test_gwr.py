"""GWR vs the reference's PySAL-computed knowns (Georgia dataset,
adaptive bisquare bw=90) — the same assertions as
test_regression_gwr.py:76-131 (coeffs + t-vals to 4 decimals, predictions
within 1% relative)."""

from __future__ import annotations

import pytest

from crankshaft_spark.operators.gwr import gwr, gwr_predict, t_ppf

from conftest import load_fixture


@pytest.fixture(scope="module")
def georgia(spark):
    d = load_fixture("gwr_packed_data.json")[0]
    rows = [
        (int(i), float(x), float(y), float(dep), float(a1), float(a2), float(a3))
        for i, x, y, dep, a1, a2, a3 in zip(
            d["rowid"], d["x"], d["y"], d["dep_var"],
            d["attr1"], d["attr2"], d["attr3"],
        )
    ]
    return spark.createDataFrame(
        rows,
        "id long, x double, y double, pctbach double, "
        "pctrural double, pctpov double, pctblack double",
    )


def test_t_ppf_known_values():
    # reference points from standard t tables
    assert abs(t_ppf(0.975, 158) - 1.9751) < 1e-3
    assert abs(t_ppf(0.995, 30) - 2.75) < 2e-3
    assert abs(t_ppf(0.95, 1000) - 1.6464) < 1e-3


def test_gwr_matches_pysal_knowns(spark, georgia):
    knowns = load_fixture("gwr_packed_knowns.json")
    res = gwr(
        georgia, "pctbach", ["pctrural", "pctpov", "pctblack"], bw=90
    ).collect()
    by_id = {r["id"]: r for r in res}
    assert len(by_id) == 159
    ids = knowns["area_key"]
    for i, rid in enumerate(ids):
        r = by_id[rid]
        assert r["coeffs"]["pctpov"] == pytest.approx(
            knowns["est_pctpov"][i], abs=1e-4
        ), rid
        assert r["t_vals"]["pctrural"] == pytest.approx(
            knowns["t_pctrural"][i], abs=1e-4
        ), rid
        assert r["stand_errs"]["pctpov"] == pytest.approx(
            knowns["se_pctpov"][i], abs=1e-4
        ), rid
        assert r["predicted"] == pytest.approx(knowns["yhat"][i], abs=1e-4)
        assert r["r_squared"] == pytest.approx(knowns["localr2"][i], abs=1e-4)


def test_gwr_predict_knowns(spark, georgia):
    from pyspark.sql import functions as F

    unknown_ids = [13083, 13009, 13281, 13115, 13247, 13169]
    predicted_knowns = {13009: 10.879, 13083: 4.5259, 13115: 9.4022,
                       13169: 6.0793, 13247: 8.1608, 13281: 13.886}
    masked = georgia.withColumn(
        "pctbach",
        F.when(F.col("id").isin(unknown_ids), None).otherwise(F.col("pctbach")),
    )
    res = gwr_predict(
        masked, "pctbach", ["pctrural", "pctpov", "pctblack"], bw=90
    ).collect()
    got = {r["id"]: r["predicted"] for r in res}
    assert set(got) == set(unknown_ids)
    for rid, known in predicted_knowns.items():
        assert abs(got[rid] - known) / known < 0.01, (rid, got[rid], known)


def test_gwr_bw_selection_georgia(spark, georgia):
    """Golden-section AICc selection on Georgia: deterministic, inside the
    reference's search interval, and at least as good (by AICc) as the
    interval endpoints."""
    from crankshaft_spark.operators.gwr import _fit_stats, gwr_select_bw
    import math

    bw = gwr_select_bw(georgia, "pctbach", ["pctrural", "pctpov", "pctblack"])
    assert 48 <= bw <= 159  # [40 + 2*n_vars, n]

    def aicc_of(b):
        n, trs, rss = _fit_stats(
            georgia, "pctbach", ["pctrural", "pctpov", "pctblack"], b, 50000.0
        )
        llf = -n / 2.0 * (math.log(rss) + 1.0 + math.log(2.0 * math.pi / n))
        return -2.0 * llf + 2.0 * n * (trs + 1.0) / (n - trs - 2.0)

    assert aicc_of(bw) <= aicc_of(48) + 1e-9
    assert aicc_of(bw) <= aicc_of(159) + 1e-9
    # determinism
    assert gwr_select_bw(
        georgia, "pctbach", ["pctrural", "pctpov", "pctblack"]
    ) == bw
