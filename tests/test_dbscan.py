"""DBSCAN: handcrafted density cases + DuckDB oracle parity at sf0.001.

Semantics under test (Ester et al. 1996 / PostGIS ST_ClusterDBSCAN):
closed eps-ball (dist == eps is a neighbor), |N_eps| includes the point
itself, core iff n_eps >= min_pts, clusters are core-core components
labeled by their MIN CORE id, border points take the MIN core-neighbor
component (our pinned tie-break), everything else noise.  Toy cases are
checked against an in-test O(n^2) brute-force reference so the expected
values can't be miscounted by hand.
"""

from __future__ import annotations

import duckdb
import pytest

from crankshaft_spark.operators.dbscan import dbscan, dbscan_oracle_sql


def _brute(rows, *, eps, min_pts):
    pts = {i: (x, y) for i, x, y in rows}
    nbr = {
        i: {
            j for j in pts if j != i
            and (pts[i][0] - pts[j][0]) ** 2
            + (pts[i][1] - pts[j][1]) ** 2 <= eps * eps
        }
        for i in pts
    }
    n_eps = {i: len(nbr[i]) + 1 for i in pts}
    cores = {i for i in pts if n_eps[i] >= min_pts}
    lbl: dict = {}
    for c in sorted(cores):
        if c in lbl:
            continue
        comp, stack = [], [c]
        while stack:
            u = stack.pop()
            if u in lbl:
                continue
            lbl[u] = None
            comp.append(u)
            stack.extend(v for v in nbr[u] if v in cores and v not in lbl)
        m = min(comp)
        for u in comp:
            lbl[u] = m
    out = {}
    for i in pts:
        if i in cores:
            out[i] = (lbl[i], "core", n_eps[i])
        else:
            cn = [lbl[j] for j in nbr[i] if j in cores]
            out[i] = ((min(cn), "border", n_eps[i]) if cn
                      else (None, "noise", n_eps[i]))
    return out


def _run(spark, rows, *, eps, min_pts):
    df = spark.createDataFrame(rows, "id long, x double, y double")
    out = dbscan(df, eps=eps, min_pts=min_pts)
    got = {r["id"]: (r["cluster"], r["role"], r["n_eps"])
           for r in out.collect()}
    assert got == _brute(rows, eps=eps, min_pts=min_pts)
    return got


def test_two_clusters_border_noise(spark):
    rows = [
        (1, 0.0, 0.0), (2, 1.0, 0.0), (3, 0.0, 1.0), (4, 1.0, 1.0),
        (5, 2.4, 0.0),                       # border off cluster 1
        (10, 100.0, 0.0), (11, 101.0, 0.0), (12, 100.0, 1.0),
        (13, 101.0, 1.0),
        (99, 50.0, 50.0),                    # noise
    ]
    got = _run(spark, rows, eps=1.5, min_pts=4)
    assert {got[i][0] for i in (1, 2, 3, 4)} == {1}
    assert {got[i][0] for i in (10, 11, 12, 13)} == {10}
    assert got[5][1] == "border" and got[5][0] == 1
    assert got[99] == (None, "noise", 1)


def test_shared_border_min_tiebreak(spark):
    # two 5-point squares-with-center (all core at min_pts=5); point 7
    # touches exactly one core of EACH cluster -> border, and must take
    # the MIN component label (1, not 10)
    rows = [
        (1, 0.0, 0.0), (2, 0.0, 1.0), (3, 1.0, 0.0), (4, 1.0, 1.0),
        (5, 0.5, 0.5),
        (10, 3.8, 0.0), (11, 3.8, 1.0), (12, 4.8, 0.0), (13, 4.8, 1.0),
        (14, 4.3, 0.5),
        (7, 2.4, 0.0),
    ]
    got = _run(spark, rows, eps=1.5, min_pts=5)
    assert all(got[i] == (1, "core", got[i][2]) for i in (1, 2, 3, 4, 5))
    assert all(got[i][0] == 10 and got[i][1] == "core"
               for i in (10, 11, 12, 13, 14))
    assert got[7][1] == "border" and got[7][0] == 1


def test_chain_closed_ball_merges_one_component(spark):
    # unit-spaced chain with eps exactly 1.0: the CLOSED ball makes each
    # interior point core (n_eps = 3); pointer jumping must label the
    # whole 38-core chain with the min core id (2) despite the large
    # graph diameter; both endpoints are border to that component
    rows = [(i, float(i), 0.0) for i in range(1, 41)]
    got = _run(spark, rows, eps=1.0, min_pts=3)
    assert {c for c, _, _ in got.values()} == {2}
    assert got[1] == (2, "border", 2) and got[40] == (2, "border", 2)
    assert all(got[i] == (2, "core", 3) for i in range(2, 40))


def test_all_noise_and_min_pts_one(spark):
    rows = [(1, 0.0, 0.0), (2, 10.0, 0.0), (3, 20.0, 0.0)]
    got = _run(spark, rows, eps=1.0, min_pts=2)
    assert all(v == (None, "noise", 1) for v in got.values())
    # min_pts=1: every isolated point is its own core cluster
    got1 = _run(spark, rows, eps=1.0, min_pts=1)
    assert got1 == {1: (1, "core", 1), 2: (2, "core", 1),
                    3: (3, "core", 1)}


def test_invalid_params(spark):
    with pytest.raises(ValueError, match="min_pts"):
        dbscan(None, eps=1.0, min_pts=0)
    with pytest.raises(ValueError, match="eps"):
        dbscan(None, eps=0.0, min_pts=3)


def test_oracle_parity_sf0001(spark):
    from crankshaft_spark.plans.driver_queries import (
        DBSCAN_EPS, DBSCAN_MIN_PTS, _DBSCAN_PTS_SQL, _dbscan_pts)

    sf_dir = "/root/testdata/sf0.001"
    got = {
        r["id"]: (r["cluster"], r["role"], r["n_eps"])
        for r in dbscan(_dbscan_pts(spark, sf_dir), eps=DBSCAN_EPS,
                        min_pts=DBSCAN_MIN_PTS).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{sf_dir}/customer.parquet')")
    sql = dbscan_oracle_sql(_DBSCAN_PTS_SQL, eps=DBSCAN_EPS,
                            min_pts=DBSCAN_MIN_PTS)
    want = {i: (c, role, n) for i, c, role, n in con.execute(sql).fetchall()}
    assert got == want
    roles = {r for _, r, _ in want.values()}
    assert roles == {"core", "border", "noise"}, roles
