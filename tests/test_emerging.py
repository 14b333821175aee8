"""Emerging hotspots: exact Python replay of the per-day Gi* -> MK -> label
composition on a small grid, taxonomy spot checks, parallelism invariance."""

from __future__ import annotations

import math

from crankshaft_spark.functions.cells import CELL_M
from crankshaft_spark.operators.markov import MK_Z_CRIT, emerging_hotspots
from crankshaft_spark.plans.pipeline import queen_cell_edges


def _grid_series(days=10):
    """5x5 cell grid; a 3x3 center BLOCK grows linearly (Gi* is a
    neighborhood statistic — a lone growing cell barely moves its own
    neighborhood sum), a 2x2 corner block decays, the rest sit at a flat
    baseline with a deterministic ripple."""
    rows = []
    for t in range(days):
        for ix in range(5):
            for iy in range(5):
                c = ix * CELL_M + iy
                if abs(ix - 2) <= 1 and abs(iy - 2) <= 1:
                    x = 10 + 3 * t
                elif ix <= 1 and iy <= 1:
                    x = max(40 - 4 * t, 0)
                else:
                    x = 10 + ((c % 7) + t) % 3
                rows.append((c, t, x))
    return rows


def _py_emerging(rows, z_crit=MK_Z_CRIT):
    from collections import defaultdict

    by_t = defaultdict(dict)
    cells = set()
    for c, t, x in rows:
        by_t[t][c] = x
        cells.add(c)
    nbrs = {
        c: [
            c + dx * CELL_M + dy
            for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            if not (dx == 0 and dy == 0) and (c + dx * CELL_M + dy) in cells
        ]
        for c in cells
    }
    zser = defaultdict(dict)
    for t, vals in by_t.items():
        n = len(vals)
        ysum = float(sum(vals.values()))
        y2 = float(sum(v * v for v in vals.values()))
        for c, x in vals.items():
            deg = len(nbrs[c])
            s = float(sum(vals[j] for j in nbrs[c]))
            m = (ysum - x) / (n - 1)
            var = (y2 - float(x) * x) / (n - 1) - m * m
            if n > 2 and 0 < deg < n - 1 and var > 0:
                d1 = (deg + 1) * ysum
                z = ((s + x) / d1 - (deg * m + x) / d1) / math.sqrt(
                    deg * var * (n - 1 - deg) / (n - 2) / (d1 * d1))
            else:
                z = 0.0
            zser[c][t] = round(z, 6)
    out = {}
    for c, series in zser.items():
        ts = sorted(series)
        xs = [series[t] for t in ts]
        T = len(xs)
        s_stat = sum(
            (1 if xs[j] > xs[i] else -1 if xs[j] < xs[i] else 0)
            for i in range(T) for j in range(i + 1, T))
        counts = {}
        for x in xs:
            counts[x] = counts.get(x, 0) + 1
        tie = sum(t * (t - 1) * (2 * t + 5) for t in counts.values())
        var = (T * (T - 1) * (2 * T + 5) - tie) / 18.0
        if var > 0 and s_stat > 0:
            z = (s_stat - 1) / math.sqrt(var)
        elif var > 0 and s_stat < 0:
            z = (s_stat + 1) / math.sqrt(var)
        else:
            z = 0.0
        zr = round(z, 6)
        trend = ("up" if zr > z_crit else
                 "down" if zr < -z_crit else "none")
        zl = xs[-1]
        if zl > z_crit:
            label = {"up": "intensifying_hot", "down": "diminishing_hot",
                     "none": "persistent_hot"}[trend]
        elif zl < -z_crit:
            label = {"down": "intensifying_cold", "up": "diminishing_cold",
                     "none": "persistent_cold"}[trend]
        else:
            label = {"up": "warming", "down": "cooling", "none": "none"}[
                trend]
        out[c] = (s_stat, zr, trend, zl, label)
    return out


def _run(spark, rows, parts=1):
    df = spark.createDataFrame(rows, "cell long, t long, x long").repartition(
        parts)
    edges = queen_cell_edges(df.select("cell"))
    return {
        r["cell"]: (r["s_stat"], r["z_round"], r["trend"], r["z_last"],
                    r["label"])
        for r in emerging_hotspots(df, edges).collect()
    }


def test_replay_and_taxonomy(spark):
    rows = _grid_series()
    got = _run(spark, rows)
    want = _py_emerging(rows)
    assert got == want
    center = 2 * CELL_M + 2
    corner = 0
    # growing center block must read hot-side, decaying corner cold-side
    assert got[center][4] in (
        "intensifying_hot", "persistent_hot", "warming")
    assert got[corner][4] in (
        "intensifying_cold", "persistent_cold", "cooling")
    assert got[center][2] == "up" and got[corner][2] == "down"
    labels = {v[4] for v in got.values()}
    assert "intensifying_hot" in labels


def test_parallelism_invariance(spark):
    rows = _grid_series(days=8)
    assert _run(spark, rows, 1) == _run(spark, rows, 16)
