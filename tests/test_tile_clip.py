"""Vector-tile clipping: independent Python Sutherland–Hodgman replay,
area conservation across the tile partition, boundary/degenerate cases."""

from __future__ import annotations

import pytest

from crankshaft_spark.operators.geometry import tile_clip


def _sh_clip(ring, ax, direction, c):
    if len(ring) < 3:
        return ring
    out = []
    n = len(ring)
    for i in range(n):
        p, q = ring[i], ring[(i + 1) % n]
        pv, qv = p[ax], q[ax]
        pin = direction * pv >= direction * c
        qin = direction * qv >= direction * c
        if pin and qin:
            out.append(q)
        elif pin and not qin:
            t = (c - pv) / (qv - pv)
            ipt = (c, p[1] + (q[1] - p[1]) * t) if ax == 0 else \
                (p[0] + (q[0] - p[0]) * t, c)
            out.append(ipt)
        elif qin:
            t = (c - pv) / (qv - pv)
            ipt = (c, p[1] + (q[1] - p[1]) * t) if ax == 0 else \
                (p[0] + (q[0] - p[0]) * t, c)
            out.append(ipt)
            out.append(q)
    return out


def _py_tile_clip(xs, ys, size):
    import math

    out = {}
    tx0 = math.floor((min(xs) + 180.0) / size)
    tx1 = math.floor((max(xs) + 180.0) / size)
    ty0 = math.floor((min(ys) + 90.0) / size)
    ty1 = math.floor((max(ys) + 90.0) / size)
    for tx in range(tx0, tx1 + 1):
        for ty in range(ty0, ty1 + 1):
            x0, y0 = tx * size - 180.0, ty * size - 90.0
            ring = list(zip(xs, ys))
            for ax, d, c in ((0, 1.0, x0), (0, -1.0, x0 + size),
                             (1, 1.0, y0), (1, -1.0, y0 + size)):
                ring = _sh_clip(ring, ax, d, c)
            if len(ring) < 3:
                continue
            s1 = 0.0
            s2 = 0.0
            n = len(ring)
            for i in range(n):
                s1 += ring[i][0] * ring[(i + 1) % n][1]
                s2 += ring[i][1] * ring[(i + 1) % n][0]
            area = abs(0.5 * (s1 - s2))
            if area > 0.0:
                out[(tx, ty)] = (len(ring), ring, area)
    return out


POLYS = [
    (1, [0.5, 9.5, 3.5], [0.5, 0.5, 8.5]),
    (2, [1.0, 2.0, 1.5], [1.0, 1.0, 2.0]),
    (3, [-6.0, 0.0, -3.0], [0.0, 0.0, 4.0]),      # vertices on tile edges
    (4, [100.3, 109.7, 104.1], [30.2, 31.9, 39.4]),
    (5, [-12.0, 0.0, 0.0, -12.0], [-6.0, -6.0, 6.0, 6.0]),  # tile-aligned rect
]


def test_tile_clip_matches_python_replay(spark):
    df = spark.createDataFrame(
        POLYS, "poly_id long, xs array<double>, ys array<double>")
    got = tile_clip(df, tile_size=6.0).collect()
    by_poly = {}
    for r in got:
        by_poly.setdefault(r["poly_id"], {})[(r["tx"], r["ty"])] = r
    for pid, xs, ys in POLYS:
        want = _py_tile_clip(xs, ys, 6.0)
        assert set(by_poly.get(pid, {})) == set(want), f"poly {pid} tiles"
        for key, (nv, ring, area) in want.items():
            r = by_poly[pid][key]
            assert r["nvert"] == nv, f"poly {pid} tile {key}"
            assert r["area"] == pytest.approx(area, abs=0, rel=0), \
                f"poly {pid} tile {key}"  # bit-identical fold arithmetic
            assert list(zip(r["xs"], r["ys"])) == ring, f"poly {pid} {key}"


def test_tile_clip_area_conserved(spark):
    df = spark.createDataFrame(
        POLYS, "poly_id long, xs array<double>, ys array<double>")
    got = tile_clip(df, tile_size=6.0).collect()
    sums = {}
    for r in got:
        sums[r["poly_id"]] = sums.get(r["poly_id"], 0.0) + r["area"]
    # triangle 1: 0.5 * 9 * 8 = 36; rect 5: 12 * 12 = 144
    assert sums[1] == pytest.approx(36.0)
    assert sums[5] == pytest.approx(144.0)
    # poly 2 inside one tile: untouched ring
    assert sums[2] == pytest.approx(0.5)


def test_tile_clip_outside_tiles_absent(spark):
    # a polygon never emits a tile it does not overlap with positive area
    df = spark.createDataFrame(
        POLYS, "poly_id long, xs array<double>, ys array<double>")
    for r in tile_clip(df, tile_size=6.0).collect():
        x0, y0 = r["tx"] * 6.0 - 180.0, r["ty"] * 6.0 - 90.0
        assert all(x0 - 1e-9 <= v <= x0 + 6.0 + 1e-9 for v in r["xs"])
        assert all(y0 - 1e-9 <= v <= y0 + 6.0 + 1e-9 for v in r["ys"])
        assert r["area"] > 0.0 and r["nvert"] >= 3


def test_tile_clip_numpy_fold_bit_identical(spark):
    """The vectorized numpy kernel and the JVM aggregate fold are the
    same IEEE op sequence — every row, vertex and area must be equal
    bit-for-bit (the fold stays the engine-side mirror of the oracle)."""
    df = spark.createDataFrame(
        POLYS, "poly_id long, xs array<double>, ys array<double>")
    key = lambda r: (r["poly_id"], r["tx"], r["ty"])  # noqa: E731
    a = {key(r): r for r in tile_clip(df, tile_size=6.0,
                                      impl="numpy").collect()}
    b = {key(r): r for r in tile_clip(df, tile_size=6.0,
                                      impl="fold").collect()}
    assert set(a) == set(b)
    for k in a:
        assert a[k]["nvert"] == b[k]["nvert"]
        assert a[k]["xs"] == b[k]["xs"] and a[k]["ys"] == b[k]["ys"]
        assert a[k]["area"] == b[k]["area"]  # bit-identical

    with pytest.raises(ValueError):
        tile_clip(df, tile_size=6.0, impl="nope")
