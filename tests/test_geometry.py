"""Geometry-local operators: PIA, Voronoi, densify/TIN, dot density,
overlap sum, barycentric interpolation, contour.

Mirrors the reference's pg_regress invariants (known PIA points
13_pia_test.sql, voronoi mean-cell-area 09_voronoi_test.sql, dot-density
count+containment 04_dot_density_test.sql, contour bin averages
19_contour_test.sql) re-expressed over deterministic inputs."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from crankshaft_spark.operators.contour import contour, contour_cells
from crankshaft_spark.operators.geometry import (
    densify,
    dot_density,
    overlap_sum,
    pia,
    tin_map,
    voronoi,
)
from crankshaft_spark.operators.interpolation import interpolate_barycentric


def _poly_df(spark, polys):
    # polys: list of (poly_id, [(x, y), ...], extra...)
    rows = [(pid, [float(p[0]) for p in ring], [float(p[1]) for p in ring], *rest)
            for pid, ring, *rest in polys]
    extra = ""
    if rows and len(rows[0]) > 3:
        extra = ", " + ", ".join(
            f"v{i} double" for i in range(len(rows[0]) - 3)
        )
    return spark.createDataFrame(
        rows, f"poly_id long, xs array<double>, ys array<double>{extra}"
    )


def test_pia_square_center(spark):
    """PIA of a square is its center with dist = half-side (the reference
    asserts known points for known polygons, 13_pia_test.sql:10-24)."""
    df = _poly_df(spark, [(1, [(0, 0), (4, 0), (4, 4), (0, 4)])])
    r = pia(df, tolerance=1e-4).collect()[0]
    assert abs(r["x"] - 2) < 1e-2 and abs(r["y"] - 2) < 1e-2
    assert abs(r["dist"] - 2) < 1e-2


def test_pia_l_shape_inside(spark):
    ring = [(0, 0), (4, 0), (4, 1), (1, 1), (1, 4), (0, 4)]
    df = _poly_df(spark, [(7, ring)])
    r = pia(df, tolerance=1e-4).collect()[0]
    # must be inside the L, not at the concave centroid
    from crankshaft_spark.functions.geom import point_in_ring

    assert point_in_ring([r["x"]], [r["y"]], np.array(ring, float))[0]
    assert r["dist"] > 0.45


def test_voronoi_partitions_bound(spark):
    pts = [(0, i, float(i % 3), float(i // 3)) for i in range(9)]
    df = spark.createDataFrame(pts, "grp long, id long, x double, y double")
    out = voronoi(df, buffer_frac=0.5).collect()
    assert len(out) == 9
    assert all(r["cell_area"] > 0 for r in out)
    # cells tile the expanded hull: areas sum to its area (<= and close)
    from crankshaft_spark.functions.geom import convex_hull, polygon_area

    hull = convex_hull(np.array([[p[2], p[3]] for p in pts]))
    c = hull.mean(axis=0)
    expanded = c + (hull - c) * 1.5
    total = sum(r["cell_area"] for r in out)
    assert abs(total - abs(polygon_area(expanded))) < 1e-6


def test_densify_adds_centroids(spark):
    pts = [(0, 0.0, 0.0, 1.0), (0, 2.0, 0.0, 2.0), (0, 0.0, 2.0, 3.0),
           (0, 2.0, 2.0, 4.0)]
    df = spark.createDataFrame(pts, "grp long, x double, y double, value double")
    out = densify(df, iterations=1).collect()
    assert len(out) == 6  # 4 originals + 2 triangle centroids
    vals = sorted(r["value"] for r in out)
    assert vals[0] == 1.0 and vals[-1] == 4.0
    out2 = densify(df, iterations=2).count()
    assert out2 > 6


def test_tin_map_triangles(spark):
    pts = [(0, 0.0, 0.0, 1.0), (0, 2.0, 0.0, 2.0), (0, 0.0, 2.0, 3.0),
           (0, 2.0, 2.0, 4.0)]
    df = spark.createDataFrame(pts, "grp long, x double, y double, value double")
    out = tin_map(df, iterations=0).collect()
    assert len(out) == 2
    assert all(r["tri_wkt"].startswith("POLYGON") for r in out)


def test_dot_density_count_and_containment(spark):
    ring = [(0, 0), (10, 0), (10, 10), (0, 10)]
    df = _poly_df(spark, [(3, ring, 57.0)]).withColumnRenamed("v0", "no_points")
    out = dot_density(df, points_col="no_points", seed=42).collect()
    assert len(out) == 57
    assert all(0 <= r["x"] <= 10 and 0 <= r["y"] <= 10 for r in out)
    # determinism across parallelism: same seed → same points
    out2 = dot_density(df.repartition(4), points_col="no_points", seed=42).collect()
    assert sorted((r["x"], r["y"]) for r in out) == \
        sorted((r["x"], r["y"]) for r in out2)


def test_overlap_sum_half_cover(spark):
    # query square [0,2]² ; target A [0,1]x[0,2] val 10 fully inside;
    # target B [1,3]x[0,2] val 8, half inside
    queries = _poly_df(spark, [(1, [(0, 0), (2, 0), (2, 2), (0, 2)])])
    targets = _poly_df(spark, [
        (100, [(0, 0), (1, 0), (1, 2), (0, 2)], 10.0),
        (101, [(1, 0), (3, 0), (3, 2), (1, 2)], 8.0),
    ]).withColumnRenamed("v0", "value")
    out = overlap_sum(queries, targets).collect()
    assert len(out) == 1
    assert abs(out[0]["overlap_sum"] - (10.0 + 4.0)) < 1e-9


def test_barycentric_linear_field_exact(spark):
    """Barycentric interpolation reproduces a linear field exactly inside
    the hull and returns NULL outside."""
    rng = np.random.RandomState(5)
    sp = rng.uniform(0, 10, size=(30, 2))
    samples = spark.createDataFrame(
        [(i, float(x), float(y), float(2 * x + 3 * y + 1))
         for i, (x, y) in enumerate(sp)],
        "id long, x double, y double, value double",
    )
    targets = spark.createDataFrame(
        [(0, 5.0, 5.0), (1, 4.0, 6.0), (2, 100.0, 100.0)],
        "id long, x double, y double",
    )
    got = {r["id"]: r["est"] for r in
           interpolate_barycentric(targets, samples).collect()}
    assert abs(got[0] - (2 * 5 + 3 * 5 + 1)) < 1e-9
    assert abs(got[1] - (2 * 4 + 3 * 6 + 1)) < 1e-9
    assert got[2] is None or np.isnan(got[2])


@pytest.mark.parametrize("intmethod", ["nn", "idw", "bary"])
def test_contour_bins_monotone(spark, intmethod):
    """Contour bin aggregates are ordered: min/max/avg increase with bin
    (the reference asserts per-bin avg values, 19_contour_test.sql:5-18)."""
    rng = np.random.RandomState(9)
    sp = rng.uniform(0, 20, size=(60, 2))
    samples = spark.createDataFrame(
        [(i, float(x), float(y), float(x + y)) for i, (x, y) in enumerate(sp)],
        "id long, x double, y double, value double",
    )
    out = contour(samples, cell_size=2.0, intmethod=intmethod,
                  classmethod="equal", steps=4).collect()
    assert 2 <= len(out) <= 4
    avgs = [r["avg_value"] for r in sorted(out, key=lambda r: r["bin"])]
    assert avgs == sorted(avgs)
    cells = contour_cells(samples, cell_size=2.0, intmethod=intmethod,
                          classmethod="equal", steps=4)
    assert cells.where(F.col("bin").isNull()).count() == 0


def test_contour_wkt_regions(spark):
    from crankshaft_spark.operators.contour import contour_wkt

    rng = np.random.RandomState(2)
    sp = rng.uniform(0, 20, size=(40, 2))
    samples = spark.createDataFrame(
        [(i, float(x), float(y), float(x + y)) for i, (x, y) in enumerate(sp)],
        "id long, x double, y double, value double",
    )
    out = contour_wkt(samples, cell_size=2.0, intmethod="idw",
                      classmethod="equal", steps=3).collect()
    assert len(out) >= 2
    for r in out:
        assert r["geom_wkt"].startswith("MULTIPOLYGON ((")
        assert r["geom_wkt"].count("((") == r["n_cells"]


def test_barycentric_tiled_matches_global(spark):
    """The tiled (applyInPandas per 3x3 tile neighborhood) path agrees with
    the driver-global TIN at sample densities >> 1/tile, and reproduces a
    linear field exactly (any containing triangle of a Delaunay of the
    samples interpolates a linear field exactly, so local/global TIN
    disagreement cannot change the estimate)."""
    rng = np.random.RandomState(11)
    sp = rng.uniform(0, 40, size=(400, 2))
    samples = spark.createDataFrame(
        [(i, float(x), float(y), float(0.5 * x - 2.0 * y + 3.0))
         for i, (x, y) in enumerate(sp)],
        "id long, x double, y double, value double",
    )
    tp = rng.uniform(2, 38, size=(50, 2))
    targets = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(tp)],
        "id long, x double, y double",
    )
    glob = {r["id"]: r["est"] for r in
            interpolate_barycentric(targets, samples).collect()}
    tiled = {r["id"]: r["est"] for r in
             interpolate_barycentric(targets, samples, tile_size=8.0).collect()}
    assert set(glob) == set(tiled)
    for i in glob:
        if glob[i] is None or np.isnan(glob[i]):
            assert tiled[i] is None or np.isnan(tiled[i]), i
        else:
            assert abs(tiled[i] - glob[i]) < 1e-9, i


def test_density_pyramid_matches_direct_binning(spark):
    """Rollup-from-finest must be bit-identical to direct per-zoom binning
    (the power-of-two nested-floor identity density_pyramid relies on),
    including negative coords, exact cell-boundary values, and chained
    factors."""
    from crankshaft_spark.operators.grid import density_grid, density_pyramid

    # Deterministic coords hitting boundaries: exact multiples of every cell
    # size, ulp-offsets around them, and a pseudo-random spread.
    xs, ys = [], []
    for i in range(-40, 40):
        v = i * 0.25
        xs += [v, v + 1e-12, v - 1e-12, -179.999 + (i % 7) * 13.37]
        ys += [v / 2.0, v / 2.0 + 1e-12, v / 2.0 - 1e-12, -89.9 + (i % 11) * 3.1]
    df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(zip(xs, ys))],
        "id long, x double, y double",
    )
    base, factors = 0.25, (4, 8)  # zooms: 0.25, 1.0, 8.0 degrees
    sizes = [base, base * 4, base * 32]
    pyr = sorted(
        density_pyramid(df, base_size=base, factors=factors)
        .select("zoom", "cell", "n").collect()
    )
    direct = sorted(
        density_grid(df, cell_sizes=sizes).select("zoom", "cell", "n").collect()
    )
    assert pyr == direct

    with pytest.raises(ValueError):
        density_pyramid(df, base_size=1.0, factors=(3,))


def test_quadkey_prefix_property_and_domain_guard(spark):
    """Quadkeys over the cellv1 quadtree: a Python bit replay matches;
    the parent cell's key (2 fewer levels for a factor-4 pyramid) is the
    prefix of every child key; out-of-domain cells fail loudly."""
    from crankshaft_spark.functions.cells import CELL_M, quadkey_expr

    cells = [(ix * CELL_M + iy) for ix in (0, 3, 17, 71) for iy in (0, 5, 35)]
    df = spark.createDataFrame([(c,) for c in cells], "cell long")
    got = {r["cell"]: r["qk"] for r in df.select(
        "cell", quadkey_expr("cell", levels=7).alias("qk")).collect()}

    def replay(cell, levels):
        ix, iy = cell // CELL_M, cell % CELL_M
        return "".join(
            str(((iy >> j) & 1) * 2 + ((ix >> j) & 1))
            for j in range(levels - 1, -1, -1))

    assert got == {c: replay(c, 7) for c in cells}
    assert all(len(v) == 7 for v in got.values())

    # prefix property: parent (ix//4, iy//4) at levels=5 prefixes child
    parents = df.select(
        F.expr(f"((cell div {CELL_M}) div 4) * {CELL_M}"
               f" + ((cell % {CELL_M}) div 4)").alias("pcell"),
        "cell")
    pk = {r["cell"]: r["pqk"] for r in parents.select(
        "cell", quadkey_expr("pcell", levels=5).alias("pqk")).collect()}
    for c in cells:
        assert got[c].startswith(pk[c]) and len(pk[c]) == 5

    # loud failure outside the level-7 domain (ix = 128) and on negatives
    for bad in (128 * CELL_M, -1):
        with pytest.raises(Exception, match="quadkey"):
            spark.createDataFrame([(bad,)], "cell long").select(
                quadkey_expr("cell", levels=7)).collect()


def test_tile_xyz_slippy_and_quadkey(spark):
    """Web-mercator XYZ tiles match a math replay (points strictly inside
    tiles — the transcendental y is deliberately NOT oracle-checked),
    out-of-range lat/lon clamp to edge tiles, and the tile quadkey
    round-trips bit-for-bit."""
    import math

    from crankshaft_spark.functions.cells import (
        MERCATOR_LAT_MAX, tile_quadkey_expr, tile_xyz_expr)

    z, n = 10, 1 << 10
    pts = [(0, 0.0, 0.0), (1, -180.0, 0.0), (2, 13.4, 52.52),
           (3, -74.0, 40.71), (4, 151.2, -33.87),
           (5, 0.0, MERCATOR_LAT_MAX + 0.5),
           (6, 0.0, -(MERCATOR_LAT_MAX + 0.5)), (7, 180.0, 0.0)]
    df = spark.createDataFrame(pts, "id long, lon double, lat double")
    tiles = (df.select("id", tile_xyz_expr(
                F.col("lon"), F.col("lat"), z).alias("t"))
               .select("id", F.col("t.tx").alias("tx"),
                       F.col("t.ty").alias("ty")))
    got = {r["id"]: (r["tx"], r["ty"], r["qk"]) for r in tiles.withColumn(
        "qk", tile_quadkey_expr(F.col("tx"), F.col("ty"), z)).collect()}

    def replay(lon, lat):
        tx = math.floor((lon + 180.0) / 360.0 * n)
        merc = (1 - math.asinh(math.tan(math.radians(lat))) / math.pi) / 2
        ty = math.floor(merc * n)
        return (min(max(tx, 0), n - 1), min(max(ty, 0), n - 1))

    for i, lon, lat in pts:
        assert got[i][:2] == replay(lon, lat)
    assert got[2][:2] == (550, 335)   # Berlin, the known OSM z10 tile
    assert got[5][1] == 0 and got[6][1] == n - 1   # lat clamp rows
    assert got[7][0] == n - 1                      # lon edge column

    for tx, ty, qk in got.values():
        assert len(qk) == z
        rx = ry = 0
        for ch in qk:
            d = int(ch)
            rx = rx * 2 + (d & 1)
            ry = ry * 2 + (d >> 1)
        assert (rx, ry) == (tx, ty)


def test_tile_bounds_round_trip(spark):
    """Every tile's bounds form a proper envelope whose CENTER maps back
    to the same tile (raster cell -> vector envelope -> raster cell), and
    the Berlin z10 tile's envelope contains Berlin."""
    from crankshaft_spark.functions.cells import (
        tile_bounds_expr, tile_xyz_expr)

    z = 10
    tiles = [(550, 335), (0, 0), (1023, 1023), (512, 512), (7, 900)]
    df = spark.createDataFrame(tiles, "tx long, ty long")
    b = (df.select("tx", "ty", tile_bounds_expr(
            F.col("tx"), F.col("ty"), z).alias("b"))
           .select("tx", "ty", "b.west", "b.south", "b.east", "b.north"))
    rows = b.collect()
    for r in rows:
        assert r["west"] < r["east"] and r["south"] < r["north"]
    centers = b.select(
        "tx", "ty",
        ((F.col("west") + F.col("east")) / 2).alias("lon"),
        ((F.col("south") + F.col("north")) / 2).alias("lat"))
    back = centers.select("tx", "ty", tile_xyz_expr(
        F.col("lon"), F.col("lat"), z).alias("t"))
    for r in back.collect():
        assert (r["t"]["tx"], r["t"]["ty"]) == (r["tx"], r["ty"])
    berlin = next(r for r in rows if r["tx"] == 550)
    assert berlin["west"] <= 13.4 <= berlin["east"]
    assert berlin["south"] <= 52.52 <= berlin["north"]


def test_contour_max_cells_budget(spark):
    """max_cells (the reference's max_time cost knob re-expressed as a
    deterministic grid budget, 19_contour.sql:31-37) caps the cell count
    as a hard guarantee: a tight budget coarsens the grid, the default
    leaves it alone, and bin aggregates stay well-formed."""
    rng = np.random.RandomState(11)
    sp = rng.uniform(0, 20, size=(60, 2))
    samples = spark.createDataFrame(
        [(i, float(x), float(y), float(x + y)) for i, (x, y) in enumerate(sp)],
        "id long, x double, y double, value double",
    )
    free = contour_cells(samples, cell_size=0.5, intmethod="idw",
                         classmethod="equal", steps=4, persist=False)
    n_free = free.count()
    assert n_free > 100
    budget = 100
    capped = contour_cells(samples, cell_size=0.5, intmethod="idw",
                           classmethod="equal", steps=4, persist=False,
                           max_cells=budget)
    n_capped = capped.count()
    assert 0 < n_capped <= budget
    out = contour(samples, cell_size=0.5, intmethod="idw",
                  classmethod="equal", steps=4, max_cells=budget).collect()
    assert sum(r["n_cells"] for r in out) <= budget
    avgs = [r["avg_value"] for r in sorted(out, key=lambda r: r["bin"])]
    assert avgs == sorted(avgs)
    # a generous budget leaves the requested resolution untouched
    same = contour_cells(samples, cell_size=2.0, intmethod="idw",
                         classmethod="equal", steps=4, persist=False,
                         max_cells=10_000_000)
    base = contour_cells(samples, cell_size=2.0, intmethod="idw",
                         classmethod="equal", steps=4, persist=False)
    assert same.count() == base.count()
    with pytest.raises(ValueError, match="max_cells"):
        contour_cells(samples, cell_size=0.5, max_cells=0, persist=False)


def test_hex_cells_replay_nearest_center_ring(spark):
    """hexv1 (functions/cells.py): the Spark encode matches a pure-Python
    IEEE replay bit-for-bit (the hexv1 contract — same closed-form ops,
    same operand order); every point is nearest its own hex center among
    the 6 axial neighbors (cube rounding = nearest-center assignment);
    hex_ring_expr has the 1+3r(r+1) k-ring cardinality with ring=1 being
    exactly the 6 neighbors; re-encoding a cell's center returns the cell."""
    from crankshaft_spark.functions.cells import (
        CELL_M, HEX_OFF, hex_cell_expr, hex_center_expr, hex_ring_expr,
        hex_unpack_expr)

    size, s33, s3 = 5.0, 0.5773502691896258, 1.7320508075688772
    pts = spark.range(1, 4001).select(
        "id",
        (F.lit(-120.0) + ((F.col("id") * 9973) % 24000).cast("double")
         / F.lit(100.0)).alias("x"),
        (F.lit(-48.0) + ((F.col("id") * 7919) % 9600).cast("double")
         / F.lit(100.0)).alias("y"))
    rows = pts.select(
        "x", "y", hex_cell_expr(F.col("x"), F.col("y"), size).alias("h"),
        hex_unpack_expr(F.col("h")).alias("u"),
        hex_center_expr(F.col("h"), size).alias("c")).collect()

    def replay(x, y):
        qf = (x * (2.0 / 3.0)) / size
        rf = (x * -(1.0 / 3.0) + y * s33) / size
        sf = -qf - rf
        rx, ry, rz = (float(np.floor(v + 0.5)) for v in (qf, sf, rf))
        dx, dy, dz = abs(rx - qf), abs(ry - sf), abs(rz - rf)
        if dx > dy and dx > dz:
            q, r = -ry - rz, rz
        elif dy > dz:
            q, r = rx, rz
        else:
            q, r = rx, -rx - ry
        return int(q + HEX_OFF) * CELL_M + int(r + HEX_OFF)

    for w in rows:
        assert w["h"] == replay(w["x"], w["y"])
        q, r = w["u"]["q"], w["u"]["r"]
        assert w["h"] == (q + HEX_OFF) * CELL_M + (r + HEX_OFF)
        cx, cy = w["c"]["cx"], w["c"]["cy"]
        d0 = (w["x"] - cx) ** 2 + (w["y"] - cy) ** 2
        for dq, dr in ((1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1)):
            nx = ((q + dq) * 1.5) * size
            ny = ((r + dr) + (q + dq) * 0.5) * s3 * size
            assert (w["x"] - nx) ** 2 + (w["y"] - ny) ** 2 >= d0 - 1e-9

    # k-ring cardinality + ring=1 neighbors; center re-encode round-trips
    one = spark.createDataFrame([(replay(3.3, 7.7),)], "h long")
    rings = one.select(
        *[F.size(hex_ring_expr(F.col("h"), k)).alias(f"n{k}")
          for k in range(4)],
        hex_ring_expr(F.col("h"), 1).alias("r1"),
        hex_center_expr(F.col("h"), size).alias("c"), "h").first()
    assert [rings[f"n{k}"] for k in range(4)] == [1, 7, 19, 37]
    nbrs = {rings["h"] + dq * CELL_M + dr
            for dq, dr in ((0, 0), (1, 0), (-1, 0), (0, 1), (0, -1),
                           (1, -1), (-1, 1))}
    assert set(rings["r1"]) == nbrs
    back = spark.createDataFrame(
        [(rings["c"]["cx"], rings["c"]["cy"])], "x double, y double"
    ).select(hex_cell_expr(F.col("x"), F.col("y"), size).alias("h")).first()
    assert back["h"] == rings["h"]


def test_hilbert_key_bijection_unit_steps_guard(spark):
    """hilbertv1 (functions/cells.py): over the FULL level-4 grid the key
    is a bijection onto [0, 256) whose consecutive positions are grid-
    adjacent (the Hilbert locality property — the reason it's the layout/
    range-partitioning key); matches a pure-Python replay of the same
    div/mod arithmetic; out-of-domain cells fail loudly."""
    from crankshaft_spark.functions.cells import CELL_M, with_hilbert

    L, n = 4, 16
    cells = [(ix * CELL_M + iy, ix, iy) for ix in range(n)
             for iy in range(n)]
    df = spark.createDataFrame(cells, "cell long, ix long, iy long")
    got = with_hilbert(df, levels=L, out="hkey").collect()

    def replay(x, y):
        d, s = 0, n // 2
        while s > 0:
            rx, ry = (x // s) % 2, (y // s) % 2
            d += s * s * (3 - ry if rx == 1 else ry)
            if ry == 0:
                if rx == 1:
                    x, y = n - 1 - x, n - 1 - y
                x, y = y, x
            s //= 2
        return d

    pos = {}
    for r in got:
        assert r["hkey"] == replay(r["ix"], r["iy"])
        pos[r["hkey"]] = (r["ix"], r["iy"])
    assert sorted(pos) == list(range(n * n))
    for d in range(1, n * n):
        (x0, y0), (x1, y1) = pos[d - 1], pos[d]
        assert abs(x0 - x1) + abs(y0 - y1) == 1

    for bad in (n * CELL_M, -1):
        with pytest.raises(Exception, match="hilbert"):
            with_hilbert(
                spark.createDataFrame([(bad,)], "cell long"), levels=L
            ).collect()
    # levels=0 would make every key 0 with the guard dead — loud instead
    with pytest.raises(ValueError, match="levels"):
        with_hilbert(df, levels=0)


def test_hex_cell_domain_guard(spark):
    """hexv1 loud failure (module contract): a size small enough to push
    |q| past 2^21 over the lon/lat domain raises instead of packing a
    corrupted id; in-domain rows at the same size still encode."""
    from crankshaft_spark.functions.cells import hex_cell_expr

    df = spark.createDataFrame([(-180.0, 0.0)], "x double, y double")
    with pytest.raises(Exception, match="hexv1 domain"):
        df.select(hex_cell_expr(F.col("x"), F.col("y"), 0.00005)).collect()
    ok = spark.createDataFrame([(0.003, 0.001)], "x double, y double")
    assert ok.select(
        hex_cell_expr(F.col("x"), F.col("y"), 0.00005)).first()[0] > 0


def test_hilbert_range_partitions_are_spatially_compact(spark):
    """The layout claim behind hilbertv1: range-partitioning on the key
    gives spatially COMPACT partitions.  Quantitatively: split the full
    level-5 grid (1024 cells) into 16 equal hkey ranges — every range's
    bounding box covers ≤ 1/4 of the domain area (Hilbert ranges are
    quadrant-local), where contiguous row-major (iy-then-ix) ranges of
    the same size span a full axis (bbox ≥ half the domain).  This is the
    property that turns a tile scan into a few-partition read at 100 TB."""
    from crankshaft_spark.functions.cells import CELL_M, with_hilbert

    L, n = 5, 32
    df = spark.createDataFrame(
        [(ix * CELL_M + iy,) for ix in range(n) for iy in range(n)],
        "cell long")
    rows = with_hilbert(df, levels=L, out="hkey").selectExpr(
        "cell div %d AS ix" % CELL_M, "cell %% %d AS iy" % CELL_M,
        "hkey").collect()
    per = (n * n) // 16
    boxes = {}
    for r in rows:
        b = r["hkey"] // per
        x0, y0, x1, y1 = boxes.get(b, (n, n, -1, -1))
        boxes[b] = (min(x0, r["ix"]), min(y0, r["iy"]),
                    max(x1, r["ix"]), max(y1, r["iy"]))
    assert len(boxes) == 16
    # 64 = 4^3 cells per range and ranges are 4^3-aligned, so every range
    # is EXACTLY one 8x8 quadrant of the curve — the tightest possible box
    for x0, y0, x1, y1 in boxes.values():
        assert (x1 - x0 + 1, y1 - y0 + 1) == (8, 8)
    # row-major contrast: the same-size contiguous ranges of iy*n + ix
    # each span the grid's full x axis (width 32 vs Hilbert's 8)
    rm = {}
    for r in rows:
        b = (r["iy"] * n + r["ix"]) // per
        x0, y0, x1, y1 = rm.get(b, (n, n, -1, -1))
        rm[b] = (min(x0, r["ix"]), min(y0, r["iy"]),
                 max(x1, r["ix"]), max(y1, r["iy"]))
    assert all(x1 - x0 + 1 == n for x0, y0, x1, y1 in rm.values())
