"""Geometry-local operators: PIA, Voronoi, densify, TIN map, dot density,
areal-weighted overlap sum.

Reference entry points (all PL/pgSQL + PostGIS over geometry[] arrays — i.e.
already bounded per call):
  * CDB_PIA          /root/reference/src/pg/sql/13_PIA.sql:11-143
  * CDB_Voronoi      /root/reference/src/pg/sql/09_voronoi.sql:6-232
  * CDB_Densify      /root/reference/src/pg/sql/14_densify.sql:15-67
  * CDB_TINmap       /root/reference/src/pg/sql/15_tinmap.sql:1-43
  * cdb_dot_density  /root/reference/src/pg/sql/30_dot_density.sql:13-54
  * cdb_overlap_sum  /root/reference/src/pg/sql/20_overlap_sum.sql:16-38

Spark-first shape: the DATA-PARALLEL axis is "many polygons / many groups",
so every operator is an Arrow-batched ``applyInPandas``/``mapInPandas`` over
a group key, with the pure-numpy kernels from functions.geom doing the local
math.  Polygon I/O convention: one row per polygon with coordinate arrays
``xs: array<double>, ys: array<double>`` (exterior ring, open).

Scale notes: per-group work is bounded by the group's geometry size, never
by table size; overlap_sum's candidate pairing is a cell-cover equi-join
(filter-and-refine, the same `&&`-then-exact trick the reference uses) so
the cross product never materializes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crankshaft_spark.functions.geom import (
    clip_convex,
    convex_hull,
    delaunay,
    point_in_ring,
    polygon_area,
    polygon_centroid,
    ring_to_wkt,
    signed_dist_to_ring,
)


def _ring(pdf_row_xs, pdf_row_ys) -> np.ndarray:
    return np.column_stack([np.asarray(pdf_row_xs, float),
                            np.asarray(pdf_row_ys, float)])


# ----------------------------------------------------------------- PIA ------

def _polylabel(ring: np.ndarray, tolerance: float) -> tuple[float, float, float]:
    """Quadtree pole-of-inaccessibility (the reference's CDB_PIA loop,
    13_PIA.sql:40-95): seed a coarse grid, keep the best signed-distance
    cell, subdivide any cell whose upper bound d + h·√2/2 can still beat
    the best by more than ``tolerance``."""
    xmin, ymin = ring.min(axis=0)
    xmax, ymax = ring.max(axis=0)
    size = min(xmax - xmin, ymax - ymin)
    if size <= 0:
        cx, cy = polygon_centroid(ring)
        return cx, cy, 0.0
    h = size / 2.0
    # seed while cell-left < max so the last (overhanging) cell covers the
    # strip at the bbox's max edges — arange stopping at xmax/ymax left up
    # to h of the polygon uncovered and subdivision never expands coverage
    xs = np.arange(xmin + h, xmax + h, 2 * h)
    ys = np.arange(ymin + h, ymax + h, 2 * h)
    if len(xs) == 0:
        xs = np.array([(xmin + xmax) / 2.0])
    if len(ys) == 0:
        ys = np.array([(ymin + ymax) / 2.0])
    gx, gy = np.meshgrid(xs, ys)
    cells = [(float(x), float(y), h) for x, y in zip(gx.ravel(), gy.ravel())]

    cx, cy = polygon_centroid(ring)
    best_x, best_y = cx, cy
    best_d = float(signed_dist_to_ring(np.array([cx]), np.array([cy]), ring)[0])

    while cells:
        px = np.array([c[0] for c in cells])
        py = np.array([c[1] for c in cells])
        hh = np.array([c[2] for c in cells])
        d = signed_dist_to_ring(px, py, ring)
        i_best = int(np.argmax(d))
        if d[i_best] > best_d:
            best_d = float(d[i_best])
            best_x, best_y = float(px[i_best]), float(py[i_best])
        keep = d + hh * np.sqrt(2.0) / 2.0 - best_d > tolerance
        nxt: list[tuple[float, float, float]] = []
        for x, y, ch, k in zip(px, py, hh, keep):
            if not k:
                continue
            q = ch / 2.0
            nxt += [(x - q, y - q, q), (x + q, y - q, q),
                    (x - q, y + q, q), (x + q, y + q, q)]
        cells = nxt
    return best_x, best_y, best_d


def pia(polys: DataFrame, *, tolerance: float = 1e-6) -> DataFrame:
    """CDB_PIA per polygon row → (poly_id, x, y, dist).

    Data-parallel over polygons; the quadtree never leaves the executor.
    The reference's default tolerance 1.0 is in EPSG:3857 meters
    (13_PIA.sql:13); ours defaults to degrees-scale 1e-6.
    """
    schema = "poly_id long, x double, y double, dist double"

    def run(pdfs):
        for pdf in pdfs:
            rows = []
            for pid, xs, ys in zip(pdf["poly_id"], pdf["xs"], pdf["ys"]):
                x, y, d = _polylabel(_ring(xs, ys), tolerance)
                rows.append((int(pid), x, y, d))
            yield pd.DataFrame(rows, columns=["poly_id", "x", "y", "dist"])

    return polys.select("poly_id", "xs", "ys").mapInPandas(run, schema=schema)


# ------------------------------------------------------------- voronoi ------

def voronoi(
    points: DataFrame,
    *,
    group_col: str = "grp",
    buffer_frac: float = 0.5,
) -> DataFrame:
    """CDB_Voronoi per group → (grp, id, cell_wkt, cell_area).

    Cells are half-plane intersections clipped to the group's convex hull
    expanded by ``buffer_frac`` about its centroid (the reference clips with
    a buffered convex hull, 09_voronoi.sql:138-170; an expanded hull is the
    arc-free equivalent).  Each group is one Arrow batch — groups tile the
    plane, so this distributes per tile.
    """
    schema = f"{group_col} long, id long, cell_wkt string, cell_area double"

    def run(key, pdf):
        pts = np.column_stack([pdf["x"].to_numpy(), pdf["y"].to_numpy()])
        ids = pdf["id"].to_numpy()
        if len(pts) == 1:
            return pd.DataFrame(
                [(key[0], int(ids[0]), "POLYGON EMPTY", 0.0)],
                columns=[group_col, "id", "cell_wkt", "cell_area"],
            )
        hull = convex_hull(pts)
        if len(hull) < 3:
            return pd.DataFrame(columns=[group_col, "id", "cell_wkt", "cell_area"])
        cx, cy = polygon_centroid(hull)
        bound = np.column_stack([
            cx + (hull[:, 0] - cx) * (1.0 + buffer_frac),
            cy + (hull[:, 1] - cy) * (1.0 + buffer_frac),
        ])
        from crankshaft_spark.functions.geom import voronoi_cells

        cells = voronoi_cells(pts, bound)
        rows = [
            (key[0], int(i), ring_to_wkt(c), abs(polygon_area(c)) if len(c) >= 3 else 0.0)
            for i, c in zip(ids, cells)
        ]
        return pd.DataFrame(rows, columns=[group_col, "id", "cell_wkt", "cell_area"])

    return (
        points.select(group_col, "id", "x", "y")
        .groupBy(group_col)
        .applyInPandas(run, schema=schema)
    )


# ------------------------------------------------- densify / TIN map --------

def _densify_arrays(pts: np.ndarray, vals: np.ndarray, iterations: int):
    """CDB_Densify core (14_densify.sql:28-60): each iteration triangulates
    the current set and appends every triangle centroid with the mean of its
    vertex values."""
    for _ in range(max(0, iterations)):
        tris = delaunay(pts)
        if len(tris) == 0:
            break
        cent = pts[tris].mean(axis=1)
        cval = vals[tris].mean(axis=1)
        pts = np.vstack([pts, cent])
        vals = np.concatenate([vals, cval])
    return pts, vals


def densify(
    points: DataFrame,
    *,
    group_col: str = "grp",
    iterations: int = 2,
) -> DataFrame:
    """CDB_Densify per group → (grp, x, y, value) with appended centroids."""
    schema = f"{group_col} long, x double, y double, value double"

    def run(key, pdf):
        pts = np.column_stack([pdf["x"].to_numpy(), pdf["y"].to_numpy()])
        vals = pdf["value"].to_numpy().astype(float)
        pts, vals = _densify_arrays(pts, vals, iterations)
        return pd.DataFrame({
            group_col: key[0], "x": pts[:, 0], "y": pts[:, 1], "value": vals,
        })

    return (
        points.select(group_col, "x", "y", "value")
        .groupBy(group_col)
        .applyInPandas(run, schema=schema)
    )


def tin_map(
    points: DataFrame,
    *,
    group_col: str = "grp",
    iterations: int = 1,
) -> DataFrame:
    """CDB_TINmap per group → (grp, tri_wkt, value): densify, then emit the
    final triangles valued at the mean of their vertices (15_tinmap.sql)."""
    schema = f"{group_col} long, tri_wkt string, value double"

    def run(key, pdf):
        pts = np.column_stack([pdf["x"].to_numpy(), pdf["y"].to_numpy()])
        vals = pdf["value"].to_numpy().astype(float)
        pts, vals = _densify_arrays(pts, vals, iterations)
        tris = delaunay(pts)
        rows = [
            (key[0], ring_to_wkt(pts[t]), float(vals[t].mean())) for t in tris
        ]
        return pd.DataFrame(rows, columns=[group_col, "tri_wkt", "value"])

    return (
        points.select(group_col, "x", "y", "value")
        .groupBy(group_col)
        .applyInPandas(run, schema=schema)
    )


# --------------------------------------------------------- dot density ------

def dot_density(
    polys: DataFrame,
    *,
    points_col: str = "no_points",
    seed: int = 1234,
    max_iter_per_point: int = 1000,
) -> DataFrame:
    """cdb_dot_density per polygon → (poly_id, x, y), ``no_points`` rows.

    Seeded rejection sampling in the bbox with ray-cast acceptance; the
    per-polygon RNG derives from (seed, poly_id), so results are identical
    at any parallelism (the reference's random chords, 30_dot_density.sql:
    27-48, are equally non-uniform per iteration — distribution parity is
    statistical, count parity exact).
    """
    schema = "poly_id long, x double, y double"

    def run(pdfs):
        for pdf in pdfs:
            out_rows = []
            for pid, xs, ys, npts in zip(
                pdf["poly_id"], pdf["xs"], pdf["ys"], pdf[points_col]
            ):
                ring = _ring(xs, ys)
                rng = np.random.RandomState((seed * 1000003 + int(pid)) % (2**32))
                xmin, ymin = ring.min(axis=0)
                xmax, ymax = ring.max(axis=0)
                need = int(npts)
                tries = 0
                while need > 0 and tries < max_iter_per_point * int(npts):
                    m = max(need * 2, 16)
                    cx = rng.uniform(xmin, xmax, m)
                    cy = rng.uniform(ymin, ymax, m)
                    ok = point_in_ring(cx, cy, ring)
                    for x, y in zip(cx[ok][:need], cy[ok][:need]):
                        out_rows.append((int(pid), float(x), float(y)))
                    need -= int(ok.sum())
                    tries += m
            yield pd.DataFrame(out_rows, columns=["poly_id", "x", "y"])

    return polys.select("poly_id", "xs", "ys", points_col).mapInPandas(
        run, schema=schema
    )


# --------------------------------------------------------- overlap sum ------

def _bbox_cells(xs_col, ys_col, cell: float):
    """Cell ids covering a polygon's bbox at resolution ``cell`` (array)."""
    return F.expr(
        f"""flatten(transform(
              sequence(int(floor(array_min({xs_col})/{cell})),
                       int(floor(array_max({xs_col})/{cell}))),
              cx -> transform(
                sequence(int(floor(array_min({ys_col})/{cell})),
                         int(floor(array_max({ys_col})/{cell}))),
                cy -> bigint(cx) * 4294967296 + (bigint(cy) + 2147483648))))"""
    )


def overlap_sum(
    queries: DataFrame,
    targets: DataFrame,
    *,
    value_col: str = "value",
    cell_size: float = 4.0,
) -> DataFrame:
    """cdb_overlap_sum → (qid, overlap_sum): for each query polygon, the sum
    over intersecting target polygons of value·area(∩)/area(target)
    (20_overlap_sum.sql:29-33).

    Filter-and-refine: bbox cell-cover arrays exploded on both sides give an
    equi-join on cell (the reference's `&&` bbox prefilter); the exact
    convex clip runs vectorized per candidate pair in mapInPandas.  Query
    polygons must be convex (admin cells / grid tiles are).
    """
    q = queries.select(
        F.col("poly_id").alias("qid"),
        F.col("xs").alias("qxs"), F.col("ys").alias("qys"),
        F.explode(_bbox_cells("xs", "ys", cell_size)).alias("_cell"),
    )
    t = targets.select(
        F.col("poly_id").alias("tid"),
        F.col("xs").alias("txs"), F.col("ys").alias("tys"),
        F.col(value_col).alias("_v"),
        F.explode(_bbox_cells("xs", "ys", cell_size)).alias("_cell"),
    )
    pairs = (
        q.join(t, "_cell")
        .select("qid", "qxs", "qys", "tid", "txs", "tys", "_v")
        .dropDuplicates(["qid", "tid"])
    )

    schema = "qid long, part double"

    def refine(pdfs):
        for pdf in pdfs:
            rows = []
            for qid, qxs, qys, txs, tys, v in zip(
                pdf["qid"], pdf["qxs"], pdf["qys"],
                pdf["txs"], pdf["tys"], pdf["_v"],
            ):
                qring = _ring(qxs, qys)
                tring = _ring(txs, tys)
                inter = clip_convex(tring, qring)
                if len(inter) < 3:
                    continue
                ia = abs(polygon_area(inter))
                ta = abs(polygon_area(tring))
                if ta <= 0 or ia <= 0:
                    continue  # edge-touching (zero-area) clips contribute
                    # nothing — matching the oracle's `ia > 0` filter
                rows.append((int(qid), float(v) * ia / ta))
            yield pd.DataFrame(rows, columns=["qid", "part"])

    return (
        pairs.mapInPandas(refine, schema=schema)
        .groupBy("qid")
        .agg(F.sum("part").alias("overlap_sum"))
    )
