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

from crankshaft_spark.functions.spread import spread_groups
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
    # strip at the bbox's max edges.  Grid coords are the explicit
    # closed-form (xmin + h) + k·(2h) — NOT np.arange — so the DuckDB
    # oracle (pia_oracle_sql) reproduces every cell center bit-for-bit.
    nx = max(int(np.ceil(((xmax + h) - (xmin + h)) / (2 * h))), 1)
    ny = max(int(np.ceil(((ymax + h) - (ymin + h)) / (2 * h))), 1)
    xs = (xmin + h) + np.arange(nx) * (2 * h)
    ys = (ymin + h) + np.arange(ny) * (2 * h)
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

    # per-polygon quadtree refinement is CPU-heavy and the polygon table is
    # tiny bytes — pin the stage's parallelism (per-row-local, order-free)
    from crankshaft_spark.functions.spread import spread_groups

    return spread_groups(
        polys.select("poly_id", "xs", "ys"), "poly_id"
    ).mapInPandas(run, schema=schema)


def pia_oracle_sql(
    polygons: list[tuple[int, list[tuple[float, float]]]],
    *,
    tolerance: float = 1e-3,
    round_dp: int = 4,
) -> str:
    """ANSI-SQL (DuckDB) mirror of ``pia``: the identical level-synchronous
    polylabel quadtree as a recursive CTE.

    Bit-for-bit parity with ``_polylabel`` + functions.geom: same grid-seed
    closed form (xmin+h) + k·(2h), same signed distance (sqrt-based
    point_seg_dist operand order, even-odd ray cast with the 1e-300 dy
    guard), same pruning bound d + h·√2/2 − best > tol with best carried as
    greatest(prev, level max) per polygon, and the same winner tie-break —
    max d, then earliest (level, cell ordinal), centroid seeded at level −1
    (numpy argmax-first + strict-> update semantics).
    """
    def sd(px: str, py: str) -> str:
        jn = "(CASE WHEN j = g.m THEN 1 ELSE j + 1 END)"
        dxe = f"(g.xs[{jn}] - g.xs[j])"
        dye = f"(g.ys[{jn}] - g.ys[j])"
        den = f"({dxe}*{dxe} + {dye}*{dye})"
        t = (f"least(greatest((({px} - g.xs[j])*{dxe} + "
             f"({py} - g.ys[j])*{dye}) / {den}, 0.0), 1.0)")
        ex = f"({px} - (g.xs[j] + {t}*{dxe}))"
        ey = f"({py} - (g.ys[j] + {t}*{dye}))"
        seg = (f"(CASE WHEN {den} = 0.0 THEN "
               f"sqrt(({px} - g.xs[j])*({px} - g.xs[j]) + "
               f"({py} - g.ys[j])*({py} - g.ys[j])) "
               f"ELSE sqrt({ex}*{ex} + {ey}*{ey}) END)")
        dmin = f"list_min(list_transform(range(1, g.m + 1), j -> {seg}))"
        dy0 = f"(CASE WHEN {dye} = 0.0 THEN 1e-300 ELSE {dye} END)"
        xint = (f"(g.xs[j] + ({py} - g.ys[j])*"
                f"(g.xs[{jn}] - g.xs[j]) / {dy0})")
        crossing = (f"(CASE WHEN ((g.ys[j] > {py}) <> (g.ys[{jn}] > {py})) "
                    f"AND ({px} < {xint}) THEN 1 ELSE 0 END)")
        inside = (f"((list_sum(list_transform(range(1, g.m + 1), "
                  f"j -> {crossing})) % 2) = 1)")
        return f"(CASE WHEN {inside} THEN {dmin} ELSE -{dmin} END)"

    prows, crows = [], []
    for pid, ring in polygons:
        xs = "[" + ", ".join(repr(float(p[0])) for p in ring) + "]"
        ys = "[" + ", ".join(repr(float(p[1])) for p in ring) + "]"
        prows.append(f"({pid}, {xs}, {ys})")
        # centroid computed with the SAME numpy code the operator uses —
        # embedding the literals sidesteps np.sum's pairwise accumulation,
        # which a SQL left-to-right list_sum could not mirror for rings of
        # 8+ vertices (exact parity for any ring size, by construction)
        ccx, ccy = polygon_centroid(
            np.asarray([(float(p[0]), float(p[1])) for p in ring])
        )
        crows.append(f"({pid}, CAST({ccx!r} AS DOUBLE), "
                     f"CAST({ccy!r} AS DOUBLE))")

    child_x = "(q.x + ch.sx * (q.h / 2.0))"
    child_y = "(q.y + ch.sy * (q.h / 2.0))"
    sd_child = sd(child_x, child_y)
    tol = repr(float(tolerance))

    return f"""
    WITH RECURSIVE polys(pid, xs, ys) AS (VALUES {", ".join(prows)}),
    geo AS (
      SELECT pid, CAST(xs AS DOUBLE[]) AS xs, CAST(ys AS DOUBLE[]) AS ys,
             len(xs) AS m,
             list_min(xs) AS xmin, list_max(xs) AS xmax,
             list_min(ys) AS ymin, list_max(ys) AS ymax
      FROM polys
    ),
    dims AS (
      SELECT *,
        greatest(CAST(ceil(((xmax + h) - (xmin + h)) / (2 * h)) AS BIGINT), 1) AS nx,
        greatest(CAST(ceil(((ymax + h) - (ymin + h)) / (2 * h)) AS BIGINT), 1) AS ny
      FROM (SELECT *, least(xmax - xmin, ymax - ymin) / 2.0 AS h FROM geo)
    ),
    cent(pid, x, y) AS (VALUES {", ".join(crows)}),
    cent_d AS (
      SELECT c.pid, c.x, c.y, {sd("c.x", "c.y")} AS d
      FROM cent c JOIN geo g ON g.pid = c.pid
    ),
    seed AS (
      SELECT d.pid, yk * d.nx + xk AS ord,
             (d.xmin + d.h) + xk * (2 * d.h) AS x,
             (d.ymin + d.h) + yk * (2 * d.h) AS y,
             d.h AS h
      FROM dims d,
           LATERAL unnest(range(d.nx)) a(xk),
           LATERAL unnest(range(d.ny)) b(yk)
    ),
    seed_d AS (
      SELECT s.pid, s.ord, s.x, s.y, s.h, {sd("s.x", "s.y")} AS d
      FROM seed s JOIN geo g ON g.pid = s.pid
    ),
    q AS (
      SELECT s.pid, 0 AS lvl, s.ord, s.x, s.y, s.h, s.d,
             greatest(c.d, max(s.d) OVER (PARTITION BY s.pid)) AS best
      FROM seed_d s JOIN cent_d c ON c.pid = s.pid
      UNION ALL
      SELECT q.pid, q.lvl + 1 AS lvl, q.ord * 4 + ch.k AS ord,
             {child_x} AS x, {child_y} AS y, q.h / 2.0 AS h,
             {sd_child} AS d,
             greatest(q.best, max({sd_child}) OVER (PARTITION BY q.pid)) AS best
      FROM q
      JOIN geo g ON g.pid = q.pid
      JOIN (VALUES (0, CAST(-1.0 AS DOUBLE), CAST(-1.0 AS DOUBLE)),
                   (1, CAST(1.0 AS DOUBLE), CAST(-1.0 AS DOUBLE)),
                   (2, CAST(-1.0 AS DOUBLE), CAST(1.0 AS DOUBLE)),
                   (3, CAST(1.0 AS DOUBLE), CAST(1.0 AS DOUBLE)))
           ch(k, sx, sy) ON true
      WHERE q.d + q.h * sqrt(2.0) / 2.0 - q.best > {tol}
    ),
    cand AS (
      SELECT pid, lvl, ord, x, y, d FROM q
      UNION ALL
      SELECT pid, -1 AS lvl, 0 AS ord, x, y, d FROM cent_d
    )
    SELECT CAST(pid AS BIGINT) AS poly_id, round(x, {round_dp}) AS x,
           round(y, {round_dp}) AS y, round(d, {round_dp}) AS dist
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY pid ORDER BY d DESC, lvl ASC, ord ASC
      ) AS rk FROM cand
    ) WHERE rk = 1"""


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
        # pin processing order by coordinates (shuffle delivery order is
        # partitioning-dependent; neighbor-distance ties must not be)
        pdf = pdf.sort_values(["x", "y", "id"], kind="mergesort")
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
        from crankshaft_spark.functions.geom import polygon_centroid_seq

        cx, cy = polygon_centroid_seq(hull)
        bound = np.column_stack([
            cx + (hull[:, 0] - cx) * (1.0 + buffer_frac),
            cy + (hull[:, 1] - cy) * (1.0 + buffer_frac),
        ])
        from crankshaft_spark.functions.geom import voronoi_cells

        from crankshaft_spark.functions.geom import polygon_area_seq

        cells = voronoi_cells(pts, bound)
        # sequential shoelace: the oracle mirrors the area with list_sum
        # (sequential), so np.dot's pairwise accumulation order would be an
        # ulp-level parity hazard at the 6dp rounding boundary
        rows = [
            (key[0], int(i), ring_to_wkt(c),
             abs(polygon_area_seq(c)) if len(c) >= 3 else 0.0)
            for i, c in zip(ids, cells)
        ]
        return pd.DataFrame(rows, columns=[group_col, "id", "cell_wkt", "cell_area"])

    return (
        spread_groups(points.select(group_col, "id", "x", "y"), group_col)
        .groupBy(group_col)
        .applyInPandas(run, schema=schema)
    )


def voronoi_oracle_sql(points_sql: str, *, buffer_frac: float = 0.5) -> str:
    """DuckDB mirror of ``voronoi`` → (grp, id, cell_area) at 6dp.

    Three sequential constructions, each as a recursive CTE with LIST
    state, mirroring the operator's float arithmetic op-for-op:

    * hull: Andrew monotone chain over the distinct (x, y) set — one
      recursion step per push OR pop (≤ 2m steps), the pop test being the
      exact np.cross expression over raw input coords;
    * bound: hull expanded about its sequential-shoelace centroid
      (polygon_centroid_seq ↔ list_sum over identical per-vertex terms);
    * cells: per point, Sutherland–Hodgman half-plane clips against the
      other points in (d², pos) order — one recursion step per clip, the
      step itself a pure list expression (flatten/list_transform), with
      the operator's security-radius early stop (d² > 4·max-vertex-d²).

    The neighbor ordering AND the security-radius break test both use the
    identical squared-distance expression as the Python kernel (voronoi_
    cells sorts/breaks on dx·dx + dy·dy, (q−p) operand order) — no hypot
    anywhere, so the clip sequences match bit-for-bit.  ``points_sql``
    must yield (grp, id, x, y).
    """
    sp = "struct_pack(x := {x}, y := {y})"
    # monotone-chain pop test: np.cross(st[-1]-st[-2], q-st[-2]) <= 0
    def pop_test(qx: str, qy: str) -> str:
        o1x, o1y = "st[len(st)].x", "st[len(st)].y"
        o2x, o2y = "st[len(st)-1].x", "st[len(st)-1].y"
        return (f"CASE WHEN len(st) >= 2 THEN "
                f"((({o1x}) - ({o2x})) * (({qy}) - ({o2y})) - "
                f"(({o1y}) - ({o2y})) * (({qx}) - ({o2x}))) <= 0.0 "
                f"ELSE false END")

    def chain(name: str, rn: str) -> str:
        return f"""{name} AS (
      SELECT grp, CAST(0 AS BIGINT) AS k,
             CAST([] AS STRUCT(x DOUBLE, y DOUBLE)[]) AS st
      FROM (SELECT DISTINCT grp FROM vr_u WHERE m >= 3)
      UNION ALL
      SELECT grp, CASE WHEN pop THEN k ELSE k + 1 END AS k,
             CASE WHEN pop THEN st[1:len(st) - 1]
                  ELSE list_append(st, {sp.format(x='qx', y='qy')}) END AS st
      FROM (
        SELECT l.grp, l.k, l.st, u.x AS qx, u.y AS qy,
               ({pop_test('u.x', 'u.y')}) AS pop
        FROM {name} l JOIN vr_u u ON u.grp = l.grp AND {rn} = l.k + 1
      )
    )"""

    # Sutherland–Hodgman step as a list expression over the state column.
    # val(v) = (-a)·v.x + (-b)·v.y + c, exact clip_halfplane arithmetic.
    def val(idx: str) -> str:
        return f"((-aa) * cell[{idx}].x + (-bb) * cell[{idx}].y + cc)"

    k1 = "((k % len(cell)) + 1)"
    vk, vk1 = val("k"), val(k1)
    t = f"({vk} / ({vk} - {vk1}))"
    cross_pt = sp.format(
        x=f"cell[k].x + {t} * (cell[{k1}].x - cell[k].x)",
        y=f"cell[k].y + {t} * (cell[{k1}].y - cell[k].y)",
    )
    clip_expr = f"""flatten(list_transform(range(1, len(cell) + 1), k ->
          list_concat(
            CASE WHEN {vk} >= 0.0 THEN [cell[k]] ELSE [] END,
            CASE WHEN ({vk} >= 0.0) <> ({vk1} >= 0.0)
                 THEN [{cross_pt}] ELSE [] END)))"""

    shoelace_terms = (
        "list_transform(range(1, len(cell) + 1), k -> "
        "cell[k].x * cell[((k % len(cell)) + 1)].y)",
        "list_transform(range(1, len(cell) + 1), k -> "
        "cell[k].y * cell[((k % len(cell)) + 1)].x)",
    )
    area = (f"abs(0.5 * (list_sum({shoelace_terms[0]})"
            f" - list_sum({shoelace_terms[1]})))")
    # sequential-shoelace centroid over the hull list (polygon_centroid_seq)
    hl1 = "((k % len(hull)) + 1)"
    cr = (f"(hull[k].x * hull[{hl1}].y - hull[{hl1}].x * hull[k].y)")
    ca = f"list_sum(list_transform(range(1, len(hull) + 1), k -> {cr}))"
    cxs = (f"list_sum(list_transform(range(1, len(hull) + 1), k -> "
           f"(hull[k].x + hull[{hl1}].x) * {cr}))")
    cys = (f"list_sum(list_transform(range(1, len(hull) + 1), k -> "
           f"(hull[k].y + hull[{hl1}].y) * {cr}))")
    ex = 1.0 + buffer_frac

    return f"""WITH RECURSIVE vr_in AS ({points_sql}),
    vr_pts AS (
      SELECT grp, id, x, y,
             CAST(row_number() OVER (PARTITION BY grp ORDER BY x, y, id)
                  AS BIGINT) AS pos,
             count(*) OVER (PARTITION BY grp) AS n
      FROM vr_in
    ),
    vr_u AS (
      SELECT grp, x, y,
             CAST(row_number() OVER (PARTITION BY grp ORDER BY x, y)
                  AS BIGINT) AS rn,
             count(*) OVER (PARTITION BY grp) AS m
      FROM (SELECT DISTINCT v.grp, v.x, v.y FROM vr_in v
            JOIN (SELECT grp FROM vr_in GROUP BY grp HAVING count(*) > 1) g2
              ON g2.grp = v.grp)
    ),
    {chain("vr_lo", "u.rn")},
    {chain("vr_hi", "(u.m + 1 - u.rn)")},
    vr_hull AS (
      SELECT lo.grp,
             list_concat(lo.st[1:len(lo.st) - 1],
                         hi.st[1:len(hi.st) - 1]) AS hull
      FROM (SELECT l.* FROM vr_lo l JOIN vr_u u
              ON u.grp = l.grp AND u.rn = 1 AND l.k = u.m) lo
      JOIN (SELECT h.* FROM vr_hi h JOIN vr_u u
              ON u.grp = h.grp AND u.rn = 1 AND h.k = u.m) hi
        ON hi.grp = lo.grp
      WHERE len(lo.st[1:len(lo.st) - 1]) + len(hi.st[1:len(hi.st) - 1]) >= 3
    ),
    vr_bound AS (
      SELECT grp,
             list_transform(hull, v -> struct_pack(
               x := cx + (v.x - cx) * {ex!r},
               y := cy + (v.y - cy) * {ex!r})) AS bound
      FROM (
        SELECT grp, hull,
               ({cxs}) / (6.0 * (({ca}) / 2.0)) AS cx,
               ({cys}) / (6.0 * (({ca}) / 2.0)) AS cy
        FROM vr_hull
      )
    ),
    vr_nbr AS (
      SELECT a.grp, a.pos AS i, b.x AS qx, b.y AS qy,
             (b.x - a.x) * (b.x - a.x) + (b.y - a.y) * (b.y - a.y) AS d2,
             CAST(row_number() OVER (
               PARTITION BY a.grp, a.pos
               ORDER BY (b.x - a.x) * (b.x - a.x)
                        + (b.y - a.y) * (b.y - a.y) ASC, b.pos ASC)
               AS BIGINT) AS r
      FROM vr_pts a JOIN vr_pts b ON b.grp = a.grp AND b.pos <> a.pos
    ),
    vr_cell AS (
      SELECT p.grp, p.pos AS i, CAST(0 AS BIGINT) AS r, b.bound AS cell
      FROM vr_pts p JOIN vr_bound b ON b.grp = p.grp
      UNION ALL
      SELECT grp, i, r + 1 AS r, {clip_expr} AS cell
      FROM (
        SELECT c.grp, c.i, c.r, c.cell, nb.d2,
               (nb.qx - pp.x) AS aa, (nb.qy - pp.y) AS bb,
               ((nb.qx - pp.x) * (pp.x + nb.qx)
                + (nb.qy - pp.y) * (pp.y + nb.qy)) / 2.0 AS cc,
               list_max(list_transform(c.cell, v ->
                 (v.x - pp.x) * (v.x - pp.x)
                 + (v.y - pp.y) * (v.y - pp.y))) AS r2
        FROM vr_cell c
        JOIN vr_nbr nb ON nb.grp = c.grp AND nb.i = c.i AND nb.r = c.r + 1
        JOIN vr_pts pp ON pp.grp = c.grp AND pp.pos = c.i
      ) WHERE NOT coalesce(d2 > 4.0 * r2, false)
    ),
    vr_fin AS (
      SELECT grp, i, cell FROM (
        SELECT grp, i, cell,
               row_number() OVER (PARTITION BY grp, i ORDER BY r DESC) AS rk
        FROM vr_cell
      ) WHERE rk = 1
    )
    SELECT p.grp, p.id,
           round(CASE WHEN len(f.cell) >= 3 THEN {area} ELSE 0.0 END, 6)
             AS cell_area
    FROM vr_fin f JOIN vr_pts p ON p.grp = f.grp AND p.pos = f.i
    UNION ALL
    SELECT grp, id, 0.0 AS cell_area FROM vr_pts WHERE n = 1"""


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
        # pin Bowyer-Watson insertion order by coordinates (+value so exact
        # duplicate coordinates stay deterministic): shuffle delivery order
        # is partitioning-dependent, triangle choice in degenerate
        # (cocircular) cases must not be
        pdf = pdf.sort_values(["x", "y", "value"], kind="mergesort")
        pts = np.column_stack([pdf["x"].to_numpy(), pdf["y"].to_numpy()])
        vals = pdf["value"].to_numpy().astype(float)
        pts, vals = _densify_arrays(pts, vals, iterations)
        return pd.DataFrame({
            group_col: key[0], "x": pts[:, 0], "y": pts[:, 1], "value": vals,
        })

    return (
        spread_groups(points.select(group_col, "x", "y", "value"), group_col)
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
        pdf = pdf.sort_values(["x", "y", "value"], kind="mergesort")  # same pin
        pts = np.column_stack([pdf["x"].to_numpy(), pdf["y"].to_numpy()])
        vals = pdf["value"].to_numpy().astype(float)
        pts, vals = _densify_arrays(pts, vals, iterations)
        tris = delaunay(pts)
        rows = [
            (key[0], ring_to_wkt(pts[t]), float(vals[t].mean())) for t in tris
        ]
        return pd.DataFrame(rows, columns=[group_col, "tri_wkt", "value"])

    return (
        spread_groups(points.select(group_col, "x", "y", "value"), group_col)
        .groupBy(group_col)
        .applyInPandas(run, schema=schema)
    )


def _delaunay_oracle_ctes(points_sql: str) -> str:
    """DuckDB CTE chain mirroring functions.geom.delaunay (Bowyer-Watson)
    over grouped points, bit-for-bit.

    ``points_sql`` must yield (grp, x, y, value).  Insertion order is the
    operator's pin (ORDER BY x, y, value); each recursion step inserts one
    point: the bad set is the exact orientation-normalized in-circumcircle
    determinant (same operand order as delaunay()'s ``det``; the numpy
    prefilter is inflated so the exact test decides membership both
    places), cavity boundary edges are the count==1 undirected edges among
    bad triangles (window count, no GROUP BY in the recursive term), and
    new triangles are (min(e), max(e), inserted_idx) exactly like the
    numpy construction.  Exposes dl_pts(grp, idx, x, y, value) and
    dl_final(grp, v0, v1, v2) — the super-triangle rows (idx ≥ n) are
    already filtered out of dl_final.
    """
    orient = ("((vb.x - va.x) * (vc.y - va.y) - "
              "(vb.y - va.y) * (vc.x - va.x))")
    rax, ray = "(va.x - p.x)", "(va.y - p.y)"
    rbx, rby = "(vb.x - p.x)", "(vb.y - p.y)"
    rcx, rcy = "(vc.x - p.x)", "(vc.y - p.y)"
    a2 = f"({rax} * {rax} + {ray} * {ray})"
    b2 = f"({rbx} * {rbx} + {rby} * {rby})"
    c2 = f"({rcx} * {rcx} + {rcy} * {rcy})"
    det = (f"({rax} * ({rby} * {c2} - {rcy} * {b2}) "
           f"- {ray} * ({rbx} * {c2} - {rcx} * {b2}) "
           f"+ {a2} * ({rbx} * {rcy} - {rcx} * {rby}))")
    return f"""dl_in AS ({points_sql}),
    dl_pts AS (
      SELECT grp, x, y, value,
             CAST(row_number() OVER (PARTITION BY grp ORDER BY x, y, value)
                  - 1 AS BIGINT) AS idx
      FROM dl_in
    ),
    dl_sup AS (
      SELECT grp, count(*) AS n,
             (min(x) + max(x)) / 2.0 AS mid0,
             (min(y) + max(y)) / 2.0 AS mid1,
             greatest(greatest(max(x) - min(x), max(y) - min(y)), 1e-12)
               AS span
      FROM dl_pts GROUP BY grp
    ),
    dl_ap AS (
      SELECT grp, idx, x, y FROM dl_pts
      UNION ALL
      SELECT grp, n + k,
             CASE k WHEN 0 THEN mid0 - 3000.0 * span
                    WHEN 1 THEN mid0 + 3000.0 * span ELSE mid0 END,
             CASE k WHEN 2 THEN mid1 + 3000.0 * span
                    ELSE mid1 - 1500.0 * span END
      FROM dl_sup, (SELECT unnest(range(3)) AS k)
    ),
    dl_tri AS (
      SELECT grp, CAST(0 AS BIGINT) AS step, n AS v0, n + 1 AS v1, n + 2 AS v2
      FROM dl_sup
      UNION ALL
      SELECT grp, step + 1 AS step,
             CASE WHEN k = 3 THEN v0 ELSE eu END AS v0,
             CASE WHEN k = 3 THEN v1 ELSE ev END AS v1,
             CASE WHEN k = 3 THEN v2 ELSE step END AS v2
      FROM (
        SELECT grp, step, v0, v1, v2, k, eu, ev,
               count(*) OVER (
                 PARTITION BY grp, CASE WHEN k = 3 THEN -1 ELSE 0 END, eu, ev
               ) AS cnt
        FROM (
          SELECT tb.grp, tb.step, tb.v0, tb.v1, tb.v2, e.k,
                 CASE e.k WHEN 0 THEN least(tb.v0, tb.v1)
                          WHEN 1 THEN least(tb.v1, tb.v2)
                          WHEN 2 THEN least(tb.v2, tb.v0)
                          ELSE tb.v0 END AS eu,
                 CASE e.k WHEN 0 THEN greatest(tb.v0, tb.v1)
                          WHEN 1 THEN greatest(tb.v1, tb.v2)
                          WHEN 2 THEN greatest(tb.v2, tb.v0)
                          ELSE tb.v1 END AS ev
          FROM (
            SELECT t.grp, t.step, t.v0, t.v1, t.v2,
                   ((CASE WHEN {orient} >= 0.0 THEN {det}
                          ELSE -{det} END) > 0.0) AS bad
            FROM dl_tri t
            JOIN dl_sup s ON s.grp = t.grp AND t.step < s.n
            JOIN dl_ap p  ON p.grp = t.grp AND p.idx = t.step
            JOIN dl_ap va ON va.grp = t.grp AND va.idx = t.v0
            JOIN dl_ap vb ON vb.grp = t.grp AND vb.idx = t.v1
            JOIN dl_ap vc ON vc.grp = t.grp AND vc.idx = t.v2
          ) tb
          JOIN (VALUES (0), (1), (2), (3)) e(k)
            ON (tb.bad AND e.k < 3) OR ((NOT tb.bad) AND e.k = 3)
        )
      ) WHERE k = 3 OR cnt = 1
    ),
    dl_final AS (
      SELECT t.grp, t.v0, t.v1, t.v2
      FROM dl_tri t JOIN dl_sup s ON s.grp = t.grp AND t.step = s.n
      WHERE t.v0 < s.n AND t.v1 < s.n AND t.v2 < s.n
    )"""


def densify_oracle_sql(points_sql: str) -> str:
    """DuckDB mirror of ``densify(iterations=1)``: original points plus one
    round of triangle centroids (mean of vertex coords/values, same
    left-associated /3 sum as numpy's axis mean)."""
    return f"""WITH RECURSIVE {_delaunay_oracle_ctes(points_sql)}
    SELECT grp, round(x, 6) AS x, round(y, 6) AS y,
           round(value, 6) AS value
    FROM dl_pts
    UNION ALL
    SELECT f.grp,
           round((a.x + b.x + c.x) / 3.0, 6) AS x,
           round((a.y + b.y + c.y) / 3.0, 6) AS y,
           round((a.value + b.value + c.value) / 3.0, 6) AS value
    FROM dl_final f
    JOIN dl_pts a ON a.grp = f.grp AND a.idx = f.v0
    JOIN dl_pts b ON b.grp = f.grp AND b.idx = f.v1
    JOIN dl_pts c ON c.grp = f.grp AND c.idx = f.v2"""


def tin_oracle_sql(points_sql: str) -> str:
    """DuckDB mirror of ``tin_map(iterations=0)``: one triangulation, WKT
    rendered with printf %.6f (same correctly-rounded formatting as
    ring_to_wkt's f-string) and the vertex-mean value."""
    return f"""WITH RECURSIVE {_delaunay_oracle_ctes(points_sql)}
    SELECT f.grp,
           printf('POLYGON ((%.6f %.6f, %.6f %.6f, %.6f %.6f, %.6f %.6f))',
                  a.x, a.y, b.x, b.y, c.x, c.y, a.x, a.y) AS tri_wkt,
           round((a.value + b.value + c.value) / 3.0, 6) AS value
    FROM dl_final f
    JOIN dl_pts a ON a.grp = f.grp AND a.idx = f.v0
    JOIN dl_pts b ON b.grp = f.grp AND b.idx = f.v1
    JOIN dl_pts c ON c.grp = f.grp AND c.idx = f.v2"""


# --------------------------------------------------------- alpha shape ------

def alpha_shape(
    points: DataFrame,
    *,
    r: int,
    group_col: str = "grp",
) -> DataFrame:
    """Alpha-shape boundary per group → (grp, wkt, value): the LINESTRING
    edges of the alpha complex (Edelsbrunner, Kirkpatrick & Seidel 1983)
    — Delaunay triangles with circumradius <= ``r`` kept, boundary =
    undirected edges used by exactly ONE kept triangle.  value carries
    the edge's squared length (exact integer, cast to double).

    The reference ecosystem's surface is PostGIS ``ST_ConcaveHull`` /
    CARTO's concave-hull helpers next to CDB_TINmap — the concave
    counterpart of functions.geom.convex_hull, riding the same Delaunay
    as tin_map (/root/reference/src/pg/sql/15_tinmap.sql:1-43), hence it
    rides that catalog entry.

    Oracle exactness: the circumradius test is integer-only —
    R² <= r²  ⇔  |AB|²·|BC|²·|CA|² <= 4·r²·cross²  (16·area² = 4·cross²)
    — evaluated in unbounded Python ints here and BIGINT in DuckDB, so
    coordinates must be integer-valued and the frame small enough that
    |AB|²·|BC|²·|CA|² fits BIGINT (~|frame|⁶ <= 9.2e18; the catalog's
    600×400 frame gives 1.4e17).  Degenerate zero-area triangles fail
    the test (P > 0 = RHS) and drop out deterministically.

    Scale shape: one applyInPandas over spread_groups-pinned groups —
    the many-shapes axis is the data-parallel one, same contract as
    voronoi/densify/tin.
    """
    if r < 0:
        raise ValueError(f"alpha_shape: r must be >= 0, got {r}")
    r2 = int(r) * int(r)
    schema = f"{group_col} long, wkt string, value double"

    def run(key, pdf):
        pdf = pdf.sort_values(["x", "y", "value"], kind="mergesort")
        pts = np.column_stack([pdf["x"].to_numpy(), pdf["y"].to_numpy()])
        tris = delaunay(pts)
        xs = [int(v) for v in pdf["x"]]
        ys = [int(v) for v in pdf["y"]]

        def d2(i, j):
            return (xs[j] - xs[i]) ** 2 + (ys[j] - ys[i]) ** 2

        edge_count: dict[tuple, int] = {}
        for a, b, c in tris:
            cross = ((xs[b] - xs[a]) * (ys[c] - ys[a])
                     - (ys[b] - ys[a]) * (xs[c] - xs[a]))
            if d2(a, b) * d2(b, c) * d2(c, a) > 4 * r2 * cross * cross:
                continue
            for u, v in ((a, b), (b, c), (c, a)):
                e = (min(u, v), max(u, v))
                edge_count[e] = edge_count.get(e, 0) + 1
        rows = [
            (key[0],
             f"LINESTRING ({xs[u]:.6f} {ys[u]:.6f}, "
             f"{xs[v]:.6f} {ys[v]:.6f})",
             float(d2(u, v)))
            for (u, v), n in edge_count.items() if n == 1
        ]
        return pd.DataFrame(rows, columns=[group_col, "wkt", "value"])

    return (
        spread_groups(points.select(group_col, "x", "y", "value"), group_col)
        .groupBy(group_col)
        .applyInPandas(run, schema=schema)
    )


def alpha_oracle_sql(points_sql: str, *, r: int) -> str:
    """DuckDB mirror of ``alpha_shape``: the shared Bowyer-Watson CTE chain
    (dl_final), then the integer circumradius filter and the count==1
    boundary-edge aggregate.  ``points_sql`` must yield (grp, x, y, value)
    with integer-valued doubles (exact-integer doubles may cross the
    BIGINT cast — the round-4 cast-rounding rule)."""
    r2 = int(r) * int(r)

    def bx(p, c):
        return f"CAST({p}.{c} AS BIGINT)"

    def dd2(p, q):
        return (f"(({bx(q, 'x')} - {bx(p, 'x')}) * ({bx(q, 'x')} - "
                f"{bx(p, 'x')}) + ({bx(q, 'y')} - {bx(p, 'y')}) * "
                f"({bx(q, 'y')} - {bx(p, 'y')}))")

    cross = (f"(({bx('b', 'x')} - {bx('a', 'x')}) * ({bx('c', 'y')} - "
             f"{bx('a', 'y')}) - ({bx('b', 'y')} - {bx('a', 'y')}) * "
             f"({bx('c', 'x')} - {bx('a', 'x')}))")
    return f"""WITH RECURSIVE {_delaunay_oracle_ctes(points_sql)},
    al_kept AS (
      SELECT f.grp, f.v0, f.v1, f.v2
      FROM dl_final f
      JOIN dl_pts a ON a.grp = f.grp AND a.idx = f.v0
      JOIN dl_pts b ON b.grp = f.grp AND b.idx = f.v1
      JOIN dl_pts c ON c.grp = f.grp AND c.idx = f.v2
      WHERE {dd2('a', 'b')} * {dd2('b', 'c')} * {dd2('c', 'a')}
            <= 4 * {r2} * {cross} * {cross}
    ),
    al_edges AS (
      SELECT grp, LEAST(v0, v1) AS e0, GREATEST(v0, v1) AS e1 FROM al_kept
      UNION ALL
      SELECT grp, LEAST(v1, v2), GREATEST(v1, v2) FROM al_kept
      UNION ALL
      SELECT grp, LEAST(v2, v0), GREATEST(v2, v0) FROM al_kept
    ),
    al_bnd AS (
      SELECT grp, e0, e1 FROM al_edges
      GROUP BY grp, e0, e1 HAVING count(*) = 1
    )
    SELECT n.grp,
           printf('LINESTRING (%.6f %.6f, %.6f %.6f)', p.x, p.y, q.x, q.y)
             AS wkt,
           CAST({dd2('p', 'q')} AS DOUBLE) AS value
    FROM al_bnd n
    JOIN dl_pts p ON p.grp = n.grp AND p.idx = n.e0
    JOIN dl_pts q ON q.grp = n.grp AND q.idx = n.e1"""


# ------------------------------------------------------------ simplify ------

def _dp_keep(xs: list, ys: list, eps2: int) -> list:
    """Douglas–Peucker kept-index set over an ordered vertex list.

    All comparisons are exact: with integer coordinates and integer
    ``eps2`` the arithmetic stays in unbounded Python ints (never numpy
    int64 — cross² at planar web-mercator magnitudes is ~1e17, fine for
    int64, but a caller with larger frames must not silently wrap; see
    the r3 cross-multiplication lesson).  Split test is the closed ball
    (keep a vertex only when its distance STRICTLY exceeds eps); the
    argmax tie-break is the smallest index — the paper leaves it
    scan-order-dependent, the oracle needs it pinned.  The kept SET is
    independent of segment processing order (splits are per-segment
    local), which is what lets the DuckDB mirror run level-synchronous
    rounds while this kernel uses a plain stack.
    """
    n = len(xs)
    if n <= 2:
        return list(range(n))
    keep = {0, n - 1}
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        dx, dy = xs[j] - xs[i], ys[j] - ys[i]
        len2 = dx * dx + dy * dy
        den = len2 if len2 > 0 else 1
        best_k, best_num = -1, -1
        for k in range(i + 1, j):
            if len2 > 0:
                cross = dx * (ys[k] - ys[i]) - dy * (xs[k] - xs[i])
                num = cross * cross
            else:  # degenerate segment: distance to the coincident endpoint
                ex, ey = xs[k] - xs[i], ys[k] - ys[i]
                num = ex * ex + ey * ey
            if num > best_num:
                best_num, best_k = num, k
        if best_num > eps2 * den:
            keep.add(best_k)
            stack.append((i, best_k))
            stack.append((best_k, j))
    return sorted(keep)


def simplify(
    points: DataFrame,
    *,
    eps: int,
    group_col: str = "grp",
    seq_col: str = "seq",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Douglas–Peucker polyline simplification per group →
    (grp, seq, x, y): the vertices KEPT when every dropped vertex lies
    within ``eps`` of the simplified chain (Douglas & Peucker 1973).

    The reference ecosystem's surface is PostGIS ``ST_Simplify(geom,
    tolerance)``, which CARTO exposes next to crankshaft for rendering
    pipelines — the inverse of ``CDB_Densify``
    (/root/reference/src/pg/sql/14_densify.sql:15-67), hence it rides
    the same catalog entry.  ``seq_col`` defines the path order; output
    keeps it so the caller can reassemble the chain.

    Oracle exactness: comparisons are integer-only (cross² vs
    eps²·len²) whenever the coordinates and ``eps`` are integers — the
    catalog pins integer coords so DuckDB replays every split
    bit-for-bit (non-integer inputs still simplify correctly but are
    not oracle-exact).

    Scale shape: one applyInPandas over spread_groups-pinned groups;
    per-group work is O(kept·n) worst case over the GROUP's vertices —
    the many-polylines axis is the data-parallel one, same contract as
    densify/voronoi/tin.
    """
    if eps < 0:
        raise ValueError(f"simplify: eps must be >= 0, got {eps}")
    eps2 = eps * eps
    schema = f"{group_col} long, {seq_col} long, {x} double, {y} double"

    def run(key, pdf):
        pdf = pdf.sort_values(seq_col, kind="mergesort")
        # exact ints when integral (the oracle contract), floats otherwise
        xv, yv = pdf[x].tolist(), pdf[y].tolist()
        if all(float(v).is_integer() for v in xv + yv):
            xv = [int(v) for v in xv]
            yv = [int(v) for v in yv]
        kept = _dp_keep(xv, yv, eps2)
        sub = pdf.iloc[kept]
        return pd.DataFrame({
            group_col: key[0],
            seq_col: sub[seq_col].to_numpy(),
            x: sub[x].astype(float).to_numpy(),
            y: sub[y].astype(float).to_numpy(),
        })

    return (
        spread_groups(points.select(group_col, seq_col, x, y), group_col)
        .groupBy(group_col)
        .applyInPandas(run, schema=schema)
    )


def simplify_oracle_sql(verts_sql: str, *, eps: int) -> str:
    """DuckDB mirror of ``simplify``: level-synchronous segment splitting
    as a recursive CTE.

    ``verts_sql`` must yield (grp, seq BIGINT, ix BIGINT, iy BIGINT)
    with seq dense from 0 per group.  Each round, every alive segment
    (i, j) finds its max-cross² interior vertex via a window over the
    JOINed static vertex table (no correlated subqueries — the DuckDB
    recursive-term rule), then either emits its two children (sides
    join, the polylabel quadtree trick) or finishes with done=TRUE;
    done rows leave the recursion, so it terminates when every segment
    is final.  Kept vertices = endpoints of done segments (single-vertex
    groups union-ed back in).  All arithmetic BIGINT — bit-for-bit the
    Python kernel's splits.
    """
    eps2 = int(eps) * int(eps)
    return f"""WITH RECURSIVE
    sv AS MATERIALIZED ({verts_sql}),
    sb AS MATERIALIZED (SELECT grp, MAX(seq) AS last FROM sv GROUP BY grp),
    segs AS (
        SELECT grp, CAST(0 AS BIGINT) AS i, last AS j, FALSE AS done
        FROM sb WHERE last >= 1
        UNION ALL
        SELECT grp,
               CASE WHEN side = 2 THEN k ELSE i END AS i,
               CASE WHEN side = 1 THEN k ELSE j END AS j,
               side = 0 AS done
        FROM (
            SELECT grp, i, j, k,
                   (k IS NOT NULL AND num > {eps2} * den) AS split,
                   row_number() OVER (PARTITION BY grp, i, j
                                      ORDER BY num DESC, k ASC) AS rn
            FROM (
                SELECT s.grp, s.i, s.j, v.seq AS k,
                       CASE WHEN (vj.ix - vi.ix) * (vj.ix - vi.ix)
                                 + (vj.iy - vi.iy) * (vj.iy - vi.iy) > 0
                            THEN ((vj.ix - vi.ix) * (v.iy - vi.iy)
                                  - (vj.iy - vi.iy) * (v.ix - vi.ix))
                                 * ((vj.ix - vi.ix) * (v.iy - vi.iy)
                                    - (vj.iy - vi.iy) * (v.ix - vi.ix))
                            ELSE (v.ix - vi.ix) * (v.ix - vi.ix)
                                 + (v.iy - vi.iy) * (v.iy - vi.iy) END AS num,
                       CASE WHEN (vj.ix - vi.ix) * (vj.ix - vi.ix)
                                 + (vj.iy - vi.iy) * (vj.iy - vi.iy) > 0
                            THEN (vj.ix - vi.ix) * (vj.ix - vi.ix)
                                 + (vj.iy - vi.iy) * (vj.iy - vi.iy)
                            ELSE 1 END AS den
                FROM segs s
                JOIN sv vi ON vi.grp = s.grp AND vi.seq = s.i
                JOIN sv vj ON vj.grp = s.grp AND vj.seq = s.j
                LEFT JOIN sv v ON v.grp = s.grp
                     AND v.seq > s.i AND v.seq < s.j
                WHERE NOT s.done
            ) cand
        ) best
        JOIN (VALUES (0), (1), (2)) sides(side)
          ON best.rn = 1
         AND ((best.split AND side IN (1, 2))
              OR ((NOT best.split) AND side = 0))
    ),
    sk AS (
        SELECT DISTINCT grp, seq FROM (
            SELECT grp, i AS seq FROM segs WHERE done
            UNION ALL SELECT grp, j AS seq FROM segs WHERE done
            UNION ALL SELECT grp, CAST(0 AS BIGINT) AS seq
            FROM sb WHERE last = 0
        ) u
    )
    SELECT v.grp, v.seq, CAST(v.ix AS DOUBLE) AS x, CAST(v.iy AS DOUBLE) AS y
    FROM sk JOIN sv v ON v.grp = sk.grp AND v.seq = sk.seq"""


# --------------------------------------------------------- dot density ------

def dot_density(
    polys: DataFrame,
    *,
    points_col: str = "no_points",
    seed: int = 1234,
    max_iter_per_point: int = 1000,
) -> DataFrame:
    """cdb_dot_density per polygon → (poly_id, x, y), up to ``no_points``
    rows (fewer only if the attempt budget runs dry, like the reference's
    max_iter cap, 30_dot_density.sql:13-54; the default budget matches its
    max_iter_per_point=1000 — thin slivers may need it, typical polygons
    fill within a few attempts per point and callers benchmarking at scale
    can lower it).

    Pure column algebra — NO Python stage: attempt j ∈ [0, npts·max_iter)
    draws a bbox point from the portable hash RNG
    u = int(md5(seed:poly_id:j:axis)[:8]) / 2³², tests it with the same
    JVM crossing-parity aggregate as the PIP join (pip.py:151-162), and the
    first ``npts`` accepted attempts (by attempt index) win.  Per-row
    derivation from (seed, poly_id, j) makes results bit-identical at any
    parallelism AND reproducible in ANSI SQL (dot_density_oracle_sql) —
    the reference's random chords (30_dot_density.sql:27-48) are equally
    non-uniform per iteration, so distribution parity is statistical while
    count and containment parity are exact.
    """
    from pyspark.sql.window import Window

    npts = F.col(points_col).cast("long")
    att = polys.select(
        "poly_id", "xs", "ys", npts.alias("_n"),
        F.explode(
            F.sequence(F.lit(0), npts * max_iter_per_point - 1)
        ).alias("i"),
    )

    def u(axis: str):
        h = F.md5(F.concat_ws(
            ":", F.lit(str(seed)), F.col("poly_id"), F.col("i"), F.lit(axis)
        ))
        return (
            F.conv(F.substring(h, 1, 8), 16, 10).cast("double")
            / F.lit(4294967296.0)
        )

    xmin, xmax = F.array_min("xs"), F.array_max("xs")
    ymin, ymax = F.array_min("ys"), F.array_max("ys")
    att = att.withColumn("x", xmin + u("x") * (xmax - xmin)).withColumn(
        "y", ymin + u("y") * (ymax - ymin)
    )
    m = F.size("xs")
    px, py = F.col("x"), F.col("y")

    def cross(acc, j):
        jn = F.when(j == m, F.lit(1)).otherwise(j + 1)
        x1 = F.element_at(F.col("xs"), j)
        y1 = F.element_at(F.col("ys"), j)
        x2 = F.element_at(F.col("xs"), jn)
        y2 = F.element_at(F.col("ys"), jn)
        # nested CASE guards the division (ANSI mode) exactly like the
        # oracle's join condition; operand order matches pip_oracle_sql
        return acc + F.when(
            (y1 > py) != (y2 > py),
            F.when(px < (x2 - x1) * (py - y1) / (y2 - y1) + x1,
                   F.lit(1)).otherwise(0),
        ).otherwise(0)

    crossings = F.aggregate(F.sequence(F.lit(1), m), F.lit(0), cross)
    w = Window.partitionBy("poly_id").orderBy("i")
    return (
        att.where(crossings % 2 == 1)
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= F.col("_n"))
        .select("poly_id", "x", "y")
    )


def dot_density_oracle_sql(
    polygons: list[tuple[int, list[tuple[float, float]]]],
    npts: dict[int, int],
    *,
    seed: int = 1234,
    max_iter_per_point: int = 1000,
) -> str:
    """ANSI-SQL (DuckDB) mirror of ``dot_density`` over a pinned polygon
    list: same hash RNG, same bbox arithmetic, same edge-join parity test,
    same first-npts-by-attempt-order selection."""
    prows, erows = [], []
    for pid, ring in polygons:
        xs = [p[0] for p in ring]
        ys = [p[1] for p in ring]
        prows.append(
            f"({pid}, {min(xs)!r}, {max(xs)!r}, {min(ys)!r}, {max(ys)!r}, "
            f"{int(npts[pid])})"
        )
        for k in range(len(ring)):
            x1, y1 = ring[k]
            x2, y2 = ring[(k + 1) % len(ring)]
            erows.append(f"({pid}, {x1!r}, {y1!r}, {x2!r}, {y2!r})")
    hexu = (
        "(('0x' || substring(md5('{seed}:' || p.pid || ':' || g.i "
        "|| ':{ax}'), 1, 8))::BIGINT / 4294967296.0)"
    )
    ux = hexu.format(seed=seed, ax="x")
    uy = hexu.format(seed=seed, ax="y")
    return f"""
    WITH polys AS (SELECT * FROM (VALUES {", ".join(prows)})
                   AS p(pid, xmin, xmax, ymin, ymax, n)),
    edges AS (SELECT * FROM (VALUES {", ".join(erows)})
              AS e(pid, ex1, ey1, ex2, ey2)),
    att AS (
      SELECT p.pid, g.i, p.n,
             p.xmin + {ux} * (p.xmax - p.xmin) AS x,
             p.ymin + {uy} * (p.ymax - p.ymin) AS y
      FROM polys p, LATERAL unnest(range(p.n * {max_iter_per_point})) AS g(i)
    ),
    ins AS (
      SELECT a.pid, a.i, a.n, any_value(a.x) AS x, any_value(a.y) AS y
      FROM att a JOIN edges e
        ON a.pid = e.pid
       AND ((e.ey1 > a.y) <> (e.ey2 > a.y)
            AND a.x < (e.ex2 - e.ex1) * (a.y - e.ey1)
                      / (e.ey2 - e.ey1) + e.ex1)
      GROUP BY a.pid, a.i, a.n
      HAVING count(*) % 2 = 1
    )
    SELECT pid AS poly_id, x, y FROM (
      SELECT pid, x, y, n,
             row_number() OVER (PARTITION BY pid ORDER BY i) AS rk
      FROM ins
    ) WHERE rk <= n"""


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
    # pin the refine parallelism: the candidate-pair shuffle is a few MB of
    # vertex arrays, so AQE's byte-based coalescing lands every pair in ONE
    # task and the Python clip runs serially (measured 4.0 -> 1.9 s at
    # sf0.1 on local[32]; same trap as functions/spread.spread_groups)
    from crankshaft_spark.functions.spread import spread_groups

    pairs = spread_groups(
        q.join(t, "_cell")
        .select("qid", "qxs", "qys", "tid", "txs", "tys", "_v")
        .dropDuplicates(["qid", "tid"]),
        "qid", "tid",
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


# --------------------------------------------------- line interpolation -----

def line_interpolate(
    verts: DataFrame,
    *,
    fracs,
    group_col: str = "grp",
    seq_col: str = "seq",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Point at fraction f of each group's polyline length, one row per
    (group, f) → (grp, x, y, value=f): the PostGIS
    ``ST_LineInterpolatePoint`` surface next to ST_Simplify/CDB_Densify
    (/root/reference/src/pg/sql/14_densify.sql:15-67 being the densify
    half of that toolbox), hence it rides the same catalog entry.

    Oracle exactness (the float-order contract): segment lengths are
    sqrt of exact-integer d² (identical IEEE both engines); the
    cumulative length is a SEQUENTIAL running sum (a Python loop here, a
    one-row-per-step recursive CTE in DuckDB — windowed SUM is
    segment-tree-accumulated and would diverge in the last ulp); the
    containing segment is chosen by FIXED-POINT comparison
    (floor(cum·1e6) ≥ floor(f·total·1e6) — floor of bit-identical
    doubles is engine-exact) and the interpolation arithmetic is written
    in one pinned operand order.  Zero-length segments emit their start
    vertex (division CASE-guarded).  Groups with < 2 vertices emit
    nothing (no segments) on both engines.

    Scale shape: one applyInPandas over spread_groups-pinned groups —
    polylines are bounded objects; the many-lines axis is the
    data-parallel one (the simplify/densify contract).
    """
    import math

    fr = [float(f) for f in fracs]
    if not fr or any(f < 0.0 or f > 1.0 for f in fr):
        raise ValueError(f"line_interpolate: fracs must be in [0, 1], "
                         f"got {fracs}")
    schema = f"{group_col} long, {x} double, {y} double, value double"

    def run(key, pdf):
        pdf = pdf.sort_values(seq_col, kind="mergesort")
        xs = [int(v) for v in pdf[x]]
        ys = [int(v) for v in pdf[y]]
        if len(xs) < 2:
            return pd.DataFrame(columns=[group_col, x, y, "value"])
        lens = [
            math.sqrt(float((xs[i + 1] - xs[i]) ** 2
                            + (ys[i + 1] - ys[i]) ** 2))
            for i in range(len(xs) - 1)
        ]
        cum = []
        c = 0.0
        for ln in lens:          # sequential — mirrors the recursive CTE
            c = c + ln
            cum.append(c)
        tot = cum[-1]
        rows = []
        for f in fr:
            tgt = f * tot
            tfp = math.floor(tgt * 1000000.0)
            k = next(i for i, cv in enumerate(cum)
                     if math.floor(cv * 1000000.0) >= tfp)
            prev = cum[k - 1] if k > 0 else 0.0
            ln = lens[k]
            if ln == 0.0:
                px, py = float(xs[k]), float(ys[k])
            else:
                px = xs[k] + ((tgt - prev) / ln) * (xs[k + 1] - xs[k])
                py = ys[k] + ((tgt - prev) / ln) * (ys[k + 1] - ys[k])
            rows.append((key[0], px, py, f))
        return pd.DataFrame(rows, columns=[group_col, x, y, "value"])

    return (
        spread_groups(verts.select(group_col, seq_col, x, y), group_col)
        .groupBy(group_col)
        .applyInPandas(run, schema=schema)
    )


def line_interp_oracle_sql(verts_sql: str, *, fracs) -> str:
    """DuckDB mirror of ``line_interpolate``: window-lead segments, a
    one-row-per-step recursive running sum (li_len MATERIALIZED — the
    recursive term re-runs plain CTEs per iteration), the fixed-point
    first-match pick, and the same pinned interpolation arithmetic.
    ``verts_sql`` must yield (grp, seq BIGINT dense from 0, ix, iy
    BIGINT)."""
    fr = ", ".join(f"CAST({float(f)!r} AS DOUBLE)" for f in fracs)
    return f"""WITH RECURSIVE li_in AS ({verts_sql}),
    li_len AS MATERIALIZED (
      SELECT grp, seq, ix AS x0, iy AS y0, nx AS x1, ny AS y1,
             sqrt(CAST((nx - ix) * (nx - ix) + (ny - iy) * (ny - iy)
                  AS DOUBLE)) AS len
      FROM (
        SELECT grp, seq, ix, iy,
               lead(ix) OVER (PARTITION BY grp ORDER BY seq) AS nx,
               lead(iy) OVER (PARTITION BY grp ORDER BY seq) AS ny
        FROM li_in
      ) WHERE nx IS NOT NULL
    ),
    li_cum AS (
      SELECT grp, seq, len AS cum FROM li_len WHERE seq = 0
      UNION ALL
      SELECT l.grp, l.seq, c.cum + l.len
      FROM li_cum c JOIN li_len l ON l.grp = c.grp AND l.seq = c.seq + 1
    ),
    li_tot AS (SELECT grp, max(cum) AS tot FROM li_cum GROUP BY grp),
    li_fr AS (SELECT unnest([{fr}]) AS f),
    li_pick AS (
      SELECT c.grp, fr.f, min(c.seq) AS seq
      FROM li_cum c JOIN li_tot t ON c.grp = t.grp CROSS JOIN li_fr fr
      WHERE CAST(floor(c.cum * 1000000.0) AS BIGINT)
            >= CAST(floor(fr.f * t.tot * 1000000.0) AS BIGINT)
      GROUP BY 1, 2
    )
    SELECT p.grp,
           CASE WHEN l.len = 0.0 THEN CAST(l.x0 AS DOUBLE)
                ELSE l.x0 + ((p.f * t.tot - COALESCE(pv.cum, 0.0)) / l.len)
                     * (l.x1 - l.x0) END AS x,
           CASE WHEN l.len = 0.0 THEN CAST(l.y0 AS DOUBLE)
                ELSE l.y0 + ((p.f * t.tot - COALESCE(pv.cum, 0.0)) / l.len)
                     * (l.y1 - l.y0) END AS y,
           p.f AS value
    FROM li_pick p
    JOIN li_len l ON l.grp = p.grp AND l.seq = p.seq
    JOIN li_tot t ON t.grp = p.grp
    LEFT JOIN li_cum pv ON pv.grp = p.grp AND pv.seq = p.seq - 1"""


# ------------------------------------------------------- vector-tile clip ---

def _sh_emit(p: str, q: str, ax: str, dr: str, c: str,
             mk2, a0: str, a1, a2) -> str:
    """One Sutherland–Hodgman per-edge emit expression, written ONCE and
    instantiated for both engines (the shared-builder rule: a hand-inlined
    copy silently diverges when the kernel is tuned).

    ``p``/``q`` are engine-specific accessors for the current and next ring
    vertex, ``ax``/``dr``/``c`` the clip boundary (axis 0=x/1=y, direction
    ±1.0, boundary coordinate), ``mk2``/``a0``/``a1``/``a2`` the struct and
    array constructors.  Every coordinate OPERATION (inside test, parameter
    t, interpolation) is emitted from this one template, so both engines run
    the identical float sequence and the clipped rings compare exactly.
    """
    pv = f"(CASE WHEN {ax} = 0 THEN {p}.x ELSE {p}.y END)"
    qv = f"(CASE WHEN {ax} = 0 THEN {q}.x ELSE {q}.y END)"
    pin = f"({dr} * {pv} >= {dr} * {c})"
    qin = f"({dr} * {qv} >= {dr} * {c})"
    t = f"(({c} - {pv}) / ({qv} - {pv}))"
    ix = f"(CASE WHEN {ax} = 0 THEN {c} ELSE {p}.x + ({q}.x - {p}.x) * {t} END)"
    iy = f"(CASE WHEN {ax} = 0 THEN {p}.y + ({q}.y - {p}.y) * {t} ELSE {c} END)"
    ipt = mk2(ix, iy)
    return (f"CASE WHEN {pin} AND {qin} THEN {a1(q)} "
            f"WHEN {pin} AND NOT {qin} THEN {a1(ipt)} "
            f"WHEN {qin} THEN {a2(ipt, q)} "
            f"ELSE {a0} END")


#: the four half-planes of an axis-aligned tile, clipped in pinned order
#: (left, right, bottom, top) — the order is part of the cross-engine
#: contract (S-H output vertex order depends on it).
_TILE_BOUNDS = ((0, 1.0, "_x0"), (0, -1.0, "_x1"), (1, 1.0, "_y0"), (1, -1.0, "_y1"))


def _ring_wrap_next(lens):
    """(starts, nxt) for concatenated rings in flat form: per-ring start
    offsets and the wrap-around next-vertex index.  ONE builder shared
    by _sh_clip_flat and the in-batch shoelace fold (the shared-builder
    rule — a hand-inlined copy silently diverges when the wrap logic is
    touched)."""
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    total = int(lens.sum())
    idx = np.arange(total, dtype=np.int64)
    nxt = idx + 1
    nz = lens > 0
    nxt[(starts + lens - 1)[nz]] = starts[nz]
    return starts, nxt


def _sh_clip_flat(vx, vy, rid, lens, cvals, ax: int, dr: float):
    """One vectorized Sutherland–Hodgman half-plane pass over a RAGGED
    batch of rings in flat form — the numpy twin of one ``_sh_emit``
    fold step, math written in the IDENTICAL IEEE op order (same
    ``t = (c-pv)/(qv-pv)``, same ``p + (q-p)*t``) so outputs are
    bit-equal to the Spark HOF fold and the DuckDB oracle.

    ``vx``/``vy`` are the concatenated ring vertices, ``rid`` the row id
    per vertex, ``lens`` the per-row ring lengths, ``cvals`` the per-ROW
    boundary coordinate.  Rows with fewer than 3 vertices are FROZEN —
    copied through verbatim — mirroring the fold's ``size(acc) < 3``
    guard.  Returns the pass's (vx, vy, rid, lens).
    """
    total = vx.shape[0]
    if total == 0:
        return vx, vy, rid, lens
    n = lens.shape[0]
    _, nxt = _ring_wrap_next(lens)
    pv = vx if ax == 0 else vy
    c = cvals[rid]
    frozen = (lens < 3)[rid]
    pin = dr * pv >= dr * c
    qin = dr * pv[nxt] >= dr * c
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (c - pv) / (pv[nxt] - pv)
        if ax == 0:
            ix = c
            iy = vy + (vy[nxt] - vy) * t
        else:
            ix = vx + (vx[nxt] - vx) * t
            iy = c
    both = pin & qin
    counts = np.where(both | (pin ^ qin), 1, 0) + np.where(~pin & qin, 1, 0)
    counts = np.where(frozen, 1, counts)
    out_total = int(counts.sum())
    cum = np.cumsum(counts)
    startpos = cum - counts
    ox = np.empty(out_total, dtype=np.float64)
    oy = np.empty(out_total, dtype=np.float64)
    # slot 1: frozen rows copy p; in-in emits q; crossings emit the
    # intersection point
    first = counts >= 1
    fx = np.where(frozen, vx, np.where(both, vx[nxt], ix))
    fy = np.where(frozen, vy, np.where(both, vy[nxt], iy))
    ox[startpos[first]] = fx[first]
    oy[startpos[first]] = fy[first]
    # slot 2: the out->in case appends q after the intersection point
    second = counts == 2
    ox[startpos[second] + 1] = vx[nxt][second]
    oy[startpos[second] + 1] = vy[nxt][second]
    orid = np.repeat(rid, counts)
    olens = np.bincount(rid, weights=counts, minlength=n).astype(np.int64)
    return ox, oy, orid, olens


def tile_clip(
    polys: DataFrame,
    *,
    tile_size: float,
    id_col: str = "poly_id",
    xs_col: str = "xs",
    ys_col: str = "ys",
    impl: str = "numpy",
) -> DataFrame:
    """Cut polygons into an axis-aligned planar tile grid (the vector side
    of a tile-serving pipeline — PostGIS ``ST_Subdivide`` / vector-tile
    cutting counterpart; the reference's grid operators rasterize the other
    direction, 18_rectgrid.sql).  → (poly_id, tx, ty, nvert, xs, ys, area):
    one row per (polygon, intersected tile) with the clipped ring and its
    absolute shoelace area.

    Plan: bbox tile-cover explode (pure integer column math, the
    _bbox_cells pattern) → per-candidate Sutherland–Hodgman clip against
    the tile rectangle — no joins beyond the explode, linear in
    Σ(candidate tiles).  Tiles are anchored at (-180, -90) like the
    cellv1 grid; intersection coordinates are exact linear interpolations,
    areas sequential shoelace folds (polygon_area_seq convention), so the
    DuckDB oracle (tile_clip_oracle_sql — same formulas via _sh_emit,
    unrolled as MATERIALIZED CTE passes) matches value-for-value.

    ``impl`` picks the clip kernel (r4 verdict item 3 — the two are
    bit-identical, asserted in tests/test_tile_clip.py):

    * ``"numpy"`` (default) — the four half-plane passes run vectorized
      over the whole Arrow batch in mapInPandas (_sh_clip_flat, flat
      ragged arrays, same IEEE op sequence as _sh_emit).  Spark
      ``aggregate``/``transform`` HOFs evaluate INTERPRETED, never in
      whole-stage codegen, so the fold paid per-row interpreter +
      allocation cost (0.575 N→4N at 20M rows) plus an ~8–14 s
      plan→RDD driver constant from the checkpoint fence its
      re-inlining hazard required; the numpy arm removes both.  The
      shoelace area is folded IN-BATCH in the same left-to-right order
      as the oracle's sequential fold (position-wise vectorized
      accumulation — oracle-exact).
    * ``"fold"`` — the original single JVM ``aggregate`` expression over
      the four half-planes; kept as the engine-side mirror of the
      oracle's CTE unroll and as the zero-Python-stage fallback.
    """
    S = float(tile_size)
    # ANSI Spark parses bare float literals as DECIMAL — explicit DOUBLE
    # casts keep the tile bounds (and the fold) in double arithmetic on
    # BOTH engines (same literals, same op order).
    DS = f"CAST({S!r} AS DOUBLE)"
    D180 = "CAST(180.0 AS DOUBLE)"
    D90 = "CAST(90.0 AS DOUBLE)"
    mk2 = lambda x, y: f"named_struct('x', {x}, 'y', {y})"  # noqa: E731
    a1 = lambda a: f"array({a})"  # noqa: E731
    a2 = lambda a, b: f"array({a}, {b})"  # noqa: E731
    emit = _sh_emit(
        "element_at(acc, i)", "element_at(acc, i % size(acc) + 1)",
        "b.ax", "b.dir", "b.c", mk2, "array()", a1, a2)
    ring0 = (f"transform(sequence(1, size({xs_col})), i -> "
             f"named_struct('x', element_at({xs_col}, i), "
             f"'y', element_at({ys_col}, i)))")
    bounds = ", ".join(
        f"named_struct('ax', {ax}, 'dir', CAST({dr!r} AS DOUBLE), 'c', {c})"
        for ax, dr, c in _TILE_BOUNDS)
    fold = (f"aggregate(array({bounds}), {ring0}, (acc, b) -> "
            f"CASE WHEN size(acc) < 3 THEN acc ELSE "
            f"flatten(transform(sequence(1, size(acc)), i -> {emit})) END)")
    s1 = ("aggregate(sequence(1, size(ring)), CAST(0.0 AS DOUBLE), (a, i) -> "
          "a + element_at(ring, i).x * element_at(ring, i % size(ring) + 1).y)")
    s2 = ("aggregate(sequence(1, size(ring)), CAST(0.0 AS DOUBLE), (a, i) -> "
          "a + element_at(ring, i).y * element_at(ring, i % size(ring) + 1).x)")
    cand = (
        polys.select(
            F.col(id_col).alias("poly_id"), xs_col, ys_col,
            F.explode(F.expr(
                f"sequence(int(floor((array_min({xs_col}) + 180.0) / {S!r})), "
                f"int(floor((array_max({xs_col}) + 180.0) / {S!r})))")).alias("tx"),
        )
        .select(
            "*",
            F.explode(F.expr(
                f"sequence(int(floor((array_min({ys_col}) + 90.0) / {S!r})), "
                f"int(floor((array_max({ys_col}) + 90.0) / {S!r})))")).alias("ty"),
        )
        .withColumn("_x0", F.expr(f"tx * {DS} - {D180}"))
        .withColumn("_x1", F.expr(f"tx * {DS} - {D180} + {DS}"))
        .withColumn("_y0", F.expr(f"ty * {DS} - {D90}"))
        .withColumn("_y1", F.expr(f"ty * {DS} - {D90} + {DS}"))
    )
    # fan the candidate explode out of a single-split scan BEFORE the
    # clip kernel runs (the scan-side serial trap); the 3-int key keeps
    # a tile's rows co-located for downstream per-tile consumers.
    cand = cand.repartition(
        cand.sparkSession.sparkContext.defaultParallelism,
        "poly_id", "tx", "ty")
    if impl == "numpy":
        cols = ["poly_id", "tx", "ty", xs_col, ys_col,
                "_x0", "_x1", "_y0", "_y1"]

        def clip_batches(pdfs):
            for pdf in pdfs:
                n = len(pdf)
                if n == 0:
                    continue
                xs_v = pdf[xs_col].to_numpy()
                ys_v = pdf[ys_col].to_numpy()
                lens = np.fromiter((len(v) for v in xs_v), dtype=np.int64,
                                   count=n)
                vx = np.concatenate(xs_v).astype(np.float64) \
                    if lens.sum() else np.empty(0)
                vy = np.concatenate(ys_v).astype(np.float64) \
                    if lens.sum() else np.empty(0)
                rid = np.repeat(np.arange(n, dtype=np.int64), lens)
                for ax, dr, cname in _TILE_BOUNDS:
                    cvals = pdf[cname].to_numpy(dtype=np.float64)
                    vx, vy, rid, lens = _sh_clip_flat(
                        vx, vy, rid, lens, cvals, ax, dr)
                # shoelace area in the SAME left-fold order as the SQL
                # aggregate / DuckDB list fold.  NOT np.add.reduceat —
                # measured: reduceat reorders even a 3-element segment
                # (ulp drift vs the sequential fold).  Instead fold by
                # VERTEX POSITION over rings sorted by length: slot j
                # touches only the still-active prefix, so total work is
                # O(sum of ring lengths), not O(rows × max length) (one
                # huge ring no longer inflates the whole batch), while
                # each row still accumulates the exact left-to-right
                # sum (((0+p0)+p1)+...).  Computing area here (not as a
                # Spark column) also keeps the area>0 filter from
                # re-inlining an interpreted HOF below the project (the
                # r4 tile_clip trap — review finding r5).
                starts, nxt = (None, None)
                s1 = np.zeros(n, dtype=np.float64)
                s2 = np.zeros(n, dtype=np.float64)
                if vx.shape[0]:
                    starts, nxt = _ring_wrap_next(lens)
                    prod1 = vx * vy[nxt]
                    prod2 = vy * vx[nxt]
                    order = np.argsort(-lens, kind="stable")
                    lens_o = lens[order]
                    starts_o = starts[order]
                    s1o = np.zeros(n, dtype=np.float64)
                    s2o = np.zeros(n, dtype=np.float64)
                    neg = -lens_o
                    for j in range(int(lens_o[0])):
                        k = int(np.searchsorted(neg, -(j + 1),
                                                side="right"))
                        at = starts_o[:k] + j
                        s1o[:k] += prod1[at]
                        s2o[:k] += prod2[at]
                    s1[order] = s1o
                    s2[order] = s2o
                area = np.abs(0.5 * (s1 - s2))
                keep = (lens >= 3) & (area > 0.0)
                rbounds = np.cumsum(lens)[:-1]
                rx = np.split(vx, rbounds)
                ry = np.split(vy, rbounds)
                sel = np.flatnonzero(keep)
                out = pd.DataFrame({
                    "poly_id": pdf["poly_id"].to_numpy()[keep],
                    "tx": pdf["tx"].to_numpy()[keep],
                    "ty": pdf["ty"].to_numpy()[keep],
                    "nvert": lens[keep].astype("int32"),
                    "xs": [rx[i] for i in sel],
                    "ys": [ry[i] for i in sel],
                    "area": area[keep],
                })
                yield out

        return cand.select(*cols).mapInPandas(
            clip_batches,
            schema="poly_id long, tx int, ty int, nvert int, "
                   "xs array<double>, ys array<double>, area double")
    if impl != "fold":
        raise ValueError(f"tile_clip: unknown impl {impl!r}")
    # two deliberate barriers (the with_hilbert lesson — HOFs evaluate
    # interpreted and multi-reference filters re-inline them): the
    # repartition above fans the scan out BEFORE the fold runs, and the
    # non-eager localCheckpoint fences predicate pushdown — without it
    # the area>0 filter sinks below the exchange and inlines the fold
    # ~9x into the serial scan stage (measured 2.6 s → 0.35 s at sf0.1).
    clipped = (
        cand
        .withColumn("ring", F.expr(fold))
        .where(F.expr("size(ring) >= 3"))
        .localCheckpoint(eager=False)
    )
    return (
        clipped
        .withColumn("area", F.expr(f"abs(0.5 * (({s1}) - ({s2})))"))
        .where(F.expr("area > 0.0"))
        .select(
            "poly_id", "tx", "ty",
            F.expr("size(ring)").alias("nvert"),
            F.expr("transform(ring, v -> v.x)").alias("xs"),
            F.expr("transform(ring, v -> v.y)").alias("ys"),
            "area",
        )
    )


def tile_clip_oracle_sql(polys_sql: str, *, tile_size: float) -> str:
    """DuckDB mirror of ``tile_clip``: same bbox tile cover, the same four
    _sh_emit half-plane passes unrolled as MATERIALIZED CTEs (DuckDB 1.0's
    list_reduce takes no initial accumulator, and plain CTEs would re-inline
    the growing ring expression per reference), and the same sequential
    list_sum shoelace.  ``polys_sql`` must yield (poly_id, xs DOUBLE[],
    ys DOUBLE[])."""
    S = float(tile_size)
    DS = f"CAST({S!r} AS DOUBLE)"
    D180 = "CAST(180.0 AS DOUBLE)"
    D90 = "CAST(90.0 AS DOUBLE)"
    mk2 = lambda x, y: "{'x': " + x + ", 'y': " + y + "}"  # noqa: E731
    a1 = lambda a: f"[{a}]"  # noqa: E731
    a2 = lambda a, b: f"[{a}, {b}]"  # noqa: E731
    passes = []
    prev = "tc0"
    for k, (ax, dr, cname) in enumerate(_TILE_BOUNDS, start=1):
        emit = _sh_emit(
            "ring[i]", "ring[i % len(ring) + 1]",
            str(ax), f"CAST({dr!r} AS DOUBLE)", cname, mk2, "[]", a1, a2)
        passes.append(
            f"tc{k} AS MATERIALIZED (SELECT poly_id, tx, ty, _x0, _x1, _y0, _y1, "
            f"CASE WHEN len(ring) < 3 THEN ring ELSE "
            f"flatten(list_transform(range(1, len(ring) + 1), i -> {emit})) END"
            f" AS ring FROM {prev})")
        prev = f"tc{k}"
    s1 = ("list_sum(list_transform(range(1, len(ring) + 1), i -> "
          "ring[i].x * ring[i % len(ring) + 1].y))")
    s2 = ("list_sum(list_transform(range(1, len(ring) + 1), i -> "
          "ring[i].y * ring[i % len(ring) + 1].x))")
    return f"""WITH tc_in AS ({polys_sql}),
    tc0 AS MATERIALIZED (
      SELECT poly_id, CAST(gx.tx AS INT) AS tx, CAST(gy.ty AS INT) AS ty,
             gx.tx * {DS} - {D180} AS _x0,
             gx.tx * {DS} - {D180} + {DS} AS _x1,
             gy.ty * {DS} - {D90} AS _y0,
             gy.ty * {DS} - {D90} + {DS} AS _y1,
             list_transform(xs, (v, i) -> {{'x': v, 'y': ys[i]}}) AS ring
      FROM tc_in,
           LATERAL unnest(range(CAST(floor((list_min(xs) + 180.0) / {S!r}) AS BIGINT),
                          CAST(floor((list_max(xs) + 180.0) / {S!r}) AS BIGINT) + 1)) AS gx(tx),
           LATERAL unnest(range(CAST(floor((list_min(ys) + 90.0) / {S!r}) AS BIGINT),
                          CAST(floor((list_max(ys) + 90.0) / {S!r}) AS BIGINT) + 1)) AS gy(ty)
    ),
    {", ".join(passes)},
    tc_area AS (
      SELECT poly_id, tx, ty, len(ring) AS nvert, ring,
             abs(0.5 * (({s1}) - ({s2}))) AS area
      FROM {prev} WHERE len(ring) >= 3
    )
    SELECT poly_id, tx, ty, CAST(nvert AS INT) AS nvert,
           list_transform(ring, v -> v.x) AS xs,
           list_transform(ring, v -> v.y) AS ys,
           area
    FROM tc_area WHERE area > 0.0"""
