"""Spatial interpolation (CDB_SpatialInterpolation) — NN-average and IDW.

Reference: /root/reference/src/pg/sql/08_interpolation.sql
  * method 0 (:59-68): average of the p1 nearest sample values
  * method 2 (:101-131): inverse-distance weighting, optional neighbor
    limit p1 and decay power p2 — est = Σ(v/dᵖ) / Σ(1/dᵖ)
  * method 1 (:71-96): barycentric on a Delaunay TIN of the samples —
    implemented below with the pure-numpy Bowyer-Watson kernel; the TIN is
    built once from the bounded sample set and broadcast ("Delaunay stuff
    performed just ONCE!!", 19_contour.sql:43-50), targets stream through
    mapInPandas.

Both implemented methods reduce to the bipartite kNN join + one aggregation,
so they inherit the scale properties of the kNN core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crankshaft_spark.functions.spread import spread_groups
from crankshaft_spark.operators.knn import knn_join


def interpolate_nn(
    targets: DataFrame,
    samples: DataFrame,
    *,
    value_col: str = "value",
    num_neighbors: int = 5,
    cell_size: float = 1.0,
) -> DataFrame:
    """(id, est) — mean of the num_neighbors nearest sample values."""
    edges = knn_join(targets, samples, k=num_neighbors, cell_size=cell_size)
    vals = samples.select(F.col("id").alias("nbr"), F.col(value_col).alias("_v"))
    return (
        edges.join(vals, "nbr").groupBy("id").agg(F.avg("_v").alias("est"))
    )


def interpolate_idw(
    targets: DataFrame,
    samples: DataFrame,
    *,
    value_col: str = "value",
    num_neighbors: int = 8,
    power: float = 2.0,
    cell_size: float = 1.0,
) -> DataFrame:
    """(id, est) — inverse-distance-weighted estimate over the
    num_neighbors nearest samples; est = Σ(v/dᵖ)/Σ(1/dᵖ) with d the planar
    distance.  Exact-zero distances are handled by taking the sample value
    directly (the limit of the weight as d→0)."""
    edges = knn_join(targets, samples, k=num_neighbors, cell_size=cell_size)
    vals = samples.select(F.col("id").alias("nbr"), F.col(value_col).alias("_v"))
    j = edges.join(vals, "nbr").withColumn("_d", F.sqrt(F.col("d2")))
    wgt = F.lit(1.0) / F.pow(F.col("_d"), F.lit(power))
    agg = j.groupBy("id").agg(
        F.sum(F.when(F.col("_d") > 0, F.col("_v") * wgt).otherwise(0.0)).alias("_num"),
        F.sum(F.when(F.col("_d") > 0, wgt).otherwise(0.0)).alias("_den"),
        F.max(F.when(F.col("_d") == 0, F.col("_v"))).alias("_exact"),
    )
    return agg.select(
        "id",
        F.coalesce(F.col("_exact"), F.col("_num") / F.col("_den")).alias("est"),
    )


def _nan_to_null(est):
    """float array → object list with None for NaN: outside-hull targets
    surface as SQL NULL (what the reference's LEFT JOIN produces and what
    the DuckDB oracle emits), not as a double NaN."""
    import numpy as np

    return [None if np.isnan(v) else float(v) for v in est]


def _bary_eval(pts, vals, tris, px, py):
    """Vectorized containing-triangle lookup + barycentric blend.
    Returns est array with NaN for points outside the TIN hull.

    When a point lies within eps of an edge, BOTH adjacent triangles pass
    the inside test; the winner is the triangle with the least SORTED
    vertex-index triple — a property of the triangle set, not of the
    Bowyer-Watson construction order, so the DuckDB oracle can reproduce
    the pick without replaying list order."""
    import numpy as np

    a = pts[tris[:, 0]]
    b = pts[tris[:, 1]]
    c = pts[tris[:, 2]]
    det = (b[:, 1] - c[:, 1]) * (a[:, 0] - c[:, 0]) + \
          (c[:, 0] - b[:, 0]) * (a[:, 1] - c[:, 1])
    det = np.where(np.abs(det) < 1e-300, 1e-300, det)
    # barycentric coords of every point in every triangle: (n, m)
    w1 = ((b[:, 1] - c[:, 1])[None, :] * (px[:, None] - c[:, 0][None, :])
          + (c[:, 0] - b[:, 0])[None, :] * (py[:, None] - c[:, 1][None, :])) / det[None, :]
    w2 = ((c[:, 1] - a[:, 1])[None, :] * (px[:, None] - c[:, 0][None, :])
          + (a[:, 0] - c[:, 0])[None, :] * (py[:, None] - c[:, 1][None, :])) / det[None, :]
    w3 = 1.0 - w1 - w2
    eps = -1e-9
    inside = (w1 >= eps) & (w2 >= eps) & (w3 >= eps)
    est = np.full(len(px), np.nan)
    hit = inside.any(axis=1)
    skey = np.sort(tris, axis=1)
    order = np.lexsort((skey[:, 2], skey[:, 1], skey[:, 0]))
    rank = np.empty(len(tris), dtype=np.int64)
    rank[order] = np.arange(len(tris))
    ti = np.argmin(np.where(inside, rank[None, :], len(tris)), axis=1)
    v = (w1[np.arange(len(px)), ti] * vals[tris[ti, 0]]
         + w2[np.arange(len(px)), ti] * vals[tris[ti, 1]]
         + w3[np.arange(len(px)), ti] * vals[tris[ti, 2]])
    est[hit] = v[hit]
    return est


def interpolate_barycentric(
    targets: DataFrame,
    samples: DataFrame,
    *,
    value_col: str = "value",
    tile_size: float | str | None = None,
) -> DataFrame:
    """(id, est) — barycentric interpolation on the Delaunay TIN of the
    samples; targets outside the TIN hull get NULL (the reference's
    containing-triangle lookup, 08_interpolation.sql:71-96).

    ``tile_size=None`` (reference-parity path): ``samples`` is a bounded
    set (the reference takes it as a SQL array); it is collected once,
    triangulated on the driver, and broadcast — O(n²) triangulation, only
    for genuinely bounded sample arrays.

    ``tile_size`` set (scale path): targets are grouped per grid tile and
    each tile triangulates only the samples of its 3×3 tile neighborhood
    inside ``applyInPandas`` — the Voronoi/tile pattern.  The one-tile pad
    makes the local TIN agree with the global one wherever the containing
    triangle's vertices fall within a tile of the target (everywhere, at
    sample densities ≫ 1/tile); targets whose padded neighborhood has < 3
    samples get NULL.  Per-group work is bounded by the tile population, so
    the O(n²) Bowyer–Watson never sees the full sample set.
    """
    import numpy as np
    import pandas as pd

    from crankshaft_spark.functions.geom import delaunay

    schema = "id long, est double"

    if tile_size == "auto":
        # size tiles so a padded 3x3 neighborhood holds ~TARGET samples:
        # keeps per-group Bowyer-Watson cost flat as density scales, and
        # keeps sparse inputs from fragmenting into sample-starved tiles
        TARGET = 64.0
        ext = samples.agg(
            F.min("x"), F.max("x"), F.min("y"), F.max("y"), F.count("*")
        ).collect()[0]
        n = ext[4]
        area = max((ext[1] - ext[0]) * (ext[3] - ext[2]), 1e-12)
        if n < 500:
            tile_size = None          # bounded set: driver-global path
        else:
            tile_size = float(np.sqrt(TARGET * area / (9.0 * n)))

    if tile_size is None:
        # sort: collect order depends on the input's partitioning, and the
        # triangulation must not (see the tiled path's pin below)
        rows = sorted(
            samples.select("x", "y", value_col).collect(),
            key=lambda r: (r[0], r[1], r[2]),
        )
        pts = np.array([[r[0], r[1]] for r in rows], dtype=float)
        vals = np.array([r[2] for r in rows], dtype=float)
        tris = delaunay(pts)
        spark = targets.sparkSession
        bc = spark.sparkContext.broadcast((pts, vals, tris))

        def run(pdfs):
            bpts, bvals, btris = bc.value
            for pdf in pdfs:
                est = _bary_eval(bpts, bvals, btris,
                                 pdf["x"].to_numpy(), pdf["y"].to_numpy())
                yield pd.DataFrame({"id": pdf["id"], "est": _nan_to_null(est)})

        return targets.select("id", "x", "y").mapInPandas(run, schema=schema)

    from crankshaft_spark.functions.cells import cell_expr, ring_cells_expr

    tgt = targets.select(
        F.col("id"), F.col("x").cast("double").alias("x"),
        F.col("y").cast("double").alias("y"),
        cell_expr(F.col("x"), F.col("y"), tile_size).alias("tcell"),
        F.lit(0).alias("role"), F.lit(0.0).alias("v"),
    )
    smp = samples.select(
        F.lit(-1).cast("long").alias("id"),
        F.col("x").cast("double").alias("x"),
        F.col("y").cast("double").alias("y"),
        F.explode(
            ring_cells_expr(cell_expr(F.col("x"), F.col("y"), tile_size), 1)
        ).alias("tcell"),
        F.lit(1).alias("role"),
        F.col(value_col).cast("double").alias("v"),
    )

    def run_tile(key, pdf):
        t = pdf[pdf["role"] == 0]
        if len(t) == 0:
            return pd.DataFrame({"id": [], "est": []}).astype(
                {"id": "int64", "est": "float64"}
            )
        # shuffle delivery order is partitioning-dependent; Bowyer-Watson
        # insertion order (and the min-vertex-key triangle pick for
        # cocircular cases) must not be — pin it by (x, y, value), the
        # same ORDER BY the DuckDB oracle's dl_pts uses
        s = pdf[pdf["role"] == 1].sort_values(["x", "y", "v"],
                                              kind="mergesort")
        if len(s) < 3:
            return pd.DataFrame({"id": t["id"], "est": None})
        pts = s[["x", "y"]].to_numpy(dtype=float)
        vals = s["v"].to_numpy(dtype=float)
        tris = delaunay(pts)
        if len(tris) == 0:
            return pd.DataFrame({"id": t["id"], "est": None})
        est = _bary_eval(pts, vals, tris,
                         t["x"].to_numpy(), t["y"].to_numpy())
        return pd.DataFrame({"id": t["id"], "est": _nan_to_null(est)})

    return (
        spread_groups(tgt.unionByName(smp), "tcell")
        .groupBy("tcell")
        .applyInPandas(run_tile, schema=schema)
    )


def interp_bary_oracle_sql(samples_sql: str, targets_sql: str) -> str:
    """DuckDB mirror of ``interpolate_barycentric(tile_size='auto')`` for
    the tiled branch (n ≥ 500) → (id, est) with est rounded to 6dp.

    ``samples_sql`` must yield (x, y, value); ``targets_sql`` (id, x, y).
    Mirrors, float-op for float-op:

    * the auto tile size  sqrt(64·area / (9·n))  over exact min/max/count;
    * the cellv1 tile key and the samples' 3×3 neighborhood explode;
    * per-tile Bowyer-Watson via geometry._delaunay_oracle_ctes (grp =
      tile, insertion order = the operator's (x, y, value) pin);
    * _bary_eval's barycentric algebra (same operand order), the −1e-9
      inside tolerance, and the min-sorted-vertex-triple pick among
      containing triangles.

    Targets in tiles with < 3 samples, in tiles whose points are all
    collinear, or outside the local TIN hull produce NULL — exactly the
    operator's None channel.
    """
    from crankshaft_spark.functions.cells import CELL_M
    from crankshaft_spark.operators.geometry import _delaunay_oracle_ctes

    def cell(x: str, y: str) -> str:
        return (f"(CAST(floor(({x} + 180.0) / ts.tsz) AS BIGINT) "
                f"* {CELL_M} + CAST(floor(({y} + 90.0) / ts.tsz) AS BIGINT))")

    det = ("((vb.y - vc.y) * (va.x - vc.x) + (vc.x - vb.x) * (va.y - vc.y))")
    detg = f"(CASE WHEN abs({det}) < 1e-300 THEN 1e-300 ELSE {det} END)"
    w1 = (f"(((vb.y - vc.y) * (t.x - vc.x) + (vc.x - vb.x) * (t.y - vc.y))"
          f" / {detg})")
    w2 = (f"(((vc.y - va.y) * (t.x - vc.x) + (va.x - vc.x) * (t.y - vc.y))"
          f" / {detg})")
    s0 = "least(f.v0, least(f.v1, f.v2))"
    s2 = "greatest(f.v0, greatest(f.v1, f.v2))"
    s1 = f"(f.v0 + f.v1 + f.v2 - {s0} - {s2})"
    dl_points = ("SELECT m.tcell AS grp, m.x, m.y, m.value FROM smp m "
                 "WHERE m.tcell IN (SELECT DISTINCT tcell FROM tgt)")
    return f"""WITH RECURSIVE ib_s AS ({samples_sql}),
    ib_t AS ({targets_sql}),
    ts AS (
      SELECT sqrt((64.0 * greatest((max(x) - min(x)) * (max(y) - min(y)),
                                   1e-12)) / (9.0 * count(*))) AS tsz
      FROM ib_s
    ),
    tgt AS (SELECT t.id, t.x, t.y, {cell('t.x', 't.y')} AS tcell
            FROM ib_t t, ts),
    smp AS (
      SELECT {cell('s.x', 's.y')} + o.dx * {CELL_M} + o.dy AS tcell,
             s.x, s.y, s.value
      FROM ib_s s, ts,
           (SELECT a.r AS dx, b.r AS dy
            FROM (SELECT unnest(range(-1, 2)) AS r) a,
                 (SELECT unnest(range(-1, 2)) AS r) b) o
    ),
    {_delaunay_oracle_ctes(dl_points)},
    bar AS (
      SELECT t.id,
             ({w1} * va.value + {w2} * vb.value
              + (1.0 - {w1} - {w2}) * vc.value) AS est,
             row_number() OVER (
               PARTITION BY t.id ORDER BY {s0}, {s1}, {s2}) AS rk
      FROM tgt t
      JOIN dl_final f ON f.grp = t.tcell
      JOIN dl_pts va ON va.grp = f.grp AND va.idx = f.v0
      JOIN dl_pts vb ON vb.grp = f.grp AND vb.idx = f.v1
      JOIN dl_pts vc ON vc.grp = f.grp AND vc.idx = f.v2
      WHERE {w1} >= -1e-9 AND {w2} >= -1e-9
        AND (1.0 - {w1} - {w2}) >= -1e-9
    )
    SELECT t.id, round(b.est, 6) AS est
    FROM tgt t LEFT JOIN (SELECT id, est FROM bar WHERE rk = 1) b
      ON b.id = t.id"""
