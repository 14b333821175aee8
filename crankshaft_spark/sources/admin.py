"""Deterministic synthetic admin polygons (version: adminv1).

A perturbed-grid partition of the lon/lat plane: grid nodes every 20 deg are
jittered by +/-4 deg (closed-form integer arithmetic), and each grid square
becomes one convex quadrilateral.  The quads tile the plane with no
gaps/overlaps, so every page geocode falls in exactly one polygon;
convexity is asserted at generation time because the PIP interior-cell
shortcut relies on it.  Points ON a vertex latitude are possible (the
perturbation grid has 0.005 granularity, so half the jittered vertices land
on 2-decimal values) and are handled by the half-open crossing rule, which
both engines apply with identical operand order — NOT by any
no-coincidence guarantee.

Plays the role of the reference's fixture polygon layers
(/root/reference/src/pg/test/fixtures/getis_data.sql — stl_hom multipolygons)
and of the admin/tile polygon layer in the BASELINE.json north star.  Pure
data: the same vertex doubles feed the Spark broadcast index, the numpy
ray-caster, and the DuckDB oracle SQL literal.
"""

from __future__ import annotations

from functools import lru_cache

ADMIN_VERSION = "adminv1"

_NI, _NJ = 18, 9          # polygons: 18 x 9 = 162
_STEP = 20.0


def _pert(i: int, j: int, salt: int) -> float:
    m = ((i * 73856093) ^ (j * 19349663) ^ (salt * 83492791)) % 1601
    return (m - 800) / 200.0 + 0.005   # in [-3.995, 4.005]


@lru_cache(maxsize=1)
def _nodes() -> dict[tuple[int, int], tuple[float, float]]:
    out = {}
    for i in range(_NI + 1):
        for j in range(_NJ + 1):
            out[(i, j)] = (
                -180.0 + i * _STEP + _pert(i, j, 1),
                -90.0 + j * _STEP + _pert(i, j, 2),
            )
    return out


def _convex(ring: list[tuple[float, float]]) -> bool:
    """Orientation-tolerant convexity — SAME degenerate-case semantics as
    operators.pip._is_convex (collinear triples, cr == 0, are accepted
    under either orientation), so the generation-time assert and the
    PIP interior-cell shortcut can't drift apart."""
    n = len(ring)
    crs = []
    for k in range(n):
        x0, y0 = ring[k]
        x1, y1 = ring[(k + 1) % n]
        x2, y2 = ring[(k + 2) % n]
        crs.append((x1 - x0) * (y2 - y1) - (y1 - y0) * (x2 - x1))
    return all(c >= 0 for c in crs) or all(c <= 0 for c in crs)


@lru_cache(maxsize=1)
def admin_polygons() -> list[tuple[int, list[tuple[float, float]]]]:
    """[(poly_id, ccw ring of 4 (lon, lat) vertices)] — pinned data."""
    nd = _nodes()
    polys = []
    for i in range(_NI):
        for j in range(_NJ):
            ring = [nd[(i, j)], nd[(i + 1, j)], nd[(i + 1, j + 1)],
                    nd[(i, j + 1)]]
            assert _convex(ring), f"non-convex quad {(i, j)}"
            polys.append((i * 100 + j, ring))
    return polys


def admin_edges_sql() -> str:
    """VALUES literal of polygon edges for the DuckDB oracle ray-caster.

    Coordinates are CAST to DOUBLE: DuckDB types bare VALUES float
    literals DECIMAL (CLAUDE.md), which would make the oracle's crossing
    arithmetic decimal-exact instead of IEEE-double and break the
    bit-identical contract with the engine's ray cast.  repr() emits the
    shortest round-tripping decimal, so DECIMAL-parse -> DOUBLE-cast
    recovers the exact source double."""
    rows = []
    for pid, ring in admin_polygons():
        for k in range(len(ring)):
            x1, y1 = ring[k]
            x2, y2 = ring[(k + 1) % len(ring)]
            rows.append(f"({pid}, {x1!r}, {y1!r}, {x2!r}, {y2!r})")
    return (
        "(SELECT poly_id, CAST(ex1 AS DOUBLE) AS ex1,"
        " CAST(ey1 AS DOUBLE) AS ey1, CAST(ex2 AS DOUBLE) AS ex2,"
        " CAST(ey2 AS DOUBLE) AS ey2 FROM (VALUES " + ", ".join(rows)
        + ") AS e(poly_id, ex1, ey1, ex2, ey2))"
    )


def pip_oracle_sql(points_cte: str, id_col: str = "page_id",
                   lon: str = "lon", lat: str = "lat") -> str:
    """Brute-force ray-cast PIP in ANSI SQL (DuckDB) over the edge literal.

    Same half-open crossing rule, same operand order as the engine's numpy
    refiner — IEEE doubles make the two bit-identical.
    """
    return f"""
    SELECT p.{id_col}, e.poly_id
    FROM ({points_cte}) p JOIN {admin_edges_sql()} e
      ON ((e.ey1 > p.{lat}) <> (e.ey2 > p.{lat})
          AND p.{lon} < (e.ex2 - e.ex1) * (p.{lat} - e.ey1)
                        / (e.ey2 - e.ey1) + e.ex1)
    GROUP BY p.{id_col}, e.poly_id
    HAVING count(*) % 2 = 1
    """
