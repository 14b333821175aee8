"""Deterministic planar cell index (engine version: cellv1).

This is the engine's spatial join key — the role H3 plays in the design
brief.  We use a pinned, versioned rectangular grid in lon/lat space rather
than a hex grid because (a) no h3 wheel is available in the build
environment, and (b) every cell assignment must be *bit-identical* between
the Spark plans and the DuckDB oracle SQL the correctness harness runs, which
a closed-form integer encoding guarantees:

    ix   = floor((lon + 180) / size)
    iy   = floor((lat +  90) / size)
    cell = ix * 2^32 + iy          (BIGINT, non-negative for lon/lat domain)

The reference's analogue is the web-mercator grid of
``CDB_RectangleGrid`` (/root/reference/src/pg/sql/cdb_utils.sql:19-96) and
the bbox-prefilter join idiom (``&&`` then exact refinement,
/root/reference/src/pg/sql/20_overlap_sum.sql:32).  k-ring expansion over
this grid replaces the PostGIS GiST ``<->`` index scan used for kNN
(/root/reference/src/py/crankshaft/crankshaft/pysal_utils/pysal_utils.py:153).

Tile assignments are part of the engine contract: changing this encoding is
a breaking version bump (cellv1).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: multiplier packing (ix, iy) into one BIGINT; 2^32 leaves iy untouched.
CELL_M = 4294967296

CELL_VERSION = "cellv1"


def cell_expr(lon: Column, lat: Column, size: float) -> Column:
    """Cell id column for points at the given grid resolution (degrees)."""
    ix = F.floor((lon + F.lit(180.0)) / F.lit(size)).cast("long")
    iy = F.floor((lat + F.lit(90.0)) / F.lit(size)).cast("long")
    return (ix * F.lit(CELL_M) + iy).alias("cell")


def cell_sql(lon_expr: str, lat_expr: str, size: float) -> str:
    """The same cell id as ANSI SQL text (runs identically on DuckDB).

    Used by the oracle harness: both engines evaluate the identical integer
    arithmetic, so tile assignments can be compared row-for-row.
    """
    return (
        f"(CAST(floor(({lon_expr} + 180.0) / {size!r}) AS BIGINT) * {CELL_M} "
        f"+ CAST(floor(({lat_expr} + 90.0) / {size!r}) AS BIGINT))"
    )


def with_cell(
    df: DataFrame, lon: str = "x", lat: str = "y", size: float = 1.0,
    out: str = "cell",
) -> DataFrame:
    return df.withColumn(out, cell_expr(F.col(lon), F.col(lat), size))


def quadkey_expr(cell_col: str, *, levels: int) -> Column:
    """Quadtree path string of a cellv1 cell — the Bing-maps quadkey
    convention (digit = 2*y_bit + x_bit, most-significant level first,
    ``levels`` digits) applied to this engine's grid instead of the
    web-mercator XYZ scheme (public reference: the quadkey tile-naming
    system used by slippy-map servers; reference analogue: the per-zoom
    CDB_RectangleGrid keys, /root/reference/src/pg/sql/cdb_utils.sql:19-96,
    which have no stringly tile-path form).

    The property tile serving needs: ANCESTORS SHARE PREFIXES — the
    quadkey of a density_pyramid parent cell (size × 2^k) is the child's
    quadkey with the last k digits dropped, so tile containment is
    ``qk LIKE 'prefix%'`` and a zoom-z tile's contents are one prefix
    range scan.  Pure BIGINT/string algebra (codegen, oracle-exact).
    Cells outside the level-``levels`` quadtree domain (ix or iy >=
    2^levels, or a negative id) fail loudly rather than truncating high
    bits into a wrong-but-plausible key.  The digit extraction IS
    tile_quadkey_expr over the unpacked (ix, iy) — one implementation of
    the Bing digit math, two entry points (CASE WHEN evaluates lazily,
    so the raise fires only on out-of-domain rows)."""
    lim = 1 << levels
    ix = F.expr(f"{cell_col} div {CELL_M}")
    iy = F.expr(f"{cell_col} % {CELL_M}")
    ok = F.expr(f"{cell_col} >= 0") & (ix < lim) & (iy < lim)
    return F.when(ok, tile_quadkey_expr(ix, iy, levels)).otherwise(
        F.expr(f"CAST(raise_error('quadkey: cell outside the"
               f" level-{levels} quadtree domain') AS STRING)"))


def quadkey_sql(cell_expr_str: str, levels: int) -> str:
    """The same quadkey as ANSI SQL text for the DuckDB oracle (integer
    division spelled ``//``); assumes domain-valid cells."""
    ix = f"(({cell_expr_str}) // {CELL_M})"
    iy = f"(({cell_expr_str}) % {CELL_M})"
    parts = " || ".join(
        f"CAST((({iy} // {1 << (levels - 1 - k)}) % 2) * 2"
        f" + (({ix} // {1 << (levels - 1 - k)}) % 2) AS VARCHAR)"
        for k in range(levels))
    return f"({parts})"


#: web-mercator latitude bound: atan(sinh(pi)) in degrees.  Points beyond
#: it clamp to the edge tile row (the slippy-map convention).
MERCATOR_LAT_MAX = 85.05112877980659


def tile_xyz_expr(lon: Column, lat: Column, z: int) -> Column:
    """``struct(tx, ty)`` — standard web-mercator slippy-map tile indices
    at zoom ``z`` (the XYZ scheme of CARTO/OSM tile servers; the scheme
    CDB_RectangleGrid callers tile against, cdb_utils.sql:19-96):

        tx = floor((lon + 180)/360 · 2^z)
        ty = floor((1 − asinh(tan(lat_r))/π)/2 · 2^z)

    both clamped to [0, 2^z−1] (lat beyond ±85.05° lands in the edge
    row, lon = +180 in the last column).  All JVM codegen — but the
    Mercator y is TRANSCENDENTAL, so tile indices are NOT oracle-checked
    (CLAUDE.md float-parity rule: libm tan/log may differ in the last ulp
    across engines, and a floor sitting exactly on a tile boundary would
    flip).  pytest pins the formula against a numpy replay on points
    strictly inside tiles plus the clamp rows; the cellv1 grid +
    quadkey_expr remain the oracle-exact tiling path."""
    n = 1 << z
    lat_r = F.radians(lat)
    merc = (1 - F.asinh(F.tan(lat_r)) / F.lit(math.pi)) / 2
    tx = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * n).cast("long")
    ty = F.floor(merc * n).cast("long")
    clamp = lambda c: F.greatest(F.lit(0).cast("long"),  # noqa: E731
                                 F.least(F.lit(n - 1).cast("long"), c))
    return F.struct(clamp(tx).alias("tx"), clamp(ty).alias("ty"))


def tile_quadkey_expr(tx: Column, ty: Column, z: int) -> Column:
    """Quadkey string of an XYZ slippy tile (same digit convention as
    quadkey_expr; z digits).  Pure integer/string algebra — oracle-exact
    given integer tile indices."""
    digits = [
        (F.shiftright(ty, j).bitwiseAND(F.lit(1)) * 2
         + F.shiftright(tx, j).bitwiseAND(F.lit(1))).cast("string")
        for j in range(z - 1, -1, -1)]
    return F.concat(*digits)


def tile_bounds_expr(tx: Column, ty: Column, z: int) -> Column:
    """``struct(west, south, east, north)`` — lon/lat envelope of an XYZ
    slippy tile: the vector side of raster↔vector conversion (a zoom-z
    density raster cell becomes this polygon envelope; inverse Mercator
    lat = degrees(atan(sinh(π·(1 − 2y/2^z))))).  Transcendental like
    tile_xyz_expr, so pytest-pinned (round trip: every tile's center maps
    back to the same tile), not oracle-checked."""
    n = 1 << z
    lat = lambda yy: F.degrees(  # noqa: E731
        F.atan(F.sinh(F.lit(math.pi) * (1 - yy * F.lit(2.0 / n)))))
    return F.struct(
        (tx.cast("double") * F.lit(360.0 / n) - 180.0).alias("west"),
        lat((ty + 1).cast("double")).alias("south"),
        ((tx + 1).cast("double") * F.lit(360.0 / n) - 180.0).alias("east"),
        lat(ty.cast("double")).alias("north"))


def ring_cells_expr(cell: Column, ring) -> Column:
    """Array of all cell ids within Chebyshev distance ``ring`` of ``cell``.

    cell + dx*2^32 + dy — pure Spark SQL, no Python.  Guarantee used by the
    kNN join: any point outside the ring block is at planar distance
    > ring*size from every point in the center cell.

    ``ring`` may be a Python int (constant offset array, the codegen-
    friendly form) or a Column for per-row rings (nested sequence/
    transform — same offset math, one implementation of the cell-ring
    contract).  PRECONDITION for the Column form: ring must be non-null —
    sequence(-r, r) of a NULL r yields a NULL array, so a downstream
    explode silently emits ZERO rows for that input row (it vanishes
    from candidate joins instead of erroring); coalesce or filter NULL
    radii upstream.
    """
    if isinstance(ring, int):
        offsets = [
            dx * CELL_M + dy
            for dx in range(-ring, ring + 1)
            for dy in range(-ring, ring + 1)
        ]
        return F.array(*[cell + F.lit(o) for o in offsets])
    r = ring.cast("long")
    return F.flatten(
        F.transform(
            F.sequence(-r, r),
            lambda dx: F.transform(
                F.sequence(-r, r),
                lambda dy: cell + dx * F.lit(CELL_M) + dy,
            ),
        )
    )
