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


# --------------------------------------------------------------- geohash ----
# The classic public base-32 geohash (Niemeyer 2008; the PostGIS
# ST_GeoHash surface next to CDB_RectangleGrid tiling,
# /root/reference/src/pg/sql/cdb_utils.sql:19-96 being the grid the
# reference tiles against).  Interop key: unlike cellv1/quadkey this is
# the EXTERNAL convention other systems emit, so a user can join our
# grids against third-party geohashed data.  Same ancestor-prefix
# property as quadkey (prefixes nest: floor(u·2^b) == floor(u·2^b') >>
# (b'−b)), so tile containment is a LIKE-prefix scan here too.  Pure
# integer/float-pinned arithmetic — fully oracle-exact (contrast the
# transcendental XYZ tiles above).

GEOHASH_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _gh_bits(precision: int) -> tuple:
    if not 1 <= precision <= 12:
        raise ValueError(
            f"geohash: precision must be in [1, 12], got {precision}")
    nbits = 5 * precision
    return nbits, (nbits + 1) // 2, nbits // 2


def geohash_code_expr(lon: Column, lat: Column, precision: int) -> Column:
    """Interleaved 5·precision-bit geohash code as BIGINT — the groupBy /
    join key form (one quantize+interleave per point; render the string
    from the code on the already-aggregated cell table, never per row).
    Bit j (MSB first) is lon for even j, lat for odd — the standard
    geohash interleave.  lon=+180 / lat=+90 clamp into the last column /
    row (the tile_xyz_expr convention); out-of-domain coordinates fail
    loudly like quadkey_expr."""
    nbits, blon, blat = _gh_bits(precision)
    plon, plat = 1 << blon, 1 << blat
    lonq = F.least(
        F.floor(((lon + F.lit(180.0)) / F.lit(360.0))
                * F.lit(float(plon))).cast("long"),
        F.lit(plon - 1).cast("long"))
    latq = F.least(
        F.floor(((lat + F.lit(90.0)) / F.lit(180.0))
                * F.lit(float(plat))).cast("long"),
        F.lit(plat - 1).cast("long"))
    code = F.lit(0).cast("long")
    for j in range(nbits):
        if j % 2 == 0:
            bit = F.shiftright(lonq, blon - 1 - j // 2)
        else:
            bit = F.shiftright(latq, blat - 1 - (j - 1) // 2)
        code = code + F.shiftleft(bit.bitwiseAND(F.lit(1)).cast("long"),
                                  nbits - 1 - j)
    ok = ((lon >= F.lit(-180.0)) & (lon <= F.lit(180.0))
          & (lat >= F.lit(-90.0)) & (lat <= F.lit(90.0)))
    return F.when(ok, code).otherwise(F.expr(
        "CAST(raise_error('geohash: lon/lat outside domain') AS BIGINT)"))


def geohash_chars_expr(code: Column, precision: int) -> Column:
    """Base-32 geohash string of a ``geohash_code_expr`` code (5 bits per
    character, MSB first)."""
    nbits, _, _ = _gh_bits(precision)
    alpha = F.array(*[F.lit(c) for c in GEOHASH_B32])
    chars = [
        F.element_at(
            alpha,
            F.shiftright(code, nbits - 5 * (k + 1))
            .bitwiseAND(F.lit(31)).cast("int") + F.lit(1))
        for k in range(precision)]
    return F.concat(*chars)


def geohash_expr(lon: Column, lat: Column, precision: int) -> Column:
    """Convenience: base-32 geohash string straight from coordinates."""
    return geohash_chars_expr(
        geohash_code_expr(lon, lat, precision), precision)


def geohash_bounds_expr(code: Column, precision: int) -> Column:
    """``struct(west, south, east, north)`` — lon/lat envelope of a
    geohash cell from its BIGINT code (the raster→vector inverse, like
    tile_bounds_expr but pure pinned arithmetic: (q · 360.0) / 2^blon −
    180.0, one operand order)."""
    nbits, blon, blat = _gh_bits(precision)
    lonq = F.lit(0).cast("long")
    latq = F.lit(0).cast("long")
    for j in range(nbits):
        bit = F.shiftright(code, nbits - 1 - j).bitwiseAND(F.lit(1))
        if j % 2 == 0:
            lonq = lonq + F.shiftleft(bit.cast("long"), blon - 1 - j // 2)
        else:
            latq = latq + F.shiftleft(bit.cast("long"),
                                      blat - 1 - (j - 1) // 2)
    plon, plat = float(1 << blon), float(1 << blat)
    d = lambda c: c.cast("double")  # noqa: E731
    return F.struct(
        ((d(lonq) * F.lit(360.0)) / F.lit(plon) - F.lit(180.0))
        .alias("west"),
        ((d(latq) * F.lit(180.0)) / F.lit(plat) - F.lit(90.0))
        .alias("south"),
        ((d(lonq + 1) * F.lit(360.0)) / F.lit(plon) - F.lit(180.0))
        .alias("east"),
        ((d(latq + 1) * F.lit(180.0)) / F.lit(plat) - F.lit(90.0))
        .alias("north"))


def geohash_code_sql(lon_expr: str, lat_expr: str, precision: int) -> str:
    """The interleaved code as DuckDB SQL — IDENTICAL arithmetic (same
    operand order, `//` for the bit extraction) for the oracle."""
    nbits, blon, blat = _gh_bits(precision)
    plon, plat = 1 << blon, 1 << blat
    lonq = (f"LEAST(CAST(floor((({lon_expr}) + 180.0) / 360.0 "
            f"* {float(plon)!r}) AS BIGINT), {plon - 1})")
    latq = (f"LEAST(CAST(floor((({lat_expr}) + 90.0) / 180.0 "
            f"* {float(plat)!r}) AS BIGINT), {plat - 1})")
    terms = []
    for j in range(nbits):
        if j % 2 == 0:
            bit = f"(({lonq}) // {1 << (blon - 1 - j // 2)}) % 2"
        else:
            bit = f"(({latq}) // {1 << (blat - 1 - (j - 1) // 2)}) % 2"
        terms.append(f"(({bit}) * {1 << (nbits - 1 - j)})")
    return "(" + " + ".join(terms) + ")"


def geohash_chars_sql(code_expr: str, precision: int) -> str:
    """Base-32 rendering of a code expression as DuckDB SQL."""
    nbits, _, _ = _gh_bits(precision)
    parts = " || ".join(
        f"substring('{GEOHASH_B32}', CAST((({code_expr}) "
        f"// {1 << (nbits - 5 * (k + 1))}) % 32 AS INTEGER) + 1, 1)"
        for k in range(precision))
    return f"({parts})"


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


# --------------------------------------------------------------- hex cells --
# The H3-flavored face of the index (SURVEY §2.4: "own deterministic
# hex/Z-order cell implementation" when no h3 wheel exists).  Flat-top
# axial hexagons in lon/lat space with exact cube rounding — the standard
# axial-coordinate construction (public reference: the hexagonal-grids
# literature popularized by Red Blob Games; H3's gnomonic icosahedron
# projection is deliberately NOT replicated — it needs per-face spherical
# trig that can't be replayed bit-for-bit in the DuckDB oracle).  Every
# step is closed-form double arithmetic written in ONE operand order, so
# Spark and DuckDB assign identical cells (the cellv1 parity contract,
# hexv1 here).  Hexagons tile without the rectangular grid's corner
# ambiguity: each point has a UNIQUE nearest hex center (ties measure
# zero and resolve by the pinned comparison order), which is what the
# density/tiling surface wants from an H3-style key.

#: circumradius multipliers (flat-top axial transform), pinned doubles.
_HEX_C23 = 2.0 / 3.0
_HEX_C13 = 1.0 / 3.0
#: ≈sqrt(3)/3 and sqrt(3), PINNED literals (1 ulp from the quotient form
#: is fine — both engines must use the SAME double, not a "truer" one;
#: the CLAUDE.md operand-order rule applied to constants).
_HEX_S33 = 0.5773502691896258
_HEX_S3 = 1.7320508075688772

#: axial offset keeping packed (q, r) non-negative: |q| < 2^21 covers
#: sizes down to ~1e-4 degrees over the lon/lat domain.
HEX_OFF = 1 << 21

HEX_VERSION = "hexv1"


def hex_cell_expr(lon: Column, lat: Column, size: float) -> Column:
    """hexv1 cell id for points: flat-top axial (q, r) at circumradius
    ``size`` degrees, cube-rounded, packed ``(q+OFF)*2^32 + (r+OFF)``.

    Axial transform: q_f = (x·2/3)/R,  r_f = (x·(−1/3) + y·(√3/3))/R.
    Cube rounding (x=q, z=r, y=−x−z): round each via floor(v+0.5), then
    repair the axis with the largest rounding error so x+y+z = 0 —
    exactly the nearest-hex-center assignment.  floor/abs/compare on
    identically-derived doubles are engine-exact, so the DuckDB mirror
    (``hex_cell_sql``) reproduces every id bit-for-bit."""
    qf = (lon * F.lit(_HEX_C23)) / F.lit(size)
    rf = (lon * F.lit(-_HEX_C13) + lat * F.lit(_HEX_S33)) / F.lit(size)
    sf = -qf - rf
    rx = F.floor(qf + F.lit(0.5)).cast("double")
    ry = F.floor(sf + F.lit(0.5)).cast("double")
    rz = F.floor(rf + F.lit(0.5)).cast("double")
    dx = F.abs(rx - qf)
    dy = F.abs(ry - sf)
    dz = F.abs(rz - rf)
    fix_x = (dx > dy) & (dx > dz)
    q = F.when(fix_x, -ry - rz).otherwise(rx)
    r = (F.when(fix_x, rz)
          .when(dy > dz, rz)
          .otherwise(-rx - ry))
    # loud domain guard (the module's cellv1 contract): |q| or |r|
    # reaching HEX_OFF would blend sign bits across the pack — raise
    # instead of emitting a wrong-but-plausible id (caller-chosen tiny
    # ``size`` over the full lon/lat domain is the way to get here)
    ok = (F.abs(q) < F.lit(float(HEX_OFF))) & \
         (F.abs(r) < F.lit(float(HEX_OFF)))
    packed = ((q + F.lit(float(HEX_OFF))).cast("long") * F.lit(CELL_M)
              + (r + F.lit(float(HEX_OFF))).cast("long"))
    guard = F.expr(
        "CAST(raise_error('hex_cell: axial coordinate outside the "
        "hexv1 domain (|q|,|r| < 2^21) — raise size') AS BIGINT)")
    return F.when(ok, packed).otherwise(guard).alias("hex_cell")


def hex_cell_sql(lon_expr: str, lat_expr: str, size: float) -> str:
    """``hex_cell_expr`` as ANSI SQL text (DuckDB oracle mirror) — the
    identical operand order, with the axial/cube intermediates spelled
    once in a scalar-subquery-free nested SELECT (DuckDB CSEs them)."""
    qf = f"(({lon_expr}) * {_HEX_C23!r}) / {size!r}"
    rf = (f"(({lon_expr}) * {-_HEX_C13!r} + ({lat_expr}) * {_HEX_S33!r})"
          f" / {size!r}")
    sf = f"(-({qf}) - ({rf}))"
    rx = f"floor(({qf}) + 0.5)"
    ry = f"floor(({sf}) + 0.5)"
    rz = f"floor(({rf}) + 0.5)"
    dx = f"abs(({rx}) - ({qf}))"
    dy = f"abs(({ry}) - ({sf}))"
    dz = f"abs(({rz}) - ({rf}))"
    fix_x = f"(({dx}) > ({dy}) AND ({dx}) > ({dz}))"
    q = f"(CASE WHEN {fix_x} THEN -({ry}) - ({rz}) ELSE {rx} END)"
    r = (f"(CASE WHEN {fix_x} THEN {rz}"
         f" WHEN ({dy}) > ({dz}) THEN {rz}"
         f" ELSE -({rx}) - ({ry}) END)")
    return (f"(CAST({q} + {float(HEX_OFF)!r} AS BIGINT) * {CELL_M}"
            f" + CAST({r} + {float(HEX_OFF)!r} AS BIGINT))")


def hex_unpack_expr(cell: Column) -> Column:
    """``struct(q, r)`` — signed axial coordinates of a hexv1 cell id."""
    q = (cell / F.lit(CELL_M)).cast("long") - F.lit(HEX_OFF)
    r = (cell % F.lit(CELL_M)).cast("long") - F.lit(HEX_OFF)
    return F.struct(q.alias("q"), r.alias("r"))


def hex_center_expr(cell: Column, size: float) -> Column:
    """``struct(cx, cy)`` — the hex center in lon/lat (the vector side of
    the hex raster: centers feed symbolization/interpolation the way
    tile_bounds_expr feeds the rectangular tiles).  Inverse of the axial
    transform: x = (q·1.5)·R,  y = ((r + q·0.5)·√3)·R — operand order
    pinned for oracle replay."""
    u = hex_unpack_expr(cell)
    q = u["q"].cast("double")
    r = u["r"].cast("double")
    cx = (q * F.lit(1.5)) * F.lit(size)
    cy = ((r + q * F.lit(0.5)) * F.lit(_HEX_S3)) * F.lit(size)
    return F.struct(cx.alias("cx"), cy.alias("cy"))


def hex_ring_expr(cell: Column, ring: int) -> Column:
    """Array of hexv1 ids within axial ring distance ``ring`` (the hex
    k-ring: 1 + 3·ring·(ring+1) cells) — the candidate-expansion
    primitive for hex-keyed joins, mirroring ``ring_cells_expr`` on the
    rectangular grid.  Hex distance = (|dq| + |dr| + |dq+dr|)/2; the
    offset array is constant (codegen literal adds, no Python)."""
    offsets = [
        dq * CELL_M + dr
        for dq in range(-ring, ring + 1)
        for dr in range(-ring, ring + 1)
        if (abs(dq) + abs(dr) + abs(dq + dr)) // 2 <= ring
    ]
    return F.array(*[cell + F.lit(o) for o in offsets])


# ------------------------------------------------------------ hilbert key --
# The S2-flavored face of the index: S2's essential trick is ordering cells
# along a Hilbert space-filling curve so that curve-adjacent keys are
# spatially adjacent — the locality that makes range partitioning,
# clustered file layout and prefix scans work for spatial data (public
# reference: the S2 geometry library's cell-id design and the standard
# xy2d Hilbert arithmetic).  hilbertv1 = the div/mod form below over the
# cellv1 quadtree at a fixed ``levels``; pure BIGINT arithmetic, so Spark
# and the DuckDB oracle agree bit-for-bit.  At 100 TB the key's job is
# LAYOUT: ``df.repartitionByRange(F.col('hkey'))`` (or writing sorted by
# it) co-locates spatial neighbors into the same files/partitions, so
# cell-keyed candidate joins and tile scans touch few partitions instead
# of all of them — a pure data-layout win the rectangular key alone
# cannot give (Z-order/quadkey has the two famous locality seams).

HILBERT_VERSION = "hilbertv1"


def with_hilbert(df: DataFrame, cell_col: str = "cell", *, levels: int,
                 out: str = "hkey") -> DataFrame:
    """Append the Hilbert-curve position of each cellv1 cell at the given
    quadtree depth (``n = 2^levels`` per axis; key in [0, 4^levels)).

    One chained projection per level — O(levels) plan nodes, all
    whole-stage-codegen integer CASE/div/mod (no Python, no shuffle).
    Out-of-domain cells (ix or iy ≥ 2^levels, negative id) fail loudly,
    mirroring ``quadkey_expr``.  The per-level step is the classic xy2d
    round: d += s²·((3·rx) xor ry) spelled as CASE (rx=1 ⇒ 3−ry), then
    the (reflect ∘ swap) rotation, with the reflection against the FULL
    grid width n−1."""
    if levels < 1:
        # levels=0 would skip the loop entirely: every row gets hkey=0
        # and the domain guard is dead code Catalyst prunes — loud
        # ValueError instead of a silent constant column
        raise ValueError(f"with_hilbert: levels must be >= 1, got {levels}")
    n = 1 << levels
    keep = list(df.columns)
    ix = F.expr(f"{cell_col} div {CELL_M}")
    iy = F.expr(f"{cell_col} % {CELL_M}")
    ok = F.expr(f"{cell_col} >= 0") & (ix < n) & (iy < n)
    guard = F.expr(
        f"CAST(raise_error('hilbert: cell outside the level-{levels} "
        f"quadtree domain') AS BIGINT)")
    df = df.select(
        "*",
        F.when(ok, ix).otherwise(guard).alias("_hx"),
        iy.alias("_hy"),
        F.lit(0).cast("long").alias(out))
    s = n // 2
    while s > 0:
        rx = F.expr(f"(_hx div {s}) % 2")
        ry = F.expr(f"(_hy div {s}) % 2")
        d = (F.col(out)
             + F.lit(s * s) * F.when(rx == 1, F.lit(3) - ry).otherwise(ry))
        nx = (F.when(ry == 1, F.col("_hx"))
               .when(rx == 1, F.lit(n - 1) - F.col("_hy"))
               .otherwise(F.col("_hy")))
        ny = (F.when(ry == 1, F.col("_hy"))
               .when(rx == 1, F.lit(n - 1) - F.col("_hx"))
               .otherwise(F.col("_hx")))
        df = df.select(*keep, nx.alias("_hx"), ny.alias("_hy"),
                       d.alias(out))
        s //= 2
    return df.drop("_hx", "_hy")


def hilbert_d(ix: int, iy: int, *, levels: int) -> int:
    """Driver-side xy2d — the identical per-level round as
    ``with_hilbert`` (same d increment, same reflect-swap against the
    full grid width), in plain Python for QUERY PLANNING: computing the
    key intervals a bbox scan must read.  Kept next to the column
    implementation so the two cannot drift; test_hilbert_ranges sweeps
    both over the full level-4 grid."""
    n = 1 << levels
    if not (0 <= ix < n and 0 <= iy < n):
        raise ValueError(
            f"hilbert_d: ({ix},{iy}) outside the level-{levels} domain")
    d, x, y = 0, ix, iy
    s = n // 2
    while s > 0:
        rx = (x // s) % 2
        ry = (y // s) % 2
        d += s * s * ((3 - ry) if rx == 1 else ry)
        if ry != 1:
            nx = (n - 1 - y) if rx == 1 else y
            ny = (n - 1 - x) if rx == 1 else x
            x, y = nx, ny
        s //= 2
    return d


def hilbert_bbox_ranges(
    x0: float, y0: float, x1: float, y1: float, *, cell_size: float,
    levels: int,
) -> list[tuple[int, int]]:
    """Maximal Hilbert-key runs covering the half-open bbox
    [x0,x1) x [y0,y1) — the S2-style range-scan plan: a table laid out
    by hilbert key answers the bbox query by reading these few
    contiguous key intervals (min/max-prunable at the file level on a
    sorted layout) instead of scanning the corpus.

    The bbox must be CELL-ALIGNED (loud ValueError otherwise): aligned
    edges make "point in bbox" exactly "cell index in rectangle", so the
    interval filter is the bbox predicate, not a superset cover — which
    is what lets the driver gate value-hash the two plans against each
    other.  Driver-side cost is O(cells in bbox); a planner enumerating
    more than ~1e6 cells should coarsen the grid first (the intervals
    are for pruning, not per-point math).
    """
    def _idx(v: float, off: float) -> int:
        q = (v + off) / cell_size
        i = math.floor(q)
        if q != i:
            raise ValueError(
                f"hilbert_bbox_ranges: bbox edge {v!r} is not aligned to "
                f"the {cell_size!r}-sized grid")
        return int(i)

    ix0, ix1 = _idx(x0, 180.0), _idx(x1, 180.0)
    iy0, iy1 = _idx(y0, 90.0), _idx(y1, 90.0)
    if ix1 <= ix0 or iy1 <= iy0:
        raise ValueError("hilbert_bbox_ranges: empty bbox")
    ds = sorted(
        hilbert_d(ix, iy, levels=levels)
        for ix in range(ix0, ix1) for iy in range(iy0, iy1))
    runs: list[list[int]] = []
    for d in ds:
        if runs and d == runs[-1][1] + 1:
            runs[-1][1] = d
        else:
            runs.append([d, d])
    return [(a, b) for a, b in runs]


def hilbert_sql_query(base_sql: str, cell_expr: str = "cell", *,
                      levels: int, out: str = "hkey") -> str:
    """``with_hilbert`` as a DuckDB query transformer: wraps ``base_sql``
    (whose rows carry ``cell_expr``) in one chained subquery per level —
    the identical integer arithmetic, assuming domain-valid cells.
    Returns the base columns plus ``out``."""
    n = 1 << levels
    q = (f"SELECT *, (({cell_expr}) // {CELL_M}) AS _hx,"
         f" (({cell_expr}) % {CELL_M}) AS _hy,"
         f" CAST(0 AS BIGINT) AS {out} FROM ({base_sql})")
    s = n // 2
    while s > 0:
        rx = f"((_hx // {s}) % 2)"
        ry = f"((_hy // {s}) % 2)"
        q = (f"SELECT * EXCLUDE (_hx, _hy, {out}),"
             f" (CASE WHEN {ry} = 1 THEN _hx"
             f" WHEN {rx} = 1 THEN {n - 1} - _hy ELSE _hy END) AS _hx,"
             f" (CASE WHEN {ry} = 1 THEN _hy"
             f" WHEN {rx} = 1 THEN {n - 1} - _hx ELSE _hx END) AS _hy,"
             f" {out} + {s * s} * (CASE WHEN {rx} = 1 THEN 3 - {ry}"
             f" ELSE {ry} END) AS {out}"
             f" FROM ({q})")
        s //= 2
    return f"SELECT * EXCLUDE (_hx, _hy) FROM ({q})"
