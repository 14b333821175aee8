"""Pure-numpy computational-geometry kernels.

The reference leans on PostGIS/shapely/scipy for Delaunay triangulation,
Voronoi diagrams, polygon clipping and distance math
(/root/reference/src/pg/sql/09_voronoi.sql, 14_densify.sql, 13_PIA.sql,
20_overlap_sum.sql).  None of those libraries are available here, so these
kernels re-derive the needed primitives from first principles in vectorized
numpy.  They only ever run inside Arrow-batched pandas UDFs over BOUNDED
groups (one polygon, one tile's points) — never over a whole table — so the
O(n²) Bowyer-Watson / half-plane constructions are deliberate simplicity
wins, exactly like the reference's own per-array PL/pgSQL loops.

Conventions: a ring is an (n, 2) float ndarray of vertices, closed
implicitly (first != last); polygons are convex or simple; orientation is
normalized where it matters.
"""

from __future__ import annotations

import numpy as np


# ------------------------------------------------------------ basics --------

def polygon_area(ring: np.ndarray) -> float:
    """Signed shoelace area (positive = counter-clockwise)."""
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def polygon_centroid(ring: np.ndarray) -> tuple[float, float]:
    """Area-weighted centroid (ST_Centroid for a simple ring)."""
    x, y = ring[:, 0], ring[:, 1]
    xn, yn = np.roll(x, -1), np.roll(y, -1)
    cross = x * yn - xn * y
    a = cross.sum() / 2.0
    if abs(a) < 1e-300:
        return float(x.mean()), float(y.mean())
    cx = ((x + xn) * cross).sum() / (6.0 * a)
    cy = ((y + yn) * cross).sum() / (6.0 * a)
    return float(cx), float(cy)


def polygon_area_seq(ring: np.ndarray) -> float:
    """Signed shoelace area with STRICTLY SEQUENTIAL accumulation.

    Same math as polygon_area, but the two shoelace sums accumulate
    left-to-right as separate accumulators — bit-identical to the voronoi
    oracle's ``0.5*(list_sum(x_k*y_{k+1}) - list_sum(y_k*x_{k+1}))``
    (DuckDB list_sum is sequential; np.dot's BLAS pairwise order is not).
    """
    n = len(ring)
    s1 = 0.0
    s2 = 0.0
    for k in range(n):
        x0, y0 = float(ring[k, 0]), float(ring[k, 1])
        x1, y1 = float(ring[(k + 1) % n, 0]), float(ring[(k + 1) % n, 1])
        s1 += x0 * y1
        s2 += y0 * x1
    return 0.5 * (s1 - s2)


def polygon_centroid_seq(ring: np.ndarray) -> tuple[float, float]:
    """Area-weighted centroid with STRICTLY SEQUENTIAL accumulation.

    Same math as polygon_centroid, but the shoelace sums run left-to-right
    so a SQL list_sum over the identical per-vertex terms reproduces the
    float result — used where the centroid feeds further float-exact
    mirroring (voronoi's expanded-hull bound)."""
    n = len(ring)
    acc_a = 0.0
    acc_x = 0.0
    acc_y = 0.0
    for k in range(n):
        x0, y0 = float(ring[k, 0]), float(ring[k, 1])
        x1, y1 = float(ring[(k + 1) % n, 0]), float(ring[(k + 1) % n, 1])
        cr = x0 * y1 - x1 * y0
        acc_a += cr
        acc_x += (x0 + x1) * cr
        acc_y += (y0 + y1) * cr
    a = acc_a / 2.0
    if abs(a) < 1e-300:
        return float(ring[:, 0].mean()), float(ring[:, 1].mean())
    return acc_x / (6.0 * a), acc_y / (6.0 * a)


def point_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray cast: are points inside the ring?"""
    x1, y1 = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    px = np.asarray(px, dtype=float)[:, None]
    py = np.asarray(py, dtype=float)[:, None]
    cond = (y1[None, :] > py) != (y2[None, :] > py)
    dy = y2 - y1
    dy = np.where(dy == 0, 1e-300, dy)
    xint = x1[None, :] + (py - y1[None, :]) * (x2 - x1)[None, :] / dy[None, :]
    return (cond & (px < xint)).sum(axis=1) % 2 == 1


def point_seg_dist(px: np.ndarray, py: np.ndarray,
                   ax: float, ay: float, bx: float, by: float) -> np.ndarray:
    """Distance from points to one segment (vectorized over points).

    sqrt(ex*ex + ey*ey) rather than np.hypot: hypot's scaling algorithm
    differs from SQL sqrt in ulps, and the PIA oracle
    (operators/geometry.py pia_oracle_sql) mirrors this exact operand
    order so both engines produce bit-identical distances."""
    dx, dy = bx - ax, by - ay
    den = dx * dx + dy * dy
    if den == 0:
        ex0, ey0 = px - ax, py - ay
        return np.sqrt(ex0 * ex0 + ey0 * ey0)
    t = np.clip(((px - ax) * dx + (py - ay) * dy) / den, 0.0, 1.0)
    ex = px - (ax + t * dx)
    ey = py - (ay + t * dy)
    return np.sqrt(ex * ex + ey * ey)


def dist_to_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Min distance from points to the ring boundary (all segments)."""
    px = np.asarray(px, dtype=float)
    py = np.asarray(py, dtype=float)
    best = np.full(px.shape, np.inf)
    n = len(ring)
    for i in range(n):
        ax, ay = ring[i]
        bx, by = ring[(i + 1) % n]
        best = np.minimum(best, point_seg_dist(px, py, ax, ay, bx, by))
    return best


def signed_dist_to_ring(px, py, ring: np.ndarray) -> np.ndarray:
    """Positive inside, negative outside — the reference's _Signed_Dist
    (13_PIA.sql:104-143) convention used by the polylabel quadtree."""
    d = dist_to_ring(px, py, ring)
    inside = point_in_ring(px, py, ring)
    return np.where(inside, d, -d)


def convex_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain → CCW hull ring."""
    pts = np.unique(pts, axis=0)
    if len(pts) <= 2:
        return pts
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    p = pts[order]

    def half(seq):
        out: list[np.ndarray] = []
        for q in seq:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], q - out[-2]) <= 0:
                out.pop()
            out.append(q)
        return out

    lower = half(p)
    upper = half(p[::-1])
    return np.array(lower[:-1] + upper[:-1])


# -------------------------------------------------- clipping / halfplanes ---

def clip_halfplane(ring: np.ndarray, a: float, b: float, c: float) -> np.ndarray:
    """Sutherland-Hodgman step: keep the region a·x + b·y + c >= 0.

    A vertex EXACTLY on the clip line (val == 0) is emitted twice — once
    by the vi >= 0 branch and once as the t=0 crossing — the textbook
    S-H behavior, which the DuckDB voronoi oracle mirrors branch for
    branch; dedup here without changing the oracle would break value
    parity.  Downstream consumers treat repeated consecutive vertices as
    zero-length edges (area/centroid unaffected)."""
    if len(ring) == 0:
        return ring
    out: list[tuple[float, float]] = []
    n = len(ring)
    val = a * ring[:, 0] + b * ring[:, 1] + c
    for i in range(n):
        j = (i + 1) % n
        vi, vj = val[i], val[j]
        if vi >= 0:
            out.append((ring[i, 0], ring[i, 1]))
        if (vi >= 0) != (vj >= 0):
            t = vi / (vi - vj)
            out.append((
                ring[i, 0] + t * (ring[j, 0] - ring[i, 0]),
                ring[i, 1] + t * (ring[j, 1] - ring[i, 1]),
            ))
    return np.array(out) if out else np.empty((0, 2))


def clip_convex(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Clip a simple polygon by a CONVEX polygon (Sutherland-Hodgman).
    Replaces ST_Intersection for the overlap-sum candidate pairs
    (20_overlap_sum.sql:29-33) where one side is a convex admin cell."""
    if polygon_area(clip) < 0:
        clip = clip[::-1]
    out = subject
    n = len(clip)
    for i in range(n):
        ax, ay = clip[i]
        bx, by = clip[(i + 1) % n]
        # inside = left of edge (a->b) for CCW clip ring
        out = clip_halfplane(out, -(by - ay), bx - ax, (by - ay) * ax - (bx - ax) * ay)
        if len(out) == 0:
            break
    return out


# ------------------------------------------------------------ delaunay ------
# NOTE: the in-circle predicate is inlined in delaunay() as a cofactor
# expansion whose operation order the DuckDB oracle mirrors exactly; do
# NOT add a np.linalg.det-based variant (LU factorization diverges in
# ulps from the expansion on near-cocircular points and would silently
# break triangulation parity — a ready-made helper of that shape was
# deleted for this reason).


def delaunay(pts: np.ndarray) -> np.ndarray:
    """Bowyer-Watson Delaunay triangulation → (m, 3) int index array.

    Replaces ST_DelaunayTriangles (08_interpolation.sql:75,
    14_densify.sql:30) / scipy.spatial.Delaunay for bounded point groups.
    """
    pts = np.asarray(pts, dtype=float)
    n = len(pts)
    if n < 3:
        return np.empty((0, 3), dtype=int)
    lo = pts.min(axis=0)
    hi = pts.max(axis=0)
    span = max(float((hi - lo).max()), 1e-12)
    mid = (lo + hi) / 2.0
    superpts = np.array([
        [mid[0] - 3000 * span, mid[1] - 1500 * span],
        [mid[0] + 3000 * span, mid[1] - 1500 * span],
        [mid[0], mid[1] + 3000 * span],
    ])
    allpts = np.vstack([pts, superpts])
    tris = np.array([[n, n + 1, n + 2]], dtype=int)

    for i in range(n):
        p = allpts[i]
        # exact orientation-normalized in-circumcircle determinant over ALL
        # current triangles, vectorized.  No circumcenter prefilter: the
        # DuckDB oracle applies this det to every triangle, and a float
        # circumcenter of a near-degenerate triangle carries unbounded
        # relative error, so any prefilter tolerance can disagree with the
        # det on thin triangles — same O(#tris) per insertion either way,
        # just a larger constant.
        t = tris
        a, b, c = allpts[t[:, 0]], allpts[t[:, 1]], allpts[t[:, 2]]
        orient = (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) \
            - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0])
        ax, ay = a[:, 0] - p[0], a[:, 1] - p[1]
        bx, by = b[:, 0] - p[0], b[:, 1] - p[1]
        cx, cy = c[:, 0] - p[0], c[:, 1] - p[1]
        a2 = ax * ax + ay * ay
        b2 = bx * bx + by * by
        c2 = cx * cx + cy * cy
        det = (ax * (by * c2 - cy * b2)
               - ay * (bx * c2 - cx * b2)
               + a2 * (bx * cy - cx * by))
        cand = np.flatnonzero(np.where(orient >= 0, det, -det) > 0)
        bad = tris[cand]
        edges: dict[tuple[int, int], int] = {}
        for t in bad:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                key = (min(e[0], e[1]), max(e[0], e[1]))
                edges[key] = edges.get(key, 0) + 1
        new = [(u, v, i) for (u, v), cnt in edges.items() if cnt == 1]
        keep = np.ones(len(tris), dtype=bool)
        keep[cand] = False
        if new:
            tris = np.vstack([tris[keep], np.array(new, dtype=int)])
        else:
            tris = tris[keep]
    out = tris[(tris < n).all(axis=1)]
    return out if len(out) else np.empty((0, 3), dtype=int)


def voronoi_cells(pts: np.ndarray, bound: np.ndarray) -> list[np.ndarray]:
    """Voronoi cell polygon per input point, clipped to convex ``bound``.

    Cell_i = ∩_j halfplane(closer to i than j) ∩ bound — equivalent to the
    reference's Delaunay-dual construction (09_voronoi.sql:6-170) without
    the degenerate-topology cases (the reference's circumcenter dual,
    _Find_Circle at 09_voronoi.sql:188-232, is deliberately NOT offered
    here: its arithmetic has no DuckDB mirror).  COINCIDENT DUPLICATE
    points each receive the identical cell of their shared location (the
    self-bisector is a degenerate no-op, every other bisector clips
    normally); with duplicates present the cells are therefore not a
    partition and per-row area sums double-count — dedup upstream if a
    partition is required.  Neighbors are visited in distance
    order with the standard security-radius cut: once every remaining q has
    d(p, q) > 2·max-vertex-distance of the current cell, no further point
    can clip it — typical cells finish after O(#Voronoi-neighbors) clips
    instead of n.
    """
    cells = []
    for i, p in enumerate(pts):
        # squared distance, (q-p) operand order — the DuckDB oracle sorts
        # and break-tests on this exact expression (no np.hypot: its
        # scaled rounding can tie/invert where d2 doesn't, changing the
        # clip sequence — CLAUDE.md float rule)
        dx = pts[:, 0] - p[0]
        dy = pts[:, 1] - p[1]
        d2 = dx * dx + dy * dy
        # stable: ties in d2 resolve by input position, so the clip
        # sequence (and hence the float vertex arithmetic) is reproducible
        order = np.argsort(d2, kind="stable")
        cell = bound
        for j in order:
            if j == i or len(cell) == 0:
                continue
            r2 = ((cell[:, 0] - p[0]) ** 2 + (cell[:, 1] - p[1]) ** 2).max()
            if d2[j] > 4.0 * r2:
                break
            q = pts[j]
            # keep points closer to p than q: (q-p)·x <= (q-p)·(p+q)/2
            a, b = q[0] - p[0], q[1] - p[1]
            c = (a * (p[0] + q[0]) + b * (p[1] + q[1])) / 2.0
            cell = clip_halfplane(cell, -a, -b, c)
        cells.append(cell)
    return cells


def ring_to_wkt(ring: np.ndarray) -> str:
    """Closed POLYGON WKT from a ring (6-dp coords for stable comparison)."""
    if len(ring) == 0:
        return "POLYGON EMPTY"
    pts = np.vstack([ring, ring[:1]])
    inner = ", ".join(f"{x:.6f} {y:.6f}" for x, y in pts)
    return f"POLYGON (({inner}))"
