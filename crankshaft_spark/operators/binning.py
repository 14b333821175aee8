"""Classification bins: equal-interval, quantile, heads/tails, Jenks.

Reference: /root/reference/src/pg/sql/cdb_utils.sql
  * CDB_EqualIntervalBins (:111-134): upper edges min + i·(max−min)/k for
    i=1..k−1, plus max.
  * CDB_QuantileBins (:414-447): sorted 1-indexed ranks; for i<k with
    break_size = n/k: if break_size·i is fractional → element at rank
    ⌈break_size·i⌉, else the mean of the elements at that rank and the next;
    last break = max.
  * CDB_HeadsTailsBins (:146-181): b₁ = mean; bᵢ = mean of values > bᵢ₋₁.
  * CDB_JenksBins (:199-302): GVF hill-climb seeded from quantiles, with a
    documented scale bailout to quantiles at n > 5,000,000 (:235-237) — we
    keep the same policy.

Each operator returns a DataFrame ``(bin int, break_value double)`` (upper
edges, 1-indexed) so results join/compare cleanly and have a DuckDB oracle.

Scale note: break computation reduces 10^12 rows to k numbers.  Equal
interval and heads/tails are pure aggregates (no sort).  Quantile/Jenks need
order statistics: exact rank selection is used below the reference's own 5M
bailout (a global-sort window over a bounded set), and the reference's
quantile fallback above it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

JENKS_EXACT_LIMIT = 5_000_000  # reference bailout, cdb_utils.sql:235-237


def equal_interval_bins(df: DataFrame, *, value_col: str = "value",
                        breaks: int = 5) -> DataFrame:
    stats = df.agg(
        F.min(value_col).alias("_min"), F.max(value_col).alias("_max")
    )
    diff = (F.col("_max") - F.col("_min")) / F.lit(float(breaks))
    return (
        stats.select(
            F.posexplode(
                F.array(
                    *[
                        (F.col("_min") + F.lit(float(i)) * diff)
                        for i in range(1, breaks)
                    ],
                    F.col("_max"),
                )
            ).alias("bin0", "break_value")
        )
        .select((F.col("bin0") + 1).alias("bin"), "break_value")
    )


def quantile_bins(df: DataFrame, *, value_col: str = "value",
                  breaks: int = 5) -> DataFrame:
    """Exact reference quantile rule via rank selection below the
    reference's 5M bailout; approx_percentile above it (the same scale
    policy the reference applies to Jenks, cdb_utils.sql:235-237 — a
    global rank sort is a single-reducer plan and must not run at 10^12).
    """
    n = df.where(F.col(value_col).isNotNull()).count()
    if n > JENKS_EXACT_LIMIT:
        pcts = F.array(*[F.lit(i / breaks) for i in range(1, breaks)])
        row = df.agg(
            F.percentile_approx(value_col, pcts, 100000).alias("bs"),
            F.max(value_col).alias("mx"),
        ).collect()[0]
        edges = [*row["bs"], row["mx"]]
        return df.sparkSession.createDataFrame(
            [(i + 1, float(e)) for i, e in enumerate(edges)],
            "bin int, break_value double",
        )
    ranked = (
        df.where(F.col(value_col).isNotNull())
        .select(F.col(value_col).alias("v"))
        .withColumn("r", F.row_number().over(Window.orderBy("v")))
    )
    spark = df.sparkSession
    targets = []  # (bin, rank, take_two)
    for i in range(1, breaks):
        bs_i = n * i / breaks
        frac = (n * i) % breaks != 0
        import math

        r = math.ceil(bs_i)
        targets.append((i, r, not frac))
    tdf = spark.createDataFrame(targets, "bin int, r int, take_two boolean")
    picks = ranked.join(
        F.broadcast(tdf),
        (ranked.r == tdf.r) | (tdf.take_two & (ranked.r == tdf.r + 1)),
    )
    inner = picks.groupBy("bin").agg(F.avg("v").alias("break_value"))
    last = df.agg(F.max(value_col).alias("break_value")).select(
        F.lit(breaks).alias("bin"), "break_value"
    )
    return inner.unionByName(last).orderBy("bin")


def headtails_bins(df: DataFrame, *, value_col: str = "value",
                   breaks: int = 5) -> DataFrame:
    """Iterative mean-above-previous-break: at most ``breaks`` driver
    iterations, each one distributed conditional aggregate."""
    spark = df.sparkSession
    vals = df.select(F.col(value_col).alias("v")).where(F.col("v").isNotNull())
    out: list[tuple[int, float]] = []
    prev = None
    for i in range(breaks):
        cond = vals if prev is None else vals.where(F.col("v") > F.lit(prev))
        m = cond.agg(F.avg("v")).first()[0]
        if m is None:
            break
        out.append((i + 1, float(m)))
        prev = m
    return spark.createDataFrame(out, "bin int, break_value double")


def _quantile_start_int(n: int, breaks: int) -> list[int]:
    # pure-integer quantile seed (⌊(n·i + ⌊k/2⌋)/k⌋ ≈ round(n·i/k)) so the
    # DuckDB oracle derives the identical start with `//` — Python round()
    # is banker's and not portable
    bounds = [(n * i + breaks // 2) // breaks for i in range(1, breaks)]
    bounds = sorted(set(min(max(b, 1), n - 1) for b in bounds))
    while len(bounds) < breaks - 1:
        for cand in range(1, n):
            if cand not in bounds:
                bounds.append(cand)
                break
        bounds.sort()
    return bounds


def _gvf_jenks(values, breaks: int, *, max_search: int = 50,
               start: list[int] | None = None):
    """Driver-side Jenks natural-breaks refinement (pure Python,
    deterministic, oracle-mirrorable).

    Seeded from quantile edges (or ``start`` boundary indices), then greedy
    first-improving boundary moves on GVF, at most ``max_search`` accepted
    moves — the same objective as the reference's shuffle loop
    (cdb_utils.sql:310-402, maximizing SDAM − Σ class SSD ≡ minimizing
    Σ class SSD) with a deterministic neighborhood search instead of seeded
    random shuffles (divergence documented; the reference itself only
    asserts its Jenks output through rounded regression goldens).

    Every float op is pinned for the DuckDB recursive-CTE oracle
    (jenks_oracle_sql): sequential prefix sums S1/S2, per-segment SSD via
    ``(S2[b]−S2[a]) − s·s/(b−a)``, sequential segment total, candidate scan
    order (bi asc, −1 before +1), first improvement accepted, epsilon
    1e-12.  One accepted move per iteration keeps the trajectory
    replayable as one recursion step per move.  Returns (bounds, ssd).
    """
    v = sorted(float(x) for x in values)
    n = len(v)
    k = breaks
    bounds = list(start) if start is not None else _quantile_start_int(n, k)

    s1 = [0.0]
    s2 = [0.0]
    for x in v:
        s1.append(s1[-1] + x)
        s2.append(s2[-1] + x * x)

    def ssd(bs):
        edges = [0] + list(bs) + [n]
        tot = 0.0
        for a, b in zip(edges[:-1], edges[1:]):
            s = s1[b] - s1[a]
            tot += (s2[b] - s2[a]) - s * s / (b - a)
        return tot

    best = ssd(bounds)
    it = 0
    while it < max_search:
        moved = False
        for bi in range(len(bounds)):
            if moved:
                break
            for delta in (-1, 1):
                cand = list(bounds)
                cand[bi] += delta
                if cand[bi] <= (cand[bi - 1] if bi else 0):
                    continue
                if cand[bi] >= (cand[bi + 1] if bi + 1 < len(cand) else n):
                    continue
                s = ssd(cand)
                if s < best - 1e-12:
                    best, bounds, moved = s, cand, True
                    break
        if not moved:
            break
        it += 1
    return bounds, best


def jenks_bins(df: DataFrame, *, value_col: str = "value",
               breaks: int = 5, iterations: int = 5,
               invert: bool = False, seed: int = 4567) -> DataFrame:
    """CDB_JenksBins(in_array, breaks, iterations, invert)
    (cdb_utils.sql:199-302).

    ``iterations``: 1 quantile-seeded start + (iterations−1) seeded random
    restarts, best GVF wins — mirroring the reference's setseed(0.4567)
    restart loop; the per-start search budget follows its shuffles formula
    min(max(⌊2.5e6/(n·iterations)⌋, 1), 750).  ``invert``: report each
    class's LOWER boundary value (in_array[classes[i][1]], side=1) instead
    of the default upper boundary (side=2, cdb_utils.sql:391-398).
    Deterministic for a given seed at any parallelism.
    """
    import numpy as np

    n = df.where(F.col(value_col).isNotNull()).count()
    if n > JENKS_EXACT_LIMIT:
        # reference policy: bail out to quantiles at scale
        return quantile_bins(df, value_col=value_col, breaks=breaks)
    vals = sorted(
        r[0]
        for r in df.select(F.col(value_col)).where(
            F.col(value_col).isNotNull()
        ).collect()
    )
    spark = df.sparkSession
    if n < breaks:
        # reference: element_count < breaks -> RETURN in_array
        # (cdb_utils.sql:222-225); also guards the restart loop, which
        # needs breaks-1 distinct interior boundaries to exist
        return spark.createDataFrame(
            [(i + 1, float(v)) for i, v in enumerate(vals)],
            "bin int, break_value double",
        )
    iterations = max(1, int(iterations))
    max_search = int(min(max(2500000.0 // max(n * iterations, 1), 1), 750))
    best_bounds, best_ssd = _gvf_jenks(vals, breaks, max_search=max_search)
    rng = np.random.RandomState(seed)
    for _ in range(iterations - 1):
        tops: set[int] = set()
        while len(tops) < breaks - 1:
            tops.add(int(rng.randint(1, max(n, 2))))
        b, s = _gvf_jenks(vals, breaks, max_search=max_search,
                          start=sorted(tops))
        if s < best_ssd - 1e-12:
            best_bounds, best_ssd = b, s
    if invert:
        edges = [float(vals[0])] + [float(vals[b]) for b in best_bounds]
    else:
        edges = [float(vals[b - 1]) for b in best_bounds] + [float(vals[-1])]
    spark = df.sparkSession
    return spark.createDataFrame(
        [(i + 1, e) for i, e in enumerate(edges)], "bin int, break_value double"
    )


def jenks_oracle_sql(pts_sql: str, *, breaks: int = 5, round_dp: int = 6,
                     max_moves: int | None = None) -> str:
    """DuckDB mirror of ``jenks_bins(..., iterations=1)`` (quantile-seeded
    greedy hill-climb, no random restarts) as recursive CTEs, replaying
    `_gvf_jenks` move for move:

      * ``pfx``: sequential prefix sums over the sorted value list, one
        recursion step per element — bit-identical to the Python running
        loop (windowed cumulative SUM is NOT: DuckDB's segment-tree
        accumulation reorders float adds).
      * ``climb``: one recursion step per accepted move; candidates scanned
        in (bi asc, −1 before +1) order via ``row_number() OVER (ORDER BY
        idx)``, first strict improvement (< best − 1e-12) accepted.

    Assumes n ≥ 2·breaks with distinct quantile-seed indices (holds for
    every driver sf; Python keeps the general dedupe/fill path).
    ``pts_sql`` must yield a ``value`` column castable to DOUBLE.
    """
    k = breaks
    cap = (f"least(greatest(2500000 // vals.n, 1), 750)"
           if max_moves is None else str(int(max_moves)))
    start = (f"list_transform(range(1,{k}), j -> "
             f"greatest(least((vals.n*j + {k // 2})//{k}, vals.n-1), 1))")
    nb = ("list_transform(c.b, (bb, j) -> bb + CASE WHEN j-1 = cd.bi "
          "THEN cd.delta ELSE 0 END)")

    def ssd(b: str) -> str:
        hi = f"(CASE WHEN s2i={k} THEN vals.n ELSE ({b})[s2i] END)"
        lo = f"(CASE WHEN s2i=1 THEN 0 ELSE ({b})[s2i-1] END)"
        s = f"(pl.S1[{hi} + 1] - pl.S1[{lo} + 1])"
        q = f"(pl.S2[{hi} + 1] - pl.S2[{lo} + 1])"
        return (f"list_sum(list_transform(range(1,{k + 1}), s2i -> "
                f"{q} - {s} * {s} / ({hi} - {lo})))")

    valid = (f"(({nb})[cd.bi+1] > CASE WHEN cd.bi = 0 THEN 0 "
             f"ELSE ({nb})[cd.bi] END AND "
             f"({nb})[cd.bi+1] < CASE WHEN cd.bi = {k - 2} THEN vals.n "
             f"ELSE ({nb})[cd.bi+2] END)")

    # vals/pl MATERIALIZED: DuckDB inlines plain CTEs, so every climb
    # iteration would otherwise re-run the n-step pfx recursion (measured
    # 176 s -> 1.1 s at n=1500)
    return f"""WITH RECURSIVE
vals AS MATERIALIZED (
         SELECT list_sort(list(CAST(value AS DOUBLE))) AS v,
                count(*)::BIGINT AS n
         FROM ({pts_sql}) WHERE value IS NOT NULL),
pfx AS (
  SELECT 0 AS i, 0.0::DOUBLE AS ps1, 0.0::DOUBLE AS ps2
  UNION ALL
  SELECT p.i+1, p.ps1 + v[p.i+1], p.ps2 + v[p.i+1]*v[p.i+1]
  FROM pfx p, vals WHERE p.i < n
),
pl AS MATERIALIZED (
       SELECT list(ps1 ORDER BY i) AS S1, list(ps2 ORDER BY i) AS S2
       FROM pfx),
cand AS (SELECT bi, delta, bi*2 + CASE WHEN delta=1 THEN 1 ELSE 0 END AS idx
         FROM range(0,{k - 1}) cb(bi), (VALUES (-1),(1)) d(delta)),
climb AS (
  SELECT 0 AS it, {start} AS b, {ssd(start)} AS ssd
  FROM vals, pl
  UNION ALL
  SELECT it+1, nb, nssd FROM (
    SELECT c.it, {nb} AS nb, {ssd(nb)} AS nssd,
           row_number() OVER (ORDER BY cd.idx) AS rn
    FROM climb c, vals, pl, cand cd
    WHERE {valid} AND {ssd(nb)} < c.ssd - 1e-12 AND c.it < {cap}
  ) picked WHERE rn = 1
),
fin AS (SELECT b FROM climb ORDER BY it DESC LIMIT 1)
SELECT CAST(s2i AS INT) AS bin,
       round(CASE WHEN s2i = {k} THEN vals.v[vals.n]
                  ELSE vals.v[fin.b[s2i]] END, {round_dp}) AS break_value
FROM fin, vals, range(1,{k + 1}) t(s2i)"""
