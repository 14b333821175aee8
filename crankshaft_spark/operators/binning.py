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


def _quantile_start(n: int, breaks: int) -> list[int]:
    bounds = [int(round(n * i / breaks)) for i in range(1, breaks)]
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
    """Driver-side Jenks natural-breaks refinement (numpy, deterministic).

    Seeded from quantile edges (or ``start`` boundary indices), then greedy
    boundary hill-climb on GVF for at most ``max_search`` sweeps — the same
    objective as the reference's shuffle loop (cdb_utils.sql:310-402,
    maximizing SDAM − Σ class SSD ≡ minimizing Σ class SSD) with a
    deterministic neighborhood search instead of seeded random shuffles
    (divergence documented; the reference itself only asserts its Jenks
    output through rounded regression goldens).  Returns (bounds, ssd).
    """
    import numpy as np

    v = np.sort(np.asarray(values, dtype=float))
    n = len(v)
    bounds = list(start) if start is not None else _quantile_start(n, breaks)

    def sdam_segments(bs):
        edges = [0] + list(bs) + [n]
        tot = 0.0
        for a, b in zip(edges[:-1], edges[1:]):
            seg = v[a:b]
            if len(seg):
                tot += ((seg - seg.mean()) ** 2).sum()
        return tot

    best = sdam_segments(bounds)
    improved = True
    it = 0
    while improved and it < max_search:
        improved = False
        it += 1
        for bi in range(len(bounds)):
            for delta in (-1, 1):
                cand = list(bounds)
                cand[bi] += delta
                if cand[bi] <= (cand[bi - 1] if bi else 0):
                    continue
                if cand[bi] >= (cand[bi + 1] if bi + 1 < len(cand) else n):
                    continue
                s = sdam_segments(cand)
                if s < best - 1e-12:
                    best, bounds, improved = s, cand, True
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
