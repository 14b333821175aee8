"""Spatial Markov trend (CDB_SpatialMarkovTrend).

Reference: /root/reference/src/pg/sql/11_markov.sql →
src/py/crankshaft/crankshaft/space_time_dynamics/markov.py:21-94, backed by
PySAL 1.14.3 ``Spatial_Markov(t_data, W, k, fixed=False, permutations=0)``.

Semantics re-derived and verified to 1e-17 against the reference fixture
(neighbors_markov.json → markov.json):

  * per-period quantile classes (fixed=False): breaks = linear-interpolated
    percentiles at (100/k, 200/k, …, 100); class = #{breaks < y}, clamped to
    k−1  (PySAL Quantiles: np.percentile + searchsorted side='left')
  * lag classes: same binning applied to the spatial lag of the values,
    per period
  * T[l, c→c'] counts transitions t→t+1 conditioned on the *lag class at t*;
    P rows are row-normalized (all-zero rows stay zero)
  * per-unit outputs use the final period's class and the quantile class of
    the final period's lag:  trend_up = Σ_{c'>c} P[l,c,c'],
    trend_down = Σ_{c'<c} P[l,c,c'], trend = (up−down)/P[l,c,c] (NULL when
    the stay-probability is 0 — markov.py:185-189), volatility = population
    std of the dense k-vector P[l,c,·].

Everything is distributed: per-period percentiles are one groupBy, classes
are a broadcast join + array fold, transition counts one aggregation over
(id,t)-exploded rows, and the k³ probability table is a broadcast join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crankshaft_spark.operators.weights import spatial_lag  # noqa: F401  (API surface)


def _percentile_points(k: int) -> list[float]:
    return [(i + 1) * 100.0 / k / 100.0 for i in range(k)]


def _classify(long_df: DataFrame, k: int, value_col: str = "y") -> DataFrame:
    """Add quantile class per period: (id, t, y) → + cls."""
    pcts = _percentile_points(k)
    breaks = long_df.groupBy("t").agg(
        F.percentile(value_col, F.array(*[F.lit(p) for p in pcts])).alias("_breaks")
    )
    return (
        long_df.join(F.broadcast(breaks), "t")
        .withColumn(
            "cls",
            F.least(
                F.aggregate(
                    "_breaks",
                    F.lit(0),
                    lambda acc, b: acc + F.when(b < F.col(value_col), 1).otherwise(0),
                ),
                F.lit(k - 1),
            ),
        )
        .drop("_breaks")
    )


def spatial_markov_trend(
    values: DataFrame,
    edges: DataFrame,
    *,
    ys_col: str = "ys",
    num_classes: int = 7,
    lag_round: int | None = None,
    ) -> DataFrame:
    """values: (id, ys array<double> of T periods); edges: (id, nbr, w).

    Returns (id, trend, trend_up, trend_down, volatility).

    ``lag_round``: optionally round the spatial lag to this many decimals
    before quantile classification.  Float addition is order-sensitive at
    the ulp, and when panel values repeat heavily a lag can tie exactly
    with a quantile break — rounding pins the classification so results
    are bit-identical at any parallelism / in the DuckDB oracle.
    """
    k = num_classes
    long = values.select(
        "id", F.posexplode(ys_col).alias("t", "y")
    )

    # spatial lag per period: one join + aggregation over the edge table
    lag_long = (
        edges.select("id", "nbr", "w")
        .join(long.select(F.col("id").alias("nbr"), "t", "y"), "nbr")
        .groupBy("id", "t")
        .agg(F.sum(F.col("w") * F.col("y")).alias("y"))
    )
    if lag_round is not None:
        lag_long = lag_long.withColumn("y", F.round("y", lag_round))

    cls = _classify(long, k).select("id", "t", "cls")
    lag_cls = _classify(lag_long, k).select(
        "id", "t", F.col("cls").alias("lcls")
    )

    # conditioned transition counts → row-normalized probability table (k³)
    trans = (
        cls.alias("a")
        .join(
            cls.selectExpr("id", "t - 1 as t", "cls as cls_next").alias("b"),
            ["id", "t"],
        )
        .join(lag_cls, ["id", "t"])
        .groupBy("lcls", "cls", "cls_next")
        .agg(F.count("*").alias("cnt"))
    )
    row_tot = trans.groupBy("lcls", "cls").agg(F.sum("cnt").alias("tot"))
    prob = trans.join(row_tot, ["lcls", "cls"]).select(
        "lcls", "cls", "cls_next", (F.col("cnt") / F.col("tot")).alias("p")
    )

    t_max = values.select(F.max(F.size(ys_col))).first()[0] - 1
    final_cls = cls.where(F.col("t") == t_max).select("id", "cls")
    final_lag_cls = lag_cls.where(F.col("t") == t_max).select("id", "lcls")

    per_id = final_cls.join(final_lag_cls, "id")
    dist = per_id.join(F.broadcast(prob), ["lcls", "cls"], "left")

    agg = dist.groupBy("id", "cls").agg(
        F.sum(F.when(F.col("cls_next") > F.col("cls"), F.col("p")).otherwise(0.0)).alias("trend_up"),
        F.sum(F.when(F.col("cls_next") < F.col("cls"), F.col("p")).otherwise(0.0)).alias("trend_down"),
        F.sum(F.when(F.col("cls_next") == F.col("cls"), F.col("p")).otherwise(0.0)).alias("_stay"),
        F.sum(F.coalesce(F.col("p"), F.lit(0.0))).alias("_psum"),
        F.sum(F.coalesce(F.col("p") * F.col("p"), F.lit(0.0))).alias("_p2sum"),
    )
    return agg.select(
        "id",
        F.when(
            F.col("_stay") > 0.0,
            (F.col("trend_up") - F.col("trend_down")) / F.col("_stay"),
        ).alias("trend"),
        "trend_up",
        "trend_down",
        # population std over the dense k-vector (absent entries are zeros)
        F.sqrt(
            F.col("_p2sum") / k - (F.col("_psum") / k) * (F.col("_psum") / k)
        ).alias("volatility"),
    )


MK_Z_CRIT = 1.959964  # pinned two-sided 95% normal quantile (literal)


def mann_kendall(
    series: DataFrame,
    *,
    key_col: str = "cell",
    time_col: str = "t",
    value_col: str = "x",
    z_crit: float = MK_Z_CRIT,
) -> DataFrame:
    """Per-key Mann-Kendall trend test -> (key, s_stat, z_round, trend).

    The temporal half of ESRI-style "emerging hot spot" analysis, run on
    a per-cell time series (the reference ecosystem's space-time surface
    next to CDB_SpatialMarkovTrend, 11_markov.sql; Mann 1945 / Kendall
    1975 are the public statements of the test):

        S   = sum_{i<j} sign(x_j - x_i)
        Var = [T(T-1)(2T+5) - sum_g t_g(t_g-1)(2t_g+5)] / 18   (tie-adjusted)
        z   = (S-1)/sqrt(Var) if S>0, (S+1)/sqrt(Var) if S<0, else 0

    trend = 'up' / 'down' / 'none' by comparing z ROUNDED to 6dp against
    the pinned ``z_crit`` literal (the CLAUDE.md float-pin rule: every
    aggregate feeding a classification crosses engines through a round).

    Exactness: S and both variance terms are INTEGER aggregates (order-
    independent, oracle-exact); the only floats are the final /18.0 and
    sqrt, identical IEEE ops both engines.  ANSI guard: the division is
    only evaluated in CASE branches where Var > 0.

    Scale shape: the pair sum is a per-key self-join — T^2 rows per key
    with T bounded by the calendar (days in the window), keys (cells)
    the data-parallel axis.  No driver state, no Python.
    """
    t, x = F.col("_t"), F.col("_x")
    s = series.select(
        F.col(key_col).alias("_k"), F.col(time_col).alias("_t"),
        F.col(value_col).alias("_x"))
    a = s.select(F.col("_k"), t.alias("_t1"), x.alias("_x1"))
    b = s.select(F.col("_k"), t.alias("_t2"), x.alias("_x2"))
    sgn = (F.when(F.col("_x2") > F.col("_x1"), 1)
           .when(F.col("_x2") < F.col("_x1"), -1).otherwise(0))
    s_stat = (
        a.join(b, "_k").where(F.col("_t1") < F.col("_t2"))
        .groupBy("_k").agg(F.sum(sgn.cast("long")).alias("s_stat"))
    )
    tg = F.col("_tg")
    ties = (
        s.groupBy("_k", "_x").agg(F.count(F.lit(1)).alias("_tg"))
        .groupBy("_k")
        .agg(F.sum(tg * (tg - 1) * (2 * tg + 5)).alias("_tie"),
             F.sum(tg).alias("_T"))
    )
    T = F.col("_T")
    var_s = ((T * (T - 1) * (2 * T + 5) - F.col("_tie")) / F.lit(18.0))
    zr = F.round(
        F.when((F.col("_var") > 0) & (F.col("s_stat") > 0),
               (F.col("s_stat") - 1) / F.sqrt(F.col("_var")))
        .when((F.col("_var") > 0) & (F.col("s_stat") < 0),
              (F.col("s_stat") + 1) / F.sqrt(F.col("_var")))
        .otherwise(F.lit(0.0)), 6)
    return (
        s_stat.join(ties, "_k")
        .withColumn("_var", var_s)
        .withColumn("z_round", zr)
        .select(
            F.col("_k").alias(key_col), "s_stat", "z_round",
            F.when(F.col("z_round") > F.lit(z_crit), F.lit("up"))
            .when(F.col("z_round") < F.lit(-z_crit), F.lit("down"))
            .otherwise(F.lit("none")).alias("trend"))
    )


def mann_kendall_oracle_sql(
    series_sql: str,
    *,
    key_col: str = "cell",
    time_col: str = "t",
    value_col: str = "x",
    z_crit: float = MK_Z_CRIT,
) -> str:
    """DuckDB mirror of ``mann_kendall`` over a (key, t, x) subquery —
    identical integer aggregates, /18.0 operand order, 6dp pin."""
    return f"""
    WITH mk_in AS (SELECT {key_col} AS k, {time_col} AS t, {value_col} AS x
                   FROM ({series_sql})),
    mk_s AS (
      SELECT a.k, CAST(sum(CASE WHEN b.x > a.x THEN 1
                                WHEN b.x < a.x THEN -1 ELSE 0 END)
                  AS BIGINT) AS s_stat
      FROM mk_in a JOIN mk_in b ON a.k = b.k AND a.t < b.t
      GROUP BY a.k
    ),
    mk_t AS (
      SELECT k, CAST(sum(tg * (tg - 1) * (2 * tg + 5)) AS BIGINT) AS tie,
             CAST(sum(tg) AS BIGINT) AS T
      FROM (SELECT k, x, count(*) AS tg FROM mk_in GROUP BY k, x)
      GROUP BY k
    ),
    mk_v AS (
      SELECT s.k, s.s_stat,
             (T * (T - 1) * (2 * T + 5) - tie) / 18.0 AS var_s
      FROM mk_s s JOIN mk_t USING (k)
    ),
    mk_z AS (
      SELECT k, s_stat,
             round(CASE WHEN var_s > 0 AND s_stat > 0
                          THEN (s_stat - 1) / sqrt(var_s)
                        WHEN var_s > 0 AND s_stat < 0
                          THEN (s_stat + 1) / sqrt(var_s)
                        ELSE 0.0 END, 6) AS z_round
      FROM mk_v
    )
    SELECT k AS {key_col}, s_stat, z_round,
           CASE WHEN z_round > {z_crit!r} THEN 'up'
                WHEN z_round < -{z_crit!r} THEN 'down'
                ELSE 'none' END AS trend
    FROM mk_z"""


def emerging_hotspots(
    series: DataFrame,
    edges: DataFrame,
    *,
    key_col: str = "cell",
    time_col: str = "t",
    value_col: str = "x",
    z_crit: float = MK_Z_CRIT,
) -> DataFrame:
    """ESRI-style emerging-hotspot analysis: per-period analytic Gi* z per
    cell (the getis_gstar conditional-randomization algebra, operators/
    getis.py:74-105, applied per time slice), then Mann-Kendall over each
    cell's 6dp-pinned z series, then the trend x current-state taxonomy:

        state (last period's z vs ±z_crit)   trend (MK on the z series)
        hot   : intensifying_hot / persistent_hot / diminishing_hot
        cold  : intensifying_cold / persistent_cold / diminishing_cold
        none  : warming / cooling / none

    Input ``series`` must be a DENSE (key, t, x) integer panel (zero-fill
    missing periods first) and ``edges`` a (id, nbr) adjacency among the
    key universe (e.g. plans.pipeline.queen_cell_edges).  Everything is
    integer or pinned-order float algebra — the whole composition incl.
    both classifications is oracle-exact.  Guards: z := 0 when n <= 2,
    deg = 0, deg = n-1, or the leave-one-out variance is 0 (divisions
    only evaluate inside the guarded CASE branch — ANSI-safe).

    Scale shape: per-period one-row aggregates + one edge join (both
    keyed shuffles over the cell x period panel), then the bounded-T
    Mann-Kendall self-join; no driver state, no Python.
    """
    s = series.select(
        F.col(key_col).alias("_c"), F.col(time_col).alias("_t"),
        F.col(value_col).cast("long").alias("_x"))
    deg = edges.groupBy(F.col("id").alias("_c")).agg(
        F.count(F.lit(1)).alias("_deg"))
    nbr = (
        edges.join(
            s.select(F.col("_c").alias("nbr"), "_t",
                     F.col("_x").alias("_xn")), "nbr")
        .groupBy(F.col("id").alias("_c"), "_t")
        .agg(F.sum(F.col("_xn").cast("double")).alias("_s")))
    tot = s.groupBy("_t").agg(
        F.sum(F.col("_x").cast("double")).alias("_ysum"),
        F.sum(F.col("_x").cast("double") * F.col("_x")).alias("_y2sum"),
        F.count(F.lit(1)).alias("_n"))
    j = (
        s.join(deg, "_c", "left").join(nbr, ["_c", "_t"], "left")
        .join(F.broadcast(tot), "_t")
        .withColumn("_deg", F.coalesce("_deg", F.lit(0)))
        .withColumn("_s", F.coalesce("_s", F.lit(0.0))))
    y, dg, n = F.col("_x"), F.col("_deg"), F.col("_n")
    ysum, y2, sc = F.col("_ysum"), F.col("_y2sum"), F.col("_s")
    m = (ysum - y) / (n - 1)
    var = (y2 - y.cast("double") * y) / (n - 1) - m * m
    d1 = (dg + 1) * ysum
    zs = ((sc + y) / d1 - (dg * m + y) / d1) / F.sqrt(
        dg * var * (n - 1 - dg) / (n - 2) / (d1 * d1))
    # the CONDITION is not lazily evaluated (only CASE branches are), so
    # its variance term divides by a when-guarded n-1 (NULL, not error,
    # under ANSI when n <= 2; NULL > 0 is false); the branch formula's
    # divisions are CASE-lazy and need no wrapping.
    nm1 = F.when(n > 2, n - 1)
    m_c = (ysum - y) / nm1
    var_c = (y2 - y.cast("double") * y) / nm1 - m_c * m_c
    zr = F.round(
        F.when((n > 2) & (dg > 0) & (dg < n - 1) & (var_c > 0), zs)
        .otherwise(F.lit(0.0)), 6)
    zt = j.select("_c", "_t", zr.alias("_zr"))
    mk = mann_kendall(zt, key_col="_c", time_col="_t", value_col="_zr",
                      z_crit=z_crit)
    maxt = s.agg(F.max("_t").alias("_mt"))
    last = (
        zt.join(F.broadcast(maxt), F.col("_t") == F.col("_mt"))
        .select("_c", F.col("_zr").alias("z_last")))
    zl, tr = F.col("z_last"), F.col("trend")
    label = (
        F.when((zl > F.lit(z_crit)) & (tr == "up"), "intensifying_hot")
        .when((zl > F.lit(z_crit)) & (tr == "down"), "diminishing_hot")
        .when(zl > F.lit(z_crit), "persistent_hot")
        .when((zl < F.lit(-z_crit)) & (tr == "down"), "intensifying_cold")
        .when((zl < F.lit(-z_crit)) & (tr == "up"), "diminishing_cold")
        .when(zl < F.lit(-z_crit), "persistent_cold")
        .when(tr == "up", "warming")
        .when(tr == "down", "cooling")
        .otherwise("none"))
    return (
        mk.join(last, "_c")
        .select(F.col("_c").alias(key_col), "s_stat", "z_round", "trend",
                "z_last", label.alias("label")))


def emerging_oracle_sql(
    series_sql: str,
    *,
    queen_offsets,
    key_col: str = "cell",
    time_col: str = "t",
    value_col: str = "x",
    z_crit: float = MK_Z_CRIT,
) -> str:
    """DuckDB mirror of ``emerging_hotspots`` (same queen-offset edge
    build, per-period Gi* algebra in the hotspot_oracle_sql operand
    order, then the Mann-Kendall CTE chain on the pinned z series)."""
    offs = ", ".join(str(o) for o in queen_offsets)
    guard = ("tt.n > 2 AND COALESCE(d.deg, 0) > 0 "
             "AND COALESCE(d.deg, 0) < tt.n - 1 "
             "AND ((tt.y2sum - CAST(i.x AS DOUBLE) * i.x) / (tt.n - 1) "
             "- ((tt.ysum - i.x) / (tt.n - 1)) "
             "* ((tt.ysum - i.x) / (tt.n - 1))) > 0")
    zfull = """((j.s + j.x) / ((j.deg + 1) * j.ysum)
              - (j.deg * ((j.ysum - j.x) / (j.n - 1)) + j.x)
                / ((j.deg + 1) * j.ysum))
             / sqrt(
                 j.deg
                 * ((j.y2sum - CAST(j.x AS DOUBLE) * j.x) / (j.n - 1)
                    - ((j.ysum - j.x) / (j.n - 1))
                      * ((j.ysum - j.x) / (j.n - 1)))
                 * (j.n - 1 - j.deg) / (j.n - 2)
                 / (((j.deg + 1) * j.ysum) * ((j.deg + 1) * j.ysum))
               )"""
    zsql = f"""WITH eh_in AS (
        SELECT {key_col} AS c, {time_col} AS t, CAST({value_col} AS BIGINT)
               AS x
        FROM ({series_sql})),
      eh_cells AS (SELECT DISTINCT c FROM eh_in),
      eh_edges AS (
        SELECT a.c AS id, a.c + o.o AS nbr
        FROM eh_cells a JOIN (SELECT unnest([{offs}]) AS o) o ON true
        JOIN eh_cells b ON b.c = a.c + o.o),
      eh_deg AS (SELECT id, count(*) AS deg FROM eh_edges GROUP BY id),
      eh_nbr AS (
        SELECT e.id, i.t, sum(CAST(i.x AS DOUBLE)) AS s
        FROM eh_edges e JOIN eh_in i ON i.c = e.nbr GROUP BY 1, 2),
      eh_tot AS (
        SELECT t, sum(CAST(x AS DOUBLE)) AS ysum,
               sum(CAST(x AS DOUBLE) * x) AS y2sum, count(*) AS n
        FROM eh_in GROUP BY t),
      eh_j AS (
        SELECT i.c, i.t, i.x, COALESCE(d.deg, 0) AS deg,
               COALESCE(ns.s, 0.0) AS s, tt.ysum, tt.y2sum, tt.n,
               CASE WHEN {guard} THEN 1 ELSE 0 END AS ok
        FROM eh_in i
        LEFT JOIN eh_deg d ON i.c = d.id
        LEFT JOIN eh_nbr ns ON ns.id = i.c AND ns.t = i.t
        JOIN eh_tot tt ON tt.t = i.t)
      SELECT j.c, j.t,
             round(CASE WHEN j.ok = 1 THEN {zfull} ELSE 0.0 END, 6) AS zr
      FROM eh_j j"""
    mk = mann_kendall_oracle_sql(
        zsql, key_col="c", time_col="t", value_col="zr", z_crit=z_crit)
    return f"""
    WITH eh_z AS ({zsql}),
    eh_mk AS ({mk}),
    eh_last AS (
      SELECT c, zr AS z_last FROM eh_z
      WHERE t = (SELECT max(t) FROM eh_z)
    )
    SELECT m.c AS {key_col}, m.s_stat, m.z_round, m.trend, l.z_last,
           CASE WHEN l.z_last > {z_crit!r} AND m.trend = 'up'
                  THEN 'intensifying_hot'
                WHEN l.z_last > {z_crit!r} AND m.trend = 'down'
                  THEN 'diminishing_hot'
                WHEN l.z_last > {z_crit!r} THEN 'persistent_hot'
                WHEN l.z_last < -{z_crit!r} AND m.trend = 'down'
                  THEN 'intensifying_cold'
                WHEN l.z_last < -{z_crit!r} AND m.trend = 'up'
                  THEN 'diminishing_cold'
                WHEN l.z_last < -{z_crit!r} THEN 'persistent_cold'
                WHEN m.trend = 'up' THEN 'warming'
                WHEN m.trend = 'down' THEN 'cooling'
                ELSE 'none' END AS label
    FROM eh_mk m JOIN eh_last l ON m.c = l.c"""
