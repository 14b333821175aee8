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
