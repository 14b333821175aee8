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
