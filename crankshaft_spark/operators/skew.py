"""Explicit skew handling: salted aggregation and salted broadcast joins.

The north star names salted-key skew handling as a required physical
technique: web crawls are Zipf-distributed (a few hosts → a few hot H3
cells), so a plain groupBy/join on the cell key sends a hot key's entire
row set to one reducer.  Two standard remedies, both pure DataFrame ops:

  * ``two_level_agg``: partial-aggregate on (key, salt) first — map-side
    combine bounds any single reducer's input at rows/salts — then finish
    on key.  Works for any algebraic aggregate (sum/count/min/max and
    count-distinct via the two-key trick the pipeline's cellagg uses).
  * ``salted_broadcast_join``: replicate a small dimension per salt so a
    hot fact key spreads over ``salts`` reducers.  (When the dim fits in a
    broadcast this is usually moot — broadcast joins don't shuffle the
    fact side — but it is the right shape when the dim is just above the
    broadcast threshold.)

AQE's skew-join splitting (on in session_conf) handles residual skew in
sort-merge joins at runtime; these helpers are for the aggregation paths
AQE does not rewrite.

The salt must be DETERMINISTIC per row (derived from row identity, never
rand()) so results are identical at any parallelism — the same rule as
every seeded operator in this engine.

Gate coverage: the two-level aggregation SHAPE is driver-gate-exercised
through the flagship hotspot_pipeline's cellagg stage (its (cell, host)
partial is the two-key instantiation, value-hash-oracled end to end);
these generic helpers themselves are pytest-covered
(tests/test_skew_submit.py) and carry no separate catalog entry — the
catalog sits at the driver's hard 50-entry budget (driver_queries.py),
and a second salted-agg entry would duplicate the flagship's coverage.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, *, salts: int, id_col: str = "id",
              out: str = "_salt") -> DataFrame:
    """Deterministic salt in [0, salts) from row identity."""
    return df.withColumn(out, F.pmod(F.xxhash64(F.col(id_col)), F.lit(salts)))


def two_level_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    *,
    salts: int = 16,
    id_col: str = "id",
) -> DataFrame:
    """groupBy(keys).agg(...) with a salted partial level.

    ``aggs`` maps output name → aggregate over the input columns; supported
    aggregates are the decomposable ones: sum-like (re-aggregated with sum)
    and min/max (re-aggregated with themselves).  Counts: pass
    ``F.count(F.lit(1))`` — recombined with sum automatically.
    """
    salted = with_salt(df, salts=salts, id_col=id_col)
    partial = salted.groupBy(*keys, "_salt").agg(
        *[a.alias(f"_p_{name}") for name, a in aggs.items()]
    )

    def recombine(name: str, a: Column) -> Column:
        # kind detection on the TOP-LEVEL aggregate only (a substring match
        # would misclassify e.g. sum(array_min(...))).  WHITELIST, not
        # fallback: only sum/count/min/max decompose over salts.  A
        # silent sum-recombine of anything else — count(DISTINCT ...)
        # (per-salt distinct counts overlap across salts), avg wrapped
        # in round() (bypassing a bare-avg check), percentiles — returns
        # plausible wrong numbers, the worst failure mode a skew helper
        # can have.
        expr = str(a._jc)  # noqa: SLF001
        col = F.col(f"_p_{name}")
        if expr.startswith("avg(") or expr.startswith("mean("):
            raise ValueError(
                f"aggregate {name!r} is avg — not decomposable over salts; "
                "pass sum and count separately and divide"
            )
        if expr.startswith("min("):
            return F.min(col).alias(name)
        if expr.startswith("max("):
            return F.max(col).alias(name)
        if expr.startswith("sum(") or expr.startswith("count("):
            if "DISTINCT" in expr:
                raise ValueError(
                    f"aggregate {name!r} is DISTINCT — per-salt distinct "
                    "sets overlap across salts; use the two-key trick "
                    "(groupBy(key, value) partial) instead"
                )
            return F.sum(col).alias(name)
        raise ValueError(
            f"aggregate {name!r} ({expr.split('(')[0]}) is not in the "
            "decomposable whitelist (sum/count/min/max); recombining it "
            "with sum would silently return wrong results"
        )

    return partial.groupBy(*keys).agg(
        *[recombine(name, a) for name, a in aggs.items()]
    )


def salted_broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    *,
    salts: int = 16,
    id_col: str = "id",
) -> DataFrame:
    """Equi-join where the dim side is replicated per salt and the fact
    side carries a deterministic salt — a hot fact key spreads across
    ``salts`` reducers instead of one."""
    sf = with_salt(fact, salts=salts, id_col=id_col)
    sd = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    return sf.join(sd, [key, "_salt"]).drop("_salt")
