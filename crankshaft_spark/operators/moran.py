"""Moran's I — global, local (LISA), and Assunção-Reis rate variants.

Semantics re-derived from the reference and verified to 1e-15 against its
pytest fixtures (neighbors.json → moran.json):

  * z_i   = y_i − ȳ
  * lag_i = Σ_j w_ij z_j            (row-standardized weights)
  * I_i   = (n−1) · z_i · lag_i / Σ z²      (PySAL 1.14.3 Moran_Local)
  * global I = Σ z·lag / Σ z²  (S0 = n for row-standardized W), EI = −1/(n−1)
  * quads: HH if z>0 ∧ lag>0; LH if z≤0 ∧ lag>0; LL if z≤0 ∧ lag≤0; else HL
    (mapping per /root/reference/src/py/crankshaft/crankshaft/clustering/
    moran.py:311-341, HH=1, LH=2, LL=3, HL=4)

Reference entry points: CDB_MoransILocal / CDB_AreasOfInterestGlobal /
CDB_MoransILocalRate (/root/reference/src/pg/sql/10_moran.sql) backed by
moran.py:33-274.  The reference collects the whole table into one PostgreSQL
backend; here everything is join/aggregate algebra except the optional
conditional-randomization p-values, which are a vectorized Arrow UDF over a
broadcast value POOL bounded at ``pool_size`` (hash-ranked uniform
subsample, getis._hash_pool) — driver state is O(pool) at any n, and the
null is exact conditional randomization whenever n ≤ pool.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crankshaft_spark.operators.getis import SIM_POOL_DEFAULT
from crankshaft_spark.operators.weights import spatial_lag


def _with_z(values: DataFrame, value_col: str) -> DataFrame:
    """Attach global mean/Σz²/n via a broadcast single-row aggregate."""
    stats = values.agg(
        F.avg(value_col).alias("_mean"),
        F.count(value_col).alias("_n"),
    )
    vz = values.join(F.broadcast(stats)).withColumn(
        "_z", F.col(value_col) - F.col("_mean")
    )
    den = vz.agg(F.sum(F.col("_z") * F.col("_z")).alias("_den"))
    return vz.join(F.broadcast(den))


def moran_local(
    values: DataFrame,
    edges: DataFrame,
    *,
    value_col: str = "value",
    permutations: int = 0,
    seed: int = 1234,
    pool_size: int | None = SIM_POOL_DEFAULT,
) -> DataFrame:
    """Local Moran's I.

    ``values``: (id, value_col); ``edges``: (id, nbr, w) row-standardized.
    Returns (id, quad, significance, spatial_lag, spatial_lag_std, orig_val,
    orig_val_std, local_i); ``significance`` is null when permutations=0.
    """
    vz = _with_z(values, value_col)
    # both lags (raw y and centered z) from ONE edge join — halves the
    # heavy shuffle; per-term float math identical to two separate lags
    nbr_vals = vz.select(
        F.col("id").alias("nbr"),
        F.col(value_col).alias("_ny"),
        F.col("_z").alias("_nz"),
    )
    lags = (
        edges.join(nbr_vals, "nbr")
        .groupBy("id")
        .agg(
            F.sum(F.col("w") * F.col("_ny")).alias("spatial_lag"),
            F.sum(F.col("w") * F.col("_nz")).alias("_lagz"),
        )
    )

    base = (
        vz.join(lags, "id")
        .withColumn(
            "local_i",
            (F.col("_n") - 1) * F.col("_z") * F.col("_lagz") / F.col("_den"),
        )
        .withColumn(
            "quad",
            F.when((F.col("_z") > 0) & (F.col("_lagz") > 0), "HH")
            .when((F.col("_z") <= 0) & (F.col("_lagz") > 0), "LH")
            .when((F.col("_z") <= 0) & (F.col("_lagz") <= 0), "LL")
            .otherwise("HL"),
        )
        .withColumn("_std", F.sqrt(F.col("_den") / F.col("_n")))
        .withColumn("spatial_lag_std", F.col("_lagz") / F.col("_std"))
        .withColumn("orig_val", F.col(value_col))
        .withColumn("orig_val_std", F.col("_z") / F.col("_std"))
    )

    if permutations <= 0:
        out = base.withColumn("significance", F.lit(None).cast("double"))
    else:
        out = _local_permutation_p(
            base, values, value_col, edges, permutations, seed, pool_size
        )
    return out.select(
        "id", "quad", "significance", "spatial_lag", "spatial_lag_std",
        "orig_val", "orig_val_std", "local_i",
    )


def _local_permutation_p(
    base: DataFrame,
    values: DataFrame,
    value_col: str,
    edges: DataFrame,
    permutations: int,
    seed: int,
    pool_size: int | None = SIM_POOL_DEFAULT,
) -> DataFrame:
    """Conditional-randomization p_sim for local Moran.

    For each row i: hold z_i fixed, draw deg(i)-sized samples (without
    replacement) from the other z values, recompute I_i with row i's ACTUAL
    weight vector, two-sided count — the same scheme PySAL's ``__crand``
    uses (per-row RNG seeded from (seed, id) so results are independent of
    partitioning/parallelism).  Per-row work is vectorized numpy; the
    weight vector is applied in nbr-sorted order (sample values are
    exchangeable, so any fixed deterministic order is valid and
    parallelism-stable).

    Driver/broadcast state is O(pool), never O(n): candidates come from a
    hash-ranked uniform subsample of at most ``pool_size`` values
    (getis._hash_pool) — exact conditional randomization when n ≤ pool.
    n, mean and Σz² stay GLOBAL aggregates; per-row z_i/local_i ride the
    Arrow batch from ``base``, so rows outside the pool still get p-values.
    """
    from crankshaft_spark.operators.getis import _hash_pool

    deg = edges.groupBy("id").agg(
        F.count("*").alias("_deg"),
        F.transform(
            F.sort_array(F.collect_list(F.struct("nbr", "w"))),
            lambda st: st["w"],
        ).alias("_ws"),
    )
    spark = base.sparkSession
    stats = values.agg(
        F.count("*").alias("_n"), F.avg(F.col(value_col)).alias("_mean")
    ).collect()[0]
    n, mean = int(stats["_n"]), float(stats["_mean"])
    den = float(
        values.agg(F.sum(
            (F.col(value_col) - F.lit(mean))
            * (F.col(value_col) - F.lit(mean))
        )).collect()[0][0]
    )
    ids, yl = _hash_pool(values, value_col, "lmsim-pool", pool_size)
    zpool = np.array(yl, dtype=float) - mean
    m = len(zpool)
    bz = spark.sparkContext.broadcast(zpool)
    bpos = spark.sparkContext.broadcast({v: i for i, v in enumerate(ids)})

    schema = "id long, significance double"

    def compute(pdfs):
        for pdf in pdfs:
            z = bz.value
            pos = bpos.value
            out_p = np.empty(len(pdf))
            for row_i, (rid, d, ws, li, zi) in enumerate(
                zip(pdf["id"], pdf["_deg"], pdf["_ws"], pdf["local_i"],
                    pdf["_z"])
            ):
                rng = np.random.RandomState(
                    (seed * 1000003 + int(rid)) % (2**32)
                )
                i = pos.get(int(rid), -1)  # self may be outside the pool
                others = np.delete(z, i) if i >= 0 else z
                if int(d) > len(others):
                    raise ValueError(
                        f"moran_local: deg({rid})={d} exceeds the "
                        f"{len(others)} available pool candidates — raise "
                        f"pool_size (got {m})")
                idx = np.argsort(
                    rng.random_sample((permutations, len(others))), axis=1
                )[:, : int(d)]
                w_vec = np.asarray(ws, dtype=float)
                sims = (n - 1) * float(zi) * (others[idx] @ w_vec) / den
                # 6dp pin (CLAUDE.md float rule): zi/li come from the
                # in-plan _with_z aggregates while zpool/den come from
                # separately-collected sums — three independent float
                # aggregation orders feeding one knife-edge comparison
                larger = int((np.round(sims, 6) >= round(float(li), 6)).sum())
                if (permutations - larger) < larger:
                    larger = permutations - larger
                out_p[row_i] = (larger + 1.0) / (permutations + 1.0)
            yield pd.DataFrame({"id": pdf["id"], "significance": out_p})

    # pin parallelism: the per-row work is O(permutations·n) numpy but the
    # input is a few KB, so AQE's byte-based coalescing would run the whole
    # permutation stage in one task (functions/spread rationale)
    from crankshaft_spark.functions.spread import spread_groups

    withdeg = spread_groups(
        base.join(deg, "id").select("id", "_deg", "_ws", "local_i", "_z"),
        "id",
    )
    p = withdeg.mapInPandas(compute, schema=schema)
    return base.join(p, "id")


def moran_local_hash_sim(
    values: DataFrame,
    edges: DataFrame,
    *,
    value_col: str = "value",
    permutations: int = 19,
    seed: int = 1234,
    pool_size: int | None = SIM_POOL_DEFAULT,
    persist: bool = True,
    persist_registry: list | None = None,
) -> DataFrame:
    """Local Moran with an ORACLE-EXPRESSIBLE permutation p_sim →
    (id, quad, local_i, p_sim).

    Same conditional randomization as ``moran_local(permutations=k)`` but
    the deg(i)-subsets are drawn by the keyed-hash PySAL-crand scheme of
    getis_gstar_sim (a keyed affine bijection of hash-shuffled pool
    positions per row, shared per-permutation rank templates τ_p —
    getis._sim_slots / _crand_rank_sums, per-row cost O(perms·deg), no
    sort) instead of a numpy RNG stream, so a DuckDB oracle can replay
    the draw verbatim.  Requires deg ≤ pool−1 (the template's slot
    count).

    Exactness contract (why every comparison is integer):

      sims_p ≥ I_i  ⇔  K_i·(S_p − d·ȳ) ≥ K_i·(S_nbr − d·ȳ),
      K_i = (n−1)·z_i/(den·d),  den, d, n−1 > 0

    so with sign(K_i) = sign(z_i) = sign(y_i·n − Σy) the float algebra
    cancels: count S_p ≥ S_nbr when z_i > 0, S_p ≤ S_nbr when z_i < 0,
    always when z_i = 0 — S_p, S_nbr, y_i·n, Σy all int64.  Requires
    INTEGER-VALUED y and UNIFORM row weights (row-standardized kNN edges:
    w_ij = 1/deg(i)), which also makes sample order irrelevant.  p_sim is
    PySAL-folded: (min(larger, perms−larger)+1)/(perms+1).

    ``pool_size`` bounds driver/broadcast state to O(pool + perms·maxdeg)
    (value pool + deg-truncated slot templates) and per-row compute to
    O(permutations·deg): samples are drawn from a
    hash-ranked uniform subsample of the values (getis._hash_pool, tag
    'msim-pool') — exact conditional randomization when n ≤ pool,
    replayable by the DuckDB oracle either way.  ``pool_size=None``
    forces the exact all-values pool (bounded inputs only).
    """
    from crankshaft_spark.operators.getis import _h32_col, _hash_pool

    analytic = moran_local(values, edges, value_col=value_col)

    # tolerate the same inputs the analytic path does: drop NULL values and
    # edge sources absent from `values` (else pos[rid] KeyErrors in run())
    values = values.where(F.col(value_col).isNotNull())
    edges = edges.join(values.select("id"), "id", "left_semi")

    spark = values.sparkSession
    ids, yl = _hash_pool(values, value_col, "msim-pool", pool_size,
                         cast="long")
    y = np.array([int(v) for v in yl], dtype=np.int64)
    m = len(y)  # pool size (== n when pool_size is None or n <= pool_size)
    # n and Σy are GLOBAL (the sign test z_i = y_i·n − Σy uses the global
    # mean), never pool aggregates
    trow = values.agg(
        F.count("*").alias("_n"),
        F.sum(F.col(value_col).cast("long")).alias("_ysum")).collect()[0]
    n, ysum = int(trow["_n"]), int(trow["_ysum"])
    from crankshaft_spark.operators.getis import _sim_slots

    nbr_stats = (
        edges.select("id", "nbr")
        .join(values.select(F.col("id").alias("nbr"),
                            F.col(value_col).cast("long").alias("_yl")),
              "nbr")
        .groupBy("id")
        .agg(F.count("*").alias("_deg"), F.sum("_yl").alias("_nbrsum"))
        .join(values.select("id",
                            F.col(value_col).cast("long").alias("_yself")),
              "id")
        .withColumn("_ha", _h32_col("msim-A", seed))
        .withColumn("_hb", _h32_col("msim-B", seed))
    )
    # nbr_stats feeds TWO actions — the maxd aggregate and the sim input —
    # so pin it or the edge join+groupBy executes twice (getis twin; same
    # persist contract: callers collect the handle via persist_registry)
    if persist:
        nbr_stats = nbr_stats.persist()
        if persist_registry is not None:
            persist_registry.append(nbr_stats)
    # deg-truncated templates: only the first deg rank slots are drawn,
    # so the broadcast is O(perms·maxdeg) not O(perms·pool) (getis twin)
    maxd = int(nbr_stats.agg(F.max("_deg")).first()[0] or 0)
    if maxd > m - 1:
        raise ValueError(
            f"moran_local_hash_sim: max deg {maxd} exceeds the {m - 1} "
            f"pool template slots — raise pool_size (got {m})")
    by = spark.sparkContext.broadcast(y)
    bpos = spark.sparkContext.broadcast({v: i for i, v in enumerate(ids)})
    bslots = spark.sparkContext.broadcast(
        _sim_slots("msim", seed, permutations, m)[:, :maxd])

    schema = "id long, p_sim double"

    def run(pdfs):
        from crankshaft_spark.operators.getis import _crand_rank_sums

        yv, pos = by.value, bpos.value
        slots = bslots.value
        for pdf in pdfs:
            if not len(pdf):
                yield pd.DataFrame([], columns=["id", "p_sim"])
                continue
            rids = [int(v) for v in pdf["id"]]
            degs = [int(v) for v in pdf["_deg"]]
            nbrsums = [int(v) for v in pdf["_nbrsum"]]
            # sign test in unbounded Python ints (CLAUDE.md: cross-
            # multiplied int64 comparisons wrap silently at scale)
            sgs = [int(ys) * n - ysum for ys in pdf["_yself"]]
            larger = np.full(len(rids), permutations, dtype=np.int64)
            draw = [k for k, sg in enumerate(sgs) if sg != 0]
            if draw:
                r_d = [rids[k] for k in draw]
                d_d = [degs[k] for k in draw]
                excl = [pos.get(r, -1) for r in r_d]  # self may be off-pool
                for rid, d in zip(r_d, d_d):
                    if d > m - 1:
                        raise ValueError(
                            f"moran_local_hash_sim: deg({rid})={d} exceeds "
                            f"the {m - 1} pool template slots — raise "
                            f"pool_size (got {m})")
                ha = pdf["_ha"].to_numpy(dtype=np.int64)[draw]
                hb = pdf["_hb"].to_numpy(dtype=np.int64)[draw]
                s = _crand_rank_sums(ha, hb, d_d, excl, yv, slots)
                nb = np.array([nbrsums[k] for k in draw],
                              dtype=np.int64)[:, None]
                pos_sign = np.array([sgs[k] > 0 for k in draw])
                larger[draw] = np.where(
                    pos_sign, (s >= nb).sum(axis=1), (s <= nb).sum(axis=1))
            folded = np.minimum(larger, permutations - larger)
            yield pd.DataFrame({
                "id": rids,
                "p_sim": (folded + 1.0) / (permutations + 1.0)})

    # same AQE pin as _local_permutation_p: tiny bytes, heavy per-row numpy
    from crankshaft_spark.functions.spread import spread_groups

    p = spread_groups(
        nbr_stats.select("id", "_deg", "_nbrsum", "_yself", "_ha", "_hb"),
        "id"
    ).mapInPandas(run, schema)
    return analytic.join(p, "id").select(
        "id", "quad", "local_i", "p_sim"
    )


def moran_global(
    values: DataFrame,
    edges: DataFrame,
    *,
    value_col: str = "value",
) -> DataFrame:
    """Global Moran's I → single row (moran_i, expected_i).

    Reference returns (I, EI) (moran.py:76-78 ``zip([I],[EI])``).
    """
    vz = _with_z(values, value_col)
    zdf = vz.select("id", F.col("_z").alias("value"))
    lag_z = spatial_lag(edges, zdf, out_col="_lagz")
    joined = vz.join(lag_z, "id")
    return joined.agg(
        (F.sum(F.col("_z") * F.col("_lagz")) / F.first("_den")).alias("moran_i"),
        (F.lit(-1.0) / (F.first("_n") - 1)).alias("expected_i"),
    )


def geary_c(
    values: DataFrame,
    edges: DataFrame,
    *,
    value_col: str = "value",
) -> DataFrame:
    """Global Geary's C → single row (geary_c, expected_c).

    C = (n−1) · Σ_ij w_ij (x_i − x_j)² / (2 W Σ_i (x_i − x̄)²), W = Σ w_ij
    — the classic squared-difference companion to global Moran's I
    (PySAL ``esda.Geary``; the reference ships the Moran half of that
    pair via its vendored PySAL, pysal_utils.py:23-35).  E[C] = 1 under
    the randomization null; C < 1 ⇒ positive autocorrelation.  Geary is
    LOCAL-difference sensitive where Moran is covariance sensitive, so
    the two disagree exactly when structure is small-scale.

    Shape: one (id, nbr, w) edge join against the value table twice +
    two one-row broadcast aggregates — the same 100 TB-safe plan as
    moran_global (no new shuffle class).
    """
    x = values.select("id", F.col(value_col).alias("_x"))
    stats = values.agg(
        F.count(value_col).alias("_n"),
        F.avg(value_col).alias("_mu"),
    )
    den = (
        values.join(F.broadcast(stats))
        .agg(F.sum((F.col(value_col) - F.col("_mu"))
                   * (F.col(value_col) - F.col("_mu"))).alias("_den"))
    )
    pair = (
        edges
        .join(x.withColumnRenamed("id", "_i").withColumnRenamed("_x", "_xi"),
              F.col("id") == F.col("_i"))
        .join(x.withColumnRenamed("id", "_j").withColumnRenamed("_x", "_xj"),
              F.col("nbr") == F.col("_j"))
        .agg(
            F.sum(F.col("w") * (F.col("_xi") - F.col("_xj"))
                  * (F.col("_xi") - F.col("_xj"))).alias("_num"),
            F.sum("w").alias("_W"),
        )
    )
    return (
        pair.join(F.broadcast(stats)).join(F.broadcast(den))
        .select(
            ((F.col("_n") - 1) * F.col("_num")
             / (F.lit(2.0) * F.col("_W") * F.col("_den"))).alias("geary_c"),
            F.lit(1.0).alias("expected_c"),
        )
    )


def geary_local(
    values: DataFrame,
    edges: DataFrame,
    *,
    value_col: str = "value",
) -> DataFrame:
    """Local Geary c_i (Anselin 1995's LISA companion to local Moran) →
    (id, geary_ci):  c_i = Σ_j w_ij (z_i − z_j)² / (Σ_k z_k² / n),
    z = x − x̄.

    Small c_i ⇒ the site's neighborhood is locally homogeneous (positive
    autocorrelation); large c_i flags a local outlier by squared
    *difference* where local Moran flags it by covariance — the two
    disagree exactly where structure is small-scale, same contrast as
    the global pair (geary_c above).  The reference ships the Moran half
    of the LISA family via its vendored PySAL
    (crankshaft/clustering/moran.py:13-88); this completes the pair.

    Plan shape: identical to moran_local's lag join — one (id, nbr, w)
    edge shuffle joined to the broadcast-centered z values on both
    endpoints, groupBy(id) partial-aggregated sum, then a broadcast
    one-row denominator — no new shuffle class, 100 TB-safe.
    """
    vz = _with_z(values, value_col)
    zj = vz.select(F.col("id").alias("nbr"), F.col("_z").alias("_zj"))
    zi = vz.select("id", F.col("_z").alias("_zi"), "_n", "_den")
    num = (
        edges.join(zj, "nbr")
        .join(zi.select("id", "_zi"), "id")
        .groupBy("id")
        .agg(F.sum(
            F.col("w") * (F.col("_zi") - F.col("_zj"))
            * (F.col("_zi") - F.col("_zj"))).alias("_num"))
    )
    return (
        num.join(zi.select("id", "_n", "_den"), "id")
        .select(
            "id",
            (F.col("_num") / (F.col("_den") / F.col("_n"))).alias("geary_ci"),
        )
    )


def join_counts(
    values: DataFrame,
    edges: DataFrame,
    *,
    value_col: str = "value",
) -> DataFrame:
    """Join-count statistics over a binary variable on the directed edge
    graph → one row per statistic: (stat ∈ bb/bw/ww, count, expected).

    The categorical-autocorrelation member of the PySAL global trio
    (``esda.Join_Counts``) next to Moran/Geary: bb = Σ_edges x_i·x_j,
    bw = mismatches, ww = the rest.  Expectations are the nonfree-
    sampling (hypergeometric) ones on E directed edges: E[bb] =
    E·(nb/n)·((nb−1)/(n−1)), E[bw] = E·2·nb·nw/(n·(n−1)).  Counts are
    integers and expectations rationals — fully oracle-exact.  Same
    single-edge-join shape as geary_c.
    """
    xb = values.select(
        "id", (F.col(value_col) > F.lit(0.0)).cast("long").alias("_b"))
    stats = xb.agg(
        F.count("_b").alias("_n"), F.sum("_b").alias("_nb"))
    cnt = (
        edges
        .join(xb.withColumnRenamed("id", "_i").withColumnRenamed("_b", "_bi"),
              F.col("id") == F.col("_i"))
        .join(xb.withColumnRenamed("id", "_j").withColumnRenamed("_b", "_bj"),
              F.col("nbr") == F.col("_j"))
        .agg(
            F.count(F.lit(1)).alias("_E"),
            F.sum(F.col("_bi") * F.col("_bj")).alias("_bb"),
            F.sum(F.col("_bi") * (1 - F.col("_bj"))
                  + (1 - F.col("_bi")) * F.col("_bj")).alias("_bw"),
        )
    )
    j = cnt.join(F.broadcast(stats))
    n, nb = F.col("_n"), F.col("_nb")
    nw = n - nb
    e = F.col("_E").cast("double")
    rows = [
        ("bb", F.col("_bb"),
         e * (nb / n) * ((nb - 1) / (n - 1))),
        ("bw", F.col("_bw"),
         e * F.lit(2.0) * nb * nw / (n * (n - 1))),
        ("ww", F.col("_E") - F.col("_bb") - F.col("_bw"),
         e * (nw / n) * ((nw - 1) / (n - 1))),
    ]
    out = None
    for tag, c, ex in rows:
        r = j.select(
            F.lit(tag).alias("stat"),
            c.cast("long").alias("count"),
            ex.alias("expected"),
        )
        out = r if out is None else out.unionByName(r)
    return out


def assuncao_rate(
    values: DataFrame,
    *,
    numerator: str = "numerator",
    denominator: str = "denominator",
    out_col: str = "value",
) -> DataFrame:
    """Assunção-Reis empirical-Bayes rate standardization.

    Formula per PySAL 1.14.3 ``esda.smoothing.assuncao_rate`` (used by
    Moran_Local_Rate, reference moran.py:259):
        y = e/b;  b̂ = Σe/Σb;  s² = Σ b(y−b̂)² / Σb;  â = s² − b̂/(Σb/n)
        v_i = â + b̂/b_i;  z_i = (y_i − b̂) / sqrt(v_i)
    """
    e, b = F.col(numerator), F.col(denominator)
    stats = values.agg(
        F.sum(e).alias("_es"),
        F.sum(b).alias("_bs"),
        F.count(e).alias("_cnt"),
    )
    j = values.join(F.broadcast(stats)).withColumn("_y", e / b).withColumn(
        "_ebi_b", F.col("_es") / F.col("_bs")
    )
    s2 = j.agg(
        (
            F.sum(b * (F.col("_y") - F.col("_ebi_b")) * (F.col("_y") - F.col("_ebi_b")))
            / F.first("_bs")
        ).alias("_s2")
    )
    return (
        j.join(F.broadcast(s2))
        .withColumn("_ebi_a", F.col("_s2") - F.col("_ebi_b") / (F.col("_bs") / F.col("_cnt")))
        .withColumn("_ebi_v", F.col("_ebi_a") + F.col("_ebi_b") / b)
        .withColumn(out_col, (F.col("_y") - F.col("_ebi_b")) / F.sqrt(F.col("_ebi_v")))
        .select("id", out_col)
    )


def moran_local_rate(
    values: DataFrame,
    edges: DataFrame,
    *,
    numerator: str = "numerator",
    denominator: str = "denominator",
    permutations: int = 0,
    seed: int = 1234,
) -> DataFrame:
    """Local Moran's I on EB-standardized rates (CDB_MoransILocalRate)."""
    rates = assuncao_rate(
        values.na.drop(subset=[numerator, denominator]).where(
            F.col(denominator) != 0
        ),
        numerator=numerator,
        denominator=denominator,
    )
    return moran_local(
        rates, edges, value_col="value", permutations=permutations, seed=seed
    )


def moran_global_rate(
    values: DataFrame,
    edges: DataFrame,
    *,
    numerator: str = "numerator",
    denominator: str = "denominator",
) -> DataFrame:
    """Global Moran's I on EB-standardized rates
    (CDB_AreasOfInterestGlobalRate, 10_moran.sql:181-198 → moran.py:153-197)."""
    rates = assuncao_rate(
        values.na.drop(subset=[numerator, denominator]).where(
            F.col(denominator) != 0
        ),
        numerator=numerator,
        denominator=denominator,
    )
    return moran_global(rates, edges, value_col="value")


def moran_hotspots(lisa: DataFrame) -> DataFrame:
    """CDB_GetSpatialHotspots: LISA rows with quad HH or HL
    (10_moran.sql:124-138)."""
    return lisa.where(F.col("quad").isin("HH", "HL"))


def moran_coldspots(lisa: DataFrame) -> DataFrame:
    """CDB_GetSpatialColdspots: quads LL or LH (10_moran.sql:140-155)."""
    return lisa.where(F.col("quad").isin("LL", "LH"))


def moran_outliers(lisa: DataFrame) -> DataFrame:
    """CDB_GetSpatialOutliers: quads HL or LH (10_moran.sql:157-171)."""
    return lisa.where(F.col("quad").isin("HL", "LH"))


def moran_local_bivariate(
    values: DataFrame,
    edges: DataFrame,
    *,
    attr1: str = "attr1",
    attr2: str = "attr2",
) -> DataFrame:
    """Bivariate LISA: attr1 against the spatial lag of attr2.

    Reference: Moran.local_bivariate_stat (moran.py:276-306) — marked
    "untested" there with no SQL entry point, so no fixture parity target
    exists; semantics follow the same construction as moran_local with the
    lag taken over attr2's centered values:
        I_i = (n−1)·z1_i·lag(z2)_i / Σ z1²,  quads from (z1, lag z2).
    Returns (id, quad, local_i).
    """
    v1 = _with_z(values.select("id", F.col(attr1).alias("value")), "value")
    v2 = values.select("id", F.col(attr2).alias("value"))
    s2 = v2.agg(F.avg("value").alias("_m2"))
    z2 = v2.join(F.broadcast(s2)).select(
        "id", (F.col("value") - F.col("_m2")).alias("value")
    )
    lag_z2 = spatial_lag(edges, z2, out_col="_lag2")
    return (
        v1.join(lag_z2, "id")
        .select(
            "id",
            F.when((F.col("_z") > 0) & (F.col("_lag2") > 0), "HH")
            .when((F.col("_z") <= 0) & (F.col("_lag2") > 0), "LH")
            .when((F.col("_z") <= 0) & (F.col("_lag2") <= 0), "LL")
            .otherwise("HL")
            .alias("quad"),
            ((F.col("_n") - 1) * F.col("_z") * F.col("_lag2") / F.col("_den"))
            .alias("local_i"),
        )
    )
