"""Deterministic corpus sampling and token-budget shard packing.

Training-data selection ops (engine-native; the reference has no corpus
surface — public practice: per-domain quota sampling and fixed-token-budget
output shards in C4/Dolma-style pipelines).  Everything is driven by the
repo's portable per-row RNG (CLAUDE.md): u = conv(substring(md5(
'seed:id:<op-tag>'),1,8),16,10) / 2^32, derived from row IDENTITY so
results are bit-identical at any parallelism and replayable by the DuckDB
oracle.  Each operator salts the preimage with its own tag ('sample',
'pps', 'shard') — CLAUDE.md's axis component — so composing stages under
ONE seed still draws independent randomness (without the tag, a quota
sample's low-u winners would be exactly the docs a same-seed weighted
sample keeps, and shard order would equal sample-rank order).

Scale shapes:
  * Bernoulli sampling is a pure filter — no shuffle, fully pushed.
  * Stratified quota sampling ranks per stratum.  A per-stratum window
    sort funnels each stratum through one reducer, so the hot path
    prefilters to ~OVERSAMPLE*quota candidates per stratum first (u is
    uniform, so the threshold quota*OVERSAMPLE/n_s keeps the winners with
    overwhelming margin) and ranks only the survivors; a per-stratum
    count guard falls back to unfiltered ranking for any stratum the
    prefilter underfilled, so the result is EXACTLY the top-quota-by-u
    set regardless.
  * Shard packing needs a global prefix sum.  One global orderBy window
    is a single-reducer plan, so the tokens are range-bucketed by the
    hash's high bits (order-preserving), prefix-summed WITHIN each bucket
    by a partitioned window, and stitched with per-bucket offsets — an
    n_buckets-row table whose own window stage is bounded by constant.
"""

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from crankshaft_spark.operators.dedup import _h32, h32_sql

__all__ = [
    "uniform_hash",
    "uniform_hash_sql",
    "corpus_sample",
    "corpus_split",
    "corpus_split_sql",
    "weighted_sample",
    "shard_pack",
]

#: 2^32 — the md5-prefix hash is 8 hex digits.
_M = 4294967296.0

#: candidate multiplier for the stratified prefilter (see module doc).
OVERSAMPLE = 4.0


def _hash32(seed, tag: str, *cols) -> Column:
    """Portable 32-bit row hash over 'seed:c1:...:tag' (dedup._h32 on the
    keyed preimage; tag is the domain-separation axis)."""
    return _h32(F.concat_ws(":", F.lit(str(seed)), *cols, F.lit(tag)))


def _hash32_sql(seed, tag: str, *exprs) -> str:
    parts = ", ".join(f"CAST({e} AS VARCHAR)" for e in exprs)
    return h32_sql(f"concat_ws(':', '{seed}', {parts}, '{tag}')")


def uniform_hash(seed, *cols, tag: str = "sample") -> Column:
    """Portable u in [0, 1): first 8 md5 hex digits of
    'seed:c1:c2:...:tag' over row-identity columns.  Identical in DuckDB
    via uniform_hash_sql — the CLAUDE.md portable-RNG recipe, with the
    operator's domain tag as the axis component."""
    return _hash32(seed, tag, *cols).cast("double") / F.lit(_M)


def uniform_hash_sql(seed, *exprs, tag: str = "sample") -> str:
    """DuckDB mirror of uniform_hash."""
    return f"({_hash32_sql(seed, tag, *exprs)} / {_M})"


def corpus_sample(docs: DataFrame, *, seed: int = 42,
                  id_col: str = "doc_id", fraction: float = None,
                  stratify_by: str = None, quota: int = None) -> DataFrame:
    """Deterministic sample of a document table.

    Two modes:
      * ``fraction`` — Bernoulli: keep rows with u < fraction.  Pure
        filter (no shuffle); expected fraction*n rows, independent of
        partitioning, reproducible from (seed, id).
      * ``stratify_by`` + ``quota`` — exact top-``quota``-by-u rows per
        stratum (e.g. per source/domain), the per-domain cap a crawl
        pipeline uses so no host dominates the corpus.

    Returns the input columns plus ``u`` (rounded 6dp) and, in quota
    mode, ``sample_rank`` (1-based within the stratum).
    """
    u = uniform_hash(seed, F.col(id_col))
    if fraction is not None:
        return (docs.withColumn("u", u)
                    .filter(F.col("u") < fraction)
                    .withColumn("u", F.round("u", 6)))
    if stratify_by is None or quota is None:
        raise ValueError("need fraction, or stratify_by and quota")

    s = F.col(stratify_by)
    # NULL is a legitimate stratum (unknown source/domain) — SQL GROUP BY
    # and PARTITION BY both treat it as its own group, but an equi-JOIN
    # key drops it, so the stratum-table joins below key on a prefixed
    # non-null surrogate ('n' for NULL, 'v:<value>' otherwise — the
    # prefix makes collision with a real value impossible).
    sk = F.when(s.isNull(), F.lit("n")).otherwise(
        F.concat(F.lit("v:"), s.cast("string")))
    cand = docs.withColumn("u", u).withColumn("_sk", sk)
    # prefilter: u uniform => the top-quota u's almost surely sit below
    # OVERSAMPLE*quota/n_s; the per-stratum flag table below makes the
    # 'almost' exact.  Three passes over the input total (counts,
    # survivor counts, final filter) — all joins are stratum-keyed
    # against per-stratum tables (one row per stratum; AQE picks
    # broadcast when they're small).
    counts = cand.groupBy("_sk").agg(F.count("*").alias("_n"))
    counts = counts.withColumn(
        "_thr",
        F.least(F.lit(1.0), F.lit(OVERSAMPLE * quota) / F.col("_n")))
    # guard: a stratum whose survivor count fell below min(quota, n)
    # skips the prefilter entirely (never triggers in practice with
    # OVERSAMPLE=4; keeps the result EXACTLY top-quota-by-u regardless)
    svc = (cand.join(counts, "_sk")
               .groupBy("_sk")
               .agg(F.sum((F.col("u") < F.col("_thr")).cast("long"))
                     .alias("_k"),
                    F.first("_n").alias("_n"), F.first("_thr").alias("_thr")))
    flags = svc.withColumn(
        "_fallback", F.col("_k") < F.least(F.lit(quota), F.col("_n")))
    keep = (cand.join(flags, "_sk")
                .filter((F.col("u") < F.col("_thr")) | F.col("_fallback"))
                .select(*cand.columns))
    w = Window.partitionBy("_sk").orderBy("u", id_col)
    return (keep.withColumn("sample_rank", F.row_number().over(w))
                .filter(F.col("sample_rank") <= quota)
                .withColumn("u", F.round("u", 6))
                .drop("_sk"))


def corpus_sample_oracle_sql(docs_sql: str, *, seed: int = 42,
                             id_col: str = "doc_id",
                             fraction: float = None,
                             stratify_by: str = None,
                             quota: int = None) -> str:
    """DuckDB mirror of corpus_sample (the prefilter is lossless, so the
    oracle is the direct top-quota-by-u definition)."""
    u = uniform_hash_sql(seed, id_col)
    if fraction is not None:
        return f"""
        SELECT * EXCLUDE (u), round(u, 6) AS u FROM (
          SELECT *, {u} AS u FROM ({docs_sql})) WHERE u < {fraction}"""
    # CAST to INTEGER: DuckDB row_number() is BIGINT where Spark
    # F.row_number() emits INT — values identical, but the driver's
    # result hash is TYPE-aware (round-3 red cell).
    return f"""
    SELECT * EXCLUDE (u, sample_rank), round(u, 6) AS u,
           CAST(sample_rank AS INTEGER) AS sample_rank
    FROM (
      SELECT *, row_number() OVER (
          PARTITION BY {stratify_by} ORDER BY u, {id_col}) AS sample_rank
      FROM (SELECT *, {u} AS u FROM ({docs_sql})))
    WHERE sample_rank <= {quota}"""


def weighted_sample(docs: DataFrame, *, target: int, weight_col: str,
                    seed: int = 42, id_col: str = "doc_id") -> DataFrame:
    """Poisson sample with inclusion probability proportional to weight
    (PPS: pi_i = target * w_i / sum(w)) — quality- or length-weighted
    corpus selection with expected size ``target``.

    Exactly portable across engines AND parallelism: weights are floored
    to 1e-6 fixed-point BIGINTs and summed as integers (commutative — a
    double sum would be partition-order sensitive, CLAUDE.md), and the
    inclusion test  h < pi * 2^32  is cross-multiplied into products of
    integer-derived doubles written in the SAME operand order as the
    oracle (IEEE multiplication is deterministic given identical
    operands).  Rows with pi >= 1 are always kept.  Negative weights are
    clamped to 0 (never sampled, never deflate other rows' pi); if every
    weight clamps to 0 the result is empty and the guarded pi division
    never runs (Spark 4 ANSI would otherwise raise DIVIDE_BY_ZERO).
    Two passes over the input by construction — the one-row total must
    be known before the filter can evaluate (broadcast back; the corpus
    itself never shuffles)."""
    wfp = F.greatest(
        F.floor(F.col(weight_col) * F.lit(1e6)).cast("long"), F.lit(0))
    tot = docs.agg(F.sum(wfp).alias("_W"))
    h = _hash32(seed, "pps", F.col(id_col))
    lhs = h.cast("double") * F.col("_W").cast("double")
    rhs = (F.lit(float(target)) * wfp.cast("double")) * F.lit(_M)
    pi = F.when(
        F.col("_W") > 0,
        F.round((F.lit(float(target)) * wfp.cast("double"))
                / F.col("_W").cast("double"), 6))
    return (docs.crossJoin(F.broadcast(tot))
                .filter(lhs < rhs)
                .select(*docs.columns, pi.alias("pi")))


def weighted_sample_oracle_sql(docs_sql: str, *, target: int,
                               weight_col: str, seed: int = 42,
                               id_col: str = "doc_id",
                               cols: str = "* EXCLUDE (wfp, h, _W)"
                               ) -> str:
    """DuckDB mirror of weighted_sample — identical operand order and
    the same clamp/guard.  The default ``cols`` excludes the internal
    helper columns so the default output matches the Spark contract
    (input columns + pi)."""
    wfp = f"greatest(CAST(floor({weight_col} * 1e6) AS BIGINT), 0)"
    h = _hash32_sql(seed, "pps", id_col)
    return f"""
    SELECT {cols},
           CASE WHEN _W > 0 THEN
             round((CAST({target} AS DOUBLE) * CAST(wfp AS DOUBLE))
                   / CAST(_W AS DOUBLE), 6) END AS pi
    FROM (SELECT *, {wfp} AS wfp, {h} AS h FROM ({docs_sql})),
         (SELECT sum({wfp}) AS _W FROM ({docs_sql}))
    WHERE CAST(h AS DOUBLE) * CAST(_W AS DOUBLE)
          < (CAST({target} AS DOUBLE) * CAST(wfp AS DOUBLE)) * {_M}"""


def shard_pack(docs: DataFrame, *, budget: int, tokens_col: str = "tokens",
               id_col: str = "doc_id", seed: int = 42,
               n_buckets: int = 256) -> DataFrame:
    """Assign each doc to a fixed-token-budget output shard.

    Docs are laid out in a deterministic shuffled order (portable hash of
    (seed, id) — decorrelates shards from crawl order) and cut greedily:
    ``shard_id = cum_tokens_before_this_doc div budget``.  Exact integer
    arithmetic end to end.

    Distributed prefix sum: the hash is range-bucketed (order-
    preserving high bits) into ``n_buckets``; within-bucket cumulative
    sums come from a PARTITIONED window; bucket offsets come from a
    window over the ``n_buckets``-row totals table (bounded by constant)
    and broadcast back.  No unbounded single-reducer window at any size.
    """
    h = _hash32(seed, "shard", F.col(id_col))
    t = F.col(tokens_col).cast("long")
    rows = docs.withColumn("_h", h).withColumn(
        "_b", (F.col("_h") / F.lit(int(_M) // n_buckets)).cast("long"))
    w = (Window.partitionBy("_b").orderBy("_h", id_col)
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    rows = rows.withColumn("_cum_in_b", F.sum(t).over(w))
    # per-bucket offsets: the totals table is <= n_buckets rows, so its
    # global-order window is a bounded single-reducer stage by design.
    # The totals branch re-traverses the input lineage (two consumers of
    # `rows`, and exchange reuse can't fire because column pruning gives
    # the branches different exchanges) — deliberately so: the pruned
    # recompute carries only (id, tokens) [no text], map-side partial
    # aggregation collapses it to ~n_buckets rows per task BEFORE its
    # exchange, and the alternatives are worse (persisting the corpus,
    # deriving totals from the windowed max — which pays the window
    # sort twice — or a wide join back by id).
    woff = (Window.orderBy("_b")
                  .rowsBetween(Window.unboundedPreceding, -1))
    odf = (rows.groupBy("_b").agg(F.sum(t).alias("_s"))
               .withColumn("_off", F.coalesce(F.sum("_s").over(woff),
                                              F.lit(0)))
               .drop("_s"))
    out = (rows.join(F.broadcast(odf), "_b")
               .withColumn("_cum_before",
                           F.col("_off") + F.col("_cum_in_b") - t)
               .withColumn("shard_id",
                           F.expr(f"_cum_before div {int(budget)}")))
    return out.select(*docs.columns, "shard_id")


def shard_pack_oracle_sql(docs_sql: str, *, budget: int,
                          tokens_col: str = "tokens",
                          id_col: str = "doc_id", seed: int = 42,
                          cols: str = "* EXCLUDE (_h)") -> str:
    """DuckDB mirror of shard_pack: one global window (the oracle runs at
    test scale), same hash order, same integer arithmetic.  Windowed SUM
    of BIGINTs is exact whatever the accumulation tree, so the
    segment-tree caveat (CLAUDE.md) doesn't bite.  The default ``cols``
    excludes the internal hash so the default output matches the Spark
    contract (input columns + shard_id)."""
    h = _hash32_sql(seed, "shard", id_col)
    # CAST to BIGINT: DuckDB widens the windowed SUM(BIGINT) to HUGEINT
    # (and // keeps it) where Spark's `div` stays LONG — values are
    # identical but the driver's result hash is TYPE-aware (round-3 red
    # cell), so pin the output type explicitly.
    return f"""
    SELECT {cols},
           CAST((sum({tokens_col}) OVER (ORDER BY _h, {id_col}
              ROWS UNBOUNDED PRECEDING) - {tokens_col}) // {budget}
           AS BIGINT) AS shard_id
    FROM (SELECT *, {h} AS _h FROM ({docs_sql}))"""


def _split_bounds(fractions) -> list:
    """[(name, cumulative_upper)] with the running sum built by repeated
    left-to-right addition — the oracle repeats the identical operand
    order, so the band edges are the same IEEE doubles in both engines."""
    items = list(fractions.items()) if isinstance(fractions, dict) \
        else list(fractions)
    if len(items) < 2:
        raise ValueError("corpus_split needs at least two bands")
    total = 0.0
    bounds = []
    for name, frac in items:
        if frac <= 0:
            raise ValueError(f"split fraction for {name!r} must be > 0")
        total = total + float(frac)
        bounds.append((str(name), total))
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions sum to {total}, expected 1")
    return bounds


def corpus_split(docs: DataFrame, *, fractions, seed: int = 42,
                 id_col: str = "doc_id", out_col: str = "split") -> DataFrame:
    """Deterministic disjoint train/val/test assignment.

    u = portable md5-u over (seed, id, tag='split') — the same
    domain-separated RNG recipe as corpus_sample, so composing split
    with sampling/packing stages never correlates draws.  The split is a
    pure per-row projection: no shuffle, streaming-safe, and STABLE
    UNDER CORPUS GROWTH — adding or removing other documents never moves
    an existing doc's band (the property that keeps eval sets frozen
    across crawl refreshes; a fraction-boundary change only reassigns
    docs whose u crosses the moved edge).

    ``fractions`` is an ordered mapping or (name, frac) sequence summing
    to 1; doc goes to the first band whose cumulative upper bound
    exceeds u (the last band is the CASE ELSE, closing the u < 1 edge).
    Expected band sizes are exact in distribution; realized sizes are
    binomial like any hash split.
    """
    bounds = _split_bounds(fractions)
    u = uniform_hash(seed, F.col(id_col), tag="split")
    expr = F.lit(bounds[-1][0])
    for name, hi in reversed(bounds[:-1]):
        expr = F.when(u < F.lit(hi), F.lit(name)).otherwise(expr)
    return docs.withColumn(out_col, expr)


def corpus_split_sql(fractions, *, seed: int = 42,
                     id_expr: str = "doc_id",
                     out_col: str = "split") -> str:
    """DuckDB mirror of corpus_split's band CASE as a SQL fragment
    (append to a SELECT list).  Band edges are Python float reprs —
    DuckDB parses them to the identical doubles, and u is the shared
    portable-hash recipe, so assignment matches Spark bit-for-bit."""
    bounds = [(name.replace("'", "''"), hi)
              for name, hi in _split_bounds(fractions)]
    u = uniform_hash_sql(seed, id_expr, tag="split")
    arms = " ".join(f"WHEN {u} < {hi!r} THEN '{name}'"
                    for name, hi in bounds[:-1])
    return f"CASE {arms} ELSE '{bounds[-1][0]}' END AS {out_col}"
