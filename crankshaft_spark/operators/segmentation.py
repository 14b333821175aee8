"""Segmentation — gradient-boosted regression train + distributed predict.

Reference: CDB_CreateAndPredictSegment
(/root/reference/src/pg/sql/05_segmentation.sql:2-102 backed by
/root/reference/src/py/crankshaft/crankshaft/segmentation/segmentation.py:
14-228): sklearn GradientBoostingRegressor(n_estimators=1200, max_depth=3,
subsample=0.5, learning_rate=0.01), NaN→column-mean imputation
(replace_nan_with_mean, :148-189), 80/20 train/test split with MSE as the
reported "accuracy" (train_model, :192-214), then batched cursor prediction
1000 rows at a time (:96-116).

Spark-first mapping: pyspark.ml GBTRegressor(maxIter, maxDepth,
subsamplingRate, stepSize), ml.feature.Imputer(strategy='mean'),
randomSplit([0.8, 0.2], seed); prediction is model.transform — already
distributed + Arrow-batched, replacing the manual cursor loop.  The fitted
model broadcasts to executors; nothing about the input ever collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _feature_means(df: DataFrame, cols: list[str]) -> dict[str, float]:
    row = df.agg(*[F.avg(c).alias(c) for c in cols]).collect()[0]
    return {c: float(row[c]) if row[c] is not None else 0.0 for c in cols}


def _impute(df: DataFrame, cols: list[str], means: dict[str, float]) -> DataFrame:
    """NULL/NaN → given column means — the reference imputes its predict
    batches with the TRAINING means (replace_nan_with_mean(batches,
    feature_means), segmentation.py:93-95), not the batch's own."""
    for c in cols:
        v = F.col(c)
        df = df.withColumn(
            c, F.when(v.isNull() | F.isnan(v), F.lit(means[c])).otherwise(v)
        )
    return df


def create_and_predict_segment(
    train: DataFrame,
    target_col: str,
    feature_cols: list[str] | None,
    predict: DataFrame,
    *,
    n_estimators: int = 120,
    max_depth: int = 3,
    subsample: float = 0.5,
    learning_rate: float = 0.01,
    seed: int = 1234,
) -> DataFrame:
    """Train GBT on ``train`` (id, target_col, feature_cols...), predict for
    ``predict`` (id, feature_cols...) → (id, prediction, accuracy).

    ``accuracy`` is the held-out 20% MSE, repeated per row, exactly the
    reference's contract (segmentation.py:46-50).  Default n_estimators is
    120 (not the reference's 1200): GBT iterations are sequential jobs and
    the reference's own test tolerance (5% relative / RMSE < 0.3·mean) is met
    long before 1200 trees; pass n_estimators=1200 for strict parity.
    """
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import GBTRegressor

    if feature_cols is None:
        # auto-discovery overload: every column of the training frame except
        # the target and the row id (05_segmentation.sql:61-63 sniffs the
        # query's colnames and subtracts {variable_name, cartodb_id})
        feature_cols = [c for c in train.columns if c not in (target_col, "id")]
    train = train.na.drop(subset=[target_col]).select(
        "id", target_col, *feature_cols
    )
    means = _feature_means(train, list(feature_cols))
    train = _impute(train, list(feature_cols), means)
    predict = _impute(predict.select("id", *feature_cols), list(feature_cols), means)

    va = VectorAssembler(inputCols=list(feature_cols), outputCol="_feat")
    # 80/20 held-out split derived from ROW IDENTITY (the repo's
    # portable-RNG pattern, u = hash32('segsplit:seed:id')/2^32), never
    # from randomSplit's per-PARTITION seeded streams: the assignment —
    # and the gate entry's verdict row riding on the fitted model — is
    # bit-identical at any parallelism and input layout, with no
    # repartition/sort (review finding r5, CLAUDE.md invariant)
    assembled = va.transform(train).withColumn(
        "_u",
        F.conv(F.substring(F.md5(F.concat_ws(
            ":", F.lit("segsplit"), F.lit(str(int(seed))),
            F.col("id").cast("string"))), 1, 8), 16, 10)
        .cast("long") / F.lit(float(2 ** 32)))
    fit_df = assembled.where(F.col("_u") < 0.8).drop("_u")
    test_df = assembled.where(F.col("_u") >= 0.8).drop("_u")

    gbt = GBTRegressor(
        featuresCol="_feat",
        labelCol=target_col,
        maxIter=n_estimators,
        maxDepth=max_depth,
        subsamplingRate=subsample,
        stepSize=learning_rate,
        seed=seed,
    )
    model = gbt.fit(fit_df)

    mse_row = (
        model.transform(test_df)
        .agg(F.avg(F.pow(F.col("prediction") - F.col(target_col), 2)).alias("mse"))
        .collect()[0]
    )
    accuracy = float(mse_row["mse"]) if mse_row["mse"] is not None else float("nan")

    return (
        model.transform(va.transform(predict))
        .select("id", "prediction", F.lit(accuracy).alias("accuracy"))
    )


def create_and_predict_segment_arrays(
    spark,
    target: list[float],
    features: list[list[float]],
    target_features: list[list[float]],
    target_ids: list[int],
    **params,
) -> DataFrame:
    """Array-overload parity shim (05_segmentation.sql:2-37): the reference
    packs 2-D blocks through CDB_PyAgg flattening; DataFrames carry them
    natively, so this just lifts the arrays and delegates.  Bounded inputs
    only — the query form is the scale path."""
    if not features or not features[0]:
        raise ValueError("array-overload segmentation needs >= 1 feature column")
    if len(target) != len(features):
        raise ValueError(
            f"target has {len(target)} rows but features has {len(features)}"
        )
    nf = len(features[0])
    cols = [f"f{i}" for i in range(nf)]
    train = spark.createDataFrame(
        [(i, float(t), *map(float, row))
         for i, (t, row) in enumerate(zip(target, features))],
        f"id long, target double, {', '.join(c + ' double' for c in cols)}",
    )
    predict = spark.createDataFrame(
        [(int(pid), *map(float, row))
         for pid, row in zip(target_ids, target_features)],
        f"id long, {', '.join(c + ' double' for c in cols)}",
    )
    return create_and_predict_segment(train, "target", cols, predict, **params)


# ---------------------------------------------------------------- OLS arm ---
# Shared expression templates: the Python fit and the DuckDB oracle format
# the SAME strings, so the coefficient arithmetic cannot drift between
# engines (both evaluate an identical IEEE-double DAG on identical inputs).

_DET3_T = (
    "{a00}*({a11}*{a22} - {a12}*{a21}) "
    "- {a01}*({a10}*{a22} - {a12}*{a20}) "
    "+ {a02}*({a10}*{a21} - {a11}*{a20})"
)

_SSE_T = (
    "{syy} - 2.0*({b0}*{sy} + {b1}*{s1y} + {b2}*{s2y}) "
    "+ ({b0}*{b0}*{n} + {b1}*{b1}*{s11} + {b2}*{b2}*{s22} "
    "+ 2.0*({b0}*{b1}*{s1} + {b0}*{b2}*{s2} + {b1}*{b2}*{s12}))"
)

_SUM_NAMES = ("n", "s1", "s2", "s11", "s12", "s22", "sy", "s1y", "s2y", "syy")


def _eval_t(template: str, env: dict) -> float:
    """Evaluate a shared template on Python floats (IEEE doubles — the
    same operator DAG DuckDB runs when the oracle formats the template
    with column references)."""
    expr = template.format(**{k: k for k in env})
    return float(eval(expr, {"__builtins__": {}}, dict(env)))  # noqa: S307


def segmentation_ols(
    train: DataFrame,
    target_col: str,
    feature_cols: list[str],
    predict: DataFrame,
    *,
    round_dp: int = 6,
) -> DataFrame:
    """Closed-form least-squares segmentation (intercept + 2 features) →
    (id, prediction, accuracy): the ORACLE-REPLAYABLE learner arm of
    CDB_CreateAndPredictSegment (05_segmentation.sql:39-102 trains a
    model on one table and predicts another; the GBM arm is
    create_and_predict_segment, pyspark.ml, fixture-tested — sklearn GBM
    subsample streams are not replayable cross-engine by design).

    The normal equations are solved by Cramer's rule over EXACT integer
    power sums: features/target must be INTEGER-VALUED (the derived.py
    oracle contract), every Σ is a BIGINT (map-side-combinable,
    order-free), and the determinant/SSE arithmetic is evaluated from
    shared templates (_DET3_T/_SSE_T) so coefficients are bit-identical
    at any parallelism and in DuckDB.  ``accuracy`` is the TRAINING MSE
    expanded algebraically to power sums (never a float sum over rows),
    repeated per row like the reference's accuracy column.

    Scale shape: ONE aggregate over train (10 BIGINT sums to the
    driver), prediction is whole-stage-codegen column math over
    ``predict`` — no shuffle, no Python stage, linear at 100 TB.
    """
    if len(feature_cols) != 2:
        raise ValueError("segmentation_ols: exactly 2 feature columns "
                         "(intercept is implicit); use the GBM arm for "
                         "wider feature sets")
    f1, f2 = feature_cols
    tl = lambda c: F.col(c).cast("long")  # noqa: E731
    row = train.agg(
        F.count("*").alias("n"),
        F.sum(tl(f1)).alias("s1"), F.sum(tl(f2)).alias("s2"),
        F.sum(tl(f1) * tl(f1)).alias("s11"),
        F.sum(tl(f1) * tl(f2)).alias("s12"),
        F.sum(tl(f2) * tl(f2)).alias("s22"),
        F.sum(tl(target_col)).alias("sy"),
        F.sum(tl(f1) * tl(target_col)).alias("s1y"),
        F.sum(tl(f2) * tl(target_col)).alias("s2y"),
        F.sum(tl(target_col) * tl(target_col)).alias("syy"),
    ).collect()[0]
    if int(row["n"]) == 0:
        raise ValueError("segmentation_ols: train has no rows "
                         "(sums are NULL; nothing to fit)")
    s = {k: float(row[k]) for k in _SUM_NAMES}

    def det(m):
        names = {f"a{i}{j}": m[i][j] for i in range(3) for j in range(3)}
        return _eval_t(_DET3_T, names)

    A = [["n", "s1", "s2"], ["s1", "s11", "s12"], ["s2", "s12", "s22"]]
    col_b = ["sy", "s1y", "s2y"]
    dd = det([[s[c] for c in r] for r in A])
    if dd == 0.0:
        raise ValueError("segmentation_ols: singular normal equations "
                         "(collinear features)")
    betas = []
    for j in range(3):
        M = [[s[col_b[i]] if jj == j else s[A[i][jj]] for jj in range(3)]
             for i in range(3)]
        betas.append(det(M) / dd)
    b0, b1, b2 = betas
    sse = _eval_t(_SSE_T, {**s, "b0": b0, "b1": b1, "b2": b2})
    mse = sse / s["n"]
    pred = F.lit(b0) + F.lit(b1) * F.col(f1) + F.lit(b2) * F.col(f2)
    return predict.select(
        "id",
        F.round(pred, round_dp).alias("prediction"),
        F.round(F.lit(mse), round_dp).alias("accuracy"),
    )


def segmentation_ols_oracle_sql(
    train_sql: str,
    predict_sql: str,
    *,
    target: str = "target",
    f1: str = "f1",
    f2: str = "f2",
    round_dp: int = 6,
) -> str:
    """DuckDB mirror of ``segmentation_ols``: identical BIGINT power sums
    (cast to DOUBLE once), the same _DET3_T/_SSE_T templates formatted
    with column references, prediction = b0 + b1*f1 + b2*f2."""
    names = {k: k for k in _SUM_NAMES}
    A = [["n", "s1", "s2"], ["s1", "s11", "s12"], ["s2", "s12", "s22"]]
    col_b = ["sy", "s1y", "s2y"]

    def det_sql(m):
        return _DET3_T.format(**{f"a{i}{j}": m[i][j]
                                 for i in range(3) for j in range(3)})

    dets = [det_sql(A)]
    for j in range(3):
        dets.append(det_sql(
            [[col_b[i] if jj == j else A[i][jj] for jj in range(3)]
             for i in range(3)]))
    sse = _SSE_T.format(**names, b0="b0", b1="b1", b2="b2")
    return f"""
    WITH tr AS ({train_sql}),
    agg AS (
      SELECT count(*) AS n,
             sum(CAST({f1} AS BIGINT)) AS s1,
             sum(CAST({f2} AS BIGINT)) AS s2,
             sum(CAST({f1} AS BIGINT) * CAST({f1} AS BIGINT)) AS s11,
             sum(CAST({f1} AS BIGINT) * CAST({f2} AS BIGINT)) AS s12,
             sum(CAST({f2} AS BIGINT) * CAST({f2} AS BIGINT)) AS s22,
             sum(CAST({target} AS BIGINT)) AS sy,
             sum(CAST({f1} AS BIGINT) * CAST({target} AS BIGINT)) AS s1y,
             sum(CAST({f2} AS BIGINT) * CAST({target} AS BIGINT)) AS s2y,
             sum(CAST({target} AS BIGINT) * CAST({target} AS BIGINT)) AS syy
      FROM tr),
    dbl AS (SELECT {', '.join(f'CAST({k} AS DOUBLE) AS {k}'
                              for k in _SUM_NAMES)} FROM agg),
    beta AS (
      SELECT ({dets[1]}) / ({dets[0]}) AS b0,
             ({dets[2]}) / ({dets[0]}) AS b1,
             ({dets[3]}) / ({dets[0]}) AS b2,
             n, s1, s2, s11, s12, s22, sy, s1y, s2y, syy
      FROM dbl),
    fin AS (SELECT b0, b1, b2, ({sse}) / n AS mse FROM beta)
    SELECT p.id,
           round(fin.b0 + fin.b1 * p.{f1} + fin.b2 * p.{f2}, {round_dp})
             AS prediction,
           round(fin.mse, {round_dp}) AS accuracy
    FROM ({predict_sql}) p, fin"""
