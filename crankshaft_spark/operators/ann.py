"""Similarity search over embedding columns.

Engine-native addition for training-data pipelines: brute-force cosine
top-k as the exact baseline, and an LSH-bucketed variant (sign-random-
projection buckets) as the scale path.  The dot products run JVM-side via
``zip_with``/``aggregate`` higher-order functions — no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot_expr(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda u, v: u * v),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )


def _norm_expr(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, t: acc + t * t)
    )


def cosine_topk(
    embeddings: DataFrame,
    probe: list[float],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cos, rank) — exact brute-force top-k by cosine to ``probe``.

    One scan + one top-k; ranking ties broken by id for determinism.
    """
    p = F.array(*[F.lit(float(v)) for v in probe])
    vec = F.col(vec_col).cast("array<double>")
    scored = embeddings.select(
        F.col(id_col),
        (_dot_expr(vec, p) / (_norm_expr(vec) * _norm_expr(p))).alias("cos"),
    )
    w = Window.orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def srp_bucket(
    embeddings: DataFrame,
    planes: list[list[float]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-random-projection LSH bucket id per vector → (vec_id, bucket).

    ``planes`` are fixed (seeded, versioned) hyperplanes; bucket is the
    packed sign bit-vector.  ANN = equi-join on bucket (plus neighboring
    buckets for recall) then exact cosine re-rank — the same
    filter-and-refine shape as the spatial core.
    """
    vec = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(v)) for v in plane])
        bit = F.when(_dot_expr(vec, p) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket + (bit.cast("long") * F.lit(2**i))
    return embeddings.select(F.col(id_col), bucket.alias("bucket"))


def ann_topk_srp(
    embeddings: DataFrame,
    probe: list[float],
    planes: list[list[float]],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: restrict to the probe's SRP bucket, exact re-rank."""
    buckets = srp_bucket(embeddings, planes, id_col=id_col, vec_col=vec_col)
    probe_bucket = 0
    for i, plane in enumerate(planes):
        dot = sum(u * v for u, v in zip(probe, plane))
        probe_bucket += (1 if dot >= 0 else 0) * 2**i
    cands = embeddings.join(
        buckets.where(F.col("bucket") == probe_bucket).select(id_col), id_col
    )
    return cosine_topk(cands, probe, k, id_col=id_col, vec_col=vec_col)
