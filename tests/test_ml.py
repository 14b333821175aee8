"""KMeans + segmentation vs the reference's own fixtures and assertions
(test_clustering_kmeans.py, test_segmentation.py)."""

from __future__ import annotations

import numpy as np
import pytest

from crankshaft_spark.operators.kmeans import kmeans_nonspatial, kmeans_spatial
from crankshaft_spark.operators.segmentation import create_and_predict_segment

from conftest import load_fixture


@pytest.fixture(scope="module")
def kmeans_fixture():
    return load_fixture("kmeans.json")


def test_kmeans_spatial_two_clusters(spark, kmeans_fixture):
    """Reference asserts 2 clusters of 20 points each
    (test_clustering_kmeans.py:35-51)."""
    row = kmeans_fixture[0]
    pts = spark.createDataFrame(
        list(zip(row["ids"], row["xs"], row["ys"])), "id long, x double, y double"
    )
    out = kmeans_spatial(pts, k=2).collect()
    assert len(out) == len(row["ids"])
    labels = {}
    for r in out:
        labels.setdefault(r["cluster_no"], []).append(r["id"])
    sizes = sorted(len(v) for v in labels.values())
    assert sizes == [20, 20]


def test_kmeans_nonspatial_sklearn_example(spark):
    """Reference uses the sklearn doc example: 6 points, 2 clusters of 3
    (test_clustering_kmeans.py:61-87); silhouette in [-1, 1], inertia > 0."""
    data = [(1, 1.0, 2.0), (2, 1.0, 4.0), (3, 1.0, 0.0),
            (4, 4.0, 2.0), (5, 4.0, 4.0), (6, 4.0, 0.0)]
    df = spark.createDataFrame(data, "id long, a double, b double")
    out = kmeans_nonspatial(df, ["a", "b"], k=2, standardize=True).collect()
    assert len(out) == 6
    by_label = {}
    for r in out:
        by_label.setdefault(r["cluster_label"], []).append(r["id"])
        assert -1.0 <= r["silhouette"] <= 1.0
        assert r["inertia"] >= 0.0
        assert set(r["cluster_center"].keys()) == {"a", "b"}
    # sklearn example splits on the `a` column: {1,2,3} vs {4,5,6}
    groups = sorted(sorted(v) for v in by_label.values())
    assert groups == [[1, 2, 3], [4, 5, 6]]
    # rows in the same cluster share the same center map
    for rows in by_label.values():
        centers = {
            tuple(sorted(r["cluster_center"].items()))
            for r in out if r["id"] in rows
        }
        assert len(centers) == 1


def test_segmentation_fixture_tolerance(spark):
    """Train on model_data.json (m1, m2), predict predict_data.json; the
    reference accepts RMSE < 0.3 * mean(true) and per-row accuracy (MSE)
    < 0.01 (test_segmentation.py:118-139)."""
    model_data = load_fixture("model_data.json")[0]
    predict_data = load_fixture("predict_data.json")
    true_result = [r[0] for r in load_fixture("true_result.json")]
    ids = load_fixture("data.json")[0]["ids"]

    train_rows = list(zip(
        range(len(model_data["target"])),
        model_data["target"], model_data["m1"], model_data["m2"],
    ))
    train = spark.createDataFrame(
        train_rows, "id long, target double, m1 double, m2 double"
    )
    feats = predict_data[0]["features"]  # one row: features[100][2]
    pred_rows = [
        (ids[i], float(f[0]), float(f[1])) for i, f in enumerate(feats)
    ]
    predict = spark.createDataFrame(pred_rows, "id long, m1 double, m2 double")

    out = create_and_predict_segment(
        train, "target", ["m1", "m2"], predict,
        n_estimators=150, learning_rate=0.08, seed=1234,
    )
    got = {r["id"]: (r["prediction"], r["accuracy"]) for r in out.collect()}
    assert len(got) == len(ids)
    preds = np.array([got[i][0] for i in ids])
    truth = np.array(true_result)
    rmse = float(np.sqrt(np.mean((preds - truth) ** 2)))
    assert rmse < 0.3 * float(np.mean(truth))
    assert all(np.isfinite(v[1]) for v in got.values())


def test_segmentation_imputes_nan(spark):
    train = spark.createDataFrame(
        [(i, float(i % 7), float(i), None if i % 10 == 0 else float(2 * i))
         for i in range(60)],
        "id long, target double, m1 double, m2 double",
    )
    predict = spark.createDataFrame(
        [(100, 3.0, None)], "id long, m1 double, m2 double"
    )
    out = create_and_predict_segment(
        train, "target", ["m1", "m2"], predict, n_estimators=5
    ).collect()
    assert len(out) == 1 and np.isfinite(out[0]["prediction"])


def test_segmentation_auto_features(spark):
    """feature_cols=None discovers every non-target, non-id column
    (05_segmentation.sql:61-63)."""
    train = spark.createDataFrame(
        [(i, float(i % 7), float(i), float(2 * i)) for i in range(60)],
        "id long, target double, m1 double, m2 double",
    )
    predict = spark.createDataFrame(
        [(100, 3.0, 6.0)], "id long, m1 double, m2 double"
    )
    auto = create_and_predict_segment(
        train, "target", None, predict, n_estimators=5
    ).collect()
    explicit = create_and_predict_segment(
        train, "target", ["m1", "m2"], predict, n_estimators=5
    ).collect()
    assert auto[0]["prediction"] == explicit[0]["prediction"]


def test_kmeans_lloyd_matches_numpy_and_parallelism(spark):
    """Deterministic Lloyd: bit-identical to a direct numpy run of the same
    spec, and invariant to input partitioning."""
    from crankshaft_spark.operators.kmeans import kmeans_lloyd

    rows = [(i, float((i * 97) % 113), float((i * 31) % 71)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, x double, y double")

    got = {r["id"]: r["cluster"]
           for r in kmeans_lloyd(df, k=6, iters=4).collect()}
    got_repart = {r["id"]: r["cluster"]
                  for r in kmeans_lloyd(df.repartition(17), k=6, iters=4).collect()}
    assert got == got_repart

    # direct numpy replication of the documented spec
    pts = np.array([(x, y) for _, x, y in rows])
    centers = pts[:6].copy()  # ids 0..5 are the k lowest
    for _ in range(4):
        d2 = ((pts[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
        lab = d2.argmin(axis=1)  # argmin takes lowest index on ties
        for c in range(6):
            if (lab == c).any():
                centers[c] = pts[lab == c].mean(axis=0)
    d2 = ((pts[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
    lab = d2.argmin(axis=1)
    for i, (rid, _, _) in enumerate(rows):
        assert got[rid] == lab[i], rid


def test_kmeans_lloyd_best_matches_numpy_and_parallelism(spark):
    """Best-of-n_init Lloyd: the winner is the restart with the smallest
    fixed-point inertia (ties to the lowest restart index), replicated
    directly from the documented spec; invariant to input partitioning."""
    import hashlib
    import math

    from crankshaft_spark.operators.kmeans import kmeans_lloyd_best

    k, iters, n_init, seed = 5, 3, 3, 7
    rows = [(i, float((i * 97) % 113), float((i * 31) % 71))
            for i in range(1, 241)]
    df = spark.createDataFrame(rows, "id long, x double, y double")

    res = kmeans_lloyd_best(df, k=k, iters=iters, n_init=n_init,
                            seed=seed).collect()
    got = {r["id"]: r["cluster"] for r in res}
    best_init = {r["best_init"] for r in res}
    inertia_fx = {r["inertia_fx"] for r in res}
    assert len(best_init) == 1 and len(inertia_fx) == 1
    got_rep = {r["id"]: r["cluster"]
               for r in kmeans_lloyd_best(df.repartition(13), k=k,
                                          iters=iters, n_init=n_init,
                                          seed=seed).collect()}
    assert got == got_rep

    pts = np.array([(x, y) for _, x, y in rows])
    ids = [rid for rid, _, _ in rows]

    def h32(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    runs = []
    for j in range(n_init):
        order = sorted(range(len(ids)),
                       key=lambda i: (h32(f"km:{seed}:{j}:{ids[i]}"), ids[i]))
        centers = pts[order[:k]].copy()
        for _ in range(iters):
            d2 = ((pts[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
            lab = d2.argmin(axis=1)
            for c in range(k):
                if (lab == c).any():
                    centers[c] = pts[lab == c].mean(axis=0)
        d2 = ((pts[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
        lab = d2.argmin(axis=1)
        fx = sum(int(math.floor(v * 1000.0)) for v in d2.min(axis=1))
        runs.append((fx, j, lab))
    fx_best, j_best, lab_best = min(runs, key=lambda t: (t[0], t[1]))
    assert best_init == {j_best}
    assert inertia_fx == {fx_best}
    for i, rid in enumerate(ids):
        assert got[rid] == lab_best[i], rid


def test_segmentation_array_overload(spark):
    from crankshaft_spark.operators.segmentation import (
        create_and_predict_segment_arrays,
    )

    target = [float(i % 5) for i in range(50)]
    feats = [[float(i), float(2 * i)] for i in range(50)]
    out = create_and_predict_segment_arrays(
        spark, target, feats, [[3.0, 6.0], [10.0, 20.0]], [7, 9],
        n_estimators=5,
    ).collect()
    assert sorted(r["id"] for r in out) == [7, 9]
    assert all(np.isfinite(r["prediction"]) for r in out)


def test_kmeans_lloyd_silhouette_matches_numpy(spark):
    """Column-algebra silhouette equals the direct pairwise computation
    (sqeuclidean, sklearn conventions) over the same Lloyd assignment."""
    from crankshaft_spark.operators.kmeans import (
        kmeans_lloyd, kmeans_lloyd_silhouette,
    )

    rows = [(i, float((i * 37) % 50), float((i * 11) % 40)) for i in range(120)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    got = {r["id"]: (r["cluster"], r["silhouette"], r["inertia"])
           for r in kmeans_lloyd_silhouette(df, k=4, iters=4).collect()}

    lab = {r["id"]: r["cluster"] for r in kmeans_lloyd(df, k=4, iters=4).collect()}
    pts = {i: np.array([x, y]) for i, x, y in rows}
    clusters = {}
    for i, c in lab.items():
        clusters.setdefault(c, []).append(i)
    inertia = 0.0
    for c, members in clusters.items():
        mu = np.mean([pts[i] for i in members], axis=0)
        inertia += sum(((pts[i] - mu) ** 2).sum() for i in members)
    for i, c in lab.items():
        own = clusters[c]
        if len(own) > 1:
            a = np.mean([((pts[i] - pts[j]) ** 2).sum()
                         for j in own if j != i])
        else:
            a = 0.0
        b = min(
            np.mean([((pts[i] - pts[j]) ** 2).sum() for j in members])
            for cc, members in clusters.items() if cc != c
        )
        sil = (b - a) / max(a, b) if len(own) > 1 and max(a, b) > 0 else 0.0
        assert got[i][0] == c
        assert got[i][1] == pytest.approx(sil, abs=1e-6), i
        assert got[i][2] == pytest.approx(inertia, abs=1.0)


def test_segmentation_ols_recovers_linear_model(spark):
    """Noiseless integer-linear target → OLS reproduces it exactly
    (mse 0, predictions equal the plane), bit-identical at any
    parallelism; non-2-feature requests are rejected."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from crankshaft_spark.operators.segmentation import segmentation_ols

    rows = [(i, float((i * 13) % 50), float((i * 7) % 30),
             float(4 * ((i * 13) % 50) + 9 * ((i * 7) % 30) + 5))
            for i in range(1, 201)]
    train = spark.createDataFrame(
        rows, "id long, f1 double, f2 double, target double")
    predict = train.select("id", "f1", "f2")
    out = {r["id"]: r for r in segmentation_ols(
        train, "target", ["f1", "f2"], predict).collect()}
    for i, f1, f2, t in rows:
        assert out[i]["prediction"] == _pytest.approx(t, abs=1e-6)
        assert out[i]["accuracy"] == _pytest.approx(0.0, abs=1e-6)
    re = {r["id"]: r for r in segmentation_ols(
        train.repartition(7), "target", ["f1", "f2"],
        predict.repartition(5)).collect()}
    assert {i: (r["prediction"], r["accuracy"]) for i, r in out.items()} \
        == {i: (r["prediction"], r["accuracy"]) for i, r in re.items()}
    with _pytest.raises(ValueError, match="2 feature"):
        segmentation_ols(train, "target", ["f1"], predict)


def test_kmeans_features_lloyd_deterministic_and_sane(spark):
    """Weighted multi-dim Lloyd: bit-identical at any parallelism,
    silhouette bounded, all k clusters populated on spread data, and the
    weighted metric actually standardizes (a dimension with 100x the
    raw scale must not dominate the clustering)."""
    from collections import Counter

    from crankshaft_spark.operators.kmeans import kmeans_features_lloyd

    rows = [(i, float((i * 9973) % 24000), float((i * 7919) % 9600),
             float((i * 31) % 240)) for i in range(1, 401)]
    df = spark.createDataFrame(rows, "id long, x double, y double, v double")
    got = sorted(tuple(r) for r in kmeans_features_lloyd(
        df, ["x", "y", "v"], k=4, iters=3, n_init=2, seed=42).collect())
    re = sorted(tuple(r) for r in kmeans_features_lloyd(
        df.repartition(7), ["x", "y", "v"], k=4, iters=3, n_init=2,
        seed=42).collect())
    assert got == re
    assert len(got) == 400
    sizes = Counter(r[1] for r in got)
    assert len(sizes) == 4
    assert all(-1.0 <= r[2] <= 1.0 for r in got)
    # v's raw range is 100x smaller than x's; without standardization it
    # would be ignored — with weights it must still influence assignments:
    # points identical in (x,y) bucket but far apart in v should be able
    # to split.  Weak but real check: the unstandardized run differs.
    raw = sorted(tuple(r) for r in kmeans_features_lloyd(
        df, ["x", "y", "v"], k=4, iters=3, n_init=2, seed=42,
        standardize=False).collect())
    assert raw != got
