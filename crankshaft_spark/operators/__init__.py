from crankshaft_spark.operators.knn import knn_edges, knn_join
from crankshaft_spark.operators.weights import (
    row_standardize,
    spatial_lag,
    weights_from_neighbors,
)
from crankshaft_spark.operators.moran import (
    moran_global,
    moran_local,
    moran_local_rate,
)
from crankshaft_spark.operators.getis import getis_gstar, getis_gstar_pysal_sim
from crankshaft_spark.operators.markov import spatial_markov_trend
from crankshaft_spark.operators.outliers import (
    outlier_percent,
    outlier_static,
    outlier_stddev,
)
from crankshaft_spark.operators.binning import (
    equal_interval_bins,
    headtails_bins,
    jenks_bins,
    quantile_bins,
)
from crankshaft_spark.operators.weighted_mean import weighted_mean_center

__all__ = [
    "knn_edges",
    "knn_join",
    "row_standardize",
    "spatial_lag",
    "weights_from_neighbors",
    "moran_global",
    "moran_local",
    "moran_local_rate",
    "getis_gstar",
    "getis_gstar_pysal_sim",
    "spatial_markov_trend",
    "outlier_static",
    "outlier_percent",
    "outlier_stddev",
    "equal_interval_bins",
    "quantile_bins",
    "headtails_bins",
    "jenks_bins",
    "weighted_mean_center",
]
