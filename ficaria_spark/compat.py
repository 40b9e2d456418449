"""Reference-named API surface (drop-in ergonomics).

Every public name from the reference package (``ficaria``'s __init__ exports
plus its ``utils`` helpers, /root/reference/ficaria/__init__.py and
utils.py:7–408) is available here under its reference name, so a reference
user can switch with an import change:

    from ficaria import FCMCentroidImputer          # reference (pandas)
    from ficaria_spark.compat import FCMCentroidImputer  # this engine (Spark)

The estimator classes take Spark DataFrames; the numeric helpers
(`fuzzy_c_means`, `fcm_predict`, …) take NumPy arrays exactly like the
reference's.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# estimator classes (reference __init__ exports)
from ficaria_spark.operators.impute import (  # noqa: F401
    FCMCentroidImputer,
    FCMDTIterativeImputer,
    FCMInterpolationIterativeImputer,
    FCMKIterativeImputer,
    FCMParameterImputer,
    FCMRoughParameterImputer,
)
from ficaria_spark.operators.select import (  # noqa: F401
    FuzzyGranularitySelector,
    WeightedFuzzyRoughSelector,
)

# numeric kernel under the reference's utils names
from ficaria_spark.functions.fcm import fcm_predict, fuzzy_c_means  # noqa: F401
from ficaria_spark.functions.fcm import fcm_objective as compute_fcm_objective  # noqa: F401
from ficaria_spark.functions.fcm import find_optimal_clusters as find_optimal_clusters_fuzzy  # noqa: F401
from ficaria_spark.functions.validation import validate_params  # noqa: F401


def euclidean_distance(a, b) -> float:
    """NaN-ignoring Euclidean distance between two vectors (reference
    utils.py:237–254): dimensions where either side is NaN are excluded."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    m = ~(np.isnan(a) | np.isnan(b))
    d = a[m] - b[m]
    return float(np.sqrt((d * d).sum()))


def split_complete_incomplete(df: DataFrame, feature_cols=None) -> tuple[DataFrame, DataFrame]:
    """(complete_rows, incomplete_rows) over the feature columns (reference
    utils.py:7–25, DataFrame-shaped): complete = no NULL in any feature col."""
    cols = list(feature_cols) if feature_cols else df.columns
    pred = None
    for c in cols:
        p = F.col(c).isNotNull()
        pred = p if pred is None else (pred & p)
    return df.where(pred), df.where(~pred)


def check_input_dataset(df: DataFrame, require_numeric: bool = False,
                        allow_nan: bool = True, require_complete_rows: bool = False,
                        no_nan_columns: bool = False, feature_cols=None) -> DataFrame:
    """Reference utils.py:28–81 with the same defaults and messages; one
    Spark aggregation pass. Returns the input DataFrame (the reference
    returns the validated frame)."""
    from ficaria_spark.functions.validation import check_feature_frame

    cols = list(feature_cols) if feature_cols else df.columns
    check_feature_frame(df, cols, require_numeric=require_numeric,
                        allow_nan=allow_nan,
                        require_complete_rows=require_complete_rows,
                        no_nan_columns=no_nan_columns)
    return df


__all__ = [
    "FuzzyGranularitySelector",
    "WeightedFuzzyRoughSelector",
    "FCMCentroidImputer",
    "FCMParameterImputer",
    "FCMRoughParameterImputer",
    "FCMKIterativeImputer",
    "FCMInterpolationIterativeImputer",
    "FCMDTIterativeImputer",
    "split_complete_incomplete",
    "check_input_dataset",
    "validate_params",
    "euclidean_distance",
    "fuzzy_c_means",
    "fcm_predict",
    "compute_fcm_objective",
    "find_optimal_clusters_fuzzy",
]
