"""Reference-named API surface (drop-in ergonomics).

Every public name from the reference package (``ficaria``'s __init__ exports
plus its ``utils`` helpers, /root/reference/ficaria/__init__.py and
utils.py:7–408) is available here under its reference name — AND with the
reference's constructor signature and defaults — so a reference user can
switch with an import change:

    from ficaria import FCMCentroidImputer          # reference (pandas)
    from ficaria_spark.compat import FCMCentroidImputer  # this engine (Spark)

The estimator classes here are thin wrappers over the Spark-native classes
(``ficaria_spark.operators``) that accept the reference's parameter order and
defaults (e.g. ``FuzzyGranularitySelector(n_features=5, eps=0.3)``,
``WeightedFuzzyRoughSelector(3, 0.7)``); engine-only knobs (``feature_cols``,
``fit_cap``, ``order_cols``, …) pass through as extra keywords. Reference
parameters without a Spark-side meaning (``random_state`` on the selector,
whose fit is deterministic by construction; ``n_jobs``, replaced by cluster
parallelism) are accepted and ignored. The estimators take Spark DataFrames
— or plain ``pd.DataFrame``s exactly like the reference: pandas in, pandas
out, original row order preserved (the frame is lifted into the active Spark
session under the hood). Selector ``fit(X, y)`` accepts the target as a
Series/array, reference-style. The numeric helpers (`fuzzy_c_means`,
`fcm_predict`, …) take NumPy arrays exactly like the reference's, and
``NotFittedError`` is exported under its reference name.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ficaria_spark.operators.impute import NotFittedError  # noqa: F401  (reference: sklearn.exceptions)
from ficaria_spark.operators.impute import (
    FCMCentroidImputer as _FCMCentroidImputer,
    FCMDTIterativeImputer as _FCMDTIterativeImputer,
    FCMInterpolationIterativeImputer as _FCMInterpolationIterativeImputer,
    FCMKIterativeImputer as _FCMKIterativeImputer,
    FCMParameterImputer as _FCMParameterImputer,
    FCMRoughParameterImputer as _FCMRoughParameterImputer,
)
from ficaria_spark.operators.select import (
    FuzzyGranularitySelector as _FuzzyGranularitySelector,
    WeightedFuzzyRoughSelector as _WeightedFuzzyRoughSelector,
)

_ORDER = "__row_order"


def _active_spark():
    from pyspark.sql import SparkSession

    from ficaria_spark.session import get_spark

    return SparkSession.getActiveSession() or get_spark("ficaria-compat")


class _PandasImputerIO:
    """pandas-in / pandas-out, exactly like the reference estimators: a
    ``pd.DataFrame`` fed to fit/transform is lifted into the active Spark
    session (all columns become features, as the reference's
    check_input_dataset demands) and transform hands back a ``pd.DataFrame``
    in the original row order. Spark DataFrames pass through untouched."""

    def _lift(self, X, *, for_fit: bool):
        import pandas as pd

        if not isinstance(X, pd.DataFrame):
            return X, False
        if for_fit and self.feature_cols is None:
            self.feature_cols = [str(c) for c in X.columns]
        pdf = X.copy()
        pdf.columns = [str(c) for c in pdf.columns]
        pdf[_ORDER] = np.arange(len(pdf))
        return _active_spark().createDataFrame(pdf), True

    def fit(self, X):
        sdf, _ = self._lift(X, for_fit=True)
        return super().fit(sdf)

    def transform(self, X):
        sdf, was_pandas = self._lift(X, for_fit=False)
        out = super().transform(sdf)
        if not was_pandas:
            return out
        pdf = out.toPandas().sort_values(_ORDER).reset_index(drop=True)
        return pdf.drop(columns=[_ORDER])

    def fit_transform(self, X):
        return self.fit(X).transform(X)


class _PandasSelectorIO:
    """Selector variant: the reference's ``fit(X, y)`` takes the target as a
    SERIES/array; lift it as a target column next to the features."""

    def _lift_xy(self, X, y=None, *, for_fit: bool):
        import pandas as pd

        if not isinstance(X, pd.DataFrame):
            return X, y, False
        if for_fit and self.feature_cols is None:
            self.feature_cols = [str(c) for c in X.columns]
        pdf = X.copy()
        pdf.columns = [str(c) for c in pdf.columns]
        tname = None
        if y is not None and not isinstance(y, str):
            tname = "__target"
            pdf[tname] = np.asarray(y)
        elif isinstance(y, str):
            tname = y
        pdf[_ORDER] = np.arange(len(pdf))
        return _active_spark().createDataFrame(pdf), tname, True

    def fit(self, X, y=None):
        sdf, tname, _ = self._lift_xy(X, y, for_fit=True)
        return super().fit(sdf, tname)

    def _selected_names(self) -> list[str]:
        if isinstance(self, _FuzzyGranularitySelector):
            if self.S_ is None:
                raise NotFittedError("FuzzyGranularitySelector is not fitted yet")
            return list(self.S_[: self.k])
        if self.feature_sequence_ is None:
            raise NotFittedError("WeightedFuzzyRoughSelector is not fitted yet")
        return [self.feature_names_in_[i]
                for i in self.feature_sequence_[: self.n_features]]

    def transform(self, X):
        import pandas as pd

        if not isinstance(X, pd.DataFrame):
            return super().transform(X)
        # a fitted selector's transform is a pure projection — apply it to
        # the pandas frame directly (row order trivially preserved), with
        # the same column guard the Spark path enforces
        picked = self._selected_names()  # raises NotFittedError when unfitted
        cols = [str(c) for c in X.columns]
        missing = [c for c in self.feature_names_in_ if c not in cols]
        if missing:
            raise ValueError(
                f"X.columns must match the columns seen during fit "
                f"{self.feature_names_in_}, missing {missing} instead")
        out = X.copy()
        out.columns = cols
        return out[picked].reset_index(drop=True)

    def fit_transform(self, X, y=None):
        return self.fit(X, y).transform(X)


class FuzzyGranularitySelector(_PandasSelectorIO, _FuzzyGranularitySelector):
    """Reference signature (feature_selection.py:82): ``n_features`` maps to
    the engine's ``k``; ``random_state`` is accepted and ignored (the engine's
    fit is deterministic over the canonically-ordered capped frame)."""

    def __init__(self, n_features=3, eps=0.5, max_features=10,
                 random_state=None, **engine_kwargs):
        del random_state
        super().__init__(k=n_features, eps=eps, max_features=max_features,
                         **engine_kwargs)


class WeightedFuzzyRoughSelector(_PandasSelectorIO, _WeightedFuzzyRoughSelector):
    """Reference positional order (feature_selection.py:621):
    (n_features, alpha=0.5, k=5)."""

    def __init__(self, n_features, alpha=0.5, k=5, **engine_kwargs):
        super().__init__(n_features=n_features, k=k, alpha=alpha,
                         **engine_kwargs)


class FCMCentroidImputer(_PandasImputerIO, _FCMCentroidImputer):
    """Reference signature/defaults (missing_imputation.py:71)."""

    def __init__(self, n_clusters=5, m=2.0, max_iter=100, tol=1e-5,
                 random_state=None, **engine_kwargs):
        super().__init__(n_clusters=n_clusters, m=m, max_iter=max_iter,
                         tol=tol, random_state=random_state, **engine_kwargs)


class FCMParameterImputer(_PandasImputerIO, _FCMParameterImputer):
    """Reference signature/defaults (missing_imputation.py:222)."""

    def __init__(self, n_clusters=5, m=2.0, max_iter=100, tol=1e-5,
                 random_state=None, **engine_kwargs):
        super().__init__(n_clusters=n_clusters, m=m, max_iter=max_iter,
                         tol=tol, random_state=random_state, **engine_kwargs)


class FCMRoughParameterImputer(_PandasImputerIO, _FCMRoughParameterImputer):
    """Reference positional order/defaults (missing_imputation.py:411)."""

    def __init__(self, n_clusters=5, m=2.0, max_iter=100, max_iter_rough_k=100,
                 tol=1e-5, wl=0.6, wb=0.4, tau=0.5, random_state=None,
                 **engine_kwargs):
        super().__init__(n_clusters=n_clusters, m=m, wl=wl, wb=wb, tau=tau,
                         max_iter=max_iter, max_iter_rough_k=max_iter_rough_k,
                         tol=tol, random_state=random_state, **engine_kwargs)


class FCMKIterativeImputer(_PandasImputerIO, _FCMKIterativeImputer):
    """Reference signature/defaults (missing_imputation.py:741); ``n_jobs``
    is accepted and ignored (cross-cluster parallelism is Spark's)."""

    def __init__(self, n_clusters=None, max_clusters=10, m=2, max_FCM_iter=100,
                 max_II_iter=80, max_k=20, tol=1e-5, random_state=None,
                 n_jobs=-1, **engine_kwargs):
        del n_jobs
        super().__init__(n_clusters=n_clusters, m=float(m),
                         max_clusters=max_clusters, max_k=max_k,
                         max_FCM_iter=max_FCM_iter, max_II_iter=max_II_iter,
                         tol=tol, random_state=random_state, **engine_kwargs)


class FCMInterpolationIterativeImputer(_PandasImputerIO, _FCMInterpolationIterativeImputer):
    """Reference signature/defaults (missing_imputation.py:1089)."""

    def __init__(self, n_clusters=5, m=2.0, max_iter=100, alpha=0.85,
                 tol=1e-5, sigma=False, random_state=None, **engine_kwargs):
        super().__init__(n_clusters=n_clusters, m=m, alpha=alpha, sigma=sigma,
                         max_iter=max_iter, tol=tol, random_state=random_state,
                         **engine_kwargs)


class FCMDTIterativeImputer(_PandasImputerIO, _FCMDTIterativeImputer):
    """Reference signature/defaults (missing_imputation.py:1356)."""

    def __init__(self, max_clusters=20, m=2, max_iter=100, max_FCM_iter=100,
                 tol=1e-5, min_samples_leaf=40, learning_rate=0.1,
                 stop_threshold=1.0, alpha=1.0, random_state=None,
                 **engine_kwargs):
        super().__init__(min_samples_leaf=min_samples_leaf,
                         learning_rate=learning_rate,
                         stop_threshold=stop_threshold, max_iter=max_iter,
                         max_clusters=max_clusters, m=float(m), alpha=alpha,
                         max_FCM_iter=max_FCM_iter, tol=tol,
                         random_state=random_state, **engine_kwargs)

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
    "NotFittedError",
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
