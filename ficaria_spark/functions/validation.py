"""Input validation over Spark DataFrames.

Re-expresses the reference's eager pandas checks (check_input_dataset,
/root/reference/ficaria/utils.py:28–81; validate_params utils.py:84–234) as a
SINGLE Spark aggregation pass: per-column non-null counts + complete-row count
in one job, then driver-side assertions with the same exception types and
message shapes (the reference's tests assert exact prefixes).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC_TYPES = (
    T.DoubleType, T.FloatType, T.IntegerType, T.LongType, T.ShortType,
    T.ByteType, T.DecimalType,
)


def check_feature_frame(
    df: DataFrame,
    feature_cols: Sequence[str],
    *,
    require_numeric: bool = True,
    allow_nan: bool = True,
    require_complete_rows: bool = False,
    no_nan_columns: bool = False,
) -> dict:
    """Validate the feature columns; returns the collected stats so callers
    can reuse them (row count, per-column non-null counts, complete count)."""
    missing = [c for c in feature_cols if c not in df.columns]
    if missing:
        raise ValueError(f"X is missing feature columns: {missing}")

    if require_numeric:
        bad = [
            c for c in feature_cols
            if not isinstance(df.schema[c].dataType, _NUMERIC_TYPES)
        ]
        if bad:
            raise TypeError(f"X must be numeric, got non-numeric columns: {bad} instead")

    complete_pred = None
    for c in feature_cols:
        p = F.col(c).isNotNull()
        complete_pred = p if complete_pred is None else (complete_pred & p)

    row = df.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.when(complete_pred, 1).otherwise(0)).alias("__n_complete"),
        *[F.count(F.col(c)).alias(f"__nn_{i}") for i, c in enumerate(feature_cols)],
    ).collect()[0]

    n = row["__n"]
    n_complete = row["__n_complete"] or 0
    nonnull = {c: row[f"__nn_{i}"] for i, c in enumerate(feature_cols)}

    if n == 0:
        raise ValueError("X must contain at least one sample, got an empty dataset instead")
    if not allow_nan and any(nonnull[c] < n for c in feature_cols):
        raise ValueError("X must not contain missing values")
    if require_complete_rows and n_complete == 0:
        raise ValueError("X must contain at least one row with no missing values")
    if no_nan_columns:
        all_nan = sum(1 for c in feature_cols if nonnull[c] == 0)
        if all_nan:
            raise ValueError(
                f"X must not contain columns with all NaNs, got {all_nan} such columns instead"
            )
    return {"n": n, "n_complete": n_complete, "nonnull": nonnull}


# (name → range rule) tables mirroring the reference's validate_params
# (utils.py:84–234; exact messages asserted by its tests/test_utils.py:17–143).
_INT_GE1 = ("max_clusters", "max_k", "n_features", "max_features")
_INT_GT1 = ("max_iter", "max_iter_rough_k", "max_FCM_iter", "max_II_iter", "k")
# float rules: (low, inclusive_low, high, message)
_FLOAT_RULES = {
    "m": ("m must be > 1.0, got {v} instead", lambda v: v > 1.0),
    "tol": ("tol must be > 0, got {v} instead", lambda v: v > 0),
    "wl": ("wl must be in range (0, 1], got {v} instead", lambda v: 0 < v <= 1),
    "wb": ("wb must be in range [0, 1], got {v} instead", lambda v: 0 <= v <= 1),
    "tau": ("tau must be >= 0, got {v} instead", lambda v: v >= 0),
    "stop_threshold": ("stop_threshold must be >= 0, got {v} instead", lambda v: v >= 0),
    "min_samples_leaf": ("min_samples_leaf must be > 0, got {v} instead", lambda v: v > 0),
    "learning_rate": ("learning_rate must be > 0, got {v} instead", lambda v: v > 0),
    "eps": ("eps must be > 0, got {v} instead", lambda v: v > 0),
}


def validate_params(params: dict) -> None:
    """Hyperparameter type/range checks with reference-parity messages
    (every parameter and message format from utils.py:84–234)."""
    def _is_int(v):
        return isinstance(v, int) and not isinstance(v, bool)

    def _is_num(v):
        return isinstance(v, (int, float)) and not isinstance(v, bool)

    for name in _INT_GE1:
        if name in params:
            v = params[name]
            if not _is_int(v):
                raise TypeError(f"{name} must be int, got {type(v).__name__} instead")
            if v < 1:
                raise ValueError(f"{name} must be >= 1, got {v} instead")

    for name in _INT_GT1:
        if name in params:
            v = params[name]
            if not _is_int(v):
                raise TypeError(f"{name} must be int, got {type(v).__name__} instead")
            if v <= 1:
                raise ValueError(f"{name} must be > 1, got {v} instead")

    if "random_state" in params:
        v = params["random_state"]
        if v is not None and not _is_int(v):
            raise TypeError(f"random_state must be int or None, got {type(v).__name__} instead")

    for name, (msg, ok) in _FLOAT_RULES.items():
        if name in params:
            v = params[name]
            if not _is_num(v):
                raise TypeError(f"{name} must be int or float, got {type(v).__name__} instead")
            if not ok(v):
                raise ValueError(msg.format(v=v))

    # n_clusters: the reference validates it ad-hoc in each constructor —
    # "int" for the fixed-k imputers (missing_imputation.py:80–84), "int or
    # None" for FCKI's auto elbow search (missing_imputation.py:756–759).
    # `n_clusters_nullable` selects the FCKI message shape.
    if "n_clusters" in params or "n_clusters_nullable" in params:
        nullable = "n_clusters_nullable" in params
        v = params.get("n_clusters_nullable" if nullable else "n_clusters")
        kind = "int or None" if nullable else "int"
        if v is not None and not _is_int(v):
            raise TypeError(f"n_clusters must be {kind}, got {type(v).__name__} instead")
        if v is not None and v < 1:
            raise ValueError(f"n_clusters must be >= 1, got {v} instead")

    if "n_jobs" in params:
        v = params["n_jobs"]
        if not _is_int(v):
            raise TypeError(f"n_jobs must be int, got {type(v).__name__} instead")
        if v == 0:
            raise ValueError("n_jobs must not be 0; use -1 for all cores or a non-zero integer")
