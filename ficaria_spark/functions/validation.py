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


def validate_params(params: dict) -> None:
    """Hyperparameter type/range checks with reference-parity messages."""
    def _int(name, v, low=None, low_msg=None):
        if not isinstance(v, int) or isinstance(v, bool):
            raise TypeError(f"{name} must be int, got {type(v).__name__} instead")
        if low is not None and v < low:
            raise ValueError(low_msg or f"{name} must be >= {low}, got {v} instead")

    if "n_clusters" in params and params["n_clusters"] is not None:
        _int("n_clusters", params["n_clusters"], 1)
    if "max_clusters" in params:
        _int("max_clusters", params["max_clusters"], 1)
    if "max_iter" in params:
        v = params["max_iter"]
        _int("max_iter", v)
        if v <= 1:
            raise ValueError(f"max_iter must be > 1, got {v} instead")
    if "m" in params:
        v = params["m"]
        if not isinstance(v, (int, float)) or isinstance(v, bool):
            raise TypeError(f"m must be float, got {type(v).__name__} instead")
        if v <= 1:
            raise ValueError(f"m must be > 1, got {v} instead")
    if "tol" in params:
        v = params["tol"]
        if not isinstance(v, (int, float)) or isinstance(v, bool):
            raise TypeError(f"tol must be float, got {type(v).__name__} instead")
        if v <= 0:
            raise ValueError(f"tol must be > 0, got {v} instead")
    if "random_state" in params and params["random_state"] is not None:
        _int("random_state", params["random_state"])
    if "learning_rate" in params:
        v = params["learning_rate"]
        if not isinstance(v, (int, float)) or isinstance(v, bool):
            raise TypeError(f"learning_rate must be float, got {type(v).__name__} instead")
        if not (0 < v <= 1):
            raise ValueError(f"learning_rate must be in (0, 1], got {v} instead")
    if "n_jobs" in params:
        v = params["n_jobs"]
        if not isinstance(v, int) or isinstance(v, bool):
            raise TypeError(f"n_jobs must be int, got {type(v).__name__} instead")
        if v == 0:
            raise ValueError("n_jobs must not be 0; use -1 for all cores or a non-zero integer")
