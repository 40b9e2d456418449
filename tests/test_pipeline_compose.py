"""Pipeline composition (reference entry point C: sklearn Pipeline chaining
imputer → selector)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ficaria_spark.operators.impute import FCMParameterImputer
from ficaria_spark.operators.select import FuzzyGranularitySelector
from ficaria_spark.pipeline import Pipeline

FEATS = ["f0", "f1", "f2", "f3"]


def _frame(seed=0, n=120):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 2, n)
    base = np.column_stack([
        y * 3.0 + rng.normal(0, 0.3, n),
        rng.normal(size=n),
        y * 2.0 + rng.normal(0, 0.4, n),
        rng.normal(5, 2, n),
    ])
    mask = rng.random((n, 4)) < 0.1
    mask[:10] = False
    base[mask] = np.nan
    pdf = pd.DataFrame(base, columns=FEATS)
    pdf["label"] = y
    pdf["row_id"] = np.arange(n)
    return pdf


def test_impute_then_select_pipeline(spark):
    pdf = _frame()
    sdf = spark.createDataFrame(pdf)
    pipe = Pipeline([
        ("imputer", FCMParameterImputer(n_clusters=2, random_state=0, feature_cols=FEATS)),
        ("selector", FuzzyGranularitySelector(k=2, feature_cols=FEATS)),
    ])
    out = pipe.fit_transform(sdf, target_col="label")
    assert len(out.columns) == 2
    assert out.count() == len(pdf)
    # selector saw IMPUTED data: its chosen features exist and are informative
    assert pipe["selector"].S_[0] in ("f0", "f2")
    # transform on fresh data works end to end with no NULLs in picked cols
    got = out.toPandas()
    assert got.isna().sum().sum() == 0


def test_pipeline_errors():
    with pytest.raises(ValueError, match="at least one stage"):
        Pipeline([])
    with pytest.raises(ValueError, match="unique"):
        Pipeline([("a", object()), ("a", object())])
    p = Pipeline([("imp", FCMParameterImputer())])
    with pytest.raises(RuntimeError, match="not fitted"):
        p.transform(None)
