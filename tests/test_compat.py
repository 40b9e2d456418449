"""Reference-named drop-in surface: every public name from the reference
package imports from ficaria_spark.compat (and the estimators from the
package top level) and behaves like its twin."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

REFERENCE_EXPORTS = [
    "FuzzyGranularitySelector",
    "WeightedFuzzyRoughSelector",
    "FCMCentroidImputer",
    "FCMParameterImputer",
    "FCMRoughParameterImputer",
    "FCMKIterativeImputer",
    "FCMInterpolationIterativeImputer",
    "FCMDTIterativeImputer",
]
REFERENCE_UTILS = [
    "split_complete_incomplete",
    "check_input_dataset",
    "validate_params",
    "euclidean_distance",
    "fuzzy_c_means",
    "fcm_predict",
    "compute_fcm_objective",
    "find_optimal_clusters_fuzzy",
]


@pytest.mark.parametrize("name", REFERENCE_EXPORTS + REFERENCE_UTILS)
def test_compat_name_importable(name):
    import ficaria_spark.compat as compat

    assert hasattr(compat, name)


@pytest.mark.parametrize("name", REFERENCE_EXPORTS)
def test_top_level_estimator_import(name):
    import ficaria_spark

    assert getattr(ficaria_spark, name) is not None


def test_euclidean_distance_nan_ignoring():
    from ficaria_spark.compat import euclidean_distance

    assert euclidean_distance([0.0, 3.0], [4.0, np.nan]) == 4.0
    assert euclidean_distance([1.0, 2.0], [1.0, 2.0]) == 0.0
    assert euclidean_distance([0.0, 3.0], [4.0, 0.0]) == 5.0


def test_split_complete_incomplete(spark):
    from ficaria_spark.compat import split_complete_incomplete

    pdf = pd.DataFrame({"a": [1.0, None, 3.0], "b": [1.0, 2.0, None], "id": [0, 1, 2]})
    sdf = spark.createDataFrame(pdf)
    comp, incomp = split_complete_incomplete(sdf, ["a", "b"])
    assert sorted(r.id for r in comp.collect()) == [0]
    assert sorted(r.id for r in incomp.collect()) == [1, 2]


def test_check_input_dataset_messages(spark):
    from ficaria_spark.compat import check_input_dataset

    pdf = pd.DataFrame({"a": [1.0, None], "b": [1.0, 2.0]})
    sdf = spark.createDataFrame(pdf)
    assert check_input_dataset(sdf) is sdf
    with pytest.raises(ValueError, match="must not contain missing values"):
        check_input_dataset(sdf, allow_nan=False)
    empty = spark.createDataFrame([], "a double")
    with pytest.raises(ValueError, match="at least one sample"):
        check_input_dataset(empty)


def test_compat_reference_signatures():
    """The reference's own constructor idioms must work verbatim through
    compat: docstring example kwargs, positional order, and defaults."""
    from ficaria_spark import compat as c

    s = c.FuzzyGranularitySelector(n_features=5, eps=0.3, random_state=0)
    assert s.k == 5 and s.eps == 0.3 and s.max_features == 10

    w = c.WeightedFuzzyRoughSelector(3, 0.7)  # (n_features, alpha, k=5)
    assert w.n_features == 3 and w.alpha == 0.7 and w.k == 5

    r = c.FCMRoughParameterImputer(4, 2.0, 50, 60)  # positional reference order
    assert (r.n_clusters, r.max_iter, r.max_iter_rough_k) == (4, 50, 60)
    assert (r.wl, r.wb, r.tau) == (0.6, 0.4, 0.5)

    ki = c.FCMKIterativeImputer(n_jobs=4)
    assert (ki.max_II_iter, ki.max_k, ki.m) == (80, 20, 2.0)

    ii = c.FCMInterpolationIterativeImputer()
    assert (ii.n_clusters, ii.alpha) == (5, 0.85)

    dt = c.FCMDTIterativeImputer()
    assert (dt.min_samples_leaf, dt.learning_rate, dt.stop_threshold,
            dt.max_clusters, dt.max_iter) == (40, 0.1, 1.0, 20, 100)

    ci = c.FCMCentroidImputer()
    assert ci.n_clusters == 5

    # engine-only knobs still pass through
    ki2 = c.FCMKIterativeImputer(n_clusters=3, feature_cols=["a", "b"],
                                 order_cols=("rid",), bucket_size=100)
    assert ki2.feature_cols == ["a", "b"] and ki2.bucket_size == 100


def test_compat_pandas_in_pandas_out(spark):
    """Reference estimators take pandas frames and give pandas frames back —
    the compat wrappers must do the same (row order preserved; all columns
    are features, like the reference's check_input_dataset demands)."""
    import numpy as np
    import pandas as pd

    from ficaria_spark import compat as c

    rng = np.random.default_rng(5)
    X = pd.DataFrame(rng.normal(size=(120, 3)), columns=["a", "b", "c"])
    X.iloc[::7, 0] = np.nan
    X.iloc[3::11, 1] = np.nan

    imp = c.FCMCentroidImputer(n_clusters=2, random_state=1)
    out = imp.fit(X).transform(X)
    assert isinstance(out, pd.DataFrame)
    assert list(out.columns) == ["a", "b", "c"] and len(out) == len(X)
    assert out.isna().sum().sum() == 0
    obs = ~X.isna()
    assert np.allclose(out.to_numpy()[obs.to_numpy()],
                       X.to_numpy()[obs.to_numpy()])

    # selector: fit(X, y) with y as a Series, transform returns projection
    Xs = pd.DataFrame(rng.normal(size=(80, 4)), columns=list("wxyz"))
    y = pd.Series(np.where(Xs["w"] + Xs["x"] > 0, "p", "q"))
    sel = c.WeightedFuzzyRoughSelector(2, 0.5, k=3)
    picked = sel.fit(Xs, y).transform(Xs)
    assert isinstance(picked, pd.DataFrame) and picked.shape == (80, 2)
    assert set(picked.columns) <= set(Xs.columns)
    first = picked.columns[0]
    assert np.allclose(picked[first].to_numpy(), Xs[first].to_numpy())

    from ficaria_spark.compat import NotFittedError
    import pytest as _pt
    with _pt.raises(NotFittedError):
        c.FuzzyGranularitySelector().transform(Xs)
