"""validate_params parity with the reference's table (utils.py:84–234),
mirroring its parametrized cases (tests/test_utils.py:17–143) plus the
constructor-level ad-hoc checks (alpha, sigma, wl+wb)."""

from __future__ import annotations

import pytest

from ficaria_spark.functions.validation import validate_params

CASES = [
    # max_clusters
    ({"max_clusters": "3"}, TypeError, "max_clusters must be int, got"),
    ({"max_clusters": [3]}, TypeError, "max_clusters must be int, got"),
    ({"max_clusters": 0.1}, TypeError, "max_clusters must be int, got"),
    ({"max_clusters": -1}, ValueError, "max_clusters must be >= 1, got"),
    ({"max_clusters": 0}, ValueError, "max_clusters must be >= 1, got"),
    # max_iter
    ({"max_iter": "100"}, TypeError, "max_iter must be int, got"),
    ({"max_iter": [100]}, TypeError, "max_iter must be int, got"),
    ({"max_iter": 2.5}, TypeError, "max_iter must be int, got"),
    ({"max_iter": 1}, ValueError, "max_iter must be > 1, got"),
    ({"max_iter": -5}, ValueError, "max_iter must be > 1, got"),
    # max_iter_rough_k
    ({"max_iter_rough_k": "100"}, TypeError, "max_iter_rough_k must be int, got"),
    ({"max_iter_rough_k": 1}, ValueError, "max_iter_rough_k must be > 1, got"),
    # max_FCM_iter
    ({"max_FCM_iter": "100"}, TypeError, "max_FCM_iter must be int, got"),
    ({"max_FCM_iter": [100]}, TypeError, "max_FCM_iter must be int, got"),
    ({"max_FCM_iter": 2.5}, TypeError, "max_FCM_iter must be int, got"),
    ({"max_FCM_iter": 1}, ValueError, "max_FCM_iter must be > 1, got"),
    ({"max_FCM_iter": -5}, ValueError, "max_FCM_iter must be > 1, got"),
    # max_II_iter
    ({"max_II_iter": "100"}, TypeError, "max_II_iter must be int, got"),
    ({"max_II_iter": [100]}, TypeError, "max_II_iter must be int, got"),
    ({"max_II_iter": 2.5}, TypeError, "max_II_iter must be int, got"),
    ({"max_II_iter": 1}, ValueError, "max_II_iter must be > 1, got"),
    ({"max_II_iter": -5}, ValueError, "max_II_iter must be > 1, got"),
    # max_k
    ({"max_k": "100"}, TypeError, "max_k must be int, got"),
    ({"max_k": [100]}, TypeError, "max_k must be int, got"),
    ({"max_k": 2.5}, TypeError, "max_k must be int, got"),
    ({"max_k": 0}, ValueError, "max_k must be >= 1, got"),
    ({"max_k": -5}, ValueError, "max_k must be >= 1, got"),
    # random_state
    ({"random_state": "abc"}, TypeError, "random_state must be int or None, got"),
    ({"random_state": [10]}, TypeError, "random_state must be int or None, got"),
    ({"random_state": 2.5}, TypeError, "random_state must be int or None, got"),
    # m
    ({"m": "2.0"}, TypeError, "m must be int or float, got"),
    ({"m": [2.0]}, TypeError, "m must be int or float, got"),
    ({"m": 1.0}, ValueError, "m must be > 1.0, got"),
    ({"m": -3}, ValueError, "m must be > 1.0, got"),
    # tol
    ({"tol": "1e-5"}, TypeError, "tol must be int or float, got"),
    ({"tol": [1e-5]}, TypeError, "tol must be int or float, got"),
    ({"tol": 0}, ValueError, "tol must be > 0, got"),
    ({"tol": -1.0}, ValueError, "tol must be > 0, got"),
    # wl
    ({"wl": "0.5"}, TypeError, "wl must be int or float, got"),
    ({"wl": [0.5]}, TypeError, "wl must be int or float, got"),
    ({"wl": -0.1}, ValueError, "wl must be in range (0, 1], got"),
    ({"wl": 1.5}, ValueError, "wl must be in range (0, 1], got"),
    # wb
    ({"wb": "0.2"}, TypeError, "wb must be int or float, got"),
    ({"wb": [0.2]}, TypeError, "wb must be int or float, got"),
    ({"wb": -0.1}, ValueError, "wb must be in range [0, 1], got"),
    ({"wb": 1.5}, ValueError, "wb must be in range [0, 1], got"),
    # tau
    ({"tau": "0.5"}, TypeError, "tau must be int or float, got"),
    ({"tau": [0.5]}, TypeError, "tau must be int or float, got"),
    ({"tau": -0.1}, ValueError, "tau must be >= 0, got"),
    # k
    ({"k": "ABC"}, TypeError, "k must be int, got"),
    ({"k": [5]}, TypeError, "k must be int, got"),
    ({"k": 3.5}, TypeError, "k must be int, got"),
    ({"k": 0}, ValueError, "k must be > 1, got"),
    ({"k": -3}, ValueError, "k must be > 1, got"),
    # n_features
    ({"n_features": "ABC"}, TypeError, "n_features must be int, got"),
    ({"n_features": [6]}, TypeError, "n_features must be int, got"),
    ({"n_features": 7.9}, TypeError, "n_features must be int, got"),
    ({"n_features": -3}, ValueError, "n_features must be >= 1, got"),
    ({"n_features": 0}, ValueError, "n_features must be >= 1, got"),
    # max_features
    ({"max_features": "ABC"}, TypeError, "max_features must be int, got "),
    ({"max_features": [2]}, TypeError, "max_features must be int, got "),
    ({"max_features": 3.7}, TypeError, "max_features must be int, got "),
    ({"max_features": -3}, ValueError, "max_features must be >= 1, got"),
    ({"max_features": 0}, ValueError, "max_features must be >= 1, got"),
    # stop_threshold
    ({"stop_threshold": "0.5"}, TypeError, "stop_threshold must be int or float, got"),
    ({"stop_threshold": [0.5]}, TypeError, "stop_threshold must be int or float, got"),
    ({"stop_threshold": -0.1}, ValueError, "stop_threshold must be >= 0, got"),
    # min_samples_leaf
    ({"min_samples_leaf": "0.5"}, TypeError, "min_samples_leaf must be int or float, got"),
    ({"min_samples_leaf": [0.5]}, TypeError, "min_samples_leaf must be int or float, got"),
    ({"min_samples_leaf": -0.1}, ValueError, "min_samples_leaf must be > 0, got"),
    ({"min_samples_leaf": 0}, ValueError, "min_samples_leaf must be > 0, got"),
    # learning_rate
    ({"learning_rate": "0.5"}, TypeError, "learning_rate must be int or float, got"),
    ({"learning_rate": [1]}, TypeError, "learning_rate must be int or float, got"),
    ({"learning_rate": -0.1}, ValueError, "learning_rate must be > 0, got"),
    ({"learning_rate": 0}, ValueError, "learning_rate must be > 0, got"),
    # eps
    ({"eps": "0.5"}, TypeError, "eps must be int or float, got"),
    ({"eps": [9]}, TypeError, "eps must be int or float, got"),
    ({"eps": -0.1}, ValueError, "eps must be > 0, got"),
    ({"eps": 0}, ValueError, "eps must be > 0, got"),
    # n_jobs
    ({"n_jobs": "ABC"}, TypeError, "n_jobs must be int, got"),
    ({"n_jobs": [5]}, TypeError, "n_jobs must be int, got"),
    ({"n_jobs": 3.5}, TypeError, "n_jobs must be int, got"),
    ({"n_jobs": 0}, ValueError,
     "n_jobs must not be 0; use -1 for all cores or a non-zero integer"),
]


@pytest.mark.parametrize("params, exc, msg", CASES)
def test_validate_params_errors(params, exc, msg):
    with pytest.raises(exc) as excinfo:
        validate_params(params)
    assert msg in str(excinfo.value)


def test_validate_params_accepts_valid():
    validate_params({
        "max_clusters": 10, "max_iter": 100, "max_iter_rough_k": 100,
        "max_FCM_iter": 100, "max_II_iter": 80, "max_k": 20,
        "random_state": None, "m": 2.0, "tol": 1e-5, "wl": 0.6, "wb": 0.4,
        "tau": 0.5, "k": 5, "n_features": 3, "max_features": 10,
        "stop_threshold": 1.0, "min_samples_leaf": 40, "learning_rate": 0.1,
        "eps": 0.5, "n_jobs": -1, "n_clusters": 3,
    })
    validate_params({"random_state": 42, "n_clusters": None})


def test_constructor_adhoc_checks():
    from ficaria_spark.operators.impute import (
        FCMDTIterativeImputer,
        FCMInterpolationIterativeImputer,
        FCMRoughParameterImputer,
    )
    from ficaria_spark.operators.select import (
        FuzzyGranularitySelector,
        WeightedFuzzyRoughSelector,
    )

    with pytest.raises(ValueError, match="wl \\+ wb must equal 1"):
        FCMRoughParameterImputer(wl=0.7, wb=0.4)
    with pytest.raises(ValueError, match="wl must be in range"):
        FCMRoughParameterImputer(wl=1.5, wb=-0.5)
    with pytest.raises(ValueError, match="alpha must be > 0"):
        FCMInterpolationIterativeImputer(alpha=0.0)
    with pytest.raises(TypeError, match="sigma must be bool"):
        FCMInterpolationIterativeImputer(sigma="yes")
    with pytest.raises(ValueError, match="alpha must be > 0"):
        FCMDTIterativeImputer(alpha=-1.0)
    with pytest.raises(ValueError, match="n_features must be <= max_features"):
        FuzzyGranularitySelector(k=5, max_features=3)
    with pytest.raises(ValueError, match="alpha must be in range"):
        WeightedFuzzyRoughSelector(alpha=1.5)
    with pytest.raises(ValueError, match="n_features must be >= 1"):
        WeightedFuzzyRoughSelector(n_features=0)


@pytest.mark.parametrize("params, exc, msg", [
    ({"n_clusters": "3"}, TypeError, "n_clusters must be int, got"),
    ({"n_clusters": 0}, ValueError, "n_clusters must be >= 1, got"),
    ({"n_clusters_nullable": "3"}, TypeError, "n_clusters must be int or None, got"),
    ({"n_clusters_nullable": 2.5}, TypeError, "n_clusters must be int or None, got"),
    ({"n_clusters_nullable": 0}, ValueError, "n_clusters must be >= 1, got"),
])
def test_n_clusters_message_shapes(params, exc, msg):
    """Fixed-k imputers say 'int' (reference missing_imputation.py:80–84);
    FCKI's auto-k accepts None and says 'int or None' (ibid. 756–759)."""
    with pytest.raises(exc) as excinfo:
        validate_params(params)
    assert msg in str(excinfo.value)


def test_n_clusters_none_accepted_for_fcki():
    from ficaria_spark.operators.impute import FCMKIterativeImputer

    imp = FCMKIterativeImputer(n_clusters=None, random_state=1)
    assert imp.n_clusters is None
    with pytest.raises(TypeError, match="n_clusters must be int or None"):
        FCMKIterativeImputer(n_clusters="three")
