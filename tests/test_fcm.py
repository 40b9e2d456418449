"""FCM kernel tests (reference test-style: invariants, micro-oracles,
determinism — tests/test_utils.py shapes)."""

from __future__ import annotations

import numpy as np

from ficaria_spark.functions.fcm import (
    fcm_objective,
    fcm_predict,
    find_optimal_clusters,
    fuzzy_c_means,
    locate_knee,
    masked_dist,
    memberships_from_dist,
    pairwise_dist,
)


def _blobs(seed=0, n=120, centers=((0, 0), (10, 10))):
    rng = np.random.default_rng(seed)
    parts = [rng.normal(c, 0.5, size=(n // len(centers), 2)) for c in centers]
    return np.vstack(parts)


def test_membership_rows_sum_to_one_and_in_unit_interval():
    X = _blobs()
    _, u = fuzzy_c_means(X, 3, random_state=42)
    assert np.allclose(u.sum(axis=1), 1.0)
    assert (u >= 0).all() and (u <= 1).all()


def test_fcm_separates_two_blobs():
    X = _blobs()
    centers, u = fuzzy_c_means(X, 2, random_state=0)
    labels = u.argmax(axis=1)
    # each blob should be (almost) pure
    first = labels[: len(X) // 2]
    second = labels[len(X) // 2 :]
    assert (first == first[0]).mean() > 0.95
    assert (second == 1 - first[0]).mean() > 0.95
    # centers near the true blob centers (in some order)
    got = sorted(centers.tolist())
    assert np.allclose(got[0], [0, 0], atol=0.5)
    assert np.allclose(got[1], [10, 10], atol=0.5)


def test_fcm_deterministic_under_seed():
    X = _blobs(3)
    c1, u1 = fuzzy_c_means(X, 3, random_state=7)
    c2, u2 = fuzzy_c_means(X, 3, random_state=7)
    assert np.array_equal(c1, c2) and np.array_equal(u1, u2)


def test_objective_micro_oracle():
    # hand-computed: X=[[0],[2]], centers=[[0],[2]], u=identity, m=2 → J=0
    X = np.array([[0.0], [2.0]])
    centers = np.array([[0.0], [2.0]])
    u = np.eye(2)
    assert fcm_objective(X, centers, u, 2) == 0.0
    # u = 0.5 everywhere → J = Σ 0.25·d² = 0.25·(0+4+4+0) = 2
    u = np.full((2, 2), 0.5)
    assert np.isclose(fcm_objective(X, centers, u, 2), 2.0)


def test_predict_matches_training_memberships():
    X = _blobs(5)
    centers, u = fuzzy_c_means(X, 2, random_state=1)
    u2 = fcm_predict(X, centers, 2.0)
    # after convergence, predict(X) ≈ final memberships
    assert np.allclose(u, u2, atol=1e-3)


def test_masked_dist_ignores_nan_dims():
    X = np.array([[1.0, np.nan], [1.0, 5.0]])
    centers = np.array([[0.0, 0.0]])
    d = masked_dist(X, centers)
    assert np.isclose(d[0, 0], 1.0)  # only dim 0 observed
    assert np.isclose(d[1, 0], np.sqrt(1 + 25))


def test_elbow_recovers_k_on_blobs():
    X = _blobs(9, n=300, centers=((0, 0), (8, 8), (16, 0), (8, -8)))
    k = find_optimal_clusters(X, 2, 10, random_state=0)
    assert abs(k - 4) <= 3  # reference-suite tolerance (tests/test_utils.py:435)


def test_locate_knee_none_on_flat_curve():
    assert locate_knee([1, 2, 3, 4], [5.0, 5.0, 5.0, 5.0]) is None
