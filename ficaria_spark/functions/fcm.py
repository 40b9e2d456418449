"""Fuzzy c-means kernel — driver-side NumPy implementation.

Semantics match the reference's clustering engine (behavior studied at
/root/reference/ficaria/utils.py:257–408: seeded ``default_rng`` membership
init, ``u^m``-weighted centroid update, 1e-10 distance floor, Frobenius-norm
stopping rule, elbow search over a ≤10k sample) but the code is written fresh
and fully vectorized (no per-cluster Python loops).

Why driver-side: FCM fit inputs are bounded by design — the imputers fit on
complete rows only and the elbow search samples ≤10,000 rows — so the fit is
a small dense problem. The *fitted state* (k×d centers) is broadcast to
executors and every transform-side evaluation (:func:`fcm_predict` over
billions of rows) runs distributed inside Arrow-vectorized pandas UDFs.
A ``mapInPandas`` partial-sum path for distributed fit is provided in
``operators/impute.py`` for unbounded inputs.
"""

from __future__ import annotations

import numpy as np

_DIST_FLOOR = 1e-10


def pairwise_dist(X: np.ndarray, centers: np.ndarray) -> np.ndarray:
    """(n, k) Euclidean distances, floored at 1e-10 to keep memberships finite."""
    diff = X[:, None, :] - centers[None, :, :]
    d = np.sqrt(np.einsum("nkd,nkd->nk", diff, diff))
    return np.fmax(d, _DIST_FLOOR)


def masked_dist(X: np.ndarray, centers: np.ndarray) -> np.ndarray:
    """NaN-masked (n, k) distances: each pair uses only co-observed dims.

    Centers are assumed NaN-free; a row's NaN dims are simply excluded from
    its norm (reference behavior: utils.py:237–254, applied row-wise).
    """
    Xz = np.nan_to_num(X, nan=0.0)
    obs = ~np.isnan(X)
    diff = (Xz[:, None, :] - centers[None, :, :]) * obs[:, None, :]
    d = np.sqrt(np.einsum("nkd,nkd->nk", diff, diff))
    return np.fmax(d, _DIST_FLOOR)


def memberships_from_dist(dist: np.ndarray, m: float) -> np.ndarray:
    """u_ij = 1 / Σ_l (d_ij / d_il)^(2/(m-1)); rows sum to 1."""
    p = 2.0 / (m - 1.0)
    ratio = (dist[:, :, None] / dist[:, None, :]) ** p
    return 1.0 / ratio.sum(axis=2)


def fuzzy_c_means(
    X: np.ndarray,
    n_clusters: int,
    m: float = 2.0,
    max_iter: int = 100,
    tol: float = 1e-5,
    random_state: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Iterative FCM. Returns (centers (k,d), memberships (n,k))."""
    X = np.asarray(X, dtype=np.float64)
    n = X.shape[0]
    rng = np.random.default_rng(random_state)
    u = rng.random((n, n_clusters))
    u /= u.sum(axis=1, keepdims=True)

    centers = np.empty((n_clusters, X.shape[1]))
    for _ in range(max_iter):
        prev = u
        w = u**m
        centers = (w.T @ X) / w.sum(axis=0)[:, None]
        u = memberships_from_dist(pairwise_dist(X, centers), m)
        if np.linalg.norm(u - prev) < tol:
            break
    return centers, u


def fcm_predict(X_new: np.ndarray, centers: np.ndarray, m: float = 2.0) -> np.ndarray:
    """Memberships of new points under fixed centers (no iteration).

    This is the transform-side kernel: it is called from pandas UDFs over
    Arrow batches, with ``centers`` coming from a Spark broadcast.
    """
    return memberships_from_dist(pairwise_dist(np.asarray(X_new, float), centers), m)


def fcm_objective(X: np.ndarray, centers: np.ndarray, u: np.ndarray, m: float = 2.0) -> float:
    """J = Σ_ij u_ij^m · d²(x_i, c_j)."""
    diff = X[:, None, :] - centers[None, :, :]
    d2 = np.einsum("nkd,nkd->nk", diff, diff)
    return float(((u**m) * d2).sum())


def locate_knee(xs: list[int], ys: list[float]) -> int | None:
    """Kneedle elbow for a convex decreasing curve (Satopää et al. 2011).

    Normalize to the unit square, flip to concave-increasing, and take the
    argmax of the difference curve; None when no point rises above the
    diagonal (no knee).
    """
    x = np.asarray(xs, dtype=float)
    y = np.asarray(ys, dtype=float)
    if len(x) < 3 or np.ptp(y) == 0:
        return None
    xn = (x - x.min()) / np.ptp(x)
    yn = (y - y.min()) / np.ptp(y)
    # convex decreasing -> concave increasing: reflect y
    diff = (1.0 - yn) - xn
    i = int(np.argmax(diff))
    if diff[i] <= 0:
        return None
    return int(x[i])


def find_optimal_clusters(
    X: np.ndarray,
    min_clusters: int = 2,
    max_clusters: int = 10,
    random_state: int | None = None,
    m: float = 2.0,
    max_iter: int = 100,
    tol: float = 1e-5,
    sample_cap: int = 10_000,
) -> int:
    """Elbow search: FCM objective for each k over a ≤``sample_cap`` sample,
    knee via kneedle, midpoint fallback (reference: utils.py:364–408).

    Sampling matches the reference bit-for-bit: pandas ``.sample`` with the
    given random_state, applied even when the input fits (the reference
    permutes the rows in that case, which changes the seeded FCM init)."""
    import pandas as pd

    X = np.asarray(X, dtype=np.float64)
    n = min(len(X), sample_cap)
    X = pd.DataFrame(X).sample(n=n, random_state=random_state).to_numpy()
    ks = list(range(min_clusters, max_clusters + 1))
    objs = []
    for k in ks:
        centers, u = fuzzy_c_means(X, k, m=m, max_iter=max_iter, tol=tol, random_state=random_state)
        objs.append(fcm_objective(X, centers, u, m))
    knee = locate_knee(ks, objs)
    if knee is None:
        return int((min_clusters + max_clusters) // 2)
    return knee
