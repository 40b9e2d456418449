"""Minimal iterative (MICE-style) imputer and a small CART regression tree —
pure NumPy stand-ins for the sklearn components the reference delegates to
(``sklearn.impute.IterativeImputer`` at missing_imputation.py:972–974 and
``sklearn.tree.DecisionTreeRegressor`` at missing_imputation.py:1417–1424).
sklearn is not available in this environment, so these implement the same
contracts (round-robin regression imputation with clamps; variance-reduction
binary splits with ``min_samples_leaf`` and stable ``apply`` leaf ids).

These run ONLY inside per-group pandas kernels (``applyInPandas``) or on the
driver over bounded fit data — never per-row on executors.
"""

from __future__ import annotations

import numpy as np


def iterative_impute(
    S: np.ndarray,
    *,
    max_iter: int = 10,
    min_value: float = -np.inf,
    max_value: float = np.inf,
    tol: float = 1e-3,
    ridge: float = 1e-6,
) -> np.ndarray:
    """Round-robin regression imputation (MICE with a ridge linear model).

    Mean-initializes, then repeatedly re-predicts each originally-missing cell
    from all other columns until the imputed cells stabilize. Predictions are
    clamped to [min_value, max_value] like the reference's use of
    IterativeImputer(min_value=…, max_value=…).
    """
    S = np.asarray(S, dtype=np.float64).copy()
    n, d = S.shape
    miss = np.isnan(S)
    if not miss.any():
        return S

    col_means = np.nanmean(np.where(np.isinf(S), np.nan, S), axis=0)
    col_means = np.where(np.isnan(col_means), 0.0, col_means)
    filled = np.where(miss, col_means[None, :], S)

    cols = [j for j in range(d) if miss[:, j].any()]
    for _ in range(max_iter):
        prev = filled[miss].copy()
        for j in cols:
            rows_mis = miss[:, j]
            rows_obs = ~rows_mis
            if not rows_obs.any():
                continue  # all-missing column: stays at the (clamped) mean
            others = [c for c in range(d) if c != j]
            A = filled[np.ix_(rows_obs, others)]
            b = filled[rows_obs, j]
            Ab = np.hstack([A, np.ones((A.shape[0], 1))])
            # ridge-regularized normal equations: robust to collinearity
            G = Ab.T @ Ab + ridge * np.eye(Ab.shape[1])
            try:
                beta = np.linalg.solve(G, Ab.T @ b)
            except np.linalg.LinAlgError:
                beta = np.linalg.lstsq(Ab, b, rcond=None)[0]
            Q = filled[np.ix_(rows_mis, others)]
            pred = np.hstack([Q, np.ones((Q.shape[0], 1))]) @ beta
            filled[rows_mis, j] = np.clip(pred, min_value, max_value)
        delta = np.abs(filled[miss] - prev)
        scale = np.abs(prev).max() if prev.size else 1.0
        if delta.size == 0 or delta.max() <= tol * max(scale, 1.0):
            break
    filled[miss] = np.clip(filled[miss], min_value, max_value)
    return filled


class RegressionTree:
    """CART regression tree: greedy variance-reduction splits.

    Supports ``fit(X, y)``, ``predict(X)``, and ``apply(X)`` (stable leaf ids)
    — the three methods the reference uses on DecisionTreeRegressor. Split
    search is vectorized per feature (sort + prefix sums), no Python-per-row
    work.
    """

    def __init__(self, min_samples_leaf: int = 5, max_depth: int = 20):
        self.min_samples_leaf = max(1, int(min_samples_leaf))
        self.max_depth = max_depth
        # flat node arrays: feature<0 marks a leaf
        self._feat: list[int] = []
        self._thr: list[float] = []
        self._left: list[int] = []
        self._right: list[int] = []
        self._value: list[float] = []

    def _best_split(self, X: np.ndarray, y: np.ndarray) -> tuple[int, float, float] | None:
        n, d = X.shape
        msl = self.min_samples_leaf
        if n < 2 * msl:
            return None
        best = None  # (gain, feat, thr)
        total_sum = y.sum()
        total_sq = float(y @ y)
        base_sse = total_sq - total_sum * total_sum / n
        for j in range(d):
            order = np.argsort(X[:, j], kind="mergesort")
            xs, ys = X[order, j], y[order]
            csum = np.cumsum(ys)[:-1]
            cnt = np.arange(1, n)
            lsse = np.cumsum(ys * ys)[:-1] - csum * csum / cnt
            rsum = total_sum - csum
            rcnt = n - cnt
            rsse = (total_sq - np.cumsum(ys * ys)[:-1]) - rsum * rsum / rcnt
            valid = (cnt >= msl) & (rcnt >= msl) & (xs[:-1] < xs[1:])
            if not valid.any():
                continue
            gains = np.where(valid, base_sse - (lsse + rsse), -np.inf)
            i = int(np.argmax(gains))
            if gains[i] > 1e-12 and (best is None or gains[i] > best[0]):
                thr = (xs[i] + xs[i + 1]) / 2.0
                best = (float(gains[i]), j, thr)
        if best is None:
            return None
        return best[1], best[2], best[0]

    def _grow(self, X: np.ndarray, y: np.ndarray, depth: int) -> int:
        node = len(self._feat)
        self._feat.append(-1)
        self._thr.append(0.0)
        self._left.append(-1)
        self._right.append(-1)
        self._value.append(float(y.mean()))
        if depth >= self.max_depth or len(y) < 2 * self.min_samples_leaf or np.ptp(y) == 0:
            return node
        split = self._best_split(X, y)
        if split is None:
            return node
        j, thr, _ = split
        mask = X[:, j] <= thr
        self._feat[node] = j
        self._thr[node] = thr
        self._left[node] = self._grow(X[mask], y[mask], depth + 1)
        self._right[node] = self._grow(X[~mask], y[~mask], depth + 1)
        return node

    def fit(self, X: np.ndarray, y: np.ndarray) -> "RegressionTree":
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        self._grow(X, y, 0)
        self.feat_ = np.asarray(self._feat)
        self.thr_ = np.asarray(self._thr)
        self.left_ = np.asarray(self._left)
        self.right_ = np.asarray(self._right)
        self.value_ = np.asarray(self._value)
        return self

    def apply(self, X: np.ndarray) -> np.ndarray:
        """Leaf node id for each row (vectorized level-wise descent)."""
        X = np.asarray(X, dtype=np.float64)
        node = np.zeros(len(X), dtype=np.int64)
        while True:
            feats = self.feat_[node]
            inner = feats >= 0
            if not inner.any():
                return node
            idx = np.where(inner)[0]
            go_left = X[idx, feats[idx]] <= self.thr_[node[idx]]
            node[idx] = np.where(go_left, self.left_[node[idx]], self.right_[node[idx]])

    def predict(self, X: np.ndarray) -> np.ndarray:
        return self.value_[self.apply(X)]
