"""FCMDT distributed-vs-driver parity: the Spark plumbing (leaf grouping,
canonical in-group ordering, sweep-batched convergence) must reproduce a
pure-driver run of the same refinement — and be invariant to how the input
was partitioned."""

from __future__ import annotations

import numpy as np
import pandas as pd

from ficaria_spark.functions import fcm as fcmk
from ficaria_spark.operators.impute import FCMDTIterativeImputer, _pick_k_by_fsi

FEATS = ["f0", "f1", "f2", "f3"]


def _frame(seed=9, n=180, miss=0.12):
    rng = np.random.default_rng(seed)
    base = rng.normal(0, 1, size=(n, 4)) + np.array([0, 5, -5, 10])
    mask = rng.random((n, 4)) < miss
    mask[:12] = False
    base[mask] = np.nan
    pdf = pd.DataFrame(base, columns=FEATS)
    pdf["row_id"] = np.arange(n)
    return pdf


def _driver_dt(pdf: pd.DataFrame, imp: FCMDTIterativeImputer) -> pd.DataFrame:
    """Pure-driver twin of FCMDTIterativeImputer.transform: initial tree
    imputation, then per-sweep per-column leaf-grouped FCM refinement in the
    same canonical (feature-tuple) order — no Spark involved."""
    d = len(FEATS)
    X = pdf[FEATS].to_numpy(np.float64)
    was_nan = np.isnan(X)
    mis_rows = was_nan.any(axis=1)
    W = X.copy()
    leaves = np.full((len(pdf), d), -1, dtype=np.int64)
    for j in range(d):
        rows = np.where(was_nan[:, j])[0]
        if not len(rows):
            continue
        feats = np.delete(W[rows], j, axis=1)
        om = np.delete(imp.means_, j)
        feats = np.where(np.isnan(feats), om[None, :], feats)
        W[rows, j] = imp.trees_[j].predict(feats)
        leaves[rows, j] = imp.trees_[j].apply(feats)

    work = pd.DataFrame(W[mis_rows], columns=FEATS, index=np.where(mis_rows)[0])
    wleaves = leaves[mis_rows]
    wmask = was_nan[mis_rows]
    params = dict(max_clusters=imp.max_clusters, m=imp.m, alpha=imp.alpha,
                  max_iter=imp.max_FCM_iter, tol=imp.tol,
                  random_state=imp.random_state)
    prev_sum = prev_cnt = 0
    tot_sum, tot_cnt = 0.0, 0
    for _ in range(imp.max_iter):
        for j in range(d):
            for leaf in np.unique(wleaves[:, j]):
                sel = wleaves[:, j] == leaf
                grp = work[sel]
                if leaf < 0 or not wmask[sel, j].any():
                    continue
                order = grp.sort_values(FEATS, kind="mergesort").index
                M = work.loc[order, FEATS].to_numpy(np.float64)
                comp = imp.X_complete_[imp.leaf_ids_[j] == leaf]
                stacked = np.vstack([comp, M]) if len(comp) else M
                if len(stacked) < 2:
                    continue
                k = _pick_k_by_fsi(stacked, **params)
                centers, u = fcmk.fuzzy_c_means(
                    stacked, k, m=imp.m, max_iter=imp.max_FCM_iter,
                    tol=imp.tol, random_state=imp.random_state)
                pred = u[len(comp):] @ centers[:, j]
                cur = M[:, j]
                m_ord = wmask[np.searchsorted(work.index.to_numpy(), order.to_numpy()), j]
                upd = np.where(m_ord, cur + imp.learning_rate * (pred - cur), cur)
                work.loc[order, FEATS[j]] = upd
                tot_sum += float(np.abs(upd - cur).sum())
                tot_cnt += int(m_ord.sum())
        av_num, av_den = tot_sum - prev_sum, tot_cnt - prev_cnt
        prev_sum, prev_cnt = tot_sum, tot_cnt
        if av_den == 0 or av_num / av_den <= imp.stop_threshold:
            break

    out = pdf.copy()
    out.loc[work.index, FEATS] = work[FEATS].to_numpy()
    return out


def test_dt_spark_matches_driver_twin(spark):
    pdf = _frame()
    sdf = spark.createDataFrame(pdf)
    imp = FCMDTIterativeImputer(random_state=42, feature_cols=FEATS,
                                max_iter=1, max_clusters=2)
    imp.fit(sdf)
    got = imp.transform(sdf).orderBy("row_id").toPandas()
    exp = _driver_dt(pdf, imp).sort_values("row_id")
    assert np.allclose(got[FEATS].to_numpy(float), exp[FEATS].to_numpy(float))


def test_dt_stable_across_partitionings(spark):
    """Canonical in-group ordering ⇒ identical output no matter how the
    input was partitioned before the leaf shuffles."""
    pdf = _frame(seed=13)
    a = spark.createDataFrame(pdf).repartition(2)
    b = spark.createDataFrame(pdf.sample(frac=1.0, random_state=8)).repartition(11)
    mk = lambda: FCMDTIterativeImputer(random_state=4, feature_cols=FEATS,  # noqa: E731
                                       max_iter=1, max_clusters=2)
    ra = mk().fit(a).transform(a).orderBy("row_id").toPandas()
    rb = mk().fit(b).transform(b).orderBy("row_id").toPandas()
    assert np.allclose(ra[FEATS].to_numpy(float), rb[FEATS].to_numpy(float))


def test_fsi_vectorized_matches_loop():
    """The vectorized fuzzy-silhouette tracks the per-row reference loop to
    ~1 ulp (SIMD lane order shifts the reductions) and picks the same k on
    non-degenerate data. Exact engine==oracle parity does not ride on this:
    oracle_fit imports the same function, so both sides move together."""
    import numpy as np

    from ficaria_spark.operators.impute import _fuzzy_silhouette

    def loop_fsi(X, U, alpha):
        n, k = U.shape
        if n < 2:
            return 0.0
        D = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(axis=2))
        labels = U.argmax(axis=1)
        s = np.zeros(n)
        for i in range(n):
            same = labels == labels[i]
            a = D[i, same].sum() / (same.sum() - 1) if same.sum() > 1 else 0.0
            bs = [D[i, labels == c].mean() for c in range(k)
                  if c != labels[i] and (labels == c).any()]
            b = min(bs) if bs else a
            top = max(a, b)
            s[i] = (b - a) / top if top > 0 else 0.0
        srt = np.sort(U, axis=1)
        w = (srt[:, -1] - (srt[:, -2] if k > 1 else 0.0)) ** alpha
        return float((w * s).sum() / w.sum()) if w.sum() > 0 else 0.0

    rng = np.random.default_rng(5)
    for n, k in ((2, 1), (7, 2), (40, 3), (200, 4), (61, 5)):
        X = rng.normal(size=(n, 3))
        U = rng.random((n, k))
        U /= U.sum(axis=1, keepdims=True)
        # force an empty cluster sometimes
        if k >= 3:
            U[:, -1] = 0.0
        for alpha in (1.0, 2.0):
            v, l = _fuzzy_silhouette(X, U, alpha), loop_fsi(X, U, alpha)
            assert np.isclose(v, l, rtol=1e-12, atol=1e-12), (n, k, alpha, v, l)


def test_dt_leaf_size_cost_model(spark, sf_dir):
    """Cost-model pin (VERDICT r4 #4): the fitted trees' leaf sizes sit at
    the 2·min_samples_leaf−1 bound for the BULK of leaves (p50/p90), while
    the max leaf is allowed to exceed it only via the documented degenerate
    cases (duplicate feature rows / constant target / depth cap) — those
    grow with data and are what a 100× user must watch (bench.py records
    the histogram per run as `impute_dt_leaves`)."""
    from ficaria_spark.queries import _IMPUTE_FEATS, _part_matrix

    m = _part_matrix(spark, sf_dir)
    imp = FCMDTIterativeImputer(random_state=42, feature_cols=_IMPUTE_FEATS,
                                max_iter=1, max_clusters=3,
                                order_cols=("row_id",)).fit(m)
    bound = 2 * imp.min_samples_leaf - 1
    all_sizes = np.concatenate([
        np.unique(ids, return_counts=True)[1]
        for ids in imp.leaf_ids_.values()])
    assert np.percentile(all_sizes, 50) <= bound
    assert np.percentile(all_sizes, 90) <= bound
    # the bench stats helper reports the same distribution
    import bench

    stats = bench.dt_leaf_stats(spark, sf_dir)
    assert stats["n_leaves"] == len(all_sizes)
    assert stats["bound_2msl_minus_1"] == bound
