"""Fuzzy-clustering imputers, Spark-native.

Each imputer follows the reference's fit/transform contract
(/root/reference/ficaria/missing_imputation.py) re-architected for Spark:

* **fit** — runs on the driver over the *bounded-by-design* fit set (complete
  rows only, or an explicit ``fit_cap`` sample; the reference's own elbow
  search caps at 10k rows, utils.py:394) and produces small state: k×d
  centers, column means, clamps, trees. State is broadcast once per fit
  ("centroid/neighbor state broadcast per fit").
* **transform** — fully distributed. Map-only imputers (centroid / parameter /
  interpolation) are ONE ``mapInPandas`` pass with vectorized NumPy over
  Arrow batches: zero shuffles, scales linearly with input size. Grouped
  imputers (FCKI, DT-refinement) shuffle once on the cluster/leaf key and run
  the reference's sequential in-group algorithm inside
  ``groupBy().applyInPandas`` — the group is the unit of sequential
  semantics, cross-group parallelism replaces the reference's joblib.

All transforms preserve every non-feature column (row ids, entity/ts keys,
token arrays pass through untouched).
"""

from __future__ import annotations

import math
from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ficaria_spark.functions import fcm as fcmk
from ficaria_spark.functions.mice import RegressionTree, iterative_impute
from ficaria_spark.functions.validation import check_feature_frame, validate_params


class NotFittedError(RuntimeError):
    pass


# ---------------------------------------------------------------------------
# shared plumbing
# ---------------------------------------------------------------------------

def _arrow_matrix(df: DataFrame, cols: Sequence[str]) -> np.ndarray:
    """Collect a small frame of double columns as an (n, d) float64 matrix
    via toArrow — skips the toPandas object-conversion path (r7: ~0.3 s per
    fit at a 156k-row complete set). Nulls arrive as NaN and doubles pass
    through bit-exact. COLUMN-MAJOR layout, deliberately: pandas to_numpy
    returned F-order, and the FCM kernels both run ~2.3× faster on it AND
    round differently per BLAS/einsum summation order under C-order — the
    F-order copy keeps the fitted state bit-identical to every earlier
    round (r7 measurement: same values, different layout → different
    center hashes and 1.6 s vs 3.7 s per fit)."""
    tbl = df.toArrow()
    out = np.empty((tbl.num_rows, len(cols)), order="F")
    for i, c in enumerate(cols):
        out[:, i] = tbl.column(c).to_numpy(zero_copy_only=False)
    return out


def _missing_pred(cols: Sequence[str]):
    """A cell counts as missing if it is SQL NULL *or* float NaN — matching
    the fit side (na.drop excludes both) and the NumPy kernels (np.isnan).
    Features are cast to double before this is used, so F.isnan is legal."""
    pred = None
    for c in cols:
        p = F.col(c).isNull() | F.isnan(c)
        pred = p if pred is None else (pred | p)
    return pred


class _ImputerBase:
    """Common fit/transform plumbing for all imputers."""

    def __init__(self, feature_cols: Sequence[str] | None = None, fit_cap: int = 200_000):
        self.feature_cols = list(feature_cols) if feature_cols else None
        self.fit_cap = fit_cap
        self.feature_names_in_: list[str] | None = None

    # -- helpers ------------------------------------------------------------
    def _features(self, df: DataFrame) -> list[str]:
        if self.feature_cols is not None:
            return self.feature_cols
        from pyspark.sql import types as T
        num = (T.DoubleType, T.FloatType, T.IntegerType, T.LongType, T.ShortType)
        return [f.name for f in df.schema.fields if isinstance(f.dataType, num)]

    def _check_transform_cols(self, df: DataFrame) -> None:
        if self.feature_names_in_ is None:
            raise NotFittedError(f"{type(self).__name__} is not fitted yet")
        missing = [c for c in self.feature_names_in_ if c not in df.columns]
        if missing:
            raise ValueError(
                f"X.columns must match the columns seen during fit "
                f"{self.feature_names_in_}, missing {missing} instead"
            )

    def _cast_features(self, df: DataFrame) -> DataFrame:
        for c in self.feature_names_in_:
            df = df.withColumn(c, F.col(c).cast("double"))
        return df

    def _collect_complete(self, df: DataFrame, cols: list[str]) -> np.ndarray:
        """Driver-side complete-row matrix for fitting (bounded by fit_cap).
        Collected in CANONICAL order (sorted by the feature tuple) so the
        fitted state — and therefore every downstream transform — is
        invariant to how the input happened to be partitioned."""
        comp = df.na.drop("any", subset=cols).select(*cols).orderBy(*cols)
        if self.fit_cap is not None:
            comp = comp.limit(self.fit_cap)
        return _arrow_matrix(comp, cols)

    def _collect_all(self, df: DataFrame, cols: list[str]) -> np.ndarray:
        sub = df.select(*cols).orderBy(*cols)
        if self.fit_cap is not None:
            sub = sub.limit(self.fit_cap)
        return _arrow_matrix(sub, cols)

    def _map_impute(self, df: DataFrame, kernel) -> DataFrame:
        """Complete/incomplete split + one mapInPandas pass over the
        incomplete rows only: kernel(np_matrix) -> imputed np_matrix.

        Map-only — no shuffle. Complete rows NEVER leave the JVM (the
        reference's split_complete_incomplete, utils.py:7–25, as a plan
        property): at a typical 1-in-7 missing rate this cuts the Arrow
        round-trip — which measures as the whole cost of the transform, the
        NumPy kernel is noise — by ~7×."""
        cols = self.feature_names_in_
        df = self._cast_features(df)
        schema = df.schema

        from ficaria_spark.plans.layout import widen_thin_input

        mis_pred = _missing_pred(cols)
        complete = df.where(~mis_pred)
        # the Arrow round-trip is the whole cost of the transform, and a
        # single-row-group parquet source scans as 1-2 partitions (r7: the
        # sf1 part table arrives as ONE split) — widen the Python-bound
        # branch to the cluster; no-op on corpus-scale multi-file scans
        incomplete = widen_thin_input(df.where(mis_pred))

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf):
                    M = pdf[cols].to_numpy(dtype=np.float64, na_value=np.nan)
                    out = kernel(M)
                    for i, c in enumerate(cols):
                        pdf[c] = out[:, i]
                yield pdf

        return complete.unionByName(incomplete.mapInPandas(run, schema))

    def fit_transform(self, df: DataFrame) -> DataFrame:
        return self.fit(df).transform(df)


def _fill_from_nearest_center(M: np.ndarray, centers: np.ndarray) -> np.ndarray:
    """Vectorized: rows with NaNs take their missing cells from the masked-
    distance-nearest centroid (reference transform loop, vectorized:
    missing_imputation.py:156–163)."""
    out = M.copy()
    mis = np.isnan(M).any(axis=1)
    if not mis.any():
        return out
    sub = M[mis]
    d = fcmk.masked_dist(sub, centers)
    nearest = centers[np.argmin(d, axis=1)]
    out[mis] = np.where(np.isnan(sub), nearest, sub)
    return out


# ---------------------------------------------------------------------------
# I1/I2 — FCMCentroidImputer
# ---------------------------------------------------------------------------

class FCMCentroidImputer(_ImputerBase):
    """Fill each incomplete row's gaps from its nearest FCM centroid.

    Reference: missing_imputation.py:90–165. fit = FCM over complete rows
    (driver, bounded); transform = map-only vectorized pandas kernel.
    """

    def __init__(self, n_clusters: int = 3, m: float = 2.0, max_iter: int = 100,
                 tol: float = 1e-5, random_state: int | None = None,
                 feature_cols: Sequence[str] | None = None, fit_cap: int = 200_000):
        super().__init__(feature_cols, fit_cap)
        validate_params({"n_clusters": n_clusters, "m": m, "max_iter": max_iter,
                         "tol": tol, "random_state": random_state})
        self.n_clusters, self.m = n_clusters, m
        self.max_iter, self.tol, self.random_state = max_iter, tol, random_state

    def fit(self, df: DataFrame):
        cols = self._features(df)
        stats = check_feature_frame(df, cols, require_complete_rows=True)
        if self.n_clusters > stats["n_complete"]:
            raise ValueError(
                f"n_clusters must be ≤ the number of complete rows "
                f"({stats['n_complete']}), got {self.n_clusters} instead")
        X = self._collect_complete(df, cols)
        self.centers_, self.memberships_ = fcmk.fuzzy_c_means(
            X, self.n_clusters, m=self.m, max_iter=self.max_iter,
            tol=self.tol, random_state=self.random_state)
        self.feature_names_in_ = cols
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        self._check_transform_cols(df)
        centers = self.centers_
        return self._map_impute(df, lambda M: _fill_from_nearest_center(M, centers))


# ---------------------------------------------------------------------------
# I3/I4 — FCMParameterImputer
# ---------------------------------------------------------------------------

class FCMParameterImputer(FCMCentroidImputer):
    """Fill gaps with the membership-weighted centroid combination
    (reference: missing_imputation.py:241–321)."""

    def transform(self, df: DataFrame) -> DataFrame:
        self._check_transform_cols(df)
        centers, m = self.centers_, self.m

        def kernel(M: np.ndarray) -> np.ndarray:
            out = M.copy()
            mis = np.isnan(M).any(axis=1)
            if not mis.any():
                return out
            sub = M[mis]
            u = fcmk.memberships_from_dist(fcmk.masked_dist(sub, centers), m)
            est = u @ centers  # (n_mis, d) weighted centroid mix
            out[mis] = np.where(np.isnan(sub), est, sub)
            return out

        return self._map_impute(df, kernel)


# ---------------------------------------------------------------------------
# I5/I6 — FCMRoughParameterImputer
# ---------------------------------------------------------------------------

def _rough_kmeans(X: np.ndarray, u: np.ndarray, centers0: np.ndarray, *,
                  wl: float, wb: float, tau: float, max_iter: int, tol: float):
    """Rough k-means refinement of FCM output (semantics per reference
    missing_imputation.py:547–657): lower/upper masks from argmax init; per
    iteration weighted centroids (wl·lower + wb·boundary), re-assignment by
    distance-gap ≤ tau, stop on center shift < tol. Returns per-cluster
    (lower_mask, upper_mask, centers)."""
    n, k = u.shape
    centers = centers0.copy()
    labels = u.argmax(axis=1)
    lower = np.zeros((n, k), dtype=bool)
    lower[np.arange(n), labels] = True
    upper = lower.copy()

    for _ in range(max_iter):
        new_centers = centers.copy()
        for j in range(k):
            lo = lower[:, j]
            if not lo.any():
                continue
            bd = upper[:, j] & ~lo
            lo_mean = X[lo].mean(axis=0)
            new_centers[j] = wl * lo_mean + wb * X[bd].mean(axis=0) if bd.any() else lo_mean
        d = fcmk.pairwise_dist(X, new_centers)
        win = d.argmin(axis=1)
        gap_ok = (d - d[np.arange(n), win][:, None]) <= tau
        new_upper = gap_ok
        single = new_upper.sum(axis=1) == 1
        new_lower = np.zeros_like(new_upper)
        new_lower[np.where(single)[0], win[single]] = True
        if np.linalg.norm(new_centers - centers) < tol:
            break
        centers, upper, lower = new_centers, new_upper, new_lower
    return lower, upper, centers


def _mean_member_dist(block: np.ndarray, members: np.ndarray,
                      chunk: int = 128) -> np.ndarray:
    """Per-row mean NaN-masked distance to a member-row matrix, chunked over
    the BLOCK axis only: masked_dist materializes an (n, |members|, d) diff
    tensor, and with fit-scale member sets (10⁴–10⁵ rows) an unchunked call
    allocates gigabyte temps that thrash cache/DRAM. Rows are independent and
    the member axis stays whole per call, so the result is BIT-IDENTICAL to
    the unchunked expression (same einsum and mean order per row)."""
    out = np.empty(len(block))
    for s in range(0, len(block), chunk):
        out[s:s + chunk] = fcmk.masked_dist(block[s:s + chunk], members).mean(axis=1)
    return out


class FCMRoughParameterImputer(_ImputerBase):
    """FCM + rough k-means: fill gaps with column means of the better-matching
    (lower vs upper) approximation set of the nearest rough cluster.

    Reference: missing_imputation.py:439–657. NOTE — the reference computes
    the nearest-center distances for incomplete rows *without* a NaN mask
    (missing_imputation.py:525), which makes every distance NaN and
    degenerates the choice; this engine uses NaN-masked distances (the
    documented intent). State kept small for broadcast: per-cluster/side
    column means + member-row matrices from the bounded fit set.
    """

    def __init__(self, n_clusters: int = 3, m: float = 2.0, wl: float = 0.6,
                 wb: float = 0.4, tau: float = 0.5, max_iter: int = 100,
                 max_iter_rough_k: int = 100, tol: float = 1e-5,
                 random_state: int | None = None,
                 feature_cols: Sequence[str] | None = None, fit_cap: int = 200_000):
        super().__init__(feature_cols, fit_cap)
        validate_params({"n_clusters": n_clusters, "m": m, "max_iter": max_iter,
                         "max_iter_rough_k": max_iter_rough_k, "wl": wl,
                         "wb": wb, "tau": tau, "tol": tol,
                         "random_state": random_state})
        if not math.isclose(wl + wb, 1.0, rel_tol=1e-9):
            raise ValueError(f"wl + wb must equal 1, got {wl + wb} instead")
        self.n_clusters, self.m, self.wl, self.wb, self.tau = n_clusters, m, wl, wb, tau
        self.max_iter, self.max_iter_rough_k = max_iter, max_iter_rough_k
        self.tol, self.random_state = tol, random_state

    def fit(self, df: DataFrame):
        cols = self._features(df)
        stats = check_feature_frame(df, cols, require_complete_rows=True)
        if self.n_clusters > stats["n_complete"]:
            raise ValueError(
                f"n_clusters must be ≤ the number of complete rows "
                f"({stats['n_complete']}), got {self.n_clusters} instead")
        X = self._collect_complete(df, cols)
        self.centers_, self.memberships_ = fcmk.fuzzy_c_means(
            X, self.n_clusters, m=self.m, max_iter=self.max_iter,
            tol=self.tol, random_state=self.random_state)
        lower, upper, centers = _rough_kmeans(
            X, self.memberships_, self.centers_, wl=self.wl, wb=self.wb,
            tau=self.tau, max_iter=self.max_iter_rough_k, tol=self.tol)
        self.clusters_ = [
            (X[lower[:, j]], X[upper[:, j]], centers[j])
            for j in range(self.n_clusters)
        ]
        self.feature_names_in_ = cols
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        self._check_transform_cols(df)
        clusters = self.clusters_
        centers = np.stack([c for _, _, c in clusters])

        def kernel(M: np.ndarray) -> np.ndarray:
            out = M.copy()
            mis_rows = np.where(np.isnan(M).any(axis=1))[0]
            if not len(mis_rows):
                return out
            sub = M[mis_rows]
            nearest = np.argmin(fcmk.masked_dist(sub, centers), axis=1)
            for j in np.unique(nearest):
                lower, upper, _ = clusters[j]
                rows = mis_rows[nearest == j]
                block = M[rows]
                if len(lower) == 0:
                    chosen = [upper] * len(rows)
                elif len(upper) == 0:
                    chosen = [lower] * len(rows)
                else:
                    dl = _mean_member_dist(block, lower)
                    du = _mean_member_dist(block, upper)
                    chosen = [lower if a <= b else upper for a, b in zip(dl, du)]
                for r, side in zip(rows, chosen):
                    gaps = np.isnan(M[r])
                    out[r, gaps] = side[:, gaps].mean(axis=0)
            return out

        return self._map_impute(df, kernel)


# ---------------------------------------------------------------------------
# I7–I10 — FCMKIterativeImputer (FCKI, the flagship)
# ---------------------------------------------------------------------------

def _ki_impute_group(
    Xg: np.ndarray,
    train: np.ndarray,
    *,
    means: np.ndarray,
    seed: int | None,
    max_k: int,
    max_ii_iter: int,
    vmin: float,
    vmax: float,
) -> np.ndarray:
    """The KI kernel: sequential kNN + iterative-imputation within one FCM
    cluster (reference semantics: missing_imputation.py:891–985). Runs inside
    applyInPandas — one pandas/NumPy frame per cluster; sequential in-group
    updates (later rows see earlier imputations) are preserved because the
    group is one task. Fresh RandomState per group mirrors the reference's
    joblib workers each receiving a pickled copy of the fit-time RNG.
    """
    out = Xg.copy()
    mis_mask = np.isnan(Xg).any(axis=1)
    if not mis_mask.any():
        return out
    order = np.argsort(np.isnan(Xg).sum(axis=1)[mis_mask], kind="mergesort")
    mis_rows = np.where(mis_mask)[0][order]

    n_in = len(Xg)
    pool = np.vstack([Xg, train]) if len(train) else Xg.copy()
    rng = np.random.RandomState(seed)

    for r in mis_rows:
        xi = pool[r].copy()
        gaps = np.isnan(xi)
        if gaps.all():
            imputed = means.copy()
        else:
            # candidate pool: rows observed in every one of xi's missing cols
            cand = ~np.isnan(pool[:, gaps]).any(axis=1)
            cand[r] = False
            P = pool[cand]
            if len(P) == 0:
                imputed = np.where(gaps, means, xi)
            else:
                # self-mask one random observed cell to tune k
                d = xi.shape[0]
                a_r = rng.randint(0, d)
                while np.isnan(xi[a_r]):
                    a_r = rng.randint(0, d)
                held = xi[a_r]
                probe = xi.copy()
                probe[a_r] = np.nan
                m = ~np.isnan(P) & ~np.isnan(probe)[None, :]
                diffs = np.where(m, P - probe[None, :], 0.0)
                dist = np.sqrt((diffs**2).sum(axis=1))
                sorted_idx = np.argsort(dist, kind="mergesort")
                kmax = min(len(P), max_k)
                svals = P[sorted_idx, a_r]
                errs = np.full(kmax, np.inf)
                for ki in range(1, kmax + 1):
                    v = svals[:ki]
                    v = v[~np.isnan(v)]
                    if v.size:
                        errs[ki - 1] = abs(v.mean() - held)
                best_k = int(np.argmin(errs)) + 1
                nbrs = P[sorted_idx[:best_k]]
                S = np.vstack([nbrs, xi])
                S_f = iterative_impute(S, max_iter=max_ii_iter, min_value=vmin, max_value=vmax)
                imputed = S_f[-1]
        out[r] = imputed
        pool[r] = imputed  # later rows in this cluster see this imputation
    return out


class FCMKIterativeImputer(_ImputerBase):
    """FCKI: FCM clustering + per-cluster sequential kNN/iterative imputation.

    Reference: missing_imputation.py:735–1024. Spark plan:
      fit    — driver FCM over mean-filled bounded train set; broadcast
               (centers, train rows, labels, means, clamps).
      transform — ① map-only pandas UDF tags each row with its argmax-
               membership cluster; ② ONE shuffle on cluster id;
               ③ groupBy(cluster).applyInPandas runs the sequential KI kernel
               per cluster (cross-cluster parallelism ≡ reference joblib).
    Skewed cluster sizes are the skew risk here — AQE handles the join side;
    for aggregation-side skew see operators/skew.py.

    **Scale ceiling and the ``bucket_size`` modes.** With the reference's
    semantics the transform's parallelism is capped at ``n_clusters`` tasks,
    and each task holds a whole cluster in one pandas frame — fine at fit
    scale, a ceiling at 100×. ``bucket_size=N`` splits every cluster into
    deterministic hash buckets of ≈N rows that are imputed independently,
    sharing only the broadcast fit-train pool. This is a DOCUMENTED SEMANTICS
    DEVIATION from the reference: a row no longer sees imputations of
    same-cluster rows in *other* buckets (it still sees earlier rows in its
    own bucket and the whole train pool). Parallelism becomes
    Σ ceil(cluster/N) tasks and per-task memory is bounded by N.

    - ``bucket_size=None`` (default) — AUTO: buckets of ``AUTO_BUCKET_ROWS``
      (100k) rows. Clusters at or under the threshold get exactly one bucket,
      i.e. bit-identical reference semantics; an oversized cluster is split
      (with a ``UserWarning`` naming the deviation) instead of silently
      capping the job at k tasks and one monster pandas frame. A 100×-scale
      user gets the scale path without knowing to ask for it.
    - ``bucket_size=0`` — exact-reference mode: never bucket, never run the
      sizing pre-pass (zero extra jobs; this is what the parity tests pin).
    - ``bucket_size=N>0`` — explicit bucket rows.

    Bucketing modes run ONE extra sizing job: the tagged frame is
    tracked_persist()-ed, counted per cluster (k rows to the driver), and
    reused by the main pass — the per-row FCM tagging never computes twice.
    Call ``plans.cache.release_operator_caches()`` after the consuming
    action, per the library-wide cache contract. The sizing job is SKIPPED
    (exact semantics, zero extra jobs, no persist) when it is provably
    unnecessary: auto mode, ``transform()`` called on the same DataFrame
    object that was fitted, and the fit collect came back under ``fit_cap``
    (so the frame's exact total row count is known) with that total ≤
    ``AUTO_BUCKET_ROWS`` — the reference's own fit_transform flow.

    MIGRATION NOTE (vs the reference's ``FCMKIterativeImputer``): the
    DEFAULT ``bucket_size=None`` deviates from reference semantics only for
    clusters over ``AUTO_BUCKET_ROWS`` rows (split with a ``UserWarning``);
    pass ``bucket_size=0`` for bit-exact reference behavior at k-task
    parallelism.
    """

    #: auto-mode bucket rows: clusters larger than this deviate (split);
    #: smaller clusters keep exact reference semantics (single bucket)
    AUTO_BUCKET_ROWS = 100_000

    def __init__(self, n_clusters: int | None = None, m: float = 2.0,
                 max_clusters: int = 10, max_k: int = 10, max_FCM_iter: int = 100,
                 max_II_iter: int = 10, tol: float = 1e-5,
                 random_state: int | None = None,
                 feature_cols: Sequence[str] | None = None, fit_cap: int = 200_000,
                 order_cols: Sequence[str] | None = None,
                 bucket_size: int | None = None):
        super().__init__(feature_cols, fit_cap)
        if bucket_size is not None and (not isinstance(bucket_size, int) or bucket_size < 0):
            raise ValueError(
                f"bucket_size must be a non-negative int or None, got {bucket_size}")
        self.bucket_size = bucket_size
        validate_params({"n_clusters_nullable": n_clusters, "m": m,
                         "max_clusters": max_clusters,
                         "max_k": max_k, "max_FCM_iter": max_FCM_iter,
                         "max_II_iter": max_II_iter, "tol": tol,
                         "random_state": random_state})
        self.n_clusters, self.m, self.max_clusters, self.max_k = n_clusters, m, max_clusters, max_k
        self.max_FCM_iter, self.max_II_iter = max_FCM_iter, max_II_iter
        self.tol, self.random_state = tol, random_state
        # canonical in-group sort = features + order_cols: pass a unique key
        # (e.g. a row id) when feature-tuple ties are possible, so the
        # sequential kernel's row order — and thus the output — is a total
        # function of the data, not of shuffle arrival order.
        self.order_cols = list(order_cols) if order_cols else []

    def fit(self, df: DataFrame):
        cols = self._features(df)
        check_feature_frame(df, cols, no_nan_columns=True)
        Xtr = self._collect_all(df, cols)
        self.X_train_ = Xtr
        self.means_ = np.nanmean(Xtr, axis=0)
        filled = np.where(np.isnan(Xtr), self.means_[None, :], Xtr)
        # sizing-skip proof state (ADVICE r4): if the fit collect came back
        # UNDER fit_cap, it saw the ENTIRE frame, so the frame's total row
        # count is known exactly; transform() on the very same DataFrame
        # object can then skip the bucket-sizing job when that total already
        # fits in one bucket
        self._fit_df_ = df
        self._fit_exact_n_ = (
            len(Xtr) if self.fit_cap is None or len(Xtr) < self.fit_cap
            else None)
        k = self.n_clusters
        if k is None:
            k = fcmk.find_optimal_clusters(
                filled, max_clusters=self.max_clusters, random_state=self.random_state,
                m=self.m, max_iter=self.max_FCM_iter, tol=self.tol)
        if k > len(Xtr):
            raise ValueError("n_clusters cannot be larger than the number of rows in X")
        self.n_clusters_ = k
        self.centers_, self.u_ = fcmk.fuzzy_c_means(
            filled, k, m=self.m, max_iter=self.max_FCM_iter,
            tol=self.tol, random_state=self.random_state)
        self.labels_train_ = self.u_.argmax(axis=1)
        self.min_value_ = float(np.nanmin(Xtr))
        self.max_value_ = float(np.nanmax(Xtr))
        self.feature_names_in_ = cols
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        self._check_transform_cols(df)
        cols = self.feature_names_in_
        same_as_fit = df is getattr(self, "_fit_df_", None)
        # one-shot proof: release the fit frame after the first transform —
        # (a) a DataFrame is lazy, so if the underlying SOURCE gained rows
        # between fit and a LATER transform the same object would re-evaluate
        # larger and an oversized cluster could reach the single-bucket
        # kernel unsized (the fit_transform flow the skip exists for runs
        # back-to-back, where the static-source assumption holds); (b) keeping
        # the reference would pin the fit DataFrame's lineage for the
        # imputer's lifetime
        self._fit_df_ = None
        df = self._cast_features(df)
        spark = df.sparkSession
        bc = spark.sparkContext.broadcast({
            "centers": self.centers_, "m": self.m, "means": self.means_,
            "train": self.X_train_, "labels": self.labels_train_,
            "seed": self.random_state, "max_k": self.max_k,
            "max_ii": self.max_II_iter,
            "vmin": self.min_value_, "vmax": self.max_value_,
        })

        tagged, group_keys = self._tag_and_bucket(df, bc, same_as_fit=same_as_fit)
        tagged_schema = tagged.schema

        # ②③ one shuffle on (cluster[, bucket]); sequential KI kernel per group.
        # Row order WITHIN a shuffled group is nondeterministic, but the KI
        # algorithm is order-sensitive (later rows see earlier imputations) —
        # impose a canonical order (sort by the feature tuple) so results are
        # reproducible across runs and cluster layouts.
        missing_order = [c for c in self.order_cols if c not in df.columns]
        if missing_order:
            raise ValueError(
                f"order_cols {missing_order} not present in the transform "
                f"input — the determinism contract needs them")
        sort_keys = cols + self.order_cols

        def ki(pdf: pd.DataFrame) -> pd.DataFrame:
            st = bc.value
            if not len(pdf):
                return pdf
            pdf = pdf.sort_values(sort_keys, kind="mergesort").reset_index(drop=True)
            cl = int(pdf["__cluster"].iloc[0])
            M = pdf[cols].to_numpy(dtype=np.float64, na_value=np.nan)
            train_cl = st["train"][st["labels"] == cl]
            out = _ki_impute_group(
                M, train_cl, means=st["means"], seed=st["seed"],
                max_k=st["max_k"], max_ii_iter=st["max_ii"],
                vmin=st["vmin"], vmax=st["vmax"])
            for i, c in enumerate(cols):
                pdf[c] = out[:, i]
            return pdf

        imputed = tagged.groupBy(*group_keys).applyInPandas(ki, tagged_schema)
        return imputed.drop(*group_keys)

    def _tag_and_bucket(self, df: DataFrame, bc, *,
                        same_as_fit: bool = False) -> tuple[DataFrame, list[str]]:
        """① tag rows with their argmax-membership cluster (map-only,
        Arrow-vectorized); in bucketing modes, also assign deterministic
        intra-cluster hash buckets (one sizing job over the persisted tagged
        frame: k rows to the driver) so group parallelism is
        Σ ceil(cluster/bucket_size), not k. See the class docstring for the
        bucket_size mode table."""
        cols = self.feature_names_in_

        def tag(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            st = bc.value
            for pdf in batches:
                if len(pdf):
                    M = pdf[cols].to_numpy(dtype=np.float64, na_value=np.nan)
                    filled = np.where(np.isnan(M), st["means"][None, :], M)
                    u = fcmk.fcm_predict(filled, st["centers"], st["m"])
                    pdf["__cluster"] = u.argmax(axis=1).astype(np.int32)
                else:
                    pdf["__cluster"] = pd.Series([], dtype="int32")
                yield pdf

        from pyspark.sql import types as T
        tagged_schema = T.StructType(
            df.schema.fields + [T.StructField("__cluster", T.IntegerType())])
        tagged = df.mapInPandas(tag, tagged_schema)
        if self.bucket_size == 0:  # exact-reference mode: no sizing job
            return tagged, ["__cluster"]
        if (self.bucket_size is None and same_as_fit
                and getattr(self, "_fit_exact_n_", None) is not None
                and self._fit_exact_n_ <= self.AUTO_BUCKET_ROWS):
            # SOUND sizing-skip (ADVICE r4): the fit collect returned fewer
            # than fit_cap rows, so it saw the whole frame and its total row
            # count is exact; transform() was handed the SAME DataFrame
            # object, and the total already fits in one bucket → no cluster
            # can be oversized. Exact reference semantics, zero sizing jobs,
            # no persist. (Fit-time CLUSTER sizes alone would not be a proof
            # — the transform frame can be arbitrarily larger than the
            # capped fit sample.)
            # STATIC-SOURCE ASSUMPTION (ADVICE r5): the proof counts rows at
            # fit time but the frame is lazy — it holds only if the
            # underlying source did not gain rows between fit and transform.
            # transform() therefore consumes `_fit_df_` (cleared on first
            # use), restricting the skip to the back-to-back fit→transform
            # flow the reference's fit_transform mandates; any later
            # transform call re-runs the sizing job.
            return tagged, ["__cluster"]
        bucket_rows = self.bucket_size or self.AUTO_BUCKET_ROWS
        # persist BEFORE the sizing count so the per-row FCM tagging runs
        # once, not once per job; released by the caller's cache contract
        from ficaria_spark.plans.cache import tracked_persist
        tagged = tracked_persist(tagged)
        counts = tagged.groupBy("__cluster").agg(F.count("*").alias("cnt")).collect()
        nb = {int(r["__cluster"]): max(1, -(-int(r["cnt"]) // bucket_rows))
              for r in counts}
        if self.bucket_size is None and all(v == 1 for v in nb.values()):
            # auto mode, no oversized cluster → exact reference semantics,
            # plain per-cluster grouping
            return tagged, ["__cluster"]
        if self.bucket_size is None:
            import warnings
            big = {c: v for c, v in nb.items() if v > 1}
            warnings.warn(
                "FCKI auto-bucketing engaged: cluster(s) "
                f"{sorted(big)} exceed AUTO_BUCKET_ROWS="
                f"{self.AUTO_BUCKET_ROWS} rows and were split into "
                f"{big} hash buckets imputed independently (documented "
                "deviation from reference semantics: rows do not see "
                "imputations from other buckets of their cluster; pass "
                "bucket_size=0 to force exact semantics at k-task "
                "parallelism)", UserWarning, stacklevel=3)
        nb_map = F.create_map(*[F.lit(v) for kv in sorted(nb.items()) for v in kv])
        # bucket id from the row's own values (features + tiebreak cols):
        # deterministic under any partitioning, no extra shuffle
        bucket = F.pmod(F.xxhash64(*cols, *self.order_cols),
                        F.element_at(nb_map, F.col("__cluster"))).cast("int")
        return tagged.withColumn("__bucket", bucket), ["__cluster", "__bucket"]


# ---------------------------------------------------------------------------
# I11/I12 — FCMInterpolationIterativeImputer (LI-IIFCM)
# ---------------------------------------------------------------------------

def _ifcm(data: np.ndarray, miss_mask: np.ndarray, *, n_clusters: int, m: float,
          alpha: float, use_sigma: bool, max_iter: int, tol: float,
          random_state: int | None):
    """Intuitionistic FCM with per-iteration re-imputation of originally-
    missing cells (reference: missing_imputation.py:1201–1268). Vectorized:
    hesitation n = 1 − u − (1−u)^(1/α); u* = u + n drives the centroids; the
    missing cells are refreshed to Σu·c/Σu each iteration until the mean
    absolute update ≤ tol."""
    X = data.copy()
    n = X.shape[0]
    rng = np.random.default_rng(random_state)
    u = rng.random((n, n_clusters))
    u /= u.sum(axis=1, keepdims=True)
    mis_rows = miss_mask.any(axis=1)
    sigma = None
    centers = None

    for _ in range(max_iter):
        hes = 1.0 - u - (1.0 - u) ** (1.0 / alpha)
        w = (u + hes) ** m
        centers = (w.T @ X) / w.sum(axis=0)[:, None]
        if use_sigma:
            diff2 = (X[:, None, :] - centers[None, :, :]) ** 2
            sigma = np.einsum("nk,nkd->kd", w, diff2) / w.sum(axis=0)[:, None]
            dist = np.sqrt((diff2 / (sigma[None, :, :] + 1e-10)).sum(axis=2))
        else:
            dist = fcmk.pairwise_dist(X, centers)
        dist = np.fmax(dist, 1e-10)
        u = fcmk.memberships_from_dist(dist, m)

        prior = X[mis_rows].copy()
        est = (u @ centers) / u.sum(axis=1, keepdims=True)
        X[miss_mask] = est[miss_mask]
        if mis_rows.any():
            if np.abs(X[mis_rows] - prior).mean() <= tol:
                break
        else:
            break
    return centers, sigma


class FCMInterpolationIterativeImputer(_ImputerBase):
    """LI-IIFCM: linear interpolation bootstrap + intuitionistic FCM refit;
    transform fills gaps from the nearest (optionally σ-scaled) center.

    Reference: missing_imputation.py:1079–1268. The fit-side interpolation is
    positional in row order — at scale run :func:`operators.temporal.
    interpolate_linear` per entity instead; here fit data is bounded.
    ``order_col`` fixes the row order deterministically.
    """

    def __init__(self, n_clusters: int = 3, m: float = 2.0, alpha: float = 2.0,
                 sigma: bool = False, max_iter: int = 100, tol: float = 1e-5,
                 random_state: int | None = None, order_col: str | None = None,
                 feature_cols: Sequence[str] | None = None, fit_cap: int = 200_000):
        super().__init__(feature_cols, fit_cap)
        validate_params({"n_clusters": n_clusters, "m": m, "max_iter": max_iter,
                         "tol": tol, "random_state": random_state})
        # ad-hoc checks mirroring the reference (missing_imputation.py:1102–1108)
        if not isinstance(alpha, (int, float)) or isinstance(alpha, bool):
            raise TypeError(f"alpha must be int or float, got {type(alpha).__name__} instead")
        if alpha <= 0:
            raise ValueError(f"alpha must be > 0, got {alpha} instead")
        if not isinstance(sigma, bool):
            raise TypeError(f"sigma must be bool, got {type(sigma).__name__} instead")
        self.n_clusters, self.m, self.alpha, self.sigma = n_clusters, m, alpha, sigma
        self.max_iter, self.tol, self.random_state = max_iter, tol, random_state
        self.order_col = order_col

    def fit(self, df: DataFrame):
        cols = self._features(df)
        check_feature_frame(df, cols, no_nan_columns=True)
        sel = df.select(*([self.order_col] if self.order_col else []), *cols)
        if self.order_col:
            sel = sel.orderBy(self.order_col)
        if self.fit_cap is not None:
            sel = sel.limit(self.fit_cap)
        pdf = sel.toPandas()[cols]
        miss_mask = pdf.isna().to_numpy()
        filled = pdf.interpolate(method="linear", axis=0, limit_direction="both")
        self.centers_, self.sigma_ = _ifcm(
            filled.to_numpy(dtype=np.float64), miss_mask,
            n_clusters=self.n_clusters, m=self.m, alpha=self.alpha,
            use_sigma=self.sigma, max_iter=self.max_iter, tol=self.tol,
            random_state=self.random_state)
        self.feature_names_in_ = cols
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        self._check_transform_cols(df)
        centers, sigma = self.centers_, self.sigma_

        def kernel(M: np.ndarray) -> np.ndarray:
            out = M.copy()
            mis = np.isnan(M).any(axis=1)
            if not mis.any():
                return out
            sub = M[mis]
            if sigma is not None:
                obs = ~np.isnan(sub)
                Xz = np.nan_to_num(sub, nan=0.0)
                diff2 = ((Xz[:, None, :] - centers[None, :, :]) ** 2) * obs[:, None, :]
                d = np.sqrt((diff2 / (sigma[None, :, :] + 1e-10)).sum(axis=2))
            else:
                d = fcmk.masked_dist(sub, centers)
            nearest = centers[np.argmin(d, axis=1)]
            out[mis] = np.where(np.isnan(sub), nearest, sub)
            return out

        return self._map_impute(df, kernel)


# ---------------------------------------------------------------------------
# I13–I17 — FCMDTIterativeImputer
# ---------------------------------------------------------------------------

def _fuzzy_silhouette(X: np.ndarray, U: np.ndarray, alpha: float) -> float:
    """Fuzzy Silhouette Index over a leaf-local frame (reference:
    missing_imputation.py:1515–1562). O(n²) confined to one leaf group.

    Vectorized: per-cluster distance sums via axis-1 reductions instead of a
    per-row Python loop (the loop dominated FCMDT transform wall time on
    1k+-row leaves). SIMD lane order makes the reduction differ from the
    rowwise loop by ~1 ulp — allclose(1e-12) to it, same k choices on
    non-degenerate data (test_fsi_vectorized_matches_loop); the oracle twin
    (oracle_fit) imports THIS function, so engine==oracle parity is exact by
    construction either way."""
    n, k = U.shape
    if n < 2:
        return 0.0
    D = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(axis=2))
    labels = U.argmax(axis=1)
    cnt = np.bincount(labels, minlength=k)
    csum = np.empty((n, k))
    for c in range(k):
        csum[:, c] = D[:, labels == c].sum(axis=1)
    own = csum[np.arange(n), labels]
    own_cnt = cnt[labels]
    a = np.where(own_cnt > 1, own / np.maximum(own_cnt - 1, 1), 0.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        means = csum / cnt[None, :]
    means[:, cnt == 0] = np.inf
    means[np.arange(n), labels] = np.inf
    b = means.min(axis=1)
    b = np.where(np.isfinite(b), b, a)  # no other non-empty cluster → b = a
    top = np.maximum(a, b)
    with np.errstate(divide="ignore", invalid="ignore"):
        s = np.where(top > 0, (b - a) / top, 0.0)
    srt = np.sort(U, axis=1)
    w = (srt[:, -1] - (srt[:, -2] if k > 1 else 0.0)) ** alpha
    return float((w * s).sum() / w.sum()) if w.sum() > 0 else 0.0


def _pick_k_by_fsi(X: np.ndarray, *, max_clusters: int, m: float, alpha: float,
                   max_iter: int, tol: float, random_state: int | None) -> int:
    if len(X) < 2:
        return 1
    best_k, best_fsi = 1, -np.inf
    for c in range(1, min(len(X), max_clusters) + 1):
        _, u = fcmk.fuzzy_c_means(X, c, m=m, max_iter=max_iter, tol=tol,
                                  random_state=random_state)
        fsi = _fuzzy_silhouette(X, u, alpha)
        if fsi > best_fsi:
            best_k, best_fsi = c, fsi
    return best_k


class FCMDTIterativeImputer(_ImputerBase):
    """Per-column decision trees for initial imputation + leaf-local FCM
    refinement until the mean update over missing cells ≤ stop_threshold.

    Reference: missing_imputation.py:1310–1698. Spark plan: trees fit on the
    driver over bounded complete rows and broadcast; ① initial imputation is
    ONE map-only pass (vectorized tree.predict per batch); ② each refinement
    sweep groups incomplete rows by (column, leaf) — `groupBy(leaf).
    applyInPandas` per column — and the driver loops sweeps until converged
    (AV from a Spark aggregate; each sweep is ONE job chain — the Δ-aggregate
    action materializes the sweep's lazy localCheckpoint).

    **Cost model (measured; bench.py records `impute_dt_leaves` per run).**
    Refinement work is Σ_leaf O(leaf² · max_clusters) per (sweep, column):
    each leaf group runs a k-sweep of leaf-local FCM fits plus an O(leaf²)
    fuzzy-silhouette. Fitted-tree leaf sizes sit at the
    ``2·min_samples_leaf − 1`` split bound for the bulk of leaves (p50/p90
    pinned in tests), so total refinement cost is ≈ linear in the number of
    incomplete rows. The exceptions — and the thing to WATCH at 100× — are
    DEGENERATE leaves (duplicate feature rows, constant target, or the
    depth-20 cap), which cannot split and therefore grow linearly with the
    fit sample (observed: max leaf 9→100→1089 across sf0.001→0.01→0.1
    while p90 stayed ≤ 9); a transform additionally groups ALL incomplete
    rows that land in one leaf into one pandas frame, reference semantics
    identical to FCKI's per-cluster frames. Heavily duplicated feature
    columns at corpus scale ⇒ raise ``min_samples_leaf``/features or accept
    the reference's own O(leaf²) on those leaves.
    """

    def __init__(self, min_samples_leaf: int = 5, learning_rate: float = 0.3,
                 stop_threshold: float = 1e-3, max_iter: int = 10,
                 max_clusters: int = 5, m: float = 2.0, alpha: float = 1.0,
                 max_FCM_iter: int = 100, tol: float = 1e-5,
                 random_state: int | None = None,
                 feature_cols: Sequence[str] | None = None, fit_cap: int = 200_000,
                 order_cols: Sequence[str] | None = None):
        super().__init__(feature_cols, fit_cap)
        validate_params({"m": m, "tol": tol, "random_state": random_state,
                         "learning_rate": learning_rate,
                         "min_samples_leaf": min_samples_leaf,
                         "stop_threshold": stop_threshold,
                         "max_clusters": max_clusters,
                         "max_FCM_iter": max_FCM_iter})
        # ad-hoc alpha check mirroring the reference (missing_imputation.py:1371–1374)
        if not isinstance(alpha, (int, float)) or isinstance(alpha, bool):
            raise TypeError(f"alpha must be int or float, got {type(alpha).__name__} instead")
        if alpha <= 0:
            raise ValueError(f"alpha must be > 0, got {alpha} instead")
        self.min_samples_leaf, self.learning_rate = min_samples_leaf, learning_rate
        self.stop_threshold, self.max_iter = stop_threshold, max_iter
        self.max_clusters, self.m, self.alpha = max_clusters, m, alpha
        self.max_FCM_iter, self.tol, self.random_state = max_FCM_iter, tol, random_state
        # see FCMKIterativeImputer.order_cols — tiebreak for the canonical
        # in-group sort when feature-tuple ties are possible
        self.order_cols = list(order_cols) if order_cols else []

    def fit(self, df: DataFrame):
        cols = self._features(df)
        if len(cols) < 2:
            raise ValueError(
                f"X must contain at least 2 columns, got {len(cols)} column instead")
        check_feature_frame(df, cols, require_complete_rows=True)
        Xc = self._collect_complete(df, cols)
        self.X_complete_ = Xc
        self.means_ = Xc.mean(axis=0)
        self.trees_: dict[int, RegressionTree] = {}
        self.leaf_ids_: dict[int, np.ndarray] = {}
        for j in range(len(cols)):
            others = np.delete(Xc, j, axis=1)
            t = RegressionTree(min_samples_leaf=self.min_samples_leaf).fit(others, Xc[:, j])
            self.trees_[j] = t
            self.leaf_ids_[j] = t.apply(others)
        self.feature_names_in_ = cols
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        self._check_transform_cols(df)
        cols = self.feature_names_in_
        d = len(cols)
        df = self._cast_features(df)
        spark = df.sparkSession
        bc = spark.sparkContext.broadcast({
            "trees": self.trees_, "leaf_ids": self.leaf_ids_,
            "X_complete": self.X_complete_, "means": self.means_,
        })
        from pyspark.sql import types as T

        from ficaria_spark.plans.layout import widen_thin_input

        mis_pred = _missing_pred(cols)
        complete = df.where(~mis_pred)
        # widen the Python-bound branch (see _map_impute — same single-
        # row-group scan pinning, r7)
        incomplete = widen_thin_input(df.where(mis_pred))

        # ① initial DT imputation + leaf tagging (map-only, vectorized)
        leaf_cols = [f"__leaf_{j}" for j in range(d)]
        mask_cols = [f"__was_nan_{j}" for j in range(d)]

        def initial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            st = bc.value
            for pdf in batches:
                n = len(pdf)
                M = pdf[cols].to_numpy(dtype=np.float64, na_value=np.nan) if n else np.zeros((0, d))
                leaves = np.full((n, d), -1, dtype=np.int64)
                was_nan = np.isnan(M)
                W = M.copy()
                for j in range(d):
                    rows = np.where(was_nan[:, j])[0]
                    if not len(rows):
                        continue
                    feats = np.delete(W[rows], j, axis=1)
                    other_means = np.delete(st["means"], j)
                    feats = np.where(np.isnan(feats), other_means[None, :], feats)
                    tree = st["trees"][j]
                    W[rows, j] = tree.predict(feats)
                    leaves[rows, j] = tree.apply(feats)
                for i, c in enumerate(cols):
                    pdf[c] = W[:, i]
                    pdf[leaf_cols[i]] = leaves[:, i]
                    pdf[mask_cols[i]] = was_nan[:, i]
                # per-row |update| accumulators: summed ONCE per sweep instead
                # of one join+collect per column (d× fewer driver round-trips)
                pdf["__dsum"] = 0.0
                pdf["__dcnt"] = np.int64(0)
                yield pdf

        tagged_schema = T.StructType(
            df.schema.fields
            + [T.StructField(lc, T.LongType()) for lc in leaf_cols]
            + [T.StructField(mc, T.BooleanType()) for mc in mask_cols]
            + [T.StructField("__dsum", T.DoubleType()),
               T.StructField("__dcnt", T.LongType())])

        work = incomplete.mapInPandas(initial, tagged_schema).localCheckpoint()

        # ② refinement sweeps: per column, group by leaf. The d column
        # refinements of one sweep CHAIN lazily (each applyInPandas feeds the
        # next — sequential semantics preserved); the sweep materializes with
        # ONE action (localCheckpoint + a single Δ-aggregate), so driver
        # round-trips are per sweep, not per (sweep, column).
        lr = self.learning_rate
        params = dict(max_clusters=self.max_clusters, m=self.m, alpha=self.alpha,
                      max_iter=self.max_FCM_iter, tol=self.tol,
                      random_state=self.random_state)

        missing_order = [c for c in self.order_cols if c not in df.columns]
        if missing_order:
            raise ValueError(
                f"order_cols {missing_order} not present in the transform "
                f"input — the determinism contract needs them")
        refine_keys = cols + self.order_cols

        def make_refine(j: int, jleaf: str, jmask: str):
            def refine(pdf: pd.DataFrame) -> pd.DataFrame:
                st = bc.value
                leaf = int(pdf[jleaf].iloc[0])
                if leaf < 0 or not pdf[jmask].any():
                    return pdf
                # canonical in-group order: the leaf-local FCM's seeded init
                # assigns memberships by row POSITION, so shuffle arrival
                # order must not leak into results (same fix as FCKI).
                # Rows tied on (features, order_cols) are interchangeable —
                # their converged memberships are value-determined.
                pdf = pdf.sort_values(refine_keys, kind="mergesort").reset_index(drop=True)
                comp = st["X_complete"][st["leaf_ids"][j] == leaf]
                M = pdf[cols].to_numpy(dtype=np.float64)
                stacked = np.vstack([comp, M]) if len(comp) else M
                if len(stacked) < 2:
                    return pdf
                k = _pick_k_by_fsi(stacked, **params)
                centers, u = fcmk.fuzzy_c_means(
                    stacked, k, m=params["m"], max_iter=params["max_iter"],
                    tol=params["tol"], random_state=params["random_state"])
                pred = u[len(comp):] @ centers[:, j]
                cur = M[:, j]
                mask = pdf[jmask].to_numpy()
                upd = np.where(mask, cur + lr * (pred - cur), cur)
                pdf[cols[j]] = upd
                pdf["__dsum"] = pdf["__dsum"].to_numpy() + np.abs(upd - cur)
                pdf["__dcnt"] = pdf["__dcnt"].to_numpy() + mask.astype(np.int64)
                return pdf

            return refine

        prev_sum, prev_cnt = 0.0, 0
        for _ in range(self.max_iter):
            for j in range(d):
                work = work.groupBy(leaf_cols[j]).applyInPandas(
                    make_refine(j, leaf_cols[j], mask_cols[j]), tagged_schema)
            # LAZY checkpoint (VERDICT r4 #4b): the sweep's Δ-aggregate below
            # is the action that materializes it, so each sweep runs ONE job
            # chain (refines + checkpoint + aggregate) instead of two
            # (eager checkpoint, then a second scheduling round-trip to
            # re-scan the checkpointed partitions for the aggregate)
            work = work.localCheckpoint(eager=False)
            stats = work.agg(F.sum("__dsum").alias("s"),
                             F.sum("__dcnt").alias("c")).collect()[0]
            tot_sum, tot_cnt = float(stats["s"] or 0.0), int(stats["c"] or 0)
            av_num, av_den = tot_sum - prev_sum, tot_cnt - prev_cnt
            prev_sum, prev_cnt = tot_sum, tot_cnt
            if av_den == 0 or av_num / av_den <= self.stop_threshold:
                break

        out = work.drop(*leaf_cols, *mask_cols, "__dsum", "__dcnt")
        return complete.unionByName(out)
