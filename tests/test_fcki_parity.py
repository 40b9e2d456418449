"""FCKI distributed-vs-driver parity: the Spark plumbing (cluster tagging,
one shuffle, canonical in-group ordering, per-group RNG) must reproduce a
pure-driver run of the same sequential algorithm bit-for-bit (allclose)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from ficaria_spark.functions import fcm as fcmk
from ficaria_spark.operators.impute import FCMKIterativeImputer, _ki_impute_group

FEATS = ["f0", "f1", "f2"]


def _frame(seed=21, n=300):
    rng = np.random.default_rng(seed)
    base = rng.normal(0, 1, size=(n, 3)) + np.array([0, 6, -6])
    mask = rng.random((n, 3)) < 0.12
    mask[:15] = False
    base[mask] = np.nan
    pdf = pd.DataFrame(base, columns=FEATS)
    pdf["row_id"] = np.arange(n)
    return pdf


def _driver_fcki(pdf: pd.DataFrame, imp: FCMKIterativeImputer) -> pd.DataFrame:
    """Pure-driver twin: same fit state, same canonical order, same per-
    cluster fresh RandomState — no Spark involved."""
    X = pdf[FEATS].to_numpy(np.float64)
    filled = np.where(np.isnan(X), imp.means_[None, :], X)
    labels = fcmk.fcm_predict(filled, imp.centers_, imp.m).argmax(axis=1)
    out = pdf.copy()
    for cl in np.unique(labels):
        rows = np.where(labels == cl)[0]
        sub = pdf.iloc[rows].sort_values(FEATS, kind="mergesort")
        M = sub[FEATS].to_numpy(np.float64)
        train_cl = imp.X_train_[imp.labels_train_ == cl]
        res = _ki_impute_group(
            M, train_cl, means=imp.means_, seed=imp.random_state,
            max_k=imp.max_k, max_ii_iter=imp.max_II_iter,
            vmin=imp.min_value_, vmax=imp.max_value_)
        out.loc[sub.index, FEATS] = res
    return out


def test_fcki_spark_matches_driver_twin(spark):
    pdf = _frame()
    sdf = spark.createDataFrame(pdf)
    imp = FCMKIterativeImputer(n_clusters=3, random_state=7, feature_cols=FEATS)
    imp.fit(sdf)
    got = imp.transform(sdf).orderBy("row_id").toPandas()
    exp = _driver_fcki(pdf, imp).sort_values("row_id")
    assert np.allclose(
        got[FEATS].to_numpy(float), exp[FEATS].to_numpy(float), equal_nan=True)


def test_fcki_stable_across_partitionings(spark):
    """Canonical in-group ordering ⇒ identical output no matter how the
    input was partitioned before the shuffle."""
    pdf = _frame(seed=33)
    a = spark.createDataFrame(pdf).repartition(2)
    b = spark.createDataFrame(pdf.sample(frac=1.0, random_state=5)).repartition(13)
    mk = lambda: FCMKIterativeImputer(n_clusters=2, random_state=3, feature_cols=FEATS)  # noqa: E731
    ra = mk().fit(a).transform(a).orderBy("row_id").toPandas()
    rb = mk().fit(b).transform(b).orderBy("row_id").toPandas()
    assert np.allclose(ra[FEATS].to_numpy(float), rb[FEATS].to_numpy(float))


def test_fcki_bucketed_breaks_cluster_parallelism_ceiling(spark):
    """bucket_size splits each cluster into deterministic hash buckets:
    group count exceeds n_clusters (parallelism no longer capped at k) and
    the output is complete + partitioning-invariant. Default (None) keeps
    reference semantics — covered by the parity tests above."""
    pdf = _frame(seed=44, n=300)
    sdf = spark.createDataFrame(pdf)
    imp = FCMKIterativeImputer(n_clusters=2, random_state=7,
                               feature_cols=FEATS, bucket_size=40)
    imp.fit(sdf)

    bc = spark.sparkContext.broadcast({
        "centers": imp.centers_, "m": imp.m, "means": imp.means_,
        "train": imp.X_train_, "labels": imp.labels_train_,
        "seed": imp.random_state, "max_k": imp.max_k,
        "max_ii": imp.max_II_iter,
        "vmin": imp.min_value_, "vmax": imp.max_value_})
    tagged, keys = imp._tag_and_bucket(imp._cast_features(sdf), bc)
    assert keys == ["__cluster", "__bucket"]
    ngroups = tagged.select(*keys).distinct().count()
    assert ngroups > imp.n_clusters_, ngroups

    out = imp.transform(sdf).orderBy("row_id").toPandas()
    assert not np.isnan(out[FEATS].to_numpy(float)).any()

    # deterministic: same result regardless of input partitioning
    b = spark.createDataFrame(pdf.sample(frac=1.0, random_state=3)).repartition(11)
    rb = imp.transform(b).orderBy("row_id").toPandas()
    assert np.allclose(out[FEATS].to_numpy(float), rb[FEATS].to_numpy(float))


def test_fcki_auto_mode_exact_below_threshold(spark):
    """Default (bucket_size=None) auto mode: with every cluster under
    AUTO_BUCKET_ROWS it must keep exact reference semantics — bit-identical
    to bucket_size=0 (the pinned exact mode)."""
    pdf = _frame(seed=55)
    sdf = spark.createDataFrame(pdf)
    mk = lambda bs: FCMKIterativeImputer(  # noqa: E731
        n_clusters=2, random_state=9, feature_cols=FEATS, bucket_size=bs)
    auto = mk(None).fit(sdf).transform(sdf).orderBy("row_id").toPandas()
    exact = mk(0).fit(sdf).transform(sdf).orderBy("row_id").toPandas()
    assert np.allclose(auto[FEATS].to_numpy(float), exact[FEATS].to_numpy(float))


def test_fcki_auto_mode_buckets_oversized_cluster(spark, monkeypatch):
    """An oversized cluster at default settings must NOT funnel into one
    k-task pandas frame: auto mode splits it (>k groups) and warns about
    the documented semantics deviation. Result equals the explicit
    bucket_size path of the same size (shared code path, pinned anyway)."""
    import warnings

    monkeypatch.setattr(FCMKIterativeImputer, "AUTO_BUCKET_ROWS", 40)
    pdf = _frame(seed=66, n=300)
    sdf = spark.createDataFrame(pdf)
    imp = FCMKIterativeImputer(n_clusters=2, random_state=7, feature_cols=FEATS)
    imp.fit(sdf)

    bc = spark.sparkContext.broadcast({
        "centers": imp.centers_, "m": imp.m, "means": imp.means_,
        "train": imp.X_train_, "labels": imp.labels_train_,
        "seed": imp.random_state, "max_k": imp.max_k,
        "max_ii": imp.max_II_iter,
        "vmin": imp.min_value_, "vmax": imp.max_value_})
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        tagged, keys = imp._tag_and_bucket(imp._cast_features(sdf), bc)
    assert keys == ["__cluster", "__bucket"]
    assert tagged.select(*keys).distinct().count() > imp.n_clusters_
    assert any("auto-bucketing engaged" in str(w.message) for w in caught)

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        auto = imp.transform(sdf).orderBy("row_id").toPandas()
    expl = FCMKIterativeImputer(n_clusters=2, random_state=7,
                                feature_cols=FEATS, bucket_size=40)
    expl = expl.fit(sdf).transform(sdf).orderBy("row_id").toPandas()
    assert np.allclose(auto[FEATS].to_numpy(float), expl[FEATS].to_numpy(float))


def test_fcki_transform_job_counts(spark):
    """Driver round-trip budget (VERDICT r3 #7 + ADVICE r4): exact mode
    (bucket_size=0) runs exactly ONE job chain per transform action; auto
    mode on the SAME frame that was fitted skips the sizing job entirely
    (the fit collect proved the frame fits in one bucket) — also one job;
    auto mode on a DIFFERENT frame cannot use the proof and pays exactly
    one sizing job over the persisted tagged frame (the tagging UDF never
    computes twice)."""
    from ficaria_spark.plans.cache import release_operator_caches

    pdf = _frame(seed=77)
    sdf = spark.createDataFrame(pdf)
    other = spark.createDataFrame(pdf)  # same data, different frame object
    sc = spark.sparkContext
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        cases = (
            (0, sdf, 1, "fcki-exact"),
            (None, sdf, 1, "fcki-auto-samefit"),   # sizing skipped: proof holds
            (None, other, 2, "fcki-auto-other"),   # no proof: sizing job runs
        )
        for mode, tdf, max_jobs, group in cases:
            imp = FCMKIterativeImputer(n_clusters=2, random_state=3,
                                       feature_cols=FEATS, bucket_size=mode)
            imp.fit(sdf)
            sc.setJobGroup(group, "count transform jobs")
            try:
                assert imp.transform(tdf).count() == len(pdf)
            finally:
                sc.setJobGroup(None, None)
            jobs = sc.statusTracker().getJobIdsForGroup(group)
            assert len(jobs) <= max_jobs, (
                f"{group}: {len(jobs)} jobs (budget {max_jobs})")
            if group == "fcki-auto-samefit":
                assert len(jobs) == 1, "sizing-skip proof did not engage"
            release_operator_caches()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
