"""Imputer tests: end-to-end fit/transform contracts (output shape preserved,
zero NULLs, non-feature columns untouched), determinism under seeds, and
differential checks against driver-side NumPy oracles where the semantics are
closed-form (centroid / parameter imputers)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ficaria_spark.functions import fcm as fcmk
from ficaria_spark.operators.impute import (
    FCMCentroidImputer,
    FCMDTIterativeImputer,
    FCMInterpolationIterativeImputer,
    FCMKIterativeImputer,
    FCMParameterImputer,
    FCMRoughParameterImputer,
    NotFittedError,
)

FEATS = ["f0", "f1", "f2", "f3"]


def _frame(seed=0, n=200, miss=0.15):
    rng = np.random.default_rng(seed)
    base = rng.normal(0, 1, size=(n, 4)) + np.array([0, 5, -5, 10])
    mask = rng.random((n, 4)) < miss
    mask[:10] = False  # guarantee complete rows
    X = base.copy()
    X[mask] = np.nan
    pdf = pd.DataFrame(X, columns=FEATS)
    pdf["row_id"] = np.arange(n)
    pdf["tokens"] = [f"tok-{i}" for i in range(n)]  # passthrough payload
    return pdf


def _spark_frame(spark, pdf):
    return spark.createDataFrame(pdf)


ALL_IMPUTERS = [
    lambda: FCMCentroidImputer(n_clusters=3, random_state=42, feature_cols=FEATS),
    lambda: FCMParameterImputer(n_clusters=3, random_state=42, feature_cols=FEATS),
    lambda: FCMRoughParameterImputer(n_clusters=3, random_state=42, feature_cols=FEATS),
    lambda: FCMKIterativeImputer(n_clusters=3, random_state=42, feature_cols=FEATS),
    lambda: FCMInterpolationIterativeImputer(
        n_clusters=3, random_state=42, feature_cols=FEATS, order_col="row_id"),
    lambda: FCMDTIterativeImputer(random_state=42, feature_cols=FEATS, max_iter=2),
]


@pytest.mark.parametrize("mk", ALL_IMPUTERS, ids=lambda mk: type(mk()).__name__)
def test_fit_transform_contract(spark, mk):
    pdf = _frame()
    sdf = _spark_frame(spark, pdf)
    imp = mk()
    out = imp.fit(sdf).transform(sdf).orderBy("row_id").toPandas()
    # shape + passthrough columns preserved
    assert len(out) == len(pdf)
    assert list(out["row_id"]) == list(pdf["row_id"])
    assert list(out["tokens"]) == list(pdf["tokens"])
    # no NULLs remain in features
    assert out[FEATS].isna().sum().sum() == 0
    # observed cells unchanged
    obs = ~pdf[FEATS].isna()
    got = out[FEATS].to_numpy()
    want = pdf[FEATS].to_numpy()
    assert np.allclose(got[obs.to_numpy()], want[obs.to_numpy()])


@pytest.mark.parametrize("mk", ALL_IMPUTERS, ids=lambda mk: type(mk()).__name__)
def test_deterministic_under_seed(spark, mk):
    pdf = _frame(seed=5)
    sdf = _spark_frame(spark, pdf)
    a = mk().fit(sdf).transform(sdf).orderBy("row_id").toPandas()[FEATS].to_numpy()
    b = mk().fit(sdf).transform(sdf).orderBy("row_id").toPandas()[FEATS].to_numpy()
    assert np.allclose(a, b)


def test_centroid_imputer_matches_numpy_oracle(spark):
    pdf = _frame(seed=11)
    sdf = _spark_frame(spark, pdf)
    imp = FCMCentroidImputer(n_clusters=3, random_state=1, feature_cols=FEATS)
    out = imp.fit(sdf).transform(sdf).orderBy("row_id").toPandas()[FEATS].to_numpy()

    # oracle: nearest-centroid fill with masked distances
    X = pdf[FEATS].to_numpy()
    exp = X.copy()
    mis = np.isnan(X).any(axis=1)
    d = fcmk.masked_dist(X[mis], imp.centers_)
    nearest = imp.centers_[d.argmin(axis=1)]
    exp[mis] = np.where(np.isnan(X[mis]), nearest, X[mis])
    assert np.allclose(out, exp)


def test_parameter_imputer_matches_numpy_oracle(spark):
    pdf = _frame(seed=12)
    sdf = _spark_frame(spark, pdf)
    imp = FCMParameterImputer(n_clusters=4, random_state=2, feature_cols=FEATS)
    out = imp.fit(sdf).transform(sdf).orderBy("row_id").toPandas()[FEATS].to_numpy()

    X = pdf[FEATS].to_numpy()
    exp = X.copy()
    mis = np.isnan(X).any(axis=1)
    u = fcmk.memberships_from_dist(fcmk.masked_dist(X[mis], imp.centers_), imp.m)
    est = u @ imp.centers_
    exp[mis] = np.where(np.isnan(X[mis]), est, X[mis])
    assert np.allclose(out, exp)


def test_imputed_values_within_clamps_fcki(spark):
    pdf = _frame(seed=13)
    sdf = _spark_frame(spark, pdf)
    imp = FCMKIterativeImputer(n_clusters=2, random_state=3, feature_cols=FEATS)
    out = imp.fit(sdf).transform(sdf).toPandas()[FEATS].to_numpy()
    assert out.min() >= imp.min_value_ - 1e-9
    assert out.max() <= imp.max_value_ + 1e-9


def test_not_fitted_raises(spark):
    pdf = _frame()
    sdf = _spark_frame(spark, pdf)
    with pytest.raises(NotFittedError):
        FCMCentroidImputer(feature_cols=FEATS).transform(sdf)


def test_column_mismatch_raises(spark):
    pdf = _frame()
    sdf = _spark_frame(spark, pdf)
    imp = FCMCentroidImputer(n_clusters=2, random_state=0, feature_cols=FEATS).fit(sdf)
    with pytest.raises(ValueError, match="columns"):
        imp.transform(sdf.drop("f3"))


def test_n_clusters_exceeds_complete_rows_raises(spark):
    pdf = _frame(n=30)
    pdf.loc[10:, FEATS[0]] = np.nan  # few complete rows
    sdf = _spark_frame(spark, pdf)
    with pytest.raises(ValueError, match="n_clusters"):
        FCMCentroidImputer(n_clusters=25, feature_cols=FEATS).fit(sdf)


def test_single_incomplete_row(spark):
    pdf = _frame(n=50, miss=0.0)
    pdf.loc[7, "f1"] = np.nan
    sdf = _spark_frame(spark, pdf)
    out = (
        FCMParameterImputer(n_clusters=2, random_state=0, feature_cols=FEATS)
        .fit(sdf).transform(sdf).orderBy("row_id").toPandas()
    )
    assert out[FEATS].isna().sum().sum() == 0
    untouched = ~pdf[FEATS].isna()
    assert np.allclose(
        out[FEATS].to_numpy()[untouched.to_numpy()],
        pdf[FEATS].to_numpy()[untouched.to_numpy()],
    )


def test_validate_params_errors():
    with pytest.raises(TypeError, match="n_clusters must be int"):
        FCMCentroidImputer(n_clusters=2.5)
    with pytest.raises(ValueError, match="m must be > 1"):
        FCMCentroidImputer(m=1.0)
    with pytest.raises(ValueError, match="tol must be > 0"):
        FCMCentroidImputer(tol=0.0)


def test_iifcm_sigma_variant(spark):
    """σ-scaled distance variant (IFCM-σ, reference missing_imputation.py:
    1239–1248): contract + determinism + differs from the unscaled variant."""
    pdf = _frame(seed=31)
    sdf = _spark_frame(spark, pdf)
    mk = lambda sig: FCMInterpolationIterativeImputer(  # noqa: E731
        n_clusters=3, random_state=4, sigma=sig,
        feature_cols=FEATS, order_col="row_id")
    a = mk(True).fit(sdf).transform(sdf).orderBy("row_id").toPandas()[FEATS].to_numpy()
    b = mk(True).fit(sdf).transform(sdf).orderBy("row_id").toPandas()[FEATS].to_numpy()
    c = mk(False).fit(sdf).transform(sdf).orderBy("row_id").toPandas()[FEATS].to_numpy()
    assert np.isfinite(a).all()
    assert np.allclose(a, b)          # deterministic
    assert not np.allclose(a, c)      # σ-scaling changes the fill


def test_all_nan_row_filled(spark):
    pdf = _frame(seed=37, n=60, miss=0.0)
    pdf.loc[9, FEATS] = np.nan  # entire row missing
    sdf = _spark_frame(spark, pdf)
    out = (
        FCMCentroidImputer(n_clusters=2, random_state=1, feature_cols=FEATS)
        .fit(sdf).transform(sdf).orderBy("row_id").toPandas()
    )
    assert out[FEATS].isna().sum().sum() == 0
    # with every dim masked, distances tie at the floor -> first centroid wins
    assert np.isfinite(out.loc[out.row_id == 9, FEATS].to_numpy()).all()


def test_fcmdt_driver_roundtrips_batched(spark):
    """The DT refinement must materialize per SWEEP, not per (sweep, column):
    with max_iter=1 and d=4 columns the transform runs the initial pass, one
    sweep checkpoint, and one Δ-aggregate — a handful of jobs, not O(d) joins.
    Counted via a job group."""
    pdf = _frame(seed=5, n=120)
    sdf = _spark_frame(spark, pdf)
    imp = FCMDTIterativeImputer(random_state=42, feature_cols=FEATS,
                                max_iter=1, max_clusters=2)
    imp.fit(sdf)

    sc = spark.sparkContext
    # AQE splits every shuffle stage into its own job, which would make the
    # job count measure stages, not driver round-trips — disable it here
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sc.setJobGroup("fcmdt-count", "count jobs in one transform+collect")
    try:
        out = imp.transform(sdf)
        n_rows = out.count()
    finally:
        sc.setJobGroup(None, None)
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
    assert n_rows == len(pdf)
    job_ids = sc.statusTracker().getJobIdsForGroup("fcmdt-count")
    # initial localCheckpoint + sweep localCheckpoint + Δ-agg + final count
    # (+1 slack for Spark-internal extras); the old per-column scheme ran
    # 2 jobs per column (checkpoint + join-agg) = 8+ extra jobs here
    assert len(job_ids) <= 5, f"too many driver round-trips: {len(job_ids)} jobs"


def test_float_nan_cells_are_imputed(spark):
    """Parquet-sourced float NaN (not SQL NULL) must take the incomplete
    branch of the complete/incomplete split: the transform's missing
    definition is (isNull | isnan), matching the fit's na.drop and the NumPy
    kernels. Regression test for the isNull-only split (ADVICE r2)."""
    from pyspark.sql import functions as F

    pdf = _frame(seed=11, n=80, miss=0.0)  # fully complete
    sdf = _spark_frame(spark, pdf)
    # inject JVM-side NaN doubles (pandas->Arrow would have nulled them)
    sdf = sdf.withColumn(
        "f1", F.when(F.col("row_id") % 10 == 3, F.lit(float("nan")))
               .otherwise(F.col("f1")))
    for mk in (
        lambda: FCMCentroidImputer(n_clusters=2, random_state=7, feature_cols=FEATS),
        lambda: FCMDTIterativeImputer(random_state=7, feature_cols=FEATS,
                                      max_iter=1, max_clusters=2),
    ):
        out = mk().fit(sdf).transform(sdf).orderBy("row_id").toPandas()
        vals = out[FEATS].to_numpy(dtype=np.float64)
        assert np.isfinite(vals).all(), f"{type(mk()).__name__} left NaN cells"
        # untouched cells preserved
        keep = out.row_id % 10 != 3
        ref = pdf.set_index("row_id").loc[out.row_id[keep], FEATS].to_numpy()
        assert np.allclose(out.loc[keep, FEATS].to_numpy(), ref)
