"""Count-min sketch: never-underestimate guarantee, exact merge property,
and xxhash64-path parity with the pure-Python XXH64 twin."""

from __future__ import annotations

import numpy as np
import pandas as pd

from ficaria_spark.operators.sketch import cms_estimate, count_min_sketch

D, W, SEED = 4, 64, 9


def _items(spark, n=5000, seed=2):
    rng = np.random.default_rng(seed)
    # zipf-ish: a few heavy hitters + a long tail
    vals = np.concatenate([
        rng.integers(0, 10, size=n // 2),
        rng.integers(0, 2000, size=n - n // 2),
    ])
    pdf = pd.DataFrame({"item": vals.astype(np.int64)})
    return spark.createDataFrame(pdf), pdf


def test_cms_never_underestimates_and_heavy_hitters_are_tight(spark):
    sdf, pdf = _items(spark)
    sk = count_min_sketch(sdf, item_col="item", d=D, w=W, seed=SEED)
    est = cms_estimate(sk, sdf.distinct(), item_col="item", d=D, w=W,
                       seed=SEED).toPandas().set_index("item")["est_count"]
    exact = pdf.item.value_counts()
    assert set(est.index) == set(exact.index)
    assert (est.loc[exact.index] >= exact).all()          # CMS guarantee
    # heavy hitters dominate their buckets: error << their count
    top = exact.iloc[:3]
    assert ((est.loc[top.index] - top) <= 0.2 * top).all()


def test_cms_merge_equals_whole(spark):
    sdf, _ = _items(spark, n=2000, seed=5)
    a = sdf.where("item % 2 = 0")
    b = sdf.where("item % 2 = 1")
    from pyspark.sql import functions as F

    ska = count_min_sketch(a, item_col="item", d=D, w=W, seed=SEED)
    skb = count_min_sketch(b, item_col="item", d=D, w=W, seed=SEED)
    merged = (
        ska.unionByName(skb).groupBy("r", "bucket")
        .agg(F.sum("count").alias("count")).toPandas()
    )
    whole = count_min_sketch(sdf, item_col="item", d=D, w=W, seed=SEED).toPandas()
    key = lambda df: {(r.r, r.bucket): r.count for r in df.itertuples()}  # noqa: E731
    assert key(merged) == key(whole)


def test_cms_xxhash_buckets_match_python_twin(spark):
    from ficaria_spark.functions.xxh import _signed, xxh64_int, xxh64_long

    sdf, pdf = _items(spark, n=300, seed=7)
    sk = count_min_sketch(sdf, item_col="item", d=D, w=W, seed=SEED).toPandas()
    exp: dict[tuple[int, int], int] = {}
    for v, c in pdf.item.value_counts().items():
        for r in range(D):
            b = _signed(xxh64_int(SEED + r, xxh64_long(int(v), 42))) % W
            exp[(r, b)] = exp.get((r, b), 0) + int(c)
    got = {(r.r, r.bucket): r.count for r in sk.itertuples()}
    assert got == exp
