"""Synthesize sf1 (10× sf0.1) for the scale soak (VERDICT r5 #2).

The driver's testdata is read-only and tops out at sf0.1, so sf1 is derived
deterministically from sf0.1 by 10-way replication with key shifting —
every key/FK column moves by ``replica · STRIDE`` so referential integrity
holds within each replica (orders→customer, lineitem→orders/part/supplier,
events→user). Dimension constants (region, nation) stay fixed, as TPC-H
does at every scale.

Two tables are DECORRELATED across replicas, not copied, because verbatim
copies would distort the workload's scale shape instead of scaling it:

- ``documents``: every word in replica r > 0 gets a ``zq{r}`` suffix — all
  shingles differ across replicas (cross-replica Jaccard 0), so dedup /
  MinHash / decontaminate candidate density grows like a real corpus
  instead of every doc acquiring 9 exact near-duplicates (which would put
  ~45 · n_docs pairs through every banding join and measure an artifact).
  ``n_chars`` is recomputed from the new text.
- ``embeddings``: the vector is rolled by r components (norm- and
  distribution-preserving; random-ish vectors decorrelate under rotation),
  so ANN/near-dup density stays realistic rather than 10 mutual
  cosine≈1.0 copies of every point.

Usage: python tools/make_sf1.py [src_dir] [dst_dir] [factor]
Defaults: /root/testdata/sf0.1 → ./testdata_sf1, factor 10.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

STRIDE = 10_000_000  # > every key in sf0.1 (max is o_orderkey ~600k)

# table → columns shifted by replica·STRIDE (keys + FKs, consistently)
SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation"]
# output file counts sized so one sf1 partition ≈ tens of MB (parquet)
N_FILES = {"lineitem": 16, "orders": 8, "events": 8, "documents": 8,
           "customer": 4, "part": 4, "embeddings": 4, "supplier": 1}


def main() -> None:
    from pyspark.sql import functions as F

    from ficaria_spark.session import get_spark

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else str(
        Path(__file__).resolve().parent.parent / "testdata_sf1")
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("make-sf1")
    os.makedirs(dst, exist_ok=True)

    for t in COPY_AS_IS:
        spark.read.parquet(f"{src}/{t}.parquet").coalesce(1).write.mode(
            "overwrite").parquet(f"{dst}/{t}.parquet")
        print(f"{t}: copied", flush=True)

    for t, keys in SHIFTS.items():
        df = spark.read.parquet(f"{src}/{t}.parquet")
        rep = df.withColumn(
            "__r", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))))
        for k in keys:
            rep = rep.withColumn(k, F.col(k) + F.col("__r") * F.lit(STRIDE))
        if t == "documents":
            words = F.split("text", " ")
            suffixed = F.array_join(
                F.transform(words, lambda w: F.concat(
                    w, F.when(F.col("__r") > 0,
                              F.concat(F.lit("zq"), F.col("__r")))
                    .otherwise(F.lit("")))), " ")
            rep = (rep.withColumn("text", suffixed)
                   .withColumn("n_chars", F.length("text").cast("long")))
        if t == "embeddings":
            dim = F.size("embedding")
            r = F.pmod(F.col("__r"), dim)
            rolled = F.when(r == 0, F.col("embedding")).otherwise(F.concat(
                F.slice(F.col("embedding"), r + 1, dim - r),
                F.slice(F.col("embedding"), 1, r)))
            rep = rep.withColumn("embedding", rolled)
        out = rep.drop("__r").repartition(N_FILES.get(t, 4))
        out.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        n = spark.read.parquet(f"{dst}/{t}.parquet").count()
        print(f"{t}: {n} rows", flush=True)


if __name__ == "__main__":
    main()
