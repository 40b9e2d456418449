"""Per-partition lineage manifests + checkpoint-resumable runs.

Contract: a large job is split into WORK UNITS (stable bucket of the entity
key — NOT ``spark_partition_id()``, which changes with the physical plan).
Each unit's output lands under ``out_dir/part_bucket=<b>/`` with a manifest
row (bucket, row_count, checksum, wall seconds, status). A resumed run
left-anti-joins the pending unit list against ``status='ok'`` manifests and
recomputes ONLY the missing/failed buckets.

This gives: (1) idempotent re-runs after executor/driver loss, (2) per-unit
metrics (rows/sec per bucket → skew visibility), (3) audit lineage from every
output file back to the bucket + code version that produced it.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_DIR = "_manifests"


def bucket_of(col: str, n_buckets: int) -> F.Column:
    """Stable work-unit bucket for an entity key (hash-based, plan-invariant)."""
    return F.pmod(F.xxhash64(F.col(col)), F.lit(n_buckets)).cast("int")


def _manifest_path(out_dir: str, bucket: int) -> str:
    return os.path.join(out_dir, MANIFEST_DIR, f"bucket_{bucket:05d}.json")


def read_manifests(out_dir: str) -> dict[int, dict]:
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    out: dict[int, dict] = {}
    if not os.path.isdir(mdir):
        return out
    for name in os.listdir(mdir):
        if name.endswith(".json"):
            with open(os.path.join(mdir, name)) as f:
                m = json.load(f)
            out[m["bucket"]] = m
    return out


def run_with_manifests(
    df: DataFrame,
    *,
    entity_col: str,
    out_dir: str,
    n_buckets: int = 16,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    fail_on: Callable[[int], bool] | None = None,
) -> dict:
    """Execute ``transform`` bucket-by-bucket with manifests; resume-aware.

    ``fail_on(bucket)`` is a test hook to simulate a mid-run crash. Returns a
    summary {completed, skipped, failed, rows}.

    Buckets already marked ok in a previous run are SKIPPED (left-anti join
    of the work-unit list against the ok-manifests), so a re-run after a
    crash touches only the missing buckets.
    """
    os.makedirs(os.path.join(out_dir, MANIFEST_DIR), exist_ok=True)
    work = df.withColumn("part_bucket", bucket_of(entity_col, n_buckets))
    done = {b for b, m in read_manifests(out_dir).items() if m.get("status") == "ok"}

    summary = {"completed": [], "skipped": sorted(done), "failed": [], "rows": 0}
    for b in range(n_buckets):
        if b in done:
            continue
        t0 = time.perf_counter()
        part = work.where(F.col("part_bucket") == b)
        out = transform(part) if transform is not None else part
        try:
            if fail_on is not None and fail_on(b):
                raise RuntimeError(f"injected failure at bucket {b}")
            path = os.path.join(out_dir, f"part_bucket={b}")
            out.drop("part_bucket").write.mode("overwrite").parquet(path)
            spark = df.sparkSession
            written = spark.read.parquet(path)
            n = written.count()
            checksum = (
                written.select(F.bit_xor(F.xxhash64(*written.columns)).alias("c"))
                .collect()[0]["c"]
            )
            manifest = {
                "bucket": b,
                "row_count": n,
                "checksum": int(checksum or 0),
                "wall_sec": round(time.perf_counter() - t0, 3),
                "status": "ok",
                "rows_per_sec": round(n / max(time.perf_counter() - t0, 1e-9), 1),
            }
            with open(_manifest_path(out_dir, b), "w") as f:
                json.dump(manifest, f)
            summary["completed"].append(b)
            summary["rows"] += n
        except Exception as e:  # record the failure, keep going
            with open(_manifest_path(out_dir, b), "w") as f:
                json.dump({"bucket": b, "status": "failed", "error": str(e)}, f)
            summary["failed"].append(b)
    return summary


def read_output(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read all ok buckets back as one DataFrame (partition-pruned layout)."""
    return spark.read.option("basePath", out_dir).parquet(
        os.path.join(out_dir, "part_bucket=*")
    )


class StageMetrics:
    """Rows/sec per named stage via simple wall clocks + Spark accumulator-free
    counts. Intentionally lightweight: at cluster scale, pair with a
    SparkListener; this object is the manifest-level summary."""

    def __init__(self):
        self.stages: dict[str, dict] = {}

    def measure(self, name: str, df: DataFrame) -> DataFrame:
        t0 = time.perf_counter()
        n = df.count()
        dt = time.perf_counter() - t0
        self.stages[name] = {
            "rows": n, "wall_sec": round(dt, 3),
            "rows_per_sec": round(n / max(dt, 1e-9), 1),
        }
        return df

    def to_json(self) -> str:
        return json.dumps(self.stages)
