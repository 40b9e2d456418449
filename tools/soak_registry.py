"""Full-registry soak (VERDICT r5 #2): time EVERY registered query at an
arbitrary sf_dir (one count() action each, warmup pass at sf0.001), plus
the impute_dt leaf-size tail at that scale. Prints one JSON line.

Run it at sf0.1 and at the synthesized sf1 (tools/make_sf1.py), same
session config, NEVER concurrently with another Spark job; the per-query
scaling exponent log10(t_sf1 / t_sf0.1) goes to BENCH/BASELINE.md. An
exponent ≈ 1 is linear; knn_cosine is exact O(n²) BY DECLARATION (the ANN
queries are the scale path); media_features times a fixed-n synthetic
table, so its exponent is ~0 by construction.

Usage: python tools/soak_registry.py [sf_dir] [--skip name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from ficaria_spark.plans.cache import release_operator_caches
    from ficaria_spark.queries import QUERIES
    from ficaria_spark.session import get_spark
    import bench

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    skip = set()
    if "--skip" in sys.argv:
        skip = set(sys.argv[sys.argv.index("--skip") + 1:])
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir  # fit-twin literals
    spark = get_spark("ficaria-soak")

    names = [n for n in QUERIES if n not in skip]
    for n in names:  # warm JVM/codegen/python-worker pool off the clock
        QUERIES[n](spark, "/root/testdata/sf0.001").count()
        release_operator_caches()

    probe = bench.calibration_probe()
    out: dict[str, dict] = {}
    for n in names:
        t0 = time.perf_counter()
        try:
            rows = QUERIES[n](spark, sf_dir).count()
            out[n] = {"sec": round(time.perf_counter() - t0, 3), "rows": rows}
        except Exception as ex:  # keep soaking; record the failure
            out[n] = {"sec": round(time.perf_counter() - t0, 3),
                      "err": f"{type(ex).__name__}: {str(ex)[:200]}"}
        release_operator_caches()
        print(f"# {n}: {out[n]}", flush=True)
    leaves = bench.dt_leaf_stats(spark, sf_dir)
    print(json.dumps({
        "sf_dir": sf_dir,
        "probe_sec": probe,
        "total_sec": round(sum(v["sec"] for v in out.values()), 2),
        "impute_dt_leaves": leaves,
        "queries": out,
    }), flush=True)


if __name__ == "__main__":
    main()
