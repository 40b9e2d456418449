"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed with a count() action (full materialization of the
result without driver-side collect). A warmup pass on sf0.001 JIT-warms the
JVM and Python workers before timing.

Scaling-efficiency mode:  bench.py --scaling  runs the flagship pipeline at
two parallelism levels (local[N] and local[4N]) in separate JVMs and reports
throughput at both plus efficiency = T_4N / (4 * T_N). See BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# queries timed for the headline number (a representative spread: windowed
# temporal kernel, as-of join, aggregation, join+top-k, token pipeline)
HEADLINE = [
    "pit_backfill",
    "lag_lead",
    "sessionize",
    "tumble",
    "asof_join",
    "interpolate_linear",
    "tpch_q1",
    "top_customers",
    "tokens_passthrough",
]


def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    return float(base.replace("sf", "")) if base.startswith("sf") else -1.0


def run_suite(sf_dir: str = SF_DIR, cpus: int | None = None) -> dict:
    from ficaria_spark.queries import QUERIES
    from ficaria_spark.session import get_spark

    if cpus is not None:
        os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    spark = get_spark("ficaria-bench")
    names = [n for n in HEADLINE if n in QUERIES]

    # warmup at the smallest scale: JVM JIT + Python worker pool spin-up
    for n in names:
        QUERIES[n](spark, "/root/testdata/sf0.001").count()

    per_query: dict[str, float] = {}
    total_rows = 0
    t_all = time.perf_counter()
    for n in names:
        t0 = time.perf_counter()
        total_rows += QUERIES[n](spark, sf_dir).count()
        per_query[n] = round(time.perf_counter() - t0, 3)
    total = time.perf_counter() - t_all
    return {
        "metric": "headline-suite wall time (9 queries: temporal kernel + asof + relational + tokens)",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "sf": _sf_of(sf_dir),
        "rows_out": total_rows,
        "rows_per_sec": round(total_rows / total, 1),
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8)),
    }


def run_scaling(sf_dir: str = SF_DIR, n: int = 8) -> dict:
    """Run the flagship pipeline at local[n] and local[4n] in fresh JVMs."""
    results = {}
    for cpus in (n, 4 * n):
        out = subprocess.run(
            [sys.executable, __file__, "--child", sf_dir],
            env={**os.environ, "SPARK_GRAFT_CPUS": str(cpus)},
            capture_output=True, text=True, check=True,
        )
        results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
    t_n, t_4n = results[n]["value"], results[4 * n]["value"]
    thr_n, thr_4n = results[n]["rows_per_sec"], results[4 * n]["rows_per_sec"]
    return {
        "metric": f"throughput scaling efficiency local[{n}] -> local[{4*n}]",
        "value": round(thr_4n / (4.0 * thr_n), 3),
        "unit": "efficiency",
        "sf": _sf_of(sf_dir),
        "throughput_rows_per_sec": {str(n): thr_n, str(4 * n): thr_4n},
        "wall_sec": {str(n): t_n, str(4 * n): t_4n},
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--child" in sys.argv:
        print(json.dumps(run_suite(sys.argv[sys.argv.index("--child") + 1])))
    else:
        print(json.dumps(run_suite()))
