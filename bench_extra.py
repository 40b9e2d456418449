"""Round-7 optimization harness (bench.py is FROZEN for measurement; this
file holds the extra instrumentation the optimization guide asks for):

* ``plans <out_dir>``  — write ``.explain("formatted")`` for every headline
  query to ``<out_dir>/<query>_{suffix}.txt`` (the judge-checkable plan
  artifacts under plans/r07/).
* ``time [names...]`` — per-query wall time with the noop sink (computes
  every column of every row without the count() column-pruning shortcut),
  min of ``--reps`` interleaved reps, labelled via setJobDescription.
* ``count [names...]`` — same but with the frozen bench's count() action,
  for apples-to-apples comparison with bench.py numbers.

Env contract matches bench.py: $SPARK_GRAFT_SF_DIR, $SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _catalog():
    from bench import HEADLINE, _bench_extra
    from ficaria_spark.queries import QUERIES

    cat = {**QUERIES, **_bench_extra()}
    return HEADLINE, cat


def write_plans(out_dir: str, suffix: str, names: list[str] | None = None) -> None:
    from ficaria_spark.plans.cache import release_operator_caches
    from ficaria_spark.session import get_spark

    spark = get_spark("ficaria-plans")
    headline, cat = _catalog()
    names = names or headline
    os.makedirs(out_dir, exist_ok=True)
    for n in names:
        df = cat[n](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        Path(out_dir, f"{n}_{suffix}.txt").write_text(plan)
        release_operator_caches()
        print(f"wrote {n}_{suffix}.txt ({plan.count('Exchange')} Exchange refs)")


def time_queries(names: list[str] | None, *, reps: int = 3,
                 action: str = "noop") -> dict:
    from ficaria_spark.plans.cache import release_operator_caches
    from ficaria_spark.session import get_spark

    spark = get_spark("ficaria-bench-extra")
    headline, cat = _catalog()
    names = names or headline
    # warmup at the smallest scale (JIT + Python worker pool), same as bench.py
    for n in names:
        cat[n](spark, "/root/testdata/sf0.001").count()
        release_operator_caches()
    per: dict[str, float] = {}
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(reps):
        for n in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{n}")
            t0 = time.perf_counter()
            df = cat[n](spark, SF_DIR)
            if action == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            dt = round(time.perf_counter() - t0, 3)
            spark.sparkContext.setJobDescription(None)
            samples[n].append(dt)
            if n not in per or dt < per[n]:
                per[n] = dt
            release_operator_caches()
    out = {"sf_dir": SF_DIR, "action": action, "reps": reps,
           "queries": per, "samples": samples,
           "total": round(sum(per.values()), 3)}
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    args = sys.argv[1:]
    if args and args[0] == "plans":
        out_dir = args[1] if len(args) > 1 else "plans/r07"
        suffix = args[2] if len(args) > 2 else "before"
        write_plans(out_dir, suffix, args[3:] or None)
    elif args and args[0] in ("time", "count"):
        reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
        time_queries(args[1:] or None, reps=reps,
                     action="noop" if args[0] == "time" else "count")
    else:
        print(__doc__)
