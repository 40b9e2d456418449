"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed with a count() action (full materialization of the
result without driver-side collect). A warmup pass on sf0.001 JIT-warms the
JVM and Python workers before timing.

Scaling-efficiency mode:  bench.py --scaling  runs the same workload on the
same input at 1 vs 4 executors (default: pinned single-JVM local[N] with
1-core executors; SPARK_GRAFT_SCALING_MODE=local-cluster for N REAL
executor JVMs), 2 interleaved reps (min-wall), and reports throughput at
both plus efficiency = thr_4N / (4 * thr_N). See BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# queries timed for the headline number (a representative spread: windowed
# temporal kernel, as-of join, aggregation, join+top-k, token pipeline)
HEADLINE = [
    "pipeline_flagship",
    "pit_backfill",
    "lag_lead",
    "sessionize",
    "tumble",
    "asof_join",
    "interpolate_linear",
    "tpch_q1",
    "top_customers",
    "tokens_passthrough",
    "impute_fcm_parameter",
    "impute_fcki_capped",
    "slide",
    "pack_sequences",
    "pipeline_tokens",
    "dedup_exact",
    "dedup_minhash_lsh",
    "knn_cosine",
    "text_stats",
    # round 4: one representative per remaining operator family, so the
    # recorded perf history spans every major surface (totals are therefore
    # not comparable to rounds ≤3; per-query and normalized values are)
    "rollup_events",
    "range_join_weeks",
    "ann_ivf",
    "cms_token_counts",
    # round 6 (VERDICT r5 #5): the headline tracks the star-only PRODUCTION
    # path of cluster resolution (pairs → large-star/small-star, the 100×
    # plan). The registered `dedup_clusters` gate query deliberately runs
    # BOTH CC algorithms for cross-checking and reports ~2× the production
    # cost — it stays in the driver gate, not in the headline. This slot's
    # wall is comparable to r04's dedup_clusters_star, NOT to r05's folded
    # dedup_clusters.
    "dedup_clusters_star_only",
    "media_features",
]

# bench-only callables. dedup_clusters_star_only is an extra slot; the
# pit_backfill / sessionize entries OVERRIDE the registry queries of the same
# name: the registered gate versions now carry deliberate cross-check work
# (blocked-variant equality columns, VERDICT-r5-#5-style), while these keep
# the headline timing the unchanged production paths — per-slot walls stay
# comparable to every earlier round.
def _bench_extra():
    from ficaria_spark.queries import (
        dedup_clusters_star_bench, pit_backfill_prod_bench,
        sessionize_prod_bench)

    return {
        "dedup_clusters_star_only": dedup_clusters_star_bench,
        "pit_backfill": pit_backfill_prod_bench,
        "sessionize": sessionize_prod_bench,
    }


def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    return float(base.replace("sf", "")) if base.startswith("sf") else -1.0


def calibration_probe(reps: int = 3) -> float:
    """Host-regime marker (VERDICT r3 #5): the fixed cache-resident pure-CPU
    kernel from BENCH/BASELINE.md (4096×64 int64 hash blocks, single
    thread). Its wall time is a pure function of the silicon the hypervisor
    is actually giving us — code changes never move it, host steal does —
    so per-query times divided by it separate code regressions from host
    regime swings across rounds. Returns min-of-reps seconds (~0.1–0.3 s)."""
    import numpy as np

    x = (np.arange(4096 * 64, dtype=np.uint64).reshape(4096, 64)
         * np.uint64(2654435761))
    best = float("inf")
    mult = np.uint64(0x9E3779B97F4A7C15)
    for _ in range(reps):
        y = x.copy()
        t0 = time.perf_counter()
        for _ in range(120):
            y ^= y >> np.uint64(13)
            y *= mult
            y ^= y << np.uint64(7)
        sink = int(y.sum(dtype=np.uint64))  # defeat dead-code elimination
        best = min(best, time.perf_counter() - t0)
    assert sink >= 0
    return round(best, 4)


def memory_probe(reps: int = 3) -> float:
    """Host-regime marker #2 (VERDICT r5 #1): a multi-threaded STREAM-triad
    kernel (a = b + s·c over ~128 MB of float64, one private slice per
    thread, all cores concurrently). The single-thread xorshift probe above
    is cache-resident — it sees CPU-frequency steal but is BLIND to the
    DRAM-bandwidth/steal asymmetry that drifted r5's multi-core walls +16%
    while the CPU probe stayed flat (BENCH/BASELINE.md). This kernel is
    bandwidth-bound by construction (working set ≫ L3, ~4 streamed bytes per
    FLOP), so its wall moves with exactly the regime component the CPU probe
    misses. Returns min-of-reps seconds (~0.1–0.3 s)."""
    import threading

    import numpy as np

    nthreads = min(os.cpu_count() or 8, 32)
    # ~128 MB total across all threads' (a, b, c) triples — far over L3
    n = (128 * 2**20) // (24 * nthreads)
    iters = 24
    arrs = [(np.zeros(n), np.random.default_rng(i).random(n),
             np.random.default_rng(i + 97).random(n)) for i in range(nthreads)]

    def triad(a, b, c):
        s = 3.0
        for _ in range(iters):
            np.multiply(c, s, out=a)  # a = s·c   (read c, write a)
            a += b                    # a += b    (read a+b, write a)

    best = float("inf")
    for _ in range(reps):
        threads = [threading.Thread(target=triad, args=t) for t in arrs]
        t0 = time.perf_counter()
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        best = min(best, time.perf_counter() - t0)
    assert all(np.isfinite(a[0]) for a, _, _ in arrs)
    return round(best, 4)


def dt_leaf_stats(spark, sf_dir: str) -> dict:
    """Leaf-size distribution of the impute_dt trees fitted at this scale
    (driver-side fit over the bounded complete-row sample — cheap). The
    transform's per-(sweep, column) refinement cost is Σ_leaf O(leaf²·k),
    so these quantiles ARE the scale predictor."""
    import numpy as np

    from ficaria_spark.operators.impute import FCMDTIterativeImputer
    from ficaria_spark.queries import _IMPUTE_FEATS, _part_matrix

    m = _part_matrix(spark, sf_dir)
    imp = FCMDTIterativeImputer(random_state=42, feature_cols=_IMPUTE_FEATS,
                                max_iter=1, max_clusters=3,
                                order_cols=("row_id",)).fit(m)
    sizes = np.concatenate([
        np.unique(ids, return_counts=True)[1] for ids in imp.leaf_ids_.values()])
    q = np.percentile(sizes, [50, 90, 100])
    return {
        "n_leaves": int(len(sizes)),
        "p50": float(q[0]), "p90": float(q[1]), "max": int(q[2]),
        "bound_2msl_minus_1": 2 * imp.min_samples_leaf - 1,
    }


def run_suite(sf_dir: str = SF_DIR, cpus: int | None = None) -> dict:
    from ficaria_spark.plans.cache import release_operator_caches
    from ficaria_spark.queries import QUERIES
    from ficaria_spark.session import get_spark

    if cpus is not None:
        os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    spark = get_spark("ficaria-bench")
    catalog = {**QUERIES, **_bench_extra()}
    names = [n for n in HEADLINE if n in catalog]

    # warmup at the smallest scale: JVM JIT + Python worker pool spin-up
    for n in names:
        catalog[n](spark, "/root/testdata/sf0.001").count()

    # interleaved repetitions, min wall per query: host steal on this sandbox
    # varies ±2× over minutes, so a single shot confounds code changes with
    # noise. value = Σ per-query min (the noise-robust suite time).
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    probe_before = calibration_probe()
    mem_probe_before = memory_probe()
    per_query: dict[str, float] = {}
    total_rows = 0
    for rep in range(reps):
        for n in names:
            t0 = time.perf_counter()
            rows = catalog[n](spark, sf_dir).count()
            dt = round(time.perf_counter() - t0, 3)
            if n not in per_query or dt < per_query[n]:
                per_query[n] = dt
            if rep == 0:
                total_rows += rows
            # operators tracked_persist() self-join inputs; release them
            # between queries so reps measure the query, not accumulated
            # cache pressure (the library's documented cleanup contract)
            release_operator_caches()
    total = sum(per_query.values())
    probe_after = calibration_probe()
    probe = min(probe_before, probe_after)
    mem_probe_after = memory_probe()
    mem_probe = min(mem_probe_before, mem_probe_after)
    return {
        # impute_dt cost model (VERDICT r4 #4): refinement work is
        # Σ_leaf O(leaf² · max_clusters) per (sweep, column) — the leaf-size
        # distribution of the fitted trees at THIS scale lets a 100× user
        # predict cost (leaves are bounded by 2·min_samples_leaf−1 except
        # degenerate leaves; see FCMDTIterativeImputer docstring)
        "impute_dt_leaves": dt_leaf_stats(spark, sf_dir),
        "metric": "headline-suite wall time (25 queries: flagship pipelines (temporal + tokens), temporal kernel, slide, asof, relational, tokens+packing, FCM/FCKI impute, dedup+clusters (star-only production path), ANN (exact+IVF), rollup, range join, CMS, text+PII, multimodal; min of interleaved reps)",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "reps": reps,
        "sf": _sf_of(sf_dir),
        "rows_out": total_rows,
        "rows_per_sec": round(total_rows / total, 1),
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8)),
        # host-regime marker: the same fixed single-thread CPU kernel timed
        # before and after the suite (see calibration_probe). Compare
        # `queries_normalized` (per-query wall ÷ probe) across rounds to
        # separate code regressions from hypervisor steal: a uniform drift
        # in raw seconds with flat normalized values is the HOST, not code.
        "calibration": {
            "probe_sec_before": probe_before,
            "probe_sec_after": probe_after,
            "probe_sec": probe,
            # VERDICT r5 #1: the multi-core DRAM-bandwidth probe — tracks
            # the memory-steal regime component the single-thread CPU probe
            # is blind to (r5's +16% drift on untouched queries). Compare
            # queries_normalized_mem across rounds for multi-core walls.
            "mem_probe_sec_before": mem_probe_before,
            "mem_probe_sec_after": mem_probe_after,
            "mem_probe_sec": mem_probe,
        },
        "queries_normalized": {n: round(t / probe, 2)
                               for n, t in per_query.items()},
        "value_normalized": round(total / probe, 2),
        "queries_normalized_mem": {n: round(t / mem_probe, 2)
                                   for n, t in per_query.items()},
        "value_normalized_mem": round(total / mem_probe, 2),
    }


def _scaling_input(spark, sf_dir: str, expand: int):
    """Deterministically expanded entity×timestamp grid: each event row is
    replicated ``expand`` times with distinct entities and shifted
    timestamps — same input at every parallelism level, big enough that
    compute (windows + Python kernels) dominates fixed overheads."""
    from pyspark.sql import functions as F

    from ficaria_spark import datagen

    ev = datagen.load(spark, sf_dir, "events")
    rep = ev.withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(expand - 1))))
    return rep.select(
        (F.col("user_id") * expand + F.col("r")).alias("entity_id"),
        (F.col("ts") + F.make_interval(secs=F.col("r") * 7)).alias("ts"),
        (F.col("event_id") * expand + F.col("r")).alias("event_id"),
        F.when((F.col("event_id") + F.col("r")) % 7 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("value")).alias("f_value"),
    ).repartition(int(os.environ.get("SPARK_GRAFT_CPUS", 8)) * 2, "entity_id")


def run_scaling_child(sf_dir: str, expand: int) -> dict:
    """The scaling workload: temporal kernel sweep (4 chained window ops +
    hash agg) and an Arrow pandas-UDF imputation pass over the expanded grid.

    Fixed-cost phases run OUTSIDE the clock — input materialization, the
    driver-side FCM fit (bounded-by-design broadcast-state prep), and Python
    worker warm-up — because the north metric is distributed TRANSFORM
    throughput; those costs are constant w.r.t. cluster size by construction.
    """
    from pyspark.sql import functions as F

    from ficaria_spark.operators.impute import FCMParameterImputer
    from ficaria_spark.operators.temporal import (
        interpolate_linear, lag_lead, pit_backfill, sessionize)
    from ficaria_spark.session import get_spark

    from ficaria_spark.operators.dedup import minhash_signatures
    from ficaria_spark.operators.text import rolling_fingerprints

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark("ficaria-scaling")

    grid = _scaling_input(spark, sf_dir, expand).persist()
    n_in = grid.count()  # materialize input before the clock starts
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs_rep = (
        docs.repartition(8 * cpus)
        .withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(max(expand, 1) - 1))))
        .select((F.col("doc_id") * expand + F.col("r")).alias("doc_id"), "text")
        .persist()
    )
    n_docs = docs_rep.count()

    feat = grid.select(
        "event_id", "entity_id",
        F.col("f_value").alias("g0"),
        (F.col("entity_id") % 13).cast("double").alias("g1"),
    )
    imp = FCMParameterImputer(n_clusters=4, random_state=1, feature_cols=["g0", "g1"],
                              fit_cap=20_000)
    imp.fit(feat)  # driver fit + broadcast: constant, untimed
    # warm the Python worker pool (constant, untimed)
    imp.transform(feat.limit(1000)).count()
    rolling_fingerprints(docs_rep.limit(1000)).count()
    minhash_signatures(docs_rep.limit(1000)).count()

    t0 = time.perf_counter()
    rows = 0
    stages = {}
    # ① temporal kernel sweep (JVM windows, one exchange)
    t = time.perf_counter()
    bf = pit_backfill(grid, "entity_id", "ts", ["f_value"], tiebreak=["event_id"])
    ll = lag_lead(bf, "entity_id", "ts", ["f_value_filled"], tiebreak=["event_id"])
    sess = sessionize(ll, "entity_id", "ts", gap_seconds=1800.0, tiebreak=["event_id"])
    interp = interpolate_linear(sess, "entity_id", "ts", ["f_value"], tiebreak=["event_id"])
    rows += interp.groupBy("entity_id").agg(
        F.count("*"), F.sum("f_value_filled"), F.max("session_seq")).count()
    stages["temporal"] = round(time.perf_counter() - t, 3)
    # ② Arrow pandas-UDF imputation (broadcast FCM state)
    t = time.perf_counter()
    rows += imp.transform(feat).where(F.col("g0").isNotNull()).count()
    stages["impute"] = round(time.perf_counter() - t, 3)
    grid.unpersist()
    # ③ document fingerprinting (xxhash64 winnowing shingles — CPU-dense JVM
    #    hashing via the allocation-light word-hash combination; the md5
    #    string variant is the portability path, not the 100 TB path)
    t = time.perf_counter()
    fps = rolling_fingerprints(docs_rep, window=5, algo="xxhash64")
    rows += fps.agg(
        F.count("*"), F.min(F.xxhash64("shingle_fps"))
    ).collect()[0][0]
    stages["fingerprint"] = round(time.perf_counter() - t, 3)
    # ④ MinHash signatures (Arrow engine: allocation-light NumPy segment-min —
    #    the corpus-scale path; the JVM fold engine wins only on small inputs
    #    and hits this box's DRAM/GC wall at 4× cores)
    t = time.perf_counter()
    sigs = minhash_signatures(docs_rep, num_hashes=64, engine="arrow")
    rows += sigs.where(F.element_at("signature", 1).isNotNull()).count()
    stages["minhash"] = round(time.perf_counter() - t, 3)
    wall = time.perf_counter() - t0
    total_rows = n_in * 2 + n_docs
    return {
        "metric": "scaling workload wall time (temporal sweep + Arrow impute + md5 fingerprints)",
        "value": round(wall, 3),
        "unit": "sec",
        "stages": stages,
        "input_rows": total_rows,
        "rows_out": rows,
        "rows_per_sec": round(total_rows / wall, 1),
        "cpus": cpus,
    }


def run_scaling(sf_dir: str = SF_DIR, n: int = 1, expand: int | None = None) -> dict:
    """Same job, same input, two parallelism levels in fresh JVMs —
    efficiency = thr_4N / (4 · thr_N) (the sandbox proxy for the N→4N
    executor criterion).

    Each child JVM is CONFINED to its core budget with ``taskset`` — an
    unpinned local[N] JVM spills GC/shuffle/Arrow helper threads onto the
    other cores and silently inflates the small-N baseline (measured: a
    local[4] run burned ~5.7 cores), understating true scaling.

    Executor size is 1 core — bandwidth-proportionate. This sandbox is ONE
    socket: its memory bus is shared by every executor, so 16 concurrent
    cores oversubscribe the DRAM bandwidth a real 16-core 4-node cluster
    would have by ~3-4× for streaming stages (window sorts, Arrow transfer,
    thin-k dgemm all cap near 2× at 4→16 cores here, while a cache-resident
    pure-CPU probe scales 0.94). 1-core executors keep the per-executor
    bandwidth share at both levels comparable to what a real cluster node
    provides — the faithful emulation of scale-out. The 4-core-executor
    (4→16 core) measurement is recorded in BENCH/BASELINE.md alongside the
    per-stage DRAM-wall analysis.
    """
    if expand is None:
        # 256× replication ≈ 26 M grid rows / 1.3 M docs: big enough that the
        # distributed transforms dominate fixed per-job costs at BOTH levels
        # (at 64× the whole 16-core job ran in ~16 s and scheduler/worker
        # fixed costs flattened the curve — that measures overhead, not the
        # engine). The round-1 kernels were slow enough to dominate at 64×;
        # round-2 kernels are 2.6× faster, so the input grows to match.
        expand = int(os.environ.get("SPARK_GRAFT_SCALING_EXPAND", "256"))
    exec_cores = int(os.environ.get("SPARK_GRAFT_SCALING_EXEC_CORES", "1"))
    exec_mem_mb = 6144
    # 'local' (default): one pinned JVM per child with N task threads — the
    # cleanest core-count isolation on this box (round-1 methodology).
    # 'local-cluster': N REAL executor JVMs (own heap/GC/Python pool) — more
    # cluster-faithful process topology, but piles every executor JVM plus
    # the driver onto one socket, adding inter-process shuffle artifacts a
    # real cluster doesn't have. Both are recorded in BENCH/BASELINE.md.
    mode = os.environ.get("SPARK_GRAFT_SCALING_MODE", "local")

    def one(n_execs: int) -> dict:
        """One measurement at n_execs × exec_cores total cores, pinned to
        exactly those cores (+2 driver cores) so the small-N run can't
        borrow idle silicon."""
        total = n_execs * exec_cores
        cmd = [sys.executable, __file__, "--scaling-child", sf_dir, str(expand)]
        if shutil.which("taskset"):
            cmd = ["taskset", "-c", f"0-{min(total + 1, (os.cpu_count() or 32) - 1)}"] + cmd
        master = (f"local[{total}]" if mode == "local"
                  else f"local-cluster[{n_execs},{exec_cores},{exec_mem_mb}]")
        env = {
            **os.environ,
            "SPARK_GRAFT_MASTER": master,
            "SPARK_GRAFT_CPUS": str(total),
        }
        env.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")
        # single-box topology tuning (round-5 knob sweep, BENCH/BASELINE.md):
        # shuffles never cross a network here (one page cache, both modes),
        # so shuffle compression only burns CPU on the critical path
        # (local-cluster eff 0.69→0.75; local 0.783→0.816 same-regime) and
        # fatter shuffle buffers cut flush syscalls (4-exec wall −20%). A
        # REAL cluster should keep compression ON (network-bound shuffles) —
        # these knobs are the sandbox's emulation fix, not engine defaults;
        # override via SPARK_GRAFT_EXTRA_CONF.
        env.setdefault(
            "SPARK_GRAFT_EXTRA_CONF",
            "spark.shuffle.compress=false;spark.shuffle.spill.compress=false;"
            "spark.shuffle.file.buffer=1m;spark.reducer.maxSizeInFlight=96m;"
            "spark.shuffle.unsafe.file.output.buffer=1m")
        out = subprocess.run(cmd, env=env, capture_output=True, text=True, check=True)
        return json.loads(out.stdout.strip().splitlines()[-1])

    # interleave repetitions and keep the best run per level — the sandbox
    # host has time-varying steal; min-wall is the standard noise-robust
    # estimator for same-input benchmarking
    reps = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "2"))
    probe_before = calibration_probe()
    mem_probe_before = memory_probe()
    results: dict[int, dict] = {}
    pairs = []
    for _ in range(reps):
        rep_pair = {}
        for n_execs in (n, 4 * n):
            r = one(n_execs)
            rep_pair[n_execs] = r
            if n_execs not in results or r["value"] < results[n_execs]["value"]:
                results[n_execs] = r
        pairs.append({
            "eff": round(rep_pair[4 * n]["rows_per_sec"]
                         / (4.0 * rep_pair[n]["rows_per_sec"]), 3),
            "wall_sec": {str(n): rep_pair[n]["value"],
                         str(4 * n): rep_pair[4 * n]["value"]},
            # a mid-pair probe would perturb the run; the per-pair pairing
            # itself is the regime control (both levels sample adjacent
            # minutes of host weather, unlike min-wall across all reps)
        })
    probe_after = calibration_probe()
    mem_probe_after = memory_probe()
    thr_n = results[n]["rows_per_sec"]
    thr_4n = results[4 * n]["rows_per_sec"]
    return {
        "metric": (
            f"throughput scaling efficiency {n} -> {4*n} executors "
            f"({mode}, {exec_cores} core(s) each, taskset-pinned, "
            f"min of {reps} interleaved reps)"
        ),
        "value": round(thr_4n / (4.0 * thr_n), 3),
        # the min-wall ratio above can pair walls from DIFFERENT host-
        # weather phases (this box's steal oscillates on ~5 min periods —
        # one observed run: mem probe 0.103 before, 0.179 after, eff 0.69
        # from a quiet 1-exec vs a stolen 4-exec); each interleaved rep's
        # own ratio is weather-consistent. max() over noisy ratios is
        # itself upward-biased (a phase flip INSIDE a pair can flatter
        # it), so report best AND median and always quote the spread —
        # a claim that only clears the bar via best-of-pairs is weather
        # luck, not a measurement
        "value_pairwise_best": max(p["eff"] for p in pairs),
        # true median (even counts average the middle two — at the default
        # reps=2 the upper-middle element would just be max() again)
        "value_pairwise_median": round(statistics.median(
            p["eff"] for p in pairs), 3),
        "pairs": pairs,
        "unit": "efficiency",
        "sf": _sf_of(sf_dir),
        "input_rows": results[n]["input_rows"],
        "throughput_rows_per_sec": {str(n): thr_n, str(4 * n): thr_4n},
        "wall_sec": {str(n): results[n]["value"], str(4 * n): results[4 * n]["value"]},
        "stages_sec": {str(n): results[n].get("stages"), str(4 * n): results[4 * n].get("stages")},
        # same decidability contract as the headline suite: the CPU probe
        # marks frequency/steal regime, the mem probe marks the DRAM-steal
        # component that dominates the hashing/window stages at 4× cores —
        # compare efficiencies across rounds only at comparable probes
        "calibration": {
            "probe_sec_before": probe_before,
            "probe_sec_after": probe_after,
            "mem_probe_sec_before": mem_probe_before,
            "mem_probe_sec_after": mem_probe_after,
        },
    }


if __name__ == "__main__":
    if "--scaling-child" in sys.argv:
        i = sys.argv.index("--scaling-child")
        print(json.dumps(run_scaling_child(sys.argv[i + 1], int(sys.argv[i + 2]))))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--child" in sys.argv:
        print(json.dumps(run_suite(sys.argv[sys.argv.index("--child") + 1])))
    else:
        print(json.dumps(run_suite()))
