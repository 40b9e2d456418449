"""Hot-entity window-skew probe (VERDICT r5 #3 — SURVEY.md §7's last
unmeasured scale hazard).

The ordered-window operators (pit_backfill, sessionize, interpolate_linear)
partition by entity: ONE entity's whole history sorts and scans inside ONE
task. salted_agg covers aggregations and AQE covers joins, but windows have
no skew split — so a degenerate entity (bot traffic, a null-ish default id,
one instrument emitting 90% of ticks) serializes that fraction of the work
onto a single core no matter how many executors exist.

This probe measures the cost curve: a fixed-size frame (N rows) where one
hot entity holds fraction p of all rows (p = 0 → uniform over E entities),
timed through the three window ops at local[$SPARK_GRAFT_CPUS]. Expected
shape: wall ≈ c·(N/cores) + c·(p·N) once p·N dominates N/cores — the
hot-entity term is SERIAL. Prints one JSON line per p.

Usage:  python tools/probe_hot_entity.py [N] [p ...]
Defaults: N=2_000_000, p in (0.0, 0.5, 0.9).

Mitigation (IMPLEMENTED, operators/temporal.py; measured numbers in
BENCH/BASELINE.md "Hot-entity window skew"): pre-aggregate per
(entity, time-block) then merge — legal only when the per-row result
depends on a bounded carry between blocks. `sessionize_blocked` (the gap
flag at a block boundary needs only the previous block's last timestamp:
block-local flags + a tiny per-(entity, block) carry join) and
`pit_backfill_bounded(method="blocked")` (a staleness bound ≤ block span
confines every candidate source to the current + previous block; non-null
observations are duplicated once into the next block). Unbounded backfill
and interpolation stay inherently serial per entity (the carry is
unbounded); their serial term is kept LINEAR (the r6
UnboundedFollowing-frame fix). This probe times both exact and blocked
variants so the crossover is a measured number, not a claim.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build(spark, n: int, hot_frac: float, entities: int = 10_000):
    from pyspark.sql import functions as F

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    base = spark.range(0, n, 1, 2 * cpus)
    # row i is hot iff (i mod 1000) < 1000·p — deterministic, order-free
    ent = F.when((F.col("id") % 1000) < int(hot_frac * 1000), F.lit(0)) \
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(entities)) + 1)
    return base.select(
        F.col("id").alias("event_id"),
        ent.alias("entity_id"),
        F.timestamp_seconds(F.lit(1_600_000_000) + F.col("id") % 86_400
                            + (F.col("id") % 7) * 11).alias("ts"),
        F.when(F.col("id") % 5 == 0, F.lit(None).cast("double"))
        .otherwise((F.col("id") % 997).cast("double")).alias("f_value"),
    )


def probe(spark, n: int, hot_frac: float) -> dict:
    from pyspark.sql import functions as F

    from ficaria_spark.operators.temporal import (
        interpolate_linear, pit_backfill, pit_backfill_bounded, sessionize,
        sessionize_blocked)

    df = build(spark, n, hot_frac).persist()
    df.count()  # materialize outside the clock
    walls = {}
    t0 = time.perf_counter()
    t = time.perf_counter()
    bf = pit_backfill(df, "entity_id", "ts", ["f_value"], tiebreak=["event_id"])
    bf.agg(F.count("*"), F.sum("f_value_filled")).collect()
    walls["pit_backfill"] = round(time.perf_counter() - t, 3)
    t = time.perf_counter()
    se = sessionize(df, "entity_id", "ts", gap_seconds=600.0,
                    tiebreak=["event_id"])
    se.agg(F.count("*"), F.max("session_seq")).collect()
    walls["sessionize"] = round(time.perf_counter() - t, 3)
    t = time.perf_counter()
    il = interpolate_linear(df, "entity_id", "ts", ["f_value"],
                            tiebreak=["event_id"])
    il.agg(F.count("*"), F.sum("f_value_interp")).collect()
    walls["interpolate_linear"] = round(time.perf_counter() - t, 3)
    # --- hot-entity-parallel mitigation operators (same semantics, blocked
    # by 15 min of event time; probe ts spans ~24h -> ~97 blocks inside the
    # hot entity. Block count should exceed shuffle partitions by a few x,
    # else hash collisions of the per-(entity, block) keys re-concentrate
    # rows (measured: 25 blocks into 32 partitions put 3 blocks in one task)
    t = time.perf_counter()
    sb = sessionize_blocked(df, "entity_id", "ts", gap_seconds=600.0,
                            block_seconds=900.0, tiebreak=["event_id"])
    sb.agg(F.count("*"), F.max("session_seq")).collect()
    walls["sessionize_blocked"] = round(time.perf_counter() - t, 3)
    t = time.perf_counter()
    bw = pit_backfill_bounded(df, "entity_id", "ts", ["f_value"],
                              tolerance_seconds=900.0, tiebreak=["event_id"])
    bw.agg(F.count("*"), F.sum("f_value_filled")).collect()
    walls["backfill_bounded_window"] = round(time.perf_counter() - t, 3)
    t = time.perf_counter()
    bb = pit_backfill_bounded(df, "entity_id", "ts", ["f_value"],
                              tolerance_seconds=900.0, tiebreak=["event_id"],
                              method="blocked")
    bb.agg(F.count("*"), F.sum("f_value_filled")).collect()
    walls["backfill_bounded_blocked"] = round(time.perf_counter() - t, 3)
    total = round(time.perf_counter() - t0, 3)
    df.unpersist()
    return {"n": n, "hot_frac": hot_frac, "hot_rows": int(n * hot_frac),
            "walls_sec": walls, "total_sec": total}


def main() -> None:
    from ficaria_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    fracs = ([float(a) for a in sys.argv[2:]] if len(sys.argv) > 2
             else [0.0, 0.5, 0.9])
    spark = get_spark("hot-entity-probe")
    probe(spark, 200_000, 0.0)  # warm the JVM/window codegen off the clock
    for p in fracs:
        print(json.dumps(probe(spark, n, p)), flush=True)


if __name__ == "__main__":
    main()
