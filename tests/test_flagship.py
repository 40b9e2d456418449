"""Flagship pipeline invariants: token-array equality per row (the per-row
invariant mandated by the engine contract), zero temporal leakage, zero
residual NULLs."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from ficaria_spark import datagen
from ficaria_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_flagship_token_passthrough_bitexact(spark):
    """tokens must survive the whole pipeline bit-for-bit: recompute the
    expected token array for each output row's doc and compare per row."""
    out = QUERIES["pipeline_flagship"](spark, SF)
    toks = datagen.tokenized_sequences(spark, SF).select(
        F.col("doc_id").cast("long").alias("doc_key"),
        F.array_join(F.expr("transform(tokens, t -> cast(t as string))"), ",")
        .alias("expected_tokens_str"),
        F.col("n_tok").alias("expected_n_tok"),
    )
    n_docs = toks.count()
    joined = out.withColumn("doc_key", F.col("entity_id") % F.lit(n_docs)).join(
        toks, "doc_key"
    )
    bad = joined.where(
        (F.col("tokens_str") != F.col("expected_tokens_str"))
        | (F.col("n_tok") != F.col("expected_n_tok"))
    ).count()
    assert bad == 0
    assert out.count() > 0


def test_flagship_no_nulls_out(spark):
    out = QUERIES["pipeline_flagship"](spark, SF)
    assert out.where(F.col("f_value_filled").isNull()).count() == 0


def test_flagship_zero_leakage(spark):
    """Poison all values after a cutoff; rows before the cutoff must be
    byte-identical (the strict frame structurally cannot read the future)."""
    grid = datagen.feature_grid(spark, SF)
    from ficaria_spark.operators.temporal import pit_backfill

    cutoff = F.lit("2024-01-15").cast("timestamp")
    poisoned = grid.withColumn(
        "f_value",
        F.when(grid.ts >= cutoff, F.lit(1e9)).otherwise(F.col("f_value")),
    )
    a = (
        pit_backfill(grid, "entity_id", "ts", ["f_value"], tiebreak=["event_id"])
        .where(F.col("ts") < cutoff).orderBy("event_id").toPandas()
    )
    b = (
        pit_backfill(poisoned, "entity_id", "ts", ["f_value"], tiebreak=["event_id"])
        .where(F.col("ts") < cutoff).orderBy("event_id").toPandas()
    )
    assert np.allclose(
        a.f_value_filled.to_numpy(float), b.f_value_filled.to_numpy(float),
        equal_nan=True,
    )


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 25
