"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship pipeline at sf0.001: leakage-free point-in-time backfill over
    the entity×timestamp feature grid, residual fill from broadcast state,
    tokenized sequences joined through untouched (token passthrough)."""
    from ficaria_spark.queries import QUERIES

    return QUERIES["pipeline_flagship"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ficaria_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """Static oracles plus fit-twin oracles (literal-embedded fitted state,
    generated from the sf0.01 parquet — override via SPARK_GRAFT_ORACLE_SF_DIR
    when checking another scale)."""
    from ficaria_spark.queries import ORACLE, dynamic_oracles

    return dict(ORACLE) | dynamic_oracles()
