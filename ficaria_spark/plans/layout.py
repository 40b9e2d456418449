"""Input-layout guards shared by the operators.

A small parquet table arrives as 1–2 scan partitions (one file under
``spark.sql.files.maxPartitionBytes``), which pins every MAP-SIDE stage —
Arrow kernels, per-word hashing HOFs, shingle building — to one or two
cores until the first exchange. The compute-dense operators widen such thin
inputs to the cluster before their heavy map stage; on a corpus-scale input
the scan already has ≥ cores partitions and the guard is a NO-OP, so the
100× path never pays a gratuitous shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_thin_input(df: DataFrame, *, floor: int = 16) -> DataFrame:
    """Round-robin repartition ``df`` to ``defaultParallelism`` iff its
    current partition count is below ``min(defaultParallelism, floor)``.
    Deliberately NOT keyed: the caller's first exchange (if any) re-keys
    anyway, and map-only consumers just need the rows spread."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min(target, floor):
        return df.repartition(target)
    return df
