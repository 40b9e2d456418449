"""Bit-parity of the pure-Python XXH64 twin against Spark's F.xxhash64 for
every input shape the dedup operators hash: bare strings, (string, int-lit)
chains, and array<long> columns."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from ficaria_spark.functions.xxh import (
    spark_xxhash64_long_array,
    spark_xxhash64_str,
    spark_xxhash64_str_int,
)

WORDS = [
    "", "a", "ab", "abc", "abcd", "hello", "The", "quick brown fox",
    "x" * 31, "y" * 32, "z" * 33, "w" * 100, "Ünïcødé", "日本語テキスト",
    "tab\tsep", "mixed 123 数字",
]


def test_string_hash_matches_spark(spark):
    df = spark.createDataFrame([(w,) for w in WORDS], ["w"])
    got = [r[0] for r in df.select(F.xxhash64("w")).collect()]
    exp = [spark_xxhash64_str(w) for w in WORDS]
    assert got == exp


def test_string_int_chain_matches_spark(spark):
    df = spark.createDataFrame([(w,) for w in WORDS], ["w"])
    got = [r[0] for r in df.select(F.xxhash64(F.lower("w"), F.lit(29))).collect()]
    exp = [spark_xxhash64_str_int(w.lower(), 29) for w in WORDS]
    assert got == exp


def test_long_array_hash_matches_spark(spark):
    rng = np.random.default_rng(5)
    arrays = [rng.integers(0, (1 << 31) - 1, size=n).tolist()
              for n in (1, 2, 4, 7, 64)]
    arrays.append([0, (1 << 62), -5, (1 << 63) - 1, -(1 << 63)])
    df = spark.createDataFrame(
        [(a,) for a in arrays], "sig: array<long>")
    got = [r[0] for r in df.select(F.xxhash64("sig")).collect()]
    exp = [spark_xxhash64_long_array(a) for a in arrays]
    assert got == exp
