"""ficaria_spark — a PySpark-native feature-engineering engine.

Re-expresses the fit/transform surface of the reference library
(szostkawron/ficaria: fuzzy-c-means / kNN imputation + fuzzy-rough feature
selection, see /root/reference) as a point-in-time / as-of join + windowed
backfill/lag/lead/sessionize pipeline over Spark DataFrames, with all
row-wise math in vectorized pandas/Arrow UDFs (no per-row Python).

Layout:
  session      — tuned SparkSession factory (AQE, Arrow, skew handling)
  datagen      — deterministic synthetic tokenized-sequence corpus
  functions/   — numeric kernels (fuzzy c-means, validation) — driver-side NumPy
  operators/   — public dataflow operators (temporal, impute, select, dedup,
                 similarity, text, multimodal)
  plans/       — lineage manifests + checkpoint-resume
  streaming/   — Structured Streaming variants (sessionize)
"""

from ficaria_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
