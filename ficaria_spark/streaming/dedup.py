"""Streaming deduplication for continuously-arriving corpora.

The batch dedup operators (operators/dedup.py) cover retrospective corpus
cleaning; an ingestion pipeline also needs INCREMENTAL dedup — drop a new
document if a copy was already seen — with bounded state. Two variants:

* :func:`streaming_exact_dedup` — drop rows whose normalized-content digest
  was already seen within the watermark horizon
  (``dropDuplicatesWithinWatermark``: state is evicted once the watermark
  passes, so state size is bounded by the horizon, not the corpus).
* :func:`streaming_fingerprint_tag` — stateless per-batch enrichment: attach
  the content digest + token count so a downstream batch job (or a join
  against a digest index) can do global dedup; pure column expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def content_digest(text_col: str = "text"):
    """Normalized-content digest (same normalization as operators/dedup.
    exact_dedup — case + whitespace)."""
    return F.md5(F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")))


def streaming_exact_dedup(docs: DataFrame, *, text_col: str = "text",
                          ts_col: str = "ts", watermark: str = "1 hour",
                          normalize: bool = True) -> DataFrame:
    """Keep the first arrival of each (normalized) document content within
    the watermark horizon; later copies are dropped.

    State = one digest per distinct content inside the horizon — bounded and
    watermark-evicted (the 100 TB ingestion shape; global retrospective dedup
    stays a batch job)."""
    digest = content_digest(text_col) if normalize else F.md5(F.col(text_col))
    tagged = docs.withColumn("content_hash", digest).withWatermark(ts_col, watermark)
    return tagged.dropDuplicatesWithinWatermark(["content_hash"])


def streaming_fingerprint_tag(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Stateless enrichment: content digest + whitespace token count.
    Composable with any stream (no state, no watermark needed).

    The token count IS :func:`operators.text.token_count` — one expression
    for batch and stream, so the empty-doc semantics (0 tokens, not 1)
    cannot diverge between the two faces (review r5)."""
    from ficaria_spark.operators.text import token_count

    return docs.withColumn("content_hash", content_digest(text_col)).withColumn(
        "n_tokens", token_count(text_col)
    )
