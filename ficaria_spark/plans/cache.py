"""Tracked persistence for operator-internal intermediates.

Several operators persist an intermediate plan that the returned DataFrame
references more than once (MinHash/SimHash signatures, LSH buckets, IVF
tagged rows, selector score frames). Spark's CacheManager holds those
entries until explicitly uncached, so a long-lived session composing many
operators would otherwise accumulate cached blocks indefinitely.

Contract: operators persist through :func:`tracked_persist`; after the
caller's consuming action, call :func:`release_operator_caches` to drop every
intermediate the library has cached since the last release. The returned
DataFrames stay valid — they just recompute if re-executed later.

``spark.catalog.clearCache()`` also works but clobbers caller-owned caches;
this registry only touches the library's own handles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() + register the handle for a later bulk release."""
    df = df.persist()
    _LIVE.append(df)
    return df


def live_count() -> int:
    return len(_LIVE)


def release_operator_caches() -> int:
    """Unpersist every tracked intermediate (non-blocking). Returns how many
    handles were released."""
    n = 0
    while _LIVE:
        _LIVE.pop().unpersist(blocking=False)
        n += 1
    return n
