"""Streaming point-in-time backfill — the engine's leakage-free imputation
primitive as a custom stateful streaming operator.

``applyInPandasWithState`` keyed by entity carries each entity's most recent
observed value; arriving rows with NULL features are filled from that state
(or from earlier rows of the same micro-batch) — never from the current or a
future row, so the zero-temporal-leakage property of the batch operator
(operators/temporal.pit_backfill, strict frame ending at −1) is preserved.

State per entity is one (ts, value) pair per filled column: O(entities)
state, bounded further by the optional processing-time timeout. State lives
in the checkpoint — stopping a query and resuming it with the same
checkpoint continues filling from the carried values (tested end-to-end in
tests/test_streaming_backfill.py), which is the streaming face of the
engine's checkpoint-resumable contract.

Ordering caveat (standard for stateful streaming): fills are exact when each
entity's rows arrive in non-decreasing event-time order across micro-batches
(within a batch the operator sorts). A late row (ts below the entity's state
ts) still fills from the newest state rather than the value that preceded it
historically; bound lateness with the source's watermark.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_pit_backfill(
    events: DataFrame,
    *,
    entity: str = "entity_id",
    ts: str = "ts",
    cols: Sequence[str] = ("f_value",),
    tiebreak: Sequence[str] = (),
    suffix: str = "_filled",
    timeout: str | None = None,
) -> DataFrame:
    """Streaming twin of ``pit_backfill(strict=True)``.

    Output schema = input + one ``<col><suffix>`` double per filled column
    (same contract as the batch operator). ``timeout`` (e.g. ``"1 hour"``)
    drops idle entities' state after that much processing time; ``None``
    keeps state until the query ends.
    """
    cols = list(cols)
    tiebreak = list(tiebreak)
    in_schema = events.schema
    out_schema = T.StructType(
        in_schema.fields
        + [T.StructField(c + suffix, T.DoubleType()) for c in cols]
    )
    # state: last observed epoch-us + value per filled column
    state_schema = T.StructType(
        [T.StructField(f"ts_{i}", T.LongType()) for i in range(len(cols))]
        + [T.StructField(f"v_{i}", T.DoubleType()) for i in range(len(cols))]
    )
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout if timeout else GroupStateTimeout.NoTimeout
    )
    timeout_ms = timeout
    n = len(cols)
    out_names = [f.name for f in out_schema.fields]

    def fill(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            st = list(state.get)
            last_ts, last_val = list(st[:n]), list(st[n:])
        else:
            last_ts, last_val = [None] * n, [None] * n
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values([ts, *tiebreak], kind="mergesort").reset_index(drop=True)
            ts_us = (pdf[ts].astype("int64") // 1000) if str(pdf[ts].dtype).startswith("datetime") \
                else pdf[ts].astype("int64")
            for i, c in enumerate(cols):
                s = pdf[c].astype("float64")
                filled = s.ffill()
                if last_val[i] is not None:
                    filled = filled.fillna(last_val[i])
                pdf[c + suffix] = filled
                obs = s.notna()
                if obs.any():
                    j = obs[obs].index[-1]
                    last_val[i] = float(s.loc[j])
                    last_ts[i] = int(ts_us.loc[j])
            yield pdf[out_names]
        state.update(tuple(last_ts) + tuple(last_val))
        if timeout_ms:
            state.setTimeoutDuration(timeout_ms)

    # operator output mode "append": every input row is emitted exactly once
    # (no retractions), which keeps the query compatible with file sinks —
    # required for checkpoint-resumable runs (memory sinks cannot recover)
    return (
        events.groupBy(entity)
        .applyInPandasWithState(
            fill, out_schema, state_schema, "append", timeout_conf)
    )
