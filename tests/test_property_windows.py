"""Property-based sweep for the ordered-window feature family — the
north-star core (pit_backfill / sessionize / interpolate_linear) — against
plain-Python/pandas references, extending the asof-family sweep
(test_property_temporal.py) to the windowed kernels themselves.

Generated relations cover: duplicate timestamps (total order restored by
the ``tiebreak`` row id, same contract the operators document), all-null
and no-null value columns, single-row entities, and NULL entity keys
(Window.partitionBy groups nulls into ONE partition — the references
mirror that deliberately; contrast with join-key semantics where null
matches nothing, pinned in the asof sweep).

Reference semantics pinned here:

- ``pit_backfill(strict=True)``: fill a NULL from the last non-null value
  among rows STRICTLY BEFORE the current row in (ts, tiebreak) total
  order — rows at the same timestamp with an earlier tiebreak are
  legitimately in the frame (row-frame, not range-frame: zero temporal
  leakage needs only "no current/future rows").
- ``sessionize``: new session iff first row of the entity or
  ``ts - prev_ts > gap``; equal timestamps always share a session.
- ``interpolate_linear(x=None)``: pandas
  ``Series.interpolate(method='linear', limit_direction='both')`` on the
  per-entity row sequence — the exact reference call
  (ficaria/missing_imputation.py:1141) whose parity the imputers pin.
"""

from __future__ import annotations

import math

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from ficaria_spark.operators.temporal import (
    interpolate_linear, pit_backfill, pit_backfill_bounded, sessionize,
    sessionize_blocked)

_entity = st.one_of(st.none(), st.integers(0, 2))
_ts = st.integers(0, 9)
_val = st.one_of(st.none(), st.integers(-3, 3))
_rows = st.lists(st.tuples(_entity, _ts, _val), min_size=1, max_size=14)

_SCHEMA = T.StructType([
    T.StructField("entity", T.LongType()),
    T.StructField("ts", T.DoubleType()),
    T.StructField("v", T.DoubleType()),
    T.StructField("rid", T.LongType()),
])


def _ordered_groups(rows):
    """rows → {entity_key: [(rid, ts, v), ...] in (ts, rid) order}, with
    None entities grouped together (window-partition semantics)."""
    groups: dict = {}
    for rid, (e, t, v) in enumerate(rows):
        groups.setdefault(e, []).append((rid, float(t),
                                         None if v is None else float(v)))
    return {e: sorted(g, key=lambda r: (r[1], r[0]))
            for e, g in groups.items()}


def _df(spark, rows):
    data = [(e, float(t), None if v is None else float(v), rid)
            for rid, (e, t, v) in enumerate(rows)]
    return spark.createDataFrame(data, _SCHEMA).coalesce(2)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(rows=_rows, gap=st.integers(1, 4))
def test_window_family_matches_python_reference(spark, rows, gap):
    df = _df(spark, rows)
    groups = _ordered_groups(rows)

    # --- pit_backfill (strict): last non-null strictly before, row order
    exp_fill: dict[int, float | None] = {}
    for g in groups.values():
        last = None
        for rid, _t, v in g:
            exp_fill[rid] = v if v is not None else last
            if v is not None:
                last = v
    got = {r.rid: r.v_filled
           for r in pit_backfill(df, "entity", "ts", ["v"], strict=True,
                                 tiebreak=["rid"]).collect()}
    assert got == exp_fill

    # --- sessionize: running count of gap breaks
    exp_sess: dict[int, int] = {}
    for g in groups.values():
        prev_t, seq = None, 0
        for rid, t, _v in g:
            if prev_t is None or t - prev_t > gap:
                seq += 1
            exp_sess[rid] = seq
            prev_t = t
    got_s = {r.rid: r.session_seq
             for r in sessionize(df, "entity", "ts", gap_seconds=float(gap),
                                 tiebreak=["rid"]).collect()}
    assert got_s == exp_sess

    # --- interpolate_linear (positional): pandas reference, both directions
    exp_interp: dict[int, float | None] = {}
    for g in groups.values():
        ser = pd.Series([v for _rid, _t, v in g], dtype="float64")
        filled = ser.interpolate(method="linear", limit_direction="both")
        for (rid, _t, _v), val in zip(g, filled):
            exp_interp[rid] = None if pd.isna(val) else float(val)
    got_i = {r.rid: r.v_interp
             for r in interpolate_linear(df, "entity", "ts", ["v"],
                                         x=None, tiebreak=["rid"]).collect()}
    assert set(got_i) == set(exp_interp)
    for rid, exp in exp_interp.items():
        g = got_i[rid]
        if exp is None:
            assert g is None or (isinstance(g, float) and math.isnan(g))
        else:
            assert g is not None and abs(g - exp) < 1e-9, (rid, g, exp)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(rows=_rows, gap=st.integers(1, 4), tol=st.integers(0, 4),
       block=st.integers(1, 3))
def test_blocked_variants_match_python_reference(spark, rows, gap, tol, block):
    """Hot-entity-parallel rewrites (sessionize_blocked /
    pit_backfill_bounded method='blocked') vs the same plain-Python
    references as the exact paths — over relations with duplicate
    timestamps, NULL entity keys (the blocked carry join must be null-safe
    to match Window.partitionBy's null grouping), single-row entities, and
    deliberately TINY blocks (1–3 ticks over a 0–9 clock) so block
    boundaries fall inside sessions and inside tolerance windows."""
    df = _df(spark, rows)
    groups = _ordered_groups(rows)

    # --- sessionize_blocked == the sessionize reference, any block size
    exp_sess: dict[int, int] = {}
    for g in groups.values():
        prev_t, seq = None, 0
        for rid, t, _v in g:
            if prev_t is None or t - prev_t > gap:
                seq += 1
            exp_sess[rid] = seq
            prev_t = t
    got_s = {r.rid: r.session_seq
             for r in sessionize_blocked(
                 df, "entity", "ts", gap_seconds=float(gap),
                 block_seconds=float(block), tiebreak=["rid"]).collect()}
    assert got_s == exp_sess

    # --- pit_backfill_bounded: last non-null strictly before AND at most
    # tol old; window and blocked methods both match (block >= tol forced)
    exp_fill: dict[int, float | None] = {}
    for g in groups.values():
        last_t, last_v = None, None
        for rid, t, v in g:
            if v is not None:
                exp_fill[rid] = v
            elif last_v is not None and t - last_t <= tol:
                exp_fill[rid] = last_v
            else:
                exp_fill[rid] = None
            if v is not None:
                last_t, last_v = t, v
    for method, bs in (("window", None), ("blocked", float(max(block, tol)))):
        got = {r.rid: r.v_filled
               for r in pit_backfill_bounded(
                   df, "entity", "ts", ["v"], tolerance_seconds=float(tol),
                   tiebreak=["rid"], method=method,
                   block_seconds=bs).collect()}
        assert got == exp_fill, method
