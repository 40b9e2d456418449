"""Property-based sweep for the as-of family (VERDICT r5 #7): for arbitrary
(left, right) relations — null keys on either/both sides, duplicate
timestamps, empty sides — the window-union :func:`asof_join` and the
hash-bucketed :func:`asof_join_cogroup` must both implement the pinned
reference semantics: latest right row with ``ts_r <= ts_l`` (``<`` when
strict) per entity, SQL null-join keys (a null key matches NOTHING; null-key
left rows survive with null as-of values).

The sweep extends the point pins in tests/test_temporal.py (r5, temporal.py
null-coercion block) to generated cases — and its dry-run during round 6
found a REAL divergence: Window.partitionBy groups null keys into one
partition, so the window variant leaked null-entity right values to
null-entity left rows (fixed in asof_join by dropping null-key right rows
before the union).

Right values are a deterministic function of (entity, ts) so duplicate
right timestamps — whose winner among equal (on, side) sort keys is
legitimately unspecified in both engines — cannot make the comparison
flaky while still exercising the tie code paths.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from ficaria_spark.operators.temporal import asof_join, asof_join_cogroup

_entity = st.one_of(st.none(), st.integers(0, 2))
_ts = st.integers(0, 12)
_rows = st.lists(st.tuples(_entity, _ts), min_size=0, max_size=10)

_L_SCHEMA = T.StructType([
    T.StructField("entity", T.LongType()),
    T.StructField("ts", T.DoubleType()),
    T.StructField("lid", T.LongType()),
])
_R_SCHEMA = T.StructType([
    T.StructField("entity", T.LongType()),
    T.StructField("ts", T.DoubleType()),
    T.StructField("v", T.DoubleType()),
])


def _rv(e: int | None, t: int) -> float:
    """Right value as a function of (entity, ts): ties at equal timestamps
    carry equal values, so either tie-winner gives the same output."""
    return float((-1 if e is None else e) * 100 + t)


def _ref_asof(left_rows, right_rows, strict: bool) -> dict[int, float | None]:
    """Plain-Python reference: per left row, the max-ts matching right row
    under SQL null-key semantics."""
    out = {}
    for lid, (e, t) in enumerate(left_rows):
        cands = [rt for (re, rt) in right_rows
                 if e is not None and re == e
                 and (rt < t if strict else rt <= t)]
        out[lid] = _rv(e, max(cands)) if cands else None
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(left_rows=_rows, right_rows=_rows, strict=st.booleans())
def test_asof_window_and_cogroup_match_reference(spark, left_rows,
                                                 right_rows, strict):
    left = spark.createDataFrame(
        [(e, float(t), i) for i, (e, t) in enumerate(left_rows)], _L_SCHEMA)
    right = spark.createDataFrame(
        [(e, float(t), _rv(e, t)) for e, t in right_rows], _R_SCHEMA)
    exp = _ref_asof(left_rows, right_rows, strict)

    for name, op in (("window", asof_join), ("cogroup", asof_join_cogroup)):
        got = {
            r["lid"]: r["v_asof"]
            for r in op(left, right, on="ts", by="entity",
                        value_cols=["v"], strict=strict).collect()
        }
        assert set(got) == set(exp), (name, strict)
        for lid, want in exp.items():
            have = got[lid]
            if want is None:
                assert have is None or (isinstance(have, float)
                                        and math.isnan(have)), (
                    name, strict, lid, have, left_rows, right_rows)
            else:
                assert have == want, (
                    name, strict, lid, have, want, left_rows, right_rows)
