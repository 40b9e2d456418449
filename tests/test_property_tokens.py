"""Property-based tests (hypothesis): packing and splitting invariants must
hold for ARBITRARY corpora, not just the seeded fixtures."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ficaria_spark.operators.sampling import hash_split
from ficaria_spark.operators.tokens import pack_sequences

_corpus = st.lists(
    st.tuples(
        st.lists(st.integers(min_value=0, max_value=99), min_size=0, max_size=30),
        st.sampled_from(["a", "b"]),
    ),
    min_size=1, max_size=25,
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=_corpus, ctx=st.integers(min_value=1, max_value=17))
def test_pack_sequences_is_exact_chunking_of_the_stream(spark, docs, ctx):
    """For any corpus and context length: per source, the packed examples are
    EXACTLY the doc_id-ordered concatenation of token arrays chunked by ctx —
    full packs everywhere except each source's last, nothing lost, nothing
    reordered."""
    pdf = pd.DataFrame({
        "doc_id": [f"d{i:03d}" for i in range(len(docs))],
        "tokens": [list(t) for t, _ in docs],
        "n_tok": [len(t) for t, _ in docs],
        "source": [s for _, s in docs],
    })
    sdf = spark.createDataFrame(pdf, "doc_id string, tokens array<int>, n_tok int, source string")
    got = pack_sequences(sdf, context_len=ctx).toPandas()
    for src in sorted(pdf.source.unique()):
        stream: list[int] = []
        for _, r in pdf[pdf.source == src].sort_values("doc_id").iterrows():
            stream.extend(r.tokens)
        exp = [stream[i:i + ctx] for i in range(0, len(stream), ctx)]
        g = got[got.source == src].sort_values("pack_id")
        assert [list(t) for t in g.tokens] == exp, (src, ctx)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ids=st.lists(st.integers(min_value=0, max_value=10**9),
                    min_size=1, max_size=60, unique=True),
       seed=st.integers(min_value=0, max_value=1000))
def test_hash_split_total_disjoint_and_seed_stable(spark, ids, seed):
    """Every row lands in exactly one split; the assignment depends only on
    (key, seed) — adding or removing OTHER rows never moves a row."""
    pdf = pd.DataFrame({"doc_id": ids})
    sdf = spark.createDataFrame(pdf)
    w = {"train": 0.7, "val": 0.2, "test": 0.1}
    full = hash_split(sdf, w, seed=seed).toPandas().set_index("doc_id")["split"]
    assert len(full) == len(ids)
    # subset invariance: the same rows get the same split in a half-corpus
    half_ids = ids[: max(1, len(ids) // 2)]
    half = hash_split(spark.createDataFrame(pd.DataFrame({"doc_id": half_ids})),
                      w, seed=seed).toPandas().set_index("doc_id")["split"]
    assert all(full.loc[i] == half.loc[i] for i in half_ids)
