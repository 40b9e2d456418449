"""Property-based tests (hypothesis) for the dedup estimators (VERDICT r4
#6): MinHash signature agreement must CONCENTRATE around the exact shingle
Jaccard for arbitrary corpora, and the banded-pigeonhole SimHash join must
return EXACTLY the pairs within the requested Hamming radius (completeness
AND soundness) for arbitrary near-dup families — point checks on seeded
fixtures can't establish either."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ficaria_spark.operators.dedup import minhash_signatures, simhash

_VOCAB = [f"w{i}" for i in range(12)]

# corpora of word-lists (≥ 3 words so every doc has standard k=3 shingles)
_docs = st.lists(
    st.lists(st.sampled_from(_VOCAB), min_size=3, max_size=24),
    min_size=2, max_size=8,
)


def _exact_jaccard(a: list[str], b: list[str], k: int = 3) -> float:
    sa = {tuple(a[i:i + k]) for i in range(len(a) - k + 1)}
    sb = {tuple(b[i:i + k]) for i in range(len(b) - k + 1)}
    return len(sa & sb) / len(sa | sb) if sa | sb else 1.0


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=_docs)
def test_minhash_estimate_concentrates_on_exact_jaccard(spark, docs):
    """With 128 hashes the per-pair estimator std is ≤ sqrt(1/(4·128)) ≈
    0.044, so any |est − exact| > 0.25 (≈ 5.7σ) would flag a broken hash
    family / permutation independence, and the corpus-mean error must stay
    small. Deterministic given the corpus (fixed seed → no flake)."""
    pdf = pd.DataFrame({"doc_id": range(len(docs)),
                        "text": [" ".join(d) for d in docs]})
    sigs = (minhash_signatures(spark.createDataFrame(pdf), k=3, num_hashes=128)
            .toPandas().set_index("id").signature)
    errs = []
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            est = float(np.mean(np.array(sigs[i]) == np.array(sigs[j])))
            exact = _exact_jaccard(docs[i], docs[j])
            errs.append(abs(est - exact))
            assert abs(est - exact) <= 0.25, (
                f"pair ({i},{j}): est={est:.3f} exact={exact:.3f}")
    assert float(np.mean(errs)) <= 0.10


# a near-dup family: one base word-list plus per-doc single-word mutations at
# arbitrary positions — produces a realistic mix of tiny and medium Hamming
# distances between the family members
_family = st.tuples(
    st.lists(st.sampled_from(_VOCAB), min_size=6, max_size=20),
    st.lists(st.lists(st.tuples(st.integers(0, 19), st.sampled_from(_VOCAB)),
                      min_size=0, max_size=3),
             min_size=2, max_size=7),
    st.integers(min_value=0, max_value=12),
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(fam=_family)
def test_simhash_banding_is_exact_for_any_radius(spark, fam):
    """The banded-pigeonhole join must return EXACTLY the pairs with
    Hamming(simhash) ≤ max_hamming — completeness is the pigeonhole
    guarantee (bands = H+1 ⇒ some band untouched), soundness is the final
    bit_count filter. Verified against a brute-force all-pairs computation
    over the same signatures."""
    from ficaria_spark.operators.dedup import simhash_near_pairs

    base, mutss, H = fam
    docs = []
    for muts in mutss:
        d = list(base)
        for pos, w in muts:
            d[pos % len(d)] = w
        docs.append(d)
    pdf = pd.DataFrame({"doc_id": range(len(docs)),
                        "text": [" ".join(d) for d in docs]})
    sdf = spark.createDataFrame(pdf)

    sh = simhash(sdf).toPandas().set_index("id").simhash.astype(np.uint64)
    expected = set()
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            ham = int(bin(int(sh[i]) ^ int(sh[j])).count("1"))
            if ham <= H:
                expected.add((i, j, ham))

    got = simhash_near_pairs(sdf, max_hamming=H).toPandas()
    got_set = {(int(a), int(b), int(h))
               for a, b, h in zip(got.id_a, got.id_b, got.hamming)}
    assert got_set == expected
