"""Hostile-corpus hardening for the text family (round-5 verdict items 2/3).

Three attack surfaces:

* PII regex dialect parity — the text_stats driver row now carries PII span
  counts + redacted length, and the gate corpus contains no PII, so the
  Java-regex vs DuckDB-RE2 equivalence is pinned HERE on a planted-span
  corpus (exactly the spans the driver would hash if the corpus had any).
* Empty / whitespace-only documents — Spark 4 runs ANSI mode, where one
  ``x / 0`` kills the stage; every ratio in quality_features is guarded and
  the guards must match the DuckDB oracle bit-for-bit.
* The full driver gate re-run on an AUGMENTED corpus (sf0.001 documents +
  planted degenerate docs) for every text-family query — proving the
  oracle pair stays hash-identical on inputs the shipped testdata never
  exercises.
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pandas as pd
import pyarrow.parquet as pq
import pytest

from ficaria_spark.operators import text as tx

PLANTED = [
    "contact john.doe+spam@example.co.uk for details",
    "ssn 123-45-6789 and phone (555) 867-5309 on file",
    "server at 192.168.10.254 responded",
    "a perfectly clean sentence with numbers 12345",
    "dial +1 555-867-5309 or 555.867.5309 now",
    "two mails a@b.io c@d.org one ip 10.0.0.1",
    "",
]

DEGENERATE_TEXTS = ["", "   ", " \t  \n ", "...", "hello"]


def test_pii_duckdb_dialect_parity(spark):
    """Spark (Java regex) and DuckDB (RE2) must agree on PII span counts AND
    the redacted text itself for planted spans of every kind — this is the
    dialect-equivalence pin behind the text_stats oracle columns."""
    from ficaria_spark.queries import _pii_count_sql, _pii_redact_sql

    pdf = pd.DataFrame({"doc_id": range(len(PLANTED)), "text": PLANTED})
    got = (tx.redact_pii(spark.createDataFrame(pdf), with_counts=True)
           .orderBy("doc_id").toPandas())

    con = duckdb.connect()
    con.register("docs", pdf)
    want = con.execute(
        f"SELECT doc_id, {_pii_count_sql('text')},\n"
        f"  {_pii_redact_sql('text')} AS text_redacted\n"
        f"FROM docs ORDER BY doc_id").df()

    for kind in ("email", "ssn", "phone", "ipv4"):
        assert got[f"pii_{kind}_count"].tolist() == \
            want[f"pii_{kind}_count"].tolist(), kind
    assert got.text_redacted.tolist() == want.text_redacted.tolist()
    # sanity: the corpus actually exercises every kind
    assert got.pii_email_count.sum() >= 3
    assert got.pii_ssn_count.sum() >= 1
    assert got.pii_phone_count.sum() >= 3
    assert got.pii_ipv4_count.sum() >= 2


def test_quality_features_empty_docs(spark):
    """ANSI-proofing: empty / whitespace-only docs produce n_words=0 and 0.0
    ratios instead of DIVIDE_BY_ZERO; token_count counts 0 (not 1)."""
    pdf = pd.DataFrame({"doc_id": range(len(DEGENERATE_TEXTS)),
                        "text": DEGENERATE_TEXTS})
    sdf = spark.createDataFrame(pdf)
    got = (tx.quality_features(sdf)
           .withColumn("tc_ws", tx.token_count("text"))
           .withColumn("tc_bpe", tx.token_count("text", mode="bpe"))
           .orderBy("doc_id").toPandas())

    for i in (0, 1, 2):  # "", "   ", " \t  \n "
        assert got.n_words[i] == 0, DEGENERATE_TEXTS[i]
        assert got.tc_ws[i] == 0
        assert got.tc_bpe[i] == 0
        for c in ("mean_word_len", "punct_ratio", "stopword_ratio",
                  "upper_ratio", "digit_ratio"):
            assert got[c][i] == 0.0, (DEGENERATE_TEXTS[i], c)
    assert got.n_words[3] == 1 and got.punct_ratio[3] == 1.0   # "..."
    assert got.n_words[4] == 1 and got.tc_ws[4] == 1            # "hello"

    # quality/repetition/redaction all survive the degenerate rows
    full = tx.redact_pii(
        tx.repetition_features(tx.quality_score(sdf)), with_counts=True)
    out = full.orderBy("doc_id").toPandas()
    assert not out.quality_keep[:3].any()
    assert (out.dup_word_frac[:3] == 0.0).all()


def test_dedup_family_empty_docs(spark):
    """MinHash and SimHash pipelines must not crash on empty/ws-only docs
    (their shingle arrays degenerate to a single empty-string shingle)."""
    from ficaria_spark.operators.dedup import (
        exact_dedup, minhash_dedup_pairs, simhash_near_pairs)

    texts = DEGENERATE_TEXTS + ["the quick brown fox jumps over the dog",
                                "the quick brown fox jumps over the dog"]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts,
                        "source": ["s"] * len(texts)})
    sdf = spark.createDataFrame(pdf)
    keep = exact_dedup(sdf).toPandas()
    # "" and "   " normalize to "" (one survivor); " \t  \n " normalizes to
    # " " (trim strips spaces only — same in DuckDB); fox doc-pair dedups
    assert len(keep) == len(texts) - 1 - 1
    minhash_dedup_pairs(sdf, k=3, num_hashes=16, bands=4,
                        threshold=0.5).count()  # must not raise
    simhash_near_pairs(sdf, max_hamming=10).count()  # must not raise


@pytest.mark.gate
def test_gate_green_with_empty_docs(spark, sf_dir, tmp_path):
    """The REAL driver gate (Spark vs DuckDB, exact value hash) over an
    augmented corpus: sf0.001 + planted empty / whitespace-only / punct-only
    docs — every text-family query and the composed pipeline must stay
    hash-identical, proving the ANSI guards have the same semantics in both
    engines rather than merely not crashing."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "check_oracle_aug", Path(__file__).resolve().parent.parent
        / "tools" / "check_oracle.py")
    co = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(co)

    aug = tmp_path / "sfaug"
    aug.mkdir()
    for t in co.TABLES:
        if t != "documents":
            os.symlink(f"{sf_dir}/{t}.parquet", aug / f"{t}.parquet")
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    extra = pd.DataFrame({
        "doc_id": [docs.doc_id.max() + 1 + i
                   for i in range(len(DEGENERATE_TEXTS))],
        "text": DEGENERATE_TEXTS,
        "lang": ["en"] * len(DEGENERATE_TEXTS),
        "source": ["src0"] * len(DEGENERATE_TEXTS),
    })
    extra["n_chars"] = extra.text.str.len()
    all_docs = pd.concat([docs, extra], ignore_index=True)
    all_docs.to_parquet(aug / "documents.parquet", index=False)

    # run_gate SETS this env var internally (check_oracle.py:43, the
    # fit-twin oracles follow it) — restore it so later gate tests in the
    # same session see the real sf_dir again
    prev = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR")
    try:
        failures = co.run_gate(
            str(aug),
            only={"text_stats", "doc_fingerprint", "lang_profile",
                  "pipeline_tokens"},
            spark=spark, echo=lambda *_: None)
    finally:
        if prev is None:
            os.environ.pop("SPARK_GRAFT_ORACLE_SF_DIR", None)
        else:
            os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = prev
        shutil.rmtree(aug, ignore_errors=True)
    assert failures == []


UNICODE_TEXTS = [
    "héllo wörld straße café",      # latin accents + ß
    "日本語のテキスト", # CJK, no spaces
    "emoji \U0001f600 test \U0001f680 rocket",          # astral plane
    "nbsp separated words here",              # U+00A0 is NOT \s
    "tab\tand\nnewline  mix",
    "İstanbul Iı case edge",                  # Turkish dotted I
]


def test_unicode_text_parity_spark_vs_duckdb(spark):
    """Cross-engine pins for non-ASCII corpora: word counting (\\s+ split +
    empty filter), char length (code points), digit ratio, and the md5
    fingerprint (lower + whitespace normalization) must agree between Java
    regex/UTF8String semantics and DuckDB's RE2/UTF-8 semantics — the exact
    expression pairs the text_stats/doc_fingerprint oracles rely on."""
    pdf = pd.DataFrame({"doc_id": range(len(UNICODE_TEXTS)),
                        "text": UNICODE_TEXTS})
    sdf = spark.createDataFrame(pdf)
    from pyspark.sql import functions as F

    got = (tx.quality_features(sdf)
           .withColumn("tc", tx.token_count("text"))
           .select("doc_id", "n_chars_q", "n_words", "tc",
                   F.round("digit_ratio", 6).alias("digit_ratio"))
           .orderBy("doc_id").toPandas())
    fp = tx.fingerprint(sdf).orderBy("doc_id").toPandas()

    con = duckdb.connect()
    con.register("docs", pdf)
    want = con.execute(r"""
        SELECT doc_id,
               length(text) AS n_chars,
               len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                               x -> x != '')) AS n_words,
               round(length(regexp_replace(text, '[^0-9]', '', 'g'))
                     / cast(greatest(length(text), 1) AS DOUBLE), 6) AS digit_ratio,
               md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
        FROM docs ORDER BY doc_id""").df()

    assert got.n_chars_q.tolist() == want.n_chars.tolist()
    assert got.n_words.tolist() == want.n_words.tolist()
    assert got.tc.tolist() == want.n_words.tolist()
    assert got.digit_ratio.tolist() == want.digit_ratio.tolist()
    # fingerprints agree for every doc EXCEPT the Turkish dotted capital İ
    # (U+0130): Java's toLowerCase expands it to 'i' + U+0307 combining dot
    # (two code points) while DuckDB's utf8proc maps it to plain 'i' — a
    # REAL, known cross-engine divergence of lower(), pinned here so it
    # can't silently bite an oracle on a corpus containing İ (documented in
    # operators/text.fingerprint and dedup.exact_dedup)
    assert fp.doc_fingerprint.tolist()[:5] == want.fp.tolist()[:5]
    assert fp.doc_fingerprint[5] != want.fp[5]
    # the NBSP doc proves \s does NOT split U+00A0 in either engine
    assert got.n_words[3] == 2


def test_pathological_giant_doc_stays_linear(spark):
    """One 100k-word document through the hot text/dedup expressions — the
    measured O(words²) HOF pitfalls (re-evaluated inline arrays) would turn
    this into minutes; the materialized-array forms finish in seconds. Also
    guards per-doc memory: a giant doc must not blow a task."""
    import time

    import numpy as np
    from pyspark.sql import functions as F

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(5000)]
    giant = " ".join(rng.choice(vocab, size=100_000))
    small = "a modest document with a handful of words"
    pdf = pd.DataFrame({"doc_id": [0, 1], "text": [giant, small]})
    sdf = spark.createDataFrame(pdf)

    t0 = time.time()
    stats = tx.repetition_features(tx.quality_score(sdf)) \
        .select("doc_id", "n_words", "dup_word_frac").orderBy("doc_id").toPandas()
    fps = tx.rolling_fingerprints(sdf, window=5, algo="xxhash64") \
        .select("doc_id", F.size("shingle_fps").alias("n")).orderBy("doc_id").toPandas()
    from ficaria_spark.operators.dedup import minhash_signatures, simhash

    sigs = minhash_signatures(sdf, k=3, num_hashes=32).orderBy("id").toPandas()
    sh = simhash(sdf).orderBy("id").toPandas()
    wall = time.time() - t0

    assert stats.n_words[0] == 100_000
    assert fps.n[0] == 100_000 - 5 + 1
    assert len(sigs.signature[0]) == 32 and sh.simhash.notna().all()
    # generous bound: the quadratic regressions measured 150x slower — they
    # fail this by an order of magnitude even on a stolen-host day
    assert wall < 120, f"giant-doc pipeline took {wall:.0f}s — quadratic regression?"
