"""Driver-contract invariants: queries()/oracle_sql() shape, oracle SQL
parseability, and fit-twin oracle availability. Catches regressions that
would silently degrade exact-oracle rows to rows-only checks."""

from __future__ import annotations

import os

import duckdb
import pytest

SF = "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

# every query that must carry an exact oracle (the driver gate's green rows)
EXPECTED_ORACLE = {
    "pit_backfill", "lag_lead", "sessionize", "tumble", "slide", "asof_join",
    "asof_join_cogroup", "interpolate_linear", "tpch_q1",
    "top_customers", "tokens_passthrough", "impute_mean",
    "impute_fcm_centroid", "impute_fcm_parameter", "impute_fcm_rough",
    "impute_iifcm", "select_figfs", "select_wfrs", "dedup_exact",
    "dedup_ngram_jaccard", "dedup_minhash_portable", "dedup_simhash_portable",
    "dedup_embedding", "knn_cosine", "ann_lsh",
    "ann_ivf", "text_stats", "doc_fingerprint", "lang_profile",
    "pipeline_flagship", "pipeline_flagship_fcm", "salted_agg",
    "impute_fcki",
    "impute_fcki_capped", "impute_dt", "dedup_minhash_lsh", "dedup_simhash",
    "pack_segments", "pack_sequences", "vocab_stats",
    "decontaminate", "hash_split", "stratified_sample", "pipeline_tokens",
    "token_bigrams", "dedup_clusters", "range_join_weeks", "rollup_events",
    "cms_token_counts", "media_features",
}
# the driver verifies at most this many queries per round (r03 evidence:
# 54 registered, exactly the first 50 got rows) — the registry must fit
# inside the window or tail queries silently ride on stale rounds
DRIVER_QUERY_CAP = 50
# every registered query now carries an exact oracle (sequential transforms
# and xxhash64 pipelines via driver-twin VALUES relations)
EXPECTED_ROWS_ONLY: set[str] = set()


@pytest.fixture(scope="module")
def contract():
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF
    import __spark_entry__ as e

    return e.queries(), e.oracle_sql()


def test_every_query_classified(contract):
    qs, oracles = contract
    assert set(qs) == EXPECTED_ORACLE | EXPECTED_ROWS_ONLY
    assert EXPECTED_ORACLE <= set(oracles), sorted(EXPECTED_ORACLE - set(oracles))
    assert not (EXPECTED_ROWS_ONLY & set(oracles))


def test_registry_fits_driver_window(contract):
    qs, _ = contract
    assert len(qs) <= DRIVER_QUERY_CAP, (
        f"{len(qs)} registered queries exceed the driver's {DRIVER_QUERY_CAP}-"
        "query verification window; consolidate (fold variants into one query "
        "or retire subsumed shapes) so every query gets a fresh driver row")


def test_latest_correctness_covers_registry(contract):
    """A silent driver cap must never hide a regression: every registered
    query name must appear in the most recent CORRECTNESS_r*.json. Queries
    added AFTER the latest driver run are exempt via NEW_SINCE_LAST_ROUND —
    keep that set empty at round end."""
    import json
    import re
    from pathlib import Path

    # round 6: empty — every registered query has a hash-green row in
    # CORRECTNESS_r05.json; add names here ONLY for queries registered after
    # the latest driver run, and clear again at round end
    NEW_SINCE_LAST_ROUND: set[str] = set()

    root = Path(__file__).resolve().parent.parent
    files = sorted(root.glob("CORRECTNESS_r*.json"),
                   key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)))
    if not files:
        pytest.skip("no CORRECTNESS file yet (round 1)")
    checked = set(json.loads(files[-1].read_text()))
    qs, _ = contract
    missing = set(qs) - checked - NEW_SINCE_LAST_ROUND
    assert not missing, (
        f"registered queries with no row in {files[-1].name}: {sorted(missing)}")


def test_every_oracle_parses_in_duckdb(contract):
    """EXPLAIN every oracle against the real sf0.01 views — any SQL syntax or
    schema regression fails fast without running the queries."""
    _, oracles = contract
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    for name, sql in oracles.items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as ex:  # pragma: no cover
            raise AssertionError(f"oracle for {name!r} does not parse: {ex}") from ex
