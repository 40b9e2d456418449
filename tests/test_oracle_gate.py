"""The driver's correctness gate, in CI: every oracle-backed query must
hash-match its DuckDB twin at sf0.001. Catches oracle/query regressions
before the driver ever runs (the driver gates at sf0.01; float-parity bugs
are data-dependent, so probing a second scale here adds coverage)."""

from __future__ import annotations

import importlib.util
from pathlib import Path

import pytest

SF = "/root/testdata/sf0.001"


def _load_check_oracle():
    path = Path(__file__).resolve().parent.parent / "tools" / "check_oracle.py"
    spec = importlib.util.spec_from_file_location("check_oracle", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.gate
def test_oracle_gate_sf0001(spark):
    co = _load_check_oracle()
    failures = co.run_gate(SF, spark=spark, echo=lambda *_: None)
    assert not failures, f"oracle gate failures at {SF}: {failures}"
