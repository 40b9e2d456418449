"""Local mimic of the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() twin on DuckDB at sf0.01, compare row count,
sorted-column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]

Also importable: :func:`run_gate` is reused by tests/test_oracle_gate.py so
oracle regressions fail in pytest before the driver ever runs.
"""

from __future__ import annotations

import math
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out)


def run_gate(sf_dir: str, only: set[str] | None = None, spark=None,
             echo=print) -> list[str]:
    """Run the Spark-vs-DuckDB gate for every (or ``only``) registered query
    at ``sf_dir``. Returns the list of failing query names (empty = green)."""
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir  # fit-twin oracles follow sf

    import __spark_entry__ as e

    if spark is None:
        from ficaria_spark.session import get_spark

        spark = get_spark("oracle-check", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    failures: list[str] = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in oracles:
            echo(f"{name:24s} rows={len(srows):7d}  (rows-only check, no oracle)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:
            echo(f"{name:24s} ORACLE SQL ERROR: {ex}")
            failures.append(name)
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        ok_vals = False
        if ok_cols and ok_count:
            a = canon([tuple(r) for r in srows], scols)
            b = canon(drows, dcols)
            ok_vals = a == b
            if not ok_vals:
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                echo(f"{name:24s} VALUE MISMATCH  sample={diffs}")
        status = "OK" if (ok_cols and ok_count and ok_vals) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        echo(
            f"{name:24s} {status}  rows={len(srows)}/{len(drows)} cols_match={ok_cols}"
            + ("" if ok_cols else f" spark={sorted(scols)} duck={sorted(dcols)}")
        )
    return failures


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    return 1 if run_gate(sf_dir, only or None) else 0


if __name__ == "__main__":
    raise SystemExit(main())
