"""Standalone driver-contract check: run every registered query at a
given sf_dir and compare against its DuckDB oracle. Usage:

    python tests/run_oracle_check.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import __spark_entry__ as entrymod
from oracle_harness import compare, duckdb_connect

from airflow_baseball_spark.session import get_spark


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="oracle_check")
    con = duckdb_connect(sf)
    qs, sqls = entrymod.queries(), entrymod.oracle_sql()
    bad = []
    for name, fn in qs.items():
        try:
            if name not in sqls:
                n = fn(spark, sf).count()
                print(f"{name}: rows-only n={n}", flush=True)
                continue
            rep = compare(fn(spark, sf), con, sqls[name])
            ok = rep["values_match"] and rep["columns_match"] and rep["rowcount_match"]
            print(f"{name}: {'OK' if ok else str(rep.get('first_diffs') or rep)[:400]}", flush=True)
            if not ok:
                bad.append(name)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {str(exc)[:300]}", flush=True)
            bad.append(name)
    print("FAILED:" if bad else "ALL OK", bad if bad else len(qs), flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
