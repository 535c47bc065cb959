"""Targeted driver-contract check: run only the NAMED queries against
their DuckDB oracles (same comparator as run_oracle_check.py). The
per-operator iteration loop while building: add an operator, check
just it, keep the full sweep for commit gates. Usage:

    python tests/run_oracle_subset.py name [name ...]
    python tests/run_oracle_subset.py --sf /root/testdata/sf0.01 name
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
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    if args and args[0] == "--sf":
        sf = args[1]
        args = args[2:]
    elif args and args[0].startswith("/"):
        sf = args[0]
        args = args[1:]
    if not args:
        print(__doc__)
        return 2
    spark = get_spark(app_name="oracle_subset")
    con = duckdb_connect(sf)
    qs, sqls = entrymod.queries(), entrymod.oracle_sql()
    bad = []
    for name in args:
        try:
            if name not in qs:
                print(f"{name}: UNKNOWN", flush=True)
                bad.append(name)
                continue
            if name not in sqls:
                n = qs[name](spark, sf).count()
                print(f"{name}: rows-only n={n}", flush=True)
                continue
            rep = compare(qs[name](spark, sf), con, sqls[name])
            ok = (
                rep["values_match"]
                and rep["columns_match"]
                and rep["rowcount_match"]
            )
            print(
                f"{name}: {'OK' if ok else str(rep.get('first_diffs') or rep)[:400]}",
                flush=True,
            )
            if not ok:
                bad.append(name)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {str(exc)[:300]}", flush=True)
            bad.append(name)
    print("FAILED:" if bad else "ALL OK", bad if bad else len(args), flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
