"""Timed variant of run_oracle_check: per-query wall time for both the
Spark side and the oracle side, to budget the driver's correctness pass.

    python tests/run_oracle_check_timed.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import __spark_entry__ as entrymod
from oracle_harness import compare, duckdb_connect

from airflow_baseball_spark.session import get_spark


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="oracle_check_timed")
    con = duckdb_connect(sf)
    qs, sqls = entrymod.queries(), entrymod.oracle_sql()
    bad, times = [], {}
    t_all = time.perf_counter()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            if name not in sqls:
                n = fn(spark, sf).count()
                dt = time.perf_counter() - t0
                times[name] = dt
                print(f"{name}: rows-only n={n} [{dt:.2f}s]", flush=True)
                continue
            rep = compare(fn(spark, sf), con, sqls[name])
            dt = time.perf_counter() - t0
            times[name] = dt
            ok = rep["values_match"] and rep["columns_match"] and rep["rowcount_match"]
            print(
                f"{name}: {'OK' if ok else str(rep.get('first_diffs') or rep)[:300]} [{dt:.2f}s]",
                flush=True,
            )
            if not ok:
                bad.append(name)
        except Exception as exc:  # noqa: BLE001
            times[name] = time.perf_counter() - t0
            print(f"{name}: ERROR {str(exc)[:300]}", flush=True)
            bad.append(name)
    total = time.perf_counter() - t_all
    print(f"\nTOTAL {total:.1f}s over {len(times)} queries", flush=True)
    for n, t in sorted(times.items(), key=lambda x: -x[1])[:15]:
        print(f"  slow: {n} {t:.2f}s", flush=True)
    print("FAILED:" if bad else "ALL OK", bad if bad else len(times), flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
