"""Run the dtype-sensitive driver-fetch simulation over a set of
queries, with raw (pre-fix) or wrapped (post-fix) oracles.

    python tests/run_driver_sim.py [sf_dir] [--raw] [--window-r8|--all|name ...]

--window-r8 replays exactly the 50 names of CORRECTNESS_r08.json and
cross-tabulates the sim verdicts against the driver's recorded ones —
the instrument-validation artifact for round 9.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

from driver_sim import compare_driverish  # noqa: E402
from oracle_harness import duckdb_connect  # noqa: E402

from airflow_baseball_spark import registry  # noqa: E402
from airflow_baseball_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:]]
    raw = "--raw" in args
    args = [a for a in args if a != "--raw"]
    sf = args[0] if args and not args[0].startswith("--") else "/root/testdata/sf0.01"
    names: list[str] | None = None
    driver_verdicts: dict[str, bool] = {}
    if "--window-r8" in args:
        rec = json.loads((REPO / "CORRECTNESS_r08.json").read_text())
        names = list(rec)
        driver_verdicts = {k: v["hash_match"] for k, v in rec.items()}
    elif "--all" not in args:
        rest = [a for a in args[1:] if not a.startswith("--")]
        names = rest or None

    spark = get_spark(app_name="driver_sim")
    con = duckdb_connect(sf)
    qs = registry.queries()
    sqls = registry.oracle_sql(raw=raw)
    todo = names if names is not None else list(qs)

    agree = disagree = 0
    bad = []
    for name in todo:
        if name not in qs or name not in sqls:
            print(f"{name}: <missing>", flush=True)
            continue
        try:
            rep = compare_driverish(qs[name](spark, sf), con, sqls[name])
            ok = rep["values_match"] and rep["columns_match"] and rep["rowcount_match"]
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {str(exc)[:200]}", flush=True)
            bad.append(name)
            continue
        line = f"{name}: {'OK' if ok else 'SIM-RED ' + str(rep.get('first_diffs') or rep)[:300]}"
        if name in driver_verdicts:
            drv = driver_verdicts[name]
            tag = "agrees" if drv == ok else "DISAGREES"
            if drv == ok:
                agree += 1
            else:
                disagree += 1
            line += f"   [driver r8: {'green' if drv else 'red'} -> sim {tag}]"
        print(line, flush=True)
        if not ok:
            bad.append(name)
    print(f"\nsim-red: {len(bad)} / {len(todo)}", flush=True)
    if driver_verdicts:
        print(f"driver-agreement: {agree} agree, {disagree} disagree", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
