"""Per-stage profile of named queries: runs each query through the
noop sink in a UI-enabled session and prints each stage's task count,
duration, and shuffle volume from the local REST API — the fastest way
to spot single-task stages (one-split scans), stragglers, and
shuffle-bound stages without a browser. Usage:

    python tests/run_stage_profile.py [sf_dir] name [name ...]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from airflow_baseball_spark import registry
from airflow_baseball_spark.session import get_spark


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.1"
    names = [a for a in args if "/" not in a]
    if not names:
        print(__doc__)
        return 2

    spark = get_spark(
        app_name="stage_profile", extra_conf={"spark.ui.enabled": "true"}
    )
    sc = spark.sparkContext
    spark.range(1).count()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    ui = sc.uiWebUrl
    app_id = sc.applicationId
    qs = registry.queries()

    def stages():
        url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        with urllib.request.urlopen(url) as r:
            return json.load(r)

    for name in names:
        fn = qs[name]
        seen = {s["stageId"] for s in stages()}
        sc.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        rows = []
        for s in stages():
            if s["stageId"] in seen:
                continue
            rows.append(
                (
                    s["stageId"],
                    s["numCompleteTasks"],
                    s["executorRunTime"] / 1000.0,
                    s.get("shuffleReadBytes", 0) / 1e6,
                    s.get("shuffleWriteBytes", 0) / 1e6,
                    (s.get("details") or "").split("\n")[0][:60],
                )
            )
        rows.sort(key=lambda r: -r[2])
        print(f"\n=== {name}: wall {wall:.2f}s, {len(rows)} stages ===")
        print("stage tasks  runtime_s  shufR_MB  shufW_MB")
        for sid, nt, rt, sr, sw, det in rows[:12]:
            print(f"{sid:5d} {nt:5d} {rt:10.2f} {sr:9.1f} {sw:9.1f}  {det}")
        sc.setJobDescription(None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
