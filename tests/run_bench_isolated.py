"""Isolated re-measurement of individual bench queries (VERDICT r3 §perf).

Round 3's driver bench showed 3-7x regressions on four queries whose
code had not changed (minhash_signatures, minhash_lsh_pairs,
dedup_clusters, pivot_agg). This harness times a chosen subset in a
fresh session with the same warmups as bench.py, N repetitions each,
so ordering/session-accumulation effects are excluded. Usage:

    python tests/run_bench_isolated.py [sf_dir] [query ...]

Prints one JSON line: {"sf": ..., "queries": {name: [s1, s2, ...]}}.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from airflow_baseball_spark import registry
from airflow_baseball_spark.session import get_spark

DEFAULT = ["minhash_signatures", "minhash_lsh_pairs", "dedup_clusters", "pivot_agg"]
REPS = int(os.environ.get("BENCH_REPS", "3"))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.1"
    names = [a for a in args if "/" not in a] or DEFAULT

    spark = get_spark(app_name="bench_isolated")
    spark.range(1).count()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.range(100).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    qs = registry.queries()
    out: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        runs = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = runs
    print(json.dumps({"sf": sf_dir, "queries": out}))


if __name__ == "__main__":
    main()
