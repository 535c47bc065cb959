"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is materialized with a `noop` write (full execution, no
driver-side collect cost, no files)."""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from airflow_baseball_spark import registry
from airflow_baseball_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    spark = get_spark(app_name="bench")
    # warmup actions so JVM/codegen + hadoop/parquet-reader init +
    # Python-worker (Arrow) startup isn't billed to the first queries
    # that happen to need them (region is the smallest table — 5 rows)
    spark.range(1).count()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.range(100).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()
    # JSON-codegen + wide events-scan init (r01 billed ~17s of one-off
    # init to whichever query first parsed JSON after the streaming runs)
    spark.range(10).selectExpr(
        "from_json('{\"k\": 1}', 'k BIGINT') AS j"
    ).write.format("noop").mode("overwrite").save()
    from airflow_baseball_spark.schemas import load_table  # noqa: PLC0415

    load_table(spark, sf_dir, "events").limit(1000).write.format("noop").mode(
        "overwrite"
    ).save()

    def calibrate() -> float:
        """Fixed reference workload (hash-agg over lineitem) timed at
        bench start and end: PERF_NOTES.md documents multi-minute
        windows where the shared host runs 3-20x slow; the two calib
        numbers let a reader detect a contended run and normalize the
        per-query timings instead of mistaking noise for regressions."""
        t0 = time.perf_counter()
        load_table(spark, sf_dir, "lineitem").groupBy("l_returnflag").agg(
            {"l_quantity": "sum", "l_extendedprice": "avg"}
        ).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    calib_start = calibrate()

    timings: dict[str, float] = {}
    errors: list[str] = []
    total = 0.0
    for i, (name, fn) in enumerate(registry.queries().items()):
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001 — one bad query must
            # never take down the whole bench (a crashed run records
            # NOTHING for the driver); log and keep going
            errors.append(name)
            print(f"BENCH ERROR {name}: {str(exc)[:200]}", file=sys.stderr)
            continue
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt
        if (i + 1) % 20 == 0:
            # session hygiene for a ~100-query single session: Spark's
            # ContextCleaner frees localCheckpoint/broadcast blocks only
            # after their driver-side handles are GC'd; trigger both GCs
            # periodically (outside any timing window) so storage from
            # iterative ops (CC rounds, k-means) can't accumulate and
            # tax whichever queries happen to run late in the session
            import gc  # noqa: PLC0415

            gc.collect()
            spark.sparkContext._jvm.System.gc()  # noqa: SLF001

    # headline numbers lead AND trail the line: the driver's artifact
    # capture has truncated from the head before (BENCH_r02 lost the
    # first ~14 timings), so `total_sec`/`n_queries`/`sf_echo` repeat
    # the headline at the very end — whichever side survives a cut
    # still carries the total.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(total, 3),
                "unit": "sec",
                "sf": sf_val,
                "queries": timings,
                "total_sec": round(total, 3),
                "n_queries": len(timings),
                "calib_start_sec": calib_start,
                "calib_end_sec": calibrate(),
                "bench_errors": errors,
                "sf_echo": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
