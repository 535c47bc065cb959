"""Stage-runner CLI — the executable payload behind
:func:`pipelines.orchestration.build_airflow_dag`.

Each Airflow task (or a cron shell, or an operator-less smoke run)
invokes one reference DAG stage:

    python -m airflow_baseball_spark.jobs --stage park_factor \
        --data-dir /data/tables [--out-dir DIR] [--run-date YYYY-MM-DD]

Input tables are ``<data-dir>/<table>.parquet``; outputs land under
``<out-dir>`` (default: data-dir) with the reference's write semantics
per table: ``park_factor`` is rebuilt per run
(`dags/001_park_factor_calculation.py:20-34` drop/create →
overwrite), metric tables upsert on their player-id key
(`dags/utils/queries.py` ON DUPLICATE KEY UPDATE → merge_upsert), and
the wide records tables append (`dags/050_insert_hitter_intergration_data.py:155`).

Ingestion stages (``land_*``) are scrape boundaries (SURVEY §2 A1-A6)
— the runner only validates that their landed tables exist.
``schedule_lineup`` is the G3 event-time trigger, which lives in the
orchestrator (`pipelines/orchestration.py event_time_triggers`); as a
batch stage it is a validated no-op.

The reference's 011→012→013 hitter-metric cascade is one fused Spark
job here (SURVEY §3 entry point 2), so the three stage names all run
``hitter_metrics`` — each invocation is an idempotent merge, so the
chain stays restartable at any link.
"""

from __future__ import annotations

import argparse
import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from airflow_baseball_spark.pipelines.hitter_metrics import (
    hitter_metrics,
    league_runs_from_games,
    park_adjusted_metrics,
)
from airflow_baseball_spark.pipelines.integration import (
    integration_records,
    recent_games,
)
from airflow_baseball_spark.pipelines.orchestration import STAGES
from airflow_baseball_spark.pipelines.park_factor import park_factor
from airflow_baseball_spark.pipelines.pitcher_metrics import pitcher_metrics

LAND_STAGES = {s.name: s for s in STAGES if s.name.startswith("land_")}


def _read(spark: SparkSession, data_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{data_dir}/{table}.parquet")


def run_stage(
    spark: SparkSession,
    stage: str,
    data_dir: str,
    out_dir: str | None = None,
    run_date: str | None = None,
) -> list[str]:
    """Execute one stage; returns the list of tables written (empty for
    validation-only stages). Raises on unknown stages or missing landed
    inputs — a silent no-op would let a broken chain 'succeed'."""
    from airflow_baseball_spark.operators.upsert import merge_upsert

    out = out_dir or data_dir
    t = lambda name: _read(spark, data_dir, name)  # noqa: E731

    if stage in LAND_STAGES:
        missing = [
            tbl
            for tbl in LAND_STAGES[stage].outputs
            if not os.path.exists(f"{data_dir}/{tbl}.parquet")
        ]
        if missing:
            raise FileNotFoundError(
                f"{stage}: landed table(s) {missing} absent under {data_dir} "
                "— ingestion runs outside the engine and must land first"
            )
        return []
    if stage == "schedule_lineup":
        return []  # G3 trigger: orchestrator-side (event_time_triggers)
    if stage == "park_factor":
        park_factor(t("game_records")).write.mode("overwrite").parquet(
            f"{out}/park_factor"
        )
        return ["park_factor"]
    if stage in ("hitter_woba", "hitter_wrc", "hitter_rates"):
        hm = hitter_metrics(t("hitters"), league_runs_from_games(t("game_records")))
        merge_upsert(spark, hm, f"{out}/hitter_metrics", keys=["hitter_id"])
        return ["hitter_metrics"]
    if stage == "pitcher_metrics":
        pm = pitcher_metrics(t("pitchers"))
        merge_upsert(spark, pm, f"{out}/pitcher_metrics", keys=["pitcher_id"])
        return ["pitcher_metrics"]
    if stage == "park_adjusted":
        pa = park_adjusted_metrics(
            t("today_lineup"),
            t("hitters"),
            spark.read.parquet(f"{out}/hitter_metrics"),
            spark.read.parquet(f"{out}/park_factor"),
        )
        merge_upsert(spark, pa, f"{out}/park_adjusted_metrics", keys=["hitter_id"])
        return ["park_adjusted_metrics"]
    if stage in ("hitter_records", "pitcher_records"):
        role = stage.split("_")[0]
        rec = integration_records(
            t("today_lineup"),
            t(f"{role}s"),
            spark.read.parquet(f"{out}/{role}_metrics"),
            t(f"{role}_opponents"),
            t(f"{role}_stadiums"),
            role=role,
            recent_games_root=f"{out}/recent_games",
        )
        rec.write.mode("append").parquet(f"{out}/{stage}")
        recent_games(
            t(f"{role}_games"), role, out_path=f"{out}/recent_games/{role}"
        )
        return [stage, f"recent_games/{role}"]
    known = ", ".join(s.name for s in STAGES)
    raise ValueError(f"unknown stage {stage!r}; expected one of: {known}")


def main(argv: Sequence[str] | None = None) -> int:
    from airflow_baseball_spark.session import get_spark

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--stage", required=True)
    p.add_argument("--data-dir", required=True)
    p.add_argument("--out-dir", default=None)
    p.add_argument("--run-date", default=None)
    args = p.parse_args(argv)
    spark = get_spark(app_name=f"stage_{args.stage}")
    written = run_stage(spark, args.stage, args.data_dir, args.out_dir, args.run_date)
    print(f"{args.stage}: wrote {written or 'nothing (validation stage)'}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
