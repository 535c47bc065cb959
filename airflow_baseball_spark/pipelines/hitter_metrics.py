"""Hitter metric cascade — one fused Spark job replacing reference DAGs
011 (wOBA) → 012 (wRC) → 013 (K%/BB%/BABIP).

The reference runs three DAGs, each looping hitters in Python with one
UPSERT transaction per row, and 012 re-SELECTs `pa` per hitter (N+1)
(``dags/011_calculate_hitter_wOBA.py:34-47``,
``dags/012_calculate_hitter_wRC.py:63-98``,
``dags/013_calculate_hitter_metrics.py:37-50``). Set-based, the whole
cascade is: one scan of ``hitters`` → formula columns → league scalars
as a 1-row broadcast crossJoin → one output.

Semantics preserved:

* B4 guards: zero denominators yield NULL metrics (the reference skips
  the upsert, leaving the previous value — NULL on first run);
* D2: league averages (wOBA/OBP/SLG) ignore NULLs, league sums over
  all hitters — computed over the *full* table, not any lineup subset
  (SURVEY.md §7 "what's hard" #2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airflow_baseball_spark.metrics import hitting


def hitter_metrics(hitters: DataFrame, league_runs: DataFrame | None = None) -> DataFrame:
    """hitters (schemas.HITTERS-shaped) → hitter_id + 5 base metrics.

    ``league_runs``: optional 1-row DataFrame with column ``lg_runs``
    (the reference takes league runs from game_records:
    ``SUM(away_score)+SUM(home_score)``, 012:20-34). Defaults to
    deriving it from hitters' ``runs`` column when absent.
    """
    with_woba = hitters.withColumn("wOBA", hitting.woba())

    league = with_woba.agg(
        F.avg("wOBA").alias("lg_woba"),      # AVG ignores NULLs (D2)
        F.avg("obp").alias("lg_obp"),
        F.avg("slg").alias("lg_slg"),
        F.sum("pa").alias("lg_pa"),
        F.sum("runs").alias("lg_runs_fallback"),
    )
    if league_runs is not None:
        league = league.crossJoin(F.broadcast(league_runs))
    else:
        league = league.withColumn("lg_runs", F.col("lg_runs_fallback"))
    league = league.withColumn(
        "woba_scale",
        hitting.woba_scale(F.col("lg_woba"), F.col("lg_obp"), F.col("lg_slg")),
    )

    joined = with_woba.crossJoin(F.broadcast(league))
    return joined.select(
        "hitter_id",
        "wOBA",
        hitting.wrc(
            F.col("wOBA"),
            F.col("pa"),
            F.col("lg_woba"),
            F.col("woba_scale"),
            F.col("lg_runs"),
            F.col("lg_pa"),
        ).alias("wRC"),
        hitting.k_rate().alias("k_rate"),
        hitting.bb_rate().alias("bb_rate"),
        hitting.babip().alias("babip"),
    )


def league_runs_from_games(game_records: DataFrame) -> DataFrame:
    """League runs scalar (012:20-48): SUM(away)+SUM(home) over games."""
    return game_records.agg(
        (F.sum("away_score") + F.sum("home_score")).alias("lg_runs")
    )


def park_adjusted_metrics(
    lineup: DataFrame,
    hitters: DataFrame,
    metrics: DataFrame,
    park_factor: DataFrame,
) -> DataFrame:
    """wRC+ / OPS+ for today's lineup hitters — reference DAG 041.

    Join semantics (SURVEY.md §2 C1/C2/C5):
    * lineup → hitters master: inner on (player_name, team_name) —
      unmatched lineup rows dropped (041:118-123 `continue`);
    * → metrics: inner-ish (skip on missing, 041:124-138);
    * → park_factor: broadcast left join with missing → 0.0
      (defaultdict(float), 041:19-31) which then NULLs the metrics via
      the zero guard (041:143-151).

    League scalars (lgwRC, lgPA, lgOBP, lgSLG) are computed over ALL
    hitters (041:33-64), not just the lineup.
    """
    league = (
        hitters.crossJoin(metrics.agg(F.sum("wRC").alias("lg_wrc")))
        .agg(
            F.first("lg_wrc").alias("lg_wrc"),
            F.sum("pa").alias("lg_pa"),
            F.avg("obp").alias("lg_obp"),
            F.avg("slg").alias("lg_slg"),
        )
    )

    batters = lineup.filter(F.col("position") != 0)  # B5
    joined = (
        batters.join(
            F.broadcast(hitters.select("hitter_id", "player_name", "team_name", "pa", "obp", "slg")),
            (batters.player == F.col("player_name"))
            & (batters.team == F.col("team_name")),
            "inner",
        )
        .join(F.broadcast(metrics.select("hitter_id", "wRC")), "hitter_id", "inner")
        .join(F.broadcast(park_factor), "stadium", "left")
        .withColumn("pf", F.coalesce("park_factor", F.lit(0.0)))  # C5 default
        .crossJoin(F.broadcast(league))
    )
    return joined.select(
        "hitter_id",
        hitting.wrc_plus(
            F.col("wRC"), F.col("pa"), F.col("lg_wrc"), F.col("lg_pa"), F.col("pf")
        ).alias("wRC_plus"),
        hitting.ops_plus(
            F.col("obp"), F.col("slg"), F.col("lg_obp"), F.col("lg_slg"), F.col("pf")
        ).alias("OPS_plus"),
    )
