"""Game-results parsing stages — reference DAGs 000 (nightly results)
and 070 (5-inning partials), minus the Playwright scraping (ingestion
lands raw rows to files; SURVEY.md §2 A1/A6: the engine's work starts
at the parsed-row boundary).

Input is a raw scrape-shaped DataFrame; output is the typed table. All
parsing is column expressions (F1/F3/F9)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from airflow_baseball_spark.functions.scalar import (
    game_sign,
    parse_game_datetime,
    parse_score_bundle,
    score_bundle_filter,
)


def parse_game_records(raw: DataFrame, year: int) -> DataFrame:
    """raw(date_str, time_str, score_str, stadium) → game_records rows.

    Non-matching score strings are dropped — the reference's regex
    no-match row skip (dags/000_scrape_games_result.py:93-97).
    """
    return raw.filter(score_bundle_filter(F.col("score_str"))).select(
        parse_game_datetime(F.col("date_str"), F.col("time_str"), year).alias(
            "game_date"
        ),
        *parse_score_bundle(F.col("score_str")),
        "stadium",
    )


def five_inning_result(partials: DataFrame) -> DataFrame:
    """Per-game sign of the through-5-innings score
    (dags/070_get_game_resulty.py:50-123): sum innings 1-5 per side,
    then away>home → -1, tie → 0, home>away → 1."""
    away = _inning_sum("away")
    home = _inning_sum("home")
    return partials.select(
        "game_date",
        "away_team",
        "home_team",
        away.alias("away_score_5"),
        home.alias("home_score_5"),
        game_sign(home, away).alias("result"),
    )


def _inning_sum(side: str) -> Column:
    return sum((F.col(f"{side}_i{i}") for i in range(2, 6)), F.col(f"{side}_i1"))
