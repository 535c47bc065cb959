"""Golden formula tests on domain fixtures (FIXTURES.md §1) — tiny
hand-checkable inputs including every edge row the reference guards:
zero denominators (B4), '-' sentinels (F5), IP fractions (F6), missing
join partners (C2-C4), defaultdict-0.0 park factor (C5)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from airflow_baseball_spark.functions.scalar import ip_to_float, sentinel_to_double
from airflow_baseball_spark.pipelines.game_results import (
    five_inning_result,
    parse_game_records,
)
from airflow_baseball_spark.pipelines.hitter_metrics import (
    hitter_metrics,
    park_adjusted_metrics,
)
from airflow_baseball_spark.pipelines.park_factor import park_factor
from airflow_baseball_spark.pipelines.pitcher_metrics import pitcher_metrics


def approx(a, b, tol=1e-9):
    return a is not None and math.isclose(a, b, rel_tol=tol)


# --- park factor (D1+D4+F13) -------------------------------------------------


def test_park_factor_golden(spark):
    games = spark.createDataFrame(
        [
            ("A", 5, 3),
            ("A", 2, 2),
            ("B", 1, 0),
            ("C", 4, 6),
        ],
        "stadium string, home_score int, away_score int",
    )
    out = {r["stadium"]: r["park_factor"] for r in park_factor(games).collect()}
    assert approx(out["A"], 6.0 / (11.0 / 2))
    assert approx(out["B"], 1.0 / (22.0 / 3))
    assert approx(out["C"], 10.0 / (13.0 / 3))


# --- hitter metrics cascade (F10-F12, B4 guards, D2 NULL-ignoring) ------------

HITTER_COLS = (
    "hitter_id int, player_name string, team_name string, pa int, ab int, "
    "runs int, hits int, doubles int, triples int, hr int, sb int, cs int, "
    "sac int, sf int, bb int, ibb int, hbp int, so int, obp double, slg double"
)


def _hitters(spark):
    rows = [
        # normal row — golden wOBA target
        (1, "kim", "T1", 40, 35, 6, 10, 2, 1, 1, 2, 1, 2, 1, 4, 1, 1, 8, 0.35, 0.45),
        # pa - ibb - sac == 0 → wOBA NULL (011:36-38)
        (2, "lee", "T1", 3, 2, 0, 1, 0, 0, 0, 0, 0, 2, 0, 0, 1, 0, 1, 0.2, 0.2),
        # pa == 0 → K%/BB% NULL (013:39-40); NULL obp/slg (F5 '-')
        (3, "park", "T2", 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, None, None),
        # ab - so - hr + sf == 0 → BABIP NULL (013:41-42)
        (4, "choi", "T2", 12, 8, 1, 2, 0, 0, 1, 0, 0, 0, 1, 2, 0, 1, 8, 0.3, 0.4),
    ]
    return spark.createDataFrame(rows, HITTER_COLS)


def test_hitter_metrics_golden(spark):
    out = {r["hitter_id"]: r for r in hitter_metrics(_hitters(spark)).collect()}

    woba1 = (0.7 * (4 - 1 + 1) + 0.9 * 10 + 1.25 * 2 + 1.6 * 1 + 2 * 1 + 0.25 * 2 - 0.5 * 1) / (
        40 - 1 - 2
    )
    assert approx(out[1]["wOBA"], woba1)
    assert out[2]["wOBA"] is None  # zero wOBA denominator
    assert out[3]["k_rate"] is None and out[3]["bb_rate"] is None  # pa=0
    assert out[4]["babip"] is None  # zero BABIP denominator
    assert approx(out[1]["k_rate"], 8 / 40)
    assert approx(out[1]["bb_rate"], 4 / 40)
    assert approx(out[1]["babip"], (10 - 1) / (35 - 8 - 1 + 1))

    # wRC golden, replicating 012: league scalars over ALL hitters,
    # AVG ignoring NULL wOBA/obp/slg rows (D2)
    woba4 = (0.7 * (2 - 0 + 1) + 0.9 * 2 + 1.25 * 0 + 1.6 * 0 + 2 * 1 + 0.25 * 0 - 0.5 * 0) / (
        12 - 0 - 0
    )
    lg_woba = (woba1 + woba4) / 2  # rows 2,3 NULL-excluded
    lg_obp = (0.35 + 0.2 + 0.3) / 3
    lg_slg = (0.45 + 0.2 + 0.4) / 3
    lg_pa = 40 + 3 + 0 + 12
    lg_runs = 6 + 0 + 0 + 1
    scale = (lg_woba - lg_obp) / (lg_slg - lg_obp)
    wrc1 = ((woba1 - lg_woba) / scale + lg_runs / lg_pa) * 40
    assert approx(out[1]["wRC"], wrc1)


def test_park_adjusted_metrics_c5_default(spark):
    """Stadium absent from park_factor → factor 0.0 → NULL wRC+/OPS+
    (041:140-151); unmatched lineup player dropped (C1)."""
    hitters = _hitters(spark)
    metrics = hitter_metrics(hitters)
    lineup = spark.createDataFrame(
        [
            ("kim", "T1", 3, "T2", "S1"),
            ("choi", "T2", 5, "T1", "GHOST_PARK"),  # stadium missing from pf
            ("nobody", "T9", 4, "T1", "S1"),  # no master row → dropped
            ("kim", "T1", 0, "T2", "S1"),  # position 0 → pitcher, filtered
        ],
        "player string, team string, position int, opponent string, stadium string",
    )
    pf = spark.createDataFrame([("S1", 1.1)], "stadium string, park_factor double")
    out = {
        r["hitter_id"]: r
        for r in park_adjusted_metrics(lineup, hitters, metrics, pf).collect()
    }
    assert set(out) == {1, 4}
    assert out[4]["wRC_plus"] is None and out[4]["OPS_plus"] is None
    assert out[1]["wRC_plus"] is not None
    # OPS+ golden: (100/1.1) * (obp/lgOBP + slg/lgSLG - 1)
    lg_obp = (0.35 + 0.2 + 0.3) / 3
    lg_slg = (0.45 + 0.2 + 0.4) / 3
    assert approx(out[1]["OPS_plus"], (100.0 / 1.1) * (0.35 / lg_obp + 0.45 / lg_slg - 1.0))


# --- pitcher metrics (F6, F14, D3 skip-unparseable ERA) -----------------------


def test_pitcher_metrics_golden(spark):
    pitchers = spark.createDataFrame(
        [
            (1, "3.00", "5 2/3", 2, 10, 30),
            (2, "-", "2/3", 0, 3, 2),      # unparseable ERA → excluded from mean
            (3, "4.50", "5", 1, 4, 12),
            (4, "9.99", "0", 1, 1, 1),     # ip=0 → NULL metrics (B4)
        ],
        "pitcher_id int, era string, ip string, hr int, bb int, so int",
    )
    out = {r["pitcher_id"]: r for r in pitcher_metrics(pitchers).collect()}

    ip1, ip2, ip3, ip4 = 5 + 2 / 3, 2 / 3, 5.0, 0.0
    lg_era = (3.00 + 4.50 + 9.99) / 3  # '-' excluded (D3/D5)
    lg_hr, lg_bb, lg_so = 2 + 0 + 1 + 1, 10 + 3 + 4 + 1, 30 + 2 + 12 + 1
    lg_ip = ip1 + ip2 + ip3 + ip4
    c = lg_era - (13 * lg_hr + 3 * lg_bb - 2 * lg_so) / lg_ip

    assert approx(out[1]["fip"], (13 * 2 + 3 * 10 - 2 * 30) / ip1 + c)
    assert approx(out[1]["k_9"], 9 * 30 / ip1)
    assert approx(out[3]["bb_9"], 9 * 4 / ip3)
    assert out[4]["fip"] is None and out[4]["k_9"] is None  # ip=0


# --- scalar parsers (F1/F3/F5/F6/F9) ------------------------------------------


def test_ip_fraction_branches(spark):
    df = spark.createDataFrame(
        [("5 2/3",), ("2/3",), ("5",), ("0",), (None,)], "ip string"
    )
    vals = [r[0] for r in df.select(ip_to_float(F.col("ip"))).collect()]
    assert approx(vals[0], 5 + 2 / 3)
    assert approx(vals[1], 2 / 3)
    assert vals[2] == 5.0 and vals[3] == 0.0 and vals[4] is None


def test_sentinel_cast(spark):
    df = spark.createDataFrame([("-",), ("12.5",)], "v string")
    vals = [r[0] for r in df.select(sentinel_to_double(F.col("v"), scale=100.0)).collect()]
    assert vals[0] is None and approx(vals[1], 0.125)


def test_parse_game_records_and_sign(spark):
    raw = spark.createDataFrame(
        [
            ("05.21(수)", "18:30", "한화3vs5두산", "S1"),
            ("05.21(수)", "18:30", "경기취소", "S1"),  # no-match → dropped
        ],
        "date_str string, time_str string, score_str string, stadium string",
    )
    rows = parse_game_records(raw, 2025).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["away_team"] == "한화" and r["home_team"] == "두산"
    assert r["away_score"] == 3 and r["home_score"] == 5
    assert str(r["game_date"]) == "2025-05-21 18:30:00"

    partials = spark.createDataFrame(
        [
            ("g1", 1, 0, 0, 0, 0, 0, 0, 2, 0, 0),  # away 1, home 2 → 1
            ("g2", 1, 0, 0, 0, 0, 1, 0, 0, 0, 0),  # tie → 0
            ("g3", 3, 0, 0, 0, 0, 0, 0, 2, 0, 0),  # away leads → -1
        ],
        "game_date string, away_i1 int, away_i2 int, away_i3 int, away_i4 int,"
        " away_i5 int, home_i1 int, home_i2 int, home_i3 int, home_i4 int, home_i5 int",
    ).withColumn("away_team", F.lit("a")).withColumn("home_team", F.lit("h"))
    out = {r["game_date"]: r["result"] for r in five_inning_result(partials).collect()}
    assert out == {"g1": 1, "g2": 0, "g3": -1}
