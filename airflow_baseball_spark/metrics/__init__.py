"""Sabermetric formula library (SURVEY.md §2 F10-F16) as pure column
expressions, plus the league-scalar aggregations they depend on."""

from airflow_baseball_spark.metrics.hitting import (
    babip,
    bb_rate,
    k_rate,
    ops_plus,
    woba,
    wrc,
    wrc_plus,
)
from airflow_baseball_spark.metrics.pitching import bb9, fip, fip_constant, hr9, k9

__all__ = [
    "babip",
    "bb_rate",
    "k_rate",
    "ops_plus",
    "woba",
    "wrc",
    "wrc_plus",
    "bb9",
    "fip",
    "fip_constant",
    "hr9",
    "k9",
]
