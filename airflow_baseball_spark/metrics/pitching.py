"""Pitcher metric formulas (SURVEY.md §2 F14) — column expressions.

The reference computes these in a Python loop over all pitchers with a
manual accumulator for league totals
(dags/021_calculate_pitcher_metrics.py:43-86); here league totals are a
single aggregation cross-joined back (C6) and the per-pitcher formulas
are plain arithmetic. ip arrives as a fraction string — parse with
functions.scalar.ip_to_float first.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fip_constant(
    lg_era: Column, lg_hr: Column, lg_bb: Column, lg_so: Column, lg_ip: Column
) -> Column:
    """FIP constant (021:66)::

        c = lgERA - (13*lgHR + 3*lgBB - 2*lgSO) / lgIP
    """
    return lg_era - (13.0 * lg_hr + 3.0 * lg_bb - 2.0 * lg_so) / lg_ip


def fip(hr: Column, bb: Column, so: Column, ip: Column, const: Column) -> Column:
    """FIP (021:83); ip=0 → NULL (B4 guard, 021:81-82)."""
    return F.when(ip != 0, (13.0 * hr + 3.0 * bb - 2.0 * so) / ip + const)


def k9(so: Column, ip: Column) -> Column:
    """K/9 (021:84); ip=0 → NULL."""
    return F.when(ip != 0, 9.0 * so / ip)


def bb9(bb: Column, ip: Column) -> Column:
    """BB/9 (021:85); ip=0 → NULL."""
    return F.when(ip != 0, 9.0 * bb / ip)


def hr9(hr: Column, ip: Column) -> Column:
    """HR/9 (021:86); ip=0 → NULL."""
    return F.when(ip != 0, 9.0 * hr / ip)
