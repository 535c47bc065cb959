"""Hitter metric formulas — column expressions over a hitters-shaped
DataFrame (SURVEY.md §2 F10-F12, F15, F16).

Each function takes/returns Columns so the caller controls guard
filters (B4 semantics: the reference *skips* rows with zero
denominators, leaving the metric NULL — in Spark, division by zero
already yields NULL, so the default behavior matches; explicit guard
filters are only needed when reproducing "row absent from upsert
batch" semantics).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def woba(
    bb: Column | str = "bb",
    ibb: Column | str = "ibb",
    hbp: Column | str = "hbp",
    hits: Column | str = "hits",
    doubles: Column | str = "doubles",
    triples: Column | str = "triples",
    hr: Column | str = "hr",
    sb: Column | str = "sb",
    cs: Column | str = "cs",
    pa: Column | str = "pa",
    sac: Column | str = "sac",
) -> Column:
    """wOBA (dags/011_calculate_hitter_wOBA.py:41-42)::

        ((0.7*(bb-ibb+hbp)) + 0.9*hits + 1.25*doubles + 1.6*triples
         + 2*hr + 0.25*sb - 0.5*cs) / (pa - ibb - sac)

    Zero denominator → NULL (reference skips the row, B4).
    """
    bb, ibb, hbp, hits = _c(bb), _c(ibb), _c(hbp), _c(hits)
    doubles, triples, hr = _c(doubles), _c(triples), _c(hr)
    sb, cs, pa, sac = _c(sb), _c(cs), _c(pa), _c(sac)
    num = (
        0.7 * (bb - ibb + hbp)
        + 0.9 * hits
        + 1.25 * doubles
        + 1.6 * triples
        + 2.0 * hr
        + 0.25 * sb
        - 0.5 * cs
    )
    denom = pa - ibb - sac
    return F.when(denom != 0, num / denom)


def woba_scale(lg_woba: Column, lg_obp: Column, lg_slg: Column) -> Column:
    """wOBA scale (dags/012_calculate_hitter_wRC.py:82)."""
    return (lg_woba - lg_obp) / (lg_slg - lg_obp)


def wrc(
    woba_col: Column,
    pa: Column,
    lg_woba: Column,
    scale: Column,
    lg_runs: Column,
    lg_pa: Column,
) -> Column:
    """wRC (dags/012_calculate_hitter_wRC.py:93)::

        ((wOBA - lgwOBA) / scale + lgR/lgPA) * pa
    """
    return ((woba_col - lg_woba) / scale + lg_runs / lg_pa) * pa


def k_rate(so: Column | str = "so", pa: Column | str = "pa") -> Column:
    """K% (dags/013_calculate_hitter_metrics.py:44); pa=0 → NULL."""
    so, pa = _c(so), _c(pa)
    return F.when(pa != 0, so / pa)


def bb_rate(bb: Column | str = "bb", pa: Column | str = "pa") -> Column:
    """BB% (dags/013_calculate_hitter_metrics.py:45); pa=0 → NULL."""
    bb, pa = _c(bb), _c(pa)
    return F.when(pa != 0, bb / pa)


def babip(
    hits: Column | str = "hits",
    hr: Column | str = "hr",
    ab: Column | str = "ab",
    so: Column | str = "so",
    sf: Column | str = "sf",
) -> Column:
    """BABIP (dags/013_calculate_hitter_metrics.py:46)::

        (hits - hr) / (ab - so - hr + sf)    # denom 0 → NULL (B4)
    """
    hits, hr, ab, so, sf = _c(hits), _c(hr), _c(ab), _c(so), _c(sf)
    denom = ab - so - hr + sf
    return F.when(denom != 0, (hits - hr) / denom)


def wrc_plus(
    wrc_col: Column,
    pa: Column,
    lg_wrc: Column,
    lg_pa: Column,
    park_factor: Column,
) -> Column:
    """wRC+ (dags/041_calculate_hitter_metrics_with_park_factor.py:143)::

        ((wRC / pa) / ((lgwRC / lgPA) / park_factor)) * 100

    ZeroDivision (pa=0 or park_factor=0, the defaultdict-0.0 path C5)
    → NULL, matching the reference's `wRC_plus = None` branch (:143-146).
    """
    return F.when(
        (pa != 0) & (park_factor != 0),
        (wrc_col / pa) / ((lg_wrc / lg_pa) / park_factor) * 100.0,
    )


def ops_plus(
    obp: Column,
    slg: Column,
    lg_obp: Column,
    lg_slg: Column,
    park_factor: Column,
) -> Column:
    """OPS+ (dags/041_calculate_hitter_metrics_with_park_factor.py:149)::

        (100 / park_factor) * (obp/lgOBP + slg/lgSLG - 1)

    Reference bug note (F16): on ZeroDivisionError the reference keeps
    the previous loop iteration's value (:150-151). We deviate to NULL
    (documented in SURVEY.md §7) — park_factor=0 → NULL here.
    """
    return F.when(
        park_factor != 0,
        (100.0 / park_factor) * (obp / lg_obp + slg / lg_slg - 1.0),
    )
