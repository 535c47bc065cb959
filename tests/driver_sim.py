"""Dtype-sensitive driver-fetch simulation (r9).

Four rounds of driver windows (r5-r8) split EXACTLY on one predicate:
an oracle whose output contains a DuckDB HUGEINT column is hash-red,
everything else is hash-green (200 window rows, 21 HUGEINT samples,
zero exceptions — see PERF_NOTES.md r9). The only mechanism consistent
with that split is a dtype-sensitive oracle fetch: pandas/arrow have
no int128, so DuckDB renders HUGEINT as float64 ("6.0") while Spark's
BIGINT collects as a Python int ("6"). The local harness's fetchall
path (tests/oracle_harness.compare) converts HUGEINT to exact Python
ints, which is why four rounds of full local sweeps could not
reproduce the reds.

This module is the missing local instrument: `compare_driverish`
fetches the DuckDB side via `.df()` (dtype-preserving, like the
driver) and normalizes cells WITHOUT cross-dtype coercion, so
int64-vs-float64 splits fail here exactly as they fail in the driver
window. Timestamps/dates are canonicalized to one textual form on
both sides — driver-green queries with calendar outputs prove the
driver does not split on those, so the sim must not either.

Validated in r9 (tests/test_driver_sim.py + DRIVER_SIM_r9.txt):
* raw (pre-fix) oracles at sf0.01 reproduce all 19 r8 driver reds
  and keep all 31 greens green — the first local reproduction of a
  driver red in five rounds;
* wrapped (post-fix) oracles go 50/50 green on the same window.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import pandas as pd


def _canon_ts(v) -> str:
    if isinstance(v, _dt.datetime):
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, _dt.date):
        return _dt.datetime(v.year, v.month, v.day).isoformat(
            sep=" ", timespec="microseconds"
        )
    return str(v)


def norm_cell_driverish(v) -> str:
    """Dtype-sensitive normalization: ints and floats DO NOT unify
    (that is the whole point — the driver's hash distinguishes them),
    but temporal types canonicalize (driver-green calendar outputs
    prove the driver does not split on date-vs-timestamp rendering)."""
    if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        return _canon_ts(v.to_pydatetime())
    if isinstance(v, (_dt.datetime, _dt.date)):
        return _canon_ts(v)
    if isinstance(v, Decimal):
        # both engines hand decimals across as exact scaled values;
        # the driver-attested benford_digits green (duck DECIMAL(7,6)
        # literal vs spark DOUBLE) pins the float64 rendering
        return repr(float(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        return repr(v)
    if hasattr(v, "item") and type(v).__module__ == "numpy":
        return norm_cell_driverish(v.item())
    if isinstance(v, int):
        return str(v)
    return str(v)


def canonical_rows_driverish(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(norm_cell_driverish(r[i]) for i in order) for r in rows]
    out.sort()
    return [columns[i] for i in order], out


_INT_FAMILY = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}


def compare_driverish(spark_df, con, sql: str) -> dict:
    """Like oracle_harness.compare, but the DuckDB side goes through
    the dtype-preserving pandas fetch (`.df()`) — the driver model.

    Nullable-int refinement (pinned by the r8 window itself):
    `accumulating_snapshot` is driver-GREEN with nullable BIGINT
    output columns, which pandas renders as float64 — so the driver's
    fetch preserves declared integer columns through NULLs (a
    fetchnumpy/arrow-style masked fetch), while HUGEINT — for which
    no 64-bit integer container exists — degrades to float and splits
    the hash. The sim therefore renders a float cell as an integer
    when the column's DECLARED DuckDB type is 64-bit-or-smaller
    integer, and keeps the float rendering for HUGEINT."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(sql)
    pdf = res.df()
    decl = {c: t for c, t, *_ in con.execute("DESCRIBE " + sql).fetchall()}
    d_cols = list(pdf.columns)
    d_rows = [tuple(rec) for rec in pdf.itertuples(index=False, name=None)]
    int_cols = [i for i, c in enumerate(d_cols) if decl.get(c) in _INT_FAMILY]
    if int_cols:
        fixed = []
        for row in d_rows:
            row = list(row)
            for i in int_cols:
                v = row[i]
                if isinstance(v, float) and not math.isnan(v):
                    row[i] = int(v)
            fixed.append(tuple(row))
        d_rows = fixed

    sc, sr = canonical_rows_driverish(s_cols, s_rows)
    dc, dr = canonical_rows_driverish(d_cols, d_rows)
    report = {
        "rowcount_match": len(sr) == len(dr),
        "columns_match": sc == dc,
        "values_match": sr == dr,
        "spark_rows": len(sr),
        "duck_rows": len(dr),
        "spark_cols": sc,
        "duck_cols": dc,
    }
    if not report["values_match"] and report["rowcount_match"] and report["columns_match"]:
        report["first_diffs"] = [(a, b) for a, b in zip(sr, dr) if a != b][:5]
    return report
