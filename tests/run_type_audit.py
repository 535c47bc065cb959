"""One-shot dtype-pair audit of every registered query (r9).

For each of the 559 (Spark query, DuckDB oracle) pairs, compare the
SPARK result schema (analysis only — no job, except queries that
collect during plan construction) against the DUCK oracle's DESCRIBE
types, under the r9 driver-fetch model measured from four rounds of
driver windows (CORRECTNESS_r05..r08 — 60/60 HUGEINT-emitting oracles
red, 0 greens among them; see PERF_NOTES.md r9 entry):

* duck HUGEINT/UHUGEINT   -> pandas float64 ("6.0")  != spark long ("6")  RED
* duck DECIMAL(p,s)       -> pandas float64          == spark DOUBLE iff
  the decimal is a faithful rendering of the same value (literal rule:
  nearest-float64 of the same decimal string) — SAFE vs double, RED
  risk vs spark DecimalType (str '1.50' vs '1.5')
* everything else int-like/float/string/ts            SAFE

Emits one line per suspicious column pair; exit 0 always (report tool).

Usage: python tests/run_type_audit.py [sf_dir] [> TYPE_AUDIT_r9.txt]
"""

from __future__ import annotations

import sys
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from airflow_baseball_spark import registry  # noqa: E402
from airflow_baseball_spark.session import get_spark  # noqa: E402
from tests.oracle_harness import duckdb_connect  # noqa: E402

# Adjudicated (name, column) pairs: flagged shapes proven safe by a
# live driver window, annotated so the audit reads 0 unadjudicated
# flags (r10 verdict item #7). benford_p is a DECIMAL(7,6) literal
# ratio vs spark double — the exact shape driver-attested green twice
# (benford_digits itself r5, group_sequential_obf r10): DuckDB's
# dtype-preserving fetch renders the DECIMAL literal as the
# nearest-float64 of the same decimal string, identical to the Spark
# double.
ADJUDICATED: dict[tuple[str, str], str] = {
    ("benford_digits", "benford_p"): "driver-green r5; same shape "
    "group_sequential_obf driver-green r10",
}


def spark_kind(dt: str) -> str:
    d = dt.lower()
    if d.startswith("decimal"):
        return "decimal:" + d
    if d in ("bigint", "int", "smallint", "tinyint", "long", "integer"):
        return "int"
    if d in ("double", "float"):
        return "float"
    if d.startswith("timestamp"):
        return "timestamp"
    return d


def duck_kind(dt: str) -> str:
    d = dt.upper()
    if d in ("HUGEINT", "UHUGEINT"):
        return "hugeint"
    if d.startswith("DECIMAL"):
        return "decimal:" + d.lower()
    if d in ("BIGINT", "INTEGER", "SMALLINT", "TINYINT", "UBIGINT", "UINTEGER"):
        return "int"
    if d in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if d.startswith("TIMESTAMP"):
        return "timestamp"
    if d == "VARCHAR":
        return "string"
    return d.lower()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="type_audit")
    con = duckdb_connect(sf_dir)
    qs = registry.queries()
    sqls = registry.oracle_sql()
    n_flagged = 0
    for name, fn in qs.items():
        sql = sqls.get(name)
        if sql is None:
            continue
        try:
            sdf = fn(spark, sf_dir)
            stypes = {f.name: spark_kind(f.dataType.simpleString()) for f in sdf.schema.fields}
        except Exception:
            print(f"{name}: SPARK-BUILD-ERROR")
            traceback.print_exc(limit=2)
            continue
        try:
            desc = con.execute("DESCRIBE " + sql).fetchall()
        except Exception as e:
            print(f"{name}: DUCK-DESCRIBE-ERROR {str(e)[:100]}")
            continue
        dtypes = {c: duck_kind(t) for c, t, *_ in desc}
        if set(stypes) != set(dtypes):
            print(f"{name}: COLUMN-SET {sorted(stypes)} vs {sorted(dtypes)}")
            n_flagged += 1
            continue
        for c in stypes:
            sk, dk = stypes[c], dtypes[c]
            if sk == dk:
                continue
            if sk == "int" and dk == "int":
                continue
            sev = None
            if dk == "hugeint":
                sev = "RED(hugeint)"
            elif dk.startswith("decimal") and sk == "float":
                sev = "review(decimal-vs-double: literal rule usually safe)"
            elif sk.startswith("decimal") and dk.startswith("decimal"):
                sev = "review(decimal-vs-decimal: spark Decimal str vs duck float64)"
            elif sk.startswith("decimal") or dk.startswith("decimal"):
                sev = "RED-RISK(decimal-vs-" + (dk if sk.startswith("decimal") else sk) + ")"
            elif {sk, dk} == {"int", "float"}:
                sev = "RED-RISK(int-vs-float: '6' vs '6.0')"
            else:
                sev = f"review({sk}-vs-{dk})"
            if (name, c) in ADJUDICATED:
                print(
                    f"{name}.{c}: spark={sk} duck={dk} -> "
                    f"ADJUDICATED({ADJUDICATED[(name, c)]})"
                )
                continue
            print(f"{name}.{c}: spark={sk} duck={dk} -> {sev}")
            n_flagged += 1
    print(f"TOTAL unadjudicated flags: {n_flagged}")


if __name__ == "__main__":
    main()
