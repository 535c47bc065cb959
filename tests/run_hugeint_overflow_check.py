"""Overflow proof for the registry's HUGEINT→BIGINT oracle rewrite
(r9 ADVICE item #3).

`registry._debigint_oracle` wraps every HUGEINT output column in
`CAST(c AS BIGINT)`. DuckDB's CAST raises on overflow rather than
wrapping, so if any rewritten integer SUM legitimately exceeded 2^63
the oracle would become a runtime ERROR at the driver. The house
style keeps every integer surface < 2^63 by construction (mod-prime
checksums, micro/cent quantization), but that invariant was only
documented — this script ENFORCES it by executing every rewritten
oracle and reporting the worst |value|/2^63 headroom of every BIGINT
output column, so a future emitter trending toward the edge is
visible before it overflows.

Default SF is 0.01 — the scale the driver actually runs correctness
at, so "no CAST error here" is literally the driver-facing guarantee.
Measured headroom at sf0.01 is ≥12 orders of magnitude on every
column (OVERFLOW_r10.txt) and integer-SUM surfaces grow ~linearly in
SF, so larger SFs add no information; running at sf0.1 is possible
but gated by ORACLE-side cost (harmonic_centrality's recursive CTE
spills tens of GB of DuckDB temp at sf0.1 — the Spark side is fine,
the check just doesn't need that scale).

Usage:
    python tests/run_hugeint_overflow_check.py [sf_dir]

Prints one line per rewritten oracle and a final ALL OK / FAIL
summary; exits non-zero on any execution error (overflow included).
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from tests.oracle_harness import duckdb_connect

from airflow_baseball_spark import registry

LIMIT = 2**63


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sqls = registry.oracle_sql()
    raw = registry.oracle_sql(raw=True)
    rewritten = {n: s for n, s in sqls.items() if s != raw.get(n)}
    print(
        f"{len(rewritten)} rewritten oracles (of {len(sqls)}) at {sf_dir}"
    )
    if registry._DEBIGINT_DESCRIBE_FAILURES:
        print("DESCRIBE FAILURES:", registry._DEBIGINT_DESCRIBE_FAILURES)
        return 1
    con = duckdb_connect(sf_dir)
    failures = []
    worst = (0.0, "")  # (|value|/2^63, "name.col")
    for name, sql in sorted(rewritten.items()):
        try:
            desc = con.execute("DESCRIBE " + sql).fetchall()
            bigint_cols = [c for c, t, *_ in desc if t == "BIGINT"]
            rows = con.execute(sql).fetchall()
        except Exception as exc:  # CAST overflow lands here
            failures.append((name, str(exc).splitlines()[0]))
            print(f"FAIL {name}: {str(exc).splitlines()[0]}")
            continue
        cols = [c for c, *_ in desc]
        peak = 0
        for row in rows:
            for c, v in zip(cols, row):
                if c in bigint_cols and isinstance(v, int):
                    peak = max(peak, abs(v))
        frac = peak / LIMIT
        if frac > worst[0]:
            worst = (frac, name)
        flag = " !! <10x headroom" if frac > 0.1 else ""
        print(f"ok   {name}: {len(rows)} rows, peak |int| = {peak:.3e} "
              f"({frac:.2e} of 2^63){flag}")
    print(
        f"\nworst headroom: {worst[1]} at {worst[0]:.2e} of 2^63"
        if worst[1]
        else "\nno integer outputs observed"
    )
    if failures:
        print(f"FAIL: {len(failures)} oracles errored")
        return 1
    print(f"ALL OK ({len(rewritten)} rewritten oracles executed)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
