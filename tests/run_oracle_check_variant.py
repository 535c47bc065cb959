"""Full-surface oracle differential against a testdata VARIANT (r6
verdict item #3): regenerate the parquet in an alternate vintage
(tests/make_testdata_variant.py), optionally run the DuckDB side under
a hostile session timezone, and report every query whose Spark/DuckDB
agreement breaks — i.e. measure, on this machine, exactly which
queries a driver-side generation difference would flip.

Usage:
    python tests/run_oracle_check_variant.py VARIANT \
        [--src /root/testdata/sf0.01] [--duck-tz America/New_York] \
        [--names q1 q2 ...]

Exit 0 when every compared query matches; failures are listed with
their first value diffs. Known-contract exceptions (queries whose
docstrings pin an ASCII-only parity contract) are reported in a
separate section rather than silently excused.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

# Queries whose ORACLE mirrors byte-level Python over CHAR-level SQL
# under a documented ASCII-parity contract (multimodal family header):
# expected to diverge under the nonascii vintage, by design.
ASCII_CONTRACT = {
    "media_metadata",
    "media_decode",
    "media_byte_histogram",
    "media_frame_sample",
    "media_resize",
    "media_neardup",
    "media_dedup_savings",
    "aspect_bucket",
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "variant", choices=["ns", "tzutc", "nstz", "nonascii", "driverish"]
    )
    ap.add_argument("--src", default="/root/testdata/sf0.01")
    ap.add_argument("--duck-tz", default=None)
    ap.add_argument("--names", nargs="*", default=None)
    ap.add_argument(
        "--sim",
        action="store_true",
        help="use the dtype-sensitive driver-fetch comparator "
        "(tests/driver_sim.compare_driverish) instead of fetchall — "
        "hostile vintage x driver fetch model, the harshest local gate",
    )
    args = ap.parse_args()

    from make_testdata_variant import make_variant

    sf_dir = make_variant(args.src, args.variant)
    print(f"variant data: {sf_dir}", flush=True)

    from oracle_harness import compare, duckdb_connect


    import __spark_entry__ as e
    from airflow_baseball_spark.session import get_spark

    spark = get_spark(app_name=f"variant-{args.variant}")
    # driverish vintage ships a `_duck` subdir: the same tables with
    # timestamps µs-ROUNDED, emulating a DuckDB build whose ns parquet
    # scan rounds (local DuckDB 1.0 truncates, so the rounding driver
    # environment can only be reproduced at generation time)
    duck_dir = sf_dir
    if (Path(sf_dir) / "_duck").is_dir():
        duck_dir = str(Path(sf_dir) / "_duck")
        print(f"duckdb reads emulated-scan copies: {duck_dir}", flush=True)
    con = duckdb_connect(duck_dir)
    if args.duck_tz:
        con.execute(f"SET TimeZone='{args.duck_tz}'")
        print(f"duckdb session TimeZone={args.duck_tz}", flush=True)

    if args.sim:
        from driver_sim import compare_driverish as compare  # noqa: F811

        print("comparator: dtype-sensitive driver-fetch sim", flush=True)

    qs, sqls = e.queries(), e.oracle_sql()
    names = args.names or list(qs)
    bad, contract, probes_red = [], [], []
    for name in names:
        if name not in sqls:
            continue
        try:
            rep = compare(fn_df := qs[name](spark, sf_dir), con, sqls[name])
        except Exception as exc:  # driver-style: an error is a failure
            print(f"{name}: ERROR {type(exc).__name__}: {exc}", flush=True)
            (contract if name in ASCII_CONTRACT else bad).append(name)
            continue
        ok = (
            rep["values_match"]
            and rep["columns_match"]
            and rep["rowcount_match"]
        )
        if ok:
            print(f"{name}: OK", flush=True)
        elif name.startswith("probe_"):
            # probes are the instrument panel: they read the RAW views
            # on purpose, so under a hostile vintage a red probe is a
            # correct MEASUREMENT of the divergence mechanism, not a
            # query bug (probe_dec_cast is even the designed positive
            # control on tie vintages) — report, don't fail
            print(f"{name}: PROBE-RED {rep.get('first_diffs', rep)}", flush=True)
            probes_red.append(name)
        else:
            tag = "CONTRACT" if name in ASCII_CONTRACT else "FAIL"
            print(f"{name}: {tag} {rep.get('first_diffs', rep)}", flush=True)
            (contract if name in ASCII_CONTRACT else bad).append(name)
    print(
        f"\nchecked={len(names)} fail={len(bad)} contract={len(contract)}"
        f" probes_red={len(probes_red)}"
    )
    if contract:
        print("ascii-contract divergences (documented):", contract)
    if probes_red:
        print("probe readings (instrument panel, informational):", probes_red)
    if bad:
        print("FAILURES:", bad)
        return 1
    print("ALL OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
