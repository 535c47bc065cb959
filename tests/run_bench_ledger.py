"""Two-run local bench protocol (r10 verdict item #4).

Judge signal is now dominated by host transients: every round since r3
has re-litigated 2-4x spikes on untouched queries that a second run or
an isolated rep dissolves (PERF_NOTES.md r3/r4/r10). This runner makes
the hardening mechanical instead of narrative:

* runs ``bench.py`` twice back-to-back in fresh processes,
* writes both raw JSON lines (run1/run2 — committed alongside the
  ledger so any future reader can audit the synthesis),
* emits the LEDGER: per-query **min of the two runs**, total = sum of
  the mins, both runs' calib fields retained.

min-of-2 is the right estimator here because the noise is one-sided —
a neighbor-load transient only ever ADDS time — while the quantity the
ledger tracks is the engine's cost, not the host's. Caveat recorded in
the ledger ("protocol" field) and PERF_NOTES: a min-of-2 ledger reads
~2-5% below a single-run ledger even on a quiet box (first-run
cold-start asymmetry), so round-over-round comparisons must be
like-for-like (r11+ ledgers are min-of-2; r10 and earlier are
single-run — compare against the matching raw run when in doubt).

Usage:
    python tests/run_bench_ledger.py OUT_PREFIX
    # writes OUT_PREFIX_run1.json, OUT_PREFIX_run2.json, OUT_PREFIX.json
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def run_once(out_path: Path) -> dict:
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True,
        text=True,
        check=True,
    )
    # bench.py prints ONE JSON line on stdout (spark logs go to stderr)
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    out_path.write_text(line + "\n")
    return json.loads(line)



def synthesize(r1: dict, r2: dict) -> dict:
    """Build the min-of-2 ledger from two bench JSON objects.

    A per-run transient error leaves a name in only one run's query
    map (bench.py omits errored names and lists them in
    bench_errors). That is the exact event this protocol exists to
    absorb -- take the min where both runs have the name, the single
    successful reading otherwise, and let the bench_errors union
    record the transient (r11 review: the old `assert set equality`
    crashed after both ~8-minute runs on any asymmetric error).
    """
    q1, q2 = r1["queries"], r2["queries"]
    only = set(q1) ^ set(q2)
    if only:
        print(f"warn: present in one run only: {sorted(only)}", flush=True)
    names = list(q1) + [n for n in q2 if n not in q1]  # bench order
    qmin = {
        n: min(v for v in (q1.get(n), q2.get(n)) if v is not None)
        for n in names
    }
    total = round(sum(qmin.values()), 3)
    return {
        "metric": r1["metric"],
        "value": total,
        "unit": "sec",
        "queries": qmin,
        "sf": r1["sf"],
        "total_sec": total,
        "n_queries": len(qmin),
        "calib_start_sec": r1["calib_start_sec"],
        "calib_end_sec": r1["calib_end_sec"],
        "calib_run2_start_sec": r2["calib_start_sec"],
        "calib_run2_end_sec": r2["calib_end_sec"],
        "bench_errors": sorted(
            set(r1.get("bench_errors", [])) | set(r2.get("bench_errors", []))
        ),
        "sf_echo": r1.get("sf_echo", r1["sf"]),
        "protocol": "min-of-2 (runs committed as _run1/_run2; "
        "one-sided host-transient noise -- see PERF_NOTES r11)",
        "run_totals": [r1["total_sec"], r2["total_sec"]],
    }


def main() -> int:
    if len(sys.argv) != 2:
        print(__doc__)
        return 2
    prefix = Path(sys.argv[1])
    r1 = run_once(prefix.parent / (prefix.name + "_run1.json"))
    print(
        f"run1: total={r1['total_sec']} calib={r1['calib_start_sec']}/"
        f"{r1['calib_end_sec']}",
        flush=True,
    )
    r2 = run_once(prefix.parent / (prefix.name + "_run2.json"))
    print(
        f"run2: total={r2['total_sec']} calib={r2['calib_start_sec']}/"
        f"{r2['calib_end_sec']}",
        flush=True,
    )
    ledger = synthesize(r1, r2)
    (prefix.parent / (prefix.name + ".json")).write_text(
        json.dumps(ledger) + "\n"
    )
    print(f"ledger: total={ledger['total_sec']} n={ledger['n_queries']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
