"""Unit pins for the min-of-2 bench ledger synthesis (r11 review:
the old implementation asserted set-equality of the two runs' query
maps, so a single transient per-run error crashed the synthesis after
both ~8-minute bench runs instead of being absorbed — absorbing
per-run transients is the protocol's entire premise)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from run_bench_ledger import synthesize


def _run(queries, total, errors=(), calib=(0.7, 0.7)):
    return {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
        "total_sec": total,
        "calib_start_sec": calib[0],
        "calib_end_sec": calib[1],
        "bench_errors": list(errors),
        "sf_echo": 0.1,
    }


def test_min_of_two_symmetric():
    led = synthesize(
        _run({"a": 1.0, "b": 5.0}, 6.0),
        _run({"a": 2.0, "b": 3.0}, 5.0),
    )
    assert led["queries"] == {"a": 1.0, "b": 3.0}
    assert led["total_sec"] == 4.0
    assert led["n_queries"] == 2
    assert led["bench_errors"] == []
    assert led["run_totals"] == [6.0, 5.0]


def test_asymmetric_error_degrades_gracefully():
    """'b' errored in run2 only: the ledger keeps run1's reading for
    it, the total stays complete, and the union records the error —
    no crash."""
    led = synthesize(
        _run({"a": 1.0, "b": 5.0}, 6.0),
        _run({"a": 2.0}, 2.0, errors=["b"]),
    )
    assert led["queries"] == {"a": 1.0, "b": 5.0}
    assert led["total_sec"] == 6.0
    assert led["bench_errors"] == ["b"]


def test_bench_order_preserved():
    """queries iterate in run1 (bench) order, run2-only names after —
    the ledger diffs round-over-round by position as well as name."""
    led = synthesize(
        _run({"x": 1.0, "y": 2.0, "z": 3.0}, 6.0),
        _run({"y": 1.0, "z": 1.0, "w": 4.0}, 6.0, errors=["x"]),
    )
    assert list(led["queries"]) == ["x", "y", "z", "w"]
