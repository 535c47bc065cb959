"""Regenerate the driver testdata in alternate VINTAGES (r6 verdict
item #3) so the local oracle harness can measure what a different
driver-side generation would do to every query, instead of guessing.

Six r6 queries were driver-hash-red while bit-exact locally; the r6
judge concluded the divergence is environmental — "driver's testdata
generation (ns-precision timestamps beyond events, non-ASCII document
text) or engine builds". Each variant here reproduces one suspected
generation locally, byte-identical rows except for the one axis it
perturbs:

ns        every timestamp column re-typed timestamp[ns]; events.ts
          additionally gets deterministic sub-HALF-microsecond jitter
          (doc'd below) — exercises the nanosAsLong read path for ALL
          tables, not just events (load_table's documented
          dual-generation handling). Jitter is capped below 500 ns so
          the µs value is convention-independent (truncation and
          round-half-up agree), because the LOCAL DuckDB 1.0 scan
          truncates ns parquet to µs before any SQL runs — a ≥500 ns
          jitter under the engine's round-half-up read convention
          would measure the local DuckDB build, not the query surface
tzutc     every timestamp column tagged tz=UTC (isAdjustedToUTC) —
          with a non-UTC DuckDB session this shifts HOUR()/CAST AS
          DATE/date_diff/naive-literal comparisons (measured in the
          r7 probe experiments) while epoch_us stays put
nstz      both of the above
nonascii  documents.text decorated with deterministic non-ASCII
          suffixes (accents, CJK, emoji + ZWJ, combining marks)
          chosen by doc_id — flips any query whose Spark side works
          in BYTES while its oracle works in CHARS (the documented
          ASCII-parity contract of the multimodal family)
driverish r8 (r7 verdict item #4): a vintage tuned to reproduce the
          DRIVER environment's probe-red pattern locally. Spark-side
          files: ns-typed timestamps with FULL sub-µs jitter
          [0,1000) on events.ts and midnight-minus-epsilon values
          (−1..−499 ns on every 5th row) on l_shipdate/o_orderdate;
          3-decimal tie values (x.xx5) injected into every 7th row of
          the lineitem/orders/events doubles; non-ASCII text decor.
          A `_duck` SUBDIR holds the same tables with timestamps
          µs-ROUNDED (half-up) — run_oracle_check_variant registers
          DuckDB's views from it, emulating a DuckDB build whose ns
          scan ROUNDS to µs (the unique behavior consistent with the
          r7 driver reds; local DuckDB 1.0 truncates instead, so the
          emulation must happen at generation time). Acceptance per
          the verdict: the r7 trunc-convention probes go RED on this
          vintage pre-fix, and the six env-red queries are GREEN on
          it post-fix.

Usage:
    python tests/make_testdata_variant.py SRC_SF_DIR VARIANT [OUT_DIR]
e.g.
    python tests/make_testdata_variant.py /root/testdata/sf0.01 nstz

writes to /root/repo/testdata_variants/<basename(src)>_<variant>/.
Run the harness against it with tests/run_oracle_check_variant.py.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# deterministic non-ASCII decorations: 2-byte, 3-byte, 4-byte UTF-8,
# ZWJ sequence (grapheme != codepoints), combining mark
_DECOR = ["é", "漢字", "👍", "👩‍👩‍👧", "á", "ß∂"]


def _retype_ts(
    table: pa.Table,
    unit: str,
    tz: str | None,
    jitter_col: str | None,
    jitter_mod: int = 500,
    midnight_eps_cols: tuple[str, ...] = (),
) -> pa.Table:
    for i, field in enumerate(table.schema):
        if pa.types.is_timestamp(field.type):
            target = pa.timestamp(unit, tz=tz)
            col = table.column(i)
            if unit == "ns" and jitter_col == field.name:
                # sub-us jitter: +(row_index*37 + 13) % jitter_mod ns,
                # deterministic. jitter_mod=500 keeps the µs value
                # convention-independent (trunc == round-half-up);
                # jitter_mod=1000 (driverish) exercises the rounding
                # convention itself.
                ns = pc.cast(
                    pc.cast(col, pa.timestamp("ns")), pa.int64()
                ).to_pylist()
                jit = pa.array(
                    [
                        v + (i * 37 + 13) % jitter_mod
                        for i, v in enumerate(ns)
                    ],
                    type=pa.int64(),
                )
                col = pc.cast(jit, pa.timestamp("ns", tz=tz))
            elif unit == "ns" and field.name in midnight_eps_cols:
                # midnight-minus-epsilon: every 5th row moves 1..499 ns
                # BELOW its (midnight-aligned) stored value — under
                # truncation the µs value crosses into the previous
                # day; under round-half-up it rounds back to midnight.
                # This is the generation shape that makes BOTH r7
                # day-probes red under a trunc/round convention split.
                ns = pc.cast(
                    pc.cast(col, pa.timestamp("ns")), pa.int64()
                ).to_pylist()
                eps = pa.array(
                    [
                        v - ((i * 37 + 13) % 499 + 1) if i % 5 == 0 else v
                        for i, v in enumerate(ns)
                    ],
                    type=pa.int64(),
                )
                col = pc.cast(eps, pa.timestamp("ns", tz=tz))
            else:
                col = pc.cast(col, target)
            table = table.set_column(i, pa.field(field.name, col.type), col)
    return table


# doubles that the driver generation plausibly carries at 3+-decimal
# precision; every 7th row gets a deterministic x.xx5 tie value, the
# exact condition under which CAST(x AS DECIMAL(18,2)) diverges
# cross-engine (Spark shortest-string vs DuckDB binary rounding)
_TIE_COLS = {
    "lineitem": ("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
    "orders": ("o_totalprice",),
    "events": ("value",),
    "customer": ("c_acctbal",),
    "supplier": ("s_acctbal",),
    "part": ("p_retailprice",),
}


def _inject_ties(table: pa.Table, name: str) -> pa.Table:
    import math

    for cname in _TIE_COLS.get(name, ()):
        if cname not in table.schema.names:
            continue
        idx = table.schema.get_field_index(cname)
        vals = table.column(cname).to_pylist()
        out = [
            v
            if v is None or i % 7
            else math.floor(abs(v) * 100.0) / 100.0 + 0.005
            for i, v in enumerate(vals)
        ]
        table = table.set_column(
            idx, pa.field(cname, pa.float64()), pa.array(out, type=pa.float64())
        )
    return table


def _round_ts_to_us(table: pa.Table) -> pa.Table:
    """µs-ROUNDED (half-up) copy of every timestamp column — the DuckDB
    side of the driverish vintage (emulates a rounding ns scan)."""
    for i, field in enumerate(table.schema):
        if pa.types.is_timestamp(field.type):
            ns = pc.cast(
                pc.cast(table.column(i), pa.timestamp("ns")), pa.int64()
            ).to_pylist()
            us = pa.array(
                [None if v is None else (v + 500) // 1000 for v in ns],
                type=pa.int64(),
            )
            col = pc.cast(us, pa.timestamp("us"))
            table = table.set_column(i, pa.field(field.name, col.type), col)
    return table


def _decorate_text(table: pa.Table) -> pa.Table:
    idx = table.schema.get_field_index("text")
    texts = table.column("text").to_pylist()
    ids = table.column("doc_id").to_pylist()
    out = [
        (t or "") + _DECOR[int(d) % len(_DECOR)] for t, d in zip(texts, ids)
    ]
    tbl = table.set_column(idx, "text", pa.array(out, type=pa.string()))
    # n_chars ships precomputed in the base generation; keep it
    # consistent with the decorated text (codepoint count)
    if "n_chars" in tbl.schema.names:
        ni = tbl.schema.get_field_index("n_chars")
        tbl = tbl.set_column(
            ni, "n_chars", pa.array([len(t) for t in out], type=pa.int64())
        )
    return tbl


def make_variant(src: str, variant: str, out_dir: str | None = None) -> str:
    src_p = Path(src)
    if out_dir is None:
        out_dir = str(
            Path("/root/repo/testdata_variants") / f"{src_p.name}_{variant}"
        )
    out_p = Path(out_dir)
    out_p.mkdir(parents=True, exist_ok=True)
    if variant == "driverish":
        duck_p = out_p / "_duck"
        duck_p.mkdir(parents=True, exist_ok=True)
        for name in TABLES:
            f = src_p / f"{name}.parquet"
            if not f.exists():
                continue
            table = pq.read_table(f)
            table = _inject_ties(table, name)
            if name == "documents":
                table = _decorate_text(table)
            eps_cols = {
                "lineitem": ("l_shipdate",),
                "orders": ("o_orderdate",),
            }.get(name, ())
            spark_side = _retype_ts(
                table,
                "ns",
                None,
                jitter_col="ts" if name == "events" else None,
                jitter_mod=1000,
                midnight_eps_cols=eps_cols,
            )
            pq.write_table(spark_side, out_p / f"{name}.parquet")
            pq.write_table(_round_ts_to_us(spark_side), duck_p / f"{name}.parquet")
        return str(out_p)
    unit, tz, decorate = {
        "ns": ("ns", None, False),
        "tzutc": ("us", "UTC", False),
        "nstz": ("ns", "UTC", False),
        "nonascii": (None, None, True),
    }[variant]
    for name in TABLES:
        f = src_p / f"{name}.parquet"
        if not f.exists():
            continue
        table = pq.read_table(f)
        if unit is not None:
            table = _retype_ts(
                table,
                unit,
                tz,
                jitter_col="ts" if name == "events" else None,
            )
        if decorate and name == "documents":
            table = _decorate_text(table)
        pq.write_table(table, out_p / f"{name}.parquet")
    return str(out_p)


if __name__ == "__main__":
    src = sys.argv[1]
    variant = sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else None
    print(make_variant(src, variant, out))
