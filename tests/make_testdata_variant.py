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
          additionally gets deterministic sub-microsecond jitter
          (doc'd below) — exercises the nanosAsLong read path and
          ns->us truncation agreement for ALL tables, not just events
          (load_table's documented dual-generation handling)
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
    table: pa.Table, unit: str, tz: str | None, jitter_col: str | None
) -> pa.Table:
    for i, field in enumerate(table.schema):
        if pa.types.is_timestamp(field.type):
            target = pa.timestamp(unit, tz=tz)
            col = table.column(i)
            if unit == "ns" and jitter_col == field.name:
                # sub-us jitter: +(row_index*37 + 13) % 1000 ns,
                # deterministic and sub-microsecond so the us-truncated
                # values (what both engines should agree on) are
                # UNCHANGED — any query that flips under this jitter
                # is reading sub-us precision it should be truncating
                ns = pc.cast(
                    pc.cast(col, pa.timestamp("ns")), pa.int64()
                ).to_pylist()
                jit = pa.array(
                    [v + (i * 37 + 13) % 1000 for i, v in enumerate(ns)],
                    type=pa.int64(),
                )
                col = pc.cast(jit, pa.timestamp("ns", tz=tz))
            else:
                col = pc.cast(col, target)
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
