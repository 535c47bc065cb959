"""Unit tests for the round-2 LLM-pipeline / lifecycle operators:
PII redaction, SCD2, sequence packing, int8 quantization, and the G3
event-time trigger."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from airflow_baseball_spark.operators.scd import scd2
from airflow_baseball_spark.pipelines.orchestration import event_time_triggers
from airflow_baseball_spark.text import pii
from airflow_baseball_spark.text.packing import pack_blocks
from airflow_baseball_spark.text.quantize import quantize_int8


def test_pii_redact_classes(spark):
    df = spark.createDataFrame(
        [Row(t="mail a@b.io or call 010-1234-5678 via https://x.io/p?u=c@d.com")]
    )
    out = df.select(
        pii.redact(F.col("t")).alias("r"),
        pii.pii_count(F.col("t"), "email").alias("ne"),
        pii.pii_count(F.col("t"), "phone").alias("np"),
        pii.pii_count(F.col("t"), "url").alias("nu"),
    ).first()
    assert out.r == "mail [PII] or call [PII] via [PII]"
    # the URL swallows its embedded address only in redaction order;
    # counts are per-class on the raw text
    assert (out.ne, out.np, out.nu) == (2, 1, 1)


def test_scd2_runs_and_intervals(spark):
    rows = [
        (1, "a", 10, 1),
        (1, "a", 20, 2),
        (1, "b", 30, 3),
        (1, "a", 40, 4),
        (2, "x", 10, 5),
    ]
    df = spark.createDataFrame(rows, "k INT, v STRING, ts INT, id INT")
    out = {
        (r.k, r.version_n): (r.v, r.valid_from, r.valid_to)
        for r in scd2(df, "k", "v", "ts", "id").collect()
    }
    assert out[(1, 1)] == ("a", 10, 30)
    assert out[(1, 2)] == ("b", 30, 40)
    assert out[(1, 3)] == ("a", 40, None)  # open current version
    assert out[(2, 1)] == ("x", 10, None)


def test_pack_blocks_offsets_and_spans(spark):
    # one shard (shards=1): stream is doc_id order; block=4 tokens
    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "d e f"), (2, "g"), (3, "h i j k l")],
        "doc_id LONG, text STRING",
    )
    got = {
        r.doc_id: (r.start_offset, r.first_block, r.last_block, r.blocks_spanned)
        for r in pack_blocks(docs, block_tokens=4, shards=1).collect()
    }
    assert got[0] == (0, 0, 0, 1)  # tokens 0-2
    assert got[1] == (3, 0, 1, 2)  # tokens 3-5 straddles block edge
    assert got[2] == (6, 1, 1, 1)
    assert got[3] == (7, 1, 2, 2)  # tokens 7-11
    # sharding keeps ids deterministic: same doc -> same shard always
    two = pack_blocks(docs, block_tokens=4, shards=2)
    assert {r.shard for r in two.filter("doc_id = 3").collect()} == {1}


def test_quantize_int8_bounds_and_zero_vector(spark):
    df = spark.createDataFrame(
        [(0, [1.0, -2.0, 0.5]), (1, [0.0, 0.0, 0.0])],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    out = {r.vec_id: r for r in quantize_int8(df).collect()}
    assert out[0].q == [64, -127, 32]  # floor(x*63.5+0.5)
    assert max(abs(v) for v in out[0].q) <= 127
    assert out[1].scale == 0.0 and out[1].q == [0, 0, 0]


def test_event_triggers_due_and_idempotent(spark):
    games = spark.createDataFrame(
        [
            ("2024-01-01 18:00:00", "A"),
            ("2024-01-01 18:00:00", "B"),  # same time -> one trigger
            ("2024-01-02 18:00:00", "A"),
        ],
        "game_time STRING, away_team STRING",
    ).withColumn("game_time", F.col("game_time").cast("timestamp"))
    trig = event_time_triggers(games, run_ts="2024-01-01 18:00:00")
    rows = trig.collect()
    assert len(rows) == 2  # deduped on trigger_time
    due = {str(r.trigger_time): r.due for r in rows}
    assert due["2024-01-01 17:45:00"] is True
    assert due["2024-01-02 17:45:00"] is False
    # DagRun.find analog: already-scheduled times drop out
    again = event_time_triggers(
        games, run_ts="2024-01-01 18:00:00", already_scheduled=trig
    )
    assert again.count() == 0


def test_gap_fill_densifies_and_carries_forward(spark):
    from airflow_baseball_spark.operators.gapfill import gap_fill

    df = spark.createDataFrame(
        [(1, "2024-01-01", 5.0), (1, "2024-01-04", 7.0), (2, "2024-01-02", 1.0)],
        "k INT, d STRING, v DOUBLE",
    ).withColumn("d", F.col("d").cast("date"))
    out = {
        (r.k, str(r.d)): (r.v, r.was_present)
        for r in gap_fill(df, "k", "d", ["v"]).collect()
    }
    assert len(out) == 5  # key 1: 4 days, key 2: 1 day
    assert out[(1, "2024-01-01")] == (5.0, True)
    assert out[(1, "2024-01-02")] == (5.0, False)  # carried forward
    assert out[(1, "2024-01-03")] == (5.0, False)
    assert out[(1, "2024-01-04")] == (7.0, True)


def test_snapshot_diff_classifies(spark):
    from airflow_baseball_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k INT, v DOUBLE"
    )
    new = spark.createDataFrame(
        [(1, 10.0), (2, 25.0), (4, 40.0)], "k INT, v DOUBLE"
    )
    out = {r.k: r.change_type for r in snapshot_diff(old, new, ["k"]).collect()}
    assert out == {1: "unchanged", 2: "updated", 3: "deleted", 4: "inserted"}
    # values come from the surviving side
    vals = {r.k: r.v for r in snapshot_diff(old, new, ["k"]).collect()}
    assert vals[2] == 25.0 and vals[3] == 30.0 and vals[4] == 40.0


def test_snapshot_diff_all_null_keys(spark):
    """A row whose keys are all NULL matches null-safely across
    snapshots — presence must come from side markers, not key
    null-ness, or it misclassifies as inserted+deleted."""
    from airflow_baseball_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame([(None, 10.0), (1, 1.0)], "k INT, v DOUBLE")
    new = spark.createDataFrame([(None, 11.0), (1, 1.0)], "k INT, v DOUBLE")
    out = {r.k: r.change_type for r in snapshot_diff(old, new, ["k"]).collect()}
    assert out == {None: "updated", 1: "unchanged"}


def test_profile_table_native_type_minmax(spark):
    from airflow_baseball_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [(9, "b"), (10, None), (100, "a")], "n INT, s STRING"
    )
    out = {r.column_name: r for r in profile_table(df, ["n", "s"]).collect()}
    # numeric min/max, not lexicographic ('10' < '9' as strings)
    assert (out["n"].min_val, out["n"].max_val) == ("9", "100")
    assert out["n"].n_nonnull == 3 and out["n"].n_distinct == 3
    assert out["s"].n_nonnull == 2 and out["s"].n_distinct == 2
    assert (out["s"].min_val, out["s"].max_val) == ("a", "b")


def test_quantize_dequantize_error_bound(spark):
    """|q/scale − x| ≤ 0.5/scale for every element (the int8 contract)."""
    import math
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-5, 5) for _ in range(16)]) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    out = quantize_int8(df).collect()
    orig = {r[0]: r[1] for r in rows}
    for r in out:
        if r.scale == 0.0:
            continue
        for q, x in zip(r.q, orig[r.vec_id]):
            assert abs(q / r.scale - x) <= 0.5 / r.scale + 1e-6
            assert abs(q) <= 127


def test_pack_blocks_offsets_contiguous_per_shard(spark):
    """Within a shard, offsets tile the token stream exactly: each
    doc starts where the previous one ended."""
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (1 + i % 17))) for i in range(200)],
        "doc_id LONG, text STRING",
    )
    rows = pack_blocks(docs, block_tokens=64, shards=4).collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r.doc_id)
        expect = 0
        for r in shard_rows:
            assert r.start_offset == expect
            expect += r.n_tokens


def test_pii_redact_idempotent(spark):
    """Redacting already-redacted text is a no-op — the token never
    matches any PII pattern."""
    df = spark.createDataFrame(
        [Row(t="a@b.io and https://x.io and 010-1234-5678 end")]
    )
    once = df.select(pii.redact(F.col("t")).alias("r"))
    twice = once.select(pii.redact(F.col("r")).alias("r"))
    assert once.first().r == twice.first().r


def test_incremental_dedup_flags_known_dups(spark):
    """A batch doc that exactly matches a store doc must flag
    exact_dup AND collide on every band; an unrelated doc matches
    nothing; batch docs never probe each other."""
    from airflow_baseball_spark.text.dedup import (
        incremental_dedup,
        minhash_signatures,
    )

    store = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "entirely different corpus content here")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
         (11, "zzz qqq completely novel text www")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_candidates, r.exact_dup)
        for r in incremental_dedup(
            batch,
            minhash_signatures(store),
            store.select(F.md5("text").alias("digest")),
        ).collect()
    }
    assert out[10] == (1, 1)
    assert out[11] == (0, 0)
