"""Round-4 operator tests: document chunking, per-domain caps, and the
z-order layout (value correctness + the file-level range property the
layout exists to provide)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from airflow_baseball_spark.operators.sampling import domain_cap
from airflow_baseball_spark.operators.zorder import (
    write_zordered,
    zorder_value,
)
from airflow_baseball_spark.text.chunking import doc_chunk


def test_doc_chunk_offsets_and_overlap(spark):
    docs = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "xy"), (3, "")], "doc_id long, text string"
    )
    out = doc_chunk(docs, chunk_size=4, stride=3)
    rows = {(r.doc_id, r.chunk_id, r.chunk_start, r.chunk) for r in out.collect()}
    # doc 1 (len 10): starts 1,4,7,10 — last two chunks short, no padding
    assert {(1, 0, 1, "abcd"), (1, 1, 4, "defg"), (1, 2, 7, "ghij"),
            (1, 3, 10, "j")} <= rows
    # doc 2 (len 2 < chunk): single short chunk; doc 3 (empty): nothing
    assert (2, 0, 1, "xy") in rows
    assert not any(d == 3 for d, *_ in rows)
    # overlap reconstruction: dropping the first (size-stride) chars of
    # every chunk after the first rebuilds the document exactly
    chunks = [r.chunk for r in out.filter("doc_id = 1").orderBy("chunk_id").collect()]
    assert chunks[0] + "".join(c[4 - 3:] for c in chunks[1:]) == "abcdefghij"


def test_doc_chunk_rejects_bad_stride(spark):
    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError):
        doc_chunk(docs, chunk_size=4, stride=0)


def test_domain_cap_bounds_and_stability(spark):
    rows = [(i, f"d{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = domain_cap(df, "source", 5, id_col="doc_id", seed="s")
    per = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per == {"d0": 5, "d1": 5, "d2": 5}
    # survivors follow row identity, not physical placement
    kept1 = {r.doc_id for r in out.collect()}
    kept2 = {
        r.doc_id
        for r in domain_cap(
            df.repartition(7), "source", 5, id_col="doc_id", seed="s"
        ).collect()
    }
    assert kept1 == kept2


def test_zorder_value_interleaves_bits(spark):
    df = spark.createDataFrame([(3, 1), (0, 0), (5, 2)], "a long, b long")
    got = {
        (r.a, r.b, r.z)
        for r in df.select("a", "b", zorder_value(F.col("a"), F.col("b")).alias("z")).collect()
    }
    # a=0b11,b=0b01 -> z bits a0,b0,a1,b1 = 1,1,1,0 -> 0b0111 = 7
    # a=0b101,b=0b010 -> bits: a0=1,b0=0,a1=0,b1=1,a2=1,b2=0 -> 0b010011+0b10000? compute: 1 + 8 + 16 = 25? a2 at bit4=16, b1 at bit3=8, a0 at bit0=1 -> 25
    assert (3, 1, 7) in got
    assert (0, 0, 0) in got
    assert (5, 2, 25) in got


def test_write_zordered_files_have_disjoint_z_ranges(spark):
    """The point of the layout: each output file owns a contiguous,
    non-overlapping z-range, so min/max footer stats prune scans on
    either interleaved column."""
    df = spark.range(0, 2000).select(
        (F.col("id") % 97).alias("k1"),
        (F.col("id") * 37 % 89).alias("k2"),
        F.col("id").alias("payload"),
    )
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/t"
        write_zordered(df, path, ["k1", "k2"], n_files=6)
        back = spark.read.parquet(path)
        assert back.count() == 2000
        ranges = (
            back.withColumn("z", zorder_value(F.col("k1"), F.col("k2")))
            .withColumn("f", F.input_file_name())
            .groupBy("f")
            .agg(F.min("z").alias("lo"), F.max("z").alias("hi"))
            .collect()
        )
        spans = sorted((r.lo, r.hi) for r in ranges)
        assert 2 <= len(spans) <= 6
        for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
            assert hi1 <= lo2  # disjoint: range exchange did its job
