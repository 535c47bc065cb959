"""Document chunking — split long documents into fixed-size,
optionally-overlapping character chunks with stable offsets.

The ubiquitous LLM-preprocessing step between cleaning and
tokenization: context windows want bounded inputs, retrieval wants
overlapping chunks with provenance (doc_id, offset) so spans map back
to sources.

Scale design: pure in-row explode — chunk starts are a ``sequence``
array, chunk text a ``substring`` per start; ZERO shuffle at any
corpus size, and the chunk stream never materializes a document twice
(substring slices share the input string). At 100 TB this is a map
stage fused into the scan, exactly like the text-stats family
(`text/analysis.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airflow_baseball_spark.partitioning import spread


def doc_chunk(
    df: DataFrame,
    chunk_size: int = 200,
    stride: int = 150,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per (doc, chunk): ``chunk_id`` (0-based), ``chunk_start``
    (1-based char offset, substring convention), ``chunk`` text.

    Starts run 1, 1+stride, … ≤ length(text); the final chunk may be
    shorter than ``chunk_size`` (no padding, no dropped tail). With
    ``stride < chunk_size`` consecutive chunks overlap by
    ``chunk_size - stride`` chars — the retrieval-friendly setting.
    Empty documents emit no chunks."""
    if stride <= 0:
        raise ValueError("stride must be positive")
    # empty docs: Spark's sequence(1, 0) THROWS (DuckDB returns []);
    # the when() leaves NULL, which explode drops — same zero chunks
    starts = F.when(
        F.length(text_col) >= 1,
        F.sequence(F.lit(1), F.length(text_col), F.lit(stride)),
    )
    return (
        spread(df)
        .select(F.col(id_col), F.col(text_col), F.explode(starts).alias("chunk_start"))
        .select(
            id_col,
            ((F.col("chunk_start") - 1) / stride).cast("long").alias("chunk_id"),
            F.col("chunk_start").cast("long").alias("chunk_start"),
            F.expr(f"substring({text_col}, chunk_start, {chunk_size})").alias("chunk"),
        )
    )
