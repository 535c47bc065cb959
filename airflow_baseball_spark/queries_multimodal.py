"""Multimodal driver queries: binary payload columns built from
``documents`` (payload = utf-8 bytes of ``text``, ASCII in the driver
testdata), processed by Arrow-batched mapInPandas operators.

Oracle mirroring: byte-level results are re-expressed over characters
in DuckDB (``unicode(substring(text, i, 1))`` is byte ``i`` for ASCII),
so the Python batch path is hash-checked end-to-end — the strongest
check a Pandas-UDF stage can get.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_baseball_spark import registry
from airflow_baseball_spark.multimodal import assets as mm
from airflow_baseball_spark.schemas import load_table


def _assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mm.media_assets(load_table(spark, sf_dir, "documents"))


def q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _assets(spark, sf_dir)
    return a.select(
        "asset_id",
        "media_type",
        F.col("meta.byte_len").alias("byte_len"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.sample_rate").alias("sample_rate"),
        F.col("meta.n_frames").alias("n_frames"),
        "digest",
    )


registry.register(
    "media_metadata",
    q_media_metadata,
    """
    SELECT doc_id AS asset_id,
           ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
           length(text) AS byte_len,
           16 * (1 + length(text) % 64) AS width,
           16 * (1 + length(text) % 48) AS height,
           16000 AS sample_rate,
           CAST(ceil(length(text) / 32.0) AS BIGINT) AS n_frames,
           md5(text) AS digest
    FROM documents
    """,
)


def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mm.decode_media(_assets(spark, sf_dir))


registry.register(
    "media_decode",
    q_media_decode,
    """
    SELECT doc_id AS asset_id,
           ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
           length(text) AS n_bytes,
           CASE WHEN length(text) > 0
                THEN unicode(substring(text, 1, 1)) END AS first_byte,
           CASE WHEN length(text) > 0
                THEN unicode(substring(text, length(text), 1)) END AS last_byte,
           CAST(COALESCE(list_sum(list_transform(
             generate_series(1, length(text)),
             i -> unicode(substring(text, i, 1)))), 0) AS BIGINT) AS byte_sum
    FROM documents
    """,
)


def q_media_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mm.byte_histogram(_assets(spark, sf_dir))


def _hist_sql() -> str:
    buckets = ",\n           ".join(
        f"CAST(COALESCE(SUM(CASE WHEN bkt = {i} THEN 1 END), 0) AS BIGINT) AS h{i}"
        for i in range(mm.N_BUCKETS)
    )
    return f"""
    WITH codes AS (
      SELECT d.doc_id,
             unicode(substring(d.text, c.i, 1)) // 16 AS bkt
      FROM documents d
      LEFT JOIN (SELECT doc_id, unnest(generate_series(1, length(text))) AS i
                 FROM documents) c ON d.doc_id = c.doc_id
    )
    SELECT doc_id AS asset_id,
           {buckets}
    FROM codes GROUP BY doc_id
    """


registry.register("media_byte_histogram", q_media_byte_histogram, _hist_sql())


def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mm.frame_sample(_assets(spark, sf_dir))


registry.register(
    "media_frame_sample",
    q_media_frame_sample,
    f"""
    WITH f AS (
      SELECT doc_id, text,
             unnest(generate_series(
               0, CAST(ceil(length(text) / {mm.FRAME_BYTES}.0) AS BIGINT) - 1
             )) AS idx
      FROM documents
    )
    SELECT doc_id AS asset_id, idx AS frame_idx,
           md5(substring(text, idx * {mm.FRAME_BYTES} + 1, {mm.FRAME_BYTES}))
             AS frame_md5
    FROM f WHERE idx % 4 = 0
    """,
)


def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize pipeline (deterministic fake codec) — binary payload
    output, rows-only check; the digest of the resized payload is the
    verifiable part."""
    out = mm.resize_images(_assets(spark, sf_dir))
    return out.select("asset_id", "width", "height", F.md5("payload").alias("digest"))


registry.register(
    "media_resize",
    q_media_resize,
    """
    SELECT doc_id AS asset_id, 224 AS width, 224 AS height,
           md5(substring(text, 1, 784)) AS digest
    FROM documents WHERE doc_id % 3 = 0
    """,
)
