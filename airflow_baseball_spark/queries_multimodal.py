"""Multimodal driver queries: binary payload columns built from
``documents`` (payload = utf-8 bytes of ``text``, ASCII in the driver
testdata), processed by Arrow-batched mapInPandas operators.

Oracle mirroring: byte-level results are re-expressed over characters
in DuckDB (``unicode(substring(text, i, 1))`` is byte ``i`` for ASCII),
so the Python batch path is hash-checked end-to-end — the strongest
check a Pandas-UDF stage can get.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


_SHARD_BLOCK = 4096  # assets per cumsum block (two-level prefix sum)


def q_media_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset-style shard planner: assign assets (ordered by
    asset_id) to contiguous shards of ~64 KB of payload, then report
    each shard's asset count and size total. shard_id = cumulative
    size BEFORE the asset, integer-divided by the target — pure
    integer arithmetic, identical on both engines at any parallelism.

    History: driver-red r6-r8 while bit-exact locally. r9 root-caused
    it (PERF_NOTES.md r9): the oracle's window-SUM-derived ``shard_id``
    is a DuckDB HUGEINT, which the driver's dtype-preserving fetch
    degrades to float64 — the VALUES matched all along (the r7/r8
    rebases onto true bytes and then the stored ``n_chars`` int64 were
    chasing a read-layer divergence that never existed). The rewrite
    at registry.oracle_sql() casts it to BIGINT; tests/driver_sim.py
    reproduces the red with the raw oracle and green with the wrapped
    one. The r8 provenance move to the stored size column stays — it
    is the honest 100 TB design regardless: a shard planner over
    binary media reads the asset-manifest size column, it does not
    re-measure payloads.

    The global running sum stays TWO-LEVEL (r7): per-block cumsum
    (window partitioned by asset_id-range block, fully parallel) plus
    broadcast block offsets (an n/4096-row window) — no
    single-partition global sort in the plan (plan-asserted in
    tests/test_plan_quality_r7.py). The oracle keeps the simple
    global-window phrasing because DuckDB evaluates it exactly."""
    target = 64 * 1024
    a = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("asset_id"),
        F.col("n_chars").cast("long").alias("byte_len"),
    )
    blk = a.withColumn("blk", F.expr(f"asset_id div {_SHARD_BLOCK}"))
    # level 1: per-block totals -> exclusive block offsets (tiny table)
    offsets = (
        blk.groupBy("blk")
        .agg(F.sum("byte_len").alias("blk_bytes"))
        .withColumn(
            "blk_offset",
            F.coalesce(
                F.sum("blk_bytes").over(
                    Window.orderBy("blk").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .drop("blk_bytes")
    )
    # level 2: cumsum within each block (parallel across blocks) + offset.
    # (asset_id, byte_len) order (r8 verdict #2): provably total even if
    # a generation ever carries duplicate asset_ids — probe_dup_keys
    # audits that driver-side, this makes the plan immune regardless
    in_blk = (
        Window.partitionBy("blk")
        .orderBy("asset_id", "byte_len")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sharded = (
        blk.join(F.broadcast(offsets), "blk")
        .withColumn("blk_cum", F.sum("byte_len").over(in_blk))
        .withColumn(
            "shard_id",
            F.expr(
                f"(blk_offset + coalesce(blk_cum, 0)) div {target}"
            ),
        )
    )
    return sharded.groupBy("shard_id").agg(
        F.count("*").alias("n_assets"),
        F.sum("byte_len").cast("long").alias("shard_bytes"),
    )


registry.register(
    "media_shard_plan",
    q_media_shard_plan,
    f"""
    WITH a AS (
      SELECT doc_id AS asset_id, n_chars AS byte_len FROM documents
    ),
    s AS (
      SELECT asset_id, byte_len,
             COALESCE(SUM(byte_len) OVER (
               ORDER BY asset_id, byte_len
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               // {64 * 1024} AS shard_id
      FROM a
    )
    SELECT shard_id, COUNT(*) AS n_assets,
           CAST(SUM(byte_len) AS BIGINT) AS shard_bytes
    FROM s GROUP BY shard_id
    """,
)


def q_aspect_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-ratio bucketing for image batch assembly (the
    variable-aspect training trick: batches must share a bucket so
    tensors stack): bucket key = (10·width) div height — integer
    arithmetic only, identical on both engines. Per bucket: image
    count and total pixels. One image-filtered scan, one small-key
    agg."""
    a = _assets(spark, sf_dir).filter(F.col("media_type") == "image")
    width = F.col("meta.width").cast("long")
    height = F.col("meta.height").cast("long")
    return (
        a.select(
            F.expr("(10 * meta.width) div meta.height").alias("aspect_bucket"),
            (width * height).alias("pixels"),
        )
        .groupBy("aspect_bucket")
        .agg(
            F.count("*").alias("n_images"),
            F.sum("pixels").cast("long").alias("total_pixels"),
        )
    )


registry.register(
    "aspect_bucket",
    q_aspect_bucket,
    """
    WITH img AS (
      SELECT doc_id,
             16 * (1 + length(text) % 64) AS width,
             16 * (1 + length(text) % 48) AS height
      FROM documents WHERE doc_id % 3 = 0
    )
    SELECT (10 * width) // height AS aspect_bucket,
           COUNT(*) AS n_images,
           CAST(SUM(CAST(width AS BIGINT) * height) AS BIGINT)
             AS total_pixels
    FROM img GROUP BY 1
    """,
)


def q_media_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate media pairs via shared sampled-frame digests —
    the multimodal analog of MinHash-LSH banding: the sampled frame
    md5 IS the bucket key, so candidates come from digest-equality
    joins only, never an all-pairs comparison (reference scope:
    dags/002_insert_hitter_data.py-style scrape dedup, generalized to
    binary payloads).

    Shapes for 100 TB: (1) per-asset DISTINCT digests first (drops
    within-asset repeats before any join); (2) hot digests shared by
    > 32 assets are excluded BEFORE pairing — a digest in k assets
    yields k·(k-1)/2 pairs, so one boilerplate/black-frame digest
    would otherwise produce a quadratic hot bucket (same stop-shingle
    guard as ngram_jaccard); (3) the pair agg shuffles (id_a, id_b)
    integer keys only. Exactness: counts are integers; the overlap
    ratio is micro-quantized by integer division."""
    # r11: four consumers (hot digests, both self-join sides, per-
    # asset sizes) partition this table three different ways, so the
    # frame-sample md5 explode over the asset payloads re-ran per
    # consumer (two 1.8 s single-task map stages in the profile);
    # materialize the ~0.5 MB (asset_id, frame_md5) table once
    frames = (
        mm.frame_sample(_assets(spark, sf_dir))
        .select("asset_id", "frame_md5")
        .distinct()
        .localCheckpoint()
    )
    hot = frames.groupBy("frame_md5").agg(
        F.count("*").alias("n_assets")
    ).filter(F.col("n_assets") > 32)
    cold = frames.join(F.broadcast(hot), "frame_md5", "left_anti")
    a = cold.select(F.col("asset_id").alias("id_a"), "frame_md5")
    b = cold.select(F.col("asset_id").alias("id_b"), "frame_md5")
    pairs = (
        a.join(b, "frame_md5")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )
    sizes = frames.groupBy("asset_id").agg(F.count("*").alias("n_frames"))
    na = sizes.select(F.col("asset_id").alias("id_a"), F.col("n_frames").alias("na"))
    nb = sizes.select(F.col("asset_id").alias("id_b"), F.col("n_frames").alias("nb"))
    return (
        pairs.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_shared",
            F.expr("(n_shared * 1000000) DIV least(na, nb)").alias(
                "overlap_micro"
            ),
        )
    )


registry.register(
    "media_neardup",
    q_media_neardup,
    f"""
    WITH fr AS (
      SELECT DISTINCT doc_id AS asset_id,
             md5(substring(text, idx * {mm.FRAME_BYTES} + 1, {mm.FRAME_BYTES}))
               AS frame_md5
      FROM (
        SELECT doc_id, text,
               unnest(generate_series(
                 0, CAST(ceil(length(text) / {mm.FRAME_BYTES}.0) AS BIGINT) - 1
               )) AS idx
        FROM documents
      ) WHERE idx % 4 = 0
    ),
    cold AS (
      SELECT * FROM fr WHERE frame_md5 IN (
        SELECT frame_md5 FROM fr GROUP BY 1 HAVING COUNT(*) <= 32
      )
    ),
    pairs AS (
      SELECT x.asset_id AS id_a, y.asset_id AS id_b,
             COUNT(*) AS n_shared
      FROM cold x JOIN cold y ON x.frame_md5 = y.frame_md5
                            AND x.asset_id < y.asset_id
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    sizes AS (SELECT asset_id, COUNT(*) AS n_frames FROM fr GROUP BY 1)
    SELECT p.id_a, p.id_b, CAST(p.n_shared AS BIGINT) AS n_shared,
           (p.n_shared * 1000000) // least(sa.n_frames, sb.n_frames)
             AS overlap_micro
    FROM pairs p
    JOIN sizes sa ON p.id_a = sa.asset_id
    JOIN sizes sb ON p.id_b = sb.asset_id
    """,
)


def q_media_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup storage audit per media type: group assets by
    payload digest, count duplicate copies and the bytes a
    keep-one-per-digest policy reclaims — the first number a
    petabyte-scale media lake asks for (and the cheap precursor to
    `media_neardup`'s fuzzy pass). Per type: assets, distinct
    payloads, duplicate copies, total vs reclaimable bytes, and the
    micro-quantized savings ratio.

    Shapes: one digest-keyed agg (digests shuffle, payloads never
    move), then a media-type rollup of that digest table. All counts
    and byte sums are exact integers."""
    a = _assets(spark, sf_dir).select(
        "media_type", "digest", F.col("meta.byte_len").alias("byte_len")
    )
    per_digest = a.groupBy("media_type", "digest").agg(
        F.count("*").alias("n_copies"),
        F.sum("byte_len").alias("bytes_all"),
        F.min("byte_len").alias("bytes_one"),
    )
    return (
        per_digest.groupBy("media_type")
        .agg(
            F.sum("n_copies").alias("n_assets"),
            F.count("*").alias("n_unique"),
            (F.sum("n_copies") - F.count("*")).alias("n_dup_copies"),
            F.sum("bytes_all").cast("long").alias("total_bytes"),
            F.sum(F.col("bytes_all") - F.col("bytes_one"))
            .cast("long")
            .alias("reclaimable_bytes"),
        )
        .withColumn(
            "savings_micro",
            F.expr("(reclaimable_bytes * 1000000) DIV total_bytes"),
        )
    )


registry.register(
    "media_dedup_savings",
    q_media_dedup_savings,
    """
    WITH a AS (
      SELECT ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1]
               AS media_type,
             md5(text) AS digest,
             length(text) AS byte_len
      FROM documents
    ),
    per_digest AS (
      SELECT media_type, digest, COUNT(*) AS n_copies,
             SUM(byte_len) AS bytes_all, MIN(byte_len) AS bytes_one
      FROM a GROUP BY 1, 2
    )
    SELECT media_type,
           CAST(SUM(n_copies) AS BIGINT) AS n_assets,
           COUNT(*) AS n_unique,
           CAST(SUM(n_copies) - COUNT(*) AS BIGINT) AS n_dup_copies,
           CAST(SUM(bytes_all) AS BIGINT) AS total_bytes,
           CAST(SUM(bytes_all - bytes_one) AS BIGINT) AS reclaimable_bytes,
           (CAST(SUM(bytes_all - bytes_one) AS BIGINT) * 1000000)
             // CAST(SUM(bytes_all) AS BIGINT) AS savings_micro
    FROM per_digest GROUP BY 1
    """,
)
