"""Binary media-asset operators.

Scale design: payloads stay opaque ``binary`` cells — never collected,
never shuffled except where a groupBy demands it (nowhere below: every
operator here is a narrow map over the scan, so at 100 TB these run
embarrassingly parallel inside the parquet read stage, with Arrow
moving whole batches to Python once per partition, not per row).

All Python functions passed to Spark are *closures* (cloudpickle ships
them by value; workers never need this package importable).

Determinism contract for the oracle: the fake payload is
``encode(text, 'utf-8')`` of the ``documents`` table, which is ASCII in
the driver testdata — so byte-level results are mirror-expressible in
SQL over characters (``unicode(substring(text, i, 1))`` == byte i).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FRAME_BYTES = 32  # fixed "frame" chunk for the fake video codec
N_BUCKETS = 16  # byte-histogram buckets (byte >> 4)

MEDIA_TYPES = ("image", "audio", "video")


def media_assets(docs: DataFrame) -> DataFrame:
    """documents → media-asset table: opaque binary payload + typed
    metadata struct. media_type cycles deterministically by doc_id;
    fake dimensions derive from payload length (SQL-mirrorable)."""
    # NOTE: deliberately NOT spread(): the downstream Pandas stages are
    # numpy-vectorized and cheap per row, so at local scale the shuffle
    # + per-partition python-worker spin-up costs more than it saves
    # (measured 0.4s vs 1.0s at sf0.1); at real scale the scan itself
    # yields many splits.
    byte_len = F.length("text")  # ASCII: chars == bytes
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.element_at(
            F.array(*[F.lit(t) for t in MEDIA_TYPES]),
            (F.col("doc_id") % len(MEDIA_TYPES) + 1).cast("int"),
        ).alias("media_type"),
        F.struct(
            byte_len.alias("byte_len"),
            (16 * (1 + byte_len % 64)).alias("width"),
            (16 * (1 + byte_len % 48)).alias("height"),
            F.lit(16000).alias("sample_rate"),
            F.ceil(byte_len / FRAME_BYTES).cast("long").alias("n_frames"),
        ).alias("meta"),
        F.md5(F.col("text")).alias("digest"),
    )


def decode_media(assets: DataFrame, use_real_codecs: bool = False) -> DataFrame:
    """Decode step. Real codecs (PIL / soundfile / av) are NOT in this
    container — ``use_real_codecs=True`` raises ``NotImplementedError``
    unless the libraries appear. The default path applies the
    deterministic fake decoder: "pixels" are the raw payload bytes, and
    the decoded summary is (n_bytes, first_byte, last_byte, byte_sum)
    computed in an Arrow-batched mapInPandas pass."""
    if use_real_codecs:
        try:
            import PIL  # noqa: F401, PLC0415
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "real media decode needs PIL/soundfile/av, which are not "
                "installed; run with use_real_codecs=False for the "
                "deterministic byte-level fake"
            ) from exc

    out_schema = (
        "asset_id long, media_type string, n_bytes long, "
        "first_byte long, last_byte long, byte_sum long"
    )

    def decode(batches):
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            payloads = pdf["payload"]
            arrs = [np.frombuffer(b, dtype=np.uint8) for b in payloads]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(a) for a in arrs],
                    "first_byte": [int(a[0]) if len(a) else None for a in arrs],
                    "last_byte": [int(a[-1]) if len(a) else None for a in arrs],
                    "byte_sum": [int(a.sum()) for a in arrs],
                }
            )

    return assets.select("asset_id", "media_type", "payload").mapInPandas(
        decode, out_schema
    )


def byte_histogram(assets: DataFrame) -> DataFrame:
    """Feature extraction: 16-bucket byte-value histogram per asset
    (bucket = byte >> 4), vectorized with numpy over Arrow batches.
    This is the real feature path — a CNN/embedding extractor slots in
    with the identical mapInPandas signature and batch shape."""
    cols = ", ".join(f"h{i} long" for i in range(N_BUCKETS))
    out_schema = f"asset_id long, {cols}"

    def hist(batches):
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            counts = [
                np.bincount(
                    np.frombuffer(b, dtype=np.uint8) >> 4, minlength=N_BUCKETS
                )
                for b in pdf["payload"]
            ]
            data = {"asset_id": pdf["asset_id"]}
            for i in range(N_BUCKETS):
                data[f"h{i}"] = [int(c[i]) for c in counts]
            yield pd.DataFrame(data)

    return assets.select("asset_id", "payload").mapInPandas(hist, out_schema)


def frame_sample(
    assets: DataFrame, frame_bytes: int = FRAME_BYTES, every: int = 4
) -> DataFrame:
    """Frame sampling for the fake video codec: chunk the payload into
    ``frame_bytes`` frames, keep every ``every``-th, emit the frame's
    md5. One input row → many output rows (the mapInPandas analog of a
    generator UDTF)."""
    out_schema = "asset_id long, frame_idx long, frame_md5 string"

    def sample(batches):
        import hashlib  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            ids, idxs, digests = [], [], []
            for aid, b in zip(pdf["asset_id"], pdf["payload"]):
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, every):
                    ids.append(aid)
                    idxs.append(i)
                    digests.append(
                        hashlib.md5(
                            b[i * frame_bytes : (i + 1) * frame_bytes]
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {"asset_id": ids, "frame_idx": idxs, "frame_md5": digests}
            )

    return assets.select("asset_id", "payload").mapInPandas(sample, out_schema)


def resize_images(
    assets: DataFrame, target_w: int = 224, target_h: int = 224,
    use_real_codecs: bool = False,
) -> DataFrame:
    """Resize step. Real resampling is STUBBED (no PIL here): the
    deterministic fake keeps the first ``target_w * target_h // 64``
    payload bytes as the "resized" payload and rewrites the metadata —
    which exercises the exact schema/partitioning a real resize has."""
    if use_real_codecs:
        try:
            import PIL  # noqa: F401, PLC0415
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "real image resize needs PIL; the deterministic fake "
                "(use_real_codecs=False) preserves the pipeline shape"
            ) from exc

    keep = target_w * target_h // 64
    out_schema = "asset_id long, payload binary, width int, height int"

    def resize(batches):
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "payload": [bytes(b[:keep]) for b in pdf["payload"]],
                    "width": target_w,
                    "height": target_h,
                }
            )

    return (
        assets.filter(F.col("media_type") == "image")
        .select("asset_id", "payload")
        .mapInPandas(resize, out_schema)
    )
