"""Multimodal plumbing tests: stub gating, Arrow batch shape, schema,
and frame-explosion semantics (oracle-value checks live in the
registry; these cover what the oracle can't see)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_baseball_spark.multimodal import (
    byte_histogram,
    decode_media,
    frame_sample,
    media_assets,
    resize_images,
)
from airflow_baseball_spark.schemas import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def assets(spark):
    return media_assets(load_table(spark, SF, "documents")).cache()


def test_asset_schema(assets):
    assert dict(assets.dtypes)["payload"] == "binary"
    meta = {f.name: f.dataType.simpleString()
            for f in assets.schema["meta"].dataType.fields}
    assert meta == {
        "byte_len": "int", "width": "int", "height": "int",
        "sample_rate": "int", "n_frames": "bigint",
    }


def test_decode_stub_gated(assets):
    """Real-codec path must fail loudly when the libs are absent."""
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present; stub gate not exercised")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        decode_media(assets, use_real_codecs=True)
    with pytest.raises(NotImplementedError):
        resize_images(assets, use_real_codecs=True)


def test_fake_decode_matches_metadata(assets):
    joined = (
        decode_media(assets)
        .join(assets.select("asset_id", F.col("meta.byte_len").alias("bl")), "asset_id")
    )
    assert joined.filter(F.col("n_bytes") != F.col("bl")).count() == 0


def test_histogram_counts_total_bytes(assets):
    h = byte_histogram(assets)
    total = sum(F.col(f"h{i}") for i in range(16))
    joined = h.join(assets.select("asset_id", F.col("meta.byte_len").alias("bl")), "asset_id")
    assert joined.filter(total != F.col("bl")).count() == 0


def test_frame_sample_counts(assets):
    per_asset = frame_sample(assets).groupBy("asset_id").count()
    expected = assets.select(
        "asset_id",
        F.ceil(F.col("meta.n_frames") / 4).cast("long").alias("expected"),
    )
    bad = per_asset.join(expected, "asset_id").filter(
        F.col("count") != F.col("expected")
    )
    assert bad.count() == 0


def test_resize_only_images_and_caps_payload(assets):
    out = resize_images(assets, target_w=224, target_h=224)
    n_images = assets.filter(F.col("media_type") == "image").count()
    assert out.count() == n_images
    assert out.filter(F.length("payload") > 784).count() == 0
