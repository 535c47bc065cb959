"""Multimodal columns — image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

The reference has no media surface (its one semi-structured escape
hatch is CSV side files, `dags/0_init_baseball_table.py:388`); this is
north-star training-data-pipeline surface. The decode step for real
codecs is STUBBED (image/audio libraries are not in this container) —
gated behind try-imports that raise ``NotImplementedError`` with the
deterministic byte-level fake documented alongside. The Spark-side
plumbing — schema, partitioning, UDF signature, Arrow batch shape — is
real and oracle-tested.
"""

from airflow_baseball_spark.multimodal.assets import (  # noqa: F401
    byte_histogram,
    decode_media,
    frame_sample,
    media_assets,
    resize_images,
)
