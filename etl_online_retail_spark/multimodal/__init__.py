"""Multimodal (image/audio/video) column plumbing.

Media are opaque binary columns with typed metadata; the Spark-side schema,
partitioning, Arrow batch shape, and UDF signatures are real and tested,
while the actual codec calls are stubbed (the container has no image/audio
libraries) behind clearly-marked NotImplementedError / deterministic fakes.
"""

from etl_online_retail_spark.multimodal.binary import (  # noqa: F401
    MEDIA_SCHEMA,
    binary_features,
    decode_image_stub,
    to_media_table,
)
