"""Multimodal (image/audio/video) column plumbing.

Media are opaque binary columns with typed metadata; the Spark-side schema,
partitioning, Arrow batch shape, and UDF signatures are real and tested.
PNG decodes for real via the stdlib codec (png.py); other codecs (the
container has no image/audio libraries) stay behind clearly-marked
NotImplementedError stubs with production-shaped signatures.
"""

from etl_online_retail_spark.multimodal.binary import (  # noqa: F401
    MEDIA_SCHEMA,
    binary_features,
    decode_image,
    image_features,
    synthetic_png_media,
    to_media_table,
)
