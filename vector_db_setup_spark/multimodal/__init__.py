from vector_db_setup_spark.multimodal.columns import (
    attach_fake_binary,
    binary_byte_stats,
    decode_image,
    extract_image_features,
    sample_video_frames,
)

__all__ = [
    "attach_fake_binary",
    "binary_byte_stats",
    "decode_image",
    "extract_image_features",
    "sample_video_frames",
]
