from .binary import (  # noqa: F401
    MEDIA_SCHEMA,
    decode_image_batch,
    extract_image_features,
    frame_sample,
    media_table_from_binary_files,
    resize_images,
)
