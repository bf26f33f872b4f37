from .embedders import (  # noqa: F401
    IMAGE_DIM,
    TEXT_DIM,
    image_embed_udf,
    stub_image_embedding,
    stub_text_embedding,
    text_embed_udf,
)
