"""Embedding UDFs — iterator-style pandas_udf, model loaded once per
executor (fixing the reference's per-request model reload at
s3vectors-app/pythonvectordbceph.py:162,168).

Reference contracts reproduced:
  - text: SentenceTransformer 'all-MiniLM-L6-v2' → float32[384]
    (pythonvectordbceph.py:162-163, README dim table :215)
  - image: timm resnet34 num_classes=0 global_pool='avg' → float32[512],
    L2-normalized (FeatureExtractor, pythonvectordbceph.py:17-47)

The heavy model libs are NOT in this container, so each UDF tries the
real library and falls back to a deterministic hash-based stub with
the identical shape/dtype contract (dim, float32, unit L2 norm). The
Spark-side plumbing — Arrow batching, iterator lifecycle, schema — is
real and identical either way; swapping in the real model is a one-
line change on a GPU cluster (plus spark.task.resource.gpu.amount).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, FloatType

TEXT_DIM = 384   # all-MiniLM-L6-v2
IMAGE_DIM = 512  # timm resnet34 pooled features


def _hash_vector(data: bytes, dim: int) -> np.ndarray:
    """Deterministic unit-norm float32 vector from bytes: sha256-seeded
    counter stream → uniform floats in [-1,1] → L2 normalize."""
    out = np.empty(dim, dtype=np.float64)
    h = hashlib.sha256(data).digest()
    i = 0
    while i < dim:
        block = hashlib.sha256(h + i.to_bytes(4, "little")).digest()
        chunk = np.frombuffer(block, dtype="<u4").astype(np.float64)
        chunk = chunk / 2147483647.5 - 1.0
        take = min(len(chunk), dim - i)
        out[i : i + take] = chunk[:take]
        i += take
    norm = np.linalg.norm(out)
    if norm > 0:
        out = out / norm
    return out.astype(np.float32)


def stub_text_embedding(text: str, dim: int = TEXT_DIM) -> list[float]:
    return _hash_vector(text.encode("utf-8"), dim).tolist()


def stub_image_embedding(content: bytes, dim: int = IMAGE_DIM) -> list[float]:
    return _hash_vector(content, dim).tolist()


def _load_text_model():
    """Real model if available; None → stub. Gated import so the
    pipeline runs hermetically where torch isn't installed."""
    try:
        from sentence_transformers import SentenceTransformer  # noqa: PLC0415

        return SentenceTransformer("all-MiniLM-L6-v2")
    except Exception:
        return None


def _load_image_model():
    try:
        import timm  # noqa: PLC0415
        import torch  # noqa: F401, PLC0415

        model = timm.create_model(
            "resnet34", pretrained=True, num_classes=0, global_pool="avg"
        )
        model.eval()
        return model
    except Exception:
        return None


@pandas_udf(ArrayType(FloatType()))
def text_embed_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Iterator pandas_udf: the model loads ONCE per python worker and
    is reused across all Arrow batches of the task."""
    model = _load_text_model()
    for series in batches:
        if model is not None:
            vecs = model.encode(series.fillna("").tolist(), normalize_embeddings=True)
            yield pd.Series([np.asarray(v, dtype=np.float32).tolist() for v in vecs])
        else:
            yield series.fillna("").map(stub_text_embedding)


@pandas_udf(ArrayType(FloatType()))
def image_embed_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Same lifecycle for the image tower; input is the raw bytes
    column of a binaryFile scan. Real path: PIL RGB decode + timm
    preprocess + no-grad forward + L2 normalize (the reference's
    FeatureExtractor contract); stub path: hash embedding.

    The real path is decode-tolerant: a null/empty/corrupt byte string
    falls back to the deterministic hash embedding for THAT row instead
    of raising — one bad object must not crash (and forever-retry) a
    whole streaming micro-batch. Upstream ingest additionally drops
    null-content rows with a logged count; this is the second seatbelt
    for callers that feed the UDF directly."""
    model = _load_image_model()
    for series in batches:
        if model is not None:
            import torch  # noqa: PLC0415
            from PIL import Image  # noqa: PLC0415
            import io  # noqa: PLC0415
            import timm  # noqa: PLC0415

            cfg = timm.data.resolve_data_config({}, model=model)
            tfm = timm.data.create_transform(**cfg)
            decoded: list[tuple[int, object]] = []
            out: list[list[float] | None] = [None] * len(series)
            for i, b in enumerate(series):
                try:
                    decoded.append(
                        (i, tfm(Image.open(io.BytesIO(b)).convert("RGB")))
                    )
                except Exception:
                    out[i] = stub_image_embedding(bytes(b or b""))
            if decoded:
                with torch.no_grad():
                    feats = model(
                        torch.stack([t for _, t in decoded])
                    ).numpy()
                feats = feats / np.linalg.norm(feats, axis=1, keepdims=True)
                for (i, _), f in zip(decoded, feats):
                    out[i] = f.astype(np.float32).tolist()
            yield pd.Series(out)
        else:
            yield series.map(lambda b: stub_image_embedding(bytes(b or b"")))
