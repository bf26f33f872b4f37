"""Embedding UDF contract: real-model probe order + stub fallback.

The reference loads SentenceTransformer('all-MiniLM-L6-v2') (dim 384,
s3vectors-app/pythonvectordbceph.py:162-163) and timm resnet34
(dim 512, :17-47). This container has neither, so the loaders must
probe the real library FIRST and fall back to the deterministic stub
only on ImportError — the same code is production-real on a cluster
where the libs exist.
"""

import sys
import types

import numpy as np

from python_vectordbapp_ceph_spark.embed.embedders import (
    IMAGE_DIM,
    TEXT_DIM,
    _load_image_model,
    _load_text_model,
    stub_image_embedding,
    stub_text_embedding,
)


def test_text_loader_prefers_real_library(monkeypatch):
    """When sentence_transformers is importable the loader must return
    an instance constructed with the reference's model name — never the
    stub."""
    created = {}

    class FakeST:
        def __init__(self, name):
            created["name"] = name

    fake = types.ModuleType("sentence_transformers")
    fake.SentenceTransformer = FakeST
    monkeypatch.setitem(sys.modules, "sentence_transformers", fake)

    model = _load_text_model()
    assert isinstance(model, FakeST)
    assert created["name"] == "all-MiniLM-L6-v2"


def test_image_loader_prefers_real_library(monkeypatch):
    """timm path: create_model('resnet34', num_classes=0,
    global_pool='avg') — the reference FeatureExtractor contract."""
    calls = {}

    class FakeModel:
        def eval(self):
            calls["eval"] = True

    fake_timm = types.ModuleType("timm")

    def create_model(name, pretrained=None, num_classes=None, global_pool=None):
        calls["args"] = (name, num_classes, global_pool)
        return FakeModel()

    fake_timm.create_model = create_model
    monkeypatch.setitem(sys.modules, "timm", fake_timm)
    monkeypatch.setitem(sys.modules, "torch", types.ModuleType("torch"))

    model = _load_image_model()
    assert isinstance(model, FakeModel)
    assert calls["args"] == ("resnet34", 0, "avg")
    assert calls.get("eval")


def test_loaders_fall_back_to_stub_in_this_container():
    """Neither lib is installed here: loaders return None (→ stub path
    inside the UDF)."""
    assert _load_text_model() is None
    assert _load_image_model() is None


def test_stub_contract_shape_norm_determinism():
    t1 = stub_text_embedding("hello world")
    t2 = stub_text_embedding("hello world")
    t3 = stub_text_embedding("different")
    assert len(t1) == TEXT_DIM and t1 == t2 and t1 != t3
    assert abs(float(np.linalg.norm(t1)) - 1.0) < 1e-5
    assert all(isinstance(x, float) for x in t1[:4])

    i1 = stub_image_embedding(b"\x89PNG fake bytes")
    assert len(i1) == IMAGE_DIM
    assert abs(float(np.linalg.norm(i1)) - 1.0) < 1e-5
