"""END-TO-END REFERENCE PARITY: the full documented object lifecycle
of the reference app, replayed through the streaming ingest →
collection → search chain in one integration test per modality.

Reference flow (s3vectors-app/pythonvectordbceph.py:121-212 + README
"top 2 most similar objects based on L2 distance"):

    PUT object          → webhook → embed → put_vectors (metadata:
                          url/object_key/bucket [+tags])
    PUT again with tags → tag enrichment: same key re-embedded,
                          metadata replaced (last writer wins)
    DELETE object       → delete_vectors(keys=[key])
    search              → top-2 by L2 over what remains

Every stage already passes in isolation (test_windows_streaming,
test_collection, test_knn); THIS test pins the composition — including
a checkpointed stream RESTART in the middle of the lifecycle, which is
where offset-tracking or idempotency regressions would surface.
"""

import json

from pyspark.sql import functions as F  # noqa: F401 (parity with siblings)

from python_vectordbapp_ceph_spark.collection import VectorCollection
from python_vectordbapp_ceph_spark.streaming.ingest import (
    ingest_stream,
    parse_s3_events,
)


def _event(key, event="ObjectCreated:Put", tags=None, t="2024-01-01T00:00:00Z",
           bucket="b1"):
    return {
        "Records": [
            {
                "eventName": event,
                "eventTime": t,
                "s3": {
                    "bucket": {"name": bucket},
                    "object": {"key": key, "tags": tags or {}},
                },
            }
        ]
    }


def _drain(spark, events_dir, coll, ckpt, **kw):
    raw = spark.readStream.text(str(events_dir))
    q = ingest_stream(
        parse_s3_events(raw, json_col="value"), coll,
        checkpoint_dir=str(ckpt), **kw,
    )
    assert q.awaitTermination(300), "stream did not finish in 300s"


def test_text_lifecycle_with_midway_restart(spark, tmp_path):
    """PUT alpha → PUT beta(tagged) → [RESTART] → re-PUT alpha with
    tags (enrichment) → PUT gamma → DELETE beta → top-2 L2 search."""
    from python_vectordbapp_ceph_spark.embed import stub_text_embedding

    events_dir = tmp_path / "events"
    events_dir.mkdir()
    coll = VectorCollection(
        spark=spark, path=str(tmp_path / "coll"), dim=384, name="b1"
    ).ensure_exists()
    texts = {
        "docs/alpha.txt": "the quick brown fox jumps over the lazy dog",
        "docs/beta.txt": "a completely different document about storage",
        "docs/gamma.txt": "the quick brown fox naps beside the lazy dog",
    }
    object_text = spark.createDataFrame(
        list(texts.items()), "key string, text string"
    )
    ckpt = tmp_path / "ckpt"

    # --- first stream session: two PUTs ---------------------------
    (events_dir / "e1.json").write_text(json.dumps(_event("docs/alpha.txt")))
    (events_dir / "e2.json").write_text(
        json.dumps(_event("docs/beta.txt", tags={"kind": "draft"}))
    )
    _drain(spark, events_dir, coll, ckpt, object_text=object_text)
    snap = {r.key: r for r in coll.snapshot().collect()}
    assert set(snap) == {"docs/alpha.txt", "docs/beta.txt"}
    assert snap["docs/beta.txt"].tags == {"kind": "draft"}

    # --- RESTART on the same checkpoint: enrichment + PUT + DELETE -
    (events_dir / "e3.json").write_text(json.dumps(_event(
        "docs/alpha.txt", tags={"stage": "enriched"},
        t="2024-01-02T00:00:00Z",
    )))
    (events_dir / "e4.json").write_text(
        json.dumps(_event("docs/gamma.txt", t="2024-01-02T00:00:01Z"))
    )
    (events_dir / "e5.json").write_text(json.dumps(_event(
        "docs/beta.txt", event="ObjectRemoved:Delete",
        t="2024-01-02T00:00:02Z",
    )))
    _drain(spark, events_dir, coll, ckpt, object_text=object_text)

    # collection state: beta deleted, alpha's metadata REPLACED by the
    # enrichment re-PUT (last writer wins), gamma present
    snap = {r.key: r for r in coll.snapshot().collect()}
    assert set(snap) == {"docs/alpha.txt", "docs/gamma.txt"}
    assert snap["docs/alpha.txt"].tags == {"stage": "enriched"}
    assert snap["docs/alpha.txt"].url == "http://rgw/b1/docs/alpha.txt"
    assert len(snap["docs/alpha.txt"].embedding) == 384
    # exactly-once across the restart: 4 upserts + 1 tombstone, no
    # replays of the first session's batches
    assert coll._log().count() == 5

    # --- README's search: top 2 by L2 ------------------------------
    # query with alpha's own text: alpha is the zero-distance hit and
    # gamma (near paraphrase) beats nothing else — beta is GONE even
    # though it was the true 2nd neighbor before the delete
    hits = coll.search(
        stub_text_embedding(texts["docs/alpha.txt"]), k=2
    ).collect()
    assert [h.key for h in hits] == ["docs/alpha.txt", "docs/gamma.txt"]
    assert hits[0].distance == 0.0
    assert hits[1].distance > 0.0
    assert hits[0].tags == {"stage": "enriched"}


def test_index_admin_lifecycle_composes_with_ingest(spark, tmp_path):
    """The Milvus deployment flavor's index-admin surface composed
    with streaming ingest (milvus-app/pythonvectordbceph_milvus.py:
    97-106): ingest → create_index(IVF)+load → approx search → MORE
    ingest invalidates the index (stale reads must fail loudly, never
    silently serve pre-mutation results) → rebuild → approx search
    sees the new doc; exact search agrees on the winner throughout."""
    import pytest

    from python_vectordbapp_ceph_spark.embed import stub_text_embedding

    events_dir = tmp_path / "events"
    events_dir.mkdir()
    coll = VectorCollection(
        spark=spark, path=str(tmp_path / "coll"), dim=384, name="b1"
    ).ensure_exists()
    texts = {f"k{i}": f"document number {i} about topic {i % 3}"
             for i in range(8)}
    texts["fresh"] = "a brand new document arriving after the index"
    object_text = spark.createDataFrame(
        list(texts.items()), "key string, text string"
    )
    ckpt = tmp_path / "ckpt"

    for i in range(8):
        (events_dir / f"e{i}.json").write_text(json.dumps(_event(f"k{i}")))
    _drain(spark, events_dir, coll, ckpt, object_text=object_text)

    # index admin: none → build → described
    assert coll.list_indexes() == []
    coll.create_index(nlist=4, nprobe=4).load()
    assert coll.list_indexes() == ["b1_ivf"]
    desc = coll.describe_index()
    assert desc["index_type"] == "IVF_FLAT" and desc["nlist"] == 4

    q = stub_text_embedding(texts["k3"])
    approx = coll.search(q, k=2, approx=True).collect()
    assert approx[0].key == "k3" and approx[0].distance == 0.0
    exact = coll.search(q, k=2).collect()
    assert exact[0].key == approx[0].key

    # a mutation through the SAME ingest path invalidates the index:
    # stale approx search must raise, not silently skip the new doc
    (events_dir / "e9.json").write_text(
        json.dumps(_event("fresh", t="2024-01-02T00:00:00Z"))
    )
    _drain(spark, events_dir, coll, ckpt, object_text=object_text)
    with pytest.raises(ValueError, match="no index"):
        coll.search(q, k=2, approx=True)

    # rebuild over the post-mutation snapshot: the new doc is findable
    coll.create_index(nlist=4, nprobe=4)
    qf = stub_text_embedding(texts["fresh"])
    hits = coll.search(qf, k=2, approx=True).collect()
    assert hits[0].key == "fresh" and hits[0].distance == 0.0
    assert coll.search(qf, k=2).collect()[0].key == "fresh"
    coll.release()


def test_image_lifecycle_top2_by_l2(spark, tmp_path):
    """The IMAGE deployment flavor (OBJECT_TYPE=IMAGE, 512-dim resnet
    tower — stub kernel here, real-model probe order in the UDF): PUT
    two images, DELETE one, PUT a third, top-2 L2 search."""
    from python_vectordbapp_ceph_spark.embed import stub_image_embedding

    events_dir = tmp_path / "events"
    events_dir.mkdir()
    coll = VectorCollection(
        spark=spark, path=str(tmp_path / "icoll"), dim=512, name="imgs"
    ).ensure_exists()
    blobs = {
        "cat.png": b"\x89PNG-fake-cat-bytes",
        "dog.png": b"\x89PNG-fake-dog-bytes",
        "fox.png": b"\x89PNG-fake-fox-bytes",
    }
    object_bytes = spark.createDataFrame(
        list(blobs.items()), "key string, content binary"
    )
    ckpt = tmp_path / "ckpt"

    (events_dir / "e1.json").write_text(json.dumps(_event("cat.png")))
    (events_dir / "e2.json").write_text(json.dumps(_event("dog.png")))
    _drain(spark, events_dir, coll, ckpt,
           object_type="IMAGE", object_bytes=object_bytes)

    (events_dir / "e3.json").write_text(json.dumps(_event(
        "dog.png", event="ObjectRemoved:Delete", t="2024-01-02T00:00:00Z",
    )))
    (events_dir / "e4.json").write_text(
        json.dumps(_event("fox.png", t="2024-01-02T00:00:01Z"))
    )
    _drain(spark, events_dir, coll, ckpt,
           object_type="IMAGE", object_bytes=object_bytes)

    snap = {r.key: r for r in coll.snapshot().collect()}
    assert set(snap) == {"cat.png", "fox.png"}
    assert all(len(r.embedding) == 512 for r in snap.values())

    hits = coll.search(stub_image_embedding(blobs["cat.png"]), k=2).collect()
    assert [h.key for h in hits] == ["cat.png", "fox.png"]
    assert hits[0].distance == 0.0


def test_image_ingest_survives_missing_object_bytes(spark, tmp_path):
    """A PUT event whose object bytes are absent from the store (left
    join → NULL content) must NOT crash the micro-batch into a forever
    retry: the missing row is dropped with a logged count and every
    other upsert in the same batch lands."""
    from python_vectordbapp_ceph_spark.embed import stub_image_embedding

    events_dir = tmp_path / "events"
    events_dir.mkdir()
    coll = VectorCollection(
        spark=spark, path=str(tmp_path / "icoll"), dim=512, name="imgs"
    ).ensure_exists()
    # 'ghost.png' has an event but NO bytes in the object store
    object_bytes = spark.createDataFrame(
        [("cat.png", b"\x89PNG-fake-cat-bytes")], "key string, content binary"
    )
    (events_dir / "e1.json").write_text(json.dumps(_event("cat.png")))
    (events_dir / "e2.json").write_text(json.dumps(_event("ghost.png")))
    _drain(spark, events_dir, coll, tmp_path / "ckpt",
           object_type="IMAGE", object_bytes=object_bytes)

    snap = {r.key: r for r in coll.snapshot().collect()}
    assert set(snap) == {"cat.png"}  # ghost dropped, batch not wedged
    assert snap["cat.png"].embedding == stub_image_embedding(
        b"\x89PNG-fake-cat-bytes"
    )
