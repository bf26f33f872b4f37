"""PySpark-native analytics engine with the capabilities of
thotz/python-vectordbapp-ceph, rebuilt Spark-first.

The reference (read-only snapshot at /root/reference) is an event-driven
vector-ingest + ANN-search pipeline over Milvus / Ceph RGW S3 Vectors.
This package re-expresses that capability surface — keyed vector
collections, upsert/delete mutation semantics, top-k ANN search,
filtered search, plus the surrounding LLM-data-pipeline operator set
(dedup, similarity join, text analysis, multimodal columns) — as
idiomatic Spark DataFrame / SQL / Structured Streaming plans designed
for 100 TB scale.

Layout:
    session       SparkSession builder (Arrow on, AQE on, UTC)
    io            parquet table loaders for the driver test tables
    functions/    column-level expression builders (vector, text)
    operators/    dataframe-level operators (knn, ivf, dedup, mutation)
    streaming/    Structured Streaming surface (windows, ingest)
    embed/        embedding UDFs (stubbed models, iterator pandas_udf)
    multimodal/   binary-column plumbing (decode stubs, metadata)
    collection    VectorCollection: bucket→table abstraction
    queries       the full query registry used by __spark_entry__
"""

__version__ = "0.1.0"

# Make this package importable inside forked Python UDF workers no
# matter the harness CWD: workers inherit the driver process's
# environment (not its sys.path mutations), so a driver running from
# another directory would otherwise hit ModuleNotFoundError the first
# time a pandas UDF defined in these modules is deserialized.
import os as _os
import sys as _sys

_pkg_root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _pkg_root not in _sys.path:
    _sys.path.insert(0, _pkg_root)
_pp = _os.environ.get("PYTHONPATH", "")
if _pkg_root not in _pp.split(_os.pathsep):
    _os.environ["PYTHONPATH"] = (
        _pkg_root + (_os.pathsep + _pp if _pp else "")
    )
del _os, _sys, _pp, _pkg_root
