"""Custom Python DataSource WRITER (Spark 4 DataSource API) — the
write-side twin of sources/event_source.py's custom reader.

Models the reference's vector PUT path (s3vectors
``put_vectors(vectors=[{key, data, metadata}])`` —
s3vectors-app/pythonvectordbceph.py:194-206) as a Spark sink with the
API's full two-phase commit contract:

  - ``write(iterator)`` runs once per partition/task and stages rows
    to a task-private file (``_tmp_<uuid>``) — a retried or
    speculative task stages a DIFFERENT file, so partial output never
    collides;
  - the returned ``WriterCommitMessage`` carries (staged path, row
    count) back to the driver;
  - ``commit(messages)`` atomically renames every staged file into
    place and writes a ``_MANIFEST`` JSON (total rows, file list) —
    readers treat the manifest as the visibility point, giving the
    all-or-nothing semantics the reference gets from its backend;
  - ``abort(messages)`` deletes staged files, leaving prior data
    untouched.

This is the idempotent-upsert sink discipline (B5/A11) expressed in
the DataSource API rather than foreachBatch: at 100 TB each task
streams its partition straight to storage and only pointer-sized
commit messages converge on the driver.

JSONL keeps the demo hermetic (no external store in the container);
swapping ``_emit`` for a boto3/S3Vectors client call reproduces the
reference wire format exactly. NOTE the local-path staging (os.*)
assumes tasks and driver share the filesystem — true in local mode
and on shared mounts; the real-store swap replaces both the staged
write and the commit rename with the store's own conditional-put, so
the assumption disappears with the demo.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    WriterCommitMessage,
)


@dataclass
class _Staged(WriterCommitMessage):
    path: str
    rows: int


def _map_fixers(schema) -> dict:
    """Per-column converters restoring Arrow's list-of-pairs MAP
    representation to the dict wire shape Row.asDict produced (the
    reference's metadata dict), recursing through lists and structs.
    Columns without map content get no entry — zero per-row cost."""
    import pyarrow as pa

    def fixer(t):
        if pa.types.is_map(t):
            item = fixer(t.item_type)
            if item is None:
                return lambda v: None if v is None else dict(v)
            return (
                lambda v: None
                if v is None
                else {k: item(x) for k, x in v}
            )
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            inner = fixer(t.value_type)
            if inner is None:
                return None
            return lambda v: None if v is None else [inner(x) for x in v]
        if pa.types.is_struct(t):
            subs = {}
            for f in t:
                fx = fixer(f.type)
                if fx is not None:
                    subs[f.name] = fx

            if not subs:
                return None

            def fix_struct(v):
                if v is None:
                    return None
                for k, fx in subs.items():
                    v[k] = fx(v[k])
                return v

            return fix_struct
        return None

    out = {}
    for f in schema:
        fx = fixer(f.type)
        if fx is not None:
            out[f.name] = fx
    return out


class VectorPutWriter(DataSourceArrowWriter):
    def __init__(self, options, overwrite: bool):
        self._dir = options.get("path")
        if not self._dir:
            raise ValueError("vector_put sink requires a 'path' option")
        self._overwrite = overwrite

    # -- executor side ------------------------------------------------
    def write(self, iterator) -> _Staged:
        """Rows arrive as Arrow RecordBatches (DataSourceArrowWriter,
        guide §4): the plain DataSourceWriter path pickled every row
        into a Row object that write() then re-flattened with asDict —
        per-row JVM→Python overhead the Arrow batches skip entirely.
        ``to_pylist`` yields plain dicts in schema order, so the
        json.dumps output is byte-identical to the old per-Row path
        for the wire's scalar/array types."""
        os.makedirs(self._dir, exist_ok=True)
        staged = os.path.join(self._dir, f"_tmp_{uuid.uuid4().hex}.jsonl")
        n = 0
        fixers = None
        dumps = json.dumps
        with open(staged, "w") as f:
            for batch in iterator:  # pyarrow.RecordBatch per Arrow chunk
                # the reference's put_vectors row shape: key + float32
                # data + metadata dict (pythonvectordbceph.py:194-206)
                if fixers is None:
                    fixers = _map_fixers(batch.schema)
                recs = batch.to_pylist()
                for col, fx in fixers.items():
                    for r in recs:
                        r[col] = fx(r[col])
                f.write(
                    "".join(dumps(r, default=str) + "\n" for r in recs)
                )
                n += len(recs)
        return _Staged(path=staged, rows=n)

    # -- driver side, after ALL tasks succeeded -----------------------
    def commit(self, messages) -> None:
        final_files, total = [], 0
        for m in messages:
            if m is None:
                continue
            final = m.path.replace("_tmp_", "part_")
            os.replace(m.path, final)
            final_files.append(os.path.basename(final))
            total += m.rows
        manifest = {"rows": total, "files": sorted(final_files)}
        with open(os.path.join(self._dir, "_MANIFEST"), "w") as f:
            json.dump(manifest, f)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class VectorPutDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "vector_put"

    def writer(self, schema, overwrite: bool) -> VectorPutWriter:
        return VectorPutWriter(self.options, overwrite)


def register_vector_sink(spark) -> None:
    spark.dataSource.register(VectorPutDataSource)


def read_manifest(path: str) -> dict:
    """Committed-state probe: the manifest IS the visibility point."""
    with open(os.path.join(path, "_MANIFEST")) as f:
        return json.load(f)
