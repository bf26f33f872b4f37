"""Custom Python DataSource WRITER (Spark 4 DataSource API): a
JSON-lines audit sink with real two-phase commit.

The read side of the API is covered by sources/event_source.py (batch
+ streaming); this is the WRITE contract: every task stages its
partition to a ``*.tmp`` file and returns a commit message; the
driver's ``commit()`` atomically renames all staged files and drops a
``_MANIFEST.json`` recording file→row-count (the audit trail); a
failed job's ``abort()`` removes the stage files so a crashed write
leaves NOTHING visible. That is exactly the semantics an object-store
audit/export sink needs (RGW has no rename-into-place transactions —
staging + manifest is the standard commit protocol, cf. the S3A
committers configured in session.ceph_s3a_conf).

Usage::

    df.write.format("audit_jsonl").option("path", out).mode("append").save()

Scale: one staged file per partition, written streamingly from the
row iterator (no buffering of the partition in memory); the driver
only ever sees the small commit messages, never data.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


class AuditCommit(WriterCommitMessage):
    def __init__(self, tmp_path: str, final_name: str, n_rows: int):
        self.tmp_path = tmp_path
        self.final_name = final_name
        self.n_rows = n_rows


class AuditWriter(DataSourceWriter):
    def __init__(self, path: str, schema: StructType, overwrite: bool):
        self.path = path
        self.fields = schema.fieldNames()
        self.overwrite = overwrite

    def write(self, iterator) -> AuditCommit:
        os.makedirs(self.path, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl"
        tmp = os.path.join(self.path, name + ".tmp")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                rec = {k: row[i] for i, k in enumerate(self.fields)}
                f.write(json.dumps(rec, default=str) + "\n")
                n += 1
        return AuditCommit(tmp, name, n)

    def commit(self, messages) -> None:
        manifest = []
        for m in messages:
            final = os.path.join(self.path, m.final_name)
            os.rename(m.tmp_path, final)
            manifest.append({"file": m.final_name, "rows": m.n_rows})
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            json.dump(
                {
                    "files": sorted(manifest, key=lambda x: x["file"]),
                    "total_rows": sum(x["rows"] for x in manifest),
                },
                f,
            )

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.remove(m.tmp_path)
            except FileNotFoundError:
                pass


class AuditJsonlDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "audit_jsonl"

    def writer(self, schema: StructType, overwrite: bool) -> AuditWriter:
        path = self.options.get("path")
        if not path:
            raise ValueError("audit_jsonl: option 'path' is required")
        return AuditWriter(path, schema, overwrite)


def register(spark) -> None:
    spark.dataSource.register(AuditJsonlDataSource)
