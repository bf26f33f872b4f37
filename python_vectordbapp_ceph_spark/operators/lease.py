"""Single-writer lease for the manifest-committed ledgers.

Every race inside the commit protocol itself is already safe by
construction: writers stage into uniquely-named generation directories
and publish with one rename-without-overwrite, so a publish loser can
never have touched the winner's files (operators/merge.py). The ONE
unsafe composition is a second writer racing an ARMED maintenance pass:
``vacuum()`` reclaims any staged generation no retained manifest
references, and writer B's not-yet-published staging is
indistinguishable from a crashed orphan — writer A's vacuum can delete
it mid-flight, and B's publish then commits a manifest pointing at a
missing directory (silent data loss; the r10 verdict's one documented-
but-unenforced constraint). This module turns that misuse into a
fail-fast error: at most one live writer per ledger path.

Mechanics — built from the SAME primitive the commit protocol trusts
(rename-without-overwrite, atomic on HDFS/POSIX; conditional-put on
object stores):

  - ``acquire_writer_lease`` stages ``_commits/.tmp-*`` and renames it
    onto ``_commits/_writer.lease``; rename success IS acquisition.
    A fresh existing lease (heartbeat younger than its TTL) makes the
    acquire poll briefly, then raise :class:`LedgerLockedError` naming
    the holder. A stale lease (holder died without release) is broken
    and re-raced.
  - ``heartbeat()`` (called once per micro-batch by the streaming
    sinks) re-verifies ownership and republishes the lease with a
    fresh timestamp. If the file was stolen/broken in the meantime the
    heartbeat raises — the displaced writer FAILS its batch instead of
    publishing into a ledger someone else now maintains.
  - ``release()`` deletes the lease iff still owned. A hard-killed
    writer leaves its lease behind; the TTL bounds how long that
    blocks a restart (and the restart may pass ``steal=True`` when the
    operator knows the holder is dead — e.g. the checkpoint lock
    already guarantees it was the same query).

The heartbeat republish is delete+rename (two steps, not atomic). The
window is safe: a racer that acquires inside it wins the rename, the
heartbeater's rename then fails and it raises — one writer wins, the
other raises, nobody's staging is reclaimed while its lease is live.

Reference anchor: the reference delegates concurrent-writer safety to
its backends (milvus upsert is backend-atomic,
milvus-app/pythonvectordbceph_milvus.py:154; RGW serializes object
puts) — the Spark rebuild owns the ledger layout, so it owns the lock.
"""

from __future__ import annotations

import json
import time
import uuid

from pyspark.sql import SparkSession

from .merge import _COMMITS, _fs

LEASE_FILE = "_writer.lease"
# Generous enough that no single micro-batch outlives it (heartbeats
# are per batch), small enough that a hard-killed writer doesn't block
# the restart for long. Streaming callers override per deployment.
LEASE_TTL_MS = 10 * 60 * 1000
# acquire() polls this long before declaring the ledger locked — masks
# the instant between a finished writer's termination and its async
# release without weakening fail-fast for genuinely live holders.
ACQUIRE_TIMEOUT_MS = 10_000
_POLL_MS = 200


class LedgerLockedError(RuntimeError):
    """Another live writer holds (or took) the ledger's writer lease."""


def _now_ms() -> int:
    return int(time.time() * 1000)


class WriterLease:
    """A held lease. Use :func:`acquire_writer_lease` to obtain one."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        ttl_ms: int,
        lease_path: str | None = None,
    ):
        self._spark = spark
        self.path = path
        self.ttl_ms = int(ttl_ms)
        self.owner = uuid.uuid4().hex
        self.acquired_ms: int | None = None
        # default location: inside the ledger's _commits dir. Layouts
        # whose root gets atomically SWAPPED (the IVF rebuild's
        # two-rename) pass a SIBLING lease_path instead — a lease
        # inside the directory would swap/vanish with it.
        self._lease_path = lease_path or f"{path}/{_COMMITS}/{LEASE_FILE}"

    # -- file plumbing ----------------------------------------------------
    @property
    def lease_path(self) -> str:
        return self._lease_path

    def _read(self) -> dict | None:
        """The current lease record, or None if absent/unreadable (a
        torn read can only happen inside a heartbeat's delete+rename
        window — treated as absent, the acquire race decides)."""
        fs, hpath = _fs(self._spark, self.path)
        p = hpath(self.lease_path)
        try:
            if not fs.exists(p):
                return None
            stream = fs.open(p)
            try:
                jvm = self._spark._jvm  # noqa: SLF001
                data = bytes(
                    jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
                ).decode("utf-8")
            finally:
                stream.close()
            return json.loads(data)
        except Exception:
            return None

    def _try_publish(self) -> bool:
        """Stage + rename-without-overwrite. True = we own the file."""
        fs, hpath = _fs(self._spark, self.path)
        cdir = self._lease_path.rsplit("/", 1)[0]
        fs.mkdirs(hpath(cdir))
        tmp = hpath(f"{cdir}/.tmp-lease-{uuid.uuid4().hex}.json")
        out = fs.create(tmp, True)
        try:
            payload = {
                "owner": self.owner,
                "acquired_ms": self.acquired_ms or _now_ms(),
                "heartbeat_ms": _now_ms(),
                "ttl_ms": self.ttl_ms,
            }
            out.write(bytearray(json.dumps(payload).encode("utf-8")))
        finally:
            out.close()
        if fs.rename(tmp, hpath(self.lease_path)):
            return True
        fs.delete(tmp, False)
        return False

    # -- lifecycle ---------------------------------------------------------
    def heartbeat(self) -> None:
        """Refresh the lease timestamp; raises LedgerLockedError if the
        lease was stolen or broken since (the caller must abort its
        write — someone else's maintenance may now reclaim its staging).
        """
        cur = self._read()
        if cur is None or cur.get("owner") != self.owner:
            raise LedgerLockedError(
                f"writer lease for {self.path} lost (now held by "
                f"{cur.get('owner', '<none>') if cur else '<none>'}) — "
                "aborting: continuing could publish into a ledger another "
                "writer is compacting/vacuuming"
            )
        fs, hpath = _fs(self._spark, self.path)
        fs.delete(hpath(self.lease_path), False)
        if not self._try_publish():
            raise LedgerLockedError(
                f"writer lease for {self.path} lost during heartbeat "
                "(another writer acquired in the republish window)"
            )

    def release(self) -> None:
        """Delete the lease iff still ours (idempotent, never raises —
        called from finally paths)."""
        try:
            cur = self._read()
            if cur is not None and cur.get("owner") == self.owner:
                fs, hpath = _fs(self._spark, self.path)
                fs.delete(hpath(self.lease_path), False)
        except Exception:
            pass


def acquire_writer_lease(
    spark: SparkSession,
    path: str,
    ttl_ms: int = LEASE_TTL_MS,
    timeout_ms: int = ACQUIRE_TIMEOUT_MS,
    steal: bool = False,
    lease_path: str | None = None,
) -> WriterLease:
    """Acquire the single-writer lease for the layout at ``path``.

    Polls up to ``timeout_ms`` (a just-finished writer's async release
    lands within milliseconds; a live writer keeps its heartbeat fresh
    for the whole window), then raises :class:`LedgerLockedError`.
    ``steal=True`` breaks a live lease unconditionally — only for an
    operator who KNOWS the holder is dead (e.g. restarting the one
    stream that owns this checkpoint after a hard kill).
    ``lease_path`` overrides the lease file location (default
    ``<path>/_commits/_writer.lease``) — swapped layouts keep it as a
    SIBLING of the directory they guard."""
    lease = WriterLease(spark, path, ttl_ms, lease_path=lease_path)
    deadline = _now_ms() + max(0, int(timeout_ms))
    while True:
        cur = lease._read()
        now = _now_ms()
        if cur is None:
            lease.acquired_ms = now
            if lease._try_publish():
                return lease
            # lost the rename race — someone else just acquired
        elif steal or now > int(cur.get("heartbeat_ms", 0)) + int(
            cur.get("ttl_ms", ttl_ms)
        ):
            # expired (holder died without release) or explicit steal:
            # break it, then re-race the acquire rename
            fs, hpath = _fs(spark, path)
            fs.delete(hpath(lease.lease_path), False)
            continue
        if _now_ms() > deadline:
            holder = cur.get("owner", "<unknown>") if cur else "<racer>"
            raise LedgerLockedError(
                f"ledger at {path} already has a live writer (lease owner "
                f"{holder}, heartbeat "
                f"{now - int(cur.get('heartbeat_ms', now)) if cur else 0} ms "
                "ago). One writer per ledger path: stop the other stream, "
                "or pass steal=True if you KNOW it is dead."
            )
        time.sleep(_POLL_MS / 1000.0)
