"""Custom stateful streaming operators on the transformWithState API
(Spark 4's arbitrary-state surface — the successor to
applyInPandasWithState used in windows.py::stateful_running_count;
both are kept: the old API for the migration story, this one as the
current recommended path).

Operator: per-key streaming top-k — each key maintains the k largest
values seen so far in a ValueState (with optional TTL so abandoned
keys age out of the store), emitting the refreshed top-k rows on
every update. The batch twin is a rank window
(`row_number() over (partition by key order by value desc) <= k`),
and the stream-equals-batch equivalence is pytest-pinned.

Scale: state per key is O(k), independent of stream length — the
RocksDB state store shards by key hash across executors exactly like
a shuffle, so a billion keys cost a billion·k state rows, never
a rescan of the stream.

Environment gate: transformWithState's Python worker protocol needs
``google.protobuf``, which this container lacks (and installs are
off-limits) — ``tws_available()`` reports whether the operator can
run; the pytest skips cleanly when it can't. The
applyInPandasWithState twin (windows.py::stateful_running_count) is
the always-runnable stateful path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle


class TopKProcessor(StatefulProcessor):
    """Keep the k largest (value, id) pairs per key; ties broken by
    the unique id ascending so the result is deterministic. Column
    names are threaded from the operator (not hardcoded) so any
    key/value/id schema works — the processor and the operator's
    outputStructType stay in lockstep."""

    def __init__(
        self,
        k: int,
        ttl_ms: int | None = None,
        key_col: str = "user_id",
        value_col: str = "value",
        id_col: str = "event_id",
    ):
        self._k = k
        self._ttl_ms = ttl_ms
        self._key_col = key_col
        self._value_col = value_col
        self._id_col = id_col

    def init(self, handle: StatefulProcessorHandle) -> None:
        # one row of state per key: parallel arrays of the top values
        # and their ids (bounded at k elements)
        self._state = handle.getValueState(
            "topk", "vals array<double>, ids array<bigint>", self._ttl_ms
        )

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        if self._state.exists():
            vals, ids = self._state.get()
            pairs = list(zip(vals, ids))
        else:
            pairs = []
        for pdf in rows:
            pairs.extend(zip(pdf[self._value_col], pdf[self._id_col]))
        # largest value first; id ascending as the deterministic tiebreak
        pairs.sort(key=lambda p: (-p[0], p[1]))
        pairs = pairs[: self._k]
        self._state.update(
            ([float(v) for v, _ in pairs], [int(i) for _, i in pairs])
        )
        yield pd.DataFrame(
            {
                self._key_col: [int(key[0])] * len(pairs),
                "rnk": list(range(1, len(pairs) + 1)),
                self._value_col: [v for v, _ in pairs],
                self._id_col: [i for _, i in pairs],
            }
        )

    def close(self) -> None:
        pass


def stateful_topk_stream(
    stream: DataFrame,
    k: int = 3,
    key_col: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Per-key streaming top-k via transformWithStateInPandas.
    Update output mode: each batch re-emits the keys it touched with
    their refreshed top-k (idempotent to replay — the sink upserts)."""
    return stream.groupBy(key_col).transformWithStateInPandas(
        TopKProcessor(k, ttl_ms, key_col, value_col, id_col),
        outputStructType=(
            f"{key_col} long, rnk int, {value_col} double, {id_col} long"
        ),
        outputMode="Update",
        timeMode="None",
    )


def tws_available() -> bool:
    """True when the transformWithState Python worker can start
    (its wire protocol imports google.protobuf)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False
