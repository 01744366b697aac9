"""Custom stateful streaming operator — applyInPandasWithState.

The engine's example custom operator: per-user streaming
sessionization with explicit state (the batch version lives in
queries/analytics.sessionize_events). Each user's state carries the
last-seen timestamp and the running session count; a gap larger than
the timeout starts a new session.

This is the one place the engine uses per-group Python in streaming —
exactly the case the built-in operators can't express (arbitrary
evolving state per key with custom transition logic). Batches arrive
Arrow-encoded; state is a single tuple per key.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, n_sessions long"
STATE_SCHEMA = "last_us long, n_sessions long, n_events long"

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min, matches the batch op


def sessionize_stream(events: DataFrame, gap_us: int = SESSION_GAP_US) -> DataFrame:
    """events stream (with ts) → per-user running session counts.

    Grouped state lives on the executors, partitioned by user_id —
    state size is O(distinct users), not O(events).

    The state function is a CLOSURE (not a module-level function) on
    purpose: cloudpickle then ships it by value, so Python workers
    never need this package importable on their own sys.path — the
    engine works no matter what cwd the host session was created from.
    """
    from pyspark.sql import functions as F

    def sessionize_group(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        import pandas as _pd

        if state.exists:
            last_us, n_sessions, n_events = state.get
        else:
            last_us, n_sessions, n_events = None, 0, 0

        for pdf in pdfs:
            for us in sorted(pdf["us"]):
                us = int(us)
                if last_us is None or us - last_us > gap_us:
                    n_sessions += 1
                last_us = us
                n_events += 1

        state.update((last_us, n_sessions, n_events))
        yield _pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n_events], "n_sessions": [n_sessions]}
        )

    with_us = events.select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    return with_us.groupBy("user_id").applyInPandasWithState(
        sessionize_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def recent_events_state(events: DataFrame, k: int = 5) -> DataFrame:
    """Per-user last-K event cache + lifetime counter on the
    transformWithStateInPandas API (the Spark 4 StatefulProcessor
    successor to applyInPandasWithState above — typed state variables
    with per-state TTL instead of one monolithic state tuple).

    The operator is the feature-store primitive behind "user's N most
    recent events" online features: ListState holds at most K
    (ts, value) pairs per user (pruned every batch — state is O(users
    · K) forever, regardless of stream length), ValueState holds the
    lifetime event count. Emits (user_id, n_total, k_cached,
    max_recent) per updated user per micro-batch.

    Like sessionize_stream, the processor class is defined INSIDE the
    function so cloudpickle ships it by value and Python workers never
    need this package on sys.path.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _RecentK(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._n = handle.getValueState("n_total", "n bigint")
            self._recent = handle.getListState("recent", "us bigint, value double")

        def handleInputRows(self, key, rows, timer_values):
            import pandas as _pd

            items: list[tuple[int, float]] = []
            for pdf in rows:
                items.extend(
                    (int(u), float(v)) for u, v in zip(pdf["us"], pdf["value"])
                )
            if not items:
                return
            prev = (
                [(int(r[0]), float(r[1])) for r in self._recent.get()]
                if self._recent.exists()
                else []
            )
            kept = sorted(prev + items)[-k:]
            self._recent.put(kept)
            n = (self._n.get()[0] if self._n.exists() else 0) + len(items)
            self._n.update((n,))
            yield _pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_total": [n],
                    "k_cached": [len(kept)],
                    "max_recent": [max(v for _, v in kept)],
                }
            )

        def close(self) -> None:
            pass

    with_us = events.filter(F.col("value").isNotNull()).select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "value",
    )
    return with_us.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_RecentK(),
        outputStructType="user_id long, n_total long, k_cached int, max_recent double",
        outputMode="Update",
        timeMode="None",
    )


# ENVIRONMENT LIMIT (declared): transformWithStateInPandas talks to
# the JVM state server over a protobuf protocol; this container lacks
# google.protobuf (and installs are off-limits), so recent_events_state
# constructs and compiles but cannot EXECUTE here — the end-to-end
# test skips with this reason (tests/test_stateful_observe.py). The
# applyInPandasWithState operator above is the executable stateful
# path in this environment; on a stock Spark 4 cluster (protobuf
# ships with pyspark[connect] / most distros) recent_events_state
# runs as written.
#
# PERMANENT (r14 final attempt): `pip download protobuf` fails with
# NewConnectionError (no network egress) and installs are off-limits
# by the environment rules; vendoring is not viable either — the
# generated StateMessage_pb2 requires the full google.protobuf
# runtime (descriptor pool + message factory + wire-format codec),
# i.e. a shim would be a protobuf reimplementation, not a stub. The
# single declared pytest skip stands as the complete record.
