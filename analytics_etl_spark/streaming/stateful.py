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
