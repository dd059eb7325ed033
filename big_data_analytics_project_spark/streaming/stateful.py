"""Custom stateful streaming operator: hand-rolled gap sessionization via
``applyInPandasWithState`` (T2's semantics re-implemented as arbitrary
per-key state — the pattern for stateful logic that ``session_window``
can't express, e.g. per-session ML features, anomaly scoring, cross-event
invariants).

Contrast with ``processor.session_features`` (the built-in
``session_window`` operator): here WE own the state machine —

- state per user: the open session (start, last, n, total, converted);
- a micro-batch folds its (event-time-sorted) rows into that state,
  emitting sessions closed by an in-batch gap;
- the engine fires an **event-time timeout** when the watermark passes
  ``last + gap``, which finalizes and evicts sessions that ended without
  a successor event — exactly-once append emission of every closed
  session, state bounded by active (open) sessions.

Scale shape: groups are hash-partitioned by user; each executor holds only
its keys' open-session rows (a few dozen bytes each); Arrow moves batches,
never collects.  Late rows beyond the watermark are filtered by the engine
before reaching the function (same contract as the built-in windows).

Reference anchor: ``src/streaming/stream_processor.py`` approximates
sessions with sliding windows; this is the exact-session upgrade with
custom state, per SURVEY §2.8/T2 note.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

SESSION_OUT_SCHEMA = (
    "user_id long, session_start_epoch long, session_end_epoch long, "
    "n_events long, sum_value double, converted long"
)
SESSION_STATE_SCHEMA = "start long, last long, n long, total double, conv long"


def sessionize_with_state(
    stream: DataFrame,
    gap_sec: int = 1800,
    watermark: str = "10 minutes",
    value_quantum: int | None = None,
) -> DataFrame:
    """Gap-based sessionization with explicit per-user state.  Emits one
    row per CLOSED session (append semantics): closed either by a
    follow-up event arriving > gap later, or by the event-time timeout
    when the watermark passes the session's end + gap.

    ``value_quantum``: when set (e.g. 100 for cent-quantized values), the
    per-session value accumulates as integer quanta — ``round(v *
    quantum)`` — instead of raw float addition, and ``sum_value`` emits as
    ``total_quanta / quantum``.  Integer accumulation is exact and
    order-independent (quanta counts stay far below 2^53), which makes the
    emitted sum bit-reproducible across arrival orders, partitionings, and
    engines — required for the differential oracle, and the right
    accumulator design for money-like measures at any scale."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    events = stream.withWatermark("ts", watermark).select(
        "user_id",
        "ts",
        F.unix_timestamp("ts").alias("ts_epoch"),
        "event_type",
        "value",
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user = key[0]

        def row(s):
            return {
                "user_id": user,
                "session_start_epoch": int(s[0]),
                "session_end_epoch": int(s[1]),
                "n_events": int(s[2]),
                "sum_value": (
                    float(s[3]) / value_quantum if value_quantum else float(s[3])
                ),
                "converted": int(s[4]),
            }

        if state.hasTimedOut:
            # watermark passed last + gap with no successor: finalize
            closed = [row(state.get)] if state.exists else []
            state.remove()
            if closed:
                yield pd.DataFrame(closed)
            return

        batch = pd.concat(list(pdfs), ignore_index=True).sort_values("ts_epoch")
        cur = list(state.get) if state.exists else None
        closed = []
        for ts, et, val in zip(
            batch["ts_epoch"], batch["event_type"], batch["value"]
        ):
            ts = int(ts)
            v = float(val) if val == val else 0.0  # null value → 0 contribution
            if value_quantum:
                # half-AWAY-from-zero, matching the oracle's DECIMAL(18,2)
                # cast — Python round() is banker's (half-to-even) and would
                # land a cent off on any exact .5 quantized value (ADVICE r8)
                scaled = v * value_quantum
                v = float(
                    math.floor(scaled + 0.5) if scaled >= 0
                    else math.ceil(scaled - 0.5)
                )
            conv = 1 if et == "purchase" else 0
            if cur is None:
                cur = [ts, ts, 1, v, conv]
            elif ts - cur[1] > gap_sec:
                closed.append(row(cur))
                cur = [ts, ts, 1, v, conv]
            else:
                # late-but-in-watermark rows (cross-batch, ts < cur[1]) must
                # EXTEND the open session, never move its end backwards: the
                # gap above compares against the running MAX last, and the
                # bounds absorb the row via min/max
                cur[0] = min(cur[0], ts)
                cur[1] = max(cur[1], ts)
                cur[2] += 1
                cur[3] += v
                cur[4] = max(cur[4], conv)
        state.update(tuple(cur))
        # fire once the watermark passes the open session's gap horizon;
        # clamp above the current watermark (required by the engine when a
        # batch carries events older than an already-advanced watermark)
        state.setTimeoutTimestamp(
            max((cur[1] + gap_sec) * 1000, state.getCurrentWatermarkMs() + 1)
        )
        if closed:
            yield pd.DataFrame(closed)

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        SESSION_OUT_SCHEMA,
        SESSION_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
