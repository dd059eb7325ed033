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

    # Per-key handler cost is the operator's bottleneck (~4,500 Python
    # invocations per drain at sf0.1 — guide §4.5: hoist per-call setup,
    # vectorize per-call work).  r17 rewrite, semantics identical:
    # - the per-key ``pd.concat`` only runs when a key spans >1 Arrow
    #   chunk (it almost never does — one chunk per key per batch);
    # - ts / value / converted leave pandas ONCE as numpy arrays; the
    #   string event_type never converts to an object array (the r16
    #   rejected micro-opt's mistake) — the "purchase" compare runs
    #   vectorized inside pandas/Arrow and exits as a bool array;
    # - the NaN→0 guard and the half-away-from-zero quantization run
    #   vectorized (same IEEE ops elementwise, so identical quanta);
    # - the sort is a stable numpy argsort over the int64 ts column
    #   applied to the numeric arrays only.  The state fold itself is
    #   unchanged: gap closure, min/max bounds, integer-quanta totals.
    # Closed sessions emit as one column-wise DataFrame (no per-row
    # dicts).  Output values are bit-identical: same ints, same quanta
    # arithmetic, same float division at emission.
    import numpy as np

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user = key[0]

        def emit(sessions):
            return pd.DataFrame(
                {
                    "user_id": np.full(len(sessions), user, dtype=np.int64),
                    "session_start_epoch": np.fromiter(
                        (s[0] for s in sessions), np.int64, len(sessions)
                    ),
                    "session_end_epoch": np.fromiter(
                        (s[1] for s in sessions), np.int64, len(sessions)
                    ),
                    "n_events": np.fromiter(
                        (s[2] for s in sessions), np.int64, len(sessions)
                    ),
                    "sum_value": np.fromiter(
                        (
                            (s[3] / value_quantum if value_quantum else s[3])
                            for s in sessions
                        ),
                        np.float64,
                        len(sessions),
                    ),
                    "converted": np.fromiter(
                        (s[4] for s in sessions), np.int64, len(sessions)
                    ),
                }
            )

        if state.hasTimedOut:
            # watermark passed last + gap with no successor: finalize
            had = state.exists
            s = tuple(state.get) if had else None
            state.remove()
            if had:
                yield emit([s])
            return

        chunks = list(pdfs)
        batch = (
            chunks[0]
            if len(chunks) == 1
            else pd.concat(chunks, ignore_index=True)
        )
        ts_a = batch["ts_epoch"].to_numpy()
        conv_a = (batch["event_type"] == "purchase").to_numpy()
        val_a = batch["value"].to_numpy(dtype=np.float64, copy=True)
        val_a[np.isnan(val_a)] = 0.0  # null value → 0 contribution
        if value_quantum:
            # half-AWAY-from-zero, matching the oracle's DECIMAL(18,2)
            # cast — Python round() is banker's (half-to-even) and would
            # land a cent off on any exact .5 quantized value (ADVICE r8)
            scaled = val_a * value_quantum
            val_a = np.where(
                scaled >= 0, np.floor(scaled + 0.5), np.ceil(scaled - 0.5)
            )
        order = np.argsort(ts_a, kind="stable")
        ts_l = ts_a[order].tolist()
        conv_l = conv_a[order].tolist()
        val_l = val_a[order].tolist()

        cur = list(state.get) if state.exists else None
        closed = []
        for ts, v, conv in zip(ts_l, val_l, conv_l):
            ts = int(ts)
            conv = 1 if conv else 0
            if cur is None:
                cur = [ts, ts, 1, v, conv]
            elif ts - cur[1] > gap_sec:
                closed.append(cur)
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
            yield emit(closed)

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        SESSION_OUT_SCHEMA,
        SESSION_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
