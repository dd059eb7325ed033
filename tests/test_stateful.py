"""Behavioral tests for the applyInPandasWithState custom sessionizer:
in-batch gap closure, cross-batch state carry, event-time-timeout
eviction, and append (exactly-once) emission."""

import json
import os

from big_data_analytics_project_spark.streaming import processor as P
from big_data_analytics_project_spark.streaming.stateful import sessionize_with_state


def _write_json(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _ev(eid, ts, user, etype="view", value=1.0):
    return {"event_id": eid, "ts": ts, "user_id": user,
            "event_type": etype, "value": value, "props": "{}"}


def test_stateful_sessionizer_gap_carry_and_timeout(spark, tmp_path):
    d = str(tmp_path / "stream")
    os.makedirs(d)
    # batch 1: user 7 — two events 20 min apart (one session), then a gap
    # > 30 min to a purchase (second session, still open at batch end)
    _write_json(
        os.path.join(d, "f0.json"),
        [
            _ev(1, "2024-01-02 10:00:00", 7),
            _ev(2, "2024-01-02 10:20:00", 7, value=2.5),
            _ev(3, "2024-01-02 12:00:00", 7, etype="purchase", value=5.0),
        ],
    )
    # batches 2-3: other-user events advancing the watermark past
    # 12:00 + gap, firing the event-time timeout for user 7's open session
    _write_json(os.path.join(d, "f1.json"), [_ev(10, "2024-01-02 14:00:00", 9)])
    _write_json(os.path.join(d, "f2.json"), [_ev(11, "2024-01-02 16:00:00", 9)])
    now = 1_700_000_000
    for i, f in enumerate(["f0.json", "f1.json", "f2.json"]):
        os.utime(os.path.join(d, f), (now + i * 100, now + i * 100))

    stream = P.read_event_stream(spark, d, max_files_per_trigger=1)
    out = P.run_to_completion(
        sessionize_with_state(stream, gap_sec=1800), "t_stateful", "append"
    )
    collected = out.collect()
    rows = sorted(
        (r.user_id, r.session_start_epoch, r.n_events, r.sum_value, r.converted)
        for r in collected
        if r.user_id == 7
    )
    # user 9's 14:00 session also times out once the watermark reaches
    # 15:50 — eviction applies to every key, not just the asserted one
    assert any(r.user_id == 9 for r in collected)
    base = 1704189600  # 2024-01-02 10:00:00 UTC
    assert rows == [
        # session 1: closed in-batch by the 12:00 event's gap
        (7, base, 2, 3.5, 0),
        # session 2: closed by event-time timeout (watermark passed 12:30)
        (7, base + 7200, 1, 5.0, 1),
    ]


def test_stateful_sessionizer_out_of_order_cross_batch(spark, tmp_path):
    """A late-but-within-watermark event arriving in a LATER micro-batch
    (ts older than the session's current end) must extend the open session
    downward, not drag session_end backwards — the buggy form then saw the
    next on-time event as > gap away and falsely split one session in two."""
    d = str(tmp_path / "stream")
    os.makedirs(d)
    # batch 1: 10:00 and 10:25 → watermark after the batch = 10:15
    _write_json(
        os.path.join(d, "f0.json"),
        [_ev(1, "2024-01-02 10:00:00", 7), _ev(2, "2024-01-02 10:25:00", 7)],
    )
    # batch 2: a LATE row at 10:16 (> watermark 10:15, so the engine
    # delivers it) plus an on-time row at 10:50.  10:50 - 10:25 < gap, so
    # all four events are ONE session; the buggy state machine rewound the
    # end to 10:16 and split at 10:50 (10:50 - 10:16 > 30 min).
    _write_json(
        os.path.join(d, "f1.json"),
        [_ev(3, "2024-01-02 10:16:00", 7), _ev(4, "2024-01-02 10:50:00", 7)],
    )
    # advance the watermark far enough to time out and emit the session
    _write_json(os.path.join(d, "f2.json"), [_ev(10, "2024-01-02 13:00:00", 9)])
    _write_json(os.path.join(d, "f3.json"), [_ev(11, "2024-01-02 15:00:00", 9)])
    now = 1_700_000_000
    for i, f in enumerate(["f0.json", "f1.json", "f2.json", "f3.json"]):
        os.utime(os.path.join(d, f), (now + i * 100, now + i * 100))

    stream = P.read_event_stream(spark, d, max_files_per_trigger=1)
    out = P.run_to_completion(
        sessionize_with_state(stream, gap_sec=1800), "t_stateful_ooo", "append"
    )
    user7 = [r for r in out.collect() if r.user_id == 7]
    assert len(user7) == 1, f"session falsely split: {user7}"
    base = 1704189600  # 2024-01-02 10:00:00 UTC
    assert user7[0].session_start_epoch == base
    assert user7[0].session_end_epoch == base + 3000  # 10:50
    assert user7[0].n_events == 4


def test_stateful_sessionizer_merges_within_gap_across_batches(spark, tmp_path):
    """An event in a later micro-batch within the gap must EXTEND the open
    session (state carry), not start a new one."""
    d = str(tmp_path / "stream")
    os.makedirs(d)
    _write_json(os.path.join(d, "f0.json"), [_ev(1, "2024-01-02 10:00:00", 7)])
    _write_json(os.path.join(d, "f1.json"), [_ev(2, "2024-01-02 10:15:00", 7)])
    # push the watermark far ahead so the merged session times out and emits
    _write_json(os.path.join(d, "f2.json"), [_ev(10, "2024-01-02 13:00:00", 9)])
    _write_json(os.path.join(d, "f3.json"), [_ev(11, "2024-01-02 15:00:00", 9)])
    now = 1_700_000_000
    for i, f in enumerate(["f0.json", "f1.json", "f2.json", "f3.json"]):
        os.utime(os.path.join(d, f), (now + i * 100, now + i * 100))

    stream = P.read_event_stream(spark, d, max_files_per_trigger=1)
    out = P.run_to_completion(
        sessionize_with_state(stream, gap_sec=1800), "t_stateful_merge", "append"
    )
    user7 = [r for r in out.collect() if r.user_id == 7]
    assert len(user7) == 1
    assert (user7[0].n_events, user7[0].sum_value) == (2, 2.0)
    # 15-minute session: end - start = 900s
    assert user7[0].session_end_epoch - user7[0].session_start_epoch == 900
