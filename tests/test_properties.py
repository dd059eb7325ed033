"""Property-based tests (hypothesis) for the core operator semantics —
the upgrade over the reference's smoke-only testing (SURVEY §5).

Each property runs on small generated event frames (shared Spark session,
bounded examples: Spark jobs are ~100ms each)."""

import datetime as dt

import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from big_data_analytics_project_spark.operators.sessionization import (
    first_conversion_join,
    first_conversion_window,
    leakage_cutoff,
)

EVENT_TYPES = ["view", "click", "purchase", "signup"]

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),      # user_id
        st.integers(min_value=0, max_value=3600),   # ts offset seconds
        st.sampled_from(EVENT_TYPES),
        st.floats(min_value=0, max_value=100, allow_nan=False),
    ),
    min_size=1,
    max_size=40,
)


def _frame(spark, rows):
    base = dt.datetime(2024, 1, 1)
    data = [
        (i, u, base + dt.timedelta(seconds=s), t, v)
        for i, (u, s, t, v) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )


@settings(max_examples=12, deadline=None)
@given(rows=events_strategy)
def test_window_join_equivalence_property(spark, rows):
    """The window and join formulations of first-conversion marking agree
    on arbitrary event sets (incl. duplicate timestamps, no-purchase
    users, purchase-first users)."""
    ev = _frame(spark, rows)
    w = first_conversion_window(ev, "user_id", "ts")
    j = first_conversion_join(ev, "user_id", "ts")
    got_w = sorted(
        (r.event_id, r.first_conversion_ts) for r in w.collect()
    )
    got_j = sorted(
        (r.event_id, r.first_conversion_ts) for r in j.collect()
    )
    assert got_w == got_j


@settings(max_examples=12, deadline=None)
@given(rows=events_strategy)
def test_leakage_cutoff_properties(spark, rows):
    """Invariants of the cutoff: (1) non-converting users keep every row;
    (2) no surviving row is strictly later than its user's first purchase;
    (3) every user's first purchase row survives."""
    ev = _frame(spark, rows)
    kept = leakage_cutoff(first_conversion_window(ev, "user_id", "ts"), "ts")

    purchasers = {
        r.user_id: r.first_ts
        for r in ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"))
        .collect()
    }
    all_rows = {r.event_id: r for r in ev.collect()}
    kept_ids = {r.event_id for r in kept.collect()}

    for eid, r in all_rows.items():
        if r.user_id not in purchasers:
            assert eid in kept_ids  # (1)
        elif r.ts <= purchasers[r.user_id]:
            assert eid in kept_ids  # (3) incl. ties
        else:
            assert eid not in kept_ids  # (2)


# --- round-5 operators ----------------------------------------------------

asof_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),      # user_id
        st.integers(min_value=0, max_value=600),    # ts offset seconds
        st.booleans(),                              # left (True) / right side
    ),
    min_size=1,
    max_size=24,
)


@settings(max_examples=10, deadline=None)
@given(rows=asof_rows)
def test_asof_equals_naive_argmax_property(spark, rows):
    """asof_join (union+window) == per-left-row argmax over the range
    theta-join, on arbitrary key/timestamp mixes — including equal
    timestamps across sides, keys with only-left or only-right rows."""
    from big_data_analytics_project_spark.operators.asof import asof_join

    base = dt.datetime(2024, 1, 1)
    lefts, rights = [], []
    for i, (u, s, is_left) in enumerate(rows):
        (lefts if is_left else rights).append((i, u, base + dt.timedelta(seconds=s)))
    if not lefts:
        return
    left = spark.createDataFrame(lefts, "lid long, user_id long, ts timestamp")
    # one right row per (user, ts): pre-aggregate like production callers
    raw_right = [(i, u, t) for i, u, t in rights]
    right = (
        spark.createDataFrame(raw_right, "rid long, user_id long, ts timestamp")
        .groupBy("user_id", "ts")
        .agg(F.max("rid").alias("rid"))
        if raw_right
        else spark.createDataFrame([], "user_id long, ts timestamp, rid long")
    )
    got = {
        r["lid"]: r["asof_rid"]
        for r in asof_join(left, right, ["user_id"], "ts", ["rid"]).collect()
    }
    want = {}
    rset = [tuple(r) for r in right.collect()]
    for lid, u, t in lefts:
        cand = [(ts, rid) for (ru, ts, rid) in rset if ru == u and ts <= t]
        want[lid] = max(cand)[1] if cand else None
    assert got == want


pack_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),     # shard
        st.integers(min_value=1, max_value=50),    # n_tokens
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=10, deadline=None)
@given(rows=pack_rows, budget=st.integers(min_value=10, max_value=100))
def test_pack_linear_matches_sequential_cumsum_property(spark, rows, budget):
    """Distributed window packing == the sequential one-pass reference
    implementation, for any shard mix, token sizes, and budget."""
    from big_data_analytics_project_spark.operators.packing import pack_linear

    data = [(i, s, n) for i, (s, n) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id long, shard long, n_tokens long")
    got = {
        r["doc_id"]: (r["bin_id"], r["bin_offset_tokens"])
        for r in pack_linear(df, "shard", "doc_id", "n_tokens", budget).collect()
    }
    want = {}
    for shard in {s for _, s, _ in data}:
        pos = 0
        for doc_id, s, n in sorted(d for d in data if d[1] == shard):
            want[doc_id] = (pos // budget, pos)
            pos += n
    assert got == want


budget_rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),        # stratum id
        st.integers(min_value=1, max_value=50),       # weight (tokens)
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=10, deadline=None)
@given(rows=budget_rows_strategy, budget=st.integers(min_value=1, max_value=120))
def test_budget_select_matches_sequential_draw_property(spark, rows, budget):
    """budget_select equals the obvious sequential reference: walk each
    stratum in (hash, key) order accumulating weights, keep rows while
    the running total BEFORE the row is under budget (first crossing
    included)."""
    from big_data_analytics_project_spark.operators.dedup import md5_hash60
    from big_data_analytics_project_spark.operators.sampling import budget_select

    data = [(i, f"s{s}", w) for i, (s, w) in enumerate(rows)]
    df = spark.createDataFrame(data, "rid long, stratum string, w long")

    got = {
        r["rid"]: r["cum_w"]
        for r in budget_select(
            df, stratum="stratum", key="rid", weight="w", budget=budget
        ).collect()
    }

    # sequential reference, ordered by the SAME portable hash
    hashes = {
        r["rid"]: r["h"]
        for r in df.select(
            "rid", md5_hash60(F.col("rid").cast("string")).alias("h")
        ).collect()
    }
    want = {}
    by_stratum = {}
    for rid, s, w in data:
        by_stratum.setdefault(s, []).append((hashes[rid], rid, w))
    for s, members in by_stratum.items():
        cum = 0
        for _, rid, w in sorted(members):
            if cum < budget:
                cum += w
                want[rid] = cum
            else:
                break
    assert got == want


# --- as-of join vs pandas merge_asof (both directions) ---------------------

asof_strategy = st.tuples(
    st.lists(  # left events: (key, ts offset)
        st.tuples(
            st.integers(min_value=1, max_value=3),
            st.integers(min_value=0, max_value=600),
        ),
        min_size=1,
        max_size=15,
    ),
    st.lists(  # right events: (key, ts offset, value)
        st.tuples(
            st.integers(min_value=1, max_value=3),
            st.integers(min_value=0, max_value=600),
            st.integers(min_value=0, max_value=999),
        ),
        min_size=1,
        max_size=15,
    ),
    st.sampled_from(["backward", "forward"]),
    st.sampled_from([None, 60]),
)


@given(asof_strategy)
@settings(max_examples=12, deadline=None)
def test_asof_join_matches_pandas_merge_asof(spark, case):
    import pandas as pd

    from big_data_analytics_project_spark.operators.asof import asof_join

    left_rows, right_rows, direction, tol = case
    base = dt.datetime(2024, 1, 1)
    # dedupe right per (key, ts): "the" match is undefined otherwise
    # (documented operator caveat, same as pandas/DuckDB) — keep max v
    rmap = {}
    for k, s, v in right_rows:
        rmap[(k, s)] = max(v, rmap.get((k, s), -1))
    left = spark.createDataFrame(
        [
            (i, k, base + dt.timedelta(seconds=s))
            for i, (k, s) in enumerate(left_rows)
        ],
        "lid long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (k, base + dt.timedelta(seconds=s), v)
            for (k, s), v in rmap.items()
        ],
        "k long, ts timestamp, v long",
    )
    got = {
        r["lid"]: r["asof_v"]
        for r in asof_join(
            left,
            right,
            on=["k"],
            ts_col="ts",
            right_value_cols=["v"],
            tolerance_sec=tol,
            direction=direction,
        ).collect()
    }
    lpd = left.toPandas().sort_values("ts", kind="stable")
    rpd = right.toPandas().sort_values("ts", kind="stable")
    merged = pd.merge_asof(
        lpd,
        rpd,
        on="ts",
        by="k",
        direction=direction,
        tolerance=pd.Timedelta(seconds=tol) if tol is not None else None,
        allow_exact_matches=True,
    )
    want = {
        int(r.lid): (None if pd.isna(r.v) else int(r.v))
        for r in merged.itertuples()
    }
    assert got == want
