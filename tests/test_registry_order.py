"""The driver cross-checks only the FIRST 50 registered queries per round.

These tests pin the registry's driver-window derivation (see
``registry._driver_order``): the window is computed from the checked-in
``driver_history.json`` digest — never-driver-green oracle queries first,
then stalest-green first — and the EXACT expected round-6 window is pinned
here so adding a query can never silently evict a verified one.  If the
window composition changes (new query registered, history refreshed),
this test fails until ``EXPECTED_WINDOW`` is deliberately updated
(``python scripts/repin_window.py`` regenerates the block; committing
the diff is the acknowledgement).
"""

from big_data_analytics_project_spark.registry import (
    DRIVER_WINDOW_SIZE,
    ROWS_ONLY_WINDOW_LIFT,
    TIER0_PRIORITY,
    _load_history,
    driver_window,
    load_all,
)

# The round-6 window: tier 0 = oracle-backed with no driver-green row yet
# (embedding_quantize_int8 — r5 driver error, now reshaped to scalar rows —
# plus any queries newly registered this round), then oracle-backed by
# last-green round ascending (the r4 block stale two rounds; r5 greens
# rotate out), with the four never-driver-checked rows-only streaming
# queries lifted into the window tail for ONE round (VERDICT r5 item 4).
EXPECTED_WINDOW = (
    # tier 1 — last green r10
    "text_language_id",
    "text_fingerprint",
    "text_heaps_law_fit",
    "quality_perplexity_buckets",
    "retrieval_rrf_hybrid_topk",
    "text_code_like_share",
    # tier 1 — last green r11
    "sample_hash_stratified",
    "pack_token_budget_bins",
    "zorder_code_events",
    "scd2_customer_segments",
    "unpivot_lineitem_measures",
    "dq_constraint_audit",
    "chunk_long_documents",
    "dedup_exact_fingerprint",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_simhash_pairs",
    "dedup_incremental_batch",
    "decontaminate_benchmark_ngrams",
    "dedup_near_against_band_index",
    "window_nth_lag_defaults",
    "date_arithmetic",
    "array_funcs",
    "text_edit_distance",
    "union_schema_evolution",
    "flagship_sessionization_joinform",
    "funnel_ordered_stages",
    "cohort_retention_daily",
    "ml_tuning_grid_contract",
    "date_parts_agg",
    "join_broadcast_part",
    "join_anti_inactive_customers",
    "agg_approx_distinct",
    "agg_cube_customer",
    "agg_grouping_sets",
    "agg_stats_summary",
    "window_rank_dense_rank",
    "window_lag_lead",
    "window_running_total",
    "window_distribution",
    "window_first_last",
    "set_union_all",
    "set_intersect",
    "set_except",
    "distinct_pairs",
    "agg_approx_percentile_check",
    "ann_ivf_topk",
    "ann_ivf_recall_audit",
    "ann_ivfpq_topk",
)


def test_window_composition_is_pinned():
    assert len(EXPECTED_WINDOW) == DRIVER_WINDOW_SIZE
    assert driver_window() == list(EXPECTED_WINDOW)


def test_window_is_oracle_backed_except_declared_lift():
    reg = load_all()
    first = driver_window(reg)
    rows_only = [n for n in first if reg[n].sql is None]
    assert rows_only == list(ROWS_ONLY_WINDOW_LIFT), (
        "rows-only queries inside the driver window beyond the declared "
        f"one-round lift: {rows_only}"
    )


def test_never_green_queries_lead_the_window():
    """Never-driver-green oracle queries take the window head.  Round-6
    contention: 50 such queries exist but the one-round rows-only lift
    (VERDICT r5 item 4) owns the window tail, so the overflow (the four
    queries registered after the window filled) queues IMMEDIATELY after
    the window — they stay tier 0 and land at the round-7 head."""
    reg = load_all()
    history = _load_history()
    names = list(reg)
    oracle_backed = [n for n in names if reg[n].sql is not None]
    never_green = [n for n in oracle_backed if n not in history]
    lifted = [n for n in ROWS_ONLY_WINDOW_LIFT if n in reg]
    lead = min(len(never_green), DRIVER_WINDOW_SIZE - len(lifted))
    assert names[:lead] == never_green[:lead]
    overflow = never_green[lead:]
    assert (
        names[DRIVER_WINDOW_SIZE : DRIVER_WINDOW_SIZE + len(overflow)]
        == overflow
    )


def test_stalest_green_sorted_ascending():
    reg = load_all()
    history = _load_history()
    rounds = [
        history[n]
        for n in driver_window(reg)
        if reg[n].sql is not None and n in history
    ]
    assert rounds == sorted(rounds)


def test_window_frontloads_stalest_greens():
    """VERDICT r5 item 3: after the digest refresh every green oracle query
    inside the window must be at least as stale as every green oracle query
    outside it — the rotation must front-load last_green ascending."""
    reg = load_all()
    history = _load_history()
    window = set(driver_window(reg))
    inside = [history[n] for n in reg if n in window and n in history and reg[n].sql]
    outside = [history[n] for n in reg if n not in window and n in history and reg[n].sql]
    if inside and outside:
        assert max(inside) <= min(outside)


def test_rows_only_queries_are_last():
    reg = load_all()
    names = [n for n in reg if n not in ROWS_ONLY_WINDOW_LIFT]
    kinds = ["oracle" if reg[n].sql is not None else "rows_only" for n in names]
    # outside the declared lift: once the first rows-only query appears,
    # everything after is rows-only
    if "rows_only" in kinds:
        cut = kinds.index("rows_only")
        assert all(k == "rows_only" for k in kinds[cut:])


def test_lifted_queries_sit_at_window_tail():
    reg = load_all()
    lifted = [n for n in ROWS_ONLY_WINDOW_LIFT if n in reg]
    window = driver_window(reg)
    assert window[DRIVER_WINDOW_SIZE - len(lifted) :] == lifted


def test_every_query_has_fn_and_consistent_spec():
    reg = load_all()
    for name, spec in reg.items():
        assert spec.name == name
        assert callable(spec.fn)


def test_rows_only_lift_dropped_once_recorded():
    """The lift is declared ONE-round (registry.py): as soon as any
    CORRECTNESS file shows a driver row for a lifted query (rows-only
    rows never enter the digest, so check the files directly), the
    purpose is served — this fails until ROWS_ONLY_WINDOW_LIFT is
    emptied and EXPECTED_WINDOW re-pinned, the same start-of-round
    forcing function as the digest guard below."""
    import glob
    import json
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    recorded = set()
    for p in glob.glob(str(repo / "CORRECTNESS_r*.json")):
        for name, row in json.loads(Path(p).read_text()).items():
            if row.get("spark_rows") is not None:
                recorded.add(name)
    served = [n for n in ROWS_ONLY_WINDOW_LIFT if n in recorded]
    assert not served, (
        f"lifted rows-only queries now have driver rows on record {served} "
        "— drop ROWS_ONLY_WINDOW_LIFT and re-pin EXPECTED_WINDOW"
    )


def test_tier0_priority_dropped_once_recorded():
    """TIER0_PRIORITY is a one-shot override (ADVICE r8 item 4): once every
    listed name has a green row in the digest, the tuple is dead weight —
    this fails until it is emptied and EXPECTED_WINDOW re-pinned, mirroring
    test_rows_only_lift_dropped_once_recorded."""
    history = _load_history()
    if TIER0_PRIORITY:
        assert any(n not in history for n in TIER0_PRIORITY), (
            "every TIER0_PRIORITY name already has a driver-green digest row "
            f"{sorted(TIER0_PRIORITY)} — empty the tuple and re-pin the window"
        )


# Rounds a driver-green oracle query may go without a re-check before the
# rotation MUST queue it (VERDICT r10 item 3).  The remedy for an overdue
# query is membership in the current driver window — the test fails only
# when registration pace has outrun the rotation so badly that an
# over-budget name is NOT even queued for this round's re-check (as
# happened at the round-10 close, when the two r4-vintage names were
# displaced by 22 new tier-0 registrations).
STALENESS_BUDGET = 5


def test_overdue_queries_are_queued_in_window():
    """Rotation-debt tripwire: every oracle query whose last driver-green
    round is more than STALENESS_BUDGET rounds behind the latest recorded
    CORRECTNESS round must sit inside the CURRENT driver window.  Turning
    the judge's rotation-debt observation into a red test: if this fires,
    stop registering new tier-0 queries until the stale tail clears."""
    import glob
    import re
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    current = 0
    for p in glob.glob(str(repo / "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if m:
            current = max(current, int(m.group(1)))
    history = _load_history()
    window = set(driver_window())
    overdue = sorted(
        n for n, r in history.items() if current - r > STALENESS_BUDGET
    )
    missing = [n for n in overdue if n not in window]
    assert not missing, (
        f"queries over the {STALENESS_BUDGET}-round staleness budget are not "
        f"queued in the current driver window: {missing} — pause new "
        "registrations until the stale tail clears"
    )


def test_driver_history_digest_is_current():
    """Fails as soon as a CORRECTNESS_r*.json newer than the digest lands
    (i.e. at the start of the next round), forcing the rotation refresh:
    run scripts/update_driver_history.py, then update EXPECTED_WINDOW."""
    import glob
    import json
    import re
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    recorded = 0
    for p in glob.glob(str(repo / "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if m:
            recorded = max(recorded, int(m.group(1)))
    digest = json.loads(
        (repo / "big_data_analytics_project_spark" / "driver_history.json").read_text()
    )
    assert max(digest.values(), default=0) >= recorded, (
        "driver_history.json is stale — run scripts/update_driver_history.py "
        "and update EXPECTED_WINDOW for the new round"
    )
