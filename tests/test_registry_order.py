"""The driver cross-checks only the FIRST 50 registered queries per round.

These tests pin the registry's driver-window derivation (see
``registry._driver_order``): the window is computed from the checked-in
``driver_history.json`` digest — never-driver-green oracle queries first,
then stalest-green first — and the EXACT expected round-5 window is pinned
here so adding a query can never silently evict a verified one.  If the
window composition changes (new query registered, history refreshed),
this test fails until ``EXPECTED_WINDOW`` is deliberately updated.
"""

from big_data_analytics_project_spark.registry import (
    DRIVER_WINDOW_SIZE,
    _load_history,
    driver_window,
    load_all,
)

# The round-5 window: tier 0 = oracle-backed with no driver-green row yet
# (round 4's ann_ivf_topk / streaming_sliding_window plus anything new this
# round), then oracle-backed by last-green round ascending (the 17 queries
# stale since r02, window_distribution stale since r03, then r4 greens in
# registration order until the window fills).
EXPECTED_WINDOW = (
    # tier 0 — never driver-green (registration order): round 4's two
    # window-missed queries plus round 5's new/upgraded oracle queries
    "sample_hash_stratified",
    "pack_token_budget_bins",
    "embedding_quantize_int8",
    "zorder_code_events",
    "scd2_customer_segments",
    "unpivot_lineitem_measures",
    "dq_constraint_audit",
    "chunk_long_documents",
    "dedup_simhash_pairs",
    "dedup_incremental_batch",
    "decontaminate_benchmark_ngrams",
    "funnel_ordered_stages",
    "cohort_retention_daily",
    "agg_approx_distinct",
    "agg_approx_percentile_check",
    "ann_ivf_topk",
    "ann_ivf_recall_audit",
    "ann_ivfpq_topk",
    "streaming_sliding_window",
    "streaming_static_enrich",
    "streaming_interval_join",
    "asof_join_nearest_event",
    "range_join_attribution",
    "hypertable_rollup_events",
    "vocab_top_ngrams",
    # tier 1 — last green r02 (stale three rounds)
    "window_nth_lag_defaults",
    "flagship_sessionization_joinform",
    "date_parts_agg",
    "join_broadcast_part",
    "join_anti_inactive_customers",
    "agg_cube_customer",
    "agg_grouping_sets",
    "agg_stats_summary",
    "window_rank_dense_rank",
    "window_lag_lead",
    "window_running_total",
    "window_first_last",
    "set_union_all",
    "set_intersect",
    "set_except",
    "distinct_pairs",
    # tier 1 — last green r03
    "window_distribution",
    # tier 1 — last green r04, registration order
    "dedup_exact_fingerprint",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "date_arithmetic",
    "array_funcs",
    "text_edit_distance",
    "union_schema_evolution",
)


def test_window_composition_is_pinned():
    assert len(EXPECTED_WINDOW) == DRIVER_WINDOW_SIZE
    assert driver_window() == list(EXPECTED_WINDOW)


def test_first_window_is_all_oracle_backed():
    reg = load_all()
    first = driver_window(reg)
    missing_oracle = [n for n in first if reg[n].sql is None]
    assert missing_oracle == [], f"rows-only queries inside the driver window: {missing_oracle}"


def test_never_green_queries_lead_the_window():
    reg = load_all()
    history = _load_history()
    names = list(reg)
    oracle_backed = [n for n in names if reg[n].sql is not None]
    never_green = [n for n in oracle_backed if n not in history]
    assert names[: len(never_green)] == never_green


def test_stalest_green_sorted_ascending():
    reg = load_all()
    history = _load_history()
    rounds = [
        history[n]
        for n in driver_window(reg)
        if reg[n].sql is not None and n in history
    ]
    assert rounds == sorted(rounds)


def test_rows_only_queries_are_last():
    reg = load_all()
    names = list(reg)
    kinds = ["oracle" if reg[n].sql is not None else "rows_only" for n in names]
    # once the first rows-only query appears, everything after is rows-only
    if "rows_only" in kinds:
        cut = kinds.index("rows_only")
        assert all(k == "rows_only" for k in kinds[cut:])


def test_every_query_has_fn_and_consistent_spec():
    reg = load_all()
    for name, spec in reg.items():
        assert spec.name == name
        assert callable(spec.fn)


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
