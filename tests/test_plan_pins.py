"""Physical-plan pins for the semantic-dedup / ANN-audit / graph-edge
additions — shapes that make them viable at 100 TB.  Parity proves the
answers; these prove the plans (a cartesian pair scan or a join-based
edge build would still produce correct rows)."""


def _plan(registry, spark, sf_dir, name: str) -> str:
    spark.catalog.clearCache()
    df = registry[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_semantic_dedup_pairs_are_cluster_equijoined(registry, spark, sf_dir):
    """The SemDeDup pair scan must be an equi-join on the cluster id —
    never an all-pairs cartesian/nested-loop — and the partner fan-out
    must be the single-pass explode (one pair-join operator in the whole
    plan; the union form would show two)."""
    plan = _plan(registry, spark, sf_dir, "dedup_semantic_clusters")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    n_joins = sum(plan.count(j) for j in
                  ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"))
    # exactly 2: the cluster-keyed pair join + the final keep-flag join
    assert n_joins == 2, plan
    # corpus read three times (a-side, b-side, final stamp) — a regression
    # to the unioned partner form would make it five
    assert plan.count("embeddings.parquet") == 3, plan


def test_ndcg_audit_has_no_cartesian(registry, spark, sf_dir):
    plan = _plan(registry, spark, sf_dir, "ann_ivf_ndcg_audit")
    assert "CartesianProduct" not in plan, plan


def test_copurchase_edges_build_is_join_free(registry, spark, sf_dir):
    """The edge build is collect_set + in-codegen pair explosion: the
    degree-distribution plan must contain NO join operator at all (the
    old form self-joined the item list), and lineitem is scanned once."""
    plan = _plan(registry, spark, sf_dir, "graph_degree_distribution")
    assert "Join" not in plan, plan
    assert plan.count("lineitem.parquet") == 1, plan
