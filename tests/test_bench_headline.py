"""Pin the bench HEADLINE coverage policy (bench.py header, round 8).

Policy: every operator family — a query's FIRST registry tag — must have
at least one oracle-checked representative in HEADLINE, so no family is
perf-invisible round-over-round.  Families may share one delegate; the
README quotes the headline count and is pinned here like the registry
counts are in test_registry_counts.py.
"""

import re
import sys
from pathlib import Path

from big_data_analytics_project_spark.registry import load_all

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from bench import HEADLINE  # noqa: E402


def test_headline_names_registered_and_unique():
    reg = load_all()
    assert len(HEADLINE) == len(set(HEADLINE))
    missing = [n for n in HEADLINE if n not in reg]
    assert not missing, f"HEADLINE names not in registry: {missing}"


def test_every_family_represented():
    reg = load_all()
    head_tags = {reg[n].tags[0] for n in HEADLINE if reg[n].tags}
    uncovered = sorted(
        {
            spec.tags[0]
            for name, spec in reg.items()
            if spec.sql is not None and spec.tags and spec.tags[0] not in head_tags
        }
    )
    assert not uncovered, (
        f"operator families with no HEADLINE representative: {uncovered} — "
        "add a delegate to bench.py HEADLINE (see its coverage policy)"
    )


def test_readme_quotes_headline_count():
    readme = Path(__file__).resolve().parent.parent / "README.md"
    m = re.search(r"headline sums (\d+) queries", readme.read_text())
    assert m, "README no longer states the bench headline count"
    assert int(m.group(1)) == len(HEADLINE), (
        f"README says {m.group(1)} headline queries; bench.py has "
        f"{len(HEADLINE)} — update the README sentence"
    )


def test_readme_quotes_latest_bench_round():
    """The README's quoted timing must cite the NEWEST BENCH_r*.json on
    disk (VERDICT r8 item 4: the prose lagged a round behind the pinned
    count)."""
    repo = Path(__file__).resolve().parent.parent
    latest = max(
        int(re.search(r"BENCH_r(\d+)", p.name).group(1))
        for p in repo.glob("BENCH_r*.json")
    )
    m = re.search(r"in\s+BENCH_r(\d+)", readme_text := (repo / "README.md").read_text())
    assert m, "README no longer cites a BENCH round"
    assert int(m.group(1)) == latest, (
        f"README cites BENCH_r{m.group(1)} but BENCH_r{latest:02d}.json is "
        "the newest — refresh the bench sentence"
    )


def test_bench_history_driver_snapshot_matches_bench_round():
    """bench_history round convention (see scripts/bench_compare.py
    docstring): the driver's end-of-round bench for round N is summarized
    in BENCH_rN.json but snapshotted as bench_history/r(N+1).json, because
    bench.py infers the round as latest CORRECTNESS + 1 and CORRECTNESS_rN
    already exists when the driver benches.  When both files exist, their
    totals must agree — a mismatch means a post-close re-run clobbered the
    driver snapshot without SPARK_GRAFT_BENCH_ROUND.  Supersede rule: the
    builder's round-(N+1) close sweep legitimately overwrites that same
    file (bench.py infers round N+1 for it too); it is recognizable by a
    different query count (the headline grows between rounds), in which
    case the driver's numbers live on in BENCH_rN.json and this check
    does not apply."""
    import json

    repo = Path(__file__).resolve().parent.parent
    latest = max(
        int(re.search(r"BENCH_r(\d+)", p.name).group(1))
        for p in repo.glob("BENCH_r*.json")
    )
    hist = repo / "bench_history" / f"r{latest + 1:02d}.json"
    if not hist.exists():
        return  # driver snapshot not yet taken for the newest round
    bench = json.loads((repo / f"BENCH_r{latest:02d}.json").read_text())
    m = re.search(r'\{"metric": "headline_total".*', bench.get("tail", ""))
    assert m, f"BENCH_r{latest:02d}.json tail has no headline JSON line"
    parsed = json.loads(m.group(0))
    driver_total = parsed["value"]
    hist_queries = json.loads(hist.read_text())["queries"]
    if len(hist_queries) != parsed.get("n_queries"):
        return  # superseded by a builder close sweep with a grown headline
    hist_total = round(sum(hist_queries.values()), 3)
    assert abs(hist_total - driver_total) < 0.02, (
        f"bench_history/r{latest + 1:02d}.json sums {hist_total} but "
        f"BENCH_r{latest:02d} parsed {driver_total} — post-close re-run "
        "without SPARK_GRAFT_BENCH_ROUND?"
    )


def test_snapshot_provenance_folds_prior_runs():
    """bench_history snapshots must let a judge apply the host-load
    uniformity test (docs/determinism.md) without re-deriving it:
    run_totals accumulates every same-round total, run_index counts
    them, and median_ratio_vs_prev_run is the per-query median over the
    shared list."""
    from bench import snapshot_provenance

    t1 = {"a": 1.0, "b": 2.0, "c": 3.0}
    # first run of a round: no prior snapshot
    p1 = snapshot_provenance(None, t1)
    assert p1 == {
        "run_totals": [6.0],
        "run_index": 1,
        "median_ratio_vs_prev_run": None,
    }
    # second run, uniformly 10% slower — the median flags the uniformity
    t2 = {n: v * 1.1 for n, v in t1.items()}
    p2 = snapshot_provenance({"queries": t1, "provenance": p1}, t2)
    assert p2["run_totals"] == [6.0, 6.6]
    assert p2["run_index"] == 2
    assert p2["median_ratio_vs_prev_run"] == 1.1
    # a pre-provenance prior snapshot (r13 and earlier): its total is
    # reconstructed from the queries map
    p2b = snapshot_provenance({"queries": t1}, t2)
    assert p2b["run_totals"] == [6.0, 6.6]
    # query lists may differ between runs (HEADLINE grew): the median is
    # over the shared names only, new names still count in the total
    t3 = {"a": 1.0, "b": 2.0, "d": 4.0}
    p3 = snapshot_provenance({"queries": t1, "provenance": p1}, t3)
    assert p3["run_totals"] == [6.0, 7.0]
    assert p3["median_ratio_vs_prev_run"] == 1.0


def test_snapshot_provenance_excludes_zero_prior_timings():
    """A prior per-query timing recorded as exactly 0.0 cannot be a
    ratio denominator; it must be EXCLUDED from the median explicitly
    (ADVICE r14: previously a truthiness accident) while its name still
    counts in run totals."""
    from bench import snapshot_provenance

    prior = {"a": 0.0, "b": 2.0}
    now = {"a": 1.0, "b": 3.0}
    p = snapshot_provenance({"queries": prior}, now)
    # only "b" is ratio-eligible: 3.0/2.0
    assert p["median_ratio_vs_prev_run"] == 1.5
    assert p["run_totals"] == [2.0, 4.0]
