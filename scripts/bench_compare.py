"""Compare two bench_queries.json files (round-over-round regression check).

Usage:
    python scripts/bench_compare.py OLD.json NEW.json [threshold]

Prints per-query deltas for the overlap, sorted by regression ratio, and
a summary (overlap totals, worst regression, best improvement).  A query
is flagged when NEW/OLD exceeds ``threshold`` (default 1.3) AND the
absolute delta exceeds 0.2 s (sub-overhead noise is not a regression).

The driver records one bench per round; keep each round's
bench_queries.json aside (they're gitignored) to feed this.

Round-numbering convention for bench_history/ (VERDICT r9 item 5):
``bench_history/rN.json`` holds the run measured DURING round N's build
window.  The builder's close-sweep snapshot for round N therefore lands
in ``rN.json``, while the driver's end-of-round bench — which runs AFTER
``CORRECTNESS_rN.json`` exists and is summarized in ``BENCH_rN.json`` —
lands in ``r(N+1).json`` (bench.py infers "current round" as latest
CORRECTNESS + 1).  So ``r09.json`` (builder, 163.8 s) and ``r10.json``
(driver, = BENCH_r09's 167.7 s) are BOTH round-9 measurements, one
pre-close and one post-close.  When both files exist, the invariant
"sum(bench_history/r{N+1}) == BENCH_rN's parsed headline total" is
pinned by tests/test_bench_headline.py.  A post-close re-run that should
overwrite rN instead of r(N+1) sets ``SPARK_GRAFT_BENCH_ROUND=N``.
The builder's round-(N+1) close sweep legitimately supersedes the
driver's copy in r(N+1).json (both infer the same round number); the
driver's numbers remain parseable from ``BENCH_rN.json``.
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict[str, float]:
    import os
    import re

    # bare round tokens ('r08') resolve to the checked-in history snapshot
    if re.fullmatch(r"r\d+", path):
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "bench_history",
            f"{path if len(path) > 2 else 'r0' + path[1]}.json",
        )
    with open(path) as f:
        d = json.load(f)
    q = d.get("queries", d)
    return {k: float(v) for k, v in q.items() if isinstance(v, (int, float))}


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__)
        raise SystemExit(2)
    old = _load(sys.argv[1])
    new = _load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    shared = sorted(set(old) & set(new))
    if not shared:
        print("no overlapping queries")
        raise SystemExit(1)
    rows = [(n, old[n], new[n], new[n] / old[n] if old[n] > 0 else float("inf"))
            for n in shared]
    rows.sort(key=lambda r: -r[3])
    print(f"{'query':40s} {'old(s)':>8s} {'new(s)':>8s} {'ratio':>6s}")
    print("-" * 66)
    flagged = 0
    for n, o, v, r in rows:
        flag = ""
        if r > threshold and v - o > 0.2:
            flag = "  <-- REGRESSION"
            flagged += 1
        print(f"{n:40s} {o:8.2f} {v:8.2f} {r:6.2f}{flag}")
    t_old = sum(old[n] for n in shared)
    t_new = sum(new[n] for n in shared)
    print("-" * 66)
    print(
        f"overlap: {len(shared)} queries, {t_old:.1f}s -> {t_new:.1f}s "
        f"({t_new / t_old - 1.0:+.0%} vs old), {flagged} regression(s) "
        f"(ratio>{threshold} and delta>0.2s)"
    )
    raise SystemExit(1 if flagged else 0)


if __name__ == "__main__":
    main()
