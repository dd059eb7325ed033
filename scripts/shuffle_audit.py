"""Per-query shuffle-volume audit: run each headline query and report how
many bytes actually crossed an exchange (plus spill), via the Spark UI
REST API in local mode.

Wall-clock (bench.py) tells you WHAT is slow; shuffle bytes tell you WHY
— and, unlike time, they extrapolate: a query moving 10 MB at sf0.1 moves
~10 GB at sf100, so this table is the closest local proxy for 100 TB
behavior.  Usage:

    python scripts/shuffle_audit.py [sf_dir]

Prints one aligned row per headline query: shuffle write/read bytes,
spill bytes (memory+disk), and peak single-stage shuffle write.
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stages(ui: str, app_id: str) -> dict[int, dict]:
    url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url) as r:
        data = json.loads(r.read())
    return {s["stageId"]: s for s in data}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from bench import HEADLINE

    # SPARK_GRAFT_AUDIT_ONLY=a,b,c audits a subset (splice rows into the
    # doc by hand; full-HEADLINE refreshes stay the per-round batch job)
    only = os.environ.get("SPARK_GRAFT_AUDIT_ONLY")
    if only:
        names = [n for n in only.split(",") if n]
        missing = [n for n in names if n not in HEADLINE]
        assert not missing, f"not in HEADLINE: {missing}"
        HEADLINE = names

    from big_data_analytics_project_spark.registry import load_all
    from big_data_analytics_project_spark.session import get_spark

    registry = load_all()
    # the engine default disables the UI; the audit needs its REST API
    spark = get_spark("shuffle-audit", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    if ui is None:
        raise SystemExit(
            "Spark UI is disabled (another session already owns this JVM?) "
            "— run this script in a fresh process"
        )

    header = (
        f"{'query':34} {'shuf_write':>12} {'shuf_read':>12} "
        f"{'spill':>10} {'peak_stage_w':>12}"
    )
    print(header)
    print("-" * len(header))
    rows = []
    for name in HEADLINE:
        before = _stages(ui, app_id)
        registry[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        spark.catalog.clearCache()
        after = _stages(ui, app_id)
        new = [s for sid, s in after.items() if sid not in before]
        w = sum(s.get("shuffleWriteBytes", 0) for s in new)
        r = sum(s.get("shuffleReadBytes", 0) for s in new)
        spill = sum(
            s.get("memoryBytesSpilled", 0) + s.get("diskBytesSpilled", 0)
            for s in new
        )
        peak = max((s.get("shuffleWriteBytes", 0) for s in new), default=0)
        rows.append((name, w, r, spill, peak))
        print(f"{name:34} {w:>12,} {r:>12,} {spill:>10,} {peak:>12,}")
    total_w = sum(x[1] for x in rows)
    total_spill = sum(x[3] for x in rows)
    print("-" * len(header))
    print(f"{'TOTAL':34} {total_w:>12,} {'':>12} {total_spill:>10,}")


if __name__ == "__main__":
    main()
