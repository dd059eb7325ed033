"""Refresh ``driver_history.json`` from the recorded CORRECTNESS_r*.json.

Run at the start of each round (after the driver drops the previous
round's correctness file) so the registry's driver-window derivation sees
the latest last-green round per query:

    python scripts/update_driver_history.py
    python scripts/repin_window.py          # then re-pin the window test

The digest maps query name -> last round number the driver recorded a
hash_match.  Queries absent from the digest are treated as
never-driver-green and front-loaded into the window (tier 0).
"""

from __future__ import annotations

import glob
import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
OUT = REPO / "big_data_analytics_project_spark" / "driver_history.json"


def main() -> None:
    last_green: dict[str, int] = {}
    for path in sorted(glob.glob(str(REPO / "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        for name, row in json.loads(Path(path).read_text()).items():
            if row.get("hash_match"):
                last_green[name] = max(last_green.get(name, 0), rnd)
    OUT.write_text(json.dumps(dict(sorted(last_green.items())), indent=1) + "\n")
    print(f"wrote {OUT} ({len(last_green)} queries with a green row)")


if __name__ == "__main__":
    main()
