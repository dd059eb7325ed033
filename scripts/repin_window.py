"""Regenerate the EXPECTED_WINDOW pin in tests/test_registry_order.py from
the CURRENT derived driver window.

Start-of-round workflow (after the driver drops CORRECTNESS_r{N}.json):

    python scripts/update_driver_history.py   # refresh the digest
    #  (drop ROWS_ONLY_WINDOW_LIFT in registry.py if its tripwire fired)
    python scripts/repin_window.py            # rewrite the pin
    python -m pytest tests/test_registry_order.py -q   # must be green
    git commit                                 # the deliberate acknowledgement

The pin stays a pin: this script only writes what ``driver_window()``
derives, so the diff in the committed test file IS the reviewable record
of what rotated in and out.  It never runs implicitly — a human (or a
deliberate session step) runs it and commits the result.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TEST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "test_registry_order.py",
)


def main() -> None:
    from big_data_analytics_project_spark.registry import (
        ROWS_ONLY_WINDOW_LIFT,
        _load_history,
        driver_window,
    )

    window = driver_window()
    history = _load_history()

    lines = ["EXPECTED_WINDOW = ("]
    prev_tier = None
    for name in window:
        if name in ROWS_ONLY_WINDOW_LIFT:
            tier = "declared one-round rows-only lift (registry.py)"
        elif name not in history:
            tier = "tier 0 — never driver-green"
        else:
            tier = f"tier 1 — last green r{history[name]:02d}"
        if tier != prev_tier:
            lines.append(f"    # {tier}")
            prev_tier = tier
        lines.append(f'    "{name}",')
    lines.append(")")
    block = "\n".join(lines)

    src = open(TEST).read()
    new, n = re.subn(
        r"EXPECTED_WINDOW = \(.*?\n\)", block, src, count=1, flags=re.S
    )
    if n != 1:
        raise SystemExit("could not locate the EXPECTED_WINDOW block")
    open(TEST, "w").write(new)
    print(f"re-pinned {len(window)} names in {TEST}")
    never = sum(1 for nme in window if nme not in history)
    print(f"  tier 0 (never driver-green): {never}")
    print(f"  green, stalest-first:        {len(window) - never}")


if __name__ == "__main__":
    main()
