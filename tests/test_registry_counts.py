"""Pin the registry counts quoted in README so docs can't drift from code.

When a query is added/upgraded, update BOTH the constants here and the
README sentence that quotes them.
"""

import re
from pathlib import Path

from big_data_analytics_project_spark.registry import load_all

TOTAL = 269
ORACLE = 255


def test_counts_match_registry():
    reg = load_all()
    assert len(reg) == TOTAL
    assert sum(1 for s in reg.values() if s.sql is not None) == ORACLE


def test_readme_quotes_current_counts():
    readme = Path(__file__).resolve().parent.parent / "README.md"
    text = readme.read_text()
    m = re.search(r"(\d+) registered queries, (\d+) oracle-checked", text)
    assert m, "README no longer states the registry counts"
    assert (int(m.group(1)), int(m.group(2))) == (TOTAL, ORACLE)
