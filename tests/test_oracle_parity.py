"""Differential tests: every oracle-checked registry query must match DuckDB
exactly at sf0.001 (the driver re-checks at sf0.01).

This is the reference's dual-engine testing idea
(benchmarks/compare_frameworks.py:136-189) upgraded to per-operator
value-exact comparison (SURVEY §5).
"""

import pytest

from big_data_analytics_project_spark.registry import load_all
from big_data_analytics_project_spark.verify import run_one

_REGISTRY = load_all()


@pytest.mark.parametrize("name", sorted(_REGISTRY))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spec = _REGISTRY[name]
    rep = run_one(spark, duck, spec, sf_dir)
    assert rep.ok, f"{name}: rows {rep.rows_spark}/{rep.rows_oracle} {rep.detail}"
