"""Registry-wide DuckDB result-type guard (VERDICT r6 items 2/6).

Round 6's only real regression: DuckDB promotes ``sum(BIGINT)`` to HUGEINT
(int128), and the external driver hashes the *native* representation — six
queries went red on hash_match with bit-identical values.  This test binds
every oracle SQL (no data fetched) and asserts no output column carries a
driver-unhashable DuckDB type.  The deeper spark-type-vs-duck-type pairing
check runs per query in the parity suite via ``verify.run_one``.
"""

import pytest

from big_data_analytics_project_spark.registry import load_all
from big_data_analytics_project_spark.verify import _DUCK_DENY, duck_result_types

_REGISTRY = load_all()
_ORACLE = sorted(n for n, s in _REGISTRY.items() if s.sql is not None)


@pytest.mark.parametrize("name", _ORACLE)
def test_oracle_output_types_are_hashable(name, duck):
    types = duck_result_types(duck, _REGISTRY[name].sql)
    bad = {c: t for c, t in types.items() if any(d in t for d in _DUCK_DENY)}
    assert not bad, (
        f"{name}: oracle output column(s) {bad} use a DuckDB-only integer type "
        f"the driver cannot hash-match against Spark — CAST them (see "
        f"docs/determinism.md, 'native result types')"
    )


def test_deny_list_is_wide_integer_family():
    # the guard exists specifically for int128/unsigned widths; keep the
    # deny list in sync with verify._DUCK_OK's allowlist philosophy
    assert "HUGEINT" in _DUCK_DENY and "UBIGINT" in _DUCK_DENY
