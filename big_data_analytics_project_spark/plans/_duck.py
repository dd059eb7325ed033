"""Shared DuckDB oracle-SQL fragments.

``hash60(expr)`` mirrors ``operators.dedup.md5_hash60`` (first 15 hex
chars of md5 parsed as a 60-bit integer) bit-identically in DuckDB:
hex→int via positional digit shifts — NOT float pow, since 16^14 > 2^53
is not double-exact.
"""

from __future__ import annotations


def hash60(expr: str) -> str:
    """DuckDB SQL computing the 60-bit md5 hash of ``expr`` (a VARCHAR
    expression), equal to Spark's ``md5_hash60`` on the same input."""
    return (
        "list_sum([((strpos('0123456789abcdef', md5(" + expr + ")[i]) - 1)::BIGINT"
        " << (4*(15-i))) for i in range(1,16)])"
    )
