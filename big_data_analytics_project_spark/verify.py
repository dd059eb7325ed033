"""Local differential verifier — emulates the driver's DuckDB-oracle check.

Runs a registered query on Spark and its oracle SQL on DuckDB (tables
pre-registered as views over the same parquet), then compares:
row count, column names, and order-insensitive values (exact by default,
since the driver hashes values; a tolerance report is included for
diagnosis).  Used by tests and by ``python -m big_data_analytics_project_spark.verify``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from .schemas import FIXTURE_TABLES

TABLES = list(FIXTURE_TABLES)


def duck_connect(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form: columns sorted by name, rows sorted by all columns."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if isinstance(df[c].dtype, pd.DatetimeTZDtype):
            df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
        # normalize nullable/arrow-backed ints etc. to plain numpy where possible
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


@dataclass
class CompareReport:
    name: str
    rows_spark: int
    rows_oracle: int
    columns_match: bool
    exact_match: bool
    approx_match: bool
    detail: str = ""
    types_ok: bool = True

    @property
    def ok(self) -> bool:
        return (
            self.rows_spark == self.rows_oracle
            and self.columns_match
            and self.exact_match
            and self.types_ok
        )


# --- DuckDB-native result-type guard --------------------------------------
# The external driver hashes the oracle's NATIVE value representation, not
# the pandas-converted one — round 6 proved it: every `sum(BIGINT)` DuckDB
# promoted to HUGEINT (int128) hash-mismatched despite exact value equality
# after fetchdf().  So every oracle output column must carry a DuckDB type
# whose representation is hash-compatible with the Spark column's.  The
# allowlist below is the set of pairings with a driver-green row on record;
# anything else (HUGEINT, unsigned ints, DECIMAL vs double, …) fails
# verification locally before the driver ever sees it.  Rule recorded in
# docs/determinism.md.
_DUCK_OK: dict[str, set[str]] = {
    "bigint": {"BIGINT"},
    "int": {"INTEGER", "BIGINT"},  # int↔BIGINT driver-green (tpch_q9, r06)
    "smallint": {"SMALLINT"},
    "tinyint": {"TINYINT"},
    "double": {"DOUBLE"},
    "float": {"FLOAT"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "date": {"DATE"},
    "timestamp": {"TIMESTAMP", "TIMESTAMP WITH TIME ZONE"},
    "timestamp_ntz": {"TIMESTAMP"},
}
_DUCK_DENY = ("HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT")


def duck_result_types(con, sql: str) -> dict[str, str]:
    """Bind (without fetching) the oracle SQL and return col → DuckDB type."""
    rel = con.sql(sql)
    return dict(zip(rel.columns, [str(t) for t in rel.types]))


def oracle_type_issues(spark_schema: dict[str, str], duck_types: dict[str, str]) -> list[str]:
    """Hash-incompatible (spark type, duck type) pairings, as messages."""
    issues = []
    for col, dt in duck_types.items():
        st = spark_schema.get(col)
        if st is None:
            continue  # column-name mismatch is reported separately
        allowed = _DUCK_OK.get(st)
        if allowed is not None:
            if dt not in allowed:
                issues.append(f"{col}: spark={st} but oracle={dt}")
        elif any(d in dt for d in _DUCK_DENY):
            issues.append(f"{col}: oracle type {dt} (spark={st}) is driver-unhashable")
    return issues


def compare_frames(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> CompareReport:
    cols_match = sorted(sdf.columns) == sorted(odf.columns)
    if not cols_match or len(sdf) != len(odf):
        return CompareReport(
            name, len(sdf), len(odf), cols_match, False, False,
            f"spark cols={sorted(sdf.columns)} oracle cols={sorted(odf.columns)}",
        )
    a, b = _canon(sdf), _canon(odf)
    exact = True
    approx = True
    detail = []
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            col_exact = bool(av.equals(bv)) or bool(
                np.array_equal(av.to_numpy(), bv.to_numpy())
            )
        except Exception:
            col_exact = False
        if not col_exact:
            exact = False
            try:
                close = np.allclose(
                    av.astype(float).to_numpy(),
                    bv.astype(float).to_numpy(),
                    rtol=1e-9,
                    atol=1e-9,
                    equal_nan=True,
                )
            except (TypeError, ValueError):
                close = False
            if close:
                detail.append(f"{c}: approx-only (float drift)")
            else:
                approx = False
                mism = (av.astype(str) != bv.astype(str)).to_numpy().nonzero()[0][:3]
                for i in mism:
                    detail.append(f"{c}[{i}]: spark={av.iloc[i]!r} oracle={bv.iloc[i]!r}")
    return CompareReport(name, len(a), len(b), True, exact, exact or approx, "; ".join(detail))


def run_one(spark, con, spec, sf_dir: str) -> CompareReport:
    df = spec.fn(spark, sf_dir)
    sdf = df.toPandas()
    if spec.sql is None:
        return CompareReport(spec.name, len(sdf), len(sdf), True, True, True, "rows-only")
    spark_schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    type_issues = oracle_type_issues(spark_schema, duck_result_types(con, spec.sql))
    odf = con.execute(spec.sql).fetchdf()
    rep = compare_frames(spec.name, sdf, odf)
    if type_issues:
        rep.types_ok = False
        rep.detail = "; ".join(["TYPES: " + ", ".join(type_issues)] + ([rep.detail] if rep.detail else []))
    return rep


def _hostile_session():
    """A driver-like session that has NONE of our factory's settings: odd
    timezone, odd shuffle partitioning, ANSI default.  Every query must
    still match its oracle — the ``@query`` wrapper is responsible for
    pinning whatever it needs (UTC, nanos handling); relying on the
    engine's own session factory would hide that dependency until the
    external driver breaks it.  Enabled via ``SPARK_GRAFT_HOSTILE=1``."""
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[8]")
        .appName("verify-hostile")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.sql.shuffle.partitions", "17")
        .getOrCreate()
    )


def main(sf_dir: str = "/root/testdata/sf0.01", names: list[str] | None = None) -> int:
    import os

    from .registry import load_all
    from .session import get_spark

    registry = load_all()
    hostile = os.environ.get("SPARK_GRAFT_HOSTILE") == "1"
    spark = _hostile_session() if hostile else get_spark("verify")
    if hostile:
        print("# hostile session: tz=America/New_York, shuffle.partitions=17")
    con = duck_connect(sf_dir)
    failures = 0
    for name, spec in sorted(registry.items()):
        if names and name not in names:
            continue
        try:
            rep = run_one(spark, con, spec, sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: EXCEPTION {type(e).__name__}: {e}")
            failures += 1
            continue
        status = "ok   " if rep.ok else ("approx" if rep.approx_match else "FAIL ")
        if not rep.ok:
            failures += 1
        print(
            f"{status} {name}: rows {rep.rows_spark}/{rep.rows_oracle}"
            + (f" | {rep.detail}" if rep.detail else "")
        )
    return failures


if __name__ == "__main__":
    import sys

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    raise SystemExit(main(sf, sys.argv[2:] or None))
