"""Oracle result-type lint (VERDICT r4 next-step #2).

The driver's correctness gate fetches DuckDB oracle results through a
pandas/Arrow path, which renders HUGEINT (DuckDB's SUM(BIGINT) result
type) and DECIMAL as float64 — diverging from Spark's int64 in the value
hash even when every value is identical.  This is exactly what shipped the
round-4 `corpus_stats_cube` red row: the local replica hashed fetchall()
Python ints and passed three times on a driver-red entry.

This lint binds (does NOT execute — `con.sql(q).types` is bind-time only,
so the whole registry lints in seconds) every oracle_sql() entry against
the sf0.001 views and asserts no output column has a driver-unsafe type.
A canary asserts the lint actually catches the un-fixed round-4 cube
oracle, so the test can never rot into a vacuous pass.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_contract import BANNED_ORACLE_TYPES, TABLES, canon_type  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TINY", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c


def _lint(con, sql: str) -> list[str]:
    rel = con.sql(sql)
    return [f"{c}:{t}" for c, t in zip(rel.columns, map(str, rel.types))
            if canon_type(t) in BANNED_ORACLE_TYPES]


def test_no_driver_unsafe_types_in_any_oracle(con):
    import __spark_entry__ as entrymod

    offenders: dict[str, list[str]] = {}
    for name, sql in entrymod.oracle_sql().items():
        bad = _lint(con, sql)
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracle output columns with driver-unsafe types (HUGEINT/DECIMAL "
        "render as float64 through the driver's pandas fetch; CAST them "
        f"in the oracle SQL): {offenders}"
    )


def test_oracle_columns_unique(con):
    """Duplicate output names would make the sorted-column hash ambiguous."""
    import __spark_entry__ as entrymod

    for name, sql in entrymod.oracle_sql().items():
        cols = con.sql(sql).columns
        assert len(cols) == len(set(cols)), f"{name}: duplicate columns {cols}"


def test_lint_catches_the_round4_cube_bug(con):
    """Canary: the exact un-fixed round-4 oracle shape must fail the lint."""
    unfixed = """
      SELECT lang, source, COUNT(*) AS n_docs,
             SUM(CAST(ceil(length(regexp_replace(text, '\\s', '', 'g')) / 4.0)
                      AS BIGINT)) AS total_tokens
      FROM documents
      GROUP BY CUBE (lang, source)
    """
    assert _lint(con, unfixed) == ["total_tokens:HUGEINT"]
    fixed = """
      SELECT lang, source, COUNT(*) AS n_docs,
             CAST(SUM(CAST(ceil(length(regexp_replace(text, '\\s', '', 'g'))
                                / 4.0) AS BIGINT))
                  AS BIGINT) AS total_tokens
      FROM documents
      GROUP BY CUBE (lang, source)
    """
    assert _lint(con, fixed) == []


def test_decimal_flagged():
    c = duckdb.connect()
    assert _lint(c, "SELECT CAST(1 AS DECIMAL(10,2)) AS d") == ["d:DECIMAL(10,2)"]
    assert _lint(c, "SELECT CAST(1 AS BIGINT) AS d") == []
