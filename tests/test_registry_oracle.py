"""Every registry query must match its DuckDB oracle at sf0.001 — the local
mirror of the driver's t2 gate."""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE
from tests.oracle_harness import run_pair
from vectordbfaiss_spark import registry


def _names():
    return sorted(registry.queries().keys())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, name):
    problems = run_pair(spark, name, SF_ORACLE)
    assert not problems, "\n".join(problems)


def test_every_query_has_oracle_or_reason():
    missing = [n for n in registry.queries() if n not in registry.oracle_sql()]
    # Non-SQL-expressible ops are allowed to omit the oracle (driver records
    # a weaker rows-only check) but must be explicitly listed here.
    allowed_rows_only = set(registry.ROWS_ONLY) if hasattr(registry, "ROWS_ONLY") else set()
    unexplained = [n for n in missing if n not in allowed_rows_only]
    assert not unexplained, f"queries without oracle or rows-only opt-out: {unexplained}"
