"""Runs EVERY registered query with an oracle against DuckDB at sf0.01 —
the same check the driver performs for CORRECTNESS_r{N}.json."""

from __future__ import annotations

import pytest

from apache_iceberg_exploration_spark import registry

from .conftest import SF_ORACLE
from .oracle_utils import compare

registry._load_all()
_CASES = sorted(registry.all_oracles())


@pytest.mark.parametrize("name", _CASES)
def test_query_matches_oracle(spark, duck, name):
    fn = registry.all_queries()[name]
    sql = registry.all_oracles()[name]
    df = fn(spark, SF_ORACLE)
    ok, msg = compare(df, duck, sql)
    assert ok, f"{name}: {msg}"


def test_every_query_has_entry():
    qs = registry.all_queries()
    assert len(qs) >= 1
