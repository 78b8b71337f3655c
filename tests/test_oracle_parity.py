"""Runs EVERY registered query with an oracle against DuckDB at sf0.01 —
the same check the driver performs for CORRECTNESS_r{N}.json."""

from __future__ import annotations

import pytest

from apache_iceberg_exploration_spark import registry

from .conftest import SF_ORACLE
from .oracle_utils import compare

registry._load_all()
_CASES = sorted(registry.all_oracles())


# Queries allowed to return 0 rows at the oracle SF. Keep EMPTY unless a
# query is *defined* by emptiness: a 0-row green proves only that both
# engines agree nobody was flagged (the r4 `embedding_norm_qa_outliers`
# vacuous-green lesson — and this round's phash/rcte repeats of it).
ALLOWED_EMPTY_AT_ORACLE_SF: set[str] = set()


@pytest.mark.parametrize("name", _CASES)
def test_query_matches_oracle(spark, duck, name):
    fn = registry.all_queries()[name]
    sql = registry.all_oracles()[name]
    df = fn(spark, SF_ORACLE)
    ok, msg = compare(df, duck, sql)
    assert ok, f"{name}: {msg}"
    if name not in ALLOWED_EMPTY_AT_ORACLE_SF:
        assert not msg.endswith("rows=0"), (
            f"{name}: oracle-green on an EMPTY result — the hash match "
            "proves nothing about the operator's logic (vacuous green). "
            "Recalibrate so sf0.01 exercises it, or allowlist with a "
            "reason."
        )


def test_every_query_has_entry():
    qs = registry.all_queries()
    assert len(qs) >= 1
