"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``apache_iceberg_exploration_spark``; this module
only adapts the package's query registry to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from apache_iceberg_exploration_spark import registry
from apache_iceberg_exploration_spark.operators.medallion import gold_customer_agg

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the reference's Gold aggregate
    (dags/etl.py:86) generalized to the customer table — groupBy market
    segment with count/avg/sum (SURVEY.md §7 step 1)."""
    return gold_customer_agg(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (see
    apache_iceberg_exploration_spark/operators/*)."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted entries get the
    weaker rows-only check)."""
    return registry.all_oracles()
