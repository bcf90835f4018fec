"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Conventions shared by every (query, oracle) pair:
- every computed column is aliased identically on both sides;
- float outputs are rounded (4 decimals) on both sides, with the
  arithmetic done in DOUBLE on both sides;
- ties in every ORDER BY / row_number are broken by an id column.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flechasdb_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so
    the leading entries span the full §2 surface (core lifecycle, dedup,
    text, multimodal, SQL, streaming); tests/test_oracle.py gates every
    entry regardless of position."""
    return Q.registry_ordered()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for each query (omissions are recorded
    by the driver as weaker rows-only checks)."""
    return Q.oracles_ordered()
