"""Cross-engine deterministic text hashing primitives.

Every hash here is defined over md5 (identical in Spark and DuckDB), so
each dedup/fingerprint operator has an exactly-recomputable DuckDB
oracle — the engines share arithmetic, not implementation.

- ``md5_long(col)``: first 15 hex chars of md5 as a 60-bit integer.
- ``minhash`` family: h_j(x) = (a_j * x + b_j) mod MERSENNE_P with
  a_j = 2j+1 (odd), b_j = j*j+7 — fixed, seedless, documented constants.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["MERSENNE_P", "md5_long", "minhash_perm", "md5_long_sql"]

# 2^31 - 1: keeps every intermediate product within BIGINT range
# (a_j < 2^8 for reasonable j, x < P -> a*x+b < 2^39).
MERSENNE_P = 2_147_483_647


def md5_long(col: Column | str) -> Column:
    """60-bit integer from the md5 hex prefix (JVM-side, codegen'd)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str) -> str:
    """The DuckDB-equivalent of ``md5_long`` for oracle SQL strings."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def minhash_perm(hash_col: Column, j: int) -> Column:
    """The j-th universal-hash permutation of a token hash."""
    a, b = 2 * j + 1, j * j + 7
    return (F.lit(a) * (hash_col % MERSENNE_P) + F.lit(b)) % MERSENNE_P
