"""Attribute upsert semantics — the reference's append-only
``AttributesLog`` with last-write-wins replay
(``/root/reference/src/protos/database.proto:96-115``, replay at
``src/db/stored.rs:185-260``), generalized to any keyed log: the latest
row per key wins, resolved with a ``row_number`` window (SURVEY.md §1.4).

Scale: the window shuffles once on the key; WindowGroupLimit keeps only
the winning row per key before the final exchange when the filter is
rn = 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["last_write_wins"]


def last_write_wins(
    log: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Latest row per key. ``order_cols`` ascending defines recency
    (latest = highest); ``value_cols`` maps output name -> source column
    (default: keep every non-key column under its own name)."""
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    ranked = log.withColumn("__rn", F.row_number().over(w)).where(
        F.col("__rn") == 1
    )
    if value_cols is None:
        value_cols = {
            c: c for c in log.columns if c not in key_cols
        }
    return ranked.select(
        *key_cols,
        *[F.col(src).alias(dst) for dst, src in value_cols.items()],
    )
