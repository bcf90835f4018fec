"""Temporal operators: as-of join (point-in-time join).

The reference engine has no temporal surface; this is part of the
training-data-pipeline extension (feature backfill, point-in-time
correctness for label joins, "latest state as of event time").

Spark lacks a native as-of join, and the naive formulation — a range
join ``l.ts >= r.ts`` plus a per-row argmax — explodes into
O(|L| * |R|) pairs per key. This implementation is the scale-safe
union form:

    union(left tagged 1, right tagged 0)
      -> one shuffle on the ``by`` keys
      -> running ``last(value, ignorenulls)`` over (time, tag) order
      -> keep left rows

Every right value is carried forward to exactly the left rows it is
the as-of match for, so the cost is one shuffle + one sort of
|L| + |R| rows — no range-join blowup, no skew beyond what the ``by``
keys already have (salt upstream if a single key dominates).

Semantics (matching DuckDB ``ASOF LEFT JOIN`` with ``l.t >= r.t``):
backward-looking, inclusive — each left row gets the right row with
the greatest time <= its own; unmatched left rows keep NULLs. Right
rows must be unique per (by, time) — pre-aggregate otherwise (ties
within one instant have no defined winner in any engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str,
    value_cols: list[str] | None = None,
    tolerance: int | None = None,
    right_on: str | None = None,
) -> DataFrame:
    """Backward inclusive as-of join.

    Parameters
    ----------
    on: ordering column (numeric or timestamp) in ``left``; ``right``
        uses ``right_on`` (default: same name).
    by: equality key column(s) present on both sides.
    value_cols: columns of ``right`` to carry onto matched left rows
        (default: every right column except keys/time). Names must not
        collide with left columns — alias upstream.
    tolerance: when set, a match older than ``tolerance`` (in the units
        of ``on``) is treated as no match (values nulled), like pandas
        ``merge_asof(tolerance=...)``.

    Returns ``left`` columns + ``value_cols`` + ``__matched_{on}`` (the
    matched right time, NULL when unmatched).
    """
    by = [by] if isinstance(by, str) else list(by)
    right_on = right_on or on
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in (*by, right_on)
        ]
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(f"value_cols collide with left columns: {sorted(clash)}")

    matched_on = f"__matched_{on}"
    # Pack (matched time, *values) into ONE struct per right row and
    # carry the struct with a single last(ignorenulls=True): all output
    # columns then come from the same matched right row, so a NULL value
    # in the matched row stays NULL instead of leaking an older row's
    # non-NULL value (DuckDB ASOF JOIN / pandas merge_asof semantics).
    r = right.select(
        *by,
        F.col(right_on).alias(on),
        F.struct(
            F.col(right_on).alias(matched_on),
            *[F.col(c).alias(c) for c in value_cols],
        ).alias("__asof"),
        F.lit(0).alias("__side"),
    )
    l = left.select(
        "*",
        F.lit(None).cast(r.schema["__asof"].dataType).alias("__asof"),
        F.lit(1).alias("__side"),
    )
    both = l.unionByName(r, allowMissingColumns=True)

    # right rows (__side=0) sort before left rows at the same instant,
    # so "inclusive" falls out of the (on, __side) sort order
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pack = F.last("__asof", ignorenulls=True).over(w)
    carried = both.select(
        *left.columns,
        "__side",
        pack[matched_on].alias(matched_on),
        *[pack[c].alias(c) for c in value_cols],
    ).where(F.col("__side") == 1)

    if tolerance is not None:
        stale = F.col(matched_on).isNull() | (
            (F.col(on) - F.col(matched_on)) > F.lit(tolerance)
        )
        carried = carried.select(
            *left.columns,
            *[
                F.when(stale, F.lit(None)).otherwise(F.col(c)).alias(c)
                for c in (matched_on, *value_cols)
            ],
        )
    else:
        carried = carried.drop("__side")
    return carried
