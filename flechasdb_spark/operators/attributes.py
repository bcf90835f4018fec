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

__all__ = ["last_write_wins", "to_attr_maps", "get_attributes"]


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


def to_attr_maps(
    df: DataFrame,
    id_col: str = "vec_id",
    str_cols: list[str] | None = None,
    u64_cols: list[str] | None = None,
) -> DataFrame:
    """The reference's attribute shape — per-vector
    ``HashMap<String, String|Uint64>`` (/root/reference/src/db.rs:14-27)
    — as two typed MapType columns: a Spark map is monomorphic, so the
    String|Uint64 union splits into ``attrs_str map<string,string>`` and
    ``attrs_u64 map<string,long>`` (preserving the reference's u64 value
    caveat as a real integer type instead of stringifying).

    NULL column values are kept as map entries with NULL values —
    matching an attribute explicitly set; columns absent from both lists
    simply aren't attributes."""
    str_cols = str_cols or []
    u64_cols = u64_cols or []
    return df.select(
        id_col,
        F.map_from_arrays(
            F.array(*[F.lit(c) for c in str_cols]),
            F.array(*[F.col(c).cast("string") for c in str_cols]),
        ).alias("attrs_str"),
        F.map_from_arrays(
            F.array(*[F.lit(c) for c in u64_cols]),
            F.array(*[F.col(c).cast("long") for c in u64_cols]),
        ).alias("attrs_u64"),
    )


def get_attributes(
    attrs: DataFrame,
    requests: DataFrame,
    id_col: str = "vec_id",
    name_col: str = "name",
    validate_ids: bool = True,
) -> DataFrame:
    """Batch form of the reference's ``get_attribute(id, name)``
    (/root/reference/src/db/stored.rs:621-639): for each request row
    (id, name) return (id, name, value_str, value_u64) where a missing
    NAME yields NULL values (the reference's ``None``) and an unknown ID
    raises (the reference's error).

    Scale: the unknown-id check is one anti-join over the request set
    (requests are small — broadcast); pass ``validate_ids=False`` to
    skip the extra job when ids are known-valid. Lookup itself is a
    broadcast hash join + two map lookups, no shuffle of the big side."""
    if validate_ids:
        missing = (
            requests.join(attrs, id_col, "left_anti")
            .select(id_col)
            .limit(1)
            .collect()
        )
        if missing:
            raise KeyError(
                f"unknown {id_col} in attribute request: {missing[0][0]}"
            )
    return requests.join(attrs, id_col).select(
        id_col,
        name_col,
        # try_element_at: missing map key -> NULL (ANSI element_at
        # would raise MAP_KEY_DOES_NOT_EXIST)
        F.try_element_at("attrs_str", F.col(name_col)).alias("value_str"),
        F.try_element_at("attrs_u64", F.col(name_col)).alias("value_u64"),
    )
