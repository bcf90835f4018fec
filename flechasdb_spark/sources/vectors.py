"""Vector ingest sources — the reference's B1 chunk/ingest + B2 ID
assignment (SURVEY.md §2.1) over the formats Spark reads natively.

The reference ingests a flat f32 buffer and rejects ragged input
(``BlockVectorSet::chunk``, /root/reference/src/vector.rs:40-57) and
assigns a fresh UUID per vector (/root/reference/src/db/build.rs:85-91).
Here: parquet/CSV/JSON readers that produce the canonical
``(id, array<float> vector, attrs...)`` shape, a validation step that
enforces the fixed dimension (the chunk rejection + the load-time schema
checks of src/db/stored.rs:670-702), and ID assignment with a
deterministic default (content hash) because reproducible builds are
what the correctness gate needs (SURVEY.md §2.4); ``uuid`` mode matches
the reference's randomized behavior.

Scale: validation is one aggregate over the scan (no shuffle);
readers are plain DataFrame sources — predicate pushdown and column
pruning apply as usual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "validate_vectors",
    "assign_vector_ids",
    "read_vectors_parquet",
    "read_vectors_csv",
    "read_vectors_json",
    "read_vectors_orc",
]


def validate_vectors(
    df: DataFrame, dim: int, vec_col: str = "embedding"
) -> DataFrame:
    """Enforce the fixed vector dimension: raises ValueError if any row
    has a NULL vector or a length != dim. Returns df unchanged."""
    bad = df.where(
        F.col(vec_col).isNull() | (F.size(F.col(vec_col)) != dim)
    ).count()
    if bad:
        raise ValueError(
            f"{bad} rows have {vec_col} missing or of length != {dim}"
        )
    return df


def assign_vector_ids(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "content_hash",
) -> DataFrame:
    """B2: one id per vector. ``content_hash`` (default) derives a
    deterministic 60-bit id from the vector's values — reproducible
    builds; ``uuid`` matches the reference's random UUIDv4
    (two builds differ, SURVEY.md §2.4); ``monotonic`` is
    partition-ordered and cheap but not stable across repartitioning."""
    if mode == "content_hash":
        ids = F.conv(
            F.substring(
                F.md5(F.to_json(F.struct(F.col(vec_col)))), 1, 15
            ),
            16,
            10,
        ).cast("long")
    elif mode == "uuid":
        ids = F.expr("uuid()")
    elif mode == "monotonic":
        ids = F.monotonically_increasing_id()
    else:
        raise ValueError(f"unknown id mode: {mode}")
    return df.withColumn(id_col, ids)


def read_vectors_parquet(
    spark: SparkSession,
    path: str,
    dim: int,
    vec_col: str = "embedding",
) -> DataFrame:
    return validate_vectors(spark.read.parquet(path), dim, vec_col)


def read_vectors_csv(
    spark: SparkSession,
    path: str,
    dim: int,
    vec_col: str = "embedding",
    delimiter: str = ";",
    header: bool = True,
) -> DataFrame:
    """CSV with the vector serialized as a single delimited string
    column (the common interchange shape for embedding dumps)."""
    raw = spark.read.option("header", header).csv(path)
    parsed = raw.withColumn(
        vec_col,
        F.transform(
            F.split(F.col(vec_col), delimiter), lambda x: x.cast("float")
        ),
    )
    # non-vector columns arrive as strings; cast ids back to long
    if "vec_id" in parsed.columns:
        parsed = parsed.withColumn("vec_id", F.col("vec_id").cast("long"))
    return validate_vectors(parsed, dim, vec_col)


def read_vectors_json(
    spark: SparkSession,
    path: str,
    dim: int,
    vec_col: str = "embedding",
) -> DataFrame:
    """JSON-lines with the vector as a native array field."""
    raw = spark.read.json(path)
    parsed = raw.withColumn(
        vec_col, F.col(vec_col).cast("array<float>")
    )
    return validate_vectors(parsed, dim, vec_col)


def read_vectors_orc(
    spark: SparkSession,
    path: str,
    dim: int,
    vec_col: str = "embedding",
) -> DataFrame:
    """ORC with the vector as a native array column — the other
    Spark-native columnar format (predicate pushdown and column pruning
    reach the ORC scan exactly as with parquet; floats round-trip
    bit-exactly, no string parsing)."""
    return validate_vectors(spark.read.orc(path), dim, vec_col)
