"""Vector ingest sources: format round-trips, dimension validation
(B1 chunk rejection), and ID assignment modes (B2)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flechasdb_spark.sources.vectors import (
    assign_vector_ids,
    read_vectors_csv,
    read_vectors_json,
    read_vectors_parquet,
    validate_vectors,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
DIM = 64


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _as_pairs(df):
    return {
        (r.vec_id, tuple(round(float(x), 5) for x in r.embedding))
        for r in df.select("vec_id", "embedding").collect()
    }


def test_parquet_reader_validates(spark):
    df = read_vectors_parquet(spark, f"{SF_DIR}/embeddings.parquet", DIM)
    assert df.count() > 0


def test_csv_roundtrip(spark, emb, tmp_path):
    path = str(tmp_path / "vec_csv")
    emb.select(
        "vec_id",
        F.array_join(F.col("embedding"), ";").alias("embedding"),
    ).write.option("header", True).csv(path)
    back = read_vectors_csv(spark, path, DIM)
    assert _as_pairs(back) == _as_pairs(emb)


def test_json_roundtrip(spark, emb, tmp_path):
    path = str(tmp_path / "vec_json")
    emb.select("vec_id", "embedding").write.json(path)
    back = read_vectors_json(spark, path, DIM)
    assert _as_pairs(back) == _as_pairs(emb)


def test_wrong_dim_rejected(spark, emb):
    with pytest.raises(ValueError, match="length != 32"):
        validate_vectors(emb, 32)


def test_ragged_rows_rejected(spark, emb):
    ragged = emb.withColumn(
        "embedding",
        F.when(F.col("vec_id") == 3, F.slice("embedding", 1, 10)).otherwise(
            F.col("embedding")
        ),
    )
    with pytest.raises(ValueError, match="1 rows"):
        validate_vectors(ragged, DIM)


def test_content_hash_ids_deterministic_and_unique(spark, emb):
    vecs = emb.drop("vec_id")
    a = assign_vector_ids(vecs, id_col="vid")
    b = assign_vector_ids(vecs, id_col="vid")
    ids_a = sorted(r.vid for r in a.select("vid").collect())
    ids_b = sorted(r.vid for r in b.select("vid").collect())
    assert ids_a == ids_b  # deterministic
    assert len(set(ids_a)) == len(ids_a)  # unique on this data


def test_uuid_ids_are_random(spark, emb):
    vecs = emb.drop("vec_id").limit(10)
    a = {r.vid for r in assign_vector_ids(vecs, id_col="vid", mode="uuid").collect()}
    b = {r.vid for r in assign_vector_ids(vecs, id_col="vid", mode="uuid").collect()}
    assert len(a) == 10
    assert a != b  # two builds differ (SURVEY.md §2.4)
