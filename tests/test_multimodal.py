"""Multimodal binary-column plumbing: schema, Arrow batching, determinism.
The decode itself is a documented deterministic stub (no codec libs in
this container) — what's under test is the real Spark-side path."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from gossiphs_spark.operators.multimodal import decode_binary_column


@pytest.mark.smoke
def test_decode_schema_and_determinism(spark):
    df = spark.createDataFrame(
        [("u1", b"payload-one"), ("u2", b"payload-two"), ("u3", b""), ("u4", None)],
        "url string, payload binary",
    )
    out = decode_binary_column(df)
    assert out.schema.simpleString() == (
        "struct<url:string,n_bytes:bigint,format:string,width:bigint,"
        "height:bigint,phash:bigint>"
    )
    rows = {r["url"]: r for r in out.collect()}
    assert rows["u1"]["n_bytes"] == len(b"payload-one")
    assert rows["u3"]["format"] == "empty"
    assert rows["u4"]["n_bytes"] == 0
    # determinism across repartitioning (Arrow batch boundaries move)
    rows2 = {r["url"]: r for r in decode_binary_column(df.repartition(3)).collect()}
    for k in rows:
        assert tuple(rows[k]) == tuple(rows2[k])


def test_decode_over_document_bytes(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    binarized = docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.encode("text", "utf-8").alias("payload"),
    )
    out = decode_binary_column(binarized)
    assert out.count() == 50
    assert out.filter(F.col("n_bytes") <= 0).count() == 0
