"""Structured-Streaming wrapper: the batch extraction kernel runs
unchanged under foreachBatch over a landing directory."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from gossiphs_spark.datagen import PAGES_SCHEMA, pages_df
from gossiphs_spark.streaming import stream_pages


def test_stream_extracts_all_pages(spark, tmp_path):
    pages, _, expected = pages_df(spark, n_pages=24, seed=13)
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pages.write.parquet(landing)

    q = stream_pages(spark, landing, PAGES_SCHEMA, ckpt, out)
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    exp_mentions = {
        (u, n, k) for (u, n, k) in expected["mentions"]
    }
    got_set = {
        (r["url"], r["name"], r["kind"])
        for r in got.filter(F.col("kind") != "NAMESPACE").collect()
    }
    assert got_set == exp_mentions
    shutil.rmtree(ckpt, ignore_errors=True)
