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


def test_windowed_crawl_stats_with_watermark(spark, tmp_path):
    """Watermarked event-time windows (SURVEY §2.8): streamed results must
    equal the same aggregation run in batch over the full input."""
    from gossiphs_spark.streaming.windowed import windowed_crawl_stats

    pages, _, _ = pages_df(spark, n_pages=40, seed=9)
    landing = str(tmp_path / "wland")
    pages.write.parquet(landing)

    stream = (
        spark.readStream.schema(PAGES_SCHEMA).format("parquet").load(landing)
    )
    q = (
        windowed_crawl_stats(stream, window="7 days", watermark="1 day")
        .writeStream.format("memory").queryName("crawl_stats")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)

    # append mode emits only watermark-finalized windows; with a bounded
    # file source every window but the last finalizes
    got = {
        (r["window_start"], r["n_pages"], r["bytes_html"])
        for r in spark.sql("SELECT * FROM crawl_stats").collect()
    }
    exp_all = {
        (r["window_start"], r["n_pages"], r["bytes_html"])
        for r in (
            spark.read.parquet(landing)
            .groupBy(F.window("warc_ts", "7 days").alias("w"))
            .agg(F.count("*").alias("n_pages"),
                 F.sum(F.length("html")).alias("bytes_html"))
            .select(F.col("w.start").alias("window_start"), "n_pages", "bytes_html")
            .collect()
        )
    }
    assert got  # at least the finalized windows arrived
    assert got <= exp_all  # every emitted window matches batch exactly
    assert len(exp_all) - len(got) <= 1  # only the open tail window held back
