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


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Streaming url-dedup: re-fetches inside the watermark collapse to
    one row per url; state is watermark-bounded."""
    from gossiphs_spark.streaming.dedup import dedup_stream

    pages, _, _ = pages_df(spark, n_pages=30, seed=5)
    # simulate re-fetches: every page lands twice, second copy 1 hour later
    refetch = pages.withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 1 HOUR")
    )
    landing = str(tmp_path / "dl")
    pages.unionByName(refetch).write.parquet(landing)

    stream = spark.readStream.schema(PAGES_SCHEMA).format("parquet").load(landing)
    q = (
        dedup_stream(stream, keys=("url",), watermark="1 day")
        .writeStream.format("memory").queryName("dedup_urls")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)

    got = spark.sql("SELECT url FROM dedup_urls").collect()
    urls = [r["url"] for r in got]
    assert len(urls) == len(set(urls)) == 30  # one row per url, none lost


def test_stream_dedup_by_content(spark, tmp_path):
    """Content-addressed streaming dedup: mirrors (same html, different
    url) collapse; distinct content survives."""
    from gossiphs_spark.streaming.dedup import dedup_stream_by_content

    pages, _, _ = pages_df(spark, n_pages=20, seed=5)
    mirror = pages.withColumn("url", F.concat(F.lit("mirror-"), F.col("url")))
    landing = str(tmp_path / "dc")
    pages.unionByName(mirror).write.parquet(landing)

    stream = spark.readStream.schema(PAGES_SCHEMA).format("parquet").load(landing)
    q = (
        dedup_stream_by_content(stream, text_col="html", watermark="1 day")
        .writeStream.format("memory").queryName("dedup_content")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)

    rows = spark.sql("SELECT url, html FROM dedup_content").collect()
    assert len(rows) == 20  # one survivor per distinct html
    assert len({bytes(r["html"]) for r in rows}) == 20
    assert "_chash" not in spark.sql("SELECT * FROM dedup_content").columns
