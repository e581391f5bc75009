"""Watermarked windowed aggregation over a page stream (SURVEY §2.8).

The incremental ingestion surface the reference covers with its blob
cache (/root/reference/src/cache.rs:14-59): pages arrive continuously;
the engine maintains per-window crawl statistics (pages, hosts, mention
volume) keyed on event time ``warc_ts``, with a watermark bounding how
late a page may arrive before its window finalizes — the standard
Structured-Streaming recipe (no custom state needed; contrast
streaming/sessions.py, which needs applyInPandasWithState).

At scale this runs as `readStream` over the landing table (files/Kafka);
tests drive it with a file source and an in-memory sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_crawl_stats(pages_stream: DataFrame, window: str = "1 hour",
                         watermark: str = "1 day") -> DataFrame:
    """pages(url, warc_ts, html, …) stream → per-event-time-window crawl
    stats. Watermark finalizes a window once event time passes its end +
    ``watermark`` — later pages are dropped, so state is bounded."""
    host = F.regexp_extract("url", r"^[a-z]+://([^/]+)", 1)
    return (
        pages_stream
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"))
        .agg(
            F.count("*").alias("n_pages"),
            F.approx_count_distinct(host).alias("n_hosts"),
            F.sum(F.length("html")).alias("bytes_html"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_pages", "n_hosts", "bytes_html",
        )
    )
