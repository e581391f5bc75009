"""Watermark-bounded streaming dedup (SURVEY §2.8; training-data path).

A live crawl re-fetches urls and re-hosts identical content; feeding a
KG build (or a training corpus) straight from the landing stream needs
exactly-one-per-key semantics WITHOUT unbounded state. This is the
built-in recipe: ``dropDuplicatesWithinWatermark`` keeps each key's
state only until the event-time watermark passes it — a re-fetch inside
the watermark is dropped, one outside it is treated as a fresh document
(correct for web text: a page re-crawled a month later legitimately
re-enters the corpus).

Batch dedup twins: dd_exact_dups (hash groupBy) and the dd_* near-dup
family in plans/queries.py; this is their streaming counterpart, so a
user can run the same policy in either driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(pages_stream: DataFrame, keys: Sequence[str] = ("url",),
                 ts_col: str = "warc_ts", watermark: str = "1 day") -> DataFrame:
    """Stream → stream with at most one row per ``keys`` inside any
    ``watermark``-sized event-time horizon. State is bounded by the
    watermark (keys older than it are evicted), so the operator survives
    an unbounded crawl."""
    return (
        pages_stream
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(list(keys))
    )


def dedup_stream_by_content(pages_stream: DataFrame, text_col: str = "html",
                            ts_col: str = "warc_ts",
                            watermark: str = "1 day") -> DataFrame:
    """Content-addressed variant: dedup on md5(text) instead of url, so
    mirrors/re-hosts collapse too. The hash column is added JVM-side
    (no Python in the stream) and dropped on the way out."""
    withk = pages_stream.withColumn("_chash", F.md5(F.col(text_col).cast("binary")))
    return (
        withk.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_chash"])
        .drop("_chash")
    )
