"""Structured-Streaming wrapper over the batch stages (SURVEY.md §2.8).

The reference is strictly batch; its incremental surfaces (blob cache,
diff, commit_id time-travel) map to our lineage/resume + snapshot diff.
This optional wrapper runs the same extraction kernel under
``foreachBatch`` so a continuously-landing crawl (new parquet files in a
directory) streams into the triples sink with per-batch lineage — the
stages themselves are unchanged, which is the point: one implementation,
two drivers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_pages(spark: SparkSession, pages_dir: str, schema: str,
                 checkpoint_dir: str, out_dir: str,
                 trigger_once: bool = True):
    """readStream over a landing directory → extraction → parquet sink.

    Watermark on warc_ts bounds state for any windowed aggregation added
    downstream; the extraction itself is stateless (pure per-row), so the
    stream is embarrassingly incremental.
    """
    from gossiphs_spark.operators.extract import extract_mentions

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(pages_dir)
        .withWatermark("warc_ts", "1 day")
    )

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        m = extract_mentions(batch_df)
        (
            m.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out_dir)
        )

    writer = (
        src.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
