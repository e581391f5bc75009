"""Stateful streaming sessionization (applyInPandasWithState)."""

from __future__ import annotations

from datetime import datetime, timedelta

from gossiphs_spark.streaming.sessions import sessionize_stream

T0 = datetime(2024, 1, 1)


def test_sessionize_gap_splits(spark, tmp_path):
    rows = []
    # user 1: burst of 3, 2h gap, burst of 2 (only the first burst completes)
    for m in (0, 5, 10):
        rows.append((1, T0 + timedelta(minutes=m)))
    for m in (130, 135):
        rows.append((1, T0 + timedelta(minutes=m)))
    # user 2: single burst → stays open in state, nothing emitted
    rows.append((2, T0),)
    src = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(rows, "user_id long, ts timestamp").write.parquet(src)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    )
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from sessions_out").collect()
    assert len(got) == 1
    r = got[0]
    assert r["user_id"] == 1
    assert r["n_events"] == 3
    assert r["session_start"] == T0
    assert r["session_end"] == T0 + timedelta(minutes=10)
