"""Structured Streaming twins: availableNow replay over the static events
table must reproduce the batch rollup exactly; the stateful sessionizer
must emit plausible gap sessions."""

import pytest

from pyspark.sql import functions as F


def test_hourly_rollup_matches_batch(spark, sf_dir, tmp_path):
    from shapefile_rs_spark.streaming.events import (
        hourly_rollup,
        read_event_stream,
        run_available_now,
    )

    events_dir = f"{sf_dir}/events.parquet"
    stream = read_event_stream(spark, events_dir)
    result = run_available_now(
        hourly_rollup(stream), "hourly_stream_test", str(tmp_path / "ckpt")
    )
    def keyify(df):
        return {
            (r["event_type"], r["h"], r["n_events"], r["sum_value"])
            for r in df.withColumn(
                "h", F.date_format(F.col("hour_start").cast("timestamp"), "yyyy-MM-dd HH:mm:ss")
            ).collect()
        }

    got = keyify(result)
    batch = (
        spark.read.parquet(events_dir)
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("hour_start"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_value"),
        )
    )
    want = keyify(batch)
    assert got and got == want


def test_sessionize_stream_runs(spark, sf_dir, tmp_path):
    from shapefile_rs_spark.streaming.events import read_event_stream, sessionize_stream

    stream = read_event_stream(spark, f"{sf_dir}/events.parquet")
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("sessions_test").collect()
    # closed sessions only appear when a gap/timeout fires inside the replay;
    # at minimum the query must run and every emitted session must be sane
    for r in rows:
        assert r["session_start"] <= r["session_end"]
        assert r["n_events"] >= 1
