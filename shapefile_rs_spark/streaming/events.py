"""Structured Streaming surface.

The north_rule pipeline is batch-with-checkpoints (SURVEY §1.5), but the
engine ships the streaming twins of its batch rollups so the same logical
plans run incrementally: file-source → watermark → windowed aggregation,
plus a custom stateful operator (session windows via
``applyInPandasWithState`` — the pattern for operators Spark lacks).

Everything is expressed so the ``availableNow`` trigger over a static
directory reproduces the batch result exactly (pinned by tests against
``q_events_hourly``).
"""

from __future__ import annotations

import os
import tempfile
from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)


def read_event_stream(spark: SparkSession, input_path: str) -> DataFrame:
    """Parquet file-source stream with the events schema inferred from the
    static footer (schema inference on streams requires it pinned).

    The file source monitors a DIRECTORY; a single-file path (the testdata
    layout) is adapted via a symlink in a scratch dir — production points
    this at the landing directory new files arrive in."""
    schema = spark.read.parquet(input_path).schema
    if os.path.isfile(input_path):
        d = tempfile.mkdtemp(prefix="evstream_")
        os.symlink(input_path, os.path.join(d, os.path.basename(input_path)))
        input_path = d
    return spark.readStream.schema(schema).parquet(input_path)


def hourly_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of q_events_hourly: watermarked 1-hour tumbling
    windows per event_type.  Late rows beyond the watermark are dropped;
    in availableNow/batch-replay mode nothing is late, so the result equals
    the batch rollup bit-for-bit."""
    # watermarks require TIMESTAMP (LTZ); parquet NTZ columns are cast —
    # lossless under the engine's UTC session timezone
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_value"),
        )
        .select(
            "event_type",
            F.col("w.start").alias("hour_start"),
            "n_events",
            "sum_value",
        )
    )


SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", IntegerType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_ts", LongType()),
        StructField("last_ts", LongType()),
        StructField("n", IntegerType()),
    ]
)


def _make_sessionize(use_timeout: bool):
    def _sessionize(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Gap-based sessionizer: events ≤gap apart extend the session;
        closed sessions emit when a larger gap arrives (and, in timeout
        mode, when the processing-time timeout flushes the open one).
        State is (start, last, count)."""
        gap_us = 30 * 60 * 1_000_000  # 30 min in microseconds
        if use_timeout and state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                }
            )
            return

        ts_us = []
        for pdf in pdfs:
            ts_us.extend((pdf["ts"].astype("int64") // 1000).tolist())
        ts_us.sort()
        out = []
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = ts_us[0], ts_us[0], 0
        for t in ts_us:
            if t - last_us > gap_us:
                out.append((start_us, last_us, n))
                start_us, n = t, 0
            last_us = max(last_us, t)
            n += 1
        state.update((start_us, last_us, n))
        if use_timeout:
            state.setTimeoutDuration(60 * 1000)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(out),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in out],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in out],
                    "n_events": [n for _, _, n in out],
                }
            )

    return _sessionize


def sessionize_stream(events: DataFrame, idle_timeout: bool = False) -> DataFrame:
    """Custom stateful streaming operator (the applyInPandasWithState
    pattern for semantics Spark's built-ins lack): 30-minute-gap session
    windows per user.

    ``idle_timeout=True`` also flushes open sessions after 60s of
    processing-time idleness — for long-lived streams only: the timeout
    keeps scheduling micro-batches, so an availableNow replay would spin
    servicing timeouts instead of terminating (measured).  Default (no
    timeout) emits exactly the gap-closed sessions and drains cleanly."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_sessionize(idle_timeout),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )


def run_available_now(sdf: DataFrame, query_name: str, checkpoint_dir: str) -> DataFrame:
    """Drain everything currently in the source into a memory sink and
    return the result table — the batch-replay harness used by tests."""
    q = (
        sdf.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete" if sdf.isStreaming and _has_agg(sdf) else "append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sdf.sparkSession.table(query_name)


def _has_agg(sdf: DataFrame) -> bool:
    plan = sdf._jdf.queryExecution().analyzed().toString()
    return "Aggregate" in plan
