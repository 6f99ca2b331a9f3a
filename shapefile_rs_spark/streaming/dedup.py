"""Streaming exact dedup — the ingestion-time twin of
:func:`operators.dedup.exact_dedup`.

A training-data landing zone re-receives the same page from recrawls and
mirror sites; deduping AT INGEST keeps every downstream stage (quality,
minhash, tokenize) from paying for copies.  Content identity is the md5 of
the text (16 bytes of state per distinct doc, independent of doc size).

Two state regimes:

* ``ts_col`` given — ``dropDuplicatesWithinWatermark``: state for a digest
  is dropped once the watermark passes it, so state size is bounded by the
  duplicate-arrival horizon (recrawl window), not corpus size.  This is
  the 100 TB mode.
* ``ts_col=None`` — plain ``dropDuplicates``: exact global dedup with
  unbounded state; only for bounded replays/backfills (availableNow over a
  finite directory), where it matches the batch operator exactly.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: Optional[str] = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """First-seen row per distinct ``text_col`` content (md5 identity)."""
    hashed = docs.withColumn("_text_md5", F.md5(F.col(text_col).cast("binary")))
    if ts_col:
        hashed = hashed.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        return (
            hashed.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["_text_md5"])
            .drop("_text_md5")
        )
    return hashed.dropDuplicates(["_text_md5"]).drop("_text_md5")
