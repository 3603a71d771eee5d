"""Streaming catalog entries — executed by Structured Streaming,
verified against the batch-equivalent DuckDB SQL (the strongest
correctness statement available for a stream: its complete-mode output
must equal the batch answer over the same inputs)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming import (WINDOW_US, stream_exact_dedup,
                         stream_hopping_counts, stream_tumbling_counts)
from .analytics import _EVENTS_SESSIONS_SQL
from .base import Query


def _stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_tumbling_counts(spark,
                                  f"{sf_dir.rstrip('/')}/events.parquet")


def _stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_exact_dedup(spark,
                              f"{sf_dir.rstrip('/')}/documents.parquet")


_STREAM_DEDUP_SQL = """
SELECT DISTINCT md5(text) AS content_key
FROM documents WHERE text IS NOT NULL
"""


HOP_US = WINDOW_US // 2


def _stream_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_hopping_counts(spark,
                                 f"{sf_dir.rstrip('/')}/events.parquet")


_STREAM_HOPPING_SQL = f"""
SELECT win_start, count(*) AS n,
       min(event_id) AS first_event, max(event_id) AS last_event
FROM (SELECT event_id,
             (epoch_us(ts) // {HOP_US} - k) * {HOP_US} AS win_start
      FROM events, UNNEST(range({WINDOW_US // HOP_US})) u(k))
WHERE win_start >= 0
GROUP BY 1
"""


def _stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState sessionization, verified against the SAME
    SQL oracle as the batch window sessionizer — custom stateful
    streaming with a full value-hash check."""
    from ..streaming.sessions import stream_sessionize
    return stream_sessionize(spark, f"{sf_dir.rstrip('/')}/events.parquet")


_STREAM_TUMBLING_SQL = f"""
SELECT epoch_us(ts) // {WINDOW_US} AS win, count(*) AS n,
       min(event_id) AS first_event, max(event_id) AS last_event
FROM events GROUP BY 1
"""


QUERIES: dict[str, Query] = {
    "stream_tumbling_counts": Query(_stream_tumbling, _STREAM_TUMBLING_SQL,
                                    "availableNow streaming window agg"),
    "stream_sessions": Query(_stream_sessions, _EVENTS_SESSIONS_SQL,
                             "stateful applyInPandasWithState sessions"),
    "stream_dedup": Query(_stream_dedup, _STREAM_DEDUP_SQL,
                          "streaming dropDuplicates exact dedup"),
    "stream_hopping_counts": Query(_stream_hopping, _STREAM_HOPPING_SQL,
                                   "overlapping hopping-window counts"),
}
