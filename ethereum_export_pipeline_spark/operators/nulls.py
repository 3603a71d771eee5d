"""Null-column pruning — operator P6 (Glue `DropNullFields` parity,
convert_blocks_to_parquet.py:58).

Glue's DropNullFields silently removes columns that are entirely null.
Spark has no single built-in; the idiomatic plan is ONE aggregate pass
computing every column's non-null count simultaneously (map-side
partial aggregation, a single job), then a driver-side `drop` of the
dead columns. This is an extra full scan, so it is opt-in on the
100 TB path (SURVEY §7 hard-part c): callers that know their schema
should not pay it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def null_profile(df: DataFrame) -> dict[str, int]:
    """Non-null count per column in a single aggregate pass."""
    aggs = [F.count(F.col(c)).alias(c) for c in df.columns]
    row = df.agg(*aggs).collect()[0]
    return row.asDict()


def drop_null_fields(df: DataFrame) -> DataFrame:
    """Drop columns whose every value is NULL (DropNullFields parity)."""
    counts = null_profile(df)
    dead = [c for c, n in counts.items() if n == 0]
    return df.drop(*dead) if dead else df
