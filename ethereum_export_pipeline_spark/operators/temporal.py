"""Temporal-table operators: SCD Type-2 history build.

The warehouse staple the reference's export DAG feeds into: turn an
append-only change/event log into an effective-dated dimension —
one row per (key, attribute-value RUN) carrying [valid_from,
valid_to) microsecond bounds, a version number, and a current flag
(Kimball's slowly-changing-dimension Type 2).

Everything is two window passes of integer arithmetic over the
key-partitioned log — the natural Spark shape: one shuffle on the
key, then lag/lead/row_number inside each partition, no joins and no
iteration. At 100 TB the log shuffles once; skewed keys (one entity
with millions of changes) are the only hazard and are the same
hazard any per-key window has — the sessionization salting notes in
`operators/skew.py` apply unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def scd2(log: DataFrame, key_col: str = "user_id",
         attr_col: str = "event_type", ts_us_col: str = "ts_us",
         seq_col: str = "event_id") -> DataFrame:
    """Collapse an ordered change log into SCD2 version rows.

    Within each key (ordered by (ts, seq) — `seq_col` makes
    same-microsecond ordering deterministic), consecutive rows with
    the SAME attribute value merge into one version; each CHANGE
    opens a new version effective at its timestamp and closes the
    previous one at the same instant (half-open [from, to)
    intervals, adjacent versions share a boundary). The last version
    per key is open-ended: valid_to NULL, is_current 1.

    Returns (key, version, attr, valid_from_us, valid_to_us,
    is_current); NULL attribute values are legal and compared
    null-safely (NULL→NULL is not a change)."""
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_us_col).asc(), F.col(seq_col).asc())
    flagged = (
        log.select(key_col, attr_col, ts_us_col, seq_col)
           .withColumn("_prev", F.lag(attr_col).over(w))
           .withColumn("_first", F.row_number().over(w) == 1)
           # null-safe change test: row_number()==1 opens version 1
           # even when the first value is NULL
           .withColumn("_chg",
                       F.col("_first")
                       | ~F.col(attr_col).eqNullSafe(F.col("_prev"))))
    changes = flagged.where(F.col("_chg"))
    wc = Window.partitionBy(key_col).orderBy(
        F.col(ts_us_col).asc(), F.col(seq_col).asc())
    return (
        changes
        .withColumn("version", F.row_number().over(wc).cast("long"))
        .withColumn("valid_to_us", F.lead(ts_us_col).over(wc).cast("long"))
        .select(F.col(key_col),
                "version",
                F.col(attr_col).alias("attr"),
                F.col(ts_us_col).cast("long").alias("valid_from_us"),
                "valid_to_us",
                F.when(F.col("valid_to_us").isNull(), F.lit(1))
                 .otherwise(F.lit(0)).cast("long").alias("is_current")))


def scd2_sql(table_cte: str, key: str = "user_id",
             attr: str = "event_type", ts_us: str = "us",
             seq: str = "event_id") -> str:
    """DuckDB twin of `scd2` over a CTE exposing (key, attr, ts_us,
    seq) — identical windows, identical null-safe change test
    (IS DISTINCT FROM)."""
    return f"""
WITH log AS ({table_cte}),
flagged AS (
  SELECT {key}, {attr}, {ts_us}, {seq},
         lag({attr}) OVER w AS _prev,
         row_number() OVER w = 1 AS _first
  FROM log
  WINDOW w AS (PARTITION BY {key} ORDER BY {ts_us}, {seq})
),
changes AS (
  SELECT * FROM flagged
  WHERE _first OR ({attr} IS DISTINCT FROM _prev)
)
SELECT {key},
       CAST(row_number() OVER w AS BIGINT) AS version,
       {attr} AS attr,
       CAST({ts_us} AS BIGINT) AS valid_from_us,
       CAST(lead({ts_us}) OVER w AS BIGINT) AS valid_to_us,
       CAST(CASE WHEN lead({ts_us}) OVER w IS NULL THEN 1 ELSE 0 END
            AS BIGINT) AS is_current
FROM changes
WINDOW w AS (PARTITION BY {key} ORDER BY {ts_us}, {seq})
"""
