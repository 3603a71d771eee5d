"""Loaders for the driver-provided test corpus (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet each under /root/testdata/sf*/.

`events.parquet` stores its `ts` column as Parquet TIMESTAMP(NANOS),
which Spark 4's reader rejects unless
``spark.sql.legacy.parquet.nanosAsLong=true`` (then it surfaces as a
nanosecond-epoch BIGINT). We normalize it to both forms:

  * ``ts``       — TIMESTAMP_NTZ at microsecond precision (what DuckDB
                   sees natively, so oracle comparison is exact), and
  * ``ts_ns``    — the raw nanosecond BIGINT (kept: cheap integer
                   window arithmetic at scale beats timestamp math).

At 100 TB these reads are partitioned parquet scans; filters/projections
push down (PushedFilters / ReadSchema in `.explain`).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..session import ensure_conf

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_conf(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = (
            df.withColumnRenamed("ts", "ts_ns")
              .withColumn(
                  "ts",
                  F.expr("cast(timestamp_micros(ts_ns div 1000) as timestamp_ntz)"))
              .select("event_id", "ts", "ts_ns", "user_id", "event_type", "value", "props")
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TESTDATA_TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TESTDATA_TABLES) -> None:
    """Temp views over the corpus; idempotent per (session, sf_dir) —
    repeated catalog queries skip the 10 parquet-footer reads."""
    marker = "spark_graft.registered_dir"
    try:
        if spark.conf.get(marker, "") == sf_dir:
            return
    except Exception:
        pass
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
    spark.conf.set(marker, sf_dir)
