"""Driver contract for the spark-graft builder (PySpark target).

Thin views over ``ethereum_export_pipeline_spark.plans.ALL_QUERIES`` —
the query catalog pairing every implemented operator (SURVEY §2 +
LLM-pipeline extensions) with its DuckDB oracle SQL. See
``plans/base.py`` for the cross-engine typing rules that make the
value hashes engine-identical.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ethereum_export_pipeline_spark import plans
from ethereum_export_pipeline_spark.session import ensure_conf

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape: scan → pushed filter → codegen'd
    hash agg) on /root/testdata/sf0.001."""
    ensure_conf(spark)
    return plans.flagship(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY §2 (+ extensions).
    Each callable takes (spark, sf_dir) and returns a DataFrame."""
    return {name: q.fn for name, q in plans.ALL_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted only for
    the mapInPandas decode path, which is not SQL-expressible).
    ``sql_text()`` resolves the lazily-built oracles (IVF/PQ literals
    train on first access, not at import)."""
    return {name: q.sql_text() for name, q in plans.ALL_QUERIES.items()
            if q.sql is not None}
