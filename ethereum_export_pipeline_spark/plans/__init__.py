"""The query catalog: every operator from SURVEY §2 plus the
LLM-pipeline extensions, each as a (Spark plan, DuckDB oracle) pair.

This package IS the driver contract's backing store:
``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over
``ALL_QUERIES``; ``flagship`` backs ``entry()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import analytics, eth, llm, tpch2
from .base import Query
from .stream import QUERIES as _STREAM_QUERIES

ALL_QUERIES: dict[str, Query] = {}
for _mod_queries in (eth.QUERIES, analytics.QUERIES, tpch2.QUERIES,
                     llm.QUERIES, _STREAM_QUERIES):
    for _name, _q in _mod_queries.items():
        if _name in ALL_QUERIES:
            raise ValueError(f"duplicate query name: {_name}")
        ALL_QUERIES[_name] = _q


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The headline query (TPC-H Q1 shape over lineitem)."""
    return ALL_QUERIES["q1_pricing_summary"].fn(spark, sf_dir)
