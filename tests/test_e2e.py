"""The reference's full lifecycle, end to end (SURVEY §3 E1+E2+E3):

    partition plan → per-range export DAG → range-named CSVs →
    CSV→Parquet typed convert (Hive layout) → catalog registration →
    SQL over the converted tables

plus an oracle smoke slice so pytest alone (without
tools/oracle_check.py) still exercises the Spark↔DuckDB compare path.
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F


def test_reference_lifecycle_end_to_end(spark, eth_fixture_dir, tmp_path):
    from ethereum_export_pipeline_spark.operators.convert import convert_to_parquet
    from ethereum_export_pipeline_spark.operators.pipeline import run_export_dag
    from ethereum_export_pipeline_spark.partitioning import split_to_batches
    from ethereum_export_pipeline_spark.sources.catalog import (
        drop_database, register_converted_tables)
    from ethereum_export_pipeline_spark.sources.chain import FixtureChain
    from ethereum_export_pipeline_spark.sources.csv_source import write_partition_csv

    csv_root, pq_root = str(tmp_path / "csv"), str(tmp_path / "pq")
    chain = FixtureChain(spark, eth_fixture_dir)

    # E2: the reference's enabled flags (config.py:18-22): blocks+txs,
    # token_transfers, tokens — per volume-balanced range
    plan = list(split_to_batches(0, 39, 20))
    for s, e in plan:
        res = run_export_dag(chain, s, e,
                             export_receipts_and_logs=False,
                             export_contracts=False)
        write_partition_csv(res.blocks, csv_root, "blocks", s, e)
        write_partition_csv(res.transactions, csv_root, "transactions", s, e)
        write_partition_csv(res.token_transfers, csv_root,
                            "token_transfers", s, e)

    # E3: Glue-job equivalent, one parameterized convert per table
    for t in ("blocks", "transactions", "token_transfers"):
        convert_to_parquet(spark, csv_root, t, pq_root)

    # S9 + consumer workload: SQL over the registered converted tables
    register_converted_tables(
        spark, pq_root, database="eth_e2e",
        tables=("blocks", "transactions", "token_transfers"))
    try:
        got = spark.sql("""
            SELECT b.start_block, count(*) AS n_tx,
                   count(DISTINCT t.from_address) AS n_senders
            FROM eth_e2e.transactions t
            JOIN eth_e2e.blocks b ON t.block_number = b.number
            GROUP BY 1 ORDER BY 1
        """).collect()
        assert [(r.start_block, r.n_tx) for r in got] == [
            ("00000000", 100), ("00000020", 100)]
        # wei survived the whole trip as decimal(38,0) > int64
        v = spark.sql("SELECT max(value) AS v FROM eth_e2e.transactions"
                      ).collect()[0].v
        assert v > 2 ** 64
    finally:
        drop_database(spark, "eth_e2e")


ORACLE_SMOKE = ["q1_pricing_summary", "eth_partition_plan",
                "doc_token_counts", "doc_fingerprint"]  # md5 hash lockstep


@pytest.mark.parametrize("name", ORACLE_SMOKE)
def test_oracle_smoke(spark, name):
    """Spark result == DuckDB oracle at sf0.001 for a fast slice of the
    catalog (the full sweep lives in tools/oracle_check.py)."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from tools.oracle_check import TABLES, canon

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    sp = entrymod.queries()[name](spark, sf).toPandas()
    dk = con.execute(entrymod.oracle_sql()[name]).df()
    assert sorted(sp.columns) == sorted(dk.columns)
    assert canon(sp).equals(canon(dk))


def test_run_full_export_with_bookmarks(spark, eth_fixture_dir, tmp_path):
    import os
    from ethereum_export_pipeline_spark.operators.pipeline import run_full_export
    csv_root, manifest = str(tmp_path / "csv"), str(tmp_path / "manifest")
    plan = [(0, 19), (20, 39)]

    done = run_full_export(spark, eth_fixture_dir, csv_root, plan=plan,
                           manifest_path=manifest,
                           export_receipts_and_logs=False,
                           export_contracts=False)
    assert done == plan
    # reference layout: {table}/start_block=%08d/end_block=%08d/
    assert os.path.isdir(
        f"{csv_root}/blocks/start_block=00000020/end_block=00000039")
    assert os.path.isdir(
        f"{csv_root}/tokens/start_block=00000000/end_block=00000019")

    # rerun: bookmark skips everything
    assert run_full_export(spark, eth_fixture_dir, csv_root, plan=plan,
                           manifest_path=manifest,
                           export_receipts_and_logs=False,
                           export_contracts=False) == []
