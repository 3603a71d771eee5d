"""Fixture-backed "chain" source — operators S1–S5 (SURVEY §2.1).

The reference exports from a live Ethereum node over IPC
(config.py:24-29,35-59): range scans (blocks+transactions,
token_transfers), keyed fetches (receipts by tx hash, contracts by
address, tokens by token address). Against a real chain those would be
a registered PySpark Python DataSource (Spark 4 `spark.dataSource`)
doing batched RPC in `mapInPandas`; for this engine the "chain" is a
directory of fixture tables and each export becomes a declarative
DataFrame: a partition-prunable range filter, or a broadcast left-semi
join against the key set.

Scale notes (100 TB): the range scan is a parquet scan with a pushed
`number BETWEEN` predicate (partition pruning via the range layout);
keyed fetch broadcasts the (deduped) key set when small — exactly the
reference's distinct-before-fetch shape at config.py:56-58 — and falls
back to a shuffle semi-join (AQE decides) when the key set is large.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..schemas import table_schema


class FixtureChain:
    """A chain backed by parquet fixture tables under `root`."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")

    def _table(self, name: str) -> DataFrame:
        return self.spark.read.schema(table_schema(name)).parquet(
            f"{self.root}/{name}.parquet")

    # S1 — range scan: blocks + transactions for [start, end]
    def export_blocks_and_transactions(self, start: int, end: int
                                       ) -> tuple[DataFrame, DataFrame]:
        blocks = self._table("blocks").where(F.col("number").between(start, end))
        txs = self._table("transactions").where(
            F.col("block_number").between(start, end))
        return blocks, txs

    # S5 — event-filtered range scan (Transfer-topic filter semantics)
    def export_token_transfers(self, start: int, end: int) -> DataFrame:
        return self._table("token_transfers").where(
            F.col("block_number").between(start, end))

    # S5 proper — derive token transfers FROM RAW LOGS for a range:
    # topic0 filter + address/value decode (reference config.py:51-53
    # semantics; the table above is the already-materialized shortcut)
    def export_token_transfers_from_logs(self, start: int, end: int) -> DataFrame:
        from ..operators.logs import token_transfers_from_logs
        logs = self._table("logs").where(
            F.col("block_number").between(start, end))
        return token_transfers_from_logs(logs)

    # S2 — keyed fetch: receipts+logs for a set of tx hashes
    def export_receipts_and_logs(self, tx_hashes: DataFrame
                                 ) -> tuple[DataFrame, DataFrame]:
        keys = F.broadcast(tx_hashes.select(F.col("hash").alias("transaction_hash")))
        receipts = self._table("receipts").join(keys, "transaction_hash", "left_semi")
        logs = self._table("logs").join(keys, "transaction_hash", "left_semi")
        return receipts, logs

    # S3 — keyed fetch: contract metadata per address
    def export_contracts(self, addresses: DataFrame) -> DataFrame:
        keys = F.broadcast(addresses.select(F.col("contract_address").alias("address")))
        return self._table("contracts").join(keys, "address", "left_semi")

    # S4 — keyed fetch: ERC-20 metadata per token address (the reference
    # runs this 5-way parallel, `-w 5` config.py:57 → repartition(5) on
    # a real RPC source; a fixture read needs no repartition)
    def export_tokens(self, token_addresses: DataFrame) -> DataFrame:
        keys = F.broadcast(token_addresses.select(F.col("token_address").alias("address")))
        return self._table("tokens").join(keys, "address", "left_semi")
