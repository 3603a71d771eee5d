"""Registered Python data source for chain ingestion (operator S1's
scale path, SURVEY §2.1).

The reference exports from an Ethereum node over IPC
(config.py:24-29, `export_blocks_and_transactions -s -e -p $IPC_PATH`),
one OS process per block range. The Spark-4-native equivalent is the
Python Data Source API: `spark.dataSource.register(ChainDataSource)`
then

    spark.read.format("ethereum_chain")
         .option("start", 0).option("end", 4_999_999)
         .option("batch_size", 100_000).load()

Each plan range becomes one InputPartition (the reference's `-w`
parallelism maps to Spark task slots), and each partition's reader
fetches its own range — against a real node that is the batched
JSON-RPC loop; here it synthesizes deterministic fixture blocks so the
partitioning/laziness/schema behavior is real and testable offline.
The partition count, ranged fetch, and zero-copy Arrow hand-off are
exactly what a production RPC-backed source needs.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    DataSourceStreamReader, InputPartition)
from pyspark.sql.types import StructType

from ..partitioning import split_to_batches
from ..schemas import table_schema


class ChainRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


def _block_hash(number: int) -> str:
    h = hashlib.md5(f"block:{number}".encode()).hexdigest()
    return "0x" + h + h[:32]


def _fake_block(number: int) -> dict:
    """Deterministic synthetic block — the stand-in for one JSON-RPC
    `eth_getBlockByNumber` result (no node in this environment)."""
    h = hashlib.md5(f"block:{number}".encode()).hexdigest()
    return {
        "number": number,
        "hash": _block_hash(number),
        "parent_hash": "0x" + "0" * 64 if number == 0 else _block_hash(number - 1),
        "nonce": "0x" + h[:16],
        "sha3_uncles": None,
        "logs_bloom": None,
        "transactions_root": None,
        "state_root": None,
        "miner": "0x" + h[:40],
        "difficulty": None,
        "total_difficulty": None,
        "size": 500 + (number % 1000),
        "extra_data": None,
        "gas_limit": 8_000_000,
        "gas_used": number % 8_000_000,
        "timestamp": 1_438_269_973 + 15 * number,
        "transaction_count": number % 200,
    }


class ChainReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.start = int(options.get("start", 0))
        self.end = int(options.get("end", 999))
        self.batch_size = int(options.get("batch_size", 100))

    def partitions(self):
        return [ChainRange(s, e) for s, e in
                split_to_batches(self.start, self.end, self.batch_size)]

    def read(self, partition: ChainRange):
        names = [f.name for f in self.schema_.fields]
        for n in range(partition.start, partition.end + 1):
            b = _fake_block(n)
            yield tuple(b.get(c) for c in names)


class ChainDataSource(DataSource):
    """`ethereum_chain` — blocks for a range, one partition per batch."""

    @classmethod
    def name(cls) -> str:
        return "ethereum_chain"

    def schema(self) -> StructType:
        return table_schema("blocks")

    def reader(self, schema: StructType) -> ChainReader:
        return ChainReader(schema, self.options)

    def streamReader(self, schema: StructType) -> "ChainStreamReader":
        return ChainStreamReader(schema, self.options)


def register(spark) -> None:
    """Idempotent: the Python data-source registry is shared across
    sessions of one SparkContext, and a re-register from a DIFFERENT
    session (streaming runs on isolated child sessions) raises
    DATA_SOURCE_ALREADY_EXISTS — an already-present registration is
    exactly the state we want."""
    try:
        spark.dataSource.register(ChainDataSource)
    except Exception as ex:  # pragma: no cover - version-specific text
        if "DATA_SOURCE_ALREADY_EXISTS" not in str(ex):
            raise


# ------------------------------------------------------------ streaming


class ChainStreamReader(DataSourceStreamReader):
    """Chain-tailing stream: offsets are block numbers, each micro-batch
    covers (last_committed, head] split into range partitions — the
    streaming form of the reference's "rerun the pipeline for new block
    ranges" (ondemand scheduling, SURVEY O6). Against a real node,
    `latestOffset` polls the RPC head; here the head is an option so
    tests are deterministic."""

    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.start = int(options.get("start", 0))
        self.head = int(options.get("head", 999))
        self.batch_size = int(options.get("batch_size", 100))

    def initialOffset(self) -> dict:
        return {"block": self.start}

    def latestOffset(self) -> dict:
        return {"block": self.head + 1}  # exclusive upper bound

    def partitions(self, start: dict, end: dict):
        lo, hi = start["block"], end["block"] - 1
        if lo > hi:
            return []
        return [ChainRange(s, e) for s, e in
                split_to_batches(lo, hi, self.batch_size)]

    def read(self, partition: ChainRange):
        names = [f.name for f in self.schema_.fields]
        for n in range(partition.start, partition.end + 1):
            b = _fake_block(n)
            yield tuple(b.get(c) for c in names)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the stream checkpoint
