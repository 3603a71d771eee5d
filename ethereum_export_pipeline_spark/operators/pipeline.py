"""The export DAG (E2, SURVEY §3) as DataFrame lineage.

The reference runs, per block-range partition (config.py:35-59):

    export_blocks_and_transactions ─┐
                                    ├→ extract(hash) → export_receipts_and_logs
                                    │        → filter(contract_address not null)
                                    │        → extract → export_contracts
    export_token_transfers ────────→ extract(token_address) | sort | uniq
                                             → export_tokens

Each arrow in the reference is a process boundary with S3-staged CSV
as the exchange format — its "shuffle" is files on S3, with 5 retries
and cascade-rerun (templates/export_pipeline_template.py:49,136). In
Spark the whole DAG is one lazy lineage: exchanges become in-memory /
shuffle, retries are task re-attempts, cascade-rerun is lineage
recomputation — all free.

Operator parity:
  P4  extract_csv_column      → `select(col)`            (config.py:40,46,56)
  P7  implicit null filter    → `filter(isNotNull)`      (config.py:46-48)
  A1  `sort | uniq`           → `distinct()`             (config.py:56)
  J1–J3 extract→fetch pipes   → broadcast left-semi joins
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from ..sources.chain import FixtureChain


def extract_column(df: DataFrame, column: str, alias: str | None = None) -> DataFrame:
    """P4 — single-column projection (extract_csv_column parity)."""
    return df.select(F.col(column).alias(alias or column))


def distinct_keys(df: DataFrame, column: str) -> DataFrame:
    """A1 — `sort | uniq` as a hash-aggregate distinct. Catalyst picks
    hash-agg over sort-dedup; at scale this is a map-side-combining
    shuffle on the key — strictly better than the reference's full
    global sort(1)."""
    return df.select(column).distinct()


@dataclass
class ExportResult:
    blocks: DataFrame
    transactions: DataFrame
    token_transfers: DataFrame
    receipts: DataFrame | None = None
    logs: DataFrame | None = None
    contracts: DataFrame | None = None
    tokens: DataFrame | None = None
    tables: dict[str, DataFrame] = field(default_factory=dict)


def run_export_dag(chain: FixtureChain, start: int, end: int,
                   export_receipts_and_logs: bool = True,
                   export_contracts: bool = True,
                   export_tokens: bool = True) -> ExportResult:
    """Build the full E2 lineage for one block range. Nothing executes
    until a sink action. The feature flags correspond to the
    reference's config.py:18-22 switches (which ship receipts/contracts
    off by default; here they default on so the full DAG is exercised)."""
    blocks, txs = chain.export_blocks_and_transactions(start, end)
    transfers = chain.export_token_transfers(start, end)
    res = ExportResult(blocks=blocks, transactions=txs, token_transfers=transfers)

    if export_receipts_and_logs:
        tx_hashes = extract_column(txs, "hash")                      # P4
        res.receipts, res.logs = chain.export_receipts_and_logs(tx_hashes)  # J1
        if export_contracts:
            addrs = extract_column(
                res.receipts.filter(F.col("contract_address").isNotNull()),  # P7
                "contract_address")
            res.contracts = chain.export_contracts(addrs)            # J2

    if export_tokens:
        token_addrs = distinct_keys(transfers, "token_address")      # A1
        res.tokens = chain.export_tokens(token_addrs)                # J3

    res.tables = {k: v for k, v in {
        "blocks": res.blocks, "transactions": res.transactions,
        "token_transfers": res.token_transfers, "receipts": res.receipts,
        "logs": res.logs, "contracts": res.contracts, "tokens": res.tokens,
    }.items() if v is not None}
    return res
