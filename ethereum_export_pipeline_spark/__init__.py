"""ethereum_export_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the data-processing capabilities of
blockchain-etl/ethereum-export-pipeline (reference at /root/reference)
as an idiomatic Spark DataFrame/SQL engine, extended with the
large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns).

Layout:
    session        SparkSession factory tuned for local[N] + AQE
    schemas        the 7-table Ethereum star schema (explicit StructTypes)
    partitioning   block-range partition plan (split_to_batches parity)
    incremental    manifest-based bookmarks (Glue job-bookmark parity)
    sources/       CSV / Parquet / fixture-chain sources, catalog DDL
    operators/     convert, null-pruning, export-DAG, log decoding,
                   dedup, similarity, text analysis, multimodal
    functions/     cross-engine deterministic hash + tokenization exprs
    plans/         the query catalog (Spark impl + DuckDB oracle SQL)
    streaming/     Structured Streaming ops (availableNow file source)
"""

__version__ = "0.1.0"
