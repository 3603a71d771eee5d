"""Data-retention operators: targeted deletion from a partitioned
corpus (takedown requests / right-to-be-forgotten) with
partition-pruned rewrites.

A training corpus at 100 TB cannot rewrite itself to drop a handful
of documents. The discipline: find the partitions that actually
contain victims (a semi join), rewrite ONLY those directories
(dynamic partition overwrite), and leave every other file untouched —
the delete cost scales with the affected partitions, not the corpus.
With a table format (Delta/Iceberg) this is DELETE + compaction; the
plumbing here is the same decision structure on plain parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def delete_ids(spark: SparkSession, corpus_dir: str, ids: DataFrame,
               id_col: str = "doc_id",
               partition_col: str = "source") -> dict:
    """Delete every row whose `id_col` appears in `ids` from the
    Hive-partitioned parquet corpus at `corpus_dir`, rewriting only
    the partitions that contain at least one victim.

    Returns {"partitions_rewritten": [...], "rows_deleted": n}.

    Scale notes: the victim id list is takedown-sized → broadcast
    semi/anti joins; the rewrite reads and writes only the affected
    partition directories (plus their lineage-breaking checkpoint —
    required because Spark refuses to overwrite a path it is reading);
    untouched partitions are never opened. Dynamic partition
    overwrite swaps each rewritten directory atomically."""
    import shutil
    corpus = spark.read.parquet(corpus_dir)
    affected = [r[0] for r in
                (corpus.join(F.broadcast(ids), id_col, "left_semi")
                       .select(partition_col).distinct().collect())]
    if not affected:
        return {"partitions_rewritten": [], "rows_deleted": 0}

    hit = corpus.where(F.col(partition_col).isin(affected))
    n_before = hit.count()
    remaining = (hit.join(F.broadcast(ids), id_col, "left_anti")
                    .localCheckpoint(eager=True))  # break source lineage
    n_after = remaining.count()

    # dynamic overwrite replaces only partitions PRESENT in the output:
    # a partition whose every row is a victim contributes no rows, so
    # its directory must be removed explicitly or the victims survive
    survivors = {r[0] for r in
                 remaining.select(partition_col).distinct().collect()}
    emptied = [p for p in affected if p not in survivors]
    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                              "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        if n_after > 0:
            (remaining.write.mode("overwrite")
                      .partitionBy(partition_col).parquet(corpus_dir))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)
    import os
    for p in emptied:
        shutil.rmtree(os.path.join(corpus_dir, f"{partition_col}={p}"),
                      ignore_errors=True)
    return {"partitions_rewritten": sorted(affected),
            "rows_deleted": n_before - n_after}
