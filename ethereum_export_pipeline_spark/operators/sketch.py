"""Mergeable cardinality sketches for corpus accounting.

At 100 TB, "how many distinct documents / URLs / users per source" is
a sketch question — exact COUNT(DISTINCT) shuffles every distinct key.
Spark ships HyperLogLog (`approx_count_distinct`), but HLL output is
engine-specific (register layout, bias tables), so it can never be
hash-compared against another engine. This module implements the
K-MINIMUM-VALUES sketch (Bar-Yossef et al., RANDOM'02) instead:

  * keep the k smallest values of a uniform hash of the keys;
  * estimate |distinct| as (k-1) · H_MAX / h_(k)   (h_(k) = k-th min);
  * merge sketches by taking the k smallest of the union.

Every step is md5-based integer arithmetic + an order statistic, so
Spark and DuckDB produce BIT-IDENTICAL sketches and estimates — a
verifiable sketch, which HLL structurally cannot be.

Scale shape: one hash-distinct agg (map-side partial combine), then a
per-group top-k window over ~k rows per group; merging ships k rows
per group, not the key universe. The merged (global) sketch is built
from the per-group sketches alone — the corpus is NOT rescanned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions import h60, h60_sql

#: h60 draws 15 hex chars = 60 bits; hashes are uniform on [0, 2^60).
H60_MAX = 1 << 60


def _estimate(kth_col: str, n_col: str, k: int):
    """KMV estimator as ONE fixed float64 expression over exact ints
    (cross-engine deterministic per plans/base.py rules). Groups with
    fewer than k distinct keys are exact: the sketch IS the key set."""
    return F.when(
        F.col(n_col) < k, F.col(n_col).cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(float(H60_MAX))
                / F.col(kth_col).cast("double"))


def kmv_sketch(df: DataFrame, group_col: str = "source",
               key_col: str = "text", k: int = 32,
               merged_label: str = "__ALL__") -> DataFrame:
    """Per-group KMV distinct-count sketch + the merged global sketch.

    Returns one row per group plus one `merged_label` row:
    (group, n_kept, kth_min, est_distinct) where `n_kept` = |sketch|
    (= min(k, distinct keys)), `kth_min` = largest retained hash, and
    `est_distinct` the KMV estimate (exact when n_kept < k).

    The merged row is computed FROM the per-group sketches (k smallest
    of their union, distinct-ed first — the same key in two groups is
    one distinct key), demonstrating the property that makes sketches
    the 100 TB tool: partial results combine without revisiting data.
    """
    hashes = (df.where(F.col(key_col).isNotNull())
                .select(F.col(group_col).alias("grp"),
                        h60(F.col(key_col)).alias("h"))
                .distinct())
    w = Window.partitionBy("grp").orderBy("h")
    kept = (hashes.withColumn("rk", F.row_number().over(w))
                  .where(F.col("rk") <= k))
    per_group = (kept.groupBy("grp")
                     .agg(F.count(F.lit(1)).alias("n_kept"),
                          F.max("h").alias("kth_min")))
    merged_kept = (kept.select("h").distinct()
                       .withColumn("rk", F.row_number().over(
                           Window.orderBy("h")))
                       .where(F.col("rk") <= k))
    merged = (merged_kept.agg(F.count(F.lit(1)).alias("n_kept"),
                              F.max("h").alias("kth_min"))
                         .withColumn("grp", F.lit(merged_label)))
    out = per_group.unionByName(merged.select("grp", "n_kept", "kth_min"))
    return out.select(
        F.col("grp").alias(group_col),
        F.col("n_kept").cast("long").alias("n_kept"),
        F.col("kth_min").cast("long").alias("kth_min"),
        _estimate("kth_min", "n_kept", k).alias("est_distinct"))


def kmv_sketch_sql(table: str = "documents", group_expr: str = "source",
                   key_expr: str = "text", k: int = 32,
                   merged_label: str = "__ALL__") -> str:
    """DuckDB twin of `kmv_sketch` — identical hashes, order
    statistics, and the single estimator float expression."""
    est = (f"CASE WHEN n_kept < {k} THEN CAST(n_kept AS DOUBLE) "
           f"ELSE CAST({float(k - 1)} AS DOUBLE) * {float(H60_MAX)}"
           f" / CAST(kth_min AS DOUBLE) END")
    return f"""
WITH hashes AS (
  SELECT DISTINCT {group_expr} AS grp, {h60_sql(key_expr)} AS h
  FROM {table} WHERE {key_expr} IS NOT NULL
), kept AS (
  SELECT grp, h FROM (
    SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rk
    FROM hashes) WHERE rk <= {k}
), per_group AS (
  SELECT grp, count(*) AS n_kept, max(h) AS kth_min FROM kept GROUP BY 1
), merged AS (
  SELECT '{merged_label}' AS grp, count(*) AS n_kept, max(h) AS kth_min
  FROM (SELECT h FROM (
          SELECT h, row_number() OVER (ORDER BY h) AS rk
          FROM (SELECT DISTINCT h FROM kept)) WHERE rk <= {k})
)
SELECT grp AS {group_expr}, CAST(n_kept AS BIGINT) AS n_kept,
       CAST(kth_min AS BIGINT) AS kth_min, {est} AS est_distinct
FROM (SELECT * FROM per_group UNION ALL SELECT * FROM merged)
"""
