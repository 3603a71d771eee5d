"""Physical-layout operators: Z-order (Morton) clustering for
multi-dimensional data skipping.

A parquet lake prunes with per-file min/max statistics. Sorting by ONE
column gives perfect skipping on that column and none on any other;
interleaving the bits of two columns into a Morton key and
range-partitioning by it gives every file a compact rectangle in
(x, y) space, so a box predicate on EITHER OR BOTH dimensions
intersects few files — the technique behind Delta/Iceberg's OPTIMIZE
ZORDER, expressed here with stock Spark primitives
(`repartitionByRange` + `sortWithinPartitions` + parquet stats).

The key is exact integer bit arithmetic (shifts, masks, adds) — the
same expression evaluates bit-identically in DuckDB, so the catalog
hash-checks it like any other projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

Z_BITS = 16  # per-dimension bits; 2 dims × 16 bits fit easily in int64


def z_value_expr(x: str, y: str, bits: int = Z_BITS) -> Column:
    """Morton key of two non-negative integer columns: bit i of `x`
    lands at position 2i, bit i of `y` at 2i+1. Values are masked to
    `bits` bits (callers with wider domains should bucket/scale
    first). Pure codegen'd integer arithmetic — no UDF."""
    terms = " + ".join(
        f"shiftleft((CAST({x} AS BIGINT) >> {i}) & 1, {2 * i}) + "
        f"shiftleft((CAST({y} AS BIGINT) >> {i}) & 1, {2 * i + 1})"
        for i in range(bits))
    return F.expr(terms)


def z_value_sql(x: str, y: str, bits: int = Z_BITS) -> str:
    """DuckDB twin of `z_value_expr` (same shifts, masks, adds)."""
    terms = " + ".join(
        f"(((CAST({x} AS BIGINT) >> {i}) & 1) << {2 * i}) + "
        f"(((CAST({y} AS BIGINT) >> {i}) & 1) << {2 * i + 1})"
        for i in range(bits))
    return f"CAST({terms} AS BIGINT)"


def write_zordered(df: DataFrame, path: str, x: str, y: str,
                   n_files: int = 16, bits: int = Z_BITS) -> None:
    """Write `df` as parquet clustered on the (x, y) Morton curve:
    range-partition on the z-key (one compact curve segment — a small
    rectangle cover — per output file) and sort within partitions so
    row-group stats are tight too. Readers need no special support:
    plain min/max pruning on x and y now skips most files for box
    predicates on either dimension."""
    keyed = df.withColumn("__z", z_value_expr(x, y, bits))
    (keyed.repartitionByRange(n_files, "__z")
          .sortWithinPartitions("__z")
          .drop("__z")
          .write.mode("overwrite").parquet(path))
