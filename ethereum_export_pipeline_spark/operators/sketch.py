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

from ..functions import (MERSENNE31, affine_hash_sql, h32, h32_sql, h60,
                         h60_sql, hash_family)

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
    # global window, but over the UNION OF SKETCHES — ≤ k rows per
    # group reach it, never the key universe
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


# ------------------------------------------------------- Bloom filter
# The second mergeable sketch: a deterministic Bloom filter over
# md5-derived positions. Spark builds runtime bloom filters itself
# (spark.sql.optimizer.runtime.bloomFilter.enabled) but — like HLL —
# its filter bytes are engine-private. This one is k affine hashes +
# per-limb bit_or, so DuckDB reproduces the filter AND every probe
# verdict bit-for-bit. Use: membership pre-filtering where the
# authoritative set is large enough that a broadcast semi join hurts —
# the filter is m bits regardless of set size, probes are map-side,
# and false positives only cost a wasted exact check (no false
# negatives, guaranteed by construction and pinned by the catalog's
# bloom ⊇ exact invariant).

BLOOM_M = 4096             # filter bits
BLOOM_K = 4                # hash functions
_LIMB_BITS = 32            # bits per limb row — masks stay positive int64
BLOOM_FAMILY = hash_family(BLOOM_K, seed=97)


def _positions(c):
    """array of BLOOM_K bit positions for a string column."""
    h = h32(c)
    return F.array(*[((h * F.lit(a) + F.lit(b)) % MERSENNE31) % BLOOM_M
                     for a, b in BLOOM_FAMILY])


def bloom_build(keys: DataFrame, key_col: str = "key",
                m: int = BLOOM_M) -> DataFrame:
    """Build the filter as (limb, bits) rows — m/32 rows total, the
    relational form of the bit array. The build is one explode (k
    rows per key) + one tiny hash agg with map-side bit_or partials;
    the result broadcasts anywhere a probe runs."""
    pos = (keys.select(F.explode(_positions(F.col(key_col))).alias("p"))
               .select(F.expr(f"p div {_LIMB_BITS}").alias("limb"),
                       F.expr(f"CAST(p % {_LIMB_BITS} AS INT)").alias("bit")))
    return (pos.groupBy("limb")
               .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), bit))")
                     .alias("bits")))


def bloom_probe(df: DataFrame, limbs: DataFrame, key_col: str = "key",
                keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """Probe: a row passes iff ALL k bits are set. Implemented as the
    k-position explode joined (broadcast) against the limb rows, then
    an all-bits-present agg per input row — no shuffle of `df` wider
    than its own k-row fan-out, and the limb table is m/32 rows
    however large the built-from set was.

    Returns df's (keep_cols, key_col) plus `bloom_hit` (0/1)."""
    probe = (df.select(*keep_cols, F.col(key_col),
                       F.posexplode(_positions(F.col(key_col)))
                        .alias("_i", "p"))
               .select(*keep_cols, key_col, "_i",
                       F.expr(f"p div {_LIMB_BITS}").alias("limb"),
                       F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                              f"CAST(p % {_LIMB_BITS} AS INT))")
                        .alias("mask")))
    joined = (probe.join(F.broadcast(limbs), "limb", "left")
                   .withColumn("_ok",
                               ((F.coalesce(F.col("bits"), F.lit(0))
                                 .bitwiseAND(F.col("mask")))
                                == F.col("mask")).cast("int")))
    return (joined.groupBy(*keep_cols, key_col)
                  .agg((F.min("_ok") == 1).cast("long").alias("bloom_hit")))


def bloom_positions_sql(expr: str) -> str:
    """DuckDB list of the same k positions."""
    h = h32_sql(expr)
    return ("[" + ", ".join(
        f"({affine_hash_sql(h, a, b)}) % {BLOOM_M}"
        for a, b in BLOOM_FAMILY) + "]")


def bloom_bits(limbs: DataFrame, m: int = BLOOM_M) -> list[int]:
    """Collapse the (limb, bits) rows to a dense limb list — m/32
    ints, the whole filter. This is the plan-build step of the inline
    probe: collecting 128 longs is the point of a Bloom filter (the
    authoritative set may be billions of keys; its filter is ~512 B
    and becomes a plan LITERAL, like the IVF centroid matrix)."""
    rows = {r["limb"]: r["bits"] for r in limbs.collect()}
    return [int(rows.get(i, 0)) for i in range(m // _LIMB_BITS)]


def bloom_hit_expr(key_expr: str, bits: list[int]):
    """MAP-SIDE probe: all-k-bits-set as one codegen'd boolean over
    the filter as a plan literal — zero joins, zero shuffle, the
    shape that makes bloom pre-filtering free at 100 TB (the
    relational `bloom_probe` twin exists for when the filter must be
    built and probed inside one plan; measured at ×100, its
    per-position verdict re-aggregation shuffles 768 MB where this
    form shuffles nothing). The all-literal array constant-folds to
    ONE Literal per occurrence — no per-row allocation (the
    `ivf_cell_col` lesson). Returns a 0/1 long Column."""
    arr = "array(" + ", ".join(f"{b}L" for b in bits) + ")"
    h = (f"(CAST(conv(substring(md5(CAST({key_expr} AS STRING)), 1, 8), "
         f"16, 10) AS BIGINT) % {MERSENNE31})")
    conds = []
    for a, b in BLOOM_FAMILY:
        p = f"(((({h}) * {a}L + {b}L) % {MERSENNE31}) % {BLOOM_M})"
        conds.append(
            f"((element_at({arr}, CAST({p} div {_LIMB_BITS} AS INT) + 1) & "
            f"shiftleft(CAST(1 AS BIGINT), CAST({p} % {_LIMB_BITS} AS INT)))"
            f" != 0)")
    return F.expr("CAST((" + " AND ".join(conds) + ") AS BIGINT)")
