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

from ..functions import (MERSENNE31, affine_hash, affine_hash_sql, h32,
                         h32_sql, h60, h60_sql, hash_family, tokens)

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
    return F.expr(f"CAST(({bloom_hit_pred(key_expr, bits)}) AS BIGINT)")


def bloom_hit_pred(key_expr: str, bits: list[int]) -> str:
    """The raw boolean Spark-SQL TEXT of the bloom probe — usable
    inside higher-order-function lambdas (`filter(arr, s -> …)`)
    where a Column can't reach; `bloom_hit_expr` wraps it for
    column-level use."""
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
    return " AND ".join(conds)


# -------------------------------------------------- count-min sketch
# The third mergeable sketch: frequency estimation. At 100 TB "how
# often does each of these tokens / URLs / user agents occur" is a
# count-min question when the key universe is too wide to aggregate
# exactly — the sketch is a fixed D×W integer counter matrix however
# many distinct keys exist, and two sketches over two corpus slices
# merge by cell-wise addition (counts are linear). Like KMV and the
# Bloom filter, it is built from md5-affine hashes + integer sums
# ONLY, so a DuckDB oracle reproduces every cell and every estimate
# bit-for-bit (Cormode & Muthukrishnan, J.Algorithms'05).

CMS_D = 4                  # depth: hash rows (error probability 2^-D-ish)
CMS_W = 512                # width: counters per row (error ~ N/W)
CMS_FAMILY = hash_family(CMS_D, seed=29)
CMS_TOPK = 20


def cms_cells(key_hash, d: int = CMS_D, w: int = CMS_W):
    """array<long> of the D cell columns a key hashes to (one affine
    hash per row, reduced mod W)."""
    return F.array(*[
        affine_hash(key_hash, a, b) % w for a, b in CMS_FAMILY[:d]])


def cms_build(occ: DataFrame, key_col: str = "tok",
              d: int = CMS_D, w: int = CMS_W) -> DataFrame:
    """Build the D×W sketch from an occurrence frame (one row per key
    OCCURRENCE): returns (r, c, cnt) with at most d·w rows.

    Scale shape: ONE scan; posexplode fans each occurrence into its D
    cells and the (r, c) hash-agg map-side-combines into ≤ d·w partial
    cells per task BEFORE the exchange — the shuffle is bounded by
    d·w·n_tasks rows regardless of corpus size, and the result is
    d·w rows. That boundedness (plus cell-wise mergeability) is the
    whole point of the sketch at 100 TB."""
    return (occ.select(F.posexplode(cms_cells(h32(F.col(key_col)), d, w))
                        .alias("r", "c"))
               .groupBy("r", "c")
               .agg(F.count(F.lit(1)).cast("long").alias("cnt")))


def cms_estimate(keys: DataFrame, sketch: DataFrame,
                 key_col: str = "tok",
                 d: int = CMS_D, w: int = CMS_W) -> DataFrame:
    """Point-query the sketch for each key in `keys`: estimate =
    min over rows r of sketch[r][h_r(key)] — an OVERESTIMATE of the
    true count by construction (hash collisions only ever add).
    Adds `cms_cnt` to `keys`. The ≤ d·w-row sketch broadcasts; probes
    are a map-side join + a d-row min per key."""
    cells = keys.select(key_col,
                        F.posexplode(cms_cells(h32(F.col(key_col)), d, w))
                         .alias("r", "c"))
    return (cells.join(F.broadcast(sketch), ["r", "c"], "left")
                 .groupBy(key_col)
                 .agg(F.min(F.coalesce("cnt", F.lit(0)))
                       .cast("long").alias("cms_cnt")))


def cms_heavy_hitters(df: DataFrame, text_col: str = "text",
                      k: int = CMS_TOPK, d: int = CMS_D,
                      w: int = CMS_W) -> DataFrame:
    """Heavy-hitter report: the corpus's exact top-k tokens next to
    their count-min estimates — (rank, tok, exact_cnt, cms_cnt,
    overcount). The catalog hash PINS the CMS guarantee on every row:
    cms_cnt >= exact_cnt always (overcount >= 0), with equality
    whenever no heavier key shares all D cells.

    (The exact counts are the fixture-sized ground truth the sketch
    is graded against; at 100 TB one keeps ONLY the d·w-cell sketch
    plus a candidate stream — the exact side of this report is the
    verification harness, not the production plan.)

    Scale shape: the exact top-k is a token hash-agg + TakeOrdered;
    the sketch build is the bounded exchange described in
    `cms_build`; the probe broadcasts the sketch. Three scans of the
    token stream in the graded report, ONE (the sketch build) in
    production."""
    from pyspark.sql import Window
    occ = (df.where(F.col(text_col).isNotNull())
             .select(F.explode(tokens(text_col)).alias("tok")))
    exact = occ.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("exact_cnt"))
    top = (exact.orderBy(F.col("exact_cnt").desc(), F.col("tok").asc())
                .limit(k))
    est = cms_estimate(top.select("tok"), cms_build(occ, "tok", d, w),
                       "tok", d, w)
    wrk = Window.orderBy(F.col("exact_cnt").desc(), F.col("tok").asc())
    return (top.join(est, "tok")
               .withColumn("rank", F.row_number().over(wrk).cast("long"))
               .select("rank", "tok", "exact_cnt", "cms_cnt",
                       (F.col("cms_cnt") - F.col("exact_cnt"))
                        .alias("overcount")))


def cms_heavy_hitters_sql(table: str = "documents",
                          text_expr: str = "text",
                          k: int = CMS_TOPK, d: int = CMS_D,
                          w: int = CMS_W) -> str:
    """DuckDB twin of `cms_heavy_hitters`: identical affine cell
    hashes (UNION ALL per row r), identical min-over-rows estimate."""
    from ..functions import tokens_sql
    cell_selects = "\n  UNION ALL\n".join(
        f"  SELECT {r} AS r, ({affine_hash_sql('h', a, b)}) % {w} AS c "
        "FROM hashed"
        for r, (a, b) in enumerate(CMS_FAMILY[:d]))
    probe_cells = "\n  UNION ALL\n".join(
        f"  SELECT tok, exact_cnt, {r} AS r, "
        f"({affine_hash_sql('h', a, b)}) % {w} AS c FROM top"
        for r, (a, b) in enumerate(CMS_FAMILY[:d]))
    return f"""
WITH occ AS (
  SELECT unnest({tokens_sql(text_expr)}) AS tok
  FROM {table} WHERE {text_expr} IS NOT NULL
),
hashed AS (SELECT {h32_sql('tok')} AS h FROM occ),
cells AS (
{cell_selects}
),
sketch AS (SELECT r, c, CAST(count(*) AS BIGINT) AS cnt
           FROM cells GROUP BY r, c),
exact AS (SELECT tok, CAST(count(*) AS BIGINT) AS exact_cnt
          FROM occ GROUP BY tok),
top AS (
  SELECT tok, exact_cnt, {h32_sql('tok')} AS h
  FROM exact ORDER BY exact_cnt DESC, tok ASC LIMIT {k}
),
probe AS (
{probe_cells}
),
est AS (
  SELECT p.tok, p.exact_cnt,
         CAST(min(COALESCE(s.cnt, 0)) AS BIGINT) AS cms_cnt
  FROM probe p LEFT JOIN sketch s USING (r, c)
  GROUP BY p.tok, p.exact_cnt
)
SELECT CAST(row_number() OVER (ORDER BY exact_cnt DESC, tok ASC) AS BIGINT)
         AS rank,
       tok, exact_cnt, cms_cnt, cms_cnt - exact_cnt AS overcount
FROM est
"""


def kmv_pair_overlap(df: DataFrame, group_col: str = "source",
                     key_col: str = "text", k: int = 32) -> DataFrame:
    """Pairwise set-INTERSECTION estimates between groups from their
    KMV sketches alone — the sketch-algebra capability that makes
    sketches a corpus-accounting tool rather than a single statistic
    (Beyer et al., SIGMOD'07 multi-set KMV): "how many distinct
    documents do sources A and B share" for every pair, WITHOUT
    rescanning the corpus per pair (the exact answer is a quadratic
    family of distinct-intersection queries; the sketches answer all
    of them from k rows per group).

    For a pair (a, b): the union sketch is the k smallest distinct
    hashes of kept_a ∪ kept_b; ρ = (members of the union sketch
    present in BOTH sides) / |union sketch| estimates the Jaccard,
    and est_inter = ρ · est_union. Returns per pair:
    (grp_a, grp_b, n_union_kept, kth_min, n_both, est_union,
    est_inter) — counts exact BIGINTs, the two estimates each ONE
    fixed float64 expression over them (cross-engine bit-identical).

    Scale shape: the per-group kept sets are k rows each (built by
    one corpus hash-distinct + per-group top-k window — `kmv_sketch`'s
    exchange); everything pairwise happens on groups·k rows. 20
    sources × k=32 = 640 rows feeding 190 pair estimates."""
    from pyspark.sql import Window
    hashes = (df.where(F.col(key_col).isNotNull()
                       & F.col(group_col).isNotNull())
                .select(F.col(group_col).alias("grp"),
                        h60(F.col(key_col)).alias("h"))
                .distinct())
    w = Window.partitionBy("grp").orderBy("h")
    kept = (hashes.withColumn("rk", F.row_number().over(w))
                  .where(F.col("rk") <= k).select("grp", "h"))
    groups = kept.select("grp").distinct()
    pairs = (groups.select(F.col("grp").alias("grp_a"))
             .join(groups.select(F.col("grp").alias("grp_b")),
                   F.col("grp_a") < F.col("grp_b")))
    ka = kept.select(F.col("grp").alias("grp_a"), "h",
                     F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
    kb = kept.select(F.col("grp").alias("grp_b"), "h",
                     F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    cols = ("grp_a", "grp_b", "h", "in_a", "in_b")
    # select() both branches: unionAll is positional and each join
    # moves its key column first — unchecked, the b-branch lands with
    # grp_b in the grp_a slot (reversed pairs)
    u = (pairs.join(ka, "grp_a").select(*cols)
              .unionAll(pairs.join(kb, "grp_b").select(*cols))
              .groupBy("grp_a", "grp_b", "h")
              .agg(F.max("in_a").alias("in_a"),
                   F.max("in_b").alias("in_b")))
    wu = Window.partitionBy("grp_a", "grp_b").orderBy("h")
    sk = (u.withColumn("rk", F.row_number().over(wu))
           .where(F.col("rk") <= k))
    agg = (sk.groupBy("grp_a", "grp_b")
             .agg(F.count(F.lit(1)).cast("long").alias("n_union_kept"),
                  F.max("h").alias("kth_min"),
                  F.expr("CAST(sum(in_a * in_b) AS BIGINT)")
                   .alias("n_both")))
    est_u = F.when(
        F.col("n_union_kept") < k, F.col("n_union_kept").cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(float(H60_MAX))
                / F.col("kth_min").cast("double"))
    return (agg.withColumn("est_union", est_u)
               .withColumn("est_inter",
                           F.col("n_both").cast("double")
                           / F.col("n_union_kept").cast("double")
                           * F.col("est_union"))
               .select("grp_a", "grp_b", "n_union_kept", "kth_min",
                       "n_both", "est_union", "est_inter"))


def kmv_pair_overlap_sql(table: str = "documents",
                         group_expr: str = "source",
                         key_expr: str = "text", k: int = 32) -> str:
    """DuckDB twin of `kmv_pair_overlap` — identical order statistics
    and the same two fixed float expressions."""
    est_u = (f"CASE WHEN n_union_kept < {k} "
             f"THEN CAST(n_union_kept AS DOUBLE) "
             f"ELSE CAST({float(k - 1)} AS DOUBLE) * {float(H60_MAX)}"
             f" / CAST(kth_min AS DOUBLE) END")
    return f"""
WITH hashes AS (
  SELECT DISTINCT {group_expr} AS grp, {h60_sql(key_expr)} AS h
  FROM {table}
  WHERE {key_expr} IS NOT NULL AND {group_expr} IS NOT NULL
),
kept AS (
  SELECT grp, h FROM (
    SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rk
    FROM hashes) WHERE rk <= {k}
),
gs AS (SELECT DISTINCT grp FROM kept),
pairs AS (SELECT a.grp AS grp_a, b.grp AS grp_b
          FROM gs a JOIN gs b ON a.grp < b.grp),
u AS (
  SELECT grp_a, grp_b, h, max(in_a) AS in_a, max(in_b) AS in_b FROM (
    SELECT p.grp_a, p.grp_b, ka.h, 1 AS in_a, 0 AS in_b
    FROM pairs p JOIN kept ka ON ka.grp = p.grp_a
    UNION ALL
    SELECT p.grp_a, p.grp_b, kb.h, 0, 1
    FROM pairs p JOIN kept kb ON kb.grp = p.grp_b)
  GROUP BY 1, 2, 3
),
sk AS (
  SELECT * FROM (
    SELECT grp_a, grp_b, h, in_a, in_b,
           row_number() OVER (PARTITION BY grp_a, grp_b ORDER BY h) AS rk
    FROM u) WHERE rk <= {k}
),
agg AS (
  SELECT grp_a, grp_b, CAST(count(*) AS BIGINT) AS n_union_kept,
         CAST(max(h) AS BIGINT) AS kth_min,
         CAST(sum(in_a * in_b) AS BIGINT) AS n_both
  FROM sk GROUP BY 1, 2
)
SELECT grp_a, grp_b, n_union_kept, kth_min, n_both,
       {est_u} AS est_union,
       CAST(n_both AS DOUBLE) / CAST(n_union_kept AS DOUBLE)
         * ({est_u}) AS est_inter
FROM agg
"""
