"""Analytics query catalog: the workload the reference's consumers run
over the exported tables (README.md:5 Medium-article style joins and
aggregates), plus the event-stream queries the engine adds. Every
entry follows plans.base's cross-engine typing rules.

Scale notes per query live in the docstrings; the common themes:
filters reach the parquet scan (PushedFilters), aggregates combine
map-side, small dims broadcast, window functions partition by the
grouping key so the shuffle is the partition key, not a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.tables import load_table, register_views
from .base import Query, cents, qty, revenue_e4

CUTOFF = "1998-06-01"
# Event-time arithmetic is in MICROSECONDS: the corpus stores
# TIMESTAMP(NANOS), but DuckDB truncates that to µs on read, so any
# ns-precision output would differ in the sub-µs digits. `ts_ns div
# 1000` (Spark) ↔ `epoch_us(ts)` (DuckDB) agree exactly.
WINDOW_US = 600_000_000        # 10 min tumbling
SESSION_GAP_US = 1_800_000_000  # 30 min inactivity


# -------------------------------------------------------------- Q1-ish

def _pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape — scan → filter → 6-group hash agg, the flagship:
    single stage after the scan, fully codegen'd, map-side partials."""
    li = load_table(spark, sf_dir, "lineitem")
    g = (
        li.where(F.col("l_shipdate") <= F.lit(CUTOFF).cast("timestamp_ntz"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
              F.expr(f"CAST(sum({qty('l_quantity')}) AS BIGINT)").alias("sum_qty"),
              F.expr(f"CAST(sum({cents('l_extendedprice')}) AS BIGINT)").alias("sum_base_cents"),
              F.expr(f"CAST(sum({revenue_e4()}) AS BIGINT)").alias("sum_disc_e4"),
              F.expr(f"CAST(sum({revenue_e4()} * (100 + {cents('l_tax')})) AS BIGINT)").alias("sum_charge_e6"),
              F.count(F.lit(1)).alias("n_rows"),
          )
    )
    return g.select(
        "l_returnflag", "l_linestatus", "sum_qty", "sum_base_cents",
        "sum_disc_e4", "sum_charge_e6", "n_rows",
        (F.col("sum_qty") / F.col("n_rows")).alias("avg_qty"),
        (F.col("sum_base_cents") / F.col("n_rows") / F.lit(100.0)).alias("avg_price"),
    )


_PRICING_SUMMARY_SQL = f"""
SELECT l_returnflag, l_linestatus, sum_qty, sum_base_cents, sum_disc_e4,
       sum_charge_e6, n_rows,
       sum_qty / n_rows AS avg_qty,
       sum_base_cents / n_rows / 100.0 AS avg_price
FROM (
  SELECT l_returnflag, l_linestatus,
         CAST(sum({qty('l_quantity')}) AS BIGINT) AS sum_qty,
         CAST(sum({cents('l_extendedprice')}) AS BIGINT) AS sum_base_cents,
         CAST(sum({revenue_e4()}) AS BIGINT) AS sum_disc_e4,
         CAST(sum({revenue_e4()} * (100 + {cents('l_tax')})) AS BIGINT) AS sum_charge_e6,
         count(*) AS n_rows
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '{CUTOFF}'
  GROUP BY 1, 2
)
"""


# -------------------------------------------------------------- Q3-ish

def _shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape — 3-way join, filter each side before the join
    (pushdown), top-10 by revenue with a deterministic tie-break."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit(CUTOFF).cast("timestamp_ntz"))
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit(CUTOFF).cast("timestamp_ntz"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
          .join(F.broadcast(c), o.o_custkey == c.c_custkey)
          .groupBy("l_orderkey",
                   F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
                   "o_orderpriority")
          .agg(F.expr(f"CAST(sum({revenue_e4()}) AS BIGINT)").alias("revenue_e4"))
          .orderBy(F.col("revenue_e4").desc(), F.col("l_orderkey").asc())
          .limit(10)
    )


_SHIPPING_PRIORITY_SQL = f"""
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_day,
       o_orderpriority,
       CAST(sum({revenue_e4()}) AS BIGINT) AS revenue_e4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '{CUTOFF}'
  AND l_shipdate > TIMESTAMP '{CUTOFF}'
GROUP BY 1, 2, 3
ORDER BY revenue_e4 DESC, l_orderkey ASC
LIMIT 10
"""


# -------------------------------------------------------------- Q5-ish

def _region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape — star join through two broadcast dims, revenue
    per nation for one region-year slice."""
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.date_format("o_orderdate", "yyyy") == "1997")
    li = load_table(spark, sf_dir, "lineitem")
    dim = (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .select("c_custkey", "n_name"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
          .join(F.broadcast(dim), o.o_custkey == dim.c_custkey)
          .groupBy(F.col("n_name").alias("nation"))
          .agg(F.count(F.lit(1)).alias("n_items"),
               F.expr(f"CAST(sum({revenue_e4()}) AS BIGINT)").alias("revenue_e4"))
    )


_REGION_REVENUE_SQL = f"""
SELECT n_name AS nation, count(*) AS n_items,
       CAST(sum({revenue_e4()}) AS BIGINT) AS revenue_e4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND strftime(o_orderdate, '%Y') = '1997'
GROUP BY 1
"""


# ------------------------------------------------------------ window fns

def _window_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-N via row_number — the partitioned window shuffles
    on the group key only, no global sort."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("segment").orderBy(
        F.col("bal_cents").desc(), F.col("c_custkey").asc())
    return (
        c.select("c_custkey", F.col("c_mktsegment").alias("segment"),
                 F.expr(cents("c_acctbal")).alias("bal_cents"))
         .withColumn("rk", F.row_number().over(w).cast("long"))
         .where(F.col("rk") <= 3)
    )


_WINDOW_TOPN_SQL = f"""
SELECT c_custkey, segment, bal_cents, rk FROM (
  SELECT c_custkey, c_mktsegment AS segment,
         {cents('c_acctbal')} AS bal_cents,
         CAST(row_number() OVER (PARTITION BY c_mktsegment
              ORDER BY {cents('c_acctbal')} DESC, c_custkey ASC) AS BIGINT) AS rk
  FROM customer
) WHERE rk <= 3
"""


def _window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-customer order total — explicit ROWS frame so both
    engines agree on peers."""
    o = load_table(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey")
               .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return o.select(
        "o_custkey", "o_orderkey",
        F.sum(F.expr(cents("o_totalprice"))).over(w).cast("long").alias("run_cents"),
    )


_WINDOW_RUNNING_SQL = f"""
SELECT o_custkey, o_orderkey,
       CAST(sum({cents('o_totalprice')}) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_cents
FROM orders
"""


# --------------------------------------------------------------- rollup

def _rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP subtotals over segment × nation; NULL subtotal markers
    folded to 'ALL' so no nulls reach the compare."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    return (
        j.rollup("c_mktsegment", "n_name")
         .agg(F.count(F.lit(1)).alias("n_cust"),
              F.expr(f"CAST(sum({cents('c_acctbal')}) AS BIGINT)").alias("bal_cents"))
         .select(F.coalesce("c_mktsegment", F.lit("ALL")).alias("segment"),
                 F.coalesce("n_name", F.lit("ALL")).alias("nation"),
                 "n_cust", "bal_cents")
    )


_ROLLUP_SQL = f"""
SELECT coalesce(c_mktsegment, 'ALL') AS segment,
       coalesce(n_name, 'ALL') AS nation,
       count(*) AS n_cust,
       CAST(sum({cents('c_acctbal')}) AS BIGINT) AS bal_cents
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP (c_mktsegment, n_name)
"""


# --------------------------------------------------------------- set ops

def _set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set semantics: customers with both urgent and
    low-priority orders, minus any with a failed ('F') order."""
    o = load_table(spark, sf_dir, "orders")
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    low = o.where(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    failed = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    return urgent.intersect(low).subtract(failed).select(
        F.col("o_custkey").alias("cust_key"))


_SET_OPS_SQL = """
SELECT o_custkey AS cust_key FROM (
  (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
   INTERSECT
   SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW')
  EXCEPT
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
)
"""


# ---------------------------------------------------------- event stream

def _events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling windows over the event stream — integer
    microsecond arithmetic, no timestamp types in flight."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.expr(f"(ts_ns div 1000) div {WINDOW_US}").alias("win"),
                  "event_type")
         .agg(F.count(F.lit(1)).alias("n"),
              F.expr(f"CAST(sum({cents('value')}) AS BIGINT)").alias("value_cents"),
              F.min("event_id").alias("first_event"),
              F.max("event_id").alias("last_event"))
         .withColumn("win_start_s", (F.col("win") * (WINDOW_US // 1_000_000)).cast("long"))
    )


_EVENTS_TUMBLING_SQL = f"""
SELECT epoch_us(ts) // {WINDOW_US} AS win, event_type, count(*) AS n,
       CAST(sum({cents('value')}) AS BIGINT) AS value_cents,
       min(event_id) AS first_event, max(event_id) AS last_event,
       (epoch_us(ts) // {WINDOW_US}) * {WINDOW_US // 10 ** 6} AS win_start_s
FROM events
GROUP BY 1, 2, 7
"""


def _events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-min inactivity gap → lag + cumulative flag
    sum, then per-session rollup. Pure integer window arithmetic."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts_ns div 1000"))
    by_user = Window.partitionBy("user_id").orderBy(
        F.col("ts_us").asc(), F.col("event_id").asc())
    run = by_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = (
        e.select("user_id", "event_id", "ts_us")
         .withColumn("prev_us", F.lag("ts_us").over(by_user))
         .withColumn("is_new",
                     F.when(F.col("prev_us").isNull()
                            | (F.col("ts_us") - F.col("prev_us") > SESSION_GAP_US),
                            F.lit(1)).otherwise(F.lit(0)))
         .withColumn("session_seq", F.sum("is_new").over(run).cast("long"))
    )
    return (
        flagged.groupBy("user_id", "session_seq")
               .agg(F.count(F.lit(1)).alias("n_events"),
                    F.min("ts_us").alias("start_us"),
                    (F.max("ts_us") - F.min("ts_us")).alias("dur_us"))
    )


_EVENTS_SESSIONS_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC)
),
sess AS (
  SELECT user_id, event_id, ts_us,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq, count(*) AS n_events,
       min(ts_us) AS start_us, max(ts_us) - min(ts_us) AS dur_us
FROM sess GROUP BY 1, 2
"""


def _asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators.joins.asof_join): every click event gets
    the user's most recent prior signup event — the union + window-fill
    composition; the oracle is DuckDB's NATIVE ASOF JOIN, so the
    composition is verified against a first-class implementation."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts_ns div 1000"))
    clicks = (e.where(F.col("event_type") == "click")
                .select("event_id", "user_id", "ts_us"))
    signups = (e.where(F.col("event_type") == "signup")
                 .groupBy("user_id", "ts_us")
                 .agg(F.max("event_id").alias("signup_event")))
    from ..operators.joins import asof_join
    out = asof_join(clicks, signups, key="user_id", time="ts_us",
                    payload=["signup_event"])
    return out.select(
        "event_id", "user_id", "ts_us",
        F.coalesce(F.col("signup_event_r"), F.lit(-1)).alias("signup_event"))


def _asof_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SKEW-SAFE as-of path (operators.joins.asof_join_bucketed,
    1-day time buckets): same clicks→latest-signup semantics as
    `q_asof_join`, window partitioned on (user, day) with a
    bucket-boundary carry — no task ever sorts a hot user's whole
    history. Graded against DuckDB's NATIVE ASOF JOIN, same oracle
    as the plain path: the two implementations and the reference
    engine all pinned to one answer."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts_ns div 1000"))
    clicks = (e.where(F.col("event_type") == "click")
                .select("event_id", "user_id", "ts_us"))
    signups = (e.where(F.col("event_type") == "signup")
                 .groupBy("user_id", "ts_us")
                 .agg(F.max("event_id").alias("signup_event")))
    from ..operators.joins import asof_join_bucketed
    out = asof_join_bucketed(clicks, signups, key="user_id",
                             time="ts_us", payload=["signup_event"],
                             bucket_width=86_400_000_000)
    return out.select(
        "event_id", "user_id", "ts_us",
        F.coalesce(F.col("signup_event_r"), F.lit(-1)).alias("signup_event"))


_ASOF_JOIN_SQL = """
WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
            FROM events),
clicks AS (SELECT event_id, user_id, ts_us FROM ev WHERE event_type = 'click'),
signups AS (SELECT user_id, ts_us, max(event_id) AS signup_event
            FROM ev WHERE event_type = 'signup' GROUP BY 1, 2)
SELECT c.event_id, c.user_id, c.ts_us,
       coalesce(s.signup_event, -1) AS signup_event
FROM clicks c
ASOF LEFT JOIN signups s ON c.user_id = s.user_id AND c.ts_us >= s.ts_us
"""


# GROUPING SETS: the same text runs on both engines, so the Spark side
# IS the oracle text executed via the SQL surface.
_GROUPING_SETS_SQL = f"""
SELECT coalesce(c_mktsegment, 'ALL') AS segment,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n_orders,
       CAST(sum({cents('o_totalprice')}) AS BIGINT) AS total_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority),
                        (c_mktsegment, o_orderpriority))
"""


def _grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_GROUPING_SETS_SQL)


def _events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull a typed value out of the JSON
    `props` column (get_json_object stays in codegen — no UDF JSON
    parsing) and aggregate on it."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.withColumn("k", F.get_json_object("props", "$.k").cast("long"))
         .where(F.col("k").isNotNull())
         .groupBy((F.col("k") - F.pmod(F.col("k"), F.lit(10))).alias("k_bucket"))
         .agg(F.count(F.lit(1)).alias("n"),
              F.expr(f"CAST(sum({cents('value')}) AS BIGINT)").alias("value_cents"),
              F.min("k").alias("k_min"), F.max("k").alias("k_max"))
    )


_EVENTS_JSON_SQL = f"""
SELECT k - (k % 10) AS k_bucket, count(*) AS n,
       CAST(sum({cents('value')}) AS BIGINT) AS value_cents,
       min(k) AS k_min, max(k) AS k_max
FROM (SELECT CAST(props->>'k' AS BIGINT) AS k, value FROM events)
WHERE k IS NOT NULL
GROUP BY 1
"""


def _props_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured schema inventory over the JSON `props` column —
    the schema-drift audit a pipeline ingesting loosely-typed event
    payloads runs before anything else ("which keys exist, how common
    is each, and over what time span did it live?"): per JSON key, the
    carrying-event count, its corpus share in exact ppm, and the
    first/last event time (µs) it appears at — a key that stops
    appearing IS the upstream producer change you want flagged.
    Key enumeration stays in codegen (`json_object_keys`, no UDF
    JSON parsing); values are never parsed, so there is no cross-
    engine value-representation surface at all. Fixture `props` is
    well-formed JSON by construction (malformed rows yield NULL keys
    in Spark but error in DuckDB's `json_keys` — a try_cast front
    would reconcile them on a dirty corpus).

    Scale shape: one scan, explode bounded by keys-per-event (small),
    one (key) hash-agg — vocabulary-sized output — plus a 1-row
    broadcast of the event total for the share."""
    e = load_table(spark, sf_dir, "events")
    k = e.select(F.explode(F.expr("json_object_keys(props)")).alias("key"),
                 F.expr("ts_ns div 1000").alias("us"))
    tot = e.agg(F.count(F.lit(1)).cast("long").alias("_n_events"))
    return (k.groupBy("key")
             .agg(F.count(F.lit(1)).cast("long").alias("n"),
                  F.min("us").cast("long").alias("first_us"),
                  F.max("us").cast("long").alias("last_us"))
             .crossJoin(F.broadcast(tot))
             .select("key", "n",
                     F.expr("n * 1000000 div _n_events").alias("share_ppm"),
                     "first_us", "last_us"))


_PROPS_KEYS_SQL = """
WITH k AS (
  SELECT unnest(json_keys(props)) AS key, epoch_us(ts) AS us
  FROM events WHERE props IS NOT NULL),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_events FROM events)
SELECT key, CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) AS BIGINT) * 1000000 // (SELECT n_events FROM tot)
         AS share_ppm,
       CAST(min(us) AS BIGINT) AS first_us,
       CAST(max(us) AS BIGINT) AS last_us
FROM k GROUP BY 1
"""


def _event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-flow transition matrix (first-order Markov over
    the event stream — the funnels-you-didn't-design-for discovery
    tool next to `q_events_funnel`'s fixed sequence): each user's
    events in time order (event_id tiebreak → a total order), paired
    with the NEXT event via one lead window, aggregated to (src, dst)
    counts plus the row-normalized transition share in exact ppm.
    p_ppm rows of one src sum to ≤10⁶ (truncating div) — the
    transition-probability row the product/session-flow dashboard
    renders as a Sankey.

    Scale shape: one user-key exchange for the lead window (the same
    key every sessionizer pays), then a (src, dst) hash-agg whose
    output is event-type²-sized; the src marginal attaches via a
    window over that tiny frame. No join touches the corpus."""
    from pyspark.sql import Window
    e = (load_table(spark, sf_dir, "events")
         .select("user_id", "event_type",
                 F.expr("ts_ns div 1000").alias("us"), "event_id"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    pairs = (e.withColumn("dst", F.lead("event_type").over(w))
              .where(F.col("dst").isNotNull())
              .groupBy(F.col("event_type").alias("src"), "dst")
              .agg(F.count(F.lit(1)).cast("long").alias("n")))
    wsrc = Window.partitionBy("src")
    return (pairs.withColumn("_row", F.sum("n").over(wsrc).cast("long"))
                 .select("src", "dst", "n",
                         F.expr("n * 1000000 div _row").alias("p_ppm")))


_EVENT_TRANSITIONS_SQL = """
WITH o AS (
  SELECT user_id, event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id
              ORDER BY epoch_us(ts), event_id) AS dst
  FROM events),
c AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS n
      FROM o WHERE dst IS NOT NULL GROUP BY 1, 2)
SELECT src, dst, n,
       n * 1000000 // CAST(sum(n) OVER (PARTITION BY src) AS BIGINT)
         AS p_ppm
FROM c
"""


def _percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order statistics + distinct counts per group. percentile_disc
    picks an actual data value (engine-identical on exact ints, unlike
    interpolating percentile_cont)."""
    register_views(spark, sf_dir)
    return spark.sql(f"""
        SELECT c_mktsegment AS segment,
               count(DISTINCT c_nationkey) AS n_nations,
               CAST(percentile_disc(0.5) WITHIN GROUP
                    (ORDER BY {cents('c_acctbal')}) AS BIGINT) AS med_cents,
               CAST(percentile_disc(0.9) WITHIN GROUP
                    (ORDER BY {cents('c_acctbal')}) AS BIGINT) AS p90_cents,
               min({cents('c_acctbal')}) AS min_cents,
               max({cents('c_acctbal')}) AS max_cents
        FROM customer GROUP BY 1""")


_PERCENTILES_SQL = f"""
SELECT c_mktsegment AS segment,
       count(DISTINCT c_nationkey) AS n_nations,
       CAST(quantile_disc({cents('c_acctbal')}, 0.5) AS BIGINT) AS med_cents,
       CAST(quantile_disc({cents('c_acctbal')}, 0.9) AS BIGINT) AS p90_cents,
       min({cents('c_acctbal')}) AS min_cents,
       max({cents('c_acctbal')}) AS max_cents
FROM customer GROUP BY 1
"""


def _order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape — correlated EXISTS subquery: Catalyst
    decorrelates it into a left-semi join (no per-row subquery
    execution at any scale)."""
    register_views(spark, sf_dir)
    return spark.sql(f"""
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate)
        GROUP BY 1""")


_ORDER_PRIORITY_SQL = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY 1
"""


def _shipmode_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape — conditional (CASE) aggregation: one pass, two
    tallies, no self-join."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    urgent = F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
          .groupBy("l_returnflag")
          .agg(F.sum(urgent).cast("long").alias("high_line_count"),
               F.sum(1 - urgent).cast("long").alias("low_line_count"))
    )


_SHIPMODE_CLASSES_SQL = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""


def _having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape — HAVING over an aggregate (post-agg filter)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
          .agg(F.expr(f"CAST(sum({qty('l_quantity')}) AS BIGINT)").alias("total_qty"),
               F.count(F.lit(1)).alias("n_lines"))
          .where(F.col("total_qty") > 1000)
    )


_HAVING_FILTER_SQL = f"""
SELECT l_partkey, CAST(sum({qty('l_quantity')}) AS BIGINT) AS total_qty,
       count(*) AS n_lines
FROM lineitem GROUP BY 1 HAVING CAST(sum({qty('l_quantity')}) AS BIGINT) > 1000
"""


def _like_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape — LIKE predicate (pushed as string-contains to
    the scan) driving a join + agg."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%gear%"))
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
          .groupBy("p_brand")
          .agg(F.count(F.lit(1)).alias("n_lines"),
               F.expr(f"CAST(sum({revenue_e4()}) AS BIGINT)").alias("revenue_e4"))
    )


_LIKE_FILTER_SQL = f"""
SELECT p_brand, count(*) AS n_lines,
       CAST(sum({revenue_e4()}) AS BIGINT) AS revenue_e4
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_name LIKE '%gear%'
GROUP BY 1
"""


def _not_in_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape — NOT EXISTS anti-subquery, decorrelated to a
    left-anti join: parts never ordered at the maximum quantity."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT p_brand, count(*) AS n_parts
        FROM part
        WHERE NOT EXISTS (SELECT 1 FROM lineitem
                          WHERE l_partkey = p_partkey AND l_quantity >= 50)
        GROUP BY 1""")


_NOT_IN_ANTI_SQL = """
SELECT p_brand, count(*) AS n_parts
FROM part
WHERE NOT EXISTS (SELECT 1 FROM lineitem
                  WHERE l_partkey = p_partkey AND l_quantity >= 50)
GROUP BY 1
"""


ROLLUP_GRANS_S = [600, 3600, 86400]  # 10 min / hour / day

def _events_multirollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: the SAME scan
    aggregated at several time granularities in one pass — each row
    fans out to one (granularity, bucket) pair via an inline explode,
    then a single hash aggregate covers every tier. One shuffle total,
    vs one scan+shuffle per tier if run naively."""
    e = load_table(spark, sf_dir, "events")
    tiers = F.array(*[
        F.struct(F.lit(g).cast("long").alias("gran_s"),
                 (F.expr(f"(ts_ns div 1000) div {g * 1_000_000}") * g)
                  .cast("long").alias("win_start_s"))
        for g in ROLLUP_GRANS_S])
    return (
        e.withColumn("tier", F.explode(tiers))
         .groupBy(F.col("tier.gran_s").alias("gran_s"),
                  F.col("tier.win_start_s").alias("win_start_s"))
         .agg(F.count(F.lit(1)).alias("n"),
              F.expr(f"CAST(sum({cents('value')}) AS BIGINT)").alias("value_cents"))
    )


_EVENTS_MULTIROLLUP_SQL = "\nUNION ALL\n".join(f"""
SELECT CAST({g} AS BIGINT) AS gran_s,
       (epoch_us(ts) // {g * 1_000_000}) * {g} AS win_start_s,
       count(*) AS n,
       CAST(sum({cents('value')}) AS BIGINT) AS value_cents
FROM events GROUP BY 1, 2""" for g in ROLLUP_GRANS_S)


PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]

def _events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with a declared column domain (never inferred — inference
    is an extra pass and nondeterministic at scale)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
         .pivot("event_type", PIVOT_TYPES)
         .agg(F.count(F.lit(1)))
         .na.fill(0, PIVOT_TYPES)
    )


_EVENTS_PIVOT_SQL = "SELECT user_id, " + ", ".join(
    f"count(*) FILTER (WHERE event_type = '{t}') AS {t}" for t in PIVOT_TYPES
) + " FROM events GROUP BY 1"


# ------------------------------------------------- ntile / range frames

def _ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE decile assignment then per-bucket aggregate — the
    distribution-report shape (balance deciles per market segment).
    NTILE is deterministic only under a TOTAL order, so the window
    orders by (acctbal, custkey); both engines implement the standard
    floor-based bucket fill, verified by the value hash."""
    c = load_table(spark, sf_dir, "customer")
    w = (Window.partitionBy("c_mktsegment")
               .orderBy(F.col("c_acctbal").asc(), F.col("c_custkey").asc()))
    return (c.select("c_mktsegment",
                     F.ntile(10).over(w).cast("long").alias("decile"),
                     F.expr(cents("c_acctbal")).alias("bal_cents"))
             .groupBy("c_mktsegment", "decile")
             .agg(F.count(F.lit(1)).alias("n_cust"),
                  F.sum("bal_cents").alias("sum_bal_cents")))


_NTILE_DECILES_SQL = f"""
SELECT c_mktsegment, decile,
       CAST(count(*) AS BIGINT) AS n_cust,
       CAST(sum(bal_cents) AS BIGINT) AS sum_bal_cents
FROM (SELECT c_mktsegment,
             CAST(ntile(10) OVER (PARTITION BY c_mktsegment
                  ORDER BY c_acctbal ASC, c_custkey ASC) AS BIGINT) AS decile,
             {cents('c_acctbal')} AS bal_cents
      FROM customer)
GROUP BY 1, 2
"""


def _window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame windowed aggregate — trailing-30-day order volume
    per customer. The frame bound is VALUE-based (integer day offsets,
    not row counts), so same-day peers aggregate identically whatever
    their physical order — deterministic without a total order, unlike
    ROWS frames. Day numbers are exact ints (epoch-day arithmetic)."""
    o = load_table(spark, sf_dir, "orders")
    day = F.expr("datediff(cast(o_orderdate as date), DATE'1992-01-01')")
    w = (Window.partitionBy("o_custkey").orderBy(F.col("day").asc())
               .rangeBetween(-30, 0))
    return (o.select("o_custkey", "o_orderkey",
                     day.cast("long").alias("day"),
                     F.expr(cents("o_totalprice")).alias("total_cents"))
             .select("o_custkey", "o_orderkey", "day",
                     F.sum("total_cents").over(w).cast("long")
                      .alias("trail30_cents")))


_WINDOW_RANGE_FRAME_SQL = f"""
SELECT o_custkey, o_orderkey, day,
       CAST(sum(total_cents) OVER (
            PARTITION BY o_custkey ORDER BY day ASC
            RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS BIGINT)
       AS trail30_cents
FROM (SELECT o_custkey, o_orderkey,
             CAST(date_diff('day', DATE '1992-01-01',
                            CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
             {cents('o_totalprice')} AS total_cents
      FROM orders)
"""


# ----------------------------------------------------------- funnel

def _events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step funnel (view → click → purchase) per user: the
    first view, the first click AFTER that view, the first purchase
    AFTER that click — the sequence-dependent min chain every product
    analytics stack runs. Steps are correlated (step N's filter uses
    step N-1's time), decorrelated here into three per-user min
    aggregates, each joined back on user_id.

    Scale: every aggregate and join keys on user_id — one logical
    partitioning serves the whole chain (exchanges reused / broadcast
    at dim size); event-time comparisons are exact µs BIGINTs."""
    e = (load_table(spark, sf_dir, "events")
         .select("user_id", "event_type",
                 F.expr("ts_ns div 1000").alias("us")))
    v = (e.where("event_type = 'view'")
          .groupBy("user_id").agg(F.min("us").alias("view_us")))
    c = (e.join(v, "user_id")
          .where("event_type = 'click' AND us > view_us")
          .groupBy("user_id", "view_us").agg(F.min("us").alias("click_us")))
    p = (e.join(c, "user_id")
          .where("event_type = 'purchase' AND us > click_us")
          .groupBy("user_id", "view_us", "click_us")
          .agg(F.min("us").alias("purchase_us")))
    return (v.join(c.select("user_id", "click_us"), "user_id", "left")
             .join(p.select("user_id", "purchase_us"), "user_id", "left")
             .select("user_id", "view_us", "click_us", "purchase_us"))


_EVENTS_FUNNEL_SQL = """
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
v AS (SELECT user_id, min(us) AS view_us FROM e
      WHERE event_type = 'view' GROUP BY 1),
c AS (SELECT e.user_id, v.view_us, min(us) AS click_us
      FROM e JOIN v USING (user_id)
      WHERE event_type = 'click' AND us > view_us GROUP BY 1, 2),
p AS (SELECT e.user_id, c.view_us, c.click_us, min(us) AS purchase_us
      FROM e JOIN c USING (user_id)
      WHERE event_type = 'purchase' AND us > click_us GROUP BY 1, 2, 3)
SELECT v.user_id, v.view_us, c.click_us, p.purchase_us
FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
"""


WEEK_US = 7 * 86_400 * 1_000_000


def _events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity week
    (cohort), counted per subsequent active week — the curation twin
    is "docs per source per crawl week". Exact integer week
    arithmetic; one distinct projection, two same-key aggregates.

    Scale: (user, week) distinct collapses the fact map-side; the
    cohort min-aggregate and the final count both key on user_id /
    (cohort, week) — two small shuffles, no window over the fact."""
    e = (load_table(spark, sf_dir, "events")
         .select("user_id",
                 F.expr(f"(ts_ns div 1000) div {WEEK_US}").alias("week"))
         .distinct())
    cohort = e.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (e.join(cohort, "user_id")
             .groupBy("cohort_week",
                      (F.col("week") - F.col("cohort_week")).alias("week_n"))
             .agg(F.countDistinct("user_id").alias("n_users")))


_EVENTS_RETENTION_SQL = f"""
WITH e AS (SELECT DISTINCT user_id, epoch_us(ts) // {WEEK_US} AS week
           FROM events),
cohort AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY 1)
SELECT cohort_week, week - cohort_week AS week_n,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM e JOIN cohort USING (user_id)
GROUP BY 1, 2
"""


def _lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT — per
    customer, the 2 largest orders. The optimizer decorrelates the
    lateral into a ranked window under the hood; the entry pins that
    the LATERAL SQL surface itself works (not just the window
    rewrite), with exact-cents ordering so ranks are engine-stable."""
    from ..sources.tables import register_views
    register_views(spark, sf_dir)
    return spark.sql(f"""
        SELECT c_custkey, o_orderkey, rnk,
               {cents('o_totalprice')} AS total_cents
        FROM customer,
        LATERAL (SELECT o_orderkey, o_totalprice,
                        row_number() OVER (ORDER BY o_totalprice DESC,
                                           o_orderkey ASC) AS rnk
                 FROM orders WHERE o_custkey = c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2)
    """)


_LATERAL_TOPK_SQL = f"""
SELECT c_custkey, o_orderkey, CAST(rnk AS BIGINT) AS rnk,
       {cents('o_totalprice')} AS total_cents
FROM customer,
LATERAL (SELECT o_orderkey, o_totalprice,
                row_number() OVER (ORDER BY o_totalprice DESC,
                                   o_orderkey ASC) AS rnk
         FROM orders WHERE o_custkey = c_custkey
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2)
"""


def _unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide measures → long (measure, value) rows) — the
    melt step feeding generic per-measure aggregations; four exact
    cents measures per lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.select(
        "l_orderkey", "l_linenumber",
        F.expr(cents("l_quantity")).alias("qty_c"),
        F.expr(cents("l_extendedprice")).alias("price_c"),
        F.expr(cents("l_discount")).alias("disc_c"),
        F.expr(cents("l_tax")).alias("tax_c"))
    return wide.selectExpr(
        "l_orderkey", "l_linenumber",
        "stack(4, 'qty', qty_c, 'price', price_c, "
        "'disc', disc_c, 'tax', tax_c) AS (measure, value_cents)")


_UNPIVOT_SQL = f"""
UNPIVOT (SELECT l_orderkey, l_linenumber,
                {cents('l_quantity')} AS qty,
                {cents('l_extendedprice')} AS price,
                {cents('l_discount')} AS disc,
                {cents('l_tax')} AS tax
         FROM lineitem)
ON qty, price, disc, tax
INTO NAME measure VALUE value_cents
"""


# ------------------------------------------------------- SCD2 history

def _scd2_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history build over the event log: each user's
    event_type runs become effective-dated dimension versions with
    half-open [valid_from, valid_to) µs bounds and a current flag —
    one shuffle on user_id, two window passes, no joins
    (operators/temporal.scd2)."""
    from ..operators.temporal import scd2
    e = (load_table(spark, sf_dir, "events")
         .withColumn("ts_us", F.expr("ts_ns div 1000")))
    return scd2(e, key_col="user_id", attr_col="event_type",
                ts_us_col="ts_us", seq_col="event_id")


def _scd2_versions_sql() -> str:
    from ..operators.temporal import scd2_sql
    return scd2_sql(
        "SELECT user_id, event_type, epoch_us(ts) AS us, event_id "
        "FROM events",
        key="user_id", attr="event_type", ts_us="us", seq="event_id")


# --------------------------------------------- interval overlap join

IVL_BUCKET_US = 3_600_000_000  # 1-hour overlap-join grid


def _interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL-OVERLAP self-join — the second interval primitive
    Spark lacks as a built-in (as-of = nearest-past point; this =
    range × range): concurrent sessions of DIFFERENT users. The
    naive θ-join (a.start ≤ b.end AND b.start ≤ a.end) plans as a
    nested loop; the scalable shape is the eth_range_join discipline
    lifted to two interval sides — explode each interval onto a
    coarse BUCKET GRID (1 h), equi-join on the bucket, dedup the
    (pair) key (one pair can share several buckets), and evaluate
    the exact overlap as a residual. Fan-out is interval_len/bucket
    per row; pairs only materialize inside a shared bucket —
    quadratic in per-bucket concurrency, never in the table.

    Output: (user_a, seq_a, user_b, seq_b, overlap_us ≥ 0) —
    inclusive endpoints (sessions touching at one instant overlap 0).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = (ev.select("user_id", "event_id",
                         F.expr("ts_ns div 1000").alias("ts_us"))
                 .withColumn("_new", F.when(
                     F.lag("ts_us").over(w).isNull()
                     | (F.col("ts_us") - F.lag("ts_us").over(w)
                        > SESSION_GAP_US), 1).otherwise(0))
                 .withColumn("seq", F.sum("_new").over(
                     w.rowsBetween(Window.unboundedPreceding, 0))))
    sess = (flagged.groupBy("user_id", "seq")
                   .agg(F.min("ts_us").alias("s"),
                        F.max("ts_us").alias("e")))
    B = IVL_BUCKET_US
    binned = sess.select(
        "user_id", "seq", "s", "e",
        F.explode(F.sequence(F.expr(f"s div {B}"),
                             F.expr(f"e div {B}"))).alias("bkt"))
    a = binned.select(F.col("user_id").alias("user_a"),
                      F.col("seq").alias("seq_a"),
                      F.col("s").alias("s_a"), F.col("e").alias("e_a"),
                      "bkt")
    b = binned.select(F.col("user_id").alias("user_b"),
                      F.col("seq").alias("seq_b"),
                      F.col("s").alias("s_b"), F.col("e").alias("e_b"),
                      "bkt")
    return (a.join(b, "bkt")
             .where(F.col("user_a") < F.col("user_b"))
             .where((F.greatest("s_a", "s_b")
                     <= F.least("e_a", "e_b")))
             .select("user_a", "seq_a", "user_b", "seq_b",
                     F.expr("least(e_a, e_b) - greatest(s_a, s_b)")
                      .alias("overlap_us"))
             .distinct())


_INTERVAL_OVERLAP_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                   > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS _new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
sess AS (
  SELECT user_id, seq, min(ts_us) AS s, max(ts_us) AS e FROM (
    SELECT user_id, event_id, ts_us,
           CAST(sum(_new) OVER (PARTITION BY user_id
                                ORDER BY ts_us, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS seq
    FROM flagged)
  GROUP BY 1, 2
),
binned AS (
  SELECT user_id, seq, s, e,
         unnest(generate_series(s // {IVL_BUCKET_US},
                                e // {IVL_BUCKET_US})) AS bkt
  FROM sess
)
SELECT DISTINCT a.user_id AS user_a, a.seq AS seq_a,
       b.user_id AS user_b, b.seq AS seq_b,
       least(a.e, b.e) - greatest(a.s, b.s) AS overlap_us
FROM binned a JOIN binned b USING (bkt)
WHERE a.user_id < b.user_id
  AND greatest(a.s, b.s) <= least(a.e, b.e)
"""


# --------------------------------------------------- SCD2 AS OF

def _scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (AS OF) lookup over the SCD2 history — the query
    the effective-dated table EXISTS to answer: every key's state at
    the corpus's midpoint instant (t = (min+max) div 2 event time,
    deterministic, broadcast as one row): the version with
    valid_from ≤ t < valid_to (open tail = NULL valid_to). At scale
    the half-open intervals make this one partition-prunable filter
    over the history table — no joins, no windows at read time."""
    from ..operators.temporal import scd2
    e = (load_table(spark, sf_dir, "events")
         .withColumn("ts_us", F.expr("ts_ns div 1000")))
    hist = scd2(e, key_col="user_id", attr_col="event_type",
                ts_us_col="ts_us", seq_col="event_id")
    t = e.agg(F.expr("CAST((min(ts_us) + max(ts_us)) div 2 AS BIGINT)")
              .alias("t"))
    return (hist.crossJoin(F.broadcast(t))
                .where((F.col("valid_from_us") <= F.col("t"))
                       & (F.col("valid_to_us").isNull()
                          | (F.col("valid_to_us") > F.col("t"))))
                .select("user_id", "version", "attr",
                        "valid_from_us", "valid_to_us"))


def _scd2_asof_sql() -> str:
    from ..operators.temporal import scd2_sql
    hist = scd2_sql(
        "SELECT user_id, event_type, epoch_us(ts) AS us, event_id "
        "FROM events",
        key="user_id", attr="event_type", ts_us="us", seq="event_id")
    return f"""
WITH hist AS ({hist}),
t AS (SELECT CAST((min(epoch_us(ts)) + max(epoch_us(ts))) // 2
             AS BIGINT) AS t FROM events)
SELECT user_id, version, attr, valid_from_us, valid_to_us
FROM hist, t
WHERE valid_from_us <= t
  AND (valid_to_us IS NULL OR valid_to_us > t)
"""


# --------------------------------------------------- trimmed mean

def _trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type 10%-trimmed mean of purchase values — the robust
    aggregate eval pipelines use where one outlier run would drag a
    plain mean (trim = drop the top and bottom decile BY RANK, exact
    integer boundaries: ranks in (n div 10, n − n div 10]). Exact
    cents; the mean is the single final division. One shuffle on the
    group key, one rank window riding it."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("x").asc(), F.col("event_id").asc())
    ranked = (ev.select("event_type", "event_id",
                        F.expr(cents("value")).alias("x"))
                .withColumn("rk", F.row_number().over(w))
                .withColumn("n", F.count(F.lit(1)).over(
                    Window.partitionBy("event_type"))))
    kept = ranked.where((F.col("rk") > F.expr("n div 10"))
                        & (F.col("rk") <= F.expr("n - n div 10")))
    return (kept.groupBy("event_type")
                .agg(F.count(F.lit(1)).cast("long").alias("n_kept"),
                     F.expr("CAST(sum(x) AS BIGINT)").alias("sum_cents"))
                .select("event_type", "n_kept", "sum_cents",
                        (F.col("sum_cents").cast("double")
                         / F.col("n_kept").cast("double"))
                         .alias("trimmed_mean_cents")))


_TRIMMED_MEAN_SQL = f"""
WITH ranked AS (
  SELECT event_type, {cents('value')} AS x,
         row_number() OVER (PARTITION BY event_type
              ORDER BY {cents('value')} ASC, event_id ASC) AS rk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
kept AS (
  SELECT event_type, x FROM ranked
  WHERE rk > n // 10 AND rk <= n - n // 10
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept,
       CAST(sum(x) AS BIGINT) AS sum_cents,
       CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         AS trimmed_mean_cents
FROM kept GROUP BY 1
"""


# --------------------------------------------------- RFM segmentation

def _rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation over
    purchase events — the marketing-analytics staple: per user,
    recency µs from the corpus max event time, purchase count, exact
    cents; each dimension quintiled with NTILE(5) over a DETERMINISTIC
    order (value, then user_id — ties would otherwise split
    arbitrarily between engines), segment label = concatenated
    scores. One shuffle on user_id, three NTILE windows over the
    users-sized frame, max-ts as a broadcast single row."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase")
    per_user = (ev.groupBy("user_id")
                  .agg(F.expr("max(ts_ns div 1000)").alias("last_us"),
                       F.count(F.lit(1)).cast("long").alias("frequency"),
                       F.expr(f"CAST(sum({cents('value')}) AS BIGINT)")
                        .alias("monetary_cents")))
    mx = per_user.agg(F.max("last_us").alias("corpus_max_us"))
    base = (per_user.crossJoin(F.broadcast(mx))
                    .withColumn("recency_us",
                                F.col("corpus_max_us") - F.col("last_us")))
    w_r = Window.orderBy(F.col("recency_us").asc(), F.col("user_id").asc())
    w_f = Window.orderBy(F.col("frequency").desc(), F.col("user_id").asc())
    w_m = Window.orderBy(F.col("monetary_cents").desc(),
                         F.col("user_id").asc())
    return (base.withColumn("r_score", F.ntile(5).over(w_r).cast("long"))
                .withColumn("f_score", F.ntile(5).over(w_f).cast("long"))
                .withColumn("m_score", F.ntile(5).over(w_m).cast("long"))
                .select("user_id", "recency_us", "frequency",
                        "monetary_cents", "r_score", "f_score", "m_score",
                        F.expr("concat(r_score, f_score, m_score)")
                         .alias("segment")))


_RFM_SEGMENTS_SQL = f"""
WITH per_user AS (
  SELECT user_id, max(epoch_us(ts)) AS last_us,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(sum({cents('value')}) AS BIGINT) AS monetary_cents
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
mx AS (SELECT max(last_us) AS corpus_max_us FROM per_user),
base AS (
  SELECT user_id, corpus_max_us - last_us AS recency_us,
         frequency, monetary_cents
  FROM per_user, mx
)
SELECT user_id, recency_us, frequency, monetary_cents,
       CAST(ntile(5) OVER (ORDER BY recency_us ASC, user_id ASC)
            AS BIGINT) AS r_score,
       CAST(ntile(5) OVER (ORDER BY frequency DESC, user_id ASC)
            AS BIGINT) AS f_score,
       CAST(ntile(5) OVER (ORDER BY monetary_cents DESC, user_id ASC)
            AS BIGINT) AS m_score,
       CAST(ntile(5) OVER (ORDER BY recency_us ASC, user_id ASC)
            AS VARCHAR)
       || CAST(ntile(5) OVER (ORDER BY frequency DESC, user_id ASC)
               AS VARCHAR)
       || CAST(ntile(5) OVER (ORDER BY monetary_cents DESC, user_id ASC)
               AS VARCHAR) AS segment
FROM base
"""


# ------------------------------------------------ gaps and islands

def _activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user — the classic
    gaps-and-islands shape over event time: distinct (user, epoch
    day), island key = day − row_number (constant within a
    consecutive run), count per island, max per user. One shuffle on
    the user key; the day dedup combines map-side. Exact integer days
    (µs div 86_400_000_000) via the normalized event-time column."""
    ev = load_table(spark, sf_dir, "events")
    days = (ev.select("user_id",
                      F.expr("ts_ns div 1000 div 86400000000")
                       .alias("day"))
              .distinct())
    w = Window.partitionBy("user_id").orderBy("day")
    islands = (days.withColumn("isl", F.col("day")
                               - F.row_number().over(w))
                   .groupBy("user_id", "isl")
                   .agg(F.count(F.lit(1)).cast("long").alias("run")))
    return (islands.groupBy("user_id")
                   .agg(F.expr("CAST(sum(run) AS BIGINT)")
                         .alias("n_active_days"),
                        F.max("run").alias("longest_streak"),
                        F.count(F.lit(1)).cast("long").alias("n_streaks")))


_ACTIVITY_STREAKS_SQL = """
WITH days AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
  FROM events
),
islands AS (
  SELECT user_id,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day)
           AS isl
  FROM days
),
runs AS (
  SELECT user_id, isl, CAST(count(*) AS BIGINT) AS run
  FROM islands GROUP BY 1, 2
)
SELECT user_id, CAST(sum(run) AS BIGINT) AS n_active_days,
       CAST(max(run) AS BIGINT) AS longest_streak,
       CAST(count(*) AS BIGINT) AS n_streaks
FROM runs GROUP BY 1
"""


# ------------------------------------------------ fuzzy record linkage

#: deterministic "typo" injection: every 5th part's name loses its 3rd
#: character — the dirty-entity fixture the linkage then has to re-link
#: (the eth_resolve_choice discipline: corruption is part of the query,
#: identical in both engines)
_DIRTY_NAME = ("CASE WHEN p_partkey % 5 = 0 "
               "THEN concat(substr(p_name, 1, 2), substr(p_name, 4)) "
               "ELSE p_name END")


#: blocking key: first two + LAST two characters — both survive the
#: injected mid-word char-drop (a first-WORD block would not), and the
#: suffix component keeps block population from growing with the
#: table: a prefix-only substr(1,2) block put ~14% of all parts in one
#: block and cost 30M Levenshtein evals / 40 s at sf0.1 (measured);
#: the composite key cuts pairs ~40× at identical recall ON THE
#: INJECTED TYPO CLASS (pairs differing in their last two chars are
#: the documented blocking recall trade — production stacks multiple
#: blocking passes)
_BLOCK = "concat(substr(name, 1, 2), substr(name, length(name) - 1, 2))"


def _fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution over a deterministically-dirtied part-name
    column (operators/joins.fuzzy_pairs): composite prefix+suffix
    blocking (survives the injected char-drop typo), candidate
    equi-join within blocks, Levenshtein 1..2 residual. Exact matches
    are excluded by contract (dedup_exact's job)."""
    return _fuzzy_candidate_pairs(spark, sf_dir)


_FUZZY_PAIRS_MEMO: dict[tuple[str, str], "DataFrame"] = {}


def _dirty_parts(spark: SparkSession, sf_dir: str):
    return load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("id"),
        F.expr(_DIRTY_NAME).alias("name"))


def _fuzzy_candidate_pairs(spark: SparkSession, sf_dir: str):
    """The blocked+Levenshtein pair list, memoized per (session,
    corpus) and eagerly localCheckpointed — `q_fuzzy_match` and
    `q_entity_resolution` consume the SAME pair computation (the
    plans/llm.py shared-artifact discipline); the computation is a
    pure function of the corpus, so a cold single-query session
    produces identical hashes."""
    import os
    from ..operators.joins import fuzzy_pairs
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    if key not in _FUZZY_PAIRS_MEMO:
        from .llm import _memo_put
        _memo_put(_FUZZY_PAIRS_MEMO, key, fuzzy_pairs(
            _dirty_parts(spark, sf_dir), "id", "name",
            F.expr(_BLOCK), max_dist=2).localCheckpoint(eager=True))
    return _FUZZY_PAIRS_MEMO[key]


#: shared CTE chain: dirty names → blocked base (with the hot-block
#: cut mirroring fuzzy_pairs' max_block — Spark drops blocks larger
#: than 10k members before the pair join, so the oracle must drop
#: them too or the engines diverge the day a blocking key goes hot)
#: → candidate pairs with Levenshtein residual
_FUZZY_CTES = f"""p AS (
  SELECT p_partkey AS id, {_DIRTY_NAME} AS name FROM part
),
base0 AS (
  SELECT id, name, {_BLOCK} AS blk
  FROM p WHERE name IS NOT NULL AND {_BLOCK} IS NOT NULL
),
base AS (
  SELECT * FROM base0
  WHERE blk IN (SELECT blk FROM base0
                GROUP BY blk HAVING count(*) <= 10000)
),
fpairs AS (
  SELECT a.id AS id_a, b.id AS id_b,
         a.name AS name_a, b.name AS name_b,
         CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
  FROM base a JOIN base b ON a.blk = b.blk AND a.id < b.id
  WHERE levenshtein(a.name, b.name) BETWEEN 1 AND 2
)"""

_FUZZY_MATCH_SQL = f"""
WITH {_FUZZY_CTES}
SELECT id_a, id_b, name_a, name_b, dist FROM fpairs
"""


def _entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END entity resolution: blocking + fuzzy candidate pairs
    (operators/joins.fuzzy_pairs) collapsed into entity clusters by
    min-label connected components (operators/dedup.
    connected_components), then every record — including singletons —
    labelled with its canonical entity id (min member id). The full
    Fellegi–Sunter-style pipeline as one composed plan: the step
    after `q_fuzzy_match` that makes the pair list usable (a pair
    list is not an entity table until transitively closed: A~B, B~C
    must land A, B, C in ONE entity).

    Scale shape: pairs are block-bounded (never all-pairs), CC
    iterates only on the pair graph (tiny vs the table), the final
    labelling is one left join of the full table against the
    components frame — at scale that frame is orders of magnitude
    smaller than the table (only records that matched something).

    Bench attribution (round-8 profiled): with the pair artifact
    memoized, the warm residual is 4-6 s, ~85% of it
    connected_components on the pair graph — which at sf0.1 is
    ~1.0M pairs (the dirty-parts fixture is dense by design), so the
    per-round join+min-agg+localCheckpoint is real work, and
    run-to-run spread (4.0-6.0 s across idle-machine runs of the
    IDENTICAL code) tracks executor-storage/GC state, not plan
    changes. That context sensitivity is the recurring
    "no-code-change regression" class on checkpoint-heavy sub-5 s
    queries; CC now seeds labels with the distance-1 minimum (same
    fixpoint, one fewer round)."""
    from ..operators.dedup import connected_components
    p = _dirty_parts(spark, sf_dir)
    pairs = _fuzzy_candidate_pairs(spark, sf_dir)
    clusters = connected_components(pairs, src="id_a", dst="id_b",
                                    id_out="id")
    return (p.join(clusters, "id", "left")
             .select(F.col("id").cast("long").alias("id"),
                     F.coalesce("cluster_id", F.col("id")).cast("long")
                      .alias("entity_id"),
                     "name"))


_ENTITY_RESOLUTION_SQL = f"""
WITH RECURSIVE {_FUZZY_CTES},
edges AS (
  SELECT id_a AS u, id_b AS v FROM fpairs
  UNION
  SELECT id_b AS u, id_a AS v FROM fpairs
),
reach(node, lbl) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.u, r.lbl FROM edges e JOIN reach r ON e.v = r.node
),
cl AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY 1)
SELECT CAST(p.id AS BIGINT) AS id,
       CAST(coalesce(cl.cluster_id, p.id) AS BIGINT) AS entity_id,
       p.name
FROM p LEFT JOIN cl ON cl.node = p.id
"""



# ------------------------------------- trend slopes / decayed activity

def _trend_slopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS trend slope over daily event counts — the
    drift-trend aggregate (is this source/event type growing or
    dying?) as ONE exact-integer aggregation: with x = day − min(day)
    (small ints) and y = daily count, slope = (n·Σxy − Σx·Σy) /
    (n·Σxx − Σx²), the numerator/denominator computed as BIGINT sums
    and divided in a SINGLE double expression (base.py discipline).
    Types with a single active day carry no trend and are excluded.

    Scale shape: one (type, day) hash-agg (map-side combined), the
    min-day window rides the same type key, then a type-level agg —
    two exchanges on the same small key."""
    from ..sources.tables import load_table
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.select("event_type",
                       F.expr("ts_ns div 1000 div 86400000000")
                        .alias("day"))
               .groupBy("event_type", "day")
               .agg(F.count(F.lit(1)).cast("long").alias("y")))
    w = Window.partitionBy("event_type")
    stats = (daily.withColumn("x", F.col("day") - F.min("day").over(w))
                  .groupBy("event_type")
                  .agg(F.count(F.lit(1)).cast("long").alias("n_days"),
                       F.expr("CAST(sum(x) AS BIGINT)").alias("sx"),
                       F.expr("CAST(sum(y) AS BIGINT)").alias("sy"),
                       F.expr("CAST(sum(x * y) AS BIGINT)").alias("sxy"),
                       F.expr("CAST(sum(x * x) AS BIGINT)").alias("sxx")))
    return (stats.where(F.col("n_days") >= 2)
                 .select("event_type", "n_days", "sx", "sy", "sxy", "sxx",
                         F.expr("CAST(n_days * sxy - sx * sy AS DOUBLE) / "
                                "CAST(n_days * sxx - sx * sx AS DOUBLE)")
                          .alias("slope")))


_TREND_SLOPES_SQL = """
WITH daily AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
xs AS (
  SELECT event_type, day - min(day) OVER (PARTITION BY event_type) AS x, y
  FROM daily
),
stats AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM xs GROUP BY 1
)
SELECT event_type, n_days, sx, sy, sxy, sxx,
       CAST(n_days * sxy - sx * sy AS DOUBLE) /
         CAST(n_days * sxx - sx * sx AS DOUBLE) AS slope
FROM stats WHERE n_days >= 2
"""


#: SSE reduction of splitting after prefix length t, from prefix sums
#: only: SSE = Σv² − Σ(segment_sum²/len) and Σv² cancels, so
#: gain(t) = st²/t + (sn−st)²/(n−t) − sn²/n. One fixed expression
#: tree over exact BIGINTs (base.py double discipline) — identical
#: text on both engines, so the argmax ordering can't flap.
_CHANGEPOINT_GAIN = (
    "CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(t AS DOUBLE) "
    "+ CAST(sn - st AS DOUBLE) * CAST(sn - st AS DOUBLE) "
    "/ CAST(n - t AS DOUBLE) "
    "- CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE) / CAST(n AS DOUBLE)")


def _changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series single changepoint by binary segmentation (the
    batch twin of `stream_cusum_alerts`: CUSUM answers "is a shift
    happening NOW", this answers "WHERE in the history did the level
    shift") — for each event type's daily-cents series, the split
    position maximizing the between-segment SSE reduction, computed
    from prefix sums alone. Recursing on the winning halves yields
    full binary segmentation; one level is the graded unit.

    Output per series: the argmax split (last day of the left
    segment), both segments' exact row counts and cents totals, and
    the gain (double from one fixed expression over exact ints).

    Scale shape: one (type, day) hash-agg (map-side combined), then
    prefix-sum / total / argmax windows all riding ONE exchange on
    the series key — |types·days| rows end to end, no self-join, no
    explode. At 100 TB the state per series is its day count, and
    series parallelize across executors."""
    from ..sources.tables import load_table
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.select("event_type",
                       F.expr("ts_ns div 1000 div 86400000000")
                        .alias("day"),
                       F.expr(cents("value")).alias("c"))
               .groupBy("event_type", "day")
               .agg(F.expr("CAST(sum(c) AS BIGINT)").alias("v")))
    wo = (Window.partitionBy("event_type").orderBy("day")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wa = Window.partitionBy("event_type")
    pre = (daily
           .withColumn("t", F.row_number().over(
               Window.partitionBy("event_type").orderBy("day"))
               .cast("long"))
           .withColumn("st", F.sum("v").over(wo).cast("long"))
           .withColumn("sn", F.sum("v").over(wa).cast("long"))
           .withColumn("n", F.count(F.lit(1)).over(wa).cast("long")))
    cand = (pre.where("t < n")
               .withColumn("gain", F.expr(_CHANGEPOINT_GAIN)))
    wr = (Window.partitionBy("event_type")
                .orderBy(F.col("gain").desc(), F.col("t").asc()))
    return (cand.withColumn("rn", F.row_number().over(wr))
                .where("rn = 1")
                .select("event_type",
                        F.col("n").alias("n_days"),
                        F.col("t").alias("n_before"),
                        F.expr("CAST(n - t AS BIGINT)").alias("n_after"),
                        F.col("day").alias("split_day"),
                        F.col("st").alias("s_before_cents"),
                        F.expr("CAST(sn - st AS BIGINT)")
                         .alias("s_after_cents"),
                        "gain")
                .orderBy("event_type"))


_CHANGEPOINT_SQL = f"""
WITH daily AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(sum({cents('value')}) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
),
pre AS (
  SELECT event_type, day, v,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
              AS BIGINT) AS t,
         CAST(sum(v) OVER (PARTITION BY event_type ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS st,
         CAST(sum(v) OVER (PARTITION BY event_type) AS BIGINT) AS sn,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM daily
),
cand AS (SELECT *, {_CHANGEPOINT_GAIN} AS gain FROM pre WHERE t < n),
best AS (SELECT *, row_number() OVER (PARTITION BY event_type
              ORDER BY gain DESC, t ASC) AS rn FROM cand)
SELECT event_type, n AS n_days, t AS n_before,
       CAST(n - t AS BIGINT) AS n_after, day AS split_day,
       st AS s_before_cents, CAST(sn - st AS BIGINT) AS s_after_cents,
       gain
FROM best WHERE rn = 1 ORDER BY event_type
"""


def _decayed_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially time-decayed activity score with a
    half-life of one day, EXACT integers: score = Σ cents(value) div
    2^age_days relative to the corpus's newest day (ages ≥ 63 decay
    to 0 — a shift past the int64 width would wrap). The recency-
    weighted engagement metric (EWMA-style) that float decay
    (pow(0.5, age)) could never hash-compare: truncating power-of-two
    division on non-negative cents is bit-exact on both engines.

    Scale shape: the global reference day is a 1-row broadcast cross
    join (the scalar-subquery shape); the score is one per-user
    hash-agg, map-side combined."""
    from ..sources.tables import load_table
    ev = (load_table(spark, sf_dir, "events")
          .select("user_id",
                  F.expr("ts_ns div 1000 div 86400000000").alias("day"),
                  F.expr(cents("value")).alias("v")))
    ref = ev.agg(F.max("day").alias("ref_day"))
    return (ev.crossJoin(F.broadcast(ref))
              .withColumn("age", (F.col("ref_day") - F.col("day"))
                           .cast("int"))
              .groupBy("user_id")
              .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                   F.expr("CAST(sum(CASE WHEN age >= 63 THEN 0 ELSE "
                          "v div shiftleft(CAST(1 AS BIGINT), age) END) "
                          "AS BIGINT)").alias("score_cents")))


_DECAYED_ACTIVITY_SQL = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
         {cents('value')} AS v
  FROM events
),
ref AS (SELECT max(day) AS ref_day FROM ev)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN ref_day - day >= 63 THEN 0 ELSE
                v // (CAST(1 AS BIGINT) << CAST(ref_day - day AS INTEGER))
                END) AS BIGINT) AS score_cents
FROM ev, ref GROUP BY user_id
"""


# --------------------------------------------- rate-limit scheduler

#: minimum per-key service gap, microseconds (5 s politeness delay).
RATE_LIMIT_GAP_US = 5_000_000


def _rate_limit_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key rate-limit scheduler — the crawl-frontier politeness
    queue (one fetch per host every D), API-throttling planner, and
    job-queue admission model: each event is assigned the earliest
    service slot ≥ its arrival with ≥ D between consecutive slots of
    the same key. The defining recurrence
    ``sched_i = max(ts_i, sched_{i-1} + D)`` looks inherently
    sequential, but it is MAX-PLUS LINEAR:
    ``sched_i = i·D + max_{j≤i}(ts_j − j·D)`` — a row_number plus a
    RUNNING MAX of one derived column, so the whole schedule is two
    window passes over ONE sort, no recursion, no UDF, no
    driver-side loop. Output per event: (event_id, user_id, ts_us,
    sched_us, wait_us), all exact BIGINT microseconds.

    Scale shape: one exchange on the key, both window functions share
    the (key, ts, id) sort (plan-pinned: a single Exchange); per-key
    state during the scan is one running max. At 100 TB hosts
    parallelize across executors; a pathologically hot key is one
    partition's linear scan — the same bound as any windowed op."""
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("user_id").isNotNull())
          .select("event_id", "user_id",
                  F.expr("ts_ns div 1000").alias("ts_us")))
    return rate_limit_frame(ev)


def rate_limit_frame(ev: DataFrame,
                     gap_us: int = RATE_LIMIT_GAP_US) -> DataFrame:
    """The closed-form schedule over a normalized (event_id, user_id,
    ts_us) frame — split out so the ×10/×100 scale smoke can run it
    on amplified inputs."""
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.lit(gap_us)
    r = ev.withColumn("rn", F.row_number().over(w).cast("long"))
    return (r.withColumn("sched_us",
                         F.max(F.col("ts_us") - F.col("rn") * gap).over(run)
                         + F.col("rn") * gap)
             .select("event_id", "user_id", "ts_us", "sched_us",
                     (F.col("sched_us") - F.col("ts_us")).alias("wait_us")))


_RATE_LIMIT_SCHEDULE_SQL = f"""
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us
  FROM events WHERE user_id IS NOT NULL),
r AS (
  SELECT *, CAST(row_number() OVER
      (PARTITION BY user_id ORDER BY ts_us, event_id) AS BIGINT) AS rn
  FROM e),
s AS (
  SELECT event_id, user_id, ts_us,
         max(ts_us - rn * {RATE_LIMIT_GAP_US}) OVER (
             PARTITION BY user_id ORDER BY ts_us, event_id
             ROWS UNBOUNDED PRECEDING) + rn * {RATE_LIMIT_GAP_US}
           AS sched_us
  FROM r)
SELECT event_id, user_id, ts_us, sched_us, sched_us - ts_us AS wait_us
FROM s
"""


# --------------------------------------------- join-size estimation


def _join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-sketch join-cardinality estimate (operators/sketch.
    ams_join_size): |orders ⋈ lineitem| on the order key predicted
    from two d×w signed sketches — the query-planning / blocking-key
    primitive that sizes a shuffle before paying for it — next to the
    exact Σ n_a·n_b audit."""
    from ..operators import sketch
    return sketch.ams_join_size(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        "o_orderkey", "l_orderkey")


def _join_size_estimate_sql() -> str:
    from ..operators import sketch
    return sketch.ams_join_size_sql("orders", "o_orderkey",
                                    "lineitem", "l_orderkey")


# --------------------------------------------- market-basket pair lift

BASKET_MIN_SUPPORT = 2


def _basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence with lift — frequent-pair mining
    (the 2-itemset slice of Apriori/FP-growth) as pure DataFrame ops:
    parts appearing in the same order pair up via a SELF EQUI-JOIN on
    the order key, pair counts hash-agg with the min-support cut, and
    lift comes from the pair count + per-part order counts + total
    order count as ONE double expression over exact BIGINTs
    (n_ab·N / (n_a·n_b)).

    Scale shape: the self-join is co-partitioned on l_orderkey (both
    sides the same frame → one exchange, ReusedExchange on the
    probe); pair blowup is quadratic in BASKET SIZE (TPC-H ≤ 7 items,
    retail ~tens), never in the table. The (pa, pb) agg combines
    map-side; the support dims broadcast when small. The total-order
    scalar is a 1-row broadcast cross join."""
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_partkey").distinct())
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    pairs = (a.join(b, "ok")
              .where(F.col("pa") < F.col("pb"))
              .groupBy("pa", "pb")
              .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
              .where(F.col("n_ab") >= BASKET_MIN_SUPPORT))
    sup = (li.groupBy("l_partkey")
             .agg(F.count(F.lit(1)).cast("long").alias("n")))
    tot = li.agg(F.countDistinct("l_orderkey").cast("long").alias("n_orders"))
    return (pairs
            .join(sup.select(F.col("l_partkey").alias("pa"),
                             F.col("n").alias("n_a")), "pa")
            .join(sup.select(F.col("l_partkey").alias("pb"),
                             F.col("n").alias("n_b")), "pb")
            .crossJoin(F.broadcast(tot))
            .select(F.col("pa").cast("long").alias("part_a"),
                    F.col("pb").cast("long").alias("part_b"),
                    "n_ab", "n_a", "n_b",
                    F.expr("CAST(n_ab * n_orders AS DOUBLE) / "
                           "CAST(n_a * n_b AS DOUBLE)").alias("lift")))


_BASKET_PAIRS_SQL = f"""
WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
pairs AS (
  SELECT a.pk AS pa, b.pk AS pb, CAST(count(*) AS BIGINT) AS n_ab
  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY 1, 2 HAVING count(*) >= {BASKET_MIN_SUPPORT}
),
sup AS (SELECT pk, CAST(count(*) AS BIGINT) AS n FROM li GROUP BY 1),
tot AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders FROM li)
SELECT pa AS part_a, pb AS part_b, n_ab, sa.n AS n_a, sb.n AS n_b,
       CAST(n_ab * n_orders AS DOUBLE) / CAST(sa.n * sb.n AS DOUBLE) AS lift
FROM pairs JOIN sup sa ON sa.pk = pa JOIN sup sb ON sb.pk = pb, tot
"""


# ------------------------------------------------- k-anonymity audit

K_ANON = 5


def _k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy-governance audit: k-anonymity group sizes over the
    quasi-identifier tuple (event_type, day, $10 value band) — any
    combination observed fewer than K times re-identifies its members
    (Sweeney, IJUFKS'02). Returns the risky groups with k and a
    severity label; the release gate a training-data pipeline runs
    before shipping behavioral aggregates.

    Scale shape: one hash-agg over the QI tuple (map-side combined)
    + a selective filter — the same cost as any groupBy; no joins,
    no windows."""
    ev = load_table(spark, sf_dir, "events")
    return (ev.select("event_type",
                      F.expr("ts_ns div 1000 div 86400000000").alias("day"),
                      F.expr(f"{cents('value')} div 1000").alias("value_band"))
              .groupBy("event_type", "day", "value_band")
              .agg(F.count(F.lit(1)).cast("long").alias("k"))
              .where(F.col("k") < K_ANON)
              .withColumn("severity",
                          F.expr("CASE WHEN k = 1 THEN 'unique' "
                                 "ELSE 'small_group' END")))


_K_ANONYMITY_SQL = f"""
SELECT event_type, epoch_us(ts) // 86400000000 AS day,
       {cents('value')} // 1000 AS value_band,
       CAST(count(*) AS BIGINT) AS k,
       CASE WHEN count(*) = 1 THEN 'unique' ELSE 'small_group' END AS severity
FROM events
GROUP BY 1, 2, 3 HAVING count(*) < {K_ANON}
"""


L_DIVERSE = 3  # a QI group needs >= 3 distinct sensitive values


def _l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The second privacy gate (Machanavajjhala TKDD'07): k-anonymity
    alone fails when a large-enough group is HOMOGENEOUS in the
    sensitive attribute (everyone in the group shares the value, so
    membership alone discloses it). Audit: over the QI tuple
    (event_type, hour), count distinct sensitive values (the $10
    value band) — groups with < L distinct bands are flagged even
    when their k is comfortable. Complements `q_k_anonymity` (size)
    with homogeneity. Hourly QI chosen so the fixture exercises both
    severities (daily groups are never homogeneous at any SF).

    Scale shape: one distinct-agg over (QI, sensitive) then one
    count over QI — two map-side-combined exchanges, no joins."""
    from ..sources.tables import load_table
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("value").isNotNull())
          .select("event_type",
                  F.expr("ts_ns div 1000 div 3600000000").alias("hour"),
                  F.expr(f"{cents('value')} div 1000").alias("band")))
    return (ev.groupBy("event_type", "hour")
              .agg(F.count(F.lit(1)).cast("long").alias("k"),
                   F.count_distinct("band").cast("long").alias("l"))
              .where(F.col("l") < L_DIVERSE)
              .withColumn("severity",
                          F.expr("CASE WHEN l = 1 THEN 'homogeneous' "
                                 "ELSE 'low_diversity' END")))


_L_DIVERSITY_SQL = f"""
SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
       CAST(count(*) AS BIGINT) AS k,
       CAST(count(DISTINCT {cents('value')} // 1000) AS BIGINT) AS l,
       CASE WHEN count(DISTINCT {cents('value')} // 1000) = 1
            THEN 'homogeneous' ELSE 'low_diversity' END AS severity
FROM events
GROUP BY 1, 2 HAVING count(DISTINCT {cents('value')} // 1000) < {L_DIVERSE}
"""


def _sketch_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentiles WITHOUT sorting raw values — the 100 TB form of
    `q_percentiles` (whose `percentile_disc` must materialize and
    order every group's values): values collapse into log2 buckets
    (bucket = bit length of the cents amount — pure integer, no
    float log to disagree at bucket boundaries) IN the scan, so the
    only exchange is the (group, ≤64-bucket) histogram — map-side
    combined, mergeable (it IS a sketch: histograms from different
    partitions/days add), percentile read off the cumulative counts.
    Answer is the bucket LOWER BOUND (a ≤2× bracket), the classic
    latency-histogram trade: exactness of `q_percentiles` vs an
    exchange ~6 orders smaller here.

    All-BIGINT output; thresholds use ceil(P·n/100) via integer
    arithmetic — no doubles anywhere."""
    from pyspark.sql import Window
    from ..sources.tables import load_table
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("value").isNotNull())
          .select("event_type",
                  F.length(F.expr(f"bin(greatest({cents('value')}, 0L))"))
                   .cast("long").alias("b")))
    hist = (ev.groupBy("event_type", "b")
              .agg(F.count(F.lit(1)).cast("long").alias("n")))
    wcum = (Window.partitionBy("event_type").orderBy("b")
                  .rowsBetween(Window.unboundedPreceding, 0))
    wtot = Window.partitionBy("event_type")
    c = (hist.withColumn("cum", F.sum("n").over(wcum).cast("long"))
             .withColumn("total", F.sum("n").over(wtot).cast("long")))

    def pick(p: int, name: str):
        thr = F.expr(f"(total * {p} + 99) div 100")
        return F.min(F.when(F.col("cum") >= thr, F.col("b"))).alias(name)

    def lo(b: str):
        return F.expr(f"CAST(CASE WHEN {b} = 1 THEN 0 "
                      f"ELSE shiftleft(1L, CAST({b} - 1 AS INT)) END "
                      f"AS BIGINT)")

    p = (c.groupBy("event_type")
          .agg(F.max("total").cast("long").alias("n_events"),
               pick(50, "b50"), pick(90, "b90"), pick(99, "b99")))
    return p.select("event_type", "n_events",
                    lo("b50").alias("p50_lo_cents"),
                    lo("b90").alias("p90_lo_cents"),
                    lo("b99").alias("p99_lo_cents"))


_SKETCH_PERCENTILES_SQL = f"""
WITH h AS (
  SELECT event_type,
         CAST(length(format('{{:b}}', greatest({cents('value')}, 0)))
              AS BIGINT) AS b,
         CAST(count(*) AS BIGINT) AS n
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
c AS (SELECT event_type, b, n,
             CAST(sum(n) OVER (PARTITION BY event_type ORDER BY b)
                  AS BIGINT) AS cum,
             CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS total
      FROM h),
p AS (SELECT event_type, max(total) AS n_events,
             min(CASE WHEN cum >= (total * 50 + 99) // 100 THEN b END) AS b50,
             min(CASE WHEN cum >= (total * 90 + 99) // 100 THEN b END) AS b90,
             min(CASE WHEN cum >= (total * 99 + 99) // 100 THEN b END) AS b99
      FROM c GROUP BY 1)
SELECT event_type, CAST(n_events AS BIGINT) AS n_events,
       CAST(CASE WHEN b50 = 1 THEN 0 ELSE 1 << (b50 - 1) END AS BIGINT)
         AS p50_lo_cents,
       CAST(CASE WHEN b90 = 1 THEN 0 ELSE 1 << (b90 - 1) END AS BIGINT)
         AS p90_lo_cents,
       CAST(CASE WHEN b99 = 1 THEN 0 ELSE 1 << (b99 - 1) END AS BIGINT)
         AS p99_lo_cents
FROM p
"""


T_CLOSE_PPM = 300_000  # flag groups with EMD > 0.30 vs the global dist


def _t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third privacy gate (Li et al., ICDE'07), completing the
    trilogy with `q_k_anonymity` (group size) and `q_l_diversity`
    (value count): a group can be large AND diverse yet still leak if
    its sensitive-value DISTRIBUTION diverges from the global one
    (membership shifts the adversary's posterior). t = earth-mover's
    distance between the group's and the corpus's $10-band
    distributions over the ordered band domain = mean |ΔCDF|.

    Integer discipline: per-band CDF values are scaled to ppm by
    integer division BEFORE differencing (cum·10⁶ div n ≤ 10⁶, so the
    band sum is ≤ m·10⁶ — no int64 overflow at any corpus size, where
    the exact cross-multiplied form cum_k·N would overflow by sf10);
    the rounding convention is deterministic and identical on both
    engines, which is the contract that matters. Output: violating
    QI groups (t_ppm > {T_CLOSE_PPM}) with their k and t_ppm.

    Scale shape: the corpus collapses to (QI, band) counts in one
    map-side-combined exchange; everything after runs on bounded
    frames — the m-row global CDF (broadcast), the groups×m dense
    spine (output-sized, the `q_gap_fill` argument), one window per
    group over ≤m rows."""
    from pyspark.sql import Window
    from ..sources.tables import load_table
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("value").isNotNull())
          .select("event_type",
                  F.expr("ts_ns div 1000 div 3600000000").alias("hour"),
                  F.expr(f"{cents('value')} div 1000").alias("band")))
    gl = ev.groupBy("band").agg(F.count(F.lit(1)).cast("long").alias("n_g"))
    wb = (Window.orderBy("band")
                .rowsBetween(Window.unboundedPreceding, 0))
    glob = gl.withColumn("cum_g", F.sum("n_g").over(wb).cast("long"))
    tot = glob.agg(F.count(F.lit(1)).cast("long").alias("m"),
                   F.max("cum_g").cast("long").alias("n_all"))
    grp = (ev.groupBy("event_type", "hour", "band")
             .agg(F.count(F.lit(1)).cast("long").alias("n")))
    keys = (ev.groupBy("event_type", "hour")
              .agg(F.count(F.lit(1)).cast("long").alias("k")))
    dense = (keys.crossJoin(F.broadcast(glob.select("band", "cum_g")))
                 .join(grp, ["event_type", "hour", "band"], "left")
                 .withColumn("n0", F.coalesce(F.col("n"), F.lit(0))))
    wg = (Window.partitionBy("event_type", "hour").orderBy("band")
                .rowsBetween(Window.unboundedPreceding, 0))
    dcum = dense.withColumn("cum_k", F.sum("n0").over(wg).cast("long"))
    per = (dcum.crossJoin(F.broadcast(tot))
               .withColumn("d_ppm",
                           F.expr("abs(cum_k * 1000000L div k "
                                  "- cum_g * 1000000L div n_all)"))
               .groupBy("event_type", "hour", "k", "m")
               .agg(F.sum("d_ppm").cast("long").alias("s")))
    return (per.withColumn("t_ppm",
                           F.expr("s div (m - 1)").cast("long"))
               .where(F.col("t_ppm") > T_CLOSE_PPM)
               .select("event_type", "hour", "k", "t_ppm"))


_T_CLOSENESS_SQL = f"""
WITH ev AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
         {cents('value')} // 1000 AS band
  FROM events WHERE value IS NOT NULL),
gl AS (SELECT band, CAST(count(*) AS BIGINT) AS n_g FROM ev GROUP BY 1),
gcdf AS (SELECT band,
                CAST(sum(n_g) OVER (ORDER BY band) AS BIGINT) AS cum_g
         FROM gl),
tot AS (SELECT CAST(count(*) AS BIGINT) AS m,
               CAST(max(cum_g) AS BIGINT) AS n_all FROM gcdf),
grp AS (SELECT event_type, hour, band, CAST(count(*) AS BIGINT) AS n
        FROM ev GROUP BY 1, 2, 3),
keyz AS (SELECT event_type, hour, CAST(count(*) AS BIGINT) AS k
         FROM ev GROUP BY 1, 2),
dense AS (
  SELECT keyz.event_type, keyz.hour, keyz.k, g.band, g.cum_g,
         coalesce(grp.n, 0) AS n0
  FROM keyz CROSS JOIN gcdf g
  LEFT JOIN grp ON grp.event_type = keyz.event_type
               AND grp.hour = keyz.hour AND grp.band = g.band),
dcum AS (
  SELECT event_type, hour, k, band, cum_g,
         CAST(sum(n0) OVER (PARTITION BY event_type, hour
                            ORDER BY band) AS BIGINT) AS cum_k
  FROM dense),
per AS (
  SELECT event_type, hour, k,
         CAST(sum(abs(cum_k * 1000000 // k
                      - cum_g * 1000000 // n_all)) AS BIGINT) AS s,
         max(m) AS m
  FROM dcum, tot GROUP BY 1, 2, 3)
SELECT event_type, hour, k, CAST(s // (m - 1) AS BIGINT) AS t_ppm
FROM per WHERE s // (m - 1) > {T_CLOSE_PPM}
"""


ATTR_LOOKBACK_US = 3 * 86_400_000_000  # 3-day attribution window


def _attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST-TOUCH marketing attribution (the funnel-adjacent revenue
    question every event warehouse answers): each purchase credits
    the user's most recent prior click — but only within a bounded
    3-day lookback (an unbounded as-of would credit stale touches);
    outside the window (or never clicked) lands in campaign -1.
    Campaign = click's JSON props.k mod 5. Rides the graded as-of
    machinery (union + window-fill), one extra codegen CASE for the
    window bound; revenue in exact cents. Oracle: DuckDB NATIVE ASOF
    + the same CASE."""
    from ..operators.joins import asof_join
    from ..sources.tables import load_table
    e = (load_table(spark, sf_dir, "events")
         .withColumn("ts_us", F.expr("ts_ns div 1000")))
    purchases = (e.where(F.col("event_type") == "purchase")
                  .select("user_id", "ts_us",
                          F.expr(cents("value")).alias("v")))
    clicks = (e.where(F.col("event_type") == "click")
               .withColumn("k", F.get_json_object("props", "$.k")
                                 .cast("long"))
               .groupBy("user_id", "ts_us")
               .agg(F.max("k").alias("k"))
               .withColumn("cts", F.col("ts_us")))
    j = asof_join(purchases, clicks, key="user_id", time="ts_us",
                  payload=["k", "cts"])
    campaign = F.expr(
        f"CASE WHEN cts_r IS NULL OR k_r IS NULL "
        f"OR ts_us - cts_r > {ATTR_LOOKBACK_US} "
        f"THEN -1 ELSE k_r % 5 END")
    return (j.groupBy(campaign.cast("long").alias("campaign"))
             .agg(F.count(F.lit(1)).cast("long").alias("n_purchases"),
                  F.expr("CAST(sum(v) AS BIGINT)").alias("revenue_cents")))


_ATTRIBUTION_SQL = f"""
WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type, value,
                   CAST(props->>'k' AS BIGINT) AS k
            FROM events),
purchases AS (SELECT user_id, ts_us, {cents('value')} AS v
              FROM ev WHERE event_type = 'purchase'),
clicks AS (SELECT user_id, ts_us, max(k) AS k, ts_us AS cts
           FROM ev WHERE event_type = 'click' GROUP BY 1, 2),
j AS (
  SELECT p.ts_us, p.v, c.k, c.cts
  FROM purchases p
  ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts_us >= c.ts_us
)
SELECT CAST(CASE WHEN cts IS NULL OR k IS NULL
                 OR ts_us - cts > {ATTR_LOOKBACK_US}
            THEN -1 ELSE k % 5 END AS BIGINT) AS campaign,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(sum(v) AS BIGINT) AS revenue_cents
FROM j GROUP BY 1
"""


def _salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type totals through the SKEW-SAFE two-phase salted
    aggregate (operators/skew.salted_agg): 5 group keys over 10k rows
    means EVERY key is a hot key — phase 1 spreads each over 16
    (key, salt) reducers computing partials, phase 2 merges 80 partial
    rows. Results are exactly the plain aggregate's (the oracle IS
    the plain GROUP BY); what the salted plan buys at 1000 executors
    is no single reducer ever owning a whole hot key."""
    from ..operators.skew import salted_agg
    from ..sources.tables import load_table
    ev = (load_table(spark, sf_dir, "events")
          .select("event_type", "event_id",
                  F.expr(cents("value")).alias("v")))
    return salted_agg(
        ev, key="event_type",
        partials=[(F.count(F.lit(1)), "n_p"),
                  (F.expr("CAST(sum(v) AS BIGINT)"), "s_p")],
        finals=[(F.expr("CAST(sum(n_p) AS BIGINT)"), "n_events"),
                (F.expr("CAST(sum(s_p) AS BIGINT)"), "value_cents")],
        salt_src="event_id")


_SALTED_AGG_SQL = f"""
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum({cents('value')}) AS BIGINT) AS value_cents
FROM events GROUP BY 1
"""


def _gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification + forward fill — the time-series
    completion every daily-rollup consumer assumes (a day with no
    purchases must appear with the last known running total, or
    downstream joins silently drop it). A deliberately sparsified
    daily series (purchase events of users ≡ 0 mod 7 — ~1/7 of days
    survive per the fixture's user striping) is completed over the
    full min..max day spine per event_type: `sequence()` generates
    the spine IN the scan (one row per (type, day), no driver loop),
    `last(ignorenulls)` over an unbounded-preceding frame carries the
    latest observed daily total forward; `is_observed` flags real vs
    filled rows and `carried_from` pins the fill's provenance.

    Scale shape: the spine explode is bounded by types×days (output-
    sized, not corpus-sized); the fill is one window pass on the same
    (type)-keyed exchange the daily rollup already made."""
    from ..sources.tables import load_table
    ev = (load_table(spark, sf_dir, "events")
          .where("event_type = 'purchase' AND user_id % 7 = 0")
          .select(F.expr("ts_ns div 1000 div 86400000000").alias("day"),
                  "event_type",
                  F.expr(cents("value")).alias("v")))
    daily = (ev.groupBy("event_type", "day")
               .agg(F.count(F.lit(1)).cast("long").alias("n"),
                    F.expr("CAST(sum(v) AS BIGINT)").alias("cents")))
    bounds = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = (daily.select("event_type").distinct()
                  .crossJoin(F.broadcast(bounds))
                  .select("event_type",
                          F.explode(F.expr("sequence(d0, d1)"))
                           .alias("day")))
    from pyspark.sql import Window
    w = (Window.partitionBy("event_type").orderBy("day")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = (spine.join(daily, ["event_type", "day"], "left")
              .withColumn("is_observed",
                          F.col("n").isNotNull().cast("long"))
              .withColumn("filled_n",
                          F.coalesce(F.last("n", ignorenulls=True)
                                      .over(w), F.lit(0)).cast("long"))
              .withColumn("filled_cents",
                          F.coalesce(F.last("cents", ignorenulls=True)
                                      .over(w), F.lit(0)).cast("long"))
              .withColumn("carried_from",
                          F.last(F.when(F.col("n").isNotNull(),
                                        F.col("day")),
                                 ignorenulls=True).over(w).cast("long")))
    return filled.select("event_type", "day", "is_observed",
                         "filled_n", "filled_cents", "carried_from")


_GAP_FILL_SQL = f"""
WITH ev AS (
  SELECT epoch_us(ts) // 86400000000 AS day, event_type,
         {cents('value')} AS v
  FROM events WHERE event_type = 'purchase' AND user_id % 7 = 0
),
daily AS (
  SELECT event_type, day, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(v) AS BIGINT) AS cents
  FROM ev GROUP BY 1, 2
),
bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
spine AS (
  SELECT t.event_type, d0 + u.k AS day
  FROM (SELECT DISTINCT event_type FROM daily) t, bounds,
       UNNEST(range(CAST(d1 - d0 + 1 AS BIGINT))) u(k)
)
SELECT s.event_type, s.day,
       CAST(d.n IS NOT NULL AS BIGINT) AS is_observed,
       CAST(COALESCE(last_value(d.n IGNORE NULLS) OVER w, 0) AS BIGINT)
         AS filled_n,
       CAST(COALESCE(last_value(d.cents IGNORE NULLS) OVER w, 0)
            AS BIGINT) AS filled_cents,
       CAST(last_value(CASE WHEN d.n IS NOT NULL THEN s.day END
                       IGNORE NULLS) OVER w AS BIGINT) AS carried_from
FROM spine s LEFT JOIN daily d USING (event_type, day)
WINDOW w AS (PARTITION BY s.event_type ORDER BY s.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def _rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling distinct active users via HLL register algebra
    (operators/sketch.hll_rolling_distinct): per-day registers merge
    by a RANGE-frame window max — the sliding-window cardinality
    exact COUNT(DISTINCT) cannot maintain incrementally (the exact
    column rides along as the fixture-scale harness)."""
    from ..operators import sketch
    from ..sources.tables import load_table
    ev = (load_table(spark, sf_dir, "events")
          .select(F.expr("ts_ns div 1000 div 86400000000").alias("day"),
                  "user_id"))
    return sketch.hll_rolling_distinct(ev)


from ..operators.sketch import hll_rolling_distinct_sql  # noqa: E402


# ------------------------------------------------- key-skew profile

def _skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type key-distribution skew report — the profiling
    pass that decides WHICH keys need salting before a groupBy/join
    at scale (the repo's salted/AQE mitigations assume someone
    measured the skew; this is that measurement): per type, the
    number of distinct users, total events, the single hottest key's
    share in ppm, and the Gini coefficient of the per-user counts
    (0 = uniform, →1 = one user dominates).

    Gini from the standard rank identity G = (2·Σᵢ i·xᵢ − (n+1)·Σx)
    / (n·Σx) with x ascending: Σᵢ i·xᵢ is exact int64 (rank ties on
    equal x contribute the same sum under any tie order, so the
    user_id tiebreak is only for a deterministic plan), and the final
    Gini is ONE fixed double expression over three exact ints.

    Scale shape: per-(type,user) hash-agg with map-side combine, then
    a rank window partitioned by type over the already-reduced
    per-user frame (users·types rows, not events), then a types-sized
    hash-agg. Nothing re-scans the corpus."""
    from pyspark.sql import Window
    per_user = (load_table(spark, sf_dir, "events")
                .groupBy("event_type", "user_id")
                .agg(F.count(F.lit(1)).cast("long").alias("x")))
    w = (Window.partitionBy("event_type")
               .orderBy(F.col("x").asc(), F.col("user_id").asc()))
    ranked = per_user.withColumn("i", F.row_number().over(w).cast("long"))
    return (ranked.groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n_users"),
                 F.expr("CAST(sum(x) AS BIGINT)").alias("total"),
                 F.expr("CAST(max(x) AS BIGINT)").alias("max_x"),
                 F.expr("CAST(sum(i * x) AS BIGINT)").alias("six"))
            .select("event_type", "n_users", "total",
                    F.expr("max_x * 1000000 div total").alias("top1_ppm"),
                    F.expr("(2.0E0 * CAST(six AS DOUBLE) - "
                           "(CAST(n_users AS DOUBLE) + 1.0E0) * "
                           "CAST(total AS DOUBLE)) / "
                           "(CAST(n_users AS DOUBLE) * "
                           "CAST(total AS DOUBLE))").alias("gini")))


_SKEW_PROFILE_SQL = """
WITH pu AS (
  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2),
rk AS (
  SELECT event_type, x,
         CAST(row_number() OVER (PARTITION BY event_type
              ORDER BY x ASC, user_id ASC) AS BIGINT) AS i
  FROM pu),
ag AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(x) AS BIGINT) AS total,
         CAST(max(x) AS BIGINT) AS max_x,
         CAST(sum(i * x) AS BIGINT) AS six
  FROM rk GROUP BY 1)
SELECT event_type, n_users, total,
       max_x * 1000000 // total AS top1_ppm,
       (2.0E0 * CAST(six AS DOUBLE) - (CAST(n_users AS DOUBLE) + 1.0E0)
        * CAST(total AS DOUBLE))
         / (CAST(n_users AS DOUBLE) * CAST(total AS DOUBLE)) AS gini
FROM ag
"""


# -------------------------------------------- median/MAD outliers

def _mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier census per event type — median/MAD instead of
    mean/stddev (one fat-finger amount does not move the fence, the
    property that makes this the production data-quality gate):
    median and MAD computed as EXACT lower medians over integer cents
    (row_number = (n+1)/2 — percentile interpolation differs between
    engines, the order statistic cannot), outliers = values beyond
    median ± 5·MAD, all in exact int64.

    Scale shape: two rank windows partitioned by type (the second
    over |x − med|) and one broadcast join of the 5-row median frame
    back onto the typed stream; no global sort — each window sorts
    within its type partition only."""
    from pyspark.sql import Window
    ev = (load_table(spark, sf_dir, "events")
          .select("event_type", "event_id",
                  F.expr(f"{cents('value')}").alias("v")))
    wv = (Window.partitionBy("event_type")
                .orderBy(F.col("v").asc(), F.col("event_id").asc()))
    wn = Window.partitionBy("event_type")
    med = (ev.withColumn("rn", F.row_number().over(wv).cast("long"))
             .withColumn("n", F.count(F.lit(1)).over(wn).cast("long"))
             .where(F.col("rn") == F.expr("(n + 1) div 2"))
             .select("event_type", F.col("v").alias("med"),
                     F.col("n").alias("n")))
    dev = (ev.join(F.broadcast(med), "event_type")
             .withColumn("d", F.abs(F.col("v") - F.col("med"))))
    wd = (Window.partitionBy("event_type")
                .orderBy(F.col("d").asc(), F.col("event_id").asc()))
    mad = (dev.withColumn("rn", F.row_number().over(wd).cast("long"))
              .where(F.col("rn") == F.expr("(n + 1) div 2"))
              .select("event_type", F.col("d").alias("mad")))
    return (dev.join(F.broadcast(mad), "event_type")
            .groupBy("event_type")
            .agg(F.expr("CAST(max(n) AS BIGINT)").alias("n"),
                 F.expr("CAST(max(med) AS BIGINT)").alias("med_cents"),
                 F.expr("CAST(max(mad) AS BIGINT)").alias("mad_cents"),
                 F.expr("CAST(sum(CASE WHEN d > 5 * mad THEN 1 ELSE 0 END) "
                        "AS BIGINT)").alias("n_outliers"))
            .orderBy("event_type"))


_MAD_OUTLIERS_SQL = f"""
WITH ev AS (
  SELECT event_type, event_id, {cents('value')} AS v FROM events),
rk AS (
  SELECT event_type, v,
         CAST(row_number() OVER (PARTITION BY event_type
              ORDER BY v ASC, event_id ASC) AS BIGINT) AS rn,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM ev),
med AS (SELECT event_type, v AS med, n FROM rk WHERE rn = (n + 1) // 2),
dev AS (
  SELECT ev.event_type, ev.event_id, abs(ev.v - med.med) AS d,
         med.med, med.n
  FROM ev JOIN med USING (event_type)),
dr AS (
  SELECT event_type, d,
         CAST(row_number() OVER (PARTITION BY event_type
              ORDER BY d ASC, event_id ASC) AS BIGINT) AS rn,
         n
  FROM dev),
mad AS (SELECT event_type, d AS mad FROM dr WHERE rn = (n + 1) // 2)
SELECT dev.event_type,
       CAST(max(dev.n) AS BIGINT) AS n,
       CAST(max(dev.med) AS BIGINT) AS med_cents,
       CAST(max(mad.mad) AS BIGINT) AS mad_cents,
       CAST(sum(CASE WHEN dev.d > 5 * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM dev JOIN mad USING (event_type)
GROUP BY 1
ORDER BY 1
"""


# --------------------------------------------- bitmap co-activity

BITMAP_SLOTS = 63  # 0..62 — stays off the int64 sign bit, so
                   # bit_count/AND/OR semantics are engine-identical


def _bitmap_coactivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap-index audience overlap — the roaring-bitmap pattern in
    64-bit miniature: per (event_type, day) a presence bitmap of
    user-hash slots built with bit_or(1 << user_id % 63), then
    pairwise AND/OR popcounts between event types per day, summed
    into a per-pair co-activity report with exact-ppm Jaccard.

    This is how engagement overlap is computed at 100 TB: the corpus
    collapses to types×days bitmap rows in ONE hash-agg (map-side
    combinable — bit_or is associative), and the pairwise stage works
    entirely on that tiny frame; a production version swaps the int64
    for a roaring blob with the same algebra.

    Scale shape: one corpus scan → (types·days) bitmap rows →
    (types²·days) joined rows → types² output. No per-user state
    leaves the first aggregate."""
    ev = (load_table(spark, sf_dir, "events")
          .select("event_type",
                  F.expr("ts_ns div 1000 div 86400000000").alias("day"),
                  F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                         f"CAST(user_id % {BITMAP_SLOTS} AS INT))")
                   .alias("bit")))
    bm = (ev.groupBy("event_type", "day")
            .agg(F.expr("bit_or(bit)").alias("bm")))
    a = bm.select(F.col("event_type").alias("type_a"), "day",
                  F.col("bm").alias("bm_a"))
    b = bm.select(F.col("event_type").alias("type_b"),
                  F.col("day").alias("day_b"), F.col("bm").alias("bm_b"))
    pair = (a.join(b, (a.day == b.day_b) & (a.type_a < b.type_b))
            .select("type_a", "type_b",
                    F.expr("CAST(bit_count(bm_a & bm_b) AS BIGINT)")
                     .alias("n_both"),
                    F.expr("CAST(bit_count(bm_a | bm_b) AS BIGINT)")
                     .alias("n_either")))
    return (pair.groupBy("type_a", "type_b")
            .agg(F.count(F.lit(1)).cast("long").alias("days"),
                 F.expr("CAST(sum(n_both) AS BIGINT)").alias("sum_both"),
                 F.expr("CAST(sum(n_either) AS BIGINT)").alias("sum_either"))
            .select("type_a", "type_b", "days", "sum_both", "sum_either",
                    F.expr("sum_both * 1000000 div sum_either")
                     .alias("jaccard_ppm"))
            .orderBy("type_a", "type_b"))


_BITMAP_COACTIVITY_SQL = f"""
WITH ev AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         (CAST(1 AS BIGINT) << CAST(user_id % {BITMAP_SLOTS} AS INT)) AS bit
  FROM events),
bm AS (
  SELECT event_type, day, bit_or(bit) AS bm FROM ev GROUP BY 1, 2),
pair AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(bit_count(a.bm & b.bm) AS BIGINT) AS n_both,
         CAST(bit_count(a.bm | b.bm) AS BIGINT) AS n_either
  FROM bm a JOIN bm b ON a.day = b.day AND a.event_type < b.event_type)
SELECT type_a, type_b, CAST(count(*) AS BIGINT) AS days,
       CAST(sum(n_both) AS BIGINT) AS sum_both,
       CAST(sum(n_either) AS BIGINT) AS sum_either,
       CAST(sum(n_both) AS BIGINT) * 1000000
         // CAST(sum(n_either) AS BIGINT) AS jaccard_ppm
FROM pair
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ------------------------------------------------- dow seasonality

def _seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal index per event type — the capacity-
    planning / anomaly-baseline profile ("is Tuesday always 2× the
    Sunday volume, or is today broken?"): per (type, dow), event
    count and exact-cents amount plus their seasonal indices vs the
    type's own weekly mean, in truncating ppm.

    dow from pure epoch-day arithmetic ((day + 3) % 7, 0 = Monday —
    engine date functions DISAGREE on week-start conventions, ints
    cannot). Index = mean_dow·10⁶ div mean_total over truncating
    integer means (documented precision trade, deterministic).

    Scale shape: one scan → (types×7)-group hash agg with map-side
    combine; the per-type totals ride a window over the 35-row
    aggregate. Nothing else touches the corpus."""
    from pyspark.sql import Window
    ev = (load_table(spark, sf_dir, "events")
          .select("event_type",
                  F.expr("(ts_ns div 1000 div 86400000000 + 3) % 7")
                   .alias("dow"),
                  F.expr(f"{cents('value')}").alias("v")))
    g = (ev.groupBy("event_type", "dow")
           .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                F.expr("CAST(sum(v) AS BIGINT)").alias("sum_cents")))
    w = Window.partitionBy("event_type")
    return (g.withColumn("n_tot", F.sum("n_events").over(w).cast("long"))
             .withColumn("c_tot", F.sum("sum_cents").over(w).cast("long"))
             .select("event_type", "dow", "n_events", "sum_cents",
                     F.expr("n_events * 7 * 1000000 div n_tot")
                      .alias("cnt_idx_ppm"),
                     F.expr("CASE WHEN c_tot div n_tot = 0 THEN 0 "
                            "ELSE (sum_cents div n_events) * 1000000 "
                            "div (c_tot div n_tot) END")
                      .alias("amt_idx_ppm"))
             .orderBy("event_type", "dow"))


_SEASONALITY_SQL = f"""
WITH ev AS (
  SELECT event_type,
         (epoch_us(ts) // 86400000000 + 3) % 7 AS dow,
         {cents('value')} AS v
  FROM events),
g AS (
  SELECT event_type, dow,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(v) AS BIGINT) AS sum_cents
  FROM ev GROUP BY 1, 2),
t AS (
  SELECT event_type, dow, n_events, sum_cents,
         CAST(sum(n_events) OVER (PARTITION BY event_type) AS BIGINT)
           AS n_tot,
         CAST(sum(sum_cents) OVER (PARTITION BY event_type) AS BIGINT)
           AS c_tot
  FROM g)
SELECT event_type, dow, n_events, sum_cents,
       n_events * 7 * 1000000 // n_tot AS cnt_idx_ppm,
       CASE WHEN c_tot // n_tot = 0 THEN 0
            ELSE (sum_cents // n_events) * 1000000 // (c_tot // n_tot)
            END AS amt_idx_ppm
FROM t
ORDER BY event_type, dow
"""


# --------------------------------------------------- cohort LTV

def _cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve (the revenue sibling of
    `q_events_retention`'s activity matrix): users cohorted by first-
    seen week, per (cohort, age-in-weeks) the exact-cents revenue and
    its RUNNING cumulative — the LTV curve — plus cumulative value
    per cohort user.

    Scale shape: one user-key window for first-seen (the sessionizer
    exchange), one (cohort, age) hash-agg, then the cumsum window
    runs over the cohorts×ages aggregate, never the event stream."""
    from pyspark.sql import Window
    ev = (load_table(spark, sf_dir, "events")
          .select("user_id",
                  F.expr("ts_ns div 1000 div 604800000000").alias("wk"),
                  F.expr(f"{cents('value')}").alias("v")))
    wu = Window.partitionBy("user_id")
    co = ev.withColumn("cohort_wk", F.min("wk").over(wu).cast("long"))
    g = (co.groupBy("cohort_wk", (F.col("wk") - F.col("cohort_wk"))
                    .cast("long").alias("age_wk"))
           .agg(F.expr("CAST(sum(v) AS BIGINT)").alias("week_cents"),
                F.countDistinct("user_id").cast("long").alias("n_active")))
    users = (co.groupBy("cohort_wk")
               .agg(F.countDistinct("user_id").cast("long")
                     .alias("n_users")))
    wc = (Window.partitionBy("cohort_wk").orderBy("age_wk")
                .rowsBetween(Window.unboundedPreceding, 0))
    return (g.join(F.broadcast(users), "cohort_wk")
             .withColumn("cum_cents",
                         F.sum("week_cents").over(wc).cast("long"))
             .select("cohort_wk", "age_wk", "n_users", "n_active",
                     "week_cents", "cum_cents",
                     F.expr("cum_cents div n_users")
                      .alias("cum_per_user_cents"))
             .orderBy("cohort_wk", "age_wk"))


_COHORT_LTV_SQL = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) // 604800000000 AS wk,
         {cents('value')} AS v
  FROM events),
co AS (
  SELECT user_id, wk, v,
         CAST(min(wk) OVER (PARTITION BY user_id) AS BIGINT)
           AS cohort_wk
  FROM ev),
g AS (
  SELECT cohort_wk, CAST(wk - cohort_wk AS BIGINT) AS age_wk,
         CAST(sum(v) AS BIGINT) AS week_cents,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
  FROM co GROUP BY 1, 2),
u AS (
  SELECT cohort_wk, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
  FROM co GROUP BY 1),
c AS (
  SELECT g.cohort_wk, g.age_wk, u.n_users, g.n_active, g.week_cents,
         CAST(sum(g.week_cents) OVER (PARTITION BY g.cohort_wk
              ORDER BY g.age_wk
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_cents
  FROM g JOIN u USING (cohort_wk))
SELECT cohort_wk, age_wk, n_users, n_active, week_cents, cum_cents,
       cum_cents // n_users AS cum_per_user_cents
FROM c
ORDER BY cohort_wk, age_wk
"""


# --------------------------------------------------- A/B readout

def _abtest_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic A/B experiment readout — assignment by the
    cross-engine user hash (h32('exp1:'||user) % 2, the salted-split
    machinery as an experimentation system); the success metric is
    "per-user purchase spend above the GLOBAL lower-median spend"
    (an always-true metric like made-any-purchase gives pooled p = 1
    and an undefined z — the median split is ~50% by construction,
    so the statistic is live at any corpus size). Per-variant user /
    converter counts, conversion ppm, lift, and the two-proportion z
    as ONE fixed double expression over the four exact counts, with
    a CASE guard for the degenerate pooled p ∈ {0, 1}.

    Scale shape: one per-user aggregate (map-side combined), one
    rank window over the per-user frame for the exact median, a
    1-row broadcast, then a 2-row pivot via conditional sums."""
    from pyspark.sql import Window
    from ..functions import h32
    ev = load_table(spark, sf_dir, "events")
    pu = (ev.groupBy("user_id")
            .agg(F.expr(f"CAST(sum(CASE WHEN event_type = 'purchase' "
                        f"THEN {cents('value')} ELSE 0 END) AS BIGINT)")
                  .alias("spend")))
    wv = Window.orderBy(F.col("spend").asc(), F.col("user_id").asc())
    med = (pu.withColumn("rn", F.row_number().over(wv).cast("long"))
             .withColumn("n", F.count(F.lit(1)).over(
                 Window.partitionBy()).cast("long"))
             .where(F.col("rn") == F.expr("(n + 1) div 2"))
             .select(F.col("spend").alias("med_spend")))
    assigned = (pu.crossJoin(F.broadcast(med))
                  .withColumn("converted",
                              (F.col("spend") > F.col("med_spend"))
                              .cast("long"))
                  .withColumn("variant",
                              (h32(F.concat(F.lit("exp1:"),
                                            F.col("user_id")
                                             .cast("string"))) % 2)
                              .cast("long")))
    g = assigned.agg(
        F.expr("CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) "
               "AS BIGINT)").alias("n0"),
        F.expr("CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) "
               "AS BIGINT)").alias("n1"),
        F.expr("CAST(sum(CASE WHEN variant = 0 THEN converted ELSE 0 "
               "END) AS BIGINT)").alias("c0"),
        F.expr("CAST(sum(CASE WHEN variant = 1 THEN converted ELSE 0 "
               "END) AS BIGINT)").alias("c1"))
    z = ("CASE WHEN c0 + c1 = 0 OR c0 + c1 = n0 + n1 THEN CAST(0 AS DOUBLE) "
         "ELSE (CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0) / "
         "sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1)) * "
         "(1.0E0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1)) * "
         "(1.0E0 / n0 + 1.0E0 / n1)) END")
    return g.select(
        "n0", "n1", "c0", "c1",
        F.expr("c0 * 1000000 div n0").alias("conv0_ppm"),
        F.expr("c1 * 1000000 div n1").alias("conv1_ppm"),
        F.expr("c1 * 1000000 div n1 - c0 * 1000000 div n0")
         .alias("lift_ppm"),
        F.expr(z).alias("z_score"))


def _abtest_readout_sql() -> str:
    from ..functions import h32_sql
    assign = f"({h32_sql(chr(39) + 'exp1:' + chr(39) + ' || CAST(user_id AS VARCHAR)')} % 2)"
    return f"""
WITH pu AS (
  SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'purchase'
                  THEN {cents('value')} ELSE 0 END) AS BIGINT) AS spend
  FROM events GROUP BY user_id),
rk AS (
  SELECT spend,
         CAST(row_number() OVER (ORDER BY spend ASC, user_id ASC)
              AS BIGINT) AS rn,
         CAST(count(*) OVER () AS BIGINT) AS n
  FROM pu),
med AS (SELECT spend AS med_spend FROM rk WHERE rn = (n + 1) // 2),
a AS (
  SELECT pu.user_id,
         CAST(pu.spend > med.med_spend AS BIGINT) AS converted,
         {assign} AS variant
  FROM pu CROSS JOIN med),
g AS (
  SELECT CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n0,
         CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n1,
         CAST(sum(CASE WHEN variant = 0 THEN converted ELSE 0 END)
              AS BIGINT) AS c0,
         CAST(sum(CASE WHEN variant = 1 THEN converted ELSE 0 END)
              AS BIGINT) AS c1
  FROM a)
SELECT n0, n1, c0, c1,
       c0 * 1000000 // n0 AS conv0_ppm,
       c1 * 1000000 // n1 AS conv1_ppm,
       c1 * 1000000 // n1 - c0 * 1000000 // n0 AS lift_ppm,
       CASE WHEN c0 + c1 = 0 OR c0 + c1 = n0 + n1 THEN CAST(0 AS DOUBLE)
            ELSE (CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0) /
                 sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1)) *
                      (1.0E0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1)) *
                      (1.0E0 / n0 + 1.0E0 / n1)) END AS z_score
FROM g
"""


# --------------------------------------------- hierarchy rollup

def _hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE hierarchy traversal, Spark-first
    (operators/graph.ancestor_closure): customers form a
    parent-pointer forest (parent = c_custkey div 10 — deterministic,
    ≤6 levels at any sf); per node: depth (ancestor count),
    proper-descendant count, and the SUBTREE balance rollup in exact
    cents — the org-chart / BOM-explosion / category-tree aggregation
    shape SQL engines write with WITH RECURSIVE (the oracle does
    exactly that).

    Scale shape: the closure is never materialized
    (`graph.hierarchy_aggregates`): depth comes from pointer-jumping
    with carried distance (2·|V| rows/round, log-depth rounds) and
    the subtree rollup runs level-synchronously bottom-up, each node
    shuffled exactly once as a sender — cumulative exchange O(|V|)
    rows vs the Σ depth(n)-row closure (measured 7.3 GB at ×100 on
    the old closure path), then one left join back onto the node
    table."""
    from ..operators.graph import hierarchy_aggregates
    bal = (load_table(spark, sf_dir, "customer")
           .select("c_custkey",
                   F.expr(cents("c_acctbal")).alias("bal_cents")))
    edges = (bal.where("c_custkey >= 10")
                .select(F.col("c_custkey").alias("child"),
                        F.expr("c_custkey div 10").alias("parent")))
    agg = hierarchy_aggregates(edges, bal, id_col="c_custkey",
                               val_col="bal_cents", rounds=4)
    return (bal.join(agg, bal.c_custkey == agg.node, "left")
               .select("c_custkey",
                       F.coalesce("depth", F.lit(0)).cast("long")
                        .alias("depth"),
                       F.coalesce("n_desc", F.lit(0)).cast("long")
                        .alias("n_desc"),
                       (F.col("bal_cents")
                        + F.coalesce("desc_sum", F.lit(0)))
                       .cast("long").alias("subtree_cents")))


_HIERARCHY_ROLLUP_SQL = f"""
WITH RECURSIVE anc AS (
  SELECT c_custkey AS node, c_custkey // 10 AS anc
  FROM customer WHERE c_custkey >= 10
  UNION
  SELECT node, anc // 10 FROM anc WHERE anc >= 10
),
bal AS (SELECT c_custkey, {cents('c_acctbal')} AS bal_cents
        FROM customer),
d AS (SELECT node, CAST(count(*) AS BIGINT) AS depth FROM anc
      GROUP BY 1),
s AS (SELECT a.anc AS k, CAST(count(*) AS BIGINT) AS n_desc,
             CAST(sum(b.bal_cents) AS BIGINT) AS desc_cents
      FROM anc a JOIN bal b ON a.node = b.c_custkey GROUP BY 1)
SELECT bal.c_custkey,
       CAST(coalesce(d.depth, 0) AS BIGINT) AS depth,
       CAST(coalesce(s.n_desc, 0) AS BIGINT) AS n_desc,
       CAST(bal.bal_cents + coalesce(s.desc_cents, 0) AS BIGINT)
         AS subtree_cents
FROM bal
LEFT JOIN d ON bal.c_custkey = d.node
LEFT JOIN s ON bal.c_custkey = s.k
"""


# ------------------------------------------------ Benford digit audit

#: Benford expected first-digit frequencies log10(1+1/d), d=1..9,
#: rounded to 1e-6 and embedded as INTEGER LITERALS in both engines —
#: no engine-side log() (libm rounding is not cross-engine exact).
_BENFORD_E6 = {d: round(__import__("math").log10(1 + 1 / d) * 1_000_000)
               for d in range(1, 10)}
_BENFORD_CASE = ("CASE digit " + " ".join(
    f"WHEN {d} THEN {v}" for d, v in _BENFORD_E6.items()) + " END")


def _benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit over order totals — the numeric
    data-quality screen (fabricated or systematically-generated
    amounts drift from Benford's law; auditors and fraud pipelines
    run exactly this). Per leading digit: observed count, observed
    frequency, the Benford expectation, and an exact-integer
    chi-square-style contribution ((obs_freq_e6 − exp_e6)² div
    exp_e6) — all arithmetic exact BIGINT except the one obs_freq
    division, so the hash pins every cell.

    Scale shape: ONE scan → 9-key hash agg with map-side combine; the
    total is an unpartitioned window over the NINE aggregate rows (a
    crossJoin against a separate total agg would re-derive — and
    re-scan — the counts subtree). Nothing else."""
    o = load_table(spark, sf_dir, "orders")
    digits = o.selectExpr(
        f"CAST(substr(CAST({cents('o_totalprice')} AS STRING), 1, 1) "
        "AS BIGINT) AS digit")
    counts = digits.groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"))
    return (counts.withColumn(
                "total",
                F.expr("CAST(sum(n_obs) OVER () AS BIGINT)"))
            .selectExpr(
                "digit", "n_obs",
                "CAST(n_obs AS DOUBLE) / CAST(total AS DOUBLE) AS obs_freq",
                f"CAST({_BENFORD_CASE} AS BIGINT) AS expected_e6",
                "(n_obs * 1000000) div total AS obs_freq_e6")
            .selectExpr(
                "digit", "n_obs", "obs_freq", "expected_e6",
                "obs_freq_e6 - expected_e6 AS dev_e6",
                "((obs_freq_e6 - expected_e6) * "
                "(obs_freq_e6 - expected_e6)) div expected_e6 "
                "AS chi_contrib_e6")
            .orderBy("digit"))


_BENFORD_SQL = f"""
WITH d AS (SELECT CAST(substr(CAST({cents('o_totalprice')} AS VARCHAR),
                        1, 1) AS BIGINT) AS digit FROM orders),
c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs FROM d GROUP BY 1),
t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS total FROM c),
e AS (SELECT digit, n_obs,
             CAST(n_obs AS DOUBLE) / CAST(total AS DOUBLE) AS obs_freq,
             CAST({_BENFORD_CASE} AS BIGINT) AS expected_e6,
             (n_obs * 1000000) // total AS obs_freq_e6
      FROM c, t)
SELECT digit, n_obs, obs_freq, expected_e6,
       obs_freq_e6 - expected_e6 AS dev_e6,
       ((obs_freq_e6 - expected_e6) * (obs_freq_e6 - expected_e6))
         // expected_e6 AS chi_contrib_e6
FROM e ORDER BY digit
"""


QUERIES: dict[str, Query] = {
    "q_benford_audit": Query(_benford_audit, _BENFORD_SQL,
                             "Benford first-digit audit: 9-key hash "
                             "agg + broadcast total, exact-integer "
                             "chi-square contributions"),
    "q_gap_fill": Query(_gap_fill, _GAP_FILL_SQL,
                        "calendar densification + forward fill over "
                        "a sparsified daily series (spine in the "
                        "scan, provenance-pinned carry)"),
    "q_rolling_distinct": Query(
        _rolling_distinct, hll_rolling_distinct_sql(),
        "7-day rolling distinct users: HLL registers merged by a "
        "range-frame window max (+ exact harness column)"),
    "q_salted_agg": Query(_salted_agg, _SALTED_AGG_SQL,
                          "skew-safe two-phase salted aggregation "
                          "(hot keys spread over 16 reducers; "
                          "exact-equivalence oracle)"),
    "q_attribution": Query(_attribution, _ATTRIBUTION_SQL,
                           "last-touch revenue attribution: bounded-"
                           "lookback as-of credit to the latest prior "
                           "click, exact-cents rollup per campaign"),
    "q_entity_resolution": Query(_entity_resolution,
                                 _ENTITY_RESOLUTION_SQL,
                                 "end-to-end entity resolution: "
                                 "blocked fuzzy pairs → connected "
                                 "components → canonical entity ids "
                                 "for every record"),
    "q_basket_pairs": Query(_basket_pairs, _BASKET_PAIRS_SQL,
                            "market-basket pair mining with lift "
                            "(co-partitioned self-join, min-support "
                            "cut, exact-int lift)"),
    "q_k_anonymity": Query(_k_anonymity, _K_ANONYMITY_SQL,
                           "k-anonymity audit over quasi-identifier "
                           "tuples (privacy release gate)"),
    "q_sketch_percentiles": Query(_sketch_percentiles,
                                  _SKETCH_PERCENTILES_SQL,
                                  "percentiles from a mergeable log2 "
                                  "histogram sketch — no per-group "
                                  "sort, exchange = (group, <=64 "
                                  "buckets)"),
    "q_l_diversity": Query(_l_diversity, _L_DIVERSITY_SQL,
                           "l-diversity audit: QI groups homogeneous "
                           "in the sensitive attribute (k-anonymity's "
                           "blind spot)"),
    "q_t_closeness": Query(_t_closeness, _T_CLOSENESS_SQL,
                           "t-closeness audit: QI groups whose "
                           "sensitive-value distribution diverges "
                           "from the global (integer-ppm EMD over "
                           "ordered bands)"),
    "q_asof_skew_bucketed": Query(_asof_join_bucketed, _ASOF_JOIN_SQL,
                                  "skew-safe bucketed as-of join "
                                  "(per-(key, day) sort groups + "
                                  "boundary carry) vs DuckDB native "
                                  "ASOF"),
    "q_changepoint": Query(_changepoint, _CHANGEPOINT_SQL,
                           "single changepoint per series by binary "
                           "segmentation: argmax SSE-reduction split "
                           "of the daily-cents series, prefix-sums "
                           "only, one exchange on the series key"),
    "q_trend_slopes": Query(_trend_slopes, _TREND_SLOPES_SQL,
                            "per-key OLS trend slope over daily "
                            "counts (exact-int sums, one double "
                            "division)"),
    "q_decayed_activity": Query(_decayed_activity, _DECAYED_ACTIVITY_SQL,
                                "exponential time-decay scoring, "
                                "power-of-two integer decay"),
    "q_rate_limit_schedule": Query(_rate_limit_schedule,
                                   _RATE_LIMIT_SCHEDULE_SQL,
                                   "per-key politeness/rate-limit "
                                   "scheduler: the sequential "
                                   "max(ts, prev+D) recurrence as a "
                                   "max-plus closed form — one sort, "
                                   "two window passes"),
    "q_join_size_estimate": Query(_join_size_estimate,
                                  _join_size_estimate_sql,
                                  "count-sketch (AMS) join-cardinality "
                                  "estimate vs the exact Σ n_a·n_b "
                                  "audit — sizes a shuffle from two "
                                  "d×w sketches before paying for it"),
    "q1_pricing_summary": Query(_pricing_summary, _PRICING_SUMMARY_SQL,
                                "flagship scan→filter→agg"),
    "q_fuzzy_match": Query(_fuzzy_match, _FUZZY_MATCH_SQL,
                           "blocked fuzzy record linkage (Levenshtein "
                           "residual over a typo-dirtied entity column)"),
    "q_activity_streaks": Query(_activity_streaks, _ACTIVITY_STREAKS_SQL,
                                "gaps-and-islands: longest consecutive-"
                                "active-day streak per user"),
    "q_rfm_segments": Query(_rfm_segments, _RFM_SEGMENTS_SQL,
                            "RFM quintile segmentation over purchase "
                            "events (deterministic NTILE ties)"),
    "q_trimmed_mean": Query(_trimmed_mean, _TRIMMED_MEAN_SQL,
                            "10%-trimmed mean per group (robust "
                            "aggregate, exact rank boundaries)"),
    "q_scd2_asof": Query(_scd2_asof, _scd2_asof_sql(),
                         "point-in-time AS OF lookup over the SCD2 "
                         "history (state at the corpus midpoint)"),
    "q_interval_overlap": Query(_interval_overlap, _INTERVAL_OVERLAP_SQL,
                                "interval-overlap self-join via a "
                                "1-hour bucket grid (range x range, "
                                "no nested loop)"),
    "q_scd2_versions": Query(_scd2_versions, _scd2_versions_sql(),
                             "SCD Type-2 history build (effective-"
                             "dated versions from the event log)"),
    "q3_shipping_priority": Query(_shipping_priority, _SHIPPING_PRIORITY_SQL,
                                  "3-way join, top-10"),
    "q5_region_revenue": Query(_region_revenue, _REGION_REVENUE_SQL,
                               "star join through broadcast dims"),
    "q_window_topn": Query(_window_topn, _WINDOW_TOPN_SQL, "per-group top-N"),
    "q_lateral_topk": Query(_lateral_topk, _LATERAL_TOPK_SQL,
                            "correlated LATERAL subquery w/ LIMIT"),
    "q_unpivot": Query(_unpivot, _UNPIVOT_SQL,
                       "UNPIVOT melt to (measure, value) rows"),
    "q_events_retention": Query(_events_retention,
                                _EVENTS_RETENTION_SQL,
                                "cohort retention matrix (exact week "
                                "arithmetic)"),
    "q_events_funnel": Query(_events_funnel, _EVENTS_FUNNEL_SQL,
                             "ordered 3-step funnel (correlated min "
                             "chain, one key partitioning)"),
    "q_ntile_deciles": Query(_ntile_deciles, _NTILE_DECILES_SQL,
                             "NTILE deciles + per-bucket aggregate"),
    "q_window_range_frame": Query(_window_range_frame,
                                  _WINDOW_RANGE_FRAME_SQL,
                                  "value-based RANGE frame "
                                  "(trailing 30-day volume)"),
    "q_window_running": Query(_window_running, _WINDOW_RUNNING_SQL,
                              "running sum, explicit ROWS frame"),
    "q_rollup": Query(_rollup, _ROLLUP_SQL, "rollup subtotals"),
    "q_set_ops": Query(_set_ops, _SET_OPS_SQL, "intersect/except"),
    "q_events_tumbling": Query(_events_tumbling, _EVENTS_TUMBLING_SQL,
                               "tumbling window agg"),
    "q_events_sessions": Query(_events_sessions, _EVENTS_SESSIONS_SQL,
                               "gap sessionization"),
    "q_events_pivot": Query(_events_pivot, _EVENTS_PIVOT_SQL,
                            "pivot, declared domain"),
    "q_asof_join": Query(_asof_join, _ASOF_JOIN_SQL,
                         "as-of join vs native DuckDB ASOF"),
    "q_events_json": Query(_events_json, _EVENTS_JSON_SQL,
                           "JSON prop extraction + agg"),
    "q_event_transitions": Query(_event_transitions,
                                 _EVENT_TRANSITIONS_SQL,
                                 "per-user event-flow transition "
                                 "matrix: lead window + (src,dst) agg "
                                 "+ row-normalized ppm shares"),
    "q_props_keys": Query(_props_keys, _PROPS_KEYS_SQL,
                          "semi-structured schema inventory: per JSON "
                          "key, carrying-count, ppm share, first/last "
                          "event time (schema-drift audit, codegen "
                          "key enumeration)"),
    "q_events_multirollup": Query(_events_multirollup, _EVENTS_MULTIROLLUP_SQL,
                                  "hypertable rollup, 3 tiers, one pass"),
    "q_grouping_sets": Query(_grouping_sets, _GROUPING_SETS_SQL,
                             "grouping sets, shared SQL text"),
    "q_percentiles": Query(_percentiles, _PERCENTILES_SQL,
                           "order statistics + count distinct"),
    "q4_order_priority": Query(_order_priority, _ORDER_PRIORITY_SQL,
                               "correlated EXISTS, decorrelated"),
    "q12_shipmode_classes": Query(_shipmode_classes, _SHIPMODE_CLASSES_SQL,
                                  "conditional CASE aggregation"),
    "q11_having": Query(_having_filter, _HAVING_FILTER_SQL,
                        "HAVING post-aggregate filter"),
    "q9_like_filter": Query(_like_filter, _LIKE_FILTER_SQL,
                            "LIKE predicate + broadcast join"),
    "q16_not_exists": Query(_not_in_anti, _NOT_IN_ANTI_SQL,
                            "NOT EXISTS anti-subquery"),
    "q_skew_profile": Query(_skew_profile, _SKEW_PROFILE_SQL,
                            "key-skew report: top-key ppm share + "
                            "Gini per event type (the measurement "
                            "behind every salting decision)"),
    "q_mad_outliers": Query(_mad_outliers, _MAD_OUTLIERS_SQL,
                            "median/MAD robust outlier census, "
                            "exact order statistics"),
    "q_bitmap_coactivity": Query(_bitmap_coactivity,
                                 _BITMAP_COACTIVITY_SQL,
                                 "bitmap-index audience overlap: "
                                 "bit_or presence maps, popcount "
                                 "AND/OR Jaccard"),
    "q_hierarchy_rollup": Query(_hierarchy_rollup,
                                _HIERARCHY_ROLLUP_SQL,
                                "recursive-CTE hierarchy traversal "
                                "via pointer-jumping closure: depth, "
                                "descendants, subtree rollup"),
    "q_seasonality": Query(_seasonality, _SEASONALITY_SQL,
                           "day-of-week seasonal indices per event "
                           "type (epoch-day dow, exact ppm)"),
    "q_cohort_ltv": Query(_cohort_ltv, _COHORT_LTV_SQL,
                          "cohort LTV curve: first-seen-week cohorts, "
                          "running cumulative revenue per age"),
    "q_abtest_readout": Query(_abtest_readout, _abtest_readout_sql,
                              "deterministic A/B readout: hash "
                              "assignment, conversion ppm, lift, "
                              "two-proportion z"),
}
