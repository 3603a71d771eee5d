"""Graph analytics for corpus curation: authority scoring over an
edge list (the web-crawl-curation use: weight sources/hosts by how
central they are in a sharing/link graph before sampling a training
mix; the same shape serves address-graph analysis over the exported
chain tables).

`pagerank_exact` is PageRank in FIXED-POINT INTEGER arithmetic:
every step is integer multiply / truncating divide on BIGINTs, so the
result is bit-identical on any engine with floor division for
non-negative ints (Spark `div`, DuckDB `//`) — the catalog can
hash-compare a 5-iteration run against an unrolled-CTE DuckDB twin,
which float PageRank never could (float sum order flaps the hash).

Scale notes: the per-iteration plan is the Pregel step expressed
relationally — contributions = edges ⋈ ranks (shuffle on src, the
edge list's natural key) then a hash agg on dst; exchange per round
is bounded by |E| + |V| regardless of iteration count. The loop
follows connected_components' iteration discipline exactly: the edge
list (referenced every round, its lineage the whole upstream
candidate pipeline) is materialized ONCE up front; ranks are
checkpointed per `checkpoint_every` iterations (default every round —
without it the k-deep lazy plan re-executes the edge derivation once
per reference); the iteration's shuffle width is clamped to the
pruned graph's size, not the session default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PR_SCALE = 1_000_000_000  # ranks are integers scaled by 1e9


def pagerank_exact(edges: DataFrame, iters: int = 5,
                   scale: int = PR_SCALE,
                   src: str = "src", dst: str = "dst",
                   damping_pct: int = 85,
                   checkpoint_every: int | None = 1) -> DataFrame:
    """Fixed-point PageRank over a directed edge list. Returns
    (node, rank) with rank ≈ PageRank · `scale`, exact integers.

    r_0(v)   = scale // n
    r_{k+1}(v) = (100-d)·(scale // n) // 100
               + d · Σ_{u→v} (r_k(u) // deg(u)) // 100

    Truncating division everywhere; all values non-negative, so
    Spark's `div` and DuckDB's `//` agree bit-for-bit. Dangling
    targets (no in-edges) receive only the teleport term; nodes are
    the union of both edge endpoints."""
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
              .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
              .distinct()
              .localCheckpoint(eager=True))  # referenced every round
    n_edges = e.count()
    nodes = (e.select(F.col("src").alias("node"))
              .union(e.select(F.col("dst").alias("node"))).distinct()
              .localCheckpoint(eager=True))
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0).cast("long"))
    sess = edges.sparkSession
    old_width = sess.conf.get("spark.sql.shuffle.partitions")
    if n_edges < 1_000_000 and str(old_width).isdigit():
        sess.conf.set("spark.sql.shuffle.partitions",
                      str(min(4, int(old_width))))
    try:
        deg = (e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
                .localCheckpoint(eager=True))
        base = scale // n
        teleport = ((100 - damping_pct) * base) // 100
        r = nodes.withColumn("r", F.lit(base).cast("long"))
        for k in range(iters):
            contrib = (e.join(r, e.src == r.node)
                        .join(deg, "src")
                        .select(F.col("dst").alias("node"),
                                F.expr("r div deg").alias("c"))
                        .groupBy("node")
                        .agg(F.expr("CAST(sum(c) AS BIGINT)").alias("c")))
            r = (nodes.join(contrib, "node", "left")
                      .select("node",
                              F.expr(f"CAST({teleport} + ({damping_pct} * "
                                     f"coalesce(c, CAST(0 AS BIGINT))) div 100 "
                                     f"AS BIGINT)").alias("r")))
            if checkpoint_every and (k + 1) % checkpoint_every == 0:
                r = r.localCheckpoint(eager=True)
    finally:
        sess.conf.set("spark.sql.shuffle.partitions", old_width)
    return r.select("node", F.col("r").alias("rank"))
