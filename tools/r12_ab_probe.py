"""Paired in-process A/Bs for optimization round 12 — the two suspect
r11 cadence regressions (VERDICT items: doc_trade_pagerank hybrid
checkpoint cadence, bpe_train lazy words checkpoint) plus the
fuzzy_pairs exact pre-filter candidates (VERDICT item 7).

Alternating ON/OFF plans inside ONE session cancels host drift (the
r11 measurement discipline); min-of-N per side is the comparison
number.  Timed region = plan build + noop execution, matching
bench.py's methodology (eager checkpoints run jobs at BUILD time, so
build must be inside the timer).

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
           python tools/r12_ab_probe.py [pagerank bpe fuzzy]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop_time(build):
    """Time plan build + full noop execution of build()."""
    t0 = time.monotonic()
    build().write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main():
    which = set(sys.argv[1:]) or {"pagerank", "bpe", "fuzzy"}
    from pyspark.sql import functions as F
    from ethereum_export_pipeline_spark.session import get_spark
    spark = get_spark()
    sc = spark.sparkContext

    # ---------------- pagerank: hybrid cadence (NEW, period 8) vs
    # eager every round (OLD, period 1)
    if "pagerank" in which:
        from ethereum_export_pipeline_spark.operators import graph
        from ethereum_export_pipeline_spark.plans import llm

        def pr(period: int):
            old = graph._HIER_CKPT_PERIOD
            graph._HIER_CKPT_PERIOD = period
            try:
                return llm._trade_pagerank(spark, SF_DIR)
            finally:
                graph._HIER_CKPT_PERIOD = old

        sc.setJobDescription("ab:pagerank warm")
        noop_time(lambda: pr(8)); noop_time(lambda: pr(1))
        th, te = [], []
        for i in range(4):
            sc.setJobDescription(f"ab:pagerank hybrid {i}")
            th.append(noop_time(lambda: pr(8)))
            sc.setJobDescription(f"ab:pagerank eager {i}")
            te.append(noop_time(lambda: pr(1)))
        print(f"pagerank hybrid(new,p8): {[round(t,2) for t in th]}"
              f" min {min(th):.2f}")
        print(f"pagerank eager(old,p1):  {[round(t,2) for t in te]}"
              f" min {min(te):.2f}", flush=True)

    # ---------------- bpe_train: lazy words ckpt (NEW) vs eager (OLD)
    if "bpe" in which:
        from ethereum_export_pipeline_spark.operators import text
        from ethereum_export_pipeline_spark.sources.tables import load_table
        docs = load_table(spark, SF_DIR, "documents")

        def bpe(eager: bool):
            old = text._BPE_WORDS_EAGER
            text._BPE_WORDS_EAGER = eager
            try:
                t0 = time.monotonic()
                rows = text.bpe_train(docs).collect()
                return time.monotonic() - t0, tuple(map(tuple, rows))
            finally:
                text._BPE_WORDS_EAGER = old

        sc.setJobDescription("ab:bpe warm")
        _, rows_l = bpe(False); _, rows_e = bpe(True)
        print(f"bpe rows: {'MATCH' if rows_l == rows_e else 'MISMATCH!'}"
              f" ({len(rows_l)} merges)", flush=True)
        tl, te = [], []
        for i in range(4):
            sc.setJobDescription(f"ab:bpe lazy {i}")
            tl.append(bpe(False)[0])
            sc.setJobDescription(f"ab:bpe eager {i}")
            te.append(bpe(True)[0])
        print(f"bpe lazy(new):  {[round(t,2) for t in tl]} min {min(tl):.2f}")
        print(f"bpe eager(old): {[round(t,2) for t in te]} min {min(te):.2f}",
              flush=True)

    # ---------------- fuzzy_pairs: exact pre-filters before the
    # unbounded levenshtein (all sound for max_dist=2:
    # |len_a-len_b| <= dist; char-histogram L1 <= 2*dist)
    if "fuzzy" in which:
        from ethereum_export_pipeline_spark.plans.analytics import (
            _dirty_parts, _BLOCK)

        HIST = ("transform(sequence(97, 122), c -> "
                "length(_name) - length(replace(_name, char(c), '')))")

        def fuzzy_frame(lenf: bool, hist: bool):
            df = _dirty_parts(spark, SF_DIR)
            base = (df.where(F.col("name").isNotNull())
                      .select(F.col("id").alias("_id"),
                              F.col("name").alias("_name"),
                              F.expr(_BLOCK).alias("_blk"))
                      .where(F.col("_blk").isNotNull()))
            small = (base.groupBy("_blk").agg(F.count(F.lit(1)).alias("_c"))
                         .where(F.col("_c") <= 10_000).select("_blk"))
            base = base.join(small, "_blk", "left_semi")
            if hist:
                base = base.withColumn("_h", F.expr(HIST))
            a = base.select("_blk", F.col("_id").alias("id_a"),
                            F.col("_name").alias("name_a"),
                            *([F.col("_h").alias("_ha")] if hist else []))
            b = base.select("_blk", F.col("_id").alias("id_b"),
                            F.col("_name").alias("name_b"),
                            *([F.col("_h").alias("_hb")] if hist else []))
            j = a.join(b, "_blk").where(F.col("id_a") < F.col("id_b"))
            if lenf:
                j = j.where(F.abs(F.length("name_a")
                                  - F.length("name_b")) <= 2)
            if hist:
                j = j.where(F.expr(
                    "aggregate(zip_with(_ha, _hb, (x, y) -> abs(x - y)), "
                    "0, (acc, v) -> acc + v) <= 4"))
            return (j.withColumn("dist",
                                 F.levenshtein("name_a", "name_b")
                                  .cast("long"))
                     .where((F.col("dist") >= 1) & (F.col("dist") <= 2))
                     .select("id_a", "id_b", "name_a", "name_b", "dist"))

        n0 = fuzzy_frame(False, False).count()
        for lenf, hist, tag in ((True, False, "len"), (False, True, "hist"),
                                (True, True, "len+hist")):
            n = fuzzy_frame(lenf, hist).count()
            print(f"fuzzy rows {tag}: {n} vs {n0} "
                  f"{'MATCH' if n == n0 else 'MISMATCH!'}", flush=True)
        sc.setJobDescription("ab:fuzzy warm")
        for v in ((False, False), (True, False), (False, True), (True, True)):
            noop_time(lambda: fuzzy_frame(*v))
        res = {t: [] for t in ("cur", "len", "hist", "len+hist")}
        for i in range(4):
            for (lenf, hist, tag) in ((False, False, "cur"),
                                      (True, False, "len"),
                                      (False, True, "hist"),
                                      (True, True, "len+hist")):
                sc.setJobDescription(f"ab:fuzzy {tag} {i}")
                res[tag].append(noop_time(lambda: fuzzy_frame(lenf, hist)))
        for tag, ts in res.items():
            print(f"fuzzy {tag}: {[round(t,2) for t in ts]}"
                  f" min {min(ts):.2f}", flush=True)


if __name__ == "__main__":
    main()
