"""Paired in-process A/B for the two rows still elevated in every r11
bench attempt: artifact:fuzzy_pairs (banded levenshtein change) and
mm_audio_resample (scan-width spread). Alternating ON/OFF plans inside
ONE session cancels host drift (the round's measurement discipline);
min-of-N per side is the comparison number.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/r11_ab_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop_time(df):
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main():
    from pyspark.sql import functions as F
    from ethereum_export_pipeline_spark.session import get_spark
    spark = get_spark()
    sc = spark.sparkContext

    # ---------------- fuzzy: bounded+lenfilter (NEW) vs unbounded (OLD)
    from ethereum_export_pipeline_spark.plans.analytics import (
        _dirty_parts, _BLOCK)

    def fuzzy_frame(bounded: bool):
        df = _dirty_parts(spark, SF_DIR)
        base = (df.where(F.col("name").isNotNull())
                  .select(F.col("id").alias("_id"),
                          F.col("name").alias("_name"),
                          F.expr(_BLOCK).alias("_blk"))
                  .where(F.col("_blk").isNotNull()))
        small = (base.groupBy("_blk").agg(F.count(F.lit(1)).alias("_c"))
                     .where(F.col("_c") <= 10_000).select("_blk"))
        base = base.join(small, "_blk", "left_semi")
        a = base.select("_blk", F.col("_id").alias("id_a"),
                        F.col("_name").alias("name_a"))
        b = base.select("_blk", F.col("_id").alias("id_b"),
                        F.col("_name").alias("name_b"))
        j = a.join(b, "_blk").where(F.col("id_a") < F.col("id_b"))
        if bounded:
            j = j.where(F.abs(F.length("name_a") - F.length("name_b")) <= 2)
            dist = F.levenshtein("name_a", "name_b", 2).cast("long")
        else:
            dist = F.levenshtein("name_a", "name_b").cast("long")
        return (j.withColumn("dist", dist)
                 .where((F.col("dist") >= 1) & (F.col("dist") <= 2))
                 .select("id_a", "id_b", "name_a", "name_b", "dist"))

    # equality guard first (cheap at sf0.01-scale counts)
    n_new = fuzzy_frame(True).count()
    n_old = fuzzy_frame(False).count()
    print(f"fuzzy rows: bounded={n_new} unbounded={n_old} "
          f"{'MATCH' if n_new == n_old else 'MISMATCH!'}", flush=True)

    sc.setJobDescription("ab:fuzzy warm")
    noop_time(fuzzy_frame(True)); noop_time(fuzzy_frame(False))
    tb, tu = [], []
    for i in range(4):
        sc.setJobDescription(f"ab:fuzzy bounded {i}")
        tb.append(noop_time(fuzzy_frame(True)))
        sc.setJobDescription(f"ab:fuzzy unbounded {i}")
        tu.append(noop_time(fuzzy_frame(False)))
    print(f"fuzzy bounded(new): {[round(t,2) for t in tb]} min {min(tb):.2f}")
    print(f"fuzzy unbounded(old): {[round(t,2) for t in tu]} min {min(tu):.2f}",
          flush=True)

    # ---------------- mm_audio_resample: spread ON vs OFF
    from ethereum_export_pipeline_spark.plans.llm import (
        _audio_resample)

    def audio_frame(spread: bool):
        os.environ["SPARK_GRAFT_SPREAD"] = "1" if spread else "0"
        try:
            return _audio_resample(spark, SF_DIR)
        finally:
            os.environ.pop("SPARK_GRAFT_SPREAD", None)

    sc.setJobDescription("ab:audio warm")
    noop_time(audio_frame(True)); noop_time(audio_frame(False))
    ton, toff = [], []
    for i in range(4):
        sc.setJobDescription(f"ab:audio spread-on {i}")
        ton.append(noop_time(audio_frame(True)))
        sc.setJobDescription(f"ab:audio spread-off {i}")
        toff.append(noop_time(audio_frame(False)))
    print(f"audio spread ON:  {[round(t,2) for t in ton]} min {min(ton):.2f}")
    print(f"audio spread OFF: {[round(t,2) for t in toff]} min {min(toff):.2f}",
          flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
