"""Scale smoke: amplify the sf0.1 corpus N× into /tmp (fresh ids, so
dedup/join cardinalities grow honestly) and run the heaviest operators
— the empirical check behind SCALE.md's extrapolations. Prints one
JSON line with row counts and per-op seconds."""

from __future__ import annotations

import json
import sys
import time

AMPLIFY = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SF_DIR = "/root/testdata/sf0.1"


def main() -> int:
    import tempfile

    from pyspark.sql import functions as F

    sys.path.insert(0, ".")
    from ethereum_export_pipeline_spark.operators import dedup, similarity, text
    from ethereum_export_pipeline_spark.session import get_spark

    spark = get_spark("scale_smoke")
    out = tempfile.mkdtemp(prefix="spark_graft_scale_")

    # documents ×N with distinct ids AND per-copy Caesar-shifted vocab:
    # copies share no shingles with each other, so document density
    # (near-dup structure, shingle document-frequency profile) matches
    # the original corpus — the honest way to amplify for dedup ops
    # (a naive suffix perturbation makes every copy a near-dup of its
    # original: candidate pairs grow N², which is output, not overhead)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    copies = spark.range(AMPLIFY).select(F.col("id").alias("copy"))
    alpha = "abcdefghijklmnopqrstuvwxyz"
    variants = F.array(*[
        F.translate("text", alpha, alpha[c % 26:] + alpha[:c % 26])
        for c in range(AMPLIFY)])
    big_docs = (docs.crossJoin(copies)
                    .select((F.col("doc_id") + F.col("copy") * n_docs).alias("doc_id"),
                            F.element_at(variants,
                                         F.col("copy").cast("int") + 1).alias("text")))
    big_docs.write.mode("overwrite").parquet(f"{out}/documents")
    big_docs = spark.read.parquet(f"{out}/documents")

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    n_li = li.count()
    big_li = (li.crossJoin(copies)
                .withColumn("l_orderkey",
                            F.col("l_orderkey") + F.col("copy") * 200_000)
                .drop("copy"))
    big_li.write.mode("overwrite").parquet(f"{out}/lineitem")
    big_li = spark.read.parquet(f"{out}/lineitem")

    def bench(label, frame):
        t0 = time.time()
        frame.write.mode("overwrite").format("noop").save()
        return label, round(time.time() - t0, 2)

    results = dict([
        bench("q1_agg_6m_rows", big_li.groupBy("l_returnflag", "l_linestatus")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.expr("CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)")
                    .alias("cents"))),
        bench("dedup_exact_50k_docs", dedup.dedup_exact(big_docs)),
        bench("ngram_pairs_50k_docs", dedup.ngram_jaccard_pairs(big_docs)),
        bench("minhash_pairs_50k_docs", dedup.minhash_lsh_pairs(big_docs)),
        bench("simhash_pairs_50k_docs", dedup.simhash_pairs(big_docs)),
        bench("quality_50k_docs", text.quality_score(big_docs)),
    ])
    print(json.dumps({"amplify": AMPLIFY, "docs": n_docs * AMPLIFY,
                      "lineitem": n_li * AMPLIFY, "secs": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
