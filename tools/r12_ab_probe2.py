"""Paired in-process A/B #2 for optimization round 12: the bm25
restructure (map-side dl + merged N/T scalar subtree) and the shared
shingle-index checkpoint in the minhash LSH / incremental-neardup /
estimator-quality paths.

"new" = the working-tree operators; "old" = the r11 forms inlined
below (copied from git HEAD so both plans alternate in ONE session —
paired minima cancel host drift).  Equality of results is asserted
before timing.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
           python tools/r12_ab_probe2.py [bm25 minhash incr quality]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop_time(build):
    t0 = time.monotonic()
    build().write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def ab(sc, tag, new_build, old_build, n=int(os.environ.get("SPARK_GRAFT_AB_N", "4")), check=None):
    if check:
        check()
    sc.setJobDescription(f"ab:{tag} warm")
    noop_time(new_build); noop_time(old_build)
    tn, to = [], []
    for i in range(n):
        sc.setJobDescription(f"ab:{tag} new {i}")
        tn.append(noop_time(new_build))
        sc.setJobDescription(f"ab:{tag} old {i}")
        to.append(noop_time(old_build))
    print(f"{tag} new: {[round(t,2) for t in tn]} min {min(tn):.2f}")
    print(f"{tag} old: {[round(t,2) for t in to]} min {min(to):.2f}",
          flush=True)


def main():
    which = set(sys.argv[1:]) or {"bm25", "minhash", "incr", "quality"}
    from pyspark.sql import functions as F, Window
    from ethereum_export_pipeline_spark.session import get_spark
    from ethereum_export_pipeline_spark.sources.tables import load_table
    from ethereum_export_pipeline_spark.operators import dedup, text
    from ethereum_export_pipeline_spark.operators.text import (
        _spread, BM25_TOPK, BM25_QTERMS)
    from ethereum_export_pipeline_spark.functions import tokens
    spark = get_spark()
    sc = spark.sparkContext
    docs = load_table(spark, SF_DIR, "documents")

    # SPARK_GRAFT_AB_AMPLIFY=N: amplify the corpus N× with fresh ids
    # (the scale_smoke recipe), write to /tmp parquet and re-read, so
    # the A/B pairs run at ×N scale INTERLEAVED in one session —
    # sequential scale_smoke runs minutes apart flip signs under this
    # host's co-tenant drift.
    amp = int(os.environ.get("SPARK_GRAFT_AB_AMPLIFY", "1"))
    if amp > 1:
        import tempfile
        out = tempfile.mkdtemp(prefix="spark_graft_ab_amp_")
        copies = spark.range(amp).withColumnRenamed("id", "copy")
        n_docs0 = docs.count()
        big = (docs.crossJoin(copies)
                   .withColumn("doc_id",
                               F.col("doc_id") + F.col("copy") * n_docs0)
                   .drop("copy"))
        big.write.mode("overwrite").parquet(f"{out}/documents")
        docs = spark.read.parquet(f"{out}/documents")
        print(f"amplified docs x{amp}: {docs.count()} rows", flush=True)

    # ---------------- bm25: old r11 form, inlined from git HEAD
    def bm25_old(df, id_col="doc_id", text_col="text", k=BM25_TOPK,
                 n_query_terms=BM25_QTERMS):
        tf = (_spread(df.where(F.col(text_col).isNotNull()))
                .select(F.col(id_col),
                        F.explode(tokens(text_col)).alias("term"))
                .groupBy(id_col, "term")
                .agg(F.count(F.lit(1)).alias("tf")))
        n_docs = (df.where(F.col(text_col).isNotNull())
                    .agg(F.count(F.lit(1)).cast("long").alias("n")))
        stats = (tf.withColumn("df", F.count(F.lit(1)).over(
                     Window.partitionBy("term")).cast("long"))
                   .withColumn("dl", F.sum("tf").over(
                     Window.partitionBy(id_col)).cast("long")))
        totals = tf.agg(F.sum("tf").cast("long").alias("t_tokens"))
        qterms = (stats.select("term", "df").distinct()
                       .withColumn("_qr", F.row_number().over(
                           Window.orderBy(F.col("df").desc(),
                                          F.col("term").asc())))
                       .where(F.col("_qr") <= n_query_terms)
                       .select("term"))
        scored = (stats.join(F.broadcast(qterms), "term")
                       .crossJoin(F.broadcast(totals))
                       .crossJoin(F.broadcast(n_docs))
                       .withColumn("sat_ppm", F.expr(
                           "(44 * tf * t_tokens * 1000000) div "
                           "(20 * t_tokens * tf + 6 * t_tokens "
                           "+ 18 * dl * n)"))
                       .withColumn("contrib",
                                   F.expr("(sat_ppm * n) div df")))
        agg = (scored.groupBy(id_col)
                     .agg(F.count(F.lit(1)).cast("long")
                           .alias("n_hit_terms"),
                          F.max("dl").alias("dl"),
                          F.expr("CAST(sum(contrib) AS BIGINT)")
                           .alias("score")))
        top = agg.orderBy(F.col("score").desc(), F.col(id_col).asc()) \
                 .limit(k)
        w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
        return top.withColumn("rank",
                              F.row_number().over(w).cast("long"))

    if "bm25" in which:
        def chk():
            a = sorted(map(tuple, text.bm25_topk(docs).collect()))
            b = sorted(map(tuple, bm25_old(docs).collect()))
            print(f"bm25 rows: {'MATCH' if a == b else 'MISMATCH!'}"
                  f" ({len(a)})", flush=True)
        ab(sc, "bm25", lambda: text.bm25_topk(docs),
           lambda: bm25_old(docs), check=chk if amp == 1 else None)

    # ---------------- minhash_lsh_pairs: old = per-consumer tokenize
    def lsh_pairs_old(df, id_col="doc_id", text_col="text",
                      threshold=0.5, n=dedup.NGRAM_N):
        from ethereum_export_pipeline_spark.operators.similarity import (
            _ensure_scan_width)
        df = _ensure_scan_width(
            df.select(id_col, text_col),
            df.sparkSession.sparkContext.defaultParallelism)
        sig = dedup._signatures_from_shingles(
            dedup.shingles(df, id_col, text_col, n), id_col)
        melted = dedup._banded_buckets(sig, id_col)
        l = melted.select(F.col(id_col).alias("doc_a"), "bucket")
        r = melted.select(F.col(id_col).alias("doc_b"), "bucket")
        cand = (l.join(r, "bucket").where(F.col("doc_a") < F.col("doc_b"))
                 .select("doc_a", "doc_b").distinct())
        sh = dedup._sized_shingles(df, id_col, text_col, n,
                                   max_shingle_df=None)
        a = sh.select(F.col(id_col).alias("doc_a"), "shingle",
                      F.col("sz").alias("sz_a"))
        b = sh.select(F.col(id_col).alias("doc_b"), "shingle",
                      F.col("sz").alias("sz_b"))
        inter = (
            a.join(cand.select("doc_a").distinct(), "doc_a", "left_semi")
             .join(b.join(cand.select("doc_b").distinct(), "doc_b",
                          "left_semi"), "shingle")
             .join(cand, ["doc_a", "doc_b"], "left_semi")
             .groupBy("doc_a", "doc_b", "sz_a", "sz_b")
             .agg(F.count(F.lit(1)).alias("n_common")))
        return dedup._jaccard_from_pairs(inter, threshold)

    # crawl-manifest shape: the corpus side is ALREADY an eagerly
    # checkpointed frame (the stripped crawl text) — the shape where
    # the shared-index checkpoint competes with cheap re-reads of a
    # materialized base rather than with parquet+tokenize re-scans
    if "crawlish" in which:
        base = (docs.select("doc_id", "text")
                    .localCheckpoint(eager=True))
        ab(sc, "crawlish", lambda: dedup.minhash_lsh_pairs(base),
           lambda: lsh_pairs_old(base), n=5)

    if "minhash" in which:
        def chk():
            a = sorted(map(tuple, dedup.minhash_lsh_pairs(docs).collect()))
            b = sorted(map(tuple, lsh_pairs_old(docs).collect()))
            print(f"minhash rows: {'MATCH' if a == b else 'MISMATCH!'}"
                  f" ({len(a)})", flush=True)
        ab(sc, "minhash", lambda: dedup.minhash_lsh_pairs(docs),
           lambda: lsh_pairs_old(docs), check=chk if amp == 1 else None)

    # ---------------- incremental_neardup: old = per-consumer tokenize
    def incr_old(new_df, seen_df, id_col="doc_id", text_col="text",
                 threshold=0.5, n=dedup.NGRAM_N):
        from ethereum_export_pipeline_spark.operators.similarity import (
            _ensure_scan_width)
        par = new_df.sparkSession.sparkContext.defaultParallelism
        new_s = _ensure_scan_width(new_df.select(id_col, text_col), par)
        seen_s = _ensure_scan_width(seen_df.select(id_col, text_col), par)
        mn = (dedup._banded_buckets(dedup._signatures_from_shingles(
                  dedup.shingles(new_s, id_col, text_col, n), id_col),
                  id_col)
              .select(F.col(id_col).alias("new_id"), "bucket"))
        ms = (dedup._banded_buckets(dedup._signatures_from_shingles(
                  dedup.shingles(seen_s, id_col, text_col, n), id_col),
                  id_col)
              .select(F.col(id_col).alias("seen_id"), "bucket"))
        cand = (mn.join(ms, "bucket")
                  .select("new_id", "seen_id").distinct())
        sh_new = dedup._sized_shingles(new_s, id_col, text_col, n,
                                       max_shingle_df=None)
        sh_seen = dedup._sized_shingles(seen_s, id_col, text_col, n,
                                        max_shingle_df=None)
        a = (sh_new.select(F.col(id_col).alias("new_id"), "shingle",
                           F.col("sz").alias("sz_a"))
                   .join(cand.select("new_id").distinct(), "new_id",
                         "left_semi"))
        b = (sh_seen.select(F.col(id_col).alias("seen_id"), "shingle",
                            F.col("sz").alias("sz_b"))
                    .join(cand.select("seen_id").distinct(), "seen_id",
                          "left_semi"))
        inter = (a.join(b, "shingle")
                  .join(cand, ["new_id", "seen_id"], "left_semi")
                  .groupBy("new_id", "seen_id", "sz_a", "sz_b")
                  .agg(F.count(F.lit(1)).cast("long").alias("n_common")))
        jac = (inter.withColumn(
            "jaccard",
            (F.col("n_common")
             / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")))
            .cast("double"))
            .where(F.col("jaccard") >= threshold))
        w = (Window.partitionBy("new_id")
                   .orderBy(F.col("jaccard").desc(),
                            F.col("seen_id").asc()))
        best = (jac.withColumn("__rn", F.row_number().over(w))
                   .where(F.col("__rn") == 1)
                   .select("new_id",
                           F.col("seen_id").alias("matched_seen"),
                           "n_common", "jaccard"))
        return (new_df.select(F.col(id_col))
                .join(best, F.col(id_col) == F.col("new_id"), "left")
                .select(id_col,
                        F.expr("CAST(matched_seen IS NOT NULL AS BIGINT)")
                         .alias("is_dup"),
                        F.col("matched_seen").cast("long")
                         .alias("matched_seen"),
                        "n_common", "jaccard"))

    if "incr" in which:
        from ethereum_export_pipeline_spark.plans.llm import NEW_BATCH_PRED
        new_b = docs.where(NEW_BATCH_PRED)
        seen_b = docs.where(f"NOT ({NEW_BATCH_PRED})")

        def chk():
            a = sorted(map(tuple,
                           dedup.incremental_neardup(new_b, seen_b,
                                                     threshold=0.5)
                           .collect()))
            b = sorted(map(tuple, incr_old(new_b, seen_b).collect()))
            print(f"incr rows: {'MATCH' if a == b else 'MISMATCH!'}"
                  f" ({len(a)})", flush=True)
        ab(sc, "incr",
           lambda: dedup.incremental_neardup(new_b, seen_b, threshold=0.5),
           lambda: incr_old(new_b, seen_b), check=chk if amp == 1 else None)

    # ---------------- estimator quality (pairs passed, as the catalog
    # does): old = separate sz/sig tokenize passes
    def quality_old(df, pairs, id_col="doc_id", text_col="text",
                    n=dedup.NGRAM_N):
        from ethereum_export_pipeline_spark.operators.similarity import (
            _ensure_scan_width)
        df = _ensure_scan_width(
            df.select(id_col, text_col),
            df.sparkSession.sparkContext.defaultParallelism)
        sz = (dedup.shingles(df, id_col, text_col, n)
              .groupBy(id_col).agg(F.count(F.lit(1)).alias("sz")))
        pairs = (pairs
                 .join(sz.select(F.col(id_col).alias("doc_a"),
                                 F.col("sz").alias("sz_a")), "doc_a")
                 .join(sz.select(F.col(id_col).alias("doc_b"),
                                 F.col("sz").alias("sz_b")), "doc_b"))
        sig = dedup._signatures_from_shingles(
            dedup.shingles(df, id_col, text_col, n), id_col)
        k = dedup.MINHASH_K
        sa = sig.select(F.col(id_col).alias("doc_a"),
                        *[F.col(f"m{i}").alias(f"a{i}") for i in range(k)])
        sb = sig.select(F.col(id_col).alias("doc_b"),
                        *[F.col(f"m{i}").alias(f"b{i}") for i in range(k)])
        matches = sum(
            F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
            for i in range(k))
        return (pairs.join(sa, "doc_a").join(sb, "doc_b")
                     .withColumn("sig_matches", matches.cast("long"))
                     .withColumn("est_jaccard_ppm",
                                 F.expr(f"sig_matches * 1000000 div {k}"))
                     .withColumn("exact_jaccard_ppm",
                                 F.expr("n_common * 1000000 div "
                                        "(sz_a + sz_b - n_common)"))
                     .select("doc_a", "doc_b", "sig_matches",
                             "est_jaccard_ppm", "exact_jaccard_ppm",
                             F.expr("est_jaccard_ppm - exact_jaccard_ppm")
                              .alias("err_ppm")))

    if "quality" in which:
        from ethereum_export_pipeline_spark.plans import llm
        pairs = llm._lsh_pairs(spark, SF_DIR)

        def chk():
            a = sorted(map(tuple,
                           dedup.minhash_estimator_quality(
                               docs, pairs=pairs).collect()))
            b = sorted(map(tuple, quality_old(docs, pairs).collect()))
            print(f"quality rows: {'MATCH' if a == b else 'MISMATCH!'}"
                  f" ({len(a)})", flush=True)
        ab(sc, "quality",
           lambda: dedup.minhash_estimator_quality(docs, pairs=pairs),
           lambda: quality_old(docs, pairs), check=chk if amp == 1 else None)


if __name__ == "__main__":
    main()
