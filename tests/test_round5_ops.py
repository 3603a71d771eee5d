"""Round-5 operator tests: hashed classifier inference, DSIR
importance weights, kNN link prediction, banded image near-dup,
Bloom predicate in a lambda, and stateless streaming decontamination."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Row, functions as F

from ethereum_export_pipeline_spark.functions import MERSENNE31
from ethereum_export_pipeline_spark.operators import text as T


def _h32(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % MERSENNE31


# ------------------------------------------- hashed linear classifier

def test_classifier_score_hand_computed(spark):
    w = T.classifier_weights()
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="Foo bar FOO"),
         Row(doc_id=2, text=None),
         Row(doc_id=3, text="")])
    got = {r["doc_id"]: r.asDict()
           for r in T.classifier_score(docs).collect()}
    assert 2 not in got  # NULL text excluded, the tokenize contract
    # empty doc: zero tokens -> logit == bias -> drop
    assert got[3]["n_tokens"] == 0
    assert got[3]["logit_milli"] == T.CLF_BIAS
    assert got[3]["verdict"] == "drop"
    # hand-computed logit: bias + w[h(foo)] * 2 + w[h(bar)]
    exp = (T.CLF_BIAS + 2 * w[_h32("foo") % T.CLF_BUCKETS]
           + w[_h32("bar") % T.CLF_BUCKETS])
    assert got[1]["logit_milli"] == exp
    assert got[1]["n_tokens"] == 3
    assert got[1]["verdict"] == ("keep" if exp > 0 else "drop")


def test_classifier_weights_deterministic_and_bounded(spark):
    w = T.classifier_weights()
    assert w == T.classifier_weights()
    assert len(w) == T.CLF_BUCKETS
    assert all(-500 <= v <= 500 for v in w)


# ----------------------------------------- DSIR importance weights

def test_dsir_scores_and_weights_hand_computed(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, lang="en", text="alpha alpha"),
         Row(doc_id=2, lang="de", text="alpha beta")])
    scores = T.dsir_bucket_scores(docs, "lang = 'en'")
    ba = _h32("alpha") % T.DSIR_BUCKETS
    bb = _h32("beta") % T.DSIR_BUCKETS
    assert ba != bb  # fixture chosen collision-free
    # alpha: 2 target occurrences of 3 total; beta: 0 of 1
    assert scores[ba] == (2 * T.DSIR_SCALE) // 3
    assert scores[bb] == 0
    assert sum(1 for s in scores if s) == 1
    got = {r["doc_id"]: r["dsir_weight_ppm"]
           for r in T.dsir_weights(docs, scores).collect()}
    assert got[1] == 2 * scores[ba]
    assert got[2] == scores[ba]


def test_dsir_uniform_target_scores_scale(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, lang="en", text="x y z"),
         Row(doc_id=2, lang="en", text="p q")])
    scores = T.dsir_bucket_scores(docs, "true")
    assert all(s in (0, T.DSIR_SCALE) for s in scores)
    assert sum(1 for s in scores if s == T.DSIR_SCALE) >= 1


# ------------------------------------------- kNN link prediction

def test_link_prediction_square_predicts_diagonals(spark):
    from ethereum_export_pipeline_spark.operators.graph import (
        link_prediction)
    edges = spark.createDataFrame(
        [Row(src=1, dst=2), Row(src=2, dst=3),
         Row(src=3, dst=4), Row(src=1, dst=4)])
    got = {(r["node_a"], r["node_b"]): r.asDict()
           for r in link_prediction(edges).collect()}
    # the two diagonals, each with both off-corner common neighbors
    assert set(got) == {(1, 3), (2, 4)}
    for k in got:
        assert got[k]["cn"] == 2
        assert got[k]["deg_a"] == 2 and got[k]["deg_b"] == 2
        assert got[k]["jaccard"] == pytest.approx(1.0)


def test_link_prediction_clique_predicts_nothing(spark):
    from ethereum_export_pipeline_spark.operators.graph import (
        link_prediction)
    edges = spark.createDataFrame(
        [Row(src=1, dst=2), Row(src=1, dst=3), Row(src=2, dst=3)])
    assert link_prediction(edges).count() == 0


# ----------------------------------------- banded image near-dup

def _img(rows8x8):
    """Encode an 8x8 RGB image (one aHash grid cell per pixel)."""
    import numpy as np
    from ethereum_export_pipeline_spark.operators.multimodal import (
        encode_netpbm)
    a = np.asarray(rows8x8, dtype=np.uint8)
    return encode_netpbm(np.stack([a, a, a], axis=-1))


def test_ahash_neardup_small_edit_found_far_rejected(spark):
    from ethereum_export_pipeline_spark.operators.multimodal import (
        ahash_neardup_pairs)
    import numpy as np
    black = np.zeros((8, 8), dtype=np.uint8)
    edit = black.copy()
    edit[0, 0] = 255            # flips exactly aHash bit 0 -> hamming 1
    row7 = black.copy()
    row7[7, :] = 255            # flips 8 bits: band-collides on the
    #                             zero bytes but fails the hamming cut
    media = spark.createDataFrame(
        [Row(media_id=1, payload=bytearray(_img(black))),
         Row(media_id=2, payload=bytearray(_img(edit))),
         Row(media_id=3, payload=bytearray(_img(row7)))])
    got = [(r["id_a"], r["id_b"], r["hamming"])
           for r in ahash_neardup_pairs(media).collect()]
    assert got == [(1, 2, 1)]


# ------------------------------------- Bloom predicate in a lambda

def test_bloom_hit_pred_inside_filter_lambda(spark):
    from ethereum_export_pipeline_spark.operators.sketch import (
        bloom_bits, bloom_build, bloom_hit_pred)
    keys = spark.createDataFrame([Row(key=k) for k in
                                  ("foo", "bar", "baz qux")])
    bits = bloom_bits(bloom_build(keys))
    pred = bloom_hit_pred("s", bits)
    probe = spark.createDataFrame(
        [Row(doc_id=1, sh=["foo", "bar", "nothere-1"]),
         Row(doc_id=2, sh=["baz qux"]),
         Row(doc_id=3, sh=["absent-a", "absent-b"])])
    got = {r["doc_id"]: r["hits"] for r in probe.selectExpr(
        "doc_id",
        f"CAST(size(filter(sh, s -> {pred})) AS BIGINT) AS hits")
        .collect()}
    # no false negatives: every member key hits
    assert got[1] >= 2 and got[2] == 1
    # verified-at-write-time absence of false positives on this fixture
    assert got[1] == 2 and got[3] == 0


# --------------------------------- streaming Bloom decontamination

def test_stream_decontaminate_flags_mid_stream(spark, tmp_path):
    from ethereum_export_pipeline_spark.operators.dedup import shingles
    from ethereum_export_pipeline_spark.operators.sketch import (
        bloom_bits, bloom_build)
    from ethereum_export_pipeline_spark.streaming import (
        stream_decontaminate)
    bench_text = "alpha beta gamma delta epsilon"
    docs = spark.createDataFrame(
        [Row(doc_id=0, text=bench_text),            # benchmark doc
         Row(doc_id=1, text="xx " + bench_text),    # contaminated
         Row(doc_id=2, text="totally different words here now"),
         Row(doc_id=3, text="al pha be ta")])       # shares no 3-gram
    path = str(tmp_path / "docs")
    docs.write.parquet(path)
    bench = (shingles(docs.where("doc_id % 97 = 0"))
             .select("shingle").distinct())
    bits = bloom_bits(bloom_build(bench, key_col="shingle"))
    got = {r["doc_id"]: r.asDict()
           for r in stream_decontaminate(spark, path, bits).collect()}
    assert set(got) == {1, 2, 3}   # benchmark doc excluded from stream
    assert got[1]["contaminated"] == 1
    assert got[1]["n_bloom_hits"] >= 3  # the shared shingles all hit
    assert got[2]["contaminated"] == 0
    assert got[3]["contaminated"] == 0
