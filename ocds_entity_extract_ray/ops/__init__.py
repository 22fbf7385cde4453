"""Generalized operator surface — one import point for every data-
processing operator the engine adds beyond the reference's KG pipeline."""

from .agg import bucketed_map_groups, grouped_agg
from .asof import asof_join
from .dedup import (
    contamination_counts,
    exact_dedup,
    exact_dup_groups,
    fingerprint_overlap_pairs,
    minhash_lsh_pairs,
    ngram_jaccard,
    ngram_jaccard_pairs,
    simhash_dup_pairs,
)
from .graph import connected_components, pagerank, pagerank_sql
from .joins import (
    broadcast_hash_join,
    default_join_partitions,
    hash_join,
    semi_join_filter,
)
from .multimodal import featurize_images, resize_images, sample_frames, transcribe_audio
from .quantiles import approx_quantiles
from .robots import evaluate_robots, parse_robots_txt
from .rangejoin import range_join
from .sampling import assign_splits, hash_sample, stratified_hash_sample, temperature_targets
from .scan import pack_documents
from .streaming import windowed_ingest_tick, windowed_state
from .vp8l import decode_webp, encode_webp_lossless
from .similarity import (
    cosine_topk,
    embedding_near_dup_pairs,
    ivf_topk,
    ivf_topk_int,
    lsh_bucketed_topk,
)
from .sketches import (
    approx_count_distinct,
    bloom_build,
    bloom_contains,
    bloom_semi_filter,
    heavy_hitters,
)
from .textstats import (
    add_langid,
    bigram_lm_scores,
    add_repetition_stats,
    add_simhash,
    add_text_stats,
    detect_lang,
    quality_stats,
    repetition_stats,
    salient_terms,
    simhash64,
    token_count,
    winnowing_fingerprints,
)
from .windows import sessionize, tumbling_window_agg

__all__ = [
    "assign_splits",
    "contamination_counts",
    "add_langid",
    "bigram_lm_scores",
    "add_repetition_stats",
    "add_simhash",
    "add_text_stats",
    "approx_count_distinct",
    "approx_quantiles",
    "bloom_build",
    "bloom_contains",
    "bloom_semi_filter",
    "asof_join",
    "broadcast_hash_join",
    "bucketed_map_groups",
    "connected_components",
    "pagerank",
    "pagerank_sql",
    "cosine_topk",
    "default_join_partitions",
    "detect_lang",
    "embedding_near_dup_pairs",
    "exact_dedup",
    "exact_dup_groups",
    "fingerprint_overlap_pairs",
    "featurize_images",
    "grouped_agg",
    "hash_join",
    "hash_sample",
    "heavy_hitters",
    "ivf_topk",
    "ivf_topk_int",
    "lsh_bucketed_topk",
    "minhash_lsh_pairs",
    "ngram_jaccard",
    "ngram_jaccard_pairs",
    "pack_documents",
    "quality_stats",
    "range_join",
    "resize_images",
    "repetition_stats",
    "salient_terms",
    "sample_frames",
    "semi_join_filter",
    "sessionize",
    "simhash64",
    "simhash_dup_pairs",
    "parse_robots_txt",
    "evaluate_robots",
    "windowed_ingest_tick",
    "windowed_state",
    "decode_webp",
    "encode_webp_lossless",
    "stratified_hash_sample",
    "temperature_targets",
    "token_count",
    "transcribe_audio",
    "tumbling_window_agg",
    "winnowing_fingerprints",
]
