"""LLM-training-data pipeline operators (SURVEY.md §7 step 11).

Beyond Hudi's own surface: deduplication (exact / MinHash-LSH / SimHash /
n-gram Jaccard / embedding near-dup), similarity search (brute-force cosine
top-k, LSH- and IVF-bucketed ANN), text analysis (language id, quality
scoring, token counting, fingerprinting) and multimodal binary-column
plumbing. Everything is built from Column expressions (JVM-side, whole-stage
codegen) — Python UDFs only appear in the multimodal decode stubs, as
Arrow-batched ``mapInPandas``.

Design notes for 100 TB scale are in each module docstring; the shared
principle: per-row work (shingling, hashing, signatures) is embarrassingly
parallel map-side compute with NO shuffle; the only shuffles are the final
small-key joins (band-hash self-join, centroid top-k), whose shuffle width
is a few dozen bytes per row regardless of document size.
"""

from .quality import (
    GOPHER_DEFAULTS,
    gopher_filter,
    gopher_metrics,
    word_spans,
)
from .text import (
    tokens,
    token_count,
    regex_token_count,
    char_ngrams,
    lang_id,
    LANG_PROFILES,
    quality_score,
    char_entropy,
    fingerprint,
    kmin_fingerprint,
    collapse_repeats,
)
from .dedup import (
    exact_dedup,
    bounded_self_pairs,
    with_minhash,
    minhash_candidate_pairs,
    containment_dedup_pairs,
    jaccard_dedup_pairs, sig_near_pairs, exact_text_pairs,
    line_dedup, edit_dedup_pairs,
    dedup_keep_best,
    with_simhash,
    simhash_sigs,
    simhash_dup_pairs,
    embedding_near_dup_pairs,
    semantic_dedup,
    dedup_spans,
    exact_substring_dedup,
    seen_dedup,
    doc_features,
    min_sig_matches,
    sig_agreement,
    lsh_plan,
    corpus_overlap,
    corpus_overlap_minhash,
    group_sketches, group_distinct_sketch,
    merge_sketches,
    sketch_overlap,
)
from .similarity import (
    dot,
    l2_norm,
    cosine,
    normalize,
    quantize_embeddings,
    int8_topk,
    write_int8_index,
    int8_topk_from_index,
    random_projection,
    brute_force_topk,
    hard_negative_mine,
    hard_negative_mine_ivf,
    lsh_bucket_topk,
    ivf_topk,
    pq_codebooks,
    pq_codebooks_trained,
    pq_encode,
    pq_reconstruct,
    pq_topk,
    pq_topk_rerank,
    write_pq_index,
    write_ivfpq_index,
    ivfpq_topk_from_index,
    append_ivfpq_index,
    knn_classify,
    kmeans_centroids,
    cluster_balanced_sample,
    write_ivf_index,
    ivf_topk_from_index,
    append_ivf_index,
    delete_from_ivf_index,
    compact_ivf_index,
)
from .multimodal import (
    MEDIA_META_SCHEMA,
    attach_media,
    decode_media_meta,
    register_codec,
    resize_media,
    extract_features,
    sample_frames,
)
from .components import duplicate_groups, dedup_by_groups
from .asof import asof_join
from .ranges import range_join
from .sessions import sessionize
from .classifier import (
    hashed_buckets,
    train_hashed_lr,
    score_hashed_lr,
    quality_classifier,
)
from .drift import (
    token_histogram,
    distribution_shift,
    shift_from_counts,
)
from .lm import (
    BigramLM,
    train_bigram_lm,
    bigram_perplexity,
    excess_perplexity_select,
    perplexity_buckets,
)
from .pipeline import (
    redact_pii, pii_hits, deterministic_sample, sample_hash, pack_shards,
    pack_sequences,
    top_ngrams, filter_corpus, word_ngrams, ngram_novelty, contaminated_ids, decontaminate, decontaminate_near,
    stratified_sample, tfidf_terms, tfidf_vectors, corpus_pipeline,
    chunk_documents, unigram_logprob, source_weighted_sample,
    temperature_mix, column_histogram, dsir_logweights, dsir_select,
    epoch_shuffle, corpus_report, domain_mixture_weights,
    leakage_safe_split, token_budget_select, priority_sample, priority_hash,
    weighted_priority_sample, weighted_priority,
)
from .bpe import bpe_train, bpe_encode, bpe_token_count

__all__ = [
    "tokens", "token_count", "regex_token_count", "char_ngrams", "lang_id",
    "LANG_PROFILES", "quality_score", "fingerprint", "kmin_fingerprint",
    "exact_dedup", "with_minhash", "minhash_candidate_pairs",
    "quantize_embeddings", "int8_topk", "write_int8_index", "int8_topk_from_index",
    "jaccard_dedup_pairs", "sig_near_pairs", "exact_text_pairs",
    "line_dedup", "edit_dedup_pairs",
    "dedup_keep_best", "token_budget_select", "priority_sample",
    "weighted_priority_sample", "weighted_priority",
    "priority_hash", "containment_dedup_pairs", "with_simhash", "simhash_sigs",
    "simhash_dup_pairs", "embedding_near_dup_pairs", "dedup_spans",
    "exact_substring_dedup",
    "seen_dedup", "doc_features", "min_sig_matches", "sig_agreement",
    "lsh_plan", "corpus_overlap", "corpus_overlap_minhash", "epoch_shuffle",
    "group_sketches", "group_distinct_sketch", "merge_sketches", "sketch_overlap",
    "bounded_self_pairs",
    "dot", "l2_norm", "cosine", "brute_force_topk", "hard_negative_mine",
    "hard_negative_mine_ivf", "lsh_bucket_topk",
    "append_ivf_index", "delete_from_ivf_index", "compact_ivf_index",
    "append_ivfpq_index",
    "ivf_topk", "pq_codebooks", "pq_codebooks_trained", "pq_encode",
    "pq_reconstruct", "pq_topk", "write_pq_index", "write_ivfpq_index",
    "ivfpq_topk_from_index", "knn_classify", "cluster_balanced_sample",
    "gopher_metrics", "gopher_filter", "word_spans", "GOPHER_DEFAULTS",
    "MEDIA_META_SCHEMA", "attach_media", "decode_media_meta", "sample_frames",
    "register_codec", "resize_media", "extract_features",
    "sessionize",
    "duplicate_groups", "dedup_by_groups",
    "asof_join",
    "range_join",
    "redact_pii", "pii_hits", "deterministic_sample", "sample_hash",
    "pack_shards", "pack_sequences", "top_ngrams", "filter_corpus",
    "word_ngrams", "ngram_novelty", "contaminated_ids", "decontaminate",
    "decontaminate_near", "stratified_sample",
    "corpus_pipeline", "chunk_documents", "unigram_logprob",
    "source_weighted_sample", "temperature_mix", "column_histogram",
    "dsir_logweights", "dsir_select", "corpus_report",
    "domain_mixture_weights", "leakage_safe_split",
    "char_entropy",
    "tfidf_terms", "tfidf_vectors",
    "bpe_train", "bpe_encode", "bpe_token_count",
    "normalize", "random_projection",
    "BigramLM", "train_bigram_lm", "bigram_perplexity",
    "excess_perplexity_select", "perplexity_buckets",
    "hashed_buckets", "train_hashed_lr", "score_hashed_lr",
    "quality_classifier",
    "token_histogram", "distribution_shift", "shift_from_counts",
]
