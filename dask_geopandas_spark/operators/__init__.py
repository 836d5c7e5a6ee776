"""Operator namespace: spatial operators (sjoin/clip/dissolve/explode)
plus the LLM-training-data pipeline suite (dedup, similarity, text
quality, multimodal plumbing).  Everything re-exported here is covered
by a driver query in __spark_entry__.py and the pytest suite."""

from .clip import clip
from .dedup import (
    cluster_dedup,
    connected_components,
    contaminated_spans,
    decontaminate_spans,
    dedup_against_index,
    dedup_exact_against_index,
    dedup_lines_within_doc,
    duplicated_spans,
    embedding_neardup_pairs,
    exact_dedup,
    exact_index_matches,
    line_dedup,
    lsh_candidate_pairs,
    lsh_dedup,
    minhash_index_matches,
    minhash_signatures,
    ngram_jaccard_pairs,
    compact_index,
    release_cached_signatures,
    remove_duplicated_spans,
    simhash,
    write_exact_index,
    write_minhash_index,
)
from .dissolve import dissolve
from .explode import explode_geometry
from .html import (extract_blocks, extract_text, html_blocks,
                   html_escape, html_to_text)
from .multimodal import (media_dedup, media_dhash, media_manifest,
                         media_neardup_pairs, sniff_modality)
from .sampling import (cap_per_group, chunk_documents, hash_sample,
                       oversample, pack_documents, shard_assignment,
                       shard_key, split_by_cluster, weighted_sample,
                       write_training_shards)
from .similarity import (
    brute_force_topk,
    ivf_topk,
    ivf_topk_stored,
    knn_graph,
    release_cached_salt_inputs,
    semantic_dedup,
    train_centroids,
    train_pq,
    write_ivf_index,
)
from .overlay import overlay
from .sjoin import sjoin
from .textstats import (
    blocklist_filter,
    blocklist_hits,
    bm25_batch_topk,
    bm25_batch_topk_stored,
    bm25_topk,
    bm25_topk_stored,
    classifier_score,
    canonicalize_url,
    clean_text,
    url_dedup,
    fingerprint,
    lang_id,
    ngram_logprob,
    pii_counts,
    code_signals,
    quality_score,
    redact_pii,
    repetition_signals,
    tfidf_top_terms,
    token_count,
    top_ngram_fraction,
    vocab_topk,
    write_text_index,
)

__all__ = [
    "clip", "dissolve", "explode_geometry", "overlay", "sjoin",
    "exact_dedup", "minhash_signatures", "lsh_candidate_pairs",
    "lsh_dedup", "ngram_jaccard_pairs", "simhash",
    "release_cached_signatures",
    "embedding_neardup_pairs",
    "connected_components", "cluster_dedup",
    "line_dedup", "dedup_lines_within_doc",
    "duplicated_spans", "remove_duplicated_spans",
    "contaminated_spans", "decontaminate_spans",
    "write_minhash_index", "minhash_index_matches", "dedup_against_index",
    "write_exact_index", "exact_index_matches", "dedup_exact_against_index",
    "compact_index",
    "brute_force_topk", "train_centroids", "ivf_topk",
    "write_ivf_index", "ivf_topk_stored",
    "knn_graph", "train_pq", "release_cached_salt_inputs",
    "fingerprint", "lang_id", "quality_score", "token_count",
    "repetition_signals", "top_ngram_fraction", "redact_pii",
    "pii_counts", "vocab_topk",
    "tfidf_top_terms", "bm25_topk", "bm25_batch_topk", "ngram_logprob",
    "write_text_index", "bm25_topk_stored", "bm25_batch_topk_stored",
    "blocklist_hits", "blocklist_filter", "code_signals",
    "classifier_score", "clean_text", "canonicalize_url", "url_dedup",
    "media_manifest", "sniff_modality",
    "media_dhash", "media_neardup_pairs", "media_dedup",
    "extract_text", "extract_blocks", "html_blocks", "html_to_text",
    "html_escape",
    "semantic_dedup", "cap_per_group", "hash_sample", "pack_documents",
    "chunk_documents", "oversample", "shard_assignment",
    "shard_key", "split_by_cluster", "weighted_sample",
    "write_training_shards",
]
