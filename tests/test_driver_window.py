"""Freeze the driver's correctness window (VERDICT r4, next-round #4).

The driver records only the FIRST 50 entries of ``queries()`` in
CORRECTNESS_r{N}.json.  Round 4 went fully green on a specific 50-query
set; this test pins that exact set (names AND order) so a future
addition can't silently evict a driver-checked query and make the
round-over-round correctness files incomparable.  New queries go AFTER
slot 50.
"""

from __future__ import annotations

import importlib
import sys


# the exact keys of CORRECTNESS_r04.json (all 50 green), in order
FROZEN_50 = [
    "filter_project", "groupby_fold", "fold_global", "distinct",
    "join_broadcast", "join_shuffle", "intersection", "anti_join",
    "join_left", "global_rank", "grouped_topk", "revenue_by_segment",
    "sample", "topk", "wordcount", "inverted_index", "tfidf_docs",
    "quality", "quality_filter", "mixture_sample", "top_tokens",
    "text_stats", "contamination_check", "repetition_signals",
    "lm_unigram_score", "pack_sequences", "chunk_documents",
    "bm25_scores", "dedup_exact", "dedup_clusters", "dedup_minhash",
    "dedup_simhash", "dedup_ngram", "dedup_embedding",
    "dedup_embedding_lsh", "knn_bruteforce", "knn_lsh", "knn_ivf_flat",
    "embedding_stats", "approx_distinct_users", "window_tumbling",
    "window_sliding", "window_late_data", "asof_join", "range_join",
    "sessionize", "top_users", "keep_latest", "grouped_quantiles",
    "moving_average",
]


def _entry_mod():
    sys.path.insert(0, "/root/repo")
    return importlib.import_module("__ray_entry__")


def test_first_50_queries_frozen_to_r4_driver_set():
    mod = _entry_mod()
    first50 = list(mod.queries())[:50]
    assert first50 == FROZEN_50, (
        "the driver-checked first-50 query set changed — new queries "
        "must be appended AFTER slot 50 (see module docstring)"
    )


def test_frozen_window_queries_all_oracled():
    mod = _entry_mod()
    osql = mod.oracle_sql()
    missing = [k for k in FROZEN_50 if k not in osql]
    assert missing == []
