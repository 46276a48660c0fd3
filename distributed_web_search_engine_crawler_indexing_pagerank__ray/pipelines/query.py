"""Query-serving operators (SURVEY §2.7 Q1–Q8) over the job outputs.

The reference serves queries from a webapp doing synchronous KVS point
reads (``ResultPageHandler.java``, ``KVSStorage.java``); here the same
operators are library functions over the index / tfidf / pageranks
tables, packaged in a :class:`QueryEngine` that mirrors the serving
actor (dictionary built once = the spellcheck cache,
``SpellChecker.java:21-39``).
"""

from __future__ import annotations

import bisect
import math

import pyarrow as pa

from ..functions.hasher import ref_hash
from ..functions.textstats import levenshtein
from ..functions.tokenize import query_tokens

RESULTS_PER_PAGE = 10  # ResultPageHandler.RESULTS_PER_PAGE
SPELL_MAX_DISTANCE = 2  # SpellChecker.java Levenshtein cap
SUGGEST_LIMIT = 8  # SuggestHandler.java:16-36


class QueryEngine:
    """Serving-side state: one instance per serving actor/process."""

    def __init__(self, index_tbl: pa.Table, tfidf_tbl: pa.Table,
                 pageranks_tbl: pa.Table):
        self.index: dict[str, list[str]] = {}
        for i in range(index_tbl.num_rows):
            self.index[index_tbl["word"][i].as_py()] = index_tbl["postings"][
                i
            ].as_py()
        self.dictionary = sorted(self.index)  # Q2/Q3 cache
        self.tfidf: dict[str, float] = {}
        for i in range(tfidf_tbl.num_rows):
            self.tfidf[tfidf_tbl["key"][i].as_py()] = tfidf_tbl["tfidf"][
                i
            ].as_py()
        self.meta: dict[str, tuple[str, str, float]] = {}
        for i in range(pageranks_tbl.num_rows):
            self.meta[pageranks_tbl["url_hash"][i].as_py()] = (
                pageranks_tbl["title"][i].as_py(),
                pageranks_tbl["snippet"][i].as_py(),
                pageranks_tbl["pagerank"][i].as_py(),
            )

    # -- Q2: spellcheck (Levenshtein ≤ 2, early-exit DP) ---------------------

    def correct(self, word: str) -> str:
        if word in self.index:
            return word
        best, best_d = word, SPELL_MAX_DISTANCE + 1
        for cand in self.dictionary:
            d = levenshtein(word, cand, best_d)
            if d < best_d:
                best, best_d = cand, d
        return best if best_d <= SPELL_MAX_DISTANCE else word

    # -- Q3: autocomplete (first N dictionary words with prefix) -------------

    def suggest(self, prefix: str, limit: int = SUGGEST_LIMIT) -> list[str]:
        lo = bisect.bisect_left(self.dictionary, prefix)
        out = []
        for w in self.dictionary[lo : lo + 4 * limit]:
            if not w.startswith(prefix):
                break
            out.append(w)
            if len(out) >= limit:
                break
        return out

    # -- Q4/Q5: posting lookup + AND intersection ----------------------------

    def candidates(self, words: list[str]) -> list[str]:
        if not words:
            return []
        urls = list(self.index.get(words[0], []))
        for w in words[1:]:
            postings = set(self.index.get(w, []))
            urls = [u for u in urls if u in postings]
        return urls

    # -- Q6/Q7: scoring + sort + title-dedup + page --------------------------

    def search(self, raw_query: str, page_size: int = RESULTS_PER_PAGE) -> list[dict]:
        words = [self.correct(w) for w in query_tokens(raw_query)]
        if not words:
            return []
        results = []
        for url in self.candidates(words):
            tf_avg = (
                sum(self.tfidf.get(ref_hash(w + "|" + url), 0.0) for w in words)
                / len(words)
            )
            m = self.meta.get(ref_hash(url))
            if m is not None:
                title, _snippet, pr = m
                title = title or url
            else:
                title, pr = url, 0.1  # metadata fallback
            pr_score = math.log(1.0 + max(pr, 0.0))
            lt, lu = title.lower(), url.lower()
            tmatch = sum(1 for w in words if w in lt) / len(words)
            umatch = sum(1 for w in words if w in lu) / len(words)
            score = (
                0.45 * pr_score
                + 0.45 * max(tf_avg, 0.0)
                + 0.07 * tmatch
                + 0.03 * umatch
            )
            if len(url) > 120:
                score *= 1.0 / (1.0 + (len(url) - 120) / 60.0)
            results.append({"url": url, "title": title, "score": score})
        results.sort(key=lambda r: (-r["score"], r["url"]))
        seen_titles: set[str] = set()
        out = []
        for r in results:
            key = " ".join(r["title"].lower().split())
            if key in seen_titles:
                continue
            seen_titles.add(key)
            out.append(r)
        return out[:page_size]

    def cached_page(self, pages_tbl: pa.Table, url: str) -> bytes | None:
        """Q8: point lookup of the stored page body."""
        key = ref_hash(url)
        idx = None
        hashes = pages_tbl["url_hash"].to_pylist()
        for i, h in enumerate(hashes):
            if h == key:
                idx = i
        if idx is None:
            return None
        return pages_tbl["page"][idx].as_py()
