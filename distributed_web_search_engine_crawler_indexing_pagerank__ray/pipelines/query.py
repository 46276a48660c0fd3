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

# Q9 geo boost, offline parts.  The reverse-geocoding HTTP call
# (Nominatim, ResultPageHandler.java:265-299) stays excluded — external
# API — but its pure fallback chain is kept exactly: bounding boxes
# (``inferCityKeywordFromLocation``, :329-363) and the match boost
# (``computeGeoBoost``, :366-385) applied as score ×= (1 + 0.2·boost)
# (:175-177).
_CITY_BOXES = [  # (lat_lo, lat_hi, lon_lo, lon_hi, city)
    (40.3, 41.1, -74.5, -73.3, "New York"),
    (33.7, 34.4, -119.0, -117.5, "Los Angeles"),
    (37.70, 37.83, -122.53, -122.35, "San Francisco"),
    (37.70, 37.90, -122.30, -122.10, "Oakland"),
    (37.20, 37.45, -122.05, -121.75, "San Jose"),
    (39.8, 40.2, -75.3, -74.8, "Philadelphia"),
]


def infer_city_keyword(lat: float | None, lon: float | None) -> str | None:
    """Bounding-box city fallback (first matching box wins — the
    reference checks them in this order, so the overlapping SF/Oakland
    boxes resolve to San Francisco)."""
    if lat is None or lon is None or math.isnan(lat) or math.isnan(lon):
        return None
    for lat_lo, lat_hi, lon_lo, lon_hi, city in _CITY_BOXES:
        if lat_lo < lat < lat_hi and lon_lo < lon < lon_hi:
            return city
    return None


def compute_geo_boost(city_keyword: str | None, lower_title: str,
                      lower_url: str, lower_snippet: str) -> float:
    """1.0 on a city-name match in title, url, or snippet; else 0."""
    if not city_keyword:
        return 0.0
    if city_keyword in (lower_title or ""):
        return 1.0
    if city_keyword in (lower_url or ""):
        return 1.0
    if city_keyword in (lower_snippet or ""):
        return 1.0
    return 0.0


class QueryEngine:
    """Serving-side state: one instance per serving actor/process."""

    def __init__(self, index_tbl: pa.Table, tfidf_tbl: pa.Table,
                 pageranks_tbl: pa.Table, tfidf_completion: float = 1.0):
        # Q6 tfIdfCompletion (ResultPageHandler.java:77-80,128-131):
        # while a TfIdf build is in flight its partial scores are scaled
        # by the job's completion ratio; 1.0 (finished build) leaves
        # scores untouched.  Source of the ratio here: the resumable
        # job's checkpoint (resume.tfidf_completion).
        self.tfidf_completion = float(tfidf_completion)
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

    def search(self, raw_query: str, page_size: int = RESULTS_PER_PAGE,
               lat: float | None = None, lon: float | None = None) -> list[dict]:
        words = [self.correct(w) for w in query_tokens(raw_query)]
        if not words:
            return []
        city = infer_city_keyword(lat, lon)
        city_kw = city.lower() if city else None
        results = []
        for url in self.candidates(words):
            tf_avg = (
                sum(self.tfidf.get(ref_hash(w + "|" + url), 0.0) for w in words)
                / len(words)
            )
            m = self.meta.get(ref_hash(url))
            if m is not None:
                title, snippet, pr = m
                title = title or url
            else:
                title, snippet, pr = url, "...", 0.1  # metadata fallback
            pr_score = math.log(1.0 + max(pr, 0.0))
            tf_avg = max(tf_avg, 0.0)
            if self.tfidf_completion < 1.0:  # ResultPageHandler.java:128-131
                tf_avg *= self.tfidf_completion
            lt, lu = title.lower(), url.lower()
            tmatch = sum(1 for w in words if w in lt) / len(words)
            umatch = sum(1 for w in words if w in lu) / len(words)
            score = (
                0.45 * pr_score
                + 0.45 * tf_avg
                + 0.07 * tmatch
                + 0.03 * umatch
            )
            if city_kw is not None:  # Q9: ResultPageHandler.java:175-177
                gb = compute_geo_boost(city_kw, lt, lu, (snippet or "").lower())
                if gb > 0.0:
                    score *= 1.0 + 0.2 * gb
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
