"""End-to-end search pipeline: crawl → index → pagerank → tfidf → query.

The `pipeline` command of the reference (``ci_cd/build.sh:536-543``)
chained Indexer → PageRank → TfIdf over an existing pt-crawl; this
module is the same chain over our crawl output, exposed both as a
library entry and as driver-contract queries (rows-only; the exact
conformance oracles run in tests/test_downstream.py).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from ..sources.synthetic_web import CrawlParams, WebConfig


def load_texts(sf_dir: str, limit: int = 2000) -> tuple[str, ...]:
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    return tuple(t["text"].to_pylist()[:limit])


_CORPUS_MEMO: dict[tuple, "object"] = {}
_CONF_MEMO: dict[tuple, dict] = {}


def crawl_corpus(sf_dir: str, n_docs: int = 600, n_hosts: int = 16,
                 target: int = 200, waves: int = 8):
    """Deterministic crawl over the sf-derived synthetic web; returns
    (pages_table, engine).

    The pages table is MEMOIZED per (sf_dir, geometry) within the
    process: the crawl is pure in these arguments, and the six
    search-side driver queries each start from the same corpus — the
    correctness run previously re-crawled identically 6×.  A cache hit
    returns ``engine=None`` (every in-repo caller discards it; the
    engine's actors would otherwise be kept alive by the cache)."""
    from .crawl import CrawlEngine

    key = (sf_dir, n_docs, n_hosts, target, waves)
    cached = _CORPUS_MEMO.get(key)
    if cached is not None:
        return cached, None
    cfg = WebConfig(n_docs=n_docs, n_hosts=n_hosts, texts=load_texts(sf_dir))
    params = CrawlParams(target_pages=target, max_waves=waves, n_seeds=8)
    eng = CrawlEngine(cfg, params, n_host_shards=4, n_seen_shards=4)
    eng.run()
    pages = eng.pages_table()  # small corpus: safe in memory
    _CONF_MEMO[key] = eng.conformance_row(pages)
    eng.cleanup()
    _CORPUS_MEMO[key] = pages
    return pages, eng


def q_crawl_pages(sf_dir: str) -> pa.Table:
    """The north-rule crawl itself (rows-only driver check; exact
    equality vs the reference-semantics oracle is in tests/)."""
    pages, _ = crawl_corpus(sf_dir)
    return pages.select(
        ["url_hash", "url", "response_code", "content_type", "length", "wave"]
    )


def q_crawl_conformance(sf_dir: str) -> pa.Table:
    """North-rule conformance as a driver-visible one-row scalar
    (mirrors ``knn_ivf_recall``'s machine-checked-bound pattern): the
    crawl's final seen/queue-set fingerprints (per-shard XOR partials,
    ``state/actors.SeenShard.fingerprints``), span fingerprint, wave
    and page counts.  tests/test_crawl_conformance_query.py asserts
    these exact values equal the single-threaded reference-semantics
    oracle's (``oracle/crawl_oracle.py``) on the same geometry, so a
    stable row here IS the engine⇔oracle equality proof, visible
    outside tests/."""
    key = (sf_dir, 600, 16, 200, 8)
    if key not in _CONF_MEMO:
        crawl_corpus(sf_dir)
    c = _CONF_MEMO[key]
    return pa.table(
        {
            "pages": pa.array([c["pages"]], pa.int64()),
            "waves": pa.array([c["waves"]], pa.int64()),
            "visited": pa.array([c["visited"]], pa.int64()),
            "queue": pa.array([c["queue"]], pa.int64()),
            "visited_fp": pa.array([c["visited_fp"]], pa.string()),
            "queue_fp": pa.array([c["queue_fp"]], pa.string()),
            "spans_fp": pa.array([c["spans_fp"]], pa.string()),
        }
    )


def q_search_index(sf_dir: str) -> pa.Table:
    """Crawl → inverted index (word, postings-as-string, count, full)."""
    from .index import build_index

    pages, _ = crawl_corpus(sf_dir)
    tbl = build_index(pages)
    postings = pa.array(
        [",".join(p) for p in tbl["postings"].to_pylist()], pa.string()
    )
    return pa.table(
        {
            "word": tbl["word"],
            "postings": postings,
            "cnt": tbl["count"],
            "full": tbl["full"],
        }
    )


def q_search_pagerank(sf_dir: str) -> pa.Table:
    """Crawl → PageRank table (scores rounded for stable hashing)."""
    import pyarrow.compute as pc

    from .pagerank import run_pagerank

    pages, _ = crawl_corpus(sf_dir)
    tbl = run_pagerank(pages)
    return tbl.set_column(
        tbl.schema.get_field_index("pagerank"),
        "pagerank",
        pc.round(tbl["pagerank"], ndigits=8),
    )


def q_search_tfidf(sf_dir: str) -> pa.Table:
    import pyarrow.compute as pc

    from .index import build_index
    from .tfidf import run_tfidf

    pages, _ = crawl_corpus(sf_dir)
    tbl = run_tfidf(pages, build_index(pages))
    for col in ("tf", "idf", "tfidf"):
        tbl = tbl.set_column(
            tbl.schema.get_field_index(col), col, pc.round(tbl[col], ndigits=8)
        )
    return tbl


def q_search_suggest(sf_dir: str) -> pa.Table:
    """Q2/Q3 serving path: spellcheck corrections + autocomplete
    suggestions over the crawl-built dictionary (rows-only)."""
    from .index import build_index
    from .pagerank import run_pagerank
    from .query import QueryEngine
    from .tfidf import run_tfidf

    pages, _ = crawl_corpus(sf_dir)
    index_tbl = build_index(pages)
    qe = QueryEngine(
        index_tbl, run_tfidf(pages, index_tbl), run_pagerank(pages)
    )
    words = sorted(qe.index)[:10]
    rows = {"kind": [], "input": [], "output": []}
    for w in words:
        typo = w[:-1] + ("x" if w[-1] != "x" else "y") if len(w) > 2 else w
        rows["kind"].append("correct")
        rows["input"].append(typo)
        rows["output"].append(qe.correct(typo))
        for s in qe.suggest(w[:2]):
            rows["kind"].append("suggest")
            rows["input"].append(w[:2])
            rows["output"].append(s)
    return pa.table(
        {
            "kind": pa.array(rows["kind"], pa.string()),
            "input": pa.array(rows["input"], pa.string()),
            "output": pa.array(rows["output"], pa.string()),
        }
    )


def q_search_results(sf_dir: str) -> pa.Table:
    """Full serving path: fixed queries → ranked results."""
    from .index import build_index
    from .pagerank import run_pagerank
    from .query import QueryEngine
    from .tfidf import run_tfidf

    pages, _ = crawl_corpus(sf_dir)
    index_tbl = build_index(pages)
    qe = QueryEngine(
        index_tbl, run_tfidf(pages, index_tbl), run_pagerank(pages)
    )
    words = sorted(qe.index)[:8]
    queries = [words[0] if words else "test"]
    if len(words) >= 4:
        queries += [" ".join(words[:2]), " ".join(words[2:4])]
    rows = {"query": [], "rank": [], "url": [], "score": []}
    for q in queries:
        for rank, r in enumerate(qe.search(q)):
            rows["query"].append(q)
            rows["rank"].append(rank)
            rows["url"].append(r["url"])
            rows["score"].append(round(r["score"], 8))
    return pa.table(
        {
            "query": pa.array(rows["query"], pa.string()),
            "rank": pa.array(rows["rank"], pa.int32()),
            "url": pa.array(rows["url"], pa.string()),
            "score": pa.array(rows["score"], pa.float64()),
        }
    )
