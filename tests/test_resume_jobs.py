"""Job-level resume (I6/P9/T6): kill mid-job, resume in a fresh call,
final tables byte-identical to a single-shot run (mirrors
test_checkpoint_resume_equivalence for the crawl)."""

import pytest

from distributed_web_search_engine_crawler_indexing_pagerank__ray.sources.synthetic_web import (
    CrawlParams,
    WebConfig,
)

CFG = WebConfig(n_docs=400, n_hosts=12)
PARAMS = CrawlParams(target_pages=40, max_waves=4, n_seeds=6)


@pytest.fixture(scope="module")
def crawl_out(ray_session, tmp_path_factory):
    """One small crawl with partitioned page output shared by all tests."""
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.crawl import (
        CrawlEngine,
    )

    out = str(tmp_path_factory.mktemp("resume") / "crawl_out")
    eng = CrawlEngine(CFG, PARAMS, out_dir=out, n_host_shards=2,
                      n_seen_shards=2, fetch_concurrency=2)
    eng.run()
    pages = eng.pages_table()
    eng.cleanup()  # kills actors; out_dir survives (explicitly owned here)
    yield out, pages


def test_index_resume_equivalence(crawl_out, tmp_path):
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.index import (
        build_index,
    )
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.resume import (
        build_index_resumable,
    )

    out, pages = crawl_out
    want = build_index(pages)
    ck = str(tmp_path / "ick")
    # crash after one partition: job reports incomplete
    assert build_index_resumable(out, ck, max_partitions=1) is None
    # fresh call resumes (skips the done partition) and completes
    got = build_index_resumable(out, ck)
    assert got is not None
    assert got.equals(want), "resumed index differs from single-shot"
    # idempotent: a third call re-reduces from checkpoints only
    again = build_index_resumable(out, ck)
    assert again.equals(want)


def test_tfidf_resume_equivalence(crawl_out, tmp_path):
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.index import (
        build_index,
    )
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.resume import (
        run_tfidf_resumable,
    )
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.tfidf import (
        run_tfidf,
    )

    out, pages = crawl_out
    idx = build_index(pages)
    want = run_tfidf(pages, idx)
    ck = str(tmp_path / "tck")
    assert run_tfidf_resumable(out, idx, ck, max_partitions=1) is None
    got = run_tfidf_resumable(out, idx, ck)
    assert got is not None
    assert got.equals(want), "resumed tfidf differs from single-shot"


def test_pagerank_resume_equivalence(crawl_out, tmp_path):
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.pagerank import (
        run_pagerank,
    )
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.resume import (
        run_pagerank_resumable,
    )

    out, pages = crawl_out
    want = run_pagerank(pages).sort_by("url_hash")
    ck = str(tmp_path / "pck")
    # crash 1: mid graph build
    assert run_pagerank_resumable(out, ck, max_partitions=1) is None
    # crash 2: after two iterations
    r = run_pagerank_resumable(out, ck, max_iterations_this_run=2)
    if r is None:  # (converged in <2 rounds otherwise)
        r = run_pagerank_resumable(out, ck)
    got = r.sort_by("url_hash")
    assert got.equals(want), "resumed pagerank differs from single-shot"


def test_tfidf_completion_scales_q6(crawl_out, tmp_path):
    """Q6 tfIdfCompletion: a half-built tfidf scales the tf component of
    the composite score (ResultPageHandler.java:128-131); a finished
    build (ratio 1.0) leaves scores untouched."""
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.index import (
        build_index,
    )
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.pagerank import (
        run_pagerank,
    )
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.query import (
        QueryEngine,
    )
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.resume import (
        run_tfidf_resumable,
        tfidf_completion,
    )
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.tfidf import (
        run_tfidf,
    )

    out, pages = crawl_out
    idx = build_index(pages)
    tf = run_tfidf(pages, idx)
    pr = run_pagerank(pages)

    ck = str(tmp_path / "qck")
    assert tfidf_completion(out, ck) == 0.0  # nothing built yet
    assert run_tfidf_resumable(out, idx, ck, max_partitions=2) is None
    ratio = tfidf_completion(out, ck)
    assert 0.0 < ratio < 1.0
    run_tfidf_resumable(out, idx, ck)
    assert tfidf_completion(out, ck) == 1.0

    # pick a query word that actually has postings
    word = idx["word"][0].as_py()
    full = QueryEngine(idx, tf, pr)
    partial = QueryEngine(idx, tf, pr, tfidf_completion=ratio)
    r_full = full.search(word)
    r_part = partial.search(word)
    assert r_full, "query should hit the index"
    by_url_full = {r["url"]: r["score"] for r in r_full}
    by_url_part = {r["url"]: r["score"] for r in r_part}
    # scores with a tf component must strictly shrink under ratio < 1
    assert any(
        by_url_part[u] < by_url_full[u] - 1e-12
        for u in by_url_part
        if u in by_url_full
    )
    # ratio 1.0 is the identity (oracle-equality of finished pipelines)
    same = QueryEngine(idx, tf, pr, tfidf_completion=1.0).search(word)
    assert same == r_full
