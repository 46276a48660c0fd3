"""Downstream jobs (index / pagerank / tfidf / query) vs their oracles,
run over the conformance crawl corpus."""

import math

import pytest

from distributed_web_search_engine_crawler_indexing_pagerank__ray.oracle.crawl_oracle import (
    CrawlOracle,
)
from distributed_web_search_engine_crawler_indexing_pagerank__ray.oracle.downstream_oracle import (
    build_index_oracle,
    pagerank_oracle,
    query_oracle,
    tfidf_oracle,
)
from distributed_web_search_engine_crawler_indexing_pagerank__ray.sources.synthetic_web import (
    CrawlParams,
    SyntheticWeb,
    WebConfig,
)

CFG = WebConfig(n_docs=180, n_hosts=8)
PARAMS = CrawlParams(target_pages=60, max_waves=8, n_seeds=5)


@pytest.fixture(scope="module")
def oracle_run():
    o = CrawlOracle(SyntheticWeb(CFG), PARAMS)
    o.run()
    index = build_index_oracle(o.crawl)
    ranks = pagerank_oracle(o.crawl)
    tfidf = tfidf_oracle(o.crawl, index)
    return o, index, ranks, tfidf


@pytest.fixture(scope="module")
def engine_pages(ray_session):
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.crawl import (
        CrawlEngine,
    )

    eng = CrawlEngine(CFG, PARAMS, n_host_shards=2, n_seen_shards=2)
    eng.run()
    return eng.pages_table()


def test_index_matches_oracle(oracle_run, engine_pages, ray_session):
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.index import (
        build_index,
        index_as_dict,
    )

    _, oindex, _, _ = oracle_run
    eindex = index_as_dict(build_index(engine_pages))
    assert set(eindex) == set(oindex)
    for w, ent in oindex.items():
        assert eindex[w]["postings"] == ent["postings"], w
        assert eindex[w]["count"] == ent["count"], w
        assert eindex[w]["full"] == ent["full"], w


def test_pagerank_matches_oracle(oracle_run, engine_pages, ray_session):
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.pagerank import (
        run_pagerank,
    )

    _, _, oranks, _ = oracle_run
    tbl = run_pagerank(engine_pages)
    assert tbl.num_rows == len(oranks)
    for i in range(tbl.num_rows):
        h = tbl["url_hash"][i].as_py()
        o = oranks[h]
        assert tbl["url"][i].as_py() == o["url"]
        assert tbl["title"][i].as_py() == o["title"]
        assert tbl["snippet"][i].as_py() == o["snippet"]
        assert math.isclose(
            tbl["pagerank"][i].as_py(), o["pagerank"], rel_tol=1e-12, abs_tol=1e-15
        ), h


def test_tfidf_matches_oracle(oracle_run, engine_pages, ray_session):
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.index import (
        build_index,
    )
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.tfidf import (
        run_tfidf,
    )

    _, _, _, otfidf = oracle_run
    index_tbl = build_index(engine_pages)
    tbl = run_tfidf(engine_pages, index_tbl)
    assert tbl.num_rows == len(otfidf)
    for i in range(tbl.num_rows):
        key = tbl["key"][i].as_py()
        o = otfidf[key]
        assert tbl["word"][i].as_py() == o["word"], key
        assert tbl["url"][i].as_py() == o["url"], key
        assert math.isclose(tbl["tfidf"][i].as_py(), o["tfidf"], rel_tol=1e-12)


def test_query_matches_oracle(oracle_run, engine_pages, ray_session):
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.index import (
        build_index,
    )
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.pagerank import (
        run_pagerank,
    )
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.query import (
        QueryEngine,
    )
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.tfidf import (
        run_tfidf,
    )

    o, oindex, oranks, otfidf = oracle_run
    index_tbl = build_index(engine_pages)
    ranks_tbl = run_pagerank(engine_pages)
    tfidf_tbl = run_tfidf(engine_pages, index_tbl)
    qe = QueryEngine(index_tbl, tfidf_tbl, ranks_tbl)

    # pick query terms actually present in the index
    words = sorted(oindex)[:6]
    queries = [words[0], " ".join(words[:2]), " ".join(words[2:4]), "zzzz " + words[0]]
    for q in queries:
        eres = qe.search(q)
        ores = query_oracle(q, oindex, otfidf, oranks)
        assert [r["url"] for r in eres] == [r["url"] for r in ores], q
        for a, b in zip(eres, ores):
            assert math.isclose(a["score"], b["score"], rel_tol=1e-12), q


def test_autocomplete_and_spellcheck(oracle_run, engine_pages, ray_session):
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.index import (
        build_index,
    )
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.pagerank import (
        run_pagerank,
    )
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.query import (
        QueryEngine,
    )
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.tfidf import (
        run_tfidf,
    )

    _, oindex, _, _ = oracle_run
    index_tbl = build_index(engine_pages)
    qe = QueryEngine(
        index_tbl, run_tfidf(engine_pages, index_tbl), run_pagerank(engine_pages)
    )
    some = sorted(oindex)[0]
    assert qe.suggest(some[:2])  # prefix yields suggestions
    assert all(w.startswith(some[:2]) for w in qe.suggest(some[:2]))
    # a 1-edit typo corrects back to a dictionary word
    typo = some[:-1] + ("x" if some[-1] != "x" else "y")
    assert qe.correct(typo) in oindex or qe.correct(typo) == typo


def test_q9_geo_boost_pure_parts():
    """Q9 offline parts: bounding-box city inference
    (ResultPageHandler.java:329-363, first box wins) and the match
    boost (:366-385) with the x1.2 score multiplier (:175-177).  The
    Nominatim HTTP path stays excluded (external API)."""
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.query import (
        compute_geo_boost,
        infer_city_keyword,
    )

    assert infer_city_keyword(40.7, -74.0) == "New York"
    assert infer_city_keyword(34.05, -118.25) == "Los Angeles"
    # SF box is checked before Oakland's overlapping one
    assert infer_city_keyword(37.78, -122.42) == "San Francisco"
    assert infer_city_keyword(37.80, -122.20) == "Oakland"
    assert infer_city_keyword(37.33, -121.90) == "San Jose"
    assert infer_city_keyword(40.0, -75.1) == "Philadelphia"
    assert infer_city_keyword(51.5, -0.1) is None  # outside every box
    assert infer_city_keyword(None, -74.0) is None
    assert infer_city_keyword(float("nan"), -74.0) is None

    assert compute_geo_boost("new york", "visit new york now", "", "") == 1.0
    assert compute_geo_boost("new york", "", "http://newyork.example/new york", "") == 1.0
    assert compute_geo_boost("new york", "", "", "snippet about new york") == 1.0
    assert compute_geo_boost("new york", "boston", "http://x/", "nothing") == 0.0
    assert compute_geo_boost(None, "new york", "", "") == 0.0


def test_pagerank_ranks_as_dataset_matches_driver_path(engine_pages, ray_session):
    """VERDICT r2 stretch: the fully distributed rank update (ranks as
    a Dataset joined to edges, no O(V) driver vectors) must reproduce
    the driver-vector path's result on the fixture."""
    import numpy as np
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.pagerank import (
        run_pagerank,
    )

    a = run_pagerank(engine_pages).to_pandas().sort_values("url_hash")
    b = (
        run_pagerank(engine_pages, ranks_as_dataset=True)
        .to_pandas()
        .sort_values("url_hash")
    )
    assert list(a["url_hash"]) == list(b["url_hash"])
    assert np.allclose(
        a["pagerank"].to_numpy(), b["pagerank"].to_numpy(), atol=1e-12
    )
