"""Generator invariants: determinism, canonical URLs, variant coverage."""

from distributed_web_search_engine_crawler_indexing_pagerank__ray.functions.urlnorm import (
    normalize_and_filter_url,
    normalize_seed_url,
)
from distributed_web_search_engine_crawler_indexing_pagerank__ray.sources.synthetic_web import (
    SyntheticWeb,
    WebConfig,
)


def test_urls_are_canonical_fixed_points():
    web = SyntheticWeb(WebConfig(n_docs=400, n_hosts=12))
    for i in range(400):
        u = web.url_of(i)
        assert normalize_and_filter_url(u, u) == u
        assert normalize_seed_url(u) == u
        assert web.doc_index_of(u) == i


def test_href_variants_normalize_to_canonical():
    web = SyntheticWeb(WebConfig(n_docs=400, n_hosts=12))
    checked = 0
    for i in range(400):
        if not web.is_countable_fetch(web.url_of(i)):
            continue
        base = web.url_of(i)
        for k, j in enumerate(web.link_targets(i)):
            href = web._href_variant(i, k, j)
            assert normalize_and_filter_url(base, href) == web.url_of(j), (
                base,
                href,
            )
            checked += 1
    assert checked > 500


def test_generator_deterministic():
    a = SyntheticWeb(WebConfig(n_docs=100, n_hosts=6))
    b = SyntheticWeb(WebConfig(n_docs=100, n_hosts=6))
    for i in range(100):
        assert a.url_of(i) == b.url_of(i)
        if a.is_countable_fetch(a.url_of(i)):
            assert a.render_page(i) == b.render_page(i)
    assert a.seed_urls(6) == b.seed_urls(6)


def test_page_classes_cover_all_branches():
    web = SyntheticWeb(WebConfig(n_docs=500, n_hosts=10))
    statuses = set()
    ctypes = set()
    langs = set()
    for i in range(500):
        m = web.page_meta(web.url_of(i))
        statuses.add(m["status"])
        ctypes.add(m["content_type"].split(";")[0])
        langs.add(m["content_language"])
    assert {200, 301, 404, 500} <= statuses
    assert "application/pdf" in ctypes
    assert "de" in langs


def test_zipf_skew_produces_hot_hosts():
    web = SyntheticWeb(WebConfig(n_docs=2000, n_hosts=20))
    counts = {}
    for i in range(2000):
        counts[web.host_of(i)] = counts.get(web.host_of(i), 0) + 1
    top = max(counts.values())
    assert top > 2 * (2000 / 20)  # hottest host well above uniform share
