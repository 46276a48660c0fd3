"""FIXTURES.md §5 scenario checklist: host cap, hot-host skew,
redirects, strict-robots mode — oracle/engine equality per scenario."""

import pytest

from distributed_web_search_engine_crawler_indexing_pagerank__ray.oracle.crawl_oracle import (
    CrawlOracle,
)
from distributed_web_search_engine_crawler_indexing_pagerank__ray.sources.synthetic_web import (
    CrawlParams,
    SyntheticWeb,
    WebConfig,
)


def run_pair(cfg, params, ray_session=None, **engine_kwargs):
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.crawl import (
        CrawlEngine,
    )

    o = CrawlOracle(SyntheticWeb(cfg), params)
    o.run()
    eng = CrawlEngine(cfg, params, n_host_shards=3, n_seen_shards=3,
                      **engine_kwargs)
    eng.run()
    return o, eng


def test_host_cap_scenario(ray_session):
    """Scenario 7: a tiny cap forces nocap decisions; engine matches
    the (global, exact) cap oracle."""
    cfg = WebConfig(n_docs=300, n_hosts=4, zipf_s=1.4)  # few, hot hosts
    params = CrawlParams(target_pages=500, max_waves=14, n_seeds=6,
                         max_pages_per_host=3)
    o, eng = run_pair(cfg, params)
    assert eng.seen_set() == o.visited
    assert eng.pages_total == len(o.crawl)
    counts = {k: v for k, v in eng.summary()["host_counts"].items() if v}
    assert counts == o.host_counts
    assert all(v <= 3 for v in counts.values())
    assert max(counts.values()) == 3  # the cap actually bound


def test_hot_host_skew_scenario(ray_session):
    """Scenario 9: heavy Zipf skew; block splitting keeps host groups
    whole and equality holds."""
    cfg = WebConfig(n_docs=400, n_hosts=6, zipf_s=1.6)
    params = CrawlParams(target_pages=200, max_waves=10, n_seeds=6)
    o, eng = run_pair(cfg, params, fetch_batch_size=16)  # many tiny blocks
    assert eng.seen_set() == o.visited
    assert eng.queue_set() == o.queue


def test_redirect_targets_fetched(ray_session):
    """Scenario 2: 301 pages emit normalized targets into the frontier;
    targets get crawled in later waves."""
    cfg = WebConfig(n_docs=250, n_hosts=8)
    params = CrawlParams(target_pages=120, max_waves=10, n_seeds=6)
    o, eng = run_pair(cfg, params)
    web = SyntheticWeb(cfg)
    redirects_seen = [
        u for u in o.visited.values()
        if (m := web.page_meta(u)) is not None and m["status"] == 301
    ]
    assert redirects_seen, "fixture must include redirect pages"
    assert eng.seen_set() == o.visited


def test_strict_robots_mode(ray_session):
    """fidelity='strict' fixes the reference's rule-separator bug:
    Disallow rules actually deny; oracle and engine agree in both
    modes and strict crawls no /private/ path on pattern-1 hosts."""
    cfg = WebConfig(n_docs=250, n_hosts=8)
    params = CrawlParams(target_pages=120, max_waves=8, n_seeds=6)
    o_strict = CrawlOracle(SyntheticWeb(cfg), params, fidelity="strict")
    o_strict.run()
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.crawl import (
        CrawlEngine,
    )

    eng = CrawlEngine(cfg, params, n_host_shards=2, n_seen_shards=2,
                      fidelity="strict")
    eng.run()
    assert eng.seen_set() == o_strict.visited
    web = SyntheticWeb(cfg)
    for row in o_strict.crawl.values():
        if "/private/" in row["url"]:
            hid = web.host_of(web.doc_index_of(row["url"]))
            assert web.robots_policy(hid) not in (1, 2), row["url"]


def test_reference_mode_crawls_private_paths(ray_session):
    """The reference's robots eval bug means Disallow is a no-op —
    /private/ pages DO get crawled in fidelity='reference'."""
    cfg = WebConfig(n_docs=250, n_hosts=8)
    params = CrawlParams(target_pages=120, max_waves=8, n_seeds=6)
    o = CrawlOracle(SyntheticWeb(cfg), params)
    o.run()
    assert any("/private/" in u for u in (r["url"] for r in o.crawl.values()))


@pytest.mark.slow
def test_randomized_conformance_fuzz(ray_session):
    """Seeded random sweep over the config space (host counts, skew,
    link fan-out, caps, seed counts, wave budgets, block sizes): the
    engine must equal the oracle on seen set, queue set, page count,
    host counts, and per-wave attempt counts for EVERY draw — the
    property form of the north rule's "same seeds + politeness budget
    reproduces the crawl exactly"."""
    import random

    rng = random.Random(20260817)
    for trial in range(6):
        cfg = WebConfig(
            n_docs=rng.randrange(150, 500),
            n_hosts=rng.randrange(3, 24),
            seed=rng.randrange(1, 10_000),
            links_per_doc=rng.randrange(2, 7),
            zipf_s=rng.choice([0.3, 0.8, 1.1, 1.6]),
        )
        params = CrawlParams(
            target_pages=rng.randrange(60, 400),
            max_pages_per_host=rng.choice([3, 10, 500]),
            max_waves=rng.randrange(4, 12),
            n_seeds=rng.randrange(2, 10),
        )
        o, eng = run_pair(
            cfg, params, fetch_batch_size=rng.choice([8, 32, 128])
        )
        ctx = (trial, cfg, params)
        assert eng.seen_set() == o.visited, ctx
        assert eng.queue_set() == o.queue, ctx
        assert eng.pages_total == len(o.crawl), ctx
        counts = {k: v for k, v in eng.summary()["host_counts"].items() if v}
        assert counts == o.host_counts, ctx
        assert [w["attempted"] for w in eng.waves] == [
            len(w.attempted) for w in o.waves
        ], ctx


def test_frontier_spill_identical_waves(ray_session):
    """The 10^10-URL spill path: a crawl whose FrontierShards spill
    every committed slice to parquet (tiny threshold) is wave-identical
    to the in-memory crawl — spilling changes WHERE the frontier lives,
    never what is crawled."""
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.crawl import (
        CrawlEngine,
    )

    cfg = WebConfig(n_docs=300, n_hosts=8)
    params = CrawlParams(target_pages=150, max_waves=8, n_seeds=6)
    base = CrawlEngine(cfg, params, n_host_shards=3, n_seen_shards=3,
                       record_waves=True)
    base.run()
    spill = CrawlEngine(cfg, params, n_host_shards=3, n_seen_shards=3,
                        record_waves=True, frontier_spill_rows=8)
    spill.run()
    assert spill.seen_set() == base.seen_set()
    assert spill.queue_set() == base.queue_set()
    assert spill.pages_total == base.pages_total
    keys = ("wave", "attempted", "throttled", "visited_added", "fetched")
    assert [
        {k: w.get(k) for k in keys} for w in spill.waves
    ] == [{k: w.get(k) for k in keys} for w in base.waves]
