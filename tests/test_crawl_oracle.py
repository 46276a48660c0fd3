"""Oracle behavior checks (no Ray): the reference-semantics simulator."""

from distributed_web_search_engine_crawler_indexing_pagerank__ray.functions.hasher import ref_hash
from distributed_web_search_engine_crawler_indexing_pagerank__ray.oracle.crawl_oracle import (
    CrawlOracle,
)
from distributed_web_search_engine_crawler_indexing_pagerank__ray.sources.synthetic_web import (
    CrawlParams,
    SyntheticWeb,
    WebConfig,
)


def small():
    cfg = WebConfig(n_docs=200, n_hosts=8)
    return SyntheticWeb(cfg), CrawlParams(target_pages=60, max_waves=12, n_seeds=5)


def test_oracle_deterministic():
    web, params = small()
    a = CrawlOracle(web, params).run()
    b = CrawlOracle(web, params).run()
    assert a["seen_set"] == b["seen_set"]
    assert a["pages"] == b["pages"]


def test_throttling_limits_one_fetch_per_host_per_wave():
    web, params = small()
    o = CrawlOracle(web, params)
    o.run()
    for rec in o.waves:
        hosts = [u.split("/")[2] for u in rec.fetched]
        assert len(hosts) == len(set(hosts))  # ≤1 fetch per host:port per wave


def test_raw_href_quirk_enters_visited():
    """C20: raw relative hrefs reach the next round and get visited-marked
    keyed by the raw string (Crawler.java:341,391,402)."""
    web, params = small()
    o = CrawlOracle(web, params)
    o.run()
    raw_visited = [u for u in o.visited.values() if not u.startswith("http")]
    assert raw_visited, "expected raw (non-absolute) hrefs in the seen set"
    for u in raw_visited:
        assert ref_hash(u) in o.visited


def test_throttled_urls_stay_in_queue_not_visited():
    web, params = small()
    o = CrawlOracle(web, params)
    o.run()
    throttled_any = [u for rec in o.waves for u in rec.throttled]
    assert throttled_any
    for rec in o.waves:
        for u in rec.throttled:
            assert u not in rec.visited_added


def test_target_page_stop():
    web, _ = small()
    params = CrawlParams(target_pages=5, max_waves=50, n_seeds=5)
    o = CrawlOracle(web, params)
    s = o.run()
    assert s["pages"] >= 5
    # stops within a wave or two of crossing the target
    assert s["pages"] <= 5 + params.n_seeds * 4


def test_crawl_delay_host_fetches_every_nth_wave():
    """Hosts with robots Crawl-delay 2/3 s fetch at most every 2nd/3rd wave."""
    web, params = small()
    o = CrawlOracle(web, params)
    o.run()
    # build host -> robots delay from generator policy
    delayed = {}
    for j, full in enumerate(web._host_names):
        pol = web.robots_policy(j)
        if pol == 2:
            delayed[full.split("://")[1].split(":")[0]] = 2
        elif pol == 3:
            delayed[full.split("://")[1].split(":")[0]] = 3
    waves_by_host: dict[str, list[int]] = {}
    for rec in o.waves:
        for u in rec.fetched:
            h = u.split("/")[2].split(":")[0]
            waves_by_host.setdefault(h, []).append(rec.wave)
    hit = 0
    for h, waves in waves_by_host.items():
        d = delayed.get(h)
        if d is None:
            continue
        hit += 1
        gaps = [b - a for a, b in zip(waves, waves[1:])]
        assert all(g >= d for g in gaps), (h, waves)
    assert hit > 0
