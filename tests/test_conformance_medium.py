"""Medium-scale engine⇔oracle equality: a larger, skewed universe with
many waves — catches divergences small fixtures miss (cap interactions,
multi-block host groups, queue refills)."""

import pytest

from distributed_web_search_engine_crawler_indexing_pagerank__ray.oracle.crawl_oracle import (
    CrawlOracle,
)
from distributed_web_search_engine_crawler_indexing_pagerank__ray.sources.synthetic_web import (
    CrawlParams,
    SyntheticWeb,
    WebConfig,
)

CFG = WebConfig(n_docs=2500, n_hosts=60, zipf_s=0.8, links_per_doc=6)
PARAMS = CrawlParams(target_pages=900, max_waves=16, n_seeds=20,
                     max_pages_per_host=10)


@pytest.mark.slow
def test_medium_scale_equality(ray_session):
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.crawl import (
        CrawlEngine,
    )

    oracle = CrawlOracle(SyntheticWeb(CFG), PARAMS)
    osum = oracle.run()
    eng = CrawlEngine(CFG, PARAMS, n_host_shards=3, n_seen_shards=3,
                      fetch_batch_size=64)
    eng.run()
    assert eng.pages_total == osum["pages"]
    assert eng.seen_set() == oracle.visited
    assert eng.queue_set() == oracle.queue
    counts = {k: v for k, v in eng.summary()["host_counts"].items() if v}
    assert counts == oracle.host_counts
    # the cap must have bound at least one host in this fixture
    assert max(counts.values()) == PARAMS.max_pages_per_host
    assert len(eng.waves) == len(oracle.waves)
    for ow, ew in zip(oracle.waves, eng.waves):
        assert len(set(ow.attempted)) == ew["attempted"], ow.wave
        assert len(ow.fetched) == ew["fetched"], ow.wave
        assert len(ow.throttled) == ew["throttled"], ow.wave
    eng.cleanup()
