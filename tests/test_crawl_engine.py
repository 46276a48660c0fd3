"""Engine ⇔ oracle conformance: exact wave-by-wave + final-state equality.

This is the north-rule gate (BASELINE.json): same seed list + politeness
budget ⇒ same crawl ordering (wave granularity + documented intra-wave
order) and same final URL-seen set; plus span-sequence equality per row.
"""

import pyarrow.parquet as pq
import pytest

from distributed_web_search_engine_crawler_indexing_pagerank__ray.oracle.crawl_oracle import (
    CrawlOracle,
)
from distributed_web_search_engine_crawler_indexing_pagerank__ray.sources.synthetic_web import (
    CrawlParams,
    SyntheticWeb,
    WebConfig,
)


CFG = WebConfig(n_docs=180, n_hosts=8)
PARAMS = CrawlParams(target_pages=60, max_waves=8, n_seeds=5)


@pytest.fixture(scope="module")
def oracle():
    o = CrawlOracle(SyntheticWeb(CFG), PARAMS)
    o.run()
    return o


@pytest.fixture(scope="module")
def engine(ray_session):
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.crawl import (
        CrawlEngine,
    )

    eng = CrawlEngine(CFG, PARAMS, record_waves=True, n_host_shards=3,
                      n_seen_shards=3, fetch_concurrency=2)
    eng.run()
    return eng


def test_final_seen_set_equal(oracle, engine):
    assert engine.seen_set() == oracle.visited


def test_final_queue_equal(oracle, engine):
    assert engine.queue_set() == oracle.queue


def test_wave_by_wave_equality(oracle, engine):
    assert len(oracle.waves) == len(engine.waves)
    for ow, ew in zip(oracle.waves, engine.waves):
        assert sorted(set(ow.attempted)) == ew["attempted_urls"], ow.wave
        assert sorted(ow.fetched) == ew["fetched_urls"], ow.wave
        assert sorted(ow.throttled) == ew["throttled_urls"], ow.wave
        assert ow.enqueued == ew["enqueued_urls"], ow.wave
        assert ow.frontier_out == ew["frontier_out"], ow.wave
        assert sorted(ow.visited_added) == sorted(ew["visited_added_urls"]), ow.wave


def test_host_counts_equal(oracle, engine):
    eng_counts = {k: v for k, v in engine.summary()["host_counts"].items() if v}
    assert eng_counts == oracle.host_counts


def test_page_count_equal(oracle, engine):
    assert engine.pages_total == len(oracle.crawl)


def test_span_sequence_equality(oracle, engine):
    """Per-row invariant (BASELINE.json input_hint): span-sequence equality
    (kind, text, media_ref, order) against the oracle."""
    pages = engine.pages_table()
    by_key = {}
    for i in range(pages.num_rows):
        by_key[pages["url_hash"][i].as_py()] = pages["spans"][i].as_py()
    assert set(by_key) == set(oracle.crawl)
    for key, row in oracle.crawl.items():
        ospans = row["spans"]
        espans = by_key[key]
        assert len(ospans) == len(espans), key
        for o, e in zip(ospans, espans):
            assert (o["kind"], o["text"], o["media_ref"], o["offset"]) == (
                e["kind"],
                e["text"],
                e["media_ref"],
                e["offset"],
            ), key


def test_bloom_filter_metrics_present(engine):
    stats = engine.summary()["filter_stats"]
    assert sum(s["probes"] for s in stats) > 0
    # bloom prefilter must short-circuit a real fraction of probes
    assert sum(s["bloom_neg"] for s in stats) > 0


def test_checkpoint_resume_equivalence(ray_session, oracle, tmp_path):
    """Kill after wave 3, resume from checkpoint → identical final state."""
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.crawl import (
        CrawlEngine,
    )

    ck = str(tmp_path / "ckpt")
    eng1 = CrawlEngine(CFG, PARAMS, checkpoint_dir=ck, n_host_shards=3,
                       n_seen_shards=3, fetch_concurrency=2)
    eng1.seed()
    for _ in range(3):
        if eng1.frontier:
            eng1.run_wave()
    # fresh engine restores from checkpoint and finishes the crawl
    eng2 = CrawlEngine(CFG, PARAMS, checkpoint_dir=ck, n_host_shards=3,
                       n_seen_shards=3, fetch_concurrency=2)
    assert eng2.resume()
    eng2.run_resumed()
    assert eng2.seen_set() == oracle.visited
    assert eng2.queue_set() == oracle.queue
    assert eng2.pages_total == len(oracle.crawl)


def test_partitioned_output_layout(ray_session, tmp_path):
    """Resumable output: one parquet directory per wave."""
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.crawl import (
        CrawlEngine,
    )

    out = str(tmp_path / "crawl_out")
    eng = CrawlEngine(CFG, CrawlParams(target_pages=30, max_waves=4, n_seeds=5),
                      out_dir=out, n_host_shards=2, n_seen_shards=2,
                      fetch_concurrency=2)
    eng.run()
    import os

    waves = sorted(d for d in os.listdir(out) if d.startswith("wave="))
    assert waves
    t = pq.read_table(os.path.join(out, waves[0]))
    assert {"url", "url_hash", "spans", "page", "wave"} <= set(t.schema.names)
