"""crawl_conformance query ⇔ reference-semantics oracle equality.

The driver-visible ``crawl_conformance`` row (search_pipeline.py) must
carry EXACTLY the fingerprints the single-threaded oracle derives on
the same geometry — this is the north-rule engine⇔oracle equality
proof surfaced as a machine-checked scalar (the knn_ivf_recall
pattern).  The oracle-side fingerprints are computed here with an
independent scalar serializer so a bug in the engine's arrow kernel
cannot self-confirm.
"""

import hashlib

from distributed_web_search_engine_crawler_indexing_pagerank__ray.functions.hasher import (
    xor_fingerprint_pairs,
)
from distributed_web_search_engine_crawler_indexing_pagerank__ray.oracle.crawl_oracle import (
    CrawlOracle,
)
from distributed_web_search_engine_crawler_indexing_pagerank__ray.sources.synthetic_web import (
    CrawlParams,
    SyntheticWeb,
    WebConfig,
)

SF_DIR = "/root/testdata/sf0.001"


def _scalar_spans_fp(crawl: dict) -> int:
    """Independent scalar re-derivation of crawl.spans_fingerprint's
    canonical row string (url_hash|kind\x1ftext\x1fmedia_ref\x1foffset;...)."""
    fp = 0
    for key, row in crawl.items():
        s = key + "|" + ";".join(
            f"{sp['kind']}\x1f{sp['text']}\x1f{sp['media_ref']}\x1f{sp['offset']}"
            for sp in row["spans"]
        )
        fp ^= int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")
    return fp


def test_crawl_conformance_equals_oracle(ray_session):
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines import (
        search_pipeline,
    )

    # the oracle on the driver-query geometry (crawl_corpus defaults)
    cfg = WebConfig(
        n_docs=600, n_hosts=16, texts=search_pipeline.load_texts(SF_DIR)
    )
    params = CrawlParams(target_pages=200, max_waves=8, n_seeds=8)
    oracle = CrawlOracle(SyntheticWeb(cfg), params)
    oracle.run()

    row = search_pipeline.q_crawl_conformance(SF_DIR).to_pylist()[0]

    assert row["pages"] == len(oracle.crawl)
    assert row["waves"] == len(oracle.waves)
    assert row["visited"] == len(oracle.visited)
    assert row["queue"] == len(oracle.queue)
    assert row["visited_fp"] == (
        f"{xor_fingerprint_pairs(oracle.visited.keys(), oracle.visited.values()):016x}"
    )
    assert row["queue_fp"] == (
        f"{xor_fingerprint_pairs(oracle.queue.keys(), oracle.queue.values()):016x}"
    )
    assert row["spans_fp"] == f"{_scalar_spans_fp(oracle.crawl):016x}"


def test_conformance_query_after_frozen_window():
    """crawl_conformance must sit PAST the driver's 50-query window so
    it cannot evict a frozen driver-checked query."""
    import __ray_entry__ as entry

    keys = list(entry.queries())
    assert "crawl_conformance" in keys
    assert keys.index("crawl_conformance") >= 50
