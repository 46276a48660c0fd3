"""Ray-Data-native search-engine data-processing engine.

A from-scratch reimplementation of the query and data-processing
capabilities of the reference repo
``monliver/Distributed-Web-Search-Engine-Crawler-Indexing-PageRank-``
(crawler / indexer / PageRank / TF-IDF / query serving), expressed as
``ray.data.Dataset`` pipelines of ``map_batches`` over Arrow batches,
actor pools for stateful stages (URL-seen set, per-host politeness),
and ``groupby``/``aggregate`` shuffles for the wide steps.

Layout
------
- ``functions/``  pure kernels transliterated from the reference's
  semantics (hashing, URL normalization, robots, HTML extraction,
  tokenization) with file:line citations.
- ``sources/``    deterministic synthetic-web generator + table IO.
- ``state/``      stateful actor components (seen-set shards with
  cuckoo/bloom filters, per-host politeness scheduler, checkpoints).
- ``stages/``     map_batches stage bodies (fetch, link pipeline).
- ``pipelines/``  end-to-end jobs (crawl, index, pagerank, tfidf,
  query serving, dedup, similarity search, text analysis).
- ``oracle/``     single-threaded reference-semantics crawl simulator
  used as the conformance oracle (no Ray).

Durable tables: the north rule targets Lance; the ``lance`` package is
not available in this environment, so durable tables are partitioned
Parquet directories with the same layout discipline (one directory per
wave / key range, manifest sidecars).  Swapping the writer for
``write_lance`` is a one-line change per sink.
"""

__version__ = "0.1.0"
