"""Membership filters: bloom (no false negatives), cuckoo (insert /
lookup / delete / rebuild-on-load)."""

import numpy as np

from distributed_web_search_engine_crawler_indexing_pagerank__ray.state.filters import (
    BloomFilter,
    CuckooFilter,
    ScalableSeenFilters,
)


def test_bloom_no_false_negatives():
    b = BloomFilter(n_bits=1 << 16)
    keys = np.arange(1, 5000, dtype=np.uint64) * np.uint64(2654435761)
    b.add_many(keys)
    assert b.contains_many(keys).all()


def test_bloom_false_positive_rate_reasonable():
    b = BloomFilter(n_bits=1 << 17, k=4)
    keys = np.arange(1, 5000, dtype=np.uint64) * np.uint64(2654435761)
    b.add_many(keys)
    probe = np.arange(10_000_000, 10_005_000, dtype=np.uint64)
    fp = b.contains_many(probe).mean()
    assert fp < 0.05


def test_cuckoo_insert_contains_delete():
    c = CuckooFilter(n_buckets=1 << 10)
    keys = [k * 2654435761 % (1 << 61) for k in range(1, 2000)]
    for k in keys:
        assert c.add(k)
    assert all(c.contains(k) for k in keys)
    for k in keys[:500]:
        assert c.delete(k)
    assert c.n_items == len(keys) - 500


def test_cuckoo_load_and_failure_counted():
    c = CuckooFilter(n_buckets=1 << 4, max_kicks=16)  # tiny: force overflow
    added = 0
    for k in range(1, 500):
        if c.add(k * 7919):
            added += 1
    assert c.n_failed > 0
    assert added == c.n_items


def test_scalable_filters_rebuild_keeps_members():
    f = ScalableSeenFilters(n_bits=1 << 10, n_buckets=1 << 4)
    keys = [k * 2654435761 % (1 << 61) for k in range(1, 3000)]
    for i in range(0, len(keys), 100):
        f.add_batch(keys[i : i + 100])
    assert f.rebuilds > 0
    assert f.cuckoo.load < 0.85
    # bloom has no false negatives after rebuilds
    assert f.contains_many(np.asarray(keys, dtype=np.uint64)).all()
    assert all(f.cuckoo.contains(k) for k in keys[:200])


def test_layered_probe_cuckoo_screens_bloom_false_positives():
    """The probe path is bloom → cuckoo → exact: the cuckoo layer must
    kill most bloom false positives, so the exact-authority probe count
    (= cuckoo_maybe) is strictly below the bloom maybe count on a
    non-member workload against a deliberately saturated bloom."""
    f = ScalableSeenFilters(n_bits=1 << 10, n_buckets=1 << 12)  # tiny bloom
    members = [k * 2654435761 % (1 << 61) for k in range(1, 2000)]
    f.add_batch(members)
    probe = np.arange(10_000_000, 10_005_000, dtype=np.uint64)
    maybe = f.contains_many(probe)
    s = f.stats()
    assert s["bloom_maybe"] > 100  # the bloom is saturated: many FPs…
    assert s["cuckoo_maybe"] < s["bloom_maybe"] * 0.1  # …cuckoo kills ≥90 %
    assert int(maybe.sum()) == s["cuckoo_maybe"]
    # and still no false negatives end to end
    f2 = ScalableSeenFilters(n_bits=1 << 10, n_buckets=1 << 12)
    f2.add_batch(members)
    assert f2.contains_many(np.asarray(members, dtype=np.uint64)).all()


def test_insert_failure_never_breaks_exact_authority():
    """ADVICE r2: a CuckooFilter.add that fails after max_kicks must not
    turn into a definitive negative for a genuinely-added key.  Path 1:
    add_batch sees n_failed and rebuilds at 2x (failure absorbed).
    Path 2: if n_failed somehow persists, contains_many must skip the
    cuckoo layer entirely (bloom-only, no false negatives)."""
    f = ScalableSeenFilters(n_bits=1 << 12, n_buckets=1 << 4)
    keys = [k * 2654435761 % (1 << 61) for k in range(1, 400)]
    f.add_batch(keys)
    # path 1: whatever happened internally, the pair is complete now
    assert f.stats()["cuckoo_failed"] == 0
    assert f.contains_many(np.asarray(keys, dtype=np.uint64)).all()
    # path 2: force a persistent failure and verify the bloom fallback
    f.cuckoo.n_failed = 1
    assert f.contains_many(np.asarray(keys, dtype=np.uint64)).all()
    # and the probe path really did skip the cuckoo layer
    before = f.stats()["cuckoo_maybe"]
    f.contains_many(np.asarray(keys[:50], dtype=np.uint64))
    assert f.stats()["cuckoo_maybe"] == before
