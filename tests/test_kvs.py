"""Sharded point-access KVS: reference API semantics incl. the
conditional put (``src/kvs/Worker.java:311-345``) and its atomicity."""

import ray

from distributed_web_search_engine_crawler_indexing_pagerank__ray.state.kvs import (
    KVSClient,
)


def test_put_get_row_ops(ray_session):
    kvs = KVSClient(n_shards=3)
    v1 = kvs.put("t", "r1", "a", b"x")
    v2 = kvs.put("t", "r1", "b", b"y")
    assert v2 == v1 + 1  # versions bump per successful put
    assert kvs.get("t", "r1", "a") == b"x"
    assert kvs.get("t", "r1", "missing") is None
    assert kvs.get("t", "nope", "a") is None
    assert kvs.get_row("t", "r1") == {"a": b"x", "b": b"y"}
    assert kvs.exists_row("t", "r1") and not kvs.exists_row("t", "r2")
    kvs.put_row("t", "r2", {"c": b"z"})
    assert kvs.count("t") == 2
    assert kvs.delete_row("t", "r1") and not kvs.delete_row("t", "r1")
    assert kvs.count("t") == 1


def test_conditional_put_semantics(ray_session):
    """Worker.java:311-345: FAIL when the row is missing, the guard
    column is missing, or the value mismatches; nothing written on
    FAIL."""
    kvs = KVSClient(n_shards=2)
    # row doesn't exist → FAIL
    assert not kvs.put_if("t", "r", "c", b"v", "state", b"free")
    assert not kvs.exists_row("t", "r")
    kvs.put("t", "r", "other", b"1")
    # guard column missing → FAIL
    assert not kvs.put_if("t", "r", "c", b"v", "state", b"free")
    assert kvs.get("t", "r", "c") is None
    kvs.put("t", "r", "state", b"busy")
    # mismatch → FAIL
    assert not kvs.put_if("t", "r", "c", b"v", "state", b"free")
    assert kvs.get("t", "r", "c") is None
    # match → commits
    assert kvs.put_if("t", "r", "c", b"v", "state", b"busy")
    assert kvs.get("t", "r", "c") == b"v"


def test_conditional_put_is_atomic_under_contention(ray_session):
    """8 parallel compare-and-set attempts on one row: the shard actor
    serializes them, so EXACTLY one claims the lock (the reference's
    per-JVM locks could not guarantee this across workers)."""
    kvs = KVSClient(n_shards=2)
    kvs.put("locks", "job-1", "state", b"free")
    shard = kvs._shard("job-1")
    refs = [
        shard.put_if.remote(
            "locks", "job-1", "state", f"taken-by-{i}".encode(),
            "state", b"free",
        )
        for i in range(8)
    ]
    results = ray.get(refs)
    assert sum(1 for r in results if r >= 0) == 1
    assert kvs.get("locks", "job-1", "state").startswith(b"taken-by-")


def test_scan_sorted_rename_delete(ray_session):
    kvs = KVSClient(n_shards=3)
    keys = [f"k{i:03d}" for i in range(40)]
    for k in keys:
        kvs.put("t", k, "v", k.encode())
    got = kvs.scan("t")
    assert [k for k, _ in got] == sorted(keys)  # merged across shards
    kvs.rename("t", "t2")
    assert kvs.count("t") == 0 and kvs.count("t2") == 40
    assert kvs.get("t2", "k001", "v") == b"k001"
    kvs.delete_table("t2")
    assert kvs.count("t2") == 0


def test_frontier_shard_spill_roundtrip(ray_session):
    """Direct FrontierShard spill semantics: with a tiny threshold the
    committed slice lives in parquet, and range pulls / pull_all return
    exactly what the in-memory path would."""
    import ray
    import pyarrow as pa

    from distributed_web_search_engine_crawler_indexing_pagerank__ray.state.actors import (
        FrontierShard,
    )

    mem = FrontierShard.remote(0, 1, 16, 0)        # in-memory reference
    sp = FrontierShard.remote(0, 1, 16, 4)         # spills past 4 rows
    t = pa.table(
        {
            "url": pa.array([f"u{i}" for i in range(40)], pa.string()),
            "part": pa.array([i % 16 for i in range(40)], pa.int32()),
        }
    )
    for sh in (mem, sp):
        ray.get(sh.push_routed.remote(t))
        counts = ray.get(sh.commit.remote())
        assert int(counts.sum()) == 40
    for lo, hi in [(0, 15), (3, 5), (7, 7), (12, 15), (0, 0)]:
        a = ray.get(mem.pull.remote(lo, hi))["url"].to_pylist()
        b = ray.get(sp.pull.remote(lo, hi))["url"].to_pylist()
        assert a == b and len(a) == sum(
            1 for i in range(40) if lo <= i % 16 <= hi
        )
    assert (
        ray.get(mem.pull_all.remote()).to_pylist()
        == ray.get(sp.pull_all.remote()).to_pylist()
    )
    # a second commit with no pushes drops the spill and empties
    for sh in (mem, sp):
        assert int(ray.get(sh.commit.remote()).sum()) == 0
        assert ray.get(sh.pull.remote(0, 15)).num_rows == 0
