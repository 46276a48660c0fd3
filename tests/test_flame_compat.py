"""Flame-operator compatibility layer (SURVEY §2.1 #1–#25) semantics."""

import pytest

from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines import (
    flame_compat as fc,
)


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def test_parallelize_collect_count():
    ds = fc.parallelize(["a", "b", "c"])
    assert sorted(fc.collect(ds)) == ["a", "b", "c"]
    assert fc.count(ds) == 3


def test_flat_map():
    ds = fc.parallelize(["a b", "c"])
    out = fc.flat_map(ds, lambda s: s.split())
    assert sorted(fc.collect(out)) == ["a", "b", "c"]


def test_filter_dedups_equal_values():
    # reference quirk: filter output keyed by hash(value) ⇒ dedup (#8)
    ds = fc.parallelize(["x", "x", "y", "z"])
    out = fc.filter_rdd(ds, lambda v: v != "z")
    assert sorted(fc.collect(out)) == ["x", "y"]


def test_distinct():
    ds = fc.parallelize(["a", "a", "b"])
    assert sorted(fc.collect(fc.distinct(ds))) == ["a", "b"]


def test_intersection():
    a = fc.parallelize(["1", "2", "2", "3"])
    b = fc.parallelize(["2", "3", "4"])
    assert sorted(fc.collect(fc.intersection(a, b))) == ["2", "3"]


def test_sample_deterministic():
    ds = fc.parallelize([str(i) for i in range(200)])
    s1 = sorted(fc.collect(fc.sample(ds, 0.25, seed=7)))
    s2 = sorted(fc.collect(fc.sample(ds, 0.25, seed=7)))
    assert s1 == s2
    assert 20 < len(s1) < 90


def test_group_by():
    ds = fc.parallelize(["apple", "avocado", "banana"])
    out = fc.pair_collect(fc.group_by(ds, lambda v: v[0]))
    assert dict(out) == {"a": "apple,avocado", "b": "banana"}


def test_fold_global():
    ds = fc.parallelize([str(i) for i in range(1, 11)])
    total = fc.fold(ds, "0", lambda a, b: str(int(a) + int(b)))
    assert total == "55"


def test_fold_by_key():
    pairs = fc.map_to_pair(
        fc.parallelize(["a:1", "a:2", "b:3"]),
        lambda v: tuple(v.split(":")),
    )
    out = dict(
        fc.pair_collect(
            fc.fold_by_key(pairs, "0", lambda a, b: str(int(a) + int(b)))
        )
    )
    assert out == {"a": "3", "b": "3"}


def test_join_cross_product_with_comma():
    left = fc.map_to_pair(fc.parallelize(["k:x", "k:y"]), lambda v: tuple(v.split(":")))
    right = fc.map_to_pair(fc.parallelize(["k:1", "k:2", "m:9"]), lambda v: tuple(v.split(":")))
    out = sorted(fc.pair_collect(fc.join(left, right)))
    assert out == [("k", "x,1"), ("k", "x,2"), ("k", "y,1"), ("k", "y,2")]


def test_take_and_save(tmp_path):
    ds = fc.parallelize(["a", "b", "c", "d"])
    assert len(fc.take(ds, 2)) == 2
    path = str(tmp_path / "t")
    fc.save_as_table(ds, path)
    import pyarrow.parquet as pq

    assert sorted(pq.read_table(path)["value"].to_pylist()) == ["a", "b", "c", "d"]


def test_pair_save_last_write_wins(tmp_path):
    pairs = fc.map_to_pair(
        fc.parallelize(["k:1", "k:3", "k:2"]), lambda v: tuple(v.split(":"))
    )
    path = str(tmp_path / "p")
    fc.pair_save_as_table(pairs, path)
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    assert dict(zip(t["key"].to_pylist(), t["value"].to_pylist())) == {"k": "3"}


def test_from_table_projection():
    import ray.data

    ds = ray.data.from_items([{"a": 1, "b": "x"}, {"a": 2, "b": None}])
    out = fc.from_table(ds, lambda row: row["b"])
    assert fc.collect(out) == ["x"]
