"""Scale-adaptive bucketing (functions/partitioning.py) — the r3
verdict's top item: the partitioned map_groups family must derive its
bucket count B from input size (bounded per-group memory, growing
parallelism) and must produce IDENTICAL results for any B / salt level.
"""

from __future__ import annotations

import pandas as pd
import pytest

from distributed_web_search_engine_crawler_indexing_pagerank__ray.functions.partitioning import (
    bucket_count,
    next_pow2,
    parquet_rows,
    parquet_token_estimate,
    salt_count,
)
from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines import (
    events,
    relational,
    traindata,
)

SF = "/root/testdata/sf0.001"


def _df(out) -> pd.DataFrame:
    if hasattr(out, "to_pandas"):
        out = out.to_pandas()
    out = out[sorted(out.columns)]
    return out.sort_values(list(out.columns)).reset_index(drop=True)


# -- the sizing math -----------------------------------------------------------


def test_next_pow2():
    assert [next_pow2(n) for n in (0, 1, 2, 3, 4, 5, 17, 1024)] == [
        1, 1, 2, 4, 4, 8, 32, 1024,
    ]


def test_bucket_count_scales_with_input():
    # the verdict's acceptance bar: forced-small rows-per-bucket must
    # push B well past the old fixed constants (>= 256)
    assert bucket_count(100_000, target_rows_per_bucket=100) >= 256
    assert bucket_count(100_000, target_rows_per_bucket=100) == 1024
    # bounded per-group memory: est_rows / B <= target (pre-clamp)
    for est in (10**6, 10**9, 5 * 10**9):
        b = bucket_count(est, target_rows_per_bucket=500_000)
        assert est / b <= 500_000
        assert b & (b - 1) == 0  # power of two — `key & (B-1)` stays valid
    # small inputs stay at the floor (test-scale behavior unchanged)
    assert bucket_count(1_000) == 16
    assert bucket_count(0, min_buckets=32) == 32


def test_bucket_count_env_knob(monkeypatch):
    monkeypatch.setenv("GRAFT_ROWS_PER_BUCKET", "10")
    assert bucket_count(100_000) >= 256


def test_row_estimates():
    assert parquet_rows(f"{SF}/orders.parquet") > 0
    assert parquet_rows(
        f"{SF}/orders.parquet", f"{SF}/lineitem.parquet"
    ) == parquet_rows(f"{SF}/orders.parquet") + parquet_rows(
        f"{SF}/lineitem.parquet"
    )
    # token estimate at least covers one token per doc
    assert parquet_token_estimate(f"{SF}/documents.parquet") >= parquet_rows(
        f"{SF}/documents.parquet"
    )


def test_salt_count_env(monkeypatch):
    assert salt_count() == 1  # off by default
    monkeypatch.setenv("GRAFT_JOIN_SALT", "4")
    assert salt_count() == 4
    monkeypatch.setenv("GRAFT_JOIN_SALT", "3")
    assert salt_count() == 4  # rounded up to a power of two


# -- B-invariance: forced-large B gives bit-identical results ------------------

FORCED = [
    ("join_shuffle", relational.q_join_shuffle),
    ("anti_join", relational.q_anti_join),
    ("join_left", relational.q_join_left),
    ("revenue_by_segment", relational.q_revenue_by_segment),
    ("moving_average", events.q_moving_average),
    ("asof_join", events.q_asof_join),
    ("contamination_check", traindata.q_contamination_check),
    ("lm_unigram_score", traindata.q_lm_unigram_score),
]


@pytest.mark.slow
@pytest.mark.parametrize("name,fn", FORCED, ids=[n for n, _ in FORCED])
def test_bucket_count_invariance(ray_session, monkeypatch, name, fn):
    """Tiny rows-per-bucket target => B >= 256 (vs the old fixed 16/32),
    and the result is identical — per-bucket work is a pure partition of
    the key space, so B only changes memory/parallelism, never values."""
    base = _df(fn(SF))
    monkeypatch.setenv("GRAFT_ROWS_PER_BUCKET", "50")
    forced = _df(fn(SF))
    pd.testing.assert_frame_equal(base, forced)


@pytest.mark.slow
def test_salted_join_invariance(ray_session, monkeypatch):
    """GRAFT_JOIN_SALT=4 splits hot keys across sub-buckets on the
    additive-partial joins; results must not change."""
    base_js = _df(relational.q_join_shuffle(SF))
    base_rs = _df(relational.q_revenue_by_segment(SF))
    monkeypatch.setenv("GRAFT_JOIN_SALT", "4")
    pd.testing.assert_frame_equal(base_js, _df(relational.q_join_shuffle(SF)))
    pd.testing.assert_frame_equal(
        base_rs, _df(relational.q_revenue_by_segment(SF))
    )
