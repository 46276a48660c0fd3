"""Edge-case tests for the late-round-5 operators: bigram LM scoring,
per-source KL divergence, and the Q13 order-count distribution.

Each is verified against an independent scalar Python simulator on
planted tmp_path fixtures (the SQL-parity path is covered for all
three by tests/test_sql_oracles.py's full-surface parametrization)."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines import (
    relational,
    traindata,
)


@pytest.fixture(autouse=True)
def _ray(ray_session):
    yield


def _to_df(res):
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()


def _write_docs(tmp_path, rows):
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
            "n_chars": pa.array(
                [len(r[1] or "") for r in rows], pa.int64()
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _toks(text):
    import re

    return [
        w
        for w in re.split(r"[^a-z]+", (text or "").lower())
        if w and len(w) <= 25
    ]


def test_lm_bigram_score_matches_scalar_sim(tmp_path):
    """Planted corpus vs a brute-force scalar simulator; docs with
    fewer than two tokens are absent (no bigrams), like the SQL agg."""
    rows = [
        (0, "a b a b c", "s"),
        (1, "a b", "s"),
        (2, "x", "s"),          # single token: no bigrams -> absent
        (3, "", "s"),           # empty: absent
        (4, "b c b c b c", "s"),
    ]
    sf = _write_docs(tmp_path, rows)

    # scalar sim: per-doc bigram counts, corpus counts, rational score
    from collections import Counter

    per_doc, corpus = {}, Counter()
    for did, text, _ in rows:
        t = _toks(text)
        bg = Counter(
            f"{t[i]} {t[i + 1]}" for i in range(len(t) - 1)
        )
        if bg:
            per_doc[did] = bg
            corpus.update(bg)
    total = sum(corpus.values())
    expect = {
        did: (
            sum(bg.values()),
            math.floor(
                sum(c * corpus[b] for b, c in bg.items())
                / sum(bg.values())
                / total
                * 1e6
                + 0.5
            )
            / 1e6,
        )
        for did, bg in per_doc.items()
    }

    out = _to_df(traindata.q_lm_bigram_score(sf)).set_index("doc_id")
    assert set(out.index) == set(expect)
    for did, (n, score) in expect.items():
        assert int(out.loc[did, "n_bigrams"]) == n
        assert abs(float(out.loc[did, "lm2_score"]) - score) < 1e-9


def test_source_divergence_single_source_is_zero(tmp_path):
    """With one source, p_s == p so KL must be exactly 0 (up to the
    1e-6 quantization grid, which is exact at 0)."""
    sf = _write_docs(
        tmp_path,
        [(0, "a b c a", "only"), (1, "b c d", "only")],
    )
    out = _to_df(traindata.q_source_divergence(sf))
    assert list(out["source"]) == ["only"]
    assert float(out["kl"].iloc[0]) == 0.0
    assert int(out["n_tokens"].iloc[0]) == 7


def test_source_divergence_matches_scalar_sim(tmp_path):
    """Two skewed sources vs a brute-force simulator that applies the
    same 1e-6 log-ratio grid; disjoint-vocab sources maximize KL."""
    rows = [
        (0, "a a b", "s1"),
        (1, "a b b b", "s1"),
        (2, "x y z x", "s2"),
        (3, "z z y", "s2"),
        (4, "a x", "s3"),  # straddles both vocabularies
    ]
    sf = _write_docs(tmp_path, rows)

    from collections import Counter

    sw, corpus = {}, Counter()
    for _, text, src in rows:
        c = Counter(_toks(text))
        sw.setdefault(src, Counter()).update(c)
        corpus.update(c)
    total = sum(corpus.values())
    expect = {}
    for src, c in sw.items():
        ns = sum(c.values())
        p = sum(
            cnt
            * math.floor(
                (math.log(cnt) - math.log(corpus[w])) * 1e6 + 0.5
            )
            for w, cnt in c.items()
        )
        raw = p / 1e6 / ns + math.log(total) - math.log(ns)
        expect[src] = (ns, math.floor(raw * 1e6 + 0.5) / 1e6)

    out = _to_df(traindata.q_source_divergence(sf)).set_index("source")
    assert set(out.index) == set(expect)
    for src, (ns, kl) in expect.items():
        assert int(out.loc[src, "n_tokens"]) == ns
        assert abs(float(out.loc[src, "kl"]) - kl) < 1e-9
        assert float(out.loc[src, "kl"]) >= 0.0  # KL is non-negative


def test_order_count_distribution_zero_bin(tmp_path):
    """Customers with no orders land in the c_count=0 bin; the
    histogram is exact and sorted (custdist DESC, c_count DESC)."""
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "c_name": pa.array([f"c{i}" for i in range(5)]),
                "c_nationkey": pa.array([0] * 5, pa.int64()),
                "c_acctbal": pa.array([0.0] * 5, pa.float64()),
                "c_mktsegment": pa.array(["A"] * 5),
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    # cust 1 -> 3 orders, cust 2 -> 1 order; 3, 4, 5 -> none
    ok = [10, 11, 12, 13]
    ck = [1, 1, 1, 2]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(ok, pa.int64()),
                "o_custkey": pa.array(ck, pa.int64()),
                "o_orderstatus": pa.array(["O"] * 4),
                "o_totalprice": pa.array([1.0] * 4, pa.float64()),
                "o_orderdate": pa.array(
                    [pd.Timestamp("2024-01-01")] * 4,
                    pa.timestamp("us"),
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * 4),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )

    out = _to_df(relational.q_order_count_distribution(str(tmp_path)))
    got = dict(zip(out["c_count"], out["custdist"]))
    assert got == {0: 3, 1: 1, 3: 1}
    # driver's sort contract
    pairs = list(zip(out["custdist"], out["c_count"]))
    assert pairs == sorted(pairs, key=lambda p: (-p[0], -p[1]))
