"""Content-defined chunking conformance: the vectorized block kernel
(`q_cdc_chunks`) against the scalar single-definition simulator
(`cdc_boundaries` / `cdc_fingerprint`) — exact row equality over the
sf0.001 corpus plus adversarial synthetic docs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.traindata import (
    CDC_MAX,
    CDC_MIN,
    cdc_boundaries,
    cdc_fingerprint,
    q_cdc_chunks,
)

SF = "/root/testdata/sf0.001"


def _simulate(doc_id: int, text: str) -> list[dict]:
    data = (text or "").encode("utf-8")
    rows, start = [], 0
    for ci, end in enumerate(cdc_boundaries(data)):
        rows.append(
            {
                "doc_id": doc_id,
                "chunk_id": ci,
                "start": start,
                "length": end - start,
                "fp": cdc_fingerprint(data[start:end]),
            }
        )
        start = end
    return rows


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[["doc_id", "chunk_id", "start", "length", "fp"]].copy()
    df["fp"] = df["fp"].astype(np.uint64)
    return df.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)


def test_cdc_matches_simulator_on_corpus(ray_session):
    out = _norm(q_cdc_chunks(SF).to_pandas())
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    exp = []
    for did, txt in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        exp.extend(_simulate(did, txt))
    exp = _norm(pd.DataFrame(exp))
    assert len(out) == len(exp) and len(out) > 0
    pd.testing.assert_frame_equal(out, exp)


def test_cdc_invariants_on_corpus(ray_session):
    out = q_cdc_chunks(SF).to_pandas()
    g = out.groupby("doc_id")
    # chunks tile each doc exactly
    assert (g["chunk_id"].min() == 0).all()
    recon = g.apply(
        lambda d: (
            d.sort_values("chunk_id")["start"].to_numpy()
            == np.concatenate(
                [[0], d.sort_values("chunk_id")["length"].cumsum().to_numpy()[:-1]]
            )
        ).all(),
        include_groups=False,
    )
    assert recon.all()
    assert (out["length"] <= CDC_MAX).all() and (out["length"] > 0).all()
    # every non-final chunk respects the min size
    last = g["chunk_id"].transform("max")
    assert (out.loc[out["chunk_id"] < last, "length"] >= CDC_MIN).all()


def test_cdc_simulator_edge_cases():
    assert cdc_boundaries(b"") == []
    assert cdc_boundaries(b"x") == [1]
    n = 5 * CDC_MAX + 7
    cuts = cdc_boundaries(b"\x00" * n)
    assert cuts[-1] == n and max(np.diff([0] + cuts)) <= CDC_MAX
    # shift-stability: a prefix insertion leaves later boundaries
    # aligned (the CDC property fixed-size blocking lacks) — compare
    # boundary positions relative to a long shared suffix
    rng = np.random.RandomState(7)
    base = rng.randint(0, 256, size=8000, dtype=np.uint8).tobytes()
    shifted = b"INSERTED-PREFIX-" + base
    c1 = {c for c in cdc_boundaries(base)}
    c2 = {c - 16 for c in cdc_boundaries(shifted)}
    # boundaries far from the edit largely re-align
    far1 = {c for c in c1 if c > 2 * CDC_MAX}
    assert far1 and len(far1 & c2) / len(far1) > 0.5
