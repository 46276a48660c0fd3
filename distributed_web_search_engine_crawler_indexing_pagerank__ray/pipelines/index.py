"""Inverted-index job (reference Indexer, SURVEY §2.4 I1–I6).

The reference builds posting lists with per-word locked ``appendCapped``
RPCs (arrival order — racy across workers, ``KVSClient.java:284-294``).
Ray-native formulation: ONE ``groupby(word)`` shuffle over (word, url)
pairs pre-sorted by the deterministic (wave, url_hash) doc order, with
the same dedup/cap semantics (``doc_frequency_cap``) — SURVEY §2.1 #I5
mapping.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions.html import extract_body_text_index
from ..functions.tokenize import doc_token_counts
from ..oracle.downstream_oracle import (
    MAX_HTML_BYTES,
    MIN_PAGE_BYTES,
    MIN_WORD_FREQ,
    doc_frequency_cap,
)

INDEX_SCHEMA = pa.schema(
    [
        ("word", pa.string()),
        ("postings", pa.list_(pa.string())),
        ("count", pa.int64()),
        ("full", pa.bool_()),
    ]
)


def _word_pairs(batch: pa.Table) -> pa.Table:
    """page row → (word, url, wave, url_hash) pairs (I1, I3, I4).

    HTML body extraction stays a per-page compiled-regex pass (the
    reference's slicing semantics aren't expressible as one arrow
    kernel); tokenize + per-doc min-freq counting run vectorized over
    the whole batch via ``doc_token_counts`` (same token semantics as
    the ``index_words`` loop this replaced — tests/test_downstream.py
    proves the index byte-equal to the oracle)."""
    import pyarrow.compute as pc

    texts, urls, waves, hashes = [], [], [], []
    for url, url_hash, wave, page in zip(
        batch["url"].to_pylist(),
        batch["url_hash"].to_pylist(),
        batch["wave"].to_pylist(),
        batch["page"].to_pylist(),
    ):
        if page is None or len(page) < MIN_PAGE_BYTES:
            continue
        html = page[:MAX_HTML_BYTES].decode("utf-8", errors="replace")
        texts.append(extract_body_text_index(html))
        urls.append(url)
        waves.append(wave)
        hashes.append(url_hash)
    empty = pa.table(
        {
            "word": pa.array([], pa.string()),
            "url": pa.array([], pa.string()),
            "wave": pa.array([], pa.int32()),
            "url_hash": pa.array([], pa.string()),
        }
    )
    if not texts:
        return empty
    counts = doc_token_counts(texts)
    counts = counts.filter(pc.greater_equal(counts["c"], MIN_WORD_FREQ))
    if counts.num_rows == 0:
        return empty
    di = counts["doc"]
    return pa.table(
        {
            "word": counts["word"],
            "url": pc.take(pa.array(urls, pa.string()), di),
            "wave": pc.take(pa.array(waves, pa.int32()), di),
            "url_hash": pc.take(pa.array(hashes, pa.string()), di),
        }
    )


def build_index(pages, total_pages: int | None = None) -> pa.Table:
    """pages: ``ray.data.Dataset`` or ``pa.Table`` of crawl page rows
    (url, url_hash, wave, page).  Returns the index table."""
    if isinstance(pages, pa.Table):
        ds = ray.data.from_arrow(
            pages.select(["url", "url_hash", "wave", "page"])
        )
        n = pages.num_rows
    else:
        ds = pages
        n = total_pages if total_pages is not None else ds.count()
    pairs = ds.map_batches(_word_pairs, batch_format="pyarrow")
    return reduce_index(pairs, n)


def reduce_index(pairs, n: int) -> pa.Table:
    """(word, url, wave, url_hash) pairs Dataset → index table (I5):
    ONE ``groupby(word)`` with the reference's dedup/cap semantics.
    Split out of :func:`build_index` so the resumable job (I6) can feed
    checkpointed pair partitions into the same reduce."""
    cap = doc_frequency_cap(n)

    def build(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["wave", "url_hash"])
        seen: set[str] = set()
        postings: list[str] = []
        for u in g["url"]:
            if u in seen:
                continue
            seen.add(u)
            postings.append(u)
            if len(postings) >= cap:
                break
        return pd.DataFrame(
            {
                "word": [g["word"].iloc[0]],
                "postings": [postings],
                "count": [len(postings)],
                "full": [len(postings) >= cap],
            }
        )

    out = pairs.groupby("word").map_groups(build, batch_format="pandas")
    tables = [
        b for b in out.iter_batches(batch_format="pyarrow", batch_size=None)
    ]
    if not tables:
        return INDEX_SCHEMA.empty_table()
    return pa.concat_tables(
        [t.cast(INDEX_SCHEMA) for t in tables]
    ).sort_by("word")


def index_as_dict(index_tbl: pa.Table) -> dict[str, dict]:
    """Oracle-shaped view for tests / the query layer."""
    out = {}
    for i in range(index_tbl.num_rows):
        out[index_tbl["word"][i].as_py()] = {
            "postings": index_tbl["postings"][i].as_py(),
            "count": index_tbl["count"][i].as_py(),
            "full": index_tbl["full"][i].as_py(),
        }
    return out
