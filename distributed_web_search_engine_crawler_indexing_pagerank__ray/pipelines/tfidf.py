"""TF-IDF job (reference TfIdf, SURVEY §2.6 T1–T6).

Per-doc top-60 terms by raw count (tie-break: term ascending — the
reference's HashMap order is nondeterministic, SURVEY §7.3), scored
``tf = 1+ln(c)``, ``idf = ln((N+1)/(df+1))`` with df = the capped
inverted-index posting count (``pt-index.__count``), keep ``tfidf > 0``
(``src/jobs/TfIdf.java:212-226``).

Ray shape: one ``map_batches`` pass per doc (tokenize via the richer
TfIdf cleaner + top-k) with the df map broadcast via ``ray.put``
(replacing the reference's per-worker cached point lookups into
pt-index, ``TfIdf.java:272-291``).
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data

from ..functions.hasher import ref_hash
from ..functions.html import extract_body_text_tfidf
from ..functions.textstats import idf as idf_fn
from ..functions.textstats import tf as tf_fn
from ..functions.tokenize import word_counts
from ..oracle.downstream_oracle import MAX_HTML_BYTES, TFIDF_MAX_TERMS

TFIDF_SCHEMA = pa.schema(
    [
        ("key", pa.string()),
        ("word", pa.string()),
        ("url", pa.string()),
        ("tf", pa.float64()),
        ("idf", pa.float64()),
        ("tfidf", pa.float64()),
    ]
)


def make_scorer(index_tbl: pa.Table, n: int):
    """Per-batch scoring fn (T1–T4) with the df map broadcast once via
    ``ray.put``; shared by :func:`run_tfidf` and the resumable job (T6)."""
    df_map = dict(
        zip(index_tbl["word"].to_pylist(), index_tbl["count"].to_pylist())
    )
    df_ref = ray.put(df_map)

    def score(batch: pa.Table) -> pa.Table:
        df = ray.get(df_ref)
        keys, words, urls, tfs, idfs, scores = [], [], [], [], [], []
        for url, page in zip(batch["url"].to_pylist(), batch["page"].to_pylist()):
            html = (page or b"")[:MAX_HTML_BYTES].decode("utf-8", errors="replace")
            text = extract_body_text_tfidf(html)
            wc = word_counts(text)
            top = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:TFIDF_MAX_TERMS]
            for word, c in top:
                tf = tf_fn(c)
                idf = idf_fn(n, df.get(word, 0))
                s = tf * idf
                if s > 0:
                    keys.append(ref_hash(word + "|" + url))
                    words.append(word)
                    urls.append(url)
                    tfs.append(tf)
                    idfs.append(idf)
                    scores.append(s)
        return pa.table(
            {
                "key": pa.array(keys, pa.string()),
                "word": pa.array(words, pa.string()),
                "url": pa.array(urls, pa.string()),
                "tf": pa.array(tfs, pa.float64()),
                "idf": pa.array(idfs, pa.float64()),
                "tfidf": pa.array(scores, pa.float64()),
            }
        )

    return score


def run_tfidf(pages, index_tbl: pa.Table, total_docs: int | None = None) -> pa.Table:
    """pages: Dataset or Table of crawl page rows; index_tbl: the
    ``build_index`` output (df source).  Returns pt-tfidf rows."""
    if isinstance(pages, pa.Table):
        ds = ray.data.from_arrow(pages.select(["url", "page"]))
        n = pages.num_rows
    else:
        ds = pages
        n = total_docs if total_docs is not None else ds.count()
    score = make_scorer(index_tbl, n)
    parts = list(
        ds.map_batches(score, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)
    )
    if not parts:
        return TFIDF_SCHEMA.empty_table()
    return pa.concat_tables(parts).cast(TFIDF_SCHEMA).sort_by("key")
