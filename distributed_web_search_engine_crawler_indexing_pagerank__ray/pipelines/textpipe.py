"""Text pipelines over the `documents` table: tokenize / index / tf-idf /
quality / language-ID / fingerprinting.

The tokenizer is the reference Indexer's (lowercase, split ``[^a-z]+``,
length ≤ 25, stopword drop — ``src/jobs/Indexer.java:214-241``,
``src/tools/StopWords.java:27-66``); SQL oracles replicate it with
``string_split_regex`` + an inlined stoplist.
"""

from __future__ import annotations

import math

import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..sources.tables import read_parquet_clean
from ray.data.aggregate import Count, Sum

from ..functions.textstats import (
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    quality_stats,
)
from ..functions.tokenize import MAX_WORD_LENGTH, STOP_WORDS, word_counts

_STOPLIST_SQL = ", ".join(
    "'" + w.replace("'", "''") + "'" for w in sorted(STOP_WORDS)
)

# shared SQL fragment: the reference tokenizer over documents.text
SQL_TOK = f"""
    SELECT doc_id, word FROM (
        SELECT doc_id,
               unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
        FROM documents)
    WHERE word <> '' AND length(word) <= {MAX_WORD_LENGTH}
      AND word NOT IN ({_STOPLIST_SQL})
"""


def _docs(sf_dir: str, columns=("doc_id", "text")):
    return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=list(columns))


# -- #4 flatMap + #19 foldByKey: word count ----------------------------------


def q_wordcount(sf_dir: str):
    """flatMap(tokenize) → groupby(word).count, pre-aggregated per batch
    (partial combine before the shuffle — SURVEY §4.2 mapping of the
    KVS-put shuffle)."""

    def partial(t: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for text in t["text"].to_pylist():
            for w, c in word_counts(text or "").items():
                counts[w] = counts.get(w, 0) + c
        return pa.table(
            {
                "word": pa.array(list(counts.keys()), pa.string()),
                "c": pa.array(list(counts.values()), pa.int64()),
            }
        )

    ds = _docs(sf_dir).map_batches(partial, batch_format="pyarrow")
    out = ds.groupby("word").aggregate(Sum("c", alias_name="cnt"))
    return out.sort(["cnt", "word"], descending=[True, False]).limit(100)


SQL_WORDCOUNT = f"""
SELECT word, count(*) AS cnt
FROM ({SQL_TOK})
GROUP BY word
ORDER BY cnt DESC, word
LIMIT 100
"""


# -- I3–I5: inverted index (posting lists via groupby, replacing
#    appendCapped RPCs — SURVEY §2.1 note on KVSClient.java:284-437) ---------

INDEX_MIN_FREQ = 2  # Indexer.java:233-241
INDEX_CAP = 100  # appendCapped maxCols*cap (Indexer.java:252-267)


def q_inverted_index(sf_dir: str):
    """word → capped ordered posting list + count.

    The reference builds this with per-word locked ``appendCapped`` RPCs
    (arrival order, racy across workers); the Ray formulation is one
    ``groupby(word)`` shuffle with deterministic ``doc_id`` order."""

    def pairs(t: pa.Table) -> pa.Table:
        words, docs = [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            wc = word_counts(text or "")
            for w, c in wc.items():
                if c >= INDEX_MIN_FREQ:
                    words.append(w)
                    docs.append(doc_id)
        return pa.table(
            {"word": pa.array(words, pa.string()), "doc_id": pa.array(docs, pa.int64())}
        )

    ds = _docs(sf_dir).map_batches(pairs, batch_format="pyarrow")

    def build(group: pd.DataFrame) -> pd.DataFrame:
        docs = sorted(group["doc_id"].unique())[:INDEX_CAP]
        return pd.DataFrame(
            {
                "word": [group["word"].iloc[0]],
                "postings": [",".join(str(d) for d in docs)],
                "cnt": [len(docs)],
            }
        )

    return ds.groupby("word").map_groups(build, batch_format="pandas")


SQL_INVERTED_INDEX = f"""
WITH tok AS ({SQL_TOK.replace('SELECT doc_id, word FROM (', 'SELECT doc_id, word FROM (')}),
cnt AS (
    SELECT doc_id, word, count(*) AS c FROM tok GROUP BY doc_id, word
    HAVING count(*) >= {INDEX_MIN_FREQ}
),
r AS (
    SELECT word, doc_id,
           row_number() OVER (PARTITION BY word ORDER BY doc_id) AS rn
    FROM cnt
)
SELECT word,
       string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings,
       count(*) AS cnt
FROM r WHERE rn <= {INDEX_CAP}
GROUP BY word
"""


# -- T2–T4: tf-idf over documents -------------------------------------------

TFIDF_TOP_TERMS = 60  # TfIdf.java:38


def q_tfidf_docs(sf_dir: str):
    """Per-doc top-60 terms scored ``tf=1+ln(c)``, ``idf=ln((N+1)/(df+1))``
    (``src/jobs/TfIdf.java:212-226``), deterministic tie-break by term
    (the reference's HashMap order is nondeterministic — SURVEY §7.3).
    df = distinct docs containing the term (min-freq 1 for this
    testdata query; the crawl-corpus TfIdf pipeline uses the capped
    index df, tested against the oracle in tests/)."""
    N = _docs(sf_dir, columns=("doc_id",)).count()

    def top_terms(t: pa.Table) -> pa.Table:
        doc_ids, words, cs = [], [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            wc = word_counts(text or "")
            top = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:TFIDF_TOP_TERMS]
            for w, c in top:
                doc_ids.append(doc_id)
                words.append(w)
                cs.append(c)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "word": pa.array(words, pa.string()),
                "c": pa.array(cs, pa.int64()),
            }
        )

    terms = _docs(sf_dir).map_batches(top_terms, batch_format="pyarrow").materialize()
    df_tbl = terms.groupby("word").aggregate(Count(alias_name="df")).to_pandas()
    df_ref = ray.put(dict(zip(df_tbl["word"], df_tbl["df"])))

    def score(t: pa.Table) -> pa.Table:
        df = ray.get(df_ref)
        words = t["word"].to_pylist()
        cs = t["c"].to_pylist()
        tf = [1.0 + math.log(c) for c in cs]
        idf = [math.log((N + 1) / (df[w] + 1)) for w in words]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "word": t["word"],
                "tf": pa.array([round(x, 6) for x in tf], pa.float64()),
                "idf": pa.array([round(x, 6) for x in idf], pa.float64()),
                "tfidf": pa.array(
                    [round(a * b, 6) for a, b in zip(tf, idf)], pa.float64()
                ),
            }
        )

    return terms.map_batches(score, batch_format="pyarrow")


SQL_TFIDF_DOCS = f"""
WITH tok AS ({SQL_TOK}),
cnt AS (SELECT doc_id, word, count(*) AS c FROM tok GROUP BY doc_id, word),
top AS (
    SELECT doc_id, word, c,
           row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, word) AS rn
    FROM cnt
),
kept AS (SELECT doc_id, word, c FROM top WHERE rn <= {TFIDF_TOP_TERMS}),
df AS (SELECT word, count(*) AS df FROM kept GROUP BY word),
n AS (SELECT count(*) AS n FROM documents)
SELECT k.doc_id, k.word,
       round(1 + ln(k.c), 6)                          AS tf,
       round(ln((n.n + 1.0) / (df.df + 1.0)), 6)      AS idf,
       round((1 + ln(k.c)) * ln((n.n + 1.0) / (df.df + 1.0)), 6) AS tfidf
FROM kept k, df, n
WHERE k.word = df.word
"""


# -- text-analysis operators (training-data pipeline additions) --------------


def q_quality(sf_dir: str):
    """Quality scoring: char/token counts per doc (SQL-checkable subset;
    the full stats incl. punct/stopword ratios are in ``q_text_stats``)."""

    def fn(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        n_chars = [len(x or "") for x in texts]
        n_tokens = [len((x or "").split()) for x in texts]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": pa.array(n_chars, pa.int64()),
                "n_tokens": pa.array(n_tokens, pa.int64()),
            }
        )

    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow")


# python str.split() ≡ split on whitespace runs, ignoring edges
SQL_QUALITY = r"""
SELECT doc_id,
       length(text) AS n_chars,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens
FROM documents
"""


class TextStats:
    """Actor-pool stage: full quality metrics + language ID + BPE-ish
    token count + rolling-hash fingerprint (stateful setup: compiled
    regexes + stopword set amortized per actor)."""

    def __init__(self):
        pass  # kernels precompile at module import

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        stats = [quality_stats(x or "") for x in texts]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": pa.array([lang_id(x or "") for x in texts], pa.string()),
                "n_bpe_tokens": pa.array(
                    [bpe_ish_token_count(x or "") for x in texts], pa.int64()
                ),
                "fingerprint": pa.array(
                    [fingerprint(x or "") for x in texts], pa.uint64()
                ),
                "stop_ratio": pa.array(
                    [round(s["stopword_ratio"], 6) for s in stats], pa.float64()
                ),
                "avg_token_len": pa.array(
                    [round(s["avg_token_len"], 6) for s in stats], pa.float64()
                ),
            }
        )


def q_text_stats(sf_dir: str):
    """Language-ID + quality + fingerprint, as an actor-pool stage
    (rows-only driver check; unit-tested against the pure kernels)."""
    return _docs(sf_dir).map_batches(
        TextStats, batch_format="pyarrow", batch_size=512, concurrency=2
    )
