"""PageRank job (reference PageRank, SURVEY §2.5 P1–P9).

Reference semantics kept exactly: vertices = crawled pages; per-page
out-links ≤30 (first-found, self-excluded, PageRank's *own* URL
normalizer — ``pagerank_normalize_url``, NOT the crawler's);
contributions scatter to DISTINCT dest hashes (including non-vertex
dests, whose mass leaks — ``PageRank.java:325-379``); dangling mass
redistributed; ``new = (1-d)/N + d·inbound + d·danglingSum/N``;
residual = max|Δ| < 0.001, ≤20 iterations.

Ray-native execution replaces the reference's sequential
coordinator-side rank update (``PageRank.java:294-322``, the driver
bottleneck) with:

- graph build: one ``map_batches`` pass over page rows → metadata +
  edge pairs with dense vertex ids.  Id mapping is a vectorized
  ``np.searchsorted`` against the sorted vertex-key array shared
  through the object store (``ray.put`` of a numpy array is a
  ZERO-COPY read per node — no per-task dict deserialization);
- per iteration: ONE fused Dataset execution — ``map_batches`` over
  edge blocks emits SPARSE (dst, partial_sum) pairs (sort+reduceat
  local combine, memory O(E/block) — never a dense length-V array),
  ``groupby(dst).sum`` is the shuffle (SURVEY §2.5 P5), and the driver
  applies the O(V) vectorized rank update + residual check.  Dangling
  mass rides the same shuffle as dst = -2 rows.

Cluster-scale note: the driver holds the O(V) rank/outdeg vectors and
sorted key array (8–80 B/vertex — the same order as the reference's
coordinator state).  Past ~10^9 vertices the update itself would move
into the groupby output (ranks as a Dataset joined to edges); the
sparse gather below is unchanged by that step.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..functions.hasher import ref_hash
from ..functions.html import extract_links_pagerank, extract_title, generate_snippet
from ..oracle.downstream_oracle import (
    CONVERGENCE,
    DAMPING,
    MAX_HTML_BYTES,
    MAX_ITERATIONS,
)

PAGERANK_SCHEMA = pa.schema(
    [
        ("url_hash", pa.string()),
        ("url", pa.string()),
        ("title", pa.string()),
        ("snippet", pa.string()),
        ("pagerank", pa.float64()),
    ]
)


def _graph_batch(batch: pa.Table) -> pa.Table:
    """page row → metadata + distinct out-dest hashes (P1)."""
    hashes, urls, titles, snippets, dests = [], [], [], [], []
    for url, url_hash, page in zip(
        batch["url"].to_pylist(),
        batch["url_hash"].to_pylist(),
        batch["page"].to_pylist(),
    ):
        html = (page or b"")[:MAX_HTML_BYTES].decode("utf-8", errors="replace")
        title = extract_title(html) or url
        snippet = generate_snippet(html)
        links = extract_links_pagerank(url, html)
        seen: set[str] = set()
        dd: list[str] = []
        for link in links:
            dh = ref_hash(link)
            if dh not in seen:
                seen.add(dh)
                dd.append(dh)
        hashes.append(url_hash)
        urls.append(url)
        titles.append(title)
        snippets.append(snippet)
        dests.append(dd)
    return pa.table(
        {
            "url_hash": pa.array(hashes, pa.string()),
            "url": pa.array(urls, pa.string()),
            "title": pa.array(titles, pa.string()),
            "snippet": pa.array(snippets, pa.string()),
            "dests": pa.array(dests, pa.list_(pa.string())),
        }
    )


def _vertex_keys(graph) -> np.ndarray:
    """Sorted vertex-key array: vertex id = searchsorted rank.  The only
    per-vertex driver state is this key array + the rank/outdeg vectors
    (O(V) — the coordinator floor; see module docstring)."""
    key_parts = [
        b["url_hash"].to_numpy(zero_copy_only=False)
        for b in graph.select_columns(["url_hash"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ]
    if not key_parts:
        return np.zeros(0, dtype=object)
    return np.sort(np.concatenate(key_parts))


def _build_edges(graph, vkeys_ref, n: int):
    """Sparse edge pairs per block, ids resolved by vectorized
    searchsorted against the shared key array.
    dst = -1: non-vertex dest (mass leaks, reference behavior);
    dst = -2: dangling-source sentinel row (rank → dangling sum)."""

    def edges_batch(t: pa.Table) -> pa.Table:
        keys = ray.get(vkeys_ref)
        src_h = t["url_hash"].to_numpy(zero_copy_only=False)
        sid = np.searchsorted(keys, src_h).astype(np.int64)
        dests = t["dests"].combine_chunks()
        flat = dests.flatten().to_numpy(zero_copy_only=False)
        counts = np.asarray(dests.value_lengths(), dtype=np.int64)
        src_rep = np.repeat(sid, counts)
        if len(flat):
            pos = np.searchsorted(keys, flat)
            pos_c = np.clip(pos, 0, n - 1)
            did = np.where(keys[pos_c] == flat, pos_c, -1).astype(np.int64)
        else:
            did = np.zeros(0, dtype=np.int64)
        dang = sid[counts == 0]
        return pa.table(
            {
                "src": pa.array(np.concatenate([src_rep, dang]), pa.int64()),
                "dst": pa.array(
                    np.concatenate([did, np.full(len(dang), -2, np.int64)]),
                    pa.int64(),
                ),
                "outdeg": pa.array(
                    np.concatenate(
                        [np.repeat(counts, counts), np.zeros(len(dang), np.int64)]
                    ),
                    pa.int64(),
                ),
            }
        )

    return graph.map_batches(edges_batch, batch_format="pyarrow").materialize()


def _one_iteration(edges, ranks: np.ndarray, n: int, damping: float):
    """One scatter/gather round; returns (new_ranks, residual)."""
    from ray.data.aggregate import Sum

    ranks_ref = ray.put(ranks)  # float64 numpy: zero-copy per node

    def partial(t: pa.Table) -> pa.Table:
            """edge block → SPARSE (dst, partial) pairs: local sort +
            reduceat combine, O(E/block) memory — the partial/combiner
            before the groupby(dst) shuffle.  Dangling mass is emitted
            through the same shuffle as dst = -2."""
            r = ray.get(ranks_ref)
            src = t["src"].to_numpy()
            dst = t["dst"].to_numpy()
            od = t["outdeg"].to_numpy()
            out_d: list[np.ndarray] = []
            out_p: list[np.ndarray] = []
            dangle_mask = dst == -2
            if dangle_mask.any():
                out_d.append(np.array([-2], np.int64))
                out_p.append(np.array([float(r[src[dangle_mask]].sum())]))
            edge_mask = dst >= 0  # dst == -1: counted in outdeg, no scatter
            if edge_mask.any():
                d = dst[edge_mask]
                c = r[src[edge_mask]] / od[edge_mask]
                order = np.argsort(d, kind="stable")
                ds_, cs = d[order], c[order]
                uniq, idx = np.unique(ds_, return_index=True)
                out_d.append(uniq)
                out_p.append(np.add.reduceat(cs, idx))
            if not out_d:
                return pa.table(
                    {"dst": pa.array([], pa.int64()),
                     "partial": pa.array([], pa.float64())}
                )
            return pa.table(
                {
                    "dst": pa.array(np.concatenate(out_d), pa.int64()),
                    "partial": pa.array(np.concatenate(out_p), pa.float64()),
                }
            )

    gathered = (
        edges.map_batches(partial, batch_format="pyarrow")
        .groupby("dst")
        .aggregate(Sum("partial", alias_name="inbound"))
    )
    contrib = np.zeros(n)
    dangling = 0.0
    for t in gathered.iter_batches(batch_format="pyarrow", batch_size=None):
        d = t["dst"].to_numpy()
        s = t["inbound"].to_numpy()
        dm = d == -2
        if dm.any():
            dangling += float(s[dm].sum())
        vm = d >= 0
        contrib[d[vm]] = s[vm]
    new = (1.0 - damping) / n + damping * contrib + damping * dangling / n
    residual = float(np.max(np.abs(new - ranks))) if n else 0.0
    return new, residual


def _project_ranks(graph, vkeys_ref, ranks: np.ndarray) -> pa.Table:
    """Final projection: ranks shared back to the graph rows (this is
    the result table the caller persists)."""
    final_ref = ray.put(ranks)

    def project(t: pa.Table) -> pa.Table:
        keys = ray.get(vkeys_ref)
        r = ray.get(final_ref)
        ids = np.searchsorted(keys, t["url_hash"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "url_hash": t["url_hash"],
                "url": t["url"],
                "title": t["title"],
                "snippet": t["snippet"],
                "pagerank": pa.array(r[ids], pa.float64()),
            }
        )

    parts = list(
        graph.map_batches(project, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)
    )
    return pa.concat_tables(parts).cast(PAGERANK_SCHEMA)


# floor for the size-derived bucket counts of the rank/edge co-group
# joins (see functions/partitioning.bucket_count): per-bucket memory is
# bounded by the rows-per-bucket target at any graph size instead of a
# fixed 32-way split
PR_JOIN_BUCKETS_FLOOR = 32


def _run_ranks_as_dataset(edges, n: int, damping: float,
                          max_iterations: int, convergence: float):
    """The >10^9-vertex shape (module docstring's named step), behind
    ``ranks_as_dataset=True``: ranks live as a ``(vid, rank)`` Dataset
    and the per-iteration update runs INSIDE the shuffle — the driver
    holds only scalars (n, dangling sum, residual).  Each round is:

      1. bucketed edges⋈ranks co-group join on ``src`` (same pattern as
         dedup's label propagation) → sparse (dst, partial) pairs with
         local combine; dangling mass rides as dst = -2;
      2. ``groupby(dst).sum`` — the gather shuffle (P5);
      3. bucketed ranks⋈inbound join applies
         ``new = (1-d)/N + d·inbound + d·dangling/N`` and emits the
         per-vertex |Δ| alongside;
      4. residual = ``aggregate(Max(delta))`` (a scalar), convergence
         checked exactly as the driver-vector path.

    Returns the final ranks Dataset (vid, rank)."""
    import pandas as pd
    from ray.data.aggregate import Max, Sum

    from ..functions.partitioning import bucket_count

    # edges is materialized by the caller, so count() is metadata;
    # sizing on edge rows bounds the per-bucket join input
    NB = bucket_count(edges.count(), min_buckets=PR_JOIN_BUCKETS_FLOOR)

    def tag_edges(t: pa.Table) -> pa.Table:
        src = t["src"].combine_chunks()
        return pa.table(
            {
                "bucket": pa.compute.cast(
                    pa.compute.bit_wise_and(src, pa.scalar(NB - 1)), pa.int32()
                ),
                "side": pa.array(["e"] * t.num_rows, pa.string()),
                "src": src,
                "dst": t["dst"],
                "outdeg": t["outdeg"],
                "rank": pa.nulls(t.num_rows, pa.float64()),
            }
        )

    def tag_ranks(t: pa.Table) -> pa.Table:
        vid = t["vid"].combine_chunks()
        return pa.table(
            {
                "bucket": pa.compute.cast(
                    pa.compute.bit_wise_and(vid, pa.scalar(NB - 1)), pa.int32()
                ),
                "side": pa.array(["r"] * t.num_rows, pa.string()),
                "src": vid,
                "dst": pa.nulls(t.num_rows, pa.int64()),
                "outdeg": pa.nulls(t.num_rows, pa.int64()),
                "rank": t["rank"],
            }
        )

    def scatter(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        e = df[df["side"] == "e"][["src", "dst", "outdeg"]]
        r = df[df["side"] == "r"][["src", "rank"]]
        m = e.merge(r, on="src", how="inner")
        out_d: list[np.ndarray] = []
        out_p: list[np.ndarray] = []
        dang = m[m["dst"] == -2]
        if len(dang):
            out_d.append(np.array([-2], np.int64))
            out_p.append(np.array([float(dang["rank"].sum())]))
        ed = m[m["dst"] >= 0]
        if len(ed):
            d = ed["dst"].to_numpy(dtype=np.int64)
            c = ed["rank"].to_numpy() / ed["outdeg"].to_numpy()
            order = np.argsort(d, kind="stable")
            ds_, cs = d[order], c[order]
            uniq, idx = np.unique(ds_, return_index=True)
            out_d.append(uniq)
            out_p.append(np.add.reduceat(cs, idx))
        if not out_d:
            return pa.table(
                {"dst": pa.array([], pa.int64()),
                 "partial": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "dst": pa.array(np.concatenate(out_d), pa.int64()),
                "partial": pa.array(np.concatenate(out_p), pa.float64()),
            }
        )

    tagged_edges = edges.map_batches(
        tag_edges, batch_format="pyarrow"
    ).materialize()

    def init_ranks(t: pa.Table) -> pa.Table:
        vid = t["id"].combine_chunks().cast(pa.int64())
        return pa.table(
            {"vid": vid,
             "rank": pa.array(np.full(len(vid), 1.0 / n), pa.float64())}
        )

    ranks = (
        ray.data.range(n)
        .map_batches(init_ranks, batch_format="pyarrow")
        .materialize()
    )

    for _i in range(max_iterations):
        inbound = (
            tagged_edges.union(
                ranks.map_batches(tag_ranks, batch_format="pyarrow")
            )
            .groupby("bucket")
            .map_groups(scatter, batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Sum("partial", alias_name="inbound"))
            .materialize()
        )

        # dangling sum: ≤1 row after the gather — a scalar to the driver
        def dangling_rows(t: pa.Table) -> pa.Table:
            return t.filter(pa.compute.equal(t["dst"], pa.scalar(-2)))

        dparts = list(
            inbound.map_batches(dangling_rows, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow", batch_size=None)
        )
        dangling = (
            float(pa.concat_tables(dparts)["inbound"].to_numpy().sum())
            if dparts
            else 0.0
        )
        base = (1.0 - damping) / n + damping * dangling / n

        def tag_inbound(t: pa.Table) -> pa.Table:
            t = t.filter(pa.compute.greater_equal(t["dst"], pa.scalar(0)))
            vid = t["dst"].combine_chunks()
            return pa.table(
                {
                    "bucket": pa.compute.cast(
                        pa.compute.bit_wise_and(vid, pa.scalar(NB - 1)),
                        pa.int32(),
                    ),
                    "side": pa.array(["i"] * t.num_rows, pa.string()),
                    "vid": vid,
                    "val": t["inbound"],
                }
            )

        def tag_old(t: pa.Table) -> pa.Table:
            vid = t["vid"].combine_chunks()
            return pa.table(
                {
                    "bucket": pa.compute.cast(
                        pa.compute.bit_wise_and(vid, pa.scalar(NB - 1)),
                        pa.int32(),
                    ),
                    "side": pa.array(["o"] * t.num_rows, pa.string()),
                    "vid": vid,
                    "val": t["rank"],
                }
            )

        def update(g: pa.Table) -> pa.Table:
            df = g.to_pandas()
            o = df[df["side"] == "o"][["vid", "val"]]
            i_ = df[df["side"] == "i"][["vid", "val"]]
            m = o.merge(i_, on="vid", how="left", suffixes=("_o", "_i"))
            inb = m["val_i"].fillna(0.0).to_numpy()
            new = base + damping * inb
            old = m["val_o"].to_numpy()
            return pa.table(
                {
                    "vid": pa.array(m["vid"].to_numpy(dtype=np.int64)),
                    "rank": pa.array(new, pa.float64()),
                    "delta": pa.array(np.abs(new - old), pa.float64()),
                }
            )

        updated = (
            ranks.map_batches(tag_old, batch_format="pyarrow")
            .union(inbound.map_batches(tag_inbound, batch_format="pyarrow"))
            .groupby("bucket")
            .map_groups(update, batch_format="pyarrow")
            .materialize()
        )
        agg = updated.aggregate(Max("delta", alias_name="residual"))
        residual = float(agg["residual"]) if agg else 0.0
        ranks = updated.select_columns(["vid", "rank"]).materialize()
        if residual < convergence:
            break
    return ranks


def _project_ranks_dataset(graph, vkeys_ref, ranks_ds) -> pa.Table:
    """Final projection for the Dataset-ranks path: one more bucketed
    join of graph rows (vid via searchsorted) to the final ranks."""
    from ..functions.partitioning import bucket_count

    NB = bucket_count(
        len(ray.get(vkeys_ref)), min_buckets=PR_JOIN_BUCKETS_FLOOR
    )

    def tag_pages(t: pa.Table) -> pa.Table:
        keys = ray.get(vkeys_ref)
        vid = np.searchsorted(
            keys, t["url_hash"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array((vid & (NB - 1)).astype(np.int32)),
                "side": pa.array(["p"] * t.num_rows, pa.string()),
                "vid": pa.array(vid),
                "url_hash": t["url_hash"],
                "url": t["url"],
                "title": t["title"],
                "snippet": t["snippet"],
                "rank": pa.nulls(t.num_rows, pa.float64()),
            }
        )

    def tag_ranks(t: pa.Table) -> pa.Table:
        vid = t["vid"].combine_chunks()
        nr = t.num_rows
        return pa.table(
            {
                "bucket": pa.compute.cast(
                    pa.compute.bit_wise_and(vid, pa.scalar(NB - 1)), pa.int32()
                ),
                "side": pa.array(["r"] * nr, pa.string()),
                "vid": vid,
                "url_hash": pa.nulls(nr, pa.string()),
                "url": pa.nulls(nr, pa.string()),
                "title": pa.nulls(nr, pa.string()),
                "snippet": pa.nulls(nr, pa.string()),
                "rank": t["rank"],
            }
        )

    def join(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        p = df[df["side"] == "p"][
            ["vid", "url_hash", "url", "title", "snippet"]
        ]
        r = df[df["side"] == "r"][["vid", "rank"]]
        m = p.merge(r, on="vid", how="inner")
        return pa.table(
            {
                "url_hash": pa.array(m["url_hash"], pa.string()),
                "url": pa.array(m["url"], pa.string()),
                "title": pa.array(m["title"], pa.string()),
                "snippet": pa.array(m["snippet"], pa.string()),
                "pagerank": pa.array(m["rank"].to_numpy(), pa.float64()),
            }
        )

    parts = list(
        graph.map_batches(tag_pages, batch_format="pyarrow")
        .union(ranks_ds.map_batches(tag_ranks, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(join, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)
    )
    return pa.concat_tables(parts).cast(PAGERANK_SCHEMA)


def build_graph(pages):
    """pages (Dataset or Table) → materialized graph Dataset (P1)."""
    if isinstance(pages, pa.Table):
        ds = ray.data.from_arrow(pages.select(["url", "url_hash", "page"]))
    else:
        ds = pages
    return ds.map_batches(_graph_batch, batch_format="pyarrow").materialize()


def run_pagerank(pages, damping: float = DAMPING,
                 max_iterations: int = MAX_ITERATIONS,
                 convergence: float = CONVERGENCE,
                 init_ranks: np.ndarray | None = None,
                 start_iteration: int = 0,
                 on_iteration=None,
                 graph=None,
                 ranks_as_dataset: bool = False) -> pa.Table:
    """pages: Dataset or Table of crawl page rows → pt-pageranks table.

    Resume hooks (P9): ``graph`` reuses a pre-built graph Dataset,
    ``init_ranks``/``start_iteration`` continue from a checkpointed
    iteration, ``on_iteration(i, ranks, residual)`` is called after
    every round (the resumable job persists ranks there — matching the
    reference's staged PageRank state saves,
    ``ref/src/jobs/PageRank.java:417-450``).

    ``ranks_as_dataset=True`` switches the update to the fully
    distributed shape (``_run_ranks_as_dataset``): ranks live as a
    Dataset and the O(V) driver vectors disappear — the >10^9-vertex
    path, proven on the sandbox fixture (slower at small V: two extra
    bucketed shuffles per round).  Resume hooks are driver-vector-path
    only."""
    if graph is None:
        graph = build_graph(pages)
    vkeys = _vertex_keys(graph)
    n = len(vkeys)
    if n == 0:
        return PAGERANK_SCHEMA.empty_table()
    vkeys_ref = ray.put(vkeys)  # numpy object array: one copy per node
    edges = _build_edges(graph, vkeys_ref, n)

    if ranks_as_dataset:
        ranks_ds = _run_ranks_as_dataset(
            edges, n, damping, max_iterations, convergence
        )
        return _project_ranks_dataset(graph, vkeys_ref, ranks_ds)

    ranks = np.full(n, 1.0 / n) if init_ranks is None else init_ranks
    for i in range(start_iteration, max_iterations):
        ranks, residual = _one_iteration(edges, ranks, n, damping)
        if on_iteration is not None:
            on_iteration(i, ranks, residual)
        if residual < convergence:
            break

    return _project_ranks(graph, vkeys_ref, ranks)
