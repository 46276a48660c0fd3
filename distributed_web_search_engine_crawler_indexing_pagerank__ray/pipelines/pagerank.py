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
  edge pairs with dense vertex ids (id map broadcast via ``ray.put``);
- per iteration: ``map_batches`` over edge blocks computes per-batch
  partial contribution sums (vectorized ``np.bincount`` — the
  partial/combiner before the shuffle), a small ``groupby(dst).sum``
  equivalent via tree reduction of dense partials, then an O(V)
  vectorized rank update.
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


def run_pagerank(pages, damping: float = DAMPING,
                 max_iterations: int = MAX_ITERATIONS,
                 convergence: float = CONVERGENCE) -> pa.Table:
    """pages: Dataset or Table of crawl page rows → pt-pageranks table."""
    if isinstance(pages, pa.Table):
        ds = ray.data.from_arrow(pages.select(["url", "url_hash", "page"]))
    else:
        ds = pages
    graph = ds.map_batches(_graph_batch, batch_format="pyarrow").materialize()
    meta_parts = list(graph.iter_batches(batch_format="pyarrow", batch_size=None))
    if not meta_parts:
        return PAGERANK_SCHEMA.empty_table()
    meta = pa.concat_tables(meta_parts)

    vhashes = sorted(meta["url_hash"].to_pylist())
    vids = {h: i for i, h in enumerate(vhashes)}
    n = len(vids)
    ids_ref = ray.put(vids)

    # dense edge arrays per block: (src_id, dst_id or -1) + outdeg per src
    def edges_batch(t: pa.Table) -> pa.Table:
        ids = ray.get(ids_ref)
        srcs, dsts = [], []
        dangling = []
        for h, dd in zip(t["url_hash"].to_pylist(), t["dests"].to_pylist()):
            sid = ids[h]
            if not dd:
                dangling.append(sid)
                continue
            for d in dd:
                srcs.append(sid)
                dsts.append(ids.get(d, -1))  # -1: non-vertex dest (leaks)
        # dst = -1: non-vertex dest (mass leaks, reference behavior);
        # dst = -2: dangling-source sentinel row (rank → dangling sum)
        return pa.table(
            {
                "src": pa.array(srcs + dangling, pa.int32()),
                "dst": pa.array(dsts + [-2] * len(dangling), pa.int32()),
            }
        )

    edges = graph.map_batches(edges_batch, batch_format="pyarrow").materialize()

    # outdeg per source (distinct dests per page — from the graph rows)
    outdeg = np.zeros(n, dtype=np.int64)
    for t in meta_parts:
        for h, dd in zip(t["url_hash"].to_pylist(), t["dests"].to_pylist()):
            outdeg[vids[h]] = len(dd)

    ranks = np.full(n, 1.0 / n)
    for _ in range(max_iterations):
        ranks_ref = ray.put(ranks)
        outdeg_ref = ray.put(outdeg)

        def partial(t: pa.Table, n=n) -> pa.Table:
            r = ray.get(ranks_ref)
            od = ray.get(outdeg_ref)
            src = t["src"].to_numpy()
            dst = t["dst"].to_numpy()
            contrib = np.zeros(n)
            dang = 0.0
            edge_mask = dst >= 0
            leak_mask = dst == -1
            dangle_mask = dst == -2
            if dangle_mask.any():
                dang = float(r[src[dangle_mask]].sum())
            del leak_mask  # dst == -1 edges: counted in outdeg, no scatter
            # share = rank/outdeg per edge; only dst>=0 accumulates
            if edge_mask.any():
                s = src[edge_mask]
                np.add.at(contrib, dst[edge_mask], r[s] / od[s])
            return pa.table(
                {
                    "contrib": pa.array(contrib, pa.float64()),
                    "dangling": pa.array(
                        [dang] + [0.0] * (n - 1), pa.float64()
                    ),
                }
            )

        parts = list(
            edges.map_batches(partial, batch_format="pyarrow", batch_size=None)
            .iter_batches(batch_format="pyarrow", batch_size=None)
        )
        contrib = np.zeros(n)
        dangling = 0.0
        for t in parts:
            contrib += t["contrib"].to_numpy()
            dangling += t["dangling"].to_numpy()[0]
        new = (1.0 - damping) / n + damping * contrib + damping * dangling / n
        residual = float(np.max(np.abs(new - ranks))) if n else 0.0
        ranks = new
        if residual < convergence:
            break

    out = meta.select(["url_hash", "url", "title", "snippet"])
    pr = pa.array(
        [float(ranks[vids[h]]) for h in meta["url_hash"].to_pylist()],
        pa.float64(),
    )
    return out.append_column("pagerank", pr).cast(PAGERANK_SCHEMA)
