"""Crawl-wave stage bodies (map_batches callables).

One fused Dataset execution per wave (SURVEY.md §7.1, tuned — per-wave
fixed costs gate BFS crawl throughput):

    frontier blocks (split at host boundaries by the driver)
      → admit_stage   : canonical keys + per-host-group admission via
                        the HostShard politeness actors + completion
                        routing to SeenShards (buffered)
      → fetch_post    : synthetic fetch of admitted hits, page rows
                        written to `wave=K/` parquet in-stage, link
                        pipeline + enqueue probes (wave-start snapshot),
                        frontier contributions (URL strings) out

All state mutations buffer in the shards and commit at the driver's
``reconcile`` barrier — decisions and final state are independent of
block scheduling (see ``state/actors.py`` wave protocol).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from ..functions.blacklist import is_skippable_href, should_crawl, unwrap_urldefense
from ..functions.html import build_spans, extract_urls
from ..functions.urlnorm import (
    extract_host_key,
    extract_path,
    hostname,
    normalize_and_filter_url,
)
from ..sources.synthetic_web import SyntheticWeb
from ..state.actors import D_HIT, ref_hash_and_key64

SPAN_TYPE = pa.list_(
    pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
)

FETCH_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("url_hash", pa.string()),
        ("kind", pa.string()),  # page | redirect | dropped
        ("redirect_target", pa.string()),
        ("response_code", pa.int32()),
        ("content_type", pa.string()),
        ("length", pa.int32()),
        ("page", pa.binary()),
        ("spans", SPAN_TYPE),
        ("raw_links", pa.list_(pa.string())),
    ]
)

PAGE_OUT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("url_hash", pa.string()),
        ("response_code", pa.int32()),
        ("content_type", pa.string()),
        ("length", pa.int32()),
        ("page", pa.binary()),
        ("spans", SPAN_TYPE),
        ("wave", pa.int32()),
    ]
)

DECISION_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("url_hash", pa.string()),
        ("key64", pa.uint64()),
        ("decision", pa.string()),
    ]
)

CONTRIB_SCHEMA = pa.schema([("url", pa.string()), ("kind", pa.string())])


# Per-worker-process web cache: the config (with the text corpus) is
# ray.get()-deserialized and the SyntheticWeb constructed ONCE per
# worker process, then reused by every task that lands there — the
# stateful-setup-amortized property of an actor pool without paying
# per-wave pool construction (measured: repeated actor-pool startup
# grew to seconds per wave).
_WEB_CACHE: dict[str, SyntheticWeb] = {}


def web_for_ref(cfg_ref) -> SyntheticWeb:
    key = cfg_ref.hex() if hasattr(cfg_ref, "hex") else str(id(cfg_ref))
    web = _WEB_CACHE.get(key)
    if web is None:
        cfg = ray.get(cfg_ref) if hasattr(cfg_ref, "hex") else cfg_ref
        web = _WEB_CACHE[key] = SyntheticWeb(cfg)
    return web


# ---------------------------------------------------------------------------
# admission stage
# ---------------------------------------------------------------------------


def make_admit_stage(cfg_ref, host_shards: list, seen_shards: list,
                     wave_idx: int, t_k: int):
    """Prepare canonical keys + per-URL pure derivations (universe
    hit/countable, path), group by host, run politeness admission in
    the HostShards (batched RPC: one call per shard per block with
    COMPLETE host groups), route completions to the SeenShards.

    Everything derivable without host state is computed HERE, in the
    parallel task — the shard actor walk touches only its state
    (throttle clock, robots cache, caps), keeping the serial section
    per wave minimal.
    """

    n_host = len(host_shards)
    n_seen = len(seen_shards)

    def admit(batch: pa.Table) -> pa.Table:
        web = web_for_ref(cfg_ref)
        urls = batch["url"].to_pylist()
        if not urls:
            return DECISION_SCHEMA.empty_table()
        # C16 projections (Crawler.java:653-661,1026-1040) + both hash
        # keys + universe facts (HEAD-connect / countable-fetch)
        prepared = []
        for u in urls:
            h, k = ref_hash_and_key64(u)
            meta = web.page_meta(u)
            countable = False
            if meta is not None and meta["status"] == 200 and meta["html"]:
                lang = meta["content_language"]
                if "text/html" in meta["content_type"]:
                    countable = lang is None or lang.lower().startswith("en")
            prepared.append(
                (
                    u,
                    h,
                    k,
                    extract_host_key(u),
                    hostname(u),
                    extract_path(u),
                    meta is not None,
                    countable,
                )
            )
        # group by host_key, route by hostname shard (cap state locality)
        groups: dict[tuple[int, str], list] = {}
        hn_shard_memo: dict[str, int] = {}
        for row in prepared:
            hn = row[4]
            s = hn_shard_memo.get(hn)
            if s is None:
                s = hn_shard_memo[hn] = ref_hash_and_key64(hn)[1] % n_host
            groups.setdefault((s, row[3]), []).append(row)
        per_shard: dict[int, dict[str, list]] = {}
        for (s, hk), rows in groups.items():
            rows.sort(key=lambda r: r[1])  # url_hash order within group
            per_shard.setdefault(s, {})[hk] = rows
        calls = []
        for s, hk_groups in sorted(per_shard.items()):
            hks = sorted(hk_groups)
            calls.append(
                host_shards[s].admit_groups.remote(
                    wave_idx,
                    t_k,
                    hks,
                    [[r[:2] + r[4:] for r in hk_groups[hk]] for hk in hks],
                )
            )
        decision_tables = ray.get(calls)
        dec_tbl = pa.concat_tables(decision_tables)
        # attach key64 (decision tables align per url_hash)
        key_by_hash = {r[1]: r[2] for r in prepared}
        keys = pa.array(
            [key_by_hash[h] for h in dec_tbl["url_hash"].to_pylist()], pa.uint64()
        )
        dec_tbl = dec_tbl.append_column("key64", keys).select(
            ["url", "url_hash", "key64", "decision"]
        )
        # route completions (all non-throttle attempts) to seen shards
        comp = dec_tbl.filter(pc.not_equal(dec_tbl["decision"], "throttle"))
        if comp.num_rows:
            c_urls = comp["url"].to_pylist()
            c_hashes = comp["url_hash"].to_pylist()
            c_keys = comp["key64"].to_pylist()
            by_shard: dict[int, list[int]] = {}
            for i, k in enumerate(c_keys):
                by_shard.setdefault(k % n_seen, []).append(i)
            ray.get(
                [
                    seen_shards[s].buffer_complete.remote(
                        [c_urls[i] for i in idxs],
                        [c_hashes[i] for i in idxs],
                        [c_keys[i] for i in idxs],
                    )
                    for s, idxs in by_shard.items()
                ]
            )
        return dec_tbl

    return admit


# ---------------------------------------------------------------------------
# fetch (SURVEY §2.2 'Live HTTP(S) fetcher' mapping)
# ---------------------------------------------------------------------------


def fetch_batch(web: SyntheticWeb, urls: list[str], hashes: list[str]) -> pa.Table:
    """Synthetic fetch: one row per admitted URL — ``page`` (200
    text/html en → body+spans+raw links), ``redirect`` (HEAD 3xx →
    normalized+filtered target, Crawler.java:249-259), or ``dropped``
    (language / non-HTML / non-200, C8–C11)."""
    rows = {name: [] for name in FETCH_SCHEMA.names}
    for url, url_hash in zip(urls, hashes):
        meta = web.page_meta(url)
        kind = "dropped"
        redirect_target = None
        code = meta["status"] if meta else 0
        ctype = ""
        length = 0
        page = None
        spans: list = []
        raw_links: list = []
        if meta is not None:
            lang = meta["content_language"]
            media = meta["content_type"].split(";", 1)[0].strip()
            if lang is not None and not lang.lower().startswith("en"):
                kind = "dropped"
            elif meta["status"] in (301, 302, 303, 307, 308):
                target = normalize_and_filter_url(url, meta["location"])
                if target is not None and should_crawl(target):
                    kind = "redirect"
                    redirect_target = target
            elif meta["status"] == 200 and "text/html" in media.lower():
                body = (web.page_body(url) or b"")[:100_000]
                body_str = body.decode("utf-8", errors="replace")
                kind = "page"
                ctype = media
                length = len(body)
                page = body
                spans = build_spans(body_str)
                raw_links = extract_urls(body_str)
        rows["url"].append(url)
        rows["url_hash"].append(url_hash)
        rows["kind"].append(kind)
        rows["redirect_target"].append(redirect_target)
        rows["response_code"].append(code)
        rows["content_type"].append(ctype)
        rows["length"].append(length)
        rows["page"].append(page)
        rows["spans"].append(spans)
        rows["raw_links"].append(raw_links)
    return pa.Table.from_pydict(rows, schema=FETCH_SCHEMA)


def link_candidates(page_urls: list[str], raw_links: list[list[str]]):
    """Per fetched page: raw hrefs → normalized candidates (C13–C17).

    In-page dedup is per page (the reference's ``normalizedUrls``
    HashSet, ``Crawler.java:348-392``); cross-page duplicates survive to
    the idempotent enqueue.  Returns (urls, hashes, keys64, hostnames).
    """
    out_url: list[str] = []
    out_hash: list[str] = []
    out_key: list[int] = []
    out_host: list[str] = []
    for page_url, links in zip(page_urls, raw_links):
        page_seen: set[str] = set()
        for href in links or []:
            if is_skippable_href(href):
                continue
            u = unwrap_urldefense(href)
            if u is None:
                continue
            norm = normalize_and_filter_url(page_url, u)
            if norm is None or norm in page_seen:
                continue
            if not should_crawl(norm):
                continue
            page_seen.add(norm)
            h, k = ref_hash_and_key64(norm)
            out_url.append(norm)
            out_hash.append(h)
            out_key.append(k)
            out_host.append(hostname(norm))
    return out_url, out_hash, out_key, out_host


def make_fetch_post_stage(
    cfg_ref,
    seen_shards: list,
    counts_ref,
    max_pages_per_host: int,
    wave_idx: int,
    out_dir: str | None,
    record: bool = False,
):
    """Fetch admitted hits + run the link pipeline; emit frontier
    contributions (URL strings only) plus decision passthroughs.

    ``counts_ref`` broadcasts the wave-start hostname page counts as a
    sorted (key64, count) numpy pair — zero-copy from the object store
    and probed with a vectorized ``searchsorted`` (a Python dict of
    hostnames cost ~100 ms to deserialize per task at bench scale).
    """

    import numpy as np

    n_seen = len(seen_shards)

    def _counts_of(hostnames: list[str], ck, cv) -> "np.ndarray":
        if len(ck) == 0 or not hostnames:
            return np.zeros(len(hostnames), dtype=np.int64)
        memo: dict[str, int] = {}
        hk = np.empty(len(hostnames), dtype=np.uint64)
        for i, hn in enumerate(hostnames):
            v = memo.get(hn)
            if v is None:
                v = memo[hn] = ref_hash_and_key64(hn)[1]
            hk[i] = v
        pos = np.minimum(np.searchsorted(ck, hk), len(ck) - 1)
        return np.where(ck[pos] == hk, cv[pos], 0)

    def fetch_post(batch: pa.Table) -> pa.Table:
        web = web_for_ref(cfg_ref)
        ck, cv = ray.get(counts_ref)
        dec_col = batch["decision"]
        hit_mask = pc.equal(dec_col, D_HIT)
        hits = batch.filter(hit_mask)
        others = batch.filter(pc.invert(hit_mask))
        contrib_urls: list[str] = []
        contrib_kinds: list[str] = []
        if record:
            # passthrough rows for non-hit decisions (record mode only —
            # at bench scale these dominate the driver pull; throttle
            # counts come from HostShard.end_wave stats instead)
            contrib_urls.extend(others["url"].to_pylist())
            contrib_kinds.extend(others["decision"].to_pylist())

        if hits.num_rows:
            ft = fetch_batch(
                web, hits["url"].to_pylist(), hits["url_hash"].to_pylist()
            )
            pages = ft.filter(pc.equal(ft["kind"], "page"))
            for t in ft.filter(pc.equal(ft["kind"], "redirect"))[
                "redirect_target"
            ].to_pylist():
                contrib_urls.append(t)
                contrib_kinds.append("redirect")
            for u in ft.filter(pc.equal(ft["kind"], "dropped"))["url"].to_pylist():
                contrib_urls.append(u)
                contrib_kinds.append("dropped")
            if pages.num_rows:
                out = (
                    pages.drop_columns(["kind", "redirect_target", "raw_links"])
                    .append_column(
                        "wave", pa.array([wave_idx] * pages.num_rows, pa.int32())
                    )
                )
                if out_dir:
                    wave_dir = os.path.join(out_dir, f"wave={wave_idx:05d}")
                    os.makedirs(wave_dir, exist_ok=True)
                    fname = f"part-{pages['url_hash'][0].as_py()}.parquet"
                    pq.write_table(out, os.path.join(wave_dir, fname))
                urls = pages["url"].to_pylist()
                hashes = pages["url_hash"].to_pylist()
                keys = [ref_hash_and_key64(u)[1] for u in urls]
                by_shard: dict[int, list[str]] = {}
                for h, k in zip(hashes, keys):
                    by_shard.setdefault(k % n_seen, []).append(h)
                saved_calls = [
                    seen_shards[s].buffer_saved.remote(hs)
                    for s, hs in by_shard.items()
                ]
                # link pipeline (C13–C18): checks see wave-start state
                raw = pages["raw_links"].to_pylist()
                c_urls, c_hashes, c_keys, c_hosts = link_candidates(urls, raw)
                c_counts = _counts_of(c_hosts, ck, cv)
                keep = [
                    i
                    for i in range(len(c_urls))
                    if c_hosts[i] != "" and c_counts[i] < max_pages_per_host
                ]
                by_shard2: dict[int, list[int]] = {}
                for i in keep:
                    by_shard2.setdefault(c_keys[i] % n_seen, []).append(i)
                calls, order = [], []
                for s, idxs in by_shard2.items():
                    calls.append(
                        seen_shards[s].probe_and_buffer_enqueue.remote(
                            [c_urls[i] for i in idxs],
                            [c_hashes[i] for i in idxs],
                            [c_keys[i] for i in idxs],
                        )
                    )
                    order.extend(idxs)
                flat = [b for r in ray.get(calls) for b in r]
                ray.get(saved_calls)
                for u in urls:
                    contrib_urls.append(u)
                    contrib_kinds.append("fetched")
                # raw hrefs repeat heavily across pages (popular link
                # targets) — batch-local dedup before the driver pull;
                # the frontier is globally distinct anyway
                raw_seen: set[str] = set()
                for links in raw:
                    for href in links or []:
                        if href in raw_seen:
                            continue
                        raw_seen.add(href)
                        contrib_urls.append(href)
                        contrib_kinds.append("raw")
                surv_seen: set[str] = set()
                for i, b in zip(order, flat):
                    if b and c_urls[i] not in surv_seen:
                        surv_seen.add(c_urls[i])
                        contrib_urls.append(c_urls[i])
                        contrib_kinds.append("survivor")
        return pa.table(
            {
                "url": pa.array(contrib_urls, pa.string()),
                "kind": pa.array(contrib_kinds, pa.string()),
            }
        )

    return fetch_post
