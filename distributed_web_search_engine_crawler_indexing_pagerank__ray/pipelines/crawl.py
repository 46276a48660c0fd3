"""Ray-Data-native crawler: the north-rule pipeline.

Replaces the reference's round loop (``src/jobs/Crawler.java:131-438``)
— per-URL synchronous KVS RPCs inside a Flame ``flatMap`` — with
explicit BFS waves, each ONE fused ``ray.data`` execution:

    frontier (Arrow array, distinct + sorted) ──► split into blocks at
        host boundaries (a host's URLs never straddle blocks)
        ──► admit_stage (map_batches): canonical keys → HostShard
            politeness actors (hash-sharded by hostname; robots cache,
            next-fetch-time walk at virtual t_k, host caps) →
            completions buffered into SeenShards
        ──► fetch_post (map_batches): synthetic fetch of admitted hits,
            interleaved-span page rows written to `wave=K/` parquet
            in-stage, link pipeline + enqueue probes against the
            wave-start seen snapshot; emits URL strings only
        ──► driver: next frontier = distinct(raw ∪ survivors ∪
            redirects) via pyarrow kernels; SeenShard ``reconcile`` +
            HostShard ``end_wave`` barrier commits the wave.

Wave semantics are the virtual-time model documented in
``oracle/crawl_oracle.py`` — the engine's per-wave outputs are tested
for exact equality (attempted / fetched / throttled / visited /
enqueued / frontier / final seen set / span sequences) against that
single-threaded oracle.

Scale notes (10^10-URL frontier): page payloads never reach the driver
(written to `wave=K/` parquet partitions from inside the stage — the
resumable-output layout); state exchanges are batched actor RPCs
sharded by hash (no all-to-all shuffle in the steady state); the only
driver-held per-URL data is the frontier string array for the current
wave, manipulated with Arrow kernels (no Python row loops) — at
extreme scale that array would page through parquet manifests instead,
a mechanical swap noted here for the cluster deployment.
"""

from __future__ import annotations

import json
import os
import tempfile
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from ..functions.urlnorm import normalize_seed_url
from ..sources.synthetic_web import CrawlParams, SyntheticWeb, WebConfig
from ..state.actors import HostShard, SeenShard, ref_hash_and_key64
from ..stages.fetch import (
    CONTRIB_SCHEMA,
    PAGE_OUT_SCHEMA,
    make_admit_stage,
    make_fetch_post_stage,
)


class WaveStats(dict):
    """Per-wave lineage record (north rule: per-partition metrics)."""


def _sorted_unique(arr) -> pa.Array:
    """Distinct + ascending sort of a string array (pyarrow kernels —
    the driver never loops Python over frontier rows)."""
    if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = pa.array(list(arr), pa.string())
    u = pc.unique(arr if isinstance(arr, pa.Array) else arr.combine_chunks())
    idx = pc.array_sort_indices(u)
    return u.take(idx)


def _canonical_sort_keys(arr: pa.Array) -> pa.Array:
    """Frontier block-sort key: the URL with a default port stripped
    from the authority, so every URL of one ``host_key``
    (``extract_host_key`` defaults :80/:443) is CONTIGUOUS after
    sorting — raw hrefs written with an explicit default port
    (``http://h:80/x``) must land in the same admission block as the
    canonical form (same politeness state)."""
    k = pc.replace_substring_regex(
        arr, pattern=r"^http://([^/:]+):80(/.*)?$", replacement=r"http://\1\2"
    )
    return pc.replace_substring_regex(
        k, pattern=r"^https://([^/:]+):443(/.*)?$", replacement=r"https://\1\2"
    )


def _authority_prefix(key: str) -> str:
    """scheme://authority of a canonical sort key; raw hrefs (stateless
    admission) are their own group, so boundaries between them are
    safe."""
    for scheme in ("http://", "https://"):
        if key.startswith(scheme):
            end = key.find("/", len(scheme))
            return key if end == -1 else key[:end]
    return key


def _split_frontier(arr: pa.Array, n_blocks: int) -> list[pa.Table]:
    """Sort the distinct frontier by (canonical key, url) and slice it
    into ~equal blocks, moving each cut forward so no host's URLs
    straddle a boundary.  Zero-copy slices."""
    n = len(arr)
    if n == 0:
        return []
    keys = _canonical_sort_keys(arr)
    order = pc.sort_indices(
        pa.table({"k": keys, "u": arr}),
        sort_keys=[("k", "ascending"), ("u", "ascending")],
    )
    arr = arr.take(order)
    keys = keys.take(order)
    n_blocks = max(1, min(n_blocks, n))
    step = (n + n_blocks - 1) // n_blocks
    cuts = [0]
    i = step
    while i < n:
        prev = _authority_prefix(keys[i - 1].as_py())
        while i < n and _authority_prefix(keys[i].as_py()) == prev:
            i += 1
        if i < n:
            cuts.append(i)
        i += step
    cuts.append(n)
    out = []
    for a, b in zip(cuts, cuts[1:]):
        if b > a:
            out.append(pa.table({"url": arr.slice(a, b - a)}))
    return out


class CrawlEngine:
    def __init__(
        self,
        web_cfg: WebConfig,
        params: CrawlParams,
        *,
        n_host_shards: int = 4,
        n_seen_shards: int = 4,
        fetch_concurrency: int = 4,  # retained: floor on wave block count
        fetch_batch_size: int = 256,
        actor_num_cpus: float = 0,  # >0 at bench/cluster scale (see actors.py)
        fidelity: str = "reference",
        record_waves: bool = False,
        out_dir: str | None = None,
        checkpoint_dir: str | None = None,
    ):
        self.web_cfg = web_cfg
        self.params = params
        self.record_waves = record_waves
        self._owns_out_dir = out_dir is None
        self.out_dir = out_dir or tempfile.mkdtemp(prefix="crawl_out_")
        self.checkpoint_dir = checkpoint_dir
        self.fetch_concurrency = fetch_concurrency
        self.fetch_batch_size = fetch_batch_size
        self.cfg_ref = ray.put(web_cfg)
        pd = {"max_pages_per_host": params.max_pages_per_host}
        host_cls = (
            HostShard.options(num_cpus=actor_num_cpus)
            if actor_num_cpus
            else HostShard
        )
        seen_cls = (
            SeenShard.options(num_cpus=actor_num_cpus)
            if actor_num_cpus
            else SeenShard
        )
        self.host_shards = [
            host_cls.remote(i, web_cfg, pd, fidelity) for i in range(n_host_shards)
        ]
        self.n_seen = n_seen_shards
        self.seen_shards = [seen_cls.remote(i) for i in range(n_seen_shards)]
        self.waves: list[WaveStats] = []
        self.pages_total = 0
        self.wave_idx = 0
        self.frontier: pa.Array | list = []
        self.host_counts: dict[str, int] = {}  # committed (wave-start) view
        self._hn_keys: dict[str, int] = {}  # hostname → key64 memo

    def _counts_arrays(self):
        """Wave-start hostname counts as sorted (key64, count) numpy
        arrays — the zero-copy broadcast form (see fetch stage)."""
        import numpy as np

        items = self.host_counts
        if not items:
            return (np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.int64))
        memo = self._hn_keys
        keys = np.empty(len(items), dtype=np.uint64)
        counts = np.empty(len(items), dtype=np.int64)
        for i, (hn, c) in enumerate(items.items()):
            v = memo.get(hn)
            if v is None:
                v = memo[hn] = ref_hash_and_key64(hn)[1]
            keys[i] = v
            counts[i] = c
        order = np.argsort(keys, kind="stable")
        return keys[order], counts[order]

    # -- seeding (C1/C2) -----------------------------------------------------

    def seed(self, seeds: list[str] | None = None) -> list[str]:
        web = SyntheticWeb(self.web_cfg)
        raw = seeds if seeds is not None else web.seed_urls(self.params.n_seeds)
        normalized: list[str] = []
        seen: set[str] = set()
        for s in raw:
            n = normalize_seed_url(s)
            if n is not None and n not in seen:
                seen.add(n)
                normalized.append(n)
        by_shard: dict[int, list[tuple[str, str, int]]] = {}
        for u in normalized:
            h, k = ref_hash_and_key64(u)
            by_shard.setdefault(k % self.n_seen, []).append((u, h, k))
        ray.get(
            [
                self.seen_shards[s].probe_and_buffer_enqueue.remote(
                    [r[0] for r in rows], [r[1] for r in rows], [r[2] for r in rows]
                )
                for s, rows in by_shard.items()
            ]
        )
        ray.get([s.reconcile.remote() for s in self.seen_shards])
        self.frontier = normalized
        return normalized

    # -- one wave ------------------------------------------------------------

    def run_wave(self) -> pa.Array:
        p = self.params
        k = self.wave_idx
        t_k = p.t0_ms + k * p.wave_ms
        stats = WaveStats(wave=k, t_ms=t_k)
        wall0 = time.time()

        frontier_arr = _sorted_unique(self.frontier)
        stats["attempted"] = len(frontier_arr)
        cpus = int(ray.cluster_resources().get("CPU", 4))
        n_blocks = max(
            1,
            min(
                len(frontier_arr) // max(64, self.fetch_batch_size) + 1,
                3 * max(cpus, self.fetch_concurrency),  # 3× slots: straggler
                # smoothing now that per-task fixed costs are small
            ),
        )
        blocks = _split_frontier(frontier_arr, n_blocks)

        admit = make_admit_stage(
            self.cfg_ref, self.host_shards, self.seen_shards, k, t_k
        )
        fetch_post = make_fetch_post_stage(
            self.cfg_ref,
            self.seen_shards,
            ray.put(self._counts_arrays()),
            p.max_pages_per_host,
            k,
            self.out_dir,
            record=self.record_waves,
        )
        t_split = time.time()
        contrib_tbl = CONTRIB_SCHEMA.empty_table()
        if blocks:
            out_ds = (
                ray.data.from_arrow(blocks)
                .map_batches(admit, batch_format="pyarrow", batch_size=None)
                .map_batches(fetch_post, batch_format="pyarrow", batch_size=None)
            )
            batches = list(
                out_ds.iter_batches(batch_format="pyarrow", batch_size=None)
            )
            if batches:
                contrib_tbl = pa.concat_tables(batches)
        stats["t_split"] = round(t_split - wall0, 3)
        stats["t_job"] = round(time.time() - t_split, 3)
        t_drv = time.time()
        kind_col = contrib_tbl["kind"]

        def _of(kind: str) -> pa.Array:
            return (
                contrib_tbl.filter(pc.equal(kind_col, kind))["url"].combine_chunks()
            )

        fetched_urls = _of("fetched")
        survivors = _of("survivor")
        stats["fetched"] = len(fetched_urls)
        stats["enqueued"] = len(pc.unique(survivors))

        stats["t_driver_arrow"] = round(time.time() - t_drv, 3)
        t_bar = time.time()
        # wave barrier: commit buffered state, refresh committed counts.
        # Frontier assembly overlaps with the shard-side reconcile.
        record = self.record_waves
        recon_refs = [s.reconcile.remote(record) for s in self.seen_shards]
        end_refs = [s.end_wave.remote() for s in self.host_shards]
        nxt_arr = _sorted_unique(
            pa.concat_arrays([_of("raw"), survivors, _of("redirect")])
        )
        recon = ray.get(recon_refs)
        ends = ray.get(end_refs)
        self.host_counts = {}
        stats["throttled"] = 0
        for counts, wstats in ends:
            self.host_counts.update(counts)
            stats["throttled"] += wstats["throttled"]
        self.pages_total = sum(r["saved"] for r in recon)
        stats["visited_added"] = sum(r["new_visited"] for r in recon)
        stats["queue_size"] = sum(r["queue"] for r in recon)
        stats["t_barrier"] = round(time.time() - t_bar, 3)
        if record:
            stats["attempted_urls"] = frontier_arr.to_pylist()
            stats["fetched_urls"] = sorted(fetched_urls.to_pylist())
            stats["throttled_urls"] = sorted(_of("throttle").to_pylist())
            stats["enqueued_urls"] = sorted(pc.unique(survivors).to_pylist())
            stats["frontier_out"] = nxt_arr.to_pylist()
            stats["visited_added_urls"] = sorted(
                u for r in recon for u in r["new_visited_urls"]
            )
        stats["t_wall"] = round(time.time() - wall0, 3)
        self.waves.append(stats)
        self.wave_idx += 1
        self.frontier = nxt_arr
        if self.checkpoint_dir:
            self._checkpoint(stats)
        return nxt_arr

    # -- queue refill / termination (Crawler.java:131-149) --------------------

    def _refill(self) -> pa.Array:
        tables = ray.get([s.queue_contents.remote() for s in self.seen_shards])
        urls = pa.concat_arrays(
            [t["url"].combine_chunks() for t in tables if t.num_rows]
        ) if any(t.num_rows for t in tables) else pa.array([], pa.string())
        return _sorted_unique(urls)

    def run(self, seeds: list[str] | None = None) -> dict:
        self.seed(seeds)
        while self.wave_idx < self.params.max_waves:
            if self.pages_total >= self.params.target_pages:
                break
            if len(self.frontier) == 0:
                self.frontier = self._refill()
                if len(self.frontier) == 0:
                    break
            self.run_wave()
        return self.summary()

    # -- results -------------------------------------------------------------

    def seen_set(self) -> dict[str, str]:
        tables = ray.get([s.seen_contents.remote() for s in self.seen_shards])
        out: dict[str, str] = {}
        for t in tables:
            out.update(dict(zip(t["url_hash"].to_pylist(), t["url"].to_pylist())))
        return out

    def queue_set(self) -> dict[str, str]:
        tables = ray.get([s.queue_contents.remote() for s in self.seen_shards])
        out: dict[str, str] = {}
        for t in tables:
            out.update(dict(zip(t["url_hash"].to_pylist(), t["url"].to_pylist())))
        return out

    def pages_table(self) -> pa.Table:
        """All fetched page rows; last write wins per url_hash (KVS
        putRow overwrite semantics, waves are ordered partitions)."""
        if not os.path.isdir(self.out_dir) or not os.listdir(self.out_dir):
            return PAGE_OUT_SCHEMA.empty_table()
        parts = []
        for wave_dir in sorted(os.listdir(self.out_dir)):
            full = os.path.join(self.out_dir, wave_dir)
            if os.path.isdir(full):
                for f in sorted(os.listdir(full)):
                    parts.append(pq.read_table(os.path.join(full, f)))
        tbl = pa.concat_tables(parts, promote_options="default")
        last: dict[str, int] = {}
        for i, key in enumerate(tbl["url_hash"].to_pylist()):
            last[key] = i
        return tbl.take(sorted(last.values()))

    def cleanup(self) -> None:
        """Remove the engine-owned temp page store (page payloads at
        bench scale are tens of GB — callers that only need metrics or
        an in-memory pages_table MUST call this)."""
        import shutil

        if self._owns_out_dir and os.path.isdir(self.out_dir):
            shutil.rmtree(self.out_dir, ignore_errors=True)

    def summary(self) -> dict:
        seen = self.seen_set()
        return {
            "pages": self.pages_total,
            "visited": len(seen),
            "queue": len(self.queue_set()),
            "waves": len(self.waves),
            "seen_set": seen,
            "host_counts": dict(self.host_counts),
            "filter_stats": ray.get(
                [s.get_stats.remote() for s in self.seen_shards]
            ),
        }

    # -- checkpoint / resume (north rule: resumable, lineage) -----------------

    def _checkpoint(self, stats: WaveStats) -> None:
        """Per-wave checkpoint: shard state as per-shard parquet tables
        (scales with state size; a Lance dataset is the drop-in swap)
        plus a small JSON head with scalars, written atomically via a
        temp dir + rename."""
        import shutil

        d = self.checkpoint_dir
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, ".ckpt.tmp")
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        host_tbls = ray.get(
            [s.snapshot_table.remote() for s in self.host_shards]
        )
        count_tbls = ray.get(
            [s.counts_table.remote() for s in self.host_shards]
        )
        seen_tbls = ray.get(
            [s.snapshot_table.remote() for s in self.seen_shards]
        )
        for i, (ht, ct) in enumerate(zip(host_tbls, count_tbls)):
            pq.write_table(ht, os.path.join(tmp, f"hosts-{i:03d}.parquet"))
            pq.write_table(ct, os.path.join(tmp, f"counts-{i:03d}.parquet"))
        for i, st in enumerate(seen_tbls):
            pq.write_table(st, os.path.join(tmp, f"seen-{i:03d}.parquet"))
        frontier = (
            self.frontier
            if isinstance(self.frontier, (pa.Array, pa.ChunkedArray))
            else pa.array(list(self.frontier), pa.string())
        )
        pq.write_table(
            pa.table({"url": frontier}), os.path.join(tmp, "frontier.parquet")
        )
        with open(os.path.join(tmp, "head.json"), "w") as f:
            json.dump(
                {
                    "wave_idx": self.wave_idx,
                    "pages_total": self.pages_total,
                    "n_host_shards": len(self.host_shards),
                    "n_seen_shards": self.n_seen,
                },
                f,
            )
        final = os.path.join(d, "ckpt")
        if os.path.isdir(final):
            old = final + ".old"
            if os.path.isdir(old):  # stale from a crash mid-swap:
                shutil.rmtree(old)  # os.replace can't replace a non-empty dir
            os.replace(final, old)
            os.replace(tmp, final)
            shutil.rmtree(old)
        else:
            os.replace(tmp, final)
        manifest = {
            "wave": stats["wave"],
            "t_ms": stats["t_ms"],
            "attempted": stats["attempted"],
            "fetched": stats["fetched"],
            "throttled": stats["throttled"],
            "enqueued": stats["enqueued"],
            "visited_added": stats["visited_added"],
            "pages_total": self.pages_total,
            "written_at": time.time(),
        }
        with open(os.path.join(d, f"wave-{stats['wave']:05d}.json"), "w") as f:
            json.dump(manifest, f)

    def resume(self) -> bool:
        d = os.path.join(self.checkpoint_dir or "", "ckpt")
        head_path = os.path.join(d, "head.json")
        if not os.path.isfile(head_path):
            return False
        with open(head_path) as f:
            head = json.load(f)
        assert head["n_host_shards"] == len(self.host_shards)
        assert head["n_seen_shards"] == self.n_seen
        self.wave_idx = head["wave_idx"]
        self.pages_total = head["pages_total"]
        self.frontier = pq.read_table(os.path.join(d, "frontier.parquet"))[
            "url"
        ].combine_chunks()
        calls = []
        for i, s in enumerate(self.host_shards):
            ht = pq.read_table(os.path.join(d, f"hosts-{i:03d}.parquet"))
            ct = pq.read_table(os.path.join(d, f"counts-{i:03d}.parquet"))
            calls.append(s.restore_tables.remote(ht, ct))
            self.host_counts.update(
                zip(ct["hostname"].to_pylist(), ct["count"].to_pylist())
            )
        for i, s in enumerate(self.seen_shards):
            st = pq.read_table(os.path.join(d, f"seen-{i:03d}.parquet"))
            calls.append(s.restore_table.remote(st))
        ray.get(calls)
        return True

    def run_resumed(self) -> dict:
        """Continue a checkpointed crawl to completion (no re-seeding)."""
        while self.wave_idx < self.params.max_waves:
            if self.pages_total >= self.params.target_pages:
                break
            if len(self.frontier) == 0:
                self.frontier = self._refill()
                if len(self.frontier) == 0:
                    break
            self.run_wave()
        return self.summary()


def run_crawl(
    web_cfg: WebConfig,
    params: CrawlParams,
    seeds: list[str] | None = None,
    **engine_kwargs,
) -> tuple[dict, "CrawlEngine"]:
    """One-shot crawl; returns (summary, engine)."""
    eng = CrawlEngine(web_cfg, params, **engine_kwargs)
    summary = eng.run(seeds)
    return summary, eng
