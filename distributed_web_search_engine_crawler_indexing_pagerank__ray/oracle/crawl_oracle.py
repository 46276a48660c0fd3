"""Reference-semantics crawl oracle: a slow, single-threaded simulator.

Transliterates the per-URL pipeline of ``src/jobs/Crawler.java:131-438``
(SURVEY.md §2.3 C1–C20) over the deterministic :class:`SyntheticWeb`,
under the **virtual-time politeness model** shared with the engine:

- Wave ``k``'s URL attempts all happen at virtual instant
  ``t_k = t0_ms + k * wave_ms``; ``updateLastAccess`` writes ``t_k``.
- Within a wave, a host's URLs are attempted sequentially in
  ``(host_key, Hasher.hash(url))`` order — the documented deterministic
  intra-wave total order (SURVEY.md §4.3).  After any attempt that
  connects (HEAD succeeds / robots denies), ``lastAccess = t_k`` and
  every later same-host attempt in the wave sees ``now - last = 0 <
  ceil(delay*1000)`` ⇒ throttled (``Crawler.java:193-196``): throttled
  URLs stay in the queue, produce no output, and rejoin only when the
  frontier drains (``Crawler.java:131-149``).
- The wave is processed in phases that make the per-URL side effects
  order-free (required so a fully-pipelined distributed engine can
  match exactly — in the reference these interleave racily across
  workers, so any fixed order is an equally-valid determinization;
  this one lets admission, fetch and the link pipeline stream in one
  pass with a single end-of-wave reconcile):
    1. admission+fetch per host (cap check uses wave-start counts plus
       this host group's own in-wave increments);
    2. link pipeline per fetched page (C13–C18) — the enqueue-time
       visited check and host-cap check both see START-of-wave state
       (visited as of the end of wave k−1; wave-start counts);
       survivors are enqueued (queue inserts);
    3. completions: queue delete + visited-set insert for every
       non-throttled attempt (``Crawler.java:408-431`` finally block)
       — applied AFTER the wave's enqueues, so a completion's delete
       wins over a same-wave re-enqueue;
    4. commit host-count increments;
    5. next frontier = distinct(raw hrefs ∪ enqueued survivors ∪
       HEAD-redirect targets)  (the C20 quirk: *raw* hrefs are emitted).

Faithful quirks kept: raw un-normalized hrefs entering the frontier and
the visited set (C20); GET-redirect targets being dropped
(``Crawler.java:292-299`` adds them to ``newUrls`` but returns an empty
list); the robots Disallow no-op bug (see ``functions/robots.py``);
the ``Hasher`` byte-0 quirk.  Deviation (documented, SURVEY.md §7.3):
the per-host page cap is global and exact, not per-worker.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from ..functions.blacklist import is_skippable_href, should_crawl, unwrap_urldefense
from ..functions.hasher import ref_hash
from ..functions.html import build_spans, extract_urls
from ..functions.robots import (
    extract_crawl_delay,
    robots_allows,
    robots_allows_strict,
)
from ..functions.urlnorm import (
    extract_host_key,
    extract_path,
    hostname,
    normalize_and_filter_url,
    normalize_seed_url,
)
from ..sources.synthetic_web import CrawlParams, SyntheticWeb

DEFAULT_DELAY = 1.0


@dataclass
class HostState:
    """Mirror of the ``hosts`` KVS row (``Crawler.java:676-762``)."""

    last_access: int = 0
    robots_fetched: bool = False
    robots_status: int = -1
    robots_txt: str = ""
    crawl_delay: float | None = None

    def delay_ms(self) -> int:
        d = self.crawl_delay if self.crawl_delay is not None else DEFAULT_DELAY
        return int(math.ceil(d * 1000.0))


@dataclass
class WaveRecord:
    wave: int
    t_ms: int
    attempted: list[str] = field(default_factory=list)
    fetched: list[str] = field(default_factory=list)
    throttled: list[str] = field(default_factory=list)
    visited_added: list[str] = field(default_factory=list)
    enqueued: list[str] = field(default_factory=list)
    frontier_out: list[str] = field(default_factory=list)


class CrawlOracle:
    """Run the whole crawl in-process; expose final state + wave log."""

    def __init__(self, web: SyntheticWeb, params: CrawlParams, fidelity: str = "reference"):
        self.web = web
        self.params = params
        self.fidelity = fidelity
        self.visited: dict[str, str] = {}  # pt-crawl-visited: hash -> url
        self.queue: dict[str, str] = {}  # pt-crawl-queue:   hash -> url
        self.crawl: dict[str, dict] = {}  # pt-crawl:         hash -> row
        self.hosts: dict[str, HostState] = {}
        self.host_counts: dict[str, int] = {}  # hostname -> 200-html pages
        self.waves: list[WaveRecord] = []

    # -- robots ---------------------------------------------------------------

    def _ensure_robots(self, host_key: str) -> HostState:
        st = self.hosts.setdefault(host_key, HostState())
        if not st.robots_fetched:
            status, body = self.web.robots_for_hostkey(host_key)
            st.robots_fetched = True
            st.robots_status = status
            st.robots_txt = body
            if 200 <= status < 300 and body:
                cd = extract_crawl_delay(body)
                if cd is not None:
                    st.crawl_delay = float(cd)
        return st

    def _robots_allows(self, st: HostState, path: str) -> bool:
        fn = robots_allows if self.fidelity == "reference" else robots_allows_strict
        return fn(st.robots_status, st.robots_txt, path)

    # -- seeds ----------------------------------------------------------------

    def seed(self, seeds: list[str] | None = None) -> list[str]:
        raw = seeds if seeds is not None else self.web.seed_urls(self.params.n_seeds)
        normalized: list[str] = []
        for s in raw:
            n = normalize_seed_url(s)
            if n is not None and n not in normalized:
                normalized.append(n)
        for s in normalized:
            self.queue[ref_hash(s)] = s
        return normalized

    # -- one wave -------------------------------------------------------------

    def run_wave(self, wave_idx: int, frontier: list[str]) -> list[str]:
        p = self.params
        t_k = p.t0_ms + wave_idx * p.wave_ms
        rec = WaveRecord(wave=wave_idx, t_ms=t_k)
        self.waves.append(rec)

        # distinct frontier, deterministic (host_key, url_hash) order
        attempts = sorted(set(frontier), key=lambda u: (extract_host_key(u), ref_hash(u)))
        rec.attempted = list(attempts)

        completions: list[str] = []  # urls whose finally-block fires with completed
        redirect_targets: list[str] = []
        pages: list[tuple[str, str]] = []  # (url, body_str) fetched this wave
        counts_start = dict(self.host_counts)
        in_wave_counts: dict[str, int] = {}

        for url in attempts:
            host = hostname(url)
            if host == "":
                completions.append(url)  # hostname unresolved → visited
                continue
            # host cap (global; wave-start + own-host in-wave increments)
            cap_seen = counts_start.get(host, 0) + in_wave_counts.get(host, 0)
            if cap_seen >= p.max_pages_per_host:
                completions.append(url)
                continue
            host_key = extract_host_key(url)
            path = extract_path(url)
            st = self._ensure_robots(host_key)
            # politeness throttle (Crawler.java:193-196)
            if (t_k - st.last_access) < st.delay_ms():
                rec.throttled.append(url)
                continue  # neither queue-delete nor visited
            if not self._robots_allows(st, path):
                st.last_access = t_k
                completions.append(url)
                continue
            meta = self.web.page_meta(url)
            if meta is None:
                completions.append(url)  # HEAD connect failure: no touch
                continue
            st.last_access = t_k  # updateLastAccess after HEAD connect
            lang = meta["content_language"]
            if lang is not None and not lang.lower().startswith("en"):
                completions.append(url)
                continue
            status = meta["status"]
            if status in (301, 302, 303, 307, 308):
                target = normalize_and_filter_url(url, meta["location"])
                if target is not None and should_crawl(target):
                    redirect_targets.append(target)
                completions.append(url)
                continue
            if status != 200:
                completions.append(url)
                continue
            media = meta["content_type"].split(";", 1)[0].strip().lower()
            if "text/html" not in media:
                completions.append(url)
                continue
            # GET + save (Crawler.java:311-332, 984-1019)
            body = self.web.page_body(url) or b""
            body = body[: 100_000]
            ctype = meta["content_type"].split(";", 1)[0].strip()
            body_str = body.decode("utf-8", errors="replace")
            key = ref_hash(url)
            self.crawl[key] = {
                "url_hash": key,
                "url": url,
                "response_code": 200,
                "content_type": ctype,
                "length": len(body),
                "wave": wave_idx,
                "page": body,
                "spans": build_spans(body_str),
            }
            in_wave_counts[host] = in_wave_counts.get(host, 0) + 1
            pages.append((url, body_str))
            rec.fetched.append(url)
            completions.append(url)

        # phase 2: link pipeline per fetched page (C13–C18); checks see
        # START-of-wave visited/counts, enqueues apply immediately
        frontier_out: set[str] = set()
        for page_url, body_str in pages:
            raw_hrefs = extract_urls(body_str)
            frontier_out.update(raw_hrefs)  # C20: raw hrefs reach next round
            page_seen: set[str] = set()
            for href in raw_hrefs:
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
                nkey = ref_hash(norm)
                if nkey in self.visited:
                    continue
                nhost = hostname(norm)
                if nhost == "" or counts_start.get(nhost, 0) >= p.max_pages_per_host:
                    continue
                page_seen.add(norm)
                self.queue[nkey] = norm
                rec.enqueued.append(norm)
                frontier_out.add(norm)
        frontier_out.update(redirect_targets)

        # phase 3: completions → queue delete + visited insert (deletes
        # win over same-wave enqueues); phase 4: commit host counts
        for url in completions:
            key = ref_hash(url)
            self.queue.pop(key, None)
            if key not in self.visited:
                rec.visited_added.append(url)
            self.visited[key] = url
        for h, c in in_wave_counts.items():
            self.host_counts[h] = self.host_counts.get(h, 0) + c

        rec.enqueued = sorted(set(rec.enqueued))
        rec.visited_added.sort()
        out = sorted(frontier_out)
        rec.frontier_out = out
        return out

    # -- full run -------------------------------------------------------------

    def run(self, seeds: list[str] | None = None) -> dict:
        p = self.params
        frontier = self.seed(seeds)
        wave_idx = 0
        while wave_idx < p.max_waves:
            if len(self.crawl) >= p.target_pages:
                break
            if not frontier:
                frontier = sorted(self.queue.values())
                if not frontier:
                    break
            frontier = self.run_wave(wave_idx, frontier)
            wave_idx += 1
        return self.summary()

    def summary(self) -> dict:
        return {
            "pages": len(self.crawl),
            "visited": len(self.visited),
            "queue": len(self.queue),
            "waves": len(self.waves),
            "seen_set": {k: v for k, v in self.visited.items()},
            "host_counts": dict(self.host_counts),
        }
