"""Deterministic synthetic web — the fetcher backend for crawl tests/bench.

Replaces live HTTP (SURVEY.md §2.2 "Live HTTP(S) fetcher",
``src/jobs/Crawler.java:211-332``) with a pure function of the URL:
every page (status, headers, body, robots.txt) is derived O(1) from the
URL string plus a small config — **no table of pages is materialized**,
so the address space scales to the 10^10-URL frontier of the north rule
while the only payload shipped to fetcher actors is the (small) text
corpus list.

Design points
-------------
- ``url_of(i)`` emits URLs already in reference-canonical form
  (``Crawler.normalizeAndFilterUrl`` fixed point), so page keys and the
  crawler's seen-set keys coincide.
- Hosts are assigned by a Zipf(1.1) draw from a splitmix64 of the doc
  index → hot hosts exist (skew tests, FIXTURES.md §2 knobs).
- Page classes (redirect / 404 / 500 / non-HTML / non-English) and
  robots policies are residue classes of the doc index / host id, so
  the oracle, the politeness actors and the fetcher pool all agree
  without sharing mutable state.
- Rendered HTML interleaves text, ``<a href>`` links (absolute,
  root-relative, ``../`` relative, protocol-relative, uppercase-host,
  fragment, urldefense-wrapped, blacklisted, duplicate, skippable) and
  ``<img>`` media — the interleaved text+media document payload of
  ``BASELINE.json.input_hint``.
"""

from __future__ import annotations

import bisect
from dataclasses import dataclass, field

from ..functions.urlnorm import extract_host_key

MASK64 = (1 << 64) - 1


def splitmix64(x: int) -> int:
    """Public-domain splitmix64 mix (Steele et al., JDK SplittableRandom)."""
    x = (x + 0x9E3779B97F4A7C15) & MASK64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & MASK64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & MASK64
    return (x ^ (x >> 31)) & MASK64


def splitmix64_array(x):
    """Vectorized :func:`splitmix64` over a uint64 numpy array —
    element-wise equal to the scalar form (uint64 wraps = ``& MASK64``).
    The render hot path draws ~2 mixes per paragraph; scalar Python
    calls were ~0.13 ms/page of the fetch stage at bench scale."""
    import numpy as np

    x = (x + np.uint64(0x9E3779B97F4A7C15))
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


# Page-class residues (doc index mod the prime → class). Chosen so the
# majority of pages are 200/text-html/en and every filter branch of
# SURVEY.md §2.3 (C8–C12) has deterministic coverage.
REDIRECT_MOD, REDIRECT_RES = 19, 7
NOTFOUND_MOD, NOTFOUND_RES = 29, 11
ERROR_MOD, ERROR_RES = 37, 13
NONHTML_MOD, NONHTML_RES = 41, 17
NONEN_MOD, NONEN_RES = 43, 19

DEFAULT_TEXTS = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "distributed systems require careful coordination of state and time",
    "search engines crawl index and rank documents from the open web",
    "page rank measures the stationary distribution of a random surfer",
]

ROBOTS_BODIES = {
    0: None,  # 404 — no robots ⇒ allow-all (Crawler.java:786-799)
    1: "User-agent: *\nDisallow: /private/\n",
    # UA-specific group beats * (Crawler.java:801-869): our UA gets
    # /private/ disallowed + crawl-delay 2 while * is fully disallowed.
    2: (
        "User-agent: cis5550-crawler\nDisallow: /private/\nCrawl-delay: 2\n"
        "\nUser-agent: *\nDisallow: /\n"
    ),
    3: "User-agent: *\nCrawl-delay: 3\nDisallow: /admin/\n",
    4: None,  # 500 — unfetchable ⇒ allow-all
}
ROBOTS_STATUS = {0: 404, 1: 200, 2: 200, 3: 200, 4: 500}


@dataclass(frozen=True)
class WebConfig:
    """Everything needed to regenerate any page O(1). Cheap to ship."""

    n_docs: int = 1000
    n_hosts: int = 20
    seed: int = 42
    # texts: the corpus bodies cycle through (loaded from the testdata
    # `documents` table in entry()/bench; defaults for unit tests).
    texts: tuple[str, ...] = tuple(DEFAULT_TEXTS)
    links_per_doc: int = 4
    text_len: int = 400
    zipf_s: float = 1.1  # host-popularity skew; bench uses a flatter
    # exponent for wide waves, skew tests keep the default hot-host shape
    paragraphs: int = 1  # text paragraphs per page (bench uses several —
    # realistic page weight so fetch compute, not coordination, dominates)

    def mix(self, i: int) -> int:
        return splitmix64((i << 1) ^ (self.seed * 0x9E3779B97F4A7C15 & MASK64))


class TextCorpus:
    """Corpus bodies as (offsets, utf-8 bytes) numpy views over Arrow
    buffers — the zero-copy broadcast form of ``WebConfig.texts``.

    A plain ``tuple[str, ...]`` corpus is PICKLED into every Ray worker
    process (at bench scale: ~66 MB × one copy per worker — at 32 cpus
    that is >1 GB of duplicated, randomly-read strings thrashing the
    shared LLC, measured as a 1.3–1.6× per-task slowdown of the fetch
    stage at the 4N parallelism level).  Numpy arrays instead ship
    out-of-band: ``ray.put`` stores ONE copy in the object store and
    every worker maps it read-only (plasma shared memory), so all
    fetch workers on a node share one physical corpus.

    Indexing semantics are byte-identical to the tuple form for ASCII
    corpora; ``from_arrow`` falls back to a tuple when non-ASCII text
    is present (paragraph slicing is defined on character offsets).
    """

    def __init__(self, data, offsets):
        self.data = data  # np.uint8 view of the concatenated bodies
        self.offsets = offsets  # int32/int64 absolute offsets, len n+1

    @staticmethod
    def from_arrow(col) -> "TextCorpus | tuple[str, ...]":
        import numpy as np
        import pyarrow as _pa
        import pyarrow.compute as _pc

        arr = (
            col.combine_chunks() if isinstance(col, _pa.ChunkedArray) else col
        )
        if arr.null_count:
            arr = _pc.fill_null(arr, "")
        if not _pc.all(_pc.string_is_ascii(arr)).as_py():
            return tuple(arr.to_pylist())
        off_dtype = (
            np.int64 if _pa.types.is_large_string(arr.type) else np.int32
        )
        offsets = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
            arr.offset : arr.offset + len(arr) + 1
        ]
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        return TextCorpus(data, offsets)

    def __len__(self) -> int:
        return len(self.offsets) - 1

    def length(self, i: int) -> int:
        return int(self.offsets[i + 1] - self.offsets[i])

    def slice_str(self, i: int, start: int, ln: int) -> str:
        s = int(self.offsets[i]) + start
        return bytes(self.data[s : s + ln]).decode("ascii")

    def full(self, i: int) -> str:
        return bytes(
            self.data[int(self.offsets[i]) : int(self.offsets[i + 1])]
        ).decode("ascii")


class SyntheticWeb:
    """O(1) page oracle over a ``WebConfig``. Pure; safe to hold per actor."""

    def __init__(self, cfg: WebConfig):
        import numpy as np

        self.cfg = cfg
        # Zipf(s) CDF over hosts → hot-host skew (FIXTURES.md §2).
        # numpy accumulation, then a Python list for fast scalar bisect
        # (identical values: float64 arithmetic in the same order).
        w = 1.0 / np.power(np.arange(1, cfg.n_hosts + 1, dtype=np.float64),
                           cfg.zipf_s)
        w /= w.sum()
        cdf = np.add.accumulate(w)
        cdf[-1] = 1.0
        self._cdf = cdf.tolist()
        self._host_names = [self._mk_host(j) for j in range(cfg.n_hosts)]
        self._pg101 = None  # paragraph-mix cache (see _paragraph_mixes)
        self._seed_term = None
        self._hostkey_map: dict[str, int] | None = None  # built lazily:
        # only the robots path (HostShard actors) resolves host_key →
        # id; fetch workers never pay the n_hosts key derivations.

    @property
    def _hostkey_ids(self) -> dict[str, int]:
        m = self._hostkey_map
        if m is None:
            m = self._hostkey_map = {
                extract_host_key(full + "/"): j
                for j, full in enumerate(self._host_names)
            }
        return m

    # -- universe geometry ---------------------------------------------------

    def _mk_host(self, j: int) -> str:
        base = f"h{j}.web{j % 10}.test"
        if j % 13 == 2:
            return "https://" + base
        if j % 11 == 3:
            return "http://" + base + ":8080"
        return "http://" + base

    def host_of(self, i: int) -> int:
        u = self.cfg.mix(i) / float(1 << 64)
        return bisect.bisect_left(self._cdf, u)

    def path_of(self, i: int) -> str:
        if i % 23 == 5:
            return f"/private/doc/{i}"
        if i % 17 == 3:
            return f"/doc/{i}/page.html"
        return f"/doc/{i}"

    def url_of(self, i: int) -> str:
        return self._host_names[self.host_of(i)] + self.path_of(i)

    def doc_index_of(self, url: str) -> int | None:
        """Inverse of ``url_of``: canonical URL → doc index, else None."""
        p = url.rfind("/doc/")
        if p == -1:
            return None
        rest = url[p + 5 :]
        slash = rest.find("/")
        if slash != -1:
            if not rest.endswith("/page.html"):
                return None
            rest = rest[:slash]
        if not rest.isdigit():
            return None
        i = int(rest)
        if not (0 <= i < self.cfg.n_docs):
            return None
        # exact-string check: aliases (wrong host, extra segments) miss.
        return i if self.url_of(i) == url else None

    # -- robots (SURVEY §2.3 C5/C6) ------------------------------------------

    def robots_policy(self, host_id: int) -> int:
        return host_id % 5

    def robots_for_hostkey(self, host_key: str) -> tuple[int, str]:
        """(status, body) served for ``GET /robots.txt`` on this host."""
        hid = self._hostkey_to_id(host_key)
        if hid is None:
            return (-1, "")  # unknown host: connect fails → status -1
        pol = self.robots_policy(hid)
        return (ROBOTS_STATUS[pol], ROBOTS_BODIES[pol] or "")

    def _hostkey_to_id(self, host_key: str) -> int | None:
        return self._hostkey_ids.get(host_key)

    # -- page classes (C8–C12) -----------------------------------------------

    def page_meta(self, url: str) -> dict | None:
        """HEAD view: None = connect failure (URL outside the universe).

        Keys: status, content_type, content_language, location, html.
        """
        i = self.doc_index_of(url)
        if i is None:
            return None
        if i % REDIRECT_MOD == REDIRECT_RES:
            j = (i * 31 + 7) % self.cfg.n_docs
            # raw root-relative Location → exercises normalize(url, loc)
            loc = self.path_of(j) if self.host_of(j) == self.host_of(i) else self.url_of(j)
            return {
                "status": 301,
                "content_type": "text/html",
                "content_language": None,
                "location": loc,
                "html": False,
            }
        if i % NOTFOUND_MOD == NOTFOUND_RES:
            return {
                "status": 404,
                "content_type": "text/html",
                "content_language": None,
                "location": None,
                "html": True,
            }
        if i % ERROR_MOD == ERROR_RES:
            return {
                "status": 500,
                "content_type": "text/html",
                "content_language": None,
                "location": None,
                "html": True,
            }
        if i % NONHTML_MOD == NONHTML_RES:
            return {
                "status": 200,
                "content_type": "application/pdf",
                "content_language": None,
                "location": None,
                "html": False,
            }
        if i % NONEN_MOD == NONEN_RES:
            return {
                "status": 200,
                "content_type": "text/html; charset=utf-8",
                "content_language": "de",
                "location": None,
                "html": True,
            }
        return {
            "status": 200,
            "content_type": "text/html; charset=utf-8",
            "content_language": "en-US",
            "location": None,
            "html": True,
        }

    def is_countable_fetch(self, url: str) -> bool:
        """True iff fetching ``url`` stores a pt-crawl page — 200 +
        text/html + passes the language filter (``Crawler.java:243-247,
        336,1043-1047``): only saved pages count toward host caps."""
        m = self.page_meta(url)
        if not (m and m["status"] == 200 and "text/html" in m["content_type"]):
            return False
        lang = m["content_language"]
        return lang is None or lang.lower().startswith("en")

    # -- body rendering (only for 200 text/html pages) -----------------------

    def link_targets(self, i: int) -> list[int]:
        h = self.cfg.mix(i * 3 + 1)
        deg = 2 + (h % self.cfg.links_per_doc)
        return [
            (i * 2654435761 + (k + 1) * 40503 + (h & 0xFF)) % self.cfg.n_docs
            for k in range(deg)
        ]

    def _href_variant(self, i: int, k: int, j: int) -> str:
        """Render link i→j in one of several syntactic forms; crawlable
        variants normalize (C16) back to ``url_of(j)`` exactly."""
        target = self.url_of(j)
        same_host = self.host_of(i) == self.host_of(j)
        v = (self.cfg.mix(i * 7 + k * 13 + 5)) % 6
        if v == 1 and same_host:
            return self.path_of(j)  # root-relative
        if v == 2 and same_host and self.path_of(i).count("/") == 2:
            # "../doc/N" against base dir "/doc/" collapses to "/doc/N"
            return ".." + self.path_of(j)
        if v == 3:
            # protocol-relative, only canonical when protocols match
            # (C16 resolves // against the base protocol + default port)
            tproto = "https" if target.startswith("https://") else "http"
            bproto = "https" if self.url_of(i).startswith("https://") else "http"
            if tproto == bproto and ":8080" not in target:
                return "//" + target.split("://", 1)[1]
            return target
        if v == 4:
            # explicit default port → normalizer omits it (C16)
            if ":8080" in target:
                return target
            proto, rest = target.split("://", 1)
            slash = rest.find("/")
            port = ":443" if proto == "https" else ":80"
            return proto + "://" + rest[:slash] + port + rest[slash:]
        if v == 5:
            return target + "#frag" + str(k)
        return target

    def _paragraph_mixes(self, i: int):
        """(text-index mixes, start-offset mixes) for all paragraphs of
        doc ``i`` — two vectorized splitmix draws, element-wise equal
        to ``cfg.mix(i*5+3+101*pg)`` / ``cfg.mix(i*11+9+101*pg)``."""
        import numpy as np

        pg101 = self._pg101
        if pg101 is None or len(pg101) != self.cfg.paragraphs:
            pg101 = self._pg101 = np.uint64(101) * np.arange(
                self.cfg.paragraphs, dtype=np.uint64
            )
            self._seed_term = np.uint64(
                (self.cfg.seed * 0x9E3779B97F4A7C15) & MASK64
            )
        st = self._seed_term
        one = np.uint64(1)
        j1 = np.uint64(i * 5 + 3) + pg101
        j2 = np.uint64(i * 11 + 9) + pg101
        return (
            splitmix64_array((j1 << one) ^ st),
            splitmix64_array((j2 << one) ^ st),
        )

    def render_page(self, i: int) -> str:
        """Deterministic interleaved HTML for doc ``i`` (200 text/html)."""
        cfg = self.cfg
        targets = self.link_targets(i)
        parts = [
            "<html><head><title>Doc ",
            str(i),
            " synthetic page</title>",
            f'<meta name="description" content="Synthetic doc {i} of the test web">',
            "</head><body>",
        ]
        texts = cfg.texts
        n_texts = len(texts)
        tc = texts if isinstance(texts, TextCorpus) else None
        text_len = cfg.text_len
        # both per-paragraph mixes drawn vectorized (== cfg.mix per
        # element; the start mix is pure, so computing it for every
        # paragraph — not just the long-text ones — changes nothing)
        idxs, starts_raw = self._paragraph_mixes(i)
        for pg in range(cfg.paragraphs):
            idx = int(idxs[pg]) % n_texts
            if tc is None:
                text = texts[idx]
                if len(text) > text_len:
                    start = int(starts_raw[pg]) % max(1, len(text) - text_len)
                    text = text[start : start + text_len]
            else:  # shared-memory corpus: identical indexing on bytes
                ln = tc.length(idx)
                if ln > text_len:
                    start = int(starts_raw[pg]) % max(1, ln - text_len)
                    text = tc.slice_str(idx, start, text_len)
                else:
                    text = tc.full(idx)
            parts.append("<p>")
            parts.append(text)
            parts.append("</p>")
        h = self.cfg.mix(i * 13 + 11)
        for k, j in enumerate(targets):
            href = self._href_variant(i, k, j)
            parts.append(f'<a href="{href}">link {k}</a> ')
            if k == 0 and h % 3 == 0:
                parts.append(f'<a href="{href}">dup {k}</a> ')  # duplicate link
        # junk / filtered links (C14, C15, C17, C20 coverage)
        parts.append('<a href="mailto:someone@example.test">mail</a> ')
        if h % 2 == 0:
            parts.append(f'<a href="nonexistent-{i}.html">rel-miss</a> ')
        if h % 5 == 0:
            parts.append('<a href="/assets/pic.jpg">img link</a> ')
        if h % 7 == 0:
            parts.append(f'<a href="{self.url_of(targets[0])}?utm_source=x">utm</a> ')
        if h % 11 == 0:
            parts.append(
                f'<a href="https://urldefense.com/v3/__{self.url_of(targets[-1])}__;x!y">wrapped</a> '
            )
        parts.append(f'<img src="/static/img{i % 97}.png" alt="media"> ')
        if h % 4 == 0:
            parts.append(f'<img src="/static/chart{i % 31}.svg"> ')
        parts.append("<p>tail text for doc ")
        parts.append(str(i))
        parts.append("</p></body></html>")
        return "".join(parts)

    def page_body(self, url: str) -> bytes | None:
        """GET body (already size-capped well under 100 KB)."""
        i = self.doc_index_of(url)
        if i is None:
            return None
        m = self.page_meta(url)
        if m is None or m["status"] != 200 or not m["html"]:
            return None
        return self.render_page(i).encode("utf-8")

    # -- seeds ---------------------------------------------------------------

    def seed_urls(self, n_seeds: int) -> list[str]:
        """Fixed seed list: spread over the universe, skipping classes that
        would die instantly (mirrors the reference's 78 live seeds,
        ``src/jobs/Urls.java:12-89``)."""
        out: list[str] = []
        step = max(1, self.cfg.n_docs // max(1, n_seeds * 2))
        i = 0
        while len(out) < n_seeds and i < self.cfg.n_docs:
            if self.is_countable_fetch(self.url_of(i)) and i % 23 != 5:
                out.append(self.url_of(i))
            i += step
        return out


@dataclass
class CrawlParams:
    """Knobs shared by oracle and engine (reference constants,
    ``src/jobs/Crawler.java:32-37``)."""

    target_pages: int = 50_000
    max_pages_per_host: int = 500
    default_delay_s: float = 1.0
    max_waves: int = 50
    n_seeds: int = 8
    # virtual-time model: every attempt in wave k happens at
    # t_k = T0 + k * wave_ms (see oracle module docstring)
    wave_ms: int = 1000
    t0_ms: int = 1_000_000_000
    extra: dict = field(default_factory=dict)
