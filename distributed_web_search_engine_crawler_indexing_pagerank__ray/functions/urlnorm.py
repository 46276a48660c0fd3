"""URL parsing / normalization kernels, string-exact to the reference.

Reference files:
- ``src/tools/URLParser.java:8-31``      (``parse_url``)
- ``src/jobs/Crawler.java:495-625``      (``normalize_and_filter_url``)
- ``src/jobs/Crawler.java:628-651``      (``normalize_seed_url``)
- ``src/jobs/Crawler.java:653-674``      (``extract_host_key`` / ``extract_protocol`` / ``extract_path``)
- ``src/jobs/Crawler.java:1026-1040``    (``hostname`` — java.net.URI semantics)

Exact string equality with the reference matters: the crawler's
URL-seen set is keyed by ``Hasher.hash(normalized_url)``, so any
deviation here changes the final seen-set.  The non-idempotent
``/../`` collapse regex (``Crawler.java:592-595``) is reproduced as-is.
"""

from __future__ import annotations

import re
import urllib.parse

# ---------------------------------------------------------------------------
# URLParser.parseURL (URLParser.java:8-31)
# ---------------------------------------------------------------------------


def parse_url(url: str) -> list[str | None]:
    """Return ``[protocol, host, port, path]`` exactly like
    ``URLParser.parseURL``.  Elements are ``None`` when absent.

    Note the reference finds ``"//"`` at index > 0 and takes
    ``url[0 : slashslash-1]`` as the protocol (i.e. drops the ``:``).
    """
    result: list[str | None] = [None, None, None, None]
    slashslash = url.find("//")
    if slashslash > 0:
        result[0] = url[: slashslash - 1]
        nextslash = url.find("/", slashslash + 2)
        if nextslash >= 0:
            result[1] = url[slashslash + 2 : nextslash]
            result[3] = url[nextslash:]
        else:
            result[1] = url[slashslash + 2 :]
            result[3] = "/"
        host = result[1]
        colon = host.find(":")
        if colon > 0:
            result[2] = host[colon + 1 :]
            result[1] = host[:colon]
    else:
        result[3] = url
    return result


# ---------------------------------------------------------------------------
# Crawler.normalizeAndFilterUrl (Crawler.java:495-625)
# ---------------------------------------------------------------------------

_DOTDOT_RE = re.compile(r"/[^/]+/\.\./")


def normalize_and_filter_url(base_url: str, url: str | None) -> str | None:
    """Resolve+canonicalize a raw href against ``base_url``; ``None`` = drop.

    Faithful to ``Crawler.java:495-625`` including: fragment strip,
    mailto/javascript drop, lowercased proto+host, default-port
    omission, ``/./`` collapse, and the repeated
    ``replaceAll("/[^/]+/\\.\\./", "/")`` collapse (non-idempotent
    regex, applied while any ``/../`` remains).
    """
    if url is None:
        return None
    url = url.strip()
    if not url:
        return None

    h = url.find("#")
    if h >= 0:
        url = url[:h]
    if not url:
        return None

    lower = url.lower()
    if lower.startswith("mailto:") or lower.startswith("javascript:"):
        return None

    base = parse_url(base_url)
    base_protocol = base[0].lower() if base[0] is not None else "http"
    base_host = base[1].lower() if base[1] is not None else ""
    base_port = (
        base[2]
        if (base[2] is not None and base[2] != "")
        else ("443" if base_protocol == "https" else "80")
    )
    base_path = base[3] if base[3] is not None else "/"

    proto = base_protocol
    host = base_host
    port = base_port

    if url.startswith("http://") or url.startswith("https://"):
        parts = parse_url(url)
        proto = parts[0].lower() if parts[0] is not None else "http"
        host = parts[1].lower() if parts[1] is not None else ""
        port = (
            parts[2]
            if (parts[2] is not None and parts[2] != "")
            else ("443" if proto == "https" else "80")
        )
        path = parts[3] if (parts[3] is not None and parts[3] != "") else "/"
    elif url.startswith("//"):
        without = url[2:]
        slash = without.find("/")
        if slash >= 0:
            host = without[:slash].lower()
            path = without[slash:]
        else:
            host = without.lower()
            path = "/"
        proto = base_protocol
        port = "443" if proto == "https" else "80"
    elif url.startswith("/"):
        proto = base_protocol
        host = base_host
        port = base_port
        path = url
    else:
        proto = base_protocol
        host = base_host
        port = base_port
        last_slash = base_path.rfind("/")
        base_dir = base_path[: last_slash + 1] if last_slash >= 0 else "/"
        path = base_dir + url

    if not host:
        return None

    if not path.startswith("/"):
        path = "/" + path

    while "/./" in path:
        path = path.replace("/./", "/")
    while "/../" in path:
        path = _DOTDOT_RE.sub("/", path)
    if not path:
        path = "/"

    if proto not in ("http", "https"):
        return None

    if port is None or port == "":
        port = "443" if proto == "https" else "80"

    is_default_port = (proto == "https" and port == "443") or (
        proto == "http" and port == "80"
    )
    if is_default_port:
        return proto + "://" + host + path
    return proto + "://" + host + ":" + port + path


# ---------------------------------------------------------------------------
# Crawler.normalizeSeedUrl (Crawler.java:628-651)
# ---------------------------------------------------------------------------


def normalize_seed_url(url: str | None) -> str | None:
    if url is None:
        return None
    i = url.find("#")
    if i >= 0:
        url = url[:i]
    p = parse_url(url)
    proto = p[0] if p[0] is not None else "http"
    host = p[1] if p[1] is not None else ""
    if not host:
        return None
    port = (
        p[2]
        if (p[2] is not None and p[2] != "")
        else ("443" if proto == "https" else "80")
    )
    path = p[3] if (p[3] is not None and p[3] != "") else "/"
    if not path.startswith("/"):
        path = "/" + path
    is_default_port = (proto == "https" and port == "443") or (
        proto == "http" and port == "80"
    )
    if is_default_port:
        return proto + "://" + host + path
    return proto + "://" + host + ":" + port + path


# ---------------------------------------------------------------------------
# host key / protocol / path projections (Crawler.java:653-674)
# ---------------------------------------------------------------------------


def extract_host_key(canonical: str) -> str:
    parts = parse_url(canonical)
    proto = parts[0].lower() if parts[0] is not None else "http"
    host = parts[1].lower() if parts[1] is not None else ""
    port = (
        parts[2]
        if (parts[2] is not None and parts[2] != "")
        else ("443" if proto == "https" else "80")
    )
    return "" if not host else host + ":" + port


def host_key_and_path(canonical: str) -> tuple[str, str]:
    """``(extract_host_key(u), extract_path(u))`` from ONE parse — the
    admission prep derives both per frontier URL (~740k/wave at bench
    scale); the separate helpers each re-ran ``parse_url``."""
    parts = parse_url(canonical)
    proto = parts[0].lower() if parts[0] is not None else "http"
    host = parts[1].lower() if parts[1] is not None else ""
    port = (
        parts[2]
        if (parts[2] is not None and parts[2] != "")
        else ("443" if proto == "https" else "80")
    )
    path = parts[3] if (parts[3] is not None and parts[3] != "") else "/"
    if not path.startswith("/"):
        path = "/" + path
    return ("" if not host else host + ":" + port), path


def extract_protocol(canonical: str) -> str:
    parts = parse_url(canonical)
    proto = parts[0].lower() if parts[0] is not None else "http"
    return proto


def extract_path(canonical: str) -> str:
    parts = parse_url(canonical)
    path = parts[3] if (parts[3] is not None and parts[3] != "") else "/"
    if not path.startswith("/"):
        path = "/" + path
    return path


# ---------------------------------------------------------------------------
# Crawler.hostname (Crawler.java:1026-1040) — java.net.URI semantics
# ---------------------------------------------------------------------------
#
# The reference calls ``URI.create(url.trim()).getHost()`` and, when the
# host is null, retries with an ``http://`` prefix.  java.net.URI is an
# RFC-2396 parser: characters outside the legal set raise (caught →
# ``""``), a non-numeric port makes the authority registry-based and
# getHost() returns null, and an opaque URI (scheme + non-// remainder)
# has no host.  We reproduce the subset of that behavior our URL universe
# can reach; every branch below is pinned by unit tests.

_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")
# Characters java.net.URI rejects outright (non-ASCII included: RFC 2396
# URIs are ASCII; URI.create throws IllegalArgumentException on é etc.).
_ILLEGAL_CHARS_RE = re.compile(r'[ <>"{}|\\^`\x00-\x1f\x7f-\U0010ffff]')
# RFC-2396 server-based host: alphanum/-/. labels (IPv4 also matches).
_HOST_OK_RE = re.compile(r"^[A-Za-z0-9.\-]+$")


def _uri_get_host(s: str) -> str | None:
    """Approximate ``java.net.URI(s).getHost()``; raises ValueError where
    java.net.URI would throw."""
    if _ILLEGAL_CHARS_RE.search(s):
        raise ValueError("illegal character in URI")
    m = _SCHEME_RE.match(s)
    rest = s[m.end() :] if m else s
    if not rest.startswith("//"):
        return None  # opaque or relative: no authority
    authority = rest[2:]
    for stop in ("/", "?", "#"):
        idx = authority.find(stop)
        if idx >= 0:
            authority = authority[:idx]
    if "@" in authority:
        authority = authority.split("@", 1)[1]
    if not authority:
        return None
    host = authority
    colon = authority.rfind(":")
    if colon >= 0 and not authority.startswith("["):
        port = authority[colon + 1 :]
        host = authority[:colon]
        if port and not port.isdigit():
            return None  # registry-based authority → getHost() null
    if not host or not _HOST_OK_RE.match(host):
        return None
    return host


# Fast path for the overwhelmingly common shape of frontier URLs:
# scheme://host[:digits]/rest with a clean RFC-2396 server host and no
# illegal characters anywhere after it.  For any match, java.net.URI's
# getHost() is exactly the host group (verified by the property tests
# against the slow path); anything else falls through to the faithful
# branch-by-branch emulation.
_FAST_HOST_RE = re.compile(
    r"^[A-Za-z][A-Za-z0-9+.\-]*://([A-Za-z0-9.\-]+)(?::\d+)?"
    r"(?:/[!#$%&'()*+,\-./0-9:;=?@A-Za-z_~]*)?$"
)


def hostname(url: str | None) -> str:
    """``Crawler.hostname``: lowercase host or ``""`` when unresolvable."""
    if url is None or not url.strip():
        return ""
    u = url.strip()
    m = _FAST_HOST_RE.match(u)
    if m is not None:
        return m.group(1).lower()
    try:
        host = _uri_get_host(u)
        if host is None:
            prefixed = ("http:" if u.startswith("//") else "http://") + u
            host = _uri_get_host(prefixed)
        return host.lower() if host is not None else ""
    except ValueError:
        return ""


# ---------------------------------------------------------------------------
# PageRank.normalizeUrl (PageRank.java:786-816) — the *variant* normalizer
# ---------------------------------------------------------------------------
#
# Unlike the crawler's normalizer it resolves with java.net.URI.resolve
# (≈ RFC 3986, here urllib.parse.urljoin) and ALWAYS keeps an explicit
# port (``:443`` / ``:80``).  Do not unify with normalize_and_filter_url.


def pagerank_normalize_url(link: str | None, base: str | None) -> str | None:
    if not link or not base:
        return None
    try:
        resolved = urllib.parse.urljoin(base, link)
        sp = urllib.parse.urlsplit(resolved)
        scheme = sp.scheme
        host = sp.hostname
        path = sp.path
        port = sp.port
        if not scheme or not host:
            return None
        if scheme.lower() not in ("http", "https"):
            return None
        if not path:
            path = "/"
        if port is None:
            port = 443 if scheme.lower() == "https" else 80
        return f"{scheme.lower()}://{host.lower()}:{port}{path}"
    except Exception:
        return None
