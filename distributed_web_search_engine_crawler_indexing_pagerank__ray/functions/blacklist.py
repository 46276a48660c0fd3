"""Crawl blacklists and href prefilters.

Reference:
- constant lists: ``src/jobs/Urls.java:92-232``
- ``should_crawl``: ``src/jobs/Crawler.java:940-982``
- ``is_skippable_href``: ``src/jobs/Crawler.java:1079-1090``
- ``unwrap_urldefense``: ``src/jobs/Crawler.java:1092-1109``
"""

from __future__ import annotations

import urllib.parse

from .urlnorm import parse_url

SOCIAL_MEDIA_HOSTS = [
    "facebook.com", "www.facebook.com",
    "twitter.com", "www.twitter.com",
    "t.co",
    "instagram.com", "www.instagram.com",
    "linkedin.com", "www.linkedin.com",
    "youtube.com", "www.youtube.com",
    "tiktok.com", "www.tiktok.com",
    "reddit.com", "www.reddit.com",
    "quora.com", "www.quora.com",
    "medium.com", "www.medium.com",
    "pinterest.com", "www.pinterest.com",
]
TRANSLATION_AND_SEARCH_HOSTS = ["m.baidu.com", "baidu.com", "translate.google.com"]
TRACKING_AND_AD_HOSTS = [
    "doubleclick.net", "googletagmanager.com",
    "google-analytics.com", "adservice.google.com",
    "scorecardresearch.com",
    "taboola.com", "outbrain.com",
]
CDN_AND_STATIC_HOSTS = [
    "api.nytimes.com", "api.bbc.com",
    "static.nytimes.com",
    "cdn.cnn.com", "cdn.britannica.com",
    "akamaihd.net", "cloudfront.net",
    "fastly.net",
]
LOCAL_HOSTS = ["localhost", "127.0.0.1"]

BLACKLISTED_HOSTS = frozenset(
    SOCIAL_MEDIA_HOSTS
    + TRANSLATION_AND_SEARCH_HOSTS
    + TRACKING_AND_AD_HOSTS
    + CDN_AND_STATIC_HOSTS
    + LOCAL_HOSTS
)

TRACKING_QUERY_SUBSTRINGS = ["?utm_", "&utm_", "gclid=", "fbclid="]
REFERRAL_QUERY_SUBSTRINGS = ["?ref=", "?source="]
AUTH_PATH_SUBSTRINGS = [
    "/login", "/signin", "/logout",
    "/subscribe", "/account", "/profile",
    "/register", "/checkout", "/cart",
]
SEARCH_PATH_SUBSTRINGS = ["/search?", "/?q=", "query="]
CALENDAR_PATH_SUBSTRINGS = ["/calendar", "/events/", "/year/", "/month/", "/day/"]
SOCIAL_SHARE_SUBSTRINGS = ["/share?", "/facebook.com/sharer", "/twitter.com/share"]
API_AND_FEED_SUBSTRINGS = ["/api/", "/graphql", "/ajax/", "/feeds/", ".json", ".xml"]
PRINT_VIEW_SUBSTRINGS = ["/print/", "?print"]
SESSION_SUBSTRINGS = [";jsessionid="]

BLACKLISTED_SUBSTRINGS = (
    TRACKING_QUERY_SUBSTRINGS
    + REFERRAL_QUERY_SUBSTRINGS
    + AUTH_PATH_SUBSTRINGS
    + SEARCH_PATH_SUBSTRINGS
    + CALENDAR_PATH_SUBSTRINGS
    + SOCIAL_SHARE_SUBSTRINGS
    + API_AND_FEED_SUBSTRINGS
    + PRINT_VIEW_SUBSTRINGS
    + SESSION_SUBSTRINGS
)

IMAGE_EXTENSIONS = [".jpg", ".jpeg", ".png", ".gif", ".svg", ".webp"]
VIDEO_AUDIO_EXTENSIONS = [".mp4", ".mov", ".avi", ".mkv", ".webm", ".mp3", ".wav"]
DOCUMENT_ARCHIVE_EXTENSIONS = [
    ".pdf", ".doc", ".docx", ".ppt", ".pptx", ".xls", ".xlsx",
    ".zip", ".tar", ".gz", ".tgz", ".rar", ".7z",
]
FONT_STYLE_EXTENSIONS = [".css", ".js", ".woff", ".woff2", ".ttf", ".eot"]
ERROR_PAGE_EXTENSIONS = [".php", ".aspx"]

BLACKLISTED_EXTENSIONS = (
    IMAGE_EXTENSIONS
    + VIDEO_AUDIO_EXTENSIONS
    + DOCUMENT_ARCHIVE_EXTENSIONS
    + FONT_STYLE_EXTENSIONS
    + ERROR_PAGE_EXTENSIONS
)

BLACKLISTED_LANGUAGE = ["/es/", "/de/", "/fr/", "/ja/", "/zh/", "/ru/", "/ar/"]

_EXT_TUPLE = tuple(BLACKLISTED_EXTENSIONS)


def should_crawl(url: str | None) -> bool:
    """``Crawler.shouldCrawl`` (``Crawler.java:940-982``)."""
    if not url:
        return False
    parts = parse_url(url)
    protocol = parts[0].lower() if parts[0] is not None else "http"
    host = parts[1].lower() if parts[1] is not None else ""
    path = parts[3] if (parts[3] is not None and parts[3] != "") else "/"

    if protocol not in ("http", "https"):
        return False
    if not host:
        return False

    lower_path = path.lower()
    lower_url = url.lower()

    if host in BLACKLISTED_HOSTS:
        return False
    if lower_path.endswith(_EXT_TUPLE):
        return False
    for s in BLACKLISTED_SUBSTRINGS:
        if s in lower_url:
            return False
    for s in BLACKLISTED_LANGUAGE:
        if s in lower_path:
            return False
    return True


_SKIP_PREFIXES = ("mailto:", "tel:", "javascript:", "data:", "about:", "ftp:")


def is_skippable_href(href: str | None) -> bool:
    """``Crawler.isSkippableHref`` (``Crawler.java:1079-1090``)."""
    if href is None:
        return True
    h = href.strip()
    if not h or h.startswith("#"):
        return True
    return h.lower().startswith(_SKIP_PREFIXES)


def unwrap_urldefense(url: str | None) -> str | None:
    """``Crawler.unwrapUrlDefense`` (``Crawler.java:1092-1109``)."""
    if url is None:
        return None
    if "urldefense.com" not in url.lower():
        return url
    try:
        a = url.find("__")
        if a < 0:
            return None
        b = url.find("__", a + 2)
        if b <= a + 2:
            return None
        inner = url[a + 2 : b]
        return urllib.parse.unquote(inner, encoding="utf-8")
    except Exception:
        return None
