"""robots.txt parsing and evaluation, exact to the reference crawler.

Reference:
- ``parse_robots_rules_ordered``: ``src/jobs/Crawler.java:853-896``
- ``extract_crawl_delay``:        ``src/jobs/Crawler.java:898-938``
- ``robots_allows``:              ``src/jobs/Crawler.java:780-849``

Semantics: rules are grouped by the most recent ``User-agent`` line
(exact UA match wins over ``*``; any other UA opens an ignored group).
Evaluation is longest-prefix-match over ``path.startswith(prefix)``;
ties on length keep the earlier winner only if strictly longer (the
reference requires ``>`` to replace).  Missing/404/unfetchable robots
⇒ allow.

REFERENCE BUG, reproduced faithfully: the parser stores rules as
``"A:" + val`` / ``"D:" + val`` (``Crawler.java:881,886``) but the
evaluator requires ``rule.charAt(1) == ' '`` (``Crawler.java:832``),
and char 1 is always ``':'`` — so every rule is skipped,
``longestMatch`` stays null, and ``robotsAllows`` returns true for
every path.  Net effect in the reference: Allow/Disallow are ignored;
only ``Crawl-delay`` is honored.  :func:`robots_allows` reproduces
this (conformance mode); :func:`robots_allows_strict` implements the
evidently intended longest-prefix semantics for ``fidelity="strict"``
pipelines.
"""

from __future__ import annotations

UA = "cis5550-crawler"
DEFAULT_DELAY = 1.0


def parse_robots_rules_ordered(
    robots: str | None, ua: str = UA
) -> tuple[list[str], list[str]]:
    """Return ``(rules_for_ua, rules_for_star)`` as ``"A:<p>"``/``"D:<p>"``."""
    rules_ua: list[str] = []
    rules_star: list[str] = []
    if robots is None:
        return rules_ua, rules_star
    group = 0
    for raw in robots.replace("\r", "").split("\n"):
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        colon = line.find(":")
        if colon <= 0:
            continue
        key = line[:colon].strip().lower()
        val = line[colon + 1 :].strip()
        if key == "user-agent":
            v = val.lower()
            if v == ua.lower():
                group = 1
            elif v == "*":
                group = 2
            else:
                group = 3
        elif key == "allow":
            if group == 1:
                rules_ua.append("A:" + val)
            elif group == 2:
                rules_star.append("A:" + val)
        elif key == "disallow":
            if group == 1:
                rules_ua.append("D:" + val)
            elif group == 2:
                rules_star.append("D:" + val)
    return rules_ua, rules_star


def extract_crawl_delay(robots: str | None, ua: str = UA) -> str | None:
    """First parseable ``Crawl-delay`` (UA group preferred over ``*``)."""
    if robots is None:
        return None
    group = 0
    first_target: str | None = None
    first_star: str | None = None
    for raw in robots.replace("\r", "").split("\n"):
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        colon = line.find(":")
        if colon <= 0:
            continue
        key = line[:colon].strip().lower()
        val = line[colon + 1 :].strip()
        if key == "user-agent":
            v = val.lower()
            group = 1 if v == ua.lower() else (2 if v == "*" else 3)
            continue
        if key == "crawl-delay":
            if group == 1 and first_target is None:
                first_target = val
            elif group == 2 and first_star is None:
                first_star = val
    chosen = first_target if first_target is not None else first_star
    if chosen is None:
        return None
    try:
        float(chosen)
        return chosen
    except ValueError:
        return None


def robots_allows(
    robots_status: int | None, robots_txt: str | None, path: str, ua: str = UA
) -> bool:
    """``Crawler.robotsAllows`` given the cached host row.

    ``robots_status`` is the stored HTTP status (``None``/0 when the host
    row is missing); 404 / <=0 / non-2xx ⇒ allow.
    """
    status = robots_status if robots_status is not None else 0
    if status == 404 or status <= 0:
        return True
    if status < 200 or status >= 300:
        return True
    robots = robots_txt
    if not robots:
        return True
    if not path.startswith("/"):
        idx = path.find("/", path.find("://") + 3)
        path = path[idx:] if idx >= 0 else "/"

    rules_ua, rules_star = parse_robots_rules_ordered(robots, ua)
    rules = rules_star if not rules_ua else rules_ua
    if not rules:
        return True

    is_allow = True
    longest: str | None = None
    for rule in rules:
        if rule is None or len(rule) < 3:
            continue
        kind = rule[0]
        if rule[1] != " ":
            continue
        prefix = rule[2:]
        if not prefix:
            continue
        if path.startswith(prefix):
            if longest is None or len(prefix) > len(longest):
                longest = prefix
                is_allow = kind == "A"
    return longest is None or is_allow


def robots_allows_parsed(
    rules: list[str] | None, path: str, reference_mode: bool = True
) -> bool:
    """Fast-path evaluation over pre-parsed rules (the selected UA/star
    group from :func:`parse_robots_rules_ordered`); ``rules=None`` means
    the status/body gating already decided allow.  Semantics identical
    to :func:`robots_allows` (reference mode keeps the separator bug —
    every rule skipped) / :func:`robots_allows_strict`."""
    if not rules:
        return True
    if not path.startswith("/"):
        idx = path.find("/", path.find("://") + 3)
        path = path[idx:] if idx >= 0 else "/"
    is_allow = True
    longest: str | None = None
    for rule in rules:
        if rule is None or len(rule) < 3:
            continue
        if reference_mode and rule[1] != " ":
            continue
        prefix = rule[2:]
        if not prefix:
            continue
        if path.startswith(prefix):
            if longest is None or len(prefix) > len(longest):
                longest = prefix
                is_allow = rule[0] == "A"
    return longest is None or is_allow


def select_rules(
    robots_status: int | None, robots_txt: str | None, ua: str = UA
) -> list[str] | None:
    """Pre-parse a host's cached robots into the effective rule list
    (``None`` = unconditional allow): the once-per-host half of
    :func:`robots_allows`, for callers that evaluate many paths."""
    status = robots_status if robots_status is not None else 0
    if status == 404 or status <= 0:
        return None
    if status < 200 or status >= 300:
        return None
    if not robots_txt:
        return None
    rules_ua, rules_star = parse_robots_rules_ordered(robots_txt, ua)
    rules = rules_star if not rules_ua else rules_ua
    return rules or None


def robots_allows_strict(
    robots_status: int | None, robots_txt: str | None, path: str, ua: str = UA
) -> bool:
    """Intended longest-prefix semantics (rule separator fixed).

    Same gating as :func:`robots_allows` but rules actually match:
    ``A <prefix>`` / ``D <prefix>`` with longest-prefix-wins.
    """
    status = robots_status if robots_status is not None else 0
    if status == 404 or status <= 0:
        return True
    if status < 200 or status >= 300:
        return True
    if not robots_txt:
        return True
    if not path.startswith("/"):
        idx = path.find("/", path.find("://") + 3)
        path = path[idx:] if idx >= 0 else "/"
    rules_ua, rules_star = parse_robots_rules_ordered(robots_txt, ua)
    rules = rules_star if not rules_ua else rules_ua
    if not rules:
        return True
    is_allow = True
    longest: str | None = None
    for rule in rules:
        kind, prefix = rule[0], rule[2:]
        if not prefix:
            continue
        if path.startswith(prefix):
            if longest is None or len(prefix) > len(longest):
                longest = prefix
                is_allow = kind == "A"
    return longest is None or is_allow
