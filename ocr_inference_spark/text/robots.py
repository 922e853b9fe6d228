"""robots.txt parsing and crawl-politeness filtering (RFC 9309).

A 10^12-capture ingest must honor robots exclusion — both as law of
the crawl and because filtered-early pages are pages never parsed. The
from-scratch implementation covers the RFC 9309 core: group selection
by most-specific matching ``User-agent`` (product token,
case-insensitive; ``*`` only when no specific group matches), rule
precedence by longest path pattern in octets with Allow winning exact
ties, and the ``*`` wildcard / ``$`` end-anchor pattern syntax the RFC
standardized from the de-facto extensions. Undocumented corners are
resolved the permissive way a crawler must: no robots.txt or an empty
matched group means allowed, unparseable lines are skipped.

Scale shape: the robots dictionary is one tiny row per host (the
crawl's host count, millions at most, dwarfed by its capture count) —
broadcast it onto the capture stream and evaluate rules in the same
zero-shuffle kernel that walks the captures; compiled matchers are
cached per robots body inside the kernel, so per-capture cost is a few
regex probes.
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HOST_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", re.A)


def parse_robots(text: str, agent: str) -> list[tuple[bool, str]]:
    """robots.txt body -> the (allow, pattern) rules of the group that
    governs ``agent`` (a bare product token, e.g. ``"synthbot"``).
    Group selection per RFC 9309 §2.2.1: the group whose user-agent
    line is the longest case-insensitive prefix-token match of the
    agent wins; ``*`` groups apply only when no specific group
    matches. Multiple groups for the same agent merge."""
    agent = agent.lower()
    groups: dict[str, list[tuple[bool, str]]] = {}
    current: list[str] = []
    rules_started = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if rules_started:
                current = []
                rules_started = False
            current.append(value.lower())
            for a in current:
                groups.setdefault(a, [])
        elif field in ("allow", "disallow"):
            rules_started = True
            if not current:
                continue  # rule before any user-agent line: ignored
            for a in current:
                groups.setdefault(a, []).append((field == "allow", value))
        # other fields (crawl-delay, sitemap) end no group
    best = None
    for a in groups:
        if a != "*" and (agent == a or agent.startswith(a)):
            if best is None or len(a) > len(best):
                best = a
    if best is None and "*" in groups:
        best = "*"
    return groups.get(best, []) if best is not None else []


@lru_cache(maxsize=4096)
def _pattern_re(pattern: str) -> re.Pattern:
    parts = []
    body, anchored = (
        (pattern[:-1], True) if pattern.endswith("$") else (pattern, False)
    )
    for piece in body.split("*"):
        parts.append(re.escape(piece))
    return re.compile("^" + ".*".join(parts) + ("$" if anchored else ""))


def robots_allowed(rules: list[tuple[bool, str]], path: str) -> bool:
    """RFC 9309 §2.2.2 precedence: among rules whose pattern matches
    the path, the longest pattern (octets) wins; on a tie Allow wins;
    no matching rule (or an empty ``Disallow:``) means allowed."""
    verdict, best_len = True, -1
    for allow, pattern in rules:
        if not pattern:
            continue  # empty Disallow/Allow matches nothing per RFC
        if _pattern_re(pattern).search(path):
            plen = len(pattern)
            if plen > best_len or (plen == best_len and allow):
                verdict, best_len = allow, plen
    return verdict


def robots_filter(
    pages: DataFrame,
    robots: DataFrame,
    agent: str,
    url_col: str = "url",
) -> DataFrame:
    """Drop pages whose URL path the host's robots.txt disallows for
    ``agent``. ``robots`` is (host, robots_txt) — one tiny row per
    host, broadcast onto the page stream; hosts with no robots row are
    allowed. Rule evaluation runs in a zero-shuffle mapInPandas kernel
    with per-body parsed-rule caching."""
    import pandas as pd

    host = F.regexp_extract(F.col(url_col), _HOST_RE.pattern, 1)
    joined = pages.withColumn("__host", F.lower(host)).join(
        F.broadcast(robots.select(F.lower("host").alias("__host"), "robots_txt")),
        "__host",
        "left",
    )
    out_schema = joined.drop("__host", "robots_txt").schema

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rule_cache: dict[str, list[tuple[bool, str]]] = {}
        for pdf in batches:
            keep = []
            for url, body in zip(pdf[url_col], pdf["robots_txt"]):
                if body is None or not isinstance(body, str):
                    keep.append(True)
                    continue
                rules = rule_cache.get(body)
                if rules is None:
                    rules = rule_cache[body] = parse_robots(body, agent)
                m = _HOST_RE.match(url or "")
                path = (url or "")[m.end() :] if m else (url or "")
                keep.append(robots_allowed(rules, path or "/"))
            yield pdf[keep].drop(columns=["__host", "robots_txt"])

    return joined.mapInPandas(kernel, schema=out_schema)
