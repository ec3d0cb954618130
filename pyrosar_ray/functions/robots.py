"""robots.txt — the Robots Exclusion Protocol (RFC 9309), as crawlers
actually apply it: a crawl frontier is FILTERED through per-host robots
rules before fetching, so at corpus scale this is a broadcast-small-side
gate over every candidate URL.

Real REP semantics, not a substring check:

- line grammar: ``key: value`` with ``#`` comments, blank-line-agnostic
  group structure (consecutive ``User-agent`` lines share one group),
  unknown directives (``Crawl-delay``, ``Sitemap``) ignored,
- group selection: the crawler's product token picks its OWN group when
  one exists; otherwise the ``*`` group; groups never merge (a specific
  group completely shadows ``*`` — RFC 9309 §2.2.1),
- rule matching: longest-match wins over all Allow/Disallow rules of
  the selected group (§2.2.2), ``*`` wildcards and ``$`` end anchors
  supported, ties prefer Allow, no match → allow.
"""

from __future__ import annotations

import re


def parse_robots(text: str) -> dict[str, list[tuple[str, bool]]]:
    """→ {agent_token(lower): [(pattern, allow), ...]} in file order."""
    groups: dict[str, list[tuple[str, bool]]] = {}
    current: list[list[tuple[str, bool]]] = []
    rules_seen = False  # rules since the last User-agent line
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, value = line.partition(":")
        if not _:
            continue
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            token = value.lower()
            if rules_seen:  # a rule block closes the previous group
                current = []
                rules_seen = False
            current.append(groups.setdefault(token, []))
        elif key in ("allow", "disallow"):
            if not current:
                continue  # rules before any user-agent line: ignored
            rules_seen = True
            if not value and key == "disallow":
                continue  # empty Disallow = allow all (no rule)
            for rules in current:
                rules.append((value, key == "allow"))
        # other keys (crawl-delay, sitemap, ...) are ignored
    return groups


def compile_rule(pattern: str) -> re.Pattern:
    """REP pattern → anchored regex: ``*`` any-chars, trailing ``$``
    end-anchor, everything else literal, implicit start anchor."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if ch == "*" else re.escape(ch) for ch in body)
    return re.compile("^" + rx + ("$" if anchored else ""))


class RobotsMatcher:
    """Compiled per-host matcher — build once (per actor), match often."""

    def __init__(self, text: str, agent: str):
        groups = parse_robots(text)
        token = agent.lower()
        rules = groups.get(token)
        if rules is None:
            rules = groups.get("*", [])
        self.rules = [
            (len(pat), compile_rule(pat), allow, pat) for pat, allow in rules
        ]

    def decision(self, path: str) -> tuple[bool, str]:
        """→ (allowed, matched_pattern or '')."""
        best: tuple[int, int, str] | None = None  # (length, allow, pattern)
        for length, rx, allow, pat in self.rules:
            if rx.match(path):
                key = (length, 1 if allow else 0)
                if best is None or key > (best[0], best[1]):
                    best = (length, 1 if allow else 0, pat)
        if best is None:
            return True, ""
        return bool(best[1]), best[2]
