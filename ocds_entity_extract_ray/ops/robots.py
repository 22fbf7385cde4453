"""robots.txt parsing + crawl-permission evaluation (RFC 9309 subset).

The crawl-side gate every fetch pipeline runs before a URL enters the
corpus. Two pieces:

- ``parse_robots_txt``: the ``User-agent: *`` group's Allow/Disallow
  rules from a robots.txt body — groups are selected per RFC 9309 §2.2.1
  (a group is one or more consecutive user-agent lines followed by
  rules; we take the ``*`` group), keys case-insensitive, comments and
  blank lines ignored, empty Disallow (``Disallow:``) means
  "allow everything" and contributes no rule.
- ``evaluate_robots``: longest-prefix-match precedence with the
  allow-wins tie rule (RFC 9309 §2.2.2); a path matching NO rule is
  allowed. Vectorized per host: each rule is one ``str.startswith``
  pass over the host's paths, best (prefix length, allow) tracked with
  numpy maximums — rules-per-host is tiny, paths-per-batch is not.

Wildcard ``*``/``$`` patterns (a Google extension, not in the RFC's
required core) are NOT implemented — a rule containing them raises so a
corpus with such robots bodies fails loudly instead of mis-evaluating.

Scale shape: robots bodies are per-HOST (tiny side data); parse once per
host and broadcast, evaluate as a stateless map over the URL stream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def parse_robots_txt(text: str) -> list[tuple[str, bool]]:
    """robots.txt body -> ordered [(path_prefix, allow)] for UA ``*``."""
    rules: list[tuple[str, bool]] = []
    in_star_group = False
    prev_was_ua = False
    # BOM-prefixed robots.txt is common in real crawls; str.strip() does
    # NOT remove U+FEFF, and a BOM'd first 'User-agent' key would
    # silently drop the whole * group (the gate would fail open)
    for raw in (text or "").lstrip("﻿").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _sep, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            # RFC 9309 §2.2.1: a group is a run of user-agent lines then
            # rules; a user-agent line AFTER rules starts a new group.
            # §2.2.4: other records (crawl-delay, sitemap, unknown keys)
            # "MUST NOT interfere with parsing" — they are TRANSPARENT,
            # so user-agent runs merge across them (the reference-parser
            # behavior; also the fail-CLOSED direction for a gate, since
            # a merged group can only add rules to *, never drop them)
            if prev_was_ua is False:
                in_star_group = False
            if value == "*":
                in_star_group = True
            prev_was_ua = True
            continue
        if key in ("allow", "disallow"):
            prev_was_ua = False
            if not in_star_group:
                continue
            if "*" in value or value.endswith("$"):
                raise ValueError(
                    f"parse_robots_txt: wildcard patterns unsupported "
                    f"({value!r}) — refusing to mis-evaluate"
                )
            if value == "":
                continue  # empty Disallow/Allow: no rule
            rules.append((value, key == "allow"))
        # other keys (crawl-delay, sitemap, ...) are ignored
    return rules


def evaluate_robots(
    frame: pd.DataFrame,
    rules_by_host: dict[str, list[tuple[str, bool]]],
    *,
    host_col: str = "host",
    path_col: str = "path",
) -> np.ndarray:
    """allowed flag (bool per row): longest-prefix match, allow wins
    ties, no-match -> allowed."""
    allowed = np.ones(len(frame), dtype=bool)
    if not len(frame):
        return allowed
    # a URL with no path is the root: '' never prefix-matches '/', so an
    # un-normalized empty path would dodge even 'Disallow: /'
    paths = frame[path_col].replace("", "/").reset_index(drop=True)
    # one O(N) groupby pass instead of an O(H*N) equality scan per host
    host_groups = frame.reset_index(drop=True).groupby(host_col).indices
    for host, idx in host_groups.items():
        rules = rules_by_host.get(host, [])
        if not rules:
            continue
        p = paths.iloc[idx]
        best_len = np.full(len(idx), -1, dtype=np.int64)
        best_allow = np.ones(len(idx), dtype=bool)
        for prefix, allow in rules:
            hit = p.str.startswith(prefix).to_numpy()
            ln = len(prefix)
            # longer prefix wins; equal length: allow wins over disallow
            better = hit & (
                (ln > best_len) | ((ln == best_len) & allow & ~best_allow)
            )
            best_len = np.where(better, ln, best_len)
            best_allow = np.where(better, allow, best_allow)
        allowed[idx] = np.where(best_len >= 0, best_allow, True)
    return allowed
