"""URL parsing + normalization — the web-crawl counterpart of the name
laundry (functions/laundry.py): before any per-domain grouping, dedup, or
politeness cap, a crawl pipeline must canonicalize its URLs (case-fold the
scheme/host, drop default ports, strip fragments) and derive the grouping
keys (host, path depth, query-param count).

Everything here is a vectorized pandas-string kernel meant to run inside
``map_batches`` — no per-row Python. The parsing rules are deliberately a
small, EXACTLY-specified subset of WHATWG URL semantics so a DuckDB twin
built from split_part/lower/replace reproduces every field byte-for-byte
(see q_url_domain_stats): no percent-decoding, no IDNA, no query-param
re-ordering — those are lossy or engine-specific, the wrong place for an
exact oracle.

Contract: absolute URLs only (``scheme://...``); anything else raises.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_DEFAULT_PORTS = {"http": 80, "https": 443}


def _split2(s: pd.Series, sep: str) -> tuple[pd.Series, pd.Series]:
    """split(sep, n=1) into exactly two columns; the second is NaN where
    sep is absent (expand=True yields ONE column when no row contains the
    separator, so reindex is load-bearing)."""
    parts = s.str.split(sep, n=1, expand=True)
    parts = parts.reindex(columns=[0, 1])
    return parts[0], parts[1]


def parse_urls(s: pd.Series) -> pd.DataFrame:
    """Parse + normalize a Series of absolute URLs.

    Returns columns:
      scheme      lowercased scheme
      host        lowercased hostname (port stripped)
      port        int64 — explicit port, else the scheme default (80/443)
      path        raw path incl. leading '/', '' when absent
      query       raw query string without '?', '' when absent
      path_depth  int64 count of '/' in path
      n_params    int64 — 0 when no query, else count('&') + 1
      norm        normalized URL: lower scheme+host, default port dropped,
                  explicit NON-default port kept, fragment stripped,
                  path+query verbatim
    """
    s = s.astype(str)
    u1, _frag = _split2(s, "#")
    scheme_raw, rest = _split2(u1, "://")
    if rest.isna().any():
        bad = s[rest.isna()].iloc[0]
        raise ValueError(f"parse_urls: not an absolute URL: {bad!r}")
    scheme = scheme_raw.str.lower()

    # the authority ends at the first '/' OR '?' (fragment is already
    # stripped): 'http://h.com?x=1' is a legal absolute URL with a query
    # and no path, and splitting on '/' alone would swallow the query
    # into the host
    ext = rest.str.extract(r"^([^/?]*)(.*)$", expand=True)
    hostport = ext[0]
    pathq = ext[1].fillna("")

    host_raw, port_raw = _split2(hostport, ":")
    host = host_raw.str.lower()
    default_port = scheme.map(_DEFAULT_PORTS).fillna(0).astype("int64")
    port = pd.Series(
        np.where(port_raw.isna(), default_port, port_raw.fillna("0")),
        index=s.index,
    ).astype("int64")

    path, query_raw = _split2(pathq, "?")
    query = query_raw.fillna("")

    path_depth = path.str.count("/").astype("int64")
    n_params = pd.Series(
        np.where(query == "", 0, query.str.count("&") + 1), index=s.index
    ).astype("int64")

    port_part = np.where(
        port.to_numpy() == default_port.to_numpy(),
        "",
        ":" + port.astype(str),
    )
    query_part = np.where(query == "", "", "?" + query)
    norm = scheme + "://" + host + port_part + path + query_part

    return pd.DataFrame(
        {
            "scheme": scheme,
            "host": host,
            "port": port,
            "path": path,
            "query": query,
            "path_depth": path_depth,
            "n_params": n_params,
            "norm": norm,
        },
        index=s.index,
    )
