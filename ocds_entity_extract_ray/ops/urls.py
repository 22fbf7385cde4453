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

Contract: absolute URLs only (``scheme://...``); anything else raises
with a message naming the offending URL. Userinfo (``user:pass@host``) is
stripped at the last '@' of the authority, bracketed IPv6 hosts are kept
whole (``[::1]``), and an empty port (``host:/``) means the scheme
default — all three occur in real crawl frontiers. The synthetic corpus
behind the SQL twins contains none of them, so the DuckDB parse chain
models only the plain host[:port] subset.
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

    # strip userinfo: everything up to the LAST '@' in the authority
    # (WHATWG; 'user:pass@h.com' — the userinfo may itself contain ':')
    auth = hostport.str.extract(r"^(?:.*@)?(.*)$", expand=True)[0]

    # IPv6 hosts are bracketed and may contain ':' — split host:port on
    # the bracket for those rows, on the first ':' otherwise
    is_v6 = auth.str.startswith("[").fillna(False)
    v6 = auth.str.extract(r"^(\[[^\]]*\])(?::(.*))?$", expand=True)
    plain_host, plain_port = _split2(auth, ":")
    if is_v6.any() and v6.loc[is_v6, 0].isna().any():
        bad = s[is_v6 & v6[0].isna()].iloc[0]
        raise ValueError(f"parse_urls: malformed IPv6 authority in URL: {bad!r}")
    host = pd.Series(
        np.where(is_v6, v6[0], plain_host), index=s.index
    ).str.lower()

    default_port = scheme.map(_DEFAULT_PORTS).fillna(0).astype("int64")
    port_str = pd.Series(
        np.where(is_v6, v6[1], plain_port), index=s.index
    ).fillna("")
    explicit = port_str != ""  # 'http://h.com:/' has an EMPTY port -> default
    bad_port = explicit & ~port_str.str.fullmatch(r"\d+").fillna(False)
    if bad_port.any():
        bad = s[bad_port].iloc[0]
        raise ValueError(f"parse_urls: non-numeric port in URL: {bad!r}")
    port = pd.Series(
        np.where(explicit, port_str, default_port.astype(str)), index=s.index
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
