"""Lexical top-k retrieval: an integer BM25-shaped ranking function over
the documents table (Robertson/Sparck-Jones BM25 with k1=6/5, b=3/4 as
exact rationals, and a LOG-FREE rational idf so the whole score is int64
arithmetic and the query carries a hash-exact DuckDB twin — the same
fixed-point discipline as PageRank / tf-idf / k-means):

    len_d   = |[a-z0-9]+ tokens of lower(text)|
    avgdl   = max(1, total_tokens // n_docs)         (integer average)
    idf(t)  = IDF_SCALE - (IDF_SCALE * df_t) // N    (linear-in-df, bounded)
    tfp(t,d)= (TF_SCALE * 22 * tf * avgdl)
              // (10 * avgdl * tf + 3 * avgdl + 9 * len_d)
              -- i.e. tf*(k1+1) / (tf + k1*(1-b+b*len/avgdl)) scaled by
              -- 10*avgdl, with k1+1 = 11/5 and k1*(1-b) = 3/10
    score(q,d) = sum over q's terms of idf(t) * tfp(t,d), docs with
                 score > 0 ranked (score DESC, doc_id ASC), top k kept.

Headroom: tfp <= 2.2 * TF_SCALE, idf <= IDF_SCALE, so a 32-term query
sums to <= ~7e13 — far inside int64 at any corpus size (avgdl is
per-document scale, never corpus scale).

Scale shape (two streaming passes, no corpus-sized shuffle):
  pass A: per-batch partials of (n_docs, total_len, df per query term) —
          one tiny (T+2)-int row per batch, driver-summed;
  pass B: per-batch score matrix (docs x terms one int64 matmul against
          the broadcast idf/term-mask weights) + LOCAL top-k per query,
          so only k rows per (query, batch) enter the final
          bucketed top-k merge.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from .agg import bucketed_map_groups

IDF_SCALE = 1_000_000
TF_SCALE = 1_000_000
_TOKEN_SPLIT_RE2 = "[^a-z0-9]+"


def _term_counts(texts, terms: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(n_docs x n_terms) occurrence counts + per-doc token counts, from
    ONE RE2 split of the lowercased column."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .textstats import _texts_to_arrow

    arr = _texts_to_arrow(texts)
    parts = pc.split_pattern_regex(pc.utf8_lower(arr), _TOKEN_SPLIT_RE2)
    flat = pc.list_flatten(parts)
    ll = pc.list_value_length(parts).to_numpy().astype(np.int64)
    n = len(ll)
    rows = np.repeat(np.arange(n, dtype=np.int64), ll)
    nonempty = pc.utf8_length(flat).to_numpy().astype(np.int64) > 0
    len_d = np.bincount(rows[nonempty], minlength=n).astype(np.int64)
    t = len(terms)
    counts = np.zeros((n, t), dtype=np.int64)
    if len(flat):
        idx = pc.index_in(flat, value_set=pa.array(terms))
        hit = pc.fill_null(idx, -1).to_numpy(zero_copy_only=False).astype(np.int64)
        m = hit >= 0
        if m.any():
            counts = np.bincount(
                rows[m] * t + hit[m], minlength=n * t
            ).reshape(n, t)
    return counts, len_d


def bm25_topk(
    docs: ray.data.Dataset,
    queries: dict[int, list[str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    num_buckets: int = 8,
) -> ray.data.Dataset:
    """Top-``k`` documents per query: Dataset of (query_id, rank, doc_id,
    score). ``queries`` maps query_id -> list of lowercase [a-z0-9]+
    terms."""
    terms = sorted({t for ts in queries.values() for t in ts})
    t = len(terms)
    if not t:
        raise ValueError("bm25_topk: queries contain no terms")

    # pass A: corpus statistics (tiny per-batch partial rows)
    def partials(b: pd.DataFrame) -> pd.DataFrame:
        counts, len_d = _term_counts(b[text_col], terms)
        row = {"n_docs": np.int64(len(b)), "total_len": len_d.sum()}
        present = (counts > 0).sum(axis=0)
        for i in range(t):
            row[f"df_{i}"] = np.int64(present[i])
        return pd.DataFrame([row])

    stats = docs.map_batches(partials, batch_format="pandas").to_pandas().sum()
    n_docs = int(stats["n_docs"])
    if n_docs == 0:
        raise ValueError("bm25_topk: empty corpus")
    avgdl = max(1, int(stats["total_len"]) // n_docs)
    idf = np.array(
        [IDF_SCALE - (IDF_SCALE * int(stats[f"df_{i}"])) // n_docs for i in range(t)],
        dtype=np.int64,
    )
    # weights[t, q] = idf[t] where term t is in query q, else 0
    qids = sorted(queries)
    weights = np.zeros((t, len(qids)), dtype=np.int64)
    tix = {term: i for i, term in enumerate(terms)}
    for j, q in enumerate(qids):
        for term in queries[q]:
            # += so a repeated query term counts with multiplicity (the
            # classic query-tf convention and the docstring's "sum over
            # q's terms")
            weights[tix[term], j] += idf[tix[term]]
    w_ref = ray.put((terms, np.asarray(qids, dtype=np.int64), weights, avgdl))

    def score_batch(b: pd.DataFrame) -> pd.DataFrame:
        from .joins import _fetch

        terms_, qids_, w, adl = _fetch(w_ref)
        counts, len_d = _term_counts(b[text_col], terms_)
        den = 10 * adl * counts + 3 * adl + 9 * len_d[:, None]
        tfp = (TF_SCALE * 22 * adl * counts) // den  # 0 exactly where tf == 0
        scores = tfp @ w  # (n_docs, n_queries) int64
        out_q, out_d, out_s = [], [], []
        ids = b[id_col].to_numpy()
        for j, q in enumerate(qids_):
            col = scores[:, j]
            pos = np.flatnonzero(col > 0)
            if not len(pos):
                continue
            # local top-k: (score DESC, doc_id ASC)
            order = pos[np.lexsort((ids[pos], -col[pos]))][:k]
            out_q.append(np.full(len(order), q, dtype=np.int64))
            out_d.append(ids[order])
            out_s.append(col[order])
        if not out_q:
            return pd.DataFrame(
                {
                    "query_id": pd.Series(dtype=np.int64),
                    id_col: pd.Series(dtype=ids.dtype),
                    "score": pd.Series(dtype=np.int64),
                }
            )
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                id_col: np.concatenate(out_d),
                "score": np.concatenate(out_s),
            }
        )

    cand = docs.map_batches(score_batch, batch_format="pandas")

    def final_topk(block: pd.DataFrame) -> pd.DataFrame:
        out = []
        for q, g in block.groupby("query_id", sort=False):
            g = g.sort_values(["score", id_col], ascending=[False, True]).head(k)
            g = g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))
            out.append(g[["query_id", "rank", id_col, "score"]])
        return pd.concat(out, ignore_index=True)

    empty = pd.DataFrame(
        {
            "query_id": pd.Series(dtype=np.int64),
            "rank": pd.Series(dtype=np.int64),
            id_col: pd.Series(dtype=np.int64),
            "score": pd.Series(dtype=np.int64),
        }
    )
    return bucketed_map_groups(
        cand, "query_id", final_topk, num_buckets=num_buckets, empty_result=empty
    )
