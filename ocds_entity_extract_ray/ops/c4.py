"""C4-style document cleaning (Raffel et al. 2020, "Exploring the Limits
of Transfer Learning with a Unified Text-to-Text Transformer", §2.2) —
the classic line-level webtext filter battery that produced the C4
corpus, as a zero-shuffle map stage:

  line KEPT iff it ends in a terminal punctuation mark (. ! ? "),
  contains at least ``min_words_per_line`` words, and does not contain
  "javascript" (case-insensitive);
  doc PASSES iff its text contains neither "lorem ipsum"
  (case-insensitive) nor "{", and at least ``min_kept_lines`` lines
  survive (the paper counts sentences via nltk; kept lines are this
  engine's deterministic, oracle-exact proxy — every kept line ends in
  terminal punctuation, so it is a sentence boundary).

The paper's bad-words list is deliberately out of scope (policy data,
not an algorithm); plug one in by post-filtering on ``clean_text``.

Corpus note: the synthetic documents are single-line, so like
``passages.dedup_lines`` the op accepts ``words_per_line`` to reflow a
document into consecutive N-word lines (tail partial line INCLUDED),
mirrored in the SQL twin by the same array-slicing spine. Real crawl
text with newlines uses ``words_per_line=None``.

All thresholds are integer comparisons and all string predicates are
substring/suffix checks, so the flags have a bitwise-exact DuckDB twin
(``pipelines/relational.py: Q_C4_QUALITY_SQL``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from .passages import _doc_lines

_TERMINAL = ('.', '!', '?', '"')


def c4_clean_batch(
    ids,
    texts,
    *,
    words_per_line: int | None = None,
    min_words_per_line: int = 3,
    min_kept_lines: int = 5,
    id_col: str = "doc_id",
) -> pd.DataFrame:
    """One batch of the C4 rules. Line splitting is the only per-doc
    Python work (same shape as dedup_lines' occurrence pass); every
    predicate over the exploded line frame is a vectorized pandas str
    kernel. Returns (id, n_lines, n_kept, has_lorem, has_brace,
    c4_pass, clean_text) — clean_text is the kept lines joined by \\n
    for passing docs, None otherwise (the paper drops the whole page)."""
    ids = np.asarray(ids)
    doc_idx, line_strs = [], []
    for i, t in enumerate(texts):
        # NaN floats are truthy, so `t or ""` alone would crash _doc_lines
        # on pandas-origin missing strings — any non-str is missing text
        ls = _doc_lines(t if isinstance(t, str) else "", words_per_line)
        doc_idx.extend([i] * len(ls))
        line_strs.extend(ls)
    lf = pd.DataFrame(
        {
            "_i": np.asarray(doc_idx, dtype=np.int64),
            # explicit object dtype: an EMPTY batch would otherwise infer
            # float64 and every .str accessor below would raise
            "line": pd.Series(line_strs, dtype="object"),
        }
    )
    s = lf["line"]
    kept = (
        s.str.endswith(_TERMINAL)
        & (s.str.count(r"[^ ]+") >= min_words_per_line)
        & ~s.str.lower().str.contains("javascript", regex=False)
    )
    lf["_kept"] = kept.to_numpy()

    g = lf.groupby("_i", sort=True)
    n_lines = g.size()
    n_kept = g["_kept"].sum().astype(np.int64)
    # kept-lines-joined, in line order (groupby preserves within-group order)
    joined = lf.loc[lf["_kept"], ["_i", "line"]].groupby("_i", sort=True)["line"].agg(
        "\n".join
    )

    tser = pd.Series(texts, dtype="object").fillna("")
    has_lorem = tser.str.lower().str.contains("lorem ipsum", regex=False)
    has_brace = tser.str.contains("{", regex=False)

    idx = np.arange(len(ids))
    out = pd.DataFrame(
        {
            id_col: ids,
            "n_lines": n_lines.reindex(idx, fill_value=0).to_numpy(dtype=np.int64),
            "n_kept": n_kept.reindex(idx, fill_value=0).to_numpy(dtype=np.int64),
            "has_lorem": has_lorem.to_numpy(dtype=bool),
            "has_brace": has_brace.to_numpy(dtype=bool),
        }
    )
    out["c4_pass"] = (
        ~out["has_lorem"] & ~out["has_brace"] & (out["n_kept"] >= min_kept_lines)
    )
    # contract: clean_text is str for passing docs, None for dropped ones
    # — fillna keeps a min_kept_lines=0 pass with zero kept lines as ''
    # instead of leaking the reindex NaN into the column
    clean = joined.reindex(idx).fillna("")
    out["clean_text"] = np.where(out["c4_pass"].to_numpy(), clean.to_numpy(), None)
    return out


def add_c4_quality(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    words_per_line: int | None = None,
    min_words_per_line: int = 3,
    min_kept_lines: int = 5,
) -> ray.data.Dataset:
    """documents -> C4 flag/clean frame, map-only (zero shuffle; the C4
    pipeline stage that runs before any dedup exchange at 100 TB)."""

    def run(b: pd.DataFrame) -> pd.DataFrame:
        return c4_clean_batch(
            b[id_col].to_numpy(),
            b[text_col].tolist(),
            words_per_line=words_per_line,
            min_words_per_line=min_words_per_line,
            min_kept_lines=min_kept_lines,
            id_col=id_col,
        )

    return ds.map_batches(run, batch_format="pandas")
