"""Text-analysis operators for large-scale training-data pipelines:
language-ID (n-gram/stopword heuristic), quality scoring, token counting,
document fingerprinting (rolling hash + winnowing), simhash.

All pure per-doc functions wrapped in vectorized ``map_batches`` stages —
compiled regexes and stopword tables are module-level (built once per
worker process at import).
"""

from __future__ import annotations

import functools
import hashlib
import re

import numpy as np
import pandas as pd
import ray.data

_TOKEN_RE = re.compile(r"\S+")
_WORD_RE = re.compile(r"[a-zA-ZÀ-ɏ]+")
_PUNCT_RE = re.compile(r"[.,;:!?¡¿\"'()\[\]{}«»]")

# tiny per-language stopword tables (public common-word lists)
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "for", "with", "on", "as"},
    "es": {"el", "la", "de", "que", "y", "en", "los", "del", "las", "por", "con", "para"},
    "fr": {"le", "la", "de", "et", "les", "des", "en", "un", "une", "du", "que", "pour"},
    "de": {"der", "die", "und", "das", "von", "zu", "den", "mit", "ist", "des", "im", "ein"},
    "zh": set(),
}


def token_count(text: str) -> int:
    """Whitespace tokens (the \\S+ convention — matches DuckDB's
    regexp_extract_all(text,'\\S+') length)."""
    return len(_TOKEN_RE.findall(text or ""))


def bpe_ish_token_count(text: str) -> int:
    """A BPE-ish proxy: word + non-word symbol pieces (GPT-2-style pretoken
    split approximated by word/number/punct runs)."""
    return len(re.findall(r"[A-Za-zÀ-ɏ]+|\d+|[^\sA-Za-zÀ-ɏ\d]", text or ""))


def quality_stats(text: str) -> dict:
    """Length / punctuation / stopword ratios (heuristic quality scoring)."""
    t = text or ""
    n_chars = len(t)
    words = [w.lower() for w in _WORD_RE.findall(t)]
    n_words = len(words)
    n_stop = sum(1 for w in words if any(w in sw for sw in _STOPWORDS.values()))
    n_punct = len(_PUNCT_RE.findall(t))
    mean_word_len = (sum(map(len, words)) / n_words) if n_words else 0.0
    return {
        "n_chars": n_chars,
        "n_tokens": token_count(t),
        "n_words": n_words,
        "stopword_ratio": (n_stop / n_words) if n_words else 0.0,
        "punct_ratio": (n_punct / n_chars) if n_chars else 0.0,
        "mean_word_len": mean_word_len,
    }


def detect_lang(text: str) -> str:
    """Stopword-vote language ID; 'und' when no vote. Deterministic."""
    words = [w.lower() for w in _WORD_RE.findall(text or "")]
    if not words:
        return "und"
    scores = {
        lang: sum(1 for w in words if w in sw)
        for lang, sw in _STOPWORDS.items()
        if sw
    }
    best = max(sorted(scores), key=lambda k: scores[k])
    return best if scores[best] > 0 else "und"


# --- Vectorized batch kernels ------------------------------------------------
#
# The per-doc functions above are the semantic reference (and the public
# scalar API); the batch kernels below compute the SAME values with
# pyarrow.compute string kernels + numpy segment sums — no Python-level
# per-row loop — and are what the Dataset stages use. Engine parity: the
# kernels run on RE2 (pyarrow) while the scalar reference uses Python
# `re`, so every pattern here uses EXPLICIT character classes — the word
# class `[a-zA-ZÀ-ɏ]`, the punctuation set, `0-9`, and the complete
# Python-`\s` whitespace set spelled out (`_WS_CHARS` — RE2's ASCII `\s`
# would silently disagree on NBSP/NEL, which are pervasive in
# HTML-derived crawl text). Remaining pinned divergences, both exercised
# by the hypothesis parity test's alphabet bounds:
#  - Python `\d` (unicode digits) vs the explicit `0-9` in the BPE-ish
#    pattern: no non-ASCII Nd code point exists <= U+024F, so the two
#    agree on all ASCII + latin-extended text;
#  - Arrow lowercases with SIMPLE case mapping while Python uses full
#    mapping — U+0130 'İ' (-> 'i' vs 'i'+combining dot) is the only
#    affected code point inside that range.

import pyarrow as pa
import pyarrow.compute as pc

# the complete Python-re `\s` set (unicode whitespace; asserted below
# against the live `re` module so a unicode-table update cannot
# silently desynchronize the two engines)
_WS_CHARS = "\u0009\u000a\u000b\u000c\u000d\u001c\u001d\u001e\u001f \u0085\u00a0\u1680\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200a\u2028\u2029\u202f\u205f\u3000"
assert all(__import__("re").match(r"\s", c) for c in _WS_CHARS) and len(_WS_CHARS) == 29
_WORD_SPLIT_RE2 = "[^a-zA-ZÀ-ɏ]+"
_PUNCT_RE2 = "[.,;:!?¡¿\"'()\\[\\]{}«»]"
_TOKEN_RE2 = f"[^{_WS_CHARS}]+"
_BPE_RE2 = f"[A-Za-zÀ-ɏ]+|[0-9]+|[^{_WS_CHARS}A-Za-zÀ-ɏ0-9]"
# counts-matmul vs reduceat crossover for the simhash accumulator (cells
# of the (n_rows, vocab) occurrence matrix; tests force the other branch)
_SIMHASH_MATMUL_CELLS = 64_000_000
_ALL_STOPWORDS = sorted(set().union(*_STOPWORDS.values()))
_LANGS = sorted(lang for lang, sw in _STOPWORDS.items() if sw)
# value_set arrays built once per process, not per batch
_ALL_STOP_ARR = pa.array(_ALL_STOPWORDS)
_LANG_STOP_ARRS = [pa.array(sorted(_STOPWORDS[lang])) for lang in _LANGS]


def _texts_to_arrow(texts) -> "pa.Array":
    if isinstance(texts, pa.ChunkedArray):
        arr = texts.combine_chunks()
    elif isinstance(texts, pa.Array):
        arr = texts
    else:
        arr = pa.array(pd.Series(texts), from_pandas=True)
    if arr.null_count:
        arr = pc.fill_null(arr, "")
    return pc.cast(arr, pa.large_string())


def _word_segments(arr) -> tuple:
    """Split into lowercased word runs: returns (lower_flat_words,
    word_lengths, row_index, n_rows). Splitting the ORIGINAL text (not a
    lowercased copy) mirrors `_WORD_RE.findall(t)` + per-word lower —
    lowercasing first could move word boundaries for exotic code points.
    Empty segments (split artifacts at boundaries) carry length 0 and are
    masked out by callers via `word_lengths > 0`."""
    parts = pc.split_pattern_regex(arr, _WORD_SPLIT_RE2)
    flat = pc.list_flatten(parts)
    ll = pc.list_value_length(parts).to_numpy().astype(np.int64)
    row_idx = np.repeat(np.arange(len(ll), dtype=np.int64), ll)
    lower = pc.utf8_lower(flat)
    # lengths AFTER lowercasing — the scalar reference measures the
    # lowercased word, and lower() can change the code-point count
    # (e.g. 'İ' -> 'i' + combining dot)
    wlen = pc.utf8_length(lower).to_numpy().astype(np.int64)
    return lower, wlen, row_idx, len(ll)


def _quality_from_segments(arr, lower, wlen, row_idx, n) -> dict[str, np.ndarray]:
    nonempty = wlen > 0
    n_words = np.bincount(row_idx[nonempty], minlength=n).astype(np.int64)
    # word lengths fit far below 2^53: the float-weight bincount is exact
    sum_wlen = np.bincount(row_idx, weights=wlen, minlength=n)
    stop = pc.is_in(lower, value_set=_ALL_STOP_ARR).to_numpy(zero_copy_only=False)
    n_stop = np.bincount(row_idx[stop], minlength=n).astype(np.int64)
    n_chars = pc.utf8_length(arr).to_numpy().astype(np.int64)
    n_tokens = pc.count_substring_regex(arr, _TOKEN_RE2).to_numpy().astype(np.int64)
    n_punct = pc.count_substring_regex(arr, _PUNCT_RE2).to_numpy().astype(np.int64)
    safe_words = np.maximum(n_words, 1)
    safe_chars = np.maximum(n_chars, 1)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_words": n_words,
        "stopword_ratio": np.where(n_words > 0, n_stop / safe_words, 0.0),
        "punct_ratio": np.where(n_chars > 0, n_punct / safe_chars, 0.0),
        "mean_word_len": np.where(n_words > 0, sum_wlen / safe_words, 0.0),
    }


def _lang_from_segments(lower, row_idx, n) -> np.ndarray:
    scores = np.zeros((n, len(_LANGS)), dtype=np.int64)
    for j, vs in enumerate(_LANG_STOP_ARRS):
        hit = pc.is_in(lower, value_set=vs).to_numpy(zero_copy_only=False)
        scores[:, j] = np.bincount(row_idx[hit], minlength=n)
    # argmax returns the FIRST max — _LANGS is sorted, matching the
    # scalar `max(sorted(scores), key=scores.get)` tie rule
    best_j = scores.argmax(axis=1)
    best_score = scores[np.arange(n), best_j]
    langs = np.array(_LANGS, dtype=object)
    return np.where(best_score > 0, langs[best_j], "und")


def quality_stats_batch(texts) -> dict[str, np.ndarray]:
    """Vectorized `quality_stats` over a column; returns column arrays."""
    arr = _texts_to_arrow(texts)
    return _quality_from_segments(arr, *_word_segments(arr))


def detect_lang_batch(texts) -> np.ndarray:
    """Vectorized `detect_lang` over a column (object array of codes)."""
    arr = _texts_to_arrow(texts)
    lower, _wlen, row_idx, n = _word_segments(arr)
    return _lang_from_segments(lower, row_idx, n)


def quality_and_lang_batch(texts) -> tuple[dict[str, np.ndarray], np.ndarray]:
    """Both kernels from ONE segmentation pass — the shape for filter
    stages (e.g. curation's quality+language keep) that need both."""
    arr = _texts_to_arrow(texts)
    lower, wlen, row_idx, n = _word_segments(arr)
    return (
        _quality_from_segments(arr, lower, wlen, row_idx, n),
        _lang_from_segments(lower, row_idx, n),
    )


def simhash64_signed_batch(texts) -> np.ndarray:
    """Vectorized `simhash64_signed`: one RE2 split, per-DISTINCT-word
    md5 votes (Zipf: the `_word_vote` cache does the md5+unpack once per
    distinct word per process), one `np.add.at` scatter. NOTE the scalar
    lowercases the WHOLE text before word extraction (unlike
    quality_stats' per-word lower), so this does too."""
    arr = _texts_to_arrow(texts)
    parts = pc.split_pattern_regex(pc.utf8_lower(arr), _WORD_SPLIT_RE2)
    flat = pc.list_flatten(parts)
    ll = pc.list_value_length(parts).to_numpy().astype(np.int64)
    n = len(ll)
    acc = np.zeros((n, 64), dtype=np.int64)
    if len(flat):
        de = pc.dictionary_encode(flat)
        inv = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = de.dictionary.to_pylist()
        votes = np.empty((len(uniq), 64), dtype=np.int64)
        for i, w in enumerate(uniq):
            # "" is a split artifact at text boundaries, never a word
            votes[i] = _word_vote(w) if w else 0
        u = len(uniq)
        if n * u <= _SIMHASH_MATMUL_CELLS:
            # small per-batch vocab: (n, U) occurrence counts + one exact
            # int64 matmul — avoids materializing a (W, 64) gather
            rows = np.repeat(np.arange(n, dtype=np.int64), ll)
            counts = np.bincount(rows * u + inv, minlength=n * u).reshape(n, u)
            acc = counts @ votes
        else:
            # large vocab: segment-sum per row (words are in row order):
            # reduceat over the starts of NONEMPTY rows — each passed
            # start's segment runs to the next passed start, which skips
            # 0-word rows exactly
            starts = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(ll, out=starts[1:])
            nz = ll > 0
            if nz.any():
                acc[nz] = np.add.reduceat(votes[inv], starts[:-1][nz], axis=0)
    bits = (acc > 0).astype(np.uint64)
    h = (bits << _SHIFTS[None, :]).sum(axis=1, dtype=np.uint64)
    return h.view(np.int64)


def gopher_quality_batch(
    texts,
    *,
    min_tokens: int = 50,
    max_tokens: int = 100_000,
) -> dict[str, np.ndarray]:
    """Gopher-style document quality rules (Rae et al., "Scaling Language
    Models: ... Gopher", appendix A1.1), the standard pre-training filter
    battery, vectorized and expressed ENTIRELY in integer comparisons so
    the flags have a bitwise-exact SQL twin (a float threshold like
    `mean_word_len >= 3` becomes `sum_len >= 3 * n_tokens` — no ratio is
    ever materialized):

      ok_token_count:  min_tokens <= n_tokens <= max_tokens
      ok_mean_word:    3 * n_tokens <= sum(token chars) <= 10 * n_tokens
      ok_symbol_ratio: 10 * (count('#') + count('...')) < n_tokens
      ok_alpha_words:  5 * tokens-containing-a-letter > 4 * n_tokens
      ok_stopwords:    >= 2 DISTINCT stopwords present
      gopher_pass:     all of the above

    The paper's line-shaped rules (bullet starts, ellipsis line ends) are
    intentionally omitted: this corpus's documents are single-line, so
    those rules are vacuous here; add them at the line-split seam when
    ingesting multi-line text. Tokens are the whitespace `\\S+` pieces
    (the `_WS_CHARS` RE2 class); stopword words are the
    `[a-zA-ZÀ-ɏ]+` runs, lowercased."""
    arr = _texts_to_arrow(texts)
    # whitespace tokens: lengths + has-a-letter, one split
    parts = pc.split_pattern_regex(arr, f"[{_WS_CHARS}]+")
    flat = pc.list_flatten(parts)
    ll = pc.list_value_length(parts).to_numpy().astype(np.int64)
    n = len(ll)
    rows = np.repeat(np.arange(n, dtype=np.int64), ll)
    tlen = pc.utf8_length(flat).to_numpy().astype(np.int64)
    nonempty = tlen > 0
    n_tokens = np.bincount(rows[nonempty], minlength=n).astype(np.int64)
    sum_token_len = np.bincount(rows, weights=tlen, minlength=n).astype(np.int64)
    alpha = pc.match_substring_regex(flat, "[a-zA-ZÀ-ɏ]").to_numpy(
        zero_copy_only=False
    )
    n_alpha = np.bincount(rows[alpha & nonempty], minlength=n).astype(np.int64)
    n_hash = pc.count_substring(arr, "#").to_numpy().astype(np.int64)
    n_ellipsis = pc.count_substring(arr, "...").to_numpy().astype(np.int64)
    # distinct stopwords: word runs -> stopword ids -> per-row distinct
    lower, _wlen, widx, _n = _word_segments(arr)
    sid = pc.fill_null(
        pc.index_in(lower, value_set=_ALL_STOP_ARR), -1
    ).to_numpy(zero_copy_only=False).astype(np.int64)
    hitm = sid >= 0
    s = len(_ALL_STOPWORDS)
    pairs = np.unique(widx[hitm] * s + sid[hitm])
    n_stop_distinct = np.bincount(pairs // s, minlength=n).astype(np.int64)
    ok_token_count = (n_tokens >= min_tokens) & (n_tokens <= max_tokens)
    ok_mean_word = (3 * n_tokens <= sum_token_len) & (sum_token_len <= 10 * n_tokens)
    ok_symbol_ratio = 10 * (n_hash + n_ellipsis) < n_tokens
    ok_alpha_words = 5 * n_alpha > 4 * n_tokens
    ok_stopwords = n_stop_distinct >= 2
    return {
        "n_tokens": n_tokens,
        "sum_token_len": sum_token_len,
        "n_alpha_tokens": n_alpha,
        "n_symbol_marks": n_hash + n_ellipsis,
        "n_distinct_stopwords": n_stop_distinct,
        "ok_token_count": ok_token_count,
        "ok_mean_word": ok_mean_word,
        "ok_symbol_ratio": ok_symbol_ratio,
        "ok_alpha_words": ok_alpha_words,
        "ok_stopwords": ok_stopwords,
        "gopher_pass": (
            ok_token_count
            & ok_mean_word
            & ok_symbol_ratio
            & ok_alpha_words
            & ok_stopwords
        ),
    }


def add_gopher_quality(
    ds: ray.data.Dataset, text_col: str = "text", **kwargs
) -> ray.data.Dataset:
    import pyarrow as pa_

    def stage(batch: pa_.Table) -> pa_.Table:
        cols = gopher_quality_batch(batch.column(text_col), **kwargs)
        for name, vals in cols.items():
            typ = pa_.bool_() if vals.dtype == np.bool_ else pa_.int64()
            batch = batch.append_column(name, pa_.array(vals, type=typ))
        return batch

    return ds.map_batches(stage, batch_format="pyarrow")


def token_count_batch(texts) -> np.ndarray:
    arr = _texts_to_arrow(texts)
    return pc.count_substring_regex(arr, _TOKEN_RE2).to_numpy().astype(np.int64)


def bpe_ish_token_count_batch(texts) -> np.ndarray:
    arr = _texts_to_arrow(texts)
    return pc.count_substring_regex(arr, _BPE_RE2).to_numpy().astype(np.int64)


def _h64(data: bytes) -> int:
    """64-bit feature hash: low half of md5 in little-endian byte order —
    bit-identical to DuckDB's ``md5_number_lower(x)``, which is what lets
    the simhash / fingerprint queries carry exact SQL oracles."""
    return int.from_bytes(hashlib.md5(data).digest()[8:], "little")


_SHIFTS = np.arange(64, dtype=np.uint64)


@functools.lru_cache(maxsize=1_000_000)
def _word_vote(w: str) -> np.ndarray:
    """±1 bit-vote vector for a word (cached: corpus words are
    Zipf-repeated, so the md5+unpack runs once per distinct word per
    worker). Callers must not mutate the returned array."""
    h = np.uint64(_h64(w.encode("utf-8")))
    bits = ((h >> _SHIFTS) & np.uint64(1)).astype(np.int64)
    return 2 * bits - 1


def simhash64(text: str) -> int:
    """64-bit SimHash over word features (md5-low64 feature hash;
    vote per bit weighted by occurrence count). Scalar REFERENCE — the
    Dataset stages use ``simhash64_signed_batch``, which agrees
    everywhere except text containing U+0130 'İ' (the engine-parity
    note above: Arrow simple vs Python full lowercase moves the word
    boundary there)."""
    v = np.zeros(64, dtype=np.int64)
    for w in _WORD_RE.findall((text or "").lower()):
        v += _word_vote(w)
    out = 0
    for b in range(64):
        if v[b] > 0:
            out |= 1 << b
    return out


def simhash64_signed(text: str) -> int:
    """simhash64 mapped to SIGNED int64 (two's complement) — the storage
    convention: values >= 2^63 would silently become float64 through the
    pandas->Arrow boundary."""
    sh = simhash64(text)
    return sh - (1 << 64) if sh >= (1 << 63) else sh


def repetition_stats(text: str, k: int = 3) -> dict:
    """Gopher-style repetition signal: fraction of word k-gram OCCURRENCES
    that are repeats of an earlier k-gram in the same doc (0.0 = no
    repetition). Heavily boilerplated/templated pages score high and get
    filtered before training."""
    words = _WORD_RE.findall((text or "").lower())
    total = max(0, len(words) - k + 1)
    if total == 0:
        return {"n_grams": 0, "n_distinct_grams": 0, "dup_gram_frac": 0.0}
    grams = [" ".join(words[i : i + k]) for i in range(total)]
    distinct = len(set(grams))
    return {
        "n_grams": total,
        "n_distinct_grams": distinct,
        "dup_gram_frac": (total - distinct) / total,
    }


def add_repetition_stats(
    ds: ray.data.Dataset, text_col: str = "text", k: int = 3
) -> ray.data.Dataset:
    def stats(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[text_col].map(lambda t: repetition_stats(t, k))
        for f, dt in (("n_grams", "int64"), ("n_distinct_grams", "int64")):
            batch[f] = s.map(lambda d, f=f: d[f]).astype(dt)
        batch["dup_gram_frac"] = s.map(lambda d: d["dup_gram_frac"])
        return batch

    return ds.map_batches(stats, batch_format="pandas")


def winnowing_fingerprints(text: str, k: int = 8, window: int = 4) -> list[int]:
    """Rolling-hash k-gram fingerprints with winnowing (min-in-window),
    the standard local document fingerprinting scheme (md5-low64 gram
    hash, dedup on consecutive equal minima)."""
    t = (text or "").lower()
    if len(t) < k:
        return []
    grams = [_h64(t[i : i + k].encode("utf-8")) for i in range(len(t) - k + 1)]
    out = []
    prev = None
    for i in range(max(1, len(grams) - window + 1)):
        m = min(grams[i : i + window])
        if m != prev:
            out.append(m)
            prev = m
    return out


# --- Dataset-level stages ----------------------------------------------------


def add_text_stats(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    import pyarrow as pa

    def stats(batch: pa.Table) -> pa.Table:
        cols = quality_stats_batch(batch.column(text_col))
        for f in ("n_chars", "n_tokens", "n_words"):
            batch = batch.append_column(f, pa.array(cols[f], type=pa.int64()))
        for f in ("stopword_ratio", "punct_ratio", "mean_word_len"):
            batch = batch.append_column(f, pa.array(cols[f], type=pa.float64()))
        return batch

    return ds.map_batches(stats, batch_format="pyarrow")


def add_langid(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    import pyarrow as pa

    def lang(batch: pa.Table) -> pa.Table:
        pred = detect_lang_batch(batch.column(text_col))
        return batch.append_column("lang_pred", pa.array(pred, type=pa.string()))

    return ds.map_batches(lang, batch_format="pyarrow")


def add_simhash(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    def sh(batch: pd.DataFrame) -> pd.DataFrame:
        batch["simhash"] = simhash64_signed_batch(batch[text_col])
        return batch

    return ds.map_batches(sh, batch_format="pandas")


def salient_terms(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    top_k: int = 3,
    score_scale: int = 1_000_000,
    num_buckets: int = 16,
    broadcast_max_terms: int = 2_000_000,
    force_branch: str | None = None,
) -> ray.data.Dataset:
    """TF-IDF-style keyword extraction: the ``top_k`` most salient terms
    per document, scored by the INTEGER ``(tf * score_scale) // df``
    (term frequency in the doc over corpus document frequency). All-int
    scoring + a total (score DESC, term ASC) order makes the result
    deterministic and bitwise-reproducible in SQL — the float tf-idf log
    formulation can't be hash-compared across engines.

    Shape: per-batch vectorized (doc, term, tf) explode (NO shuffle — tf
    is doc-local), then 2 bucketed shuffles of (doc, term, tf) int/str
    rows: by term to count+attach df, by doc for the per-doc top-k. Rows
    shuffled = distinct (doc, term) pairs, never documents. Output:
    (doc_id, rank, term, tf, df)."""
    from .agg import bucketed_map_groups

    def explode_tf(b: pd.DataFrame) -> pd.DataFrame:
        words = b.set_index(b[id_col])[text_col].str.lower().str.findall(
            r"[a-z0-9]+"
        )
        ex = words.explode().dropna()
        g = (
            pd.DataFrame({id_col: ex.index, "term": ex.to_numpy()})
            .groupby([id_col, "term"], as_index=False)
            .size()
            .rename(columns={"size": "tf"})
        )
        return g.astype({id_col: "int64", "tf": "int64"})

    tf_rows = ds.map_batches(explode_tf, batch_format="pandas")

    empty_tf = pd.DataFrame(
        {
            id_col: pd.Series(dtype="int64"),
            "term": pd.Series(dtype="object"),
            "tf": pd.Series(dtype="int64"),
        }
    )
    empty_df = empty_tf.assign(df=pd.Series(dtype="int64"))

    def attach_df(bucket: pd.DataFrame) -> pd.DataFrame:
        # rows are unique per (doc, term), so df(term) == group size
        out = bucket.copy()
        out["df"] = out.groupby("term")["term"].transform("size").astype("int64")
        return out

    # Adaptive df attach. The df table is vocabulary-sized (one int per
    # distinct term), far smaller than the (doc, term, tf) row set — when
    # it fits under ``broadcast_max_terms`` the df map is combined and
    # BROADCAST, and the full row set never shuffles by term (one
    # exchange saved). The gate is two-tier: if the map-side partial
    # ROWS already fit, combine them on the driver (no extra exchange);
    # in the ambiguous band above that (partial rows over the cap, but
    # by at most ``_TIER2_FACTOR``x — a small vocab spread over many
    # blocks), aggregate the partials distributedly (a vocab-ish-sized
    # exchange, tiny next to tf_rows) and gate on the TRUE vocabulary
    # size. Past the band the vocabulary cannot plausibly fit, so the
    # probe is skipped and the term-bucketed exchange of the full row
    # set takes over directly — the fall-through's price is the partials
    # map pass (and, inside the band, one small probe exchange); that is
    # the cost of a gate that wins whenever the vocab is broadcastable.
    # ``force_branch`` ("broadcast" | "bucketed") pins it for parity
    # tests.
    tf_rows = tf_rows.materialize()

    def df_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("term", as_index=False).size().rename(columns={"size": "df"})
        return g.astype({"df": "int64"})

    from .agg import use_fast_branch

    _TIER2_FACTOR = 8
    use_broadcast = force_branch != "bucketed"
    dfmap = None
    if use_broadcast:
        partials = tf_rows.map_batches(df_partial, batch_format="pandas").materialize()
        n_partial = partials.count()
        if use_fast_branch(
            force_branch,
            fast="broadcast",
            slow="bucketed",
            count=n_partial,
            cap=broadcast_max_terms,
        ):
            pdf = partials.to_pandas()
            dfmap = (
                pdf.groupby("term")["df"].sum() if len(pdf) else pd.Series(dtype="int64")
            )
        elif n_partial <= _TIER2_FACTOR * broadcast_max_terms:
            from .agg import grouped_agg

            dfagg = grouped_agg(
                partials,
                ["term"],
                {"df": ("df", "sum")},
                final="bucketed",
                num_buckets=num_buckets,
                empty_result=pd.DataFrame(
                    {"term": pd.Series(dtype="object"), "df": pd.Series(dtype="int64")}
                ),
            ).materialize()
            if dfagg.count() <= broadcast_max_terms:
                adf = dfagg.to_pandas()
                dfmap = adf.set_index("term")["df"]
            else:
                use_broadcast = False
        else:
            use_broadcast = False
    if use_broadcast:
        import ray as _ray

        from .joins import _fetch

        ref = _ray.put(dfmap.to_dict())

        def attach_bcast(b: pd.DataFrame) -> pd.DataFrame:
            out = b.copy()
            lut = _fetch(ref)
            out["df"] = out["term"].map(lut).astype("int64")
            return out

        with_df = tf_rows.map_batches(attach_bcast, batch_format="pandas")
    else:
        with_df = bucketed_map_groups(
            tf_rows, "term", attach_df, num_buckets=num_buckets, empty_result=empty_df
        )

    empty_out = pd.DataFrame(
        {
            id_col: pd.Series(dtype="int64"),
            "rank": pd.Series(dtype="int64"),
            "term": pd.Series(dtype="object"),
            "tf": pd.Series(dtype="int64"),
            "df": pd.Series(dtype="int64"),
        }
    )

    def per_doc_topk(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.copy()
        b["_score"] = (b["tf"].to_numpy() * score_scale) // b["df"].to_numpy()
        b = b.sort_values(
            [id_col, "_score", "term"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        b["rank"] = b.groupby(id_col).cumcount() + 1
        b = b[b["rank"] <= top_k]
        return b[[id_col, "rank", "term", "tf", "df"]].astype(
            {id_col: "int64", "rank": "int64", "tf": "int64", "df": "int64"}
        )

    return bucketed_map_groups(
        with_df, id_col, per_doc_topk, num_buckets=num_buckets, empty_result=empty_out
    )


def word_frequencies(
    ds: ray.data.Dataset,
    text_col: str = "text",
    *,
    top_v: int = 50_000,
    num_buckets: int = 16,
) -> pd.DataFrame:
    """Distributed wordcount ([a-z0-9]+ runs of lower(text), the corpus
    token convention) truncated to the top-``top_v`` (count DESC, word
    ASC deterministic tiebreak) — the driver holds at most
    ``top_v * num_buckets`` candidate rows, never the vocabulary. The
    shared vocabulary machinery behind ``unigram_surprisal`` and
    ``ops.bpe.bpe_train``."""
    from .agg import grouped_agg

    def tf_pre(b: pd.DataFrame) -> pd.DataFrame:
        words = b[text_col].str.lower().str.findall(r"[a-z0-9]+").explode().dropna()
        vc = words.value_counts()
        return pd.DataFrame({"word": vc.index, "n": vc.to_numpy()})

    per_word = grouped_agg(
        ds,
        ["word"],
        {"n": ("n", "sum")},
        pre=tf_pre,
        final="bucketed",
        num_buckets=num_buckets,
        empty_result=pd.DataFrame(
            {"word": pd.Series(dtype="object"), "n": pd.Series(dtype="int64")}
        ),
    )

    def bucket_top(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(
            ["n", "word"], ascending=[False, True], kind="mergesort"
        ).head(top_v)

    from .agg import to_pandas_safe

    cand = to_pandas_safe(
        per_word.map_batches(bucket_top, batch_format="pandas"),
        pd.DataFrame({"word": pd.Series(dtype="object"), "n": pd.Series(dtype="int64")}),
    )
    return (
        cand.sort_values(["n", "word"], ascending=[False, True], kind="mergesort")
        .head(top_v)
        .reset_index(drop=True)
    )


def unigram_surprisal(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    top_v: int = 1000,
    scale: int = 1_000_000,
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """LM-style quality scoring with an integer-exact oracle: per-document
    unigram surprisal against the corpus's own distribution. Each token
    contributes ``scale // tf(token)`` (rarer => larger), with tf looked
    up in the TOP-``top_v`` vocabulary (count DESC, token ASC tiebreak —
    deterministic) and out-of-vocabulary tokens scored as tf=1. All
    arithmetic is int64 floor division, so summation order can't change
    the result — the same trick that makes pagerank/tf-idf hash-exact.

    Shape: one bucketed tf shuffle (vocabulary-cardinality key, same as
    wordcount), per-bucket top-V so the driver merges V rows per bucket
    (never the vocabulary), vocab broadcast once via ray.put, then one
    stateless scoring map. Documents with zero tokens are omitted (the
    SQL twin's unnest does the same).
    """
    import ray as _ray

    from .joins import _fetch

    vocab_df = word_frequencies(ds, text_col, top_v=top_v, num_buckets=num_buckets)
    ref = _ray.put(dict(zip(vocab_df["word"], vocab_df["n"].astype(int))))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        tf = _fetch(ref)
        b = b.reset_index(drop=True)
        words = b[text_col].str.lower().str.findall(r"[a-z0-9]+")
        n_tok = words.str.len()
        mask = n_tok > 0
        exploded = words[mask].explode()
        tfv = exploded.map(tf).fillna(1).astype("int64")
        per_tok = np.int64(scale) // tfv
        surp = per_tok.groupby(level=0).sum()
        return pd.DataFrame(
            {
                id_col: b.loc[mask, id_col].to_numpy(),
                "n_tokens": n_tok[mask].to_numpy(),
                "surprisal": surp.reindex(b.index[mask]).to_numpy(),
            }
        ).astype({id_col: "int64", "n_tokens": "int64", "surprisal": "int64"})

    return ds.map_batches(score, batch_format="pandas")


def _bigram_frame(b: pd.DataFrame, text_col: str, vocab: frozenset) -> pd.DataFrame:
    """Vectorized bigram construction shared by the count and score passes:
    explode tokens, map out-of-vocab to '<unk>' (tokens are [a-z0-9]+ so the
    sentinel cannot collide), pair each token with its successor WITHIN the
    same row via a shifted-index mask. Returns a frame with row/w1/w2 — one
    output row per bigram occurrence; the empty case is TYPED (object w1/w2)
    so token-free blocks can't poison downstream block-schema unification."""
    b = b.reset_index(drop=True)
    words = b[text_col].str.lower().str.findall(r"[a-z0-9]+")
    ex = words.explode().dropna()
    if not len(ex):
        return pd.DataFrame(
            {
                "row": pd.Series(dtype="int64"),
                "w1": pd.Series(dtype="object"),
                "w2": pd.Series(dtype="object"),
            }
        )
    mapped = ex.where(ex.isin(vocab), "<unk>")
    idx = ex.index.to_numpy()
    w = mapped.to_numpy(dtype=object)
    nxt = np.roll(w, -1)
    same = np.empty(len(idx), dtype=bool)
    same[:-1] = idx[:-1] == idx[1:]
    same[-1] = False
    return pd.DataFrame({"row": idx[same], "w1": w[same], "w2": nxt[same]})


def bigram_lm_scores(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    top_v: int = 1000,
    scale: int = 1_000_000,
    num_buckets: int = 16,
    model_ds: ray.data.Dataset | None = None,
    miss: str = "raise",
) -> ray.data.Dataset:
    """CCNet-style LM predictability scoring with an INTEGER-EXACT oracle:
    score each document under the corpus's OWN bigram language model. Each
    adjacent token pair contributes ``scale * C2(w1,w2) // C1(w1)`` — the
    floor-quantized conditional bigram frequency (C1 sums C2 over followers,
    so the per-context masses normalize) — with tokens outside the
    top-``top_v`` vocabulary mapped to '<unk>'. High totals = predictable,
    wiki-like text; low = the tail a perplexity filter trims. All int64
    floor division, so summation order can't change a score (the
    pagerank/tf-idf trick applied to an n-gram LM).

    Shape: vocabulary via the shared ``word_frequencies`` bucketed
    wordcount; then ONE grouped count over (w1, w2) partials whose key
    space is model-bounded ((V+1)^2 worst case, corpus-INDEPENDENT — for
    V=1000 the dense-worst-case table is ~16 MB, broadcast-sized by
    construction); then one stateless scoring map with the model dicts
    ``ray.put`` once. Documents with fewer than two tokens are omitted
    (the SQL twin's pair spine does the same).

    ``model_ds`` (default: ``ds`` itself) is the TRAINING corpus — pass a
    target-domain subset for CCNet/DSIR-style data selection, where docs
    are ranked by how predictable they are under the TARGET's model (this
    also sidesteps the self-trained hapax-context caveat). With the
    default self-trained model every scored bigram was counted from the
    same corpus, so a model miss is a bug and the scoring map raises
    (``miss='raise'``); an external model makes unseen bigrams legitimate
    — pass ``miss='zero'`` and they contribute 0 mass."""
    import ray as _ray

    from .agg import grouped_agg
    from .joins import _fetch

    if miss not in ("raise", "zero"):
        raise ValueError(f"miss={miss!r}: expected 'raise' or 'zero'")
    train = model_ds if model_ds is not None else ds
    vocab = frozenset(
        word_frequencies(train, text_col, top_v=top_v, num_buckets=num_buckets)["word"]
    )
    vref = _ray.put(vocab)

    def pair_pre(b: pd.DataFrame) -> pd.DataFrame:
        vc = _fetch(vref)
        return _bigram_frame(b, text_col, vc)[["w1", "w2"]]

    c2 = grouped_agg(
        train,
        ["w1", "w2"],
        {"c": ("w1", "count")},
        pre=pair_pre,
        empty_result=pd.DataFrame(
            {"w1": pd.Series(dtype="object"), "w2": pd.Series(dtype="object"), "c": pd.Series(dtype="int64")}
        ),
    )
    c2["c"] = c2["c"].astype("int64")
    c1 = c2.groupby("w1", as_index=False)["c"].sum()
    sep = "\x00"  # tokens are [a-z0-9]+ / '<unk>': NUL can't appear
    c2d = dict(zip(c2["w1"] + sep + c2["w2"], c2["c"].astype(int)))
    c1d = dict(zip(c1["w1"], c1["c"].astype(int)))
    mref = _ray.put((vocab, c2d, c1d))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        vc, m2, m1 = _fetch(mref)
        bf = _bigram_frame(b, text_col, vc)
        ids = b[id_col].reset_index(drop=True)
        if not len(bf):
            return pd.DataFrame(
                {
                    id_col: pd.Series(dtype="int64"),
                    "n_bigrams": pd.Series(dtype="int64"),
                    "lm_score": pd.Series(dtype="int64"),
                }
            )
        c2v = (bf["w1"] + sep + bf["w2"]).map(m2)
        if miss == "raise":
            c2v = c2v.astype("int64")  # NaN (model miss) raises loudly
            c1v = bf["w1"].map(m1).astype("int64")
            contrib = (np.int64(scale) * c2v) // c1v
        else:
            # external model: an unseen bigram contributes 0 mass (c2
            # present implies c1 present, so the fill-1 denominator only
            # ever divides a 0 numerator)
            hit = c2v.notna()
            c1v = bf["w1"].map(m1).fillna(1).astype("int64")
            contrib = (np.int64(scale) * c2v.fillna(0).astype("int64")) // c1v
            contrib[~hit] = 0
        bf = bf.assign(contrib=contrib)
        g = bf.groupby("row")
        out = pd.DataFrame(
            {
                id_col: ids.loc[g.size().index].to_numpy(),
                "n_bigrams": g.size().to_numpy(),
                "lm_score": g["contrib"].sum().to_numpy(),
            }
        )
        return out.astype({id_col: "int64", "n_bigrams": "int64", "lm_score": "int64"})

    return ds.map_batches(score, batch_format="pandas")


def ngram_char_stats(text: str) -> dict:
    """Gopher-A1.1-style repetition complement: for each word {2,3,4}-gram
    size, the MAX over grams of (occurrences x gram chars) — i.e. the
    largest character mass any single repeated gram accounts for (this can
    pick a longer, less frequent gram over the most frequent one; the SQL
    twin computes the identical max, and the deviation from Rae et al.'s
    literal "most frequent n-gram" wording is deliberate: it needs no tie
    rule and upper-bounds the Gopher statistic) — plus characters covered
    by DUPLICATED 6-grams. All integer numerators over the doc's total
    word characters (ratios are the caller's two-identical-ints division —
    no float thresholds inside). Gram char counts exclude the joining
    spaces."""
    from collections import Counter

    words = _WORD_RE.findall((text or "").lower())
    word_chars = sum(map(len, words))
    out = {"word_chars": word_chars}
    for n in (2, 3, 4):
        grams = [" ".join(words[j : j + n]) for j in range(len(words) - n + 1)]
        top = 0
        if grams:
            c = Counter(grams)
            top = max(cnt * (len(g) - (n - 1)) for g, cnt in c.items())
        out[f"top{n}_chars"] = top
    n = 6
    grams = [" ".join(words[j : j + n]) for j in range(len(words) - n + 1)]
    dup = 0
    if grams:
        c = Counter(grams)
        dup = sum(cnt * (len(g) - (n - 1)) for g, cnt in c.items() if cnt >= 2)
    out["dup6_chars"] = dup
    return out


def add_ngram_char_stats(
    ds: ray.data.Dataset, text_col: str = "text"
) -> ray.data.Dataset:
    def stage(b: pd.DataFrame) -> pd.DataFrame:
        s = b[text_col].map(ngram_char_stats)
        b = b.copy()
        for f in ("word_chars", "top2_chars", "top3_chars", "top4_chars", "dup6_chars"):
            b[f] = s.map(lambda d, f=f: d[f]).astype("int64")
        wc = b["word_chars"].to_numpy()
        safe = np.maximum(wc, 1)
        for f in ("top2", "top3", "top4"):
            b[f + "_frac"] = np.where(wc > 0, b[f + "_chars"].to_numpy() / safe, 0.0)
        b["dup6_frac"] = np.where(wc > 0, b["dup6_chars"].to_numpy() / safe, 0.0)
        return b

    return ds.map_batches(stage, batch_format="pandas")
