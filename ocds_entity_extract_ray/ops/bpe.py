"""BPE tokenizer training + application (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units") — the
training-data-pipeline op that LEARNS a subword vocabulary from the
corpus instead of assuming one.

Scale shape (the standard trick that makes BPE training corpus-size
independent): pair statistics only depend on the DISTINCT-WORD frequency
table, so the engine runs ONE wordcount-shaped bucketed shuffle
(per-bucket top-V pre-truncation — the driver merges V rows per bucket,
never the vocabulary, exactly like ``unigram_surprisal``), then the
merge loop iterates over that vocab-sized state locally. Application
broadcasts the learned merge ranks once and tokenizes per DISTINCT word
per batch (dictionary-encode + memoize: Zipf makes re-tokenization
rare).

Determinism: merge selection is (pair count DESC, pair lexicographic
ASC) — a total order, so the merge table is reproducible bit-for-bit
regardless of execution order. The training loop is iterative state
rewriting (each merge reshapes every word's symbol sequence), which is
why this op is rows-only in the oracle registry: its correctness
evidence is an independent from-scratch reference implementation in
pytest, not a SQL twin.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

EOW = "</w>"  # end-of-word marker symbol (Sennrich's convention)


def _merge_seq(syms: tuple, a: str, b: str) -> tuple:
    """Replace consecutive (a, b) with a+b, left to right."""
    out = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe_from_freqs(
    freqs: dict[str, int], num_merges: int
) -> list[tuple[str, str, int]]:
    """Classic weighted BPE over a word-frequency table: returns up to
    ``num_merges`` (left, right, pair_count_at_merge) rows in merge
    order. Stops early when no pair repeats."""
    vocab = {tuple(w) + (EOW,): int(n) for w, n in freqs.items() if w}
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        mx = max(pairs.values())
        if mx < 2:
            break  # nothing repeats: further merges are noise
        a, b = min(p for p, c in pairs.items() if c == mx)
        merges.append((a, b, mx))
        vocab = {_merge_seq(s, a, b): n for s, n in vocab.items()}
    return merges


def bpe_tokenize_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to one word: repeatedly merge the
    LOWEST-RANK present pair (the standard BPE apply order)."""
    syms: tuple = tuple(word) + (EOW,)
    while len(syms) > 1:
        best = None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best is None or r < best[0]):
                best = (r, p)
        if best is None:
            break
        syms = _merge_seq(syms, *best[1])
    return list(syms)


def bpe_train(
    docs: ray.data.Dataset,
    *,
    text_col: str = "text",
    num_merges: int = 24,
    top_v: int = 50_000,
    num_buckets: int = 16,
) -> pd.DataFrame:
    """Train BPE on the corpus: DataFrame (rank, left, right,
    pair_count), rank starting at 0 in merge order."""
    from .textstats import word_frequencies

    freqs = word_frequencies(
        docs, text_col, top_v=top_v, num_buckets=num_buckets
    )
    merges = train_bpe_from_freqs(
        dict(zip(freqs["word"], freqs["n"].astype(int))), num_merges
    )
    return pd.DataFrame(
        {
            "rank": pd.Series(range(len(merges)), dtype="int64"),
            "left": [m[0] for m in merges],
            "right": [m[1] for m in merges],
            "pair_count": pd.Series([m[2] for m in merges], dtype="int64"),
        }
    )


def add_bpe_token_counts(
    ds: ray.data.Dataset,
    merges: pd.DataFrame,
    *,
    text_col: str = "text",
) -> ray.data.Dataset:
    """Per-document BPE token count under a learned merge table — the
    ranks broadcast once; each batch tokenizes DISTINCT words only."""
    ranks = {
        (l, r): int(k)
        for k, l, r in zip(merges["rank"], merges["left"], merges["right"])
    }
    ref = ray.put(ranks)

    def count(b: pd.DataFrame) -> pd.DataFrame:
        from .joins import _fetch

        rk = _fetch(ref)
        cache: dict[str, int] = {}

        def n_toks(word: str) -> int:
            got = cache.get(word)
            if got is None:
                got = cache[word] = len(bpe_tokenize_word(word, rk))
            return got

        words = b[text_col].str.lower().str.findall(r"[a-z0-9]+")
        b = b.copy()
        b["n_bpe_tokens"] = [
            int(sum(n_toks(w) for w in ws)) for ws in words
        ]
        b["n_bpe_tokens"] = b["n_bpe_tokens"].astype("int64")
        return b

    return ds.map_batches(count, batch_format="pandas")
