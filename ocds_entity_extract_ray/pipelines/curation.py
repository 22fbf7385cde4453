"""End-to-end training-data curation pipeline — the ops composed the way a
real 100 TB corpus run would chain them:

  documents
    -> quality + language filter     (one vectorized map_batches pass:
                                      n_words / stopword_ratio / langid)
    -> exact dedup                   (content hash, keep min id)
    -> near-dup CLUSTER dedup        (MinHash-LSH pairs -> connected
                                      components -> keep the component
                                      representative, min id)
    -> sequence packing              (token-budget prefix scan)

Every stage is an existing, individually-oracled operator; the whole
pipeline carries ONE composed DuckDB oracle (`Q_CURATION_SQL` in
pipelines/relational.py) that reproduces it end-to-end — filters from
integer-operand ratios, dedup via QUALIFY row_number, clusters via a
recursive CTE, packing via a window cumsum — so the composition itself is
hash-checked, not just the parts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from ..ops.dedup import exact_dedup, minhash_lsh_pairs
from ..ops.graph import connected_components
from ..ops.scan import pack_documents
from ..ops.textstats import quality_and_lang_batch


def near_dup_loser_ids(comp: ray.data.Dataset) -> frozenset:
    """Collect the ids of NON-representative nodes (``node != cluster_id``)
    from a connected-components labelling. This is the anti-filter set for
    cluster dedup: its size equals the number of docs that actually lose to
    a cluster representative — duplicate-bounded, never corpus-bounded
    (singleton clusters contribute nothing because they label themselves)."""
    return frozenset(_losers_ds(comp).to_pandas()["node"].tolist())


def _losers_ds(comp: ray.data.Dataset) -> ray.data.Dataset:
    """Non-representative nodes of a components labelling — THE definition
    of the representative rule, shared by the test helper above and the
    pipeline filter below so the two can't drift apart."""
    return comp.map_batches(
        lambda b: b[b["node"] != b["cluster_id"]][["node"]], batch_format="pandas"
    )


def drop_near_dup_losers(
    deduped: ray.data.Dataset,
    comp: ray.data.Dataset,
    id_col: str = "doc_id",
    *,
    broadcast_max_losers: int = 5_000_000,
) -> ray.data.Dataset:
    """Keep only cluster representatives: anti-filter the NON-rep nodes
    out of ``deduped``. Adaptive like the dedup verify: the loser set is
    duplicate-bounded (singletons label themselves), so it is usually
    broadcast-small — ship a frozenset once, zero shuffles. But a
    boilerplate-heavy web crawl can push the duplicate fraction toward
    half the corpus, so above ``broadcast_max_losers`` the filter becomes
    a distributed left_anti hash join and NOTHING id-shaped touches the
    driver."""
    losers = _losers_ds(comp).materialize()
    n = losers.count()
    if n == 0:
        return deduped
    if n <= broadcast_max_losers:
        import ray as _ray

        from ..ops.joins import _fetch

        ref = _ray.put(frozenset(losers.to_pandas()["node"].tolist()))

        def drop(b: pd.DataFrame) -> pd.DataFrame:
            ids = _fetch(ref)
            return b[~b[id_col].isin(ids)]

        return deduped.map_batches(drop, batch_format="pandas")

    from ..ops.joins import hash_join

    return hash_join(deduped, losers, "left_anti", on=(id_col,), right_on=("node",))


def curate_documents(
    docs: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 30,
    min_stopword_ratio: float = 0.02,
    jaccard_threshold: float = 0.7,
    pack_budget: int = 4096,
    max_group_size: int | None = None,
) -> ray.data.Dataset:
    """Returns the curated corpus as (doc_id, n_tokens, pack_id) — the
    docs that survive all filters, assigned to training sequences."""

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        # one segmentation pass feeds both the quality stats and langid
        qs, lang = quality_and_lang_batch(b[text_col])
        mask = (
            (qs["n_words"] >= min_words)
            & (qs["stopword_ratio"] >= min_stopword_ratio)
            & (lang != "und")
        )
        return b[mask]

    # materialized: exact_dedup scans its input twice (hash pass + loser
    # anti-filter) and the quality kernel is the expensive part of `keep`
    kept = docs.map_batches(keep, batch_format="pandas").materialize()
    deduped = exact_dedup(kept, text_col=text_col, id_col=id_col).materialize()

    lsh_kwargs = {} if max_group_size is None else {"max_group_size": max_group_size}
    pairs = minhash_lsh_pairs(
        deduped,
        text_col=text_col,
        id_col=id_col,
        threshold=jaccard_threshold,
        **lsh_kwargs,
    )
    comp = connected_components(deduped, pairs, node_col=id_col)
    # keep representatives (node == component min) by dropping everything
    # else — adaptive: broadcast the duplicate-bounded loser set when
    # small, distributed left_anti join when a dup-heavy crawl makes it
    # large (drop_near_dup_losers). Broadcasting the REP set instead
    # would ship every surviving doc id — a driver OOM at web scale.
    final_docs = drop_near_dup_losers(deduped, comp, id_col)
    return pack_documents(
        final_docs, budget=pack_budget, id_col=id_col, text_col=text_col
    )


def run_curation(
    docs: ray.data.Dataset,
    out_dir: str,
    *,
    resume: bool = True,
    input_path: str | None = None,
    **kwargs,
) -> dict:
    """Curate + write PARTITIONED parquet (one directory per pack range —
    the resumable-output layout: a failed downstream tokenization run can
    skip finished partitions), with a lineage manifest; a rerun with the
    same config AND input fingerprint is skipped entirely. Pass
    ``input_path`` (the parquet source of ``docs``) so the fingerprint
    covers the data, not just the knobs."""
    import time

    from ..state import manifest as mf

    t0 = time.monotonic()
    fp = {
        "config": mf.config_digest(
            {"op": "curation", **{k: str(v) for k, v in kwargs.items()}}
        )
    }
    if input_path:
        fp.update(mf.input_fingerprint(input_path))
    if resume and mf.is_complete(out_dir, fp):
        m = mf.read_manifest(out_dir)
        return {"resumed": True, "rows": m["total_rows"], "secs": 0.0}

    packed = curate_documents(docs, **kwargs)
    part = packed.map_batches(
        lambda b: b.assign(pack_range=(b["pack_id"] // 16).astype("int64")),
        batch_format="pandas",
    )
    part.write_parquet(out_dir, partition_cols=["pack_range"], mode="overwrite")
    m = mf.write_manifest(out_dir, fp, {"secs": round(time.monotonic() - t0, 3)})
    return {"resumed": False, "rows": m["total_rows"], "secs": round(time.monotonic() - t0, 3)}


def curate_documents_v2(
    docs: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    probe_max_id: int = 10,
    max_probe_hits: int = 5,
    min_words: int = 20,
    fp_min_shared: int = 3,
    probe_texts=None,
) -> ray.data.Dataset:
    """The round-3 curation chain — every stage a round-3 operator, the
    whole thing under ONE composed oracle (Q_CURATION_V2_SQL):

      documents
        -> train split            (assign_splits, deterministic hash)
        -> decontamination        (drop docs with >= max_probe_hits
                                   shingles from the benchmark probe set
                                   [docs 0..probe_max_id-1]; broadcast)
        -> exact dedup            (content hash, keep min id)
        -> quality filter         (>= min_words \\w+ words)
        -> substring-reuse dedup  (fingerprint_overlap_pairs ->
                                   connected components -> keep the
                                   min-id representative)
        -> salient-term annotation (integer tf-idf over the SURVIVOR
                                   corpus — df changes as docs drop, so
                                   this genuinely tests the composition)

    Output: (doc_id, top_term, tf, df) for every surviving train doc."""
    import re as _re

    import ray as _ray

    from ..ops.dedup import fingerprint_overlap_pairs, shingles
    from ..ops.joins import _fetch
    from ..ops.sampling import assign_splits
    from ..ops.textstats import salient_terms

    train = assign_splits(docs, id_col).map_batches(
        lambda b: b[b["split"] == "train"][[id_col, text_col]],
        batch_format="pandas",
    )

    # probe set from the FULL corpus (the benchmark includes held-out
    # docs). Callers who know the probe ids' storage location should pass
    # ``probe_texts`` (an iterable of probe-doc texts) read with a
    # PUSHED-DOWN id filter — the fallback here is a whole extra pass
    # over the corpus to extract a handful of rows.
    if probe_texts is None:
        probe_texts = docs.map_batches(
            lambda b: b[b[id_col] < probe_max_id][[text_col]],
            batch_format="pandas",
        ).to_pandas()[text_col]
    probe: set = set()
    for t in probe_texts:
        probe |= shingles(t, 3)
    ref = _ray.put(frozenset(probe))

    word_re = _re.compile(r"\w+", _re.UNICODE)

    def decont_and_quality(b: pd.DataFrame) -> pd.DataFrame:
        pr = _fetch(ref)
        mask = np.empty(len(b), dtype=bool)
        for i, t in enumerate(b[text_col]):
            mask[i] = (
                len(shingles(t, 3) & pr) < max_probe_hits
                and len(word_re.findall((t or "").lower())) >= min_words
            )
        return b[mask]

    # materialized: exact_dedup scans twice and decont shingles every doc
    clean = train.map_batches(decont_and_quality, batch_format="pandas").materialize()
    deduped = exact_dedup(clean, text_col=text_col, id_col=id_col).materialize()

    pairs = fingerprint_overlap_pairs(
        deduped, text_col=text_col, id_col=id_col, min_shared=fp_min_shared
    )
    comp = connected_components(deduped, pairs, node_col=id_col)
    surv = drop_near_dup_losers(deduped, comp, id_col)
    top = salient_terms(surv, text_col=text_col, id_col=id_col, top_k=1)
    return top.map_batches(
        lambda b: b[b["rank"] == 1][[id_col, "term", "tf", "df"]].rename(
            columns={"term": "top_term"}
        ),
        batch_format="pandas",
    )
