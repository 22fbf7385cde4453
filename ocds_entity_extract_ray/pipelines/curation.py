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
from ..ops.textstats import detect_lang, quality_stats


def near_dup_loser_ids(comp: ray.data.Dataset) -> frozenset:
    """Collect the ids of NON-representative nodes (``node != cluster_id``)
    from a connected-components labelling. This is the anti-filter set for
    cluster dedup: its size equals the number of docs that actually lose to
    a cluster representative — duplicate-bounded, never corpus-bounded
    (singleton clusters contribute nothing because they label themselves)."""
    losers_df = comp.map_batches(
        lambda b: b[b["node"] != b["cluster_id"]][["node"]], batch_format="pandas"
    ).to_pandas()
    return frozenset(losers_df["node"].tolist())


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
        mask = np.empty(len(b), dtype=bool)
        for i, t in enumerate(b[text_col]):
            qs = quality_stats(t)
            mask[i] = (
                qs["n_words"] >= min_words
                and qs["stopword_ratio"] >= min_stopword_ratio
                and detect_lang(t) != "und"
            )
        return b[mask]

    kept = docs.map_batches(keep, batch_format="pandas")
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
    # else. The broadcast set is the NON-representatives (node !=
    # cluster_id): only nodes that sit in a multi-member near-dup cluster
    # and lost — bounded by the DUPLICATE cardinality (itself bounded by
    # the capped candidate-pair count), NOT the corpus. Broadcasting the
    # rep set instead would ship every surviving doc id (singletons are
    # their own reps) — a driver OOM at web scale.
    loser_ids = near_dup_loser_ids(comp)

    import ray as _ray

    from ..ops.joins import _fetch

    ref = _ray.put(loser_ids)

    def drop_losers(b: pd.DataFrame) -> pd.DataFrame:
        ids = _fetch(ref)
        return b[~b[id_col].isin(ids)]

    final_docs = deduped.map_batches(drop_losers, batch_format="pandas")
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
