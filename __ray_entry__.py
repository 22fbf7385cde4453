"""Driver contract for the graft builder (Ray Data target).

- ``entry()``: flagship KG pipeline on a deterministic synthetic pages
  corpus (sf0.001 scale) — pages -> mention detect (actor pool) ->
  canonicalize (hash-bucketed groupby) -> entities Dataset.
- ``queries()``: one entry per implemented operator/pipeline from
  SURVEY.md §2 + the training-data ops (dedup / similarity / text
  analysis / windows).
- ``oracle_sql()``: DuckDB twins for every SQL-expressible query.

Ray is initialised by the driver BEFORE this module is imported — nothing
here (or in the library) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
import re
from collections.abc import Callable
from typing import Any

_CORPUS_DOCS_PER_SF = 200_000  # sf0.001 -> 200 pages, sf0.01 -> 2k, sf0.1 -> 20k


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", os.path.basename(os.path.normpath(sf_dir or "")))
    try:
        return float(m.group(1)) if m else 0.001
    except ValueError:
        return 0.001


def _corpus(n: int) -> str:
    from ocds_entity_extract_ray.sources.readers import generate_pages
    from ocds_entity_extract_ray.state.paths import scratch_path

    out = scratch_path(f"pages_{n}")
    return generate_pages(out, n, shard_rows=max(200, n // 64))


def _kg_inputs():
    from ocds_entity_extract_ray.functions.classify import build_classifier_list_from_text
    from ocds_entity_extract_ray.sources.synth import classifier_csv, product_index

    return build_classifier_list_from_text([classifier_csv()]), product_index()


def entry() -> Any:
    """Flagship pipeline at sf0.001 scale; returns the entities Dataset."""
    from ocds_entity_extract_ray.pipelines.kg import build_entities
    from ocds_entity_extract_ray.sources.readers import read_pages

    pages_dir = _corpus(200)
    clist, pidx = _kg_inputs()
    pages = read_pages(pages_dir, columns=["url", "html"])
    return build_entities(pages, clist, pidx, num_buckets=16)


def _kg_triples(sf_dir: str):
    """Rows-only flagship query: triples at a corpus size scaled to sf."""
    from ocds_entity_extract_ray.pipelines.kg import build_entities
    from ocds_entity_extract_ray.sources.readers import read_pages
    from ocds_entity_extract_ray.stages.triples_stage import materialize_triples

    n = max(200, int(_CORPUS_DOCS_PER_SF * _sf_of(sf_dir)))
    pages_dir = _corpus(n)
    clist, pidx = _kg_inputs()
    pages = read_pages(pages_dir, columns=["url", "html"])
    entities = build_entities(pages, clist, pidx, num_buckets=64)
    return materialize_triples(entities)


def _kg_triples_from_records(sf_dir: str):
    """Rows-only: same KG pipeline fed from the struct/JSON OCDS-records
    materialization (source S1 variant) instead of web pages."""
    from ocds_entity_extract_ray.pipelines.kg import build_entities
    from ocds_entity_extract_ray.sources.readers import generate_records, read_records
    from ocds_entity_extract_ray.stages.triples_stage import materialize_triples

    n = max(200, int(_CORPUS_DOCS_PER_SF * _sf_of(sf_dir)))
    from ocds_entity_extract_ray.state.paths import scratch_path

    rec_dir = generate_records(scratch_path(f"records_{n}"), n, shard_rows=max(200, n // 64))
    clist, pidx = _kg_inputs()
    entities = build_entities(read_records(rec_dir), clist, pidx, num_buckets=64)
    return materialize_triples(entities)


def _kg_triples_from_warc(sf_dir: str):
    """Rows-only: the KG pipeline fed from WARC segments (the Common
    Crawl wire format, sources/warc.py) — pages materialized as
    per-record-gzipped WARC, streamed back through WARCDatasource, then
    the flagship extractor. Byte-parity of the triple set with the
    parquet-fed run is pytest-pinned (tests/test_warc.py)."""
    from ocds_entity_extract_ray.pipelines.kg import build_entities
    from ocds_entity_extract_ray.sources.warc import read_warc, write_warc
    from ocds_entity_extract_ray.stages.triples_stage import materialize_triples
    from ocds_entity_extract_ray.state.paths import scratch_path

    n = max(200, int(_CORPUS_DOCS_PER_SF * _sf_of(sf_dir)))
    pages_dir = _corpus(n)
    warc_dir = write_warc(pages_dir, scratch_path(f"warc_{n}"), gzip_members=True)
    clist, pidx = _kg_inputs()
    pages = read_warc(warc_dir).drop_columns(["warc_ts"])
    entities = build_entities(pages, clist, pidx, num_buckets=64)
    return materialize_triples(entities)


def _kg_reject_audit(sf_dir: str):
    """Rows-only: the pipeline's reject / dead-letter channel
    (stages/audit.py) — deterministically plant k malformed pages of each
    failure class next to the clean corpus, audit every page through the
    SAME parser the mention stage uses, and return the (status, n_pages,
    n_records) rollup. Planted-truth-gated: the query itself raises if
    any planted reject is missed or any clean page is misclassified."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from ocds_entity_extract_ray.sources.readers import read_pages
    from ocds_entity_extract_ray.sources.synth import PAGES_SCHEMA
    from ocds_entity_extract_ray.stages.audit import page_audit, reject_summary
    from ocds_entity_extract_ray.state.paths import scratch_path

    n = max(200, int(_CORPUS_DOCS_PER_SF * _sf_of(sf_dir)))
    k = max(2, n // 100)
    pages_dir = _corpus(n)

    import datetime
    import os

    ts = datetime.datetime(2021, 1, 1)
    bad_rows = []
    for i in range(k):
        bad_rows.append(
            {
                "url": f"https://bad.example/truncated/{i}",
                "warc_ts": ts,
                "html": b'<script type="application/ld+json">{"cut": </script>',
                "text": "",
                "lang": "xx",
            }
        )
        bad_rows.append(
            {
                "url": f"https://bad.example/nonobject/{i}",
                "warc_ts": ts,
                "html": b'<script type="application/ld+json">[1, "no"]</script>',
                "text": "",
                "lang": "xx",
            }
        )
        bad_rows.append(
            {
                "url": f"https://bad.example/garbage/{i}",
                "warc_ts": ts,
                "html": b"\xff\xfe\x00 not html at all " + str(i).encode(),
                "text": "",
                "lang": "xx",
            }
        )
    bad_dir = scratch_path(f"bad_pages_{k}")
    os.makedirs(bad_dir, exist_ok=True)
    pq.write_table(
        pa.Table.from_pylist(bad_rows, schema=PAGES_SCHEMA),
        os.path.join(bad_dir, "bad.parquet"),
    )

    pages = read_pages(pages_dir, columns=["url", "html"]).union(
        ray.data.read_parquet(bad_dir, columns=["url", "html"])
    )
    out = reject_summary(page_audit(pages))
    got = dict(zip(out["status"], out["n_pages"]))
    want = {"bad_json": k, "non_object": k, "no_jsonld": k, "ok": n}
    if got != want:
        raise AssertionError(f"kg_reject_audit: planted truth missed: {got} != {want}")
    return out


def _kg_text_hashes(sf_dir: str):
    """Rows-only: the byte-identity invariant surface — per-url sha256 of
    the extracted text (input_hint)."""
    from ocds_entity_extract_ray.sources.readers import read_pages
    from ocds_entity_extract_ray.stages.extract_text import extract_text

    n = max(200, int(_CORPUS_DOCS_PER_SF * _sf_of(sf_dir)))
    pages_dir = _corpus(n)
    ds = extract_text(read_pages(pages_dir, columns=["url", "html"]))
    return ds.select_columns(["url", "text_sha256"])


def _kg_degree_hist(sf_dir: str):
    """Rows-only: degree statistics over the produced KG — per predicate,
    triple count and distinct subject count (a grouped rollup on the graph
    the engine materializes; kg-class, conformance-covered by the triple
    P/R suite that pins the underlying triple set)."""
    import pandas as pd

    from ocds_entity_extract_ray.ops.agg import grouped_agg
    from ocds_entity_extract_ray.pipelines.kg import build_entities
    from ocds_entity_extract_ray.sources.readers import read_pages
    from ocds_entity_extract_ray.stages.triples_stage import materialize_triples

    n = max(200, int(_CORPUS_DOCS_PER_SF * _sf_of(sf_dir)))
    pages_dir = _corpus(n)
    clist, pidx = _kg_inputs()
    entities = build_entities(
        read_pages(pages_dir, columns=["url", "html"]), clist, pidx, num_buckets=64
    )
    triples = materialize_triples(entities)

    from ocds_entity_extract_ray.ops.agg import bucketed_map_groups

    # distinct (pred, subj) needs the q16 shape: map-side pre-distinct
    # (the row kill) then one bucketed global dedup — a subject can emit
    # triples from several entity/membership rows in different blocks
    pre = triples.map_batches(
        lambda b: b[["pred", "subj"]].drop_duplicates(), batch_format="pandas"
    )
    distinct = bucketed_map_groups(
        pre,
        "subj",
        lambda b: b.drop_duplicates(["pred", "subj"]),
        num_buckets=16,
        empty_result=pd.DataFrame(
            {"pred": pd.Series(dtype="object"), "subj": pd.Series(dtype="object")}
        ),
    )
    subj_counts = grouped_agg(distinct, ["pred"], {"n_subjects": ("subj", "count")})
    tri_counts = grouped_agg(triples, ["pred"], {"n_triples": ("subj", "count")})
    out = tri_counts.merge(subj_counts, on="pred")
    for c in ("n_triples", "n_subjects"):
        out[c] = out[c].astype("int64")
    return out.sort_values("pred").reset_index(drop=True)


def _kg_entity_pagerank(sf_dir: str):
    """Rows-only: entity importance over the produced KG — fixed-point
    integer PageRank (ops/graph.py:pagerank, bit-deterministic) on the
    membership-edge graph (E1-E6 predicates; subj/obj entity ids hashed
    to int64 nodes, ranks joined back). Top-100 by (rank desc, entity)."""
    import hashlib

    import pandas as pd

    from ocds_entity_extract_ray.extraction.triples import ROLE_PREDICATES
    from ocds_entity_extract_ray.ops.graph import pagerank
    from ocds_entity_extract_ray.pipelines.kg import build_entities
    from ocds_entity_extract_ray.sources.readers import read_pages
    from ocds_entity_extract_ray.stages.triples_stage import materialize_triples

    n = max(200, int(_CORPUS_DOCS_PER_SF * _sf_of(sf_dir)))
    pages_dir = _corpus(n)
    clist, pidx = _kg_inputs()
    entities = build_entities(
        read_pages(pages_dir, columns=["url", "html"]), clist, pidx, num_buckets=64
    )
    triples = materialize_triples(entities)

    preds = sorted(set(ROLE_PREDICATES.values()))

    def _h(s: str) -> int:
        # 63-bit (non-negative int64) stable hash of the entity id
        return (
            int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")
            >> 1
        )

    def to_edges(b: pd.DataFrame) -> pd.DataFrame:
        m = b[b["pred"].isin(preds)]
        return pd.DataFrame(
            {
                "src": [_h(x) for x in m["subj"]],
                "dst": [_h(x) for x in m["obj"]],
            }
        ).astype({"src": "int64", "dst": "int64"})

    def to_names(b: pd.DataFrame) -> pd.DataFrame:
        m = b[b["pred"].isin(preds)]
        ids = pd.concat([m["subj"], m["obj"]], ignore_index=True).drop_duplicates()
        return pd.DataFrame(
            {"node": [_h(x) for x in ids], "entity": ids.to_numpy()}
        ).astype({"node": "int64"})

    from ocds_entity_extract_ray.ops.agg import bucketed_map_groups, topk_rows
    from ocds_entity_extract_ray.ops.joins import hash_join

    empty_out = pd.DataFrame(
        {"entity": pd.Series(dtype="object"), "rank": pd.Series(dtype="int64")}
    )
    ranks = pagerank(
        triples.map_batches(to_edges, batch_format="pandas"), iters=10
    ).materialize()
    if ranks.count() == 0:  # zero role triples: schema-less blocks crash joins
        return empty_out
    # node->entity is entity-cardinality: dedup and label DISTRIBUTEDLY
    # (one bucket shuffle + a hash join), never collected to the driver —
    # only the pruned top-k candidates (<= 100 per block) land there
    names = bucketed_map_groups(
        triples.map_batches(to_names, batch_format="pandas"),
        "node",
        lambda b: b.drop_duplicates("node"),
        num_buckets=16,
        empty_result=pd.DataFrame(
            {"node": pd.Series(dtype="int64"), "entity": pd.Series(dtype="object")}
        ),
    )
    # coalesce before the acero join: sparse bucketed stages emit
    # schema-less empty blocks that crash Dataset.join
    named = hash_join(
        ranks.repartition(4), names.repartition(4), "inner", on=("node",)
    ).map_batches(lambda b: b[["entity", "rank"]], batch_format="pandas")
    return topk_rows(
        named, 100, by=["rank", "entity"], ascending=[False, True], empty=empty_out
    )


def _kg_incremental_triples(sf_dir: str):
    """Rows-only: the incremental materialization surface — bootstrap the
    persisted state store from ~2/3 of the corpus, merge the rest as a
    delta, export, and return the triples. Byte-equality with the full
    rebuild is pytest-pinned (tests/test_kg_pipeline.py); this entry
    exercises init/update/export end to end under the driver."""
    import os
    import shutil

    import ray.data

    from ocds_entity_extract_ray.pipelines.kg_incremental import (
        kg_export,
        kg_init,
        kg_update,
    )

    from ocds_entity_extract_ray.sources.readers import generate_pages

    n = max(200, int(_CORPUS_DOCS_PER_SF * _sf_of(sf_dir)))
    # finer shards than the shared corpus so the init/delta file split is
    # non-degenerate even at the smallest scale
    from ocds_entity_extract_ray.state.paths import scratch_path

    pages_dir = generate_pages(
        scratch_path(f"pages_fine_{n}"), n, shard_rows=max(25, n // 16)
    )
    clist, pidx = _kg_inputs()

    base = scratch_path(f"inc_{n}")
    init_dir, delta_dir = base + "/init", base + "/delta"
    store, out = base + "/store", base + "/out"
    for d in (init_dir, delta_dir, store, out):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d, exist_ok=True)
    files = sorted(f for f in os.listdir(pages_dir) if f.endswith(".parquet"))
    for i, f in enumerate(files):
        dst = delta_dir if i % 3 == 0 else init_dir
        os.symlink(os.path.join(pages_dir, f), os.path.join(dst, f))

    kg_init(init_dir, store, clist, pidx, num_buckets=64)
    kg_update(delta_dir, store, clist, pidx)
    kg_export(store, out)
    return ray.data.read_parquet(os.path.join(out, "triples"))


def _kg_two_hop(sf_dir: str):
    """Rows-only: graph-PATTERN query over the materialized KG — the
    SPARQL shape ``?person contactPointOf ?org . ?org memberOf ?parent``
    as a distributed self-join of the triples Dataset on obj == subj
    (predicate-filtered sides, hash-partitioned join), then a count per
    (pred pair, parent). Shows the engine QUERIES the graph it builds,
    not just emits it; conformance-covered by the triple P/R suite that
    pins the underlying triple set."""
    import pandas as pd

    from ocds_entity_extract_ray.ops.agg import grouped_agg
    from ocds_entity_extract_ray.ops.joins import hash_join
    from ocds_entity_extract_ray.pipelines.kg import build_entities
    from ocds_entity_extract_ray.sources.readers import read_pages
    from ocds_entity_extract_ray.stages.triples_stage import materialize_triples

    n = max(200, int(_CORPUS_DOCS_PER_SF * _sf_of(sf_dir)))
    pages_dir = _corpus(n)
    clist, pidx = _kg_inputs()
    entities = build_entities(
        read_pages(pages_dir, columns=["url", "html"]), clist, pidx, num_buckets=64
    )
    triples = materialize_triples(entities)

    def side(pred: str, rename: dict):
        return triples.map_batches(
            lambda b, p=pred, r=rename: b.loc[b["pred"] == p, list(r)].rename(columns=r),
            batch_format="pandas",
        )

    hop1 = side("contactPointOf", {"subj": "person", "obj": "org"})
    hop2 = side("memberOf", {"subj": "org2", "obj": "parent"})
    paths = hash_join(hop1, hop2, "inner", on=("org",), right_on=("org2",))
    out = grouped_agg(
        paths, ["parent"], {"n_contact_paths": ("person", "count")}, final="driver"
    )
    out["n_contact_paths"] = out["n_contact_paths"].astype("int64")
    return out.sort_values("parent").reset_index(drop=True)


def _kg_membership_edges(sf_dir: str):
    """Shared by the KG graph-analytics queries: the undirected distinct
    entity graph (u < v, int64 blake2b ids) from the membership-edge
    triples (E1-E6 predicates), plus the node->entity name mapping."""
    import hashlib

    import pandas as pd

    from ocds_entity_extract_ray.extraction.triples import ROLE_PREDICATES
    from ocds_entity_extract_ray.pipelines.kg import build_entities
    from ocds_entity_extract_ray.sources.readers import read_pages
    from ocds_entity_extract_ray.stages.triples_stage import materialize_triples

    n = max(200, int(_CORPUS_DOCS_PER_SF * _sf_of(sf_dir)))
    pages_dir = _corpus(n)
    clist, pidx = _kg_inputs()
    entities = build_entities(
        read_pages(pages_dir, columns=["url", "html"]), clist, pidx, num_buckets=64
    )
    triples = materialize_triples(entities)
    preds = sorted(set(ROLE_PREDICATES.values()))

    def _h(s: str) -> int:
        return (
            int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")
            >> 1
        )

    def to_edges(b: pd.DataFrame) -> pd.DataFrame:
        m = b[b["pred"].isin(preds)]
        hs = [_h(x) for x in m["subj"]]
        ho = [_h(x) for x in m["obj"]]
        u = [min(a, c) for a, c in zip(hs, ho)]
        v = [max(a, c) for a, c in zip(hs, ho)]
        out = pd.DataFrame({"u": u, "v": v}).astype({"u": "int64", "v": "int64"})
        return out[out["u"] != out["v"]].drop_duplicates()

    def to_names(b: pd.DataFrame) -> pd.DataFrame:
        m = b[b["pred"].isin(preds)]
        ids = pd.concat([m["subj"], m["obj"]], ignore_index=True).drop_duplicates()
        return pd.DataFrame(
            {"node": [_h(x) for x in ids], "entity": ids.to_numpy()}
        ).astype({"node": "int64"})

    from ocds_entity_extract_ray.ops.agg import bucketed_map_groups

    # distinct across blocks: per-batch dedup above only bounds each block
    edges = bucketed_map_groups(
        triples.map_batches(to_edges, batch_format="pandas"),
        "u",
        lambda b: b.drop_duplicates(["u", "v"]),
        num_buckets=16,
        empty_result=pd.DataFrame(
            {"u": pd.Series(dtype="int64"), "v": pd.Series(dtype="int64")}
        ),
    )
    names = triples.map_batches(to_names, batch_format="pandas")
    return edges, names


def _names_dataset(names) -> "Any":
    """names Dataset -> node-deduped names Dataset (one bucket shuffle);
    stays DISTRIBUTED — entity cardinality never lands on the driver."""
    import pandas as pd

    from ocds_entity_extract_ray.ops.agg import bucketed_map_groups

    return bucketed_map_groups(
        names,
        "node",
        lambda b: b.drop_duplicates("node"),
        num_buckets=16,
        empty_result=pd.DataFrame(
            {"node": pd.Series(dtype="int64"), "entity": pd.Series(dtype="object")}
        ),
    )


def _lookup_names(names, nodes) -> "Any":
    """Labels for a SMALL driver-side node set: broadcast the ids, filter
    the names Dataset distributedly, collect only the matches (<= |nodes|
    rows) — the full name table never lands on the driver."""
    import pandas as pd
    import ray

    from ocds_entity_extract_ray.ops.agg import to_pandas_safe

    wanted_ref = ray.put(frozenset(int(x) for x in nodes))

    def pick(b: pd.DataFrame) -> pd.DataFrame:
        wanted = ray.get(wanted_ref)
        return b[b["node"].isin(wanted)]

    empty = pd.DataFrame(
        {"node": pd.Series(dtype="int64"), "entity": pd.Series(dtype="object")}
    )
    matches = to_pandas_safe(
        names.map_batches(pick, batch_format="pandas"), empty
    )
    return matches.drop_duplicates("node")


def _kg_entity_cores(sf_dir: str):
    """Rows-only: dense-core extraction over the produced KG — the 2-core
    (4 bounded peel rounds, ops/graph.py:k_core) of the undirected entity
    membership graph, names joined back. Finds the tightly-connected
    entity neighborhoods (orgs whose people/suppliers interlock) and
    prunes the tree-like fringe a web-scale KG is mostly made of."""
    import pandas as pd

    from ocds_entity_extract_ray.ops.agg import to_pandas_safe
    from ocds_entity_extract_ray.ops.graph import k_core
    from ocds_entity_extract_ray.ops.joins import hash_join

    empty_out = pd.DataFrame(
        {"entity": pd.Series(dtype="object"), "deg": pd.Series(dtype="int64")}
    )
    edges, names = _kg_membership_edges(sf_dir)
    core = k_core(edges, 2, rounds=4, num_buckets=16).materialize()
    if core.count() == 0:  # empty core: schema-less blocks crash joins
        return empty_out
    # label the core nodes with a distributed hash join (core and names
    # are both entity-cardinality; only the JOINED result — the query's
    # actual output — is collected). repartition first: sparse bucketed
    # stages emit schema-less empty blocks that crash Dataset.join.
    labeled = hash_join(
        core.repartition(4), _names_dataset(names).repartition(4),
        "inner", on=("node",),
    ).map_batches(lambda b: b[["entity", "deg"]], batch_format="pandas")
    out = to_pandas_safe(labeled, empty_out)
    return out.sort_values(["deg", "entity"], ascending=[False, True]).reset_index(
        drop=True
    )


def _kg_link_prediction(sf_dir: str):
    """Rows-only: common-neighbor link prediction over the KG entity
    graph (ops/graph.py:common_neighbor_scores) — the top 100
    non-adjacent entity pairs by shared-neighbor count with the exact
    Jaccard score; the missing-edge hypotheses an entity-resolution pass
    would review."""
    from ocds_entity_extract_ray.ops.graph import (
        common_neighbor_scores,
        top_jaccard_pairs,
    )

    edges, names = _kg_membership_edges(sf_dir)
    # max_center_degree: the membership graph is NOT weight-thresholded
    # like the co-purchase one, and a hub entity's wedge count is
    # quadratic in its degree — skip hubs, loudly (approximate by
    # declaration, exactly like the LSH band caps)
    scored = common_neighbor_scores(
        edges, min_cn=2, num_buckets=16, max_center_degree=64
    )
    top = top_jaccard_pairs(scored, 100)
    # label the <=100 pairs by broadcasting their <=200 node ids and
    # filtering the names Dataset distributedly — never collect the full
    # (entity-cardinality) name table to the driver
    nm = _lookup_names(names, list(top["a"]) + list(top["b"]))
    top = top.merge(nm.rename(columns={"node": "a", "entity": "entity_a"}), on="a")
    top = top.merge(nm.rename(columns={"node": "b", "entity": "entity_b"}), on="b")
    out = top[["entity_a", "entity_b", "cn", "jaccard"]]
    return out.sort_values(
        ["cn", "entity_a", "entity_b"], ascending=[False, True, True]
    ).reset_index(drop=True)


def _kg_crawl_freshness(sf_dir: str):
    """Rows-only: crawl-freshness profile over the input_hint's
    ``warc_ts`` column — per crawl HOUR (the synthetic corpus spans
    hours-to-days depending on sf), page count and embedded-record count
    (extract_jsonld_blocks, the same parser the flagship mention stage
    uses). The query a recrawl scheduler runs to decide which slices of
    a 10^12-page corpus are stale; one stateless map + one small grouped
    aggregate."""
    import pandas as pd

    from ocds_entity_extract_ray.functions.textextract import extract_jsonld_blocks
    from ocds_entity_extract_ray.ops.agg import grouped_agg
    from ocds_entity_extract_ray.sources.readers import read_pages

    n = max(200, int(_CORPUS_DOCS_PER_SF * _sf_of(sf_dir)))
    pages_dir = _corpus(n)
    pages = read_pages(pages_dir, columns=["warc_ts", "html"])

    def per_hour(b: pd.DataFrame) -> pd.DataFrame:
        hr = (
            b["warc_ts"].astype("datetime64[ns]").astype("int64")
            // (3_600 * 10**9)
        )
        n_rec = [len(extract_jsonld_blocks(h)) for h in b["html"]]
        return pd.DataFrame(
            {"crawl_hour": hr.to_numpy(), "n_records": n_rec}
        ).astype({"crawl_hour": "int64", "n_records": "int64"})

    out = grouped_agg(
        pages.map_batches(per_hour, batch_format="pandas"),
        ["crawl_hour"],
        {"n_pages": ("n_records", "count"), "n_records": ("n_records", "sum")},
        final="driver",
    )
    for c in ("n_pages", "n_records"):
        out[c] = out[c].astype("int64")
    return out.sort_values("crawl_hour").reset_index(drop=True)


# The driver's correctness gate oracles exactly queries()[:50], so the
# first 50 names MUST be a representative cross-section of the engine:
# the flagship KG pipeline plus one query per operator family.  Keep the
# list at exactly 50 entries; everything else follows in registry order.
DRIVER_WINDOW: tuple[str, ...] = (
    # flagship KG pipeline (rows-only: conformance-tested vs the
    # sequential oracle port; no SQL twin exists for the full extractor)
    "kg_triples",
    # r05 session-6 rotation: the WARC-fed S1 variant replaces the
    # records-fed one (r04-green; stays in the full sweep)
    "kg_triples_from_warc",
    "kg_text_hashes",
    "kg_incremental_triples",
    # TPC-H relational core
    "q1_pricing_summary",
    "q6_pushdown",
    "q8_market_share",
    # join strategies
    "q_skew_join_type_weight",
    "q_bucketed_join_segments",
    "q_range_join",
    # windows / sessions / temporal (running_total: the r04 dtype class,
    # freshly ::BIGINT-cast; late_events: new in r04; moving_sum rotated
    # out in r05 — running_total covers the same window+dtype shape)
    # events_tumbling (green since r02) rotated out for the incremental
    # streaming-window state store added this session (same family,
    # strictly stronger: multi-tick persisted state == the batch twin)
    "q_streaming_window_ingest",
    "q_running_total",
    "q_late_events",
    "q_scd2_user_value",
    "q_gapfill_daily_orders",
    # rollup / window-rank / centroid accumulators (r04 dtype class)
    "q_rollup_orders",
    "q_supplier_rank",
    "q_label_centroids",
    # deduplication family (semantic: new in r04; line/span dedup: new
    # in r05 — span_dedup is sliding-window ExactSubstr and supersedes
    # the stride-chunked q_passage_dedup in the window; passage_dedup
    # stays in the full sweep)
    # exact_dedup_stats (green since r02) rotated out for the keep-best
    # canonical-selection variant added this session
    "q_canonical_docs",
    "q_minhash_dup_pairs",
    "q_simhash_dup_pairs",
    "q_span_dedup",
    "q_semantic_dedup",
    "q_line_dedup",
    "q_contamination",
    # media dedup (rows-only: binary payloads, planted-truth-gated)
    "q_image_dup_pairs",
    "q_audio_dup_pairs",
    "q_video_dup_pairs",
    # similarity search + lexical retrieval (bm25: new in r04)
    "q_ann_ivf_topk",
    "q_bm25_topk",
    # graph algorithms (pagerank/ppr: the r04 driver-RED dtype rows)
    "q_pagerank",
    "q_personalized_pagerank",
    "q_bfs_purchase_radius",
    "q_kcore_parts",
    "q_supplier_triangles",
    # text analysis (gopher/ngram_char_fracs: new in r04; c4: new in
    # r05; langid rotated out — q_doc_quality exercises the same
    # segmentation kernel and langid stays in the full sweep)
    # doc_quality (green since r02) rotated out for the crawl-drift
    # monitor added this session (text-analysis family stays covered by
    # c4/gopher/ngram_char_fracs/bigram below)
    "q_crawl_drift",
    "q_c4_quality",
    "q_gopher_quality",
    "q_ngram_char_fracs",
    "q_bigram_lm_filter",
    "q_pii_redaction",
    # sampling / splits / mixing
    "q_temperature_mix",
    # cap_docs_per_source (green since r03) rotated out for the seeded
    # epoch-shuffle order added this session
    "q_epoch_shuffle",
    # CDC / diff
    "q_latest_event_per_user",
    "q_table_diff",
    # composed curation, clustering, layout, URLs, profiling
    "q_curation_v2",
    "q_kmeans_clusters",
    # zorder (green since r03) rotated out for the composed
    # crawl-admission funnel added this session
    "q_crawl_admission",
    # url_domain_stats (green since r03) rotated out for the robots.txt
    # gate added this session (same URL-parse kernel underneath)
    "q_robots_filter",
    "q_profile_orders",
)


def queries() -> dict[str, Callable[[str], Any]]:
    from ocds_entity_extract_ray.pipelines.relational import (
        ROWS_ONLY_QUERIES,
        SQL_QUERIES,
    )

    full: dict[str, Callable[[str], Any]] = {}
    for name, (fn, _sql) in SQL_QUERIES.items():
        full[name] = fn
    full.update(ROWS_ONLY_QUERIES)
    full["kg_triples"] = _kg_triples
    full["kg_triples_from_records"] = _kg_triples_from_records
    full["kg_triples_from_warc"] = _kg_triples_from_warc
    full["kg_reject_audit"] = _kg_reject_audit
    full["kg_text_hashes"] = _kg_text_hashes
    full["kg_degree_hist"] = _kg_degree_hist
    full["kg_entity_pagerank"] = _kg_entity_pagerank
    full["kg_incremental_triples"] = _kg_incremental_triples
    full["kg_two_hop"] = _kg_two_hop
    full["kg_entity_cores"] = _kg_entity_cores
    full["kg_link_prediction"] = _kg_link_prediction
    full["kg_partition_lineage"] = _kg_partition_lineage
    full["kg_crawl_freshness"] = _kg_crawl_freshness

    out: dict[str, Callable[[str], Any]] = {}
    for name in DRIVER_WINDOW:
        out[name] = full[name]
    for name, fn in full.items():
        if name not in out:
            out[name] = fn
    return out


def oracle_sql() -> dict[str, str]:
    from ocds_entity_extract_ray.pipelines.relational import SQL_QUERIES

    return {name: sql for name, (_fn, sql) in SQL_QUERIES.items()}


def _kg_partition_lineage(sf_dir: str):
    """Rows-only: the per-partition lineage surface the north rule asks
    for, as a QUERYABLE table — run the flagship pipeline, then read its
    stage manifests (state/manifest.py: input fingerprint, per-partition
    row counts, per-stage secs/docs-per-sec metrics) back as one frame:
    (stage, partition, n_rows, stage_secs, stage_rate). This is what a
    failed 100 TB run consults to skip finished partitions and what an
    auditor consults for where every output row came from."""
    import shutil

    import pandas as pd

    from ocds_entity_extract_ray.pipelines.kg import run_kg
    from ocds_entity_extract_ray.state.manifest import read_manifest

    n = max(200, int(_CORPUS_DOCS_PER_SF * _sf_of(sf_dir)))
    pages_dir = _corpus(n)
    clist, pidx = _kg_inputs()
    from ocds_entity_extract_ray.state.paths import scratch_path

    out_dir = scratch_path(f"lineage_{n}")
    shutil.rmtree(out_dir, ignore_errors=True)
    run_kg(pages_dir, out_dir, clist, pidx, num_buckets=32, resume=False)

    rows = []
    for stage in ("entities", "triples"):
        m = read_manifest(f"{out_dir}/{stage}")
        if m is None:
            continue
        secs = m.get("metrics", {}).get("secs")
        rate = m.get("metrics", {}).get("docs_per_sec") or m.get(
            "metrics", {}
        ).get("triples_per_sec")
        for part, n_rows in sorted(m.get("partitions", {}).items()):
            rows.append(
                (stage, part, int(n_rows),
                 float(secs) if secs is not None else None,
                 float(rate) if rate is not None else None)
            )
    return pd.DataFrame(
        rows, columns=["stage", "partition", "n_rows", "stage_secs", "stage_rate"]
    )
