"""End-to-end Ray pipeline tests: distributed result == sequential oracle,
byte-identity text invariant, checkpoint/resume (SURVEY §5.1-5.2)."""

from __future__ import annotations

import json

import pyarrow.dataset as pads
import pytest

from ocds_entity_extract_ray.extraction.triples import (
    oracle_entities_by_table,
    precision_recall,
    triples_from_entities,
)
from ocds_entity_extract_ray.functions.classify import build_classifier_list_from_text
from ocds_entity_extract_ray.functions.hashing import text_sha256
from ocds_entity_extract_ray.functions.textextract import extract_text_one
from ocds_entity_extract_ray.oracle.reference_extractor import run_reference
from ocds_entity_extract_ray.sources.synth import (
    classifier_csv,
    make_record,
    product_index,
    render_page,
)

N = 300


@pytest.fixture(scope="module")
def pages_dir(ray_session, tmp_path_factory):
    from ocds_entity_extract_ray.sources.readers import generate_pages

    out = str(tmp_path_factory.mktemp("pages"))
    generate_pages(out, N, shard_rows=50)
    return out


def test_generated_pages_deterministic(pages_dir):
    rows = pads.dataset(pages_dir, format="parquet").to_table().sort_by("url").to_pylist()
    assert len(rows) == N
    # parallel shard generation == direct rendering, byte-identical html
    expect = render_page(17, make_record(17))
    got = next(r for r in rows if r["url"] == expect["url"])
    assert got["html"] == expect["html"]


def test_kg_pipeline_matches_oracle(ray_session, pages_dir, tmp_path):
    from ocds_entity_extract_ray.pipelines.kg import run_kg

    clist = build_classifier_list_from_text([classifier_csv()])
    pidx = product_index()
    out = str(tmp_path / "kg")
    report = run_kg(pages_dir, out, clist, pidx, concurrency=2, num_buckets=8, compute="actors")
    assert report["docs"] == N
    assert report["entities"] > 0 and report["triples"] > 0

    ent_rows = pads.dataset(out + "/entities", format="parquet", partitioning="hive").to_table().to_pylist()
    engine_tables: dict = {}
    for r in ent_rows:
        engine_tables.setdefault(r["table"], []).append(json.loads(r["doc"]))

    records = [make_record(i) for i in range(N)]
    oracle_tables = oracle_entities_by_table(
        run_reference(sorted(records, key=lambda r: r["ocid"]), clist, pidx)
    )
    # entity-id sets identical per table
    for t in ("persons", "orgs", "areas", "products", "memberships"):
        assert {d["id"] for d in oracle_tables[t]} == {d["id"] for d in engine_tables[t]}, t

    tri_rows = pads.dataset(out + "/triples", format="parquet", partitioning="hive").to_table().to_pylist()
    engine_triples = {(r["subj"], r["pred"], r["obj"], r["props"]) for r in tri_rows}
    p, r = precision_recall(engine_triples, triples_from_entities(oracle_tables))
    assert p >= 0.95 and r >= 0.95
    assert p == 1.0 and r == 1.0  # exact on this corpus

    # triple write is subject-hash partitioned (resumable layout)
    parts = {r["part"] for r in tri_rows}
    assert len(parts) > 1


def test_kg_pipeline_resume(ray_session, pages_dir, tmp_path):
    from ocds_entity_extract_ray.pipelines.kg import run_kg

    out = str(tmp_path / "kg")
    clist = build_classifier_list_from_text([classifier_csv()])
    pidx = product_index()
    r1 = run_kg(pages_dir, out, clist, pidx, num_buckets=8)
    r2 = run_kg(pages_dir, out, clist, pidx, num_buckets=8)
    assert r2.get("entities_resumed") and r2.get("triples_resumed")
    assert r2["entities"] == r1["entities"] and r2["triples"] == r1["triples"]


def test_kg_resume_invalidated_by_config_change(ray_session, pages_dir, tmp_path):
    """A rerun into the same --out with a DIFFERENT classifier list must
    recompute, not silently return the stale entities (the fingerprint
    covers the output-shaping config, not just input file names+sizes)."""
    from ocds_entity_extract_ray.pipelines.kg import run_kg

    out = str(tmp_path / "kg")
    pidx = product_index()
    clist = build_classifier_list_from_text([classifier_csv()])
    run_kg(pages_dir, out, clist, pidx, num_buckets=8)
    r2 = run_kg(pages_dir, out, None, pidx, num_buckets=8)  # overrides dropped
    assert not r2.get("entities_resumed")
    r3 = run_kg(pages_dir, out, None, pidx, num_buckets=8)  # same config -> resume
    assert r3.get("entities_resumed")


def test_repair_sharded_equals_broadcast(ray_session, pages_dir):
    """The distributed-join repair path (the 10^12-doc shape, forced via
    broadcast_max_names=0) must produce byte-identical entities to the
    broadcast-map path."""
    from ocds_entity_extract_ray.sources.readers import read_pages
    from ocds_entity_extract_ray.stages.canonicalize import (
        canonicalize,
        repair_area_parent_names,
    )
    from ocds_entity_extract_ray.stages.mentions import extract_mentions

    clist = build_classifier_list_from_text([classifier_csv()])
    pidx = product_index()
    pre = canonicalize(
        extract_mentions(
            read_pages(pages_dir, columns=["url", "html"]), clist, pidx, num_buckets=8
        )
    ).materialize()
    a = repair_area_parent_names(pre).to_pandas()
    b = repair_area_parent_names(pre, broadcast_max_names=0).to_pandas()
    key = ["table", "id"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)[list(a.columns)]
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


def test_kg_resumable_tolerates_orphan_dirs(ray_session, pages_dir, tmp_path):
    """Non-numeric shard= artifacts (temp dirs) must be skipped, not fatal;
    higher-numbered stale shards are cleaned."""
    import os

    from ocds_entity_extract_ray.pipelines.kg_resumable import run_kg_resumable

    out = str(tmp_path / "kgr")
    clist = build_classifier_list_from_text([classifier_csv()])
    pidx = product_index()
    os.makedirs(os.path.join(out, "mentions", "shard=tmp"))
    os.makedirs(os.path.join(out, "mentions", "shard=99"))
    rep = run_kg_resumable(pages_dir, out, clist, pidx, num_shards=2, num_buckets=8)
    assert rep["entities"] > 0 and rep["triples"] > 0
    assert os.path.isdir(os.path.join(out, "mentions", "shard=tmp"))  # skipped
    assert not os.path.isdir(os.path.join(out, "mentions", "shard=99"))  # cleaned


def test_text_extraction_byte_identity(ray_session, pages_dir):
    """Per-row invariant (input_hint): the distributed text stage output is
    byte-identical to the single-doc reference extractor, per url."""
    from ocds_entity_extract_ray.sources.readers import read_pages
    from ocds_entity_extract_ray.stages.extract_text import extract_text

    ds = extract_text(read_pages(pages_dir, columns=["url", "html"]))
    got = {r["url"]: (r["text"], r["text_sha256"]) for r in ds.take_all()}
    assert len(got) == N

    src = pads.dataset(pages_dir, format="parquet").to_table(columns=["url", "html"]).to_pylist()
    for row in src:
        expected = extract_text_one(row["html"])
        text, sha = got[row["url"]]
        assert text == expected  # byte-identical
        assert sha == text_sha256(expected)


def test_head_key_skew(ray_session, tmp_path):
    """Extreme head-entity skew: ONE institution sighted in every record of
    a 2000-doc corpus. The map-side partial combine bounds that key's
    shuffle rows to <= #blocks, so the hot key cannot melt a reducer; the
    counters still sum exactly (validated against the sequential oracle)."""
    import pyarrow as pa

    from ocds_entity_extract_ray.pipelines.kg import build_entities
    from ocds_entity_extract_ray.sources.synth import PAGES_SCHEMA, make_record, render_page
    from ocds_entity_extract_ray.oracle.reference_extractor import run_reference
    from ocds_entity_extract_ray.extraction.triples import oracle_entities_by_table

    n = 800
    records = []
    for i in range(n):
        rec = make_record(i)
        # force every record's buyer to the same hot institution id/name
        buyer = rec["compiledRelease"]["parties"][0]
        buyer["id"], buyer["name"] = "inst-hot", "Secretaría Caliente"
        for rel in rec["releases"]:
            rel["parties"][0]["id"], rel["parties"][0]["name"] = "inst-hot", "Secretaría Caliente"
        records.append(rec)

    rows = [render_page(i, rec) for i, rec in enumerate(records)]
    pages_dir = str(tmp_path / "hot")
    pa.parquet.write_table(pa.Table.from_pylist(rows, schema=PAGES_SCHEMA), pages_dir + ".parquet")

    import ray.data

    pages = ray.data.read_parquet(pages_dir + ".parquet", override_num_blocks=16)
    df = build_entities(pages, None, {}, num_buckets=8, batch_size=64).to_pandas()
    hot = json.loads(df[(df["table"] == "orgs") & (df["id"] == "inst-hot")]["doc"].iloc[0])

    oracle = oracle_entities_by_table(
        run_reference(sorted(records, key=lambda r: r["ocid"]), None, {})
    )
    o_hot = next(d for d in oracle["orgs"] if d["id"] == "inst-hot")
    for f in ("contract_count", "purchase_count"):
        assert hot[f] == o_hot[f]
    for f in ("contract_amount", "purchase_amount"):
        for slot in hot[f]:
            assert abs(hot[f][slot] - o_hot[f][slot]) <= max(1e-6 * abs(o_hot[f][slot]), 1e-6)


def test_malformed_pages_are_skipped(ray_session, tmp_path):
    """Garbage html, truncated JSON-LD, empty payloads: the pipeline skips
    them and processes the valid remainder (no task failure, counts right)."""
    import pyarrow as pa

    from ocds_entity_extract_ray.pipelines.kg import build_entities
    from ocds_entity_extract_ray.sources.synth import PAGES_SCHEMA, make_record, render_page

    rows = [render_page(i, make_record(i)) for i in range(50)]
    rows.append({"url": "https://bad.example/1", "warc_ts": rows[0]["warc_ts"],
                 "html": b"\xff\xfe\x00garbage not html", "text": "", "lang": "xx"})
    rows.append({"url": "https://bad.example/2", "warc_ts": rows[0]["warc_ts"],
                 "html": b'<script type="application/ld+json">{"truncated": </script>', "text": "", "lang": "xx"})
    rows.append({"url": "https://bad.example/3", "warc_ts": rows[0]["warc_ts"],
                 "html": b"", "text": "", "lang": "xx"})
    path = str(tmp_path / "mixed.parquet")
    pa.parquet.write_table(pa.Table.from_pylist(rows, schema=PAGES_SCHEMA), path)

    import ray.data

    df = build_entities(
        ray.data.read_parquet(path, override_num_blocks=4), None, {}, num_buckets=8
    ).to_pandas()
    assert len(df) > 0
    # same entities as the clean 50-page corpus alone
    clean = str(tmp_path / "clean.parquet")
    pa.parquet.write_table(
        pa.Table.from_pylist(rows[:50], schema=PAGES_SCHEMA), clean
    )
    df_clean = build_entities(
        ray.data.read_parquet(clean, override_num_blocks=4), None, {}, num_buckets=8
    ).to_pandas()
    assert set(zip(df["table"], df["id"])) == set(zip(df_clean["table"], df_clean["id"]))


def test_kg_degree_hist_matches_oracle_rollup(ray_session):
    """kg_degree_hist (per-predicate triple count + GLOBAL-distinct subject
    count, q16-shape dedup) equals the rollup of the sequential oracle's
    triple set."""
    import sys

    import pandas as pd

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    out = e.queries()["kg_degree_hist"]("/root/testdata/sf0.001")
    n = 200
    recs = [make_record(i) for i in range(n)]
    clist = build_classifier_list_from_text([classifier_csv()])
    tri = triples_from_entities(
        oracle_entities_by_table(
            run_reference(sorted(recs, key=lambda r: r["ocid"]), clist, product_index())
        )
    )
    df = pd.DataFrame(list(tri), columns=["subj", "pred", "obj", "props"])
    want = (
        df.groupby("pred")
        .agg(n_triples=("subj", "size"), n_subjects=("subj", "nunique"))
        .reset_index()
        .sort_values("pred")
        .reset_index(drop=True)
        .astype({"n_triples": "int64", "n_subjects": "int64"})
    )
    pd.testing.assert_frame_equal(out.reset_index(drop=True), want)


def test_kg_entity_pagerank_deterministic(ray_session):
    """Entity-importance PageRank over the KG membership graph: stable
    across runs (integer arithmetic), hub entities (countries) rank top."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    q = e.queries()["kg_entity_pagerank"]
    a = q("/root/testdata/sf0.001")
    b = q("/root/testdata/sf0.001")
    assert a.equals(b) and len(a) > 0
    assert list(a.columns) == ["entity", "rank"]
    assert a["rank"].is_monotonic_decreasing or len(a) == 1
    assert a.iloc[0]["entity"] == "mx"  # the dominant membership hub


def test_incremental_equals_full_rebuild(ray_session, pages_dir, tmp_path):
    """init(A) + update(B) + export == full pipeline over A∪B, byte-exact:
    the A1-A7 accumulators are associative/commutative with deterministic
    tie-breaks, so merging persisted state with a delta reproduces the
    from-scratch result. Also checks the update touched only the delta's
    buckets (the O(delta), not O(corpus), claim)."""
    import os
    import shutil

    from ocds_entity_extract_ray.pipelines.kg import run_kg
    from ocds_entity_extract_ray.pipelines.kg_incremental import (
        kg_export,
        kg_init,
        kg_update,
    )

    clist = build_classifier_list_from_text([classifier_csv()])
    pidx = product_index()

    # split the deterministic corpus into two shard-aligned page dirs
    files = sorted(
        f for f in os.listdir(pages_dir) if f.endswith(".parquet")
    )
    assert len(files) >= 4
    a_dir, b_dir = str(tmp_path / "pages_a"), str(tmp_path / "pages_b")
    os.makedirs(a_dir), os.makedirs(b_dir)
    for i, f in enumerate(files):
        shutil.copy(os.path.join(pages_dir, f), (a_dir if i % 3 else b_dir))

    store = str(tmp_path / "store")
    init_rep = kg_init(a_dir, store, clist, pidx, num_buckets=8)
    assert init_rep["entities"] > 0
    upd_rep = kg_update(b_dir, store, clist, pidx)
    assert upd_rep["touched_buckets"]
    assert set(upd_rep["touched_buckets"]) <= set(range(8))
    inc_out = str(tmp_path / "inc_out")
    kg_export(store, inc_out)

    full_out = str(tmp_path / "full_out")
    run_kg(pages_dir, full_out, clist, pidx, num_buckets=8)

    def entity_set(out):
        rows = (
            pads.dataset(out + "/entities", format="parquet", partitioning="hive")
            .to_table()
            .to_pylist()
        )
        return {(r["_id"], r["doc"]) for r in rows}

    def triple_set(out):
        rows = (
            pads.dataset(out + "/triples", format="parquet", partitioning="hive")
            .to_table()
            .to_pylist()
        )
        return {(r["subj"], r["pred"], r["obj"], r["props"]) for r in rows}

    assert entity_set(inc_out) == entity_set(full_out)
    assert triple_set(inc_out) == triple_set(full_out)


def test_incremental_update_is_idempotent(ray_session, pages_dir, tmp_path):
    """Re-applying the same delta leaves the store unchanged (crash-replay
    safety: a failed update is repaired by re-running it)."""
    import os
    import shutil

    from ocds_entity_extract_ray.pipelines.kg_incremental import kg_init, kg_update

    clist = build_classifier_list_from_text([classifier_csv()])
    pidx = product_index()
    files = sorted(f for f in os.listdir(pages_dir) if f.endswith(".parquet"))
    a_dir, b_dir = str(tmp_path / "pa"), str(tmp_path / "pb")
    os.makedirs(a_dir), os.makedirs(b_dir)
    for i, f in enumerate(files):
        shutil.copy(os.path.join(pages_dir, f), (a_dir if i % 2 else b_dir))

    store = str(tmp_path / "store2")
    kg_init(a_dir, store, clist, pidx, num_buckets=8)
    rep1 = kg_update(b_dir, store, clist, pidx)
    rows1 = (
        pads.dataset(store + "/states", format="parquet", partitioning="hive")
        .to_table()
        .sort_by([("key", "ascending")])
    )
    rep2 = kg_update(b_dir, store, clist, pidx)
    rows2 = (
        pads.dataset(store + "/states", format="parquet", partitioning="hive")
        .to_table()
        .sort_by([("key", "ascending")])
    )
    assert rep1["touched_buckets"] == rep2["touched_buckets"]
    assert rep2["already_applied"] is True
    assert rows1.column("key").to_pylist() == rows2.column("key").to_pylist()
    # VALUE equality, not just keys: a re-applied delta must not merge its
    # additive accumulators a second time (the journal detects it)
    assert rows1.column("state").to_pylist() == rows2.column("state").to_pylist()


def test_incremental_update_crash_recovery(ray_session, pages_dir, tmp_path, monkeypatch):
    """A crash after the journal's 'staged' entry but mid-partition-swap
    must be repaired by re-running the same update: the rerun resumes the
    swap from the staged partitions and the store ends up byte-identical
    to an uninterrupted update."""
    import os
    import shutil

    from ocds_entity_extract_ray.pipelines import kg_incremental as ki

    clist = build_classifier_list_from_text([classifier_csv()])
    pidx = product_index()
    files = sorted(f for f in os.listdir(pages_dir) if f.endswith(".parquet"))
    a_dir, b_dir = str(tmp_path / "ca"), str(tmp_path / "cb")
    os.makedirs(a_dir), os.makedirs(b_dir)
    for i, f in enumerate(files):
        shutil.copy(os.path.join(pages_dir, f), (a_dir if i % 2 else b_dir))

    def states_table(store):
        return (
            pads.dataset(store + "/states", format="parquet", partitioning="hive")
            .to_table()
            .sort_by([("key", "ascending")])
        )

    # reference: uninterrupted update
    ok_store = str(tmp_path / "store_ok")
    ki.kg_init(a_dir, ok_store, clist, pidx, num_buckets=8)
    ki.kg_update(b_dir, ok_store, clist, pidx)
    want = states_table(ok_store)

    # crashing update: swap only the first touched bucket, then die
    store = str(tmp_path / "store_crash")
    ki.kg_init(a_dir, store, clist, pidx, num_buckets=8)
    real_swap = ki._swap_staged

    def partial_swap(store_dir, delta_id, touched):
        real_swap(store_dir, delta_id, touched[:1])
        raise RuntimeError("simulated crash mid-swap")

    monkeypatch.setattr(ki, "_swap_staged", partial_swap)
    with pytest.raises(RuntimeError, match="simulated crash"):
        ki.kg_update(b_dir, store, clist, pidx)
    monkeypatch.setattr(ki, "_swap_staged", real_swap)

    rep = ki.kg_update(b_dir, store, clist, pidx)  # recovery rerun
    assert rep["already_applied"] is True
    got = states_table(store)
    assert got.column("key").to_pylist() == want.column("key").to_pylist()
    assert got.column("state").to_pylist() == want.column("state").to_pylist()


def test_kg_update_refuses_interleave_and_mutated_delta(
    ray_session, pages_dir, tmp_path, monkeypatch
):
    """Two loud refusals that keep the journal protocol exactly-once:
    (1) while one delta is stuck mid-swap (phase='staged'), staging a
    DIFFERENT delta raises — resuming the stuck swap later would
    otherwise clobber the interleaved delta's buckets with pre-crash
    partitions; (2) a delta directory whose content changed after being
    applied raises instead of re-merging (deltas are immutable once
    applied — a re-merge would double-count the additive accumulators)."""
    import os
    import shutil

    import pyarrow.parquet as _pq

    from ocds_entity_extract_ray.pipelines import kg_incremental as ki

    clist = build_classifier_list_from_text([classifier_csv()])
    pidx = product_index()
    files = sorted(f for f in os.listdir(pages_dir) if f.endswith(".parquet"))
    a_dir, b_dir, c_dir = (str(tmp_path / d) for d in ("ia", "ib", "ic"))
    for d in (a_dir, b_dir, c_dir):
        os.makedirs(d)
    for i, f in enumerate(files):
        shutil.copy(os.path.join(pages_dir, f), (a_dir, b_dir, c_dir)[i % 3])

    store = str(tmp_path / "store_guard")
    ki.kg_init(a_dir, store, clist, pidx, num_buckets=8)

    # crash delta B mid-swap (before any bucket moves)
    real_swap = ki._swap_staged
    monkeypatch.setattr(
        ki,
        "_swap_staged",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("simulated crash mid-swap")),
    )
    with pytest.raises(RuntimeError, match="simulated crash"):
        ki.kg_update(b_dir, store, clist, pidx)
    monkeypatch.setattr(ki, "_swap_staged", real_swap)

    # (1) a DIFFERENT delta must refuse while B is staged
    with pytest.raises(RuntimeError, match="mid-swap"):
        ki.kg_update(c_dir, store, clist, pidx)
    # re-running B completes its swap; then C applies cleanly
    assert ki.kg_update(b_dir, store, clist, pidx)["already_applied"] is True
    ki.kg_update(c_dir, store, clist, pidx)

    # (2) mutate applied delta dir C in place -> different content id
    victim = sorted(f for f in os.listdir(c_dir) if f.endswith(".parquet"))[0]
    t = _pq.read_table(os.path.join(c_dir, victim))
    _pq.write_table(t.slice(0, max(1, t.num_rows // 2)), os.path.join(c_dir, victim))
    with pytest.raises(RuntimeError, match="immutable"):
        ki.kg_update(c_dir, store, clist, pidx)
    # staging/retired scratch is cleaned up after recovery
    assert not os.path.exists(os.path.join(store, "_staging"))
    assert not os.path.exists(os.path.join(store, "_retired"))


def test_topk_rows_matches_pandas(ray_session):
    """topk_rows (per-block prune -> driver finalize) must equal a plain
    pandas sort/head under the same multi-key order, ties included."""
    import numpy as np
    import pandas as pd
    import ray

    from ocds_entity_extract_ray.ops.agg import topk_rows

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "score": rng.integers(0, 20, 500),  # dense ties
            "name": [f"e{i:03d}" for i in rng.permutation(500)],
        }
    )
    ds = ray.data.from_pandas(df).repartition(13)
    got = topk_rows(ds, 25, by=["score", "name"], ascending=[False, True])
    want = (
        df.sort_values(["score", "name"], ascending=[False, True], kind="mergesort")
        .head(25)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_kg_entity_pagerank_distributed_tail_parity(ray_session):
    """The distributed label tail (bucketed name dedup + hash join +
    top-k combiner) must reproduce the driver-side merge it replaced:
    recompute ranks/names with a plain pandas collect over the same
    corpus and compare frames exactly."""
    import pandas as pd
    import ray

    import __ray_entry__ as e
    from ocds_entity_extract_ray.extraction.triples import ROLE_PREDICATES
    from ocds_entity_extract_ray.ops.graph import pagerank
    from ocds_entity_extract_ray.pipelines.kg import build_entities
    from ocds_entity_extract_ray.sources.readers import read_pages
    from ocds_entity_extract_ray.stages.triples_stage import materialize_triples

    got = e._kg_entity_pagerank("/root/testdata/sf0.001")

    # brute force, driver-side (fine at 200 docs in a test)
    import hashlib

    pages_dir = e._corpus(200)
    clist, pidx = e._kg_inputs()
    triples = materialize_triples(
        build_entities(
            read_pages(pages_dir, columns=["url", "html"]), clist, pidx, num_buckets=64
        )
    ).to_pandas()
    preds = sorted(set(ROLE_PREDICATES.values()))
    m = triples[triples["pred"].isin(preds)]

    def _h(s):
        return (
            int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")
            >> 1
        )

    edges = pd.DataFrame(
        {"src": [_h(x) for x in m["subj"]], "dst": [_h(x) for x in m["obj"]]}
    ).astype("int64")
    ranks = pagerank(ray.data.from_pandas(edges), iters=10).to_pandas()
    ids = pd.concat([m["subj"], m["obj"]], ignore_index=True).drop_duplicates()
    names = pd.DataFrame(
        {"node": [_h(x) for x in ids], "entity": ids.to_numpy()}
    ).astype({"node": "int64"}).drop_duplicates("node")
    want = (
        ranks.merge(names, on="node")[["entity", "rank"]]
        .sort_values(["rank", "entity"], ascending=[False, True])
        .head(100)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_kg_two_hop_matches_bruteforce(ray_session):
    """The distributed two-hop pattern must equal the pandas self-join
    over the same materialized triple set."""
    import pandas as pd

    import __ray_entry__ as entry

    tri = entry._kg_triples("/root/testdata/sf0.001").to_pandas()
    got = entry._kg_two_hop("/root/testdata/sf0.001")

    h1 = tri[tri["pred"] == "contactPointOf"][["subj", "obj"]].rename(
        columns={"subj": "person", "obj": "org"}
    )
    h2 = tri[tri["pred"] == "memberOf"][["subj", "obj"]].rename(
        columns={"subj": "org", "obj": "parent"}
    )
    exp = (
        h1.merge(h2, on="org")
        .groupby("parent", as_index=False)
        .agg(n_contact_paths=("person", "count"))
        .astype({"n_contact_paths": "int64"})
        .sort_values("parent")
        .reset_index(drop=True)
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, exp)


def test_storage_root_env_redirects_scratch(ray_session, tmp_path, monkeypatch):
    """GRAFT_STORAGE_ROOT (VERDICT r04 #7) must redirect every entry-point
    scratch location — on a multi-node cluster the default /tmp root is
    node-local and wrong for anything another node reads. Run the
    incremental-store entry under a custom root and check (a) it works,
    (b) ALL of its artifacts (corpus, store, export) land under the root,
    (c) nothing new appears under the default root."""
    import os

    import __ray_entry__ as entry
    from ocds_entity_extract_ray.state.paths import storage_root

    root = str(tmp_path / "shared_fs")
    monkeypatch.setenv("GRAFT_STORAGE_ROOT", root)
    assert storage_root() == root

    default = "/tmp/ocds_ray_corpus"
    before = set(os.listdir(default)) if os.path.isdir(default) else set()

    out = entry._kg_incremental_triples("/root/testdata/sf0.001")
    assert out.count() > 0
    made = set(os.listdir(root))
    assert any(d.startswith("pages_fine_") for d in made)
    assert any(d.startswith("inc_") for d in made)

    after = set(os.listdir(default)) if os.path.isdir(default) else set()
    assert after == before, f"scratch leaked to the default root: {after - before}"


def test_kg_update_local_path_parity(ray_session, pages_dir, tmp_path):
    """The localized per-bucket-task merge (delta <= delta_broadcast_max_
    rows) must produce a store IDENTICAL in content to the distributed
    groupby path — the repo rule for every adaptive two-path op: force
    both branches on the same input and compare."""
    import os
    import shutil

    import pyarrow.dataset as pads

    from ocds_entity_extract_ray.pipelines.kg_incremental import kg_init, kg_update

    clist = build_classifier_list_from_text([classifier_csv()])
    pidx = product_index()

    files = sorted(f for f in os.listdir(pages_dir) if f.endswith(".parquet"))
    a_dir, b_dir = str(tmp_path / "pa"), str(tmp_path / "pb")
    os.makedirs(a_dir), os.makedirs(b_dir)
    for i, f in enumerate(files):
        shutil.copy(os.path.join(pages_dir, f), (a_dir if i % 3 else b_dir))

    def rows(store, sub):
        t = pads.dataset(store + "/" + sub, format="parquet", partitioning="hive").to_table()
        return sorted(map(tuple, t.to_pandas().astype(str).values.tolist()))

    stores = {}
    for name, bme in (("local", 10**9), ("groupby", 0)):
        store = str(tmp_path / f"store_{name}")
        kg_init(a_dir, store, clist, pidx, num_buckets=8)
        tm = {}
        kg_update(b_dir, store, clist, pidx, timings=tm, delta_broadcast_max_rows=bme)
        assert tm["path"] == name
        stores[name] = store

    for sub in ("states", "entities_raw"):
        assert rows(stores["local"], sub) == rows(stores["groupby"], sub), sub
