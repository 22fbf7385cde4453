"""NDJSON sink (K2 parity), the OCDS-records source path (S1 struct/JSON
materialization), and the as-of join operator."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest
import ray.data

from ocds_entity_extract_ray.functions.classify import build_classifier_list_from_text
from ocds_entity_extract_ray.sources.synth import classifier_csv, product_index

N = 200


@pytest.fixture(scope="module")
def corpora(ray_session, tmp_path_factory):
    from ocds_entity_extract_ray.sources.readers import generate_pages, generate_records

    pages = str(tmp_path_factory.mktemp("pages"))
    records = str(tmp_path_factory.mktemp("records"))
    generate_pages(pages, N, shard_rows=50)
    generate_records(records, N, shard_rows=50)
    return pages, records


def test_records_path_equals_pages_path(corpora):
    """The same corpus through both sources (web pages with JSON-LD vs
    struct/JSON records) canonicalizes to the identical entity set."""
    from ocds_entity_extract_ray.pipelines.kg import build_entities
    from ocds_entity_extract_ray.sources.readers import read_pages, read_records

    pages_dir, records_dir = corpora
    clist = build_classifier_list_from_text([classifier_csv()])
    pidx = product_index()

    from_pages = build_entities(
        read_pages(pages_dir, columns=["url", "html"]), clist, pidx, num_buckets=8
    ).to_pandas()
    from_records = build_entities(
        read_records(records_dir), clist, pidx, num_buckets=8
    ).to_pandas()

    a = set(zip(from_pages["table"], from_pages["id"]))
    b = set(zip(from_records["table"], from_records["id"]))
    assert a == b
    # doc payloads identical too after float normalization (summation order
    # differs between runs; order keys url vs ocid sort identically because
    # the url embeds the ocid)
    from .conftest import normalize_numbers

    da = {(t, i): d for t, i, d in zip(from_pages["table"], from_pages["id"], from_pages["doc"])}
    db = {(t, i): d for t, i, d in zip(from_records["table"], from_records["id"], from_records["doc"])}
    for k in da:
        xa = normalize_numbers({f: v for f, v in json.loads(da[k]).items() if f != "_id"})
        xb = normalize_numbers({f: v for f, v in json.loads(db[k]).items() if f != "_id"})
        assert xa == xb, k


def test_ndjson_sink(corpora, tmp_path):
    from ocds_entity_extract_ray.pipelines.kg import build_entities
    from ocds_entity_extract_ray.sources.readers import read_pages
    from ocds_entity_extract_ray.stages.sinks import (
        TABLE_ORDER,
        entities_table_counts,
        write_ndjson_tables,
    )

    pages_dir, _ = corpora
    clist = build_classifier_list_from_text([classifier_csv()])
    entities = build_entities(
        read_pages(pages_dir, columns=["url", "html"]), clist, product_index(), num_buckets=8
    )
    out = str(tmp_path / "ndjson")
    counts = write_ndjson_tables(entities, out)
    assert set(counts) == set(TABLE_ORDER)
    assert sum(counts.values()) > 0
    # files exist in the reference's table order; rows are valid JSON with _id
    for t in TABLE_ORDER:
        path = os.path.join(out, f"{t}.ndjson")
        assert os.path.exists(path)
        with open(path) as fh:
            lines = fh.readlines()
        assert len(lines) == counts[t]
        if lines:
            doc = json.loads(lines[0])
            assert "_id" in doc and "id" in doc
    # counts helper agrees with the sink
    entities2 = build_entities(
        read_pages(pages_dir, columns=["url", "html"]), clist, product_index(), num_buckets=8
    )
    assert entities_table_counts(entities2) == {t: n for t, n in counts.items()}

    # deterministic: a second independent build+write produces byte-identical
    # files (render canonicalizes float precision, so _id is stable under
    # any merge order)
    out2 = str(tmp_path / "ndjson2")
    write_ndjson_tables(entities2, out2)
    for t in TABLE_ORDER:
        assert open(os.path.join(out, f"{t}.ndjson")).read() == open(
            os.path.join(out2, f"{t}.ndjson")
        ).read()


def test_asof_join_matches_pandas(ray_session):
    from ocds_entity_extract_ray.ops.asof import asof_join

    left = pd.DataFrame(
        {
            "k": [1, 1, 2, 2, 3],
            "ts": pd.to_datetime(["2024-01-02", "2024-01-05", "2024-01-03", "2024-01-01", "2024-01-04"]),
            "lv": [10, 11, 20, 21, 30],
        }
    )
    right = pd.DataFrame(
        {
            "k": [1, 1, 2, 9],
            "ts": pd.to_datetime(["2024-01-01", "2024-01-04", "2024-01-02", "2024-01-01"]),
            "rv": [100, 101, 200, 900],
        }
    )
    got = (
        asof_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            key_col="k",
            ts_col="ts",
            left_cols=["lv"],
            right_cols=["rv"],
            num_buckets=4,
        )
        .to_pandas()
        .sort_values("lv")
        .reset_index(drop=True)
    )
    expect = pd.merge_asof(
        left.sort_values("ts"), right.sort_values("ts"), on="ts", by="k", direction="backward"
    ).sort_values("lv").reset_index(drop=True)
    expect = expect.rename(columns={"rv": "rv_right"})
    pd.testing.assert_frame_equal(
        got[["k", "ts", "lv", "rv_right"]].astype({"rv_right": "float64"}),
        expect[["k", "ts", "lv", "rv_right"]].astype({"rv_right": "float64"}),
        check_dtype=False,
    )


def test_resumable_sharded_kg(corpora, tmp_path):
    """Shard-granular resume: first run computes all shards; a rerun skips
    every shard; deleting ONE shard manifest recomputes only that shard —
    with identical final triples each time."""
    import pyarrow.dataset as pads

    from ocds_entity_extract_ray.pipelines.kg_resumable import run_kg_resumable

    pages_dir, _ = corpora
    clist = build_classifier_list_from_text([classifier_csv()])
    out = str(tmp_path / "kg_shard")
    r1 = run_kg_resumable(pages_dir, out, clist, product_index(), num_shards=4, num_buckets=8)
    assert r1["shards_computed"] == 4 and r1["shards_resumed"] == 0

    r2 = run_kg_resumable(pages_dir, out, clist, product_index(), num_shards=4, num_buckets=8)
    assert r2["shards_computed"] == 0 and r2["shards_resumed"] == 4
    assert (r1["entities"], r1["triples"]) == (r2["entities"], r2["triples"])

    os.remove(os.path.join(out, "mentions", "shard=2", "_MANIFEST.json"))
    r3 = run_kg_resumable(pages_dir, out, clist, product_index(), num_shards=4, num_buckets=8)
    assert r3["shards_computed"] == 1 and r3["shards_resumed"] == 3
    assert (r3["entities"], r3["triples"]) == (r1["entities"], r1["triples"])

    tri = pads.dataset(out + "/triples", format="parquet", partitioning="hive").to_table()
    assert tri.num_rows == r1["triples"]


def test_struct_records_path(ray_session, tmp_path):
    """FIXTURES F2: the struct-typed nested-Arrow materialization flows
    through the same pipeline and produces the identical entity set (nested
    columns stay Arrow to the stage; strip_nones restores absent-vs-null)."""
    from ocds_entity_extract_ray.pipelines.kg import build_entities
    from ocds_entity_extract_ray.sources.readers import (
        generate_records,
        generate_records_struct,
        read_records,
        read_records_struct,
    )

    sdir = str(tmp_path / "struct")
    jdir = str(tmp_path / "json")
    generate_records_struct(sdir, N, shard_rows=50)
    generate_records(jdir, N, shard_rows=50)

    clist = build_classifier_list_from_text([classifier_csv()])
    pidx = product_index()
    from_struct = build_entities(read_records_struct(sdir), clist, pidx, num_buckets=8).to_pandas()
    from_json = build_entities(read_records(jdir), clist, pidx, num_buckets=8).to_pandas()

    assert set(zip(from_struct["table"], from_struct["id"])) == set(
        zip(from_json["table"], from_json["id"])
    )
    # byte-identical docs: strip_nones makes the Arrow round trip lossless
    ds_ = {(t, i): d for t, i, d in zip(from_struct["table"], from_struct["id"], from_struct["doc"])}
    dj = {(t, i): d for t, i, d in zip(from_json["table"], from_json["id"], from_json["doc"])}
    from .conftest import normalize_numbers

    for k in ds_:
        xa = normalize_numbers({f: v for f, v in json.loads(ds_[k]).items() if f != "_id"})
        xb = normalize_numbers({f: v for f, v in json.loads(dj[k]).items() if f != "_id"})
        assert xa == xb, k
