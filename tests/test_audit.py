"""Reject/dead-letter audit channel (stages/audit.py) + the mention-stage
hardening that shares its parser."""

from __future__ import annotations

import pandas as pd
import pytest
import ray.data

from ocds_entity_extract_ray.stages.audit import page_audit, reject_summary
from ocds_entity_extract_ray.stages.mentions import MentionExtractor, iter_page_events


def _pages_ds(rows):
    import pyarrow as pa

    return ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array([r[0] for r in rows], pa.string()),
                "html": pa.array([r[1] for r in rows], pa.binary()),
            }
        )
    )


GOOD = (
    b'<html><script type="application/ld+json">'
    b'{"ocid": "x-1", "compiledRelease": {"parties": []}}</script></html>'
)
TWO_BLOCKS = (
    b'<script type="application/ld+json">{"a": 1}</script>'
    b'<script type="application/ld+json">[{"b": 2}, {"c": 3}]</script>'
)
TRUNCATED = b'<script type="application/ld+json">{"cut": </script>'
NON_OBJECT = b'<script type="application/ld+json">[1, "no"]</script>'
GARBAGE = b"\xff\xfe\x00garbage"


def test_page_audit_statuses(ray_session):
    ds = _pages_ds(
        [
            ("u/good", GOOD),
            ("u/two", TWO_BLOCKS),
            ("u/trunc", TRUNCATED),
            ("u/nonobj", NON_OBJECT),
            ("u/garbage", GARBAGE),
            # mixed: one parsed record AND one bad block -> bad_json wins
            ("u/mixed", GOOD + TRUNCATED),
        ]
    )
    out = page_audit(ds).to_pandas().set_index("url")
    assert out.loc["u/good", "status"] == "ok"
    assert out.loc["u/good", "n_records"] == 1
    assert out.loc["u/two", "status"] == "ok"
    assert out.loc["u/two", "n_records"] == 3  # object + two array members
    assert out.loc["u/trunc", "status"] == "bad_json"
    assert out.loc["u/nonobj", "status"] == "non_object"
    assert out.loc["u/nonobj", "n_non_object"] == 2
    assert out.loc["u/garbage", "status"] == "no_jsonld"
    assert out.loc["u/mixed", "status"] == "bad_json"
    assert out.loc["u/mixed", "n_records"] == 1

    roll = reject_summary(page_audit(ds))
    got = dict(zip(roll["status"], roll["n_pages"]))
    assert got == {"ok": 2, "bad_json": 2, "non_object": 1, "no_jsonld": 1}
    # every status row present even when zero
    assert list(roll.columns) == ["status", "n_pages", "n_records"]


def test_audit_and_mention_stage_share_one_parser():
    """A page's audited n_records must equal the number of record events
    the mention stage consumes — both read iter_page_events."""
    for html in (GOOD, TWO_BLOCKS, TRUNCATED, NON_OBJECT, GARBAGE, GOOD + TRUNCATED):
        events = list(iter_page_events("u", html))
        n_rec = sum(1 for k, _o, _r in events if k == "record")
        # order keys unique and url-prefixed
        oks = [o for k, o, _r in events if k == "record"]
        assert len(set(oks)) == len(oks)
        assert all(o == "u" or o.startswith("u#") for o in oks)
        if html is GARBAGE:
            assert n_rec == 0 and events == []


def test_malformed_record_json_is_skipped(ray_session):
    """records-source hardening: a corrupt record_json blob (or a
    non-object one) must be skipped, not kill the stage."""
    import pyarrow as pa

    import json

    from ocds_entity_extract_ray.sources.synth import make_record

    valid = json.dumps(make_record(3))
    batch = pa.table(
        {
            "ocid": pa.array(["a", "b", "c"], pa.string()),
            "record_json": pa.array([valid, '{"cut": ', "[1, 2]"], pa.string()),
        }
    )
    out = MentionExtractor(None, {})(batch)  # must not raise
    # exactly the valid record's states survive: same as feeding it alone
    alone = MentionExtractor(None, {})(batch.slice(0, 1))
    assert sorted(out["key"].to_pylist()) == sorted(alone["key"].to_pylist())
    assert len(out) > 0


def test_kg_reject_audit_query(ray_session):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    out = e.queries()["kg_reject_audit"]("/root/testdata/sf0.001")
    assert isinstance(out, pd.DataFrame)
    assert set(out["status"]) == {"ok", "bad_json", "non_object", "no_jsonld"}
    ok = out.set_index("status")
    assert ok.loc["ok", "n_pages"] == 200
    assert (ok.loc[["bad_json", "non_object", "no_jsonld"], "n_records"] == 0).all()


def test_record_audit_matches_mention_skips(ray_session):
    """records-source reject channel: statuses come from the SAME
    classifier the mention stage skips with."""
    import json

    import pyarrow as pa

    from ocds_entity_extract_ray.sources.synth import make_record
    from ocds_entity_extract_ray.stages.audit import record_audit

    ds = ray.data.from_arrow(
        pa.table(
            {
                "ocid": pa.array(["a", "b", "c"], pa.string()),
                "record_json": pa.array(
                    [json.dumps(make_record(1)), '{"cut": ', "[1, 2]"], pa.string()
                ),
            }
        )
    )
    out = record_audit(ds).to_pandas().set_index("url")
    assert out.loc["a", "status"] == "ok" and out.loc["a", "n_records"] == 1
    assert out.loc["b", "status"] == "bad_json"
    assert out.loc["c", "status"] == "non_object"
    roll = reject_summary(record_audit(ds))
    assert dict(zip(roll["status"], roll["n_pages"]))["no_jsonld"] == 0


def test_run_kg_audit_output(ray_session, tmp_path):
    """run_kg(audit=True): rollup in the report, non-ok rows on disk."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocds_entity_extract_ray.pipelines.kg import run_kg
    from ocds_entity_extract_ray.sources.synth import (
        PAGES_SCHEMA,
        make_record,
        render_page,
    )

    rows = [render_page(i, make_record(i)) for i in range(30)]
    rows.append(
        {
            "url": "https://bad.example/1",
            "warc_ts": rows[0]["warc_ts"],
            "html": b'<script type="application/ld+json">{"cut": </script>',
            "text": "",
            "lang": "xx",
        }
    )
    src = str(tmp_path / "pages")
    os.makedirs(src)
    pq.write_table(
        pa.Table.from_pylist(rows, schema=PAGES_SCHEMA),
        os.path.join(src, "p.parquet"),
    )
    out = str(tmp_path / "kg")
    report = run_kg(src, out, None, {}, num_buckets=8, resume=False, audit=True)
    assert report["audit"]["ok"]["n_pages"] == 30
    assert report["audit"]["bad_json"]["n_pages"] == 1
    audit_rows = pq.read_table(os.path.join(out, "audit")).to_pylist()
    assert [r["url"] for r in audit_rows] == ["https://bad.example/1"]
