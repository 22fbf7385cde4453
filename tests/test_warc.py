"""WARC source/sink (sources/warc.py): round-trip parity with the
parquet pages source, strictness on malformed segments, and triple-set
byte-parity of the WARC-fed flagship pipeline."""

from __future__ import annotations

import datetime
import gzip
import io

import pytest

from ocds_entity_extract_ray.sources.warc import (
    WARC_SCHEMA,
    _response_record,
    _StreamParser,
    _warcinfo_record,
    read_warc,
    write_warc,
)

N = 300


@pytest.fixture(scope="module")
def pages_dir(ray_session, tmp_path_factory):
    from ocds_entity_extract_ray.sources.readers import generate_pages

    out = str(tmp_path_factory.mktemp("warc_pages"))
    generate_pages(out, N, shard_rows=50)
    return out


@pytest.mark.parametrize("gz", [False, True])
def test_warc_round_trip(ray_session, pages_dir, tmp_path, gz):
    from ocds_entity_extract_ray.sources.readers import read_pages

    out = str(tmp_path / f"warc_{int(gz)}")
    write_warc(pages_dir, out, gzip_members=gz)
    got = read_warc(out).to_pandas().sort_values("url").reset_index(drop=True)
    want = (
        read_pages(pages_dir, columns=["url", "warc_ts", "html"])
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert got.equals(want)  # values AND dtypes


def test_warc_writer_deterministic_bytes(ray_session, pages_dir, tmp_path):
    import hashlib
    import os

    def digests(d):
        return [
            hashlib.sha256(open(os.path.join(d, f), "rb").read()).hexdigest()
            for f in sorted(os.listdir(d))
            if not f.startswith("_")
        ]

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_warc(pages_dir, a, gzip_members=True)
    write_warc(pages_dir, b, gzip_members=True)
    assert digests(a) == digests(b)


def _parse_bytes(raw: bytes):
    return list(_StreamParser(io.BytesIO(raw), "<test>").records())


def test_parser_skips_non_response_records():
    ts = datetime.datetime(2021, 3, 4, 5, 6, 7)
    raw = (
        _warcinfo_record("x.warc")
        + _response_record("https://a.example/1", ts, b"<html>a</html>")
        # a request record (what a real crawl interleaves with responses)
        + _warcinfo_record("y.warc").replace(
            b"WARC-Type: warcinfo", b"WARC-Type: request"
        )
        + _response_record("https://a.example/2", ts, b"<html>b</html>")
    )
    recs = _parse_bytes(raw)
    assert [r[0] for r in recs] == ["https://a.example/1", "https://a.example/2"]
    assert recs[0][1] == ts
    assert recs[0][2] == b"<html>a</html>"


def test_parser_fractional_seconds_round_trip():
    ts = datetime.datetime(2021, 3, 4, 5, 6, 7, 123456)
    recs = _parse_bytes(_response_record("https://a.example/µ", ts, b"x"))
    assert recs == [("https://a.example/µ", ts, b"x")]


def test_parser_raises_on_truncation_and_bad_version():
    ts = datetime.datetime(2021, 1, 1)
    full = _response_record("https://a.example/1", ts, b"<html>abc</html>")
    with pytest.raises(ValueError, match="truncated record payload"):
        _parse_bytes(full[:-10])
    with pytest.raises(ValueError, match="truncated record header"):
        _parse_bytes(full[:20])
    with pytest.raises(ValueError, match="bad version line"):
        _parse_bytes(b"HTTP/1.1 200 OK\r\n\r\n" + full)
    # missing Content-Length
    broken = full.replace(b"Content-Length: ", b"X-Length: ", 1)
    with pytest.raises(ValueError, match="Content-Length"):
        _parse_bytes(broken)


def test_empty_warc_yields_typed_empty_block(ray_session, tmp_path):
    # a segment holding only a warcinfo record (no responses) must still
    # produce a TYPED empty block — schema-less blocks crash joins
    p = tmp_path / "empty.warc"
    p.write_bytes(_warcinfo_record("empty.warc"))
    ds = read_warc(str(p))
    assert ds.count() == 0
    assert ds.schema().names == [f.name for f in WARC_SCHEMA]


def test_gzip_members_are_individually_addressable(ray_session, pages_dir, tmp_path):
    """The CC convention the gz layout exists for: each record must be its
    own gzip member, decodable in isolation from its byte offset."""
    import os

    out = str(tmp_path / "gz")
    write_warc(pages_dir, out, gzip_members=True)
    f = sorted(x for x in os.listdir(out) if x.endswith(".warc.gz"))[0]
    raw = open(os.path.join(out, f), "rb").read()
    # second member starts at the end of the first: find the next magic
    second = raw.index(b"\x1f\x8b", 2)
    rec = gzip.decompress(raw[second:])  # gzip.decompress reads ALL members
    assert rec.startswith(b"WARC/1.0\r\n")
    one = _parse_bytes(gzip.decompress(raw[: second]))
    assert one == []  # first member is the warcinfo record


def test_kg_triples_parity_warc_vs_parquet(ray_session, pages_dir, tmp_path):
    """The WARC-fed flagship pipeline emits the IDENTICAL triple set."""
    from ocds_entity_extract_ray.functions.classify import (
        build_classifier_list_from_text,
    )
    from ocds_entity_extract_ray.pipelines.kg import build_entities
    from ocds_entity_extract_ray.sources.readers import read_pages
    from ocds_entity_extract_ray.sources.synth import classifier_csv, product_index
    from ocds_entity_extract_ray.stages.triples_stage import materialize_triples

    clist = build_classifier_list_from_text([classifier_csv()])
    pidx = product_index()

    def triples(pages):
        ents = build_entities(pages, clist, pidx, num_buckets=8)
        df = materialize_triples(ents).to_pandas()
        return sorted(map(tuple, df[sorted(df.columns)].itertuples(index=False)))

    warc_dir = write_warc(pages_dir, str(tmp_path / "warc"), gzip_members=True)
    via_parquet = triples(read_pages(pages_dir, columns=["url", "html"]))
    via_warc = triples(read_warc(warc_dir).drop_columns(["warc_ts"]))
    assert via_warc == via_parquet
    assert len(via_warc) > 0


def test_read_warc_ignores_cdx_sidecars(ray_session, pages_dir, tmp_path):
    """The exact Common Crawl layout: .cdx.gz offset indexes sit beside
    segments — the extension filter must skip them, not parse them."""
    import gzip as _gzip
    import os

    out = str(tmp_path / "warc")
    write_warc(pages_dir, out, gzip_members=True)
    with open(os.path.join(out, "index.cdx.gz"), "wb") as fh:
        fh.write(_gzip.compress(b"cdx offsets, definitely not WARC\n"))
    assert read_warc(out).count() == N


def test_write_warc_config_change_clears_stale_segments(
    ray_session, pages_dir, tmp_path
):
    """Re-writing the same out_dir with a different layout must not leave
    the old segments beside the new ones (double-read corpus)."""
    import os

    out = str(tmp_path / "warc")
    write_warc(pages_dir, out, gzip_members=False)
    write_warc(pages_dir, out, gzip_members=True)
    exts = {f.rsplit(".", 1)[-1] for f in os.listdir(out) if not f.startswith("_")}
    assert exts == {"gz"}
    assert read_warc(out).count() == N


def test_parser_caps_hostile_lengths():
    # declared Content-Length beyond the record cap raises promptly
    ts = datetime.datetime(2021, 1, 1)
    rec = _response_record("https://a.example/1", ts, b"x")
    huge = rec.replace(b"Content-Length: 95", b"Content-Length: 1099511627776", 1)
    # (the replace targets the WARC header; fall back if sizes differ)
    if huge == rec:
        huge = rec.replace(
            b"Content-Length: ", b"Content-Length: 1099511627776 #", 1
        )
    with pytest.raises(ValueError):
        _parse_bytes(huge)
    # a stream with no CRLFCRLF within the header cap raises, not buffers
    with pytest.raises(ValueError, match="no record-header terminator"):
        _parse_bytes(b"WARC/1.0\r\n" + b"A" * (2 << 20))


def test_wet_round_trips_the_byte_identity_invariant(
    ray_session, pages_dir, tmp_path
):
    """WET = the engine's extracted-text surface in CC's own format: the
    text read back from WET segments must equal extract_text's output
    per url, byte for byte."""
    from ocds_entity_extract_ray.sources.readers import read_pages
    from ocds_entity_extract_ray.sources.warc import read_wet, write_wet
    from ocds_entity_extract_ray.stages.extract_text import extract_text

    out = str(tmp_path / "wet")
    write_wet(pages_dir, out, gzip_members=True)
    got = read_wet(out).to_pandas().sort_values("url").reset_index(drop=True)
    want = (
        extract_text(read_pages(pages_dir, columns=["url", "warc_ts", "html"]))
        .to_pandas()[["url", "warc_ts", "text"]]
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert len(got) == N
    assert got["url"].tolist() == want["url"].tolist()
    assert got["text"].tolist() == want["text"].tolist()
    assert got["warc_ts"].tolist() == want["warc_ts"].tolist()


def test_wet_reader_skips_warc_and_vice_versa(ray_session, pages_dir, tmp_path):
    """Mixed directory (the CC layout keeps warc/ and wet/ apart, but a
    flat copy must not cross-read): extensions route each reader to its
    own segments."""
    from ocds_entity_extract_ray.sources.warc import read_wet, write_wet

    out = str(tmp_path / "mixed")
    write_warc(pages_dir, out, gzip_members=True)
    # write WET into the same dir with a marker-safe second call: use a
    # subdir then move files up (the sinks own their dir exclusively)
    import os
    import shutil

    wet = str(tmp_path / "wet")
    write_wet(pages_dir, wet, gzip_members=True)
    for f in os.listdir(wet):
        if f.endswith(".wet.gz"):
            shutil.copy(os.path.join(wet, f), os.path.join(out, f))
    assert read_warc(out).count() == N
    assert read_wet(out).count() == N
