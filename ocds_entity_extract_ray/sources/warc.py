"""WARC container source + sink (ISO 28500, the Common Crawl wire format).

The reference reads its corpus from a database cursor (index.js:81-96);
a web-scale crawl pipeline reads WARC segments. This module closes that
source-format gap natively in Ray Data:

- ``write_warc``: pages parquet -> one ``.warc`` / ``.warc.gz`` per input
  shard, written by parallel Ray tasks. ``gzip_members=True`` compresses
  each record as its OWN gzip member (the Common Crawl convention that
  makes record-level random access possible from a cdx offset index).
- ``WARCDatasource`` / ``read_warc``: a ``FileBasedDatasource`` whose
  ``_read_stream`` parses records INCREMENTALLY off the (possibly
  gzip-compressed) byte stream and yields fixed-size Arrow batches — a
  task's heap holds one batch plus the gzip window, never a whole 1 GiB
  segment. Concatenated gzip members decompress transparently through
  Arrow's multi-member stream (verified: pyarrow inflates across member
  boundaries), so the SAME parser serves both layouts.

100 TB shape: one WARC file per read task is exactly the Common Crawl
segment convention (~1 GiB gzipped each, ~80k files per crawl); Ray
schedules a task per file and the streaming executor pipelines parse
against the downstream mention stage. Splitting WITHIN a segment needs
the external cdx member-offset index and is out of scope — at CC's
segment sizing, file-granular parallelism saturates a 256-node cluster.

Strictness policy: a malformed record header, a bad version line, or a
TRUNCATED payload raises ValueError (a silently half-read segment would
poison dedup and quality stats downstream — same policy as the gzip
branch of ``ops/codecs.py:decode_text_payload``); unknown *record types*
(warcinfo, request, metadata, ...) are skipped, because every real crawl
interleaves them with responses.
"""

from __future__ import annotations

import datetime
import gzip
import hashlib
import io
import os
from collections.abc import Iterator

import pyarrow as pa

_CRLF = b"\r\n"
_SEP = b"\r\n\r\n"

WARC_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
    ]
)


# --- writing ------------------------------------------------------------------


def _warc_date(ts: datetime.datetime) -> str:
    """WARC-Date: second-granularity WARC/1.0 form, extended with the
    WARC/1.1 fractional part only when the timestamp carries one (keeps
    the round trip lossless without emitting noisy ``.000000`` tails)."""
    if ts.microsecond:
        return ts.strftime("%Y-%m-%dT%H:%M:%S.%f") + "Z"
    return ts.strftime("%Y-%m-%dT%H:%M:%SZ")


def _record_id(url: str, date: str) -> str:
    """Deterministic urn:uuid record id (sha1 of target+date, RFC 4122
    version-5 style) — reruns of the writer produce byte-identical files,
    which is what lets the incremental store fingerprint WARC deltas."""
    h = hashlib.sha1(f"{url}\n{date}".encode()).digest()[:16]
    b = bytearray(h)
    b[6] = (b[6] & 0x0F) | 0x50
    b[8] = (b[8] & 0x3F) | 0x80
    hx = bytes(b).hex()
    return f"<urn:uuid:{hx[:8]}-{hx[8:12]}-{hx[12:16]}-{hx[16:20]}-{hx[20:]}>"


def _response_record(url: str, ts: datetime.datetime, html: bytes) -> bytes:
    date = _warc_date(ts)
    http = (
        b"HTTP/1.1 200 OK" + _CRLF
        + b"Content-Type: text/html; charset=utf-8" + _CRLF
        + b"Content-Length: " + str(len(html)).encode() + _CRLF
        + _CRLF
        + html
    )
    headers = _CRLF.join(
        [
            b"WARC/1.0",
            b"WARC-Type: response",
            b"WARC-Record-ID: " + _record_id(url, date).encode(),
            b"WARC-Date: " + date.encode(),
            b"WARC-Target-URI: " + url.encode(),
            b"Content-Type: application/http; msgtype=response",
            b"Content-Length: " + str(len(http)).encode(),
        ]
    )
    return headers + _SEP + http + _SEP


def _conversion_record(url: str, ts: datetime.datetime, text: bytes) -> bytes:
    """A WET 'conversion' record: the extracted plain text of one page,
    no HTTP envelope (Common Crawl's *.warc.wet convention)."""
    date = _warc_date(ts)
    headers = _CRLF.join(
        [
            b"WARC/1.0",
            b"WARC-Type: conversion",
            b"WARC-Record-ID: " + _record_id("wet:" + url, date).encode(),
            b"WARC-Date: " + date.encode(),
            b"WARC-Target-URI: " + url.encode(),
            b"Content-Type: text/plain",
            b"Content-Length: " + str(len(text)).encode(),
        ]
    )
    return headers + _SEP + text + _SEP


def _warcinfo_record(filename: str) -> bytes:
    body = (
        b"software: ocds_entity_extract_ray" + _CRLF
        + b"format: WARC File Format 1.0" + _CRLF
    )
    headers = _CRLF.join(
        [
            b"WARC/1.0",
            b"WARC-Type: warcinfo",
            b"WARC-Record-ID: " + _record_id("warcinfo:" + filename, "").encode(),
            b"WARC-Date: 2021-01-01T00:00:00Z",
            b"WARC-Filename: " + filename.encode(),
            b"Content-Type: application/warc-fields",
            b"Content-Length: " + str(len(body)).encode(),
        ]
    )
    return headers + _SEP + body + _SEP


def _gzip_member(record: bytes) -> bytes:
    """One record -> one gzip member, mtime pinned to 0 so the writer is
    byte-deterministic across runs."""
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(record)
    return buf.getvalue()


def _write_segments(
    pages_path: str,
    out_dir: str,
    *,
    ext: str,
    tag: str,
    row_to_record,
    gzip_members: bool,
    overwrite: bool,
) -> str:
    """Shared segment writer for WARC and WET sinks: one output segment
    per input parquet shard, one Ray task per shard (the same
    file-granular parallelism the reader consumes). Record order is the
    shard's row order — fully deterministic."""
    import ray.data

    marker = os.path.join(out_dir, "_COMPLETE")
    if not overwrite and os.path.exists(marker):
        with open(marker) as fh:
            if fh.read().strip() == tag:
                return out_dir
    os.makedirs(out_dir, exist_ok=True)
    # rewriting with a different source/layout: clear prior segments (and
    # the stale marker) FIRST — leftovers from the old config would sit
    # beside the new files and the reader would silently yield every
    # record twice (or stale records from the previous corpus)
    for f in os.listdir(out_dir):
        if f.endswith((".warc", ".warc.gz", ".wet", ".wet.gz", ".tmp")) or (
            f == "_COMPLETE"
        ):
            os.unlink(os.path.join(out_dir, f))

    files = sorted(
        os.path.join(r, f)
        for r, _d, fs in os.walk(pages_path)
        for f in fs
        if f.endswith(".parquet")
    )
    if not files:
        raise FileNotFoundError(
            f"_write_segments: no parquet shards under {pages_path}"
        )

    def convert(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        outs = []
        for src in batch["src"].to_pylist():
            name = os.path.splitext(os.path.basename(src))[0] + ext
            dst = os.path.join(out_dir, name)
            t = pq.read_table(src, columns=["url", "warc_ts", "html"])
            with open(dst + ".tmp", "wb") as fh:
                info = _warcinfo_record(name)
                fh.write(_gzip_member(info) if gzip_members else info)
                for url, ts, html in zip(
                    t["url"].to_pylist(),
                    t["warc_ts"].to_pylist(),
                    t["html"].to_pylist(),
                ):
                    rec = row_to_record(url, ts, html)
                    fh.write(_gzip_member(rec) if gzip_members else rec)
            os.replace(dst + ".tmp", dst)  # no torn segment on task retry
            outs.append(name)
        return pa.table({"file": outs})

    (
        ray.data.from_items(
            [{"src": f} for f in files], override_num_blocks=len(files)
        )
        .map_batches(convert, batch_size=1, batch_format="pyarrow")
        .materialize()
    )
    with open(marker, "w") as fh:
        fh.write(tag)
    return out_dir


def write_warc(
    pages_path: str,
    out_dir: str,
    *,
    gzip_members: bool = False,
    overwrite: bool = False,
) -> str:
    """Materialize a pages parquet corpus as WARC response segments."""
    return _write_segments(
        pages_path,
        out_dir,
        ext=".warc.gz" if gzip_members else ".warc",
        tag=f"{pages_path}:{int(gzip_members)}:v1",
        row_to_record=_response_record,
        gzip_members=gzip_members,
        overwrite=overwrite,
    )


def write_wet(
    pages_path: str,
    out_dir: str,
    *,
    gzip_members: bool = True,
    overwrite: bool = False,
) -> str:
    """Materialize the EXTRACTED TEXT of a pages corpus as WET segments
    (Common Crawl's ``*.warc.wet`` convention: 'conversion' records,
    text/plain, no HTTP envelope). The text is the engine's own
    byte-identity surface — ``functions/textextract.extract_text_one`` —
    so ``read_wet(write_wet(pages))`` round-trips the per-url invariant
    in CC's wire format (pytest-pinned)."""
    from ..functions.textextract import extract_text_one

    def to_record(url, ts, html) -> bytes:
        return _conversion_record(url, ts, extract_text_one(html).encode("utf-8"))

    return _write_segments(
        pages_path,
        out_dir,
        ext=".wet.gz" if gzip_members else ".wet",
        tag=f"{pages_path}:wet:{int(gzip_members)}:v1",
        row_to_record=to_record,
        gzip_members=gzip_members,
        overwrite=overwrite,
    )


# --- reading ------------------------------------------------------------------


def _parse_warc_date(s: str) -> datetime.datetime:
    fmt = "%Y-%m-%dT%H:%M:%S.%fZ" if "." in s else "%Y-%m-%dT%H:%M:%SZ"
    return datetime.datetime.strptime(s, fmt)


class _StreamParser:
    """Incremental WARC record parser over a read()-able byte stream.

    Holds at most (one record + one read chunk) in memory; every consumed
    record is released before the next is parsed."""

    _CHUNK = 1 << 20
    # WARC headers are a handful of short lines; a separator not found
    # within this bound means the stream is not WARC (or is corrupt) —
    # raise promptly instead of buffering a whole segment hunting for it
    _MAX_HEADER = 1 << 20

    def __init__(self, f, path: str, what: str = "read_warc"):
        self._f = f
        self._path = path
        self._what = what  # entry-point name for error messages
        self._buf = bytearray()
        self._eof = False

    def _fill(self) -> bool:
        chunk = self._f.read(self._CHUNK)
        if not chunk:
            self._eof = True
            return False
        self._buf.extend(chunk)
        return True

    def _read_until_sep(self) -> bytes | None:
        """Bytes up to (excluding) the next CRLFCRLF; None at clean EOF."""
        while True:
            idx = self._buf.find(_SEP)
            if idx >= 0:
                out = bytes(self._buf[:idx])
                del self._buf[: idx + len(_SEP)]
                return out
            if len(self._buf) > self._MAX_HEADER:
                raise ValueError(
                    f"{self._what}: no record-header terminator within "
                    f"{self._MAX_HEADER} bytes in {self._path} — not a "
                    f"WARC stream?"
                )
            if not self._fill():
                if self._buf and bytes(self._buf).strip(b"\r\n"):
                    raise ValueError(
                        f"{self._what}: truncated record header in {self._path}"
                    )
                return None

    # hostile-header guard (the decode_jpeg SOF class): a record DECLARING
    # a huge Content-Length must raise before the parser buffers it all
    _MAX_RECORD = 1 << 30

    def _read_exact(self, n: int) -> bytes:
        if n > self._MAX_RECORD:
            raise ValueError(
                f"{self._what}: record declares Content-Length {n} > "
                f"{self._MAX_RECORD} cap in {self._path}"
            )
        while len(self._buf) < n:
            if not self._fill():
                raise ValueError(
                    f"{self._what}: truncated record payload in {self._path} "
                    f"(wanted {n} bytes, stream ended at {len(self._buf)})"
                )
        out = bytes(self._buf[:n])
        del self._buf[:n]
        return out

    def _consume_boundary(self) -> None:
        """The two CRLFs that terminate every record block."""
        tail = self._read_exact(len(_SEP))
        if tail != _SEP:
            raise ValueError(
                f"{self._what}: missing record boundary in {self._path} "
                f"(got {tail!r})"
            )

    def records(
        self, record_type: str = "response"
    ) -> Iterator[tuple[str, datetime.datetime, bytes]]:
        """Yield (url, ts, payload) for every record of ``record_type``;
        skip other record types by their declared Content-Length.
        ``response`` payloads have their HTTP envelope stripped (the body
        is what remains); ``conversion`` payloads (WET extracted text)
        are the block verbatim."""
        strip_http = record_type == "response"
        while True:
            header_block = self._read_until_sep()
            if header_block is None:
                return
            lines = header_block.split(_CRLF)
            if not lines[0].startswith(b"WARC/"):
                raise ValueError(
                    f"{self._what}: bad version line {lines[0][:40]!r} in "
                    f"{self._path}"
                )
            headers: dict[str, str] = {}
            for ln in lines[1:]:
                k, _sep, v = ln.partition(b":")
                headers[k.strip().lower().decode("ascii", "replace")] = (
                    v.strip().decode("utf-8", "replace")
                )
            try:
                length = int(headers["content-length"])
            except (KeyError, ValueError):
                raise ValueError(
                    f"{self._what}: record without a valid Content-Length in "
                    f"{self._path}"
                ) from None
            payload = self._read_exact(length)
            self._consume_boundary()
            if headers.get("warc-type") != record_type:
                continue  # warcinfo / request / metadata / ...
            if strip_http:
                idx = payload.find(_SEP)
                if idx < 0:
                    raise ValueError(
                        f"{self._what}: response record without an HTTP header "
                        f"terminator in {self._path}"
                    )
                payload = payload[idx + len(_SEP):]
            try:
                date = _parse_warc_date(headers["warc-date"])
            except (KeyError, ValueError):
                raise ValueError(
                    f"{self._what}: {record_type} record with a missing or "
                    f"malformed WARC-Date "
                    f"({headers.get('warc-date', '<absent>')!r}) in "
                    f"{self._path}"
                ) from None
            yield (headers.get("warc-target-uri", ""), date, payload)


try:  # Ray is an import-time optional here so the parser is unit-testable
    from ray.data.datasource import FileBasedDatasource
except ImportError:  # pragma: no cover
    FileBasedDatasource = object  # type: ignore[assignment,misc]


WET_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("text", pa.string()),
    ]
)


class WARCDatasource(FileBasedDatasource):
    """Streaming WARC/WET source: one read task per segment file, Arrow
    batches of ``batch_rows`` records flowing out as they parse. ``.gz``
    paths decompress through Arrow's multi-member gzip stream (the base
    class detects the codec from the extension), so per-record-gzipped
    Common Crawl segments and plain files share this one parser.
    ``record_type='response'`` yields (url, warc_ts, html:binary);
    ``'conversion'`` (WET) yields (url, warc_ts, text:string)."""

    # NOT bare "gz": Ray matches extensions by suffix, so "warc.gz"
    # already admits *.warc.gz, while "gz" would pull in the .cdx.gz
    # offset indexes that sit beside real Common Crawl segments
    _FILE_EXTENSIONS = {
        "response": ["warc", "warc.gz"],
        "conversion": ["wet", "wet.gz"],
    }

    def __init__(
        self,
        paths,
        *,
        batch_rows: int = 256,
        record_type: str = "response",
        **kwargs,
    ):
        if record_type not in self._FILE_EXTENSIONS:
            raise ValueError(f"unknown record_type {record_type!r}")
        # extension filter is opt-in on the base class — without it the
        # reader would trip over sidecar files (_COMPLETE markers, cdx)
        kwargs.setdefault("file_extensions", self._FILE_EXTENSIONS[record_type])
        super().__init__(paths, **kwargs)
        self._batch_rows = batch_rows
        self._record_type = record_type

    def _read_stream(self, f, path: str) -> Iterator[pa.Table]:
        conv = self._record_type == "conversion"
        urls: list[str] = []
        tss: list[datetime.datetime] = []
        payloads: list = []

        def flush() -> pa.Table:
            t = pa.table(
                {
                    "url": pa.array(urls, pa.string()),
                    "warc_ts": pa.array(tss, pa.timestamp("us")),
                    **(
                        {"text": pa.array(payloads, pa.string())}
                        if conv
                        else {"html": pa.array(payloads, pa.binary())}
                    ),
                }
            )
            urls.clear(), tss.clear(), payloads.clear()
            return t

        parser = _StreamParser(f, path, "read_wet" if conv else "read_warc")
        for url, ts, payload in parser.records(self._record_type):
            urls.append(url)
            tss.append(ts)
            # WET text is UTF-8 by convention; replace (never crash) on a
            # foreign segment's mojibake — our own writer is always valid
            payloads.append(payload.decode("utf-8", "replace") if conv else payload)
            if len(urls) >= self._batch_rows:
                yield flush()
        if urls:
            yield flush()
        else:  # typed empty: no schema-less blocks
            yield (WET_SCHEMA if conv else WARC_SCHEMA).empty_table()


def read_warc(paths: str | list[str], *, batch_rows: int = 256):
    """WARC segments -> Dataset[url, warc_ts, html] — drop-in for
    ``read_pages`` in front of the flagship KG pipeline."""
    import ray.data

    return ray.data.read_datasource(WARCDatasource(paths, batch_rows=batch_rows))


def read_wet(paths: str | list[str], *, batch_rows: int = 256):
    """WET segments -> Dataset[url, warc_ts, text] — the extracted-text
    corpus in Common Crawl's own format."""
    import ray.data

    return ray.data.read_datasource(
        WARCDatasource(paths, batch_rows=batch_rows, record_type="conversion")
    )
