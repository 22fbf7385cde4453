"""HTML -> text extraction: a pure function of the html bytes.

The per-row invariant (BASELINE.json input_hint) requires byte-identical
extracted text per url under any parallelism, on both cluster sizes, and
across task retries — so this must depend ONLY on the input bytes: fixed
utf-8 decode with replacement, fixed tag/entity handling, no charset
sniffing, no locale, no wall clock.
"""

from __future__ import annotations

import html as _html
import re

_SCRIPT_STYLE_RE = re.compile(r"(?is)<(script|style)\b.*?</\1\s*>")
_COMMENT_RE = re.compile(r"(?s)<!--.*?-->")
_TAG_RE = re.compile(r"(?s)<[^>]*>")
_WS_RE = re.compile(r"\s+")


def extract_text_one(html_bytes: bytes) -> str:
    """Single-doc reference extractor. Deterministic pipeline:
    utf-8 (errors=replace) -> drop <script>/<style> blocks -> drop comments
    -> strip tags -> unescape entities -> collapse whitespace."""
    s = html_bytes.decode("utf-8", errors="replace")
    s = _SCRIPT_STYLE_RE.sub(" ", s)
    s = _COMMENT_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _html.unescape(s)
    s = _WS_RE.sub(" ", s).strip()
    return s


_JSONLD_RE = re.compile(
    r"(?is)<script\s+type=[\"']application/ld\+json[\"']\s*>(.*?)</script\s*>"
)
_JSONLD_BYTES_RE = re.compile(
    rb"(?is)<script\s+type=[\"']application/ld\+json[\"']\s*>(.*?)</script\s*>"
)


def extract_jsonld_blocks(html_bytes: bytes) -> list[str]:
    """All embedded ``application/ld+json`` payload strings, in document
    order. Structured-data extraction path (the mention-detect stage's
    parser); pure function of the bytes."""
    s = html_bytes.decode("utf-8", errors="replace")
    return [m.group(1).strip() for m in _JSONLD_RE.finditer(s)]


def extract_jsonld_blocks_bytes(html_bytes: bytes) -> list[bytes]:
    """Hot-path variant: matches on the raw bytes so the full page is never
    decoded (json.loads accepts utf-8 bytes directly). Byte-equivalent to
    ``extract_jsonld_blocks`` for utf-8 pages; the mention stage uses this."""
    return [m.group(1).strip() for m in _JSONLD_BYTES_RE.finditer(html_bytes)]
