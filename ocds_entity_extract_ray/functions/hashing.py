"""Deterministic content hashing.

Replaces the reference's ``object-hash`` content ids
(/root/reference/lib/insert.js:37-38, /root/reference/lib/stream.js:32-33):
the id is a pure function of the document content, computed BEFORE any
wall-clock ``date`` stamping, so it is stable across runs and parallelism.
"""

from __future__ import annotations

import hashlib
import json
import zlib


def canonical_json(doc) -> str:
    """Canonical serialization: sorted keys, no whitespace, unicode kept."""
    return json.dumps(doc, sort_keys=True, separators=(",", ":"), ensure_ascii=False, default=str)


def content_hash(doc) -> str:
    """sha256 hex of the canonical JSON form."""
    return hashlib.sha256(canonical_json(doc).encode("utf-8")).hexdigest()


def text_sha256(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def stable_bucket(key: str, num_buckets: int) -> int:
    """Deterministic partition bucket (NEVER Python's salted hash()).
    Used for subject-hash triple layout and hash-partitioned joins."""
    return zlib.crc32(key.encode("utf-8")) % num_buckets
