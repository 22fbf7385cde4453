"""Stateless html->text stage (SURVEY §7.1 step 'extract_text').

``map_batches`` over zero-copy Arrow batches; the per-doc work is the pure
``extract_text_one`` function (module-level compiled regexes — compiled once
per worker process at import, not per batch). Emits the per-url sha256 used
by the byte-identity invariant (BASELINE.json input_hint).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..functions.hashing import text_sha256
from ..functions.textextract import extract_text_one


def extract_text_batch(batch: pa.Table) -> pa.Table:
    texts = [extract_text_one(h) for h in batch["html"].to_pylist()]
    hashes = [text_sha256(t) for t in texts]
    cols = {name: batch[name] for name in batch.schema.names if name not in ("text", "html")}
    cols["text"] = pa.array(texts, pa.string())
    cols["text_sha256"] = pa.array(hashes, pa.string())
    return pa.table(cols)


def extract_text(pages: ray.data.Dataset, *, batch_size: int = 256) -> ray.data.Dataset:
    """pages(url, html, ...) -> (url, ..., text, text_sha256). Small batch
    size: html payloads are large binary values; batch x concurrency must
    fit worker heaps (ray_guide 'memory-aware')."""
    return pages.map_batches(
        extract_text_batch, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )
