"""Storage-root resolution for everything the engine persists outside a
caller-supplied path (synthesized corpora, media tables, bench scratch,
demo stores).

On a single node the default is ``/tmp/ocds_ray_corpus``. On a REAL
multi-node cluster that default is wrong for anything another node must
read — set ``GRAFT_STORAGE_ROOT`` to a SHARED filesystem path (NFS /
Lustre / fuse-mounted object store) and every entry-point scratch
location follows it.

Contract notes for cluster deployment:
  - Ray's parquet read/write already accepts URIs (``s3://...``), so the
    DATA paths work on object stores too.
  - The incremental KG store and the bucketed-layout manifests
    additionally use POSIX renames for their atomic journal/swap steps
    (``pipelines/kg_incremental.py``, ``state/manifest.py``) — those
    roots must be a real (shared) FILESYSTEM, not a bare object-store
    URI; object-store backends would need the rename-free variant
    (write-new + manifest pointer swap) noted in SCALE.md.
"""

from __future__ import annotations

import os

_DEFAULT_ROOT = "/tmp/ocds_ray_corpus"


def storage_root() -> str:
    """The configured scratch/storage root (``GRAFT_STORAGE_ROOT`` env
    var, default ``/tmp/ocds_ray_corpus``). Created on first use."""
    root = os.environ.get("GRAFT_STORAGE_ROOT", _DEFAULT_ROOT)
    os.makedirs(root, exist_ok=True)
    return root


def scratch_path(*parts: str) -> str:
    """A path under the configured storage root."""
    return os.path.join(storage_root(), *parts)
