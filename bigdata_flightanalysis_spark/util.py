"""Small shared filesystem helpers for store/index metadata sidecars.

The incremental stores and the BM25 index each carry a tiny JSON
sidecar recording the parameters the on-disk layout was built with
(LSH plane count, MinHash scheme, term-bucket modulus, sink contract).
Every reader treats an ABSENT sidecar as a defined state (pre-metadata
store → stamp on next append) — but a TRUNCATED one, left by a crash
mid-``json.dump``, fails every later load with a raw
``JSONDecodeError`` until someone hand-deletes it. Writing through a
temp file plus ``os.rename`` (atomic on POSIX within one filesystem)
keeps the sidecar in one of exactly two states: absent or complete.
"""

from __future__ import annotations

import json
import os


def atomic_write_json(path: str, obj: dict) -> None:
    """Write ``obj`` as JSON at ``path`` so a crash at ANY point leaves
    either the previous state or the complete new file — never a
    truncated one. The temp file lives next to the target (same dir ⇒
    same filesystem ⇒ ``os.rename`` is atomic and never falls back to
    copy+delete)."""
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(obj, f)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)
