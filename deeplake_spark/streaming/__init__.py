"""Streaming subpackage. `stream_identity` lives here because BOTH
exactly-once epoch ledgers (dataset.ingest_stream's commit markers and
streaming.indexing's index-side markers) must derive the SAME identity
from the same checkpoint — a copy in each would drift (r15 review)."""

from __future__ import annotations


def stream_identity(checkpoint_dir: str | None) -> str:
    """Stream identity for epoch ledgers: a stable 8-hex id per
    CHECKPOINT. The path is normalized first (trailing slashes
    stripped; relative LOCAL paths made absolute) so a respelled
    checkpoint_dir ('/tmp/cp' vs '/tmp/cp/' vs 'cp' from the same cwd)
    keeps the same identity — a changed sid would defeat the ledger
    and replay an already-appended epoch (r15 diff review). URI paths
    (s3://..., file://...) keep their scheme untouched. No checkpoint
    → no replay is possible → a fresh identity per call."""
    import hashlib
    import os
    import uuid

    if not checkpoint_dir:
        return uuid.uuid4().hex[:8]
    p = checkpoint_dir.rstrip("/")
    if "://" not in p:
        p = os.path.abspath(p)
    return hashlib.md5(p.encode()).hexdigest()[:8]
