"""Artifact format stamps: every persisted index/model artifact carries
a ``format`` tag ("<kind>-v<N>") in its JSON meta, checked at load.

The reference versions its RDB chunks the same way
(src/rdb_serialization.cc) so a newer layout fails with a versioned
error instead of deserializing garbage. Artifacts written BEFORE the
stamp existed (pre-r10 HNSW/IVF/LM/quality-model metas) carry no tag;
``check_format`` accepts the untagged form when the caller declares
the legacy layout identical (``allow_missing=True``) — which is true
for every v1 tag introduced in r10 — and rejects everything else."""
from __future__ import annotations


class ArtifactFormatError(ValueError):
    """A persisted artifact's format tag does not match this code's."""


def check_format(meta: dict, expected: str, path: str,
                 allow_missing: bool = True) -> None:
    """Raise ``ArtifactFormatError`` unless ``meta['format']`` equals
    ``expected`` (or is absent and ``allow_missing``)."""
    got = meta.get("format")
    if got == expected:
        return
    if got is None and allow_missing:
        return
    raise ArtifactFormatError(
        f"{path}: artifact format {got!r} does not match this build's "
        f"{expected!r} — the artifact was written by an incompatible "
        "version; rebuild it (or load with the matching release)")
