"""ID + version primary-key lookups
(`sandbox/codecs/idversion/IDVersionPostingsFormat.java`,
`IDVersionSegmentTermsEnum.java`, and the PerThreadVersionPKLookup
helper in `TestIDVersionPostingsFormat.java`).

The reference indexes a primary-key field whose single posting carries a
long version (delivered as a payload, bounded by MIN_VERSION/MAX_VERSION
because of the ZigZag encoding), and `seekExact(id, minIDVersion)`
fail-fasts when the indexed version is below the floor — the
optimistic-concurrency gate realtime ingest uses to skip stale updates.

Here the ID is an ordinary keyword field (so lookups ride the bloom
sidecars' NO-fast-path, `index/bloom.py`) and the version is an int64
doc-values column; `VersionPKLookup.lookup` composes seekExact + a
single pulsed-posting decode + the dv read, respecting live docs.  The
writer-side "one doc per ID per segment" contract is enforced at flush
when the field is named in ``build_index(id_version_fields=...)``
(IDVersionPostingsWriter throws on a second posting for a term), and the
version-domain bound is validated from the shard manifests' dv ranges
(O(shards), no column scan).
"""

from __future__ import annotations

import numpy as np

MIN_VERSION = 0
MAX_VERSION = (1 << 62) - 1          # IDVersionPostingsFormat.MAX_VERSION


class VersionPKLookup:
    """Per-searcher PK lookup (PerThreadVersionPKLookup semantics):
    ``field`` is the keyword ID field, ``version_field`` the int64
    doc-values column holding each doc's version."""

    def __init__(self, searcher, field: str, version_field: str):
        self.searcher = searcher
        self.field = field
        self.version_field = version_field
        for pid in searcher._pids:
            r = searcher.reader(pid)
            rng = r.docvalue_range(version_field)
            if rng is not None and (rng[0] < MIN_VERSION
                                    or rng[1] > MAX_VERSION):
                raise ValueError(
                    f"version column {version_field!r} out of "
                    f"[{MIN_VERSION}, {MAX_VERSION}] on shard {pid}")

    def lookup(self, id_value: str, min_version: int = MIN_VERSION):
        """Newest live posting for ``id_value`` with version >=
        ``min_version``; returns (gid, version) or None.  Like
        seekExact(target, minIDVersion), a present-but-older ID returns
        None.  With update discipline (update = delete + add) at most one
        live posting exists; if an app indexed duplicates, the highest
        version wins (the reference scans segments newest-first)."""
        from ..index.shard import keyword_term

        term = keyword_term(self.field, id_value)
        best = None
        for pid in self.searcher._pids:
            r = self.searcher.reader(pid)
            tid = r.seek_exact(term)       # bloom NO -> no dictionary probe
            if tid < 0:
                continue
            docs, _freqs = r.postings(tid)
            if r.deleted is not None:
                docs = docs[~r.deleted[docs]]
            if not len(docs):
                continue
            vers = r.docvalue(self.version_field)[docs]
            j = int(np.argmax(vers))
            cand = (int(self.searcher._bases[pid]) + int(docs[j]),
                    int(vers[j]))
            if best is None or cand[1] > best[1]:
                best = cand
        if best is None or best[1] < min_version:
            return None
        return best

    def can_index(self, id_value: str, new_version: int) -> bool:
        """The ingest-side gate: True when a doc with ``new_version`` may
        be applied (no live posting with version >= new_version)."""
        if not (MIN_VERSION <= new_version <= MAX_VERSION):
            raise ValueError(f"version out of range: {new_version}")
        return self.lookup(id_value, min_version=new_version) is None
