"""NRT utility surface: SearcherManager + LiveFieldValues
(`search/SearcherManager.java`, `search/ReferenceManager.java` listener
contract, `search/LiveFieldValues.java:17-130`).

`SearcherManager` owns one `IndexSearcher` and re-opens it on
`maybe_refresh()` (openIfChanged), firing RefreshListener callbacks
around the swap.  `LiveFieldValues` rides those callbacks to answer
"what is the CURRENT value of field X for id Y" for ids updated since
the last reopen — the double-buffer (current/old) prune protocol of the
reference: writes go to `current`; a refresh moves `current` → `old`
(lookups consult both while the reopen is in flight) and clears `old`
once the new searcher is visible, after which lookups fall through to
the index."""

from __future__ import annotations


class SearcherManager:
    """Single-owner manager over an IndexSearcher (the Ray-serving analogue
    holds one per query actor; actors refresh independently —
    `search/actors.py QueryService.refresh`)."""

    def __init__(self, searcher):
        self.searcher = searcher
        self._listeners: list = []

    def acquire(self):
        return self.searcher

    def release(self, searcher) -> None:
        pass                    # single-process: nothing to ref-count

    def add_listener(self, listener) -> None:
        self._listeners.append(listener)

    def remove_listener(self, listener) -> None:
        self._listeners.remove(listener)

    def maybe_refresh(self) -> bool:
        """openIfChanged + listener protocol (`ReferenceManager.java`
        doMaybeRefresh: beforeRefresh, swap, afterRefresh(didRefresh))."""
        for li in self._listeners:
            li.before_refresh()
        did = self.searcher.refresh()
        for li in self._listeners:
            li.after_refresh(did)
        return did


_MISSING = object()


class LiveFieldValues:
    """`search/LiveFieldValues.java`: tracks live field values across NRT
    reopens.  `lookup_from_searcher(searcher, id)` resolves ids that have
    already been flushed and reopened (doc values / stored fields)."""

    def __init__(self, manager: SearcherManager, missing_value,
                 lookup_from_searcher):
        self.manager = manager
        self.missing_value = missing_value
        self._lookup = lookup_from_searcher
        self._current: dict = {}
        self._old: dict = {}
        manager.add_listener(self)

    def close(self) -> None:
        self.manager.remove_listener(self)

    # -- RefreshListener ----------------------------------------------------

    def before_refresh(self) -> None:
        # updates arriving during the reopen go to the fresh map; lookups
        # still see the in-flight ones through `old`
        self._old = self._current
        self._current = {}

    def after_refresh(self, did_refresh: bool) -> None:
        # the old values are now visible via the reopened searcher (or were
        # already visible when did_refresh is False) — safe to drop
        self._old = {}

    # -- API ------------------------------------------------------------------

    def add(self, id_, value) -> None:
        """Record the value just written for `id_`."""
        self._current[id_] = value

    def delete(self, id_) -> None:
        """Record that `id_` was just deleted."""
        self._current[id_] = self.missing_value

    def size(self) -> int:
        return len(self._current) + len(self._old)

    def get(self, id_):
        """Live value for `id_`, or None when deleted / absent."""
        value = self._current.get(id_, _MISSING)
        if value is not _MISSING:
            return None if value == self.missing_value else value
        value = self._old.get(id_, _MISSING)
        if value is not _MISSING:
            return None if value == self.missing_value else value
        s = self.manager.acquire()
        try:
            return self._lookup(s, id_)
        finally:
            self.manager.release(s)
