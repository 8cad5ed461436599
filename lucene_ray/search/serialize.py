"""Query-AST (de)serialization — the `MonitorQuerySerializer` role
(`monitor/.../MonitorQuerySerializer.java`: a Monitor persists registered
queries so a restarted instance reloads its query index) generalized to the
whole query AST: every query type in `search/query.py`, `search/spans.py`,
`search/geo.py` and `search/xy.py` is a frozen dataclass, so the tree
round-trips through plain JSON with a `$type` tag per node and a `$tuple`
wrapper for sequence fields.

Not covered (documented): identity-built objects with internal state —
TermAutomatonQuery (rebuild from its builder calls or
token_stream_to_automaton_query), KnnVectorQuery's ndarray vector
(serialize the list form upstream if needed), and FunctionMatchQuery
(holds an arbitrary predicate callable).  The intervals algebra
(`search/intervals.py`) and ValueSource family (`search/valuesource.py`)
round-trip like every other dataclass tree.
"""

from __future__ import annotations

import dataclasses
import json


def _registry() -> dict:
    reg = {}
    from . import geo, intervals, query, spans, valuesource, xy

    for mod in (query, spans, geo, xy, intervals, valuesource):
        for name in dir(mod):
            obj = getattr(mod, name)
            if isinstance(obj, type) and dataclasses.is_dataclass(obj):
                reg[obj.__name__] = obj
    return reg


def query_to_dict(q):
    if isinstance(q, (str, int, float, bool)) or q is None:
        return q
    if isinstance(q, (list, tuple)):
        return {"$tuple": [query_to_dict(x) for x in q]}
    if dataclasses.is_dataclass(q):
        out = {"$type": type(q).__name__}
        for f in dataclasses.fields(q):
            out[f.name] = query_to_dict(getattr(q, f.name))
        return out
    raise TypeError(f"unserializable query node: {type(q).__name__}")


def query_from_dict(d, _reg=None):
    if isinstance(d, (str, int, float, bool)) or d is None:
        return d
    reg = _reg if _reg is not None else _registry()
    if "$tuple" in d:
        return tuple(query_from_dict(x, reg) for x in d["$tuple"])
    cls = reg[d["$type"]]
    kwargs = {k: query_from_dict(v, reg) for k, v in d.items()
              if k != "$type"}
    return cls(**kwargs)


def dumps_query(q) -> str:
    return json.dumps(query_to_dict(q), sort_keys=True)


def loads_query(s: str):
    return query_from_dict(json.loads(s))


def save_monitor(path: str, registered) -> None:
    """Persist a Monitor's registered (query_id, query) set
    (Monitor.register + MonitorQuerySerializer persistence)."""
    with open(path, "w") as f:
        json.dump([[qid, query_to_dict(q)] for qid, q in registered], f)


def load_monitor(path: str):
    """Reload a persisted query set into a fresh AstMonitor — the restarted
    Monitor rebuilding its QueryIndex from storage."""
    from ..pipelines.percolate import AstMonitor

    with open(path) as f:
        data = json.load(f)
    reg = _registry()
    return AstMonitor([(qid, query_from_dict(qd, reg)) for qid, qd in data])
