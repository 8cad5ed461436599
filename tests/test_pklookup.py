"""IDVersion primary-key lookups (`sandbox/codecs/idversion/`):
seekExact(id, minVersion) gating, the one-doc-per-ID-per-segment writer
contract, version-domain validation, and the optimistic-concurrency
update flow (update = delete + append with a higher version)."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.search.pklookup import MAX_VERSION, VersionPKLookup
from lucene_ray.search.searcher import IndexSearcher
from lucene_ray.sources.transcripts import synth_transcripts


def _with_ids(n, seed, versions, start=0):
    t = synth_transcripts(n, seed=seed)
    st = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    ids = [f"doc-{start + i:06d}" for i in range(n)]
    st = st.append_column("pk", pa.array(ids))
    return st.append_column("ver", pa.array(np.asarray(versions,
                                                       dtype=np.int64)))


def test_pk_lookup_and_version_gate(ray_session, tmp_path):
    import ray.data as rd

    n = 600
    vers = (np.arange(n, dtype=np.int64) * 7) % 1000
    st = _with_ids(n, 71, vers)
    d = str(tmp_path / "idv")
    build_index(rd.from_arrow(st), d, target_docs_per_partition=200,
                keyword_cols=("pk",), docvalue_cols=("ver",),
                bloom_fields=("pk",), id_version_fields=("pk",),
                input_desc="idv")
    s = IndexSearcher(d)
    lk = VersionPKLookup(s, "pk", "ver")

    hit = lk.lookup("doc-000123")
    assert hit is not None and hit[1] == int(vers[123])
    # version floor: present-but-older returns None (seekExact fail-fast)
    assert lk.lookup("doc-000123", min_version=int(vers[123])) == hit
    assert lk.lookup("doc-000123", min_version=int(vers[123]) + 1) is None
    # absent ID (bloom NO path on most shards)
    assert lk.lookup("doc-999999") is None
    # ingest gate
    assert lk.can_index("doc-000123", int(vers[123]) + 1)
    assert not lk.can_index("doc-000123", int(vers[123]))
    with pytest.raises(ValueError):
        lk.can_index("doc-000123", MAX_VERSION + 1)


def test_pk_writer_rejects_duplicate_ids(ray_session, tmp_path):
    import ray.data as rd

    n = 100
    t = synth_transcripts(n, seed=72)
    st = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    ids = [f"doc-{i:06d}" for i in range(n)]
    ids[50] = ids[49]                       # duplicate within one segment
    st = st.append_column("pk", pa.array(ids))
    st = st.append_column("ver", pa.array(np.zeros(n, dtype=np.int64)))
    with pytest.raises(Exception, match="indexed in 2 docs"):
        build_index(rd.from_arrow(st), str(tmp_path / "dup"),
                    target_docs_per_partition=200, keyword_cols=("pk",),
                    docvalue_cols=("ver",), id_version_fields=("pk",),
                    input_desc="idv-dup")


def test_pk_version_domain_validated(ray_session, tmp_path):
    import ray.data as rd

    n = 50
    st = _with_ids(n, 73, [-1] * n)
    d = str(tmp_path / "neg")
    build_index(rd.from_arrow(st), d, target_docs_per_partition=100,
                keyword_cols=("pk",), docvalue_cols=("ver",),
                id_version_fields=("pk",), input_desc="idv-neg")
    with pytest.raises(ValueError, match="out of"):
        VersionPKLookup(IndexSearcher(d), "pk", "ver")


def test_pk_update_flow(ray_session, tmp_path):
    """update = delete + append with a higher version: the lookup follows
    the newest live posting across segments."""
    import ray.data as rd

    from lucene_ray.index.build import append_index
    from lucene_ray.index.deletes import delete_by_keys

    n = 300
    st = _with_ids(n, 74, np.full(n, 10, dtype=np.int64))
    d = str(tmp_path / "upd")
    build_index(rd.from_arrow(st), d, target_docs_per_partition=150,
                keyword_cols=("pk",), docvalue_cols=("ver",),
                bloom_fields=("pk",), id_version_fields=("pk",),
                input_desc="idv-upd")
    s = IndexSearcher(d)
    lk = VersionPKLookup(s, "pk", "ver")
    assert lk.lookup("doc-000042")[1] == 10
    assert lk.can_index("doc-000042", 11)

    # re-ingest doc 42 with version 11: delete the old row, append the new
    gid, _ = lk.lookup("doc-000042")
    pid = s._pid_of(gid)
    row = s.reader(pid).lookup_docs(
        np.array([gid - s._bases[pid]], dtype=np.int64))
    keys = pa.table({"conv_id": row.column("conv_id"),
                     "turn_idx": row.column("turn_idx")})
    delete_by_keys(d, keys)

    upd = _with_ids(1, 75, [11], start=42)
    # keep key identity distinct from existing convs (fresh conv ids from
    # seed 75); the PK field carries the logical identity
    append_index(rd.from_arrow(upd), d, input_desc="idv-upd-2")

    s2 = IndexSearcher(d)
    lk2 = VersionPKLookup(s2, "pk", "ver")
    hit = lk2.lookup("doc-000042")
    assert hit is not None and hit[1] == 11
    assert not lk2.can_index("doc-000042", 11)
    assert lk2.can_index("doc-000042", 12)
