"""Graph analyzer stages (stop / synonym / shingle): position semantics,
norm overlap discount, and end-to-end phrase behavior through an index."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.analysis.filters import run_token_chain


def _chain(texts, specs):
    from lucene_ray.analysis.standard import tokenize_column

    lengths, flat = tokenize_column(pa.array(texts, type=pa.string()))
    return run_token_chain(flat, lengths, specs)


def test_stop_filter_gaps_and_norms():
    flat, counts, pos, norms = _chain(["merge the join", "the the the"],
                                      ("stop:the,and",))
    toks = np.asarray(flat, dtype=object)
    assert toks.tolist() == ["merge", "join"]
    assert counts.tolist() == [2, 0]
    assert pos.tolist() == [0, 2]          # gap where 'the' was
    assert norms.tolist() == [2, 0]


def test_synonym_same_position_no_norm():
    flat, counts, pos, norms = _chain(["join sort"], ("syn:join=merge",))
    toks = np.asarray(flat, dtype=object).tolist()
    # overlay sorted after the original at the same position
    assert toks == ["join", "merge", "sort"]
    assert pos.tolist() == [0, 0, 1]
    assert counts.tolist() == [3]
    assert norms.tolist() == [2]           # overlap discounted


def test_shingle_bigrams():
    flat, counts, pos, norms = _chain(["a b c"], ("shingle",))
    toks = np.asarray(flat, dtype=object).tolist()
    assert toks == ["a", "a b", "b", "b c", "c"]
    assert pos.tolist() == [0, 0, 1, 1, 2]
    assert norms.tolist() == [3]


def test_stop_then_shingle_no_filler():
    # stop gap suppresses the shingle across it (documented divergence from
    # the reference's '_' filler)
    flat, _, pos, _ = _chain(["merge the join sort"],
                             ("stop:the", "shingle"))
    toks = np.asarray(flat, dtype=object).tolist()
    assert "merge join" not in toks
    assert "join sort" in toks


def test_one2one_fast_path_unchanged():
    flat, counts, pos, norms = _chain(["Merges running"], ("porter",))
    assert pos is None                     # fast path: no positions array
    assert np.asarray(flat, dtype=object).tolist() == ["merg", "run"]


def test_chain_end_to_end_index(ray_session, tmp_path):
    """Build a tiny index with stop+synonym and check phrase/count semantics
    through the searcher."""
    import ray.data as rd

    from lucene_ray.index.build import build_index
    from lucene_ray.search.query import PhraseQuery, bool_query
    from lucene_ray.search.searcher import IndexSearcher

    rows = pa.table({
        "conv_id": pa.array([f"c{i}" for i in range(4)]),
        "turn_idx": pa.array([0] * 4, type=pa.int32()),
        "text": pa.array([
            "merge the join",          # phrase gap
            "merge join now",          # adjacent
            "combine data",            # synonym source
            "nothing here",
        ]),
    })
    ds = rd.from_arrow(rows)
    build_index(ds, str(tmp_path / "idx"), target_docs_per_partition=100,
                token_filters=("stop:the", "syn:combine=merge"),
                input_desc="t")
    s = IndexSearcher(str(tmp_path / "idx"))
    assert s.count(bool_query(must=["the"])) == 0
    assert s.count(bool_query(must=["merge"])) == 3      # syn adds doc 2
    assert s.count(PhraseQuery(("merge", "join"))) == 1  # gap blocks doc 0
    assert s.count(PhraseQuery(("merge", "join"), slop=1)) == 2


def test_minhash_filter_stage():
    """MinHashFilter surface: each doc's stream collapses to its K minimum
    distinct fnv1a64 hashes as hex tokens; identical streams share all K."""
    from lucene_ray.util.hashing import fnv1a64_str

    texts = ["merge the data and sort it carefully now",
             "merge the data and sort it carefully now",     # exact dup
             "completely different words entirely here today",
             ""]
    K = 3
    flat, counts, pos, norms = _chain(texts, (f"minhash:{K}",))
    toks = np.asarray(flat, dtype=object)
    assert counts.tolist() == [K, K, K, 0]
    assert norms.tolist() == [K, K, K, 0]
    bounds = np.concatenate(([0], np.cumsum(counts)))
    per_doc = [toks[bounds[i]:bounds[i + 1]].tolist() for i in range(4)]
    assert per_doc[0] == per_doc[1]                 # dups share every token
    assert set(per_doc[0]).isdisjoint(per_doc[2])
    # oracle: K smallest distinct hashes of the analyzed tokens
    from lucene_ray.analysis.standard import analyze

    for i, txt in enumerate(texts[:3]):
        hs = sorted({fnv1a64_str(t) for t in analyze(txt)})[:K]
        assert per_doc[i] == [format(h, "016x") for h in hs], i
    # positions are 0..K-1 (stream-end emission)
    assert pos[bounds[0]:bounds[1]].tolist() == list(range(K))


def test_minhash_after_shingle_end_to_end(ray_session, tmp_path):
    """shingle -> minhash chain through a real index: exact dup docs collide
    on ALL minhash terms (candidate-pair discovery via plain term queries)."""
    import ray.data as rd

    from lucene_ray.index.build import build_index
    from lucene_ray.search.query import TermQuery, bool_query
    from lucene_ray.search.searcher import IndexSearcher

    texts = ["the quick brown fox jumps over the lazy dog",
             "the quick brown fox jumps over the lazy dog",
             "an utterly unrelated sentence about compilers"]
    t = pa.table({
        "conv_id": pa.array([f"c{i}" for i in range(len(texts))]),
        "turn_idx": pa.array([0] * len(texts), type=pa.int32()),
        "text": pa.array(texts),
    })
    d = str(tmp_path / "mhidx")
    build_index(rd.from_arrow(t), d, target_docs_per_partition=10,
                token_filters=("shingle", "minhash:4"), input_desc="mh")
    s = IndexSearcher(d)
    # pick doc 0's minhash terms from its shard dictionary postings
    rdr = s.reader(s._pids[0])
    terms0 = [str(rdr._term_np[tid]) for tid in range(rdr.n_terms)
              if 0 in rdr.postings(tid)[0]]
    assert len(terms0) == 4
    for term in terms0:
        td = s.search(bool_query(should=[term]), k=10,
                      total_hits_threshold=2**31 - 1)
        assert {h.gid for h in td.hits} == {0, 1}, term


def test_multiword_synonym_source(ray_session, tmp_path):
    """Multi-word synonym SOURCE rules (SynonymGraphFilter phrase rules,
    single-token output): alias emitted at the first constituent's position
    as an overlap — term-searchable, norm-neutral."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    import lucene_ray.analysis.standard as std
    from lucene_ray.index.build import build_index
    from lucene_ray.search.query import PhraseQuery, TermQuery
    from lucene_ray.search.searcher import IndexSearcher
    from lucene_ray.sources.transcripts import synth_transcripts

    n = 1500
    t = synth_transcripts(n, seed=62)
    st = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    d = str(tmp_path / "mwsyn")
    build_index(rd.from_arrow(st), d, target_docs_per_partition=400,
                token_filters=("syn:hash join=hashjoin;merge=blend",),
                input_desc="mwsyn")
    s = IndexSearcher(d)
    toks = [std.analyze(x) if x else []
            for x in st.column("text").to_pylist()]
    want = sum(1 for tk in toks
               if any(tk[i] == "hash" and tk[i + 1] == "join"
                      for i in range(len(tk) - 1)))
    assert s.count(TermQuery("hashjoin")) == want
    # single-word rule still works alongside
    assert s.count(TermQuery("blend")) == \
        sum(1 for tk in toks if "merge" in tk)
    # the alias sits at the first constituent's position: phrase
    # "hashjoin join" matches wherever "hash join" occurred
    want_ph = sum(1 for tk in toks
                  if any(tk[i] == "hash" and tk[i + 1] == "join"
                         for i in range(len(tk) - 1)))
    assert s.count(PhraseQuery(("hashjoin", "join"))) == want_ph
    # per-doc norms discount the overlays (rankings for an unrelated term
    # match a plain index); absolute scores differ only through avgdl,
    # because sumTotalTermFreq COUNTS injected tokens in Lucene too
    d2 = str(tmp_path / "plain")
    build_index(rd.from_arrow(st), d2, target_docs_per_partition=400,
                input_desc="plain")
    s2 = IndexSearcher(d2)
    td1 = s.search(TermQuery("scan"), k=20)
    td2 = s2.search(TermQuery("scan"), k=20)
    assert [h.gid for h in td1.hits] == [h.gid for h in td2.hits]
    for pid in range(4):
        assert np.array_equal(s.reader(pid).norms, s2.reader(pid).norms)


def test_multiword_synonym_output_rejected(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd
    import pytest as _pytest

    from lucene_ray.index.build import build_index
    from lucene_ray.sources.transcripts import synth_transcripts

    t = synth_transcripts(50, seed=1)
    d = str(tmp_path / "bad")
    with _pytest.raises(Exception):
        build_index(rd.from_arrow(t), d, target_docs_per_partition=50,
                    token_filters=("syn:nyc=new york",), input_desc="bad")


def test_ascii_fold_preserve_original():
    """ASCIIFoldingFilter(preserveOriginal=true): folded token replaces,
    original overlays at posInc 0 only when folding changed it; norms count
    only first-at-position tokens."""
    import numpy as np
    import pyarrow as pa

    from lucene_ray.analysis.filters import run_token_chain

    flat = pa.array(["résumé", "plain", "straße"])
    out, lens, pos, norms = run_token_chain(
        flat, np.array([3], dtype=np.int64), ("ascii_fold:preserve",))
    assert out.to_pylist() == ["resume", "résumé", "plain",
                               "strasse", "straße"]
    assert np.asarray(pos).tolist() == [0, 0, 1, 2, 2]
    assert norms.tolist() == [3]
    # unchanged corpus: no overlays at all
    out2, _l, _p, n2 = run_token_chain(
        pa.array(["abc", "def"]), np.array([2], dtype=np.int64),
        ("ascii_fold:preserve",))
    assert out2.to_pylist() == ["abc", "def"] and n2.tolist() == [2]


def test_common_grams_query_filter_reference_vectors():
    """TestCommonGramsFilter.testCommonGramsQueryFilter (+ the four
    edge-case tests): bigrams out, member unigrams dropped, trailing
    unigram dropped when it ends a bigram."""
    import numpy as np

    from lucene_ray.analysis.filters import run_token_chain

    spec = ("common_grams_query:s,of,the",)

    def run(words):
        flat, lens, pos, norms = run_token_chain(
            list(words), np.array([len(words)]), spec)
        return list(np.asarray(flat, dtype=object))

    assert run(["brown", "fox"]) == ["brown", "fox"]
    assert run(["the", "fox"]) == ["the_fox"]
    assert run(["fox", "of"]) == ["fox_of"]
    assert run(["of", "the"]) == ["of_the"]
    assert run(["the"]) == ["the"]
    assert run(["foo"]) == ["foo"]
    assert run(["n", "n", "n"]) == ["n", "n", "n"]
    assert run(["quick", "brown", "the"]) == ["quick", "brown_the"]
    assert run(["quick", "the", "brown"]) == ["quick_the", "the_brown"]
    assert run(["fox", "of", "the"]) == ["fox_of", "of_the"]
    assert run(["the", "quick", "brown"]) == ["the_quick", "quick", "brown"]
    assert run(["the", "fox", "of"]) == ["the_fox", "fox_of"]
    assert run(["of", "the", "fox"]) == ["of_the", "the_fox"]
    assert run(["of", "the", "of"]) == ["of_the", "the_of"]
    # testLastWordisStopWord / FirstWordisStopWord / OneWordQueryStopWord
    assert run(["dog", "the"]) == ["dog_the"]
    assert run(["the", "dog"]) == ["the_dog"]
    # multi-doc independence + sequential positions
    flat, lens, pos, norms = run_token_chain(
        ["the", "fox", "quick", "brown"], np.array([2, 2]),
        ("common_grams_query:s,of,the",))
    assert list(np.asarray(flat, dtype=object)) == \
        ["the_fox", "quick", "brown"]
    assert list(lens) == [1, 2]
