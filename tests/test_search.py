"""End-to-end: build a small index with the Ray pipeline, then check BM25
top-k rank- and score-identity against an independent brute-force float32
oracle (BaseSimilarityTestCase / CheckHits model — the oracle re-implements
`BM25Similarity.java:104-111,240-252` as straight-line code over the whole
corpus, no shared code with the engine's scorer)."""

import numpy as np
import pyarrow as pa
import pytest

import lucene_ray.analysis.standard as std
from lucene_ray.index.build import build_index
from lucene_ray.search.query import TermQuery, bool_query, parse_query
from lucene_ray.search.searcher import IndexSearcher
from lucene_ray.sources.transcripts import synth_transcripts
from lucene_ray.util.smallfloat import LENGTH_TABLE, int_to_byte4

N_TURNS = 3000


@pytest.fixture(scope="module")
def corpus():
    t = synth_transcripts(N_TURNS, seed=42)
    # global stable order + docids
    t = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    tokens = [std.analyze(x) if x else [] for x in t.column("text").to_pylist()]
    return t, tokens


@pytest.fixture(scope="module")
def index(ray_session, corpus, tmp_path_factory):
    import ray.data as rd

    t, _ = corpus
    index_dir = str(tmp_path_factory.mktemp("idx"))
    ds = rd.from_arrow(synth_transcripts(N_TURNS, seed=42))  # unsorted input
    commit = build_index(ds, index_dir, target_docs_per_partition=500,
                         input_desc="synth3000")
    return index_dir, commit


class Oracle:
    """Brute-force float32 BM25 over the whole corpus."""

    def __init__(self, tokens, k1=1.2, b=0.75):
        self.tokens = tokens
        self.lengths = np.array([len(x) for x in tokens], dtype=np.int64)
        self.norm_bytes = int_to_byte4(self.lengths)
        self.doc_count = int((self.lengths > 0).sum())
        self.sum_ttf = int(self.lengths.sum())
        self.k1 = np.float32(k1)
        self.b = np.float32(b)
        self.avgdl = np.float32(self.sum_ttf / float(self.doc_count))
        self.df = {}
        self.tf = {}          # term -> dict doc -> freq
        for d, toks in enumerate(tokens):
            seen = {}
            for tok in toks:
                seen[tok] = seen.get(tok, 0) + 1
            for tok, f in seen.items():
                self.df[tok] = self.df.get(tok, 0) + 1
                self.tf.setdefault(tok, {})[d] = f

    def term_scores(self, term, boost=1.0):
        """dict doc -> float32 score, Lucene op order."""
        df = self.df.get(term, 0)
        if df == 0:
            return {}
        idf = np.float32(np.log(1 + (self.doc_count - df + 0.5) / (df + 0.5)))
        weight = np.float32(boost) * idf
        one = np.float32(1.0)
        out = {}
        for d, f in self.tf[term].items():
            ln = LENGTH_TABLE[int(self.norm_bytes[d])]
            norm_inv = one / (self.k1 * ((one - self.b) + self.b * ln / self.avgdl))
            out[d] = weight - weight / (one + np.float32(f) * norm_inv)
        return out

    def topk(self, should=(), must=(), filter_=(), must_not=(), k=10, msm=0):
        # float32 accumulation in CLAUSE order (bool_query lists SHOULD
        # clauses before MUST) — the engine's documented deterministic order
        scores = {}
        match_must = None
        should_match = {}
        for t in should:
            s = self.term_scores(t)
            for d, v in s.items():
                scores[d] = scores.get(d, np.float32(0)) + v
                should_match[d] = should_match.get(d, 0) + 1
        for t in must:
            s = self.term_scores(t)
            docs = set(s)
            match_must = docs if match_must is None else (match_must & docs)
            for d, v in s.items():
                scores[d] = scores.get(d, np.float32(0)) + v
        for t in filter_:
            docs = set(self.tf.get(t, {}))
            match_must = docs if match_must is None else (match_must & docs)
        if match_must is not None:
            eligible = match_must
        else:
            eligible = {d for d, c in should_match.items() if c >= max(1, msm)}
        if msm and match_must is not None:
            eligible = {d for d in eligible if should_match.get(d, 0) >= msm}
        for t in must_not:
            eligible = eligible - set(self.tf.get(t, {}))
        cand = sorted(eligible, key=lambda d: (-scores.get(d, np.float32(0)), d))
        return [(d, float(scores.get(d, np.float32(0)))) for d in cand[:k]], len(eligible)


@pytest.fixture(scope="module")
def oracle(corpus):
    _, tokens = corpus
    return Oracle(tokens)


def _check(searcher, oracle, k=10, should=(), must=(), filter_=(), must_not=(), msm=0):
    q = bool_query(should=should, must=must, filter_=filter_, must_not=must_not,
                   minimum_should_match=msm)
    td = searcher.search(q, k=k)
    want, total = oracle.topk(should=should, must=must, filter_=filter_,
                              must_not=must_not, k=k, msm=msm)
    got = [(h.gid, h.score) for h in td.hits]
    assert [g for g, _ in got] == [d for d, _ in want], (got, want)
    for (g, s), (d, ws) in zip(got, want):
        assert s == ws, f"score mismatch doc {g}: {s} != {ws}"
    return td, total


def test_collection_stats(index, oracle):
    _, commit = index
    assert commit["doc_count_field"] == oracle.doc_count
    assert commit["sum_ttf"] == oracle.sum_ttf


def test_global_df_matches(index, oracle):
    s = IndexSearcher(index[0])
    for term in ["the", "query", "data", "rareterm0001", "absentterm"]:
        assert s.df(term) == oracle.df.get(term, 0), term


def test_term_query(index, oracle):
    s = IndexSearcher(index[0])
    for term in ["query", "data", "the", "customer", "rareterm0007"]:
        _check(s, oracle, should=[term], k=10)


def test_term_query_absent(index, oracle):
    s = IndexSearcher(index[0])
    td = s.search(TermQuery("absenttermxyz"), k=10)
    assert td.hits == [] and td.total_hits == 0


def test_bool_should(index, oracle):
    s = IndexSearcher(index[0])
    _check(s, oracle, should=["query", "data", "merge"], k=10)
    _check(s, oracle, should=["the", "rareterm0001"], k=20)


def test_bool_must(index, oracle):
    s = IndexSearcher(index[0])
    _check(s, oracle, must=["query", "data"], k=10)
    _check(s, oracle, must=["sort", "merge", "join"], k=15)


def test_bool_mixed(index, oracle):
    s = IndexSearcher(index[0])
    _check(s, oracle, must=["query"], should=["data", "join"], k=10)
    _check(s, oracle, should=["data", "join"], filter_=["query"], k=10)
    _check(s, oracle, should=["data"], must_not=["the"], k=10)
    _check(s, oracle, should=["data", "join", "merge"], msm=2, k=10)


def test_count(index, oracle):
    s = IndexSearcher(index[0])
    q = bool_query(should=["query"])
    _, total = oracle.topk(should=["query"], k=1)
    assert s.count(q) == total


def test_parse_query(index, oracle):
    s = IndexSearcher(index[0])
    td = s.search(parse_query("Query DATA"), k=10)
    want, _ = oracle.topk(should=["query", "data"], k=10)
    assert [h.gid for h in td.hits] == [d for d, _ in want]


def test_search_after_pagination(index, oracle):
    s = IndexSearcher(index[0])
    q = bool_query(should=["data", "query"])
    page1 = s.search(q, k=10)
    page2 = s.search(q, k=10, after=(page1.hits[-1].score, page1.hits[-1].gid))
    want, _ = oracle.topk(should=["data", "query"], k=20)
    got = [h.gid for h in page1.hits] + [h.gid for h in page2.hits]
    assert got == [d for d, _ in want]


def test_hit_identity_resolution(index, corpus):
    s = IndexSearcher(index[0])
    t, _ = corpus
    td = s.search(TermQuery("query"), k=5)
    conv = t.column("conv_id").to_pylist()
    turn = t.column("turn_idx").to_pylist()
    for h in td.hits:
        assert h.conv_id == conv[h.gid]
        assert h.turn_idx == turn[h.gid]


def test_phrase_query(index, corpus, oracle):
    """Exact phrase: rank + score identical to a brute-force position scan
    with the summed-idf PhraseWeight semantics."""
    from lucene_ray.search.query import PhraseQuery

    s = IndexSearcher(index[0])
    _, tokens = corpus
    for phrase in [("query", "data"), ("the", "query"), ("data", "table", "scan"),
                   ("zzz", "absent")]:
        td = s.search(PhraseQuery(tuple(phrase)), k=10)
        # brute force: count exact occurrences per doc
        hits = {}
        for d, toks in enumerate(tokens):
            cnt = sum(1 for i in range(len(toks) - len(phrase) + 1)
                      if tuple(toks[i:i + len(phrase)]) == tuple(phrase))
            if cnt:
                hits[d] = cnt
        if not hits or any(oracle.df.get(t, 0) == 0 for t in phrase):
            assert td.hits == []
            continue
        idf_sum = np.float32(0.0)
        for t in phrase:
            df = oracle.df[t]
            idf_sum = idf_sum + np.float32(
                np.log(1 + (oracle.doc_count - df + 0.5) / (df + 0.5)))
        one = np.float32(1.0)
        want = []
        for d, cnt in hits.items():
            ln = LENGTH_TABLE[int(oracle.norm_bytes[d])]
            norm_inv = one / (oracle.k1 * ((one - oracle.b) + oracle.b * ln / oracle.avgdl))
            sc = idf_sum - idf_sum / (one + np.float32(cnt) * norm_inv)
            want.append((d, float(sc)))
        want.sort(key=lambda x: (-x[1], x[0]))
        got = [(h.gid, h.score) for h in td.hits]
        assert got == want[:10], (phrase, got, want[:10])
        assert td.total_hits == len(hits)


def test_phrase_count(index, corpus):
    from lucene_ray.search.query import PhraseQuery

    s = IndexSearcher(index[0])
    _, tokens = corpus
    phrase = ("query", "data")
    want = sum(1 for toks in tokens
               if any(tuple(toks[i:i + 2]) == phrase for i in range(len(toks) - 1)))
    assert s.count(PhraseQuery(phrase)) == want


def test_partitioning_invariance(ray_session, corpus, oracle, tmp_path_factory):
    """Different partition sizes must produce identical global docIDs and
    identical top-k (stable (conv_id, turn_idx) global order)."""
    import ray.data as rd

    index_dir = str(tmp_path_factory.mktemp("idx2"))
    ds = rd.from_arrow(synth_transcripts(N_TURNS, seed=42))
    build_index(ds, index_dir, target_docs_per_partition=900, input_desc="synth3000b")
    s = IndexSearcher(index_dir)
    _check(s, oracle, should=["query", "data", "merge"], k=10)
    _check(s, oracle, must=["sort", "merge"], k=10)
