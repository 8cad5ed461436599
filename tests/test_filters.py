"""ASCIIFolding + Porter stemming token filters.

Porter is validated against Martin Porter's official public-domain test
vocabulary (sample fixture in tests/data, full 23,531-word set when the
reference checkout is present); folding against the reference's
TestASCIIFoldingFilter core cases.  End-to-end: a stemmed index matches
inflected query forms, keyword terms stay unfiltered."""

import os

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.analysis.filters import (
    apply_filters_column,
    apply_filters_str,
    ascii_fold,
    porter_stem,
)

DATA = os.path.join(os.path.dirname(__file__), "data", "porter_sample.txt")


def _pairs(path):
    for line in open(path):
        if line.startswith("#"):
            continue
        parts = line.split()
        if len(parts) == 2:
            yield parts[0], parts[1]


def test_porter_official_sample():
    n = 0
    for voc, out in _pairs(DATA):
        assert porter_stem(voc) == out, voc
        n += 1
    assert n > 500


@pytest.mark.skipif(
    not os.path.exists("/root/reference/lucene/analysis/common/src/test/org/"
                       "apache/lucene/analysis/en/porterTestData.zip"),
    reason="full vocabulary only available with the reference checkout")
def test_porter_full_official_vocabulary(tmp_path):
    import zipfile

    z = zipfile.ZipFile("/root/reference/lucene/analysis/common/src/test/org/"
                        "apache/lucene/analysis/en/porterTestData.zip")
    voc = z.read("voc.txt").decode().split()
    out = z.read("output.txt").decode().split()
    assert len(voc) == len(out) == 23531
    for v, o in zip(voc, out):
        assert porter_stem(v) == o, v


def test_porter_classics():
    # examples from the algorithm paper / PorterStemFilter docs
    for w, s in [("caresses", "caress"), ("ponies", "poni"), ("caress", "caress"),
                 ("cats", "cat"), ("feed", "feed"), ("agreed", "agre"),
                 ("plastered", "plaster"), ("bled", "bled"), ("motoring", "motor"),
                 ("sing", "sing"), ("conflated", "conflat"), ("troubled", "troubl"),
                 ("sized", "size"), ("hopping", "hop"), ("tanned", "tan"),
                 ("falling", "fall"), ("hissing", "hiss"), ("fizzed", "fizz"),
                 ("failing", "fail"), ("filing", "file"), ("happy", "happi"),
                 ("sky", "sky"), ("relational", "relat"), ("conditional", "condit"),
                 ("rational", "ration"), ("valenci", "valenc"),
                 ("probate", "probat"), ("rate", "rate"), ("controll", "control"),
                 ("roll", "roll")]:
        assert porter_stem(w) == s, w


def test_ascii_folding_core():
    # TestASCIIFoldingFilter-style core cases (accents/ligatures)
    assert ascii_fold("Des mot clés À LA CHAÎNE À Á Â Ã Ä Å") == \
        "Des mot cles A LA CHAINE A A A A A A"
    assert ascii_fold("æ") == "ae"
    assert ascii_fold("Œuf") == "OEuf"
    assert ascii_fold("straße") == "strasse"
    assert ascii_fold("résumé") == "resume"
    assert ascii_fold("ĳ") == "ij"          # NFKD ligature
    assert ascii_fold("łódź") == "lodz"
    assert ascii_fold("plain ascii!") == "plain ascii!"


def test_filter_chain_and_column():
    chain = ("ascii_fold", "porter")
    assert apply_filters_str("résumés", chain) == porter_stem("resumes")
    flat = pa.array(["running", "résumés", "cats", "running"], type=pa.string())
    out = apply_filters_column(flat, chain).to_pylist()
    assert out == ["run", porter_stem("resumes"), "cat", "run"]


@pytest.fixture(scope="module")
def stemmed_index(ray_session, tmp_path_factory):
    import ray.data as rd

    from lucene_ray.index.build import build_index
    from lucene_ray.sources.transcripts import synth_transcripts

    t = synth_transcripts(2000, seed=5)
    d = str(tmp_path_factory.mktemp("stemidx"))
    build_index(rd.from_arrow(t), d, target_docs_per_partition=600,
                keyword_cols=("role",),
                token_filters=("ascii_fold", "porter"), input_desc="stem2000")
    return d, t


def test_stemmed_index_matches_inflections(stemmed_index):
    from lucene_ray.search.query import PhraseQuery, bool_query
    from lucene_ray.search.searcher import IndexSearcher

    d, t = stemmed_index
    s = IndexSearcher(d)
    assert s.token_filters == ("ascii_fold", "porter")
    # 'queries' and 'query' stem identically -> same count
    n_q = s.count(bool_query(must=["query"]))
    assert n_q > 0
    assert s.count(bool_query(must=["queries"])) == n_q
    assert s.count(bool_query(must=["querying"])) == n_q
    # phrase with inflected form matches the stemmed positions
    n_p = s.count(PhraseQuery(("data", "table")))
    assert s.count(PhraseQuery(("data", "tables"))) == n_p


def test_stemmed_index_keyword_unfiltered(stemmed_index):
    from lucene_ray.index.shard import keyword_term
    from lucene_ray.search.query import bool_query
    from lucene_ray.search.searcher import IndexSearcher

    d, t = stemmed_index
    s = IndexSearcher(d)
    # keyword value 'tool' must NOT be stemmed away on either side
    n = s.count(bool_query(filter_=[keyword_term("role", "user")]))
    roles = t.column("role").to_pylist()
    assert n == sum(1 for r in roles if r == "user")


def test_stemmed_scoring_parity_with_prestemmed_text(ray_session, tmp_path_factory):
    """Stemming at index time == stemming the raw text before a plain build:
    identical scores for the equivalent query."""
    import ray.data as rd

    from lucene_ray.analysis.standard import analyze
    from lucene_ray.index.build import build_index
    from lucene_ray.search.query import bool_query
    from lucene_ray.search.searcher import IndexSearcher
    from lucene_ray.sources.transcripts import synth_transcripts

    t = synth_transcripts(800, seed=6)
    d1 = str(tmp_path_factory.mktemp("s1"))
    build_index(rd.from_arrow(t), d1, target_docs_per_partition=400,
                token_filters=("porter",), input_desc="s1")
    texts = t.column("text").to_pylist()
    pre = [" ".join(porter_stem(w) for w in analyze(x)) if x else "" for x in texts]
    t2 = t.set_column(t.column_names.index("text"), "text",
                      pa.array(pre, type=pa.string()))
    d2 = str(tmp_path_factory.mktemp("s2"))
    build_index(rd.from_arrow(t2), d2, target_docs_per_partition=400,
                input_desc="s2")
    s1, s2 = IndexSearcher(d1), IndexSearcher(d2)
    for terms, kind in [(["query", "merges"], "should"), (["data"], "must")]:
        q = bool_query(**{kind: terms})
        # d2 is unfiltered over pre-stemmed text: query with the stems
        q2 = bool_query(**{kind: [porter_stem(t) for t in terms]})
        td1 = s1.search(q, k=20)
        td2 = s2.search(q2, k=20)
        assert [(h.gid, h.score) for h in td1.hits] == \
            [(h.gid, h.score) for h in td2.hits]
        assert td1.total_hits == td2.total_hits
