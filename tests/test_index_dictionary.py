"""Index-fed suggester dictionaries (`suggest/.../LuceneDictionary.java`,
`suggest/.../spell/HighFrequencyDictionary.java`): term set and weights vs
an independent recount from the corpus; threshold semantics."""

from collections import Counter

import pytest
import ray.data as rd

from lucene_ray.analysis.standard import analyze
from lucene_ray.index.build import build_index
from lucene_ray.search.suggest import Suggester, build_suggester_from_index
from lucene_ray.sources.transcripts import synth_transcripts


@pytest.fixture(scope="module")
def dict_index(ray_session, tmp_path_factory):
    t = synth_transcripts(600, seed=31)
    d = str(tmp_path_factory.mktemp("dict_idx"))
    build_index(rd.from_arrow(t), d, target_docs_per_partition=200,
                keyword_cols=("role",), input_desc="dict600")
    df = Counter()
    for txt in t.column("text").to_pylist():
        for tok in set(analyze(txt or "")):
            df[tok] += 1
    return d, df, t.num_rows


def test_lucene_dictionary_all_terms(dict_index, tmp_path_factory):
    d, df, _ = dict_index
    out = str(tmp_path_factory.mktemp("sugg_all"))
    build_suggester_from_index(d, out)
    s = Suggester(out)
    # every text term present with weight = docFreq; keyword terms excluded
    total = sum(sh["rows"] for sh in s.manifest["shards"])
    assert total == len(df)
    for term in list(df)[:20]:
        hits = s.lookup(term, num=1, exact_first=True)
        assert hits and hits[0] == (term, df[term])


def test_high_frequency_threshold(dict_index, tmp_path_factory):
    d, df, n_docs = dict_index
    thresh = 0.02
    min_num = int(thresh * n_docs)
    out = str(tmp_path_factory.mktemp("sugg_hf"))
    build_suggester_from_index(d, out, min_freq=thresh)
    s = Suggester(out)
    want = {t for t, c in df.items() if c >= min_num}
    total = sum(sh["rows"] for sh in s.manifest["shards"])
    assert total == len(want)
    # a below-threshold term must not complete to itself
    rare = next(t for t, c in df.items() if c < min_num)
    assert all(surf != rare for surf, _ in s.lookup(rare, num=50))


def test_ttf_weights(dict_index, tmp_path_factory):
    import pyarrow.parquet as pq

    d, _, _ = dict_index
    out = str(tmp_path_factory.mktemp("sugg_ttf"))
    build_suggester_from_index(d, out, weight="ttf")
    s = Suggester(out)
    ts = pq.read_table(f"{d}/term_stats")
    ttf = dict(zip(ts.column("term").to_pylist(),
                   ts.column("ttf").to_pylist()))
    for term in list(ttf)[:10]:
        if "\x1f" in term:
            continue
        hits = s.lookup(term, num=1)
        assert hits and hits[0][1] == ttf[term]
