"""Classic n-gram SpellChecker (`suggest/.../spell/SpellChecker.java`):
gram-field construction, BM25-under-omitted-norms retrieval, the
suggestSimilar re-rank loop (accuracy tightening, SuggestMode gates,
SuggestWordQueue comparator), distributed store stats, and e2e over the
flagship index."""

import math

import pytest

SF = "/root/testdata/sf0.001"

WORDS = ["merge", "merged", "merges", "marge", "mergers", "range",
         "ranges", "orange", "sorting", "sorted", "abcde", "abcdf",
         "xyzzy", "join", "joins", "joint"]


@pytest.fixture(scope="module")
def store(ray_session, tmp_path_factory):
    import ray.data as rd

    from lucene_ray.search.spellchecker import build_spell_store

    out = str(tmp_path_factory.mktemp("spell") / "store")
    ds = rd.from_items([{"word": w, "freq": i + 1}
                        for i, w in enumerate(WORDS)])
    meta = build_spell_store(ds, out, num_buckets=4)
    return out, meta


def test_gram_bounds():
    from lucene_ray.search.spellchecker import form_grams, get_max, get_min

    # getMin/getMax per the reference switch
    assert (get_min(3), get_max(3)) == (1, 2)
    assert (get_min(4), get_max(4)) == (1, 2)
    assert (get_min(5), get_max(5)) == (2, 3)
    assert (get_min(6), get_max(6)) == (3, 4)
    assert (get_min(12), get_max(12)) == (3, 4)
    assert form_grams("merge", 2) == ["me", "er", "rg", "ge"]
    assert form_grams("ab", 3) == []


def test_field_stats_match_recount(store):
    from lucene_ray.search.spellchecker import (
        _word_rows,
        form_grams,
        get_max,
        get_min,
    )

    _, meta = store
    # independent recount of docCount / sumTTF per gram field
    expect = {}
    for w in WORDS:
        if len(w) < 3:
            continue
        for ng in range(get_min(len(w)), get_max(len(w)) + 1):
            grams = form_grams(w, ng)
            if not grams:
                continue
            for f, n in ((f"gram{ng}", len(grams)), (f"start{ng}", 1),
                         (f"end{ng}", 1)):
                dc, ttf = expect.get(f, (0, 0))
                expect[f] = (dc + 1, ttf + n)
    got = {f: (v["doc_count"], v["ttf"]) for f, v in meta["fields"].items()}
    assert got == expect
    # _word_rows aggregates duplicate grams into wfreq
    rows = dict(((f, g), c) for f, g, c in _word_rows("xyzzy"))
    assert rows[("gram2", "zz")] == 1 and rows[("gram2", "yz")] == 1


def test_retrieval_bm25_hand_case(store):
    """One clause scored by hand: BM25 with norm length 1.0 over the
    store's own collection stats must equal the module's score."""
    from lucene_ray.search.spellchecker import SpellChecker

    out, meta = store
    sc = SpellChecker(out)
    # single-gram pseudo-query via the private retrieval on a word whose
    # clause set we control: "abc" -> gram1(a,b,c)+gram2(ab,bc)+start/end
    got = dict((w, s) for w, s, _ in sc._retrieve("abcde", 10_000))
    # recompute for candidate "abcdf" independently
    clauses = [("start2", "ab", 2.0), ("end2", "de", 1.0),
               ("gram2", "ab", 1.0), ("gram2", "bc", 1.0),
               ("gram2", "cd", 1.0), ("gram2", "de", 1.0),
               ("start3", "abc", 2.0), ("end3", "cde", 1.0),
               ("gram3", "abc", 1.0), ("gram3", "bcd", 1.0),
               ("gram3", "cde", 1.0)]
    # df per (field, gram) over the dictionary
    from lucene_ray.search.spellchecker import (
        _word_rows,
    )

    posts = {}
    for w in WORDS:
        for f, g, c in _word_rows(w):
            posts.setdefault((f, g), {})[w] = c
    score = 0.0
    for f, g, b in clauses:
        plist = posts.get((f, g), {})
        if "abcdf" not in plist:
            continue
        st = SpellChecker(out).field_stats[f]
        n, ttf = st["doc_count"], st["ttf"]
        idf = math.log(1.0 + (n - len(plist) + 0.5) / (len(plist) + 0.5))
        w8 = b * idf
        c_ = 1.0 / (1.2 * ((1 - 0.75) + 0.75 * 1.0 / (ttf / n)))
        freq = plist["abcdf"] if f.startswith("gram") else 1.0
        score += w8 - w8 / (1.0 + freq * c_)
    assert got["abcdf"] == pytest.approx(score, rel=1e-9)


def _gram_candidates(q):
    """Candidate set = dictionary words sharing at least one indexed
    (field, gram) with the query's clauses — exactly the reach of the
    reference's SHOULD query over the spell index."""
    from lucene_ray.search.spellchecker import (
        _word_rows,
        form_grams,
        get_max,
        get_min,
    )

    qkeys = set()
    for ng in range(get_min(len(q)), get_max(len(q)) + 1):
        grams = form_grams(q, ng)
        if not grams:
            continue
        qkeys.add((f"start{ng}", grams[0]))
        qkeys.add((f"end{ng}", grams[-1]))
        qkeys.update((f"gram{ng}", g) for g in grams)
    return [w for w in WORDS
            if any((f, g) in qkeys for f, g, _ in _word_rows(w))]


def test_suggest_matches_brute_rerank(store):
    """With maxHits covering the vocabulary, the result is exactly the
    distance re-rank over every gram-sharing candidate — retrieval
    truncation can't bite, so the loop semantics are isolated."""
    from lucene_ray.search.lookups import levenshtein_distance
    from lucene_ray.search.spellchecker import SpellChecker

    out, _ = store
    sc = SpellChecker(out)
    for q in ("mrege", "rang", "joon", "abcdx"):
        got = sc.suggest_similar(q, 50)    # 10*50 >> vocab
        cands = [w for w in _gram_candidates(q)
                 if w != q and levenshtein_distance(q, w) >= 0.5]
        cands.sort(key=lambda w: (-levenshtein_distance(q, w), w))
        assert got == cands and got


def test_queue_accuracy_tightening(store):
    """Once the queue holds num_sug entries the running accuracy rises to
    the queue minimum (SpellChecker.java:392-396): weaker candidates that
    clear the base accuracy are still rejected."""
    from lucene_ray.search.lookups import levenshtein_distance
    from lucene_ray.search.spellchecker import SpellChecker

    out, _ = store
    sc = SpellChecker(out)
    got = sc.suggest_similar("merg", 2)
    best = sorted((w for w in _gram_candidates("merg") if w != "merg"
                   and levenshtein_distance("merg", w) >= 0.5),
                  key=lambda w: (-levenshtein_distance("merg", w), w))[:2]
    assert got == best == ["merge", "marge"]


class _StubSearcher:
    def __init__(self, freqs):
        self.freqs = freqs

    def count(self, q):
        return self.freqs.get(q.term, 0)


def test_suggest_modes(store):
    from lucene_ray.search.spellchecker import (
        SUGGEST_MORE_POPULAR,
        SUGGEST_WHEN_NOT_IN_INDEX,
        SpellChecker,
    )

    out, _ = store
    sc = SpellChecker(out)
    s = _StubSearcher({"merge": 10, "merges": 3, "merged": 30})
    # word present in the user index -> itself
    assert sc.suggest_similar("merge", 5, s, "text",
                              SUGGEST_WHEN_NOT_IN_INDEX) == ["merge"]
    # MORE_POPULAR: only candidates with freq >= the word's own freq
    got = sc.suggest_similar("merge", 5, s, "text", SUGGEST_MORE_POPULAR)
    assert got and all(s.freqs.get(w, 0) >= 10 for w in got)
    assert "merged" in got and "merges" not in got
    # candidates absent from the user index (freq < 1) are dropped
    got = sc.suggest_similar("mrege", 5, s, "text",
                             SUGGEST_WHEN_NOT_IN_INDEX)
    assert set(got) <= {"merge", "merges", "merged"}


def test_queue_comparator_freq_and_string(store):
    """Equal distance -> higher user-index freq first; equal freq ->
    lexicographically smaller word first (the REVERSED third criterion
    ends as word-ascending in the final list)."""
    from lucene_ray.search.spellchecker import (
        SUGGEST_ALWAYS,
        SpellChecker,
    )

    out, _ = store
    sc = SpellChecker(out)
    s = _StubSearcher({"joins": 1, "joint": 99})
    got = sc.suggest_similar("joinx", 2, s, "text", SUGGEST_ALWAYS)
    # SUGGEST_ALWAYS nulls the searcher (reference override): freq = 0,
    # and join/joins/joint all sit at distance 0.8 -> word-ascending
    assert got == ["join", "joins"]
    got = sc.suggest_similar("joinx", 2, s, "text", "when_not_in_index")
    # freq now from the user index: joint (99) outranks joins (1)
    assert got == ["joint", "joins"]


def test_exist(store):
    from lucene_ray.search.spellchecker import SpellChecker

    out, _ = store
    sc = SpellChecker(out)
    assert sc.exist("merge") and not sc.exist("mrege")


def test_stage_batch(store, ray_session):
    import ray.data as rd

    from lucene_ray.search.spellchecker import SpellCheckStage

    out, _ = store
    ds = rd.from_items([{"word": "mrege"}, {"word": "rang"}])
    res = ds.map_batches(SpellCheckStage,
                         fn_constructor_kwargs={"store_dir": out},
                         batch_format="pyarrow", concurrency=1).take_all()
    by = {r["word"]: r["suggestion"] for r in res}
    # marge and merge tie at distance 0.6; word-ascending wins
    assert by["mrege"] == "marge"
    assert by["rang"] == "range"


def test_index_dictionary_e2e(ray_session, tmp_path):
    """Store built from the flagship index's own term dictionary; a
    transposition of a common term resolves back to it."""
    from lucene_ray.pipelines.flagship import build_transcript_index
    from lucene_ray.search.query import TermQuery
    from lucene_ray.search.searcher import IndexSearcher
    from lucene_ray.search.spellchecker import (
        SUGGEST_WHEN_NOT_IN_INDEX,
        SpellChecker,
        build_spell_store,
    )

    idx = build_transcript_index(SF)
    out = str(tmp_path / "spell")
    build_spell_store(idx, out)
    s = IndexSearcher(idx)
    sc = SpellChecker(out)
    assert s.count(TermQuery("merge")) > 0
    got = sc.suggest_similar("mrege", 5, s, "text",
                             SUGGEST_WHEN_NOT_IN_INDEX)
    assert got and got[0] == "merge"
    # a word the index contains suggests itself
    assert sc.suggest_similar("merge", 5, s, "text",
                              SUGGEST_WHEN_NOT_IN_INDEX) == ["merge"]


def test_frequency_comparator(store):
    """setComparator(SuggestWordFrequencyComparator): queue order and the
    final list become freq-first (SuggestWordFrequencyComparator.java:24-46),
    the accuracy tightening still reads the queue top's SCORE."""
    from lucene_ray.search.spellchecker import (
        COMPARATOR_FREQUENCY,
        SUGGEST_WHEN_NOT_IN_INDEX,
        SpellChecker,
    )

    out, _ = store
    freqs = {"merge": 100, "merged": 50, "merges": 2, "marge": 1}
    s = _StubSearcher(freqs)
    sc_score = SpellChecker(out)
    sc_freq = SpellChecker(out, comparator=COMPARATOR_FREQUENCY)
    # query "mergd" (len 5): candidates merge 0.8 / merged 0.8333 /
    # merges 0.6667 / marge 0.6 (mergers freq 0 -> dropped by the mode)
    # score comparator: distance first
    assert sc_score.suggest_similar(
        "mergd", 3, s, "text", SUGGEST_WHEN_NOT_IN_INDEX) == \
        ["merged", "merge", "merges"]
    # frequency comparator: user-index freq first, same survivor set
    assert sc_freq.suggest_similar(
        "mergd", 3, s, "text", SUGGEST_WHEN_NOT_IN_INDEX) == \
        ["merge", "merged", "merges"]
