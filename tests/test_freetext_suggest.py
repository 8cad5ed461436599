"""FreeTextSuggester (stupid-backoff n-gram LM): hand-computed trigram /
backoff / prefix-filter semantics on a tiny corpus, plus the SQL-green
pipeline shape."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.pipelines.suggesters import (
    freetext_lookup,
    suggest_freetext,
    train_freetext,
)

DOCS = [
    "merge join wins",
    "merge join loses",
    "merge sort wins",
    "the merge join",
    "join wins big",
]


@pytest.fixture(scope="module")
def tiny_model(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("ft")
    pq.write_table(pa.table({"doc_id": list(range(len(DOCS))),
                             "text": DOCS}), str(d / "documents.parquet"))
    return train_freetext(str(d), max_order=3)


def test_ngram_counts(tiny_model):
    c = tiny_model["counts"]
    S = "\x1e"
    assert c[1]["merge"] == 4 and c[1]["join"] == 4 and c[1]["wins"] == 3
    assert c[2][f"merge{S}join"] == 3 and c[2][f"merge{S}sort"] == 1
    assert c[3][f"merge{S}join{S}wins"] == 1
    assert tiny_model["totals"][1] == sum(len(t.split()) for t in DOCS)


def test_trigram_context_scores(tiny_model):
    # context "merge join" → trigram candidates wins/loses at 1/3 each,
    # then backoff fills other words at lower weight
    got = dict(freetext_lookup(tiny_model, "merge join ", k=10))
    assert got["wins"] == pytest.approx(1 / 3)
    assert got["loses"] == pytest.approx(1 / 3)
    # with an ENDED last token the unigram order is skipped (the
    # reference's empty-fragment rule), so only words actually seen
    # after 'join' arrive via the bigram backoff
    assert "sort" not in got
    # 'join' is only ever followed by wins/loses, both already offered by
    # the trigram order, so nothing else appears
    assert set(got) == {"wins", "loses"}


def test_backoff_keeps_higher_order_score(tiny_model):
    # "join" follows "merge" 3/4 of the time (bigram); the unigram backoff
    # must NOT overwrite that with 0.4 * 4/16
    got = dict(freetext_lookup(tiny_model, "merge ", k=10))
    assert got["join"] == pytest.approx(3 / 4)
    assert got["sort"] == pytest.approx(1 / 4)


def test_prefix_filter(tiny_model):
    # trailing partial token filters candidates by prefix
    got = freetext_lookup(tiny_model, "merge jo", k=10)
    assert [w for w, _ in got] == ["join"]
    got = freetext_lookup(tiny_model, "merge w", k=10)
    # 'wins' only via backoff under context 'merge' (no bigram merge→w...)
    assert [w for w, _ in got] == ["wins"]


def test_unseen_context_backs_off_to_unigrams(tiny_model):
    # ended token + unseen context: every order with a non-empty fragment
    # fails and the unigram order is skipped -> NO suggestions (the
    # reference's behavior for "zzz ")
    assert freetext_lookup(tiny_model, "zzz ", k=3) == []
    # an unseen context WITH a live fragment still backs off to unigrams
    got = freetext_lookup(tiny_model, "zzz m", k=3)
    assert [w for w, _ in got] == ["merge"]


def test_max_grams_cap(ray_session, tmp_path):
    pq.write_table(pa.table({"doc_id": list(range(len(DOCS))),
                             "text": DOCS}), str(tmp_path / "documents.parquet"))
    capped = train_freetext(str(tmp_path), max_order=2,
                            max_grams_per_order=3)
    assert all(len(capped["counts"][o]) <= 3 for o in capped["counts"])
    # the cap keeps the highest-count grams
    full = train_freetext(str(tmp_path), max_order=2)
    top_uni = sorted(full["counts"][1].items(),
                     key=lambda x: (-x[1], x[0]))[:3]
    assert capped["counts"][1] == dict(top_uni)


def test_pipeline_shape(ray_session):
    df = suggest_freetext("/root/testdata/sf0.001", contexts=("the",), k=5)
    assert list(df.columns) == ["context", "rank", "term", "score"]
    assert len(df) == 5 and (df["rank"] == [1, 2, 3, 4, 5]).all()
    assert df["score"].is_monotonic_decreasing


def test_fuzz_lookup_vs_brute_backoff(ray_session, tmp_path):
    """Random corpora: freetext_lookup equals an independent brute-force
    stupid-backoff implementation (trigram model, prefix filters)."""
    import numpy as np

    rng = np.random.default_rng(41)
    vocab = ["aa", "ab", "abc", "b", "bc", "c", "ca"]
    docs = [" ".join(rng.choice(vocab, size=int(rng.integers(3, 12))))
            for _ in range(30)]
    pq.write_table(pa.table({"doc_id": list(range(len(docs))),
                             "text": docs}), str(tmp_path / "documents.parquet"))
    model = train_freetext(str(tmp_path), max_order=3)
    S = "\x1e"

    def brute(text, k=6, alpha=0.4):
        toks = text.split()
        prefix = ""
        if text and not text[-1].isspace() and toks:
            prefix, toks = toks[-1], toks[:-1]
        out = {}
        backoff = 0
        for order in range(min(3, len(toks) + 1), 0, -1):
            if order == 1 and not prefix and text:
                continue               # ended token: unigram order skipped
            ctx = S.join(toks[len(toks) - (order - 1):])
            denom = (model["counts"][order - 1].get(ctx, 0) if order > 1
                     else model["totals"][1])
            if denom:
                pre = ctx + S if ctx else ""
                for gram, c in model["counts"][order].items():
                    if not gram.startswith(pre):
                        continue
                    w = gram[len(pre):]
                    if S in w or (prefix and not w.startswith(prefix)):
                        continue
                    out.setdefault(w, (alpha ** backoff) * c / denom)
            backoff += 1
        return sorted(out.items(), key=lambda x: (-x[1], x[0]))[:k]

    queries = ["aa ", "aa ab ", "b c ", "zz ", "aa a", "ca b", "abc aa a"]
    for _ in range(15):
        queries.append(" ".join(rng.choice(vocab,
                                           size=int(rng.integers(1, 4)))) + " ")
    for qtext in queries:
        assert freetext_lookup(model, qtext, k=6) == brute(qtext), qtext


def test_freetext_reference_basic_vectors(ray_session, tmp_path):
    """TestFreeTextSuggester.testBasic, transcribed: the two-doc corpus,
    bigram scores, unigram backoff at ALPHA=0.4, and the exact printed
    fractions."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.pipelines.suggesters import freetext_lookup, train_freetext

    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": pa.array(["foo bar baz blah", "boo foo bar foo bee"]),
    }), str(tmp_path / "documents.parquet"))
    model = train_freetext(str(tmp_path), max_order=2)

    def fmt(got):
        return " ".join(f"{w}/{s:.2f}" for w, s in got)

    # bigram model + unigram backoff
    assert fmt(freetext_lookup(model, "foo b", 10)) == \
        "bar/0.67 bee/0.33 baz/0.04 blah/0.04 boo/0.04"
    # bigram only
    assert fmt(freetext_lookup(model, "foo ", 10)) == "bar/0.67 bee/0.33"
    # unigram only (trailing partial token)
    assert fmt(freetext_lookup(model, "foo", 10)) == "foo/0.33"
    assert fmt(freetext_lookup(model, "b", 10)) == \
        "bar/0.22 baz/0.11 bee/0.11 blah/0.11 boo/0.11"
