"""Char filters + alternate tokenizers (`analysis/charfilter/`,
`analysis/core/WhitespaceTokenizer` et al.): reference-traced fixtures and
an end-to-end chain build."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.analysis.chars import (
    apply_char_filters_str,
    compile_char_filter,
    html_strip,
    split_text_stages,
    tokenize_column_alt,
    tokenize_text,
)


def test_html_strip_reference_shapes():
    # inline elements deleted, block-level replaced by \n
    assert html_strip("a<b>bold</b>c") == "aboldc"
    assert html_strip("one<div>two</div>three") == "one\ntwo\nthree"
    assert html_strip("line<br>break") == "line\nbreak"
    # script/style bodies dropped (block replacement)
    assert html_strip("x<script>var a=1;</script>y") == "x\ny"
    assert html_strip("x<style>.c{}</style>y") == "x\ny"
    # comments removed entirely, CDATA unwrapped, bang removed
    assert html_strip("a<!-- hidden -->b") == "ab"
    assert html_strip("a<![CDATA[kept <raw>]]>b") == "akept <raw>b"
    assert html_strip("<!DOCTYPE html>hi") == "hi"
    # entities: named + decimal + hex; unknown left alone
    assert html_strip("x &amp; y &lt;z&gt;") == "x & y <z>"
    assert html_strip("&#65;&#x42;") == "AB"
    assert html_strip("&bogus123;") == "&bogus123;"
    # attributes and self-closing tags
    assert html_strip('<img src="a.png"/>pic') == "pic"
    assert html_strip('<p class="x">t</p>') == "\nt\n"


def test_mapping_char_filter_longest_match():
    f = compile_char_filter("char:map:a=b;aa=x")
    # NormalizeCharMap greedy longest match: "aaa" -> "aa"->x then "a"->b
    assert f("aaa") == "xb"
    assert f("caat") == "cxt"
    f2 = compile_char_filter("char:map:ph=f")
    assert f2("phone graph") == "fone graf"


def test_pattern_char_filter():
    f = compile_char_filter("char:pattern:[0-9]+=#")
    assert f("ab12cd345") == "ab#cd#"


def test_split_text_stages():
    chars, tok, rest = split_text_stages(
        ("char:html_strip", "lowercase", "tokenizer:whitespace", "porter"))
    assert chars == ("char:html_strip",)
    assert tok == "whitespace"
    assert rest == ("lowercase", "porter")
    with pytest.raises(ValueError):
        split_text_stages(("tokenizer:a", "tokenizer:b"))


def test_whitespace_tokenizer_java_semantics():
    # NBSP is NOT Java whitespace (unlike Python's str.split)
    assert tokenize_text("a\xa0b c", "whitespace") == ["a\xa0b", "c"]
    assert tokenize_text("Foo  Bar\tbaz\n", "whitespace") == ["Foo", "Bar", "baz"]
    # maxTokenLen=255: longer runs split
    toks = tokenize_text("x" * 600, "whitespace")
    assert [len(t) for t in toks] == [255, 255, 90]


def test_letter_keyword_path_tokenizers():
    assert tokenize_text("ab12cd éf", "letter") == ["ab", "cd", "éf"]
    assert tokenize_text("One Two", "keyword") == ["One Two"]
    assert tokenize_text("/a/b/c", "path_hierarchy") == ["/a", "/a/b", "/a/b/c"]
    assert tokenize_text("a/b", "path_hierarchy") == ["a", "a/b"]
    assert tokenize_text("x.y.z", "path_hierarchy:.") == ["x", "x.y", "x.y.z"]


def test_tokenize_column_alt_matches_per_string():
    rng = np.random.default_rng(5)
    words = ["Foo", "BAR", "a\xa0b", "x" * 300, "éclair", "", "one two\tthree"]
    rows = [" ".join(rng.choice(words, size=rng.integers(0, 6)).tolist())
            for _ in range(200)] + [None]
    col = pa.array(rows, type=pa.string())
    for tok in ("whitespace", "letter"):
        lengths, flat = tokenize_column_alt(col, tok)
        want = [tokenize_text(r, tok) if r else [] for r in rows]
        assert lengths.tolist() == [len(w) for w in want]
        assert flat.to_pylist() == [t for w in want for t in w]


def test_end_to_end_chain(ray_session, tmp_path):
    """char:map + whitespace tokenizer + lowercase through build_index and
    the searcher (query terms normalized by the same 1:1 chain)."""
    import ray.data as rd

    from lucene_ray.index.build import build_index
    from lucene_ray.search.query import PhraseQuery, TermQuery
    from lucene_ray.search.searcher import IndexSearcher
    from lucene_ray.sources.transcripts import synth_transcripts

    n = 1200
    t = synth_transcripts(n, seed=71)
    st = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    d = str(tmp_path / "chainidx")
    chain = ("char:map:fast=quick", "tokenizer:whitespace", "lowercase")
    build_index(rd.from_arrow(st), d, target_docs_per_partition=300,
                token_filters=chain, input_desc="chainsynth")
    s = IndexSearcher(d)
    texts = st.column("text").to_pylist()
    mapped = [(x or "").replace("fast", "quick").split(" ") for x in texts]
    n_quick = sum(1 for m in mapped if "quick" in m)
    assert s.count(TermQuery("quick")) == n_quick
    assert s.count(TermQuery("fast")) == 0
    # positions survive the alternate tokenizer (phrase works)
    want_ph = sum(1 for m in mapped
                  if any(m[i] == "quick" and m[i + 1] == "table"
                         for i in range(len(m) - 1)))
    assert s.count(PhraseQuery(("quick", "table"))) == want_ph
    # query-side normalization: the lowercase 1:1 stage applies to terms
    assert s.count(TermQuery("QUICK")) == n_quick


def test_html_strip_then_standard_search(ray_session, tmp_path):
    import ray.data as rd

    from lucene_ray.index.build import build_index
    from lucene_ray.search.query import TermQuery
    from lucene_ray.search.searcher import IndexSearcher

    rows = pa.table({
        "conv_id": pa.array([f"conv-{i:08d}" for i in range(4)]),
        "turn_idx": pa.array([0, 0, 0, 0], type=pa.int32()),
        "text": pa.array([
            "<p>Hello <b>World</b></p>",
            "plain hello",
            "<script>hello = 1;</script>goodbye",
            "say &amp; hello",
        ]),
    })
    d = str(tmp_path / "htmlidx")
    build_index(rd.from_arrow(rows), d, target_docs_per_partition=10,
                token_filters=("char:html_strip",), input_desc="html")
    s = IndexSearcher(d)
    assert s.count(TermQuery("hello")) == 3        # script body stripped
    assert s.count(TermQuery("world")) == 1
    assert s.count(TermQuery("script")) == 0


def test_uax29_url_email_tokenizer():
    """UAX29URLEmailTokenizer shapes (reference TestUAX29URLEmailTokenizer):
    URLs and emails survive as single tokens amid normal UAX#29 words."""
    from lucene_ray.analysis.chars import tokenize_text

    t = tokenize_text("mail bob@example.com or visit https://x.y/z?a=1&b=2.",
                      "uax29_url_email")
    assert t == ["mail", "bob@example.com", "or", "visit",
                 "https://x.y/z?a=1&b=2"]
    t = tokenize_text("see www.example.co.uk/path, thanks", "uax29_url_email")
    assert t == ["see", "www.example.co.uk/path", "thanks"]
    # plain text falls through to standard UAX#29 behavior
    assert tokenize_text("state-of-the-art 3.14", "uax29_url_email") == \
        ["state", "of", "the", "art", "3.14"]
    # dotted local part + subdomains
    assert tokenize_text("first.last@sub.domain.org!", "uax29_url_email") == \
        ["first.last@sub.domain.org"]
    # ftp scheme, no trailing strip inside the path
    assert tokenize_text("ftp://h/p.q,", "uax29_url_email") == ["ftp://h/p.q"]


def test_uax29_url_email_column_and_chain():
    import numpy as np
    import pyarrow as pa

    from lucene_ray.analysis.chars import tokenize_column_alt

    col = pa.array(["ping a@b.co now", "", "no urls here"])
    lens, flat = tokenize_column_alt(col, "uax29_url_email")
    assert lens.tolist() == [3, 0, 3]
    assert flat.to_pylist()[:3] == ["ping", "a@b.co", "now"]


def test_uax29_url_email_indexed(ray_session, tmp_path):
    """End-to-end: an index built with tokenizer:uax29_url_email serves the
    email as one searchable (lowercased) term."""
    import pyarrow as pa
    import ray.data as rd

    from lucene_ray.index.build import build_index
    from lucene_ray.search.query import TermQuery
    from lucene_ray.search.searcher import IndexSearcher

    t = pa.table({
        "conv_id": pa.array([f"conv-{i:08d}" for i in range(8)]),
        "turn_idx": pa.array([0] * 8, type=pa.int32()),
        "text": pa.array([f"Contact Bob@Example.com about doc{i}"
                          for i in range(8)]),
    })
    d = str(tmp_path / "uidx")
    build_index(rd.from_arrow(t), d, target_docs_per_partition=4,
                input_desc="uax",
                token_filters=("tokenizer:uax29_url_email", "lowercase"))
    s = IndexSearcher(d)
    assert s.count(TermQuery("bob@example.com")) == 8
    assert s.count(TermQuery("contact")) == 8
    assert s.count(TermQuery("example")) == 0       # not split
