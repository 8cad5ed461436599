"""Phonetic encoders (analysis/phonetic module): published test vectors
(National Archives Soundex examples, commons-codec RefinedSoundex values,
Kölner-Phonetik reference encodings, the Caverphone 2.0 revision's own
examples) plus sound-alike equivalence pairs and end-to-end index use."""

import pytest

from lucene_ray.analysis.phonetic import (
    caverphone2,
    cologne,
    metaphone,
    nysiis,
    refined_soundex,
    soundex,
)


def test_soundex_archives_vectors():
    # National Archives and Records Administration examples
    assert soundex("Washington") == "W252"
    assert soundex("Lee") == "L000"
    assert soundex("Gutierrez") == "G362"
    assert soundex("Pfister") == "P236"       # F after same-code P collapses
    assert soundex("Jackson") == "J250"
    assert soundex("Tymczak") == "T522"       # vowel separates same codes
    assert soundex("Ashcraft") == "A261"      # H transparency
    assert soundex("Robert") == soundex("Rupert") == "R163"
    assert soundex("VanDeusen") == "V532"


def test_soundex_equiv_pairs():
    assert soundex("Smith") == soundex("Smyth")
    assert soundex("Ashcraft") == soundex("Ashcroft")


def test_refined_soundex_commons_codec_vectors():
    assert refined_soundex("testing") == "T6036084"
    assert refined_soundex("TESTING") == "T6036084"
    assert refined_soundex("The") == "T60"
    assert refined_soundex("quick") == "Q503"
    assert refined_soundex("brown") == "B1908"
    assert refined_soundex("fox") == "F205"
    assert refined_soundex("lazy") == "L7050"
    assert refined_soundex("dogs") == "D6043"


def test_cologne_reference_vectors():
    assert cologne("Müller-Lüdenscheidt") == "65752682"
    assert cologne("Breschnew") == "17863"
    assert cologne("Wikipedia") == "3412"
    assert cologne("Meyer") == cologne("Maier")       # classic equivalence


def test_nysiis_vectors():
    assert nysiis("KNIGHT") == "NAGT"
    assert nysiis("MITCHELL") == "MATCAL"
    assert nysiis("knight") == "NAGT"                 # case-insensitive


def test_caverphone2_spec_examples():
    # examples from the Caverphone 2.0 revision document
    assert caverphone2("Peter") == "PTA1111111"
    assert caverphone2("Stevenson") == "STFNSN1111"
    assert len(caverphone2("x")) == 10                # always padded to 10


def test_metaphone_rules():
    # hand-derived from the published rule table
    assert metaphone("Philip") == "FLP"               # PH → F
    assert metaphone("Wright") == "RT"                # initial WR → R, GH silent
    assert metaphone("night") == "NT"                 # GH before T silent
    assert metaphone("Knuth") == "N0"                 # initial KN → N, TH → 0
    assert metaphone("Xavier") == "SFR"               # initial X → S, V → F
    assert metaphone("box") == "BKS"                  # X → KS
    assert metaphone("judge") == "JJ"                 # DGE → J
    assert metaphone("school") == "SKL"               # SCH → SK
    assert metaphone("music") == "MSK"                # final C → K
    assert metaphone("nation") == "NXN"               # TIO → X
    assert metaphone("rite") == metaphone("Wright")   # sound-alike


def test_apostrophe_filter():
    from lucene_ray.analysis.filters import apostrophe_strip

    assert apostrophe_strip("istanbul'da") == "istanbul"
    assert apostrophe_strip("türkiye’nin") == "türkiye"
    assert apostrophe_strip("plain") == "plain"


def test_filter_registry_and_index(ray_session, tmp_path):
    import ray.data as rd

    from lucene_ray.analysis.filters import FILTERS, apply_filters_str
    from lucene_ray.index.build import build_index
    from lucene_ray.search.query import TermQuery
    from lucene_ray.search.searcher import IndexSearcher
    from lucene_ray.sources.transcripts import synth_transcripts

    for name in ("soundex", "refined_soundex", "metaphone", "cologne",
                 "nysiis", "caverphone2"):
        assert name in FILTERS
    assert apply_filters_str("smith", ("soundex",)) == "S530"
    # an index built with the soundex chain matches sound-alike queries:
    # query-side normalization applies the same chain
    t = synth_transcripts(400, seed=11)
    d = str(tmp_path / "phidx")
    build_index(rd.from_arrow(t), d, target_docs_per_partition=200,
                token_filters=("soundex",), input_desc="phonetic")
    s = IndexSearcher(d)
    n_merge = s.count(TermQuery("merge"))
    assert n_merge > 0
    assert s.count(TermQuery("mirge")) == n_merge     # M620 == M620


def test_double_metaphone_reference_vectors():
    """Lucene TestDoubleMetaphoneFilter vectors + classic published pairs."""
    from lucene_ray.analysis.phonetic import double_metaphone as dm

    assert dm("international") == ("ANTR", "ANTR")
    assert dm("international", 8) == ("ANTRNXNL", "ANTRNXNL")
    assert dm("Kuczewski") == ("KSSK", "KXFS")
    assert dm("hello") == ("HL", "HL")
    assert dm("12345") == ("", "")
    assert dm("smith") == ("SM0", "XMT")
    assert dm("schmidt") == ("XMT", "SMT")
    assert dm("jose") == ("HS", "HS")
    assert dm("catherine") == ("K0RN", "KTRN")
    assert dm("gough") == ("KF", "KF")
    assert dm("knight") == ("NT", "NT")


def test_double_metaphone_chain_stage():
    """Primary replaces; differing alternate overlays posInc-0; unencodable
    tokens pass through (DoubleMetaphoneFilter inject=false)."""
    import numpy as np
    import pyarrow as pa

    from lucene_ray.analysis.filters import run_token_chain

    flat = pa.array(["smith", "hello", "12345"])
    out, lens, pos, norms = run_token_chain(
        flat, np.array([3], dtype=np.int64), ("double_metaphone",))
    assert out.to_pylist() == ["SM0", "XMT", "HL", "12345"]
    assert np.asarray(pos).tolist() == [0, 0, 1, 2]
    assert norms.tolist() == [3]


def test_daitch_mokotoff_reference_vectors():
    """The reference TestDaitchMokotoffSoundexFilter vectors, including the
    branch EMISSION ORDER for the ambiguous 'ccc'."""
    from lucene_ray.analysis.phonetic import daitch_mokotoff as dms

    assert dms("aaa") == ["000000"]
    assert dms("bbb") == ["700000"]
    assert dms("ccc") == ["400000", "450000", "454000",
                          "540000", "545000", "500000"]
    assert dms("easgasg") == ["045450"]
    assert dms("12345") == []


def test_dm_soundex_chain_stage():
    import numpy as np
    import pyarrow as pa

    from lucene_ray.analysis.filters import run_token_chain

    flat = pa.array(["bbb", "ccc", "12345"])
    out, lens, pos, norms = run_token_chain(
        flat, np.array([3], dtype=np.int64), ("dm_soundex",))
    got = out.to_pylist()
    # position-sorted stream: bbb's code, then ccc's six codes, then the
    # pass-through token
    assert got[0] == "700000"
    assert got[1:7] == ["400000", "450000", "454000",
                        "540000", "545000", "500000"]
    assert got[7] == "12345"
    assert np.asarray(pos).tolist() == [0, 1, 1, 1, 1, 1, 1, 2]
    assert norms.tolist() == [3]
