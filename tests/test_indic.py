"""Indic / Hindi normalization (`analysis/in/IndicNormalizer.java`,
`analysis/hi/HindiNormalizer.java`) — TestIndicNormalizer +
TestHindiNormalizer vectors + the HindiAnalyzer preset chain."""

import numpy as np

from lucene_ray.analysis.filters import ANALYZER_PRESETS, run_token_chain
from lucene_ray.analysis.indic import hindi_normalize, indic_normalize


def test_indic_normalizer_reference_vectors():
    cases = [
        ("अाॅअाॅ", "ऑऑ"), ("अाॆअाॆ", "ऒऒ"), ("अाेअाे", "ओओ"),
        ("अाैअाै", "औऔ"), ("अाअा", "आआ"), ("अाैर", "और"),
        ("ত্‍", "ৎ"),                         # bengali khanda-ta
    ]
    for inp, want in cases:
        assert indic_normalize(inp) == want, (inp, want)
    assert indic_normalize("") == ""
    assert indic_normalize("plain ascii") == "plain ascii"


def test_hindi_normalizer_reference_vectors():
    basics = ["अँगरेज़ी", "अँगरेजी", "अँग्रेज़ी", "अँग्रेजी",
              "अंगरेज़ी", "अंगरेजी", "अंग्रेज़ी", "अंग्रेजी"]
    for w in basics:
        assert hindi_normalize(w) == "अंगरेजि"
    cases = [
        ("क़िताब", "किताब"), ("फ़र्ज़", "फरज"), ("क़र्ज़", "करज"),
        ("ऱऴख़ग़ड़ढ़य़", "रळखगडढय"),
        ("शार्‍मा", "शारमा"), ("शार्‌मा", "शारमा"),
        ("ॅॆॉॊऍऎऑऒॲ", "ेेोोएएओओअ"),
        ("आईऊॠॡऐऔीूॄॣैौ", "अइउऋऌएओिुृॢेो"),
    ]
    for inp, want in cases:
        assert hindi_normalize(inp) == want, (inp, want)
    assert hindi_normalize("") == ""


def test_hindi_preset_chain():
    chain = ANALYZER_PRESETS["hindi"]
    assert chain == ("decimal_digit", "indic_normalize", "hindi_normalize",
                     "stop:hindi", "hindi")
    # HindiAnalyzer end-to-end shape: stopword removed, normalized + stemmed
    flat, lens, pos, norms = run_token_chain(
        ["अंग्रेज़ी", "अत", "किताबें"], np.array([3]), chain)
    got = list(np.asarray(flat, dtype=object))
    assert "अत" not in got          # stopword (from the reference list)
    assert len(got) == 2
    # stop gap: surviving third token keeps position 2
    assert pos is None or list(pos) == [0, 2]
