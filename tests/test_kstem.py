"""KStem (Krovetz) stemmer — EXACT on the reference's full 12,130-pair
test vocabulary (`analysis/common/src/test/.../en/kstemTestData.zip`,
TestKStemmer.testVocabulary) + filter-chain and preset wiring."""

import gzip
import os

import numpy as np

from lucene_ray.analysis.filters import STEMMERS, run_token_chain
from lucene_ray.analysis.kstem import kstem

DATA = os.path.join(os.path.dirname(__file__), "data",
                    "kstem_examples.txt.gz")


def test_kstem_full_reference_vocabulary():
    n = 0
    with gzip.open(DATA, "rt") as f:
        for line in f:
            parts = line.split()
            if len(parts) != 2:
                continue
            w, want = parts
            assert kstem(w) == want, (w, want, kstem(w))
            n += 1
    assert n == 12130


def test_kstem_behavior_families():
    # dictionary headwords pass through (dogs is a headword)
    assert kstem("dogs") == "dogs"
    # direct conflations
    assert kstem("aging") == "age" and kstem("fled") == "flee"
    # country/nationality conflations
    assert kstem("italians") == "italy" and kstem("french") == "france"
    # exception words keep their -e
    assert kstem("suite") == "suite"
    # suffix families with dictionary check
    assert kstem("amplification") == "amplify"
    # dictionary headwords win over suffix rules (definition is a headword)
    assert kstem("definition") == "definition"
    assert kstem("optimal") == "optimum"
    assert kstem("injunctive") == "injunction"
    # non-alpha / short / long terms pass through
    assert kstem("a1") == "a1" and kstem("ab") == "ab"
    assert kstem("x" * 60) == "x" * 60


def test_kstem_token_chain_stage():
    flat, lens, pos, norms = run_token_chain(
        ["generosity", "aging", "quickly", "spark"], np.array([4]),
        ("kstem",))
    assert list(np.asarray(flat)) == ["generous", "age", "quick", "spark"]
    assert "kstem" in STEMMERS          # keyword_marker protection applies
    flat2, *_ = run_token_chain(
        ["aging"], np.array([1]), ("keyword_marker:aging", "kstem"))
    assert list(np.asarray(flat2)) == ["aging"]
