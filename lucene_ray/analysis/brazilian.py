"""Brazilian Portuguese stemmer
(`analysis/br/BrazilianStemmer.java:17-1144`, `BrazilianStemFilter.java`)
— the legacy ordered-rule stemmer (distinct from RSLP and Snowball PT,
both also in this repo): accent folding (changeTerm), R1/R2/RV regions
computed ONCE from the folded term, then step1 (noun/adjective suffixes
gated on a region match, first hit wins), step2 (verb suffixes in RV),
step3/4/5 residuals.  The rule tables below are extracted from the
reference in source order, including its quirks (the unassigned
`replaceSuffix` result for "logias", the duplicated "iu" row) for
bug-compatible parity.
"""

from __future__ import annotations

_STEP1 = (
    ('uciones', 'R2', None, 'replace', 'u'),
    ('imentos', 'R2', None, 'remove', None),
    ('amentos', 'R2', None, 'remove', None),
    ('adores', 'R2', None, 'remove', None),
    ('adoras', 'R2', None, 'remove', None),
    ('logias', 'R2', None, 'nop', 'log'),
    ('encias', 'R2', None, 'replace', 'ente'),
    ('amente', 'R1', None, 'remove', None),
    ('idades', 'R2', None, 'remove', None),
    ('acoes', 'R2', None, 'remove', None),
    ('imento', 'R2', None, 'remove', None),
    ('amento', 'R2', None, 'remove', None),
    ('adora', 'R2', None, 'remove', None),
    ('ismos', 'R2', None, 'remove', None),
    ('istas', 'R2', None, 'remove', None),
    ('logia', 'R2', None, 'replace', 'log'),
    ('ucion', 'R2', None, 'replace', 'u'),
    ('encia', 'R2', None, 'replace', 'ente'),
    ('mente', 'R2', None, 'remove', None),
    ('idade', 'R2', None, 'remove', None),
    ('acao', 'R2', None, 'remove', None),
    ('ezas', 'R2', None, 'remove', None),
    ('icos', 'R2', None, 'remove', None),
    ('icas', 'R2', None, 'remove', None),
    ('ismo', 'R2', None, 'remove', None),
    ('avel', 'R2', None, 'remove', None),
    ('ivel', 'R2', None, 'remove', None),
    ('ista', 'R2', None, 'remove', None),
    ('osos', 'R2', None, 'remove', None),
    ('osas', 'R2', None, 'remove', None),
    ('ador', 'R2', None, 'remove', None),
    ('ivas', 'R2', None, 'remove', None),
    ('ivos', 'R2', None, 'remove', None),
    ('iras', 'RV', 'e', 'replace', 'ir'),
    ('eza', 'R2', None, 'remove', None),
    ('ico', 'R2', None, 'remove', None),
    ('ica', 'R2', None, 'remove', None),
    ('oso', 'R2', None, 'remove', None),
    ('osa', 'R2', None, 'remove', None),
    ('iva', 'R2', None, 'remove', None),
    ('ivo', 'R2', None, 'remove', None),
    ('ira', 'RV', 'e', 'replace', 'ir'),
)

_STEP2 = (
    'issemos',
    'essemos',
    'assemos',
    'ariamos',
    'eriamos',
    'iriamos',
    'iremos',
    'eremos',
    'aremos',
    'avamos',
    'iramos',
    'eramos',
    'aramos',
    'asseis',
    'esseis',
    'isseis',
    'arieis',
    'erieis',
    'irieis',
    'irmos',
    'iamos',
    'armos',
    'ermos',
    'areis',
    'ereis',
    'ireis',
    'asses',
    'esses',
    'isses',
    'astes',
    'assem',
    'essem',
    'issem',
    'ardes',
    'erdes',
    'irdes',
    'ariam',
    'eriam',
    'iriam',
    'arias',
    'erias',
    'irias',
    'estes',
    'istes',
    'areis',
    'aveis',
    'aria',
    'eria',
    'iria',
    'asse',
    'esse',
    'isse',
    'aste',
    'este',
    'iste',
    'arei',
    'erei',
    'irei',
    'aram',
    'eram',
    'iram',
    'avam',
    'arem',
    'erem',
    'irem',
    'ando',
    'endo',
    'indo',
    'arao',
    'erao',
    'irao',
    'adas',
    'idas',
    'aras',
    'eras',
    'iras',
    'avas',
    'ares',
    'eres',
    'ires',
    'ados',
    'idos',
    'amos',
    'emos',
    'imos',
    'iras',
    'ieis',
    'ada',
    'ida',
    'ara',
    'era',
    'ira',
    'iam',
    'ado',
    'ido',
    'ias',
    'ais',
    'eis',
    'ira',
    'ear',
    'ia',
    'ei',
    'am',
    'em',
    'ar',
    'er',
    'ir',
    'as',
    'es',
    'is',
    'eu',
    'iu',
    'iu',
    'ou',
)


_PUNCT = set("\"'-,;.?!")
_FOLD = {"\u00e1": "a", "\u00e2": "a", "\u00e3": "a",
         "\u00e9": "e", "\u00ea": "e",
         "\u00ed": "i",
         "\u00f3": "o", "\u00f4": "o", "\u00f5": "o",
         "\u00fa": "u", "\u00fc": "u",
         "\u00e7": "c", "\u00f1": "n"}


def _get_r1(value):
    """Region after the first non-vowel following a vowel
    (`BrazilianStemmer.java getR1`; note the i = len-1 bound: a suffix
    region never includes the last char unless strictly interior)."""
    if value is None:
        return None
    i = len(value) - 1
    j = 0
    while j < i and value[j] not in "aeiou":
        j += 1
    if not j < i:
        return None
    while j < i and value[j] in "aeiou":
        j += 1
    if not j < i:
        return None
    return value[j + 1:]


def _get_rv(value):
    """`BrazilianStemmer.java getRV`."""
    if value is None:
        return None
    i = len(value) - 1
    if i > 0 and value[1] not in "aeiou":
        j = 2
        while j < i and value[j] not in "aeiou":
            j += 1
        if j < i:
            return value[j + 1:]
    if i > 1 and value[0] in "aeiou" and value[1] in "aeiou":
        j = 2
        while j < i and value[j] in "aeiou":
            j += 1
        if j < i:
            return value[j + 1:]
    if i > 2:
        return value[3:]
    return None


def _suffix(value, suf):
    return value is not None and len(suf) <= len(value) \
        and value.endswith(suf)


def _remove(value, suf):
    return value[:-len(suf)] if _suffix(value, suf) else value


def _change_term(term):
    return "".join(_FOLD.get(ch, ch) for ch in term.lower())


def _create_ct(term):
    ct = _change_term(term)
    if len(ct) < 2:
        return ct
    if ct[0] in _PUNCT:
        ct = ct[1:]
    if len(ct) < 2:
        return ct
    if ct[-1] in _PUNCT:
        ct = ct[:-1]
    return ct


def brazilian_stem(term: str) -> str | None:
    """BrazilianStemmer.stem: None = not indexable (the filter keeps the
    original term then); otherwise the stemmed (accent-folded) form."""
    ct = _create_ct(term)
    if not (2 < len(ct) < 30):
        return None
    if not ct.isalpha():
        return ct
    r1 = _get_r1(ct)
    r2 = _get_r1(r1)
    rv = _get_rv(ct)

    regions = {"R1": r1, "R2": r2, "RV": rv}

    def step1():
        nonlocal ct
        for suf, region, preceded, action, repl in _STEP1:
            if _suffix(ct, suf) and _suffix(regions[region], suf):
                if preceded is not None and not _suffix(
                        _remove(ct, suf), preceded):
                    continue
                if action == "remove":
                    ct = _remove(ct, suf)
                elif action == "replace":
                    ct = _remove(ct, suf) + repl
                # "nop": the reference discards the replaceSuffix result
                return True
        return False

    def step2():
        nonlocal ct
        if rv is None:
            return False
        for suf in _STEP2:
            if _suffix(rv, suf):
                ct = _remove(ct, suf)
                return True
        return False

    altered = step1()
    if not altered:
        altered = step2()
    if altered:
        # step3
        if _suffix(rv, "i") and _suffix(_remove(rv, "i"), "c"):
            ct = _remove(ct, "i")
    else:
        # step4
        for suf in ("os", "a", "i", "o"):
            if _suffix(rv, suf):
                ct = _remove(ct, suf)
                break
    # step5
    if _suffix(rv, "e"):
        if _suffix(_remove(rv, "e"), "gu"):
            ct = _remove(_remove(ct, "e"), "u")
        elif _suffix(_remove(rv, "e"), "ci"):
            ct = _remove(_remove(ct, "e"), "i")
        else:
            ct = _remove(ct, "e")
    return ct


def brazilian_stem_filter(term: str) -> str:
    """BrazilianStemFilter.incrementToken: replace the term only when the
    stemmer returns a different non-null stem."""
    s = brazilian_stem(term)
    if s is not None and s != term:
        return s
    return term
