"""Opt-in token filters: ASCII folding and Porter stemming.

- :func:`porter_stem` — the original Porter algorithm (M.F. Porter, 1980,
  "An algorithm for suffix stripping"), Release-3 semantics as kept by the
  reference (`analysis/common/.../en/PorterStemmer.java`, used by
  `en/PorterStemFilter.java`).  Re-implemented from the published algorithm;
  validated token-for-token against Martin Porter's official 23,531-word
  test vocabulary (tests/test_filters.py).
- :func:`ascii_fold` — accent/ligature folding to ASCII
  (`analysis/common/.../miscellaneous/ASCIIFoldingFilter.java` semantics for
  the Latin-script core): NFKD decomposition with combining marks stripped,
  plus the non-decomposable special ligatures/letters the reference maps
  explicitly.  Exotic punctuation/symbol mappings of the reference's full
  table are intentionally out of scope (documented divergence).

Filters plumb through the index build (``build_index(token_filters=...)``)
and are recorded in the commit, so ``IndexSearcher`` applies the same chain
to query terms — index and query sides always agree, like sharing one
Analyzer.
"""

from __future__ import annotations

import unicodedata

import numpy as np

_VOWELS = set("aeiou")


def _is_cons(b: str, i: int) -> bool:
    c = b[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return True if i == 0 else not _is_cons(b, i - 1)
    return True


def _measure(b: str, j: int) -> int:
    """Number of VC sequences in b[0:j+1] (the m of [C](VC)^m[V])."""
    n = 0
    i = 0
    # skip initial consonants
    while True:
        if i > j:
            return n
        if not _is_cons(b, i):
            break
        i += 1
    i += 1
    while True:
        while True:
            if i > j:
                return n
            if _is_cons(b, i):
                break
            i += 1
        i += 1
        n += 1
        while True:
            if i > j:
                return n
            if not _is_cons(b, i):
                break
            i += 1
        i += 1


def _vowel_in_stem(b: str, j: int) -> bool:
    return any(not _is_cons(b, i) for i in range(j + 1))


def _double_cons(b: str, j: int) -> bool:
    return j >= 1 and b[j] == b[j - 1] and _is_cons(b, j)


def _cvc(b: str, i: int) -> bool:
    """consonant-vowel-consonant ending at i, last consonant not w/x/y."""
    if i < 2 or not _is_cons(b, i) or _is_cons(b, i - 1) or not _is_cons(b, i - 2):
        return False
    return b[i] not in "wxy"


def porter_stem(word: str) -> str:
    b = word
    if len(b) <= 2:
        return b

    # ---- step 1a ----
    if b.endswith("s"):
        if b.endswith("sses"):
            b = b[:-2]
        elif b.endswith("ies"):
            b = b[:-2]
        elif not b.endswith("ss"):
            b = b[:-1]

    # ---- step 1b ----
    extra = False
    if b.endswith("eed"):
        if _measure(b, len(b) - 4) > 0:
            b = b[:-1]
    elif b.endswith("ed") and _vowel_in_stem(b, len(b) - 3):
        b = b[:-2]
        extra = True
    elif b.endswith("ing") and _vowel_in_stem(b, len(b) - 4):
        b = b[:-3]
        extra = True
    if extra:
        if b.endswith(("at", "bl", "iz")):
            b = b + "e"
        elif _double_cons(b, len(b) - 1):
            if b[-1] not in "lsz":
                b = b[:-1]
        elif _measure(b, len(b) - 1) == 1 and _cvc(b, len(b) - 1):
            b = b + "e"

    # ---- step 1c ----
    if b.endswith("y") and _vowel_in_stem(b, len(b) - 2):
        b = b[:-1] + "i"

    # ---- helper for suffix-map steps ----
    def _replace(b: str, pairs, min_m=0):
        for suf, rep in pairs:
            if b.endswith(suf):
                j = len(b) - len(suf) - 1
                if j >= 0 and _measure(b, j) > min_m:
                    return b[: j + 1] + rep, True
                return b, True        # matched suffix: stop scanning
        return b, False

    # ---- step 2 (m > 0) ----
    b, _ = _replace(b, [
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
        ("anci", "ance"), ("izer", "ize"), ("bli", "ble"),
        ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
        ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
        ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
        ("biliti", "ble"), ("logi", "log"),
    ])

    # ---- step 3 (m > 0) ----
    b, _ = _replace(b, [
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ])

    # ---- step 4 (m > 1) ----
    matched = False
    for suf in ("al", "ance", "ence", "er", "ic", "able", "ible", "ant",
                "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti",
                "ous", "ive", "ize"):
        if b.endswith(suf):
            j = len(b) - len(suf) - 1
            if suf == "ion":
                if j >= 0 and b[j] in "st" and _measure(b, j) > 1:
                    b = b[: j + 1]
            elif j >= 0 and _measure(b, j) > 1:
                b = b[: j + 1]
            matched = True
            break
    del matched

    # ---- step 5a ----
    if b.endswith("e"):
        m = _measure(b, len(b) - 2)
        if m > 1 or (m == 1 and not _cvc(b, len(b) - 2)):
            b = b[:-1]

    # ---- step 5b ----
    if b.endswith("ll") and _measure(b, len(b) - 1) > 1:
        b = b[:-1]

    return b


# non-decomposable Latin letters/ligatures the reference maps explicitly
_FOLD_SPECIAL = {
    "æ": "ae", "Æ": "AE", "œ": "oe", "Œ": "OE", "ß": "ss",
    "ð": "d", "Ð": "D", "ø": "o", "Ø": "O", "þ": "th", "Þ": "TH",
    "đ": "d", "Đ": "D", "ħ": "h", "Ħ": "H", "ı": "i", "ĸ": "q",
    "ł": "l", "Ł": "L", "ŋ": "n", "Ŋ": "N", "ŧ": "t", "Ŧ": "T",
    "ƀ": "b", "ǥ": "g", "ȝ": "yogh",
}


def ascii_fold(s: str) -> str:
    if s.isascii():
        return s
    out = []
    for ch in s:
        if ord(ch) < 128:
            out.append(ch)
            continue
        sp = _FOLD_SPECIAL.get(ch)
        if sp is not None:
            out.append(sp)
            continue
        dec = unicodedata.normalize("NFKD", ch)
        kept = "".join(c for c in dec if not unicodedata.combining(c) and ord(c) < 128)
        out.append(kept if kept else ch)
    return "".join(out)


def english_minimal_stem(word: str) -> str:
    """EnglishMinimalStemFilter (`analysis/en/EnglishMinimalStemFilter.java`
    → `EnglishMinimalStemmer.java`): strip a plural -s unless the word ends
    in -us/-ss/-s preceded by nothing, length > 2."""
    if len(word) < 3 or not word.endswith("s"):
        return word
    if word.endswith(("us", "ss")):
        return word
    return word[:-1]


def reverse_token(word: str) -> str:
    """ReverseStringFilter (`analysis/reverse/ReverseStringFilter.java`):
    leading-wildcard support via a reversed-token field."""
    return word[::-1]


FILTERS = {
    "ascii_fold": ascii_fold,
    "porter": porter_stem,
    "english_minimal": english_minimal_stem,
    "reverse": reverse_token,
}


def _make_truncate(n: int):
    return lambda w: w[:n]

# Lucene's EnglishAnalyzer default stop set
# (`analysis/en/EnglishAnalyzer.java` ENGLISH_STOP_WORDS_SET)
ENGLISH_STOP = ("a an and are as at be but by for if in into is it no not of "
                "on or such that the their then there these they this to was "
                "will with").split()


def resolve_one2one(spec: str):
    """Filter callable for a 1:1 spec (named or parameterized like
    ``truncate:N``); None for graph stages."""
    f = FILTERS.get(spec)
    if f is not None:
        return f
    if spec.startswith("truncate:"):
        return _make_truncate(int(spec.split(":")[1]))
    return None


def apply_filters_str(term: str, names) -> str:
    """Query-side chain: only 1:1 per-term filters apply (graph stages —
    stop/syn/shingle/ngram/length — are index-side rewrites; query terms hit
    the already rewritten dictionary directly, like Lucene's multi-term
    queries bypassing analysis)."""
    for n in names:
        f = resolve_one2one(n)
        if f is not None:
            term = f(term)
    return term


def apply_filters_column(flat, names):
    """Apply a 1:1 filter chain to a flat token array, vectorized through the
    Arrow dictionary: the chain runs once per DISTINCT token, then a `take`
    scatters — vocabulary is tiny next to token count.  Returns pa.Array."""
    import pyarrow as pa

    if not names:
        return flat
    if not isinstance(flat, (pa.Array, pa.ChunkedArray)):
        flat = pa.array(np.asarray(flat, dtype=object), type=pa.string())
    denc = pa.compute.dictionary_encode(flat)
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    mapped = [apply_filters_str(t, names) for t in denc.dictionary.to_pylist()]
    return pa.array(mapped, type=pa.string()).take(denc.indices)


def _parse_stop(spec: str) -> list[str]:
    body = spec[len("stop:"):]
    return ENGLISH_STOP if body == "english" else body.split(",")


def _parse_syn(spec: str) -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    for rule in spec[len("syn:"):].split(";"):
        if rule:
            src, alts = rule.split("=")
            out[src] = alts.split("|")
    return out


def run_token_chain(flat, lengths: np.ndarray, specs):
    """Position-aware analyzer chain — the TokenStream graph semantics of the
    reference's filter zoo for the supported stages, vectorized over the
    whole shard's flat token stream:

    - 1:1 filters (``ascii_fold``, ``porter``) — dictionary-vectorized.
    - ``stop:w1,w2,...`` / ``stop:english`` — StopFilter
      (`analysis/core/StopFilter.java`) with enablePositionIncrements:
      removed tokens leave position GAPS, so phrases do not match across a
      removed stopword; norms count only surviving tokens.
    - ``syn:src=alt1|alt2;...`` — SynonymGraphFilter
      (`analysis/synonym/SynonymGraphFilter.java:1-616`) for single-token →
      single-token rules: alternatives are emitted at the SAME position
      (posInc 0) and, per the IndexingChain overlap discount
      (`index/IndexingChain.java:1151-1188`), do not count toward the norm.
      Multi-word rules (posLen > 1) are out of scope (documented divergence).
    - ``shingle`` — ShingleFilter(2,2) with outputUnigrams
      (`analysis/shingle/ShingleFilter.java:1-555`): a ``"a b"`` token per
      strictly-consecutive position pair, emitted at the first constituent's
      position as an overlap (no filler tokens across stop gaps —
      documented divergence from the ``_`` filler).

    Returns (flat pa.Array doc-major/position-sorted, tok_counts int64[],
    positions int32[] | None, norm_lengths int64[]).  positions is None when
    only 1:1 stages ran (all increments 1, the fast path)."""
    import pyarrow as pa

    one2one = [s for s in specs if resolve_one2one(s) is not None]
    graph = [s for s in specs if resolve_one2one(s) is None]
    if one2one:
        # leading 1:1 stages run dictionary-vectorized before any graph stage
        lead = []
        for s in specs:
            if resolve_one2one(s) is not None:
                lead.append(s)
            else:
                break
        flat = apply_filters_column(flat, lead)
        rest = specs[len(lead):]
    else:
        rest = specs
    if not graph:
        return flat, lengths, None, lengths

    if not isinstance(flat, (pa.Array, pa.ChunkedArray)):
        flat = pa.array(np.asarray(flat, dtype=object), type=pa.string())
    toks = np.asarray(flat, dtype=object)
    n_docs = len(lengths)
    doc = np.repeat(np.arange(n_docs, dtype=np.int64), lengths)
    starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    pos = (np.arange(len(toks)) - np.repeat(starts, lengths)).astype(np.int32)
    incr = np.ones(len(toks), dtype=bool)

    for spec in rest:
        if resolve_one2one(spec) is not None:
            toks = np.asarray(apply_filters_column(
                pa.array(toks, type=pa.string()), (spec,)), dtype=object)
        elif spec.startswith("length:"):
            # LengthFilter (`analysis/miscellaneous/LengthFilter.java`):
            # out-of-bounds tokens drop, leaving position gaps
            lo_n, hi_n = (int(x) for x in spec.split(":")[1].split("-"))
            ln = np.array([len(w) for w in toks], dtype=np.int64)
            keep = (ln >= lo_n) & (ln <= hi_n)
            toks, doc, pos, incr = toks[keep], doc[keep], pos[keep], incr[keep]
        elif spec.startswith("stop:"):
            keep = ~np.isin(toks, np.asarray(_parse_stop(spec), dtype=object))
            toks, doc, pos, incr = toks[keep], doc[keep], pos[keep], incr[keep]
        elif spec.startswith("syn:"):
            add_t, add_d, add_p = [], [], []
            for src, alts in _parse_syn(spec).items():
                hit = np.nonzero((toks == src) & incr)[0]
                for alt in alts:
                    add_t.append(np.full(len(hit), alt, dtype=object))
                    add_d.append(doc[hit])
                    add_p.append(pos[hit])
            if add_t:
                toks = np.concatenate((toks, *add_t))
                doc = np.concatenate((doc, *add_d))
                pos = np.concatenate((pos, *add_p))
                incr = np.concatenate((incr, np.zeros(sum(map(len, add_t)), bool)))
        elif spec.startswith(("edge_ngram:", "ngram:")):
            # EdgeNGramTokenFilter / NGramTokenFilter
            # (`analysis/ngram/EdgeNGramTokenFilter.java`,
            # `analysis/ngram/NGramTokenFilter.java`) with preserveOriginal:
            # grams are posInc-0 overlays at the source token's position and
            # don't count toward norms; a gram equal to the whole token is
            # skipped (the original already stands).  Vectorized through the
            # distinct-token dictionary: grams are computed once per VOCAB
            # entry, then scattered to occurrences.
            edge = spec.startswith("edge_ngram:")
            lo_n, hi_n = (int(x) for x in spec.split(":")[1].split("-"))
            occ = np.nonzero(incr)[0]
            uniq, inv = np.unique(toks[occ].astype(str), return_inverse=True)
            gram_lists = []
            for w in uniq:
                gs = []
                for n in range(lo_n, min(hi_n, len(w) - 1) + 1):
                    if edge:
                        gs.append(w[:n])
                    else:
                        gs.extend(w[i:i + n] for i in range(len(w) - n + 1))
                gram_lists.append(gs)
            gcounts = np.array([len(g) for g in gram_lists], dtype=np.int64)
            gflat = np.array([g for gs in gram_lists for g in gs], dtype=object)
            goffs = np.concatenate(([0], np.cumsum(gcounts)))
            per_occ = gcounts[inv]
            total = int(per_occ.sum())
            if total:
                within = np.arange(total) - np.repeat(
                    np.cumsum(per_occ) - per_occ, per_occ)
                val_idx = np.repeat(goffs[inv], per_occ) + within
                toks = np.concatenate((toks, gflat[val_idx]))
                doc = np.concatenate((doc, np.repeat(doc[occ], per_occ)))
                pos = np.concatenate((pos, np.repeat(pos[occ], per_occ)))
                incr = np.concatenate((incr, np.zeros(total, bool)))
        elif spec == "shingle":
            # pair ORIGINAL tokens at strictly-consecutive positions in the
            # same doc (stream order = doc-major position order for incr
            # tokens at this point)
            oi = np.nonzero(incr)[0]
            o = oi[np.lexsort((pos[oi], doc[oi]))]
            adj = (doc[o][1:] == doc[o][:-1]) & (pos[o][1:] == pos[o][:-1] + 1)
            a, b = o[:-1][adj], o[1:][adj]
            if len(a):
                big = np.array([f"{x} {y}" for x, y in zip(toks[a], toks[b])],
                               dtype=object)
                toks = np.concatenate((toks, big))
                doc = np.concatenate((doc, doc[a]))
                pos = np.concatenate((pos, pos[a]))
                incr = np.concatenate((incr, np.zeros(len(a), bool)))
        elif spec.startswith("minhash:"):
            # MinHashFilter (`analysis/minhash/MinHashFilter.java`): consume
            # the whole token stream per doc and emit only its K minimum
            # distinct 64-bit hashes as hex tokens (the hashCount=1,
            # hashSetSize=K variant, emitted at stream end) — indexing these
            # makes Jaccard-similar docs share terms, so near-dup candidate
            # pairs fall out of ordinary term queries.
            import pyarrow as _pa

            from ..util.hashing import fnv1a64

            k_mh = int(spec.split(":")[1])
            h = fnv1a64(_pa.array(toks, type=_pa.string()))
            order_mh = np.lexsort((h, doc))
            dd, hh = doc[order_mh], h[order_mh]
            if len(dd):
                first = np.ones(len(dd), dtype=bool)
                first[1:] = (dd[1:] != dd[:-1]) | (hh[1:] != hh[:-1])
                dd, hh = dd[first], hh[first]
                grp = np.concatenate(([True], dd[1:] != dd[:-1]))
                gs = np.nonzero(grp)[0]
                glen = np.diff(np.concatenate((gs, [len(dd)])))
                rank = np.arange(len(dd)) - np.repeat(gs, glen)
                keep_mh = rank < k_mh
                dd, hh, rank = dd[keep_mh], hh[keep_mh], rank[keep_mh]
            toks = np.array([format(int(x), "016x") for x in hh], dtype=object)
            doc = dd
            pos = rank.astype(np.int32) if len(dd) else np.zeros(0, np.int32)
            incr = np.ones(len(dd), dtype=bool)
        else:
            raise ValueError(f"unknown token filter spec: {spec}")

    order = np.lexsort((pos, doc))       # stable: overlays stay after originals
    toks, doc, pos, incr = toks[order], doc[order], pos[order], incr[order]
    tok_counts = np.bincount(doc, minlength=n_docs).astype(np.int64)
    norm_lengths = np.bincount(doc[incr], minlength=n_docs).astype(np.int64)
    return pa.array(toks, type=pa.string()), tok_counts, pos, norm_lengths
