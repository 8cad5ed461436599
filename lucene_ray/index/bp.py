"""Recursive-graph-bisection document reordering (BP).

Re-implements the published algorithm of Dhulipala, Kabiljo, Karrer,
Ottaviano, Pupyrev & Shalita, "Compressing Graphs and Indexes with
Recursive Graph Bisection" (KDD 2016) — the technique behind Lucene's
later BPIndexReorderer — from the paper: recursively split the shard's
docs in two halves and iteratively swap the pair of documents whose move
most reduces the expected posting-gap code length

    cost(f, n) = f * log2((n + 1) / (f + 1))

(f = term's doc frequency inside the half, n = half size), until no
positive-gain swap remains or ``max_iters`` passes ran.  Docs that share
terms end up adjacent, so postings deltas shrink and the PFor blocks get
narrower bit widths.

Scale shape: the reorder runs INSIDE each shard's flush task over that
shard's own (doc, term) incidence — embarrassingly parallel across
shards, no extra shuffle, no driver state.  Cost per shard is
O(nnz * log(n_docs) * iters) vectorized numpy.
"""

from __future__ import annotations

import numpy as np

MIN_PARTITION_SIZE = 32      # stop splitting below this many docs
MAX_ITERS = 20               # swap passes per bisection level
MIN_DOC_FREQ = 2             # singleton terms cannot change gap costs


def _cost(f: np.ndarray, n: int) -> np.ndarray:
    """Expected bits to encode one half's postings of each term: f docs out
    of n, ~log2((n+1)/(f+1)) bits per gap (the paper's cost model).  f is
    clipped at 0: the f-1 probe of a term with no docs in that half is
    never selected by a real mover, its value just must not be nan/inf."""
    f = np.maximum(f, 0)
    return f * np.log2((n + 1.0) / (f + 1.0))


def _bisect(order: np.ndarray, lo: int, hi: int,
            doc_ptr: np.ndarray, doc_terms: np.ndarray,
            max_iters: int) -> None:
    """Reorder order[lo:hi] in place: split into halves, swap-optimize,
    recurse.  ``doc_ptr``/``doc_terms`` is the full doc->term-id CSR."""
    n = hi - lo
    if n < MIN_PARTITION_SIZE:
        return
    half = n // 2
    docs = order[lo:hi]
    # node-local incidence, term ids renumbered to a dense local range
    counts = (doc_ptr[docs + 1] - doc_ptr[docs]).astype(np.int64)
    idx = _gather_ranges(doc_ptr, docs)
    terms = doc_terms[idx]
    local_terms, terms = np.unique(terms, return_inverse=True)
    n_terms = len(local_terms)
    owner = np.repeat(np.arange(n, dtype=np.int64), counts)
    in_left = np.zeros(n, dtype=bool)
    in_left[:half] = True
    for _ in range(max_iters):
        tl = np.bincount(terms[in_left[owner]], minlength=n_terms)
        tr = np.bincount(terms[~in_left[owner]], minlength=n_terms)
        # per-term gain of moving ONE incident doc across, per direction
        base = _cost(tl, half) + _cost(tr, n - half)
        g_l2r = base - (_cost(tl - 1, half) + _cost(tr + 1, n - half))
        g_r2l = base - (_cost(tl + 1, half) + _cost(tr - 1, n - half))
        contrib = np.where(in_left[owner], g_l2r[terms], g_r2l[terms])
        gains = np.zeros(n, dtype=np.float64)
        np.add.at(gains, owner, contrib)
        left_i = np.nonzero(in_left)[0]
        right_i = np.nonzero(~in_left)[0]
        lo_order = left_i[np.argsort(-gains[left_i], kind="stable")]
        ro_order = right_i[np.argsort(-gains[right_i], kind="stable")]
        m = min(len(lo_order), len(ro_order))
        pair_gain = gains[lo_order[:m]] + gains[ro_order[:m]]
        n_swap = int(np.searchsorted(-pair_gain, 0.0, side="left"))
        if n_swap == 0:
            break
        in_left[lo_order[:n_swap]] = False
        in_left[ro_order[:n_swap]] = True
    new_local = np.concatenate((np.nonzero(in_left)[0],
                                np.nonzero(~in_left)[0]))
    order[lo:hi] = docs[new_local]
    _bisect(order, lo, lo + half, doc_ptr, doc_terms, max_iters)
    _bisect(order, lo + half, hi, doc_ptr, doc_terms, max_iters)


def _gather_ranges(ptr: np.ndarray, docs: np.ndarray) -> np.ndarray:
    """Concatenate [ptr[d], ptr[d+1]) index ranges for docs, vectorized."""
    starts = ptr[docs]
    counts = ptr[docs + 1] - starts
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    out = np.ones(total, dtype=np.int64)
    seg = np.concatenate(([0], np.cumsum(counts)[:-1])).astype(np.int64)
    nz = counts > 0
    out[seg[nz]] = starts[nz]
    prev_end = (starts + counts - 1)[nz][:-1]
    out[seg[nz][1:]] -= prev_end      # jump from previous range's last
    return np.cumsum(out)


def bp_permutation(lengths: np.ndarray, flat_terms,
                   max_iters: int = MAX_ITERS,
                   min_doc_freq: int = MIN_DOC_FREQ) -> np.ndarray:
    """Permutation of local docIDs that clusters docs sharing terms.

    ``lengths[d]`` = token count of doc d; ``flat_terms`` = the docs'
    tokens concatenated (any array pyarrow can dictionary-encode).  The
    (doc, term) incidence is deduplicated, and terms with df <
    ``min_doc_freq`` are dropped (they cannot affect gap costs — the
    reference BPIndexReorderer's minDocFreq role)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    n_docs = len(lengths)
    if n_docs < MIN_PARTITION_SIZE:
        return np.arange(n_docs, dtype=np.int64)
    lengths = np.asarray(lengths, dtype=np.int64)
    arr = flat_terms
    if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = pa.array(arr)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    enc = pc.dictionary_encode(arr)
    tids = np.asarray(enc.indices, dtype=np.int64)
    owner = np.repeat(np.arange(n_docs, dtype=np.int64), lengths)
    # dedup (doc, term) incidence
    key = owner * (tids.max() + 1 if len(tids) else 1) + tids
    uniq = np.unique(key)
    owner = uniq // (tids.max() + 1 if len(tids) else 1)
    tids = uniq - owner * (tids.max() + 1 if len(tids) else 1)
    # drop rare terms
    df = np.bincount(tids) if len(tids) else np.zeros(0, np.int64)
    keep = df[tids] >= min_doc_freq
    owner, tids = owner[keep], tids[keep]
    # doc->terms CSR over ALL docs (term-less docs keep empty ranges)
    deg = np.bincount(owner, minlength=n_docs)
    doc_ptr = np.concatenate(([0], np.cumsum(deg))).astype(np.int64)
    ord_ = np.argsort(owner, kind="stable")
    doc_terms = tids[ord_]
    order = np.arange(n_docs, dtype=np.int64)
    _bisect(order, 0, n_docs, doc_ptr, doc_terms, max_iters)
    return order
