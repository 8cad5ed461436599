"""Posting-list block codec: delta + patched-FOR 128-int blocks + vint tail.

Format semantics mirror the reference codec
(`lucene/core/src/java/org/apache/lucene/codecs/lucene90/PForUtil.java:61-117`,
`ForUtil.java:32` — 128-value blocks, ≤7 patch exceptions stored as
(position, high-bits) byte pairs, all-equal short-circuit) and the per-block
competitive impacts
(`lucene/core/src/java/org/apache/lucene/codecs/CompetitiveImpactAccumulator.java:30-120`).
The byte layout itself is ours (this is not a file-format port): everything
is numpy-vectorized for use inside Ray Data `map_batches` tasks.

Per-term layout in a shard's ``postings.bin``:

    [full block 0: doc PFor | freq PFor]
    [full block 1: ...] ...
    [tail: vint deltas xN | vint freqs xN]        (N = df % 128)

A sidecar per-term skip table (kept in the term dictionary, not inline)
records for each full block: last docID, byte offset, and the competitive
impact skyline (freq, norm) pairs; the tail contributes one more skip entry.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128          # ForUtil.BLOCK_SIZE
MAX_EXCEPTIONS = 7        # PForUtil.MAX_EXCEPTIONS


def _bit_length(v: np.ndarray) -> np.ndarray:
    """Vectorized int.bit_length: frexp exponent (exact for v < 2^53 where
    float64 represents every integer; frexp(0) yields 0), scalar fallback
    for the rare huge values where float rounding could cross a power of
    two."""
    v = np.asarray(v, dtype=np.uint64)
    e = np.frexp(v.astype(np.float64))[1].astype(np.int64)
    big = v >= np.uint64(1 << 53)
    if big.any():
        e[big] = np.fromiter((int(x).bit_length() for x in v[big]),
                             dtype=np.int64, count=int(big.sum()))
    return e


# ---------------------------------------------------------------------------
# bit packing (FOR)
# ---------------------------------------------------------------------------

_BIT_W = {b: (np.uint64(1) << np.arange(b, dtype=np.uint64)) for b in range(1, 33)}


def pack_bits(vals: np.ndarray, bits: int) -> bytes:
    """Pack exactly BLOCK_SIZE values at `bits` bits each, little-endian bit order."""
    if bits == 0:
        return b""
    v = vals.astype(np.uint64)
    b = ((v[:, None] >> np.arange(bits, dtype=np.uint64)) & np.uint64(1)).astype(np.uint8)
    return np.packbits(b.reshape(-1), bitorder="little").tobytes()


def unpack_bits(buf: memoryview | bytes, bits: int, count: int = BLOCK_SIZE) -> np.ndarray:
    if bits == 0:
        return np.zeros(count, dtype=np.uint64)
    nbytes = (count * bits + 7) // 8
    raw = np.frombuffer(buf[:nbytes], dtype=np.uint8)
    bitarr = np.unpackbits(raw, count=count * bits, bitorder="little")
    return (bitarr.reshape(count, bits).astype(np.uint64) * _BIT_W[bits]).sum(axis=1)


# ---------------------------------------------------------------------------
# vectorized variable-byte ints (tail encoding)
# ---------------------------------------------------------------------------

def vint_encode(vals: np.ndarray) -> bytes:
    v = np.asarray(vals, dtype=np.uint64)
    if v.size == 0:
        return b""
    nb = np.maximum((_bit_length(v) + 6) // 7, 1)
    maxb = int(nb.max())
    cols = np.empty((len(v), maxb), dtype=np.uint8)
    for i in range(maxb):
        cols[:, i] = ((v >> np.uint64(7 * i)) & np.uint64(0x7F)).astype(np.uint8)
    idx = np.arange(maxb)
    cols |= ((idx[None, :] < (nb[:, None] - 1)) * 0x80).astype(np.uint8)
    mask = idx[None, :] < nb[:, None]
    return cols[mask].tobytes()


def vint_decode(buf: memoryview | bytes, n: int) -> tuple[np.ndarray, int]:
    """Decode n varints; returns (values, bytes_consumed)."""
    if n == 0:
        return np.zeros(0, dtype=np.uint64), 0
    raw = np.frombuffer(buf, dtype=np.uint8)
    ends = np.nonzero((raw & 0x80) == 0)[0]
    ends = ends[:n]
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    out = np.zeros(n, dtype=np.uint64)
    nb = ends - starts + 1
    for j in range(int(nb.max())):
        sel = nb > j
        out[sel] |= (raw[starts[sel] + j].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(7 * j)
    return out, int(ends[-1]) + 1


# ---------------------------------------------------------------------------
# PFor block (PForUtil.java:61-117 semantics)
# ---------------------------------------------------------------------------

def pfor_encode(vals: np.ndarray) -> bytes:
    """Encode one full block of BLOCK_SIZE positive ints."""
    assert len(vals) == BLOCK_SIZE
    v = vals.astype(np.uint64).copy()
    top8 = np.partition(v, BLOCK_SIZE - (MAX_EXCEPTIONS + 1))[-(MAX_EXCEPTIONS + 1):]
    top_value = int(top8.min())                      # 8th largest
    max_bits = int(top8.max()).bit_length()
    patched_bits = max(top_value.bit_length(), max_bits - 8)
    max_unpatched = (1 << patched_bits) - 1

    exc_pos = np.nonzero(v > max_unpatched)[0]
    assert len(exc_pos) <= MAX_EXCEPTIONS
    exc_high = (v[exc_pos] >> np.uint64(patched_bits)).astype(np.uint8)
    v[exc_pos] &= np.uint64(max_unpatched)

    out = bytearray()
    if np.all(v == v[0]) and max_bits <= 8:
        # all-equal short-circuit: token bits=0, value as vint (inline — the
        # patched value fits 8 bits, so at most 2 vint bytes)
        out.append(len(exc_pos) << 5)
        val = int(v[0])
        while val >= 0x80:
            out.append((val & 0x7F) | 0x80)
            val >>= 7
        out.append(val)
        # exceptions store the full shifted value in this mode
        exc_high = (exc_high.astype(np.uint64) << np.uint64(patched_bits)).astype(np.uint8)
    else:
        out.append((len(exc_pos) << 5) | patched_bits)
        out += pack_bits(v, patched_bits)
    for p, h in zip(exc_pos, exc_high):
        out.append(int(p))
        out.append(int(h))
    return bytes(out)


def pfor_encode_blocks(mat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized PFor encode of MANY full 128-value blocks at once (one row
    per block) — the batch twin of :func:`pfor_encode`, removing the
    per-block Python call from the big-term flush path.  Byte layout per
    row is decode-compatible (same token/packed/exception format); the only
    divergence is that the bits=0 all-equal vint short-circuit is taken
    only for exception-free rows (others emit packed form, which the
    decoder also accepts).

    Returns (payload uint8[], nbytes int64[n_rows]); row r's bytes are
    payload[row_off[r]:row_off[r+1]] with row_off = [0, cumsum(nbytes)].
    """
    B = mat.shape[0]
    if B == 0:
        return np.zeros(0, dtype=np.uint8), np.zeros(0, dtype=np.int64)
    assert mat.shape[1] == BLOCK_SIZE
    v = mat.astype(np.uint64).copy()
    part = np.partition(v, BLOCK_SIZE - (MAX_EXCEPTIONS + 1),
                        axis=1)[:, -(MAX_EXCEPTIONS + 1):]
    # the partitioned top slice is NOT sorted — reduce, don't index
    top_value = part.min(axis=1)                 # 8th largest per row
    max_bits = _bit_length(part.max(axis=1))
    patched_bits = np.maximum(_bit_length(top_value),
                              np.maximum(max_bits - 8, 0)).astype(np.int64)
    max_unpatched = (np.uint64(1) << patched_bits.astype(np.uint64)) - np.uint64(1)
    exc_mask = v > max_unpatched[:, None]
    n_exc = exc_mask.sum(axis=1).astype(np.int64)
    exc_high = (v >> patched_bits.astype(np.uint64)[:, None]).astype(np.uint8)
    v &= max_unpatched[:, None]

    vint_mode = ((v.min(axis=1) == v.max(axis=1)) & (max_bits <= 8)
                 & (n_exc == 0))
    # packed rows keep >=1 bit so the bits=0 token stays unambiguous
    bits = np.where(vint_mode, 0, np.maximum(patched_bits, 1)).astype(np.int64)
    v0 = v[:, 0]
    vlen = np.where(v0 >= 128, 2, 1).astype(np.int64)
    body = np.where(vint_mode, vlen, 16 * bits)
    nbytes = 1 + body + 2 * n_exc
    row_off = np.concatenate(([0], np.cumsum(nbytes)))
    out = np.zeros(int(row_off[-1]), dtype=np.uint8)

    out[row_off[:-1]] = ((n_exc << 5) | bits).astype(np.uint8)
    vr = np.nonzero(vint_mode)[0]
    if len(vr):
        one = vr[v0[vr] < 128]
        two = vr[v0[vr] >= 128]
        out[row_off[one] + 1] = v0[one].astype(np.uint8)
        out[row_off[two] + 1] = ((v0[two] & np.uint64(0x7F))
                                 | np.uint64(0x80)).astype(np.uint8)
        out[row_off[two] + 2] = (v0[two] >> np.uint64(7)).astype(np.uint8)
    for b in np.unique(bits[~vint_mode]):
        rows = np.nonzero(~vint_mode & (bits == b))[0]
        expanded = ((v[rows][:, :, None]
                     >> np.arange(b, dtype=np.uint64)[None, None, :])
                    & np.uint64(1)).astype(np.uint8)
        packed = np.packbits(expanded.reshape(len(rows), -1), axis=1,
                             bitorder="little")
        idx = (row_off[rows] + 1)[:, None] + np.arange(16 * int(b))
        out[idx] = packed
    er, ec = np.nonzero(exc_mask)                # row-major: ascending per row
    if len(er):
        first = np.concatenate(([0], np.cumsum(n_exc)[:-1]))
        ordinal = np.arange(len(er)) - first[er]
        base = (row_off[:-1] + 1 + body)[er] + 2 * ordinal
        out[base] = ec.astype(np.uint8)
        out[base + 1] = exc_high[er, ec]
    return out, nbytes


def encode_postings_batch(doc_of: np.ndarray, freq: np.ndarray,
                          term_starts: np.ndarray, big_ids: np.ndarray):
    """Encode ALL big terms' posting lists in one vectorized pass: full
    128-blocks through :func:`pfor_encode_blocks` (interleaved delta/freq
    rows in term order) and every vint tail through ONE vint_encode call.

    Returns a dict tid -> (payload bytes, skip_offsets int32[],
    skip_last_docs int32[]) matching :func:`encode_postings` output.
    """
    if len(big_ids) == 0:
        return {}
    dfs = (term_starts[big_ids + 1] - term_starts[big_ids]).astype(np.int64)
    n_full = dfs // BLOCK_SIZE
    tails = dfs - n_full * BLOCK_SIZE
    starts = term_starts[big_ids].astype(np.int64)

    # per-term deltas over the full runs (first entry stores docID+1)
    total = int(dfs.sum())
    idx = np.repeat(starts - np.concatenate(([0], np.cumsum(dfs)[:-1])),
                    dfs) + np.arange(total)
    docs = doc_of[idx].astype(np.int64)
    frqs = freq[idx].astype(np.uint64)
    run_start = np.zeros(total, dtype=bool)
    run_start[0] = True
    run_start[np.cumsum(dfs)[:-1]] = True
    deltas = np.empty(total, dtype=np.int64)
    deltas[0] = docs[0] + 1
    deltas[1:] = docs[1:] - docs[:-1]
    deltas[run_start] = docs[run_start] + 1
    deltas = deltas.astype(np.uint64)

    # gather full-block regions into (2*total_blocks, 128): rows ordered
    # term-major, alternating delta/freq per block
    tb = int(n_full.sum())
    run_base = np.concatenate(([0], np.cumsum(dfs)[:-1]))
    blk_term = np.repeat(np.arange(len(big_ids)), n_full)
    blk_no = np.arange(tb) - np.repeat(
        np.concatenate(([0], np.cumsum(n_full)[:-1])), n_full)
    src = (run_base[blk_term] + blk_no * BLOCK_SIZE)[:, None] \
        + np.arange(BLOCK_SIZE)
    mat = np.empty((2 * tb, BLOCK_SIZE), dtype=np.uint64)
    mat[0::2] = deltas[src]
    mat[1::2] = frqs[src]
    payload, row_nbytes = pfor_encode_blocks(mat)
    row_off = np.concatenate(([0], np.cumsum(row_nbytes)))
    # per-block byte size = its delta row + freq row
    blk_bytes = row_nbytes[0::2] + row_nbytes[1::2]
    blk_start = row_off[0::2]

    # all tails in one vint pass: [tail_deltas_t | tail_freqs_t]*
    t_rows = np.nonzero(tails)[0]
    tail_payload = b""
    tail_slices = {}
    if len(t_rows):
        t_lens = tails[t_rows]
        t_total = int(t_lens.sum())
        t_src = np.repeat(run_base[t_rows] + n_full[t_rows] * BLOCK_SIZE
                          - np.concatenate(([0], np.cumsum(t_lens)[:-1])),
                          t_lens) + np.arange(t_total)
        td, tf = deltas[t_src], frqs[t_src]
        combined = np.empty(2 * t_total, dtype=np.uint64)
        out_base = np.repeat(np.cumsum(np.concatenate(([0], 2 * t_lens[:-1]))),
                             t_lens)
        within = np.arange(t_total) - np.repeat(
            np.concatenate(([0], np.cumsum(t_lens)[:-1])), t_lens)
        combined[out_base + within] = td
        combined[out_base + within + np.repeat(t_lens, t_lens)] = tf
        tail_payload = vint_encode(combined)
        vb = np.maximum((_bit_length(combined) + 6) // 7, 1)
        voff = np.concatenate(([0], np.cumsum(vb)))
        bounds = np.cumsum(np.concatenate(([0], 2 * t_lens)))
        for j, t in enumerate(t_rows):
            tail_slices[int(t)] = (int(voff[bounds[j]]), int(voff[bounds[j + 1]]))

    out = {}
    nb_bounds = np.concatenate(([0], np.cumsum(n_full)))
    for j, tid in enumerate(big_ids):
        s, e = nb_bounds[j], nb_bounds[j + 1]
        offs_local = blk_start[s:e] - (blk_start[s] if e > s else 0)
        body = payload[row_off[2 * s]:row_off[2 * e]].tobytes() if e > s else b""
        run = docs[run_base[j]:run_base[j] + dfs[j]]
        last_docs = run[np.minimum((np.arange(e - s) + 1) * BLOCK_SIZE - 1,
                                   dfs[j] - 1)] if e > s else np.zeros(0, np.int64)
        offsets = list(offs_local)
        lasts = list(last_docs)
        if tails[j]:
            a, bnd = tail_slices[int(j)]
            offsets.append(len(body))
            lasts.append(int(run[-1]))
            body = body + tail_payload[a:bnd]
        out[int(tid)] = (body, np.asarray(offsets, dtype=np.int32),
                        np.asarray(lasts, dtype=np.int32))
    return out


def pfor_decode(buf: memoryview | bytes, off: int = 0) -> tuple[np.ndarray, int]:
    """Decode one block; returns (values uint64[BLOCK_SIZE], bytes_consumed_end_offset)."""
    token = buf[off]
    n_exc = token >> 5
    bits = token & 0x1F
    pos = off + 1
    if bits == 0:
        val, used = vint_decode(memoryview(buf)[pos:pos + 10], 1)
        pos += used
        vals = np.full(BLOCK_SIZE, val[0], dtype=np.uint64)
        if n_exc:
            exc = np.frombuffer(memoryview(buf)[pos:pos + 2 * n_exc], dtype=np.uint8).reshape(-1, 2)
            pos += 2 * n_exc
            vals[exc[:, 0]] |= exc[:, 1].astype(np.uint64)
    else:
        nbytes = BLOCK_SIZE * bits // 8
        vals = unpack_bits(memoryview(buf)[pos:pos + nbytes], bits)
        pos += nbytes
        if n_exc:
            exc = np.frombuffer(memoryview(buf)[pos:pos + 2 * n_exc], dtype=np.uint8).reshape(-1, 2)
            pos += 2 * n_exc
            vals[exc[:, 0]] |= exc[:, 1].astype(np.uint64) << np.uint64(bits)
    return vals, pos


# ---------------------------------------------------------------------------
# whole posting list
# ---------------------------------------------------------------------------

def encode_postings(doc_ids: np.ndarray, freqs: np.ndarray) -> tuple[bytes, np.ndarray, np.ndarray]:
    """Encode a sorted posting list.

    Returns (payload_bytes, skip_offsets int32[], skip_last_docs int32[]):
    one skip entry per FULL block plus, when df %% 128 != 0, a final entry for
    the vint tail (offset where the tail starts, last docID of the list).
    """
    df = len(doc_ids)
    n_full = df // BLOCK_SIZE
    tail = df - n_full * BLOCK_SIZE
    n_skip = n_full + (1 if tail else 0)
    deltas = np.empty(df, dtype=np.uint64)
    deltas[0] = doc_ids[0] + 1        # first entry stores docID+1 so deltas are >0
    deltas[1:] = np.diff(doc_ids.astype(np.int64)).astype(np.uint64)

    out = bytearray()
    offsets = np.empty(n_skip, dtype=np.int32)
    last_docs = np.empty(n_skip, dtype=np.int32)
    for b in range(n_full):
        lo = b * BLOCK_SIZE
        offsets[b] = len(out)
        last_docs[b] = doc_ids[lo + BLOCK_SIZE - 1]
        out += pfor_encode(deltas[lo:lo + BLOCK_SIZE])
        out += pfor_encode(freqs[lo:lo + BLOCK_SIZE].astype(np.uint64))
    if tail:
        lo = n_full * BLOCK_SIZE
        offsets[n_full] = len(out)
        last_docs[n_full] = doc_ids[df - 1]
        out += vint_encode(deltas[lo:])
        out += vint_encode(freqs[lo:].astype(np.uint64))
    return bytes(out), offsets, last_docs


def decode_postings(buf: memoryview | bytes, df: int) -> tuple[np.ndarray, np.ndarray]:
    """Decode a full posting list; returns (doc_ids int32[], freqs int32[])."""
    n_full = df // BLOCK_SIZE
    deltas = np.empty(df, dtype=np.uint64)
    freqs = np.empty(df, dtype=np.int64)
    pos = 0
    for b in range(n_full):
        lo = b * BLOCK_SIZE
        d, pos = pfor_decode(buf, pos)
        deltas[lo:lo + BLOCK_SIZE] = d
        f, pos = pfor_decode(buf, pos)
        freqs[lo:lo + BLOCK_SIZE] = f.astype(np.int64)
    tail = df - n_full * BLOCK_SIZE
    if tail:
        d, used = vint_decode(memoryview(buf)[pos:], tail)
        pos += used
        f, used = vint_decode(memoryview(buf)[pos:], tail)
        deltas[n_full * BLOCK_SIZE:] = d
        freqs[n_full * BLOCK_SIZE:] = f.astype(np.int64)
    doc_ids = np.cumsum(deltas.astype(np.int64)) - 1
    return doc_ids.astype(np.int32), freqs.astype(np.int32)


def decode_block(buf: memoryview | bytes, off: int, prev_last_doc: int) -> tuple[np.ndarray, np.ndarray]:
    """Decode one full block at `off` given the previous block's last docID
    (-1 for the first block); returns (doc_ids, freqs)."""
    d, pos = pfor_decode(buf, off)
    f, _ = pfor_decode(buf, pos)
    # first delta of the list encodes docID+1, so prev_last_doc=-1 works out:
    # -1 + (doc0 + 1) = doc0; later blocks store plain deltas from prev last.
    docs = np.cumsum(d.astype(np.int64)) + prev_last_doc
    return docs.astype(np.int32), f.astype(np.int32)


def decode_tail(buf: memoryview | bytes, off: int, n: int, prev_last_doc: int) -> tuple[np.ndarray, np.ndarray]:
    """Decode the vint tail (n entries) at `off`; returns (doc_ids, freqs)."""
    mv = memoryview(buf)[off:]
    d, used = vint_decode(mv, n)
    f, _ = vint_decode(mv[used:], n)
    docs = np.cumsum(d.astype(np.int64)) + prev_last_doc
    return docs.astype(np.int32), f.astype(np.int32)


# ---------------------------------------------------------------------------
# competitive impacts (CompetitiveImpactAccumulator.java:30-120 semantics)
# ---------------------------------------------------------------------------

def impact_skyline(freqs: np.ndarray, norms: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-block competitive (freq, norm) skyline.

    Keeps, per distinct norm byte, the max freq; then prunes pairs dominated
    by another pair with >= freq and <= norm.  Returns (freqs int32, norms
    uint8) sorted by norm ascending with freq strictly increasing.
    """
    norms = np.asarray(norms, dtype=np.uint8)
    freqs = np.asarray(freqs, dtype=np.int64)
    uniq, inv = np.unique(norms, return_inverse=True)
    maxf = np.zeros(len(uniq), dtype=np.int64)
    np.maximum.at(maxf, inv, freqs)
    # norm asc; a pair survives iff its freq exceeds every freq at smaller norm
    keep = np.ones(len(uniq), dtype=bool)
    run = np.maximum.accumulate(maxf)
    keep[1:] = maxf[1:] > run[:-1]
    return maxf[keep].astype(np.int32), uniq[keep]


def _unpack_block_group(buf, raw, padded, offs, out) -> np.ndarray:
    """Unpack one PFor part (doc-deltas or freqs) for the full blocks at
    byte offsets `offs` into ``out[(len(offs), BLOCK_SIZE)]`` uint64,
    grouped by (bits, n_exceptions) so each group unpacks in one
    vectorized pass.  Returns each block's part size in bytes (so the
    caller can locate the freq part after the doc part)."""
    tokens = raw[offs]
    n_exc = (tokens >> 5).astype(np.int64)
    bits = (tokens & 0x1F).astype(np.int64)
    # vint-value fast path only when the value fits one byte; else scalar.
    # bits==0 blocks whose all-equal value is >=128 carry a 2-byte vint
    # (encoder guarantees <=2 bytes: patched value fits 8 bits), so the
    # block size must account for the extra byte even on the fallback path.
    vint2 = (bits == 0) & (raw[offs + 1] >= 0x80)
    fallback = vint2
    sizes = np.where(bits == 0, 2 + vint2.astype(np.int64) + 2 * n_exc,
                     1 + BLOCK_SIZE * bits // 8 + 2 * n_exc)
    for b in np.unique(bits[~fallback] if fallback.any() else bits):
        b = int(b)
        sel = np.nonzero((bits == b) & ~fallback)[0]
        if len(sel) == 0:
            continue
        if b == 0:
            out[sel] = raw[offs[sel] + 1].astype(np.uint64)[:, None]
        elif b <= 24:
            # byte-aligned extraction: value v sits at bit v*b of the
            # little-endian stream; gather 4 bytes and shift — no
            # unpackbits, no big temporaries
            bit_off = np.arange(BLOCK_SIZE, dtype=np.int64) * b
            rel = bit_off >> 3
            shift = (bit_off & 7).astype(np.uint32)
            idx = (offs[sel] + 1)[:, None] + rel[None, :]
            u32 = (padded[idx].astype(np.uint32)
                   | (padded[idx + 1].astype(np.uint32) << 8)
                   | (padded[idx + 2].astype(np.uint32) << 16)
                   | (padded[idx + 3].astype(np.uint32) << 24))
            out[sel] = ((u32 >> shift[None, :]) & np.uint32((1 << b) - 1)).astype(np.uint64)
        else:
            nbytes = BLOCK_SIZE * b // 8
            byte_idx = (offs[sel] + 1)[:, None] + np.arange(nbytes)
            bits_arr = np.unpackbits(raw[byte_idx], axis=1, bitorder="little")
            out[sel] = (bits_arr.reshape(len(sel), BLOCK_SIZE, b).astype(np.uint64)
                        * _BIT_W[b]).sum(axis=2)
        # exceptions (grouped by count so gathers stay rectangular)
        esel = sel[n_exc[sel] > 0]
        for ne in np.unique(n_exc[esel]) if len(esel) else []:
            ne = int(ne)
            ss = esel[n_exc[esel] == ne]
            ebase = offs[ss] + sizes[ss] - 2 * ne
            eidx = ebase[:, None] + np.arange(2 * ne)
            ebytes = raw[eidx].reshape(len(ss), ne, 2)
            rows = np.repeat(np.arange(len(ss)), ne)
            pos = ebytes[:, :, 0].reshape(-1).astype(np.int64)
            high = ebytes[:, :, 1].reshape(-1).astype(np.uint64)
            if b == 0:
                out[ss[rows], pos] |= high
            else:
                out[ss[rows], pos] |= high << np.uint64(b)
    for i in np.nonzero(fallback)[0]:
        vals, _ = pfor_decode(buf, int(offs[i]))
        out[i] = vals
    return sizes


def decode_blocks(buf, df: int, skip_offs: np.ndarray, skip_last: np.ndarray,
                  block_idx: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Decode a SUBSET of full blocks (ascending indices into the skip
    table) in one grouped vectorized pass — the seek path for
    candidate-restricted scoring (MaxScore non-essential lookups), where a
    per-block Python loop would dominate.  Returns (doc_ids int32, freqs
    int32) flat in ascending block order (globally doc-sorted).  The vint
    tail (index n_full) must be handled by the caller via decode_tail."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    padded = np.concatenate((raw, np.zeros(4, dtype=np.uint8)))
    raw = padded          # one RAM copy: fancy indexing on an mmap-backed
    # array takes numpy.memmap's slow per-element path; padded is a real
    # ndarray and a strict superset of raw, so index it everywhere
    block_idx = np.asarray(block_idx, dtype=np.int64)
    offs = skip_offs[block_idx].astype(np.int64)
    nb = len(block_idx)
    deltas = np.empty((nb, BLOCK_SIZE), dtype=np.uint64)
    freqs = np.empty((nb, BLOCK_SIZE), dtype=np.uint64)
    sizes = _unpack_block_group(buf, raw, padded, offs, deltas)
    _unpack_block_group(buf, raw, padded, offs + sizes, freqs)
    prev_last = np.where(block_idx > 0,
                         skip_last[np.maximum(block_idx - 1, 0)], -1)
    docs = (np.cumsum(deltas.astype(np.int64), axis=1)
            + prev_last.astype(np.int64)[:, None])
    return docs.reshape(-1).astype(np.int32), freqs.reshape(-1).astype(np.int32)


def decode_list(buf, df: int, skip_offs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Batched full-list decode using the skip table: groups full blocks by
    (bits, n_exceptions) and unpacks each group in one vectorized pass —
    ~20x faster than block-at-a-time for long posting lists.

    skip_offs: offsets of each full block (and the tail, if any) — the
    per-term skip table from the term dictionary.
    """
    n_full = df // BLOCK_SIZE
    if n_full < 4:
        return decode_postings(buf, df)
    raw = np.frombuffer(buf, dtype=np.uint8)
    padded = np.concatenate((raw, np.zeros(4, dtype=np.uint8)))   # safe +3 reads
    raw = padded          # see decode_blocks: avoid memmap fancy indexing
    offs = skip_offs[:n_full].astype(np.int64)

    deltas = np.empty((n_full, BLOCK_SIZE), dtype=np.uint64)
    freqs = np.empty((n_full, BLOCK_SIZE), dtype=np.uint64)

    sizes = _unpack_block_group(buf, raw, padded, offs, deltas)
    _unpack_block_group(buf, raw, padded, offs + sizes, freqs)

    flat_deltas = deltas.reshape(-1).astype(np.int64)
    all_deltas = np.empty(df, dtype=np.int64)
    all_deltas[:n_full * BLOCK_SIZE] = flat_deltas
    all_freqs = np.empty(df, dtype=np.int64)
    all_freqs[:n_full * BLOCK_SIZE] = freqs.reshape(-1)
    tail = df - n_full * BLOCK_SIZE
    if tail:
        toff = int(skip_offs[n_full])
        mv = memoryview(buf)[toff:]
        d, used = vint_decode(mv, tail)
        f, _ = vint_decode(mv[used:], tail)
        all_deltas[n_full * BLOCK_SIZE:] = d.astype(np.int64)
        all_freqs[n_full * BLOCK_SIZE:] = f.astype(np.int64)
    doc_ids = np.cumsum(all_deltas) - 1
    return doc_ids.astype(np.int32), all_freqs.astype(np.int32)

