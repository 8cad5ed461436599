"""Deterministic synthetic transcript corpus + adapters.

The engine's primary input (BASELINE.json input_hint) is a Parquet table of
multi-turn conversation/agent transcripts:

    (conv_id: string, turn_idx: int32, role: string, text: string,
     tool: string, ts: timestamp[us])

The sandbox testdata has no transcripts table, so we synthesize one
deterministically (seeded, no wall clock):

- :func:`synth_transcripts` — seeded generator with Zipf term distribution,
  Zipf turns-per-conversation skew, and the FIXTURES.md §1 analyzer edge
  cases embedded at fixed rows.
- :func:`transcripts_from_documents` — maps the driver-generated
  ``documents.parquet`` (doc_id, text, ...) into transcript shape so oracle
  SQL over `documents` stays expressible.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])

_VOCAB_COMMON = (
    "the a of to and in query data table scan sort merge join filter group "
    "order key value row column hash index batch stream window part line "
    "fast slow small big agg vector spark customer tool agent model token "
    "search run call result error retry plan step think answer user turn"
).split()

_VOCAB_RARE = [f"rareterm{i:04d}" for i in range(2000)]

_ROLES = ["user", "assistant", "system", "tool"]
_TOOLS = ["", "", "", "", "search", "bash", "browser", "editor"]

EDGE_TEXTS = [
    "x" * 255,
    "y" * 256,
    "İstanbul ΣΊΣΥΦΟΣ straße",
    "3.14 1,000 state-of-the-art o'neil foo_bar",
    "bob@example.com https://x.y/z?a=1",
    "日本語 テスト ひらがな 한국어 🇺🇸 👍🏻",
    "",
    "   \t  ",
    "z" * 70000,
    "duplicate text body for tie break",
    "duplicate text body for tie break",
]

BASE_TS_US = 1_700_000_000_000_000  # fixed epoch base (no wall clock)


def synth_transcripts(n_turns: int, seed: int = 42) -> pa.Table:
    """Deterministic transcript table with n_turns rows, sorted by
    (conv_id, turn_idx)."""
    rng = np.random.default_rng(seed)
    # Zipf-distributed turns per conversation in [1, 64]
    conv_sizes = []
    total = 0
    while total < n_turns:
        s = int(min(64, rng.zipf(1.3)))
        conv_sizes.append(s)
        total += s
    conv_sizes[-1] -= total - n_turns
    if conv_sizes[-1] == 0:
        conv_sizes.pop()

    conv_ids, turn_idxs = [], []
    for c, size in enumerate(conv_sizes):
        cid = f"conv-{c:08d}"
        conv_ids.extend([cid] * size)
        turn_idxs.extend(range(size))

    n = len(conv_ids)
    # Zipf vocab sampling: common terms hot, rare terms long tail
    zipf_w = 1.0 / np.arange(1, len(_VOCAB_COMMON) + 1) ** 0.9
    zipf_p = zipf_w / zipf_w.sum()
    texts = []
    for i in range(n):
        ln = int(rng.integers(3, 40))
        words = list(rng.choice(_VOCAB_COMMON, size=ln, p=zipf_p))
        if rng.random() < 0.3:
            words.append(_VOCAB_RARE[int(rng.integers(len(_VOCAB_RARE)))])
        texts.append(" ".join(words))
    # plant the analyzer edge cases at fixed positions
    for j, t in enumerate(EDGE_TEXTS):
        if j < n:
            texts[j * max(1, n // (len(EDGE_TEXTS) + 1))] = t

    roles = [_ROLES[int(x)] for x in rng.integers(0, len(_ROLES), size=n)]
    tools = [_TOOLS[int(x)] for x in rng.integers(0, len(_TOOLS), size=n)]
    ts = BASE_TS_US + np.arange(n, dtype=np.int64) * 1_000_000

    return pa.table({
        "conv_id": pa.array(conv_ids, type=pa.string()),
        "turn_idx": pa.array(turn_idxs, type=pa.int32()),
        "role": pa.array(roles, type=pa.string()),
        "text": pa.array(texts, type=pa.string()),
        "tool": pa.array(tools, type=pa.string()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
    })


TURNS_PER_CONV = 5


def doc_batch_to_transcripts(batch: pa.Table) -> pa.Table:
    """Vectorized map: documents(doc_id, text) rows -> transcript rows.

    conv_id groups TURNS_PER_CONV consecutive doc_ids; deterministic, so the
    mapping is also expressible in oracle SQL over `documents`.
    """
    doc_id = batch.column("doc_id").to_numpy()
    conv = np.char.add("conv-", np.char.zfill((doc_id // TURNS_PER_CONV).astype(str), 8))
    turn = (doc_id % TURNS_PER_CONV).astype(np.int32)
    role = np.array(_ROLES, dtype=object)[doc_id % len(_ROLES)]
    tool = np.array(_TOOLS, dtype=object)[doc_id % len(_TOOLS)]
    ts = BASE_TS_US + doc_id * 1_000_000
    return pa.table({
        "conv_id": pa.array(conv, type=pa.string()),
        "turn_idx": pa.array(turn, type=pa.int32()),
        "role": pa.array(role, type=pa.string()),
        "text": batch.column("text"),
        "tool": pa.array(tool, type=pa.string()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
    })


def transcripts_from_documents(sf_dir: str):
    """documents.parquet -> transcripts Dataset (streaming map_batches)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(doc_batch_to_transcripts, batch_format="pyarrow")


# deterministic synthetic geolocation per doc_id (Knuth multiplicative
# constants; exact int64 math so the oracle SQL reproduces it bit-for-bit)
GEO_LAT_MULT, GEO_LAT_MOD = 2654435761, 1_800_000
GEO_LON_MULT, GEO_LON_MOD = 2246822519, 3_600_000


def geo_of_doc_id(doc_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """doc_id -> (lat, lon) degrees, ~0.0001° grid over the full globe."""
    doc_id = np.asarray(doc_id, dtype=np.int64)
    lat = ((doc_id * GEO_LAT_MULT) % GEO_LAT_MOD) / 10_000.0 - 90.0
    lon = ((doc_id * GEO_LON_MULT) % GEO_LON_MOD) / 10_000.0 - 180.0
    return lat, lon


def transcripts_with_geo(sf_dir: str):
    """transcripts plus GeoEncodingUtils-quantized `lat_enc`/`lon_enc`
    point columns and an encoded `feat_pr` feature column (FeatureField
    document model), all derived from doc_id (see `search/geo.py`,
    `search/feature.py`)."""
    import ray.data as rd

    from ..search.feature import encode_feature_value
    from ..search.geo import encode_latitude, encode_longitude

    def add_geo(batch: pa.Table) -> pa.Table:
        t = doc_batch_to_transcripts(batch)
        doc_id = batch.column("doc_id").to_numpy()
        lat, lon = geo_of_doc_id(doc_id)
        t = t.append_column("lat_enc", pa.array(encode_latitude(lat),
                                                type=pa.int64()))
        t = t.append_column("lon_enc", pa.array(encode_longitude(lon),
                                                type=pa.int64()))
        # pagerank-ish static signal: small ints survive the 9-bit-mantissa
        # feature quantization exactly, so the SQL oracle sees S verbatim
        feat = (doc_id % 97 + 1).astype(np.float32)
        t = t.append_column("feat_pr",
                            pa.array(encode_feature_value(feat),
                                     type=pa.int64()))
        # doc-side [lo, hi] range (RangeField document model): stored as a
        # 2-dim point (min dim, max dim)
        lo = doc_id % 211
        t = t.append_column("span_lo", pa.array(lo, type=pa.int64()))
        t = t.append_column("span_hi", pa.array(lo + doc_id % 37,
                                                type=pa.int64()))
        # cartesian XY floats (XYPointField model): eighth-steps are exact
        # in binary, so the SQL oracle can compare the raw doubles
        from ..search.xy import encode_xy

        x = ((doc_id * 131) % 1000) / 8.0 - 60.0
        y = ((doc_id * 173) % 1000) / 8.0 - 60.0
        t = t.append_column("x_enc", pa.array(encode_xy(x), type=pa.int64()))
        t = t.append_column("y_enc", pa.array(encode_xy(y), type=pa.int64()))
        # per-doc minimum-should-match (CoveringQuery LongValuesSource)
        t = t.append_column("min_match", pa.array(1 + doc_id % 3,
                                                  type=pa.int64()))
        # HalfFloatPoint column: eighth-steps <= 62.5 are exact halves
        from ..search.point_types import half_float_encode_column

        hf = ((doc_id * 37) % 1000 - 500).astype(np.float32) / 8.0
        t = t.append_column("hf_enc",
                            pa.array(half_float_encode_column(hf),
                                     type=pa.int64()))
        # BigIntegerPoint column: v = (doc_id - 3000) * (2^70 + 12345),
        # split into (hi, lo-sign-folded) int64 words without leaving
        # int64 arithmetic (v = (a<<6)*2^64 + a*12345)
        a = doc_id.astype(np.int64) - 3000
        s = a * 12345
        bhi = (a << 6) + np.where(s < 0, -1, 0)
        blo = (s.view(np.uint64) ^ np.uint64(1 << 63)).view(np.int64)
        t = t.append_column("bhi", pa.array(bhi, type=pa.int64()))
        t = t.append_column("blo", pa.array(blo, type=pa.int64()))
        # InetAddressPoint column (all v4-mapped, hi word 0): 10.x.y.z
        # with v4int = 10<<24 + (doc_id*97) % 2^24; lo word carries the
        # ::ffff: prefix.  Sign-folded sortable int64 words.
        d64 = doc_id.astype(np.int64)
        v4 = (10 << 24) + (d64 * 97) % (1 << 24)
        hi_s = np.full(len(d64), -(1 << 63), dtype=np.int64)
        # fold the sign offset into the Python-int constant FIRST:
        # int64_array - 2^63 would promote to float64 (2^63 overflows
        # int64) and silently round the low bits away
        v4_base = 0xFFFF00000000 - (1 << 63)
        t = t.append_column("iphi", pa.array(hi_s, type=pa.int64()))
        t = t.append_column("iplo", pa.array(v4_base + v4, type=pa.int64()))
        # InetAddressRange column: [172.16/16 base + lo_off, + span]
        ip_base = v4_base + (172 << 24) + (16 << 16)
        lo_off = (d64 % 2048) * 16
        span = d64 % 29
        t = t.append_column("ipr_hmin", pa.array(hi_s, type=pa.int64()))
        t = t.append_column("ipr_lmin", pa.array(ip_base + lo_off,
                                                 type=pa.int64()))
        t = t.append_column("ipr_hmax", pa.array(hi_s, type=pa.int64()))
        return t.append_column("ipr_lmax", pa.array(ip_base + lo_off + span,
                                                    type=pa.int64()))

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(add_geo, batch_format="pyarrow")


def transcripts_with_vectors(sf_dir: str, target_rows_per_bucket: int = 250_000):
    """documents ⋈ embeddings (doc_id == vec_id) → transcript shape plus an
    `embedding` (list<float32>) column, via the explicit bucketed hash join
    (tag both sides with bucket = key %% B, union, groupby(bucket), join
    inside map_groups — no broadcast, no driver materialization of either
    side).  Feeds the vector-enabled index build."""
    import pyarrow.compute as pc
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    embs = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    n_rows = max(docs.count(), embs.count())        # parquet metadata only
    nb = max(4, -(-n_rows // target_rows_per_bucket))
    etype = pa.list_(pa.float32())

    def tag_left(b: pa.Table) -> pa.Table:
        key = b.column("doc_id").to_numpy()
        return pa.table({
            "bucket": pa.array(key % nb, type=pa.int64()),
            "key": pa.array(key, type=pa.int64()),
            "text": b.column("text"),
            "embedding": pa.nulls(len(b), type=etype)})

    def tag_right(b: pa.Table) -> pa.Table:
        key = b.column("vec_id").to_numpy()
        return pa.table({
            "bucket": pa.array(key % nb, type=pa.int64()),
            "key": pa.array(key, type=pa.int64()),
            "text": pa.nulls(len(b), type=pa.string()),
            "embedding": pc.cast(b.column("embedding"), etype)})

    def join_bucket(g: pa.Table) -> pa.Table:
        left = g.filter(pc.is_valid(g.column("text")))
        right = g.filter(pc.invert(pc.is_valid(g.column("text"))))
        lk = left.column("key").to_numpy()
        rk = right.column("key").to_numpy()
        lo, ro = np.argsort(lk), np.argsort(rk)
        common, li, ri = np.intersect1d(lk[lo], rk[ro], return_indices=True)
        if len(common) == 0:
            return doc_batch_to_transcripts(
                pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "text": pa.array([], type=pa.string())})) \
                .append_column("embedding", pa.nulls(0, type=etype))
        lt = left.take(pa.array(lo[li]))
        rt = right.take(pa.array(ro[ri]))
        out = doc_batch_to_transcripts(
            pa.table({"doc_id": lt.column("key"), "text": lt.column("text")}))
        return out.append_column("embedding", rt.column("embedding"))

    # size-based join selection: when one side is small (here typically the
    # embeddings table), broadcast it once via the object store and attach
    # inside map_batches over the big side — no all-to-all shuffle of the
    # big side for an inner join the small side fully determines.  The
    # bucketed exchange below remains the both-sides-large path.
    n_embs = embs.count()                           # parquet metadata only
    if n_embs <= 500_000:
        import ray

        @ray.remote
        def _load_embs():
            import pyarrow.parquet as pq

            t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                              columns=["vec_id", "embedding"])
            vid = t.column("vec_id").to_numpy()
            o = np.argsort(vid)
            return vid[o], t.column("embedding").combine_chunks().take(
                pa.array(o))

        ref = _load_embs.remote()

        @ray.remote
        def _key_bounds(v):
            vid = v[0]
            return (int(vid[0]), int(vid[-1])) if len(vid) else (0, -1)

        # push the small side's key range down to the big side's parquet
        # read: only row groups that can contain a match leave storage
        # (best-effort — a full-range small side prunes nothing)
        lo_k, hi_k = ray.get(_key_bounds.remote(ref))
        import pyarrow.dataset as pads

        docs = rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
            filter=((pads.field("doc_id") >= lo_k)
                    & (pads.field("doc_id") <= hi_k)))

        def attach(b: pa.Table) -> pa.Table:
            vid_sorted, emb_sorted = ray.get(ref)
            did = b.column("doc_id").to_numpy()
            if len(vid_sorted) == 0:
                out = doc_batch_to_transcripts(
                    pa.table({"doc_id": pa.array([], type=pa.int64()),
                              "text": pa.array([], type=pa.string())}))
                return out.append_column("embedding", pa.nulls(0, type=etype))
            loc = np.searchsorted(vid_sorted, did)
            loc[loc >= len(vid_sorted)] = 0
            hit = vid_sorted[loc] == did
            sel = np.nonzero(hit)[0]
            out = doc_batch_to_transcripts(
                pa.table({"doc_id": b.column("doc_id").take(pa.array(sel)),
                          "text": b.column("text").take(pa.array(sel))}))
            return out.append_column(
                "embedding",
                pc.cast(emb_sorted.take(pa.array(loc[sel])), etype))

        return docs.map_batches(attach, batch_format="pyarrow")

    tagged = docs.map_batches(tag_left, batch_format="pyarrow").union(
        embs.map_batches(tag_right, batch_format="pyarrow"))
    return tagged.groupby("bucket").map_groups(join_bucket, batch_format="pyarrow")


def synth_transcripts_tiled(n_turns: int, base_n: int = 150_000, seed: int = 42) -> "list[pa.Table]":
    """Large deterministic corpus: a seeded base table tiled with re-prefixed
    conv_ids (fast path for multi-million-turn benchmarks; term distribution
    repeats per tile, conv identity stays globally unique)."""
    base = synth_transcripts(min(base_n, n_turns), seed)
    tiles = []
    made = 0
    j = 0
    while made < n_turns:
        take = min(len(base), n_turns - made)
        t = base.slice(0, take)
        conv = np.char.add(f"t{j:03d}-", t.column("conv_id").to_numpy(zero_copy_only=False).astype(str))
        ts = t.column("ts").to_numpy(zero_copy_only=False).astype("int64") + j
        t = (t.set_column(0, "conv_id", pa.array(conv, type=pa.string()))
              .set_column(5, "ts", pa.array(ts, type=pa.timestamp("us"))))
        tiles.append(t)
        made += take
        j += 1
    return tiles


def transcripts_with_multivalues(sf_dir: str):
    """transcripts plus MULTI-VALUED doc-values columns (the
    SortedNumericDocValuesField / SortedSetDocValuesField document model):

    - ``mv_num``: list<int64>, len = doc_id % 4 (empties exercise missing-
      value semantics), value_j = (doc_id*7 + j*131) % 500 — NOT pre-sorted,
      so the reader's canonicalization (per-doc ascending) is exercised.
    - ``mv_str``: list<string>, len = doc_id % 3, tag_j =
      't%02d' % ((doc_id*(j*17+13)) % 23) — duplicates possible, so the
      SORTED-SET dedup is exercised.

    Both derivations are integer-exact, so the oracle SQL reproduces them
    with DuckDB list_transform over range()."""
    import ray.data as rd

    def add_mv(batch: pa.Table) -> pa.Table:
        t = doc_batch_to_transcripts(batch)
        doc_id = batch.column("doc_id").to_numpy().astype(np.int64)
        n = len(doc_id)
        # vectorized ragged build: values for j in 0..3 masked by j < len
        num_lens = doc_id % 4
        j = np.arange(4, dtype=np.int64)
        num_vals = (doc_id[:, None] * 7 + j[None, :] * 131) % 500
        num_mask = j[None, :] < num_lens[:, None]
        num_offsets = np.concatenate(([0], np.cumsum(num_lens)))
        mv_num = pa.ListArray.from_arrays(
            pa.array(num_offsets, type=pa.int32()),
            pa.array(num_vals[num_mask], type=pa.int64()))
        str_lens = doc_id % 3
        js = np.arange(3, dtype=np.int64)
        codes = (doc_id[:, None] * (js[None, :] * 17 + 13)) % 23
        str_mask = js[None, :] < str_lens[:, None]
        flat_codes = codes[str_mask]
        tags = np.array([f"t{c:02d}" for c in range(23)], dtype=object)
        str_offsets = np.concatenate(([0], np.cumsum(str_lens)))
        mv_str = pa.ListArray.from_arrays(
            pa.array(str_offsets, type=pa.int32()),
            pa.array(tags[flat_codes], type=pa.string()))
        t = t.append_column("mv_num", mv_num)
        return t.append_column("mv_str", mv_str)

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ds.map_batches(add_mv, batch_format="pyarrow")


def transcripts_with_facetsets(sf_dir: str):
    """transcripts plus two-set 2-dim facet sets (`facet/facetset/
    FacetSetsField.java` document model): each doc carries TWO (a, b)
    long pairs derived from doc_id — set1 = (doc_id%7, doc_id%11),
    set2 = (doc_id%5, doc_id%13 + 8) — as equal-length list<int64>
    dimension columns (the multi-valued point sidecar layout)."""
    import ray.data as rd

    def add_fs(batch: pa.Table) -> pa.Table:
        t = doc_batch_to_transcripts(batch)
        doc_id = batch.column("doc_id").to_numpy()
        a = np.stack([doc_id % 7, doc_id % 5], axis=1).astype(np.int64)
        b = np.stack([doc_id % 11, doc_id % 13 + 8], axis=1).astype(np.int64)
        t = t.append_column("fs_a", pa.array(list(a)))
        t = t.append_column("fs_b", pa.array(list(b)))
        return t

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ds.map_batches(add_fs, batch_format="pyarrow")
