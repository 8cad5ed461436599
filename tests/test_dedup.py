

def test_substring_spans_planted(ray_session, tmp_path):
    """dedup_substring vs an independent brute-force recount on a corpus
    with a planted repeated passage (and a same-doc internal repeat)."""
    import re

    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.pipelines.dedup import dedup_substring

    K = 5
    passage = "the quick brown fox jumps over the lazy dog tonight"
    docs = [
        f"alpha beta gamma {passage} delta epsilon zeta",
        f"one two three four five six {passage} seven eight",
        # same-doc repeat: the duplicated text occurs twice inside doc 2
        "intro words here repeat me now please thanks filler mid "
        "repeat me now please thanks outro",
        "totally unique text with no overlaps anywhere at all today",
    ]
    pq.write_table(pa.table({"doc_id": pa.array(range(len(docs)),
                                                type=pa.int64()),
                             "text": pa.array(docs)}),
                   str(tmp_path / "documents.parquet"))
    got = dedup_substring(str(tmp_path), k=K)

    # brute force: k-gram occurrence counts -> seed positions -> islands
    tok = [re.findall(r"[A-Za-z0-9]+", d.lower()) for d in docs]
    from collections import Counter

    counts = Counter()
    for ts in tok:
        for i in range(len(ts) - K + 1):
            counts[" ".join(ts[i:i + K])] += 1
    want = []
    for d, ts in enumerate(tok):
        seeds = [i + 1 for i in range(len(ts) - K + 1)
                 if counts[" ".join(ts[i:i + K])] > 1]
        spans = []
        for s in seeds:
            fin = s + K - 1
            if spans and s <= spans[-1][1] + 1:
                spans[-1][1] = max(spans[-1][1], fin)
            else:
                spans.append([s, fin])
        want.extend((d, a, b, b - a + 1) for a, b in spans)
    got_rows = list(got.itertuples(index=False, name=None))
    assert got_rows == sorted(want)
    # sanity: both planted docs carry a duplicated span, the unique doc none
    by_doc = {r[0] for r in got_rows}
    assert {0, 1, 2} <= by_doc and 3 not in by_doc
    # doc 2's internal repeat produces two spans of the repeated 6-gram
    assert sum(1 for r in got_rows if r[0] == 2) == 2
