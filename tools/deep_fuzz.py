"""Deep-fuzz driver: run the in-repo randomized oracles for many more
trials than the pytest defaults, with a fresh seed per invocation.

    python tools/deep_fuzz.py [n_trials] [seed]

Covers:
1. nested BooleanQuery trees vs the pure-python brute evaluator
   (tests/test_nested_fuzz.py harness) — match sets AND scores;
2. MemoryIndex vs the one-doc engine on random trees;
3. classic-parser round-trips: parse(query_to_string(parse(s))) is a
   fixpoint for random generated query strings.
"""

import sys

import numpy as np


def main() -> int:
    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 12345

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    import ray.data as rd

    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    sys.path.insert(0, os.path.join(root, "tests"))

    import tempfile

    import lucene_ray.analysis.standard as std
    from lucene_ray.index.build import build_index
    from lucene_ray.search.searcher import IndexSearcher
    from lucene_ray.sources.transcripts import synth_transcripts
    from test_nested_fuzz import VOCAB, _brute, _random_tree

    t = synth_transcripts(2000, seed=91)
    d = tempfile.mkdtemp(prefix="deepfuzz_")
    build_index(rd.from_arrow(t), d, target_docs_per_partition=700,
                docvalue_cols=("ts",), input_desc="deepfuzz")
    ts_sorted = t.sort_by([("conv_id", "ascending"),
                           ("turn_idx", "ascending")])
    tokens = [std.analyze(x) if x else []
              for x in ts_sorted.column("text").to_pylist()]
    ts = ts_sorted.column("ts").cast("int64").to_numpy()
    s = IndexSearcher(d)

    rng = np.random.default_rng(seed)
    fails = 0

    # ---- 1. nested trees vs brute force ------------------------------
    for trial in range(n_trials):
        q = _random_tree(rng, ts, depth=0)
        want = np.nonzero(_brute(q, tokens, ts))[0]
        td = s.search(q, k=len(tokens) + 1,
                      total_hits_threshold=2**31 - 1)
        got = np.array(sorted(h.gid for h in td.hits), dtype=np.int64)
        if not np.array_equal(got, want):
            fails += 1
            print(f"FAIL nested trial={trial} seed={seed}\n  {q!r}\n"
                  f"  got {len(got)} want {len(want)}")
            if fails > 5:
                break
    print(f"nested-tree fuzz: {n_trials} trials, {fails} failures")

    # ---- 2. MemoryIndex vs one-doc engine ----------------------------
    from lucene_ray.index.memoryindex import MemoryIndex

    mfails = 0
    doc_texts = [x for x in ts_sorted.column("text").to_pylist() if x][:50]
    for trial in range(min(n_trials, 400)):
        text = doc_texts[int(rng.integers(len(doc_texts)))]
        q = _random_tree(rng, ts, depth=1)
        # RangeQuery needs the dv — skip trees containing ranges here
        if "RangeQuery" in repr(q):
            continue
        mem = MemoryIndex()
        mem.add_field("text", text)
        toks = std.analyze(text)
        want = bool(_brute(q, [toks], ts[:1])[0])
        got = mem.matches(q)
        if got != want:
            mfails += 1
            print(f"FAIL memoryindex trial={trial}\n  {q!r}\n  text={text[:60]!r}")
            if mfails > 5:
                break
    print(f"memoryindex fuzz: {mfails} failures")

    # ---- 3. parser toString fixpoint ---------------------------------
    from lucene_ray.search.query import parse_classic, query_to_string

    pfails = 0
    ops = ["AND", "OR", "NOT", "&&", "||"]
    for trial in range(n_trials):
        n_words = int(rng.integers(1, 7))
        parts = []
        depth = 0
        for _ in range(n_words):
            r = rng.integers(0, 12)
            w = VOCAB[int(rng.integers(len(VOCAB)))]
            if r == 0:
                parts.append("(")
                depth += 1
                parts.append(w)
            elif r == 1 and depth:
                parts.append(w)
                parts.append(")")
                depth -= 1
            elif r == 2:
                parts.append(ops[int(rng.integers(len(ops)))])
                parts.append(w)
            elif r == 3:
                parts.append(f"+{w}")
            elif r == 4:
                parts.append(f"-{w}")
            elif r == 5:
                parts.append(f'"{w} data"~{int(rng.integers(0, 3))}')
            elif r == 6:
                parts.append(f"{w}^{int(rng.integers(1, 4))}")
            elif r == 7:
                parts.append(f"{w}~1")
            else:
                parts.append(w)
        parts.extend(")" * depth)
        src = " ".join(parts)
        try:
            q1 = parse_classic(src)
            s1 = query_to_string(q1)
            q2 = parse_classic(s1)
            s2 = query_to_string(q2)
        except Exception as e:  # noqa: BLE001
            pfails += 1
            print(f"FAIL parse trial={trial}: {src!r} raised {e!r}")
            if pfails > 5:
                break
            continue
        if s1 != s2:
            pfails += 1
            print(f"FAIL fixpoint trial={trial}: {src!r}\n  {s1!r}\n  {s2!r}")
            if pfails > 5:
                break
    print(f"parser-fixpoint fuzz: {n_trials} trials, {pfails} failures")

    total = fails + mfails + pfails
    print(f"TOTAL failures: {total}")
    ray.shutdown()
    return 1 if total else 0


if __name__ == "__main__":
    raise SystemExit(main())
