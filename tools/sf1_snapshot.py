"""Synthesize a deterministic sf1-shaped directory (10x sf0.1) and time the
full queries() suite over it, writing BENCH_sf1_r04.json.

sf1 = 10 replicas of sf0.1's documents/embeddings/events with remapped ids
(doc_id/vec_id/event_id offsets, user_id offsets so session counts scale,
a per-replica suffix token so near-dup workloads keep realistic bucket
shapes instead of degenerate 10-way exact duplicates).  Only the three
tables the pipelines read are materialized.

Usage: python tools/sf1_snapshot.py [out.json]
"""

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = "/tmp/lucene_ray_sf1"
REPLICAS = 10


def build_sf1() -> str:
    marker = os.path.join(DST, "_complete")
    if os.path.exists(marker):
        return DST
    shutil.rmtree(DST, ignore_errors=True)
    os.makedirs(DST)

    docs = pq.read_table(f"{SRC}/documents.parquet")
    n_doc = docs.num_rows
    parts = []
    for r in range(REPLICAS):
        t = docs
        did = pc.add(t.column("doc_id"), r * n_doc * 10)
        text = t.column("text") if r == 0 else \
            pc.binary_join_element_wise(t.column("text"),
                                        pa.scalar(f"replica r{r}"), " ")
        nchars = pc.utf8_length(text).cast(pa.int64())
        parts.append(pa.table({"doc_id": did.cast(pa.int64()), "text": text,
                               "lang": t.column("lang"),
                               "source": t.column("source"),
                               "n_chars": nchars}))
    pq.write_table(pa.concat_tables(parts), f"{DST}/documents.parquet")

    emb = pq.read_table(f"{SRC}/embeddings.parquet")
    n_emb = emb.num_rows
    parts = []
    rng = np.random.default_rng(424242)
    for r in range(REPLICAS):
        vid = pc.add(emb.column("vec_id"), r * n_emb * 10).cast(pa.int64())
        e = emb.column("embedding")
        if r > 0:
            flat = e.combine_chunks().flatten().to_numpy(zero_copy_only=False)
            # deterministic tiny jitter so replicas are near- not exact-dups
            jit = rng.normal(scale=1e-3, size=len(flat)).astype(np.float32)
            arr = e.combine_chunks()
            e = pa.ListArray.from_arrays(arr.offsets,
                                         pa.array(flat + jit,
                                                  type=pa.float32()))
        parts.append(pa.table({"vec_id": vid, "embedding": e,
                               "label": emb.column("label")}))
    pq.write_table(pa.concat_tables(parts), f"{DST}/embeddings.parquet")

    ev = pq.read_table(f"{SRC}/events.parquet")
    n_ev = ev.num_rows
    n_users = int(pc.max(ev.column("user_id")).as_py()) + 1
    parts = []
    for r in range(REPLICAS):
        parts.append(pa.table({
            "event_id": pc.add(ev.column("event_id"), r * n_ev * 10).cast(pa.int64()),
            "ts": ev.column("ts"),
            "user_id": pc.add(ev.column("user_id"), r * n_users).cast(pa.int64()),
            "event_type": ev.column("event_type"),
            "value": ev.column("value"),
            "props": ev.column("props"),
        }))
    pq.write_table(pa.concat_tables(parts), f"{DST}/events.parquet")
    open(marker, "w").write("ok")
    return DST


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_sf1_r04.json"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sf_dir = build_sf1()
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entrymod

    timings, errors = {}, {}
    for name, fn in entrymod.queries().items():
        t0 = time.perf_counter()
        try:
            r = fn(sf_dir)
            if hasattr(r, "to_pandas"):
                r.to_pandas()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:                      # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
        print(f"{name}: {timings.get(name, errors.get(name))}", flush=True)
    result = {"sf": "sf1-synthetic(10x sf0.1)", "num_cpus": 32,
              "timings_sec": timings, "errors": errors,
              "total_sec": round(sum(timings.values()), 1)}
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"total_sec": result["total_sec"],
                      "n_ok": len(timings), "n_err": len(errors)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
