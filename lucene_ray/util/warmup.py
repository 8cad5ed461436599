"""Worker-pool warmup for latency-sensitive benchmarks and builds.

Two host-level effects dominate cold-start skew on many-core boxes (measured
in NOTES.md round-2 profiling):

1. **Allocator page-fault storms** — the first heavy task in each worker
   process grows its heap by hundreds of MB; 32 workers first-touching pages
   simultaneously serialize on kernel memory-management locks (observed 5-9x
   per-task inflation for the first wave).  ``malloc_env()`` returns glibc
   tunables that keep large numpy temporaries on the reusable sbrk heap
   (MALLOC_MMAP_THRESHOLD_/MALLOC_TRIM_THRESHOLD_ high), and
   ``warm_workers`` pre-faults each worker's heap while the clock isn't
   running.
2. **Thread-pool oversubscription** — polars spawns a rayon pool sized to
   ALL cores per worker process (N workers x N threads); under Ray each task
   owns one CPU, so the pools must be pinned to 1 (POLARS_MAX_THREADS /
   RAYON_NUM_THREADS — numpy already honors the preset OMP_NUM_THREADS=1).

Call :func:`set_worker_env` BEFORE ``ray.init(address="local")`` so the
raylet (and thus every worker it spawns) inherits the environment.
"""

from __future__ import annotations

import os


def malloc_env() -> dict[str, str]:
    return {
        "POLARS_MAX_THREADS": "1",
        "RAYON_NUM_THREADS": "1",
        "MALLOC_MMAP_THRESHOLD_": str(1 << 30),
        "MALLOC_TRIM_THRESHOLD_": str(1 << 30),
    }


def set_worker_env() -> None:
    """Export the tunables into this process's environment (inherited by the
    raylet and all Ray workers when ray.init runs local mode afterwards)."""
    for k, v in malloc_env().items():
        os.environ.setdefault(k, v)


def warm_workers(ncpu: int, heap_mb: int = 384) -> None:
    """Pre-fault every worker's heap + import the hot modules, off the clock.
    Tasks sleep briefly so they spread across all `ncpu` workers instead of
    reusing one."""
    import time

    import ray

    @ray.remote
    def _warm(mb: int):
        import numpy as np
        import polars  # noqa: F401  (forces the 1-thread pool to spin up)

        import lucene_ray.index.shard  # noqa: F401
        import lucene_ray.index.postings  # noqa: F401

        a = np.empty(mb * 1024 * 1024 // 8)
        a[:: 4096 // 8] = 1.0          # touch every page once
        del a
        time.sleep(0.25)
        return 1

    ray.get([_warm.remote(heap_mb) for _ in range(ncpu)])
    ray.get([_warm.remote(heap_mb // 4) for _ in range(ncpu)])
