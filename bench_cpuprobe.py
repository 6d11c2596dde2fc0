"""Host per-core throughput probe — the denominator for honest
single-VM scaling evidence.

The north rule's scaling criterion targets N -> 4N EXECUTORS on a real
cluster, where added executors are whole new machines. The sandbox
proxy (one VM, local[N] vs local[4N]) conflates two effects:

  measured_efficiency = engine_scaling x host_percore_ratio

where ``host_percore_ratio`` is how much per-core throughput the HOST
itself loses when more cores run concurrently (all-core turbo /
shared-cache / memory-bandwidth effects — properties of the VM, not
the engine). This probe measures that ratio directly: a fixed
pure-CPU workload (chained md5 over 4 KB blocks — no Python object
churn, no I/O, no shared state) run by 1/2/8/32 concurrent processes;
the per-process wall-clock ratio between two concurrency levels is
the ceiling ANY perfectly scaling program can measure on this box.

Usage: ``python bench_cpuprobe.py`` -> one JSON line with per-process
seconds per concurrency level and the 2->8 ratio used to normalize
``bench_scaling.py`` results in BASELINE.md.
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import time

_BARRIER = None


def _init(barrier) -> None:
    global _BARRIER
    _BARRIER = barrier


def _work(_: int) -> float:
    # start barrier: every worker begins its timed loop simultaneously,
    # so each task truly runs under n-way contention (with chunksize
    # scheduling alone, an early worker can grab a second task after
    # peers finish, understating contention and inflating the ceiling)
    _BARRIER.wait()
    t0 = time.time()
    h = b"x" * 4096
    for _ in range(120000):
        h = hashlib.md5(h).digest() + h[:4084]
    return time.time() - t0


def main() -> None:
    out = {}
    for n in (1, 2, 8, 32):
        barrier = mp.Barrier(n)
        with mp.Pool(n, initializer=_init, initargs=(barrier,)) as p:
            times = p.map(_work, range(n), chunksize=1)
        out[str(n)] = round(sum(times) / len(times), 3)
    out["ratio_2_to_8"] = round(out["2"] / out["8"], 3)
    print(json.dumps({"metric": "host_percore_sec_by_concurrency", **out}))


if __name__ == "__main__":
    main()
