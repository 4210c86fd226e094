"""Steady-state multi-host lockstep proxy (run by __graft_entry__).

Every process builds the same synthetic corpus + sharded engine, runs
one counting pass to compile, then times a second pass.  Rank 0 prints
``PROXY t=<seconds> sum=<counts-sum>``.  Two modes:

* ``LRGE_COORDINATOR`` set: 2-process lockstep via
  ``multihost_count_batch`` (mesh data axis = processes).
* unset: single-process ``count_batch`` over all local (virtual)
  devices (``LRGE_SHARDS`` pins the shard count).

The proxy isolates the SCHEDULE (lockstep dispatches + collectives vs
local dispatches) at steady state — virtual devices share the host's
physical cores, so absolute times are not host-scaling numbers; the
single/two-process ratio bounds the lockstep overhead (ideal 1.0).
"""
import os
import sys
import time

import numpy as np


def main():
    n_q = int(os.environ.get("PROXY_QUERIES", 384))
    from lrge_tpu.parallel.distributed import init_from_env, is_multihost

    init_from_env()
    import jax

    from lrge_tpu.device_engine import DeviceOverlapEngine
    from lrge_tpu.ops.index import build_index
    from lrge_tpu.platform import Platform, preset_for

    rng = np.random.default_rng(11)
    G = 300_000
    g = np.frombuffer(rng.integers(0, 4, size=G, dtype=np.uint8), dtype=np.uint8)
    genome = np.frombuffer(b"ACGT", dtype=np.uint8)[g].tobytes()
    gg = np.frombuffer(genome, np.uint8)

    def reads(n, L):
        out = []
        for _ in range(n):
            p = int(rng.integers(0, G - L))
            out.append(gg[p : p + L].tobytes())
        return out

    targets = reads(512, 900)
    queries = reads(n_q, 900)
    tnames = [b"t%d" % i for i in range(len(targets))]
    qnames = [b"q%d" % i for i in range(len(queries))]
    params = preset_for(Platform.NANOPORE, dual=True)
    index = build_index(targets, tnames, params)
    dev = DeviceOverlapEngine(index)

    def run():
        if is_multihost():
            from lrge_tpu.parallel.distributed import multihost_count_batch

            return multihost_count_batch(dev, qnames, queries)
        return dev.count_batch(qnames, queries)

    run()  # compile + caches
    t0 = time.perf_counter()
    res = run()
    dt = time.perf_counter() - t0
    if jax.process_index() == 0:
        print(f"PROXY t={dt:.3f} sum={int(res.counts.sum())}", flush=True)


if __name__ == "__main__":
    main()
