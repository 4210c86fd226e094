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

    # ---- collective-vs-compute split (VERDICT r4 item 8) ----
    # Time ONE sharded dispatch with and without its collectives (the
    # no_collectives variant keeps per-device compute identical, see
    # parallel/sharded.py) so the 2-host efficiency claim extrapolates
    # from a measured per-dispatch collective share instead of a noisy
    # whole-pass wall ratio.  Lockstep-safe: every process runs the
    # same dispatches in the same order.
    split_line = ""
    if dev.sharded is not None and os.environ.get("PROXY_SPLIT", "1") == "1":
        import jax.numpy as jnp

        from lrge_tpu.ops.encode import make_batches
        from lrge_tpu.ops.overlap_jax import sketch_many
        from lrge_tpu.parallel.sharded import sharded_count_fn

        L = dev.length_buckets[0]
        B = dev.batch_size
        (batch,) = make_batches(
            queries[:B], ids=list(range(min(B, len(queries)))),
            batch_size=B, pad_to=L, pow2_lengths=False, pad_batch=True,
        )
        codes = jnp.asarray(batch.codes[None])
        lengths = jnp.asarray(batch.lengths[None])
        mhash, mpos, mstrand, _mc = sketch_many(
            codes, lengths, k=dev.params.k, w=dev.params.w
        )
        q1 = jnp.zeros(mhash.shape[:2] + (1,), jnp.int32)
        mpsd = mpos * 2 + mstrand
        zeros = jnp.zeros((B,), jnp.int32)
        args = (
            dev._idx_tree, mhash[0], q1[0], mpsd[0], lengths[0],
            zeros, jnp.full((B,), -1, jnp.int32),
            jnp.int32(dev.sharded.mid_occ),
            jnp.float32(dev.params.chn_pen_gap()),
        )
        fn_full = dev._sharded_fn_for(dev.num_anchors)
        fn_nc = sharded_count_fn(
            dev._mesh, num_anchors=dev.num_anchors,
            no_collectives=True, **dev._sharded_kwargs,
        )

        def best_of(fn, reps=3):
            jax.block_until_ready(fn(*args))  # compile
            ts = []
            for _ in range(reps):
                t1 = time.perf_counter()
                jax.block_until_ready(fn(*args))
                ts.append(time.perf_counter() - t1)
            return min(ts)

        t_full = best_of(fn_full)
        t_nc = best_of(fn_nc)
        share = max(0.0, (t_full - t_nc) / t_full) if t_full > 0 else 0.0
        split_line = (
            f" dispatch_full={t_full*1000:.1f}ms"
            f" dispatch_nocoll={t_nc*1000:.1f}ms coll_share={share:.2f}"
        )

    if jax.process_index() == 0:
        print(
            f"PROXY t={dt:.3f} sum={int(res.counts.sum())}{split_line}",
            flush=True,
        )


if __name__ == "__main__":
    main()
