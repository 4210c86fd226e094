"""Multi-host runtime: ``jax.distributed`` init + lockstep counting.

The reference is single-host only (SURVEY.md C16); the multi-host
requirement comes from BASELINE.json (>= 0.8 scaling efficiency at 2
hosts with the target index sharded across hosts).  Design:

* every process runs the same CLI on the same input: subsampling is
  seeded and deterministic, so all processes derive the SAME
  target/query split and build the SAME host index (replicated build —
  the index is small next to the read file; the DEVICE copy is what is
  sharded);
* the mesh is ``(data = n_processes, index = local chips)`` over the
  global device list, so the target index shards over every chip of
  every host and **query I/O is sharded per host**: process ``p`` only
  sketches/dispatches rows of its contiguous slice;
* dispatches run in **lockstep**: each process computes the full
  per-process schedule (it knows every slice deterministically) and
  all processes enter the same jitted collective program the same
  number of times, padding with empty rows where slices are uneven;
* per-query counts come back sharded over "data"; each process
  recomputes its own fallback rows on its local host engine, then a
  ``process_allgather`` assembles the global count vector on every
  host — the median is computed identically everywhere and host 0
  prints (`cli.py` gates output on ``jax.process_index() == 0``).

Env contract (all three required to activate, mirroring
``jax.distributed.initialize``):

* ``LRGE_COORDINATOR`` — ``host:port`` of process 0
* ``LRGE_NUM_PROCESSES`` — world size
* ``LRGE_PROCESS_ID`` — this process's rank
"""

from __future__ import annotations

import logging
import os

import numpy as np

logger = logging.getLogger("lrge")

_INITIALIZED = False


def init_from_env() -> bool:
    """Env-gated ``jax.distributed.initialize``; returns True when this
    process is part of a multi-process run.  Must be called before any
    JAX computation (the CLI calls it first thing)."""
    global _INITIALIZED
    coord = os.environ.get("LRGE_COORDINATOR")
    if not coord:
        return False
    if _INITIALIZED:
        return True
    nproc = int(os.environ["LRGE_NUM_PROCESSES"])
    pid = int(os.environ["LRGE_PROCESS_ID"])
    import jax

    # the axon sitecustomize pre-imports jax and pins its own platform;
    # re-assert the env-requested platform via config (env alone is
    # read too early to stick) BEFORE the backend initialises
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    _INITIALIZED = True
    logger.info(
        "distributed runtime: process %d/%d, %d local / %d global devices",
        pid, nproc, len(jax.local_devices()), len(jax.devices()),
    )
    return True


def is_multihost() -> bool:
    import jax

    return _INITIALIZED and jax.process_count() > 1


def process_slice(n: int, pid: int, nproc: int) -> tuple[int, int]:
    """Contiguous [start, end) of rows owned by process ``pid``."""
    base, rem = divmod(n, nproc)
    start = pid * base + min(pid, rem)
    return start, start + base + (1 if pid < rem else 0)


def multihost_count_batch(dev, names: list, seqs: list):
    """Count overlaps for ALL queries across processes in lockstep.

    ``dev`` is a :class:`~lrge_tpu.device_engine.DeviceOverlapEngine`
    whose mesh spans processes (``data`` = processes).  Every process
    passes the FULL query list (deterministically identical across
    processes); each one only sketches and host-recomputes its own
    slice.  Returns a ``BatchCounts`` with the global counts, identical
    on every process.
    """
    import jax
    import jax.numpy as jnp

    from ..device_engine import BatchCounts
    from ..ops.encode import encode_seq
    from ..ops.overlap_jax import minimizer_cap
    from ..ops.sketch import needs_scalar_sketch

    nproc = jax.process_count()
    pid = jax.process_index()
    mesh = dev._mesh
    n_data = mesh.devices.shape[0]
    assert n_data == nproc, "multihost mesh must put the data axis on processes"
    p = dev.params

    n = len(seqs)
    counts = np.zeros(n, dtype=np.int32)
    had = np.zeros(n, dtype=bool)
    fallback = 0

    # ---- deterministic global schedule ----
    # Device-eligible rows use ONE bucket (the largest) so every
    # process compiles exactly one program; rows longer than the bucket
    # go to each owner's host engine.
    L = dev.length_buckets[-1]
    A = dev.num_anchors * (L // dev.length_buckets[0])
    M = minimizer_cap(L)
    B = dev.batch_size
    assert B % nproc == 0, "batch size must divide by process count"
    b_loc = B // nproc
    slices = [process_slice(n, q, nproc) for q in range(nproc)]
    dev_rows_per = []  # per process: its device-eligible rows (global ids)
    host_rows_per = []
    for q in range(nproc):
        s, e = slices[q]
        rows = list(range(s, e))
        dev_rows_per.append([i for i in rows if len(seqs[i]) <= L])
        host_rows_per.append([i for i in rows if len(seqs[i]) > L])
    n_dispatch = max(
        (len(r) + b_loc - 1) // b_loc for r in dev_rows_per
    ) if any(dev_rows_per) else 0

    # ---- local host work (long rows) runs concurrently ----
    from concurrent.futures import ThreadPoolExecutor

    my_host_rows = host_rows_per[pid]
    pool = ThreadPoolExecutor(1) if my_host_rows else None
    host_future = (
        pool.submit(dev._host_count_many, [(names[i], seqs[i]) for i in my_host_rows])
        if my_host_rows
        else None
    )

    # ---- lockstep device dispatches ----
    from jax.sharding import NamedSharding, PartitionSpec as P

    data_sh = NamedSharding(mesh, P("data", None))
    data_sh1 = NamedSharding(mesh, P("data"))
    my_rows = dev_rows_per[pid]
    retry = []
    qdualrank = {i: dev.host._dual_rank(names[i]) if p.no_dual else 0 for i in my_rows}
    qselfrid = {i: dev.host._name_to_rid.get(names[i], -1) for i in my_rows}
    for d in range(n_dispatch):
        block = my_rows[d * b_loc : (d + 1) * b_loc]
        ids = np.full(b_loc, -1, np.int64)
        ids[: len(block)] = block
        lengths = np.array(
            [len(seqs[i]) if i >= 0 else 0 for i in ids], np.int32
        )
        qd = np.array([qdualrank.get(i, 0) for i in ids], np.int32)
        qs = np.array([qselfrid.get(i, -1) for i in ids], np.int32)
        if dev.pb_mode:
            qhi, qlo, mps_h, mc = dev._pb_planes(
                [seqs[i] if i >= 0 else b"" for i in ids], M
            )
            q0_l, q1_l, mps_l = qhi, qlo, mps_h
        else:
            codes = np.full((b_loc, L), 4, np.uint8)
            for r, i in enumerate(ids):
                if i >= 0:
                    codes[r, : lengths[r]] = encode_seq(seqs[i])
            from ..ops.overlap_jax import sketch_many

            mh, mp, ms, mc_d = jax.device_get(
                sketch_many(
                    jnp.asarray(codes[None]), jnp.asarray(lengths[None]),
                    k=p.k, w=p.w,
                )
            )
            q0_l, mps_l = mh[0], mp[0] * 2 + ms[0]
            q1_l = np.zeros((b_loc, 1), np.int32)
            mc = mc_d[0]
        mk = lambda sh, x: jax.make_array_from_process_local_data(sh, x)
        c, a, r, _pr = dev._sharded_fn(
            dev._idx_tree,
            mk(data_sh, np.ascontiguousarray(q0_l)),
            mk(data_sh, np.ascontiguousarray(q1_l)),
            mk(data_sh, np.ascontiguousarray(mps_l)),
            mk(data_sh1, lengths),
            mk(data_sh1, qd),
            mk(data_sh1, qs),
            jnp.int32(dev.sharded.mid_occ),
            jnp.float32(p.chn_pen_gap()),
        )
        # my slice of the global outputs (allgather: tiny [B] vectors)
        from jax.experimental import multihost_utils

        c_g = np.asarray(multihost_utils.process_allgather(c, tiled=True))
        a_g = np.asarray(multihost_utils.process_allgather(a, tiled=True))
        r_g = np.asarray(multihost_utils.process_allgather(r, tiled=True))
        sl = slice(pid * b_loc, (pid + 1) * b_loc)
        c_l, a_l, r_l = c_g[sl], a_g[sl], r_g[sl]
        for row, i in enumerate(ids):
            if i < 0:
                continue
            seq_row = seqs[i]
            if (
                a_l[row] > A
                or r_l[row] > dev.window
                or mc[row] > M
                or (
                    (not dev.pb_mode)
                    and needs_scalar_sketch(encode_seq(seq_row), p.k, p.w, False)
                )
            ):
                retry.append(i)
            else:
                counts[i] = c_l[row]
                had[i] = c_l[row] > 0

    # ---- local exact recompute of flagged rows ----
    for i, (cn, h) in zip(retry, dev._host_count_many([(names[i], seqs[i]) for i in retry])):
        counts[i], had[i] = cn, h
        fallback += 1
    if host_future is not None:
        for i, (cn, h) in zip(my_host_rows, host_future.result()):
            counts[i], had[i] = cn, h
            fallback += 1
        pool.shutdown()

    # ---- assemble the global vector on every host ----
    from jax.experimental import multihost_utils

    s, e = slices[pid]
    width = max(en - st for st, en in slices)
    my_counts = np.full(width, -1, np.int32)
    my_counts[: e - s] = counts[s:e]
    my_had = np.zeros(width, np.int8)
    my_had[: e - s] = had[s:e]
    all_counts = np.asarray(multihost_utils.process_allgather(my_counts))
    all_had = np.asarray(multihost_utils.process_allgather(my_had))
    for q, (st, en) in enumerate(slices):
        counts[st:en] = all_counts[q, : en - st]
        had[st:en] = all_had[q, : en - st].astype(bool)
    return BatchCounts(counts, had, fallback)
