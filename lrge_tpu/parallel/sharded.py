"""Multi-chip scale-out: sharded target index + data-parallel queries.

The reference's only parallelism is shared-memory threads on one host
(SURVEY.md C16).  The TPU-native scale-out design (BASELINE.json north
star) instead shards the *work*, not the memory:

* mesh axes ``("data", "index")`` over a `jax.sharding.Mesh`;
* the **target read set is partitioned by read** (round-robin) across
  the ``index`` axis — each device holds a complete sorted postings
  sub-index for *its* targets, so chaining for a (query, target) pair
  is always local to one device (no cross-device anchors);
* **query batches are data-parallel** along ``data`` and replicated
  along ``index``;
* per-device unique-target counts are disjoint by construction, so the
  merge is a single ``psum`` over the ``index`` axis riding ICI.

The occurrence cutoff (``mid_occ``) is computed from the *global* index
before sharding, preserving exact parity with the single-chip path.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.index import TargetIndex
from ..ops.overlap_jax import map_batch_core


def make_mesh(n_data: int, n_index: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_data * n_index
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.array(devices[:n]).reshape(n_data, n_index)
    return Mesh(arr, ("data", "index"))


@dataclass
class ShardedDeviceIndex:
    """Per-shard index arrays stacked along a leading shard axis.

    Shard ``s`` owns target reads ``{i : i % n_shards == s}``; its
    postings are re-sorted locally and padded to the max shard size with
    sentinel keys (which can never match a valid query hash because
    invalid query slots are masked out in the core).
    """

    keys: np.ndarray  # [S, Npad] int32 (transformed hashes, sorted per shard)
    rid: np.ndarray  # [S, Npad] int32 — GLOBAL target ids
    pos: np.ndarray  # [S, Npad] int32
    strand: np.ndarray  # [S, Npad] int32
    rank: np.ndarray  # [T] int32 global name ranks (replicated)
    mid_occ: int
    n_shards: int

    @classmethod
    def from_host(cls, index: TargetIndex, n_shards: int) -> "ShardedDeviceIndex":
        # Apply the GLOBAL occurrence pruning before sharding: a
        # minimizer whose global occurrence exceeds mid_occ must be
        # dropped even when its per-shard occurrence is below the cutoff
        # (the in-core test sees only per-shard counts).  Same pruning
        # as DeviceIndex.from_host.
        from ..ops.overlap_jax import _pruned_postings

        pkeys, prid, ppos, pstrand = _pruned_postings(index)
        keys32 = (pkeys.astype(np.uint32) ^ np.uint32(0x80000000)).view(np.int32)
        shard_of = prid % n_shards
        sizes = [int((shard_of == s).sum()) for s in range(n_shards)]
        npad = max(sizes + [1])
        IMAX = np.iinfo(np.int32).max
        keys = np.full((n_shards, npad), IMAX, dtype=np.int32)
        rid = np.full((n_shards, npad), IMAX, dtype=np.int32)
        pos = np.zeros((n_shards, npad), dtype=np.int32)
        strand = np.zeros((n_shards, npad), dtype=np.int32)
        for s in range(n_shards):
            sel = np.flatnonzero(shard_of == s)
            sk = keys32[sel]
            order = np.argsort(sk, kind="stable")  # keys already grouped; keep (rid,pos) order
            n = len(sel)
            keys[s, :n] = sk[order]
            rid[s, :n] = prid[sel][order]
            pos[s, :n] = ppos[sel][order]
            strand[s, :n] = pstrand[sel][order].astype(np.int32)
        return cls(
            keys=keys,
            rid=rid,
            pos=pos,
            strand=strand,
            rank=index.name_rank.astype(np.int32),
            mid_occ=int(index.mid_occ),
            n_shards=n_shards,
        )


def sharded_count_fn(mesh: Mesh, *, k, max_gap, bw, min_score, num_anchors, window,
                     no_dual, no_diag, max_chain_skip=25, q_occ_frac=0.01):
    """Build a jitted shard_map counting function over ``mesh``.

    Returns ``fn(idx_keys [S,Npad], idx_rid, idx_pos, idx_strand,
    rank [T], mid_occ, mhash [B,M], mpos, mstrand, qlen, qdualrank,
    qselfrid, chn_pen_gap) -> (counts [B], n_anchors [B], max_run [B])``
    where B is the *global* query batch (sharded over "data") and the
    leading S axis is sharded over "index".
    """

    from ..utils.jaxcache import enable_cache

    enable_cache()

    def per_device(idx_keys, idx_rid, idx_pos, idx_strand, rank, mid_occ,
                   mhash, mpos, mstrand, qlen, qdualrank, qselfrid, chn_pen_gap):
        # inside shard_map: leading shard axes are size 1 on each device
        counts, n_anchors, max_run, pair_rids = map_batch_core(
            idx_keys[0],
            idx_rid[0],
            idx_pos[0],
            idx_strand[0],
            rank,
            mid_occ[0][0],
            mhash,
            mpos,
            mstrand,
            qlen,
            qdualrank,
            qselfrid,
            chn_pen_gap[0][0],
            k=k,
            max_gap=max_gap,
            bw=bw,
            min_score=min_score,
            num_anchors=num_anchors,
            window=window,
            no_dual=no_dual,
            no_diag=no_diag,
            max_chain_skip=max_chain_skip,
            q_occ_frac=q_occ_frac,
        )
        # disjoint target shards: merge with collectives over ICI
        counts = jax.lax.psum(counts, axis_name="index")
        n_anchors = jax.lax.pmax(n_anchors, axis_name="index")
        max_run = jax.lax.pmax(max_run, axis_name="index")
        # per-query passing-target lists (global rids, disjoint across
        # shards): all_gather over the index axis, concat per query
        allp = jax.lax.all_gather(pair_rids, axis_name="index")  # [S, B, P]
        allp = jnp.transpose(allp, (1, 0, 2)).reshape(pair_rids.shape[0], -1)
        return counts, n_anchors, max_run, allp

    shard = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(
            P("index", None),  # idx keys [S, Npad]
            P("index", None),
            P("index", None),
            P("index", None),
            P(None),  # rank (replicated)
            P("index", None),  # mid_occ as [S, 1]
            P("data", None),  # mhash [B, M]
            P("data", None),
            P("data", None),
            P("data"),
            P("data"),
            P("data"),
            P("index", None),  # chn_pen_gap as [S, 1]
        ),
        out_specs=(P("data"), P("data"), P("data"), P("data", None)),
        # the scan carry is initialised inside the mapped function; skip
        # the varying-manual-axes check rather than pcast every buffer
        check_vma=False,
    )
    return jax.jit(shard)
