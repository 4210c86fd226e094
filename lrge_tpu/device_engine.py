"""Batched device overlap engine with exact host fallback.

Drives ``ops.overlap_jax.map_batch_device`` over length-bucketed query
batches.  Rows that the device path cannot guarantee exactly —
anchor-buffer overflow, minimizer-capacity truncation, or a
(rid,strand) anchor run longer than the DP window — are recomputed with
the exact host engine, so **counts are always exact**; the device only
accelerates.

The ONT preset (non-HPC, 2k <= 32) is device-supported; the PacBio/HPC
preset currently routes everything to the host path (64-bit keys and
variable spans; device port planned).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

import numpy as np

from .engine import OverlapEngine
from .ops.encode import make_batches
from .ops.index import TargetIndex
from .ops.overlap_jax import DeviceIndex, map_batch_device
from .ops.sketch_jax import sketch_batch_exact

logger = logging.getLogger("lrge")


@dataclass
class BatchCounts:
    counts: np.ndarray  # [n] unique-target overlap counts
    had_mapping: np.ndarray  # [n] bool
    fallback_rows: int  # rows recomputed on host


class DeviceOverlapEngine:
    def __init__(
        self,
        index: TargetIndex,
        *,
        batch_size: int = 128,
        num_anchors: int = 4096,
        window: int = 512,
    ):
        self.index = index
        self.params = index.params
        self.host = OverlapEngine(index)
        self.batch_size = batch_size
        self.num_anchors = num_anchors
        self.window = window
        self.device_ok = (not self.params.hpc) and 2 * self.params.k <= 32
        if self.device_ok:
            self.dev = DeviceIndex.from_host(index)

    def _host_count(self, name: bytes, seq: bytes) -> tuple[int, int]:
        return self.host.count_overlaps(name, seq)

    def count_batch(self, names: list, seqs: list) -> BatchCounts:
        n = len(seqs)
        counts = np.zeros(n, dtype=np.int32)
        had = np.zeros(n, dtype=bool)
        fallback = 0
        if not self.device_ok:
            for i, (nm, sq) in enumerate(zip(names, seqs)):
                c, h = self._host_count(nm, sq)
                counts[i], had[i] = c, h
            return BatchCounts(counts, had, n)

        import jax.numpy as jnp

        p = self.params
        qdualrank = np.array(
            [self.host._dual_rank(nm) if p.no_dual else 0 for nm in names], dtype=np.int32
        )
        qselfrid = np.array(
            [self.host._name_to_rid.get(nm, -1) for nm in names], dtype=np.int32
        )
        batches = make_batches(
            seqs,
            batch_size=self.batch_size,
            pad_to=2048,
            pow2_lengths=True,
            pad_batch=True,
        )
        for batch in batches:
            B, L = batch.codes.shape
            M = L // 2
            mhash, mpos, mstrand, mcount = sketch_batch_exact(
                batch.codes, batch.lengths, k=p.k, w=p.w, max_minimizers=M
            )
            bcounts, n_anchors, max_run = map_batch_device(
                self.dev.keys,
                self.dev.rid,
                self.dev.pos,
                self.dev.strand,
                self.dev.rank,
                jnp.int32(self.dev.mid_occ),
                jnp.asarray(mhash),
                jnp.asarray(mpos),
                jnp.asarray(mstrand),
                jnp.asarray(batch.lengths),
                jnp.asarray(qdualrank[batch.ids]),
                jnp.asarray(qselfrid[batch.ids]),
                jnp.float32(p.chn_pen_gap()),
                k=p.k,
                max_gap=p.max_gap,
                bw=p.bw,
                min_score=p.min_chain_score,
                num_anchors=self.num_anchors,
                window=self.window,
                no_dual=p.no_dual,
                no_diag=p.no_diag,
            )
            bcounts = np.asarray(bcounts)
            n_anchors = np.asarray(n_anchors)
            max_run = np.asarray(max_run)
            needs_host = (
                (n_anchors > self.num_anchors)
                | (max_run > self.window)
                | (mcount > M)
            )
            for row, qid in enumerate(batch.ids):
                if qid < 0:
                    continue  # batch padding row
                if needs_host[row]:
                    c, h = self._host_count(names[qid], seqs[qid])
                    counts[qid], had[qid] = c, h
                    fallback += 1
                else:
                    counts[qid] = bcounts[row]
                    had[qid] = bcounts[row] > 0
        if fallback:
            logger.debug("device path: %d/%d rows fell back to host", fallback, n)
        return BatchCounts(counts, had, fallback)
