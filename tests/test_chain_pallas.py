"""Pallas chaining kernel vs the host reference DP (interpret mode)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from lrge_tpu.ops.chain import Anchors, chain_dp
from lrge_tpu.ops.chain_pallas import chain_dp_pallas
from lrge_tpu.platform import AVA_ONT


def make_anchor_rows(rng, B, A, n_rids=6, spread=6000):
    key2 = np.full((B, A), np.iinfo(np.int32).max, dtype=np.int32)
    rpos = np.zeros((B, A), dtype=np.int32)
    qpos = np.zeros((B, A), dtype=np.int32)
    valid = np.zeros((B, A), dtype=bool)
    per_row = []
    for b in range(B):
        n = int(rng.integers(A // 4, A))
        rid = np.sort(rng.integers(0, n_rids, size=n)).astype(np.int32)
        strand = rng.integers(0, 2, size=n).astype(np.int8)
        rp = rng.integers(0, spread, size=n).astype(np.int32)
        qp = rng.integers(0, spread, size=n).astype(np.int32)
        order = np.lexsort((rp, strand, rid))
        rid, strand, rp, qp = rid[order], strand[order], rp[order], qp[order]
        key2[b, :n] = rid * 2 + strand
        rpos[b, :n] = rp
        qpos[b, :n] = qp
        valid[b, :n] = True
        per_row.append((rid, strand, rp, qp, n))
    return key2, rpos, qpos, valid, per_row


class TestPallasChain:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_host_dp(self, seed):
        rng = np.random.default_rng(seed)
        B, A, W = 8, 256, 256  # W >= A: full lookback, comparable to host
        key2, rpos, qpos, valid, rows = make_anchor_rows(rng, B, A)
        f = np.asarray(
            chain_dp_pallas(
                jnp.asarray(key2),
                jnp.asarray(rpos),
                jnp.asarray(qpos),
                jnp.asarray(valid),
                jnp.float32(AVA_ONT.chn_pen_gap()),
                span=15,
                max_gap=AVA_ONT.max_gap,
                bw=AVA_ONT.bw,
                window=W,
                chunk=8,
                block=8,
                interpret=True,
            )
        )
        for b, (rid, strand, rp, qp, n) in enumerate(rows):
            anchors = Anchors(
                rid=rid, rpos=rp, qpos=qp, strand=strand,
                span=np.full(n, 15, dtype=np.int32),
            )
            f_host, _ = chain_dp(anchors, AVA_ONT)
            np.testing.assert_array_equal(f[b, :n], f_host, err_msg=f"row {b}")

    def test_invalid_rows_neg(self):
        B, A = 8, 64
        key2 = np.full((B, A), np.iinfo(np.int32).max, dtype=np.int32)
        z = np.zeros((B, A), dtype=np.int32)
        f = np.asarray(
            chain_dp_pallas(
                jnp.asarray(key2), jnp.asarray(z), jnp.asarray(z),
                jnp.asarray(np.zeros((B, A), dtype=bool)),
                jnp.float32(0.12),
                span=15, max_gap=5000, bw=2000, window=64, chunk=8, block=8,
                interpret=True,
            )
        )
        assert (f < 0).all()
