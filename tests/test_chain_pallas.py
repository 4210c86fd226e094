"""Pallas chaining kernel (interpret mode) vs the host reference DP.

The kernel must reproduce the exact `mm_chain_dp` semantics the host
oracle models (`ops/chain.py`), including the ``max_chain_skip`` early
break, and the full device pipeline must produce identical counts with
either DP backend (XLA scan / Pallas kernel).
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from lrge_tpu.ops.chain import Anchors, chain_dp
from lrge_tpu.ops.chain_pallas import chain_dp_skip
from lrge_tpu.platform import AVA_ONT

IMAX = np.iinfo(np.int32).max


def run_kernel(key2, rpos, qpos, valid, *, window, block=8, max_skip=25):
    nvalid = valid.sum(axis=1).astype(np.int32)
    f, broke = chain_dp_skip(
        jnp.asarray(key2),
        jnp.asarray(rpos),
        jnp.asarray(qpos),
        jnp.asarray(valid),
        jnp.asarray(nvalid),
        jnp.float32(AVA_ONT.chn_pen_gap()),
        span=15,
        max_gap=AVA_ONT.max_gap,
        bw=AVA_ONT.bw,
        max_skip=max_skip,
        window=window,
        block=block,
        interpret=True,
    )
    return np.asarray(f), np.asarray(broke)


def make_anchor_rows(rng, B, A, n_rids=6, spread=6000, min_frac=4):
    key2 = np.full((B, A), IMAX, dtype=np.int32)
    rpos = np.zeros((B, A), dtype=np.int32)
    qpos = np.zeros((B, A), dtype=np.int32)
    valid = np.zeros((B, A), dtype=bool)
    per_row = []
    for b in range(B):
        n = int(rng.integers(A // min_frac, A))
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


def make_colinear_rows(rng, B, A, step=3, jitter=40):
    """Dense colinear runs (single rid/strand): the max_chain_skip break
    fires within a few dozen anchors on every one of these rows."""
    key2 = np.full((B, A), IMAX, dtype=np.int32)
    rpos = np.zeros((B, A), dtype=np.int32)
    qpos = np.zeros((B, A), dtype=np.int32)
    valid = np.zeros((B, A), dtype=bool)
    per_row = []
    for b in range(B):
        n = int(rng.integers(A // 2, A))
        base = np.arange(n, dtype=np.int32) * step
        rp = base + rng.integers(0, jitter, size=n).astype(np.int32)
        qp = base + rng.integers(0, jitter, size=n).astype(np.int32)
        order = np.argsort(rp, kind="stable")
        rp, qp = rp[order], qp[order]
        rid = np.zeros(n, dtype=np.int32)
        strand = np.zeros(n, dtype=np.int8)
        key2[b, :n] = 0
        rpos[b, :n] = rp
        qpos[b, :n] = qp
        valid[b, :n] = True
        per_row.append((rid, strand, rp, qp, n))
    return key2, rpos, qpos, valid, per_row


def host_f(rows, b):
    rid, strand, rp, qp, n = rows[b]
    anchors = Anchors(
        rid=rid, rpos=rp, qpos=qp, strand=strand,
        span=np.full(n, 15, dtype=np.int32),
    )
    f, _ = chain_dp(anchors, AVA_ONT)
    return f


class TestPallasChainKernel:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_host_dp_random(self, seed):
        rng = np.random.default_rng(seed)
        B, A = 8, 128
        key2, rpos, qpos, valid, rows = make_anchor_rows(rng, B, A)
        f, _ = run_kernel(key2, rpos, qpos, valid, window=128)
        for b in range(B):
            np.testing.assert_array_equal(
                f[b, : rows[b][4]], host_f(rows, b), err_msg=f"row {b}"
            )

    def test_matches_host_dp_skip_break(self):
        # dense colinear plateaus: every row fires the skip break; with
        # W >= n the kernel window covers everything the host sees, so
        # scores (including the break position's effect) must be equal
        rng = np.random.default_rng(7)
        B, A = 8, 128
        key2, rpos, qpos, valid, rows = make_colinear_rows(rng, B, A)
        f, broke = run_kernel(key2, rpos, qpos, valid, window=128)
        assert broke.any(), "corpus must exercise the skip break"
        for b in range(B):
            np.testing.assert_array_equal(
                f[b, : rows[b][4]], host_f(rows, b), err_msg=f"row {b}"
            )

    def test_broke_flag_matches_host_cut(self):
        # with a small window, rows whose runs exceed W must either have
        # broken (exact: the scan never looked further) or be flagged by
        # the caller; here every dense row breaks within W
        rng = np.random.default_rng(11)
        B, A = 8, 128
        key2, rpos, qpos, valid, rows = make_colinear_rows(rng, B, A)
        f, broke = run_kernel(key2, rpos, qpos, valid, window=64)
        # the skip break fires well inside 64 anchors on dense colinear
        # runs, so scores still match the host exactly
        assert broke.any()
        for b in range(B):
            np.testing.assert_array_equal(
                f[b, : rows[b][4]], host_f(rows, b), err_msg=f"row {b}"
            )

    def test_invalid_rows_neg(self):
        B, A = 8, 64
        key2 = np.full((B, A), IMAX, dtype=np.int32)
        z = np.zeros((B, A), dtype=np.int32)
        f, broke = run_kernel(key2, z, z, np.zeros((B, A), dtype=bool), window=64)
        assert (f < 0).all()
        assert not broke.any()

    def test_dynamic_bound_ignores_padding(self):
        # scores for slots past each row's nvalid must stay NEG even if
        # the padding region carries garbage keys
        rng = np.random.default_rng(3)
        B, A = 8, 128
        key2, rpos, qpos, valid, rows = make_anchor_rows(rng, B, A)
        f, _ = run_kernel(key2, rpos, qpos, valid, window=128)
        for b in range(B):
            n = rows[b][4]
            assert (f[b, n:] < 0).all()


class TestEnginePallasParity:
    def test_engine_counts_match_host(self, monkeypatch):
        from lrge_tpu.device_engine import DeviceOverlapEngine
        from lrge_tpu.engine import OverlapEngine
        from lrge_tpu.ops.index import build_index
        from lrge_tpu.platform import Platform, preset_for

        monkeypatch.setenv("LRGE_PALLAS", "1")
        monkeypatch.setenv("LRGE_PALLAS_INTERPRET", "1")
        rng = np.random.default_rng(23)
        genome = bytes(rng.choice(list(b"ACGT"), size=40_000).tolist())

        def mk(n, L, err):
            out = []
            rc = bytes.maketrans(b"ACGT", b"TGCA")
            for _ in range(n):
                pos = int(rng.integers(0, len(genome) - L))
                seq = bytearray(genome[pos : pos + L])
                nerr = rng.binomial(L, err)
                for s in rng.integers(0, L, size=nerr):
                    seq[s] = int(rng.choice(list(b"ACGT")))
                seq = bytes(seq)
                if rng.integers(0, 2):
                    seq = seq.translate(rc)[::-1]
                out.append(seq)
            return out

        targets = mk(40, 1500, 0.08)
        tnames = [f"t{i}".encode() for i in range(40)]
        queries = mk(12, 1800, 0.08)
        qnames = [f"q{i}".encode() for i in range(12)]
        params = preset_for(Platform.NANOPORE, dual=True)
        index = build_index(targets, tnames, params)
        host = OverlapEngine(index)
        dev = DeviceOverlapEngine(
            index, batch_size=8, num_anchors=1024, window=64
        )
        assert dev.use_pallas and dev.pallas_interpret
        res = dev.count_batch(qnames, queries)
        for i in range(12):
            hc, hh = host.count_overlaps(qnames[i], queries[i])
            assert res.counts[i] == hc, f"query {i}: pallas {res.counts[i]} host {hc}"
            assert bool(res.had_mapping[i]) == bool(hh)
