"""Fine-grained on-chip timing of the FLATTENED device pipeline.

Times each stage of the [NB*B]-row pipeline standalone (median of
reps): sketch, dictionary probe, q_occ, the expand sub-ops (scatter,
fill, posting gather), sort, DP, reduce, plus the composed
map_found_many in flat vs lax.map modes.

Run from repo root: python tools/stage_probe3.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import jax
import jax.numpy as jnp

import bench as BN
from lrge_tpu.device_engine import DeviceOverlapEngine
from lrge_tpu.ops.encode import encode_seq
from lrge_tpu.ops.index import build_index
from lrge_tpu.ops.overlap_jax import (
    IMAX,
    _cuckoo_lookup,
    _gather1,
    _q_occ_drop_narrow,
    map_found_many,
    minimizer_cap,
    sketch_lookup_many,
)
from lrge_tpu.ops.sketch_jax import sketch_core
from lrge_tpu.platform import Platform, preset_for


def t(tag, fn, pick, reps=5):
    o = fn()
    np.asarray(pick(o))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        o = fn()
        np.asarray(pick(o))
        ts.append(time.perf_counter() - t0)
    print(
        f"{tag:<30} med {np.median(ts)*1000:8.1f} ms  min {min(ts)*1000:8.1f}",
        file=sys.stderr, flush=True,
    )
    return o


def main():
    rng = np.random.default_rng(6)
    genome_size = 4_400_000
    g = np.frombuffer(
        rng.integers(0, 4, size=genome_size, dtype=np.uint8), dtype=np.uint8
    )
    genome = bytes(np.frombuffer(b"ACGT", dtype=np.uint8)[g].tobytes())
    targets = BN.make_reads(rng, genome, 10_000, 2500, 0.05)
    tnames = [b"t%d" % i for i in range(10_000)]
    params = preset_for(Platform.NANOPORE, dual=True)
    index = build_index(targets, tnames, params)
    eng = DeviceOverlapEngine(index, batch_size=128, num_anchors=4096, window=32)
    gd = eng.gdev
    p = params

    queries = [
        q for q in BN.make_reads(rng, genome, 1400, 2500, 0.05) if len(q) <= 4096
    ][:1024]
    SUP, B, L = 8, 128, 4096
    R = SUP * B
    codes = np.full((SUP, B, L), 4, np.uint8)
    lengths = np.zeros((SUP, B), np.int32)
    order = np.argsort([len(q) for q in queries])
    for i, qi in enumerate(order):
        q = queries[qi]
        gidx, b = divmod(i, B)
        codes[gidx, b, : len(q)] = encode_seq(q)
        lengths[gidx, b] = len(q)
    codes_d = jnp.asarray(codes)
    lengths_d = jnp.asarray(lengths)
    codes_f = jnp.asarray(codes.reshape(R, L))
    lengths_f = jnp.asarray(lengths.reshape(R))
    dual = jnp.zeros((SUP, B), jnp.int32)
    selfr = jnp.full((SUP, B), -1, jnp.int32)
    M = minimizer_cap(L)
    A = 4096

    # ---- sketch alone (flat) ----
    sk = jax.jit(
        lambda c, ln: sketch_core(c, ln, k=p.k, w=p.w, max_minimizers=M)
    )
    mh, mpos, mstr, mc = t("sketch flat", lambda: sk(codes_f, lengths_f), lambda o: o[3])

    # ---- probe alone ----
    assert gd.cuckoo_bits
    pr = jax.jit(lambda h: _cuckoo_lookup(h, gd.uhash, cuckoo_bits=gd.cuckoo_bits))
    found_raw = t("cuckoo probe flat", lambda: pr(mh), lambda o: o[:, :1])

    qo = jax.jit(
        lambda h: _q_occ_drop_narrow(h, jnp.int32(gd.mid_occ), p.q_occ_frac)
    )
    t("q_occ flat", lambda: qo(mh), lambda o: o[:, :1])

    # ---- full sketch+lookup (flat vs map) ----
    def sl(flatten):
        return sketch_lookup_many(
            codes_d, lengths_d, gd.uhash, gd.uoff, gd.boff,
            jnp.int32(gd.mid_occ), k=p.k, w=p.w,
            bucket_bits=gd.bucket_bits, bucket_kmax=gd.bucket_kmax,
            q_occ_frac=p.q_occ_frac, cuckoo_bits=gd.cuckoo_bits,
            dict_occ_bits=gd.packed_dict_bits, flatten=flatten,
        )

    found, mps, mcv = t("sketch_lookup map", lambda: sl(False), lambda o: o[2])
    t("sketch_lookup FLAT", lambda: sl(True), lambda o: o[2])

    # ---- expand sub-ops on real planes (flat) ----
    ff = found.reshape(R, M)
    mf_ = mps.reshape(R, M)
    fc = jnp.maximum(ff, 0)
    loocc0 = gd.loocc[0]
    bits = gd.packed_dict_bits

    @jax.jit
    def occ_of(ffx):
        lo_occ = _gather1(loocc0, jnp.maximum(ffx, 0))
        lo = lo_occ >> bits
        occ = jnp.where(ffx >= 0, lo_occ & ((1 << bits) - 1), 0)
        return lo, occ

    lo_, occ_ = t("dict range fetch", lambda: occ_of(ff), lambda o: o[1][:, :1])

    @jax.jit
    def expand_scatter(lo, occ, mpsx):
        cum = jnp.cumsum(occ, axis=1)
        prev_cum = cum - occ
        live = (occ > 0) & (prev_cum < A)
        tgt = jax.lax.optimization_barrier(jnp.where(live, prev_cum, 0))
        rows = jnp.arange(R, dtype=jnp.int32)[:, None]
        _bar = jax.lax.optimization_barrier
        m_ids = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32)[None, :], (R, M))
        sc_m = _bar(
            jnp.zeros((R, A), jnp.int32).at[rows, tgt].max(
                _bar(jnp.where(live, m_ids + 1, 0))
            )
        )
        return sc_m, cum

    sc_m, cum = t(
        "expand scatter [R,A]", lambda: expand_scatter(lo_, occ_, mf_),
        lambda o: o[0][:, :1],
    )

    @jax.jit
    def expand_fill(sc_mx, lo, occ, mpsx):
        cum2 = jnp.cumsum(occ, axis=1)
        adj = lo - cum2 + occ
        m_f = jnp.maximum(jax.lax.cummax(sc_mx, axis=1) - 1, 0)
        rows = jnp.arange(R, dtype=jnp.int32)[:, None]
        flat_idx = rows * M + m_f
        adj_f = _gather1(adj.reshape(-1), flat_idx)
        mps_f = _gather1(mpsx.reshape(-1), flat_idx)
        return adj_f, mps_f

    adj_f, mps_f = t(
        "expand fill+2 gathers", lambda: expand_fill(sc_m, lo_, occ_, mf_),
        lambda o: o[0][:, :1],
    )

    @jax.jit
    def posting_gather(adj_fx):
        slots = jnp.arange(A, dtype=jnp.int32)
        p_idx = jnp.clip(slots[None, :] + adj_fx, 0, gd.rps.shape[0] - 1)
        return _gather1(gd.rps, p_idx)

    t("posting gather [R,A]", lambda: posting_gather(adj_f), lambda o: o[:, :1])

    # ---- composed map_found: lax.map vs FLAT, and DP chunking ----
    def mfm(flatten, window=32, dpc=1):
        return map_found_many(
            found, mps, lengths_d, dual, selfr,
            gd.loocc[0] if gd.packed_dict_bits else gd.lo[0],
            gd.hi[0],
            gd.rps if gd.packed_rid_bits else gd.rid,
            gd.pos, gd.pos, gd.rank, jnp.float32(p.chn_pen_gap()),
            k=p.k, max_gap=p.max_gap, bw=p.bw, min_score=p.min_chain_score,
            num_anchors=A, window=window, no_dual=p.no_dual,
            no_diag=p.no_diag, max_chain_skip=p.max_chain_skip,
            packed_pos=True, use_pallas=False, pallas_block=8,
            pallas_interpret=False, want_pairs=False,
            packed_rid_bits=gd.packed_rid_bits,
            packed_dict_bits=gd.packed_dict_bits,
            flatten=flatten,
        )

    o_map = t("map_found lax.map", lambda: mfm(False), lambda o: o[0])
    o_flat = t("map_found FLAT", lambda: mfm(True), lambda o: o[0])
    c1 = np.asarray(o_map[0])
    c2 = np.asarray(o_flat[0])
    print(f"counts equal map vs flat: {np.array_equal(c1, c2)}", file=sys.stderr)

    # profile stages under FLAT
    def mfm_stage(stage):
        return map_found_many(
            found, mps, lengths_d, dual, selfr,
            gd.loocc[0] if gd.packed_dict_bits else gd.lo[0],
            gd.hi[0],
            gd.rps if gd.packed_rid_bits else gd.rid,
            gd.pos, gd.pos, gd.rank, jnp.float32(p.chn_pen_gap()),
            k=p.k, max_gap=p.max_gap, bw=p.bw, min_score=p.min_chain_score,
            num_anchors=A, window=32, no_dual=p.no_dual,
            no_diag=p.no_diag, max_chain_skip=p.max_chain_skip,
            packed_pos=True, use_pallas=False, pallas_block=8,
            pallas_interpret=False, want_pairs=False,
            packed_rid_bits=gd.packed_rid_bits,
            packed_dict_bits=gd.packed_dict_bits,
            flatten=True, profile_stage=stage,
        )

    t("FLAT ..expand", lambda: mfm_stage("expand"), lambda o: o[0])
    t("FLAT ..sort", lambda: mfm_stage("sort"), lambda o: o[0])
    t("FLAT ..dp", lambda: mfm_stage("dp"), lambda o: o[0])


if __name__ == "__main__":
    main()
