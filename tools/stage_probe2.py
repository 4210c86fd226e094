"""Deeper on-chip stage split: lookup internals, DP vs sort vs expand.

Uses the ``profile_stage`` truncation knob in ``_expand_sort_chain``
plus standalone jits of the lookup's two sub-stages and a sort-packing
A/B, all on production shapes (SUP=8, B=128, bucket 4096).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/stage_probe2.py
"""
import sys
import time

import numpy as np

sys.argv = ["bench"]
import jax
import jax.numpy as jnp

import bench as BN
from lrge_tpu.device_engine import DeviceOverlapEngine
from lrge_tpu.ops.encode import encode_seq
from lrge_tpu.ops.index import build_index
from lrge_tpu.ops.overlap_jax import (
    _dict_lookup,
    _q_occ_drop_narrow,
    map_found_many,
    minimizer_cap,
    sketch_lookup_many,
)
from lrge_tpu.platform import Platform, preset_for


def _sync(o, pick):
    np.asarray(pick(o))


def t(tag, fn, pick, reps=3):
    o = fn()
    _sync(o, pick)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        o = fn()
        _sync(o, pick)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{tag:<28} {best*1000:8.1f} ms", file=sys.stderr, flush=True)
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

    queries = [q for q in BN.make_reads(rng, genome, 1400, 2500, 0.05) if len(q) <= 4096][:1024]
    SUP, B, L = 8, 128, 4096
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
    dual = jnp.zeros((SUP, B), jnp.int32)
    selfr = jnp.full((SUP, B), -1, jnp.int32)
    M = minimizer_cap(L)

    # ---- real found/mps planes (input to map timings) ----
    found, mps, mc = sketch_lookup_many(
        codes_d, lengths_d, gd.uhash, gd.uoff, gd.boff, jnp.int32(gd.mid_occ),
        k=p.k, w=p.w, bucket_bits=gd.bucket_bits, bucket_kmax=gd.bucket_kmax,
        q_occ_frac=p.q_occ_frac, cuckoo_bits=gd.cuckoo_bits,
        dict_occ_bits=gd.packed_dict_bits,
    )
    np.asarray(mc)

    def sl_many():
        return sketch_lookup_many(
            codes_d, lengths_d, gd.uhash, gd.uoff, gd.boff,
            jnp.int32(gd.mid_occ), k=p.k, w=p.w,
            bucket_bits=gd.bucket_bits, bucket_kmax=gd.bucket_kmax,
            q_occ_frac=p.q_occ_frac, cuckoo_bits=gd.cuckoo_bits,
            dict_occ_bits=gd.packed_dict_bits,
        )

    t("sketch+lookup full", lambda: sl_many(), lambda o: o[2])

    # ---- lookup internals on real hash planes ----
    from lrge_tpu.ops.sketch_jax import sketch_core

    @jax.jit
    def sketch_hashes(c, ln):
        return jax.lax.map(
            lambda a: sketch_core(a[0], a[1], k=p.k, w=p.w, max_minimizers=M),
            (c, ln),
        )

    mh, mp_, ms_, _mc = sketch_hashes(codes_d, lengths_d)
    np.asarray(_mc)

    if gd.cuckoo_bits:
        from lrge_tpu.ops.overlap_jax import _cuckoo_lookup

        @jax.jit
        def probes_only(mh_):
            return jax.lax.map(
                lambda h: _cuckoo_lookup(h, gd.uhash, cuckoo_bits=gd.cuckoo_bits),
                mh_,
            )
    else:

        @jax.jit
        def probes_only(mh_):
            return jax.lax.map(
                lambda h: _dict_lookup(
                    h, gd.uhash, gd.boff, k=p.k,
                    bucket_bits=gd.bucket_bits, bucket_kmax=gd.bucket_kmax,
                ),
                mh_,
            )

    t("dict probes only", lambda: probes_only(mh), lambda o: o[:, :, :1])

    @jax.jit
    def qocc_only(mh_):
        return jax.lax.map(
            lambda h: _q_occ_drop_narrow(h, jnp.int32(gd.mid_occ), p.q_occ_frac),
            mh_,
        )

    t("q_occ drop only", lambda: qocc_only(mh), lambda o: o[:, :, :1])

    # ---- map truncations: expand / sort / dp / full ----
    def mf(profile_stage="", num_anchors=4096):
        return map_found_many(
            found, mps, lengths_d, dual, selfr,
            gd.loocc[0] if gd.packed_dict_bits else gd.lo[0],
            gd.hi[0],
            gd.rps if gd.packed_rid_bits else gd.rid,
            gd.pos, gd.pos, gd.rank, jnp.float32(p.chn_pen_gap()),
            k=p.k, max_gap=p.max_gap, bw=p.bw, min_score=p.min_chain_score,
            num_anchors=num_anchors, window=32, no_dual=p.no_dual,
            no_diag=p.no_diag, max_chain_skip=p.max_chain_skip,
            packed_pos=True, use_pallas=False, pallas_block=8,
            pallas_interpret=False, want_pairs=False,
            packed_rid_bits=gd.packed_rid_bits,
            packed_dict_bits=gd.packed_dict_bits,
            profile_stage=profile_stage,
        )

    t("map ..expand", lambda: mf("expand"), lambda o: o[0])
    t("map ..sort", lambda: mf("sort"), lambda o: o[0])
    t("map ..dp", lambda: mf("dp"), lambda o: o[0])
    t("map full", lambda: mf(""), lambda o: o[0])

    # ---- sort packing A/B on synthetic anchor planes ----
    A = 4096
    rkey = np.random.default_rng(0).integers(0, 20000, size=(SUP, B, A)).astype(np.int32)
    rrpos = np.random.default_rng(1).integers(0, 1 << 14, size=(SUP, B, A)).astype(np.int32)
    rqpos = np.random.default_rng(2).integers(0, 4096, size=(SUP, B, A)).astype(np.int32)
    dk, dr, dq = jnp.asarray(rkey), jnp.asarray(rrpos), jnp.asarray(rqpos)

    @jax.jit
    def sort3(a, b, c):
        def body(args):
            x, y, z = args
            xs, ys, zs = jax.lax.sort((x, y, z), dimension=1, num_keys=2, is_stable=True)
            return xs + ys + zs
        return jax.lax.map(body, (a, b, c))

    @jax.jit
    def sort_packed(a, b, c):
        def body(args):
            x, y, z = args
            pk = (x << 14) | y
            pks, zs = jax.lax.sort((pk, z), dimension=1, num_keys=1, is_stable=True)
            return (pks >> 14) + (pks & ((1 << 14) - 1)) + zs
        return jax.lax.map(body, (a, b, c))

    t("sort 2key+payload", lambda: sort3(dk, dr, dq), lambda o: o[:, :, :1])
    t("sort packed 1key", lambda: sort_packed(dk, dr, dq), lambda o: o[:, :, :1])


if __name__ == "__main__":
    main()
