"""On-chip stage timing for the fused ONT pipeline (bucket 4096).

Times each separable stage of one SUP=8 x B=128 super-batch on the
real chip, so optimization effort lands where the time is:

  sketch            lax.map(sketch_core)                 [B,L] shifts + compaction sort
  sketch+lookup     sketch_lookup_many                   + bucketed dictionary probes
  map               map_found_many                       expand + anchor sort + DP + reduce
  fused             sketch_map_many                      whole pipeline + row sort
  map variants      dp_chunk / window / num_anchors      isolate DP vs expand/sort shares

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/stage_probe.py
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
    map_found_many,
    minimizer_cap,
    sketch_lookup_many,
    sketch_map_many,
)
from lrge_tpu.platform import Platform, preset_for


def _sync(o, pick):
    # the relay's block_until_ready returns at enqueue; a (tiny) fetch
    # is the only true synchronisation point
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
    print(
        f"n_sub={gd.n_sub} U={gd.uhash.shape[0]} kmax={gd.bucket_kmax} "
        f"bits={gd.bucket_bits} prid={gd.packed_rid_bits} pdict={gd.packed_dict_bits}",
        file=sys.stderr,
    )

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

    from lrge_tpu.ops.sketch_jax import sketch_core

    M = minimizer_cap(L)

    @jax.jit
    def sketch_only(c, ln):
        return jax.lax.map(
            lambda a: sketch_core(a[0], a[1], k=p.k, w=p.w, max_minimizers=M),
            (c, ln),
        )

    t("sketch only", lambda: sketch_only(codes_d, lengths_d), lambda o: o[3])

    sl = lambda: sketch_lookup_many(
        codes_d, lengths_d, gd.uhash, gd.uoff, gd.boff, jnp.int32(gd.mid_occ),
        k=p.k, w=p.w, bucket_bits=gd.bucket_bits, bucket_kmax=gd.bucket_kmax,
        q_occ_frac=p.q_occ_frac,
    )
    found, mps, mc = t("sketch+lookup", sl, lambda o: o[2])

    def mf(num_anchors=4096, window=32, dp_chunk=1, want_pairs=False):
        return map_found_many(
            found, mps, lengths_d, dual, selfr,
            gd.loocc[0] if gd.packed_dict_bits else gd.lo[0],
            gd.hi[0],
            gd.rps if gd.packed_rid_bits else gd.rid,
            gd.pos, gd.pos, gd.rank, jnp.float32(p.chn_pen_gap()),
            k=p.k, max_gap=p.max_gap, bw=p.bw, min_score=p.min_chain_score,
            num_anchors=num_anchors, window=window, no_dual=p.no_dual,
            no_diag=p.no_diag, max_chain_skip=p.max_chain_skip,
            packed_pos=True, use_pallas=False, pallas_block=8,
            pallas_interpret=False, want_pairs=want_pairs,
            packed_rid_bits=gd.packed_rid_bits,
            packed_dict_bits=gd.packed_dict_bits,
        )

    t("map A=4096 W=32", lambda: mf(), lambda o: o[0])
    t("map A=4096 W=32 chunk4", lambda: mf(dp_chunk=4), lambda o: o[0])
    t("map A=4096 W=8", lambda: mf(window=8), lambda o: o[0])
    t("map A=2048 W=32", lambda: mf(num_anchors=2048), lambda o: o[0])
    t("map A=1024 W=32", lambda: mf(num_anchors=1024), lambda o: o[0])

    def fused(sort_rows=True, dp_chunk=1):
        return sketch_map_many(
            codes_d, lengths_d, dual, selfr,
            gd.uhash, gd.uoff, gd.boff,
            gd.loocc[0] if gd.packed_dict_bits else gd.lo[0],
            gd.hi[0],
            gd.rps if gd.packed_rid_bits else gd.rid,
            gd.pos, gd.rank, jnp.int32(gd.mid_occ),
            jnp.float32(p.chn_pen_gap()),
            k=p.k, w=p.w, bucket_bits=gd.bucket_bits,
            bucket_kmax=gd.bucket_kmax, q_occ_frac=p.q_occ_frac,
            max_gap=p.max_gap, bw=p.bw, min_score=p.min_chain_score,
            num_anchors=4096, window=32, no_dual=p.no_dual, no_diag=p.no_diag,
            max_chain_skip=p.max_chain_skip, packed_pos=True,
            min_cnt=p.min_cnt, want_pairs=False,
            packed_rid_bits=gd.packed_rid_bits,
            packed_dict_bits=gd.packed_dict_bits,
            sort_rows=sort_rows, idx_tlen=gd.tlen, dp_chunk=dp_chunk,
        )

    pk = t("fused sort_rows=1", lambda: fused(), lambda o: o[0])
    t("fused sort_rows=0", lambda: fused(sort_rows=False), lambda o: o[0])
    arr = np.asarray(pk[0])
    na = arr[..., 1].ravel()
    print(
        f"anchors mean={na.mean():.0f} p50={np.percentile(na,50):.0f} "
        f"p95={np.percentile(na,95):.0f} max={na.max()}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
