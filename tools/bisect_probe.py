import time, sys, functools, os
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.argv = ["bench"]
import bench as B
from lrge_tpu.device_engine import DeviceOverlapEngine
from lrge_tpu.ops.index import build_index
from lrge_tpu.ops.overlap_jax import sketch_lookup_many, _gather1, IMAX as _IMAX
from lrge_tpu.platform import Platform, preset_for
from lrge_tpu.ops.encode import encode_seq

rng = np.random.default_rng(6)
genome = np.frombuffer(rng.integers(0,4,size=4_400_000,dtype=np.uint8), dtype=np.uint8)
genome = bytes(np.frombuffer(b"ACGT",dtype=np.uint8)[genome].tobytes())
targets = B.make_reads(rng, genome, 10_000, 2500, 0.05)
tnames = [b"t%d"%i for i in range(10_000)]
params = preset_for(Platform.NANOPORE, dual=True)
index = build_index(targets, tnames, params)
eng = DeviceOverlapEngine(index, batch_size=128, num_anchors=4096, window=64)
gd = eng.gdev
queries = B.make_reads(rng, genome, 1024, 2500, 0.05)
queries.sort(key=len)  # mimic make_batches' length-sorted batching
SUP, Bb, L, A, W = 8, 128, 4096, 4096, 64
codes = np.full((SUP,Bb,L), 4, np.uint8); lengths = np.zeros((SUP,Bb), np.int32)
for i,q in enumerate(queries):
    q=q[:L]; g,b=divmod(i,Bb); codes[g,b,:len(q)]=encode_seq(q); lengths[g,b]=len(q)
p = params
found, mps, mc = sketch_lookup_many(jnp.asarray(codes), jnp.asarray(lengths),
    gd.uhash, gd.uoff, gd.boff, jnp.int32(gd.mid_occ),
    k=p.k, w=p.w, bucket_bits=gd.bucket_bits, bucket_kmax=gd.bucket_kmax, q_occ_frac=p.q_occ_frac)
jax.block_until_ready(found)
qlen = jnp.asarray(lengths)
lo, hi, rid_t, pos_t = gd.lo[0], gd.hi[0], gd.rid, gd.pos
loocc, rps = (gd.loocc[0] if gd.packed_dict_bits else None), gd.rps
DICT_BITS, RID_BITS = gd.packed_dict_bits, gd.packed_rid_bits
print(f"packed_dict_bits={DICT_BITS} packed_rid_bits={RID_BITS}", file=sys.stderr)
IMAX = jnp.int32(np.iinfo(np.int32).max)

def stagefn(stage):
    @jax.jit
    def run(found, mps, qlen):
        def body(args):
            fo, mp, ql = args
            Bq, M = fo.shape
            fc = jnp.maximum(fo, 0)
            if DICT_BITS:
                lc = _gather1(loocc, fc)
                l = lc >> DICT_BITS
                occ = jnp.where(fo >= 0, lc & ((1 << DICT_BITS) - 1), 0).astype(jnp.int32)
            else:
                l = _gather1(lo, fc); h = _gather1(hi, fc)
                occ = jnp.where(fo >= 0, h - l, 0).astype(jnp.int32)
            if stage == "occ": return occ.sum(axis=1)
            cum = jnp.cumsum(occ, axis=1); total = cum[:, -1]
            slots = jnp.arange(A, dtype=jnp.int32)
            prev_cum = cum - occ
            live = (occ > 0) & (prev_cum < A)
            tgt = jnp.where(live, prev_cum, 0)
            rows = jnp.arange(Bq, dtype=jnp.int32)[:, None]
            adj = l - cum + occ
            MIN32 = np.iinfo(np.int32).min
            sc_set = jnp.zeros((Bq, A), dtype=bool).at[rows, tgt].max(live)
            sc_adj = jnp.full((Bq, A), MIN32, jnp.int32).at[rows, tgt].max(jnp.where(live, adj, MIN32))
            sc_mps = jnp.full((Bq, A), MIN32, jnp.int32).at[rows, tgt].max(jnp.where(live, mp, MIN32))
            def ffill(a, b):
                (av, am), (bv, bm) = a, b
                return (jnp.where(bm, bv, av), am | bm)
            (adj_f, _), (mps_f, _) = jax.lax.associative_scan(
                lambda x, y: (ffill(x[0], y[0]), ffill(x[1], y[1])),
                ((sc_adj, sc_set), (sc_mps, sc_set)), axis=1)
            valid = slots[None,:] < jnp.minimum(total, A)[:, None]
            p_idx = jnp.clip(slots[None,:] + adj_f, 0, rid_t.shape[0]-1)
            if stage == "expand": return p_idx.sum(axis=1)
            if RID_BITS:
                pr = _gather1(rps, p_idx)
                rid = jnp.where(valid, pr >> (1 + RID_BITS), IMAX)
                rpos = jnp.where(valid, (pr >> 1) & ((1 << RID_BITS) - 1), 0)
                tstrand = pr & 1
            else:
                rid = jnp.where(valid, _gather1(rid_t, p_idx), IMAX)
                pp = _gather1(pos_t, p_idx)
                rpos = jnp.where(valid, pp >> 1, 0)
                tstrand = pp & 1
            qstr = mps_f & 1
            strand = jnp.where(valid, tstrand ^ qstr, 0)
            mq = mps_f >> 1
            qpos = jnp.where(strand == 0, mq, ql[:, None] - mq + (p.k - 2))
            if stage == "gather": return (rid.sum(axis=1) + rpos.sum(axis=1) + qpos.sum(axis=1))
            key2 = jnp.where(valid, rid*2+strand, IMAX)
            key2_s, rpos_s, qpos_s, rid_s = jax.lax.sort((key2, rpos, qpos, rid), dimension=1, num_keys=2, is_stable=True)
            if stage == "sort": return key2_s.sum(axis=1) + rpos_s.sum(axis=1)
            return key2_s.sum(axis=1)
        return jax.lax.map(body, (found, mps, qlen))
    return run

REPS = 5
for stage in ["occ", "expand", "gather", "sort"]:
    f = stagefn(stage)
    o = f(found, mps, qlen); jax.block_until_ready(o); t0=time.time()
    for _ in range(REPS):
        o = f(found, mps, qlen)
    jax.block_until_ready(o); t1=time.time()
    print(f"{stage}: {(t1-t0)/REPS:.3f}s", file=sys.stderr)

# full map program (adds the chain DP scan + reduce on top of "sort")
from lrge_tpu.ops.overlap_jax import map_found_many
qdual = jnp.zeros((SUP, Bb), jnp.int32)
qself = jnp.full((SUP, Bb), -1, jnp.int32)
kw = dict(k=p.k, max_gap=p.max_gap, bw=p.bw, min_score=p.min_chain_score,
          num_anchors=A, window=W, no_dual=p.no_dual, no_diag=p.no_diag,
          max_chain_skip=p.max_chain_skip, packed_pos=True, use_pallas=False,
          pallas_block=8, pallas_interpret=False,
          packed_rid_bits=gd.packed_rid_bits, packed_dict_bits=gd.packed_dict_bits)
for wp in (False, True):
    args = (found, mps, qlen, qdual, qself,
            gd.loocc[0] if gd.packed_dict_bits else gd.lo[0], gd.hi[0],
            gd.rps if gd.packed_rid_bits else gd.rid, gd.pos, gd.pos, gd.rank,
            jnp.float32(p.chn_pen_gap()))
    o = map_found_many(*args, want_pairs=wp, **kw)
    jax.block_until_ready(o); t0=time.time()
    for _ in range(REPS):
        o = map_found_many(*args, want_pairs=wp, **kw)
    jax.block_until_ready(o); t1=time.time()
    print(f"full(want_pairs={wp}): {(t1-t0)/REPS:.3f}s", file=sys.stderr)

# fused sketch+lookup program
o = sketch_lookup_many(jnp.asarray(codes), jnp.asarray(lengths),
    gd.uhash, gd.uoff, gd.boff, jnp.int32(gd.mid_occ),
    k=p.k, w=p.w, bucket_bits=gd.bucket_bits, bucket_kmax=gd.bucket_kmax,
    q_occ_frac=p.q_occ_frac)
jax.block_until_ready(o); t0=time.time()
o = sketch_lookup_many(jnp.asarray(codes), jnp.asarray(lengths),
    gd.uhash, gd.uoff, gd.boff, jnp.int32(gd.mid_occ),
    k=p.k, w=p.w, bucket_bits=gd.bucket_bits, bucket_kmax=gd.bucket_kmax,
    q_occ_frac=p.q_occ_frac)
jax.block_until_ready(o); t1=time.time()
print(f"sketch_lookup: {t1-t0:.3f}s", file=sys.stderr)

# sketch-only program at the same shapes
from lrge_tpu.ops.overlap_jax import sketch_many
o = sketch_many(jnp.asarray(codes), jnp.asarray(lengths), k=p.k, w=p.w)
jax.block_until_ready(o); t0=time.time()
for _ in range(REPS):
    o = sketch_many(jnp.asarray(codes), jnp.asarray(lengths), k=p.k, w=p.w)
jax.block_until_ready(o); t1=time.time()
print(f"sketch_only: {(t1-t0)/REPS:.3f}s", file=sys.stderr)
