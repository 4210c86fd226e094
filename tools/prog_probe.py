import time, sys
import numpy as np, jax, jax.numpy as jnp
sys.argv = ["bench"]
import bench as B
from lrge_tpu.device_engine import DeviceOverlapEngine
from lrge_tpu.ops.index import build_index
from lrge_tpu.ops.overlap_jax import sketch_lookup_many, map_found_many
from lrge_tpu.platform import Platform, preset_for
from lrge_tpu.ops.encode import encode_seq

rng = np.random.default_rng(6)
genome_size = 4_400_000
genome = np.frombuffer(rng.integers(0,4,size=genome_size,dtype=np.uint8), dtype=np.uint8)
genome = bytes(np.frombuffer(b"ACGT",dtype=np.uint8)[genome].tobytes())
targets = B.make_reads(rng, genome, 10_000, 2500, 0.05)
tnames = [b"t%d"%i for i in range(10_000)]
params = preset_for(Platform.NANOPORE, dual=True)
index = build_index(targets, tnames, params)
eng = DeviceOverlapEngine(index, batch_size=128, num_anchors=4096, window=64)
gd = eng.gdev
print(f"n_sub={gd.n_sub} U={gd.uhash.shape[0]} N={gd.rid.shape[0]} kmax={gd.bucket_kmax}", file=sys.stderr)

queries = B.make_reads(rng, genome, 1024, 2500, 0.05)
SUP, Bb, L = 8, 128, 4096
codes = np.full((SUP,Bb,L), 4, np.uint8); lengths = np.zeros((SUP,Bb), np.int32)
for i,q in enumerate(queries):
    q = q[:L]
    g,b = divmod(i,Bb); codes[g,b,:len(q)] = encode_seq(q); lengths[g,b]=len(q)
p = params
codes_d = jnp.asarray(codes); lengths_d = jnp.asarray(lengths)

def t(tag, fn):
    o = fn(); jax.block_until_ready(o); t0=time.time()
    o = fn(); jax.block_until_ready(o); t1=time.time()
    print(f"{tag}: {t1-t0:.3f}s", file=sys.stderr)
    return o

found, mps, mc = t("sketch_lookup_many", lambda: sketch_lookup_many(
    codes_d, lengths_d, gd.uhash, gd.uoff, gd.boff, jnp.int32(gd.mid_occ),
    k=p.k, w=p.w, bucket_bits=gd.bucket_bits, bucket_kmax=gd.bucket_kmax, q_occ_frac=p.q_occ_frac))

dual = jnp.zeros((SUP,Bb), jnp.int32); selfr = jnp.full((SUP,Bb), -1, jnp.int32)
def mf(s):
    return map_found_many(found, mps, lengths_d, dual, selfr, gd.lo[s], gd.hi[s],
        gd.rid, gd.pos, gd.pos, gd.rank, jnp.float32(p.chn_pen_gap()),
        k=p.k, max_gap=p.max_gap, bw=p.bw, min_score=p.min_chain_score,
        num_anchors=4096, window=64, no_dual=p.no_dual, no_diag=p.no_diag,
        max_chain_skip=p.max_chain_skip, packed_pos=True,
        use_pallas=False, pallas_block=8, pallas_interpret=False)
t("map_found_many sub0", lambda: mf(0))
out = t("map_found all subs", lambda: [mf(s) for s in range(gd.n_sub)])
na = np.asarray(out[0][1])
print(f"anchors/query mean={na.mean():.0f} p95={np.percentile(na,95):.0f} max={na.max()}", file=sys.stderr)
