"""Isolate lax.map per-iteration overhead vs vmap vs flat on the occ stage."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

U = 6_000_000
SUP, B, M = 8, 128, 1664
rng = np.random.default_rng(0)
table = jnp.asarray(rng.integers(0, 2**31, size=U, dtype=np.int32))
found = jnp.asarray(rng.integers(-1, U - 1, size=(SUP, B, M), dtype=np.int32))

def occ_body(fo):
    fc = jnp.maximum(fo, 0)
    lc = table[fc]
    occ = jnp.where(fo >= 0, lc & 15, 0)
    return occ.sum(axis=1)

@jax.jit
def via_map(found):
    return jax.lax.map(occ_body, found)

@jax.jit
def via_vmap(found):
    return jax.vmap(occ_body)(found)

@jax.jit
def via_flat(found):
    return occ_body(found.reshape(SUP * B, M)).reshape(SUP, B)

@jax.jit
def via_unrolled(found):
    return jnp.stack([occ_body(found[g]) for g in range(SUP)])

for name, f in [("lax.map", via_map), ("vmap", via_vmap), ("flat", via_flat), ("unrolled", via_unrolled)]:
    o = f(found); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(5):
        o = f(found)
    jax.block_until_ready(o)
    print(f"{name}: {(time.perf_counter()-t0)/5*1000:.2f} ms", file=sys.stderr)
