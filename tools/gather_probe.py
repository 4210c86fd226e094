"""Microbenchmark: TPU gather strategies for the dictionary probe.

Compares, at dictionary-lookup shapes ([B, M] indices into a U-entry
table): (a) kmax separate 1-element gathers (current probe loop),
(b) ONE lax.gather with slice_sizes=(kmax,) pulling contiguous runs,
(c) a 2x2 cuckoo-style pair of gathers, (d) one baseline gather.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

B, M, U, KMAX = 1024, 1664, 6_000_000, 8
rng = np.random.default_rng(0)
table = jnp.asarray(rng.integers(0, 2**31, size=U, dtype=np.int32))
idx = jnp.asarray(rng.integers(0, U - KMAX, size=(B, M), dtype=np.int32))
qk = jnp.asarray(rng.integers(0, 2**31, size=(B, M), dtype=np.int32))

def time_fn(name, f, *args):
    o = f(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(5):
        o = f(*args)
    jax.block_until_ready(o)
    print(f"{name}: {(time.perf_counter()-t0)/5*1000:.2f} ms", file=sys.stderr)

@jax.jit
def probe_loop(table, idx, qk):
    found = jnp.full(idx.shape, -1, jnp.int32)
    for j in range(KMAX):
        val = table[jnp.minimum(idx + j, U - 1)]
        found = jnp.where(val == qk, idx + j, found)
    return found

@jax.jit
def probe_sliced(table, idx, qk):
    g = jax.lax.gather(
        table,
        idx.reshape(-1, 1),
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,)
        ),
        slice_sizes=(KMAX,),
        mode=jax.lax.GatherScatterMode.CLIP,
    ).reshape(*idx.shape, KMAX)
    hit = g == qk[..., None]
    j = jnp.argmax(hit, axis=-1).astype(jnp.int32)
    return jnp.where(hit.any(axis=-1), idx + j, -1)

@jax.jit
def probe_cuckoo(table, idx, qk):
    h1 = idx
    h2 = (idx * 0x9E3779B1) % (U - 1)
    v1 = table[h1]
    v2 = table[h2]
    return jnp.where(v1 == qk, h1, jnp.where(v2 == qk, h2, -1))

@jax.jit
def one_gather(table, idx):
    return table[idx]

time_fn("one_gather [B,M]", one_gather, table, idx)
time_fn(f"probe_loop x{KMAX}", probe_loop, table, idx, qk)
time_fn(f"probe_sliced (slice={KMAX})", probe_sliced, table, idx, qk)
time_fn("probe_cuckoo (2 gathers)", probe_cuckoo, table, idx, qk)
