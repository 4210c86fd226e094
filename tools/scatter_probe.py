"""On-chip A/B of expansion-scatter lowerings.

The anchor expansion's two [R, M]-update scatters are now among the
largest device costs (~46 ms each per 4096-row group).  This probe
times lowering variants on production shapes: the current 2-D
``.at[rows, tgt].max``, a collision-free ``set`` with dead lanes
routed out-of-bounds (``mode=drop, unique_indices=True``), sorted-
indices hints, and a flattened 1-D sorted scatter.

Run from repo root: python tools/scatter_probe.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

R, M, A = 1024, 1664, 4096
rng = np.random.default_rng(0)
# realistic occupancy: ~45% of minimizer slots live, increasing prev_cum
occ = (rng.random((R, M)) < 0.45).astype(np.int32) * rng.integers(
    1, 5, size=(R, M), dtype=np.int32
)
cum = np.cumsum(occ, axis=1)
prev_cum = cum - occ
live_np = (occ > 0) & (prev_cum < A)
vals_np = rng.integers(1, 1 << 24, size=(R, M), dtype=np.int32)

live = jnp.asarray(live_np)
tgt_in = jnp.asarray(np.where(live_np, prev_cum, 0).astype(np.int32))
tgt_oob = jnp.asarray(np.where(live_np, prev_cum, A).astype(np.int32))
vals = jnp.asarray(vals_np)
rows = jnp.arange(R, dtype=jnp.int32)[:, None]

_bar = jax.lax.optimization_barrier


@jax.jit
def v_max(tgt, lv, v):
    return _bar(
        jnp.zeros((R, A), jnp.int32).at[rows, _bar(tgt)].max(
            _bar(jnp.where(lv, v, 0))
        )
    )


@jax.jit
def v_set_drop(tgt, lv, v):
    return _bar(
        jnp.zeros((R, A), jnp.int32)
        .at[rows, _bar(tgt)]
        .set(_bar(v), mode="drop", unique_indices=True)
    )


@jax.jit
def v_set_drop_sorted(tgt, lv, v):
    return _bar(
        jnp.zeros((R, A), jnp.int32)
        .at[rows, _bar(tgt)]
        .set(_bar(v), mode="drop", unique_indices=True, indices_are_sorted=True)
    )


@jax.jit
def v_flat_sorted(tgt, lv, v):
    fidx = (rows * A + tgt).reshape(-1)
    out = (
        jnp.zeros((R * A,), jnp.int32)
        .at[_bar(fidx)]
        .set(
            _bar(v.reshape(-1)),
            mode="drop",
            unique_indices=True,
            indices_are_sorted=True,
        )
    )
    return _bar(out).reshape(R, A)


def t(tag, fn, *args, reps=5):
    o = np.asarray(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{tag:<22} med {np.median(ts)*1000:7.1f} ms", file=sys.stderr, flush=True)
    return o


ref = t("2D max (current)", v_max, tgt_in, live, vals)
for tag, fn, tgt in (
    ("2D set drop uniq", v_set_drop, tgt_oob),
    ("2D set drop sorted", v_set_drop_sorted, tgt_oob),
    ("1D flat sorted", v_flat_sorted, tgt_oob),
):
    o = t(tag, fn, tgt, live, vals)
    # dead lanes: ref holds 0 there too (max over empty), variants drop
    ok = np.array_equal(np.asarray(ref), np.asarray(o))
    print(f"  matches current: {ok}", file=sys.stderr)
