"""Pallas TPU kernel for the chaining DP.

The chaining recurrence (``f[i] = max(span, max_j f[j] + sc(i,j))``
over a ``W``-wide predecessor window) is the serial core of the overlap
engine.  The XLA formulation (``ops/overlap_jax.py``) runs it as a
``lax.scan``; this kernel keeps the predecessor ring entirely in VMEM
and walks anchors in unrolled chunks, one grid step per batch block —
no per-step HBM traffic for the carry.

Semantics are identical to ``map_batch_core``'s DP stage (same f32 gap
penalty, same masks); ``tests/test_chain_pallas.py`` checks equality
against the XLA path in interpreter mode.  Enable on hardware with
``LRGE_PALLAS=1`` (DeviceOverlapEngine flag ``use_pallas``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = np.int32(np.iinfo(np.int32).min // 2)
IMAX = np.int32(np.iinfo(np.int32).max)


def _mg_log2(x):
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    log2 = ((bits >> 23) & 255).astype(jnp.float32) - 128.0
    bits = (bits & jnp.uint32(~np.uint32(255 << 23))) + jnp.uint32(127 << 23)
    zf = jax.lax.bitcast_convert_type(bits, jnp.float32)
    return log2 + (jnp.float32(-0.34484843) * zf + jnp.float32(2.02466578)) * zf - jnp.float32(
        0.67487759
    )


def _chain_kernel(
    key_ref,  # [BB, A] int32
    rpos_ref,
    qpos_ref,
    valid_ref,  # [BB, A] int32 (0/1)
    pen_ref,  # [1, 1] f32 in SMEM
    f_ref,  # [BB, A] int32 out
    ring_key,
    ring_rpos,
    ring_qpos,
    ring_f,
    ring_ok,  # scratch [BB, W]
    *,
    span: int,
    max_gap: int,
    bw: int,
    chunk: int,
    window: int,
):
    BB, A = key_ref.shape
    W = window
    C = chunk
    pen_gap = pen_ref[0, 0]

    ring_key[:] = jnp.full((BB, W), IMAX, dtype=jnp.int32)
    ring_rpos[:] = jnp.zeros((BB, W), dtype=jnp.int32)
    ring_qpos[:] = jnp.zeros((BB, W), dtype=jnp.int32)
    ring_f[:] = jnp.full((BB, W), NEG, dtype=jnp.int32)
    ring_ok[:] = jnp.zeros((BB, W), dtype=jnp.int32)

    def pair_sc(ck, cr, cq, pk, pr, pq, pf, pok):
        dq = cq - pq
        dr = cr - pr
        dd = jnp.abs(dr - dq)
        dg = jnp.minimum(dq, dr)
        sc = jnp.minimum(dg, span)
        lin = pen_gap * dd.astype(jnp.float32)
        logp = jnp.where(dd >= 1, _mg_log2((dd + 1).astype(jnp.float32)), 0.0)
        pen = (lin + jnp.float32(0.5) * logp).astype(jnp.int32)
        sc = jnp.where((dd != 0) | (dg > span), sc - pen, sc)
        ok = (
            (pok != 0)
            & (pk == ck)
            & (dq > 0)
            & (dq <= max_gap)
            & (dr > 0)
            & (dr <= max_gap)
            & (dd <= bw)
        )
        return jnp.where(ok, sc + pf, NEG)

    def chunk_body(c_idx, _):
        base = c_idx * C
        ck = key_ref[:, pl.ds(base, C)]  # [BB, C]
        cr = rpos_ref[:, pl.ds(base, C)]
        cq = qpos_ref[:, pl.ds(base, C)]
        cv = valid_ref[:, pl.ds(base, C)]
        rk = ring_key[:]
        rr = ring_rpos[:]
        rq = ring_qpos[:]
        rf = ring_f[:]
        ro = ring_ok[:]
        fs = []
        for t in range(C):
            cand = pair_sc(
                ck[:, t : t + 1], cr[:, t : t + 1], cq[:, t : t + 1], rk, rr, rq, rf, ro
            )
            best = jnp.max(cand, axis=1)
            for u in range(t):
                cu = pair_sc(
                    ck[:, t], cr[:, t], cq[:, t],
                    ck[:, u], cr[:, u], cq[:, u], fs[u], cv[:, u],
                )
                best = jnp.maximum(best, cu)
            fs.append(jnp.where(cv[:, t] != 0, jnp.maximum(span, best), NEG))
        f_chunk = jnp.stack(fs, axis=1)  # [BB, C]
        f_ref[:, pl.ds(base, C)] = f_chunk
        # shift ring: newest C entries first
        ring_key[:] = jnp.concatenate([ck[:, ::-1], rk[:, : W - C]], axis=1)
        ring_rpos[:] = jnp.concatenate([cr[:, ::-1], rr[:, : W - C]], axis=1)
        ring_qpos[:] = jnp.concatenate([cq[:, ::-1], rq[:, : W - C]], axis=1)
        ring_f[:] = jnp.concatenate([f_chunk[:, ::-1], rf[:, : W - C]], axis=1)
        ring_ok[:] = jnp.concatenate([cv[:, ::-1], ro[:, : W - C]], axis=1)
        return 0

    jax.lax.fori_loop(0, A // C, chunk_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("span", "max_gap", "bw", "window", "chunk", "block", "interpret"),
)
def chain_dp_pallas(
    key2: jnp.ndarray,  # [B, A] int32 sorted (rid*2+strand; IMAX invalid)
    rpos: jnp.ndarray,
    qpos: jnp.ndarray,
    valid: jnp.ndarray,  # [B, A] bool
    chn_pen_gap: jnp.ndarray,  # f32 scalar
    *,
    span: int,
    max_gap: int,
    bw: int,
    window: int = 512,
    chunk: int = 8,
    block: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Chain scores f [B, A] via the VMEM-resident Pallas kernel."""
    B, A = key2.shape
    assert B % block == 0 and A % chunk == 0
    kern = functools.partial(
        _chain_kernel,
        span=span,
        max_gap=max_gap,
        bw=bw,
        chunk=chunk,
        window=window,
    )
    return pl.pallas_call(
        kern,
        grid=(B // block,),
        in_specs=[
            pl.BlockSpec((block, A), lambda i: (i, 0)),
            pl.BlockSpec((block, A), lambda i: (i, 0)),
            pl.BlockSpec((block, A), lambda i: (i, 0)),
            pl.BlockSpec((block, A), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((block, A), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, A), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((block, window), jnp.int32),
            pltpu.VMEM((block, window), jnp.int32),
            pltpu.VMEM((block, window), jnp.int32),
            pltpu.VMEM((block, window), jnp.int32),
            pltpu.VMEM((block, window), jnp.int32),
        ],
        interpret=interpret,
    )(
        key2.astype(jnp.int32),
        rpos.astype(jnp.int32),
        qpos.astype(jnp.int32),
        valid.astype(jnp.int32),
        jnp.reshape(chn_pen_gap.astype(jnp.float32), (1, 1)),
    )
