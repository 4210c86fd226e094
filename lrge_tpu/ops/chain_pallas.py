"""Pallas TPU kernel for the chaining DP (exact minimap2 semantics).

The chaining recurrence (``f[i] = max(span, max_j f[j] + sc(i,j))``
over a ``W``-wide predecessor window, with minimap2's ``max_chain_skip``
early break) is the serial core of the overlap engine — the role
`lchain.c` ``mm_chain_dp`` plays for the reference (SURVEY.md C15).

This kernel keeps the whole DP state — a newest-first predecessor ring
of six ``[BB, W]`` planes — in vector registers as ``fori_loop``
carries (zero HBM/VMEM traffic for the carry), computes the marked set
with bit-packed one-hot votes (``W/32`` uint32 planes, OR-reduced
across lanes), and loops only to the *actual* max anchor count of the
grid block instead of the padded capacity.

Semantics are identical to ``map_batch_core``'s DP stage (same f32 gap
penalty, same masks, same Lindley-recursion skip counter — see the
derivation in `ops/chain.py`); equality is pinned by
``tests/test_chain_pallas.py`` (interpreter mode vs the host oracle,
including skip-break corpora) and was verified bit-identical against
the XLA scan on a real v5e chip.

Status: **test/oracle only — not a production backend.**  Measured on
v5e (A=4096, W=64, B=128, 2026-08): the XLA scan's compiled loop runs
the DP in ~0.01s per 1024-query super-batch — XLA already keeps the
scan carry resident — while this kernel's chunk-rotate walk takes ~2s
(the per-anchor ``pltpu.roll`` chain serialises on the VPU).  Round 3
re-confirmed the decision: after the fused-gather fixes the scan's DP
is the only remaining serial cost and this formulation does not beat
it.  The kernel stays maintained solely as an independent
implementation that cross-checks the scan's semantics on hardware
(``LRGE_PALLAS=1``, ``tests/test_chain_pallas.py``); treat any
production routing to it as a bug.

Outputs per anchor slot: the chain score ``f`` and a ``broke`` flag
(the skip break fired inside the visible window), which the caller's
window-miss detector uses to decide per-row exactness.
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
    # Mosaic has no uint32->f32 convert; the exponent byte fits int32
    log2 = ((bits >> 23) & 255).astype(jnp.int32).astype(jnp.float32) - 128.0
    bits = (bits & jnp.uint32(~np.uint32(255 << 23))) + jnp.uint32(127 << 23)
    zf = jax.lax.bitcast_convert_type(bits, jnp.float32)
    return log2 + (jnp.float32(-0.34484843) * zf + jnp.float32(2.02466578)) * zf - jnp.float32(
        0.67487759
    )


def _roll1(x, s):
    """Circular right-shift by ``s`` along the lane (last) axis."""
    return pltpu.roll(x, s, 1)


def _prefix(x, op, ident, W, lane):
    """Inclusive prefix ``op`` along lanes (log-doubling with identity)."""
    s = 1
    while s < W:
        x = op(x, jnp.where(lane >= s, _roll1(x, s), ident))
        s *= 2
    return x


def _allreduce(x, op, W):
    """Full lane reduction; every lane ends up with the result."""
    s = 1
    while s < W:
        x = op(x, _roll1(x, s))
        s *= 2
    return x


def _chain_kernel(
    n_ref,  # [BB, 1] int32 in SMEM: valid-anchor count per row
    pen_ref,  # [1, 1] f32 in SMEM: chn_pen_gap
    key_ref,  # [BB, A] int32 (rid*2+strand, IMAX invalid)
    rpos_ref,  # [BB, A] int32
    qpos_ref,  # [BB, A] int32
    valid_ref,  # [BB, A] int32 (0/1)
    f_ref,  # [BB, A] int32 out: chain scores (NEG on invalid)
    broke_ref,  # [BB, A] int32 out: skip break fired for this anchor
    *,
    span: int,
    max_gap: int,
    bw: int,
    max_skip: int,
    window: int,
):
    BB, A = key_ref.shape
    W = window
    C = min(128, A)  # anchor chunk width (lane-tile aligned loads)
    pen_gap = pen_ref[0, 0]
    f_ref[...] = jnp.full((BB, A), NEG, jnp.int32)
    broke_ref[...] = jnp.zeros((BB, A), jnp.int32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (BB, W), 1)
    clane = jax.lax.broadcasted_iota(jnp.int32, (BB, C), 1)
    span32 = jnp.int32(span)

    # loop only to the block's real anchor count (valid slots are a
    # per-row prefix after the (rid,strand,rpos) sort); SMEM refs allow
    # scalar loads only, so reduce with an unrolled scalar max
    n_max = n_ref[0, 0]
    for r in range(1, BB):
        n_max = jnp.maximum(n_max, n_ref[r, 0])
    n_chunks = (jnp.minimum(n_max, A) + (C - 1)) // C

    # Mosaic only allows lane-dim dynamic slices at 128-lane granularity,
    # so anchors are walked chunkwise: the outer loop DMAs a [BB, C]
    # chunk of each input into registers, the inner loop peels one
    # anchor per step off the chunk's lane 0 (rolling left), and the
    # per-anchor outputs accumulate into register chunks written back
    # once per outer step.
    def step(args):
        i, cur, carry = args  # i: absolute anchor slot
        kc, rc, qc, vc, fc, bc = cur
        ring_key, ring_rpos, ring_qpos, ring_f, ring_ok, ring_p = carry
        ck = kc[:, :1]  # [BB, 1]
        cr = rc[:, :1]
        cq = qc[:, :1]
        cv = vc[:, :1] != 0

        # ---- candidate transition scores against the ring ----
        dq = cq - ring_qpos
        dr = cr - ring_rpos
        dd = jnp.abs(dr - dq)
        dg = jnp.minimum(dq, dr)
        sc = jnp.minimum(dg, span32)
        lin = pen_gap * dd.astype(jnp.float32)
        logp = jnp.where(dd >= 1, _mg_log2((dd + 1).astype(jnp.float32)), 0.0)
        pen = (lin + jnp.float32(0.5) * logp).astype(jnp.int32)
        sc = jnp.where((dd != 0) | (dg > span32), sc - pen, sc)
        ok = (
            (ring_ok != 0)
            & (ring_key == ck)
            & (dq > 0)
            & (dq <= max_gap)
            & (dr > 0)
            & (dr <= max_gap)
            & (dd <= bw)
        )
        cand = jnp.where(ok, sc + ring_f, NEG)

        # ---- marked[d]: ring slot d is the stored predecessor of an
        # examined ok anchor (bit-packed one-hot votes, OR over lanes)
        p_rel = (i - 1) - ring_p  # ring position each link points at
        marked = jnp.zeros((BB, W), dtype=bool)
        for b in range(0, W, 32):
            sh = p_rel - b
            inplane = ok & (sh >= 0) & (sh < 32)
            vote = jnp.where(
                inplane,
                jnp.left_shift(jnp.uint32(1), (sh & 31).astype(jnp.uint32)),
                jnp.uint32(0),
            )
            votes = _allreduce(vote, jnp.bitwise_or, W)
            bitidx = lane - b
            bit = (
                jnp.right_shift(votes, (bitidx & 31).astype(jnp.uint32))
                & jnp.uint32(1)
            ) != 0
            marked = marked | ((bitidx >= 0) & (bitidx < 32) & bit)

        # ---- skip counter (Lindley recursion, see ops/chain.py) ----
        cmax = _prefix(cand, jnp.maximum, NEG, W, lane)
        runmax_excl = jnp.maximum(
            jnp.where(lane >= 1, _roll1(cmax, 1), NEG), span32
        )
        improving = ok & (cand > runmax_excl)
        a_step = (ok & marked & ~improving).astype(jnp.int32) - improving.astype(
            jnp.int32
        )
        s_cum = _prefix(a_step, jnp.add, 0, W, lane)
        runmin = jnp.minimum(_prefix(s_cum, jnp.minimum, IMAX, W, lane), 0)
        n_skip = s_cum - runmin
        over = n_skip > max_skip
        cutpos = _allreduce(jnp.where(over, lane, W), jnp.minimum, W)
        cand = jnp.where(lane > cutpos, NEG, cand)

        # ---- best predecessor (ties keep the nearest = smallest d) ----
        best = _allreduce(cand, jnp.maximum, W)
        bestd = _allreduce(jnp.where(cand == best, lane, W), jnp.minimum, W)
        best0 = best[:, :1]
        bestd0 = bestd[:, :1]
        has_pred = best0 > span32
        f_t = jnp.where(cv, jnp.maximum(span32, best0), NEG)
        p_t = jnp.where(cv & has_pred, i - 1 - bestd0, -1)
        b_t = (cv & (cutpos[:, :1] < W)).astype(jnp.int32)

        # accumulate outputs into the chunk (j = lane within chunk)
        j = i % C
        fc = jnp.where(clane == j, f_t, fc)
        bc = jnp.where(clane == j, b_t, bc)

        # ---- push the current anchor onto the ring (newest first),
        # and rotate the next anchor into the chunks' lane 0
        new0 = lane == 0
        cur = (
            _roll1(kc, C - 1),
            _roll1(rc, C - 1),
            _roll1(qc, C - 1),
            _roll1(vc, C - 1),
            fc,
            bc,
        )
        carry = (
            jnp.where(new0, ck, _roll1(ring_key, 1)),
            jnp.where(new0, cr, _roll1(ring_rpos, 1)),
            jnp.where(new0, cq, _roll1(ring_qpos, 1)),
            jnp.where(new0, f_t, _roll1(ring_f, 1)),
            # int32 plane: Mosaic cannot rotate i1 vectors
            jnp.where(new0, cv.astype(jnp.int32), _roll1(ring_ok, 1)),
            jnp.where(new0, p_t, _roll1(ring_p, 1)),
        )
        return cur, carry

    def outer(c, carry):
        base = pl.multiple_of(c * C, C)
        kc = key_ref[:, pl.ds(base, C)]
        rc = rpos_ref[:, pl.ds(base, C)]
        qc = qpos_ref[:, pl.ds(base, C)]
        vc = valid_ref[:, pl.ds(base, C)]
        fc = jnp.full((BB, C), NEG, jnp.int32)
        bc = jnp.zeros((BB, C), jnp.int32)

        def inner(j, st):
            cur, carry = st
            return step((c * C + j, cur, carry))

        (_, _, _, _, fc, bc), carry = jax.lax.fori_loop(
            0, C, inner, ((kc, rc, qc, vc, fc, bc), carry)
        )
        f_ref[:, pl.ds(base, C)] = fc
        broke_ref[:, pl.ds(base, C)] = bc
        return carry

    init = (
        jnp.full((BB, W), IMAX, jnp.int32),
        jnp.zeros((BB, W), jnp.int32),
        jnp.zeros((BB, W), jnp.int32),
        jnp.full((BB, W), NEG, jnp.int32),
        jnp.zeros((BB, W), jnp.int32),
        jnp.full((BB, W), -1, jnp.int32),
    )
    jax.lax.fori_loop(0, n_chunks, outer, init)


@functools.partial(
    jax.jit,
    static_argnames=(
        "span",
        "max_gap",
        "bw",
        "max_skip",
        "window",
        "block",
        "interpret",
    ),
)
def chain_dp_skip(
    key2: jnp.ndarray,  # [B, A] int32 sorted (rid*2+strand; IMAX invalid)
    rpos: jnp.ndarray,  # [B, A] int32
    qpos: jnp.ndarray,  # [B, A] int32
    valid: jnp.ndarray,  # [B, A] bool
    nvalid: jnp.ndarray,  # [B] int32 valid-anchor count per row
    chn_pen_gap: jnp.ndarray,  # f32 scalar
    *,
    span: int,
    max_gap: int,
    bw: int,
    max_skip: int = 25,
    window: int = 64,
    block: int = 8,
    interpret: bool = False,
):
    """Chain scores ``f`` and ``broke`` flags, both ``[B, A]`` int32."""
    B, A = key2.shape
    assert B % block == 0, (B, block)
    assert window & (window - 1) == 0, "window must be a power of two"
    assert A <= 128 or A % 128 == 0, "anchor capacity must be lane-tile aligned"
    kern = functools.partial(
        _chain_kernel,
        span=span,
        max_gap=max_gap,
        bw=bw,
        max_skip=max_skip,
        window=window,
    )
    grid = (B // block,)
    row_spec = pl.BlockSpec((block, A), lambda i: (i, 0), memory_space=pltpu.VMEM)
    f, broke = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            row_spec,
            row_spec,
            row_spec,
            row_spec,
        ],
        out_specs=(row_spec, row_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B, A), jnp.int32),
            jax.ShapeDtypeStruct((B, A), jnp.int32),
        ),
        interpret=interpret,
    )(
        nvalid.astype(jnp.int32).reshape(B, 1),
        jnp.reshape(chn_pen_gap.astype(jnp.float32), (1, 1)),
        key2.astype(jnp.int32),
        rpos.astype(jnp.int32),
        qpos.astype(jnp.int32),
        valid.astype(jnp.int32),
    )
    return f, broke
