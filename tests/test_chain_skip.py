"""max_chain_skip and q_occ_frac semantics (minimap2 lchain.c / seed.c).

The scalar oracle below is a direct sequential port of mm_chain_dp's
inner loop including the t-mark array and the floored skip counter; the
production implementations (vectorised numpy fallback and the native
C++ kernel) must match it anchor-for-anchor, including on plateau-heavy
anchor sets where the early break fires.
"""

import dataclasses

import numpy as np
import pytest

from lrge_tpu.ops import chain as C
from lrge_tpu.platform import AVA_ONT, OverlapParams


def scalar_chain_dp(key2, rpos, qpos, span, params):
    """Sequential port of mm_chain_dp incl. max_chain_skip."""
    n = len(key2)
    f = np.zeros(n, np.int64)
    p = np.full(n, -1, np.int64)
    t = np.full(n, -1, np.int64)
    pen_gap = np.float32(params.chn_pen_gap())
    pen_skip = np.float32(params.chn_pen_skip())
    st = 0
    for i in range(n):
        while st < i and (key2[st] != key2[i] or rpos[i] > rpos[st] + params.max_gap):
            st += 1
        lo = max(st, i - params.max_chain_iter)
        best = span[i]
        bestj = -1
        n_skip = 0
        for j in range(i - 1, lo - 1, -1):
            dq = qpos[i] - qpos[j]
            if dq <= 0 or dq > params.max_gap:
                continue
            dr = rpos[i] - rpos[j]
            if dr == 0:
                continue
            dd = abs(dr - dq)
            if dd > params.bw:
                continue
            dg = min(dq, dr)
            sc = min(dg, span[j])
            if dd != 0 or dg > span[j]:
                lin = pen_gap * np.float32(dd) + pen_skip * np.float32(dg)
                logp = C.mg_log2(np.float32(dd + 1)) if dd >= 1 else np.float32(0)
                sc -= int(np.float32(lin + np.float32(0.5) * logp))
            cand = sc + f[j]
            if cand > best:
                best = cand
                bestj = j
                if n_skip > 0:
                    n_skip -= 1
            elif t[j] == i:
                n_skip += 1
                if n_skip > params.max_chain_skip:
                    break
            if p[j] >= 0:
                t[p[j]] = i
        f[i] = best
        p[i] = bestj
    return f, p


def plateau_anchors(n, plateau, seed):
    """Anchor sets with qpos plateaus (tandem-repeat-like ambiguity)."""
    rng = np.random.default_rng(seed)
    rid = np.zeros(n, np.int32)
    strand = np.zeros(n, np.int8)
    rpos = np.sort(rng.integers(0, 3000, n)).astype(np.int32)
    qpos = (rpos + rng.integers(-50, 50, n)).astype(np.int32)
    dup = rng.random(n) < plateau
    qpos[dup] = qpos[dup] % 200 + 100
    order = np.lexsort((qpos, rpos))
    return C.Anchors(
        rid=rid,
        rpos=rpos[order],
        qpos=qpos[order],
        strand=strand,
        span=np.full(n, 15, np.int32),
    )


CASES = [(50, 0.0, 1), (200, 0.3, 2), (400, 0.7, 3), (800, 0.9, 4), (300, 1.0, 5)]


@pytest.mark.parametrize("n,plateau,seed", CASES)
def test_numpy_fallback_matches_scalar_oracle(n, plateau, seed, monkeypatch):
    import lrge_tpu.native as natmod

    a = plateau_anchors(n, plateau, seed)
    key2 = a.rid.astype(np.int64) * 2 + a.strand
    fo, po = scalar_chain_dp(
        key2, a.rpos.astype(np.int64), a.qpos.astype(np.int64), a.span.astype(np.int64), AVA_ONT
    )
    monkeypatch.setattr(natmod, "native", None)
    fn, pn = C.chain_dp(a, AVA_ONT)
    np.testing.assert_array_equal(fo, fn)
    np.testing.assert_array_equal(po, pn)


@pytest.mark.parametrize("n,plateau,seed", CASES)
def test_native_matches_scalar_oracle(n, plateau, seed):
    from lrge_tpu.native import native

    if native is None:
        pytest.skip("native extension unavailable")
    a = plateau_anchors(n, plateau, seed)
    key2 = a.rid.astype(np.int64) * 2 + a.strand
    fo, po = scalar_chain_dp(
        key2, a.rpos.astype(np.int64), a.qpos.astype(np.int64), a.span.astype(np.int64), AVA_ONT
    )
    fc, pc = C.chain_dp(a, AVA_ONT)
    np.testing.assert_array_equal(fo, fc)
    np.testing.assert_array_equal(po, pc)


def test_skip_heuristic_fires():
    # the plateau corpus must actually trigger the early break (results
    # differ from an unbounded scan), otherwise these tests prove nothing
    a = plateau_anchors(800, 0.9, 4)
    f1, _ = C.chain_dp(a, AVA_ONT)
    f2, _ = C.chain_dp(a, dataclasses.replace(AVA_ONT, max_chain_skip=10**9))
    assert (f1 != f2).any()


def test_device_dp_matches_host_on_plateaus():
    """XLA chain DP (with the vectorised skip formulation) == oracle."""
    jax = pytest.importorskip("jax")
    import jax.numpy as jnp

    from lrge_tpu.ops.overlap_jax import map_batch_core

    # Build a synthetic single-target index whose postings make the
    # query produce plateau-heavy anchors: one posting per (hash, pos).
    rng = np.random.default_rng(7)
    M = 64  # query minimizers
    reps = 6  # postings per minimizer (below mid_occ)
    hashes = np.sort(rng.choice(np.arange(1 << 20, dtype=np.uint64), M, replace=False))
    qpos = np.sort(rng.integers(20, 1980, M)).astype(np.int32)
    # each minimizer occurs `reps` times on the target, at a periodic
    # offset -> dense same-(rid,strand) runs with plateaus
    keys = np.repeat(hashes, reps)
    pos = (np.repeat(qpos, reps) + np.tile(np.arange(reps, dtype=np.int32) * 211, M)).astype(
        np.int32
    )
    rid = np.zeros(M * reps, np.int32)
    strand = np.zeros(M * reps, np.int8)
    order = np.lexsort((pos, rid, keys))

    from lrge_tpu.ops.index import TargetIndex

    params = AVA_ONT
    index = TargetIndex(
        keys=keys[order],
        rid=rid[order],
        pos=pos[order],
        strand=strand[order],
        names=[b"t0"],
        lengths=np.array([4000], np.int32),
        mid_occ=100,
        params=params,
        name_rank=np.zeros(1, np.int32),
    )
    from lrge_tpu.engine import OverlapEngine
    from lrge_tpu.ops.chain import Anchors, backtrack, chain_dp, collect_anchors

    anchors, _ = collect_anchors(index, (hashes << np.uint64(8)) | np.uint64(15), qpos, np.zeros(M, np.int32), 2000)
    fh, ph = chain_dp(anchors, params)
    n_pass_host = len(backtrack(fh, ph, anchors, params))

    B, A, W = 1, 512, 256
    keys32 = (index.keys.astype(np.uint32) ^ np.uint32(0x80000000)).view(np.int32)
    mhash = np.full((B, 2 * M), 0xFFFFFFFF, np.uint32)
    mhash[0, :M] = hashes.astype(np.uint32)
    mpos = np.zeros((B, 2 * M), np.int32)
    mpos[0, :M] = qpos
    mstrand = np.zeros((B, 2 * M), np.int32)
    counts, n_anchors, max_run, _ = map_batch_core(
        jnp.asarray(keys32),
        jnp.asarray(index.rid),
        jnp.asarray(index.pos),
        jnp.asarray(index.strand.astype(np.int32)),
        jnp.asarray(index.name_rank),
        jnp.int32(index.mid_occ),
        jnp.asarray(mhash),
        jnp.asarray(mpos),
        jnp.asarray(mstrand),
        jnp.array([2000], jnp.int32),
        jnp.zeros(B, jnp.int32),
        jnp.full(B, -1, jnp.int32),
        jnp.float32(params.chn_pen_gap()),
        k=params.k,
        max_gap=params.max_gap,
        bw=params.bw,
        min_score=params.min_chain_score,
        num_anchors=A,
        window=W,
        no_dual=False,
        no_diag=False,
        q_occ_frac=0.0,
    )
    assert int(np.asarray(max_run)[0]) <= W, "window-miss: test corpus too dense"
    assert int(np.asarray(n_anchors)[0]) <= A
    # host target count: unique targets with a passing chain
    host_count = 1 if n_pass_host > 0 else 0
    assert int(np.asarray(counts)[0]) == host_count


def test_q_occ_filter_drops_repetitive_query_seeds():
    """mm_seed_mz_flt: within-query occurrence above mid_occ AND above
    q_occ_frac of the minimizer count removes the seed entirely."""
    from lrge_tpu.ops.chain import collect_anchors
    from lrge_tpu.ops.index import TargetIndex

    params = AVA_ONT
    # query: one hash occurring 150 times + 50 distinct others
    h_rep = np.uint64(12345)
    others = np.arange(100000, 100050, dtype=np.uint64)
    qh = np.concatenate([np.full(150, h_rep), others])
    qpos = np.arange(40, 40 + len(qh) * 20, 20, dtype=np.int32)
    qstrand = np.zeros(len(qh), np.int32)
    # index: the repetitive hash occurs 10 times (<= mid_occ) so only
    # the query-side filter can remove it
    keys = np.sort(np.full(10, h_rep))
    index = TargetIndex(
        keys=keys,
        rid=np.zeros(10, np.int32),
        pos=np.arange(10, dtype=np.int32) * 100,
        strand=np.zeros(10, np.int8),
        names=[b"t0"],
        lengths=np.array([2000], np.int32),
        mid_occ=20,
        params=params,
        name_rank=np.zeros(1, np.int32),
    )
    qkey = (qh << np.uint64(8)) | np.uint64(15)
    anchors, rep_len = collect_anchors(index, qkey, qpos, qstrand, 5000)
    assert len(anchors) == 0  # 150 > mid_occ (20) and > 1% of 200
    assert rep_len == 0  # q-filtered seeds are not repetitive-interval seeds

    nofilter = dataclasses.replace(params, q_occ_frac=0.0)
    index2 = dataclasses.replace(index, params=nofilter) if dataclasses.is_dataclass(index) else index
    index2.params = nofilter
    anchors2, _ = collect_anchors(index2, qkey, qpos, qstrand, 5000)
    assert len(anchors2) == 150 * 10


def test_q_occ_inactive_for_small_queries():
    # a query with <= mid_occ minimizers is never filtered
    from lrge_tpu.ops.chain import collect_anchors
    from lrge_tpu.ops.index import TargetIndex

    params = AVA_ONT
    h_rep = np.uint64(777)
    qh = np.full(15, h_rep)  # 15 <= mid_occ=20
    qpos = np.arange(40, 40 + 15 * 20, 20, dtype=np.int32)
    keys = np.sort(np.full(5, h_rep))
    index = TargetIndex(
        keys=keys,
        rid=np.zeros(5, np.int32),
        pos=np.arange(5, dtype=np.int32) * 100,
        strand=np.zeros(5, np.int8),
        names=[b"t0"],
        lengths=np.array([2000], np.int32),
        mid_occ=20,
        params=params,
        name_rank=np.zeros(1, np.int32),
    )
    qkey = (qh << np.uint64(8)) | np.uint64(15)
    anchors, _ = collect_anchors(index, qkey, qpos, np.zeros(15, np.int32), 1000)
    assert len(anchors) == 15 * 5


def test_device_skip_changes_counts_exactly_like_host():
    """A corpus where the early break changes the best chain score
    (196 with skip vs 289 without): with min_score=250 the device must
    count 0 under max_chain_skip=25 and 1 under an unbounded scan."""
    jax = pytest.importorskip("jax")
    import jax.numpy as jnp

    from lrge_tpu.ops.overlap_jax import map_batch_core

    a = plateau_anchors(300, 0.9, 7)
    f_skip, _ = C.chain_dp(a, AVA_ONT)
    f_noskip, _ = C.chain_dp(a, dataclasses.replace(AVA_ONT, max_chain_skip=10**9))
    assert f_skip.max() < 250 <= f_noskip.max()  # corpus sanity

    n = len(a)
    # one unique single-posting hash per anchor, emitted in anchor order
    # so the device's stable (key2, rpos) sort reproduces the host order
    keys32 = (np.arange(n, dtype=np.uint32) ^ np.uint32(0x80000000)).view(np.int32)
    order = np.argsort(keys32, kind="stable")
    B, A, W, M = 1, 512, 512, 512
    mhash = np.full((B, M), 0xFFFFFFFF, np.uint32)
    mhash[0, :n] = np.arange(n, dtype=np.uint32)
    mpos = np.zeros((B, M), np.int32)
    mpos[0, :n] = a.qpos
    mstrand = np.zeros((B, M), np.int32)

    def run(max_chain_skip):
        counts, n_anchors, max_run, _ = map_batch_core(
            jnp.asarray(keys32[order]),
            jnp.asarray(a.rid[order].astype(np.int32)),
            jnp.asarray(a.rpos[order].astype(np.int32)),
            jnp.asarray(a.strand[order].astype(np.int32)),
            jnp.zeros(1, jnp.int32),
            jnp.int32(1000),
            jnp.asarray(mhash),
            jnp.asarray(mpos),
            jnp.asarray(mstrand),
            jnp.array([4000], jnp.int32),
            jnp.zeros(B, jnp.int32),
            jnp.full(B, -1, jnp.int32),
            jnp.float32(AVA_ONT.chn_pen_gap()),
            k=AVA_ONT.k,
            max_gap=AVA_ONT.max_gap,
            bw=AVA_ONT.bw,
            min_score=250,
            num_anchors=A,
            window=W,
            no_dual=False,
            no_diag=False,
            max_chain_skip=max_chain_skip,
            q_occ_frac=0.0,
        )
        assert int(np.asarray(max_run)[0]) <= W
        return int(np.asarray(counts)[0])

    assert run(25) == 0
    assert run(10**9) == 1
