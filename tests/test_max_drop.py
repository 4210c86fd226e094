"""Backtrack peak-drop trimming (``max_drop = bw``).

minimap2's ``mg_chain_bk_end`` stops the backtrack walk at the
peeled-score argmax once the score falls more than ``bw`` below the
running max: a deep interior valley trims the chain (different extent)
and can split it (the freed leading peak is peeled as its own chain).
Reference call site: `liblrge/src/minimap2/aligner.rs:230-241` via
mm_map → mm_chain_dp → mm_chain_backtrack.
"""

import numpy as np
import pytest

from lrge_tpu.ops.chain import Anchors, backtrack, chain_dp
from lrge_tpu.platform import AVA_ONT, OverlapParams


def _mk_anchors(n, rid=0, strand=0):
    return Anchors(
        rid=np.full(n, rid, np.int32),
        rpos=np.arange(n, dtype=np.int32),
        qpos=np.arange(n, dtype=np.int32),
        strand=np.full(n, strand, np.int8),
        span=np.full(n, 15, np.int32),
    )


class TestBkEnd:
    """Hand-built (f, p) arrays pin the walk-truncation semantics."""

    def test_valley_trims_extent(self):
        # chain 0..9; peeled score s_i = f[end] - f[i] rises to 2500 at
        # i=3 (the valley bottom), then a tall leading peak brings
        # f back up: s at i=2 is 2500-2490=... construct explicitly:
        # f along path (end->start order walked via p):
        #   f = [4000, 3900, 3800, 1500, 3990, 3980, 200, 150, 100, 4100]
        # with p[i] = i-1 for the chain 0..9 and end = 9 (f=4100).
        # s_i = 4100 - f[i]: [100, 200, 300, 2600, 110, 120, 3900, ...]
        # walking from 9: i=8 s=4000-? — keep it simpler: linear chain
        # with one deep dip in f.
        f = np.array([2980, 2990, 100, 2970, 2960, 3100], dtype=np.int64)
        p = np.array([-1, 0, 1, 2, 3, 4], dtype=np.int64)
        anchors = _mk_anchors(6)
        params = OverlapParams(k=15, w=5, bw=2000, min_chain_score=100, min_cnt=1)
        chains = backtrack(f, p, anchors, params)
        # walk from end=5: s(4)=140, s(3)=130, s(2)=3000 -> max at i=2;
        # s(1)=110 -> drop 2890 > bw -> break. end_i=2: the chain keeps
        # anchors {5,4,3} with score 3000; the probe marked {5,4,3,2}
        # used but anchors 0-1 (beyond the break) stay free and are
        # peeled later as their own chain ending at 1.
        assert len(chains) == 2
        first, second = chains
        assert list(first.anchor_idx) == [3, 4, 5]
        assert first.score == 3000
        assert list(second.anchor_idx) == [0, 1]
        assert second.score == 2990

    def test_no_valley_keeps_full_chain(self):
        f = np.array([115, 230, 345, 460], dtype=np.int64)
        p = np.array([-1, 0, 1, 2], dtype=np.int64)
        anchors = _mk_anchors(4)
        params = OverlapParams(k=15, w=5, bw=2000, min_chain_score=100, min_cnt=1)
        chains = backtrack(f, p, anchors, params)
        assert len(chains) == 1
        assert list(chains[0].anchor_idx) == [0, 1, 2, 3]
        assert chains[0].score == 460

    def test_shallow_valley_not_trimmed(self):
        # dip of exactly bw is NOT deeper than bw -> no trim
        f = np.array([3000, 1100, 3050, 3100], dtype=np.int64)
        p = np.array([-1, 0, 1, 2], dtype=np.int64)
        anchors = _mk_anchors(4)
        params = OverlapParams(k=15, w=5, bw=2000, min_chain_score=100, min_cnt=1)
        chains = backtrack(f, p, anchors, params)
        # s: i=2 -> 50, i=1 -> 2000, i=0 -> 100... max_s=2000 at i=1;
        # drop at i=0 is 2000-100=1900 <= bw; then i=-1 s=3100 -> new max
        assert len(chains) == 1
        assert list(chains[0].anchor_idx) == [0, 1, 2, 3]
        assert chains[0].score == 3100


def _valley_anchors(params, n_peak=150, n_gap=9, rid=0):
    """Anchors forming peak — penalty valley — peak on one target.

    The middle section alternates diagonals by ~bw so each step pays
    ~pen_gap*bw (~-229 net at ava-ont), digging a cumulative valley of
    ~2060 > bw below the leading peak's f (~2250) while keeping every
    f above span (a dip below span would make the DP restart the chain
    instead of linking through the valley).  The zig displacement also
    exceeds max_gap so the trailing peak cannot link straight across.
    """
    rpos, qpos = [], []
    r = q = 1000
    for _ in range(n_peak):  # dense colinear run (score ~15/step)
        r += 15
        q += 15
        rpos.append(r)
        qpos.append(q)
    for _ in range(n_gap):  # staircase: diagonal drifts ~bw EVERY step,
        # so only consecutive links stay in-band (a zig-zag would land
        # even steps back on the peak's diagonal for a cheap shortcut)
        r += 2005
        q += 15
        rpos.append(r)
        qpos.append(q)
    for _ in range(n_peak):
        r += 15
        q += 15
        rpos.append(r)
        qpos.append(q)
    n = len(rpos)
    return Anchors(
        rid=np.full(n, rid, np.int32),
        rpos=np.array(rpos, np.int32),
        qpos=np.array(qpos, np.int32),
        strand=np.zeros(n, np.int8),
        span=np.full(n, params.k, np.int32),
    )


class TestValleyCorpus:
    def test_chain_dp_valley_splits_chain(self):
        params = AVA_ONT
        anchors = _valley_anchors(params)
        f, p = chain_dp(anchors, params)
        chains = backtrack(f, p, anchors, params)
        # the zig-zag digs > bw below the running max: the top chain is
        # trimmed to the trailing peak and the leading peak survives as
        # its own chain
        assert len(chains) >= 2, [c.score for c in chains]
        n = len(anchors)
        ext = [(int(c.anchor_idx[0]), int(c.anchor_idx[-1])) for c in chains]
        # one chain covers the trailing peak, another the leading peak;
        # no chain spans the whole valley (n_peak=150 anchors per peak,
        # 9 staircase anchors between them)
        assert all(e - s + 1 <= 150 for s, e in ext), ext
        # trailing peak peeled first (higher f end), leading peak second
        assert ext[0][1] == n - 1 and ext[1][0] == 0, ext

    def test_valley_counts_equal_across_backends(self):
        """Counts are valley-invariant for unique-target counting (the
        best chain still passes); every backend must agree."""
        from lrge_tpu.engine import OverlapEngine
        from lrge_tpu.native import native
        from lrge_tpu.ops.index import build_index

        rng = np.random.default_rng(9)
        params = AVA_ONT
        # build a target whose overlap with the query zig-zags: embed
        # two shared 1.5kb blocks separated by unrelated 2.2kb so the
        # inter-block transition pays a near-band gap penalty repeatedly
        blockA = bytes(rng.choice(list(b"ACGT"), size=1500).tolist())
        blockB = bytes(rng.choice(list(b"ACGT"), size=1500).tolist())
        junkT = bytes(rng.choice(list(b"ACGT"), size=2200).tolist())
        junkQ = bytes(rng.choice(list(b"ACGT"), size=2200).tolist())
        target = blockA + junkT + blockB
        query = blockA + junkQ + blockB
        fillers = [
            bytes(rng.choice(list(b"ACGT"), size=1200).tolist()) for _ in range(6)
        ]
        targets = [target] + fillers
        tnames = [b"t%d" % i for i in range(len(targets))]
        index = build_index(targets, tnames, params)
        host = OverlapEngine(index)
        c_full = len({r.target_name for r in host.map_read(b"q", query)})
        c_fast, _ = host.count_overlaps(b"q", query)
        assert c_fast == c_full
        if native is not None:
            got = host.count_overlaps_many([(b"q", query)])
            assert got[0][0] == c_full
