"""Host overlap-engine tests on synthetic genomes."""

import numpy as np
import pytest

from lrge_tpu.engine import build_engine
from lrge_tpu.platform import AVA_ONT, AVA_PB, OverlapParams, preset_for, Platform

RC = bytes.maketrans(b"ACGT", b"TGCA")


def revcomp(seq: bytes) -> bytes:
    return seq.translate(RC)[::-1]


def make_genome(rng, n):
    return bytes(rng.choice(list(b"ACGT"), size=n).tolist())


def sample_read(rng, genome, length, pos=None, rev=None, err=0.0):
    if pos is None:
        pos = int(rng.integers(0, len(genome) - length))
    seq = genome[pos : pos + length]
    if err > 0:
        arr = bytearray(seq)
        for i in range(len(arr)):
            if rng.random() < err:
                arr[i] = int(rng.choice(list(b"ACGT")))
        seq = bytes(arr)
    if rev is None:
        rev = bool(rng.integers(0, 2))
    return (revcomp(seq) if rev else seq), pos, rev


@pytest.fixture(scope="module")
def small_engine():
    rng = np.random.default_rng(42)
    genome = make_genome(rng, 50_000)
    targets = []
    names = []
    rng2 = np.random.default_rng(7)
    for i in range(60):
        seq, pos, rev = sample_read(rng2, genome, 2000)
        targets.append(seq)
        names.append(f"t{i}_p{pos}_{int(rev)}".encode())
    params = preset_for(Platform.NANOPORE, dual=True)
    return build_engine(targets, names, params), genome, targets, names


class TestOverlapDetection:
    def test_query_overlapping_target_found(self, small_engine):
        engine, genome, targets, names = small_engine
        # a query that physically overlaps target 0 by 1200bp
        name0 = names[0]
        pos0 = int(name0.split(b"_p")[1].split(b"_")[0])
        qseq = genome[pos0 + 800 : pos0 + 800 + 2000]
        recs = engine.map_read(b"query1", qseq)
        assert any(r.target_name == name0 for r in recs), "expected overlap not found"
        rec = next(r for r in recs if r.target_name == name0)
        # overlap region is ~1200bp; coordinates should reflect that
        assert rec.s1 >= 100
        assert 900 < rec.query_end - rec.query_start < 1400
        assert rec.cm >= 3

    def test_reverse_strand_overlap(self, small_engine):
        engine, genome, targets, names = small_engine
        name0, t0 = names[0], targets[0]
        qseq = revcomp(t0[500:1800])
        recs = engine.map_read(b"rquery", qseq)
        rec = next(r for r in recs if r.target_name == name0)
        assert rec.strand == "-"
        # the overlap covers most of the query
        assert rec.query_end - rec.query_start > 1000
        assert 400 < rec.target_start < 600
        assert 1700 < rec.target_end < 1900

    def test_unrelated_query_no_overlap(self, small_engine):
        engine, *_ = small_engine
        rng = np.random.default_rng(999)
        qseq = make_genome(rng, 2000)  # random, unrelated
        recs = engine.map_read(b"unrelated", qseq)
        assert recs == []

    def test_no_dual_mask(self, small_engine):
        engine, genome, targets, names = small_engine
        # query named after a target: with no_dual, targets with smaller
        # names are skipped
        from dataclasses import replace

        from lrge_tpu.engine import OverlapEngine

        nd_params = replace(engine.params, no_dual=True)
        engine_nd = OverlapEngine(
            type(engine.index)(
                **{**engine.index.__dict__, "params": nd_params}
            )
        )
        qname = names[30]
        qseq = targets[30]
        recs = engine_nd.map_read(qname, qseq)
        smaller = {n for n in names if n < qname}
        assert all(r.target_name not in smaller for r in recs)

    def test_self_mapping_skipped_on_diagonal(self, small_engine):
        engine, genome, targets, names = small_engine
        # mapping a target against itself: the exact diagonal is masked,
        # so either no self record or only off-diagonal (repeat) chains
        recs = engine.map_read(names[5], targets[5])
        for r in recs:
            if r.target_name == names[5]:
                # a full-diagonal self chain would span the whole read
                assert not (
                    r.query_start < 50
                    and r.query_end > 1950
                    and r.strand == "+"
                    and abs(r.target_start - r.query_start) < 5
                )

    def test_counts_match_mapping_uniques(self, small_engine):
        engine, genome, targets, names = small_engine
        rng = np.random.default_rng(3)
        for _ in range(5):
            qseq, _, _ = sample_read(rng, genome, 3000)
            recs = engine.map_read(b"q", qseq)
            count, had = engine.count_overlaps(b"q", qseq)
            assert count == len({r.target_name for r in recs})
            assert had == int(bool(recs))


class TestErrorTolerance:
    def test_overlap_found_with_10pct_errors(self, small_engine):
        engine, genome, targets, names = small_engine
        rng = np.random.default_rng(12)
        name0 = names[0]
        pos0 = int(name0.split(b"_p")[1].split(b"_")[0])
        found = 0
        for _ in range(5):
            qseq, _, _ = sample_read(rng, genome, 2000, pos=pos0, rev=False, err=0.05)
            recs = engine.map_read(b"qe", qseq)
            found += any(r.target_name == name0 for r in recs)
        assert found >= 4  # 5% error reads overlap fully; expect detection


class TestHpcPreset:
    def test_pacbio_preset_end_to_end(self):
        rng = np.random.default_rng(21)
        genome = make_genome(rng, 20_000)
        targets, names = [], []
        for i in range(20):
            seq, pos, rev = sample_read(rng, genome, 1500)
            targets.append(seq)
            names.append(f"p{i}".encode())
        params = preset_for(Platform.PACBIO, dual=True)
        engine = build_engine(targets, names, params)
        q = targets[3][200:1400]
        recs = engine.map_read(b"hpcq", q)
        assert any(r.target_name == names[3] for r in recs)


def test_count_overlaps_many_matches_per_read():
    # the native whole-pipeline count_many kernel must reproduce the
    # per-read Python path exactly, including no-dual/self masks and the
    # q_occ filter (repeat-rich corpus)
    import numpy as np

    from lrge_tpu.engine import OverlapEngine
    from lrge_tpu.ops.index import build_index
    from lrge_tpu.platform import Platform, preset_for

    rng = np.random.default_rng(77)
    genome = bytearray(rng.choice(list(b"ACGT"), size=120_000).tolist())
    unit = bytes(rng.choice(list(b"ACGT"), size=300).tolist())
    genome[40_000:41_500] = unit * 5
    genome = bytes(genome)

    def reads(n, L, err, tag):
        out = []
        g = np.frombuffer(genome, np.uint8)
        bases = np.frombuffer(b"ACGT", np.uint8)
        for i in range(n):
            pos = int(rng.integers(0, len(genome) - L))
            arr = g[pos : pos + L].copy()
            ne = rng.binomial(L, err)
            arr[rng.integers(0, L, size=ne)] = bases[rng.integers(0, 4, size=ne)]
            out.append((b"%s%d" % (tag, i), arr.tobytes()))
        return out

    targets = reads(150, 1800, 0.08, b"t")
    queries = reads(60, 2200, 0.08, b"q")
    for dual in (True, False):
        params = preset_for(Platform.NANOPORE, dual=dual)
        index = build_index([s for _, s in targets], [n for n, _ in targets], params)
        host = OverlapEngine(index)
        # include indexed reads so self/no-dual masks are exercised
        items = queries + targets[:30]
        ref = [tuple(map(int, host.count_overlaps(nm, sq))) for nm, sq in items]
        got = host.count_overlaps_many(items)
        assert got == ref


def test_count_overlaps_many_pairs_match_map_read():
    # want_pairs must emit exactly the passing target-id set of the full
    # map path (ava's symmetric counting consumes these)
    import numpy as np

    from lrge_tpu.engine import OverlapEngine
    from lrge_tpu.ops.index import build_index
    from lrge_tpu.platform import Platform, preset_for

    rng = np.random.default_rng(123)
    genome = bytes(rng.choice(list(b"ACGT"), size=90_000).tolist())

    def reads(n, L, err, tag):
        out = []
        g = np.frombuffer(genome, np.uint8)
        bases = np.frombuffer(b"ACGT", np.uint8)
        for i in range(n):
            pos = int(rng.integers(0, len(genome) - L))
            arr = g[pos : pos + L].copy()
            ne = rng.binomial(L, err)
            arr[rng.integers(0, L, size=ne)] = bases[rng.integers(0, 4, size=ne)]
            out.append((b"%s%d" % (tag, i), arr.tobytes()))
        return out

    targets = reads(120, 1800, 0.08, b"r")
    params = preset_for(Platform.NANOPORE, dual=False)  # ava preset: no_dual
    index = build_index([s for _, s in targets], [n for n, _ in targets], params)
    host = OverlapEngine(index)
    items = targets[:50]
    res = host.count_overlaps_many(items, want_pairs=True)
    name_to_rid = {n: i for i, n in enumerate(index.names)}
    for (nm, sq), (c, h, rids) in zip(items, res):
        recs = host.map_read(nm, sq)
        expect = sorted({name_to_rid[r.target_name] for r in recs})
        if rids is None:
            continue  # truncated; callers recover via map_read
        assert sorted(rids.tolist()) == expect, nm
        assert c == len(expect)


def test_count_overlaps_many_hpc_matches_per_read():
    # HPC preset: variable spans + the backtrack-peel reduce (min_cnt
    # can disqualify a best chain while a secondary passes) must match
    # the per-read map_read-based counting exactly
    import numpy as np

    from lrge_tpu.engine import OverlapEngine
    from lrge_tpu.ops.index import build_index
    from lrge_tpu.platform import Platform, preset_for

    rng = np.random.default_rng(55)
    parts = []
    for _ in range(4000):
        base = rng.choice(list(b"ACGT"))
        parts.append(bytes([base]) * int(rng.integers(1, 8)))
    genome = b"".join(parts)

    def reads(n, L, err, tag):
        out = []
        g = np.frombuffer(genome, np.uint8)
        bases = np.frombuffer(b"ACGT", np.uint8)
        for i in range(n):
            pos = int(rng.integers(0, len(genome) - L))
            arr = g[pos : pos + L].copy()
            ne = rng.binomial(L, err)
            arr[rng.integers(0, L, size=ne)] = bases[rng.integers(0, 4, size=ne)]
            out.append((b"%s%d" % (tag, i), arr.tobytes()))
        return out

    targets = reads(100, 1800, 0.05, b"t")
    queries = reads(50, 2000, 0.05, b"q")
    params = preset_for(Platform.PACBIO, dual=True)
    index = build_index([s for _, s in targets], [n for n, _ in targets], params)
    host = OverlapEngine(index)
    items = queries + targets[:25]
    ref = [tuple(map(int, host.count_overlaps(nm, sq))) for nm, sq in items]
    got = host.count_overlaps_many(items)
    assert got == ref
    # pairs variant: unique passing targets from map_read
    name_to_rid = {n: i for i, n in enumerate(index.names)}
    for (nm, sq), (c, h, rids) in zip(items, host.count_overlaps_many(items, want_pairs=True)):
        recs = host.map_read(nm, sq)
        expect = sorted({name_to_rid[r.target_name] for r in recs})
        assert c == len(expect)
        if rids is not None:
            assert sorted(rids.tolist()) == expect


def test_parallel_mapper_avoids_fork_after_jax():
    """Forking after the JAX backend (or any thread) is live crashes the
    child (inherited locked mutexes); the pool must degrade to threads
    and still produce order-preserved, equal results."""
    import jax

    from lrge_tpu.engine import OverlapEngine, ParallelHostMapper, fork_unsafe
    from lrge_tpu.ops.index import build_index

    jax.devices()  # spin up backend threads
    assert fork_unsafe()

    rng = np.random.default_rng(11)
    g = np.frombuffer(b"ACGT", np.uint8)[
        rng.integers(0, 4, size=40_000, dtype=np.uint8)
    ].tobytes()
    def reads(n, L, tag):
        out = []
        ga = np.frombuffer(g, np.uint8)
        for i in range(n):
            pos = int(rng.integers(0, len(g) - L))
            out.append((b"%s%d" % (tag, i), ga[pos : pos + L].tobytes()))
        return out

    targets = reads(40, 1500, b"t")
    queries = reads(20, 1500, b"q")
    params = preset_for(Platform.NANOPORE, dual=True)
    index = build_index([s for _, s in targets], [n for n, _ in targets], params)
    mapper = ParallelHostMapper(index, threads=4)
    assert mapper._pool is None  # no forked pool under live JAX
    host = OverlapEngine(index)
    got = [[r.to_line() for r in recs] for recs in mapper.map_reads(queries)]
    ref = [[r.to_line() for r in host.map_read(nm, sq)] for nm, sq in queries]
    assert got == ref
    mapper.close()
