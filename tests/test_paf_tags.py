"""PAF tag fidelity: mapq model, mm_est_err-style dv, golden lines.

The reference emits minimap2's `tp/cm/s1/dv/rl` tags plus a computed
mapq (`aligner.rs:253-276`, `mapping.rs:136-147`).  These tests pin the
host engine's tag behavior: the mapq model's shape (unambiguous chains
score high, duplicated targets drag mapq to 0), the dv window/dedup
semantics, and byte-exact golden PAF lines for a fixed corpus as a
drift tripwire.
"""

import numpy as np
import pytest

from lrge_tpu.engine import Mapping, _mapq, build_engine
from lrge_tpu.platform import Platform, preset_for

RC = bytes.maketrans(b"ACGT", b"TGCA")


def make_genome(rng, n):
    return bytes(rng.choice(list(b"ACGT"), size=n).tolist())


class TestMapqModel:
    def base(self, **kw):
        d = dict(
            rid=0, strand=0, qs=0, qe=1000, rs=0, re=1000,
            score=500, cnt=50, mlen=700, blen=900, tp="P",
        )
        d.update(kw)
        return Mapping(**d)

    def test_unambiguous_chain_maxes_out(self):
        # no secondary: subsc floors at min_chain_score, x small,
        # pen=1 -> 40 * (1 - 100/500) * ln(500) = 198 -> clamped 60
        assert _mapq(self.base(), 100) == 60

    def test_equal_secondary_gives_zero_then_bump(self):
        # subsc == score -> x = 1 -> mapq 0; score > subsc false -> stays 0
        m = self.base(subsc=500, n_sub=1)
        assert _mapq(m, 100) == 0

    def test_marginally_better_than_secondary_bumps_to_one(self):
        m = self.base(score=501, subsc=500, n_sub=1)
        # 40*(1-500/501)*ln(501) ~ 0.49 -> int 0; minus n_sub penalty,
        # clamped 0; score > subsc -> bumped to 1
        assert _mapq(m, 100) == 1

    def test_secondary_gets_zero(self):
        assert _mapq(self.base(tp="S"), 100) == 0

    def test_low_count_penalty(self):
        hi = _mapq(self.base(cnt=50, score=150, subsc=120, n_sub=1), 100)
        lo = _mapq(self.base(cnt=4, score=150, subsc=120, n_sub=1), 100)
        assert lo < hi

    def test_many_secondaries_penalty(self):
        # score low enough that the 60 clamp does not saturate
        few = _mapq(self.base(score=150, subsc=120, n_sub=1), 100)
        many = _mapq(self.base(score=150, subsc=120, n_sub=40), 100)
        assert many < few


@pytest.fixture(scope="module")
def fixed_engine():
    rng = np.random.default_rng(20260818)
    genome = make_genome(rng, 30_000)
    targets, names = [], []
    for i, (pos, L) in enumerate([(1000, 2000), (2500, 2000), (9000, 2000), (15000, 2000)]):
        targets.append(genome[pos : pos + L])
        names.append(f"t{i}".encode())
    params = preset_for(Platform.NANOPORE, dual=True)
    return build_engine(targets, names, params), genome


class TestGoldenPaf:
    def test_golden_lines(self, fixed_engine):
        engine, genome = fixed_engine
        # error-free query overlapping t0 (tail) and t1 (head)
        q = genome[2000:4000]
        lines = [r.to_line() for r in engine.map_read(b"q0", q)]
        # two disjoint-window primaries (q[500:2000] on t1's head,
        # q[0:996] on t0's tail), error-free so mlen == blen == span
        # and dv == 0; both unambiguous -> mapq 60
        assert lines == [
            "q0\t2000\t500\t2000\t+\tt1\t2000\t0\t1500\t1500\t1500\t60\ttp:A:P\tcm:i:514\ts1:i:1500\tdv:f:0\trl:i:0",
            "q0\t2000\t0\t996\t+\tt0\t2000\t1000\t1996\t996\t996\t60\ttp:A:P\tcm:i:338\ts1:i:996\tdv:f:0\trl:i:0",
        ]

    def test_unambiguous_high_mapq_disjoint_targets(self, fixed_engine):
        engine, genome = fixed_engine
        # query overlapping only t2: single chain, mapq 60
        q = genome[9400 : 9400 + 1200]
        recs = engine.map_read(b"q1", q)
        assert len(recs) == 1
        assert recs[0].target_name == b"t2"
        assert recs[0].mapq == 60
        assert recs[0].tp == "P"

    def test_duplicate_target_drops_mapq(self):
        # two identical targets: the best chain has an equal-scoring
        # secondary on the duplicate -> x=1 -> mapq 0
        rng = np.random.default_rng(77)
        genome = make_genome(rng, 10_000)
        t = genome[3000:5000]
        params = preset_for(Platform.NANOPORE, dual=True)
        engine = build_engine([t, t], [b"a", b"b"], params)
        q = genome[3200:4800]
        recs = engine.map_read(b"q", q)
        prim = [r for r in recs if r.tp == "P"]
        assert prim and all(r.mapq == 0 for r in prim)

    def test_dv_rises_with_errors(self, fixed_engine):
        engine, genome = fixed_engine
        rng = np.random.default_rng(5)
        q = bytearray(genome[9200 : 9200 + 1500])
        for s in rng.integers(0, len(q), size=90):  # ~6% errors
            q[s] = int(rng.choice(list(b"ACGT")))
        recs = engine.map_read(b"qe", bytes(q))
        rec = next(r for r in recs if r.target_name == b"t2")
        assert 0.01 < rec.dv < 0.2
        # error-free run on the same window reports dv 0
        recs0 = engine.map_read(b"qc", genome[9200 : 9200 + 1500])
        rec0 = next(r for r in recs0 if r.target_name == b"t2")
        assert rec0.dv == 0.0


class TestNoDualNameOrder:
    def test_strcmp_semantics_not_file_order(self):
        """minimap2's MM_F_NO_DUAL skips a target iff
        ``strcmp(qname, target_name) > 0`` (`map.c` skip_seed) — name
        comparison, NOT index/file order.  Build an index whose file
        order is the reverse of name order and check the mask follows
        names."""
        rng = np.random.default_rng(13)
        genome = make_genome(rng, 12_000)
        # file order: z, m, a (reverse lexicographic)
        seqs = [genome[0:2000], genome[1000:3000], genome[2000:4000]]
        names = [b"z", b"m", b"a"]
        params = preset_for(Platform.NANOPORE, dual=False)  # sets no_dual
        engine = build_engine(seqs, names, params)
        # query named "m": may hit "z" (strcmp("m","z") < 0) but never
        # "a" (strcmp("m","a") > 0), regardless of file positions
        recs = engine.map_read(b"m", genome[900:3100])
        hit = {r.target_name for r in recs}
        assert b"a" not in hit
        assert b"z" in hit
