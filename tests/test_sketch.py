"""Minimizer sketch equivalence tests: scalar oracle vs fast paths."""

import numpy as np
import pytest

from lrge_tpu.ops.encode import encode_seq, make_batches
from lrge_tpu.ops.sketch import hash64, minimizers_numpy, sketch_scalar


def random_read(rng, n, n_prob=0.0):
    bases = rng.choice(list(b"ACGT"), size=n)
    if n_prob:
        mask = rng.random(n) < n_prob
        bases[mask] = ord("N")
    return bytes(bases.tolist())


def as_set(mz):
    return set(zip(mz.key.tolist(), mz.pos.tolist(), mz.strand.tolist()))


class TestHash64:
    def test_invertible_range(self):
        mask = (1 << 30) - 1
        keys = np.arange(10_000, dtype=np.uint64)
        hashed = hash64(keys, mask)
        assert (hashed <= mask).all()
        # injective on a sample (invertible hash)
        assert len(set(hashed.tolist())) == len(keys)

    def test_uint32_equivalence(self):
        # the uint32 restriction used on-device must agree with uint64
        import jax.numpy as jnp

        from lrge_tpu.ops.sketch_jax import hash32

        mask = (1 << 30) - 1
        rng = np.random.default_rng(0)
        keys = rng.integers(0, mask + 1, size=4096, dtype=np.uint64)
        expect = hash64(keys, mask)
        got = np.asarray(hash32(jnp.asarray(keys.astype(np.uint32)), mask))
        assert (got.astype(np.uint64) == expect).all()


class TestScalarVsNumpy:
    @pytest.mark.parametrize("k,w,hpc", [(15, 5, False), (19, 5, True), (15, 10, False)])
    @pytest.mark.parametrize("n", [14, 15, 18, 19, 25, 100, 1000, 5000])
    def test_clean_reads(self, k, w, hpc, n):
        rng = np.random.default_rng(n * 31 + k)
        for _ in range(3):
            codes = encode_seq(random_read(rng, n))
            a = as_set(sketch_scalar(codes, k, w, hpc))
            b = as_set(minimizers_numpy(codes, k, w, hpc))
            assert a == b, f"k={k} w={w} hpc={hpc} n={n}"

    @pytest.mark.parametrize("k,w,hpc", [(15, 5, False), (19, 5, True)])
    def test_reads_with_ns_dispatch(self, k, w, hpc):
        # N-containing reads route to the scalar oracle (sketch_read);
        # the window-cover rule alone would emit a superset near Ns.
        from lrge_tpu.ops.sketch import sketch_read

        rng = np.random.default_rng(99)
        for trial in range(10):
            codes = encode_seq(random_read(rng, 400, n_prob=0.02))
            a = as_set(sketch_scalar(codes, k, w, hpc))
            b = as_set(sketch_read(codes, k, w, hpc))
            assert a == b, f"trial={trial}"

    def test_homopolymer_read(self):
        # tied first-window minima exercise the first-window amendment
        # (minimap2 drops a held minimum displaced by an equal key)
        codes = encode_seq(b"A" * 100)
        a = as_set(sketch_scalar(codes, 15, 5, False))
        b = as_set(minimizers_numpy(codes, 15, 5, False))
        assert a == b

    def test_repeat_prefix_reads(self):
        # tandem repeats in the first window hit the prefix-min tie push
        rng = np.random.default_rng(17)
        for unit_len in (3, 5, 7, 11):
            unit = random_read(rng, unit_len)
            seq = unit * 30 + random_read(rng, 100)
            codes = encode_seq(seq)
            a = as_set(sketch_scalar(codes, 15, 5, False))
            b = as_set(minimizers_numpy(codes, 15, 5, False))
            assert a == b, f"unit_len={unit_len}"

    def test_hpc_compresses_homopolymers(self):
        seq = b"ACCCCGTTTTACGGGGTACGTACGTAAAACCCGGGTTTACGT" * 3
        codes = encode_seq(seq)
        a = as_set(sketch_scalar(codes, 7, 3, True))
        b = as_set(minimizers_numpy(codes, 7, 3, True))
        assert a == b

    def test_density(self):
        # expected minimizer density ~ 2/(w+1)
        rng = np.random.default_rng(5)
        codes = encode_seq(random_read(rng, 20_000))
        mz = minimizers_numpy(codes, 15, 5, False)
        density = len(mz.key) / len(codes)
        assert 0.25 < density < 0.42

    def test_strand_symmetry(self):
        # sketching the reverse complement mirrors positions and flips strand
        rng = np.random.default_rng(11)
        seq = random_read(rng, 500)
        comp = bytes(seq[::-1].translate(bytes.maketrans(b"ACGT", b"TGCA")))
        a = minimizers_numpy(encode_seq(seq), 15, 5, False)
        b = minimizers_numpy(encode_seq(comp), 15, 5, False)
        # canonical hashes are strand-independent: same multiset of keys
        assert sorted(a.key.tolist()) == sorted(b.key.tolist())


class TestJaxSketch:
    @pytest.mark.parametrize("n_prob", [0.0, 0.02])
    def test_matches_oracle(self, n_prob):
        from lrge_tpu.ops.sketch import sketch_read
        from lrge_tpu.ops.sketch_jax import sketch_batch_exact

        rng = np.random.default_rng(123)
        seqs = [random_read(rng, int(n), n_prob) for n in rng.integers(20, 800, size=16)]
        batches = make_batches(seqs, batch_size=16, pad_to=128)
        k, w = 15, 5
        for batch in batches:
            M = batch.codes.shape[1] // 2 + 8
            mhash, mpos, mstrand, mcount = sketch_batch_exact(
                batch.codes, batch.lengths, k=k, w=w, max_minimizers=M
            )
            for row in range(len(batch.lengths)):
                codes = batch.codes[row, : batch.lengths[row]]
                ref = sketch_read(codes, k, w, False)
                cnt = mcount[row]
                got = set(
                    zip(
                        (mhash[row, :cnt].astype(np.uint64) << np.uint64(8)) | np.uint64(k),
                        mpos[row, :cnt].tolist(),
                        mstrand[row, :cnt].tolist(),
                    )
                )
                assert got == as_set(ref), f"row {row}"

    def test_short_reads_and_padding(self):
        import jax.numpy as jnp

        from lrge_tpu.ops.sketch_jax import sketch_batch

        seqs = [b"ACGT" * 3, b"A" * 40, b"ACGTACGTACGTACGTACGTACG"]
        batches = make_batches(seqs, batch_size=4, pad_to=64)
        for batch in batches:
            mhash, mpos, mstrand, mcount = sketch_batch(
                jnp.asarray(batch.codes),
                jnp.asarray(batch.lengths),
                k=15,
                w=5,
                max_minimizers=32,
            )
            mcount = np.asarray(mcount)
            for row, rid in enumerate(batch.ids):
                codes = batch.codes[row, : batch.lengths[row]]
                ref = minimizers_numpy(codes, 15, 5, False)
                assert mcount[row] == len(ref.key)


def test_index_build_device_equals_host():
    from lrge_tpu.ops.index import build_index
    from lrge_tpu.platform import AVA_ONT

    rng = np.random.default_rng(1)
    seqs = []
    for i in range(300):
        n = int(rng.integers(100, 3000))
        s = bytearray(random_read(rng, n, n_prob=0.01 if i % 7 == 0 else 0.0))
        seqs.append(bytes(s))
    names = [b"r%d" % i for i in range(300)]
    a = build_index(seqs, names, AVA_ONT, device="host")
    b = build_index(seqs, names, AVA_ONT, device="device")
    assert (a.keys == b.keys).all()
    assert (a.rid == b.rid).all()
    assert (a.pos == b.pos).all()
    assert (a.strand == b.strand).all()
    assert a.mid_occ == b.mid_occ
