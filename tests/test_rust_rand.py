"""Tests for the Rust rand-0.9 compatibility layer."""

import numpy as np
import pytest

from lrge_tpu.compat.rust_rand import (
    ChaCha12Rng,
    UniformU32,
    _chacha_rounds,
    _splitmix64_stream,
    sample_indices,
    split_into_sets,
    unique_random_set,
)


def test_stdrng_value_stability():
    # rand's rngs/std.rs test_stdrng_construction value-stability target:
    # StdRng::from_seed([1,0,0,0, 23,0,0,0, 200,1,0,0, 210,30,0,0, 0*16])
    # .next_u64() == 10719222850664546238.  Validates the ChaCha12 core,
    # the from_seed key layout, and BlockRng's (lo, hi) u64 word order.
    seed = bytes([1, 0, 0, 0, 23, 0, 0, 0, 200, 1, 0, 0, 210, 30, 0, 0] + [0] * 16)
    rng = ChaCha12Rng(seed)
    assert rng.next_u64() == 10719222850664546238


def test_splitmix64_known_vectors():
    # Canonical SplitMix64 outputs for seed 0 (Vigna's reference impl);
    # rand_core 0.9's seed_from_u64 keys ChaCha with the low 32 bits of
    # each output.
    out = _splitmix64_stream(0, 3)
    assert out[0] == 0xE220A8397B1DCDAF
    assert out[1] == 0x6E789E6AA1B965F4
    assert out[2] == 0x06C45D188009454F


def test_chacha20_rfc8439_block():
    # RFC 8439 §2.3.2: key 00..1f, counter=1, nonce 000000090000004a00000000.
    # Validates the round function + final addition with 20 rounds.
    state = np.zeros(16, dtype=np.uint32)
    state[0:4] = np.frombuffer(b"expand 32-byte k", dtype="<u4")
    key = bytes(range(32))
    state[4:12] = np.frombuffer(key, dtype="<u4")
    state[12] = 1
    state[13] = 0x09000000
    state[14] = 0x4A000000
    state[15] = 0x00000000
    with np.errstate(over="ignore"):
        out = _chacha_rounds(state, 20)
    expected = np.array(
        [
            0xE4E7F110, 0x15593BD1, 0x1FDD0F50, 0xC47120A3,
            0xC7F4D1C7, 0x0368C033, 0x9AAA2204, 0x4E6CD4C3,
            0x466482D2, 0x09AA9F07, 0x05D7C214, 0xA2028BD9,
            0xD19C12B5, 0xB94E16DE, 0xE883D0CB, 0x4E3C50A2,
        ],
        dtype=np.uint32,
    )
    assert (out == expected).all()


def test_rng_deterministic():
    a = ChaCha12Rng.seed_from_u64(42)
    b = ChaCha12Rng.seed_from_u64(42)
    seq_a = [a.next_u32() for _ in range(100)]
    seq_b = [b.next_u32() for _ in range(100)]
    assert seq_a == seq_b
    c = ChaCha12Rng.seed_from_u64(43)
    assert [c.next_u32() for _ in range(100)] != seq_a


def test_gen_range_bounds():
    rng = ChaCha12Rng.seed_from_u64(7)
    for _ in range(1000):
        v = rng.gen_range_u32_inclusive(3, 17)
        assert 3 <= v <= 17


class TestUniqueRandomSet:
    # Mirrors liblrge/src/lib.rs:206-265
    def test_basic_functionality(self):
        for trial in range(50):
            result = unique_random_set(5, 100, None)
            assert len(result) == 5
            assert all(0 <= x < 100 for x in result)
            assert len(set(result)) == 5

    def test_with_seed(self):
        r1 = unique_random_set(5, 1_000_000, 42)
        r2 = unique_random_set(5, 1_000_000, 42)
        assert r1 == r2

    def test_without_seed(self):
        r1 = unique_random_set(5, 10_000_000, None)
        r2 = unique_random_set(5, 10_000_000, None)
        assert r1 != r2

    def test_k_greater_than_n_panics(self):
        with pytest.raises(ValueError, match="Cannot generate"):
            unique_random_set(10, 5, None)

    def test_large_inplace_path(self):
        # amount >= 163 and length < 270*amount -> partial Fisher-Yates
        result = unique_random_set(200, 1000, 6)
        assert len(result) == 200
        assert len(set(result)) == 200

    def test_rejection_path(self):
        # amount >= 163 and length >= 270*amount -> rejection
        result = unique_random_set(163, 163 * 300, 6)
        assert len(result) == 163
        assert len(set(result)) == 163


class TestSplitIntoSets:
    # Mirrors twoset.rs:654-702
    def test_basic_split(self):
        s1, s2 = split_into_sets([1, 2, 3, 4, 5], 3)
        assert len(s1) == 3 and len(s2) == 2
        # pop-from-end semantics: set1 holds the LAST 3 elements
        assert s1 == {3, 4, 5} and s2 == {1, 2}

    def test_all_in_set1(self):
        s1, s2 = split_into_sets([1, 2, 3], 5)
        assert len(s1) == 3 and len(s2) == 0

    def test_all_in_set2(self):
        s1, s2 = split_into_sets([1, 2, 3], 0)
        assert len(s1) == 0 and len(s2) == 3

    def test_no_elements_lost(self):
        orig = [1, 2, 3, 4]
        s1, s2 = split_into_sets(orig, 2)
        assert s1 | s2 == set(orig)


def test_sample_toy_bam_selects_inplace():
    # toy.bam config: length=500, amount=15 (T=10 + Q=5, alignment.rs:52-68).
    # Cost model: amount>11 and 500 < (10 + 1.6*15)*15 = 510 -> sample_inplace.
    rng = ChaCha12Rng.seed_from_u64(6)
    idx = sample_indices(rng, 500, 15)
    assert len(idx) == 15
    assert len(set(idx)) == 15
    assert all(0 <= x < 500 for x in idx)
    # must match a direct partial Fisher-Yates with the same stream
    from lrge_tpu.compat.rust_rand import _sample_inplace

    rng2 = ChaCha12Rng.seed_from_u64(6)
    assert idx == _sample_inplace(rng2, 500, 15)


def test_sample_small_amount_floyd_shortcut():
    # amount <= 11 always takes Floyd's regardless of length
    from lrge_tpu.compat.rust_rand import _sample_floyd

    rng = ChaCha12Rng.seed_from_u64(6)
    idx = sample_indices(rng, 20, 11)
    rng2 = ChaCha12Rng.seed_from_u64(6)
    assert idx == _sample_floyd(rng2, 20, 11)


def test_uniform_distribution_bounds():
    d = UniformU32(0, 500)
    rng = ChaCha12Rng.seed_from_u64(3)
    vals = [d.sample(rng) for _ in range(200)]
    assert all(0 <= v < 500 for v in vals)


def test_canon_consumes_one_u64_for_small_ranges():
    # For tiny ranges the refinement branch (prob ~range/2^64) never
    # fires, so each draw consumes exactly two u32 words.
    rng = ChaCha12Rng.seed_from_u64(11)
    rng.gen_range_u32_inclusive(0, 499)
    ref = ChaCha12Rng.seed_from_u64(11)
    ref.next_u64()
    assert rng.next_u32() == ref.next_u32()
