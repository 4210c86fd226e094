"""Reproduction of the Rust ``rand`` 0.9 sampling pipeline used by lrge.

The reference subsamples reads with
``StdRng::seed_from_u64(seed)`` + ``rand::seq::index::sample``
(`liblrge/src/lib.rs:189-204`).  For a seeded run to produce a
bit-identical genome-size estimate, we must select the *same* read
indices in the *same order* (order matters: the target set is the last
``target_num_reads`` elements of the sampled vector,
`liblrge/src/twoset.rs:632-652`).

Components reproduced here:

* SplitMix64-based ``seed_from_u64`` (rand_core's default impl): fills
  the 32-byte seed in 4-byte chunks, each chunk being the low 4 bytes of
  a fresh SplitMix64 output.
* ``ChaCha12Rng`` (rand 0.9's ``StdRng``): standard ChaCha block
  function with 12 rounds, 64-bit block counter in words 12-13, stream
  id 0 in words 14-15; ``next_u32`` yields each block's 16 output words
  in order.
* ``Uniform`` integer sampling for ``gen_range`` (Lemire-style widening
  multiply with zone rejection, as in rand's
  ``UniformInt::sample_single_inclusive``).
* ``rand::seq::index::sample``'s algorithm selection between Floyd's
  algorithm, partial Fisher-Yates ("inplace"), and rejection sampling.

NOTE: the exact constants of rand's algorithm-selection heuristic and
the ``sample_single_inclusive`` variant follow rand 0.8/0.9 sources from
memory; they are deliberately isolated here so a later round can adjust
them against ground-truth output from the Rust crate without touching
callers.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

_U64 = np.uint64
_MASK64 = _U64(0xFFFFFFFFFFFFFFFF)


def _splitmix64_stream(state: int, n_words: int) -> list[int]:
    """SplitMix64 outputs (rand_core ``seed_from_u64`` helper)."""
    out = []
    s = state & 0xFFFFFFFFFFFFFFFF
    for _ in range(n_words):
        s = (s + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = s
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        z = z ^ (z >> 31)
        out.append(z)
    return out


def seed_from_u64(seed: int) -> bytes:
    """rand_core's default ``seed_from_u64``: 32 bytes, 4-byte chunks."""
    words = _splitmix64_stream(seed, 8)
    return b"".join(int(w & 0xFFFFFFFF).to_bytes(4, "little") for w in words)


def _chacha_rounds(state: np.ndarray, n_rounds: int) -> np.ndarray:
    """Run the ChaCha double-rounds on a (16,) uint32 state copy."""
    x = state.copy()

    def qr(a, b, c, d):
        x[a] = x[a] + x[b]
        x[d] = np.bitwise_xor(x[d], x[a])
        x[d] = (x[d] << np.uint32(16)) | (x[d] >> np.uint32(16))
        x[c] = x[c] + x[d]
        x[b] = np.bitwise_xor(x[b], x[c])
        x[b] = (x[b] << np.uint32(12)) | (x[b] >> np.uint32(20))
        x[a] = x[a] + x[b]
        x[d] = np.bitwise_xor(x[d], x[a])
        x[d] = (x[d] << np.uint32(8)) | (x[d] >> np.uint32(24))
        x[c] = x[c] + x[d]
        x[b] = np.bitwise_xor(x[b], x[c])
        x[b] = (x[b] << np.uint32(7)) | (x[b] >> np.uint32(25))

    for _ in range(n_rounds // 2):
        # column round
        qr(0, 4, 8, 12)
        qr(1, 5, 9, 13)
        qr(2, 6, 10, 14)
        qr(3, 7, 11, 15)
        # diagonal round
        qr(0, 5, 10, 15)
        qr(1, 6, 11, 12)
        qr(2, 7, 8, 13)
        qr(3, 4, 9, 14)
    return x + state


class ChaCha12Rng:
    """``rand_chacha::ChaCha12Rng`` equivalent (rand 0.9's StdRng core)."""

    ROUNDS = 12

    def __init__(self, seed32: bytes):
        if len(seed32) != 32:
            raise ValueError("ChaCha12Rng seed must be 32 bytes")
        consts = np.frombuffer(b"expand 32-byte k", dtype="<u4").astype(np.uint32)
        key = np.frombuffer(seed32, dtype="<u4").astype(np.uint32)
        self._key = key
        self._consts = consts
        self._counter = 0  # 64-bit block counter
        self._buf: np.ndarray = np.empty(0, dtype=np.uint32)
        self._buf_pos = 0

    @classmethod
    def seed_from_u64(cls, seed: int) -> "ChaCha12Rng":
        return cls(seed_from_u64(seed))

    def _refill(self, n_blocks: int = 16) -> None:
        with np.errstate(over="ignore"):
            blocks = []
            for _ in range(n_blocks):
                state = np.empty(16, dtype=np.uint32)
                state[0:4] = self._consts
                state[4:12] = self._key
                state[12] = np.uint32(self._counter & 0xFFFFFFFF)
                state[13] = np.uint32((self._counter >> 32) & 0xFFFFFFFF)
                state[14] = np.uint32(0)  # stream id (64-bit, words 14-15)
                state[15] = np.uint32(0)
                blocks.append(_chacha_rounds(state, self.ROUNDS))
                self._counter += 1
            leftover = self._buf[self._buf_pos :]
            self._buf = np.concatenate([leftover] + blocks)
            self._buf_pos = 0

    def next_u32(self) -> int:
        if self._buf_pos >= len(self._buf):
            self._refill()
        v = int(self._buf[self._buf_pos])
        self._buf_pos += 1
        return v

    def next_u64(self) -> int:
        lo = self.next_u32()
        hi = self.next_u32()
        return lo | (hi << 32)

    # ---- rand::distr::Uniform (integers) ----

    def gen_range_u32_inclusive(self, low: int, high: int) -> int:
        """``UniformInt::<u32>::sample_single_inclusive(low, high)``.

        Lemire-style: widening multiply of a fresh u32 by ``range`` with
        rejection zone ``(range << range.leading_zeros()) - 1``.
        """
        assert low <= high
        rng_span = (high - low + 1) & 0xFFFFFFFF
        if rng_span == 0:  # full range
            return self.next_u32()
        lz = 32 - rng_span.bit_length()
        zone = ((rng_span << lz) - 1) & 0xFFFFFFFF
        while True:
            v = self.next_u32()
            m = v * rng_span  # 64-bit product
            hi, lo = m >> 32, m & 0xFFFFFFFF
            if lo <= zone:
                return (low + hi) & 0xFFFFFFFF

    def gen_range_u32(self, low: int, high_exclusive: int) -> int:
        return self.gen_range_u32_inclusive(low, high_exclusive - 1)


# ---- rand::seq::index::sample ----


def _sample_floyd(rng: ChaCha12Rng, length: int, amount: int) -> List[int]:
    """Floyd's combination algorithm with the in-order amendment.

    Matches rand's ``sample_floyd``: for ``j in length-amount..length``
    draw ``t in 0..=j``; on collision, replace the earlier ``t`` with
    ``j`` and push ``t`` (this yields a uniformly shuffled result).
    """
    indices: List[int] = []
    for j in range(length - amount, length):
        t = rng.gen_range_u32_inclusive(0, j)
        pos = None
        for idx, x in enumerate(indices):
            if x == t:
                pos = idx
                break
        if pos is not None:
            indices[pos] = j
            indices.append(t)
        else:
            indices.append(t)
    return indices


def _sample_inplace(rng: ChaCha12Rng, length: int, amount: int) -> List[int]:
    """Partial Fisher-Yates ("inplace"): swap prefix with random tail."""
    indices = np.arange(length, dtype=np.uint32)
    for i in range(amount):
        j = rng.gen_range_u32(i, length)
        indices[i], indices[j] = indices[j], indices[i]
    return [int(x) for x in indices[:amount]]


def _sample_rejection(rng: ChaCha12Rng, length: int, amount: int) -> List[int]:
    """Rejection sampling against a hash set, preserving draw order."""
    cache = set()
    indices: List[int] = []
    for _ in range(amount):
        while True:
            t = rng.gen_range_u32(0, length)
            if t not in cache:
                cache.add(t)
                indices.append(t)
                break
    return indices


def sample_indices(rng: ChaCha12Rng, length: int, amount: int) -> List[int]:
    """``rand::seq::index::sample`` algorithm selection (u32 branch).

    Heuristic constants follow rand's documented tradeoff analysis
    (rust-random/rand#479): Floyd's for small ``amount``, partial
    Fisher-Yates when ``amount`` is a sizable fraction of ``length``,
    rejection sampling otherwise.
    """
    if amount > length:
        raise ValueError("Cannot sample more than the total number of items")
    if amount < 163:
        # C[0] = tradeoff constants for floyd vs inplace
        c = [1.6, 8.0 / 45.0]
        j = 0 if length < 500_000 else 1
        if float(length) < c[j] * float(amount):
            return _sample_inplace(rng, length, amount)
        return _sample_floyd(rng, length, amount)
    else:
        c = [270.0, 330.0 / 9.0]
        j = 0 if length < 500_000 else 1
        if float(length) < c[j] * float(amount):
            return _sample_inplace(rng, length, amount)
        return _sample_rejection(rng, length, amount)


def unique_random_set(k: int, n: int, seed: Optional[int]) -> List[int]:
    """`liblrge/src/lib.rs:189-204`: k unique indices in [0, n).

    With a seed, uses the reproduced StdRng; without, uses OS entropy
    (order/selection then need not match any particular reference run).
    """
    if k > n:
        raise ValueError(f"Cannot generate {k} unique values from a range of 0 to {n}")
    if seed is not None:
        rng = ChaCha12Rng.seed_from_u64(seed)
    else:
        import secrets

        rng = ChaCha12Rng(secrets.token_bytes(32))
    return sample_indices(rng, n, k)


def split_into_sets(indices: List[int], size_first: int) -> Tuple[set, set]:
    """`twoset.rs:632-652`: pop from the END into set1, rest into set2.

    set1 (the target set) gets the *last* ``size_first`` elements of the
    sampled vector; set2 (the query set) gets the remainder.
    """
    n1 = min(size_first, len(indices))
    first = set(indices[len(indices) - n1 :])
    second = set(indices[: len(indices) - n1])
    return first, second
