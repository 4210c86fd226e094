"""Randomized host-vs-device differential fuzz (CPU backend).

Generates corpora across seeds with hostile features mixed in —
ambiguous bases, homopolymer stretches, tandem/dispersed repeats,
tiny/huge reads, duplicate names skipped by build — and asserts the
device engine's counts equal the exact host engine's for every row,
across presets and filter modes.  Not part of CI (minutes); run after
hot-path changes: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
  python tools/fuzz_diff.py [n_rounds]
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("LRGE_DEVICE_MIN_ROWS", "0")
os.environ.setdefault("LRGE_DEVICE_BUCKET", "1024,2048")
os.environ.setdefault("LRGE_DEVICE_BATCH", "16")
os.environ.setdefault("LRGE_DEVICE_ANCHORS", "1024")
os.environ.setdefault("LRGE_DEVICE_SUPER", "2")

import numpy as np


def corpus(rng, n_t, n_q, G=60_000):
    g = np.frombuffer(rng.integers(0, 4, size=G, dtype=np.uint8), dtype=np.uint8)
    genome = bytearray(np.frombuffer(b"ACGT", dtype=np.uint8)[g].tobytes())
    # repeats: dispersed family + tandem block + homopolymer stretch
    fam = bytes(genome[1000:1600])
    for c in range(3):
        p = 10_000 + c * 15_000
        genome[p : p + 600] = fam
    genome[30_000:30_800] = bytes(genome[5_000:5_200]) * 4
    genome[40_000:40_300] = b"A" * 300
    genome = bytes(genome)
    gg = np.frombuffer(genome, np.uint8)
    bases = np.frombuffer(b"ACGT", np.uint8)
    rc = bytes.maketrans(b"ACGT", b"TGCA")

    def reads(n):
        out = []
        for _ in range(n):
            L = int(np.clip(rng.gamma(3, 300), 120, 1900))
            p = int(rng.integers(0, G - L))
            arr = gg[p : p + L].copy()
            ne = rng.binomial(L, 0.06)
            if ne:
                arr[rng.integers(0, L, size=ne)] = bases[rng.integers(0, 4, size=ne)]
            s = arr.tobytes()
            if rng.random() < 0.08:  # sprinkle Ns (sketch-quirk fallback)
                s = bytearray(s)
                for _ in range(rng.integers(1, 4)):
                    s[int(rng.integers(0, len(s)))] = ord("N")
                s = bytes(s)
            if rng.integers(0, 2):
                s = s.translate(rc)[::-1]
            out.append(s)
        return out

    return reads(n_t), reads(n_q)


def main():
    from lrge_tpu.device_engine import DeviceOverlapEngine
    from lrge_tpu.ops.index import build_index
    from lrge_tpu.platform import Platform, preset_for

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    for r in range(rounds):
        rng = np.random.default_rng(1000 + r)
        plat = Platform.PACBIO if r % 3 == 2 else Platform.NANOPORE
        n_t, n_q = 60, 40
        targets, queries = corpus(rng, n_t, n_q)
        tnames = [b"t%d" % i for i in range(n_t)]
        qnames = [b"q%d" % i for i in range(n_q)]
        params = preset_for(plat, dual=True)
        index = build_index(targets, tnames, params)
        dev = DeviceOverlapEngine(index)
        host_counts = [
            c for c, _ in dev.host.count_overlaps_many(list(zip(qnames, queries)))
        ]

        res = dev.count_batch(qnames, queries)
        assert np.array_equal(res.counts, host_counts), (
            r, plat, np.argwhere(res.counts != np.array(host_counts))[:5],
        )

        # pair mode (ava machinery): per-row rid sets must match host names
        if plat is Platform.NANOPORE:
            pairs = {}
            res2 = dev.count_batch(qnames, queries, collect_pairs=pairs)
            assert np.array_equal(res2.counts, host_counts)
            for qi in range(n_q):
                if qi in pairs:
                    assert len(set(pairs[qi].tolist())) == host_counts[qi], (r, qi)

            # -F filter mode, device vs host-filtered
            if dev.supports_device_filter():
                resf = dev.count_batch(qnames, queries, filter_ratio=0.2)
                want = dev._host_count_filtered(
                    list(zip(qnames, queries)), 0.2
                )
                assert np.array_equal(resf.counts, [w[0] for w in want]), r
        print(f"round {r} ({plat.name}): ok "
              f"(fallback {res.fallback_rows}/{n_q})", flush=True)


if __name__ == "__main__":
    main()
