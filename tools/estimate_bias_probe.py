"""Why does the bench estimate sit ~6% above the synthetic truth?

The bench corpus (gamma(3, mean/3) lengths clipped to [500, 30k],
substitution rate 5%, engineered repeat families) produces a stable
+6.27% genome-size estimate across rounds, with device==host counts
verified in-bench — so the bias belongs to the estimator-vs-corpus
combination, not to the device pipeline.  This probe isolates the
cause by sweeping one factor at a time on the exact host engine
(CPU backend, small corpus):

  err sweep   0%% / 2%% / 5%% substitutions, same lengths
  len sweep   fixed-2500 vs clipped-gamma lengths, same 5%% error

Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/estimate_bias_probe.py
"""
import sys

import numpy as np

sys.argv = ["bench"]
import bench as BN
from lrge_tpu.engine import OverlapEngine
from lrge_tpu.estimate import median, per_read_estimate_batch
from lrge_tpu.ops.index import build_index
from lrge_tpu.platform import Platform, preset_for


def run(tag, genome, targets, queries, genome_size):
    params = preset_for(Platform.NANOPORE, dual=True)
    tnames = [b"t%d" % i for i in range(len(targets))]
    qnames = [b"q%d" % i for i in range(len(queries))]
    index = build_index(targets, tnames, params)
    eng = OverlapEngine(index)
    counts = np.array(
        [c for c, _ in eng.count_overlaps_many(list(zip(qnames, queries)))]
    )
    avg_t = np.float32(sum(len(s) for s in targets)) / np.float32(len(targets))
    ests = per_read_estimate_batch(
        np.array([len(q) for q in queries]), float(avg_t), len(targets),
        counts, params.min_chain_score,
    )
    _, est, _ = median(ests[np.isfinite(ests)])
    err = (est - genome_size) / genome_size * 100.0
    zero = int((counts == 0).sum())
    print(
        f"{tag:<34} est={est:>10.0f}  err={err:+6.2f}%  "
        f"median_count={np.median(counts):.0f} zero={zero}/{len(queries)}",
        flush=True,
    )


def fixed_len_reads(rng, genome, n, L, err):
    g = np.frombuffer(genome, dtype=np.uint8)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    rc = bytes.maketrans(b"ACGT", b"TGCA")
    reads = []
    for _ in range(n):
        pos = int(rng.integers(0, len(genome) - L))
        arr = g[pos : pos + L].copy()
        ne = rng.binomial(L, err)
        if ne:
            arr[rng.integers(0, L, size=ne)] = bases[rng.integers(0, 4, size=ne)]
        s = arr.tobytes()
        if rng.integers(0, 2):
            s = s.translate(rc)[::-1]
        reads.append(s)
    return reads


def main():
    genome_size = 1_100_000
    n_t, n_q = 2500, 800
    rng = np.random.default_rng(6)
    g = np.frombuffer(
        rng.integers(0, 4, size=genome_size, dtype=np.uint8), dtype=np.uint8
    )
    genome = bytes(np.frombuffer(b"ACGT", dtype=np.uint8)[g].tobytes())

    for err in (0.0, 0.02, 0.05):
        rng = np.random.default_rng(7)
        targets = BN.make_reads(rng, genome, n_t, 2500, err)
        queries = BN.make_reads(rng, genome, n_q, 2500, err)
        run(f"gamma lengths, err={err:.0%}", genome, targets, queries, genome_size)

    for err in (0.0, 0.05):
        rng = np.random.default_rng(7)
        targets = fixed_len_reads(rng, genome, n_t, 2500, err)
        queries = fixed_len_reads(rng, genome, n_q, 2500, err)
        run(f"fixed 2500 bp, err={err:.0%}", genome, targets, queries, genome_size)


if __name__ == "__main__":
    main()
