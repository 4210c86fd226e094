"""Device-only knob sweep on the live chip.

Sweeps (anchors, batch, super) program shapes over the bench corpus
with host-share off, printing q/s per configuration — run after any
hot-path change to re-pick defaults (each config pays its own remote
compile, so the list is short and ordered most-promising-first).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/tune_sweep.py
"""
import os
import sys
import time

import numpy as np

sys.argv = ["bench"]
os.environ["LRGE_HOST_SHARE"] = "0"

import bench as BN
from lrge_tpu.platform import Platform, preset_for
from lrge_tpu.ops.index import build_index


def main():
    rng = np.random.default_rng(6)
    genome_size = 4_400_000
    g = np.frombuffer(
        rng.integers(0, 4, size=genome_size, dtype=np.uint8), dtype=np.uint8
    )
    genome = bytes(np.frombuffer(b"ACGT", dtype=np.uint8)[g].tobytes())
    targets = BN.make_reads(rng, genome, 10_000, 2500, 0.05)
    queries = BN.make_reads(rng, genome, 5_000, 2500, 0.05)
    tnames = [b"t%d" % i for i in range(10_000)]
    qnames = [b"q%d" % i for i in range(5_000)]
    params = preset_for(Platform.NANOPORE, dual=True)
    index = build_index(targets, tnames, params)

    configs = [
        # (anchors, batch, super)
        (4096, 128, 8),   # current default
        (4096, 128, 16),  # fewer dispatches
        (3072, 128, 8),   # leaner gathers, p95-ish anchor cap
        (4096, 256, 8),   # bigger batches
        (3072, 256, 8),
    ]
    from lrge_tpu.device_engine import DeviceOverlapEngine

    for A, B, SUP in configs:
        eng = DeviceOverlapEngine(
            index, batch_size=B, num_anchors=A, window=32, super_batch=SUP
        )
        t0 = time.perf_counter()
        eng.warmup([len(q) for q in queries])
        t_w = time.perf_counter() - t0
        times = []
        res = None
        for _ in range(3):
            t0 = time.perf_counter()
            res = eng.count_batch(qnames, queries)
            times.append(time.perf_counter() - t0)
        print(
            f"A={A} B={B} SUP={SUP}: warm={t_w:.1f}s "
            f"best={min(times):.2f}s ({len(queries)/min(times):.0f} q/s) "
            f"med={np.median(times):.2f}s fallback={res.fallback_rows}",
            file=sys.stderr, flush=True,
        )


if __name__ == "__main__":
    main()
