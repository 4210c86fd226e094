"""Tune (batch, super, window, buckets) of the device engine on-chip.

Builds the bench corpus (with repeat families) ONCE, then times
``count_batch`` for each config given as CLI args like
``B=256,SUPER=4,WINDOW=64,BUCKET=4096``.  Results to stderr.
"""
import os, sys, time
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench as BM
from lrge_tpu.ops.index import build_index
from lrge_tpu.platform import Platform, preset_for

rng = np.random.default_rng(6)
genome_size = 4_400_000
genome = np.frombuffer(rng.integers(0, 4, size=genome_size, dtype=np.uint8), dtype=np.uint8)
genome = bytearray(np.frombuffer(b"ACGT", dtype=np.uint8)[genome].tobytes())
fam = bytes(genome[100_000:102_000])
for c in range(5):
    pos = 500_000 + c * 700_000
    genome[pos : pos + 2_000] = fam
unit = bytes(genome[200_000:200_400])
genome[300_000:302_000] = unit * 5
genome = bytes(genome)

targets = BM.make_reads(rng, genome, 10_000, 2500, 0.05)
tnames = [b"t%d" % i for i in range(10_000)]
params = preset_for(Platform.NANOPORE, dual=True)
t0 = time.perf_counter()
index = build_index(targets, tnames, params)
print(f"index: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

NQ = int(os.environ.get("TUNE_NQ", 2048))
queries = BM.make_reads(rng, genome, NQ, 2500, 0.05)
qnames = [b"q%d" % i for i in range(NQ)]

configs = sys.argv[1:] or ["B=128,SUPER=8"]
baseline_counts = None
for cfg in configs:
    # BUCKET lists use "+" separators inside a config ("BUCKET=2048+4096")
    kv = dict(item.split("=") for item in cfg.split(","))
    if "BUCKET" in kv:
        kv["BUCKET"] = kv["BUCKET"].replace("+", ",")
    for env in ("LRGE_DEVICE_BATCH", "LRGE_DEVICE_SUPER", "LRGE_DEVICE_WINDOW",
                "LRGE_DEVICE_ANCHORS", "LRGE_DEVICE_BUCKET", "LRGE_SUP_VMAP",
                "LRGE_HOST_SHARE", "LRGE_DP_CHUNK", "LRGE_NO_FLAT",
                "LRGE_NO_FUSED"):
        os.environ.pop(env, None)
    if "DPC" in kv:
        os.environ["LRGE_DP_CHUNK"] = kv["DPC"]
    if kv.get("FLAT") == "0":
        os.environ["LRGE_NO_FLAT"] = "1"
    if kv.get("FUSED") == "0":
        os.environ["LRGE_NO_FUSED"] = "1"
    if "VMAP" in kv:
        os.environ["LRGE_SUP_VMAP"] = kv["VMAP"]
    if "SHARE" in kv:
        os.environ["LRGE_HOST_SHARE"] = kv["SHARE"]
    if "B" in kv:
        os.environ["LRGE_DEVICE_BATCH"] = kv["B"]
    if "SUPER" in kv:
        os.environ["LRGE_DEVICE_SUPER"] = kv["SUPER"]
    if "WINDOW" in kv:
        os.environ["LRGE_DEVICE_WINDOW"] = kv["WINDOW"]
    if "ANCHORS" in kv:
        os.environ["LRGE_DEVICE_ANCHORS"] = kv["ANCHORS"]
    if "BUCKET" in kv:
        os.environ["LRGE_DEVICE_BUCKET"] = kv["BUCKET"]
    from lrge_tpu.device_engine import DeviceOverlapEngine

    eng = DeviceOverlapEngine(index)
    t0 = time.perf_counter()
    eng.warmup(lengths=[len(q) for q in queries])
    t_w = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = eng.count_batch(qnames, queries)
    t_map = time.perf_counter() - t0
    ph = {k: round(v, 2) for k, v in getattr(eng, "last_phases", {}).items()}
    print(
        f"{cfg}: warmup={t_w:.1f}s map={t_map:.2f}s ({NQ/t_map:.0f} q/s) "
        f"fallback={res.fallback_rows} {dict(eng.fallback_triggers)} phases={ph}",
        file=sys.stderr,
    )
    if baseline_counts is None:
        baseline_counts = res.counts.copy()
    else:
        same = np.array_equal(baseline_counts, res.counts)
        print(f"  counts match first config: {same}", file=sys.stderr)
