"""Timing on the reference's own fixture (toy.bam, 500 real ONT reads).

The synthetic bench (bench.py) measures steady-state mapping
throughput; this probe answers "how long does the whole CLI take on
the corpus the reference tests with" — the closest available analogue
of BASELINE.md's published run (SRR28370649 is not in this image).

Usage: python tools/bench_fixture.py [engine]   # engine: host|device
"""

import subprocess
import sys
import time

TOY = "/root/reference/lrge/tests/data/toy.bam"


def run(engine):
    args = [
        sys.executable, "-m", "lrge_tpu", TOY,
        "-T", "250", "-Q", "250", "--seed", "1", "-qqq",
    ]
    if engine == "device":
        args += ["--engine", "device"]
    t0 = time.perf_counter()
    out = subprocess.run(args, capture_output=True, text=True)
    dt = time.perf_counter() - t0
    est = out.stdout.strip()
    print(f"{engine}: {dt:.2f}s estimate={est} rc={out.returncode}", file=sys.stderr)
    return est


if __name__ == "__main__":
    engines = sys.argv[1:] or ["host"]
    ests = [run(e) for e in engines]
    if len(set(ests)) > 1:
        print(f"MISMATCH: {ests}", file=sys.stderr)
        sys.exit(1)
