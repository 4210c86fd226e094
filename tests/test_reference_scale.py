"""Reference-scale real-read oracle (VERDICT r4 item 5).

The reference's published configuration is T=10,000 / Q=5,000 on a real
ONT read set (`README.md:147-157`); every other oracle in this suite
runs at toy scale (T<=50).  This test builds a 15,000-read corpus by
resampling toy.bam's 500 real ONT reads (1,272,286 bases,
`alignment.rs:52-68`), runs the full two-set pipeline at the published
configuration, and pins the estimate host == device (and against a
recorded value as a drift tripwire).

Gated behind LRGE_RUN_SLOW=1 (several minutes on the 2-core CPU
backend); the scheduled CI workflow and tools/bench-side runs set it.
"""

import os
from pathlib import Path

import pytest

from lrge_tpu.cli import main
from lrge_tpu.io import iter_records

TOY_BAM = Path("/root/reference/lrge/tests/data/toy.bam")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not TOY_BAM.exists(), reason="reference toy.bam fixture not present"
    ),
    pytest.mark.skipif(
        os.environ.get("LRGE_RUN_SLOW") != "1",
        reason="reference-scale run is slow; set LRGE_RUN_SLOW=1",
    ),
]

# Pinned by this implementation's host engine (PARITY.md §Environment:
# no Rust toolchain exists in-image to cross-run the reference); the
# value is a drift tripwire between rounds, and host==device is the
# real assertion.  NOTE the value is NOT a genome-size accuracy claim:
# the corpus duplicates each real read ~30x, which inflates per-read
# overlap counts and deflates the estimate correspondingly — what this
# run pins is the pipeline's numerics at the published T/Q scale.
PINNED = "1361055"


def _write_corpus(path, n_reads=15_000):
    reads = list(iter_records(TOY_BAM))
    with open(path, "wb") as fh:
        for i in range(n_reads):
            nm, sq = reads[i % len(reads)]
            fh.write(b"@rs%d %s\n%s\n+\n%s\n" % (i, nm, sq, b"I" * len(sq)))


def test_reference_scale_host_equals_device(tmp_path):
    fq = tmp_path / "corpus.fq"
    _write_corpus(fq)
    args = [str(fq), "-T", "10000", "-Q", "5000", "--seed", "6", "-qqq"]
    out_h = tmp_path / "host.txt"
    rc = main(args + ["--engine", "host", "-o", str(out_h)])
    assert rc == 0
    got = out_h.read_text().strip()
    assert got == PINNED, f"host estimate drifted: {got} != {PINNED}"
    out_d = tmp_path / "dev.txt"
    rc = main(args + ["--engine", "device", "-o", str(out_d)])
    assert rc == 0
    assert out_d.read_text().strip() == got
