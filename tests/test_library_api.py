"""Library API surface tests (reference: `lib.rs:21-57` doc examples).

The reference documents a builder workflow; our Python equivalent must
support the same spellings, including the ``lrge_tpu.twoset`` /
``lrge_tpu.ava`` namespace aliases.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def reads_file(tmp_path_factory):
    rng = np.random.default_rng(7)
    genome = bytes(rng.choice(list(b"ACGT"), size=80_000).tolist())
    path = tmp_path_factory.mktemp("api") / "reads.fq"
    with open(path, "wb") as fh:
        for i in range(200):
            pos = int(rng.integers(0, len(genome) - 1200))
            seq = genome[pos : pos + 1200]
            fh.write(b"@r%d\n%s\n+\n%s\n" % (i, seq, b"I" * len(seq)))
    return path


def test_twoset_doc_example(reads_file, tmp_path):
    # mirror of the lib.rs / twoset.rs doc example
    from lrge_tpu import Estimate, twoset
    from lrge_tpu.estimate import LOWER_QUANTILE, UPPER_QUANTILE

    strategy = (
        twoset.Builder()
        .target_num_reads(100)
        .query_num_reads(40)
        .threads(2)
        .seed(42)
        .tmpdir(tmp_path)
        .build(reads_file)
    )
    assert isinstance(strategy, Estimate)
    result = strategy.estimate(True, LOWER_QUANTILE, UPPER_QUANTILE)
    assert result.estimate is not None and result.estimate > 0
    assert result.no_mapping_count >= 0


def test_ava_doc_example(reads_file, tmp_path):
    from lrge_tpu import ava
    from lrge_tpu.ava import DEFAULT_AVA_NUM_READS

    assert DEFAULT_AVA_NUM_READS == 25_000
    strategy = (
        ava.Builder().num_reads(100).threads(2).seed(42).tmpdir(tmp_path).build(reads_file)
    )
    result = strategy.estimate(finite=True)
    assert result.estimate is not None and result.estimate > 0


def test_platform_from_str():
    # mirror of the Platform doc example (lib.rs:150-162)
    from lrge_tpu import Platform

    for s in ("pacbio", "pb", "PacBio"):
        assert Platform.from_str(s) is Platform.PACBIO
    for s in ("nanopore", "ont", "ONT"):
        assert Platform.from_str(s) is Platform.NANOPORE
    from lrge_tpu.errors import InvalidPlatformError

    with pytest.raises(InvalidPlatformError):
        Platform.from_str("illumina")


def test_module_constants():
    import lrge_tpu

    assert lrge_tpu.DEFAULT_TARGET_NUM_READS == 10_000
    assert lrge_tpu.DEFAULT_QUERY_NUM_READS == 5_000
    assert lrge_tpu.LOWER_QUANTILE == 0.15
    assert lrge_tpu.UPPER_QUANTILE == 0.65
    assert lrge_tpu.twoset.DEFAULT_TARGET_NUM_READS == 10_000
