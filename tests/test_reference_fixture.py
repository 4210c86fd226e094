"""Integration tests on the reference's real fixture.

Mirrors `lrge/tests/alignment.rs:52-68` (`test_toy_bam_input`): run the
full pipeline on `toy.bam` (500 real ONT reads, 1,272,286 bases) with
``-T 10 -Q 5 --seed 6`` and assert success.  We additionally pin the
exact estimate so silent numeric drift between rounds is caught
(SURVEY §4 "exact-value oracles").
"""

import os
from pathlib import Path

import pytest

from lrge_tpu.cli import main

TOY_BAM = Path("/root/reference/lrge/tests/data/toy.bam")

pytestmark = pytest.mark.skipif(
    not TOY_BAM.exists(), reason="reference toy.bam fixture not present"
)


def test_toy_bam_seed6_succeeds(tmp_path, capsys):
    # The reference integration test's exact configuration.
    out = tmp_path / "size.txt"
    rc = main([str(TOY_BAM), "-T", "10", "-Q", "5", "--seed", "6", "-o", str(out), "-qqq"])
    assert rc == 0
    # Exact-value oracle: seed-6 subset has exactly one overlapping query
    # (chain score 527 vs threshold 100); median of finite estimates is
    # that single per-read value.
    assert out.read_text().strip() == "36575"


def test_toy_bam_seed6_deterministic(tmp_path):
    o1, o2 = tmp_path / "a", tmp_path / "b"
    assert main([str(TOY_BAM), "-T", "10", "-Q", "5", "-s", "6", "-o", str(o1), "-qqq"]) == 0
    assert main([str(TOY_BAM), "-T", "10", "-Q", "5", "-s", "6", "-o", str(o2), "-qqq"]) == 0
    assert o1.read_text() == o2.read_text()


def test_toy_bam_larger_sample_oracle(tmp_path):
    # A denser configuration exercising many queries; exact value pinned
    # as a drift tripwire (50 targets / 25 queries, seed 1).
    out = tmp_path / "size.txt"
    rc = main([str(TOY_BAM), "-T", "50", "-Q", "25", "--seed", "1", "-o", str(out), "-qqq"])
    assert rc == 0
    assert out.read_text().strip() == "72381"


def test_toy_bam_ava_oracle(tmp_path):
    # All-vs-all strategy on the reference fixture; exact value pinned
    # as a drift tripwire (60 reads, seed 3).
    out = tmp_path / "size.txt"
    rc = main([str(TOY_BAM), "-n", "60", "--seed", "3", "-o", str(out), "-qqq"])
    assert rc == 0
    assert out.read_text().strip() == "134408"
