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


# ---------------------------------------------------------------------------
# Oracle matrix (VERDICT r2 item 7): every CLI mode the reference's
# alignment.rs family touches, pinned on toy.bam at multiple seeds with
# the host engine, and device==host asserted wherever the device engine
# applies.  Values were produced by this implementation's host engine
# (no Rust toolchain exists here to cross-run; PARITY.md §Environment)
# and serve as drift tripwires between rounds.
# ---------------------------------------------------------------------------

MATRIX = [
    # (args, pinned stdout)
    (["-T", "50", "-Q", "25", "-s", "6", "-P", "pb"], "100068"),
    (["-T", "50", "-Q", "25", "-s", "2", "-P", "pb"], "141136"),
    (["-T", "50", "-Q", "25", "-s", "1", "-F"], "213219"),
    (["-T", "50", "-Q", "25", "-s", "4", "-F"], "218360"),
    (["-T", "50", "-Q", "25", "-s", "1", "--use-min-ref"], "72381"),
    (["-T", "50", "-Q", "25", "-s", "7", "--use-min-ref"], "60835"),
    # -8 at this subsample hits the reference's NaN corner (median
    # interpolates between two infinite estimates with frac == 0:
    # inf*1 + inf*0 = NaN in f32, printed "NaN" by Rust's formatter)
    (["-T", "50", "-Q", "25", "-s", "1", "-8"], "NaN"),
    (["-n", "80", "-s", "5"], "306359"),
    (["-n", "60", "-s", "3", "-P", "pb"], "51119"),
    (["-T", "50", "-Q", "25", "-s", "1", "-f"], "72380.83"),
    # ava -F (symmetric pair counting through the filtered reduce) and
    # the inverse --use-min-ref -F (inverted overhang comparison,
    # `twoset.rs:493-517`) — both run on device in the -F matrix below
    (["-n", "80", "-s", "5", "-F"], "344279"),
    (["-n", "100", "-s", "2", "-F"], "334130"),
    (["-T", "50", "-Q", "25", "-s", "1", "--use-min-ref", "-F"], "107610"),
    (["-T", "50", "-Q", "25", "-s", "7", "--use-min-ref", "-F"], "60835"),
]


@pytest.mark.parametrize("args,expect", MATRIX, ids=lambda v: " ".join(v) if isinstance(v, list) else v)
def test_toy_bam_mode_matrix_host(tmp_path, args, expect):
    out = tmp_path / "o.txt"
    rc = main([str(TOY_BAM)] + args + ["-o", str(out), "-qqq"])
    assert rc == 0
    assert out.read_text().strip() == expect


@pytest.mark.parametrize(
    "args,expect",
    [c for c in MATRIX if "-F" not in c[0]],
    ids=lambda v: " ".join(v) if isinstance(v, list) else v,
)
def test_toy_bam_mode_matrix_device_equals_host(tmp_path, args, expect):
    # every mode — including --use-min-ref's inverse direction — must
    # produce byte-identical stdout through the device pipeline (-F has
    # its own single-device parametrisation below)
    out = tmp_path / "o.txt"
    rc = main([str(TOY_BAM)] + args + ["--engine", "device", "-o", str(out), "-qqq"])
    assert rc == 0
    assert out.read_text().strip() == expect


@pytest.mark.parametrize(
    "args,expect",
    [c for c in MATRIX if "-F" in c[0]],
    ids=lambda v: " ".join(v) if isinstance(v, list) else v,
)
def test_toy_bam_filter_device_equals_host(tmp_path, args, expect, monkeypatch):
    # -F on device: fused extent tracking + filtered reduce, covering
    # the forward is_internal comparison, the ava pair plane, and the
    # inverted --use-min-ref comparison (single-device fused path; the
    # sharded mesh falls back to host)
    monkeypatch.setenv("LRGE_SHARDS", "1")
    out = tmp_path / "o.txt"
    rc = main([str(TOY_BAM)] + args + ["--engine", "device", "-o", str(out), "-qqq"])
    assert rc == 0
    assert out.read_text().strip() == expect


@pytest.mark.parametrize(
    "args",
    [
        ["-T", "50", "-Q", "25", "-s", "1"],
        ["-T", "50", "-Q", "25", "-s", "1", "-F"],
        ["-T", "50", "-Q", "25", "-s", "1", "--use-min-ref"],
        ["-n", "80", "-s", "5"],
    ],
    ids=lambda v: " ".join(v),
)
def test_device_keep_temp_writes_matching_paf(tmp_path, args, monkeypatch):
    # The reference always leaves overlaps.paf in the temp dir and -C
    # keeps it (`twoset.rs:244`, `lrge/src/utils.rs:4-17`).  A device
    # run with -C must produce a PAF byte-identical to the host
    # engine's (rows re-mapped through host map_read in query order).
    monkeypatch.setenv("LRGE_SHARDS", "1")
    host_dir = tmp_path / "host"
    dev_dir = tmp_path / "dev"
    rc = main([str(TOY_BAM)] + args + ["-C", "-D", str(host_dir), "-o", str(tmp_path / "h.txt"), "-qqq"])
    assert rc == 0
    rc = main(
        [str(TOY_BAM)] + args
        + ["--engine", "device", "-C", "-D", str(dev_dir), "-o", str(tmp_path / "d.txt"), "-qqq"]
    )
    assert rc == 0
    # -D creates an lrge-XXXX dir inside the given directory (utils.rs:4-17)
    (host_paf_path,) = host_dir.glob("lrge-*/overlaps.paf")
    (dev_paf_path,) = dev_dir.glob("lrge-*/overlaps.paf")
    host_paf = host_paf_path.read_bytes()
    assert len(host_paf) > 0
    assert dev_paf_path.read_bytes() == host_paf


def test_device_no_keep_temp_skips_paf(tmp_path, monkeypatch):
    # without -C/-D the device path does not spend a host mapping pass
    # on an artifact that is deleted on exit
    monkeypatch.setenv("LRGE_SHARDS", "1")
    import lrge_tpu.utils as _u

    seen = {}
    orig = _u.create_temp_dir

    def spy(path, keep):
        t = orig(path, keep)
        real = t.cleanup

        def cleanup():
            seen["pre"] = (t.path / "overlaps.paf").exists()
            real()

        t.cleanup = cleanup
        return t

    monkeypatch.setattr("lrge_tpu.cli.create_temp_dir", spy)
    rc = main(
        [str(TOY_BAM), "-T", "50", "-Q", "25", "-s", "1", "--engine", "device",
         "-o", str(tmp_path / "o.txt"), "-qqq"]
    )
    assert rc == 0
    assert seen["pre"] is False
