"""CLI tests mirroring `lrge/src/cli.rs:135-294` and
`lrge/tests/alignment.rs`."""

import subprocess
import sys

import numpy as np
import pytest

from lrge_tpu.cli import build_parser, main
from lrge_tpu.io.bam import write_unaligned_bam


@pytest.fixture(scope="module")
def reads_fq(tmp_path_factory):
    rng = np.random.default_rng(5150)
    genome = bytes(rng.choice(list(b"ACGT"), size=60_000).tolist())
    path = tmp_path_factory.mktemp("cli") / "reads.fq"
    with open(path, "wb") as fh:
        for i in range(120):
            pos = int(rng.integers(0, len(genome) - 1500))
            seq = genome[pos : pos + 1500]
            fh.write(b"@r%d\n%s\n+\n%s\n" % (i, seq, b"I" * len(seq)))
    return path


class TestArgParsing:
    def test_no_args_errors(self, capsys):
        with pytest.raises(SystemExit):
            build_parser().parse_args([])

    def test_defaults(self, reads_fq):
        args = build_parser().parse_args([str(reads_fq)])
        assert args.target_num_reads is None  # falls back to 10_000
        assert args.query_num_reads is None
        assert args.num_reads is None
        assert args.platform == "ont"
        assert args.threads == 1
        assert args.lower_q == pytest.approx(0.15)
        assert args.upper_q == pytest.approx(0.65)
        assert args.max_overhang_ratio == pytest.approx(0.2)

    def test_num_conflicts_with_target(self, reads_fq, capsys):
        rc = None
        try:
            main([str(reads_fq), "--num", "100", "--target", "200"])
        except SystemExit as e:
            rc = e.code
        assert rc not in (0, None)

    def test_num_conflicts_with_query(self, reads_fq):
        with pytest.raises(SystemExit):
            main([str(reads_fq), "--num", "100", "--query", "200"])

    def test_quiet_conflicts_with_verbose(self, reads_fq):
        with pytest.raises(SystemExit):
            main([str(reads_fq), "-q", "-v"])

    def test_bad_quantiles(self, reads_fq):
        with pytest.raises(SystemExit):
            build_parser().parse_args([str(reads_fq), "--q1", "0.6"])
        with pytest.raises(SystemExit):
            build_parser().parse_args([str(reads_fq), "--q3", "0.4"])

    def test_missing_input(self):
        with pytest.raises(SystemExit):
            build_parser().parse_args(["definitely-not-here.fq"])


class TestEndToEnd:
    def test_twoset_run(self, reads_fq, tmp_path, capsys):
        out = tmp_path / "est.txt"
        rc = main(
            [str(reads_fq), "-T", "80", "-Q", "30", "-s", "6", "-o", str(out), "-qqq"]
        )
        assert rc == 0
        est = float(out.read_text().strip())
        assert 10_000 < est < 400_000  # genome is 60kb; loose sanity bound

    def test_ava_run(self, reads_fq, tmp_path):
        out = tmp_path / "est.txt"
        rc = main([str(reads_fq), "-n", "80", "-s", "6", "-o", str(out), "-qqq"])
        assert rc == 0
        assert float(out.read_text().strip()) > 0

    def test_seeded_runs_identical(self, reads_fq, tmp_path):
        o1, o2 = tmp_path / "a.txt", tmp_path / "b.txt"
        assert main([str(reads_fq), "-T", "80", "-Q", "30", "-s", "9", "-o", str(o1), "-qqq"]) == 0
        assert main([str(reads_fq), "-T", "80", "-Q", "30", "-s", "9", "-o", str(o2), "-qqq"]) == 0
        assert o1.read_text() == o2.read_text()

    def test_keep_temp(self, reads_fq, tmp_path):
        td = tmp_path / "keepme"
        rc = main(
            [
                str(reads_fq),
                "-T", "80", "-Q", "30", "-s", "6",
                "-C", "-D", str(td),
                "-o", str(tmp_path / "e.txt"), "-qqq",
            ]
        )
        assert rc == 0
        kept = list(td.glob("lrge-*"))
        assert kept, "temp dir should be kept with -C"
        assert (kept[0] / "overlaps.paf").exists()

    def test_unaligned_sam_two_reads_fails_cleanly(self, tmp_path, capsys):
        # mirror of alignment.rs:6-27: tiny unaligned SAM accepted as
        # input but yields no finite estimates
        sam = tmp_path / "u.sam"
        sam.write_bytes(
            b"@HD\tVN:1.6\tSO:unsorted\n"
            b"r1\t4\t*\t0\t0\t*\t*\t0\t0\tGATTAGATACGATCGATT\t*\n"
            b"r2\t4\t*\t0\t0\t*\t*\t0\t0\tGATTAGATACGATCGATT\t*\n"
        )
        rc = main([str(sam), "-T", "1", "-Q", "1", "-qqq"])
        captured = capsys.readouterr()
        assert rc != 0
        assert "No finite estimates were generated" in captured.err

    def test_mapped_sam_rejected(self, tmp_path, capsys):
        sam = tmp_path / "m.sam"
        sam.write_bytes(
            b"@HD\tVN:1.6\tSO:unsorted\n@SQ\tSN:c\tLN:100\n"
            b"r1\t0\tc\t1\t0\t5M\t*\t0\t0\tGATTA\t!!!!!\n"
        )
        rc = main([str(sam), "-T", "1", "-Q", "1", "-qqq"])
        captured = capsys.readouterr()
        assert rc != 0
        assert "Mapped records are not supported" in captured.err

    def test_toy_bam_style_run(self, tmp_path):
        # mirror of alignment.rs:52-68: small unaligned BAM end-to-end
        rng = np.random.default_rng(77)
        genome = bytes(rng.choice(list(b"ACGT"), size=30_000).tolist())
        records = []
        for i in range(60):
            pos = int(rng.integers(0, len(genome) - 1200))
            records.append((f"br{i}".encode(), genome[pos : pos + 1200]))
        bam = tmp_path / "toy.bam"
        write_unaligned_bam(bam, records)
        out = tmp_path / "est.txt"
        rc = main([str(bam), "-T", "40", "-Q", "10", "-s", "6", "-o", str(out), "-qqq"])
        assert rc == 0
        assert float(out.read_text().strip()) > 0

    def test_precise_output(self, reads_fq, tmp_path):
        out = tmp_path / "p.txt"
        rc = main(
            [str(reads_fq), "-T", "80", "-Q", "30", "-s", "6", "-f", "-o", str(out), "-qqq"]
        )
        assert rc == 0
        text = out.read_text().strip()
        assert float(text) > 0


def test_module_entrypoint(reads_fq, tmp_path):
    out = tmp_path / "m.txt"
    res = subprocess.run(
        [
            sys.executable, "-m", "lrge_tpu",
            str(reads_fq), "-T", "60", "-Q", "20", "-s", "2",
            "-o", str(out), "-qqq",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu", "PYTHONPATH": "/root/repo"},
    )
    assert res.returncode == 0, res.stderr
    assert float(out.read_text().strip()) > 0
