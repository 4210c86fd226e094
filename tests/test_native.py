"""Native C++ runtime vs pure-Python equivalence."""

import numpy as np
import pytest

from lrge_tpu.native import HAVE_NATIVE, native

pytestmark = pytest.mark.skipif(not HAVE_NATIVE, reason="native extension unavailable")


class TestEncode:
    def test_matches_python(self):
        from lrge_tpu.ops.encode import encode_seq

        seq = b"ACGTNacgtRYKM" * 100
        a = np.frombuffer(native.encode_seq(seq), dtype=np.uint8)
        b = encode_seq(seq)
        assert (a == b).all()


class TestParse:
    def test_fastq(self):
        recs = native.parse_fastx(b"@r1 comment\nACGT\n+\nIIII\n@r2\tRG:Z:x\nGGCC\n+\nIIII\n")
        assert recs == [(b"r1", b"ACGT"), (b"r2", b"GGCC")]

    def test_fasta_multiline_crlf(self):
        recs = native.parse_fastx(b">r1 c\r\nACGT\r\nACGT\r\n>r2\r\nGG\r\n")
        assert recs == [(b"r1", b"ACGTACGT"), (b"r2", b"GG")]

    def test_malformed_raises(self):
        with pytest.raises(ValueError):
            native.parse_fastx(b"@r1\nACGT\nNOPLUS\nIIII\n")
        with pytest.raises(ValueError):
            native.parse_fastx(b"@r1\nACGT\n+\nIII\n")  # qual length mismatch

    def test_matches_python_parser(self, tmp_path):
        from lrge_tpu.io import iter_records

        rng = np.random.default_rng(3)
        blob = bytearray()
        expected = []
        for i in range(50):
            seq = bytes(rng.choice(list(b"ACGT"), size=int(rng.integers(10, 200))).tolist())
            blob += b"@read%d some comment\n%s\n+\n%s\n" % (i, seq, b"I" * len(seq))
            expected.append((b"read%d" % i, seq))
        p = tmp_path / "r.fq"
        p.write_bytes(bytes(blob))
        assert list(iter_records(p)) == expected


class TestChainDp:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_matches_python(self, seed, monkeypatch):
        from lrge_tpu.ops import chain as chain_mod
        from lrge_tpu.ops.chain import Anchors, chain_dp
        from lrge_tpu.platform import AVA_ONT

        rng = np.random.default_rng(seed)
        n = 600
        rid = np.sort(rng.integers(0, 5, size=n)).astype(np.int32)
        strand = rng.integers(0, 2, size=n).astype(np.int8)
        rpos = rng.integers(0, 8000, size=n).astype(np.int32)
        qpos = rng.integers(0, 8000, size=n).astype(np.int32)
        order = np.lexsort((rpos, strand, rid))
        anchors = Anchors(
            rid=rid[order],
            rpos=rpos[order],
            qpos=qpos[order],
            strand=strand[order],
            span=np.full(n, 15, dtype=np.int32),
        )
        f_native, p_native = chain_dp(anchors, AVA_ONT)
        # force the pure-python path
        import lrge_tpu.native as nat

        monkeypatch.setattr(nat, "native", None)
        f_py, p_py = chain_dp(anchors, AVA_ONT)
        np.testing.assert_array_equal(f_native, f_py)
        np.testing.assert_array_equal(p_native, p_py)
