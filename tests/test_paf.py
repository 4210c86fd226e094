"""PAF serialization golden tests (oracle values from `mapping.rs:193-493`)."""

import numpy as np

from lrge_tpu.paf import PafRecord


def make_record(**kw):
    base = dict(
        query_name=b"SRR28370649.1",
        query_len=4402,
        query_start=40,
        query_end=237,
        strand="-",
        target_name=b"SRR28370649.7311",
        target_len=5094,
        target_start=41,
        target_end=238,
        match_len=190,
        block_len=197,
        mapq=0,
        tp="S",
        cm=59,
        s1=190,
        dv=0.0022,
        rl=56,
    )
    base.update(kw)
    return PafRecord(**base)


GOLDEN = (
    "SRR28370649.1\t4402\t40\t237\t-\tSRR28370649.7311\t5094\t41\t238\t190\t197\t0\t"
    "tp:A:S\tcm:i:59\ts1:i:190\tdv:f:0.0022\trl:i:56"
)


class TestSerialize:
    def test_golden_line(self):
        assert make_record().to_line() == GOLDEN

    def test_null_terminated_qname(self):
        rec = make_record(query_name=b"SRR28370649.1\x00")
        assert rec.to_line() == GOLDEN

    def test_dv_round_down(self):
        assert make_record(dv=0.0022111).to_line() == GOLDEN

    def test_dv_round_up(self):
        assert make_record(dv=0.0021999).to_line() == GOLDEN

    def test_dv_fill_decimal_places(self):
        line = make_record(dv=0.004).to_line()
        assert "dv:f:0.0040" in line

    def test_dv_zero(self):
        line = make_record(dv=0.0).to_line()
        assert "dv:f:0\t" in line or line.endswith("dv:f:0\trl:i:56")

    def test_roundtrip(self):
        rec = PafRecord.from_line(GOLDEN)
        assert rec.query_name == b"SRR28370649.1"
        assert rec.s1 == 190
        assert rec.tp == "S"
        assert abs(rec.dv - 0.0022) < 1e-9
        assert rec.to_line() == GOLDEN


class TestIsInternal:
    def test_case1(self):
        rec = make_record(
            query_len=390,
            query_start=46,
            query_end=317,
            strand="+",
            target_len=278,
            target_start=4,
            target_end=275,
        )
        assert rec.is_internal(0.2)

    def test_case2(self):
        rec = make_record(
            query_len=298,
            query_start=1,
            query_end=297,
            strand="+",
            target_len=398,
            target_start=54,
            target_end=350,
        )
        assert rec.is_internal(0.2)

    def test_case3_not_internal(self):
        rec = make_record(
            query_len=390,
            query_start=0,
            query_end=355,
            strand="+",
            target_len=418,
            target_start=39,
            target_end=394,
        )
        assert not rec.is_internal(0.05)
