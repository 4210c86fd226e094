"""Broad golden-PAF drift tripwire (VERDICT r4 item 7).

Pins the COMPLETE serialized PAF output (all 12 columns + tp/cm/s1/dv/
rl tags + mapq) of ``map_read`` over a fixed corpus covering: both
presets (ava-ont and ava-pb/HPC), both strands, clean and error-laden
queries, overlapping/contained/dovetail geometries, duplicated targets
(secondary chains, ``tp:A:S``, mapq 0), and homopolymer-rich HPC
sequence.  The golden lines live in ``tests/data/golden_paf.json``.

Two tag values are RECONSTRUCTIONS of minimap2 2.30 behavior (the C
source is not in this environment; see PARITY.md):

* ``mapq`` (`engine._mapq`): the chain-only model
  ``pen*40*(1-subsc/score)*ln(score)`` with the n_sub penalty.  Corner
  cases that may diverge from minimap2: the exact rounding of the
  ``4.343*ln(n_sub+1)`` penalty, the subsc floor when no secondary
  exists, and ties between pen_cm and pen_s1 at cnt==10 / score==100.
* ``dv`` (`engine.map_read`): the `mm_est_err` retention model.
  Corners that may diverge: the interior-window rounding
  (``qs + int(avg_k+0.499) - 1``), reads whose minimizer set was
  truncated, and the avg-span exponent under HPC (variable spans).

Everything else on the line (coordinates, strand, mlen/blen, cm, s1,
rl, tag formatting incl. dv's 4 dp / 0-below-epsilon rule) is pinned
against `mapping.rs`-derived golden tests elsewhere; THIS corpus
freezes the composite behavior so any drift in sketch/chain/backtrack/
tag code shows up as a diff, not a silent change.

Regenerate after an INTENDED behavior change:
    python tests/test_paf_golden_corpus.py --regen
"""

import json
from pathlib import Path

import numpy as np

from lrge_tpu.engine import build_engine
from lrge_tpu.platform import Platform, preset_for

GOLDEN = Path(__file__).parent / "data" / "golden_paf.json"
RC = bytes.maketrans(b"ACGT", b"TGCA")


def _corpus():
    """Deterministic (preset, targets, queries) corpus."""
    rng = np.random.default_rng(20260821)
    genome = bytes(rng.choice(list(b"ACGT"), size=40_000).tolist())
    # homopolymer-rich block for the HPC preset
    parts = []
    rng2 = np.random.default_rng(7)
    for _ in range(12_000):
        parts.append(bytes([rng2.choice(list(b"ACGT"))]) * int(rng2.integers(1, 7)))
    hpc_genome = b"".join(parts)
    assert len(hpc_genome) >= 18_000

    def mutate(seq, err, seed):
        r = np.random.default_rng(seed)
        arr = bytearray(seq)
        for s in r.integers(0, len(arr), size=int(len(arr) * err)):
            arr[s] = int(r.choice(list(b"ACGT")))
        return bytes(arr)

    out = []
    for platform, g in ((Platform.NANOPORE, genome), (Platform.PACBIO, hpc_genome)):
        targets = [
            g[1000:3000],                  # t0
            g[2500:4500],                  # t1 (overlaps t0)
            g[9000:11000],                 # t2 (isolated)
            g[9000:11000],                 # t3 (duplicate of t2 -> secondaries)
            g[15000:17000].translate(RC)[::-1],  # t4 (reverse-complement)
        ]
        tnames = [b"t%d" % i for i in range(len(targets))]
        queries = [
            (b"clean_dovetail", g[2000:4000]),
            (b"clean_contained", g[9300:10500]),
            (b"errors6pct", mutate(g[9200:10700], 0.06, 11)),
            (b"minus_strand", g[15200:16800]),  # hits t4 on '-'
            (b"rc_query", g[2200:3800].translate(RC)[::-1]),
            (b"no_hit", bytes(np.random.default_rng(3).choice(list(b"ACGT"), size=1500).tolist())),
        ]
        out.append((platform, targets, tnames, queries))
    return out


def produce_lines():
    lines = {}
    for platform, targets, tnames, queries in _corpus():
        params = preset_for(platform, dual=True)
        engine = build_engine(targets, tnames, params)
        key = platform.name.lower()
        lines[key] = {
            qname.decode(): [r.to_line() for r in engine.map_read(qname, seq)]
            for qname, seq in queries
        }
    return lines


def test_golden_paf_corpus():
    assert GOLDEN.exists(), "golden file missing; run --regen"
    want = json.loads(GOLDEN.read_text())
    got = produce_lines()
    # compare per query for a readable diff on drift
    assert set(got) == set(want)
    for preset in want:
        assert set(got[preset]) == set(want[preset]), preset
        for q in want[preset]:
            assert got[preset][q] == want[preset][q], (preset, q)


def test_corpus_covers_the_matrix():
    got = produce_lines()
    flat = [l for p in got.values() for ls in p.values() for l in ls]
    assert any("\t-\t" in l for l in flat), "no minus-strand mapping"
    assert any("tp:A:S" in l for l in flat), "no secondary chain"
    assert any("tp:A:P" in l for l in flat)
    assert any("dv:f:0." in l for l in flat), "no nonzero dv"
    assert any("\t60\t" in l for l in flat), "no mapq-60 primary"
    assert any("\t0\ttp" in l for l in flat), "no mapq-0 mapping"
    assert got["nanopore"]["no_hit"] == []


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        GOLDEN.parent.mkdir(parents=True, exist_ok=True)
        GOLDEN.write_text(json.dumps(produce_lines(), indent=1) + "\n")
        print(f"wrote {GOLDEN}")
