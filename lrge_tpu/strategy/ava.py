"""All-vs-all estimation strategy.

Reproduces `liblrge/src/ava.rs`: subsample one read set, overlap it
against itself with the no-dual mask set (each unordered pair found
once, from the lexicographically smaller query), count symmetrically
with unordered-pair dedup, and estimate with n-1 averaging.

Parity notes: self-overlap skip `ava.rs:277-281`; seen-pairs dedup
`ava.rs:289-298`; symmetric increments `ava.rs:300-301`; zero-overlap
reads get infinite estimates `ava.rs:329-335`; ``avg_read_len =
sum_len/(n-1)`` and ``n_target = n-1`` (`ava.rs:339-345`).
"""

from __future__ import annotations

import logging
import os
import tempfile
from pathlib import Path
from typing import Optional

import numpy as np

from .. import io as lio
from ..compat.rust_rand import unique_random_set
from ..engine import OverlapEngine
from ..errors import DuplicateReadIdentifierError, TooManyReadsError
from ..estimate import Estimate, per_read_estimate
from ..ops.index import build_index
from ..platform import Platform, preset_for

logger = logging.getLogger("lrge")
TRACE = 5
logging.addLevelName(TRACE, "TRACE")

DEFAULT_AVA_NUM_READS = 25_000

U32_MAX = 0xFFFFFFFF


class AvaStrategy(Estimate):
    def __init__(
        self,
        input_path: os.PathLike | str,
        *,
        num_reads: int = DEFAULT_AVA_NUM_READS,
        remove_internal: bool = False,
        max_overhang_ratio: float = 0.2,
        tmpdir: Optional[os.PathLike | str] = None,
        threads: int = 1,
        seed: Optional[int] = None,
        platform: Platform = Platform.NANOPORE,
        engine: str = "host",
        device_paf: bool = False,
    ):
        self.engine = engine
        self.device_paf = device_paf
        self.input = Path(input_path)
        self.num_reads = num_reads
        self.num_bases = 0
        self.remove_internal = remove_internal
        self.max_overhang_ratio = max_overhang_ratio
        self.tmpdir = Path(tmpdir) if tmpdir is not None else Path(tempfile.gettempdir())
        self.threads = threads
        self.seed = seed
        self.platform = platform

    def subsample_reads(self):
        logger.debug("Counting records in input file...")
        n_reads = lio.count_records(self.input)
        logger.debug("Found %d reads in input file", n_reads)
        if n_reads > U32_MAX:
            raise TooManyReadsError(
                f"Number of reads in input file ({n_reads}) exceeds maximum "
                f"allowed value ({U32_MAX})"
            )
        if n_reads < self.num_reads:
            logger.warning(
                "Number of reads in input file (%d) is less than the number "
                "requested (%d)",
                n_reads,
                self.num_reads,
            )
            self.num_reads = n_reads
        indices = set(unique_random_set(self.num_reads, n_reads, self.seed))
        reads = []
        sum_len = 0
        self.tmpdir.mkdir(parents=True, exist_ok=True)
        out_path = self.tmpdir / "reads.fa"
        with open(out_path, "wb") as fh:
            for idx, (name, seq) in enumerate(lio.iter_records(self.input)):
                if idx in indices:
                    indices.discard(idx)
                    fh.write(b">" + name + b"\n" + seq + b"\n")
                    reads.append((name, seq))
                    sum_len += len(seq)
        self.num_bases = sum_len
        return reads, sum_len

    def generate_estimates(self):
        reads, sum_len = self.subsample_reads()
        params = preset_for(self.platform, dual=False)
        names = [n for n, _ in reads]
        read_lengths = {}
        for n, s in reads:
            if n in read_lengths:
                raise DuplicateReadIdentifierError(n.decode("utf-8", "replace"))
            read_lengths[n] = len(s)
        index = build_index([s for _, s in reads], names, params)
        engine = OverlapEngine(index)
        overlap_threshold = params.min_chain_score

        from ..device_engine import resolve_engine

        if resolve_engine(self.engine, len(reads)) == "device":
            if not self.remove_internal:
                return self._count_device(engine, reads, sum_len, read_lengths)
            # ava -F: the fused extent reduce applies is_internal per
            # passing target on device (`ava.rs:283-287`); undecidable
            # rows recompute on the host
            from ..device_engine import strategy_engine

            dev = strategy_engine(engine.index)
            if dev.supports_device_filter():
                return self._count_device(
                    engine, reads, sum_len, read_lengths, dev=dev,
                    filter_ratio=self.max_overhang_ratio,
                )
            logger.info(
                "-F/--filter-contained: this configuration needs mapping "
                "coordinates on the host; using the host engine"
            )
        from ..engine import ParallelHostMapper

        mapper = ParallelHostMapper(engine.index, self.threads)
        ovlap_counter: dict[bytes, int] = {}
        seen_pairs: set[tuple[bytes, bytes]] = set()
        paf_path = self.tmpdir / "overlaps.paf"
        with open(paf_path, "w") as paf:
            for (qname, seq), mappings in zip(reads, mapper.map_reads(reads)):
                for m in mappings:
                    paf.write(m.to_line() + "\n")
                    tname = m.target_name
                    if qname == tname:
                        ovlap_counter.setdefault(qname, 0)
                        continue
                    if self.remove_internal and m.is_internal(self.max_overhang_ratio):
                        continue
                    pair = (qname, tname) if qname < tname else (tname, qname)
                    if pair in seen_pairs:
                        continue
                    seen_pairs.add(pair)
                    ovlap_counter[tname] = ovlap_counter.get(tname, 0) + 1
                    ovlap_counter[qname] = ovlap_counter.get(qname, 0) + 1
                ovlap_counter.setdefault(qname, 0)
        mapper.close()

        no_mapping_count = 0
        estimates = np.empty(len(read_lengths), dtype=np.float32)
        avg_read_len = float(np.float32(sum_len) / np.float32(self.num_reads - 1))
        # iterate in subsample (file) order: the reference walks a
        # HashMap here (arbitrary order; order does not affect the
        # median), but a deterministic order makes the TRACE per-read
        # estimate log diffable across runs and engines
        for i, rid_name in enumerate(read_lengths):
            n_ovlaps = ovlap_counter.get(rid_name, 0)
            if n_ovlaps == 0:
                no_mapping_count += 1
                logger.debug("No overlaps found for read: %s", rid_name)
                est = float("inf")
            else:
                est = per_read_estimate(
                    read_lengths[rid_name],
                    avg_read_len,
                    self.num_reads - 1,
                    n_ovlaps,
                    overlap_threshold,
                )
            logger.log(TRACE, "Estimate for %s: %s", rid_name.decode("utf-8", "replace"), est)
            estimates[i] = est
        if no_mapping_count > 0:
            pct = no_mapping_count / self.num_reads * 100.0
            logger.info(
                "%d (%.2f%%) read(s) did not overlap any other reads",
                no_mapping_count,
                pct,
            )
        else:
            logger.debug("All reads had at least one overlap")
        return estimates, no_mapping_count


    def _count_device(
        self, engine, reads, sum_len, read_lengths, dev=None, filter_ratio=None
    ):
        """Device counting path with symmetric pair accumulation.

        Each passing (query, target) pair is discovered exactly once
        (the no-dual mask keeps only targets whose name is >= the
        query's) and increments both reads' counters (`ava.rs:289-301`
        semantics; the seen-pairs dedup is implied by uniqueness).
        With ``filter_ratio`` the pair lists hold only non-internal
        targets (the -F filter applied in the fused reduce,
        `ava.rs:283-287`).  PAF side-output only under -C/-D.
        """
        from ..device_engine import strategy_engine
        from ..estimate import per_read_estimate

        logger.info(
            "Using device overlap engine (%s)",
            "overlaps.paf via host re-map of mapped rows"
            if self.device_paf
            else "overlaps.paf not written; pass -C/-D to produce it",
        )
        if dev is None:
            dev = strategy_engine(engine.index)
        names = [n for n, _ in reads]
        seqs = [s for _, s in reads]
        dev.warmup(
            [len(s) for s in seqs], filter_ratio=filter_ratio, want_pairs=True
        )
        pairs: dict[int, np.ndarray] = {}
        res = dev.count_batch(
            names, seqs, collect_pairs=pairs, filter_ratio=filter_ratio
        )
        if self.device_paf:
            from ..engine import ParallelHostMapper

            mapper = ParallelHostMapper(engine.index, self.threads)
            rows = [r for r, h in zip(reads, res.had_mapping) if h]
            with open(self.tmpdir / "overlaps.paf", "w") as paf:
                for recs in mapper.map_reads(rows):
                    for m in recs:
                        paf.write(m.to_line() + "\n")
            mapper.close()
        ovlap_counter = {nm: 0 for nm in names}
        for qid, rids in pairs.items():
            qname = names[qid]
            for t in rids:
                tname = engine.index.names[int(t)]
                if tname == qname:
                    continue
                ovlap_counter[tname] += 1
                ovlap_counter[qname] += 1
        # rows that fell back to host used count_overlaps (query-side
        # unique targets); recover their pairs with the host mapper
        host_rows = [qid for qid in range(len(reads)) if qid not in pairs]
        for qid in host_rows:
            recs = engine.map_read(names[qid], seqs[qid])
            uniq = set()
            for m in recs:
                if m.target_name == names[qid] or m.target_name in uniq:
                    continue
                if filter_ratio is not None and m.is_internal(filter_ratio):
                    continue
                uniq.add(m.target_name)
                ovlap_counter[m.target_name] += 1
                ovlap_counter[names[qid]] += 1
        no_mapping_count = 0
        overlap_threshold = engine.params.min_chain_score
        avg_read_len = float(np.float32(sum_len) / np.float32(self.num_reads - 1))
        estimates = np.empty(len(read_lengths), dtype=np.float32)
        # subsample (file) order, matching the host path's TRACE order
        for i, rid_name in enumerate(read_lengths):
            n_ovlaps = ovlap_counter.get(rid_name, 0)
            if n_ovlaps == 0:
                no_mapping_count += 1
                est = float("inf")
            else:
                est = per_read_estimate(
                    read_lengths[rid_name],
                    avg_read_len,
                    self.num_reads - 1,
                    n_ovlaps,
                    overlap_threshold,
                )
            logger.log(TRACE, "Estimate for %s: %s", rid_name.decode("utf-8", "replace"), est)
            estimates[i] = est
        if no_mapping_count > 0:
            pct = no_mapping_count / self.num_reads * 100.0
            logger.info(
                "%d (%.2f%%) read(s) did not overlap any other reads",
                no_mapping_count,
                pct,
            )
        return estimates, no_mapping_count


class AvaBuilder:
    """Builder mirroring `liblrge/src/ava/builder.rs`."""

    def __init__(self):
        self._kw = {}

    def num_reads(self, n: int) -> "AvaBuilder":
        self._kw["num_reads"] = n
        return self

    def remove_internal(self, yes: bool, max_overhang_ratio: float = 0.2) -> "AvaBuilder":
        self._kw["remove_internal"] = yes
        self._kw["max_overhang_ratio"] = max_overhang_ratio
        return self

    def threads(self, n: int) -> "AvaBuilder":
        self._kw["threads"] = n
        return self

    def tmpdir(self, path) -> "AvaBuilder":
        self._kw["tmpdir"] = path
        return self

    def seed(self, seed: Optional[int]) -> "AvaBuilder":
        self._kw["seed"] = seed
        return self

    def platform(self, platform: Platform | str) -> "AvaBuilder":
        if isinstance(platform, str):
            platform = Platform.from_str(platform)
        self._kw["platform"] = platform
        return self

    def engine(self, engine: str) -> "AvaBuilder":
        self._kw["engine"] = engine
        return self

    def device_paf(self, yes: bool) -> "AvaBuilder":
        """Write overlaps.paf on device runs (host re-map of mapped
        rows; the CLI sets this for -C/-D)."""
        self._kw["device_paf"] = yes
        return self

    def build(self, input_path) -> AvaStrategy:
        return AvaStrategy(input_path, **self._kw)
