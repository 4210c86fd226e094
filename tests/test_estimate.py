"""Estimator math golden tests.

The expected values are behavioral oracles taken from the reference's
unit tests (`liblrge/src/estimate.rs:159-343`): our implementation must
reproduce them exactly (f32 semantics).
"""

import math

import numpy as np
import pytest

from lrge_tpu.estimate import (
    EstimateResult,
    calculate_quantile,
    median,
    per_read_estimate,
    per_read_estimate_batch,
)

INF = float("inf")


class TestMedian:
    def test_odd_length(self):
        assert median([1.0, 3.0, 5.0, 7.0, 9.0]) == (None, 5.0, None)

    def test_unsorted(self):
        assert median([3.0, 1.0, 7.0, 5.0, 9.0]) == (None, 5.0, None)

    def test_even_length(self):
        assert median([1.0, 3.0, 5.0, 7.0]) == (None, 4.0, None)

    def test_single_element(self):
        assert median([10.0]) == (None, 10.0, None)

    def test_empty(self):
        assert median([]) == (None, None, None)

    def test_negative_numbers(self):
        assert median([-3.0, 1.0, 0.0, 3.0, -1.0]) == (None, 0.0, None)

    def test_positive_infinity(self):
        assert median([1.0, 2.0, 3.0, INF]) == (None, 2.5, None)

    def test_negative_infinity(self):
        assert median([-INF, 1.0, 2.0, 3.0]) == (None, 1.5, None)

    def test_both_infinities(self):
        assert median([-INF, 1.0, 2.0, INF]) == (None, 1.5, None)

    def test_only_infinity(self):
        assert median([INF, INF]) == (None, INF, None)

    def test_only_negative_infinity(self):
        assert median([-INF, -INF]) == (None, -INF, None)

    def test_inf_and_regular(self):
        assert median([-1.0, -INF, 0.0, 1.0, INF]) == (None, 0.0, None)

    def test_with_quantiles(self):
        data = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0]
        lo, med, hi = median(data, 0.15, 0.65)
        assert lo == pytest.approx(np.float32(2.35), abs=0)
        assert med == 5.5
        assert hi == pytest.approx(np.float32(6.85), abs=0)

    def test_quantile_with_infinity_in_quantile(self):
        data = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, INF, INF, INF, INF]
        lo, med, hi = median(data, 0.15, 0.65)
        assert lo == pytest.approx(np.float32(2.35), abs=0)
        assert med == 5.5
        assert hi == INF

    def test_quantile_out_of_range_panics(self):
        with pytest.raises(ValueError, match="Quantile must be between 0.0 and 1.0"):
            calculate_quantile(np.array([1.0, 2.0, 3.0], dtype=np.float32), 1.1)


class TestPerReadEstimate:
    def test_golden(self):
        # estimate.rs:305-322
        assert per_read_estimate(100, 200.0, 1000, 100, 10) == 2910.0

    def test_zero_overlaps(self):
        # estimate.rs:325-342
        assert per_read_estimate(100, 200.0, 1000, 0, 10) == INF

    def test_batch_matches_scalar(self):
        rng = np.random.default_rng(0)
        lens = rng.integers(100, 50_000, size=256)
        ovls = rng.integers(0, 40, size=256)
        batch = per_read_estimate_batch(lens, 4321.5, 10_000, ovls, 100)
        for i in range(256):
            assert batch[i] == np.float32(
                per_read_estimate(int(lens[i]), 4321.5, 10_000, int(ovls[i]), 100)
            )


class TestEstimateTrait:
    def test_finite_filtering(self):
        from lrge_tpu.estimate import Estimate

        class Fixed(Estimate):
            def generate_estimates(self):
                return np.array([1.0, 2.0, 3.0, INF], dtype=np.float32), 1

        res = Fixed().estimate(finite=True, lower_quant=None, upper_quant=None)
        assert isinstance(res, EstimateResult)
        assert res.estimate == 2.0
        assert res.no_mapping_count == 1

        res_inf = Fixed().estimate(finite=False, lower_quant=None, upper_quant=None)
        assert res_inf.estimate == 2.5

    def test_no_estimates(self):
        from lrge_tpu.estimate import Estimate

        class Empty(Estimate):
            def generate_estimates(self):
                return np.array([INF], dtype=np.float32), 1

        res = Empty().estimate(finite=True, lower_quant=None, upper_quant=None)
        assert res.estimate is None


class TestFormatting:
    def test_format_estimate(self):
        from lrge_tpu.utils import format_estimate

        # utils.rs:98-147 golden values
        assert format_estimate(0.0) == "0.00 bp"
        assert format_estimate(999.99) == "999.99 bp"
        assert format_estimate(1_000.0) == "1.00 kbp"
        assert format_estimate(1_234.56) == "1.23 kbp"
        assert format_estimate(999_999.99) == "1.00 Mbp"  # f32 rounds up
        assert format_estimate(1_000_000.0) == "1.00 Mbp"
        assert format_estimate(1_500_000.0) == "1.50 Mbp"
        assert format_estimate(999_999_999.99) == "1.00 Gbp"
        assert format_estimate(1_000_000_000.0) == "1.00 Gbp"
        assert format_estimate(1_500_000_000.0) == "1.50 Gbp"
        assert format_estimate(999_999_999_999.99) == "1.00 Tbp"
        assert format_estimate(1_000_000_000_000.0) == "1.00 Tbp"
        assert format_estimate(1_500_000_000_000.0) == "1.50 Tbp"
        assert format_estimate(999_999_999_999_999.99) == "1.00 Pbp"
        assert format_estimate(1_000_000_000_000_000.0) == "1.00 Pbp"
        assert format_estimate(4_500_000_000_000_000.0) == "4.50 Pbp"
        assert format_estimate(INF) == "∞ bp"
        assert format_estimate(0.1) == "0.10 bp"
        assert format_estimate(10.0) == "10.00 bp"
