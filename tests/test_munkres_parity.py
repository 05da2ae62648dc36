"""Empirical tie-order parity fixtures for pemp_tpu.decode.munkres.

The reference's AE grouping (reference: src/Utils/hr_utils/group.py:13,35-39
``py_max_match``; src/Utils/Utils.py:1493-1578 ``mpn_match_by_tag``) depends
on the PyPI ``munkres`` package, whose deterministic tie-break between
equally optimal assignments is load-bearing (the ``round(d)*100 - score``
cost form ties constantly). The package is not installable here, so this
file pins our from-scratch ``decode/munkres.py`` with data instead of prose
(VERDICT r3 #7), from two independent sources:

1. **Package-documented examples** (bmc/munkres README + docs): the 3x3
   minimum-cost example (total 12) and the maximization example built as
   ``sys.maxsize - profit`` (total profit 23, a *unique* optimum, so the
   pairing is solver-independent). The maxsize form also exercises exact
   integer arithmetic — the package computes in python ints; a float64
   implementation silently returns a suboptimal answer because the cost
   differences sit far below 2**63's ulp.

2. **Hand-traced discriminating fixtures**: assignments derived on paper
   from the published classical algorithm structure the package implements
   (pad-to-square with zeros; row-reduce; greedy row-major zero starring;
   step-4 wrap-around zero scan resumed from the current (row, col) in
   which the scan of a row completes even after a hit, so the *last*
   uncovered zero of the first hit row wins; step-6 min-uncovered shift).
   Each trace is written out in the test so an auditor can replay it. The
   fully-tied matrices are chosen so that a naive "first zero wins" scan
   — the obvious alternative order — produces a *different* pairing, i.e.
   these fixtures discriminate the quirk, not just optimality.
"""

import sys

import numpy as np
import pytest

from pemp_tpu.decode.munkres import Munkres, min_cost_pairs


def _total(matrix, pairs):
    return sum(matrix[r][c] for r, c in pairs)


class TestDocumentedExamples:
    """Fixtures from the munkres package's own README/docs."""

    def test_readme_min_cost_total(self):
        # README example: documented lowest total cost is 12. The optimum
        # is tied (identity and anti-diagonal both cost 12); the pairing
        # below is the hand-trace of the package's algorithm: step 2 stars
        # only (0,2); step 6 shifts col 1; (1,1) primed and augmented to a
        # star; step 6 shifts col 0; the alternating path re-stars
        # (0,0)->prime, star (0,2) kept via row cover, ending with (2,0)
        # augmented -> stars {(0,2),(1,1),(2,0)}.
        matrix = [[5, 9, 1], [10, 3, 2], [8, 7, 4]]
        pairs = Munkres().compute(matrix)
        assert _total(matrix, pairs) == 12
        assert pairs == [(0, 2), (1, 1), (2, 0)]

    def test_docs_max_profit_via_maxsize(self):
        # Docs maximization example: cost[i][j] = sys.maxsize - profit,
        # documented answer: total profit 23 via (0,1)=9, (1,0)=10,
        # (2,2)=4 — a unique optimum, so the pairing itself is pinned.
        profit = [[5, 9, 1], [10, 3, 2], [8, 7, 4]]
        cost = [[sys.maxsize - c for c in row] for row in profit]
        pairs = Munkres().compute(cost)
        assert _total(profit, pairs) == 23
        assert sorted(pairs) == [(0, 1), (1, 0), (2, 2)]

    def test_rectangular_pads_with_zeros(self):
        # The package pads rectangular inputs to square with zeros and
        # restricts the result to the original dims; a 1x3 all-zero row
        # stars (0,0) in the greedy row-major pass.
        assert Munkres().compute([[0, 0, 0]]) == [(0, 0)]
        # 3 rows x 2 cols: one row is left unassigned (it pairs with the
        # zero-padded virtual column). [[1,2],[2,4],[3,6]]: the cheapest
        # 2-of-3 rows under padding.
        matrix = [[1, 2], [2, 4], [3, 6]]
        pairs = Munkres().compute(matrix)
        assert len(pairs) == 2
        assert len({r for r, _ in pairs}) == 2
        assert len({c for _, c in pairs}) == 2


class TestHandTracedTieOrder:
    """Fully-tied matrices where the scan order decides the answer."""

    def test_all_equal_matrix_is_identity(self):
        # Every permutation optimal. Trace: row-reduce -> all zeros;
        # step-2 greedy row-major starring -> diagonal; all columns
        # covered -> done. Any solver with row-major greedy starring
        # agrees; this pins the base case.
        for n in (2, 3, 5):
            matrix = np.full((n, n), 7.0)
            assert Munkres().compute(matrix) == [(i, i) for i in range(n)]

    def test_tied_2x2_last_zero_in_row_wins(self):
        # [[1,2],[1,2]] — both pairings cost 3. Trace: row-reduce ->
        # [[0,1],[0,1]]; star (0,0); cover col0; no uncovered zero ->
        # step 6 shifts col1 -> [[0,0],[0,0]]; step 4 primes (0,1)
        # (col0 covered), covers row0/uncovers col0; the next wrap scan
        # hits row1 at (1,0) THEN (1,1) and the package's scan completes
        # the row, so (1,1) — the LAST zero — is primed and augmented.
        # A first-zero-wins scan would instead prime (1,0) and emit the
        # anti-diagonal. Result: identity.
        assert Munkres().compute([[1, 2], [1, 2]]) == [(0, 0), (1, 1)]

    def test_tied_3x3_identical_rows(self):
        # [[1,2,3]]*3 — every permutation costs 6. Hand trace (two step-6
        # shifts, two augmenting paths; the second wrap scan from (1,1)
        # visits row2 in order j=1,2,0 so (2,0) wins as the last hit):
        # stars end as {(0,2),(1,1),(2,0)}.
        matrix = [[1, 2, 3], [1, 2, 3], [1, 2, 3]]
        assert Munkres().compute(matrix) == [(0, 2), (1, 1), (2, 0)]

    def test_grouping_cost_form_ties(self):
        # The AE-grouping cost round(d)*100 - score with equal tag
        # distances and equal scores: all-equal matrix -> identity, i.e.
        # joints are claimed in detection order, which is the behavior
        # real grouping inherits on tag-tied detections.
        d = np.ones((3, 3))
        score = np.full((3, 3), 0.5)
        cost = np.round(d) * 100 - score
        assert Munkres().compute(cost) == [(0, 0), (1, 1), (2, 2)]


class TestOptimalityAndDeterminism:
    def test_optimal_vs_scipy_on_random(self):
        from scipy.optimize import linear_sum_assignment

        rng = np.random.default_rng(0)
        for trial in range(50):
            n, m = rng.integers(1, 9, 2)
            # integer-quantized costs produce heavy ties
            cost = rng.integers(0, 4, (n, m)).astype(np.float64)
            pairs = min_cost_pairs(cost)
            r, c = linear_sum_assignment(
                np.pad(cost, ((0, max(0, m - n)), (0, max(0, n - m))))
            )
            opt = np.pad(cost, ((0, max(0, m - n)), (0, max(0, n - m))))[
                r, c
            ].sum()
            ours = cost[pairs[:, 0], pairs[:, 1]].sum() if len(pairs) else 0.0
            assert ours == pytest.approx(opt), f"trial {trial}"

    def test_deterministic_across_calls(self):
        rng = np.random.default_rng(1)
        cost = np.round(rng.uniform(0, 3, (7, 7)))
        first = Munkres().compute(cost)
        for _ in range(3):
            assert Munkres().compute(cost) == first

    def test_huge_int_costs_stay_exact(self):
        # Regression for the float64 precision loss the maxsize example
        # exposed: integer inputs must keep exact arithmetic.
        base = sys.maxsize
        profit = [[1, 7, 2], [6, 3, 5], [4, 8, 9]]
        cost = [[base - c for c in row] for row in profit]
        pairs = Munkres().compute(cost)
        assert _total(profit, pairs) == 7 + 6 + 9
