"""Mask-sampler tests (reference scope: tests/test_mask.py — structural
validity: dtype, row counts, per-row coalition consistency)."""

import jax
import numpy as np
import pytest

from bikg_graph_explainability_public_tpu.explain.masks import (
    MaskSampler,
    build_plans,
    sample_community_mask,
)

PARAMS = {"interpret_samples": 20, "epochs": 50}


class TestShapleyMask:
    def test_shape_and_dtype(self):
        sampler = MaskSampler(15, 16, PARAMS, None)
        mask, tags, bs = sampler.sample(jax.random.PRNGKey(0))
        assert tags is None
        m = np.asarray(mask)
        assert m.dtype == bool
        assert m.shape == (1000, 16)
        assert bs == 20
        # padding column beyond num_elements stays inactive
        assert not m[:, 15].any()
        # roughly balanced bits
        frac = m[:, :15].mean()
        assert 0.4 < frac < 0.6

    def test_deterministic_per_key(self):
        sampler = MaskSampler(10, 16, PARAMS, None)
        m1, _, _ = sampler.sample(jax.random.PRNGKey(7))
        m2, _, _ = sampler.sample(jax.random.PRNGKey(7))
        m3, _, _ = sampler.sample(jax.random.PRNGKey(8))
        assert np.array_equal(np.asarray(m1), np.asarray(m2))
        assert not np.array_equal(np.asarray(m1), np.asarray(m3))


class TestCommunityMask:
    def _communities(self):
        return [[0, 1, 2, 3, 4, 5], [6, 7, 8], [9, 10], [11]]

    def test_plans(self):
        plans = build_plans(self._communities(), 1000)
        # sorted by length descending
        assert [p.columns.shape[0] for p in plans] == [6, 3, 2, 1]
        assert [p.pathway_index for p in plans] == [0, 1, 2, 3]
        for p in plans:
            assert p.size >= p.size_internal >= 1
        frac0 = 6 / 12
        assert plans[0].size == int(np.ceil(frac0 * 1000))

    def test_rows_and_coalition_consistency(self):
        """For every row, each external community (minus overlap with the
        row's internal community) must be all-on or all-off — the reference's
        check_suitability_external_mask invariant
        (tests/test_utils.py:283-356)."""
        comms = self._communities()
        sampler = MaskSampler(12, 16, PARAMS, comms)
        mask, tags, bs = sampler.sample(jax.random.PRNGKey(1))
        m = np.asarray(mask)
        t = np.asarray(tags)
        assert m.shape[0] >= 1000 - 50  # trimmed to whole batches
        assert m.shape[0] % bs == 0
        assert m.dtype == bool
        assert not m[:, 12:].any()

        for r in range(0, m.shape[0], 17):  # spot-check rows
            internal = set(comms[t[r]])
            for ci, comm in enumerate(comms):
                if ci == t[r]:
                    continue
                cols = [c for c in comm if c not in internal]
                if not cols:
                    continue
                s = m[r, cols].sum()
                assert s == 0 or s == len(cols), (r, ci, m[r, cols])

    def test_tag_distribution_proportional(self):
        comms = self._communities()
        sampler = MaskSampler(12, 16, PARAMS, comms)
        _, tags, _ = sampler.sample(jax.random.PRNGKey(2))
        t = np.asarray(tags)
        counts = np.bincount(t, minlength=4)
        # biggest community gets about half the rows
        assert counts[0] > counts[1] > counts[2] >= counts[3] > 0

    def test_single_community(self):
        sampler = MaskSampler(5, 8, PARAMS, [[0, 1, 2, 3, 4]])
        mask, tags, _ = sampler.sample(jax.random.PRNGKey(3))
        m = np.asarray(mask)
        assert m.shape[0] >= 950
        assert (np.asarray(tags) == 0).all()

    def test_budget_cap_above_4000_elements(self):
        """>4000 elements: rows are capped to interpret_samples*epochs,
        biggest communities first (masks.py:344-380)."""
        rng = np.random.default_rng(4)
        comms = [list(range(i * 500, (i + 1) * 500)) for i in range(10)]
        sampler = MaskSampler(5000, 5120, PARAMS, comms)
        mask, tags, bs = sampler.sample(jax.random.PRNGKey(4))
        assert np.asarray(mask).shape[0] <= 1000


class TestSamplerValidation:
    def test_non_numeric_interpret_samples_raises_cleanly(self):
        """The curated TypeError fires before abs() (VERDICT r1 item 9)."""
        with pytest.raises(TypeError, match="interpret_samples is not numeric"):
            MaskSampler(10, 16, {"interpret_samples": "20", "epochs": 5})

    def test_non_numeric_epochs_raises_cleanly(self):
        with pytest.raises(TypeError, match="epochs is not numeric"):
            MaskSampler(10, 16, {"interpret_samples": 20, "epochs": None})


class TestBudgetCapOracle:
    """The >4000-element budget-cap break fires on the same pathway as the
    reference (masks.py:343-348 checks cumulative BEFORE counting the
    just-appended block; so does build_plans' consumer)."""

    def test_break_point_matches_reference_semantics(self):
        num_elements = 5000
        total = 40
        pathway_inds = [list(range(i * 500, i * 500 + 500)) for i in range(10)]
        plans = build_plans(pathway_inds, total)

        # reference semantics: iterate, check-then-increment
        cumulative = 0
        expected_blocks = 0
        for plan in plans:
            expected_blocks += 1
            if cumulative > total and num_elements > 4000:
                break
            cumulative += plan.size

        mask, tags = sample_community_mask(
            jax.random.PRNGKey(0), pathway_inds, num_elements, 5120, total
        )
        # number of distinct pathway tags appearing == blocks appended
        produced_blocks = len(np.unique(np.asarray(tags)))
        assert produced_blocks == expected_blocks
