"""Oracle tests for ANOVA, run-length, and epoch-framing ops."""

import numpy as np
import scipy.stats as spstats

from decode_tonal_langauge_tpu.ops import anova, framing, runlength


class TestAnova:
    def test_two_groups_matches_scipy(self, rng):
        a = rng.standard_normal((20, 5, 40)).astype(np.float32)
        b = (rng.standard_normal((32, 5, 40)) + 0.4).astype(np.float32)
        f, p = anova.f_oneway_two_groups(a, b)
        ref = spstats.f_oneway(a.astype(np.float64), b.astype(np.float64), axis=0)
        np.testing.assert_allclose(np.asarray(f), ref.statistic, rtol=2e-3)
        np.testing.assert_allclose(np.asarray(p), ref.pvalue, rtol=5e-3, atol=1e-6)

    def test_labeled_matches_scipy(self, rng):
        n, c, t, g = 48, 4, 30, 4
        x = rng.standard_normal((n, c, t)).astype(np.float32)
        labels = rng.integers(0, g, n)
        x += labels[:, None, None] * 0.3  # inject group effect
        f, p = anova.f_oneway_labeled(x, labels, g)
        groups = [x[labels == i].astype(np.float64) for i in range(g)]
        ref = spstats.f_oneway(*groups, axis=0)
        np.testing.assert_allclose(np.asarray(f), ref.statistic, rtol=1e-2)
        # float32 betainc: ~1% relative error on mid-range p-values
        np.testing.assert_allclose(np.asarray(p), ref.pvalue, rtol=2e-2, atol=1e-4)

    def test_fsf_matches_scipy(self):
        f = np.linspace(0.01, 20, 50)
        ours = np.asarray(anova.f_sf(f.astype(np.float32), 3.0, 96.0))
        ref = spstats.f.sf(f, 3, 96)
        np.testing.assert_allclose(ours, ref, rtol=5e-3, atol=5e-4)


class TestRunLength:
    def test_against_python_walk(self, rng):
        def py_max_run(mask):
            best = cur = 0
            for v in mask:
                cur = cur + 1 if v else 0
                best = max(best, cur)
            return best

        masks = rng.random((10, 200)) < 0.6
        ours = np.asarray(runlength.max_consecutive_true(masks))
        ref = np.array([py_max_run(m) for m in masks])
        np.testing.assert_array_equal(ours, ref)

    def test_edges(self):
        assert int(runlength.max_consecutive_true(np.zeros(5, bool))) == 0
        assert int(runlength.max_consecutive_true(np.ones(5, bool))) == 5


class TestFraming:
    def test_epoch_gather(self, rng):
        data = rng.standard_normal((3, 500)).astype(np.float32)
        starts = np.array([0, 100, 333])
        out = np.asarray(framing.extract_epochs(data, starts, 50))
        assert out.shape == (3, 3, 50)
        for i, s in enumerate(starts):
            np.testing.assert_array_equal(out[i], data[:, s : s + 50])

    def test_rest_tiling_drops_partial(self):
        starts = np.asarray(framing.tile_rest_windows(0, 1000, 300))
        np.testing.assert_array_equal(starts, [0, 300, 600])
