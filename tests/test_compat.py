"""Reference-named API shims keep working (migration surface)."""

import jax
import numpy as np

import bikg_graph_explainability_public_tpu as px
from fixtures import make_graph


class TestCompat:
    def test_data_facade(self):
        feat, ei, _ = make_graph(10, 4, 20)
        d = px.Data(feat, ei)
        g = d.to_graph()
        assert g.num_nodes == 10
        assert d.element_size("node_prediction") == 10
        assert d.element_size("edge_prediction") == 20

    def test_kernel_facade(self):
        rng = np.random.default_rng(0)
        mask = rng.random((20, 8)) > 0.5
        k = px.Kernel(mask).compute()
        assert np.asarray(k).shape == (20,)

    def test_mask_facade(self):
        feat, ei, _ = make_graph(12, 4, 30)
        params = {"seed": 1, "interpret_samples": 10, "epochs": 5}
        m = px.Mask(feat, ei, None, params, "node_prediction")
        mask, rows, bs = m.mask_generator()
        assert np.asarray(mask).shape[0] == 50
        assert rows is None

    def test_linear_regression_facade(self):
        lr = px.LinearRegression(6)
        w = lr.init(jax.random.PRNGKey(0))
        mask = np.eye(6, dtype=np.float32)
        out = lr.apply(w, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(w), rtol=1e-6)


class TestVersion:
    def test_version_string(self):
        import bikg_graph_explainability_public_tpu as px
        from bikg_graph_explainability_public_tpu.version import get_git_hash

        assert isinstance(px.VERSION, str) and px.VERSION
        assert px.get_version() == px.VERSION
        assert px.get_version(with_git_hash=True).startswith(px.VERSION)
        assert isinstance(get_git_hash(), str)
