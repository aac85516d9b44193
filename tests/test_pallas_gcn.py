"""Pallas fused masked-GCN layer vs the XLA dense path (interpret mode on
CPU; the same kernels compile on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

import bikg_graph_explainability_public_tpu as px
from bikg_graph_explainability_public_tpu.explain.masks import MaskSampler
from bikg_graph_explainability_public_tpu.graph import from_arrays
from bikg_graph_explainability_public_tpu.models.fast_gcn import FastBatchedGCN
from bikg_graph_explainability_public_tpu.ops.pallas_gcn import (
    masked_gcn_layer,
    masked_gcn_layer_batched,
)
from fixtures import make_graph

# bf16 operand path: tolerances reflect bf16 mantissa (~2-3 decimal digits);
# the batched layer additionally rounds the hidden activations to bf16
TOL = dict(rtol=5e-2, atol=6e-2)


class TestKernels:
    def test_shared_layer_matches_einsum(self):
        rng = np.random.default_rng(0)
        n, c, b = 64, 16, 8
        adj = (rng.random((n, n)) < 0.1).astype(np.float32)
        xw = rng.normal(size=(n, c)).astype(np.float32)
        s = rng.random((b, n)).astype(np.float32)
        self_w = rng.random((b, n)).astype(np.float32)
        bias = rng.normal(size=(c,)).astype(np.float32)

        got = masked_gcn_layer(
            jnp.asarray(adj, jnp.bfloat16), jnp.asarray(xw), jnp.asarray(s),
            jnp.asarray(self_w), jnp.asarray(bias),
        )
        scaled = s[:, :, None] * xw[None]
        want = np.einsum("vu,buc->bvc", adj, scaled)
        want = s[:, :, None] * want + self_w[:, :, None] * xw[None] + bias
        want = np.maximum(want, 0.0)
        np.testing.assert_allclose(np.asarray(got), want, **TOL)

    def test_batched_layer_matches_einsum(self):
        rng = np.random.default_rng(1)
        n, c_in, c, b = 64, 16, 8, 8
        adj = (rng.random((n, n)) < 0.1).astype(np.float32)
        h = rng.normal(size=(b, n, c_in)).astype(np.float32)
        w_t = rng.normal(size=(c_in, c)).astype(np.float32)
        s = rng.random((b, n)).astype(np.float32)
        self_w = rng.random((b, n)).astype(np.float32)
        bias = rng.normal(size=(c,)).astype(np.float32)

        got = masked_gcn_layer_batched(
            jnp.asarray(adj, jnp.bfloat16), jnp.asarray(h), jnp.asarray(w_t),
            jnp.asarray(s), jnp.asarray(self_w), jnp.asarray(bias),
        )
        hw = h @ w_t
        scaled = s[:, :, None] * hw
        want = np.einsum("vu,buc->bvc", adj, scaled)
        want = s[:, :, None] * want + self_w[:, :, None] * hw + bias
        want = np.maximum(want, 0.0)
        np.testing.assert_allclose(np.asarray(got), want, **TOL)


class TestEngineBackend:
    def test_pallas_backend_matches_xla(self):
        feat, ei, _ = make_graph(n=32, f=12, e=90, seed=70)
        g = from_arrays(feat, ei)
        mdef = px.GCNNodeModel(12, conv_channels=(8, 8), fc_channels=(8, 8))
        params = mdef.init(jax.random.PRNGKey(70))
        xla_eng = FastBatchedGCN(mdef, params, g, backend="xla")
        pls_eng = FastBatchedGCN(mdef, params, g, backend="pallas")
        sampler = MaskSampler(32, g.n_pad, {"interpret_samples": 16, "epochs": 2}, None)
        masks, _, _ = sampler.sample(jax.random.PRNGKey(70))
        a = np.asarray(xla_eng.query_outputs(masks, 3))
        b = np.asarray(pls_eng.query_outputs(masks, 3))
        np.testing.assert_allclose(a, b, rtol=5e-2, atol=6e-2)
        # attribution-relevant check: identical ordering of outputs
        assert np.corrcoef(a, b)[0, 1] > 0.999
