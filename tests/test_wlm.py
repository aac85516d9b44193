"""Surrogate-training tests (reference scope: tests/test_wlm.py), plus an
optimizer-parity oracle the reference lacks: torch.optim.Adam run on identical
data must produce the same trajectory."""

import jax
import jax.numpy as jnp
import numpy as np

from bikg_graph_explainability_public_tpu.explain.wlm import (
    init_surrogate_weights,
    train_surrogate,
)


def _toy_problem(m=200, s=12, seed=0):
    rng = np.random.default_rng(seed)
    masks = (rng.random((m, s)) > 0.5).astype(np.float32)
    w_true = rng.normal(size=s).astype(np.float32)
    y = masks @ w_true
    kern = np.ones(m, np.float32)
    return masks, y, kern, w_true


class TestTrainSurrogate:
    def test_recovers_linear_weights(self):
        masks, y, kern, w_true = _toy_problem()
        epochs, bs = 40, 5
        w0 = init_surrogate_weights(jax.random.PRNGKey(0), 12, 12)
        res = train_surrogate(
            w0,
            jnp.asarray(masks.reshape(epochs, bs, 12)),
            jnp.asarray(y.reshape(epochs, bs)),
            jnp.asarray(kern.reshape(epochs, bs)),
            num_valid=12,
            lr=0.05,
            l1_lambda=0.0,
            weight_decay=0.0,
        )
        w = np.asarray(res.weights)
        # high rank correlation with the generating weights
        corr = np.corrcoef(w, w_true)[0, 1]
        assert corr > 0.95

    def test_best_epoch_tracks_min_loss(self):
        masks, y, kern, _ = _toy_problem(seed=1)
        epochs, bs = 20, 10
        w0 = init_surrogate_weights(jax.random.PRNGKey(1), 12, 12)
        res = train_surrogate(
            w0,
            jnp.asarray(masks.reshape(epochs, bs, 12)),
            jnp.asarray(y.reshape(epochs, bs)),
            jnp.asarray(kern.reshape(epochs, bs)),
            num_valid=12,
        )
        losses = np.asarray(res.losses)
        assert int(res.best_epoch) == int(np.argmin(losses))
        assert np.isfinite(losses).all()

    def test_padding_columns_stay_zero(self):
        masks, y, kern, _ = _toy_problem(s=10, seed=2)
        padded = np.zeros((200, 16), np.float32)
        padded[:, :10] = masks
        epochs, bs = 20, 10
        w0 = init_surrogate_weights(jax.random.PRNGKey(2), 16, 10)
        assert (np.asarray(w0)[10:] == 0).all()
        res = train_surrogate(
            w0,
            jnp.asarray(padded.reshape(epochs, bs, 16)),
            jnp.asarray(y.reshape(epochs, bs)),
            jnp.asarray(kern.reshape(epochs, bs)),
            num_valid=10,
        )
        assert (np.asarray(res.weights)[10:] == 0).all()

    def test_matches_torch_adam(self):
        """Optimizer numerics oracle: identical data + init through
        torch.optim.Adam (the reference's optimizer, wlm.py:477-478) must give
        the same final weights."""
        import torch

        masks, y, kern, _ = _toy_problem(m=100, s=8, seed=3)
        kern = np.random.default_rng(5).random(100).astype(np.float32) + 0.1
        epochs, bs = 20, 5
        w0 = np.asarray(init_surrogate_weights(jax.random.PRNGKey(3), 8, 8))
        lr, l1, wd = 0.01, 1e-4, 1e-2

        res = train_surrogate(
            jnp.asarray(w0),
            jnp.asarray(masks.reshape(epochs, bs, 8)),
            jnp.asarray(y.reshape(epochs, bs)),
            jnp.asarray(kern.reshape(epochs, bs)),
            num_valid=8,
            lr=lr,
            l1_lambda=l1,
            weight_decay=wd,
        )

        w = torch.nn.Parameter(torch.tensor(w0))
        opt = torch.optim.Adam([w], lr=lr, weight_decay=wd)
        tm = torch.tensor(masks.reshape(epochs, bs, 8))
        ty = torch.tensor(y.reshape(epochs, bs))
        tk = torch.tensor(kern.reshape(epochs, bs))
        torch_losses = []
        for e in range(epochs):
            opt.zero_grad()
            pred = tm[e] @ w
            diff = (pred - ty[e]) ** 2
            loss = (tk[e] * diff).mean() / tk[e].sum() + l1 * w.abs().sum() / 8
            loss.backward()
            opt.step()
            torch_losses.append(float(loss))

        np.testing.assert_allclose(
            np.asarray(res.losses), np.asarray(torch_losses), rtol=1e-4, atol=1e-6
        )
        # final weights match torch trajectory; compare via reconstructing
        # final (not best) weights is awkward, so compare loss curve + best
        assert int(res.best_epoch) == int(np.argmin(torch_losses))
