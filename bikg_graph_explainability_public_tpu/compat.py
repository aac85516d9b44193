"""Reference-named API shims.

The reference exports ``Data, Explainer, Kernel, Mask, Model, Pathways,
LinearRegression`` (``/root/reference/src/pathway_explanations/__init__.py``).
This module offers the same names on top of the TPU-native components so users
migrating from the reference find every entry point.  New code should prefer
the native APIs (:class:`.graph.Graph`, :class:`.explain.masks.MaskSampler`,
:func:`.explain.kernels.shap_kernel`, :mod:`.explain.wlm`).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .explain.kernels import shap_kernel
from .explain.masks import MaskSampler
from .explain.wlm import init_surrogate_weights
from .graph import Graph, from_arrays, hetero_to_homo
from .utils.prng import root_key


class Data:
    """Reference ``Data`` facade (``data.py:19``): holds feat/edge_index and
    exposes the graph transformations."""

    def __init__(self, feat, edge_index):
        self.feat = feat
        self.edge_index = edge_index

    def to_graph(self) -> Graph:
        """Build the native padded Graph from the stored arrays."""
        if isinstance(self.feat, dict):
            g, _info = hetero_to_homo(self.feat, self.edge_index)
            return g
        return from_arrays(self.feat, self.edge_index)

    def preprocess_hetero_graph(self):
        """Mirror of ``data.py:39-93``: returns (graph, hetero_info) — the
        typed-homogeneous form plus pointer metadata (None for homo)."""
        if isinstance(self.feat, dict):
            return hetero_to_homo(self.feat, self.edge_index)
        return self.to_graph(), None

    def element_size(self, problem: str) -> int:
        """Node/edge count for the problem type (reference data.py:363)."""
        g = self.to_graph()
        from .graph import element_size

        return element_size(g, problem)


class Kernel:
    """Reference ``Kernel`` facade (``kernels.py:6``): kernel weights for a
    perturbation mask."""

    def __init__(self, mask):
        self.mask = jnp.asarray(np.asarray(mask, bool))

    def compute(self, normalized: bool = True) -> jax.Array:
        """KernelSHAP weight per mask row (reference kernels.py:115)."""
        return shap_kernel(self.mask, normalized=normalized)


class Mask:
    """Reference ``Mask`` facade (``masks.py:10``): mask generation returning
    the batched mask set (instead of a torch DataLoader)."""

    def __init__(self, feat, edge_index, pathways, params, problem):
        g = Data(feat, edge_index).to_graph()
        from .graph import element_size

        n_el = element_size(g, problem)
        width = g.e_pad if "edge" in problem else g.n_pad
        self._sampler = MaskSampler(n_el, width, dict(params), pathways)
        self._seed = int(dict(params).get("seed", 0))

    def mask_generator(self, key: Optional[jax.Array] = None):
        """Returns (mask [M, S] bool, pathway_rows, batch_size)."""
        if key is None:
            key = root_key(self._seed)
        return self._sampler.sample(key)


class LinearRegression:
    """Reference surrogate facade (``wlm.py:17-61``): a single bias-free
    linear map, as a (init, apply) pair."""

    def __init__(self, num_elements: int, width: Optional[int] = None):
        if not isinstance(num_elements, int):
            raise AssertionError("num_elements must be int")
        self.num_elements = num_elements
        self.width = width or num_elements

    def init(self, key: jax.Array) -> jax.Array:
        """Initialize the surrogate weight vector."""
        return init_surrogate_weights(key, self.width, self.num_elements)

    @staticmethod
    def apply(weights: jax.Array, mask: jax.Array) -> jax.Array:
        """Surrogate forward: mask @ w (reference wlm.py:45)."""
        return mask.astype(jnp.float32) @ weights
