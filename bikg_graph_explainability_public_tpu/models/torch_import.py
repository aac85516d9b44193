"""Torch ``.pth.tar`` checkpoint → JAX pytree conversion.

The reference loads user GNN checkpoints saved as dicts with a ``"model"``
state-dict key (``/root/reference/tests/test_utils.py:392-394``,
``README.md:155-156``).  This module imports those state dicts into this
framework's parameter pytrees so forward parity can be asserted with
``allclose`` against the original torch execution.

torch is used only as a file reader on the host; nothing torch touches the
TPU compute path.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np
import jax.numpy as jnp


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a ``.pth.tar`` checkpoint's ``model`` state dict as numpy arrays."""
    import torch

    ck = torch.load(path, map_location="cpu", weights_only=False)
    sd = ck["model"] if isinstance(ck, dict) and "model" in ck else ck
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def _j(a: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(np.asarray(a, np.float32))


def gcn_node_model_params(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map a ``GCN_homo``-layout state dict to :class:`GCNNodeModel` params.

    Torch layout (``tests/test_utils.py:10-83`` + checkpoint inspection):
    ``conv.{2i}.lin.weight`` [out,in], ``conv.{2i}.bias`` for GCNConv layers
    (odd indices are ReLU), ``fc.{2j}.weight``/``fc.{2j}.bias`` for the head.
    """
    conv_params = []
    i = 0
    while f"conv.{2 * i}.lin.weight" in sd:
        p = {"weight": _j(sd[f"conv.{2 * i}.lin.weight"])}
        if f"conv.{2 * i}.bias" in sd:
            p["bias"] = _j(sd[f"conv.{2 * i}.bias"])
        conv_params.append(p)
        i += 1
    fc_params = []
    j = 0
    while f"fc.{2 * j}.weight" in sd:
        fc_params.append(
            {"weight": _j(sd[f"fc.{2 * j}.weight"]), "bias": _j(sd[f"fc.{2 * j}.bias"])}
        )
        j += 1
    if not conv_params or not fc_params:
        raise ValueError("state dict does not look like a GCN conv+fc stack")
    return {"conv": conv_params, "fc": fc_params}


def hetero_gcn_params(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map a HeteroConv-of-GCNConv state dict to :class:`HeteroGNN` params.

    Torch layout (hetero lungCancer checkpoint):
    ``conv.{2i}.convs.<src__rel__dst>.lin.weight`` / ``...bias`` plus the same
    ``fc.*`` head as the homogeneous model.
    """
    conv_layers = []
    i = 0
    while True:
        prefix = f"conv.{2 * i}.convs."
        rel_keys = sorted(
            {
                k[len(prefix) :].split(".")[0]
                for k in sd
                if k.startswith(prefix)
            }
        )
        if not rel_keys:
            break
        layer = {}
        for rel in rel_keys:
            p = {"weight": _j(sd[f"{prefix}{rel}.lin.weight"])}
            bk = f"{prefix}{rel}.bias"
            if bk in sd:
                p["bias"] = _j(sd[bk])
            layer[rel] = p
        conv_layers.append(layer)
        i += 1
    fc_params = []
    j = 0
    while f"fc.{2 * j}.weight" in sd:
        fc_params.append(
            {"weight": _j(sd[f"fc.{2 * j}.weight"]), "bias": _j(sd[f"fc.{2 * j}.bias"])}
        )
        j += 1
    if not conv_layers or not fc_params:
        raise ValueError("state dict does not look like a HeteroConv GCN stack")
    return {"conv": conv_layers, "fc": fc_params}


def hetero_relations_from_state_dict(sd: Dict[str, np.ndarray]):
    """Recover the relation tuples encoded in hetero checkpoint keys
    (``src__rel__dst`` naming, PyG ``HeteroConv`` module-dict convention)."""
    prefix = "conv.0.convs."
    rels = sorted({k[len(prefix) :].split(".")[0] for k in sd if k.startswith(prefix)})
    return [tuple(r.split("__")) for r in rels]
