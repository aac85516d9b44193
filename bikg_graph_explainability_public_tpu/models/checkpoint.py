"""Parameter checkpoint IO.

The reference only *reads* checkpoints (torch ``.pth.tar``; SURVEY §5).  This
framework additionally saves/loads its own parameter pytrees as flat ``.npz``
archives (host-portable, no pickle) and can export back to a torch-style
state dict for interchange with the reference ecosystem.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np
import jax.numpy as jnp


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}."))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}."))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split(".")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_params(path: str, params: Any) -> None:
    """Save a parameter pytree (dicts/lists/arrays) to ``.npz``."""
    np.savez(path, **_flatten(params))


def load_params(path: str) -> Any:
    """Load a parameter pytree saved by :func:`save_params`."""
    with np.load(path) as data:
        return _unflatten({k: data[k] for k in data.files})


def gcn_params_to_torch_state_dict(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Export GCNNodeModel params back to the reference's torch key layout
    (``conv.{2i}.lin.weight`` / ``conv.{2i}.bias`` / ``fc.{2j}.*``) so models
    trained here can round-trip into torch/PyG tooling."""
    sd: Dict[str, np.ndarray] = {}
    for i, p in enumerate(params["conv"]):
        sd[f"conv.{2 * i}.lin.weight"] = np.asarray(p["weight"])
        if "bias" in p:
            sd[f"conv.{2 * i}.bias"] = np.asarray(p["bias"])
    for j, p in enumerate(params["fc"]):
        sd[f"fc.{2 * j}.weight"] = np.asarray(p["weight"])
        sd[f"fc.{2 * j}.bias"] = np.asarray(p["bias"])
    return sd
