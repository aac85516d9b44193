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


def hetero_sage_params(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map a HeteroConv-of-SAGEConv state dict to :class:`HeteroGNN` params.

    Torch layout (PyG ``to_hetero`` / HeteroConv of SAGEConv):
    ``conv.{2i}.convs.<src__rel__dst>.lin_l.{weight,bias}`` +
    ``...lin_r.weight`` plus the homogeneous ``fc.*`` head.
    """
    conv_layers = []
    i = 0
    while True:
        prefix = f"conv.{2 * i}.convs."
        rel_keys = sorted(
            {
                k[len(prefix):].split(".")[0]
                for k in sd
                if k.startswith(prefix) and ".lin_l." in k
            }
        )
        if not rel_keys:
            break
        layer = {}
        for rel in rel_keys:
            p = {
                "lin_l": {"weight": _j(sd[f"{prefix}{rel}.lin_l.weight"])},
                "lin_r": {"weight": _j(sd[f"{prefix}{rel}.lin_r.weight"])},
            }
            bk = f"{prefix}{rel}.lin_l.bias"
            if bk in sd:
                p["lin_l"]["bias"] = _j(sd[bk])
            layer[rel] = p
        conv_layers.append(layer)
        i += 1
    fc_params = _fc_params(sd)
    if not conv_layers or not fc_params:
        raise ValueError(
            "state dict does not look like a HeteroConv SAGE stack"
        )
    return {"conv": conv_layers, "fc": fc_params}


def _fc_params(sd: Dict[str, np.ndarray]):
    fc_params = []
    j = 0
    while f"fc.{2 * j}.weight" in sd:
        fc_params.append(
            {"weight": _j(sd[f"fc.{2 * j}.weight"]), "bias": _j(sd[f"fc.{2 * j}.bias"])}
        )
        j += 1
    return fc_params


def gat_node_model_params(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map a homogeneous GAT state dict to :func:`..gnn.gat_node_model`
    params.

    PyG 2.0.4 ``GATConv`` layout: ``conv.{2i}.lin_src.weight`` [H*C, in]
    (shared with ``lin_dst`` for non-bipartite input), ``conv.{2i}.att_src``
    / ``att_dst`` [1, H, C], ``conv.{2i}.bias``; plus the ``fc.*`` head.
    """
    conv_params = []
    i = 0
    while True:
        pre = f"conv.{2 * i}."
        w_key = next(
            (k for k in (pre + "lin_src.weight", pre + "lin.weight") if k in sd),
            None,
        )
        if w_key is None:
            break
        w_src = _j(sd[w_key])
        w_dst = _j(sd.get(pre + "lin_dst.weight", sd[w_key]))
        p = {
            "lin_src": {"weight": w_src},
            "lin_dst": {"weight": w_dst},
            "att_src": _j(sd[pre + "att_src"]),
            "att_dst": _j(sd[pre + "att_dst"]),
        }
        if pre + "bias" in sd:
            p["bias"] = _j(sd[pre + "bias"])
        conv_params.append(p)
        i += 1
    fc = _fc_params(sd)
    if not conv_params or not fc:
        raise ValueError("state dict does not look like a GAT conv+fc stack")
    return {"conv": conv_params, "fc": fc}


def gat_config_from_state_dict(sd: Dict[str, np.ndarray]):
    """Infer per-layer (heads, channels, concat) for a GAT/GATv2 conv stack.

    Heads and channels come from the attention parameter shapes
    (``att_src``/``att`` are [1, H, C]); concat from the final bias length
    ([H*C] concat vs [C] mean) with layer-width chaining as the fallback
    when a layer has no bias.  Lets callers build the matching
    :func:`..gnn.gat_node_model` / :func:`..gnn.gatv2_node_model` without
    hand-specifying the architecture (the reference accepts any module
    as-is via arity dispatch, ``model.py:62-116``).
    """
    layers = []
    i = 0
    while True:
        pre = f"conv.{2 * i}."
        att_key = next(
            (k for k in (pre + "att_src", pre + "att") if k in sd), None
        )
        if att_key is None:
            break
        _, h, c = sd[att_key].shape
        bias = sd.get(pre + "bias")
        if bias is not None:
            concat = bias.shape[0] == h * c or h == 1
        else:
            concat = True
        layers.append({"heads": int(h), "channels": int(c), "concat": concat})
        i += 1
    if not layers:
        raise ValueError("state dict has no GAT-style attention parameters")
    return layers


def gatv2_node_model_params(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map a homogeneous GATv2 state dict to :func:`..gnn.gatv2_node_model`
    params.

    PyG 2.x ``GATv2Conv`` layout: ``conv.{2i}.lin_l.{weight,bias}``,
    ``conv.{2i}.lin_r.{weight,bias}`` (equal to ``lin_l`` when
    ``share_weights``), ``conv.{2i}.att`` [1, H, C], ``conv.{2i}.bias``;
    plus the ``fc.*`` head.
    """
    conv_params = []
    i = 0
    while True:
        pre = f"conv.{2 * i}."
        if pre + "lin_l.weight" not in sd:
            break
        lin_l = {"weight": _j(sd[pre + "lin_l.weight"])}
        if pre + "lin_l.bias" in sd:
            lin_l["bias"] = _j(sd[pre + "lin_l.bias"])
        lin_r = {
            "weight": _j(sd.get(pre + "lin_r.weight", sd[pre + "lin_l.weight"]))
        }
        rb = sd.get(pre + "lin_r.bias", sd.get(pre + "lin_l.bias"))
        if rb is not None:
            lin_r["bias"] = _j(rb)
        p = {"lin_l": lin_l, "lin_r": lin_r, "att": _j(sd[pre + "att"])}
        if pre + "bias" in sd:
            p["bias"] = _j(sd[pre + "bias"])
        conv_params.append(p)
        i += 1
    fc = _fc_params(sd)
    if not conv_params or not fc:
        raise ValueError("state dict does not look like a GATv2 conv+fc stack")
    return {"conv": conv_params, "fc": fc}


def rgcn_node_model_params(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map a homogeneous RGCN state dict to :class:`..gnn.RGCNNodeModel`
    params.

    PyG ``RGCNConv`` layout (NOT nn.Linear-transposed):
    ``conv.{2i}.weight`` [R, in, out] (or [num_bases, in, out] with
    ``conv.{2i}.comp`` [R, num_bases]), ``conv.{2i}.root`` [in, out],
    ``conv.{2i}.bias`` [out]; plus the ``fc.*`` head.
    """
    conv_params = []
    i = 0
    while f"conv.{2 * i}.weight" in sd and f"conv.{2 * i}.root" in sd:
        pre = f"conv.{2 * i}."
        p = {"weight": _j(sd[pre + "weight"]), "root": _j(sd[pre + "root"])}
        if pre + "comp" in sd:
            p["comp"] = _j(sd[pre + "comp"])
        if pre + "bias" in sd:
            p["bias"] = _j(sd[pre + "bias"])
        conv_params.append(p)
        i += 1
    fc = _fc_params(sd)
    if not conv_params or not fc:
        raise ValueError("state dict does not look like an RGCN conv+fc stack")
    return {"conv": conv_params, "fc": fc}


def hetero_gat_params(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map a HeteroConv-of-GATConv state dict (the reference hetero *test*
    architecture, ``/root/reference/tests/test_utils.py:86-182``) to
    :class:`..gnn.HeteroGNN` params: per-relation
    ``conv.{2i}.convs.<src__rel__dst>.{lin_src,lin_dst,att_src,att_dst,bias}``.
    """
    conv_layers = []
    i = 0
    while True:
        prefix = f"conv.{2 * i}.convs."
        rel_keys = sorted(
            {k[len(prefix) :].split(".")[0] for k in sd if k.startswith(prefix)}
        )
        if not rel_keys:
            break
        layer = {}
        for rel in rel_keys:
            rp = f"{prefix}{rel}."
            w_src = _j(sd[rp + "lin_src.weight"])
            p = {
                "lin_src": {"weight": w_src},
                "lin_dst": {
                    "weight": _j(sd.get(rp + "lin_dst.weight", sd[rp + "lin_src.weight"]))
                },
                "att_src": _j(sd[rp + "att_src"]),
                "att_dst": _j(sd[rp + "att_dst"]),
            }
            if rp + "bias" in sd:
                p["bias"] = _j(sd[rp + "bias"])
            layer[rel] = p
        conv_layers.append(layer)
        i += 1
    fc = _fc_params(sd)
    if not conv_layers or not fc:
        raise ValueError("state dict does not look like a HeteroConv GAT stack")
    return {"conv": conv_layers, "fc": fc}


def sage_node_model_params(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """PyG 2.0.4 ``SAGEConv`` layout: ``conv.{2i}.lin_l.{weight,bias}``
    (aggregated neighbours) + ``conv.{2i}.lin_r.weight`` (root)."""
    conv_params = []
    i = 0
    while f"conv.{2 * i}.lin_l.weight" in sd:
        pre = f"conv.{2 * i}."
        p = {
            "lin_l": {"weight": _j(sd[pre + "lin_l.weight"])},
            "lin_r": {"weight": _j(sd[pre + "lin_r.weight"])},
        }
        if pre + "lin_l.bias" in sd:
            p["lin_l"]["bias"] = _j(sd[pre + "lin_l.bias"])
        conv_params.append(p)
        i += 1
    fc = _fc_params(sd)
    if not conv_params or not fc:
        raise ValueError("state dict does not look like a SAGE conv+fc stack")
    return {"conv": conv_params, "fc": fc}


def graph_conv_node_model_params(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """PyG ``GraphConv`` layout: ``conv.{2i}.lin_rel.{weight,bias}``
    (weighted-sum aggregated neighbours) + ``conv.{2i}.lin_root.weight``
    (root, no bias)."""
    conv_params = []
    i = 0
    while f"conv.{2 * i}.lin_rel.weight" in sd:
        pre = f"conv.{2 * i}."
        p = {
            "lin_rel": {"weight": _j(sd[pre + "lin_rel.weight"])},
            "lin_root": {"weight": _j(sd[pre + "lin_root.weight"])},
        }
        if pre + "lin_rel.bias" in sd:
            p["lin_rel"]["bias"] = _j(sd[pre + "lin_rel.bias"])
        conv_params.append(p)
        i += 1
    fc = _fc_params(sd)
    if not conv_params or not fc:
        raise ValueError(
            "state dict does not look like a GraphConv conv+fc stack"
        )
    return {"conv": conv_params, "fc": fc}


def gin_node_model_params(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """PyG ``GINConv`` layout: ``conv.{2i}.nn.{2j}.{weight,bias}`` MLP keys
    plus optional ``conv.{2i}.eps``."""
    conv_params = []
    i = 0
    while f"conv.{2 * i}.nn.0.weight" in sd:
        pre = f"conv.{2 * i}."
        mlp = []
        j = 0
        while f"{pre}nn.{2 * j}.weight" in sd:
            mlp.append(
                {
                    "weight": _j(sd[f"{pre}nn.{2 * j}.weight"]),
                    "bias": _j(sd[f"{pre}nn.{2 * j}.bias"]),
                }
            )
            j += 1
        conv_params.append(
            {"nn": mlp, "eps": _j(sd.get(pre + "eps", np.zeros(())))}
        )
        i += 1
    fc = _fc_params(sd)
    if not conv_params or not fc:
        raise ValueError("state dict does not look like a GIN conv+fc stack")
    return {"conv": conv_params, "fc": fc}


def hetero_relations_from_state_dict(sd: Dict[str, np.ndarray]):
    """Recover the relation tuples encoded in hetero checkpoint keys
    (``src__rel__dst`` naming, PyG ``HeteroConv`` module-dict convention)."""
    prefix = "conv.0.convs."
    rels = sorted({k[len(prefix) :].split(".")[0] for k in sd if k.startswith(prefix)})
    return [tuple(r.split("__")) for r in rels]
