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
    """FC-head params at any ModuleList stride (the reference interleaves
    activations, so Linear indices stride by 2 — but any stride works)."""
    fc_params = []
    for j in _conv_indices(sd, "fc."):
        fc_params.append(
            {"weight": _j(sd[f"fc.{j}.weight"]), "bias": _j(sd[f"fc.{j}.bias"])}
        )
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


# ---------------------------------------------------------------------------
# generic walker: any supported state-dict layout -> (model_def, params)
# ---------------------------------------------------------------------------


def _conv_indices(sd: Dict[str, np.ndarray], prefix: str = "conv."):
    """Sorted module indices under ``prefix`` that own parameters (the
    reference models interleave activations in the ModuleList, so indices
    stride by 2 — but any stride is accepted here)."""
    out = set()
    for k in sd:
        if k.startswith(prefix):
            first = k[len(prefix):].split(".")[0]
            if first.isdigit():
                out.add(int(first))
    return sorted(out)


def _layer_family(sd: Dict[str, np.ndarray], pre: str) -> str:
    """Sniff one conv layer's PyG family from its parameter key pattern."""
    if pre + "lin.weight" in sd:
        return "gcn"
    if pre + "att" in sd and pre + "lin_l.weight" in sd:
        return "gatv2"
    if pre + "att_src" in sd or pre + "lin_src.weight" in sd:
        return "gat"
    if pre + "lin_rel.weight" in sd:
        return "graphconv"
    if pre + "nn.0.weight" in sd:
        return "gin"
    if pre + "weight" in sd and pre + "root" in sd:
        return "rgcn"
    if pre + "lin_l.weight" in sd and pre + "lin_r.weight" in sd:
        return "sage"
    known = sorted(k for k in sd if k.startswith(pre))[:6]
    raise ValueError(
        f"unrecognised conv layer layout at {pre!r}: keys {known} match no "
        "supported PyG family (GCN/GAT/GATv2/SAGE/GraphConv/GIN/RGCN)"
    )


def _homo_layer(sd, pre: str, family: str, prev: int):
    """(conv module, conv params, out width) for one homogeneous layer."""
    from .layers import (
        GATConv, GATv2Conv, GCNConv, GINConv, GraphConv, SAGEConv,
    )

    if family == "gcn":
        w = sd[pre + "lin.weight"]
        p = {"weight": _j(w)}
        if pre + "bias" in sd:
            p["bias"] = _j(sd[pre + "bias"])
        return GCNConv(prev, w.shape[0]), p, w.shape[0]
    if family == "gat":
        _, h, c = sd[pre + "att_src"].shape
        w_key = pre + ("lin_src.weight" if pre + "lin_src.weight" in sd
                       else "lin.weight")
        p = {
            "lin_src": {"weight": _j(sd[w_key])},
            "lin_dst": {"weight": _j(sd.get(pre + "lin_dst.weight", sd[w_key]))},
            "att_src": _j(sd[pre + "att_src"]),
            "att_dst": _j(sd[pre + "att_dst"]),
        }
        if pre + "bias" in sd:
            p["bias"] = _j(sd[pre + "bias"])
        concat = True
        if pre + "bias" in sd and h > 1:
            concat = sd[pre + "bias"].shape[0] == h * c
        conv = GATConv((prev, prev), c, heads=h, concat=concat)
        return conv, p, h * c if concat else c
    if family == "gatv2":
        _, h, c = sd[pre + "att"].shape
        share = pre + "lin_r.weight" not in sd
        lin_l = {"weight": _j(sd[pre + "lin_l.weight"])}
        if pre + "lin_l.bias" in sd:
            lin_l["bias"] = _j(sd[pre + "lin_l.bias"])
        lin_r = {"weight": _j(sd.get(pre + "lin_r.weight", sd[pre + "lin_l.weight"]))}
        rb = sd.get(pre + "lin_r.bias", sd.get(pre + "lin_l.bias"))
        if rb is not None:
            lin_r["bias"] = _j(rb)
        p = {"lin_l": lin_l, "lin_r": lin_r, "att": _j(sd[pre + "att"])}
        if pre + "bias" in sd:
            p["bias"] = _j(sd[pre + "bias"])
        concat = True
        if pre + "bias" in sd and h > 1:
            concat = sd[pre + "bias"].shape[0] == h * c
        conv = GATv2Conv((prev, prev), c, heads=h, concat=concat,
                         share_weights=share)
        return conv, p, h * c if concat else c
    if family == "sage":
        w = sd[pre + "lin_l.weight"]
        p = {
            "lin_l": {"weight": _j(w)},
            "lin_r": {"weight": _j(sd[pre + "lin_r.weight"])},
        }
        if pre + "lin_l.bias" in sd:
            p["lin_l"]["bias"] = _j(sd[pre + "lin_l.bias"])
        return SAGEConv(prev, w.shape[0]), p, w.shape[0]
    if family == "graphconv":
        w = sd[pre + "lin_rel.weight"]
        p = {
            "lin_rel": {"weight": _j(w)},
            "lin_root": {"weight": _j(sd[pre + "lin_root.weight"])},
        }
        if pre + "lin_rel.bias" in sd:
            p["lin_rel"]["bias"] = _j(sd[pre + "lin_rel.bias"])
        return GraphConv(prev, w.shape[0]), p, w.shape[0]
    if family == "gin":
        mlp, widths = [], []
        for j in _conv_indices(sd, pre + "nn."):
            mlp.append({
                "weight": _j(sd[f"{pre}nn.{j}.weight"]),
                "bias": _j(sd[f"{pre}nn.{j}.bias"]),
            })
            widths.append(sd[f"{pre}nn.{j}.weight"].shape[0])
        p = {"nn": mlp, "eps": _j(sd.get(pre + "eps", np.zeros(())))}
        conv = GINConv(prev, widths[-1], mlp_channels=tuple(widths[:-1]))
        return conv, p, widths[-1]
    raise ValueError(f"unsupported homogeneous family {family!r}")


def import_any(sd: Dict[str, np.ndarray]):
    """Generic torch state-dict walker: sniff the architecture and return a
    ready ``(model_def, params)`` pair.

    The reference explains *any* PyG module via arity dispatch
    (``/root/reference/src/pathway_explanations/model.py:62-116``); this is
    the framework's equivalent accept-anything surface for the checkpoint
    formats the reference documents (``README.md:155-156``).  Per-layer conv
    families are sniffed from parameter key patterns (``lin.weight`` vs
    ``lin_l/lin_r`` vs ``att``/``att_src`` vs ``lin_rel/lin_root`` vs
    ``nn.{j}`` vs ``weight``+``root``) and composed — mixed stacks
    (e.g. GCN then SAGE) build a :class:`..gnn.ConvStackNodeModel`;
    all-GCN stacks build :class:`..gnn.GCNNodeModel` (the dense fast-path
    engine); ``.convs.<src__rel__dst>.`` keys build a
    :class:`..gnn.HeteroGNN`; ``weight``+``root``+``comp`` builds
    :class:`..gnn.RGCNNodeModel`.  Unknown layouts raise a loud
    ``ValueError`` naming the offending keys.
    """
    from .gnn import (
        ConvStackNodeModel, GCNNodeModel, HeteroGNN, RGCNNodeModel,
    )
    from .layers import GATConv, GCNConv, SAGEConv

    fc = _fc_params(sd)
    if not fc:
        raise ValueError(
            "state dict has no fc.{2j}.weight head — not a supported "
            "conv+fc checkpoint layout"
        )
    fc_channels = tuple(int(p["weight"].shape[1]) for p in fc)
    out_features = int(fc[-1]["weight"].shape[0])

    conv_idx = _conv_indices(sd)
    if not conv_idx:
        raise ValueError("state dict has no conv.{i}.* parameters")

    # hetero: HeteroConv module-dict keys
    if any(k.startswith(f"conv.{conv_idx[0]}.convs.") for k in sd):
        relations = hetero_relations_from_state_dict(sd)
        ntypes = sorted({r[0] for r in relations} | {r[-1] for r in relations})
        layers, params_layers = [], []
        prev = None
        for ci in conv_idx:
            prefix = f"conv.{ci}.convs."
            rel_keys = sorted({
                k[len(prefix):].split(".")[0]
                for k in sd if k.startswith(prefix)
            })
            if not rel_keys:
                raise ValueError(f"hetero layer conv.{ci} has no relations")
            layer, pl_ = {}, {}
            width = None
            for rel in rel_keys:
                rp = prefix + rel + "."
                fam = _layer_family(sd, rp)
                rel_t = tuple(rel.split("__"))
                if fam == "gcn":
                    w = sd[rp + "lin.weight"]
                    prev_r = prev if prev is not None else w.shape[1]
                    layer[rel_t] = GCNConv(prev_r, w.shape[0])
                    p = {"weight": _j(w)}
                    if rp + "bias" in sd:
                        p["bias"] = _j(sd[rp + "bias"])
                    pl_[rel] = p
                    width = w.shape[0]
                elif fam == "sage":
                    w = sd[rp + "lin_l.weight"]
                    prev_r = prev if prev is not None else w.shape[1]
                    layer[rel_t] = SAGEConv(prev_r, w.shape[0])
                    p = {
                        "lin_l": {"weight": _j(w)},
                        "lin_r": {"weight": _j(sd[rp + "lin_r.weight"])},
                    }
                    if rp + "lin_l.bias" in sd:
                        p["lin_l"]["bias"] = _j(sd[rp + "lin_l.bias"])
                    pl_[rel] = p
                    width = w.shape[0]
                elif fam == "gat":
                    _, h, c = sd[rp + "att_src"].shape
                    w_src = sd[rp + "lin_src.weight"]
                    prev_r = prev if prev is not None else w_src.shape[1]
                    layer[rel_t] = GATConv(
                        (prev_r, prev_r), c, heads=h, add_self_loops=False
                    )
                    p = {
                        "lin_src": {"weight": _j(w_src)},
                        "lin_dst": {"weight": _j(
                            sd.get(rp + "lin_dst.weight", w_src))},
                        "att_src": _j(sd[rp + "att_src"]),
                        "att_dst": _j(sd[rp + "att_dst"]),
                    }
                    if rp + "bias" in sd:
                        p["bias"] = _j(sd[rp + "bias"])
                    pl_[rel] = p
                    width = h * c
                else:
                    raise ValueError(
                        f"hetero relation {rel!r} layer family {fam!r} is "
                        "not supported (GCN/SAGE/GAT per-relation convs are)"
                    )
            layers.append(layer)
            params_layers.append(pl_)
            prev = width
        mdef = HeteroGNN(ntypes, layers, fc_channels, out_features)
        return mdef, {"conv": params_layers, "fc": fc}

    families = [_layer_family(sd, f"conv.{ci}.") for ci in conv_idx]

    if "rgcn" in set(families):
        if set(families) != {"rgcn"}:
            raise ValueError(
                "RGCN layers cannot mix with other conv families "
                f"(found {families})"
            )
        params = rgcn_node_model_params(sd)
        w0 = sd[f"conv.{conv_idx[0]}.weight"]
        comp = sd.get(f"conv.{conv_idx[0]}.comp")
        num_rel = comp.shape[0] if comp is not None else w0.shape[0]
        channels = tuple(
            int(sd[f"conv.{ci}.weight"].shape[2]) for ci in conv_idx
        )
        mdef = RGCNNodeModel(
            int(w0.shape[1]), int(num_rel), conv_channels=channels,
            num_bases=int(comp.shape[1]) if comp is not None else None,
            fc_channels=fc_channels, out_features=out_features,
        )
        return mdef, params

    if set(families) == {"gcn"}:
        params = gcn_node_model_params(sd)
        channels = tuple(int(p["weight"].shape[0]) for p in params["conv"])
        in_features = int(params["conv"][0]["weight"].shape[1])
        mdef = GCNNodeModel(
            in_features, conv_channels=channels, fc_channels=fc_channels,
            out_features=out_features,
        )
        return mdef, params

    convs, conv_params = [], []
    first_pre = f"conv.{conv_idx[0]}."
    first_w = next(
        (sd[first_pre + k] for k in (
            "lin.weight", "lin_src.weight", "lin_l.weight",
            "lin_rel.weight", "nn.0.weight",
        ) if first_pre + k in sd),
        None,
    )
    prev = int(first_w.shape[1])
    for ci, fam in zip(conv_idx, families):
        conv, p, prev = _homo_layer(sd, f"conv.{ci}.", fam, prev)
        convs.append(conv)
        conv_params.append(p)
    mdef = ConvStackNodeModel(convs, fc_channels, out_features)
    return mdef, {"conv": conv_params, "fc": fc}
