"""Model families: homogeneous GCN stacks and heterogeneous relation dispatch.

These reproduce the *capabilities* of the black-box models the reference
explains (``/root/reference/tests/test_utils.py:10-182``): a GCN backbone with
an MLP head (homogeneous), and a per-relation HeteroConv with sum aggregation
(heterogeneous).  Unlike the reference — which re-runs the user's torch module
once per perturbation batch on a block-diagonal mega-graph — every model here
exposes a pure ``apply(params, x, senders, receivers, edge_weight)`` that is
vmapped over the perturbation axis.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Sequence, Tuple

import jax

from .layers import (
    GATConv,
    GATv2Conv,
    GCNConv,
    GINConv,
    GraphConv,
    Linear,
    RGCNConv,
    SAGEConv,
    relu,
    sigmoid,
)


class GCNNodeModel:
    """GCN conv stack + fully-connected head (sigmoid output).

    Structure-compatible with the reference homo test model ``GCN_homo``
    (``tests/test_utils.py:10-83``): ``conv_channels`` GCNConv+ReLU layers
    followed by ``fc_channels`` Linear+ReLU layers and a final
    Linear+Sigmoid.  ``num_hops == len(conv_channels)``.
    """

    def __init__(
        self,
        in_features: int,
        conv_channels: Sequence[int] = (16,),
        fc_channels: Sequence[int] = (16, 16, 32),
        out_features: int = 1,
        final_activation: Callable = sigmoid,
    ):
        self.in_features = in_features
        self.conv_channels = tuple(conv_channels)
        self.fc_channels = tuple(fc_channels)
        self.out_features = out_features
        self.final_activation = final_activation

        self.convs: List[GCNConv] = []
        prev = in_features
        for c in self.conv_channels:
            self.convs.append(GCNConv(prev, c))
            prev = c
        assert self.fc_channels[0] == self.conv_channels[-1]
        self.fcs: List[Linear] = []
        for i, c in enumerate(self.fc_channels):
            nxt = (
                self.fc_channels[i + 1]
                if i + 1 < len(self.fc_channels)
                else out_features
            )
            self.fcs.append(Linear(c, nxt))

    @property
    def num_hops(self) -> int:
        """Receptive-field depth = number of conv layers (reference model.py:28)."""
        return len(self.convs)

    def init(self, key: jax.Array) -> Dict[str, Any]:
        """Initialize all layer parameters as one pytree."""
        kc = jax.random.split(key, len(self.convs) + len(self.fcs))
        return {
            "conv": [m.init(k) for m, k in zip(self.convs, kc[: len(self.convs)])],
            "fc": [m.init(k) for m, k in zip(self.fcs, kc[len(self.convs) :])],
        }

    def backbone(self, params, x, senders, receivers, edge_weight) -> jax.Array:
        """Conv stack only: per-node hidden representations."""
        for conv, p in zip(self.convs, params["conv"]):
            x = relu(conv.apply(p, x, senders, receivers, edge_weight))
        return x

    def head(self, params, x: jax.Array) -> jax.Array:
        """FC head + final activation on [N, C] representations."""
        n = len(self.fcs)
        for i, (fc, p) in enumerate(zip(self.fcs, params["fc"])):
            x = fc.apply(p, x)
            x = self.final_activation(x) if i == n - 1 else relu(x)
        return x

    def apply(self, params, x, senders, receivers, edge_weight) -> jax.Array:
        """Full per-node output [N, out] (black-box semantics)."""
        h = self.backbone(params, x, senders, receivers, edge_weight)
        return self.head(params, h)

    def apply_query(self, params, x, senders, receivers, edge_weight, query) -> jax.Array:
        """Fast path: conv on the full graph, head on the query row only.

        Saves the reference's wasted FC work — it runs the head on every node
        of every perturbation and then strided-gathers one value
        (``model.py:294-328``)."""
        h = self.backbone(params, x, senders, receivers, edge_weight)
        return self.head(params, h[query][None, :])[0]


class ConvStackNodeModel:
    """Generic black-box node model: any conv stack + FC head.

    This is the documented **custom-model protocol** (reference analogue: any
    PyG module accepted via arity dispatch, ``model.py:62-116``): a model is
    an object with

    * ``num_hops`` — receptive-field depth (the reference infers it by
      counting MessagePassing modules, ``model.py:28-60``),
    * ``apply(params, x, senders, receivers, edge_weight) -> [N, out]`` —
      a pure function where ``edge_weight`` carries both graph validity and
      the perturbation mask (0 = edge absent),
    * optionally ``backbone``/``head`` split so the head runs on the query
      row only (the reference wastes head FLOPs on every node,
      ``model.py:294-328``).

    ``convs`` may mix any layers exposing
    ``apply(params, x, senders, receivers, edge_weight)`` — the built-in
    GCNConv / GATConv / SAGEConv / GINConv or user classes.  Anything
    satisfying this protocol runs through :class:`..adapter.Model` and
    ``Explainer`` unchanged (asserted in tests/test_models.py).
    """

    def __init__(
        self,
        convs: Sequence[Any],
        fc_channels: Sequence[int] = (16, 16, 32),
        out_features: int = 1,
        final_activation: Callable = sigmoid,
    ):
        self.convs = list(convs)
        self.fc_channels = tuple(fc_channels)
        self.out_features = out_features
        self.final_activation = final_activation
        self.fcs: List[Linear] = []
        for i, c in enumerate(self.fc_channels):
            nxt = (
                self.fc_channels[i + 1]
                if i + 1 < len(self.fc_channels)
                else out_features
            )
            self.fcs.append(Linear(c, nxt))

    @property
    def num_hops(self) -> int:
        """Receptive-field depth = number of conv layers."""
        return len(self.convs)

    def init(self, key: jax.Array) -> Dict[str, Any]:
        """Initialize all layer parameters as one pytree."""
        kc = jax.random.split(key, len(self.convs) + len(self.fcs))
        return {
            "conv": [m.init(k) for m, k in zip(self.convs, kc[: len(self.convs)])],
            "fc": [m.init(k) for m, k in zip(self.fcs, kc[len(self.convs) :])],
        }

    def backbone(self, params, x, senders, receivers, edge_weight) -> jax.Array:
        """Conv stack only: per-node hidden representations."""
        for conv, p in zip(self.convs, params["conv"]):
            x = relu(conv.apply(p, x, senders, receivers, edge_weight))
        return x

    def head(self, params, x: jax.Array) -> jax.Array:
        """FC head + final activation."""
        n = len(self.fcs)
        for i, (fc, p) in enumerate(zip(self.fcs, params["fc"])):
            x = fc.apply(p, x)
            x = self.final_activation(x) if i == n - 1 else relu(x)
        return x

    def apply(self, params, x, senders, receivers, edge_weight) -> jax.Array:
        """Full forward: backbone then head (the custom-model protocol)."""
        return self.head(
            params, self.backbone(params, x, senders, receivers, edge_weight)
        )


def gat_node_model(
    in_features: int,
    conv_channels: Sequence[int] = (16,),
    heads: int = 1,
    fc_channels: Sequence[int] = (16, 16, 32),
    out_features: int = 1,
    add_self_loops: bool = True,
    concat: bool = True,
) -> ConvStackNodeModel:
    """Homogeneous GAT stack + FC head (PyG ``GATConv`` defaults: shared
    src/dst linear map imported from one ``lin_src`` weight, unit self-loops
    in the softmax).  ``heads``/``concat`` follow PyG: concatenated heads
    widen the layer output to ``heads * channels``; ``concat=False``
    averages heads."""
    convs = []
    prev = in_features
    for c in conv_channels:
        convs.append(
            GATConv(
                (prev, prev), c, heads=heads,
                add_self_loops=add_self_loops, concat=concat,
            )
        )
        prev = c * heads if concat else c
    return ConvStackNodeModel(convs, fc_channels, out_features)


def gatv2_node_model(
    in_features: int,
    conv_channels: Sequence[int] = (16,),
    heads: int = 1,
    fc_channels: Sequence[int] = (16, 16, 32),
    out_features: int = 1,
    add_self_loops: bool = True,
    concat: bool = True,
    share_weights: bool = False,
) -> ConvStackNodeModel:
    """Homogeneous GATv2 stack + FC head (PyG ``GATv2Conv`` semantics)."""
    convs = []
    prev = in_features
    for c in conv_channels:
        convs.append(
            GATv2Conv(
                (prev, prev), c, heads=heads,
                add_self_loops=add_self_loops, concat=concat,
                share_weights=share_weights,
            )
        )
        prev = c * heads if concat else c
    return ConvStackNodeModel(convs, fc_channels, out_features)


class RGCNNodeModel:
    """Relational-GCN stack + FC head over a typed homogeneous graph.

    Unlike :class:`HeteroGNN` (a dict of per-relation convs, the
    ``HeteroConv`` analogue), this is the PyG ``RGCNConv`` usage pattern:
    one conv per layer handling all relations through a [R, in, out] weight
    tensor, optionally basis-decomposed.  Declares ``typed = True`` so the
    adapter passes ``node_type``/``edge_type`` (the framework's replacement
    for the reference's arity sniffing, ``model.py:104-112``).
    """

    typed = True

    def __init__(
        self,
        in_features: int,
        num_relations: int,
        conv_channels: Sequence[int] = (16,),
        num_bases: int | None = None,
        fc_channels: Sequence[int] = (16, 16, 32),
        out_features: int = 1,
        final_activation: Callable = sigmoid,
    ):
        self.in_features = in_features
        self.num_relations = num_relations
        self.final_activation = final_activation
        self.convs: List[RGCNConv] = []
        prev = in_features
        for c in conv_channels:
            self.convs.append(RGCNConv(prev, c, num_relations, num_bases))
            prev = c
        self.fc_channels = tuple(fc_channels)
        self.out_features = out_features
        self.fcs: List[Linear] = []
        for i, c in enumerate(self.fc_channels):
            nxt = (
                self.fc_channels[i + 1]
                if i + 1 < len(self.fc_channels)
                else out_features
            )
            self.fcs.append(Linear(c, nxt))

    @property
    def num_hops(self) -> int:
        """Receptive-field depth = number of conv layers."""
        return len(self.convs)

    def init(self, key: jax.Array) -> Dict[str, Any]:
        """Initialize all layer parameters as one pytree."""
        kc = jax.random.split(key, len(self.convs) + len(self.fcs))
        return {
            "conv": [m.init(k) for m, k in zip(self.convs, kc[: len(self.convs)])],
            "fc": [m.init(k) for m, k in zip(self.fcs, kc[len(self.convs) :])],
        }

    def backbone(
        self, params, x, senders, receivers, edge_weight, node_type, edge_type
    ) -> jax.Array:
        """Relational conv stack: per-node hidden representations."""
        for conv, p in zip(self.convs, params["conv"]):
            x = relu(
                conv.apply(p, x, senders, receivers, edge_weight, edge_type)
            )
        return x

    def head(self, params, x: jax.Array) -> jax.Array:
        """FC head + final activation."""
        n = len(self.fcs)
        for i, (fc, p) in enumerate(zip(self.fcs, params["fc"])):
            x = fc.apply(p, x)
            x = self.final_activation(x) if i == n - 1 else relu(x)
        return x

    def apply(
        self, params, x, senders, receivers, edge_weight, node_type, edge_type
    ) -> jax.Array:
        """Full typed forward on the homogenized graph."""
        h = self.backbone(
            params, x, senders, receivers, edge_weight, node_type, edge_type
        )
        return self.head(params, h)


def sage_node_model(
    in_features: int,
    conv_channels: Sequence[int] = (16,),
    fc_channels: Sequence[int] = (16, 16, 32),
    out_features: int = 1,
) -> ConvStackNodeModel:
    """GraphSAGE stack + FC head (PyG ``SAGEConv`` mean-aggregation)."""
    convs = []
    prev = in_features
    for c in conv_channels:
        convs.append(SAGEConv(prev, c))
        prev = c
    return ConvStackNodeModel(convs, fc_channels, out_features)


def graph_conv_node_model(
    in_features: int,
    conv_channels: Sequence[int] = (16,),
    fc_channels: Sequence[int] = (16, 16, 32),
    out_features: int = 1,
) -> ConvStackNodeModel:
    """GraphConv stack + FC head (PyG ``GraphConv`` sum-aggregation)."""
    convs = []
    prev = in_features
    for c in conv_channels:
        convs.append(GraphConv(prev, c))
        prev = c
    return ConvStackNodeModel(convs, fc_channels, out_features)


def gin_node_model(
    in_features: int,
    conv_channels: Sequence[int] = (16,),
    mlp_hidden: int = 16,
    fc_channels: Sequence[int] = (16, 16, 32),
    out_features: int = 1,
) -> ConvStackNodeModel:
    """GIN stack + FC head (PyG ``GINConv`` with a 2-layer MLP)."""
    convs = []
    prev = in_features
    for c in conv_channels:
        convs.append(GINConv(prev, c, mlp_channels=(mlp_hidden,)))
        prev = c
    return ConvStackNodeModel(convs, fc_channels, out_features)


class HeteroGNN:
    """Per-relation convs over a typed homogeneous graph, ``aggr='sum'``.

    Equivalent of PyG ``HeteroConv`` (reference hetero model,
    ``tests/test_utils.py:86-182`` and the trained hetero checkpoint whose
    convs are per-relation GCNConvs).  Because edge types are a static vector,
    hetero dispatch is just per-relation edge weighting — the reference's
    per-perturbation Python loop (``model.py:196-249``) has no analogue here.

    ``conv_layers``: list of layers; each layer is a dict
    ``{(src_t, rel, dst_t): conv_module}``.  ``head_node_type``: node type id
    whose representations feed the FC head (the reference uses the first node
    type, ``test_utils.py:176-180``).
    """

    def __init__(
        self,
        node_type_names: Sequence[str],
        conv_layers: Sequence[Dict[Tuple[str, str, str], Any]],
        fc_channels: Sequence[int] = (16, 16, 32),
        out_features: int = 1,
        head_node_type: int = 0,
        final_activation: Callable = sigmoid,
    ):
        self.node_type_names = list(node_type_names)
        self.conv_layers = [dict(layer) for layer in conv_layers]
        self.fc_channels = tuple(fc_channels)
        self.out_features = out_features
        self.head_node_type = head_node_type
        self.final_activation = final_activation
        self.fcs: List[Linear] = []
        for i, c in enumerate(self.fc_channels):
            nxt = (
                self.fc_channels[i + 1]
                if i + 1 < len(self.fc_channels)
                else out_features
            )
            self.fcs.append(Linear(c, nxt))

    @property
    def num_hops(self) -> int:
        """Receptive-field depth (PyG divides by relation count, model.py:57-59)."""
        return len(self.conv_layers)

    @property
    def relations(self) -> List[Tuple[str, str, str]]:
        """Relation keys in layer order."""
        return list(self.conv_layers[0].keys())

    def init(self, key: jax.Array) -> Dict[str, Any]:
        """Initialize per-relation conv + FC head parameters."""
        params_layers = []
        for layer in self.conv_layers:
            ps = {}
            for rel, conv in layer.items():
                key, sub = jax.random.split(key)
                ps["__".join(rel)] = conv.init(sub)
            params_layers.append(ps)
        kf = jax.random.split(key, len(self.fcs))
        return {
            "conv": params_layers,
            "fc": [m.init(k) for m, k in zip(self.fcs, kf)],
        }

    def backbone(
        self, params, x, senders, receivers, edge_weight, node_type, edge_type
    ) -> jax.Array:
        """Per-relation convs summed per node type (HeteroConv aggr='sum')."""
        type_masks = {
            name: (node_type == i) for i, name in enumerate(self.node_type_names)
        }
        for layer, lp in zip(self.conv_layers, params["conv"]):
            out = None
            for ri, (rel, conv) in enumerate(layer.items()):
                rel_w = edge_weight * (edge_type == ri).astype(edge_weight.dtype)
                contrib = conv.apply(
                    lp["__".join(rel)],
                    x,
                    senders,
                    receivers,
                    rel_w,
                    dst_scope=type_masks[rel[-1]],
                )
                out = contrib if out is None else out + contrib
            x = relu(out)
        return x

    def head(self, params, x: jax.Array) -> jax.Array:
        """FC head on the head node type's representations."""
        n = len(self.fcs)
        for i, (fc, p) in enumerate(zip(self.fcs, params["fc"])):
            x = fc.apply(p, x)
            x = self.final_activation(x) if i == n - 1 else relu(x)
        return x

    def apply(
        self, params, x, senders, receivers, edge_weight, node_type, edge_type
    ) -> jax.Array:
        """Full typed forward on the homogenized graph."""
        h = self.backbone(params, x, senders, receivers, edge_weight, node_type, edge_type)
        return self.head(params, h)


def hetero_gcn_for_relations(
    node_type_names: Sequence[str],
    relations: Sequence[Tuple[str, str, str]],
    in_features: int,
    conv_channels: Sequence[int] = (16,),
    fc_channels: Sequence[int] = (16, 16, 32),
    out_features: int = 1,
) -> HeteroGNN:
    """HeteroGNN whose convs are per-relation GCNConvs — the architecture of
    the reference's trained hetero checkpoint
    (``gcn_hetero_1hop_lungCancer.pth.tar``: ``conv.0.convs.<rel>.lin.weight``)."""
    layers = []
    prev = in_features
    for c in conv_channels:
        layers.append({tuple(r): GCNConv(prev, c) for r in relations})
        prev = c
    return HeteroGNN(node_type_names, layers, fc_channels, out_features)


def hetero_sage_for_relations(
    node_type_names: Sequence[str],
    relations: Sequence[Tuple[str, str, str]],
    in_features: int,
    conv_channels: Sequence[int] = (16,),
    fc_channels: Sequence[int] = (16, 16, 32),
    out_features: int = 1,
) -> HeteroGNN:
    """HeteroGNN with per-relation SAGEConvs (PyG ``to_hetero`` of a
    GraphSAGE stack: each relation's mean-aggregate + root transform lands
    on its destination type only, summed across relations — SAGEConv's
    ``dst_scope`` zeroes the root term off-type)."""
    from .layers import SAGEConv

    layers = []
    prev = in_features
    for c in conv_channels:
        layers.append({tuple(r): SAGEConv(prev, c) for r in relations})
        prev = c
    return HeteroGNN(node_type_names, layers, fc_channels, out_features)


def hetero_gat_for_relations(
    node_type_names: Sequence[str],
    relations: Sequence[Tuple[str, str, str]],
    in_features: int,
    conv_channels: Sequence[int] = (2,),
    fc_channels: Sequence[int] = (2, 2, 4),
    out_features: int = 1,
) -> HeteroGNN:
    """HeteroGNN with per-relation GATConvs — the reference hetero *test*
    model (``tests/test_utils.py:86-182``, GATConv((-1,-1), C,
    add_self_loops=False), aggr='sum')."""
    layers = []
    prev = in_features
    for c in conv_channels:
        layers.append(
            {tuple(r): GATConv((prev, prev), c, add_self_loops=False) for r in relations}
        )
        prev = c
    return HeteroGNN(node_type_names, layers, fc_channels, out_features)
