"""Command-line interface.

The reference *declares* a click CLI entry point that does not exist
(``setup.cfg:88-90`` points at ``graph_interpretability.cli:main`` — dead
cookiecutter scaffolding, SURVEY §2.2).  This is a real one, stdlib-argparse:

    python -m bikg_graph_explainability_public_tpu.cli explain \
        --graph graph.npz --checkpoint model.pth.tar --element 10 \
        [--config configs.json] [--pathways pathways.json] [--times 3] \
        [--out scores.csv]

    python -m bikg_graph_explainability_public_tpu.cli bench
    python -m bikg_graph_explainability_public_tpu.cli version

Graph file (homogeneous): ``.npz`` with ``feat`` [N,F], ``edge_index``
[2,E], optional ``names`` [N] and ``edge_names`` [E] (required for
``edge_prediction`` — edge queries are edge names).
Graph file (heterogeneous): ``.npz`` with per-type ``feat__<type>`` and
per-relation ``edge_index__<src>__<rel>__<dst>`` arrays, optional
``names__<type>`` (the reference enters hetero graphs as dicts,
``data.py:39-93``; this is that surface as files).
Pathways file: JSON ``{"pathways": [[...], ...], "names": [...]}``.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _fail(msg: str) -> "NoReturn":  # noqa: F821
    print(f"error: {msg}", file=sys.stderr)
    raise SystemExit(2)


class GraphFile:
    """Parsed CLI graph file (homogeneous or heterogeneous ``.npz``).

    Homogeneous: arrays ``feat`` [N,F], ``edge_index`` [2,E], optional
    ``names`` [N] and ``edge_names`` [E] (required for edge problems —
    edge queries are edge names, not node names).

    Heterogeneous: per-type arrays ``feat__<type>`` and per-relation
    ``edge_index__<src>__<rel>__<dst>``, optional ``names__<type>``.
    """

    def __init__(self, feat, edge_index, names, edge_names, hetero):
        self.feat = feat
        self.edge_index = edge_index
        self.names = names
        self.edge_names = edge_names
        self.hetero = hetero

    def flat_names(self):
        """Homogenised node-name list (type blocks in dict order)."""
        if not self.hetero:
            return list(self.names)
        out = []
        for t in self.feat:
            out.extend(self.names[t])
        return out


def _load_graph(path: str) -> GraphFile:
    import os

    if not os.path.exists(path):
        _fail(f"graph file not found: {path}")
    data = np.load(path, allow_pickle=True)
    het_feat = {
        k.split("__", 1)[1]: data[k] for k in data.files
        if k.startswith("feat__")
    }
    if het_feat:
        edge_index = {}
        for k in data.files:
            if k.startswith("edge_index__"):
                rel = tuple(k.split("__")[1:])
                if len(rel) != 3:
                    _fail(
                        f"{path}: hetero edge key {k!r} must be "
                        "edge_index__<src>__<rel>__<dst>"
                    )
                edge_index[rel] = data[k]
        if not edge_index:
            _fail(f"{path} has feat__<type> arrays but no edge_index__ keys")
        names = {
            t: (
                [str(x) for x in data[f"names__{t}"]]
                if f"names__{t}" in data
                else [str(i) for i in range(het_feat[t].shape[0])]
            )
            for t in het_feat
        }
        return GraphFile(het_feat, edge_index, names, None, hetero=True)
    if "feat" not in data or "edge_index" not in data:
        _fail(
            f"{path} must contain 'feat' and 'edge_index' arrays (or "
            "hetero 'feat__<type>' / 'edge_index__<src>__<rel>__<dst>')"
        )
    feat = data["feat"]
    edge_index = data["edge_index"]
    if "names" in data:
        names = [str(x) for x in data["names"]]
    else:
        names = [str(i) for i in range(feat.shape[0])]
    edge_names = (
        [str(x) for x in data["edge_names"]] if "edge_names" in data else None
    )
    return GraphFile(feat, edge_index, names, edge_names, hetero=False)


def _load_model(checkpoint: str):
    """Build a Model from a torch checkpoint (homo GCN or HeteroConv)."""
    import os

    import bikg_graph_explainability_public_tpu as px
    from .models.torch_import import (
        gcn_node_model_params,
        hetero_gcn_params,
        hetero_relations_from_state_dict,
        load_state_dict,
    )

    if not os.path.exists(checkpoint):
        _fail(f"checkpoint not found: {checkpoint}")
    sd = load_state_dict(checkpoint)
    if any(k.startswith("conv.0.convs.") for k in sd):
        # HeteroConv-of-GCNConv checkpoint — infer the relation set from keys
        relations = hetero_relations_from_state_dict(sd)
        params = hetero_gcn_params(sd)
        first = next(iter(params["conv"][0].values()))
        node_types = sorted({r[0] for r in relations} | {r[-1] for r in relations})
        model = px.Model(
            px.hetero_gcn_for_relations(
                node_types,
                relations,
                in_features=first["weight"].shape[1],
                conv_channels=tuple(
                    next(iter(layer.values()))["weight"].shape[0]
                    for layer in params["conv"]
                ),
                fc_channels=tuple(p["weight"].shape[1] for p in params["fc"]),
                out_features=params["fc"][-1]["weight"].shape[0],
            ),
            params,
        )
    else:
        params = gcn_node_model_params(sd)
        in_features = params["conv"][0]["weight"].shape[1]
        conv_channels = tuple(p["weight"].shape[0] for p in params["conv"])
        fc_channels = tuple(p["weight"].shape[1] for p in params["fc"])
        model = px.Model(
            px.GCNNodeModel(
                in_features,
                conv_channels=conv_channels,
                fc_channels=fc_channels,
                out_features=params["fc"][-1]["weight"].shape[0],
            ),
            params,
        )
    return model


def _load_pathways(args):
    pathways = pathway_names = None
    if args.pathways:
        with open(args.pathways) as f:
            pw = json.load(f)
        pathways = pw["pathways"]
        pathway_names = pw.get("names")
    return pathways, pathway_names


def cmd_explain(args: argparse.Namespace) -> int:
    """Run one explanation from the command line and print/save the DataFrames."""
    import bikg_graph_explainability_public_tpu as px
    from .config import DEFAULTS, load_config

    gf = _load_graph(args.graph)
    cfg = load_config(args.config) if args.config else load_config(dict(DEFAULTS))
    model = _load_model(args.checkpoint)

    pathways, pathway_names = _load_pathways(args)

    names = gf.names
    if "edge" in args.problem and not gf.hetero:
        # edge queries are EDGE names — node-length name lists would
        # mislabel every row of the output (ADVICE r2)
        if gf.edge_names is None:
            _fail(
                "edge_prediction needs an 'edge_names' array in the graph "
                ".npz (edge queries are edge names, not node names)"
            )
        names = gf.edge_names

    ex = px.Explainer(
        gf.feat,
        gf.edge_index,
        model,
        cfg,
        names,
        pathways=pathways,
        pathway_names=pathway_names,
        problem=args.problem,
    )
    cv_df, pw_df = ex.run(args.element, times=args.times)

    if args.out:
        cv_df.to_csv(args.out)
        print(f"wrote {args.out}")
        if pw_df is not None:
            pw_path = args.out.rsplit(".", 1)[0] + "_pathways.csv"
            pw_df.to_csv(pw_path)
            print(f"wrote {pw_path}")
    else:
        print(cv_df.to_string())
        if pw_df is not None:
            print()
            print(pw_df.to_string())
    return 0


def cmd_explain_batch(args: argparse.Namespace) -> int:
    """Explain many queries in one vmapped program (optionally sharded
    over a device mesh) — the production throughput path."""
    import bikg_graph_explainability_public_tpu as px
    from .config import DEFAULTS, load_config

    gf = _load_graph(args.graph)
    cfg = load_config(args.config) if args.config else load_config(dict(DEFAULTS))
    model = _load_model(args.checkpoint)
    pathways, pathway_names = _load_pathways(args)

    if gf.hetero:
        from .graph import hetero_to_homo

        g, _info = hetero_to_homo(gf.feat, gf.edge_index)
        names = gf.flat_names()
    else:
        g = px.from_arrays(gf.feat, gf.edge_index)
        names = list(gf.names)

    if "edge" in args.problem:
        # edge queries resolve against EDGE names; a node-length name list
        # would crash or mislabel every output row (ADVICE r2)
        if gf.hetero or gf.edge_names is None:
            _fail(
                "edge_prediction needs an 'edge_names' array in a "
                "homogeneous graph .npz (edge queries are edge names)"
            )
        names = gf.edge_names

    name_to_idx = {n: i for i, n in enumerate(names)}
    queries = []
    for el in args.elements.split(","):
        el = el.strip()
        if el not in name_to_idx:
            _fail(f"element {el!r} is not present in the graph")
        queries.append(name_to_idx[el])

    mesh = None
    if args.mesh_devices:
        from .parallel.mesh import make_mesh

        mesh = make_mesh(args.mesh_devices)

    dfs = px.explain_many(
        model, g, queries, cfg.to_dict(), names=names, times=args.times,
        mesh=mesh, pathways=pathways, pathway_names=pathway_names,
        problem=args.problem,
    )
    for el, out in zip(args.elements.split(","), dfs):
        cv_df, pw_df = out if isinstance(out, tuple) else (out, None)
        if args.out:
            path = f"{args.out.rsplit('.', 1)[0]}_{el.strip()}.csv"
            cv_df.to_csv(path)
            print(f"wrote {path}")
            if pw_df is not None:
                pw_path = f"{args.out.rsplit('.', 1)[0]}_{el.strip()}_pathways.csv"
                pw_df.to_csv(pw_path)
                print(f"wrote {pw_path}")
        else:
            print(f"== element {el.strip()}")
            print(cv_df.to_string())
            if pw_df is not None:
                print(pw_df.to_string())
    return 0


def cmd_bench(_args: argparse.Namespace) -> int:
    """Run the repo benchmark (delegates to bench.py main)."""
    import runpy
    import os

    runpy.run_path(
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py"),
        run_name="__main__",
    )
    return 0


def cmd_version(_args: argparse.Namespace) -> int:
    """Print the package version."""
    from .version import get_version

    print(get_version(with_git_hash=True))
    return 0


def main(argv=None) -> int:
    """CLI entry point (the reference declared but never implemented one, setup.cfg:88-90)."""
    p = argparse.ArgumentParser(
        prog="bikg_graph_explainability_public_tpu",
        description="TPU-native community-aware GNN explainability",
    )
    sub = p.add_subparsers(dest="command", required=True)

    pe = sub.add_parser("explain", help="explain one node/edge/graph prediction")
    pe.add_argument("--graph", required=True, help=".npz with feat/edge_index[/names]")
    pe.add_argument("--checkpoint", required=True, help="torch .pth.tar checkpoint")
    pe.add_argument("--element", required=True, help="element name to explain")
    pe.add_argument("--config", help="hyperparameter JSON (reference schema)")
    pe.add_argument("--pathways", help="JSON with pathways/names")
    pe.add_argument(
        "--problem",
        default="node_prediction",
        choices=["node_prediction", "edge_prediction", "graph_prediction"],
    )
    pe.add_argument("--times", type=int, default=1)
    pe.add_argument("--out", help="CSV output path")
    pe.set_defaults(fn=cmd_explain)

    peb = sub.add_parser(
        "explain-batch",
        help="explain many elements in one compiled program (throughput path)",
    )
    peb.add_argument("--graph", required=True, help=".npz with feat/edge_index[/names]")
    peb.add_argument("--checkpoint", required=True, help="torch .pth.tar checkpoint")
    peb.add_argument(
        "--elements", required=True, help="comma-separated element names"
    )
    peb.add_argument("--config", help="hyperparameter JSON (reference schema)")
    peb.add_argument("--pathways", help="JSON with pathways/names")
    peb.add_argument(
        "--problem",
        default="node_prediction",
        choices=["node_prediction", "edge_prediction", "graph_prediction"],
    )
    peb.add_argument("--times", type=int, default=1)
    peb.add_argument(
        "--mesh-devices", type=int, default=0,
        help="shard the query axis over this many devices (0 = no mesh)",
    )
    peb.add_argument("--out", help="CSV output path prefix")
    peb.set_defaults(fn=cmd_explain_batch)

    pb = sub.add_parser("bench", help="run the headline benchmark")
    pb.set_defaults(fn=cmd_bench)

    pv = sub.add_parser("version", help="print version")
    pv.set_defaults(fn=cmd_version)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
