"""Explainer orchestrator (reference L6, ``src/pathway_explanations/explainer.py``).

Public surface mirrors the reference: construct with (feat, edge_index, model,
params, names, pathways, pathway_names, element_type, problem, node_types,
edge_types), call ``run(element, times)``, receive two sorted pandas
DataFrames.  Internally everything is the TPU-native pipeline: padded
subgraphs, vmapped masked forwards, scan-compiled surrogate training.

Reference quirk fixed by design (SURVEY §7.3): the reference seeds its RNGs
only when ``times == 1`` (``explainer.py:341-343``) so multi-repeat runs are
irreproducible; here the repeat index is folded into a counter-based PRNG key
— reproducible runs *and* distinct repeats.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np
import pandas as pd

from ..graph import (
    element_size,
    from_arrays,
    hetero_names_to_homo,
    hetero_to_homo,
)
from ..models.adapter import Model
from ..ops.khop import extract_khop_subgraph
from ..utils.prng import repeat_split_key_data
from .masks import MaskSampler
from .pathways import Pathways
from .wlm import train_model, train_model_repeats


def set_seed(seed: int = 100) -> jax.Array:
    """API-parity shim for the reference's global seeding
    (``explainer.py:14-22``).  JAX randomness is functional, so this simply
    returns a root key; the Explainer derives keys from ``params['seed']``."""
    return jax.random.PRNGKey(int(seed))


def extract_index(element, names=None) -> int:
    """Index of the element of interest in ``names`` (reference
    ``explainer.py:191-226``)."""
    if names is None:
        if not isinstance(element, (int, float, np.integer, np.floating)):
            raise AssertionError(
                "No element names have been given and the node name given is not numeric"
            )
        return int(element)
    names_array = np.array(names, dtype=str)
    hits = np.where(names_array == str(element))[0]
    if hits.size == 0:
        raise AssertionError(
            f"Element name '{element}' is not present in the graph"
        )
    return int(hits[0])


def weight_stacking(weights: Sequence[jax.Array]) -> Tuple[np.ndarray, np.ndarray]:
    """Mean/std across repeats (reference ``explainer.py:288-314``; std is
    population std, ``unbiased=False``)."""
    stack = np.stack([np.asarray(w) for w in weights], axis=0)
    return stack.mean(axis=0), stack.std(axis=0)


def config_val_dataframe(mean, std, names) -> pd.DataFrame:
    """Element-score DataFrame (reference ``data.py:650-693``)."""
    df = pd.DataFrame(
        {
            "name": list(names),
            "config_value_mean": np.asarray(mean, np.float64),
            "config_value_std": np.asarray(std, np.float64),
        }
    )
    return df.set_index("name").sort_values(by=["config_value_mean"], ascending=False)


class Explainer:
    """Community-aware GNN explainer.

    Parameters mirror the reference (``explainer.py:25-104``):

    feat / edge_index : arrays ([N,F] / [2,E]) or dicts of them (hetero)
    model : a :class:`..models.adapter.Model` (model definition + params) —
        the "black box" being explained
    params : hyperparameter dict (seed, interpret_samples, epochs, lr,
        l1_lambda, ... — reference ``config/configs.json``)
    names : list of element names, or dict for hetero
    pathways / pathway_names : community structure (None → Shapley mode)
    element_type : node/edge type of the query in hetero graphs
    problem : "node_prediction" | "edge_prediction" | "graph_prediction"
    """

    def __init__(
        self,
        feat,
        edge_index,
        model: Model,
        params: Dict[str, Any],
        names,
        pathways=None,
        pathway_names=None,
        element_type=None,
        problem: str = "node_prediction",
        node_types=None,
        edge_types=None,
    ):
        self.initial_assertions(
            feat, edge_index, model, params, names, pathways, pathway_names,
            element_type, problem,
        )
        self.feat = feat
        self.edge_index = edge_index
        self.model = model
        self.params = params
        self.names = names
        self.pathways = pathways
        self.pathway_names = pathway_names
        self.element_type = element_type
        self.problem = problem.lower().strip()
        self.node_types = node_types
        self.edge_types = edge_types

    @staticmethod
    def initial_assertions(
        feat, edge_index, model, params, names, pathways, pathway_names,
        element_type, problem,
    ) -> None:
        """Input validation (reference ``explainer.py:106-189``)."""
        if pathways is not None:
            assert isinstance(pathways, (list, dict)), "Pathways is not list or dict"
        if pathway_names is not None:
            assert isinstance(
                pathway_names, (list, dict)
            ), "Pathway names is not list or dict"
            assert len(pathway_names) == len(pathways), (
                "Length of list with pathway names and list with pathway indexes "
                "do not match"
            )
        assert isinstance(params, dict) or (
            hasattr(params, "get") and hasattr(params, "__getitem__")
        ), "Hyperparameters given is not dictionary"
        assert isinstance(problem, str), "Problem type given is not string"
        canonical = ("node_prediction", "edge_prediction", "graph_prediction")
        assert problem.lower().strip() in canonical, (
            f"Unknown problem type {problem!r}; expected one of {canonical} "
            "(the reference routes by substring and silently misroutes typos, "
            "explainer.py:162 + pathways.py:210)"
        )
        assert isinstance(names, (list, dict)), "Element names is not list or dict"
        assert isinstance(model, Model), "model must be a Model adapter"
        if element_type is not None:
            assert isinstance(
                element_type, (str, tuple)
            ), "Element type is not string (node) nor tuple (edge)"
            if "node" in problem:
                assert isinstance(feat, dict), "Feature given is not a dict of node types"
                assert element_type in feat, (
                    f"Node type '{element_type}' is not among input node types "
                    "in heterogeneous graph"
                )
            elif "edge" in problem:
                assert isinstance(
                    edge_index, dict
                ), "Edge index given is not a dict of edge index types"
                assert element_type in edge_index, (
                    f"Edge type '{element_type}' is not among input edge types "
                    "in heterogeneous graph"
                )

    def _query_index(self, element, names, hetero_info) -> int:
        """Global index of the query element.

        For heterogeneous node queries with an ``element_type``, the lookup is
        restricted to that type's block (names may repeat across types) and
        offset by the block pointer — the role of the reference's
        ``filter_hetero_names`` (``explainer.py:228-286``), expressed on the
        homogenised index space.
        """
        if (
            hetero_info is not None
            and isinstance(self.element_type, str)
            and "node" in self.problem
        ):
            t = hetero_info.node_type_names.index(self.element_type)
            start = hetero_info.node_pointers[t]
            count = hetero_info.node_counts[t]
            local = extract_index(element, names[start : start + count])
            return start + local
        if (
            hetero_info is not None
            and isinstance(self.element_type, tuple)
            and "edge" in self.problem
        ):
            t = hetero_info.edge_type_names.index(self.element_type)
            start = hetero_info.edge_pointers[t]
            count = hetero_info.edge_counts[t]
            local = extract_index(element, names[start : start + count])
            return start + local
        return extract_index(element, names)

    # ------------------------------------------------------------------
    def _prepare_graph(self):
        """Homogenise (if hetero) and build the padded device graph."""
        if isinstance(self.feat, dict) and isinstance(self.edge_index, dict):
            graph, info = hetero_to_homo(self.feat, self.edge_index)
            names, _name_types = hetero_names_to_homo(self.names)
            return graph, info, names
        graph = from_arrays(
            self.feat,
            self.edge_index,
            node_type=self.node_types,
            edge_type=self.edge_types,
        )
        return graph, None, self.names

    def run(
        self, element, times: int = 1, return_diagnostics: bool = False
    ) -> Tuple[pd.DataFrame, Optional[pd.DataFrame]]:
        """Explain one node/edge/graph prediction.

        Returns (config_val_df, pathway_df) — element scores and
        community-aggregated scores, both sorted descending (reference
        ``explainer.py:316-546``).  With ``return_diagnostics=True`` a third
        dict is returned with per-repeat losses / best epochs and phase
        timings (the reference computes losses but discards them,
        ``explainer.py:502``).
        """
        if "spmm_backend" in self.params:
            from ..ops import spmm

            spmm.set_backend(self.params["spmm_backend"])
        graph, hetero_info, names = self._prepare_graph()

        pathways, pathway_names, pathway_types = self.pathways, self.pathway_names, None
        if pathways is not None:
            pclass = Pathways(pathways, pathway_names)
            pathways, pathway_names, pathway_types = pclass.hetero2homo(
                self.problem,
                hetero_info.node_pointers if hetero_info else None,
                hetero_info.edge_pointers if hetero_info else None,
            )

        sub_pathway = pathways
        sub_pathway_names = pathway_names

        if "graph" not in self.problem:
            relations = hetero_info.num_relations if hetero_info else 0
            n_hops = self.model.get_hops(relations)
            ind = self._query_index(element, names, hetero_info)
            # edge queries seed the BFS at the query edge's RECEIVER node
            # (its prediction is what the masked forwards read).  The
            # reference instead reuses the edge index as a node id
            # (``data.py:358-359`` — its edge path is broken end-to-end,
            # SURVEY §7.3); fixed by design here.
            seed = ind
            if "edge" in self.problem:
                from ..graph import host_view

                seed = int(host_view(graph).receivers[ind])
            # one extra hop, mirroring the reference (data.py:328)
            sub = extract_khop_subgraph(
                graph,
                seed,
                n_hops + 1,
                pad_mode=self.params.get("pad_mode", "pow2") or "pow2",
            )
            sub_graph = sub.graph
            sub_query = sub.query
            kept = np.asarray(sub.parent_nodes[: sub_graph.num_nodes])
            names_array = np.array(names, dtype=str)
            if "edge" in self.problem:
                if len(names_array) < graph.num_edges:
                    raise AssertionError(
                        "edge_prediction requires one name per EDGE "
                        f"(got {len(names_array)} names for "
                        f"{graph.num_edges} edges); node-length name "
                        "lists only fit node/graph problems"
                    )
                kept_edges = np.nonzero(np.asarray(sub.parent_edge_mask))[0]
                sub_names = names_array[kept_edges].tolist()
            else:
                sub_names = names_array[kept].tolist()
            if pathways is not None:
                sub_pathway, sub_pathway_names, _ = Pathways(
                    pathways, pathway_names, pathway_types
                ).comp_graph(sub_names)
        else:
            # graph problems explain the pooled prediction — no query element
            # (reference runs extract_index only for node/edge problems,
            # explainer.py:396-425)
            sub_graph = graph
            sub_names = list(names)
            sub_query = 0

        # communities -> element indices within the computational graph
        sub_pathway_inds = None
        if pathways is not None:
            sub_pclass = Pathways(sub_pathway, sub_pathway_names)
            if len(sub_pathway) and isinstance(sub_pathway[0][0], (int, np.integer)):
                sub_pathway_inds = sub_pathway
            else:
                sub_pathway_inds = sub_pclass.names2inds(sub_names)

        elements = element_size(sub_graph, self.problem)
        width = (
            sub_graph.e_pad if "edge" in self.problem else sub_graph.n_pad
        )
        sampler = MaskSampler(elements, width, self.params, sub_pathway_inds)

        query = None if "graph" in self.problem else int(sub_query)
        seed = int(self.params.get("seed", 0))

        from ..utils.profiling import PhaseTimer

        timer = PhaseTimer()
        config_vals: List[np.ndarray] = []
        diag: Dict[str, Any] = {"losses": [], "best_epoch": []}
        # all repeats' (mask, init) key data in one compiled dispatch —
        # eager per-repeat fold_in/split each cost a device round trip
        kd = repeat_split_key_data(seed, times)  # [T, 2, 2]
        with timer.phase("mask_sampling"):
            sampled = [sampler.sample(kd[i, 0]) for i in range(times)]
        batch_size = sampled[0][2]
        stackable = all(
            s[0].shape == sampled[0][0].shape and s[2] == batch_size
            for s in sampled
        )
        # repeats share one compiled dispatch chain (vmap over the repeat
        # axis) unless the batched [T, M, S] f32 mask stack would exceed 1
        # GiB of device memory — then fall back to the sequential loop
        batched = stackable and (
            times * sampled[0][0].size * 4 <= (1 << 30)
        )
        if batched:
            with timer.phase("surrogate_training"):
                result = train_model_repeats(
                    np.stack([s[0] for s in sampled]),
                    self.model,
                    sub_graph,
                    self.params,
                    self.problem,
                    query,
                    elements,
                    batch_size,
                    kd,
                    chunk_size=self.params.get("forward_chunk", None),
                )
                weights_all = np.asarray(result.weights)[:, :elements]
            config_vals = list(weights_all)
            if return_diagnostics:
                losses = np.asarray(result.losses)
                best = np.asarray(result.best_epoch)
                diag["losses"] = [losses[i] for i in range(times)]
                diag["best_epoch"] = [int(best[i]) for i in range(times)]
        else:
            for i in range(times):
                mask, _tags, bsz = sampled[i][0], sampled[i][1], sampled[i][2]
                with timer.phase("surrogate_training"):
                    result = train_model(
                        mask,
                        self.model,
                        sub_graph,
                        self.params,
                        self.problem,
                        query,
                        elements,
                        bsz,
                        kd[i, 1],
                        chunk_size=self.params.get("forward_chunk", None),
                    )
                    weights = np.asarray(result.weights)[:elements]
                config_vals.append(weights)
                if return_diagnostics:
                    diag["losses"].append(np.asarray(result.losses))
                    diag["best_epoch"].append(int(result.best_epoch))

        mean_cv, std_cv = weight_stacking(config_vals)
        config_val_df = config_val_dataframe(mean_cv, std_cv, sub_names)

        pathway_df = None
        if pathways is not None:
            pathway_df = sub_pclass.aggregate(mean_cv, sub_pathway_inds)

        if return_diagnostics:
            diag["phase_seconds"] = dict(timer.totals)
            diag["num_elements"] = elements
            diag["subgraph_nodes"] = sub_graph.num_nodes
            diag["subgraph_edges"] = sub_graph.num_edges
            return config_val_df, pathway_df, diag
        return config_val_df, pathway_df
