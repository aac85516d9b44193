"""Community ("pathway") layer.

Reference: ``src/pathway_explanations/pathways.py`` (L3).  Ragged community
structure is handled host-side with numpy (it is metadata, not compute); the
per-element expansion used in mask sampling is expressed as a padded segment
table so the device-side sampler stays static-shape (see
:mod:`.masks`).

Reference bug fixed by design (SURVEY §7.3): ``pathways.py:210-213`` compares
``problem == "node"`` although the public API passes ``"node_prediction"`` —
hetero integer-community pointer shifting silently never fires.  Here the
match is by substring.
"""

from __future__ import annotations

import itertools
from typing import List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd


class Pathways:
    """Graph communities and their transformations.

    Params mirror the reference (``pathways.py:8-31``): ``communities`` is a
    list of lists of node names (str) or indices (int) — or a dict of those
    for heterogeneous graphs; ``community_names`` defaults to indices.
    """

    def __init__(
        self,
        communities,
        community_names=None,
        community_types: Optional[np.ndarray] = None,
    ):
        self.communities = communities
        self.community_names = community_names
        self.community_types = community_types
        if self.community_names is None and not isinstance(communities, dict):
            self.community_names = np.arange(len(communities)).tolist()

    # ------------------------------------------------------------------
    # computational-graph filtering (reference pathways.py:33-102)
    # ------------------------------------------------------------------
    def comp_graph(self, names: Sequence) -> Tuple[list, list, Optional[np.ndarray]]:
        """Keep only the part of each community that intersects the
        computational graph; drop empty communities.

        ``np.intersect1d`` string semantics preserved: the surviving elements
        of each community come back sorted lexicographically as strings."""
        names_array = np.array(names, dtype=str)
        sub_pathway, sub_names = [], []
        sub_types: Optional[list] = [] if self.community_types is not None else None
        for i, (community, cname) in enumerate(
            zip(self.communities, self.community_names)
        ):
            common = np.intersect1d(np.array(community, dtype=str), names_array)
            if len(common) > 0:
                sub_pathway.append(common.tolist())
                sub_names.append(cname)
                if sub_types is not None:
                    sub_types.append(self.community_types[i])
        if sub_types is not None:
            sub_types = np.asarray(sub_types)
        return sub_pathway, sub_names, sub_types

    # ------------------------------------------------------------------
    # name -> index conversion (reference pathways.py:104-136)
    # ------------------------------------------------------------------
    def names2inds(self, names: Sequence) -> List[List[int]]:
        """Element-name lists -> index lists against the subgraph's names
        (reference pathways.py:104)."""
        if len(self.communities) and isinstance(self.communities[0][0], (int, np.integer)):
            return self.communities
        inds = []
        names_array = np.array(names, dtype=str)
        for community in self.communities:
            community_array = np.array(community, dtype=str)
            _, ind, _ = np.intersect1d(names_array, community_array, return_indices=True)
            inds.append(ind.tolist())
        return inds

    # ------------------------------------------------------------------
    # hetero -> homo flattening (reference pathways.py:138-232)
    # ------------------------------------------------------------------
    def shift_hetero_pathways(self, pointers: Sequence[int]) -> None:
        """Shift integer communities by per-type node pointers (reference pathways.py:138)."""
        keys = list(self.communities.keys())
        for key, pointer in zip(keys, pointers):
            for i in range(len(self.communities[key])):
                aux = np.array(self.communities[key][i]) + pointer
                self.communities[key][i] = aux.tolist()

    def hetero2homo(
        self,
        problem: str,
        node_pointers: Optional[Sequence[int]] = None,
        edge_pointers: Optional[Sequence[int]] = None,
    ):
        """Flatten a dict of per-type community lists into one list, shifting
        integer communities by the homogenisation pointers."""
        if not isinstance(self.communities, dict):
            return self.communities, self.community_names, None

        keys = list(self.communities.keys())
        first = self.communities[keys[0]][0][0]
        if isinstance(first, (int, float, np.integer, np.floating)):
            if "node" in problem:
                self.shift_hetero_pathways(node_pointers)
            elif "edge" in problem:
                self.shift_hetero_pathways(edge_pointers)

        community_types, homo_communities, homo_community_names = [], [], []
        for cont_key, (key, value) in enumerate(self.communities.items()):
            community_types.append(np.full((len(value),), cont_key, np.int32))
            homo_communities.extend(value)
            homo_community_names.append(self.community_names[key])
        community_types = np.concatenate(community_types)
        homo_community_names = list(
            itertools.chain.from_iterable(homo_community_names)
        )
        return homo_communities, homo_community_names, community_types

    # ------------------------------------------------------------------
    # score aggregation (reference pathways.py:387-429)
    # ------------------------------------------------------------------
    def aggregate(self, config_val, community_inds: Sequence[Sequence[int]]) -> pd.DataFrame:
        """Mean config value per community, sorted descending, NaN dropped."""
        vals = np.asarray(config_val, np.float64)
        # vectorized per-community mean: one bincount over the flattened
        # segment table (the per-community fancy-index loop measured ~1 ms
        # per 32-community query, multiplied by Q in explain_many)
        elements, seg, lengths = segment_table(community_inds)
        sums = np.bincount(
            seg, weights=vals[elements], minlength=len(lengths)
        )
        with np.errstate(invalid="ignore"):
            scores = np.where(lengths > 0, sums / np.maximum(lengths, 1),
                              np.nan)
        # NaN-drop + sort in numpy, ONE DataFrame construction (the previous
        # set_index/sort_values/dropna chain cost ~5 ms per 32-row frame —
        # multiplied by Q queries in explain_many)
        names = np.asarray(list(self.community_names), object)
        keep = ~np.isnan(scores)
        sc, nm = scores[keep], names[keep]
        o = np.argsort(-sc, kind="stable")
        return pd.DataFrame(
            {"score": sc[o]}, index=pd.Index(nm[o], name="name")
        )


def segment_table(
    community_inds: Sequence[Sequence[int]],
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Flatten ragged communities into (elements, segment_ids, lengths).

    This is the device-friendly encoding of the reference's
    ``repeat_interleave`` expansion (``pathways.py:336-385``): a pathway-level
    mask row expands to elements via ``pathway_mask[:, segment_ids]``.
    """
    elements = np.concatenate(
        [np.asarray(c, np.int32) for c in community_inds]
    ) if community_inds else np.zeros((0,), np.int32)
    seg = np.concatenate(
        [np.full((len(c),), i, np.int32) for i, c in enumerate(community_inds)]
    ) if community_inds else np.zeros((0,), np.int32)
    lengths = np.array([len(c) for c in community_inds], np.int32)
    return elements, seg, lengths
