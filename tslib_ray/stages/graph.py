"""Distributed connected components by iterative min-label propagation —
the transitive-closure step that turns verified near-duplicate PAIRS into
duplicate CLUSTERS (pair-based dedup keeps ``min(pair)`` per doc, which can
disagree across a chain a->b->c; cluster dedup keeps one doc per component).

Algorithm (textbook label propagation / "hash-min", cf. Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — their
large-star/small-star variant is the O(log n)-round upgrade when component
DIAMETER is large; near-dup clusters are shallow, so plain hash-min
converges in a handful of rounds):

- state: ``labels(node, label)``, initialized ``label = node``;
- round: every node takes the min of its own label and its neighbors'
  labels — ONE co-partitioned exchange per round
  (edges ⋈ labels by src, then groupby(node).min with the old labels
  unioned in);
- termination: labels only ever decrease, so ``sum(label)`` is a strictly
  decreasing integer until the fixpoint — an O(1)-size convergence probe
  (no driver-side diff of the label table).

Scale notes: per round the exchange carries |E| + |V| narrow int rows; the
driver holds only the running label sum. ``labels`` is re-materialized per
round so the lineage does not grow with iterations.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from .rollup import _add_part


def connected_components(edges: "rd.Dataset", nodes: "rd.Dataset",
                         src: str = "src", dst: str = "dst",
                         node_col: str = "node", max_rounds: int = 30,
                         n_parts: int = 32) -> "rd.Dataset":
    """``(node, label)`` where ``label`` is the smallest node id in the
    node's component. ``edges`` may be directed pairs; they are treated as
    undirected. Isolated nodes keep ``label = node``."""

    def undirect(b: pa.Table) -> pa.Table:
        u = b[src].cast(pa.int64()).to_numpy()
        v = b[dst].cast(pa.int64()).to_numpy()
        return pa.table({"u": pa.array(np.concatenate([u, v])),
                         "v": pa.array(np.concatenate([v, u]))})

    und = edges.map_batches(undirect, batch_format="pyarrow").materialize()

    labels = nodes.map_batches(
        lambda b: pa.table({
            "node": b[node_col].cast(pa.int64()),
            "label": b[node_col].cast(pa.int64())}),
        batch_format="pyarrow").materialize()
    from ray.data.aggregate import Sum
    prev_sum = labels.aggregate(Sum("label", alias_name="s"))["s"]

    for _ in range(max_rounds):
        # neighbor labels: co-partition (edges by u) with (labels by node),
        # emit (v, label_of_u); then min per node with the old labels kept
        def tag_edge(b: pa.Table) -> pa.Table:
            return pa.table({"node": b["u"], "peer": b["v"],
                             "label": pa.array(
                                 np.full(len(b), -1, dtype=np.int64))})

        def tag_label(b: pa.Table) -> pa.Table:
            return pa.table({"node": b["node"],
                             "peer": pa.array(
                                 np.full(len(b), -1, dtype=np.int64)),
                             "label": b["label"]})

        both = und.map_batches(tag_edge, batch_format="pyarrow").union(
            labels.map_batches(tag_label, batch_format="pyarrow"))

        def propagate(t: pa.Table) -> pa.Table:
            node = t["node"].to_numpy()
            peer = t["peer"].to_numpy()
            lab = t["label"].to_numpy()
            is_lab = lab >= 0
            # label of each node within this partition (all rows of a node
            # are co-located: one label row + its outgoing edge rows)
            order = np.argsort(node, kind="stable")
            n_s, l_s = node[order], np.where(is_lab[order], lab[order], -1)
            starts = np.flatnonzero(np.r_[True, n_s[1:] != n_s[:-1]])
            node_u = n_s[starts]
            lab_u = np.maximum.reduceat(l_s, starts)  # the one label row
            # emit (peer, my_label) for edge rows + (node, my_label)
            idx = np.searchsorted(node_u, node)
            out_node = np.concatenate([peer[~is_lab], node_u])
            out_lab = np.concatenate([lab_u[idx][~is_lab], lab_u])
            return pa.table({"node": pa.array(out_node),
                             "label": pa.array(out_lab)})

        parted = _add_part(both, "node", n_parts)
        prop = parted.groupby("_part").map_groups(
            lambda t: propagate(t.drop_columns(["_part"])),
            batch_format="pyarrow")

        def min_part(t: pa.Table) -> pa.Table:
            node = t["node"].to_numpy()
            lab = t["label"].to_numpy()
            order = np.argsort(node, kind="stable")
            n_s, l_s = node[order], lab[order]
            starts = np.flatnonzero(np.r_[True, n_s[1:] != n_s[:-1]])
            return pa.table({
                "node": pa.array(n_s[starts]),
                "label": pa.array(np.minimum.reduceat(l_s, starts))})

        parted2 = _add_part(prop, "node", n_parts)
        labels = parted2.groupby("_part").map_groups(
            lambda t: min_part(t.drop_columns(["_part"])),
            batch_format="pyarrow").materialize()
        cur = labels.aggregate(Sum("label", alias_name="s"))["s"]
        if cur == prev_sum:
            break
        prev_sum = cur
    return labels
