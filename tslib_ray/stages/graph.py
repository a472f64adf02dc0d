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
                         n_parts: int | None = None) -> "rd.Dataset":
    """``(node, label)`` where ``label`` is the smallest node id in the
    node's component. ``edges`` may be directed pairs; they are treated as
    undirected. Isolated nodes keep ``label = node``.

    ``n_parts`` defaults to ~1 partition per 200k state rows (clamped to
    [4, 64]): every round pays two keyed exchanges, so on a small graph a
    fixed 32-way fan-out is pure per-task overhead, while a huge graph
    needs width — sized from the materialized edge/node counts (free
    metadata after the materialize)."""

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
    if n_parts is None:
        n_parts = int(min(64, max(4, (und.count() + labels.count())
                                  // 200_000)))
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


class _CCShard:
    """Actor holding ONE hash partition of the graph: the outgoing edge
    lists of its nodes (sorted-by-src layout) plus their current labels.
    Rounds exchange only (node, label) message arrays — the edges never
    move again after the initial scatter."""

    def __init__(self, n_shards: int, shard_id: int):
        self.n_shards = n_shards
        self.shard_id = shard_id
        self._node_blocks: list = []
        self._edge_blocks: list = []
        self._nodes = np.empty(0, dtype=np.int64)     # sorted
        self._labels = np.empty(0, dtype=np.int64)
        self._esrc = np.empty(0, dtype=np.int64)      # sorted by src
        self._edst = np.empty(0, dtype=np.int64)

    def add_nodes(self, arr: np.ndarray) -> None:
        self._node_blocks.append(np.asarray(arr, dtype=np.int64))

    def add_edges(self, arr: np.ndarray) -> None:
        self._edge_blocks.append(np.asarray(arr, dtype=np.int64))

    def finalize(self) -> int:
        self._nodes = np.unique(np.concatenate(self._node_blocks)) \
            if self._node_blocks else np.empty(0, dtype=np.int64)
        self._labels = self._nodes.copy()
        if self._edge_blocks:
            e = np.concatenate(self._edge_blocks).reshape(-1, 2)
            order = np.argsort(e[:, 0], kind="stable")
            self._esrc, self._edst = np.ascontiguousarray(e[order, 0]), \
                np.ascontiguousarray(e[order, 1])
        self._node_blocks = self._edge_blocks = []
        return int(self._nodes.size)

    def emit(self) -> list:
        """Per-destination-shard (node, candidate_label) message arrays:
        for every outgoing edge, my node's current label proposed to the
        neighbor."""
        if self._esrc.size == 0:
            return [None] * self.n_shards
        lab = self._labels[np.searchsorted(self._nodes, self._esrc)]
        dest = self._edst % self.n_shards
        out = []
        for s in range(self.n_shards):
            m = dest == s
            out.append(np.stack([self._edst[m], lab[m]])
                       if m.any() else None)
        return out

    def absorb(self, *msgs) -> int:
        """Min-merge incoming (node, label) proposals (varargs so the
        caller can pass one ObjectRef per sender and Ray dereferences them
        actor-side — the proposal arrays never touch the driver); returns
        the number of labels that changed this round."""
        real = [m for m in msgs if m is not None]
        if not real or self._nodes.size == 0:
            return 0
        mm = np.concatenate(real, axis=1)
        idx = np.clip(np.searchsorted(self._nodes, mm[0]), 0,
                      self._nodes.size - 1)
        ok = self._nodes[idx] == mm[0]  # drop proposals for unknown nodes
        before = self._labels.copy()
        np.minimum.at(self._labels, idx[ok], mm[1][ok])
        return int((self._labels != before).sum())

    def result(self) -> "pa.Table":
        return pa.table({"node": pa.array(self._nodes),
                         "label": pa.array(self._labels)})


def connected_components_actors(edges: "rd.Dataset", nodes: "rd.Dataset",
                                src: str = "src", dst: str = "dst",
                                node_col: str = "node",
                                n_shards: int = 16,
                                max_rounds: int = 50) -> "rd.Dataset":
    """Connected components with the edge partitions HELD IN ACTORS: the
    undirected edge list is hash-sharded ONCE (a fleet of scatter TASKS,
    one per input block — blocks never pass through the driver), then
    every round moves only the (node, label) proposal arrays between
    shards. The Dataset-only variant (:func:`connected_components`)
    re-shuffles the edge set every round because a Dataset cannot cache a
    partitioned layout across iterations; this is the documented raw-actor
    escape hatch for iterative state (ray_guide: actors for a shared
    mutable index). Semantics are identical (hash-min propagation, same
    fixpoint; parametrized equality in tests/test_round3c.py).

    Partitioning assumption: shard of node = ``node % n_shards`` — applied
    identically to the node and edge streams, so all of a node's state
    lives on exactly one actor."""
    import ray

    shards = [ray.remote(_CCShard).remote(n_shards, s)
              for s in range(n_shards)]

    @ray.remote
    def scatter_nodes(block: pa.Table, handles) -> int:
        v = block[node_col].cast(pa.int64()).to_numpy()
        acks = [handles[s].add_nodes.remote(v[v % n_shards == s])
                for s in range(n_shards)]
        ray.get(acks)
        return len(v)

    @ray.remote
    def scatter_edges(block: pa.Table, handles) -> int:
        u = block[src].cast(pa.int64()).to_numpy()
        w = block[dst].cast(pa.int64()).to_numpy()
        uu = np.concatenate([u, w])
        vv = np.concatenate([w, u])
        dest = uu % n_shards
        acks = [handles[s].add_edges.remote(
            np.stack([uu[m], vv[m]], axis=1).reshape(-1))
            for s in range(n_shards) for m in (dest == s,)]
        ray.get(acks)
        return len(u)

    n_refs = [scatter_nodes.remote(b, shards) for b in
              nodes.select_columns([node_col]).to_arrow_refs()]
    e_refs = [scatter_edges.remote(b, shards) for b in
              edges.select_columns([src, dst]).to_arrow_refs()]
    ray.get(n_refs + e_refs)
    ray.get([sh.finalize.remote() for sh in shards])

    for _ in range(max_rounds):
        # one ref per (sender, receiver): messages flow actor -> actor
        # through the object store; the driver only sees the refs and the
        # per-shard changed COUNTS
        parts = [sh.emit.options(num_returns=n_shards).remote()
                 for sh in shards]
        if n_shards == 1:
            parts = [[p] for p in parts]
        changed = ray.get([
            shards[s].absorb.remote(*[parts[e][s]
                                      for e in range(n_shards)])
            for s in range(n_shards)])
        if sum(changed) == 0:
            break

    @ray.remote
    def copy_out(t: pa.Table) -> pa.Table:
        return t  # re-owned by the task so the table outlives the actor

    import ray.data as rd
    out_refs = [copy_out.remote(sh.result.remote()) for sh in shards]
    ray.get(out_refs)  # materialize before the actor handles go away
    return rd.from_arrow_refs(out_refs)
