"""Distributed connected components by iterative min-label propagation —
the transitive-closure step that turns verified near-duplicate PAIRS into
duplicate CLUSTERS (pair-based dedup keeps ``min(pair)`` per doc, which can
disagree across a chain a->b->c; cluster dedup keeps one doc per component).

Algorithm (textbook label propagation / "hash-min", cf. Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — their
large-star/small-star variant, :func:`connected_components_stars` below,
is the O(log n)-round upgrade when component DIAMETER is large; near-dup
clusters are shallow, so plain hash-min converges in a handful of rounds
and stays the default):

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


def _small_cc_task(node_refs: list, edge_refs: list, node_col: str,
                   u_col: str, v_col: str):
    """Whole-graph CC in ONE Ray task (NOT on the driver): gated by the
    measured row count, for graphs that fit a single worker's heap — at
    sf-scale inputs the iterative rounds are pure fixed overhead (each
    round = 2 keyed exchanges + a probe, ~2 s of Dataset ops for a
    500-node dup graph). Pointer-doubling min-propagation: O(log n)
    rounds of vectorized numpy, no per-edge Python."""
    import ray

    @ray.remote
    def run(node_col: str, u_col: str, v_col: str, n_nodes: int,
            *tables: pa.Table) -> pa.Table:
        def norm(ts):
            # block refs may surface as pandas (to_arrow_refs passes
            # pandas blocks through) and map_groups emits zero-column
            # empty blocks on empty partitions — normalize both
            out = []
            for t in ts:
                if isinstance(t, pd.DataFrame):
                    t = pa.Table.from_pandas(t, preserve_index=False) \
                        .replace_schema_metadata(None)
                if t.num_rows and t.num_columns:
                    out.append(t)
            return out

        ntabs, etabs = norm(tables[:n_nodes]), norm(tables[n_nodes:])
        nodes = np.unique(np.concatenate(
            [t[node_col].cast(pa.int64()).to_numpy() for t in ntabs])
            if ntabs else [np.empty(0, dtype=np.int64)])
        if etabs:
            u = np.concatenate([t[u_col].cast(pa.int64()).to_numpy()
                                for t in etabs])
            v = np.concatenate([t[v_col].cast(pa.int64()).to_numpy()
                                for t in etabs])
        else:
            u = v = np.empty(0, dtype=np.int64)
        iu = np.clip(np.searchsorted(nodes, u), 0,
                     max(nodes.size - 1, 0))
        iv = np.clip(np.searchsorted(nodes, v), 0,
                     max(nodes.size - 1, 0))
        if nodes.size == 0 and u.size:
            raise ValueError("edge endpoints missing from `nodes`")
        bad = np.concatenate([u[nodes[iu] != u], v[nodes[iv] != v]])
        if bad.size:
            raise ValueError(
                f"edge endpoints missing from `nodes`: "
                f"{np.unique(bad)[:5].tolist()}")
        lab = np.arange(nodes.size, dtype=np.int64)
        while True:
            prev = lab
            lab = lab.copy()
            np.minimum.at(lab, iu, prev[iv])
            np.minimum.at(lab, iv, prev[iu])
            lab = np.minimum(lab, lab[lab])   # pointer doubling
            lab = np.minimum(lab, lab[lab])
            if np.array_equal(lab, prev):
                break
        return pa.table({"node": pa.array(nodes),
                         "label": pa.array(nodes[lab])})

    return run.remote(node_col, u_col, v_col, len(node_refs),
                      *node_refs, *edge_refs)


def connected_components(edges: "rd.Dataset", nodes: "rd.Dataset",
                         src: str = "src", dst: str = "dst",
                         node_col: str = "node", max_rounds: int = 30,
                         n_parts: int | None = None,
                         small_graph_rows: int = 200_000) -> "rd.Dataset":
    """``(node, label)`` where ``label`` is the smallest node id in the
    node's component. ``edges`` may be directed pairs; they are treated as
    undirected. Isolated nodes keep ``label = node``.

    ``n_parts`` defaults to ~1 partition per 200k state rows (clamped to
    [4, 64]): every round pays two keyed exchanges, so on a small graph a
    fixed 32-way fan-out is pure per-task overhead, while a huge graph
    needs width — sized from the materialized edge/node counts (free
    metadata after the materialize). Below ``small_graph_rows`` total
    state rows the whole solve runs in ONE worker task instead
    (:func:`_small_cc_task`) — same output, none of the per-round Dataset
    fixed costs; the distributed rounds are the >heap-scale path."""

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
    total_rows = und.count() + labels.count()
    if total_rows <= small_graph_rows:
        ref = _small_cc_task(nodes.select_columns([node_col])
                             .to_arrow_refs(),
                             und.to_arrow_refs(), node_col, "u", "v")
        return rd.from_arrow_refs([ref])
    if n_parts is None:
        n_parts = int(min(64, max(4, total_rows // 200_000)))
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
            if np.any(lab_u < 0):
                # an edge endpoint with no label row: -1 would win every
                # min and silently poison its whole component (ADVICE r03)
                bad = node_u[lab_u < 0][:5]
                raise ValueError(
                    f"edge endpoints missing from `nodes`: {bad.tolist()} "
                    "— every vertex referenced by an edge must appear in "
                    "the nodes dataset")
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
    else:
        # exhausting max_rounds without hitting the fixpoint means the
        # labels are NOT component minima — failing loudly beats returning
        # silently wrong clusters (ADVICE r03). High-diameter graphs should
        # use connected_components_stars (O(log n) rounds) instead.
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} "
            "rounds; raise max_rounds or use connected_components_stars "
            "for high-diameter graphs")
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
            # every edge src hashed to this shard must have a node row here
            # too, or emit() would index a wrong/out-of-bounds label
            # (ADVICE r03) — validate the precondition loudly
            if self._nodes.size == 0:
                missing = self._esrc
            else:
                idx = np.clip(np.searchsorted(self._nodes, self._esrc), 0,
                              self._nodes.size - 1)
                missing = self._esrc[self._nodes[idx] != self._esrc]
            if missing.size:
                raise ValueError(
                    f"edge endpoints missing from `nodes` on shard "
                    f"{self.shard_id}: {np.unique(missing)[:5].tolist()}")
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


# ---------------------------------------------------------------------------
# large-star / small-star (Kiveris et al., "Connected Components in
# MapReduce and Beyond", SoCC'14) — the O(log n)-round variant for
# HIGH-DIAMETER graphs, where hash-min needs O(diameter) rounds. Public
# algorithm; this is a fresh Ray-Data expression of it (two narrow keyed
# exchanges per round, O(1) driver-side convergence probe).
# ---------------------------------------------------------------------------


def _dedup_pairs_part(t: pa.Table) -> pa.Table:
    """Unique (u, v) rows of one partition — lexsort + boundary mask (no
    64-bit packing, so ids are unconstrained)."""
    u = t["u"].to_numpy()
    v = t["v"].to_numpy()
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    keep = np.r_[True, (u[1:] != u[:-1]) | (v[1:] != v[:-1])]
    return pa.table({"u": pa.array(u[keep]), "v": pa.array(v[keep])})


def connected_components_stars(edges: "rd.Dataset", nodes: "rd.Dataset",
                               src: str = "src", dst: str = "dst",
                               node_col: str = "node", max_rounds: int = 60,
                               n_parts: int | None = None,
                               small_graph_rows: int = 200_000
                               ) -> "rd.Dataset":
    """``(node, label)`` with ``label`` = component minimum, via alternating
    large-star / small-star rounds. Same output contract as
    :func:`connected_components` (tested equal); use this when the dup
    graph CHAINS (crawl corpora): a path of depth 10^3 converges in
    O(log n) rounds here vs 10^3 hash-min rounds.

    Per round: one keyed exchange for the star op (grouped by one
    endpoint, vectorized min/emit inside each partition) and one for the
    global edge dedup that bounds edge-set growth. The driver holds only
    the (count, sum) convergence probe.

    - large-star: per node u with neighborhood G(u), connect every
      STRICTLY LARGER neighbor to m = min(G(u) + {u});
    - small-star: per node u, connect every neighbor <= u (they all are,
      on canonical hi->lo edges) and u itself to the minimum.
    Both emit canonical (bigger, smaller) pairs, so labels only descend.
    """

    def canon(b: pa.Table) -> pa.Table:
        u = b[src].cast(pa.int64()).to_numpy()
        v = b[dst].cast(pa.int64()).to_numpy()
        keep = u != v  # self-loops carry no connectivity
        u, v = u[keep], v[keep]
        return pa.table({"u": pa.array(np.maximum(u, v)),
                         "v": pa.array(np.minimum(u, v))})

    def seg_min_emit(t: pa.Table, large: bool) -> pa.Table:
        """One partition of the star op: rows (x, y) grouped by x; per
        x-segment m = min(min(y), x); emit large: (y, m) for y > x,
        small: (y, m) for y != m plus (x, m) if x != m."""
        x = t["u"].to_numpy()
        y = t["v"].to_numpy()
        if x.size == 0:
            return pa.table({"u": pa.array([], type=pa.int64()),
                             "v": pa.array([], type=pa.int64())})
        order = np.lexsort((y, x))
        x, y = x[order], y[order]
        starts = np.flatnonzero(np.r_[True, x[1:] != x[:-1]])
        seg = np.cumsum(np.r_[True, x[1:] != x[:-1]]) - 1
        m = np.minimum(np.minimum.reduceat(y, starts), x[starts])
        my = m[seg]
        if large:
            sel = y > x
            out_u, out_v = y[sel], my[sel]
        else:
            sel = y != my
            # the group key itself re-attaches to the min when it is not it
            xs = x[starts]
            xsel = xs != m
            out_u = np.concatenate([y[sel], xs[xsel]])
            out_v = np.concatenate([my[sel], m[xsel]])
        return pa.table({"u": pa.array(out_u), "v": pa.array(out_v)})

    def star(e: "rd.Dataset", large: bool, parts: int) -> "rd.Dataset":
        if large:
            # adjacency view: each canonical edge feeds BOTH endpoints
            def both_dirs(b: pa.Table) -> pa.Table:
                u = b["u"].to_numpy()
                v = b["v"].to_numpy()
                return pa.table({"u": pa.array(np.concatenate([u, v])),
                                 "v": pa.array(np.concatenate([v, u]))})
            e = e.map_batches(both_dirs, batch_format="pyarrow")
        grouped = _add_part(e, "u", parts)
        emitted = grouped.groupby("_part").map_groups(
            lambda t: seg_min_emit(t.drop_columns(["_part"]), large),
            batch_format="pyarrow")
        deduped = _add_part(emitted, "u", parts)
        return deduped.groupby("_part").map_groups(
            lambda t: _dedup_pairs_part(t.drop_columns(["_part"])),
            batch_format="pyarrow")

    e = edges.map_batches(canon, batch_format="pyarrow").materialize()
    # gate on edges AND nodes (matching connected_components): a sparse
    # graph over a corpus-scale node set (10^9 mostly-unique docs) must
    # not funnel every node block into one task (ADVICE r04)
    if e.count() + nodes.count() <= small_graph_rows:
        # same single-task escape hatch as connected_components — the
        # star rounds only pay off past one worker's heap
        ref = _small_cc_task(nodes.select_columns([node_col])
                             .to_arrow_refs(),
                             e.to_arrow_refs(), node_col, "u", "v")
        return rd.from_arrow_refs([ref])
    if n_parts is None:
        n_parts = int(min(64, max(4, e.count() // 200_000)))

    def _edge_digest(ds: "rd.Dataset") -> tuple:
        """Collision-resistant fixpoint probe: (count, wrapped sum of
        per-row 64-bit mixes of (u, v)). Unlike hash-min's label sum, the
        star edge set is NOT monotone, so (count, sum(u), sum(v)) could
        collide between two different edge sets and end the loop early
        with silently wrong labels (ADVICE r04). One O(8B) row per block
        reaches the driver — bounded by block count, not edges."""
        C1, C2 = np.uint64(0x9E3779B97F4A7C15), np.uint64(0xC2B2AE3D27D4EB4F)

        def part(b: pa.Table) -> pa.Table:
            u = b["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
            v = b["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
            x = u * C1 + v * C2
            x ^= x >> np.uint64(30)
            x *= np.uint64(0xBF58476D1CE4E5B9)
            x ^= x >> np.uint64(27)
            with np.errstate(over="ignore"):
                h = np.bitwise_xor.reduce(x) if x.size else np.uint64(0)
                s = x.sum(dtype=np.uint64)
            return pa.table({"n": pa.array([len(b)], pa.int64()),
                             "h": pa.array([int(h)], pa.uint64()),
                             "s": pa.array([int(s)], pa.uint64())})

        rows = ds.map_batches(part, batch_format="pyarrow").take_all()
        n = sum(r["n"] for r in rows)
        hx = 0
        sx = 0
        for r in rows:
            hx ^= int(r["h"])
            sx = (sx + int(r["s"])) & 0xFFFFFFFFFFFFFFFF
        return (n, hx, sx)

    probe = None
    for _ in range(max_rounds):
        e = star(e, large=True, parts=n_parts)
        e = star(e, large=False, parts=n_parts).materialize()
        cur = _edge_digest(e)
        if cur == probe:
            break
        probe = cur
    else:
        raise RuntimeError(
            f"connected_components_stars did not converge in {max_rounds} "
            "rounds")

    # at the fixpoint e is a set of stars (u -> component min). Labels:
    # star members, the roots themselves, and isolated nodes — min per node.
    def edge_labels(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy()
        v = b["v"].to_numpy()
        return pa.table({"node": pa.array(np.concatenate([u, v])),
                         "label": pa.array(np.concatenate([v, v]))})

    def node_rows(b: pa.Table) -> pa.Table:
        return pa.table({"node": b[node_col].cast(pa.int64()),
                         "label": b[node_col].cast(pa.int64())})

    lab = e.map_batches(edge_labels, batch_format="pyarrow").union(
        nodes.map_batches(node_rows, batch_format="pyarrow"))

    def min_part(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy()
        l = t["label"].to_numpy()
        order = np.argsort(node, kind="stable")
        n_s, l_s = node[order], l[order]
        starts = np.flatnonzero(np.r_[True, n_s[1:] != n_s[:-1]])
        return pa.table({
            "node": pa.array(n_s[starts]),
            "label": pa.array(np.minimum.reduceat(l_s, starts))})

    parted = _add_part(lab, "node", n_parts)
    return parted.groupby("_part").map_groups(
        lambda t: min_part(t.drop_columns(["_part"])),
        batch_format="pyarrow")
