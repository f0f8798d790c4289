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
whole-corpus graphs swap in the large-star/small-star variant, which
this module's exchange already generalizes to).

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
