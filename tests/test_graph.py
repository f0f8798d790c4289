"""Connected components via min-label propagation (imgray/ops/graph.py)."""

import pyarrow as pa


def _cc(edges, **kw):
    import ray.data

    from imgray.ops.graph import connected_components

    a, b = zip(*edges)
    ds = ray.data.from_arrow(pa.table({
        "a": pa.array(a, type=pa.int64()),
        "b": pa.array(b, type=pa.int64())})).repartition(3)
    out = pa.concat_tables(
        [pa.table(t) for t in connected_components(ds, **kw)
         .iter_batches(batch_format="pyarrow")])
    return dict(zip(out.column("doc_id").to_pylist(),
                    out.column("component").to_pylist()))


def test_two_components(ray_session):
    got = _cc([(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_path_needs_many_iterations(ray_session):
    # a 12-node path: the min label crosses one hop per iteration,
    # exercising the fixpoint loop well past a single exchange
    got = _cc([(i, i + 1) for i in range(11)])
    assert got == {i: 0 for i in range(12)}


def test_duplicate_and_reversed_edges(ray_session):
    got = _cc([(5, 4), (4, 5), (5, 4), (7, 6)])
    assert got == {4: 4, 5: 4, 6: 6, 7: 6}
