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


# ------------------------------------------- large-star / small-star


def _cc_star(edges, **kw):
    import ray.data

    from imgray.ops.graph import connected_components_star

    a, b = zip(*edges)
    ds = ray.data.from_arrow(pa.table({
        "a": pa.array(a, type=pa.int64()),
        "b": pa.array(b, type=pa.int64())})).repartition(3)
    out = pa.concat_tables(
        [pa.table(t) for t in connected_components_star(ds, **kw)
         .iter_batches(batch_format="pyarrow")])
    return dict(zip(out.column("doc_id").to_pylist(),
                    out.column("component").to_pylist()))


def test_star_matches_propagation_basic(ray_session):
    edges = [(1, 2), (2, 3), (10, 11), (5, 4), (4, 5), (7, 6)]
    assert _cc_star(edges) == _cc(edges)


def test_star_long_path(ray_session):
    # O(log²) contraction must still label a 16-node path exactly
    got = _cc_star([(i, i + 1) for i in range(15)])
    assert got == {i: 0 for i in range(16)}


def test_star_random_graphs_with_planted_hub_match_union_find(ray_session):
    """VERDICT r4 #3 done-criterion: property test vs the driver-side
    union-find oracle on random graphs with a PLANTED HUB (one node
    wired to a large fraction of the others) plus random noise edges —
    the giant-component shape that motivates the star variant."""
    import random

    from imgray.ops.dedup import union_find_groups

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        n = 60
        hub = rng.randrange(n)
        edges = [(hub, v) for v in rng.sample(range(n), 25) if v != hub]
        edges += [(rng.randrange(n), rng.randrange(n)) for _ in range(40)]
        edges = [(a, b) for a, b in edges if a != b]
        want = union_find_groups(edges)
        got = _cc_star(edges)
        assert got == want, f"seed={seed}"


def test_star_empty_edges(ray_session):
    import ray.data

    from imgray.ops.graph import connected_components_star

    ds = ray.data.from_arrow(pa.table({
        "a": pa.array([], type=pa.int64()),
        "b": pa.array([], type=pa.int64())}))
    out = connected_components_star(ds)
    assert out.count() == 0
