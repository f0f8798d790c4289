"""Unit tests for the shuffle semi/anti-joins and the exact
distributed quantile (histogram-refinement) operators."""

import numpy as np
import pyarrow as pa

from imgray.ops.relational import anti_join, exact_quantiles_int, semi_join


def _ds(tbl: pa.Table):
    import ray.data

    return ray.data.from_arrow(tbl)


def test_anti_join_handwritten(ray_session):
    left = _ds(pa.table({
        "k": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "name": ["a", "b", "c", "d", "e"],
    }))
    right = _ds(pa.table({"k": pa.array([2, 4, 4, 9], type=pa.int64())}))
    out = pa.concat_tables(
        [pa.table(b) for b in anti_join(left, right, "k", ["name"])
         .iter_batches(batch_format="pyarrow")])
    rows = sorted(out.to_pylist(), key=lambda r: r["k"])
    assert [(r["k"], r["name"]) for r in rows] == [
        (1, "a"), (3, "c"), (5, "e")]


def test_anti_join_empty_right(ray_session):
    left = _ds(pa.table({"k": pa.array([7], type=pa.int64()),
                         "name": ["x"]}))
    right = _ds(pa.table({"k": pa.array([], type=pa.int64())}))
    out = pa.concat_tables(
        [pa.table(b) for b in anti_join(left, right, "k", ["name"])
         .iter_batches(batch_format="pyarrow")])
    assert out.to_pylist() == [{"k": 7, "name": "x"}]


def test_semi_join_handwritten(ray_session):
    left = _ds(pa.table({
        "k": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "name": ["a", "b", "c", "d", "e"],
    }))
    right = _ds(pa.table({"k": pa.array([2, 4, 4, 9], type=pa.int64())}))
    out = pa.concat_tables(
        [pa.table(b) for b in semi_join(left, right, "k", ["name"])
         .iter_batches(batch_format="pyarrow")])
    rows = sorted(out.to_pylist(), key=lambda r: r["k"])
    assert [(r["k"], r["name"]) for r in rows] == [(2, "b"), (4, "d")]


def test_semi_join_empty_right(ray_session):
    left = _ds(pa.table({"k": pa.array([7], type=pa.int64()),
                         "name": ["x"]}))
    right = _ds(pa.table({"k": pa.array([], type=pa.int64())}))
    out = [pa.table(b) for b in semi_join(left, right, "k", ["name"])
           .iter_batches(batch_format="pyarrow")]
    assert sum(t.num_rows for t in out) == 0


def test_exact_quantiles_small_domain_one_pass(ray_session):
    vals = np.array([5, 1, 9, 3, 7, 3, 2, 8, 6, 4], dtype=np.int64)
    ds = _ds(pa.table({"v": vals}))
    t = exact_quantiles_int(ds, "v", [0.1, 0.5, 1.0])
    rows = {r["q_bp"]: r for r in t.to_pylist()}
    srt = np.sort(vals)
    # k = ceil(q*n): 1, 5, 10
    assert rows[1000]["value"] == srt[0]
    assert rows[5000]["value"] == srt[4]
    assert rows[10000]["value"] == srt[9]
    assert rows[5000]["k"] == 5


def test_exact_quantiles_wide_domain_forces_refinement(ray_session):
    # domain >> 64Ki buckets → bucket width > 1 on pass 1, so the
    # bracket must refine in a second pass
    rng = np.random.RandomState(3)
    vals = rng.randint(0, 2**31, size=5000).astype(np.int64)
    ds = _ds(pa.table({"v": vals}))
    t = exact_quantiles_int(ds, "v", [0.25, 0.5, 0.75, 0.99])
    srt = np.sort(vals)
    for r in t.to_pylist():
        k = r["k"]
        assert r["value"] == srt[k - 1], r


# ----------------------------------------------------- shuffle hash join

def _hj(left, right, key, lcols, rcols, **kw):
    from imgray.ops.relational import hash_join

    tbls = [pa.table(b) for b in
            hash_join(_ds(left), _ds(right), key, lcols, rcols, **kw)
            .iter_batches(batch_format="pyarrow")]
    if not tbls:
        return []
    out = pa.concat_tables(tbls, promote_options="default")
    return sorted(out.to_pylist(),
                  key=lambda r: tuple(str(r[c]) for c in out.column_names))


def test_hash_join_duplicates_cross_product(ray_session):
    left = pa.table({"k": pa.array([1, 1, 2, 3], type=pa.int64()),
                     "lv": ["a", "b", "c", "d"]})
    right = pa.table({"k": pa.array([1, 1, 3, 9], type=pa.int64()),
                      "rv": pa.array([10, 20, 30, 40], type=pa.int64())})
    rows = _hj(left, right, "k", ["lv"], ["rv"])
    # k=1: 2 left x 2 right = 4 rows; k=2 unmatched; k=3: 1x1
    assert [(r["k"], r["lv"], r["rv"]) for r in rows] == [
        (1, "a", 10), (1, "a", 20), (1, "b", 10), (1, "b", 20),
        (3, "d", 30)]


def test_hash_join_empty_sides(ray_session):
    left = pa.table({"k": pa.array([5], type=pa.int64()),
                     "lv": ["x"]})
    empty = pa.table({"k": pa.array([], type=pa.int64()),
                      "rv": pa.array([], type=pa.int64())})
    assert _hj(left, empty, "k", ["lv"], ["rv"]) == []
    # disjoint keys → empty too
    right = pa.table({"k": pa.array([6], type=pa.int64()),
                      "rv": pa.array([1], type=pa.int64())})
    assert _hj(left, right, "k", ["lv"], ["rv"]) == []


def test_hash_join_string_keys(ray_session):
    left = pa.table({"k": ["x", "y", "y"], "lv": pa.array([1, 2, 3],
                                                          type=pa.int64())})
    right = pa.table({"k": ["y", "z"], "rv": pa.array([7, 8],
                                                      type=pa.int64())})
    rows = _hj(left, right, "k", ["lv"], ["rv"], num_partitions=4)
    assert [(r["k"], r["lv"], r["rv"]) for r in rows] == [
        ("y", 2, 7), ("y", 3, 7)]


def test_hash_join_overlapping_payload_rejected(ray_session):
    from imgray.ops.relational import hash_join

    left = _ds(pa.table({"k": pa.array([1], type=pa.int64()),
                         "v": pa.array([1], type=pa.int64())}))
    try:
        hash_join(left, left, "k", ["v"], ["v"])
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_hash_join_left_outer(ray_session):
    left = pa.table({"k": pa.array([1, 2, 3], type=pa.int64()),
                     "lv": ["a", "b", "c"]})
    right = pa.table({"k": pa.array([2, 2], type=pa.int64()),
                      "rv": pa.array([10, 20], type=pa.int64())})
    rows = _hj(left, right, "k", ["lv"], ["rv"], how="left")
    assert [(r["k"], r["lv"], r["rv"]) for r in rows] == [
        (1, "a", None), (2, "b", 10), (2, "b", 20), (3, "c", None)]


def test_hash_join_left_outer_empty_right(ray_session):
    left = pa.table({"k": pa.array([5, 6], type=pa.int64()),
                     "lv": ["x", "y"]})
    empty = pa.table({"k": pa.array([], type=pa.int64()),
                      "rv": pa.array([], type=pa.int64())})
    rows = _hj(left, empty, "k", ["lv"], ["rv"], how="left")
    assert [(r["k"], r["lv"], r["rv"]) for r in rows] == [
        (5, "x", None), (6, "y", None)]


def test_hash_join_bad_how_rejected(ray_session):
    from imgray.ops.relational import hash_join

    left = _ds(pa.table({"k": pa.array([1], type=pa.int64()),
                         "v": pa.array([1], type=pa.int64())}))
    try:
        hash_join(left, left, "k", ["v"], [], how="cross")
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_hash_join_right_outer(ray_session):
    left = pa.table({"k": pa.array([2, 2, 9], type=pa.int64()),
                     "lv": ["a", "b", "c"]})
    right = pa.table({"k": pa.array([1, 2, 3], type=pa.int64()),
                      "rv": pa.array([10, 20, 30], type=pa.int64())})
    rows = _hj(left, right, "k", ["lv"], ["rv"], how="right")
    assert [(r["k"], r["lv"], r["rv"]) for r in rows] == [
        (1, None, 10), (2, "a", 20), (2, "b", 20), (3, None, 30)]


def test_hash_join_right_outer_empty_left(ray_session):
    empty = pa.table({"k": pa.array([], type=pa.int64()),
                      "lv": pa.array([], type=pa.string())})
    right = pa.table({"k": pa.array([4, 5], type=pa.int64()),
                      "rv": pa.array([1, 2], type=pa.int64())})
    rows = _hj(empty, right, "k", ["lv"], ["rv"], how="right")
    assert [(r["k"], r["lv"], r["rv"]) for r in rows] == [
        (4, None, 1), (5, None, 2)]


def test_hash_join_full_outer(ray_session):
    left = pa.table({"k": pa.array([1, 2, 2], type=pa.int64()),
                     "lv": ["a", "b", "c"]})
    right = pa.table({"k": pa.array([2, 3], type=pa.int64()),
                      "rv": pa.array([20, 30], type=pa.int64())})
    rows = _hj(left, right, "k", ["lv"], ["rv"], how="full")
    assert [(r["k"], r["lv"], r["rv"]) for r in rows] == [
        (1, "a", None), (2, "b", 20), (2, "c", 20), (3, None, 30)]


def test_hash_join_full_outer_null_keys_both_survive(ray_session):
    # SQL: null keys never MATCH, but null-key rows of a preserved
    # side still surface unmatched in the outer result
    left = pa.table({"k": pa.array([None, 1], type=pa.int64()),
                     "lv": ["a", "b"]})
    right = pa.table({"k": pa.array([None, 1], type=pa.int64()),
                      "rv": pa.array([10, 20], type=pa.int64())})
    rows = _hj(left, right, "k", ["lv"], ["rv"], how="full")
    null_rows = sorted(((r["lv"], r["rv"]) for r in rows
                        if r["k"] is None), key=lambda t: str(t))
    assert null_rows == [("a", None), (None, 10)]
    assert [(r["k"], r["lv"], r["rv"]) for r in rows
            if r["k"] is not None] == [(1, "b", 20)]


def test_hash_join_outer_bloom_soundness_rejected(ray_session):
    from imgray.ops.relational import hash_join

    ds = _ds(pa.table({"k": pa.array([1], type=pa.int64()),
                       "v": pa.array([1], type=pa.int64())}))
    for how, bloom in (("right", "left"), ("full", "left"),
                       ("full", "right")):
        try:
            hash_join(ds, ds, "k", ["v"], [], how=how, bloom_from=bloom)
            assert False, f"expected ValueError for {how}/{bloom}"
        except ValueError:
            pass


def test_auto_join_right_full_route_to_shuffle(ray_session):
    from imgray.ops.relational import auto_join

    left = pa.table({"k": pa.array([1, 2], type=pa.int64()),
                     "lv": ["a", "b"]})
    right = pa.table({"k": pa.array([2, 3], type=pa.int64()),
                      "rv": pa.array([20, 30], type=pa.int64())})
    out = pa.concat_tables(
        [pa.table(b) for b in
         auto_join(_ds(left), _ds(right), "k", ["lv"], ["rv"], how="full")
         .iter_batches(batch_format="pyarrow")],
        promote_options="default")
    rows = sorted(out.to_pylist(), key=lambda r: (r["k"] is None, r["k"]))
    assert [(r["k"], r["lv"], r["rv"]) for r in rows] == [
        (1, "a", None), (2, "b", 20), (3, None, 30)]


def test_hash_join_composite_key(ray_session):
    left = pa.table({"k1": pa.array([1, 1, 2], type=pa.int64()),
                     "k2": ["x", "y", "x"],
                     "lv": pa.array([10, 11, 12], type=pa.int64())})
    right = pa.table({"k1": pa.array([1, 1, 2, 3], type=pa.int64()),
                      "k2": ["x", "x", "z", "x"],
                      "rv": pa.array([100, 200, 300, 400],
                                     type=pa.int64())})
    rows = _hj(left, right, ["k1", "k2"], ["lv"], ["rv"])
    # only the FULL tuple matches: (1,x) has 1 left x 2 right rows;
    # (1,y), (2,x) unmatched; k1=2/k2=z and k1=3 never match
    assert [(r["k1"], r["k2"], r["lv"], r["rv"]) for r in rows] == [
        (1, "x", 10, 100), (1, "x", 10, 200)]


def test_hash_join_composite_key_left_outer(ray_session):
    left = pa.table({"k1": pa.array([1, 2], type=pa.int64()),
                     "k2": pa.array([7, 8], type=pa.int64()),
                     "lv": ["a", "b"]})
    right = pa.table({"k1": pa.array([1], type=pa.int64()),
                      "k2": pa.array([7], type=pa.int64()),
                      "rv": pa.array([5], type=pa.int64())})
    rows = _hj(left, right, ["k1", "k2"], ["lv"], ["rv"], how="left")
    assert [(r["k1"], r["k2"], r["lv"], r["rv"]) for r in rows] == [
        (1, 7, "a", 5), (2, 8, "b", None)]


def test_hash_join_composite_bloom_rejected(ray_session):
    from imgray.ops.relational import hash_join

    ds = _ds(pa.table({"k1": pa.array([1], type=pa.int64()),
                       "k2": pa.array([1], type=pa.int64()),
                       "v": pa.array([1], type=pa.int64())}))
    try:
        hash_join(ds, ds, ["k1", "k2"], ["v"], [], bloom_from="left")
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_auto_join_composite_broadcast(ray_session):
    from imgray.ops.relational import auto_join

    left = pa.table({"k1": pa.array([1, 2], type=pa.int64()),
                     "k2": ["a", "b"],
                     "lv": pa.array([10, 20], type=pa.int64())})
    right = pa.table({"k1": pa.array([2, 2], type=pa.int64()),
                      "k2": ["b", "c"],
                      "rv": pa.array([7, 8], type=pa.int64())})
    out = pa.concat_tables(
        [pa.table(b) for b in
         auto_join(_ds(left), _ds(right), ["k1", "k2"], ["lv"], ["rv"])
         .iter_batches(batch_format="pyarrow")],
        promote_options="default")
    assert out.to_pylist() == [
        {"k1": 2, "k2": "b", "lv": 20, "rv": 7}]


def test_grouped_mode_tiebreak(ray_session):
    from imgray.ops.relational import grouped_mode_int

    # group "a": 7 and 3 both appear twice → SQL tie-break picks the
    # SMALLER value; group "b": unique mode 5
    t = pa.table({"g": ["a", "a", "a", "a", "b", "b", "b"],
                  "v": pa.array([7, 7, 3, 3, 5, 5, 9],
                                type=pa.int64())})
    out = pa.concat_tables(
        [pa.table(b) for b in grouped_mode_int(_ds(t), "g", "v")
         .iter_batches(batch_format="pyarrow")],
        promote_options="default")
    rows = {r["g"]: (r["mode"], r["n"]) for r in out.to_pylist()}
    assert rows == {"a": (3, 2), "b": (5, 2)}


def test_quantile_cont_interpolates(ray_session):
    from imgray.ops.relational import quantile_cont_int

    # values 0..100: quantile_cont(0.25) = 25, (0.5) = 50 exactly;
    # and with n=4 values [0,10,20,30], q=0.5 → pos 1.5 → 15
    t = pa.table({"v": pa.array(list(range(101)), type=pa.int64())})
    out = quantile_cont_int(_ds(t), "v", [0.25, 0.5]).to_pylist()
    assert [(r["q_bp"], r["value_u"]) for r in out] == [
        (2500, 250000), (5000, 500000)]
    t2 = pa.table({"v": pa.array([30, 0, 20, 10], type=pa.int64())})
    out2 = quantile_cont_int(_ds(t2), "v", [0.5]).to_pylist()
    assert out2 == [{"q_bp": 5000, "value_u": 150000}]


# ------------------------------------------------------- set operations

def _set(fn, a, b, key="k", **kw):
    tbls = [pa.table(x) for x in fn(_ds(a), _ds(b), key, **kw)
            .iter_batches(batch_format="pyarrow")]
    if not tbls:
        return []
    out = pa.concat_tables(tbls, promote_options="default")
    vals = out.column(key).to_pylist()
    return sorted(vals, key=lambda v: (v is None, str(v)))


def test_intersect_keys(ray_session):
    from imgray.ops.relational import intersect_keys

    a = pa.table({"k": pa.array([1, 1, 2, 3, None], type=pa.int64())})
    b = pa.table({"k": pa.array([2, 2, 3, 4], type=pa.int64())})
    assert _set(intersect_keys, a, b) == [2, 3]


def test_except_keys(ray_session):
    from imgray.ops.relational import except_keys

    a = pa.table({"k": pa.array([1, 1, 2, 3], type=pa.int64())})
    b = pa.table({"k": pa.array([2, 4], type=pa.int64())})
    assert _set(except_keys, a, b) == [1, 3]


def test_set_ops_null_is_a_value(ray_session):
    # SQL set ops compare with IS NOT DISTINCT FROM: NULL == NULL
    from imgray.ops.relational import except_keys, intersect_keys

    a = pa.table({"k": pa.array([None, None, 1], type=pa.int64())})
    b = pa.table({"k": pa.array([None, 2], type=pa.int64())})
    assert _set(intersect_keys, a, b) == [None]
    assert _set(except_keys, a, b) == [1]
    c = pa.table({"k": pa.array([2], type=pa.int64())})
    assert _set(except_keys, a, c) == [1, None]


def test_set_ops_string_keys(ray_session):
    from imgray.ops.relational import intersect_keys

    a = pa.table({"k": ["x", "y", "y", "z"]})
    b = pa.table({"k": ["y", "z", "w"]})
    assert _set(intersect_keys, a, b, num_partitions=4) == ["y", "z"]


def test_exact_group_quantiles(ray_session):
    from imgray.ops.relational import exact_group_quantiles_int

    rng = np.random.RandomState(5)
    g = np.repeat(["a", "b", "c"], [100, 57, 3])
    v = rng.randint(0, 2**31, size=160).astype(np.int64)
    ds = _ds(pa.table({"g": g, "v": v}))
    t = exact_group_quantiles_int(ds, "v", "g", [0.25, 0.5, 1.0])
    rows = {(r["g"], r["q_bp"]): r for r in t.to_pylist()}
    import math as m
    for gv in ("a", "b", "c"):
        vals = np.sort(v[g == gv])
        for q, bp in ((0.25, 2500), (0.5, 5000), (1.0, 10000)):
            k = max(1, min(len(vals), m.ceil(q * len(vals))))
            r = rows[(gv, bp)]
            assert r["value"] == vals[k - 1], (gv, q)
            assert r["k"] == k


# ------------------------------------------------- bloom join prefilter

def test_bloom_no_false_negatives_and_low_fpr(ray_session):
    from imgray.ops.relational import bloom_contains, build_bloom

    rng = np.random.RandomState(9)
    present = rng.randint(0, 1 << 40, size=5000).astype(np.int64)
    absent = (rng.randint(0, 1 << 40, size=5000) | (1 << 41)).astype(
        np.int64)
    ds = _ds(pa.table({"k": present})).repartition(4)
    words = build_bloom(ds, "k")
    hit = bloom_contains(words, pa.chunked_array([pa.array(present)]))
    assert hit.all()  # no false negatives, combined across blocks
    fp = bloom_contains(words, pa.chunked_array([pa.array(absent)]))
    assert fp.mean() < 0.01  # 8M bits / 5k keys → tiny FPR


def test_hash_join_bloom_prefilter_identical(ray_session):
    rng = np.random.RandomState(13)
    left = pa.table({
        "k": pa.array(rng.randint(0, 200, size=500), type=pa.int64()),
        "lv": pa.array(rng.randint(0, 10, size=500), type=pa.int64())})
    right = pa.table({
        "k": pa.array(rng.randint(150, 400, size=300), type=pa.int64()),
        "rv": pa.array(rng.randint(0, 10, size=300), type=pa.int64())})
    base = _hj(left, right, "k", ["lv"], ["rv"])
    for side in ("left", "right"):
        assert _hj(left, right, "k", ["lv"], ["rv"],
                   bloom_from=side) == base
    # left outer: bloom from the left only
    basel = _hj(left, right, "k", ["lv"], ["rv"], how="left")
    assert _hj(left, right, "k", ["lv"], ["rv"], how="left",
               bloom_from="left") == basel


def test_hash_join_bloom_right_with_left_outer_rejected(ray_session):
    from imgray.ops.relational import hash_join

    left = _ds(pa.table({"k": pa.array([1], type=pa.int64()),
                         "v": pa.array([1], type=pa.int64())}))
    try:
        hash_join(left, left, "k", ["v"], [], how="left",
                  bloom_from="right")
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_auto_join_picks_broadcast_and_matches_shuffle(ray_session):
    from imgray.ops.relational import auto_join, hash_join

    rng = np.random.RandomState(17)
    left = pa.table({"k": pa.array(rng.randint(0, 50, 300), type=pa.int64()),
                     "lv": pa.array(rng.randint(0, 9, 300), type=pa.int64())})
    right = pa.table({"k": pa.array(rng.randint(25, 75, 40), type=pa.int64()),
                      "rv": pa.array(rng.randint(0, 9, 40), type=pa.int64())})

    def run(fn, **kw):
        tbls = [pa.table(b) for b in
                fn(_ds(left), _ds(right), "k", ["lv"], ["rv"], **kw)
                .iter_batches(batch_format="pyarrow")]
        tbls = [t for t in tbls if t.num_rows]
        rows = ([] if not tbls else
                pa.concat_tables(tbls, promote_options="default").to_pylist())
        return sorted((r["k"], r["lv"], r["rv"]) for r in rows)

    for how in ("inner", "left"):
        bro = run(auto_join, how=how)                      # broadcast path
        shf = run(auto_join, how=how, broadcast_threshold=0)  # forced shuffle
        ref = run(hash_join, how=how)
        assert bro == ref, how
        assert shf == ref, how


def test_auto_join_broadcast_empty_right(ray_session):
    from imgray.ops.relational import auto_join

    left = pa.table({"k": pa.array([1, 2], type=pa.int64()),
                     "lv": ["a", "b"]})
    empty = pa.table({"k": pa.array([], type=pa.int64()),
                      "rv": pa.array([], type=pa.int64())})
    out = [pa.table(b) for b in
           auto_join(_ds(left), _ds(empty), "k", ["lv"], ["rv"])
           .iter_batches(batch_format="pyarrow")]
    assert sum(t.num_rows for t in out) == 0
    out = [pa.table(b) for b in
           auto_join(_ds(left), _ds(empty), "k", ["lv"], ["rv"],
                     how="left").iter_batches(batch_format="pyarrow")]
    rows = sorted(r["k"] for t in out for r in t.to_pylist())
    assert rows == [1, 2]


def test_hash_join_null_keys_deterministic(ray_session):
    # null integer keys must hash deterministically (fill_null path)
    # and, per SQL semantics, never match anything in an inner join
    left = pa.table({"k": pa.array([1, None, 2], type=pa.int64()),
                     "lv": ["a", "b", "c"]})
    right = pa.table({"k": pa.array([None, 2], type=pa.int64()),
                      "rv": pa.array([7, 8], type=pa.int64())})
    rows = _hj(left, right, "k", ["lv"], ["rv"])
    assert [(r["k"], r["lv"], r["rv"]) for r in rows] == [(2, "c", 8)]


# ----------------------------------------------------- skew salting

def _zipf_tables(seed=13):
    rng = np.random.RandomState(seed)
    n = 2000
    # one pathological key = half of all left rows
    k = np.where(rng.rand(n) < 0.5, 7,
                 rng.randint(100, 200, n)).astype(np.int64)
    left = pa.table({"k": pa.array(k),
                     "lv": pa.array(rng.randint(0, 50, n),
                                    type=pa.int64())})
    right = pa.table({
        "k": pa.array(np.r_[7, 7, rng.randint(100, 220, 40)]
                      .astype(np.int64)),
        "rv": pa.array(rng.randint(0, 50, 42), type=pa.int64()),
    })
    return left, right


def test_salted_join_identical_to_unsalted(ray_session):
    left, right = _zipf_tables()
    plain = _hj(left, right, "k", ["lv"], ["rv"], num_partitions=16)
    for how in ("inner", "left"):
        p = _hj(left, right, "k", ["lv"], ["rv"], how=how,
                num_partitions=16)
        s = _hj(left, right, "k", ["lv"], ["rv"], how=how,
                num_partitions=16, salt_hot_keys=4)
        assert p == s, how
    assert len(plain) > 1000  # the hot key fans out for real


def test_salted_join_overdetection_harmless(ray_session):
    # hot_frac so low every key is "hot": pure replication, same result
    left, right = _zipf_tables(seed=21)
    p = _hj(left, right, "k", ["lv"], ["rv"], num_partitions=16)
    s = _hj(left, right, "k", ["lv"], ["rv"], num_partitions=16,
            salt_hot_keys=3, hot_frac=1e-9)
    assert p == s


def test_hot_key_detection_and_spread(ray_session):
    from imgray.ops.relational import (_keys_u64, _salted_parts,
                                       hot_key_hashes)

    left, _ = _zipf_tables()
    hot = hot_key_hashes(_ds(left), ["k"], 0.25)
    h7 = _keys_u64(pa.table({"k": pa.array([7], type=pa.int64())}),
                   ["k"])
    assert int(h7.view(np.int64)[0]) in set(hot.tolist())
    # the hot key's S salts land on >= 2 distinct partitions
    parts = {int(_salted_parts(h7, np.array([s], dtype=np.uint64),
                               16)[0]) for s in range(4)}
    assert len(parts) >= 2


def test_salted_join_invalid_combos_rejected(ray_session):
    from imgray.ops.relational import hash_join

    ds = _ds(pa.table({"k": pa.array([1], type=pa.int64()),
                       "v": pa.array([1], type=pa.int64())}))
    for kw in ({"how": "full", "salt_hot_keys": 4},
               {"how": "right", "salt_hot_keys": 4},
               {"salt_hot_keys": 1},
               {"salt_hot_keys": 4, "post_join": lambda t: t}):
        try:
            hash_join(ds, ds, "k", ["v"], [], **kw)
            assert False, f"expected ValueError for {kw}"
        except ValueError:
            pass


def test_salted_composite_join(ray_session):
    # salting composes with composite keys (hot tuple spread + replicas)
    rng = np.random.RandomState(3)
    n = 600
    hot = rng.rand(n) < 0.5
    k1 = np.where(hot, 7, rng.randint(100, 150, n)).astype(np.int64)
    k2 = np.where(hot, 1, rng.randint(0, 5, n)).astype(np.int64)
    left = pa.table({"k1": pa.array(k1), "k2": pa.array(k2),
                     "lv": pa.array(rng.randint(0, 9, n),
                                    type=pa.int64())})
    right = pa.table({
        "k1": pa.array([7, 7, 120], type=pa.int64()),
        "k2": pa.array([1, 1, 3], type=pa.int64()),
        "rv": pa.array([10, 20, 30], type=pa.int64()),
    })
    plain = _hj(left, right, ["k1", "k2"], ["lv"], ["rv"],
                num_partitions=16)
    salted = _hj(left, right, ["k1", "k2"], ["lv"], ["rv"],
                 num_partitions=16, salt_hot_keys=4)
    assert plain == salted and len(plain) > 500


def test_set_ops_empty_inputs(ray_session):
    from imgray.ops.relational import except_keys, intersect_keys

    a = pa.table({"k": pa.array([1, 2], type=pa.int64())})
    empty = pa.table({"k": pa.array([], type=pa.int64())})
    assert _set(intersect_keys, a, empty) == []
    assert _set(except_keys, a, empty) == [1, 2]
    assert _set(except_keys, empty, a) == []


def _sorted_rows(ds) -> list[tuple]:
    tbls = [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    if not tbls:
        return []
    tbl = pa.concat_tables(tbls)
    return sorted(tuple(r.values()) for r in tbl.to_pylist())


def _asof_inputs(seed: int = 11):
    rng = np.random.default_rng(seed)
    n_a, n_p = 400, 1500
    anchors = pa.table({
        "ak": pa.array(rng.integers(0, 60, n_a), type=pa.int64()),
        "at": pa.array(rng.integers(0, 10_000, n_a), type=pa.int64()),
        "av": pa.array(rng.permutation(n_a).astype(np.int64)),
    })
    probes = pa.table({
        "pk": pa.array(rng.integers(0, 80, n_p), type=pa.int64()),
        "pt": pa.array(rng.integers(0, 10_000, n_p), type=pa.int64()),
        "pid": pa.array(np.arange(n_p, dtype=np.int64)),
    })
    return probes, anchors


def _asof_oracle(probes: pa.Table, anchors: pa.Table) -> list[tuple]:
    """O(n*m) reference: latest anchor at-or-before, min av on ties."""
    out = []
    arows = anchors.to_pylist()
    for p in probes.to_pylist():
        cand = [a for a in arows
                if a["ak"] == p["pk"] and a["at"] <= p["pt"]]
        if not cand:
            continue
        best_t = max(a["at"] for a in cand)
        best = min(a["av"] for a in cand if a["at"] == best_t)
        out.append((p["pid"], best))
    return sorted(out)


def test_merge_asof_broadcast_matches_bruteforce(ray_session):
    from imgray.ops.relational import merge_asof

    probes, anchors = _asof_inputs()
    got = _sorted_rows(merge_asof(
        _ds(probes), _ds(anchors), probe_key="pk", probe_time="pt",
        probe_out="pid", anchor_key="ak", anchor_time="at",
        anchor_val="av", mode="broadcast"))
    assert got == _asof_oracle(probes, anchors)


def test_merge_asof_partitioned_identical_to_broadcast(ray_session):
    """VERDICT r3 #1: the forced hash-partitioned path must produce
    exactly the broadcast path's rows."""
    from imgray.ops.relational import merge_asof

    probes, anchors = _asof_inputs(seed=23)
    kw = dict(probe_key="pk", probe_time="pt", probe_out="pid",
              anchor_key="ak", anchor_time="at", anchor_val="av")
    b = _sorted_rows(merge_asof(_ds(probes), _ds(anchors),
                                mode="broadcast", **kw))
    p = _sorted_rows(merge_asof(_ds(probes), _ds(anchors),
                                mode="partitioned", num_partitions=7,
                                **kw))
    assert p == b and len(b) > 0


def test_merge_asof_auto_threshold_picks_partitioned(ray_session):
    from imgray.ops.relational import merge_asof

    probes, anchors = _asof_inputs(seed=5)
    kw = dict(probe_key="pk", probe_time="pt", probe_out="pid",
              anchor_key="ak", anchor_time="at", anchor_val="av")
    auto = _sorted_rows(merge_asof(_ds(probes), _ds(anchors),
                                   broadcast_threshold=10, **kw))
    assert auto == _asof_oracle(probes, anchors)


def test_merge_asof_empty_anchor_side(ray_session):
    from imgray.ops.relational import merge_asof

    probes, anchors = _asof_inputs()
    for mode in ("broadcast", "partitioned"):
        got = _sorted_rows(merge_asof(
            _ds(probes), _ds(anchors.slice(0, 0)), probe_key="pk",
            probe_time="pt", probe_out="pid", anchor_key="ak",
            anchor_time="at", anchor_val="av", mode=mode))
        assert got == []


def _range_inputs(seed: int = 31):
    rng = np.random.default_rng(seed)
    n_a, n_p = 200, 2000
    anchors = pa.table({
        "ak": pa.array(rng.integers(0, 40, n_a), type=pa.int64()),
        "at": pa.array(rng.integers(0, 5_000, n_a), type=pa.int64()),
        "aid": pa.array(np.arange(n_a, dtype=np.int64)),
    })
    probes = pa.table({
        "pk": pa.array(rng.integers(0, 50, n_p), type=pa.int64()),
        "pt": pa.array(rng.integers(0, 5_000, n_p), type=pa.int64()),
    })
    return probes, anchors


def _range_oracle(probes: pa.Table, anchors: pa.Table,
                  window: int) -> list[tuple]:
    from collections import Counter

    c: Counter = Counter()
    prows = probes.to_pylist()
    for a in anchors.to_pylist():
        for p in prows:
            if p["pk"] == a["ak"] and a["at"] < p["pt"] <= a["at"] + window:
                c[a["aid"]] += 1
    return sorted(c.items())


def test_range_counts_both_modes_match_bruteforce(ray_session):
    from imgray.ops.relational import range_follow_counts

    probes, anchors = _range_inputs()
    want = _range_oracle(probes, anchors, 300)
    kw = dict(probe_key="pk", probe_time="pt", anchor_key="ak",
              anchor_time="at", anchor_id="aid", window=300,
              out_id="aid", out_count="n")
    for mode in ("broadcast", "partitioned"):
        got = _sorted_rows(range_follow_counts(
            _ds(probes), _ds(anchors), mode=mode, **kw))
        assert got == want, mode
    assert len(want) > 0


def test_merge_asof_string_keys_both_modes(ray_session):
    """String join keys ride the object-array kernels; both topologies
    agree with brute force."""
    rng = np.random.default_rng(17)
    n_a, n_p = 150, 600
    anchors = pa.table({
        "ak": pa.array([f"user-{i}" for i in
                        rng.integers(0, 30, n_a)], type=pa.string()),
        "at": pa.array(rng.integers(0, 1000, n_a), type=pa.int64()),
        "av": pa.array(np.arange(n_a, dtype=np.int64)),
    })
    probes = pa.table({
        "pk": pa.array([f"user-{i}" for i in
                        rng.integers(0, 40, n_p)], type=pa.string()),
        "pt": pa.array(rng.integers(0, 1000, n_p), type=pa.int64()),
        "pid": pa.array(np.arange(n_p, dtype=np.int64)),
    })
    want = _asof_oracle(probes, anchors)
    from imgray.ops.relational import merge_asof

    kw = dict(probe_key="pk", probe_time="pt", probe_out="pid",
              anchor_key="ak", anchor_time="at", anchor_val="av")
    for mode in ("broadcast", "partitioned"):
        got = _sorted_rows(merge_asof(_ds(probes), _ds(anchors),
                                      mode=mode, **kw))
        assert got == want, mode
    assert len(want) > 0


def test_range_counts_string_keys_both_modes(ray_session):
    rng = np.random.default_rng(21)
    n_a, n_p = 80, 700
    anchors = pa.table({
        "ak": pa.array([f"s{i}" for i in rng.integers(0, 20, n_a)],
                       type=pa.string()),
        "at": pa.array(rng.integers(0, 500, n_a), type=pa.int64()),
        "aid": pa.array(np.arange(n_a, dtype=np.int64)),
    })
    probes = pa.table({
        "pk": pa.array([f"s{i}" for i in rng.integers(0, 25, n_p)],
                       type=pa.string()),
        "pt": pa.array(rng.integers(0, 500, n_p), type=pa.int64()),
    })
    want = _range_oracle(probes, anchors, 40)
    from imgray.ops.relational import range_follow_counts

    kw = dict(probe_key="pk", probe_time="pt", anchor_key="ak",
              anchor_time="at", anchor_id="aid", window=40,
              out_id="aid", out_count="n")
    for mode in ("broadcast", "partitioned"):
        got = _sorted_rows(range_follow_counts(
            _ds(probes), _ds(anchors), mode=mode, **kw))
        assert got == want, mode
    assert len(want) > 0


# -------------------------------------------- kernel property tests

from hypothesis import given, settings
from hypothesis import strategies as st

_keys = st.integers(min_value=0, max_value=6)
_times = st.integers(min_value=0, max_value=20)


@settings(max_examples=60, deadline=None)
@given(
    anchors=st.lists(st.tuples(_keys, _times,
                               st.integers(min_value=0, max_value=99)),
                     min_size=1, max_size=40),
    probes=st.lists(st.tuples(_keys, _times), min_size=1, max_size=40),
)
def test_asof_kernel_property(anchors, probes):
    """Pure-kernel check (no Ray): backward as-of with min-val
    tiebreak equals brute force on tiny random domains where ties and
    equal times are common."""
    from imgray.ops.relational import _asof_probe, _asof_state

    ak = np.array([a[0] for a in anchors], dtype=np.int64)
    at = np.array([a[1] for a in anchors], dtype=np.int64)
    av = np.array([a[2] for a in anchors], dtype=np.int64)
    state = _asof_state(ak, at, av)
    pk = np.array([p[0] for p in probes], dtype=np.int64)
    pt = np.array([p[1] for p in probes], dtype=np.int64)
    mask, idx = _asof_probe(state, pk, pt)
    for j, (k, t) in enumerate(probes):
        cand = [(a_t, a_v) for a_k, a_t, a_v in anchors
                if a_k == k and a_t <= t]
        if not cand:
            assert not mask[j]
            continue
        best_t = max(c[0] for c in cand)
        best_v = min(v for (c_t, v) in cand if c_t == best_t)
        assert mask[j]
        assert state[1][idx[j]] == best_v


@settings(max_examples=60, deadline=None)
@given(
    anchors=st.lists(st.tuples(_keys, _times), min_size=1, max_size=30),
    probes=st.lists(st.tuples(_keys, _times), min_size=0, max_size=50),
    window=st.integers(min_value=0, max_value=10),
)
def test_range_kernel_property(anchors, probes, window):
    from imgray.ops.relational import _range_probe_counts, _range_state

    ak = np.array([a[0] for a in anchors], dtype=np.int64)
    at = np.array([a[1] for a in anchors], dtype=np.int64)
    aid = np.arange(len(anchors), dtype=np.int64)
    state = _range_state(ak, at, aid)
    pk = np.array([p[0] for p in probes], dtype=np.int64)
    pt = np.array([p[1] for p in probes], dtype=np.int64)
    counts = _range_probe_counts(state, pk, pt, np.int64(window))
    # counts are indexed by the SORTED anchor order held in state[0]
    got = {int(state[0][i]): int(c) for i, c in enumerate(counts) if c}
    want: dict[int, int] = {}
    for i, (a_k, a_t) in enumerate(anchors):
        n = sum(1 for p_k, p_t in probes
                if p_k == a_k and a_t < p_t <= a_t + window)
        if n:
            want[i] = n
    assert got == want


@settings(max_examples=60, deadline=None)
@given(
    anchors=st.lists(st.tuples(_keys, _times,
                               st.integers(min_value=0, max_value=99)),
                     min_size=1, max_size=40),
    probes=st.lists(st.tuples(_keys, _times), min_size=1, max_size=40),
)
def test_asof_forward_kernel_property(anchors, probes):
    from imgray.ops.relational import _asof_probe, _asof_state

    ak = np.array([a[0] for a in anchors], dtype=np.int64)
    at = np.array([a[1] for a in anchors], dtype=np.int64)
    av = np.array([a[2] for a in anchors], dtype=np.int64)
    state = _asof_state(ak, at, av, "forward")
    pk = np.array([p[0] for p in probes], dtype=np.int64)
    pt = np.array([p[1] for p in probes], dtype=np.int64)
    mask, idx = _asof_probe(state, pk, pt, "forward")
    for j, (k, t) in enumerate(probes):
        cand = [(a_t, a_v) for a_k, a_t, a_v in anchors
                if a_k == k and a_t >= t]
        if not cand:
            assert not mask[j]
            continue
        best_t = min(c[0] for c in cand)
        best_v = min(v for (c_t, v) in cand if c_t == best_t)
        assert mask[j], (k, t)
        assert state[1][idx[j]] == best_v


def test_merge_asof_forward_both_modes(ray_session):
    from imgray.ops.relational import merge_asof

    probes, anchors = _asof_inputs(seed=41)

    def fwd_oracle():
        out = []
        arows = anchors.to_pylist()
        for p in probes.to_pylist():
            cand = [a for a in arows
                    if a["ak"] == p["pk"] and a["at"] >= p["pt"]]
            if not cand:
                continue
            best_t = min(a["at"] for a in cand)
            best = min(a["av"] for a in cand if a["at"] == best_t)
            out.append((p["pid"], best))
        return sorted(out)

    want = fwd_oracle()
    kw = dict(probe_key="pk", probe_time="pt", probe_out="pid",
              anchor_key="ak", anchor_time="at", anchor_val="av",
              direction="forward")
    for mode in ("broadcast", "partitioned"):
        got = _sorted_rows(merge_asof(_ds(probes), _ds(anchors),
                                      mode=mode, **kw))
        assert got == want, mode
    assert len(want) > 0


@settings(max_examples=60, deadline=None)
@given(
    anchors=st.lists(st.tuples(_keys, _times,
                               st.integers(min_value=0, max_value=99)),
                     min_size=1, max_size=40),
    probes=st.lists(st.tuples(_keys, _times), min_size=1, max_size=40),
    direction=st.sampled_from(["backward", "forward"]),
    tol=st.integers(min_value=0, max_value=8),
)
def test_asof_tolerance_kernel_property(anchors, probes, direction, tol):
    from imgray.ops.relational import _asof_probe, _asof_state

    ak = np.array([a[0] for a in anchors], dtype=np.int64)
    at = np.array([a[1] for a in anchors], dtype=np.int64)
    av = np.array([a[2] for a in anchors], dtype=np.int64)
    state = _asof_state(ak, at, av, direction)
    pk = np.array([p[0] for p in probes], dtype=np.int64)
    pt = np.array([p[1] for p in probes], dtype=np.int64)
    mask, idx = _asof_probe(state, pk, pt, direction, tol)
    for j, (k, t) in enumerate(probes):
        if direction == "backward":
            cand = [(a_t, a_v) for a_k, a_t, a_v in anchors
                    if a_k == k and t - tol <= a_t <= t]
            pick = max
        else:
            cand = [(a_t, a_v) for a_k, a_t, a_v in anchors
                    if a_k == k and t <= a_t <= t + tol]
            pick = min
        if not cand:
            assert not mask[j], (k, t)
            continue
        best_t = pick(c[0] for c in cand)
        best_v = min(v for (c_t, v) in cand if c_t == best_t)
        assert mask[j], (k, t)
        assert state[1][idx[j]] == best_v


def test_merge_asof_tolerance_both_modes(ray_session):
    from imgray.ops.relational import merge_asof

    probes, anchors = _asof_inputs(seed=55)
    TOL = 500

    def oracle():
        out = []
        arows = anchors.to_pylist()
        for p in probes.to_pylist():
            cand = [a for a in arows if a["ak"] == p["pk"]
                    and p["pt"] - TOL <= a["at"] <= p["pt"]]
            if not cand:
                continue
            best_t = max(a["at"] for a in cand)
            best = min(a["av"] for a in cand if a["at"] == best_t)
            out.append((p["pid"], best))
        return sorted(out)

    want = oracle()
    base = _asof_oracle(probes, anchors)
    assert want != base  # the tolerance actually prunes something
    kw = dict(probe_key="pk", probe_time="pt", probe_out="pid",
              anchor_key="ak", anchor_time="at", anchor_val="av",
              tolerance=TOL)
    for mode in ("broadcast", "partitioned"):
        got = _sorted_rows(merge_asof(_ds(probes), _ds(anchors),
                                      mode=mode, **kw))
        assert got == want, mode
    assert len(want) > 0
