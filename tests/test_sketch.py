"""HyperLogLog sketch tests: error bound, combine associativity, and
determinism under block re-splitting."""

import numpy as np
import pyarrow as pa

from imgray.ops.sketch import M, hll_estimate, hll_registers


def test_hll_error_bound():
    rng = np.random.RandomState(7)
    vals = rng.randint(0, 1 << 48, size=80000)
    exact = len(set(vals.tolist()))
    est = hll_estimate(hll_registers(set(vals.tolist())))
    assert abs(est - exact) / exact < 0.05  # 3 sigma ≈ 4.9%


def test_hll_small_range_correction_exactish():
    vals = list(range(500))  # well under 2.5*M → linear counting
    est = hll_estimate(hll_registers(vals))
    assert abs(est - 500) <= 10


def test_hll_partials_combine_associatively():
    rng = np.random.RandomState(11)
    vals = rng.randint(0, 1 << 40, size=20000).tolist()
    whole = hll_registers(vals)
    for nsplit in (2, 7):
        combined = np.zeros(M, dtype=np.uint8)
        for chunk in np.array_split(np.array(vals), nsplit):
            np.maximum(combined, hll_registers(chunk.tolist()),
                       out=combined)
        assert np.array_equal(whole, combined), nsplit


def test_hll_count_dataset_matches_direct(ray_session):
    import ray.data

    vals = np.arange(3000, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"v": vals})) \
        .repartition(5)
    from imgray.ops.sketch import hll_count

    assert hll_count(ds, "v") == hll_estimate(hll_registers(
        vals.tolist()))


def test_cms_never_underestimates_and_is_block_invariant(ray_session):
    import ray.data
    from collections import Counter

    from imgray.ops.sketch import cms_count

    texts = [" ".join(["w%d" % (i % 37) for i in range(j, j + 50)])
             for j in range(200)]
    exact = Counter(t for s in texts for t in s.split())
    probes = ["w0", "w5", "w36", "missing"]
    for nblocks in (1, 7):
        ds = ray.data.from_arrow(
            pa.table({"text": texts})).repartition(nblocks)
        out = {r["p"]: r["est"] for r in
               cms_count(ds, "text", probes).to_pylist()}
        for p in probes:
            assert out[p] >= exact.get(p, 0), (p, nblocks)
        # sparse table → estimates exact here
        assert out["missing"] == 0
        assert out["w0"] == exact["w0"]
