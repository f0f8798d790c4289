"""Randomized differential tests: the distributed relational operators
must agree with DuckDB on arbitrary generated inputs (seeded — each
seed is a reproducible regression case), not just the curated
conformance corpus."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest


def _ds(tbl: pa.Table, nblocks: int = 5):
    import ray.data

    return ray.data.from_arrow(tbl).repartition(nblocks)


def _rand_tables(seed: int):
    rng = np.random.RandomState(seed)
    nl, nr = rng.randint(50, 400), rng.randint(20, 300)
    # narrow key range → plenty of duplicates and misses on both sides
    left = pa.table({
        "k": pa.array(rng.randint(0, 60, nl), type=pa.int64()),
        "lv": pa.array(rng.randint(-5, 100, nl), type=pa.int64()),
    })
    right = pa.table({
        "k": pa.array(rng.randint(30, 90, nr), type=pa.int64()),
        "rv": pa.array(rng.randint(-5, 100, nr), type=pa.int64()),
    })
    return left, right


@pytest.mark.parametrize("seed", [1, 7, 23, 40, 99])
@pytest.mark.parametrize("how", ["inner", "left"])
def test_hash_join_matches_duckdb(ray_session, seed, how):
    from imgray.ops.relational import hash_join

    left, right = _rand_tables(seed)
    got = sorted(
        (r["k"], r["lv"], r["rv"])
        for b in hash_join(_ds(left), _ds(right, 3), "k", ["lv"], ["rv"],
                           how=how, num_partitions=16)
        .iter_batches(batch_format="pyarrow")
        for r in pa.table(b).to_pylist())
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    jt = "JOIN" if how == "inner" else "LEFT JOIN"
    want = sorted(tuple(row) for row in con.execute(
        f"SELECT l.k, lv, rv FROM l {jt} r ON l.k = r.k").fetchall())
    assert got == want, (seed, how)


@pytest.mark.parametrize("seed", [3, 11, 31])
def test_semi_anti_join_match_duckdb(ray_session, seed):
    from imgray.ops.relational import anti_join, semi_join

    left, right = _rand_tables(seed)

    def run(fn):
        return sorted(
            (r["k"], r["lv"])
            for b in fn(_ds(left), _ds(right, 3), "k", ["lv"],
                        num_partitions=16)
            .iter_batches(batch_format="pyarrow")
            for r in pa.table(b).to_pylist())

    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    semi = sorted(tuple(row) for row in con.execute(
        "SELECT k, lv FROM l WHERE EXISTS "
        "(SELECT 1 FROM r WHERE r.k = l.k)").fetchall())
    anti = sorted(tuple(row) for row in con.execute(
        "SELECT k, lv FROM l WHERE NOT EXISTS "
        "(SELECT 1 FROM r WHERE r.k = l.k)").fetchall())
    assert run(semi_join) == semi, seed
    assert run(anti_join) == anti, seed


@pytest.mark.parametrize("seed", [5, 17])
def test_group_quantiles_match_duckdb(ray_session, seed):
    from imgray.ops.relational import exact_group_quantiles_int

    rng = np.random.RandomState(seed)
    n = rng.randint(200, 1000)
    tbl = pa.table({
        "g": pa.array(rng.choice(["a", "b", "c", "d"], n)),
        "v": pa.array(rng.randint(0, 2**31, n).astype("int64")),
    })
    got = exact_group_quantiles_int(_ds(tbl), "v", "g",
                                    [0.25, 0.5, 0.95]).to_pylist()
    con = duckdb.connect()
    con.register("t", tbl)
    want = {(r[0], r[1]): (r[2], r[3]) for r in con.execute("""
        WITH n AS (SELECT g, count(*) AS cnt FROM t GROUP BY g),
        tq AS (SELECT g, q_bp,
                      greatest(1, least(cnt,
                          CAST(ceil(q_bp/10000.0*cnt) AS BIGINT))) AS k
               FROM n, (VALUES (2500),(5000),(9500)) qs(q_bp)),
        r AS (SELECT g, v,
                     row_number() OVER (PARTITION BY g ORDER BY v) AS rn
              FROM t)
        SELECT tq.g, tq.q_bp, tq.k, r.v
        FROM tq JOIN r ON r.g = tq.g AND r.rn = tq.k""").fetchall()}
    assert len(got) == len(want), seed
    for row in got:
        k, v = want[(row["g"], row["q_bp"])]
        assert row["k"] == k and row["value"] == v, (seed, row)
