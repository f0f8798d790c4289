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


@pytest.mark.parametrize("seed", [2, 17, 58])
@pytest.mark.parametrize("how", ["right", "full"])
def test_outer_join_matches_duckdb(ray_session, seed, how):
    from imgray.ops.relational import hash_join

    left, right = _rand_tables(seed)
    got = sorted(
        ((r["k"], r["lv"], r["rv"])
         for b in hash_join(_ds(left), _ds(right, 3), "k",
                            ["lv"], ["rv"],
                            how=how, num_partitions=16)
         .iter_batches(batch_format="pyarrow")
         for r in pa.table(b).to_pylist()),
        key=lambda t: tuple(str(x) for x in t))
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    jt = "RIGHT JOIN" if how == "right" else "FULL OUTER JOIN"
    want = sorted(
        (tuple(row) for row in con.execute(
            f"SELECT COALESCE(l.k, r.k), lv, rv FROM l {jt} r "
            "ON l.k = r.k").fetchall()),
        key=lambda t: tuple(str(x) for x in t))
    assert got == want, (seed, how)


@pytest.mark.parametrize("seed", [5, 19, 73])
def test_composite_join_matches_duckdb(ray_session, seed):
    from imgray.ops.relational import hash_join

    rng = np.random.RandomState(seed)
    nl, nr = rng.randint(50, 300), rng.randint(50, 300)
    left = pa.table({
        "k1": pa.array(rng.randint(0, 10, nl), type=pa.int64()),
        "k2": pa.array(rng.randint(0, 10, nl), type=pa.int64()),
        "lv": pa.array(rng.randint(0, 100, nl), type=pa.int64()),
    })
    right = pa.table({
        "k1": pa.array(rng.randint(0, 10, nr), type=pa.int64()),
        "k2": pa.array(rng.randint(0, 10, nr), type=pa.int64()),
        "rv": pa.array(rng.randint(0, 100, nr), type=pa.int64()),
    })
    got = sorted(
        (r["k1"], r["k2"], r["lv"], r["rv"])
        for b in hash_join(_ds(left), _ds(right, 3), ["k1", "k2"],
                           ["lv"], ["rv"], num_partitions=16)
        .iter_batches(batch_format="pyarrow")
        for r in pa.table(b).to_pylist())
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = sorted(tuple(row) for row in con.execute(
        "SELECT l.k1, l.k2, lv, rv FROM l JOIN r "
        "ON l.k1 = r.k1 AND l.k2 = r.k2").fetchall())
    assert got == want, seed


@pytest.mark.parametrize("seed", [4, 29, 61])
def test_set_ops_match_duckdb(ray_session, seed):
    from imgray.ops.relational import except_keys, intersect_keys

    left, right = _rand_tables(seed)

    def run(fn):
        return sorted(
            r["k"]
            for b in fn(_ds(left), _ds(right, 3), "k",
                        num_partitions=16)
            .iter_batches(batch_format="pyarrow")
            for r in pa.table(b).to_pylist())

    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    inter = sorted(row[0] for row in con.execute(
        "SELECT k FROM l INTERSECT SELECT k FROM r").fetchall())
    exc = sorted(row[0] for row in con.execute(
        "SELECT k FROM l EXCEPT SELECT k FROM r").fetchall())
    assert run(intersect_keys) == inter, seed
    assert run(except_keys) == exc, seed


@pytest.mark.parametrize("seed", [8, 44])
def test_grouped_mode_matches_duckdb(ray_session, seed):
    from imgray.ops.relational import grouped_mode_int

    rng = np.random.RandomState(seed)
    n = rng.randint(100, 600)
    t = pa.table({
        "g": pa.array([f"g{x}" for x in rng.randint(0, 6, n)]),
        "v": pa.array(rng.randint(0, 12, n), type=pa.int64()),
    })
    got = sorted(
        (r["g"], r["mode"], r["n"])
        for b in grouped_mode_int(_ds(t), "g", "v", num_partitions=8)
        .iter_batches(batch_format="pyarrow")
        for r in pa.table(b).to_pylist())
    con = duckdb.connect()
    con.register("t", t)
    want = sorted(tuple(row) for row in con.execute("""
        WITH c AS (SELECT g, v, count(*) AS cnt FROM t GROUP BY 1, 2)
        SELECT g, v, cnt FROM (
            SELECT *, row_number() OVER (PARTITION BY g
                ORDER BY cnt DESC, v ASC) AS rn FROM c)
        WHERE rn = 1""").fetchall())
    assert got == want, seed


@pytest.mark.parametrize("seed", [6, 37])
def test_quantile_cont_matches_duckdb(ray_session, seed):
    from imgray.ops.relational import quantile_cont_int

    rng = np.random.RandomState(seed)
    n = rng.randint(30, 500)
    t = pa.table({"v": pa.array(rng.randint(-1000, 100000, n),
                                type=pa.int64())})
    got = {r["q_bp"]: r["value_u"]
           for r in quantile_cont_int(_ds(t), "v",
                                      [0.25, 0.5, 0.75]).to_pylist()}
    con = duckdb.connect()
    con.register("t", t)
    want = {int(q * 10000): row[0] for q in (0.25, 0.5, 0.75)
            for row in [con.execute(
                f"SELECT CAST(round(quantile_cont(v, {q}) * 10000) "
                "AS BIGINT) FROM t").fetchone()]}
    assert got == want, seed


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


# -------------------------- temporal queries on synthesized event tables

def _fake_events_dir(tmp_path, seed: int) -> str:
    import pyarrow.parquet as pq

    rng = np.random.RandomState(seed)
    n = rng.randint(300, 900)
    ts = (np.datetime64("2024-01-01", "us")
          + rng.randint(0, 90 * 86400, n).astype("timedelta64[s]"))
    tbl = pa.table({
        "event_id": pa.array(np.arange(n), type=pa.int64()),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "user_id": pa.array(rng.randint(0, 40, n), type=pa.int64()),
        "event_type": pa.array(rng.choice(
            ["signup", "purchase", "click", "error"], n)),
        "value": pa.array(np.round(rng.rand(n) * 100, 2)),
        "props": pa.array(["{}"] * n),
    })
    d = tmp_path / f"sf-{seed}"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize("seed", [9, 42])
@pytest.mark.parametrize("qname", ["retention_cohorts",
                                   "signup_purchase_funnel",
                                   "event_type_entropy"])
def test_temporal_queries_match_duckdb_on_random_events(
        ray_session, tmp_path, seed, qname):
    import pandas as pd

    import __ray_entry__ as em

    import zlib

    # zlib.crc32 is stable across processes (builtin hash() is not)
    sf = _fake_events_dir(tmp_path, seed * 100 + zlib.crc32(
        qname.encode()) % 97)
    got = em.queries()[qname](sf)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    want = con.execute(em.oracle_sql()[qname]).df()

    def canon(df):
        df = df[sorted(df.columns)]
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)

    pd.testing.assert_frame_equal(canon(got), canon(want),
                                  check_dtype=False)
