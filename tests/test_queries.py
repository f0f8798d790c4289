"""Driver-conformance mirror (SURVEY.md §5 strategy #4): every
SQL-expressible queries() entry must match its oracle_sql() DuckDB
result — row count, column names, and order-insensitive values —
exactly as the driver compares them.  Rows-only queries must run and
return deterministic, sane output.
"""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _to_df(res) -> pd.DataFrame:
    if isinstance(res, pa.Table):
        return res.to_pandas()
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


SQL_QUERIES = sorted(entrymod.oracle_sql())


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_sql_query_matches_oracle(ray_session, ddb, name):
    q = entrymod.queries()[name]
    got = _canon(_to_df(q(SF)))
    want = _canon(ddb.execute(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns), name
    assert len(got) == len(want), name
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


ROWS_ONLY = [n for n in entrymod.queries() if n not in set(SQL_QUERIES)
             and not n.startswith(("crawl", "image"))]


@pytest.mark.parametrize("name", sorted(ROWS_ONLY))
def test_rows_only_runs(ray_session, name):
    res = _to_df(entrymod.queries()[name](SF))
    assert res is not None
    # deterministic across runs
    res2 = _to_df(entrymod.queries()[name](SF))
    pd.testing.assert_frame_equal(_canon(res), _canon(res2))


def test_entry_and_crawl_queries(ray_session):
    ds = entrymod.entry()
    t = _to_df(ds)
    assert len(t) > 0
    assert set(t.columns) == {"image_id", "bytes", "w", "h", "fmt",
                              "caption", "phash"}
    imgs = _to_df(entrymod.queries()["crawl_images"](SF))
    assert len(imgs) == len(t)
    feats = _to_df(entrymod.queries()["image_features"](SF))
    assert len(feats) > 0
    assert {"image_id", "mean_r", "edge_energy"} <= set(feats.columns)


def test_image_dup_clusters_planted(ray_session):
    """Every planted near-dup (neardup/<orig>) must land in the same
    cluster as its original, and the output must be deterministic."""
    t = _to_df(entrymod.queries()["image_dup_clusters"](SF))
    assert len(t) > 0
    rep = dict(zip(t["image_id"], t["cluster_rep"]))
    planted = [i for i in rep if i.startswith("neardup/")]
    assert planted, "planting produced no near-dup pairs"
    for p in planted:
        orig = p[len("neardup/"):]
        assert orig in rep, p
        assert rep[p] == rep[orig], p
    t2 = _to_df(entrymod.queries()["image_dup_clusters"](SF))
    pd.testing.assert_frame_equal(t, t2)


def test_format_cache_rebuilds_partial_export(ray_session):
    """A scratch export dir without the _DONE sentinel (crashed half-
    written export) must be wiped and rebuilt, not trusted."""
    import os
    import shutil

    from imgray.pipelines.queries import (_format_cache_path,
                                          q_segment_counts_csv)

    path = _format_cache_path(SF, "csv")
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)
    with open(os.path.join(path, "junk.csv"), "w") as f:
        f.write("not,a,valid,export\n")  # debris without _DONE
    out = q_segment_counts_csv(SF)
    assert out.num_rows > 0
    assert os.path.exists(os.path.join(path, "_DONE"))
    assert not os.path.exists(os.path.join(path, "junk.csv"))
