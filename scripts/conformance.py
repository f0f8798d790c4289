#!/usr/bin/env python
"""Full repo-side conformance sweep (VERDICT r3 #3): run EVERY
``queries()`` entry at sf0.01 and compare against its ``oracle_sql()``
DuckDB result the way the driver does — row count, sorted column
names, and an order-insensitive value hash — then write
``CONFORMANCE.json`` so all entries are auditable without re-running
(the driver samples a subset per round).

Usage:  python scripts/conformance.py [--sf-dir /root/testdata/sf0.01]

Owns its Ray session (init + shutdown); the library never does.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _to_df(res):
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pa.Table):
        return res.to_pandas()
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


def _canon_hash(df) -> str:
    """Order-insensitive value hash: sort columns by name, stringify
    values (floats rounded to 9 significant decimals so engine-side
    float64 and DuckDB float64 agree), sort rows, blake2b."""
    import numpy as np

    df = df[sorted(df.columns)]
    rows = []
    cols = []
    for c in df.columns:
        v = df[c]
        if v.dtype.kind == "f":
            # integral floats print as ints so a SUM that DuckDB
            # returns as float64 hashes equal to the engine's int64
            cols.append([
                ("nan" if x != x else str(int(x)) if float(x).is_integer()
                 else repr(round(float(x), 9))) for x in v])
        else:
            cols.append([str(x) for x in v])
    rows = sorted(zip(*cols)) if cols else []
    h = hashlib.blake2b(digest_size=16)
    for r in rows:
        for x in r:
            h.update(x.encode())
            h.update(b"\x1f")
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "CONFORMANCE.json"))
    ap.add_argument("--only", default=None,
                    help="comma-separated query-name subset")
    args = ap.parse_args()

    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{args.sf_dir}/{t}.parquet')")

    names = sorted(qs)
    if args.only:
        names = [n for n in names if n in set(args.only.split(","))]
    report: dict[str, dict] = {}
    n_match = n_rows_only = n_fail = 0
    for name in names:
        rec: dict = {"oracle": name in oracles}
        t0 = time.time()
        try:
            got = _to_df(qs[name](args.sf_dir))
            rec["rows"] = int(len(got))
            rec["cols"] = sorted(map(str, got.columns))
            if name in oracles:
                want = con.execute(oracles[name]).df()
                rec["oracle_rows"] = int(len(want))
                rec["rows_match"] = len(got) == len(want)
                rec["schema_match"] = (sorted(map(str, got.columns))
                                       == sorted(map(str, want.columns)))
                gh, wh = _canon_hash(got), _canon_hash(want)
                rec["hash_match"] = gh == wh
                rec["err"] = None
                ok = (rec["rows_match"] and rec["schema_match"]
                      and rec["hash_match"])
                n_match += ok
                n_fail += not ok
            else:
                rec["err"] = None
                n_rows_only += 1
        except Exception as e:  # noqa: BLE001 — sweep must finish
            rec["err"] = f"{type(e).__name__}: {e}"[:500]
            n_fail += 1
        rec["sec"] = round(time.time() - t0, 3)
        report[name] = rec
        status = ("MATCH" if rec.get("hash_match")
                  else "rows-only" if not rec["oracle"] and not rec["err"]
                  else "FAIL")
        print(f"{name:35s} {status:9s} {rec['sec']:7.2f}s "
              f"rows={rec.get('rows', '-')}", flush=True)

    out = {
        "sf_dir": args.sf_dir,
        "total": len(names),
        "oracle_match": n_match,
        "rows_only_ok": n_rows_only,
        "fail": n_fail,
        "queries": report,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"\n{n_match} oracle MATCH, {n_rows_only} rows-only ok, "
          f"{n_fail} FAIL -> {args.out}")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
