"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module:
nothing here (or in the imgray library) calls ``ray.init``/``ray.shutdown``.

- ``entry()``   — flagship pipeline: the Ray-Data-native crawl of the
  deterministic synthetic web (seed=42) into the Lance-shaped sink;
  returns the images Dataset (stable schema, rows ≥ 0).
- ``queries()`` — one entry per operator/pipeline from SURVEY.md §2 +
  the training-data ops (dedup / ANN / text / multimodal); each takes
  ``sf_dir`` and returns a pyarrow Table or Dataset.
- ``oracle_sql()`` — DuckDB equivalents for the SQL-expressible
  queries (identical column names; money in integer cents).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    from imgray.pipelines.queries import run_flagship_crawl

    cr = run_flagship_crawl(scale=1)
    return cr.sink.to_ray()


def queries() -> dict[str, Callable[[str], Any]]:
    from imgray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from imgray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
