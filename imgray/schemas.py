"""Arrow schemas for every logical table in the engine (SURVEY.md §1).

One fixed, explicit schema per table; every map_batches stage takes and
returns ``pyarrow.Table`` (``batch_format="pyarrow"``).  Shapes follow the
reference's implicit data model (reference: /root/reference/src/main.rs,
stringly-typed) made columnar, plus the north-rule checkpoint tables.
"""

from __future__ import annotations

import pyarrow as pa

# A1. seeds — crawl input (reference: single CLI URL, src/main.rs:22-35).
SEEDS = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("priority", pa.int32()),
    ]
)

# A5. frontier — URLs awaiting fetch.  `seq` is the dotted DFS rank that
# encodes the reference's depth-first visit order (SURVEY.md §3.2).
FRONTIER = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("kind", pa.string()),  # 'listing' | 'album' | 'page'
        ("priority", pa.int32()),
        ("seq", pa.string()),
        ("round", pa.int32()),
    ]
)

# A2. pages — fetched HTML (reference IR of get_html, src/main.rs:83-111).
PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("status", pa.int32()),
        ("html", pa.large_string()),
        ("fetch_ts", pa.timestamp("us")),
        ("depth", pa.int32()),
        ("kind", pa.string()),
        ("seq", pa.string()),
    ]
)

# A3. image_urls — extraction output (reference: per-page HashSet<String>
# with " | "-packed captions, src/main.rs:262-367; unpacked into columns).
IMAGE_URLS = pa.schema(
    [
        ("img_url", pa.string()),
        ("caption", pa.string()),  # '' when absent
        ("page_url", pa.string()),
        ("host", pa.string()),
        ("album", pa.string()),  # normalized album title (dir name)
        ("kind", pa.string()),  # 'html' | 'css' | 'json' | 'data'
        ("seq", pa.string()),  # page seq + extraction index
    ]
)

# Raw downloaded images (pre-decode).
RAW_IMAGES = pa.schema(
    [
        ("img_url", pa.string()),
        ("image_id", pa.string()),
        ("caption", pa.string()),
        ("seq", pa.string()),
        ("status", pa.int32()),
        ("content_type", pa.string()),
        ("bytes", pa.binary()),
    ]
)

# A4. images — sink table (authoritative shape: BASELINE.json input_hint).
IMAGES = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)

# A5. seen — exact URL-seen ground truth behind the cuckoo gate.
SEEN = pa.schema(
    [
        ("url", pa.string()),
        ("round", pa.int32()),
    ]
)

# A5. lineage — per-partition per-round metrics (north rule).
LINEAGE = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("round", pa.int32()),
        ("urls_in", pa.int64()),
        ("fetched", pa.int64()),
        ("images", pa.int64()),
        ("bytes", pa.int64()),
        ("t_start", pa.timestamp("us")),
        ("t_end", pa.timestamp("us")),
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()


def table_from_rows(schema: pa.Schema, rows: list[dict]) -> pa.Table:
    """Build an Arrow table with a fixed schema from a list of row dicts."""
    if not rows:
        return schema.empty_table()
    cols = {name: [r.get(name) for r in rows] for name in schema.names}
    return pa.table(cols, schema=schema)
