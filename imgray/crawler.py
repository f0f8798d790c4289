"""The Ray-Data-native crawl engine (SURVEY.md §3.3 rebuild shape, §7 step 4).

The reference's sequential ``while next_page`` loop (src/main.rs:38-47)
becomes BSP crawl rounds over a checkpointed frontier:

    ckpt/round-r/frontier/ ──read_parquet──▶ groupby(host) release
        (politeness token bucket + robots, SchedulerShard actors)
      released ─▶ map_batches(PageParser pool)   fetch + extract in ONE
        stage: HTML never crosses a stage boundary (project early —
        SURVEY.md §4 memory row)
      ─▶ map_batches(seen gate: ShardedSeen cuckoo actors, batched;
          page/link rows spill to parquet side files worker-side)
      ─▶ img rows ─ map_batches(fused image sink) fetch/decode/pHash +
          min-seq claim gate + fragment write in ONE task; contested
          name claims repaired at finalize (rare) → Lance-shaped sink
      deferred ∪ novel links ──write_parquet──▶ ckpt/round-(r+1)/frontier/
      single atomic commit per round: sink manifest records the
      checkpoint → resume = read latest manifest (north rule).

Ordering contract (SURVEY.md §3.2): every page carries a dotted DFS
rank ``seq``; sort of the visit log by ``seq`` reproduces the
reference's depth-first visit order exactly, politeness deferrals and
fetch parallelism notwithstanding.  Image first-wins is min-``seq``
within a round and first-round-wins across rounds (equals the
reference's --no-clobber order whenever an album directory is produced
by a single chain, as in the reference's single-seed world).

Scale notes (10^10-URL frontier): the frontier lives in partitioned
parquet checkpoints and flows through Dataset ops — the driver only
materializes the per-round *released* batch, which is bounded by
politeness budget × active hosts.  Seen-set shards hold the cuckoo
filter in RAM with exact backing persisted per round.  Hot hosts can be
salted into sub-partitions for fetch parallelism while their token
budget stays on one SchedulerShard (north-rule skew mitigation).
"""

from __future__ import annotations

import hashlib
import os
import time
from dataclasses import dataclass, field
from functools import partial

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from . import schemas as S
from . import urlops as U
from .extract import parse_page, two_level_urls
from .lancelite import LanceLite
from .refsim import data_uri_image_id, derive_image_id, image_record
from .state.cuckoo import ShardedSeen, retry_actor_get
from .state.politeness import SchedulerShard
from .synthweb import SynthWeb, WebSpec

# superset schema for the fetch+extract stage output
EXTRACT = pa.schema(
    [
        ("row_kind", pa.string()),  # page | link | img | seen
        ("url", pa.string()),
        ("host", pa.string()),
        ("status", pa.int32()),
        ("seq", pa.string()),
        ("depth", pa.int32()),
        ("kind", pa.string()),  # frontier kind (link/page) or img kind (img)
        ("album", pa.string()),
        ("caption", pa.string()),
    ]
)

IMG_OUT = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
        ("seq", pa.string()),
    ]
)

VERDICT = "verdict"


# seq components are zero-padded to 8 digits (10^8 per chain/sibling
# level; lexicographic order == numeric order up to that bound — a
# longer chain would need length-prefixed components)
SEQ_W = 8


def seq_next(seq: str) -> str:
    parts = seq.split(".")
    parts[-1] = f"{int(parts[-1]) + 1:0{SEQ_W}d}"
    return ".".join(parts)


def seq_child(seq: str, j: int) -> str:
    return f"{seq}.{j:0{SEQ_W}d}." + "0" * SEQ_W


def make_synth_fetcher(spec: WebSpec):
    web = SynthWeb(spec)
    return web.get


def host_bucket(host: str, nb: int = 16) -> int:
    """Stable host → partition bucket (frontier files + lineage)."""
    return int.from_bytes(
        hashlib.blake2b(host.encode(), digest_size=2).digest(), "big") % nb


def host_shard(host: str, n: int) -> int:
    """Stable host → SchedulerShard index (one budget per host)."""
    return int.from_bytes(
        hashlib.blake2b(host.encode(), digest_size=4).digest(), "big") % n


# ----------------------------------------------------------------- stages

# Per-worker-process client memo: task-mode stages build the fetch
# client once per worker process (the actor-pool benefit — setup once —
# without per-execution actor startup latency; SURVEY.md §2.3).
_CLIENT_CACHE: dict[str, object] = {}


def _cached_client(factory, key: str):
    c = _CLIENT_CACHE.get(key)
    if c is None:
        c = factory()
        _CLIENT_CACHE[key] = c
    return c


_DETAIL_POOL = None


def _detail_map(fetch, urls: list[str]):
    """Order-preserving concurrent map over detail-page URLs on one
    lazily-built per-process thread pool (fetch clients are
    thread-safe: urllib opener per request, SynthWeb is read-only).
    Pool size via IMGRAY_DETAIL_THREADS (default 8)."""
    if len(urls) <= 1:
        return [fetch(u) for u in urls]
    global _DETAIL_POOL
    if _DETAIL_POOL is None:
        import os
        from concurrent.futures import ThreadPoolExecutor

        _DETAIL_POOL = ThreadPoolExecutor(
            max_workers=int(os.environ.get("IMGRAY_DETAIL_THREADS", "8")),
            thread_name_prefix="imgray-detail")
    return list(_DETAIL_POOL.map(fetch, urls))


def parse_page_batch(batch: pa.Table, fetch, site_cfg: list[dict],
                     album_gate=None) -> pa.Table:
    """Fetch + extract one batch of frontier rows (the reference's
    parse() body over a batch; HTML never leaves this function).

    ``album_gate`` replicates the reference's interactive Y/N/All/
    Cancel album prompt (ref src/main.rs:412-468) as a DETERMINISTIC
    config hook: ``gate(label, index, n_albums, page_url) ->
    "y"|"n"|"all"|"cancel"`` called per album link in DOM order
    (label = title/alt/aria-label attr else element text).  Verdicts,
    as the reference: y/yes/"" admit this album; n/no skips it AND
    drops the listing's next-page link; a/all admits this and every
    remaining album unprompted; anything else cancels the remaining
    albums AND drops the next link.  The hook must be a pure function
    (it is serialized to workers and may be re-invoked on task retry);
    ``None`` (default) behaves like the reference's non-interactive
    "All"."""
    out: list[dict] = []
    for row in batch.select(["url", "host", "seq", "depth", "kind"]).to_pylist():
            url, host, seq = row["url"], row["host"], row["seq"]
            depth, kind = row["depth"], row["kind"]
            resp = fetch(url)
            ok = resp.status == 200 and bool(resp.body)
            # failed fetches carry a NEGATIVE status marker: they are
            # lineage-visible attempts but not visits (the reference
            # aborts before any processing on fetch failure, and the
            # oracle's visit order excludes them)
            out.append({"row_kind": "page", "url": url, "host": host,
                        "status": resp.status if ok else -(resp.status or 1),
                        "seq": seq, "depth": depth, "kind": kind})
            if not ok:
                continue
            entry = U.host_suffix_lookup(host, site_cfg)
            p = parse_page(resp.text, url, entry)
            if not p.ok:
                continue
            if p.two_level_sel is not None:
                pairs: dict[tuple[str, str], None] = {}
                detail_urls = [du for du, _k in p.urls]
                for detail_url in detail_urls:
                    out.append({"row_kind": "seen", "url": detail_url,
                                "host": host, "seq": seq})
                # parallel second-level fetch (ref src/main.rs:326-335):
                # all detail pages of one listing fetched concurrently on
                # the per-process pool; ex.map returns responses in
                # submission order, so extraction order — and therefore
                # the (u2, cap) pair order and image seqs — is identical
                # to the serial loop
                for dresp in _detail_map(fetch, detail_urls):
                    if dresp.status != 200:
                        continue
                    for u2, cap in two_level_urls(dresp.text, p.two_level_sel, url):
                        pairs.setdefault((u2, cap))
                two_items = ([(u2, cap, "html") for (u2, cap) in pairs]
                             + [(u2, "", k2) for (u2, k2) in p.post_urls])
                for i, (u2, cap, k2) in enumerate(two_items):
                    out.append({"row_kind": "img", "url": u2, "host": host,
                                "seq": f"{seq}.i{i:08d}", "kind": k2,
                                "album": p.album_title, "caption": cap})
            else:
                for i, (u2, k2) in enumerate(p.urls):
                    out.append({"row_kind": "img", "url": u2, "host": host,
                                "seq": f"{seq}.i{i:08d}", "kind": k2,
                                "album": p.album_title, "caption": ""})
            drop_next = False
            if album_gate is not None and p.album_hrefs:
                hrefs = []
                all_mode = False
                n_alb = len(p.album_hrefs)
                albs = list(zip(p.album_hrefs,
                                (p.album_labels or [""] * n_alb)))
                for i, (href, label) in enumerate(albs):
                    if all_mode:
                        hrefs.append(href)
                        continue
                    v = str(album_gate(label, i, n_alb, url)).strip().lower()
                    if v in ("y", "yes", ""):
                        hrefs.append(href)
                    elif v in ("n", "no"):
                        drop_next = True  # ref :455: next_sel = None
                    elif v in ("a", "all"):
                        all_mode = True
                        hrefs.append(href)
                    else:  # cancel: stop the chain (ref :462-466)
                        drop_next = True
                        break
                album_hrefs = hrefs
            else:
                album_hrefs = p.album_hrefs
            for j, href in enumerate(album_hrefs):
                ahost = U.check_host(href)
                if ahost is None:
                    continue
                out.append({"row_kind": "link", "url": href, "host": ahost,
                            "seq": seq_child(seq, j), "depth": depth + 1,
                            "kind": "album"})
            if p.next_url and not drop_next:
                nhost = U.check_host(p.next_url)
                if nhost is not None:
                    out.append({"row_kind": "link", "url": p.next_url,
                                "host": nhost, "seq": seq_next(seq),
                                "depth": depth, "kind": kind})
    return S.table_from_rows(EXTRACT, out)


class PageParser:
    """Fetch + extract actor (stateful: fetch client + site config built
    once per actor — SURVEY.md §2.3).  Actor-pool mode."""

    def __init__(self, fetcher_factory, site_cfg: list[dict],
                 album_gate=None):
        self.fetch = fetcher_factory()
        self.cfg = site_cfg
        self.album_gate = album_gate

    def __call__(self, batch: pa.Table) -> pa.Table:
        return parse_page_batch(batch, self.fetch, self.cfg,
                                album_gate=self.album_gate)


def parse_page_task(batch: pa.Table, fetcher_factory, client_key: str,
                    site_cfg: list[dict], album_gate=None) -> pa.Table:
    """Task-mode stage: client memoized per worker process."""
    return parse_page_batch(batch, _cached_client(fetcher_factory, client_key),
                            site_cfg, album_gate=album_gate)


def gate_batch(batch: pa.Table, seen: ShardedSeen,
               spill_dir: str | None = None, rnd: int = 0,
               nb: int = 16) -> pa.Table:
    """Seen-set gate: one batched actor round-trip per shard per batch.

    link rows: kept iff 'u:'+url novel; img rows: 'u:'+url inserted,
    kept iff 'i:'+album|url|caption novel; seen rows: inserted, dropped;
    page rows: pass through.

    With ``spill_dir`` set (single-streaming-execution mode), kept
    page/link rows are also written to a parquet side file so the
    driver can build the next frontier without a materialize barrier —
    the img rows continue downstream into the fused image stage while
    later pages are still being fetched (full fetch/decode overlap).
    """
    if batch.num_rows == 0:
        return batch
    rk = batch.column("row_kind")
    img_mask = pc.equal(rk, "img")
    img_t = batch.filter(img_mask)
    # key construction is pure Arrow kernels (VERDICT r2 #8): one
    # to_pylist at the actor-call boundary instead of four plus
    # per-row f-strings.  Key format unchanged ("u:"+url /
    # "i:"+album\0url\0caption).
    iu = img_t.column("url")
    u_img = pc.binary_join_element_wise("u:", iu, "")
    u_seen = pc.binary_join_element_wise(
        "u:", batch.filter(pc.equal(rk, "seen")).column("url"), "")
    i_keys = pc.binary_join_element_wise(
        "i:", pc.binary_join_element_wise(
            img_t.column("album"), iu,
            pc.fill_null(img_t.column("caption"), ""), "\x00"), "")
    # "u:" novelty results are side-effect-only (insertion); "i:" keys
    # gate img rows.  The two key spaces are disjoint, so batching them
    # in two runs is order-equivalent to the old per-row interleave.
    ins_keys = u_img.to_pylist() + u_seen.to_pylist()
    img_keys = i_keys.to_pylist()
    novel = seen.check_and_insert(ins_keys + img_keys)
    novel_img = novel[len(ins_keys):]
    # link rows pass through UNGATED: gating them here would let task
    # timing decide which discovery's seq survives when two pages find
    # the same URL in one round; links are gated once per round after a
    # deterministic min-seq dedup (DFS-first order, like the
    # sequential reference)
    keep = pc.is_in(rk, value_set=pa.array(["page", "link"])) \
        .to_numpy(zero_copy_only=False).copy()
    keep[np.flatnonzero(img_mask.to_numpy(zero_copy_only=False))] = novel_img
    out = batch.filter(pa.array(keep))
    if spill_dir is not None:
        # spill pages and links to SEPARATE side files (pages are
        # politeness-bounded and read by the driver; links are the
        # unbounded set and flow through the distributed admission
        # pipeline without ever being concatenated on the driver);
        # img rows continue downstream in-stream — only a tiny
        # per-bucket count partial is spilled for lineage
        def _side(tbl: pa.Table, prefix: str) -> None:
            if tbl.num_rows == 0:
                return
            name = hashlib.blake2b(
                "|".join(tbl.column("seq").to_pylist()).encode(),
                digest_size=8).hexdigest()
            dest = os.path.join(spill_dir, f"{prefix}-{rnd}-{name}.parquet")
            tmp = os.path.join(spill_dir, f".tmp-{prefix}-{name}")
            pq.write_table(tbl, tmp)
            os.replace(tmp, dest)

        rk = out.column("row_kind")
        _side(out.filter(pc.equal(rk, "page")), "pg")
        _side(out.filter(pc.equal(rk, "link")), "ln")
        imgs_side = out.filter(pc.equal(rk, "img"))
        if imgs_side.num_rows:
            counts: dict[int, int] = {}
            for h in imgs_side.column("host").to_pylist():
                b = host_bucket(h, nb)
                counts[b] = counts.get(b, 0) + 1
            _side(pa.table({"bucket": pa.array(sorted(counts),
                                               type=pa.int32()),
                            "n": pa.array([counts[b] for b in sorted(counts)],
                                          type=pa.int64()),
                            "seq": pa.array(
                                [imgs_side.column("seq")[0].as_py()]
                                * len(counts), type=pa.string())}), "ic")
    return out


def image_batch(batch: pa.Table, fetch, store_data_uris: bool) -> pa.Table:
    """Image fetch + decode + pHash over one batch (Arrow in/out)."""
    out: list[dict] = []
    if batch.num_rows:
        for r in batch.to_pylist():
            url, album, caption, seq = r["url"], r["album"], r["caption"], r["seq"]
            d = U.sanitize_dir(album)
            if url.startswith("data:image/"):
                if not store_data_uris:
                    continue
                parsed = U.parse_data_uri(url)
                if parsed is None:
                    continue
                ext, raw = parsed
                rec = image_record(data_uri_image_id(d, ext, raw), raw, "")
            else:
                resp = fetch(U.percent_encode(url))
                if resp.status != 200 or not resp.body:
                    continue  # fire-and-forget parity (ref src/main.rs:643)
                iid = derive_image_id(d, url, caption or "", resp.content_type)
                if iid is None:
                    continue
                rec = image_record(iid, resp.body, caption or "")
            rec["seq"] = seq
            out.append(rec)
    return S.table_from_rows(IMG_OUT, out)


def _image_sink(batch: pa.Table, fetch, store_data_uris: bool, seen,
                data_dir: str, rnd: int, strict: bool) -> pa.Table:
    """Fused fetch→decode→gate→fragment-write: image bytes never
    re-enter the object store between sub-steps (single task, single
    local write) — the hot-path fusion the streaming executor can't
    guarantee across differing map args.  ``strict`` selects the
    seq-aware claim gate (min-seq --no-clobber name dedup, repaired at
    round finalize if a smaller seq arrives after a provisional winner
    was written) over the plain first-come written gate."""
    t = image_batch(batch, fetch, store_data_uris)
    t = claim_gate(t, seen, rnd) if strict else written_gate(t, seen)
    return write_fragment(t, data_dir, rnd)


def image_sink_task(batch: pa.Table, fetcher_factory, client_key: str,
                    store_data_uris: bool, seen, data_dir: str,
                    rnd: int, strict: bool = False) -> pa.Table:
    """Task-mode fused image sink: client memoized per worker process."""
    return _image_sink(batch, _cached_client(fetcher_factory, client_key),
                       store_data_uris, seen, data_dir, rnd, strict)


class ImageSink:
    """Actor-pool fused image sink (heavy per-worker state mode)."""

    def __init__(self, fetcher_factory, store_data_uris: bool, seen,
                 data_dir: str, rnd: int, strict: bool):
        self.fetch = fetcher_factory()
        self.args = (store_data_uris, seen, data_dir, rnd, strict)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _image_sink(batch, self.fetch, *self.args)


import contextlib


@contextlib.contextmanager
def _fine_task_bundling():
    """Frontier rows are tiny in BYTES but each expands to megabytes of
    fetch+decode work — Ray's default 1 MiB min-block bundling merges
    them into few tasks and starves the pool (observed: 41 blocks → 11
    tasks on a 32-slot round).  Scoped to the crawl's own executions so
    byte-dense query pipelines keep the default coalescing."""
    dctx = ray.data.DataContext.get_current()
    old = dctx.target_min_block_size
    dctx.target_min_block_size = 1024
    try:
        yield
    finally:
        dctx.target_min_block_size = old


def _read_many(paths: list[str]) -> pa.Table:
    """Concat-read parquet files with a thread pool (pq.read_table
    releases the GIL; serial reads were a visible driver segment)."""
    from concurrent.futures import ThreadPoolExecutor

    if len(paths) == 1:
        return pq.read_table(paths[0])
    with ThreadPoolExecutor(min(8, len(paths))) as ex:
        return pa.concat_tables(list(ex.map(pq.read_table, paths)))


def _from_arrow_split(tbl: pa.Table, nparts: int):
    """Dataset over ``tbl`` pre-split into ~nparts blocks by zero-copy
    slicing (task-granularity control WITHOUT a Repartition barrier)."""
    if tbl.num_rows == 0 or nparts <= 1:
        return ray.data.from_arrow(tbl)
    step = -(-tbl.num_rows // nparts)
    slices = [tbl.slice(i * step, step)
              for i in range(nparts) if i * step < tbl.num_rows]
    return ray.data.from_arrow(slices)


def to_frontier(t: pa.Table, rnd: int, priority_by_depth: bool) -> pa.Table:
    """Project link/deferred rows onto the FRONTIER schema (vectorized)."""
    n = t.num_rows
    if "priority" in t.column_names:
        prio = pc.cast(t.column("priority"), pa.int32())
    elif priority_by_depth:
        prio = pc.cast(t.column("depth"), pa.int32())
    else:
        prio = pa.nulls(n, pa.int32()).fill_null(0)
    return pa.table({
        "url": t.column("url"), "host": t.column("host"),
        "depth": pc.cast(t.column("depth"), pa.int32()),
        "kind": t.column("kind"),
        "priority": prio,
        "seq": t.column("seq"),
        "round": pa.nulls(n, pa.int32()).fill_null(rnd),
    }, schema=S.FRONTIER)


FRONTIER_ROW_GROUP = 32768  # checkpoint row-group size: the unit a
# salted release task can read independently (hot-bucket splitting)


def write_frontier_buckets(tbl: pa.Table, fdir: str, tag: str,
                           nb: int = 16) -> int:
    """Write FRONTIER rows as per-host-bucket files
    ``b{bb:02d}-{tag}.parquet`` (atomic rename, deterministic names →
    idempotent under task retry).  Callable from the driver (small
    rounds) or from workers (the frontier never crosses the driver at
    scale — VERDICT r1 #3).  Returns the row count written."""
    if tbl.num_rows == 0:
        return 0
    hosts = tbl.column("host")
    uniq = pc.unique(hosts.combine_chunks()
                     if isinstance(hosts, pa.ChunkedArray) else hosts)
    bmap = pa.array([host_bucket(h, nb) for h in uniq.to_pylist()],
                    type=pa.int32())
    buckets = pc.take(bmap, pc.index_in(hosts, value_set=uniq))
    import uuid as _uuid
    for b in pc.unique(buckets.combine_chunks()
                       if isinstance(buckets, pa.ChunkedArray)
                       else buckets).to_pylist():
        part = tbl.filter(pc.equal(buckets, b))
        dest = os.path.join(fdir, f"b{b:02d}-{tag}.parquet")
        tmp = os.path.join(fdir, f".tmp-{_uuid.uuid4().hex}")
        pq.write_table(part, tmp, row_group_size=FRONTIER_ROW_GROUP)
        os.replace(tmp, dest)
    return tbl.num_rows


def release_bucket_batch(batch: pa.Table, scheds: list, now_round: int,
                         next_fdir: str, nb: int) -> pa.Table:
    """Per-bucket frontier release task (scale path): reads its own
    bucket's frontier files, per-host (priority, seq) sort, one
    politeness grant call per host (fired in parallel), writes deferred
    rows DIRECTLY to the next round's bucket file — only the released
    rows (bounded by politeness budget × hosts) return to the driver.

    Retry-safe: filter_and_grant is memoized per (host, round) on the
    scheduler shard, and the deferred file name is deterministic."""
    import json

    out: list[pa.Table] = []
    for row in batch.to_pylist():
        bucket, paths = row["bucket"], json.loads(row["paths"])
        tbl = pa.concat_tables([pq.read_table(p) for p in paths])
        tbl = tbl.sort_by([("host", "ascending"), ("priority", "ascending"),
                           ("seq", "ascending")])
        hosts = tbl.column("host").to_pylist()
        futs, spans, call_args = [], [], []
        i = 0
        while i < len(hosts):
            j = i
            while j < len(hosts) and hosts[j] == hosts[i]:
                j += 1
            urls = tbl.column("url").slice(i, j - i).to_pylist()
            futs.append(scheds[host_shard(hosts[i], len(scheds))]
                        .filter_and_grant.remote(hosts[i], urls, now_round))
            call_args.append((hosts[i], urls))
            spans.append((i, j))
            i = j
        verdicts = [""] * len(hosts)
        for (a, b), fut, (h_, u_) in zip(spans, futs, call_args):
            # grants are memoized per (host, round) — reissue is safe
            vs = retry_actor_get(
                fut, lambda h=h_, u=u_: scheds[host_shard(h, len(scheds))]
                .filter_and_grant.remote(h, u, now_round))
            verdicts[a:b] = vs
        va = pa.array(verdicts, type=pa.string())
        deferred = tbl.filter(pc.equal(va, "defer"))
        if deferred.num_rows:
            deferred = deferred.set_column(
                deferred.schema.get_field_index("round"), "round",
                pa.nulls(deferred.num_rows, pa.int32()).fill_null(now_round))
            write_frontier_buckets(deferred, next_fdir, "defer", nb)
        out.append(tbl.filter(pc.equal(va, "release")))
    return (pa.concat_tables(out) if out else S.FRONTIER.empty_table())


def _plan_chunks(paths: list[str], target_rows: int) -> list[list]:
    """Pack a bucket's frontier row groups into ~target_rows chunks —
    each chunk is one presift task's independent read set (metadata
    only, no row reads).  Returns [[(path, [rg, ...]), ...], ...]."""
    chunks: list[list] = []
    cur: dict[str, list[int]] = {}
    cur_rows = 0
    for p in paths:
        md = pq.read_metadata(p)
        for rg in range(md.num_row_groups):
            cur.setdefault(p, []).append(rg)
            cur_rows += md.row_group(rg).num_rows
            if cur_rows >= target_rows:
                chunks.append(sorted(cur.items()))
                cur, cur_rows = {}, 0
    if cur:
        chunks.append(sorted(cur.items()))
    return chunks


def _url_path(u: str) -> str:
    rest = u.split("://", 1)[1] if "://" in u else u
    slash = rest.find("/")
    return rest[slash:] if slash != -1 else "/"


def presift_bucket_batch(batch: pa.Table, scheds: list, now_round: int,
                         next_fdir: str, nb: int,
                         cand_per_host: int) -> pa.Table:
    """Hot-bucket salted release, phase A (north-rule skew mitigation,
    VERDICT r2 #4): each task reads only its row-group chunk of an
    oversized bucket, robots-filters locally (rules fetched once per
    host from the owning SchedulerShard), defers everything beyond each
    host's first ``cand_per_host`` rows worker-side, and returns only
    those candidates.  Phase B (driver) merges candidates per host and
    calls filter_and_grant ONCE per host — one token budget per host on
    one shard, arbitrarily many parallel scan tasks.

    Correctness: budget ≤ burst ≤ cand_per_host, and each chunk
    contributes its locally-first allowed rows in (priority, seq)
    order, so the globally-first ``budget`` rows are always inside the
    returned union; every non-candidate ranks > cand_per_host locally,
    hence > budget globally — 'defer' is its verdict under unsalted
    semantics too.  Retry-safe: deferred-file names are deterministic
    per chunk; the robots-reject counter may double-count on a retried
    task (observability only)."""
    from .state.politeness import robots_allowed

    import json

    out: list[pa.Table] = []
    for row in batch.to_pylist():
        chunk_id = row["chunk"]
        tbls = [pq.ParquetFile(p).read_row_groups(rgs)
                for p, rgs in json.loads(row["parts"])]
        tbl = pa.concat_tables(tbls).sort_by(
            [("host", "ascending"), ("priority", "ascending"),
             ("seq", "ascending")])
        hosts = tbl.column("host").to_pylist()
        uniq = sorted(set(hosts))
        # Issue every get_rules RPC up front, then collect — latency is
        # max-of-round-trips, not sum (read-only, so reissue is safe).
        rule_futs = {
            h: scheds[host_shard(h, len(scheds))].get_rules.remote(h)
            for h in uniq}
        rules_map = {
            h: retry_actor_get(
                f, lambda h=h: scheds[host_shard(h, len(scheds))]
                .get_rules.remote(h))
            for h, f in rule_futs.items()}
        cands: list[pa.Table] = []
        defers: list[pa.Table] = []
        i = 0
        while i < len(hosts):
            j = i
            while j < len(hosts) and hosts[j] == hosts[i]:
                j += 1
            sub = tbl.slice(i, j - i)
            rules = rules_map[hosts[i]]
            if rules:
                allowed = [robots_allowed(_url_path(u), rules)
                           for u in sub.column("url").to_pylist()]
                nrej = len(allowed) - sum(allowed)
                if nrej:
                    scheds[host_shard(hosts[i], len(scheds))] \
                        .add_rejected.remote(nrej)
                sub = sub.filter(pa.array(allowed))
            cands.append(sub.slice(0, cand_per_host))
            if sub.num_rows > cand_per_host:
                defers.append(sub.slice(cand_per_host))
            i = j
        if defers:
            d = pa.concat_tables(defers)
            d = d.set_column(
                d.schema.get_field_index("round"), "round",
                pa.nulls(d.num_rows, pa.int32()).fill_null(now_round))
            write_frontier_buckets(d, next_fdir, f"ps-{chunk_id}", nb)
        out.extend(t for t in cands if t.num_rows)
    return (pa.concat_tables(out) if out else S.FRONTIER.empty_table())


def dedup_min_seq(group: pa.Table) -> pa.Table:
    """groupby(image_id) → keep the row with the smallest seq (the
    reference's --no-clobber first-wins, ref src/main.rs:16)."""
    if group.num_rows <= 1:
        return group
    return group.sort_by("seq").slice(0, 1)


def admit_links_min_seq(links: pa.Table) -> pa.Table:
    """DFS-first link admission: keep, per URL, the discovery with the
    smallest dotted seq — fully vectorized (Arrow group_by min + take),
    no per-URL Python loop (VERDICT r1 #2).  (url, seq) pairs are
    unique, so exactly one row per URL survives.  Used directly on the
    driver for small rounds and as the per-block partial of the
    distributed groupby(url) admission at scale (min of block-mins ==
    global min)."""
    if links.num_rows <= 1:
        return links
    g = links.group_by("url").aggregate([("seq", "min")])
    minseq = pc.take(
        g.column("seq_min").combine_chunks(),
        pc.index_in(links.column("url"),
                    value_set=g.column("url").combine_chunks()))
    return links.filter(pc.equal(links.column("seq"), minseq)).sort_by("seq")


def gate_links_batch(batch: pa.Table, seen: ShardedSeen) -> pa.Table:
    """Batched novel-URL gate for admitted links (one sharded
    check_and_insert round-trip per batch; task-scope idempotent)."""
    if batch.num_rows == 0:
        return batch
    novel = seen.check_and_insert(
        ["u:" + u for u in batch.column("url").to_pylist()])
    return batch.filter(pa.array(novel))


def links_frontier_write(batch: pa.Table, fdir: str, rnd: int,
                         priority_by_depth: bool, nb: int) -> pa.Table:
    """Terminal stage of the distributed link admission: project novel
    links onto the FRONTIER schema and write them into the next round's
    per-bucket frontier files from the worker — only per-bucket counts
    return to the driver."""
    if batch.num_rows == 0:
        return pa.table({"n": pa.array([], type=pa.int64())})
    ft = to_frontier(batch, rnd, priority_by_depth)
    tag = hashlib.blake2b(
        "|".join(batch.column("seq").to_pylist()).encode(),
        digest_size=8).hexdigest()
    n = write_frontier_buckets(ft, fdir, f"links-{tag}", nb)
    return pa.table({"n": pa.array([n], type=pa.int64())})


def written_gate(batch: pa.Table, seen: ShardedSeen) -> pa.Table:
    if batch.num_rows == 0:
        return batch
    ids = batch.column("image_id").to_pylist()
    novel = seen.check_and_insert(["w:" + i for i in ids])
    return batch.filter(pa.array(novel))


def claim_gate(batch: pa.Table, seen: ShardedSeen, rnd: int) -> pa.Table:
    """Strict min-seq written gate: rows keep flowing the moment they
    claim-win; if a smaller-seq discovery of the same image_id lands
    later in the round, the seen shard records the key as contested and
    the provisional winner's fragment row is dropped at finalize —
    first-wins parity (ref src/main.rs:16) without a groupby(image_id)
    byte shuffle or a round barrier."""
    if batch.num_rows == 0:
        return batch
    ids = batch.column("image_id").to_pylist()
    wins = seen.claim_min(["w:" + i for i in ids],
                          batch.column("seq").to_pylist(), rnd)
    return batch.filter(pa.array(wins))


def write_fragment(batch: pa.Table, data_dir: str, rnd: int) -> pa.Table:
    """Distributed sink write: each block becomes one immutable fragment
    file; paths flow back for the driver's atomic manifest commit.
    Fragments carry the provenance ``seq`` column (dropped by the sink's
    schema projection on read) so contested-name repair can identify
    losing rows without re-deriving anything."""
    if batch.num_rows == 0:
        return pa.table({"path": pa.array([], type=pa.string()),
                         "rows": pa.array([], type=pa.int64()),
                         "nbytes": pa.array([], type=pa.int64())})
    tbl = batch.select([f.name for f in S.IMAGES] + ["seq"])
    ids = batch.column("image_id")
    sq = batch.column("seq")
    # seqs are globally unique per row (image_id is NOT unique across
    # blocks under the claim gate: the same id can be provisionally
    # written twice before finalize repair) — name by id+seq endpoints
    name = hashlib.blake2b(
        "|".join((ids[0].as_py(), sq[0].as_py(), ids[-1].as_py(),
                  sq[-1].as_py(), str(batch.num_rows))).encode(),
        digest_size=8).hexdigest()
    # one fragment-layout implementation: reuse the sink's staging
    # protocol (tmp write + atomic rename under <root>/data/)
    rel = LanceLite(os.path.dirname(data_dir)).stage_fragment(
        tbl, f"r{rnd}-{name}")
    nbytes = int(pc.sum(pc.binary_length(batch.column("bytes")))
                 .as_py() or 0)
    return pa.table({"path": [rel], "rows": [batch.num_rows],
                     "nbytes": [nbytes]})


# ------------------------------------------------------------------ engine


@dataclass
class CrawlerConfig:
    root: str  # sink + checkpoints live under this dir
    fetcher_factory: object = None  # () -> (url -> Response)
    site_cfg: list = field(default_factory=list)
    rate_per_round: float = 8.0  # politeness tokens/host/round
    burst: float = 16.0
    respect_robots: bool = True
    store_data_uris: bool = True
    seen_shards: int = 4
    sched_shards: int = 2
    fetch_concurrency: int = 4
    fetch_batch: int = 16
    img_concurrency: int = 4
    img_batch: int = 64
    max_rounds: int = 200
    # strict within-round image_id name-collision dedup: the fused image
    # sink claims each id with its seq on the seen shards (min-seq wins,
    # ref --no-clobber src/main.rs:16) and rare contested fragments are
    # repaired at round finalize — runs INSIDE the streaming pipeline,
    # no extra shuffle.  Off ⇒ collisions across *different* URLs
    # resolve first-come (the (album,url,caption) gate still dedups
    # exact duplicates)
    strict_name_dedup: bool = True
    # per-shard exact-seen RAM budget (keys); above it the shard spills
    # its exact set to sorted parquet runs under ckpt/seen-spill and
    # probes them behind the cuckoo gate.  None = unbounded RAM
    seen_ram_cap: int | None = None
    # frontier release / link admission: below this row count they run
    # driver-side (same politeness actors / same min-seq semantics, no
    # extra Ray job — the vectorized Arrow path handles ~250k rows in
    # well under the fixed launch+drain cost of a streaming execution);
    # above it, per-bucket release tasks + distributed groupby(url)
    # admission — the frontier never crosses the driver
    release_driver_threshold: int = 250000
    # frontier checkpoint partitioning: hash(host) % frontier_buckets
    # bucket files per round (worker-written at scale; release reads
    # per-bucket files, so a bucket IS a release task's partition)
    frontier_buckets: int = 16
    # hot-bucket salting (north-rule skew mitigation): a bucket whose
    # frontier exceeds this row count is released via parallel presift
    # chunk tasks (row-group granularity reads, worker-side deferral,
    # ≤ burst candidates/host returned) + ONE driver-side grant per
    # host — the host's token budget stays on its single SchedulerShard
    release_salt_threshold: int = 200000
    # frontier priority: released per host in (priority, seq) order —
    # smaller = sooner.  Default ranks by depth so listing discovery is
    # not starved by deep album chains under tight politeness budgets.
    # Visit order and the seen set are unaffected (both are seq-defined);
    # the cross-round image first-wins gate, however, is first-ROUND-wins,
    # so depth-priority release could flip a stored winner when pages at
    # different depths on one host produce the same image_id under
    # politeness deferral (not reachable in the reference fixtures, where
    # image-producing pages of an album share a depth — see the module
    # docstring's single-chain caveat; key the written gate on min-seq if
    # strict parity is ever needed there)
    priority_by_depth: bool = True
    # album-gate hook (ref src/main.rs:412-468 Y/N/All/Cancel prompt as
    # a deterministic, serializable callable; see parse_page_batch):
    # gate(label, index, n_albums, page_url) -> "y"|"n"|"all"|"cancel"
    album_gate: object = None
    # tiny rounds (seed round, drain tail) run their fetch→gate→sink
    # inline on the driver in pipelined mode: a streaming execution has
    # ~0.5-1s of fixed launch/drain cost, pure overhead for a handful
    # of rows.  Kept small: a "row" can carry heavy image work, so
    # inlining bigger rounds forfeits real parallelism
    inline_round_threshold: int = 8
    # 'task': map_batches tasks with a per-worker-process memoized fetch
    #   client (setup-once without per-round actor-pool startup latency —
    #   right when client construction is cheap, as with the synthetic
    #   web / an HTTP session object);
    # 'actor': classic actor pools (right for heavy per-worker state:
    #   model weights, large caches)
    stage_mode: str = "task"


class Crawler:
    def __init__(self, cfg: CrawlerConfig):
        self.cfg = cfg
        self.sink = LanceLite.create(os.path.join(cfg.root, "images.lance"),
                                     S.IMAGES)
        self.ckpt = os.path.join(cfg.root, "ckpt")
        os.makedirs(self.ckpt, exist_ok=True)
        self.seen = ShardedSeen(
            cfg.seen_shards,
            # exact-set paging to sorted on-disk runs (10^10-URL shape;
            # None = all-RAM).  Runs live beside the checkpoint but are
            # actor-local scratch: resume replays the per-round key
            # deltas, re-sharded by the CURRENT seen_shards count
            spill_dir=(os.path.join(self.ckpt, "seen-spill")
                       if cfg.seen_ram_cap else None),
            ram_cap=cfg.seen_ram_cap)
        import uuid as _uuid

        self._client_key = _uuid.uuid4().hex  # per-crawl client memo key
        self.round_times: list[dict] = []  # per-round phase walltimes
        self.scheds = [
            SchedulerShard.remote(cfg.fetcher_factory, cfg.rate_per_round,
                                  cfg.burst, cfg.respect_robots)
            for _ in range(cfg.sched_shards)
        ]
        self.round = 0

    # ------------------------------------------------------------ setup
    def _rdir(self, rnd: int, name: str) -> str:
        d = os.path.join(self.ckpt, f"round-{rnd:04d}", name)
        os.makedirs(d, exist_ok=True)
        return d

    def seed(self, urls: list[str]) -> None:
        rows = []
        for i, u in enumerate(urls):
            host = U.check_host(u)
            if host is None:
                continue
            rows.append({"url": u, "host": host, "depth": 0,
                         "kind": "listing", "priority": 0,
                         "seq": f"{i:0{SEQ_W}d}." + "0" * SEQ_W,
                         "round": 0})
        novel = self.seen.check_and_insert(["u:" + r["url"] for r in rows])
        rows = [r for r, nv in zip(rows, novel) if nv]
        tbl = S.table_from_rows(S.FRONTIER, rows)
        write_frontier_buckets(tbl, self._rdir(0, "frontier"), "seed",
                               self.cfg.frontier_buckets)
        self._write_seen_delta(0)

    def resume(self) -> bool:
        """Restore from the latest committed manifest (north rule:
        checkpointed resume).  Returns True if there is work to do."""
        man = self.sink.manifest()
        meta = man.get("meta", {})
        self.round = int(meta.get("round", 0))
        # replay seen deltas from every committed round
        for r in range(self.round + 1):
            for p in self._seen_paths(r):
                self.seen.restore(pq.read_table(p).column("key").to_pylist())
        return self._frontier_count(self.round) > 0

    # ------------------------------------------------------------ rounds
    def _frontier_paths(self, rnd: int) -> list[str]:
        d = os.path.join(self.ckpt, f"round-{rnd:04d}", "frontier")
        if not os.path.isdir(d):
            return []
        return [os.path.join(d, f) for f in sorted(os.listdir(d))
                if f.endswith(".parquet")]

    def _frontier_count(self, rnd: int) -> int:
        return sum(pq.read_metadata(p).num_rows
                   for p in self._frontier_paths(rnd))

    def _save_stats(self, rnd: int, ds, section: str = "round") -> None:
        """Persist the round's Ray Data execution stats (per-operator
        wall/CPU/UDF time, rows, memory) next to the checkpoint —
        the iterate-on-ds.stats() observability loop, queryable
        after the fact."""
        try:
            with open(os.path.join(self._rdir(rnd, ""), "stats.txt"),
                      "a") as f:
                f.write(f"==== {section} ====\n{ds.stats()}\n")
        except Exception:
            pass  # observability only; never fail the round

    def _bucket_counts(self, t: pa.Table) -> dict[int, int]:
        """Rows per host bucket (lineage partitions == frontier buckets)."""
        out: dict[int, int] = {}
        if t.num_rows:
            for h in t.column("host").to_pylist():
                b = host_bucket(h, self.cfg.frontier_buckets)
                out[b] = out.get(b, 0) + 1
        return out

    def _write_seen_delta(self, rnd: int) -> None:
        # shards write their own delta files in parallel; the keys never
        # cross the driver (O(corpus) serial cost removed)
        self.seen.drain_deltas_to(self._rdir(rnd, ""))

    def _seen_paths(self, rnd: int) -> list[str]:
        d = os.path.join(self.ckpt, f"round-{rnd:04d}")
        if not os.path.isdir(d):
            return []
        return [os.path.join(d, f) for f in sorted(os.listdir(d))
                if f.startswith("seen") and f.endswith(".parquet")]

    def run(self) -> dict:
        """Crawl until the frontier drains; one atomic commit per round."""
        stats = {"rounds": 0, "pages": 0, "images": 0, "bytes": 0}
        while self.round < self.cfg.max_rounds:
            if self._frontier_count(self.round) == 0:
                break
            rs = self.run_round()
            stats["rounds"] += 1
            stats["pages"] += rs["pages"]
            stats["images"] += rs["images"]
            stats["bytes"] += rs["bytes"]
        return stats

    def _release_driver_side(self, frontier: pa.Table, rnd: int) -> pa.Table:
        """Driver-side release for small frontiers: one parallel actor
        call per host, identical semantics to the groupby path."""
        frontier = frontier.sort_by([("host", "ascending"),
                                     ("priority", "ascending"),
                                     ("seq", "ascending")])
        hosts = frontier.column("host").to_pylist()
        urls = frontier.column("url").to_pylist()
        by_host: dict[str, list[int]] = {}
        for i, h in enumerate(hosts):
            by_host.setdefault(h, []).append(i)
        futs = {}
        for h, idxs in by_host.items():
            futs[h] = self.scheds[host_shard(h, len(self.scheds))] \
                .filter_and_grant.remote(h, [urls[i] for i in idxs], rnd + 1)
        verdicts = [""] * frontier.num_rows
        for h, idxs in by_host.items():
            vals = retry_actor_get(
                futs[h],
                lambda h=h: self.scheds[host_shard(h, len(self.scheds))]
                .filter_and_grant.remote(
                    h, [urls[i] for i in by_host[h]], rnd + 1))
            for i, v in zip(idxs, vals):
                verdicts[i] = v
        return frontier.append_column(VERDICT,
                                      pa.array(verdicts, type=pa.string()))

    def _repair_contested(self, frag_rows: list[dict],
                          contested: dict[str, str]) -> list[dict]:
        """Strict name-dedup finalize: rewrite (rare) fragments holding a
        row whose image_id was superseded by a smaller-seq claim, keeping
        only the winning row.  Reads only (image_id, seq) columns to find
        affected fragments; runs before the round's manifest commit, so
        readers never see a losing row."""
        out: list[dict] = []
        for r in frag_rows:
            full = os.path.join(self.sink.root, r["path"])
            meta = pq.read_table(full, columns=["image_id", "seq"])
            losers = [
                i for i, (iid, sq) in enumerate(zip(
                    meta.column("image_id").to_pylist(),
                    meta.column("seq").to_pylist()))
                if contested.get("w:" + iid) not in (None, sq)
            ]
            if not losers:
                out.append(r)
                continue
            tbl = pq.read_table(full)
            keep = np.ones(tbl.num_rows, dtype=bool)
            keep[losers] = False
            tbl = tbl.filter(pa.array(keep))
            if tbl.num_rows == 0:
                os.unlink(full)
                continue
            hint = os.path.basename(r["path"])[len("frag-"):-len(".parquet")]
            self.sink.stage_fragment(tbl, hint)  # atomic same-name rewrite
            nb = int(pc.sum(pc.binary_length(tbl.column("bytes")))
                     .as_py() or 0)
            out.append({"path": r["path"], "rows": tbl.num_rows,
                        "nbytes": nb})
        return out

    def run_round(self) -> dict:
        cfg = self.cfg
        rnd = self.round
        nb = cfg.frontier_buckets
        t0 = time.time()
        tm: dict[str, float] = {}
        _last = [t0]

        def _mark(name: str) -> None:
            now = time.time()
            tm[name] = round(tm.get(name, 0.0) + (now - _last[0]), 3)
            _last[0] = now

        fpaths = self._frontier_paths(rnd)
        n_frontier = self._frontier_count(rnd)
        # per-bucket frontier sizes from file metadata (file names carry
        # the host bucket) — lineage input counts without reading rows
        per_in: dict[int, int] = {}
        for p in fpaths:
            b = int(os.path.basename(p)[1:3])
            per_in[b] = per_in.get(b, 0) + pq.read_metadata(p).num_rows

        next_fdir = self._rdir(rnd + 1, "frontier")
        for f in os.listdir(next_fdir):  # crash debris of a failed attempt
            os.unlink(os.path.join(next_fdir, f))

        if n_frontier <= cfg.release_driver_threshold:
            # small frontier: per-host release via the scheduler actors,
            # no extra Ray job (calls fan out in parallel per host);
            # deferred rows go straight to next-round bucket files
            ft = pa.concat_tables([pq.read_table(p) for p in fpaths])
            rel_tbl = self._release_driver_side(ft, rnd)
            v = rel_tbl.column(VERDICT) if rel_tbl.num_rows else \
                pa.array([], type=pa.string())
            released = rel_tbl.filter(pc.equal(v, "release")) \
                .drop_columns([VERDICT])
            deferred = rel_tbl.filter(pc.equal(v, "defer")) \
                .drop_columns([VERDICT])
            write_frontier_buckets(
                to_frontier(deferred, rnd + 1, cfg.priority_by_depth),
                next_fdir, "defer", nb)
        else:
            # scale path: one release task per host bucket — each task
            # reads its own bucket files, grants per host, and writes
            # deferred rows directly to the next round's bucket file;
            # only the released rows (bounded by politeness budget ×
            # hosts) are materialized on the driver.  Buckets whose
            # frontier exceeds release_salt_threshold rows are instead
            # SALTED: parallel presift chunk tasks (row-group reads,
            # worker-side deferral, ≤ burst candidates per host) feed
            # one driver-side grant per host — skew in the host→bucket
            # hash never serializes a round on one release task
            import json

            by_bucket: dict[int, list[str]] = {}
            for p in fpaths:
                by_bucket.setdefault(int(os.path.basename(p)[1:3]),
                                     []).append(p)
            cold_items, hot_items = [], []
            for b, ps in sorted(by_bucket.items()):
                if per_in.get(b, 0) > cfg.release_salt_threshold:
                    for ci, parts in enumerate(
                            _plan_chunks(ps, cfg.release_salt_threshold)):
                        hot_items.append(
                            {"chunk": f"b{b:02d}c{ci:04d}-r{rnd}",
                             "parts": json.dumps(parts)})
                else:
                    cold_items.append({"bucket": b, "paths": json.dumps(ps)})
            rel_parts: list[pa.Table] = []
            if cold_items:
                rel_out = ray.data.from_items(cold_items).map_batches(
                    partial(release_bucket_batch, scheds=self.scheds,
                            now_round=rnd + 1, next_fdir=next_fdir, nb=nb),
                    batch_format="pyarrow", batch_size=1)
                rel_parts += [t for t in (ray.get(r)
                                          for r in rel_out.to_arrow_refs())
                              if t.num_rows]
            if hot_items:
                pres = ray.data.from_items(hot_items).map_batches(
                    partial(presift_bucket_batch, scheds=self.scheds,
                            now_round=rnd + 1, next_fdir=next_fdir, nb=nb,
                            cand_per_host=int(np.ceil(cfg.burst))),
                    batch_format="pyarrow", batch_size=1)
                cand_tbls = [t for t in (ray.get(r)
                                         for r in pres.to_arrow_refs())
                             if t.num_rows]
                self._save_stats(rnd + 1, pres, "presift release")
                if cand_tbls:
                    cand = pa.concat_tables(cand_tbls,
                                            promote_options="default")
                    hot_rel = self._release_driver_side(cand, rnd)
                    v = hot_rel.column(VERDICT)
                    write_frontier_buckets(
                        to_frontier(
                            hot_rel.filter(pc.equal(v, "defer"))
                            .drop_columns([VERDICT]),
                            rnd + 1, cfg.priority_by_depth),
                        next_fdir, "defer-hot", nb)
                    rel_hot = hot_rel.filter(pc.equal(v, "release")) \
                        .drop_columns([VERDICT])
                    if rel_hot.num_rows:
                        rel_parts.append(rel_hot)
            released = (pa.concat_tables(rel_parts,
                                         promote_options="default")
                        if rel_parts else S.FRONTIER.empty_table())
        _mark("release")

        # fetch + extract + gate (HTML never leaves the PageParser actors).
        # Pre-split the released table into blocks by zero-copy slicing —
        # a Repartition operator here is an upstream barrier that cost
        # ~2s/round of dead time before the first fetch task could start
        rel_ds = _from_arrow_split(
            released, max(1, min(8 * cfg.fetch_concurrency,
                                 -(-released.num_rows // cfg.fetch_batch))))
        if cfg.stage_mode == "actor":
            fetched = rel_ds.map_batches(
                PageParser, batch_format="pyarrow",
                batch_size=cfg.fetch_batch,
                concurrency=(1, cfg.fetch_concurrency),
                fn_constructor_args=(cfg.fetcher_factory, cfg.site_cfg,
                                     cfg.album_gate))
        else:
            fetched = rel_ds.map_batches(
                partial(parse_page_task, fetcher_factory=cfg.fetcher_factory,
                        client_key=self._client_key, site_cfg=cfg.site_cfg,
                        album_gate=cfg.album_gate),
                batch_format="pyarrow", batch_size=cfg.fetch_batch)
        data_dir = self.sink.data_dir
        strict = cfg.strict_name_dedup
        frag_rows: list[dict] = []
        # single streaming execution per round: fetch+extract, gate
        # (spilling page/link rows to parquet side files) and the fused
        # image decode→gate→write all overlap — pages are still being
        # fetched while earlier pages' images decode.  This is the ONLY
        # crawl path: strict min-seq name dedup runs inside it via the
        # seq-aware claim gate + finalize repair (no driver materialize,
        # no groupby(image_id) byte shuffle — VERDICT r2 #1)
        spill_dir = self._rdir(rnd + 1, "extract")
        for f in os.listdir(spill_dir):  # stale files from a crash
            os.unlink(os.path.join(spill_dir, f))

        def _imgs_only(b: pa.Table) -> pa.Table:
            return b.filter(pc.equal(b.column("row_kind"), "img"))

        if released.num_rows <= cfg.inline_round_threshold:
            # tiny round: same functions, driver-inline — skips the
            # streaming-execution launch/drain fixed cost
            ex = parse_page_batch(
                released, _cached_client(cfg.fetcher_factory,
                                         self._client_key),
                cfg.site_cfg, album_gate=cfg.album_gate)
            g = gate_batch(ex, self.seen, spill_dir=spill_dir,
                           rnd=rnd, nb=nb)
            frag_rows = image_sink_task(
                _imgs_only(g), fetcher_factory=cfg.fetcher_factory,
                client_key=self._client_key,
                store_data_uris=cfg.store_data_uris,
                seen=self.seen, data_dir=data_dir,
                rnd=rnd, strict=strict).to_pylist()
        else:
            gated = fetched.map_batches(
                partial(gate_batch, seen=self.seen, spill_dir=spill_dir,
                        rnd=rnd, nb=nb),
                batch_format="pyarrow",
            ).map_batches(_imgs_only, batch_format="pyarrow")
            if cfg.stage_mode == "actor":
                pipeline = gated.map_batches(
                    ImageSink, batch_format="pyarrow",
                    batch_size=None,
                    concurrency=(1, cfg.img_concurrency),
                    fn_constructor_args=(cfg.fetcher_factory,
                                         cfg.store_data_uris, self.seen,
                                         data_dir, rnd, strict))
            else:
                pipeline = gated.map_batches(
                    partial(image_sink_task,
                            fetcher_factory=cfg.fetcher_factory,
                            client_key=self._client_key,
                            store_data_uris=cfg.store_data_uris,
                            seen=self.seen, data_dir=data_dir,
                            rnd=rnd, strict=strict),
                    # batch_size=None: Ray fuses this chain into ONE
                    # operator and bundles input blocks up to the
                    # LARGEST batch_size — a row target here would
                    # bundle 32 PAGES per task (4x parallelism loss
                    # on heavy-image rounds).  The per-page image
                    # fan-out already sizes this stage's batches.
                    batch_format="pyarrow", batch_size=None)
            with _fine_task_bundling():
                frag_rows = pipeline.take_all()
            self._save_stats(rnd + 1, pipeline, "pipelined round")
        _mark("pipeline")
        files = sorted(os.listdir(spill_dir))
        pgf = [os.path.join(spill_dir, f) for f in files
               if f.startswith("pg-") and f.endswith(".parquet")]
        lnf = [os.path.join(spill_dir, f) for f in files
               if f.startswith("ln-") and f.endswith(".parquet")]
        icf = [os.path.join(spill_dir, f) for f in files
               if f.startswith("ic-") and f.endswith(".parquet")]
        # pages are politeness-bounded (≤ released rows) — driver ok
        pages = (_read_many(pgf) if pgf else EXTRACT.empty_table())
        per_imgs: dict[int, int] = {}
        for p in icf:  # tiny per-bucket img-count partials (lineage)
            t = pq.read_table(p)
            for bk, n in zip(t.column("bucket").to_pylist(),
                             t.column("n").to_pylist()):
                per_imgs[bk] = per_imgs.get(bk, 0) + n
        _mark("spill_read")

        # link admission: DFS-first min-seq per URL + novelty gate.
        # Small rounds run it vectorized on the driver; large rounds
        # as a distributed groupby(url) whose terminal stage writes
        # the next frontier per host bucket from the workers — link
        # rows never concatenate on the driver (VERDICT r1 #2/#3)
        n_links = sum(pq.read_metadata(p).num_rows for p in lnf)
        if n_links == 0:
            pass
        elif n_links <= cfg.release_driver_threshold:
            links = admit_links_min_seq(_read_many(lnf))
            links = gate_links_batch(links, self.seen)
            write_frontier_buckets(
                to_frontier(links, rnd + 1, cfg.priority_by_depth),
                next_fdir, "links-d", nb)
        else:
            adm = (
                ray.data.read_parquet(lnf)
                .map_batches(admit_links_min_seq,
                             batch_format="pyarrow")
                .groupby("url")
                .map_groups(dedup_min_seq, batch_format="pyarrow")
                .map_batches(partial(gate_links_batch, seen=self.seen),
                             batch_format="pyarrow")
                .map_batches(
                    partial(links_frontier_write, fdir=next_fdir,
                            rnd=rnd + 1,
                            priority_by_depth=cfg.priority_by_depth,
                            nb=nb),
                    batch_format="pyarrow")
            )
            adm.take_all()
            self._save_stats(rnd + 1, adm, "link admission")
        _mark("admission")

        if strict:
            # finalize the min-seq name dedup: drop provisionally-written
            # rows whose image_id was later claimed by a smaller seq.
            # Collisions are rare — the common round drains an empty dict
            # and touches no fragment
            contested = self.seen.drain_contested()
            if contested:
                frag_rows = self._repair_contested(frag_rows, contested)
            _mark("repair")

        # visit log + lineage + seen delta, then ONE atomic commit
        # (next frontier was already written per host bucket above:
        # deferred rows at release time, novel links at admission time).
        # The visit-log write and the actor-side seen-delta drain are
        # independent — overlap them; the commit below is the barrier
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(2) as _tp:
            _fv = _tp.submit(
                pq.write_table,
                pages.select(["url", "host", "status", "seq", "depth",
                              "kind"]),
                os.path.join(self._rdir(rnd + 1, ""), "visits.parquet"))
            _fs = _tp.submit(self._write_seen_delta, rnd + 1)
            _fv.result()
            _fs.result()
        n_images = sum(r["rows"] for r in frag_rows)
        n_bytes = sum(r["nbytes"] for r in frag_rows)
        # per-partition lineage (north rule): partition = hash(host) % P;
        # urls_in / fetched / extracted-images counted per partition
        # (vectorized), plus a round-total row (partition_id = -1) that
        # carries the authoritative stored-image/byte counts
        t_end = int(time.time() * 1e6)
        pages_ok = pages.filter(pc.greater(pages.column("status"), 0))
        per_pages = self._bucket_counts(pages_ok)
        lrows = [{
            "partition_id": -1, "round": rnd + 1,
            "urls_in": n_frontier, "fetched": pages_ok.num_rows,
            "images": n_images, "bytes": n_bytes,
            "t_start": int(t0 * 1e6), "t_end": t_end,
        }]
        for b in sorted(set(per_in) | set(per_pages) | set(per_imgs)):
            lrows.append({
                "partition_id": b, "round": rnd + 1,
                "urls_in": per_in.get(b, 0), "fetched": per_pages.get(b, 0),
                "images": per_imgs.get(b, 0), "bytes": 0,
                "t_start": int(t0 * 1e6), "t_end": t_end,
            })
        pq.write_table(S.table_from_rows(S.LINEAGE, lrows),
                       os.path.join(self._rdir(rnd + 1, ""), "lineage.parquet"))
        self.sink.commit([r["path"] for r in frag_rows],
                         meta={"round": rnd + 1, "ckpt": self.ckpt})
        self.round = rnd + 1
        _mark("finalize")
        tm["wall"] = round(time.time() - t0, 3)
        self.round_times.append(tm)
        try:
            with open(os.path.join(self._rdir(rnd + 1, ""), "stats.txt"),
                      "a") as f:
                f.write(f"==== phase times ====\n{tm}\n")
        except OSError:
            pass
        return {"pages": pages_ok.num_rows, "images": n_images,
                "bytes": n_bytes}

    # ------------------------------------------------------------ results
    def visit_order(self) -> list[str]:
        tbls = []
        for r in range(self.round + 1):
            p = os.path.join(self.ckpt, f"round-{r:04d}", "visits.parquet")
            if os.path.exists(p):
                tbls.append(pq.read_table(p))
        if not tbls:
            return []
        t = pa.concat_tables(tbls)
        # failed fetches (negative status) are attempts, not visits
        t = t.filter(pc.greater(t.column("status"), 0)).sort_by("seq")
        return t.column("url").to_pylist()

    def seen_urls(self) -> set[str]:
        out: set[str] = set()
        for r in range(self.round + 1):
            for p in self._seen_paths(r):
                for k in pq.read_table(p).column("key").to_pylist():
                    if k.startswith("u:"):
                        out.add(k[2:])
        return out

    def images_table(self) -> pa.Table:
        return self.sink.to_table()

    def lineage_table(self) -> pa.Table:
        tbls = []
        for r in range(self.round + 1):
            p = os.path.join(self.ckpt, f"round-{r:04d}", "lineage.parquet")
            if os.path.exists(p):
                tbls.append(pq.read_table(p))
        return pa.concat_tables(tbls) if tbls else S.LINEAGE.empty_table()
