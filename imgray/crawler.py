"""The Ray-Data-native crawl engine (SURVEY.md §3.3 rebuild shape, §7 step 4).

The reference's sequential ``while next_page`` loop (src/main.rs:38-47)
becomes BSP crawl rounds over a checkpointed frontier:

    ckpt/round-r/frontier/ ──read_parquet──▶ groupby(host) release
        (politeness token bucket + robots, SchedulerShard actors)
      released ─▶ map_batches(PageParser pool)   fetch + extract in ONE
        stage: HTML never crosses a stage boundary (project early —
        SURVEY.md §4 memory row)
      ─▶ map_batches(seen gate: ShardedSeen cuckoo actors, batched)
      ─▶ img rows ─ map_batches(ImageWorker pool) fetch/decode/pHash
      ─▶ groupby(image_id) min-seq dedup ─ written-id gate
      ─▶ map_batches(fragment writer) → Lance-shaped sink
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
from .state.cuckoo import ShardedSeen
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


def parse_page_batch(batch: pa.Table, fetch, site_cfg: list[dict]) -> pa.Table:
    """Fetch + extract one batch of frontier rows (the reference's
    parse() body over a batch; HTML never leaves this function)."""
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
                for detail_url, _k in p.urls:
                    out.append({"row_kind": "seen", "url": detail_url,
                                "host": host, "seq": seq})
                    dresp = fetch(detail_url)
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
            for j, href in enumerate(p.album_hrefs):
                ahost = U.check_host(href)
                if ahost is None:
                    continue
                out.append({"row_kind": "link", "url": href, "host": ahost,
                            "seq": seq_child(seq, j), "depth": depth + 1,
                            "kind": "album"})
            if p.next_url:
                nhost = U.check_host(p.next_url)
                if nhost is not None:
                    out.append({"row_kind": "link", "url": p.next_url,
                                "host": nhost, "seq": seq_next(seq),
                                "depth": depth, "kind": kind})
    return S.table_from_rows(EXTRACT, out)


class PageParser:
    """Fetch + extract actor (stateful: fetch client + site config built
    once per actor — SURVEY.md §2.3).  Actor-pool mode."""

    def __init__(self, fetcher_factory, site_cfg: list[dict]):
        self.fetch = fetcher_factory()
        self.cfg = site_cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        return parse_page_batch(batch, self.fetch, self.cfg)


def parse_page_task(batch: pa.Table, fetcher_factory, client_key: str,
                    site_cfg: list[dict]) -> pa.Table:
    """Task-mode stage: client memoized per worker process."""
    return parse_page_batch(batch, _cached_client(fetcher_factory, client_key),
                            site_cfg)


def gate_batch(batch: pa.Table, seen: ShardedSeen,
               spill_dir: str | None = None, rnd: int = 0) -> pa.Table:
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
    rows = batch.to_pylist()
    keys: list[str] = []
    owners: list[tuple[int, str]] = []  # (row idx, gate kind)
    for i, r in enumerate(rows):
        rk = r["row_kind"]
        if rk == "img":
            keys.append("u:" + r["url"])
            owners.append((i, "ins"))
            keys.append(f"i:{r['album']}\x00{r['url']}\x00{r['caption'] or ''}")
            owners.append((i, "img"))
        elif rk == "seen":
            keys.append("u:" + r["url"])
            owners.append((i, "ins"))
    novel = seen.check_and_insert(keys)
    # link rows pass through UNGATED: gating them here would let task
    # timing decide which discovery's seq survives when two pages find
    # the same URL in one round; the driver gates links once per round
    # after a deterministic min-seq dedup (DFS-first order, like the
    # sequential reference)
    keep = [r["row_kind"] in ("page", "link") for r in rows]
    for (i, gk), nv in zip(owners, novel):
        if gk == "img":
            keep[i] = nv
    kept = [r for i, r in enumerate(rows) if keep[i]]
    out = S.table_from_rows(EXTRACT, kept)
    if spill_dir is not None:
        side = out.filter(pc.is_in(out.column("row_kind"),
                                   value_set=pa.array(["page", "link",
                                                       "img"])))
        if side.num_rows:
            name = hashlib.blake2b(
                "|".join(side.column("seq").to_pylist()).encode(),
                digest_size=8).hexdigest()
            tmp = os.path.join(spill_dir, f".tmp-{name}")
            pq.write_table(side, tmp)
            os.replace(tmp, os.path.join(spill_dir, f"ex-{rnd}-{name}.parquet"))
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


class ImageWorker:
    """Image fetch/decode/pHash actor (actor-pool mode)."""

    def __init__(self, fetcher_factory, store_data_uris: bool = True):
        self.fetch = fetcher_factory()
        self.store_data_uris = store_data_uris

    def __call__(self, batch: pa.Table) -> pa.Table:
        return image_batch(batch, self.fetch, self.store_data_uris)


def image_task(batch: pa.Table, fetcher_factory, client_key: str,
               store_data_uris: bool) -> pa.Table:
    """Task-mode stage: client memoized per worker process."""
    return image_batch(batch, _cached_client(fetcher_factory, client_key),
                       store_data_uris)


def image_sink_task(batch: pa.Table, fetcher_factory, client_key: str,
                    store_data_uris: bool, seen, data_dir: str,
                    rnd: int) -> pa.Table:
    """Fused fetch→decode→gate→fragment-write stage: image bytes never
    re-enter the object store between sub-steps (single task, single
    local write) — the hot-path fusion the streaming executor can't
    guarantee across differing map args."""
    t = image_batch(batch, _cached_client(fetcher_factory, client_key),
                    store_data_uris)
    t = written_gate(t, seen)
    return write_fragment(t, data_dir, rnd)


def release_group(group: pa.Table, scheds: list, now_round: int) -> pa.Table:
    """Per-host frontier release: seq-sort, robots filter + token grant
    via the host's owning SchedulerShard (one actor call per host)."""
    if group.num_rows == 0:
        return group.append_column(VERDICT, pa.array([], type=pa.string()))
    group = group.sort_by([("priority", "ascending"),
                           ("seq", "ascending")])
    host = group.column("host")[0].as_py()
    urls = group.column("url").to_pylist()
    shard = int.from_bytes(
        hashlib.blake2b(host.encode(), digest_size=4).digest(), "big"
    ) % len(scheds)
    verdicts = ray.get(
        scheds[shard].filter_and_grant.remote(host, urls, now_round))
    return group.append_column(VERDICT, pa.array(verdicts, type=pa.string()))


def dedup_min_seq(group: pa.Table) -> pa.Table:
    """groupby(image_id) → keep the row with the smallest seq (the
    reference's --no-clobber first-wins, ref src/main.rs:16)."""
    if group.num_rows <= 1:
        return group
    return group.sort_by("seq").slice(0, 1)


def written_gate(batch: pa.Table, seen: ShardedSeen) -> pa.Table:
    if batch.num_rows == 0:
        return batch
    ids = batch.column("image_id").to_pylist()
    novel = seen.check_and_insert(["w:" + i for i in ids])
    return batch.filter(pa.array(novel))


def write_fragment(batch: pa.Table, data_dir: str, rnd: int) -> pa.Table:
    """Distributed sink write: each block becomes one immutable fragment
    file; paths flow back for the driver's atomic manifest commit."""
    if batch.num_rows == 0:
        return pa.table({"path": pa.array([], type=pa.string()),
                         "rows": pa.array([], type=pa.int64()),
                         "nbytes": pa.array([], type=pa.int64())})
    tbl = batch.select([f.name for f in S.IMAGES])
    ids = batch.column("image_id")
    name = hashlib.blake2b(
        "|".join((ids[0].as_py(), ids[-1].as_py(),
                  str(batch.num_rows))).encode(),
        digest_size=8).hexdigest()
    # one fragment-layout implementation: reuse the sink's staging
    # protocol (tmp write + atomic rename under <root>/data/)
    rel = LanceLite(os.path.dirname(data_dir)).stage_fragment(
        tbl, f"r{rnd}-{name}")
    nbytes = sum(len(b) for b in batch.column("bytes").to_pylist() if b)
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
    # strict within-round image_id name-collision dedup (groupby shuffle);
    # off ⇒ collisions across *different* URLs resolve first-come (the
    # (album,url,caption) gate still dedups exactly) — a throughput knob
    strict_name_dedup: bool = True
    # frontier release: below this row count the release runs driver-side
    # (same politeness actors, no shuffle); above it, distributed groupby
    release_driver_threshold: int = 100000
    # frontier priority: released per host in (priority, seq) order —
    # smaller = sooner.  Default ranks by depth so listing discovery is
    # not starved by deep album chains under tight politeness budgets;
    # final results are unaffected (ordering contract is seq-defined)
    priority_by_depth: bool = True
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
        self.seen = ShardedSeen(cfg.seen_shards)
        import uuid as _uuid

        self._client_key = _uuid.uuid4().hex  # per-crawl client memo key
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
        pq.write_table(tbl, os.path.join(self._rdir(0, "frontier"), "part-0.parquet"))
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
            shard = int.from_bytes(
                hashlib.blake2b(h.encode(), digest_size=4).digest(), "big"
            ) % len(self.scheds)
            futs[h] = self.scheds[shard].filter_and_grant.remote(
                h, [urls[i] for i in idxs], rnd + 1)
        verdicts = [""] * frontier.num_rows
        for h, idxs in by_host.items():
            for i, v in zip(idxs, ray.get(futs[h])):
                verdicts[i] = v
        return frontier.append_column(VERDICT,
                                      pa.array(verdicts, type=pa.string()))

    def run_round(self) -> dict:
        cfg = self.cfg
        rnd = self.round
        t0 = time.time()

        n_frontier = self._frontier_count(rnd)
        if n_frontier <= cfg.release_driver_threshold:
            # small frontier: same per-host release via the scheduler
            # actors, no shuffle (calls fan out in parallel per host)
            ft = pa.concat_tables(
                [pq.read_table(p) for p in self._frontier_paths(rnd)])
            rel_tbl = self._release_driver_side(ft, rnd)
        else:
            frontier = ray.data.read_parquet(self._frontier_paths(rnd))
            released_out = (
                frontier.groupby("host")
                .map_groups(partial(release_group, scheds=self.scheds,
                                    now_round=rnd + 1),
                            batch_format="pyarrow")
                .materialize()
            )
            rel_tbl = pa.concat_tables(
                [ray.get(ref) for ref in released_out.to_arrow_refs()],
                promote_options="default",
            )
        if rel_tbl.num_rows:
            released = rel_tbl.filter(pc.equal(rel_tbl.column(VERDICT), "release"))
            deferred = rel_tbl.filter(pc.equal(rel_tbl.column(VERDICT), "defer"))
        else:
            released = deferred = rel_tbl

        # fetch + extract + gate (HTML never leaves the PageParser actors)
        rel_ds = ray.data.from_arrow(released.drop_columns([VERDICT]))
        nb = max(1, min(8 * cfg.fetch_concurrency,
                        -(-released.num_rows // cfg.fetch_batch)))
        if nb > 1:
            rel_ds = rel_ds.repartition(nb)  # split for pool parallelism
        if cfg.stage_mode == "actor":
            fetched = rel_ds.map_batches(
                PageParser, batch_format="pyarrow",
                batch_size=cfg.fetch_batch,
                concurrency=(1, cfg.fetch_concurrency),
                fn_constructor_args=(cfg.fetcher_factory, cfg.site_cfg))
        else:
            fetched = rel_ds.map_batches(
                partial(parse_page_task, fetcher_factory=cfg.fetcher_factory,
                        client_key=self._client_key, site_cfg=cfg.site_cfg),
                batch_format="pyarrow", batch_size=cfg.fetch_batch)
        data_dir = self.sink.data_dir
        pipelined = (cfg.stage_mode != "actor"
                     and not cfg.strict_name_dedup)
        frag_rows: list[dict] = []
        if pipelined:
            # single streaming execution per round: fetch+extract, gate
            # (spilling page/link rows to parquet side files) and the
            # fused image decode→gate→write all overlap — pages are
            # still being fetched while earlier pages' images decode
            spill_dir = self._rdir(rnd + 1, "extract")
            for f in os.listdir(spill_dir):  # stale files from a crash
                os.unlink(os.path.join(spill_dir, f))

            def _imgs_only(b: pa.Table) -> pa.Table:
                return b.filter(pc.equal(b.column("row_kind"), "img"))

            pipeline = (
                fetched
                .map_batches(partial(gate_batch, seen=self.seen,
                                     spill_dir=spill_dir, rnd=rnd),
                             batch_format="pyarrow")
                .map_batches(_imgs_only, batch_format="pyarrow")
                .map_batches(
                    partial(image_sink_task,
                            fetcher_factory=cfg.fetcher_factory,
                            client_key=self._client_key,
                            store_data_uris=cfg.store_data_uris,
                            seen=self.seen, data_dir=data_dir, rnd=rnd),
                    batch_format="pyarrow", batch_size=cfg.img_batch)
            )
            frag_rows = pipeline.take_all()
            self._save_stats(rnd + 1, pipeline, "pipelined round")
            spilled = [os.path.join(spill_dir, f)
                       for f in sorted(os.listdir(spill_dir))
                       if f.endswith(".parquet")]
            ex_tbl = (pa.concat_tables([pq.read_table(p) for p in spilled])
                      if spilled else EXTRACT.empty_table())
        else:
            extract = (
                fetched
                .map_batches(partial(gate_batch, seen=self.seen),
                             batch_format="pyarrow")
                .materialize()
            )
            ex_tbl = pa.concat_tables(
                [ray.get(r) for r in extract.to_arrow_refs()],
                promote_options="default",
            )
            self._save_stats(rnd + 1, extract, "fetch+extract")
            if ex_tbl.num_rows == 0:
                ex_tbl = EXTRACT.empty_table()
        pages = ex_tbl.filter(pc.equal(ex_tbl.column("row_kind"), "page"))
        links = ex_tbl.filter(pc.equal(ex_tbl.column("row_kind"), "link"))
        imgs = ex_tbl.filter(pc.equal(ex_tbl.column("row_kind"), "img"))

        # deterministic link admission: sort by seq, first discovery of
        # each URL wins (DFS order), then ONE batched seen-gate call
        if links.num_rows:
            links = links.sort_by("seq")
            urls_l = links.column("url").to_pylist()
            first_idx: dict[str, int] = {}
            for i, u in enumerate(urls_l):
                first_idx.setdefault(u, i)
            links = links.take(pa.array(sorted(first_idx.values())))
            novel = self.seen.check_and_insert(
                ["u:" + u for u in links.column("url").to_pylist()])
            links = links.filter(pa.array(novel))

        # non-pipelined: image fetch → decode → (strict min-seq dedup) →
        # written gate → distributed fragment write
        if not pipelined and imgs.num_rows:
            img_ds = ray.data.from_arrow(imgs)
            nbi = max(1, min(4 * cfg.img_concurrency,
                             -(-imgs.num_rows // cfg.img_batch)))
            if nbi > 1:
                img_ds = img_ds.repartition(nbi)
            if cfg.stage_mode == "actor":
                frags = img_ds.map_batches(
                    ImageWorker, batch_format="pyarrow",
                    batch_size=cfg.img_batch,
                    concurrency=(1, cfg.img_concurrency),
                    fn_constructor_args=(cfg.fetcher_factory,
                                         cfg.store_data_uris))
            else:
                frags = img_ds.map_batches(
                    partial(image_task,
                            fetcher_factory=cfg.fetcher_factory,
                            client_key=self._client_key,
                            store_data_uris=cfg.store_data_uris),
                    batch_format="pyarrow", batch_size=cfg.img_batch)
            if cfg.strict_name_dedup:
                frags = frags.groupby("image_id").map_groups(
                    dedup_min_seq, batch_format="pyarrow")
            frags = (
                frags
                .map_batches(partial(written_gate, seen=self.seen),
                             batch_format="pyarrow")
                .map_batches(partial(write_fragment, data_dir=data_dir,
                                     rnd=rnd),
                             batch_format="pyarrow")
            )
            frag_rows = frags.take_all()
            self._save_stats(rnd + 1, frags, "image pipeline")

        # next frontier = deferred ∪ novel links (vectorized: no python
        # row loops on the driver)
        def _to_frontier(t: pa.Table) -> pa.Table:
            n = t.num_rows
            if "priority" in t.column_names:
                prio = pc.cast(t.column("priority"), pa.int32())
            elif cfg.priority_by_depth:
                prio = pc.cast(t.column("depth"), pa.int32())
            else:
                prio = pa.nulls(n, pa.int32()).fill_null(0)
            return pa.table({
                "url": t.column("url"), "host": t.column("host"),
                "depth": pc.cast(t.column("depth"), pa.int32()),
                "kind": t.column("kind"),
                "priority": prio,
                "seq": t.column("seq"),
                "round": pa.nulls(n, pa.int32()).fill_null(rnd + 1),
            }, schema=S.FRONTIER)

        nxt = pa.concat_tables([_to_frontier(links),
                                _to_frontier(deferred)])
        fdir = self._rdir(rnd + 1, "frontier")
        pq.write_table(nxt, os.path.join(fdir, "part-0.parquet"))

        # visit log + lineage + seen delta, then ONE atomic commit
        pq.write_table(
            pages.select(["url", "host", "status", "seq", "depth", "kind"]),
            os.path.join(self._rdir(rnd + 1, ""), "visits.parquet"))
        self._write_seen_delta(rnd + 1)
        n_images = sum(r["rows"] for r in frag_rows)
        n_bytes = sum(r["nbytes"] for r in frag_rows)
        # per-partition lineage (north rule): partition = hash(host) % P;
        # urls_in / fetched / extracted-images counted per partition
        # (vectorized), plus a round-total row (partition_id = -1) that
        # carries the authoritative stored-image/byte counts
        t_end = int(time.time() * 1e6)

        def _bucket(t: pa.Table) -> dict[int, int]:
            if t.num_rows == 0:
                return {}
            hosts = t.column("host").to_pylist()
            out: dict[int, int] = {}
            for h in hosts:
                b = int.from_bytes(hashlib.blake2b(
                    h.encode(), digest_size=2).digest(), "big") % 16
                out[b] = out.get(b, 0) + 1
            return out

        pages_ok = pages.filter(pc.greater(pages.column("status"), 0))
        per_in = _bucket(rel_tbl)
        per_pages = _bucket(pages_ok)
        per_imgs = _bucket(imgs)
        lrows = [{
            "partition_id": -1, "round": rnd + 1,
            "urls_in": rel_tbl.num_rows, "fetched": pages_ok.num_rows,
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
