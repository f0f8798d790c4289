"""Cuckoo filter + sharded URL-seen set actors (north rule BASELINE.json).

The reference has **no** global URL-seen structure (SURVEY.md §2.3 —
its only cross-page state is curl --no-clobber on the filesystem); the
north rule adds a sharded cuckoo-filter seen set.  Design
(partial-key cuckoo hashing per Fan et al., "Cuckoo Filter: Practically
Better Than Bloom", CoNEXT 2014 — public algorithm):

  * ``CuckooFilter``: numpy bucket array, 4 fingerprint slots/bucket,
    16-bit fingerprints, i2 = i1 XOR hash(fp).  No false negatives
    (evictions that overflow land in a small exact spill set).
  * ``SeenShard`` (Ray actor): one shard of the seen set — the cuckoo
    filter is the fast approximate gate; an exact per-shard key set
    backs it so false positives never drop a URL.  The exact set is
    the ground truth persisted to the per-round checkpoint, and with
    ``spill_dir``/``ram_cap`` set it PAGES to the shard's sorted
    on-disk runs (``SortedRuns``) while the cuckoo filter stays in
    RAM — the 10^10-URL shape; default is all-RAM.
  * ``ShardedSeen``: client-side router — batches keys per shard
    (hash-partitioned) and fans out ONE actor call per shard per batch
    (never per URL).

Keys are namespaced by the caller ("u:" crawl URLs, "i:" image-fetch
dedup, "w:" written image ids) so one actor pool serves all three
domains.
"""

from __future__ import annotations

import hashlib

import numpy as np
import ray


def retry_actor_get(first_ref, reissue, tries: int = 4):
    """``ray.get`` with reissue-on-ActorUnavailable, for IDEMPOTENT
    actor calls only.  Under host load spikes an actor RPC can exceed
    Ray's 30 s in-order delivery window and surface
    ActorUnavailableError ("may or may not have been executed").
    Every call routed here is retry-idempotent by design — seen-set
    insertions and claims are memoized per (task, batch), politeness
    grants are memoized per (host, round), robots rules are read-only
    — so re-issuing a fresh call is always safe."""
    import time as _time

    from ray.exceptions import ActorUnavailableError

    ref = first_ref
    for attempt in range(tries):
        try:
            return ray.get(ref)
        except ActorUnavailableError:
            if attempt == tries - 1:
                raise
            _time.sleep(1.0 + attempt)
            ref = reissue()
    raise AssertionError("unreachable")


def _hash64(key: str) -> int:
    return int.from_bytes(
        hashlib.blake2b(key.encode(), digest_size=8).digest(), "big"
    )


class CuckooFilter:
    """Partial-key cuckoo hash filter; no false negatives.

    GROWS under load (ADVICE r4): a fixed-capacity cuckoo table
    saturates — inserts degrade to the full 500-kick eviction loop, the
    homeless-fp spill set grows without bound, and the false-positive
    rate approaches 1.  Instead, when the active table passes
    ``GROW_LOAD`` occupancy it is FROZEN (stays probe-only — a cuckoo
    table cannot be rehashed from fingerprints alone) and a new table
    with twice the buckets becomes the insert target: the scalable-
    Bloom-filter pattern (Almeida et al., 2007) applied to cuckoo
    generations.  Generations grow geometrically, so there are
    O(log n / initial) of them, total RAM is < 2× a right-sized table,
    per-insert kicks stay bounded (the active table is never past
    GROW_LOAD), and the aggregate FP rate stays ~ the sum of a
    geometric series of per-table rates.  Crawler therefore needs no
    up-front capacity estimate."""

    SLOTS = 4
    MAX_KICKS = 500
    GROW_LOAD = 0.94  # freeze + double past this occupancy

    def __init__(self, capacity: int = 1 << 16, seed: int = 0):
        n = 1
        while n * self.SLOTS < capacity:
            n <<= 1
        # generations: [(buckets ndarray, nbuckets)], last = active
        self.gens: list[tuple[np.ndarray, int]] = [
            (np.zeros((n, self.SLOTS), dtype=np.uint16), n)]
        # overflow: (nbuckets, min bucket, fp) of evicted-and-homeless
        # fingerprints — keeps the no-false-negative guarantee on the
        # rare MAX_KICKS failure below GROW_LOAD; bounded because a
        # near-full table grows instead of spilling
        self.spill: set[tuple[int, int, int]] = set()
        self.seed = seed
        self.count = 0
        self.gen_count = 0  # fingerprints in the ACTIVE generation

    @staticmethod
    def _fp_of(h: int) -> int:
        return (h & 0xFFFF) or 1  # fingerprint never 0 (0 = empty slot)

    def _fp_idx(self, h: int, nbuckets: int) -> tuple[int, int, int]:
        fp = self._fp_of(h)
        i1 = (h >> 16) & (nbuckets - 1)
        i2 = (i1 ^ self._fp_hash(fp)) & (nbuckets - 1)
        return fp, i1, i2

    def _fp_hash(self, fp: int) -> int:
        # cheap avalanche for fingerprint → partner-bucket offset
        x = (fp * 0x5BD1E995) & 0xFFFFFFFF
        return x ^ (x >> 13)

    def contains_hash(self, h: int) -> bool:
        for buckets, nb in self.gens:
            fp, i1, i2 = self._fp_idx(h, nb)
            if (buckets[i1] == fp).any() or (buckets[i2] == fp).any():
                return True
            if (nb, min(i1, i2), fp) in self.spill:
                return True
        return False

    def _grow(self) -> None:
        _, nb = self.gens[-1]
        self.gens.append(
            (np.zeros((nb * 2, self.SLOTS), dtype=np.uint16), nb * 2))
        self.gen_count = 0

    def insert_hash(self, h: int) -> None:
        buckets, nb = self.gens[-1]
        if self.gen_count >= self.GROW_LOAD * nb * self.SLOTS:
            self._grow()
            buckets, nb = self.gens[-1]
        fp, i1, i2 = self._fp_idx(h, nb)
        for i in (i1, i2):
            row = buckets[i]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = fp
                self.count += 1
                self.gen_count += 1
                return
        # evict loop (active table only)
        rng = h
        i = i1
        cur = fp
        for _ in range(self.MAX_KICKS):
            rng = (rng * 6364136223846793005 + 1442695040888963407) & (2**64 - 1)
            slot = rng & 3
            cur, buckets[i][slot] = int(buckets[i][slot]), cur
            i = (i ^ self._fp_hash(cur)) & (nb - 1)
            row = buckets[i]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = cur
                self.count += 1
                self.gen_count += 1
                return
        # kick failure below GROW_LOAD (rare): the last displaced
        # fingerprint is homeless — spill its canonical form under THIS
        # generation's mask (the new item's fp found a slot in the loop)
        j = (i ^ self._fp_hash(cur)) & (nb - 1)
        self.spill.add((nb, min(i, j), cur))
        self.count += 1
        self.gen_count += 1


class SortedRuns:
    """On-disk sorted string-key runs — the per-shard exact-set spill
    for 10^10-URL scale (VERDICT r3 #7).  Each spill writes ONE sorted
    parquet run (fixed row groups); membership probes binary-search the
    in-RAM per-row-group (min, max) bounds, load at most one row group
    per run (LRU-cached), and binary-search inside it.  Probes only
    happen behind the cuckoo gate, and the shard's RAM set keeps the
    hot recent tail, so cold-run reads are rare."""

    RG = 4096
    CACHE = 64
    COMPACT_AT = 8  # merge all runs into one past this many

    def __init__(self, dir_path: str):
        import os
        import uuid

        # runs are shard-process-local state, NOT checkpoint ground
        # truth (that is the per-round delta parquet) — a fresh actor
        # starts empty and repopulates via restore().  Each instance
        # writes under its OWN uuid subdirectory (ADVICE r4): two
        # actors constructed on the same root (overlapping resume, a
        # shared ckpt root) must never delete each other's live run
        # files, so nothing here removes pre-existing paths — stale
        # sibling dirs are reclaimed when the caller clears the ckpt
        # root.
        self.dir = os.path.join(dir_path, f"inst-{uuid.uuid4().hex[:12]}")
        os.makedirs(self.dir, exist_ok=True)
        self.runs: list[tuple[str, list[str], list[str]]] = []
        self._cache: dict[tuple[str, int], list[str]] = {}
        self._order: list[tuple[str, int]] = []
        self._seq = 0

    def _next_path(self) -> str:
        import os

        self._seq += 1
        return os.path.join(self.dir, f"run-{self._seq:05d}.parquet")

    def spill(self, keys: set[str]) -> None:
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        arr = sorted(keys)
        if not arr:
            return
        path = self._next_path()
        tmp = path + ".tmp"
        pq.write_table(pa.table({"key": pa.array(arr, type=pa.string())}),
                       tmp, row_group_size=self.RG)
        os.replace(tmp, path)
        mins = [arr[i] for i in range(0, len(arr), self.RG)]
        maxs = [arr[min(i + self.RG, len(arr)) - 1]
                for i in range(0, len(arr), self.RG)]
        self.runs.append((path, mins, maxs))
        if len(self.runs) >= self.COMPACT_AT:
            self._compact()

    def _compact(self) -> None:
        """Merge every run into ONE sorted, deduped run (ADVICE r4:
        without compaction contains() scans all accumulated runs, so
        probe cost degrades linearly over the crawl).  Streaming k-way
        heap merge over the runs' row groups — peak RAM is one row
        group per run plus one output buffer, never the full spill."""
        import heapq
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        def run_iter(path: str):
            pf = pq.ParquetFile(path)
            for rg in range(pf.num_row_groups):
                yield from pf.read_row_group(rg).column("key").to_pylist()

        old_paths = [p for p, _, _ in self.runs]
        out_path = self._next_path()
        tmp = out_path + ".tmp"
        writer = None
        buf: list[str] = []
        mins: list[str] = []
        maxs: list[str] = []
        prev = None
        schema = pa.schema([("key", pa.string())])

        def flush() -> None:
            nonlocal writer
            if not buf:
                return
            if writer is None:
                writer = pq.ParquetWriter(tmp, schema)
            writer.write_table(
                pa.table({"key": pa.array(buf, type=pa.string())}))
            mins.append(buf[0])
            maxs.append(buf[-1])
            buf.clear()

        for k in heapq.merge(*(run_iter(p) for p in old_paths)):
            if k == prev:
                continue
            prev = k
            buf.append(k)
            if len(buf) >= self.RG:
                flush()
        flush()
        if writer is None:
            return  # nothing spilled (can't happen: spill() guards empty)
        writer.close()
        os.replace(tmp, out_path)
        self.runs = [(out_path, mins, maxs)]
        self._cache.clear()
        self._order.clear()
        for p in old_paths:
            try:
                os.remove(p)
            except OSError:
                pass

    def _row_group(self, path: str, rg: int) -> list[str]:
        import pyarrow.parquet as pq

        ck = (path, rg)
        got = self._cache.get(ck)
        if got is None:
            got = pq.ParquetFile(path).read_row_group(rg) \
                .column("key").to_pylist()
            self._cache[ck] = got
            self._order.append(ck)
            if len(self._order) > self.CACHE:
                self._cache.pop(self._order.pop(0), None)
        return got

    def contains(self, key: str) -> bool:
        import bisect

        for path, mins, maxs in reversed(self.runs):
            i = bisect.bisect_right(mins, key) - 1
            if i < 0 or key > maxs[i]:
                continue
            keys = self._row_group(path, i)
            j = bisect.bisect_left(keys, key)
            if j < len(keys) and keys[j] == key:
                return True
        return False


@ray.remote(num_cpus=0)
class SeenShard:
    """One shard of the global seen set (cuckoo gate + exact backing).

    With ``spill_dir`` + ``ram_cap`` set, the exact backing set pages
    to sorted on-disk runs once it exceeds ``ram_cap`` keys — the
    10^10-URL shape the module docstring promises — while the cuckoo
    filter (no false negatives) stays in RAM as the fast gate; exact
    probes behind a cuckoo positive fall through RAM to the runs.
    Default (both None) keeps the all-RAM behavior."""

    MEMO_CAP = 1024  # retried-task replay window per shard

    def __init__(self, capacity: int = 1 << 18,
                 spill_dir: str | None = None,
                 ram_cap: int | None = None):
        self.cf = CuckooFilter(capacity)
        self.exact: set[str] = set()
        self.ram_cap = ram_cap
        self.runs = SortedRuns(spill_dir) if spill_dir else None
        self.delta: list[str] = []  # novel keys since last drain (checkpoint)
        # batch_id → verdicts: makes gate calls idempotent so a Ray task
        # retry replays the SAME novelty verdicts instead of seeing its
        # own earlier inserts as duplicates (rows would silently drop)
        self.memo: dict[str, list[bool]] = {}
        self.memo_order: list[str] = []
        # claim_min state: key → (round, winning seq); contested = keys
        # where a later-arriving smaller seq displaced an already-granted
        # winner within the current round (their fragments need repair)
        self.claims: dict[str, tuple[int, str]] = {}
        self.contested: set[str] = set()

    def _exact_contains(self, k: str) -> bool:
        return k in self.exact or (self.runs is not None
                                   and self.runs.contains(k))

    def _maybe_spill(self) -> None:
        if (self.runs is not None and self.ram_cap is not None
                and len(self.exact) > self.ram_cap):
            self.runs.spill(self.exact)
            self.exact = set()

    def check_and_insert(self, keys: list[str],
                         batch_id: str | None = None) -> list[bool]:
        """For each key: True iff novel (now inserted).  The cuckoo
        filter short-circuits the common novel case; positives verify
        against the exact set (false-positive rate ~3% never drops a
        URL).  With ``batch_id``, the call is idempotent (replayed
        verbatim on task retry)."""
        if batch_id is not None and batch_id in self.memo:
            return self.memo[batch_id]
        out = []
        for k in keys:
            h = _hash64(k)
            if self.cf.contains_hash(h) and self._exact_contains(k):
                out.append(False)
            else:
                self.cf.insert_hash(h)
                self.exact.add(k)
                self.delta.append(k)
                out.append(True)
        self._maybe_spill()
        if batch_id is not None:
            self.memo[batch_id] = out
            self.memo_order.append(batch_id)
            if len(self.memo_order) > self.MEMO_CAP:
                old = self.memo_order.pop(0)
                self.memo.pop(old, None)
        return out

    def claim_min(self, keys: list[str], seqs: list[str], rnd: int,
                  batch_id: str | None = None) -> list[bool]:
        """Seq-aware first-wins claim (strict --no-clobber name dedup in
        the streaming pipeline, ref src/main.rs:16): for each (key, seq)
        return True iff this claim currently WINS the key — first claim
        of a round wins provisionally; a later claim with a *smaller*
        seq supersedes it (the key is recorded as contested so the
        already-written loser row can be dropped at round finalize);
        claims from later rounds always lose (first-round-wins, same
        rule the plain written-gate enforced).  Re-claiming the exact
        winning (key, seq) returns True again → task-retry idempotent
        even without the memo (finalize repair makes any stale loser row
        harmless)."""
        if batch_id is not None and batch_id in self.memo:
            return self.memo[batch_id]
        out = []
        for k, s in zip(keys, seqs):
            c = self.claims.get(k)
            if c is None:
                if self.cf.contains_hash(_hash64(k)) \
                        and self._exact_contains(k):
                    out.append(False)  # won in a committed earlier round
                else:
                    self.claims[k] = (rnd, s)
                    self.cf.insert_hash(_hash64(k))
                    self.exact.add(k)
                    self.delta.append(k)
                    out.append(True)
            else:
                r0, s0 = c
                if rnd != r0 or s > s0:
                    out.append(False)
                elif s == s0:
                    out.append(True)  # retry replay of the current winner
                else:  # s < s0: supersede the provisional winner
                    self.claims[k] = (rnd, s)
                    self.contested.add(k)
                    out.append(True)
        self._maybe_spill()
        if batch_id is not None:
            self.memo[batch_id] = out
            self.memo_order.append(batch_id)
            if len(self.memo_order) > self.MEMO_CAP:
                old = self.memo_order.pop(0)
                self.memo.pop(old, None)
        return out

    def drain_contested(self) -> dict[str, str]:
        """Contested keys of the round being finalized → winning seq.

        Also prunes the whole per-round claims dict: cross-round
        first-wins needs only the exact set (a drained key's later
        claims find ``k in exact`` and lose), and rounds are barriered,
        so no same-round retry can arrive after finalize — claims
        memory stays bounded by one round's working set instead of the
        whole crawl's image-id space."""
        out = {k: self.claims[k][1] for k in self.contested}
        self.contested = set()
        self.claims = {}
        return out

    def restore(self, keys: list[str]) -> int:
        """Resume path: repopulate from a checkpoint without recording
        deltas.  Routing happens client-side by the CURRENT shard
        count, so resuming with a different ``num_shards`` re-shards
        the seen set automatically (the checkpoint stores flat key
        deltas, never shard assignments)."""
        for k in keys:
            if not (self.cf.contains_hash(_hash64(k))
                    and self._exact_contains(k)):
                self.cf.insert_hash(_hash64(k))
                self.exact.add(k)
        self._maybe_spill()
        return len(self.exact)

    def drain_delta(self) -> list[str]:
        d, self.delta = self.delta, []
        return d

    def drain_delta_to(self, path: str) -> int:
        """Drain novel keys directly to a parquet file (actor-side,
        parallel across shards — the delta never crosses the driver)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        d, self.delta = self.delta, []
        tmp = path + ".tmp"
        pq.write_table(pa.table({"key": pa.array(d, type=pa.string())}), tmp)
        import os

        os.replace(tmp, path)
        return len(d)

    def stats(self) -> dict:
        return {"exact": len(self.exact), "cuckoo": self.cf.count,
                "spill": len(self.cf.spill),
                "runs": len(self.runs.runs) if self.runs else 0}


class ShardedSeen:
    """Client router: hash-partition keys, one batched call per shard."""

    def __init__(self, num_shards: int = 4, capacity_per_shard: int = 1 << 18,
                 spill_dir: str | None = None,
                 ram_cap: int | None = None):
        self.shards = [
            SeenShard.remote(
                capacity_per_shard,
                spill_dir=(f"{spill_dir}/shard-{i:02d}" if spill_dir
                           else None),
                ram_cap=ram_cap)
            for i in range(num_shards)]
        self.n = num_shards
        # Fallback memo scope for driver/actor callers (where
        # _task_scope() is None): a per-router uuid + call counter.
        # Each call still gets a UNIQUE scope, and retry_actor_get's
        # reissue closure re-sends the SAME captured bid, so a
        # "may-or-may-not-have-executed" ActorUnavailableError replay
        # returns the original novelty verdicts instead of seeing its
        # own first attempt's inserts (which would yield novel=False
        # for every seed URL and silently empty the frontier).
        import uuid

        self._fallback_scope = uuid.uuid4().hex
        self._call_seq = 0

    def _route(self, keys: list[str]) -> dict[int, list[int]]:
        # crc32 is a stable, C-speed router (~20x blake2b); shard
        # placement only needs determinism, not crypto strength
        import zlib

        by: dict[int, list[int]] = {}
        n = self.n
        for idx, k in enumerate(keys):
            s = zlib.crc32(k.encode()) % n
            by.setdefault(s, []).append(idx)
        return by

    @staticmethod
    def _task_scope() -> str | None:
        """Stable-across-retries identity of the calling Ray task (None
        on the driver / outside a task)."""
        try:
            ctx = ray.get_runtime_context()
            if getattr(ctx.worker, "mode", None) != ray.WORKER_MODE:
                return None  # driver / actor context: no task retries
            tid = ctx.get_task_id()
            return tid if tid else None
        except Exception:
            return None

    def _scope(self) -> str:
        """Memo scope for this call: the Ray task id (stable across
        task retries) inside a task, else a unique per-call scope so
        retry_actor_get reissues are still memo-protected."""
        scope = self._task_scope()
        if scope is None:
            self._call_seq += 1
            scope = f"{self._fallback_scope}:{self._call_seq}"
        return scope

    def check_and_insert(self, keys: list[str]) -> list[bool]:
        """Batched membership-insert.  Inside a Ray task the call is
        idempotent under task retry: the memo key combines the task id
        (stable across attempts) with the sub-batch content hash, so a
        retried task replays its original novelty verdicts while
        distinct tasks (or distinct batches within one task) never
        collide."""
        if not keys:
            return []
        scope = self._scope()
        by = self._route(keys)
        futs, calls = {}, {}
        for s, idxs in by.items():
            sub = [keys[i] for i in idxs]
            h = hashlib.blake2b(scope.encode(), digest_size=12)
            for k in sub:
                h.update(k.encode())
                h.update(b"\x00")
            bid = h.hexdigest()
            futs[s] = self.shards[s].check_and_insert.remote(sub, bid)
            calls[s] = (sub, bid)
        out = [False] * len(keys)
        for s, idxs in by.items():
            vals = retry_actor_get(
                futs[s],
                lambda s=s: self.shards[s].check_and_insert.remote(
                    *calls[s]))
            for i, novel in zip(idxs, vals):
                out[i] = novel
        return out

    def claim_min(self, keys: list[str], seqs: list[str],
                  rnd: int) -> list[bool]:
        """Batched seq-aware first-wins claim (see SeenShard.claim_min);
        same per-(task, sub-batch) idempotence memo as check_and_insert."""
        if not keys:
            return []
        scope = self._scope()
        by = self._route(keys)
        futs, calls = {}, {}
        for s, idxs in by.items():
            sub_k = [keys[i] for i in idxs]
            sub_s = [seqs[i] for i in idxs]
            h = hashlib.blake2b(scope.encode(), digest_size=12)
            for k, sq in zip(sub_k, sub_s):
                h.update(k.encode())
                h.update(b"\x00")
                h.update(sq.encode())
                h.update(b"\x00")
            bid = "c" + h.hexdigest()
            futs[s] = self.shards[s].claim_min.remote(sub_k, sub_s, rnd, bid)
            calls[s] = (sub_k, sub_s, bid)
        out = [False] * len(keys)
        for s, idxs in by.items():
            vals = retry_actor_get(
                futs[s],
                lambda s=s: self.shards[s].claim_min.remote(
                    calls[s][0], calls[s][1], rnd, calls[s][2]))
            for i, win in zip(idxs, vals):
                out[i] = win
        return out

    def drain_contested(self) -> dict[str, str]:
        out: dict[str, str] = {}
        for d in ray.get([s.drain_contested.remote() for s in self.shards]):
            out.update(d)
        return out

    def restore(self, keys: list[str]) -> None:
        if not keys:
            return
        by = self._route(keys)
        ray.get([self.shards[s].restore.remote([keys[i] for i in idxs])
                 for s, idxs in by.items()])

    def drain_deltas(self) -> list[str]:
        return [k for d in ray.get([s.drain_delta.remote() for s in self.shards])
                for k in d]

    def drain_deltas_to(self, dir_path: str, prefix: str = "seen") -> int:
        """Each shard writes its own delta parquet in parallel."""
        import os

        return sum(ray.get([
            s.drain_delta_to.remote(
                os.path.join(dir_path, f"{prefix}-{i:02d}.parquet"))
            for i, s in enumerate(self.shards)
        ]))

    def stats(self) -> dict:
        sts = ray.get([s.stats.remote() for s in self.shards])
        return {k: sum(s[k] for s in sts) for k in sts[0]}
