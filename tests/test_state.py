"""Unit tests: cuckoo filter, sharded seen set, politeness, robots."""

import numpy as np
import pytest

from imgray.state.cuckoo import CuckooFilter, ShardedSeen, _hash64
from imgray.state.politeness import TokenBucket, parse_robots, robots_allowed


def test_cuckoo_no_false_negatives():
    cf = CuckooFilter(capacity=1 << 12)
    keys = [f"https://h{i}.com/p{i}" for i in range(3000)]
    for k in keys:
        cf.insert_hash(_hash64(k))
    assert all(cf.contains_hash(_hash64(k)) for k in keys)


def test_cuckoo_low_false_positive_rate():
    cf = CuckooFilter(capacity=1 << 14)
    for i in range(8000):
        cf.insert_hash(_hash64(f"in-{i}"))
    fp = sum(cf.contains_hash(_hash64(f"out-{i}")) for i in range(8000))
    assert fp / 8000 < 0.05


def test_cuckoo_grows_past_capacity():
    """ADVICE r4: a filter loaded far past its constructor capacity
    must GROW (frozen generations + a fresh double-size active table)
    instead of saturating — no false negatives, a bounded spill set,
    and a false-positive rate that stays near the right-sized rate."""
    cf = CuckooFilter(capacity=1 << 8)  # tiny → forced growth
    keys = [f"k{i}" for i in range(20000)]  # ~80× constructor capacity
    for k in keys:
        cf.insert_hash(_hash64(k))
    assert all(cf.contains_hash(_hash64(k)) for k in keys)
    assert len(cf.gens) > 1  # growth really happened
    assert len(cf.spill) < 50  # spill is a rare-kick backstop, not a dump
    fp = sum(cf.contains_hash(_hash64(f"absent-{i}")) for i in range(8000))
    assert fp / 8000 < 0.10  # saturated fixed table would approach 1.0


def test_cuckoo_generations_geometric():
    cf = CuckooFilter(capacity=1 << 8)
    for i in range(20000):
        cf.insert_hash(_hash64(f"g{i}"))
    sizes = [nb for _, nb in cf.gens]
    assert sizes == sorted(sizes)
    assert all(b == a * 2 for a, b in zip(sizes, sizes[1:]))


def test_sorted_runs_compaction(tmp_path):
    """ADVICE r4: runs merge once COMPACT_AT accumulate, so probe cost
    stays bounded; membership is preserved exactly across compaction."""
    from imgray.state.cuckoo import SortedRuns

    sr = SortedRuns(str(tmp_path / "runs"))
    all_keys = set()
    for r in range(20):  # crosses the compaction threshold twice
        ks = {f"r{r:02d}-k{i:04d}" for i in range(300)} | {"shared-key"}
        sr.spill(ks)
        all_keys |= ks
    assert len(sr.runs) < sr.COMPACT_AT  # compaction actually ran
    assert all(sr.contains(k) for k in sorted(all_keys))
    assert not sr.contains("absent-key")
    assert not sr.contains("r99-k0000")


def test_sorted_runs_instances_do_not_clobber(tmp_path):
    """ADVICE r4: a second instance on the same root must not delete
    the first instance's live run files."""
    from imgray.state.cuckoo import SortedRuns

    root = str(tmp_path / "shared")
    a = SortedRuns(root)
    a.spill({f"a{i}" for i in range(100)})
    b = SortedRuns(root)
    b.spill({f"b{i}" for i in range(100)})
    a._cache.clear()  # force a cold read through the run file
    a._order.clear()
    assert a.contains("a5") and not a.contains("b5")
    assert b.contains("b5") and not b.contains("a5")


def test_sharded_seen(ray_session):
    seen = ShardedSeen(num_shards=3)
    keys = [f"u:https://x.com/{i}" for i in range(500)]
    novel = seen.check_and_insert(keys)
    assert all(novel)
    again = seen.check_and_insert(keys)
    assert not any(again)
    mixed = seen.check_and_insert(["u:new-one", keys[0], "u:new-two"])
    assert mixed == [True, False, True]
    # deltas drain exactly the novel keys
    delta = set(seen.drain_deltas())
    assert delta == set(keys) | {"u:new-one", "u:new-two"}
    assert seen.drain_deltas() == []
    # restore is idempotent and doesn't create deltas
    seen.restore(keys)
    assert seen.drain_deltas() == []
    st = seen.stats()
    assert st["exact"] == 502


def test_token_bucket():
    b = TokenBucket(rate=2, burst=4)
    assert b.take(10) == 4  # burst cap
    b.refill(1)
    assert b.take(10) == 2
    b.refill(2)
    b.refill(2)  # same round: no double refill
    assert b.take(10) == 2
    b.refill(10)  # long idle → capped at burst
    assert b.take(10) == 4


def test_robots_parsing():
    rules = parse_robots(
        "# comment\nUser-agent: *\nDisallow: /private/\nDisallow: /tmp\n"
        "User-agent: other\nDisallow: /\n"
    )
    assert rules == ["/private/", "/tmp"]
    assert robots_allowed("/public/x", rules)
    assert not robots_allowed("/private/x", rules)
    assert not robots_allowed("/tmp", rules)
    assert robots_allowed("/", parse_robots(""))


def test_gate_idempotent_replay(ray_session):
    """A retried task must replay its original novelty verdicts (memoed
    by task-id + batch content), while driver-side repeat calls see
    normal duplicate semantics."""
    import ray
    from imgray.state.cuckoo import SeenShard

    shard = SeenShard.remote()
    keys = [f"u:k{i}" for i in range(10)]
    first = ray.get(shard.check_and_insert.remote(keys, "batch-1"))
    assert all(first)
    # same batch_id (task retry) → identical verdicts, no state change
    replay = ray.get(shard.check_and_insert.remote(keys, "batch-1"))
    assert replay == first
    # a DIFFERENT batch with the same keys → duplicates detected
    second = ray.get(shard.check_and_insert.remote(keys, "batch-2"))
    assert not any(second)
    st = ray.get(shard.stats.remote())
    assert st["exact"] == 10


def test_robots_crawl_delay(ray_session):
    """Crawl-delay caps a host's token rate (epoch_seconds/delay per
    round) when more conservative than the configured rate."""
    import ray
    from imgray.state.politeness import SchedulerShard, parse_robots_full

    rules, delay = parse_robots_full(
        "User-agent: *\nDisallow: /x\nCrawl-delay: 2\n")
    assert rules == ["/x"] and delay == 2.0

    def factory():
        class R:
            status = 200
            text = "User-agent: *\nCrawl-delay: 2\n"
        return lambda url: R()

    sched = SchedulerShard.remote(factory, rate_per_round=8.0, burst=8.0,
                                  epoch_seconds=1.0)
    urls = [f"https://slow.example/p{i}" for i in range(6)]
    v1 = ray.get(sched.filter_and_grant.remote("slow.example", urls, 1))
    # delay=2 & epoch=1 → 0.5 tokens/round; burst capped at 1 → one
    # release in round 1, then one every other round
    assert v1.count("release") == 1
    v2 = ray.get(sched.filter_and_grant.remote("slow.example", urls[1:], 2))
    assert v2.count("release") == 0  # 0.5 tokens accrued — not enough
    v3 = ray.get(sched.filter_and_grant.remote("slow.example", urls[1:], 3))
    assert v3.count("release") == 1


def test_robots_shared_ua_record():
    """Consecutive User-agent lines open one shared record (standard
    robots.txt grouping): rules under 'User-agent: *\\nUser-agent: foo'
    apply to '*', and a later record resets the active flag."""
    from imgray.state.politeness import parse_robots_full

    rules, _ = parse_robots_full(
        "User-agent: *\nUser-agent: foo\nDisallow: /x\n"
        "User-agent: bar\nDisallow: /y\n")
    assert rules == ["/x"]
    # reversed order in the shared record still applies to '*'
    rules2, _ = parse_robots_full(
        "User-agent: foo\nUser-agent: *\nDisallow: /x\n")
    assert rules2 == ["/x"]
    # a non-* record alone contributes nothing
    rules3, _ = parse_robots_full("User-agent: foo\nDisallow: /x\n")
    assert rules3 == []


def test_crawl_delay_laxer_than_rate_is_noop(ray_session):
    """A Crawl-delay LESS conservative than the configured rate must not
    shrink the burst (ADVICE r1): rate=8, burst=16, delay=0.05 →
    advertised 20/round > 8 → bucket untouched."""
    import ray
    from imgray.state.politeness import SchedulerShard

    def factory():
        class R:
            status = 200
            text = "User-agent: *\nCrawl-delay: 0.05\n"
        return lambda url: R()

    sched = SchedulerShard.remote(factory, rate_per_round=8.0, burst=16.0,
                                  epoch_seconds=1.0)
    urls = [f"https://fast.example/p{i}" for i in range(20)]
    v = ray.get(sched.filter_and_grant.remote("fast.example", urls, 1))
    assert v.count("release") == 16  # full burst, not capped to 8


def test_retry_actor_get_reissues(monkeypatch):
    """retry_actor_get must re-issue the (idempotent) call on
    ActorUnavailableError and return the eventual result; after the
    retry budget it re-raises."""
    from ray.exceptions import ActorUnavailableError

    from imgray.state import cuckoo as ck

    calls = {"get": 0, "reissue": 0}

    def fake_get(ref):
        calls["get"] += 1
        if calls["get"] < 3:
            raise ActorUnavailableError("transient", b"\x01" * 16)
        return ["ok", ref]

    monkeypatch.setattr(ck.ray, "get", fake_get)
    out = ck.retry_actor_get("r0", lambda: f"r{calls['get']}")
    assert out == ["ok", "r2"]  # two failures, two reissues
    assert calls["get"] == 3

    calls["get"] = 0

    def always_fail(ref):
        calls["get"] += 1
        raise ActorUnavailableError("down", b"\x01" * 16)

    monkeypatch.setattr(ck.ray, "get", always_fail)
    import pytest as _pytest

    with _pytest.raises(ActorUnavailableError):
        ck.retry_actor_get("r0", lambda: "again", tries=2)
    assert calls["get"] == 2


def test_seen_shard_spill_exactness(ray_session, tmp_path):
    """VERDICT r3 #7: with a RAM cap, the exact set pages to sorted
    on-disk runs and novelty verdicts stay exact across spills."""
    import random

    import ray

    from imgray.state.cuckoo import SeenShard

    sh = SeenShard.remote(1 << 14, spill_dir=str(tmp_path / "runs"),
                          ram_cap=500)
    rng = random.Random(7)
    mirror: set[str] = set()
    for _ in range(40):
        keys = [f"u:https://h{rng.randrange(40)}.example/p/"
                f"{rng.randrange(2000)}" for _ in range(200)]
        got = ray.get(sh.check_and_insert.remote(keys))
        want = []
        seen_in_batch: set[str] = set()
        for k in keys:
            novel = k not in mirror and k not in seen_in_batch
            want.append(novel)
            seen_in_batch.add(k)
        mirror.update(keys)
        assert got == want
    st = ray.get(sh.stats.remote())
    assert st["runs"] >= 1          # spills actually happened
    assert st["exact"] <= 500       # RAM stays capped


def test_seen_reshard_on_resume(ray_session, tmp_path):
    """Resume with a DIFFERENT shard count (and spill enabled): the
    checkpoint stores flat key deltas, so restore re-routes by the new
    count — final images, visit order and seen set byte-identical to
    an uninterrupted run."""
    from functools import partial

    import pyarrow as pa

    from imgray.crawler import Crawler, CrawlerConfig, make_synth_fetcher
    from imgray.synthweb import SynthWeb, default_spec, seeds, site_config

    spec = default_spec(scale=1)
    spec.hosts = [h for h in spec.hosts
                  if h.name.split(".")[0] in ("lazy0", "two0", "json0")]
    sd = [s for s in seeds(default_spec(scale=1))
          if any(h.name in s for h in spec.hosts)]

    def cfg(root, shards, ram_cap=None):
        return CrawlerConfig(
            root=root, fetcher_factory=partial(make_synth_fetcher, spec),
            site_cfg=site_config(spec), seen_shards=shards,
            seen_ram_cap=ram_cap)

    def img_bytes(cr) -> bytes:
        t = cr.images_table().sort_by([("image_id", "ascending")])
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, t.schema) as w:
            w.write_table(t)
        return sink.getvalue().to_pybytes()

    # uninterrupted baseline, 4 shards, all-RAM
    base = Crawler(cfg(str(tmp_path / "base"), 4))
    base.seed(sd)
    base.run()

    # interrupted run: 4 shards, then resume as a fresh driver with 2
    # shards AND a tiny RAM cap (spill exercised during restore + run)
    root = str(tmp_path / "c")
    cr = Crawler(cfg(root, 4))
    cr.seed(sd)
    for _ in range(2):
        if cr._frontier_count(cr.round):
            cr.run_round()
    del cr
    cr2 = Crawler(cfg(root, 2, ram_cap=200))
    assert cr2.resume()
    cr2.run()

    assert cr2.visit_order() == base.visit_order()
    assert cr2.seen_urls() == base.seen_urls()
    assert img_bytes(cr2) == img_bytes(base)


def test_driver_context_reissue_replays_verdicts(ray_session):
    """ADVICE r3 (medium): driver-context ShardedSeen calls carry a
    per-call memo scope, so an ActorUnavailableError reissue (same
    bid) replays the ORIGINAL novelty verdicts — seeds can't silently
    come back novel=False — while a genuine second call (new scope)
    correctly sees duplicates."""
    import ray

    from imgray.state.cuckoo import ShardedSeen

    ss = ShardedSeen(num_shards=1)
    keys = [f"u:https://seed{i}.example/" for i in range(5)]

    first = ss.check_and_insert(keys)
    assert first == [True] * 5

    # a fresh driver call = new scope = new bid: duplicates detected
    again = ss.check_and_insert(keys)
    assert again == [False] * 5

    # simulate the retry_actor_get reissue: replaying the SAME bid the
    # router would re-send must return the memoized first verdicts
    # even though the keys are long inserted
    import hashlib

    scope = f"{ss._fallback_scope}:1"  # the first call's fallback scope
    h = hashlib.blake2b(scope.encode(), digest_size=12)
    for k in keys:
        h.update(k.encode())
        h.update(b"\x00")
    replay = ray.get(ss.shards[0].check_and_insert.remote(keys,
                                                          h.hexdigest()))
    assert replay == [True] * 5
