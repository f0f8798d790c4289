"""Checkpointed resume (SURVEY.md §5 strategy #3, north rule): stop the
crawl after k rounds, build a fresh Crawler (fresh actors — simulating a
new driver process), resume() from the committed manifest, finish, and
get results identical to an uninterrupted run.  Also: robots.txt
exclusion actually gates fetches.
"""

from functools import partial

import pytest

from imgray.crawler import Crawler, CrawlerConfig, make_synth_fetcher
from imgray.refsim import RefSim
from imgray.synthweb import SynthWeb, default_spec, seeds, site_config


def _cfg(root, spec):
    return CrawlerConfig(
        root=root,
        fetcher_factory=partial(make_synth_fetcher, spec),
        site_cfg=site_config(spec),
    )


def _small_spec():
    spec = default_spec(scale=1)
    spec.hosts = [h for h in spec.hosts
                  if h.name.split(".")[0] in ("lazy0", "two0", "json0")]
    return spec


def test_resume_identical(ray_session, tmp_path):
    spec = _small_spec()
    sd = [s for s in seeds(default_spec(scale=1))
          if any(h.name in s for h in spec.hosts)]

    ref = RefSim(SynthWeb(spec), site_config(spec)).crawl(sd)

    # interrupted run: 2 rounds, then the driver "dies"
    root = str(tmp_path / "c")
    cr = Crawler(_cfg(root, spec))
    cr.seed(sd)
    for _ in range(2):
        if cr._frontier_count(cr.round):
            cr.run_round()
    interrupted_round = cr.round
    del cr

    # fresh driver: resume from the committed manifest, finish
    cr2 = Crawler(_cfg(root, spec))
    assert cr2.resume()
    assert cr2.round == interrupted_round
    cr2.run()

    assert cr2.visit_order() == ref.visit_order
    assert cr2.seen_urls() == ref.seen
    got = {r["image_id"]: r["bytes"] for r in cr2.images_table().to_pylist()}
    want = {k: v["bytes"] for k, v in ref.images.items()}
    assert got == want


def test_robots_exclusion(ray_session, tmp_path):
    """A /private/ URL in the frontier is rejected by the robots cache
    and never fetched (every synth host disallows /private/)."""
    spec = _small_spec()
    root = str(tmp_path / "r")
    cr = Crawler(_cfg(root, spec))
    cr.seed(["https://lazy0.example/private/secret",
             "https://lazy0.example/list/1"])
    cr.run()
    visits = cr.visit_order()
    assert "https://lazy0.example/private/secret" not in visits
    assert "https://lazy0.example/list/1" in visits
    # seen-set still records the gated URL (it entered the frontier)
    assert "https://lazy0.example/private/secret" in cr.seen_urls()
    # and the scheduler counted the rejection
    import ray
    sts = ray.get([s.stats.remote() for s in cr.scheds])
    assert sum(s["rejected"] for s in sts) == 1


def test_distributed_release_path_parity(ray_session, tmp_path):
    """Force the groupby(host) release path (threshold=0) — results must
    equal the driver-side path / the oracle."""
    spec = _small_spec()
    sd = [s for s in seeds(default_spec(scale=1))
          if any(h.name in s for h in spec.hosts)]
    ref = RefSim(SynthWeb(spec), site_config(spec)).crawl(sd)
    cfg = _cfg(str(tmp_path / "d"), spec)
    cfg.release_driver_threshold = 0
    cr = Crawler(cfg)
    cr.seed(sd)
    cr.run()
    assert cr.visit_order() == ref.visit_order
    assert cr.seen_urls() == ref.seen


def test_actor_stage_mode_parity(ray_session, tmp_path):
    """Actor-pool stage mode (heavy-state path) must match the oracle
    just like the default task mode."""
    spec = _small_spec()
    sd = [s for s in seeds(default_spec(scale=1))
          if any(h.name in s for h in spec.hosts)]
    ref = RefSim(SynthWeb(spec), site_config(spec)).crawl(sd)
    cfg = _cfg(str(tmp_path / "a"), spec)
    cfg.stage_mode = "actor"
    cfg.fetch_concurrency = 2
    cfg.img_concurrency = 2
    cr = Crawler(cfg)
    cr.seed(sd)
    cr.run()
    assert cr.visit_order() == ref.visit_order
    got = {r["image_id"]: r["bytes"] for r in cr.images_table().to_pylist()}
    assert got == {k: v["bytes"] for k, v in ref.images.items()}


def test_resume_after_midround_crash_debris(ray_session, tmp_path):
    """A crash can leave uncommitted debris: orphan sink fragments,
    stale extract-spill files, a half-written next-round frontier.
    Resume must ignore all of it (only committed manifests count) and
    still converge to the oracle result."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    from imgray import schemas as S

    spec = _small_spec()
    sd = [s for s in seeds(default_spec(scale=1))
          if any(h.name in s for h in spec.hosts)]
    ref = RefSim(SynthWeb(spec), site_config(spec)).crawl(sd)

    root = str(tmp_path / "c")
    cr = Crawler(_cfg(root, spec))
    cr.seed(sd)
    cr.run_round()
    cr.run_round()
    crashed_round = cr.round

    # simulate mid-round-3 crash debris:
    # (a) an orphan staged fragment never referenced by any manifest
    orphan = S.table_from_rows(S.IMAGES, [{
        "image_id": "GARBAGE/x.png", "bytes": b"junk", "w": 0, "h": 0,
        "fmt": "", "caption": "", "phash": 0}])
    cr.sink.stage_fragment(orphan, "r99-orphan")
    # (b) stale spill files in the upcoming round's extract dir
    sp = cr._rdir(crashed_round + 1, "extract")
    pq.write_table(
        S.table_from_rows(S.FRONTIER, [{
            "url": "https://bogus.example/x", "host": "bogus.example",
            "depth": 0, "kind": "listing", "priority": 0,
            "seq": "9999.0000", "round": 99}]),
        os.path.join(sp, "ex-99-dead.parquet"))
    del cr

    cr2 = Crawler(_cfg(root, spec))
    assert cr2.resume()
    assert cr2.round == crashed_round
    cr2.run()
    assert cr2.visit_order() == ref.visit_order
    assert cr2.seen_urls() == ref.seen
    got = {r["image_id"] for r in cr2.images_table().to_pylist()}
    assert got == set(ref.images)
    assert "GARBAGE/x.png" not in got


def test_pipelined_path_parity(ray_session, tmp_path):
    """The non-strict first-come written gate (throughput knob: no
    claim bookkeeping) must still produce oracle-identical results on
    the collision-free fixture."""
    spec = _small_spec()
    sd = [s for s in seeds(default_spec(scale=1))
          if any(h.name in s for h in spec.hosts)]
    ref = RefSim(SynthWeb(spec), site_config(spec)).crawl(sd)
    cfg = _cfg(str(tmp_path / "p"), spec)
    cfg.strict_name_dedup = False
    cr = Crawler(cfg)
    cr.seed(sd)
    cr.run()
    assert cr.visit_order() == ref.visit_order
    assert cr.seen_urls() == ref.seen
    got = {r["image_id"]: r["bytes"] for r in cr.images_table().to_pylist()}
    assert got == {k: v["bytes"] for k, v in ref.images.items()}
