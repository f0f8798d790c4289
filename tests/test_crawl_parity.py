"""E2E reference-oracle parity (SURVEY.md §5 strategy #2, north rule):
the Ray engine must reproduce the sequential simulator's page-visit
order, final URL-seen set, and per-row stored images (decoded-pixel
equality / PSNR≥40 for lossy, caption equality) on the synthetic web.
"""

import numpy as np
import pytest

from imgray import codecs as C
from imgray.crawler import Crawler, CrawlerConfig, make_synth_fetcher
from imgray.refsim import RefSim
from imgray.synthweb import SynthWeb, default_spec, seeds, site_config

from functools import partial


@pytest.fixture(scope="module")
def oracle():
    spec = default_spec(scale=1)
    sim = RefSim(SynthWeb(spec), site_config(spec))
    return spec, sim.crawl(seeds(spec))


@pytest.fixture(scope="module")
def engine(ray_session, oracle, tmp_path_factory):
    spec, _ = oracle
    root = str(tmp_path_factory.mktemp("crawl"))
    cfg = CrawlerConfig(
        root=root,
        fetcher_factory=partial(make_synth_fetcher, spec),
        site_cfg=site_config(spec),
        rate_per_round=8.0,
        burst=16.0,
    )
    cr = Crawler(cfg)
    cr.seed(seeds(spec))
    stats = cr.run()
    return cr, stats


def test_visit_order_exact(engine, oracle):
    cr, _ = engine
    _, ref = oracle
    assert cr.visit_order() == ref.visit_order


def test_seen_set_exact(engine, oracle):
    cr, _ = engine
    _, ref = oracle
    assert cr.seen_urls() == ref.seen


def test_images_per_row(engine, oracle):
    cr, _ = engine
    _, ref = oracle
    tbl = cr.images_table()
    got = {r["image_id"]: r for r in tbl.to_pylist()}
    assert set(got) == set(ref.images)
    for iid, want in ref.images.items():
        g = got[iid]
        assert g["caption"] == want["caption"], iid
        assert g["fmt"] == want["fmt"], iid
        assert (g["w"], g["h"]) == (want["w"], want["h"]), iid
        assert g["phash"] == want["phash"], iid
        # stored bytes identical → decoded pixels identical; lossy PSNR
        # invariant additionally exercised vs the pristine source
        assert g["bytes"] == want["bytes"], iid
        if want["fmt"] in ("png", "bmp", "lsy"):
            a = C.decode_image(g["bytes"])
            b = C.decode_image(want["bytes"])
            assert a.shape == b.shape
            assert C.psnr(a, b) >= 40.0 or np.array_equal(a, b)


def test_stats_and_lineage(engine):
    cr, stats = engine
    assert stats["pages"] == 47
    assert stats["images"] == len(cr.images_table())
    lt = cr.lineage_table().to_pylist()
    totals = [r for r in lt if r["partition_id"] == -1]
    parts = [r for r in lt if r["partition_id"] >= 0]
    assert sum(r["fetched"] for r in totals) == stats["pages"]
    assert sum(r["images"] for r in totals) == stats["images"]
    # per-partition rows reconcile with the round totals
    assert sum(r["fetched"] for r in parts) == stats["pages"]
    assert sum(r["urls_in"] for r in parts) == sum(r["urls_in"] for r in totals)
    assert len({r["partition_id"] for r in parts}) > 1  # really partitioned
    assert all(r["t_end"] >= r["t_start"] for r in lt)


def test_politeness_budget_respected(ray_session, oracle, tmp_path_factory):
    """With rate 2/round, no host exceeds its per-round budget, and the
    final result is unchanged (ordering is seq-defined, not timing)."""
    spec, ref = oracle
    root = str(tmp_path_factory.mktemp("polite"))
    cfg = CrawlerConfig(
        root=root,
        fetcher_factory=partial(make_synth_fetcher, spec),
        site_cfg=site_config(spec),
        rate_per_round=2.0,
        burst=2.0,
    )
    cr = Crawler(cfg)
    cr.seed(seeds(spec))
    cr.run()
    assert cr.visit_order() == ref.visit_order
    assert cr.seen_urls() == ref.seen
    # per-round per-host fetch counts ≤ burst
    import pyarrow.parquet as pq
    import os
    from collections import Counter
    for r in range(cr.round + 1):
        p = os.path.join(cr.ckpt, f"round-{r:04d}", "visits.parquet")
        if os.path.exists(p):
            hosts = Counter(pq.read_table(p).column("host").to_pylist())
            assert all(v <= 2 for v in hosts.values()), (r, hosts)


def test_parity_scale2(ray_session, tmp_path_factory):
    """Wider synthetic web (two hosts of every kind + bigger hot host):
    full oracle parity at scale=2."""
    from functools import partial as _partial

    spec = default_spec(scale=2)
    ref = RefSim(SynthWeb(spec), site_config(spec)).crawl(seeds(spec))
    root = str(tmp_path_factory.mktemp("crawl2"))
    cr = Crawler(CrawlerConfig(
        root=root, fetcher_factory=_partial(make_synth_fetcher, spec),
        site_cfg=site_config(spec)))
    cr.seed(seeds(spec))
    cr.run()
    assert cr.visit_order() == ref.visit_order
    assert cr.seen_urls() == ref.seen
    got = {r["image_id"]: r["bytes"] for r in cr.images_table().to_pylist()}
    assert got == {k: v["bytes"] for k, v in ref.images.items()}


def test_json_site_images_stored(engine):
    """Regression (code review finding #1): json-configured sites must
    store their extracted images — the reference chains json_img into
    download() even though json selectors take the two-level branch
    (src/main.rs:367)."""
    cr, _ = engine
    ids = [r["image_id"] for r in cr.images_table().to_pylist()]
    assert any(i.startswith("json0 Wonderful Gallery/") for i in ids)
    assert any(i.startswith("jsona0 Wonderful Gallery/") for i in ids)


def test_failed_page_fetch_not_visited(ray_session, tmp_path_factory):
    """Regression (finding #2): a frontier URL whose fetch fails is an
    attempt (seen set, lineage) but never a visit."""
    from functools import partial as _partial

    spec = default_spec(scale=1)
    spec.hosts = [h for h in spec.hosts if h.name == "lazy0.example"]
    bad = "https://no-such-host.example/page"
    sd = [bad, "https://lazy0.example/list/1"]
    ref = RefSim(SynthWeb(spec), site_config(spec)).crawl(sd)
    root = str(tmp_path_factory.mktemp("fail"))
    cr = Crawler(CrawlerConfig(
        root=root, fetcher_factory=_partial(make_synth_fetcher, spec),
        site_cfg=site_config(spec)))
    cr.seed(sd)
    cr.run()
    assert bad not in cr.visit_order()
    assert bad in cr.seen_urls()
    assert cr.visit_order() == ref.visit_order
    assert cr.seen_urls() == ref.seen


@pytest.mark.parametrize("threshold,strict",
                         [(100000, True),  # driver-side vectorized path
                          (0, True),       # distributed release+admission
                          (0, False)])     # non-strict written gate
def test_diamond_link_deterministic(ray_session, tmp_path_factory,
                                    threshold, strict):
    """Two pages discovering the same URL (listing 2 re-links listing
    1's first album, plus both listings seeded in round 0): admission
    must be DFS-first deterministic, matching the oracle's first-visit
    order — under BOTH the driver-side vectorized min-seq path and the
    distributed groupby(url) path (VERDICT r1 #2)."""
    from functools import partial as _partial

    spec = default_spec(scale=1)
    spec.hosts = [h for h in spec.hosts if h.name == "lazy0.example"]
    sd = ["https://lazy0.example/list/1", "https://lazy0.example/list/2"]
    ref = RefSim(SynthWeb(spec), site_config(spec)).crawl(sd)
    for _try in range(2):  # twice: admission must not depend on timing
        root = str(tmp_path_factory.mktemp(f"dia{_try}"))
        cr = Crawler(CrawlerConfig(
            root=root, fetcher_factory=_partial(make_synth_fetcher, spec),
            site_cfg=site_config(spec),
            release_driver_threshold=threshold,
            strict_name_dedup=strict))
        cr.seed(sd)
        cr.run()
        assert cr.visit_order() == ref.visit_order
        assert cr.seen_urls() == ref.seen


def test_mixed_format_crawl_parity(ray_session, tmp_path_factory):
    """JPEG and GIF end-to-end through the engine: with
    spec.mixed_formats the image-URL algebra rotates .jpg/.gif in, the
    synthetic web encodes them with the from-scratch codecs, and the
    stored rows (bytes, w/h, pHash from the decode path) must still
    match the sequential oracle per-row."""
    spec = default_spec(scale=1)
    spec.hosts = [h for h in spec.hosts
                  if h.name.split(".")[0] in ("lazy0", "css0")]
    for h in spec.hosts:
        h.imgs = 10  # reach URL forms 6 (.jpg) and 7 (.gif)
    spec.mixed_formats = True
    sd = [s for s in seeds(default_spec(scale=1))
          if any(h.name in s for h in spec.hosts)]
    ref = RefSim(SynthWeb(spec), site_config(spec)).crawl(sd)
    fmts = {v["bytes"][:3] for v in ref.images.values()}
    assert b"\xff\xd8\xff" in fmts  # oracle corpus really contains JPEG
    assert any(m.startswith(b"GIF") for m in fmts)
    assert b"RIF" in fmts  # and lossless WebP (VP8L)
    # and at least one JPEG is progressive (SOF2) — the multi-scan
    # decode path runs end to end (VERDICT r2 #6)
    assert any(v["bytes"].startswith(b"\xff\xd8")
               and b"\xff\xc2" in v["bytes"]
               for v in ref.images.values())

    cr = Crawler(CrawlerConfig(
        root=str(tmp_path_factory.mktemp("mixed")),
        fetcher_factory=partial(make_synth_fetcher, spec),
        site_cfg=site_config(spec)))
    cr.seed(sd)
    cr.run()
    assert cr.visit_order() == ref.visit_order
    got = {r["image_id"]: r["bytes"] for r in cr.images_table().to_pylist()}
    assert got == {k: v["bytes"] for k, v in ref.images.items()}
    # decoded metadata is real (jpeg/gif went through the decoders)
    t = cr.images_table()
    fmt_col = set(t.column("fmt").to_pylist())
    assert {"jpg", "gif", "webp"} <= fmt_col
    for r in t.to_pylist():
        if r["fmt"] in ("jpg", "gif", "webp"):
            assert r["w"] > 0 and r["h"] > 0


def test_hot_host_skew_parity(ray_session, tmp_path_factory):
    """North-rule skew mitigation: one host owning ~97% of the frontier
    (hot.example with 300 albums vs two small hosts) must neither stall
    the engine nor perturb determinism — full oracle parity, and the
    hot host's released rows must spread across MANY fetch tasks (the
    hot-host split), not serialize on one."""
    spec = default_spec(scale=1, hot_albums=300)
    spec.hosts = [h for h in spec.hosts
                  if h.name in ("hot.example", "plain0.example",
                                "css0.example")]
    sd = [s for s in seeds(default_spec(scale=1, hot_albums=300))
          if any(h.name in s for h in spec.hosts)]
    ref = RefSim(SynthWeb(spec), site_config(spec)).crawl(sd)
    root = str(tmp_path_factory.mktemp("hot"))
    cr = Crawler(CrawlerConfig(
        root=root, fetcher_factory=partial(make_synth_fetcher, spec),
        site_cfg=site_config(spec),
        rate_per_round=1e6, burst=1e6,   # politeness not the limiter
        strict_name_dedup=False))
    cr.seed(sd)
    cr.run()
    assert cr.visit_order() == ref.visit_order
    assert cr.seen_urls() == ref.seen
    got = {r["image_id"]: r["bytes"] for r in cr.images_table().to_pylist()}
    assert got == {k: v["bytes"] for k, v in ref.images.items()}
    # skew evidence: the hot round ran as many tasks, not one giant one
    import os
    import re
    ntasks = []
    for r in range(cr.round + 1):
        p = os.path.join(cr.ckpt, f"round-{r:04d}", "stats.txt")
        if os.path.exists(p):
            ntasks += [int(m) for m in re.findall(
                r"MapBatches\(parse_page_task\).*?(\d+) tasks executed",
                open(p).read())]
    assert max(ntasks) >= 8, ntasks  # hot host split across tasks


def test_salted_release_parity(ray_session, tmp_path_factory):
    """Hot-bucket salting (VERDICT r2 #4): with a tiny salt threshold
    every sizeable bucket is released via parallel presift chunk tasks
    + one driver-side grant per host.  Full oracle parity must hold
    under a REAL politeness budget (rate 2/round) — deferral decisions
    made worker-side must equal the unsalted verdicts — and the hot
    round must actually run several presift tasks."""
    from functools import partial as _partial

    spec = default_spec(scale=1, hot_albums=120)
    spec.hosts = [h for h in spec.hosts
                  if h.name in ("hot.example", "lazy0.example",
                                "plain0.example")]
    sd = [s for s in seeds(default_spec(scale=1, hot_albums=120))
          if any(h.name in s for h in spec.hosts)]
    ref = RefSim(SynthWeb(spec), site_config(spec)).crawl(sd)
    root = str(tmp_path_factory.mktemp("salt"))
    cr = Crawler(CrawlerConfig(
        root=root, fetcher_factory=partial(make_synth_fetcher, spec),
        site_cfg=site_config(spec),
        rate_per_round=16.0, burst=16.0,
        release_driver_threshold=0,   # force the distributed release
        release_salt_threshold=8))    # force salting on real buckets
    cr.seed(sd)
    cr.run()
    assert cr.visit_order() == ref.visit_order
    assert cr.seen_urls() == ref.seen
    got = {r["image_id"]: r["bytes"] for r in cr.images_table().to_pylist()}
    assert got == {k: v["bytes"] for k, v in ref.images.items()}
    # evidence: presift ran as parallel tasks on the hot bucket
    import os
    import re
    ntasks = []
    for r in range(cr.round + 1):
        p = os.path.join(cr.ckpt, f"round-{r:04d}", "stats.txt")
        if os.path.exists(p):
            ntasks += [int(m) for m in re.findall(
                r"MapBatches\(presift_bucket_batch\).*?(\d+) tasks executed",
                open(p).read())]
    assert ntasks and max(ntasks) >= 2, ntasks


# ------------------------------------------------- album gate (Y/N/All/Cancel)

def test_album_gate_parity(ray_session, tmp_path):
    # nested def: cloudpickle serializes it by VALUE, so Ray workers
    # don't need this test module importable
    def _gate(label, i, n_albums, page_url):
        """Deterministic stand-in for the reference's interactive
        prompt (ref src/main.rs:412-468): exercises every verdict."""
        if "a10" in label:
            return "n"        # skip + drop the listing's next link
        if "a21" in label:
            return "CANCEL"   # cancel remaining albums + drop next
        if i == 0:
            return "yes"
        return "all"

    spec = default_spec(scale=1)
    ref = RefSim(SynthWeb(spec), site_config(spec),
                 album_gate=_gate).crawl(seeds(spec))
    ref_all = RefSim(SynthWeb(spec), site_config(spec)).crawl(seeds(spec))
    # the gate must actually prune something, or this test is vacuous
    assert len(ref.visit_order) < len(ref_all.visit_order)

    cfg = CrawlerConfig(
        root=str(tmp_path / "gated"),
        fetcher_factory=partial(make_synth_fetcher, spec),
        site_cfg=site_config(spec),
        rate_per_round=8.0,
        burst=16.0,
        album_gate=_gate,
    )
    cr = Crawler(cfg)
    cr.seed(seeds(spec))
    cr.run()
    assert cr.visit_order() == ref.visit_order
    assert cr.seen_urls() == ref.seen
    got = {r["image_id"]: r for r in cr.images_table().to_pylist()}
    assert set(got) == set(ref.images)
    for iid, want in ref.images.items():
        assert got[iid]["bytes"] == want["bytes"], iid
        assert got[iid]["caption"] == want["caption"], iid
