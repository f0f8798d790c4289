#!/usr/bin/env python
"""Crawl job entry point — designed for ``ray job submit`` on a
multi-node cluster (north rule), and runnable standalone locally.

    ray job submit --working-dir . -- \
        python scripts/run_crawl.py --root /mnt/shared/crawl1 \
            --scale 3 --rate 8 --burst 16 [--resume]

On a cluster the driver attaches to the existing Ray instance
(RAY_ADDRESS); standalone it starts a local one.  The crawl is
resumable: re-running with ``--resume`` continues from the last
committed manifest.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial

sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="sink + checkpoint dir")
    ap.add_argument("--scale", type=int, default=1)
    ap.add_argument("--img-scale", type=int, default=1)
    ap.add_argument("--hot-albums", type=int, default=None)
    ap.add_argument("--rate", type=float, default=8.0,
                    help="politeness tokens/host/round")
    ap.add_argument("--burst", type=float, default=16.0)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--fetcher", choices=["synth", "http"], default="synth",
                    help="synth = deterministic synthetic web; http = real "
                         "HTTP via imgray.fetchers.HttpFetcher")
    ap.add_argument("--seeds", nargs="*", default=None,
                    help="seed URLs (http fetcher; synth derives its own)")
    ap.add_argument("--site-config", default=None,
                    help="path to a reference-format web.json (http mode)")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local mode only; ignored under ray job submit")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False}
        if args.num_cpus:
            kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**kwargs)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from imgray.crawler import Crawler, CrawlerConfig, make_synth_fetcher
    from imgray.synthweb import default_spec, seeds, site_config

    if args.fetcher == "http":
        from imgray.fetchers import HttpFetcher

        site_cfg = []
        if args.site_config:
            site_cfg = json.load(open(args.site_config))
        cfg = CrawlerConfig(
            root=args.root,
            fetcher_factory=HttpFetcher,
            site_cfg=site_cfg,
            rate_per_round=args.rate, burst=args.burst,
        )
        seed_urls = args.seeds or []
    else:
        spec = default_spec(scale=args.scale, seed=args.seed,
                            img_scale=args.img_scale,
                            hot_albums=args.hot_albums)
        cfg = CrawlerConfig(
            root=args.root,
            fetcher_factory=partial(make_synth_fetcher, spec),
            site_cfg=site_config(spec),
            rate_per_round=args.rate, burst=args.burst,
        )
        seed_urls = seeds(spec)
    cr = Crawler(cfg)
    if args.resume and cr.sink.exists() and cr.resume():
        print(f"resuming from round {cr.round}", file=sys.stderr)
    else:
        cr.seed(seed_urls)
    t0 = time.time()
    stats = cr.run()
    stats["wall_s"] = round(time.time() - t0, 3)
    stats["sink_version"] = cr.sink.latest_version()
    stats["sink_rows"] = cr.sink.count_rows()
    print(json.dumps(stats))
    ray.shutdown()


if __name__ == "__main__":
    main()
