#!/usr/bin/env python
"""CLI crawl-loop driver (bin/crawl analogue).

Examples:
  python crawl.py --workdir /tmp/crawl --seeds seeds.txt --rounds 3
  python crawl.py --workdir /tmp/crawl --feed --rounds 2 --topn 5000
  python crawl.py --workdir /tmp/crawl --synthetic 10000 --rounds 1

Owns its Ray session (guarded init/shutdown); drive programmatically via
coherencebot_ray.pipelines.loop.crawl_loop instead when embedding.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--seeds", help="seed file (url[\\tk=v]* lines)")
    ap.add_argument("--synthetic", type=int, default=0, help="bootstrap a synthetic frontier of N urls")
    ap.add_argument("--feed", action="store_true", help="inject from the (fake) collections feed")
    ap.add_argument("--rounds", type=int, default=1)
    ap.add_argument("--topn", type=int, default=50_000)
    ap.add_argument("--num-partitions", type=int, default=16)
    ap.add_argument("--schedule", choices=["default", "adaptive", "mime_adaptive"], default="default")
    ap.add_argument("--sitemaps-every", type=int, default=0, help="run the sitemap fetch round every N rounds")
    ap.add_argument("--generate-update-crawldb", action="store_true", help="Generator CrawlDbUpdater gen_time write-back")
    ap.add_argument("--warc-out", help="export WARC/1.0 records of each round's content to this dir")
    ap.add_argument("--gc-keep-gens", type=int, default=0, help="garbage-collect frontier generations, keeping the newest N")
    ap.add_argument("--hostdb-every", type=int, default=0)
    ap.add_argument("--dedup-every", type=int, default=0)
    ap.add_argument("--doc-dedup-every", type=int, default=0,
                    help="document-level near-dup keep-one (minhash→components→mark losers) every N rounds")
    ap.add_argument("--media-dedup-every", type=int, default=0,
                    help="interleaved media-ref dedup plan (fetch each asset once) every N rounds")
    ap.add_argument("--invertlinks-every", type=int, default=0)
    ap.add_argument("--index-every", type=int, default=0)
    ap.add_argument("--add-binary-content", action="store_true",
                    help="IndexingJob -addBinaryContent: binaryContent field from segment bytes")
    ap.add_argument("--base64", action="store_true",
                    help="indexer.binary.base64: base64-encode binaryContent")
    ap.add_argument("--media-pct", type=int, default=0,
                    help="share of fetches returning interleaved media (gif/wav) payloads")
    ap.add_argument("--num-cpus", type=int, default=32)
    ap.add_argument("--start-time-ms", type=int, default=None,
                    help="fixed crawl time base for reproducible drives; "
                         "resumed runs reuse the workdir's persisted base")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from coherencebot_ray.config import CrawlConfig
    from coherencebot_ray.pipelines.loop import crawl_loop

    cfg = CrawlConfig(
        num_partitions=args.num_partitions,
        topn=args.topn,
        schedule=args.schedule,
        server_delay_s=0.0,  # fake protocol: no wall-clock politeness sleeps
        gen_update_crawldb=args.generate_update_crawldb,
        indexer_add_binary_content=args.add_binary_content,
        indexer_binary_base64=args.base64,
    )

    seeds = None
    if args.seeds:
        with open(args.seeds) as f:
            seeds = f.read().splitlines()
    elif args.synthetic:
        from coherencebot_ray.pipelines.crawl import CrawlDriver

        n_hosts = max(1, args.synthetic // 50)
        if args.synthetic >= 20_000_000:
            # corpus-scale bootstrap: never materialize the frontier on
            # the driver — generate chunks in parallel tasks and write
            # partitions directly into the store (bootstrap_ds).
            from coherencebot_ray.sources.synth import synth_frontier_ds

            CrawlDriver(args.workdir, cfg).bootstrap_ds(
                synth_frontier_ds(args.synthetic, n_hosts, cfg))
        else:
            from coherencebot_ray.sources.synth import synth_frontier

            CrawlDriver(args.workdir, cfg).bootstrap(
                synth_frontier(args.synthetic, n_hosts, cfg))
        seeds = []

    protocol = None
    if args.media_pct:
        from coherencebot_ray.sources.fake_protocol import FakeProtocol

        protocol = FakeProtocol(media_pct=args.media_pct)

    results = crawl_loop(
        args.workdir,
        cfg,
        protocol=protocol,
        seeds=seeds,
        rounds=args.rounds,
        start_time_ms=args.start_time_ms,
        use_feed=args.feed,
        hostdb_every=args.hostdb_every,
        dedup_every=args.dedup_every,
        doc_dedup_every=args.doc_dedup_every,
        media_dedup_every=args.media_dedup_every,
        invertlinks_every=args.invertlinks_every,
        index_every=args.index_every,
        sitemaps_every=args.sitemaps_every,
        warc_out=args.warc_out,
        gc_keep_gens=args.gc_keep_gens,
    )
    for m in results:
        print(json.dumps(m))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
