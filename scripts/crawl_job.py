#!/usr/bin/env python
"""Crawl job entry point for ``ray job submit``.

On a real cluster:

    ray job submit --working-dir . -- python scripts/crawl_job.py \
        --sf-dir /data/corpus --n-docs 10000000000 --n-hosts 10000000 \
        --target-pages 50000 --out-dir /data/crawl_out \
        --checkpoint-dir /data/crawl_ckpt

In this sandbox it runs against the local Ray session (address="local").
Resumes automatically from ``--checkpoint-dir`` when a checkpoint
exists (the north rule's resumable execution), and prints per-wave
lineage metrics plus a final JSON summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                   help="documents.parquet source for the text corpus")
    p.add_argument("--n-docs", type=int, default=10_000)
    p.add_argument("--n-hosts", type=int, default=500)
    p.add_argument("--n-seeds", type=int, default=100)
    p.add_argument("--target-pages", type=int, default=2_000)
    p.add_argument("--max-waves", type=int, default=12)
    p.add_argument("--zipf", type=float, default=1.1)
    p.add_argument("--out-dir", default="/tmp/crawl_job_out")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--num-cpus", type=int,
                   default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    p.add_argument("--shards", type=int, default=None)
    p.add_argument("--fidelity", choices=["reference", "strict"],
                   default="reference")
    args = p.parse_args()

    import ray

    if not ray.is_initialized():  # ray job submit may pre-init via runtime env
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import pyarrow.parquet as pq

    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.crawl import (
        CrawlEngine,
    )
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.sources.synthetic_web import (
        CrawlParams,
        WebConfig,
    )

    texts = tuple(
        pq.read_table(f"{args.sf_dir}/documents.parquet", columns=["text"])[
            "text"
        ].to_pylist()
    )
    cfg = WebConfig(n_docs=args.n_docs, n_hosts=args.n_hosts, texts=texts,
                    zipf_s=args.zipf)
    params = CrawlParams(target_pages=args.target_pages,
                         max_waves=args.max_waves, n_seeds=args.n_seeds)
    shards = args.shards or max(2, args.num_cpus // 4)
    # reserve a core per shard actor only when at least half the budget
    # remains for map tasks — otherwise the wave job cannot schedule
    actor_cpus = 1 if args.num_cpus >= 4 * shards else 0
    eng = CrawlEngine(
        cfg,
        params,
        n_host_shards=shards,
        n_seen_shards=shards,
        actor_num_cpus=actor_cpus,
        fidelity=args.fidelity,
        out_dir=args.out_dir,
        checkpoint_dir=args.checkpoint_dir,
    )
    if args.checkpoint_dir and eng.resume():
        print(f"resumed from wave {eng.wave_idx}", file=sys.stderr)
        summary = eng.run_resumed()
    else:
        summary = eng.run()
    for w in eng.waves:
        print(json.dumps({k: v for k, v in w.items()
                          if not k.endswith("_urls")}), file=sys.stderr)
    print(
        json.dumps(
            {
                "pages": summary["pages"],
                "visited": summary["visited"],
                "queue": summary["queue"],
                "waves": summary["waves"],
                "out_dir": args.out_dir,
                "filter_stats": summary["filter_stats"],
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
