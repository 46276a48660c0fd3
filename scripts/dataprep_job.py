#!/usr/bin/env python
"""Training-data prep job entry point for ``ray job submit``.

Composes the training-data operators end-to-end over a `documents`
table and writes a partitioned, resumable parquet output:

    read documents
      → percentile-window length filter   (pipelines.textpipe.q_quality_filter rule)
      → exact dedup                       (first doc per content hash)
      → weighted mixture sampling         (per-source rates, deterministic)
      → partitioned parquet sink          (one dir per source; a finished
                                           partition is skipped on re-run)

On a real cluster:

    ray job submit --working-dir . -- python scripts/dataprep_job.py \
        --sf-dir /data/corpus --out-dir /data/prep_out

Every stage is a streaming Dataset transform; the only driver-side
state is the two percentile thresholds (scalars) and the per-source
rate table (one row per source).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--out-dir", default="/tmp/dataprep_out")
    p.add_argument("--lo", type=float, default=0.05)
    p.add_argument("--hi", type=float, default=0.95)
    p.add_argument("--num-cpus", type=int,
                   default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = p.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.textpipe import (
        MIX_CYCLE,
    )
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.sources.tables import (
        read_parquet_clean,
    )

    ds = read_parquet_clean(
        f"{args.sf_dir}/documents.parquet",
        columns=["doc_id", "text", "source", "n_chars"],
    )

    # -- stage 1: percentile-window length thresholds (two-pass exact
    # quantile over per-block histograms; only scalars reach the driver)
    def hist(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t["n_chars"].combine_chunks())
        return pa.table({"v": vc.field("values"), "c": vc.field("counts")})

    merged = (
        ds.map_batches(hist, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("c", alias_name="n"))
        .to_pandas()
        .sort_values("v")
    )
    cum = merged["n"].cumsum().to_numpy()
    total = int(cum[-1])
    vals = merged["v"].to_numpy()

    def rank_elem(q: float) -> int:
        rank = max(1, math.ceil(q * total))
        return int(vals[int(np.searchsorted(cum, rank))])

    lo, hi = rank_elem(args.lo), rank_elem(args.hi)

    # -- stage 2+3: length filter + content-hash tag (one fused pass)
    def filter_and_hash(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t["n_chars"], pa.scalar(lo)),
            pc.less_equal(t["n_chars"], pa.scalar(hi)),
        )
        t = t.filter(m)
        hashes = [
            hashlib.md5((x or "").encode()).hexdigest()
            for x in t["text"].to_pylist()
        ]
        return t.append_column("text_hash", pa.array(hashes, pa.string()))

    tagged = ds.map_batches(filter_and_hash, batch_format="pyarrow")

    # -- stage 3: exact dedup — keep the min doc_id per content hash
    def first_per_hash(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[("doc_id", "ascending")])
        return g.take(idx[:1])

    deduped = tagged.groupby("text_hash").map_groups(
        first_per_hash, batch_format="pyarrow"
    )

    # -- stage 4: deterministic per-source mixture sampling
    M32 = np.uint64(0xFFFFFFFF)
    A = np.uint64(2654435761)

    def mix_keep(t: pa.Table) -> pa.Table:
        srcs = t["source"].to_pylist()
        rates = np.array(
            [((int(s[3:]) % MIX_CYCLE) + 1) / MIX_CYCLE for s in srcs]
        )
        thr = (rates * float(1 << 32)).astype(np.uint64)
        keys = t["doc_id"].to_numpy().astype(np.uint64)
        h = ((keys & M32) * A) & M32
        return t.filter(pa.array(h < thr))

    sampled = deduped.map_batches(mix_keep, batch_format="pyarrow")

    # -- stage 5: resumable partitioned sink — one directory per source;
    # a directory that already exists (finished partition) is skipped
    import pyarrow.parquet as pq

    os.makedirs(args.out_dir, exist_ok=True)

    # run-parameter guard (ADVICE r2): skipping finished partitions is
    # only sound if they were produced under the SAME parameters —
    # resuming after a --lo/--hi or MIX_CYCLE change would silently mix
    # thresholds.  meta.json records them; a mismatch refuses to resume.
    meta = {"sf_dir": args.sf_dir, "lo": args.lo, "hi": args.hi,
            "thresholds": [lo, hi], "mix_cycle": MIX_CYCLE}
    meta_path = os.path.join(args.out_dir, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            prev = json.load(f)
        if prev != meta:
            print(json.dumps({"error": "param_mismatch",
                              "existing": prev, "current": meta}))
            ray.shutdown()
            return 2
    else:
        with open(meta_path, "w") as f:
            json.dump(meta, f)

    written, skipped = 0, 0
    df = sampled.select_columns(
        ["doc_id", "source", "n_chars", "text"]
    ).to_pandas()  # small at sandbox scale; at 100 TB this is
    # write_parquet(partition_cols=["source"]) with the same
    # dir-per-partition skip discipline
    for src, grp in df.groupby("source"):
        d = os.path.join(args.out_dir, f"source={src}")
        if os.path.isdir(d):
            skipped += 1
            continue
        tmp = d + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(
            pa.Table.from_pandas(grp.sort_values("doc_id"),
                                 preserve_index=False),
            os.path.join(tmp, "part-0.parquet"),
        )
        os.replace(tmp, d)
        written += 1

    print(
        json.dumps(
            {
                "thresholds": [lo, hi],
                "rows_out": len(df),
                "partitions_written": written,
                "partitions_skipped": skipped,
                "out_dir": args.out_dir,
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
