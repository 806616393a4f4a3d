"""Shuffle-granularity sizing shared across stages.

Every coarse-bucket shuffle in this engine assumes "one bucket fits a
worker's heap". A fixed bucket count silently breaks that at 100× the data,
so bucket counts derive from input row counts with the same footer-driven
recipe as ``sources.readers.read_table(rows_per_block=…)``: floor at a
per-stage minimum (per-group pandas overhead argues for fat groups at small
scale — measured, see stages/windows.py), grow linearly with rows, cap at a
sanity ceiling.
"""

from __future__ import annotations


def adaptive_buckets(
    total_rows: int,
    rows_per_bucket: int = 250_000,
    lo: int = 16,
    hi: int = 4096,
) -> int:
    """Bucket count for ``total_rows`` input rows: ceil(rows/rows_per_bucket)
    clamped to [lo, hi]."""
    return int(max(lo, min(hi, -(-max(int(total_rows), 1) // rows_per_bucket))))


def counted(ds) -> tuple:
    """(materialized ds, row count) — materialize first so the count pass and
    the downstream shuffle read the same cached blocks instead of executing
    the upstream pipeline twice."""
    ds = ds.materialize()
    return ds, ds.count()
