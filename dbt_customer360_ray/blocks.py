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


def tree_reduce(ds, kernel, fan: int = 32):
    """Task-tree reduction over a Dataset's materialized blocks: ``kernel``
    (up to ``fan`` pa.Tables → one pa.Table) is applied recursively until a
    single table remains, which returns to the driver. Driver-visible data =
    ONE kernel output — independent of input block count.

    This is the systemic fix for the per-batch-partials collection pattern
    (``ds.map_batches(partial).to_pandas()`` then a driver groupby/head):
    that collects O(#batches × domain) rows, a driver OOM at 10^7 batches
    even when the reduced domain (vocabulary, bucket grid, top-k) is tiny —
    the same scale-bug class as the r3 heavy-hitters finding. A task tree
    keeps every merge worker-side in O(log_fan blocks) levels and, for lean
    domains, skips the fixed aggregator-actor cost a Dataset groupby shuffle
    would pay (measured across this repo's bucket-task exchanges). The
    kernel must be associative and idempotent on its own output (groupby-sum
    and sorted-head-k both are).

    A dataset with ZERO blocks (e.g. ``from_items([])``) runs the kernel once
    over a single schemaless empty table so callers still receive a pa.Table
    (with the kernel's output columns when the kernel guards for them) instead
    of ``None`` — every call site chains ``.to_pandas()`` immediately."""
    import pyarrow as pa
    import ray

    refs = ds.materialize().to_arrow_refs()
    if not refs:
        return kernel(pa.table({}))
    task = ray.remote(kernel)
    while True:
        refs = [task.remote(*refs[i : i + fan]) for i in range(0, len(refs), fan)]
        if len(refs) == 1:
            return ray.get(refs[0])


def _concat_nonempty(tbls):
    """Concat, skipping ZERO-ROW tables — an empty map_batches output block
    carries a null-typed schema that poisons ``pa.concat_tables`` against
    typed siblings. All-empty input returns the first table unchanged."""
    import pyarrow as pa

    live = [t for t in tbls if t.num_rows]
    if not live:
        return tbls[0]
    return pa.concat_tables(live)


def _backfill_missing(df, obj_cols: list, num_cols: list):
    """On an EMPTY frame whose source blocks were schemaless (all-empty fan
    group), add the columns the kernel is about to index so groupby/sort see
    a typed empty result instead of KeyError. Non-empty frames always carry
    the real map_batches schema and pass through untouched."""
    import pandas as pd

    if len(df):
        return df
    for c in obj_cols:
        if c not in df.columns:
            df[c] = pd.Series([], dtype="object")
    for c in num_cols:
        if c not in df.columns:
            df[c] = pd.Series([], dtype="int64")
    return df


def sum_kernel(group_cols: list, sum_cols: list):
    """``tree_reduce`` kernel: concat → groupby(group_cols) sum(sum_cols)."""

    def kernel(*tbls):
        import pandas as pd  # noqa: F401 (worker-side import)
        import pyarrow as pa

        df = _concat_nonempty(tbls).to_pandas()
        df = _backfill_missing(df, group_cols, sum_cols)
        out = df.groupby(group_cols, as_index=False)[sum_cols].sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    return kernel


def topk_kernel(sort_cols: list, ascending: list, k: int):
    """``tree_reduce`` kernel: concat → stable sort → head-k (the shared
    total order makes the distributed merge of partial top-ks exact)."""

    def kernel(*tbls):
        df = _concat_nonempty(tbls).to_pandas()
        df = _backfill_missing(df, sort_cols, [])
        df = df.sort_values(sort_cols, ascending=ascending, kind="stable").head(k)
        import pyarrow as pa

        return pa.Table.from_pandas(df, preserve_index=False)

    return kernel


def counted(ds) -> tuple:
    """(materialized ds, row count) — materialize first so the count pass and
    the downstream shuffle read the same cached blocks instead of executing
    the upstream pipeline twice."""
    ds = ds.materialize()
    return ds, ds.count()
