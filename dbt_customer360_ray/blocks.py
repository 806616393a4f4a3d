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


def topk_kernel(sort_cols: list, ascending: list, k: int, str_cols: tuple = ()):
    """``tree_reduce`` kernel: concat → stable sort → head-k (the shared
    total order makes the distributed merge of partial top-ks exact).
    ``str_cols`` names the sort columns that are strings — on an all-empty
    input the rest backfill as int64, keeping the empty result's dtypes
    identical to the populated one's (the oracle dtype contract)."""

    def kernel(*tbls):
        df = _concat_nonempty(tbls).to_pandas()
        df = _backfill_missing(
            df,
            [c for c in sort_cols if c in str_cols],
            [c for c in sort_cols if c not in str_cols],
        )
        df = df.sort_values(sort_cols, ascending=ascending, kind="stable").head(k)
        import pyarrow as pa

        return pa.Table.from_pandas(df, preserve_index=False)

    return kernel


def bucket_exchange(ds, num_buckets: int, bucket_of, fold):
    """The house split→fold raw-task exchange: one stable-argsort split per
    materialized block (``bucket_of(pa.Table) -> np.int64 array in
    [0, num_buckets)``; empty blocks route themselves to every bucket
    unchanged) + ONE ``fold(*tables) -> pa.Table`` task per bucket; returns
    the fold outputs as a Dataset. This replaces Dataset.groupby's
    sort-shuffle for lean keyed exchanges, whose fixed aggregator cost
    dominates at per-epoch granularity (measured: read_dedup_keepers
    2.8→1.6 s, signature-index syncs 12.2→5.4 s / 10.0→4.4 s at sf0.1 —
    BASELINE.md). Callers must normalize block schemas first (an empty
    schemaless block reaching a concat-style fold must be filtered or typed
    by the fold itself). ``num_buckets == 1`` folds the blocks directly —
    no split tasks.

    Returns None→empty contract: a ZERO-block input returns the input
    dataset unchanged (callers with a schema contract should guard)."""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data

    refs = ds.materialize().to_arrow_refs()
    if not refs:
        return ds
    fold_t = ray.remote(fold)
    if num_buckets == 1:
        return ray.data.from_arrow_refs([fold_t.remote(*refs)])
    B = num_buckets

    def _split(t: pa.Table) -> list:
        if t.num_rows == 0:
            return [t] * B
        b = bucket_of(t)
        order = np.argsort(b, kind="stable")
        tt, sb = t.take(pa.array(order)), b[order]
        cuts = np.searchsorted(sb, np.arange(B + 1))
        return [tt.slice(cuts[i], cuts[i + 1] - cuts[i]) for i in range(B)]

    split = ray.remote(num_returns=B)(_split)
    cols = [split.remote(r) for r in refs]
    return ray.data.from_arrow_refs(
        [fold_t.remote(*[c[b] for c in cols]) for b in range(B)]
    )


def counted(ds) -> tuple:
    """(materialized ds, row count) — materialize first so the count pass and
    the downstream shuffle read the same cached blocks instead of executing
    the upstream pipeline twice."""
    ds = ds.materialize()
    return ds, ds.count()
