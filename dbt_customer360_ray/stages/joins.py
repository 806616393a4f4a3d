"""Join/lookup operators (SURVEY.md §2.4) as reusable Ray Data patterns.

- ``broadcast_join``: small side shipped once via ray.put, dict/merge lookup
  inside map_batches — the seed-join pattern
  (/root/reference/models/cleaning/int_customer360__marketo.sql:177-207).
- ``bucketed_hash_join``: both sides large — add ``bucket = hash(key) % B`` to
  each side, tag, union, groupby(bucket), pandas merge per bucket. The portable
  partitioned hash join (ray_guide.md); ``Dataset.join`` is the built-in
  alternative on this Ray version.
- ``semi_join`` / ``anti_join``: broadcast the key set, filter in map_batches
  (the reference has none — SURVEY.md §2.4 'Semi/anti joins: none'; provided
  for completeness).
- ``asof_join``: sort within buckets + ``pd.merge_asof`` per bucket — the
  custom operator recipe for range/as-of semantics Ray Data lacks.

Partitioning assumptions are documented per function; hot-key salting composes
by salting the bucket column exactly as the CDC router does.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..hashing import stable_hash


def broadcast_join(
    ds,
    small_df: pd.DataFrame,
    on: str,
    right_on: str | None = None,
    how: str = "left",
):
    """Left/inner join a Dataset against a driver-side small table (broadcast)."""
    import ray

    ref = ray.put(small_df)

    def per_batch(batch: pd.DataFrame) -> pd.DataFrame:
        small = ray.get(ref)
        return batch.merge(
            small, how=how, left_on=on, right_on=right_on or on
        )

    return ds.map_batches(per_batch, batch_format="pandas")


def _with_bucket(ds, on: str, num_buckets: int, side: str):
    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_bucket"] = (
            stable_hash(batch[on].astype(str)) % np.uint64(num_buckets)
        ).astype(np.int64)
        batch["_side"] = side
        return batch

    return ds.map_batches(tag, batch_format="pandas")


def bucketed_hash_join(
    left,
    right,
    on: str,
    right_on: str | None = None,
    how: str = "inner",
    num_buckets: int = 16,
):
    """Partitioned hash join of two Datasets — a thin wrapper over the native
    hash-shuffle ``Dataset.join`` (both sides repartitioned on the key hash,
    merged per partition). ``num_buckets`` maps to ``num_partitions``; salt hot
    keys into sub-buckets upstream if one key's rows exceed a worker's heap.

    (The previous union+groupby formulation broke on heterogeneous block
    schemas — Ray's sort shuffle does not null-pad differing columns — so the
    native operator is both the faster and the correct path.)
    """
    import ray

    r_on = right_on or on
    join_type = {"inner": "inner", "left": "left_outer", "outer": "full_outer"}[how]
    # Aggregator actors default to 1 CPU each; a join would then need
    # num_partitions free CPU slots before any data moves, which starves (or
    # DEADLOCKS) small sessions — measured: TWO chained joins at 8 cpus with
    # 8×0.25-cpu aggregators each, alongside one 4-actor map pool, wedge the
    # whole DAG. 0.1-cpu aggregators and partitions capped at cpus/2 keep a
    # multi-join pipeline fluid; raise num_buckets explicitly for multi-node
    # runs where partition count should track the cluster, not one node.
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    nparts = max(2, min(num_buckets, cpus // 2))

    # Ray's hash-shuffle join crashes when one input is EMPTY (the aggregator
    # finalizes a schemaless partition: "No match ... FieldRef.Name(...)").
    # A join is a full barrier anyway, so materializing both sides costs one
    # extra object-store hop and makes the emptiness check free; degenerate
    # cases are then constructed directly.
    import ray.data

    left = left.materialize()
    right = right.materialize()
    n_left, n_right = left.count(), right.count()
    if n_left == 0 or n_right == 0:
        def _fields(ds) -> list:
            s = ds.schema(fetch_if_missing=True)
            if s is None:  # an empty dataset can lose its schema entirely
                return []
            return [(n, s.base_schema.field(n).type) for n in s.names]

        l_fields = _fields(left)
        l_names = {n for n, _ in l_fields}
        merged = pa.schema(
            l_fields
            + [
                (n + "_r" if n in l_names else n, t)
                for n, t in _fields(right)
                if n != r_on
            ]
        )
        if how == "inner" or (how == "left" and n_left == 0):
            return ray.data.from_arrow(merged.empty_table())

        def pad_left(t: pa.Table) -> pa.Table:
            for f in merged:
                if f.name not in t.schema.names:
                    t = t.append_column(f.name, pa.nulls(t.num_rows, f.type))
            return t.select(merged.names)

        if how == "left" or (how == "outer" and n_right == 0):
            return left.map_batches(pad_left, batch_format="pyarrow", zero_copy_batch=True)
        # outer with empty left: pad the right side into the merged layout
        ren = {
            n: (n + "_r" if n in l_names and n != r_on else n)
            for n, _ in _fields(right)
        }
        ren[r_on] = on

        def pad_right(t: pa.Table) -> pa.Table:
            t = t.rename_columns([ren[n] for n in t.schema.names])
            for f in merged:
                if f.name not in t.schema.names:
                    t = t.append_column(f.name, pa.nulls(t.num_rows, f.type))
            return t.select(merged.names)

        return right.map_batches(pad_right, batch_format="pyarrow", zero_copy_batch=True)

    joined = left.join(
        right,
        join_type=join_type,
        num_partitions=nparts,
        on=(on,),
        right_on=(r_on,) if r_on != on else None,
        right_suffix="_r",
        aggregator_ray_remote_args={"num_cpus": 0.1},
    )
    return joined


def semi_join(ds, keys, on: str, anti: bool = False):
    """Keep rows whose key is (not) in the broadcast key set."""
    import ray

    ref = ray.put(frozenset(keys))

    def per_batch(batch: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(ref)
        mask = batch[on].isin(ks)
        return batch[~mask] if anti else batch[mask]

    return ds.map_batches(per_batch, batch_format="pandas")


def anti_join(ds, keys, on: str):
    return semi_join(ds, keys, on, anti=True)


def asof_join(
    left,
    right,
    key: str,
    ts: str,
    num_buckets: int = 16,
    direction: str = "backward",
    suffix: str = "_r",
    right_dedup: bool = False,
):
    """As-of join: for each left row, the latest right row with
    right.ts <= left.ts for the same key (direction='backward').

    Buckets by key hash, sorts both sides within the bucket, pd.merge_asof per
    bucket. Assumption: one bucket fits in a worker's heap.

    ``right_dedup=True`` reduces the right side to one row per (key, ts)
    (column-wise max) INSIDE the bucket kernel — deterministic tie-breaking
    without a separate global groupby shuffle, since the bucket shuffle
    already co-locates every (key, ts) duplicate (measured: a Ray
    groupby(key, ts) pre-pass cost 20s of the 23s asof bench entry)."""
    left_cols = list(left.schema().names)
    right_cols = list(right.schema().names)
    # fixed output schema so all-left / all-right buckets stay concatenable
    out_cols = left_cols + [
        (c + suffix if c in left_cols else c)
        for c in right_cols
        if c not in (ts, key)
    ]
    # the union below nulls each side's missing columns, so int64 left
    # columns arrive in pandas as float64 — cast them back on the way out
    # (left columns are never null in the asof output: it's a left join).
    # Right VALUE columns are pinned per bucket — float64 for numerics (left
    # join ⇒ nullable; unmatched buckets would otherwise emit object/float
    # blocks while fully-matched ones emit int64, and the concat is then
    # dtype-unstable), datetime64[us] for timestamps.
    import pyarrow.types as pat

    def _pa_types(ds) -> list:
        # pandas-block datasets report plain Python types; only Arrow types
        # carry the dtype-pinning contract
        s = ds.schema()
        return [
            (n, t) for n, t in zip(s.names, s.types) if isinstance(t, pa.DataType)
        ]

    int_left = {n: str(t) for n, t in _pa_types(left) if pat.is_integer(t)}
    right_casts = {}
    for n, t in _pa_types(right):
        if n in (ts, key):
            continue
        cn = n + suffix if n in left_cols else n
        if pat.is_timestamp(t):
            right_casts[cn] = "datetime64[us]"
        elif pat.is_integer(t) or pat.is_floating(t):
            right_casts[cn] = "float64"
    lt = _with_bucket(left, key, num_buckets, "l")
    rt = _with_bucket(right, key, num_buckets, "r")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["_side"] == "l"][left_cols].sort_values(ts)  # noqa: E741
        r = g[g["_side"] == "r"][right_cols].sort_values(ts)
        if right_dedup and not r.empty:
            r = r.groupby([key, ts], as_index=False, sort=False).max().sort_values(ts)
        if l.empty or r.empty:
            res = l.reindex(columns=out_cols)
        else:
            res = pd.merge_asof(
                l, r, on=ts, by=key, direction=direction, suffixes=("", suffix)
            )[out_cols]
        for c, dt in int_left.items():
            res[c] = res[c].astype(dt)
        for c, dt in right_casts.items():
            res[c] = res[c].astype(dt)
        return res

    return lt.union(rt).groupby("_bucket").map_groups(per_bucket, batch_format="pandas")


def range_join(
    ds,
    ranges: pd.DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    how: str = "inner",
):
    """Broadcast range (band) join: each row matched to the range with
    ``lo <= value < hi``. The range table must be small, non-overlapping and
    is broadcast once via ``ray.put``; matching is ONE ``np.searchsorted`` per
    batch — a map-only stage, no shuffle. ``how='left'`` keeps unmatched rows
    with null band columns. The big×big interval-overlap case instead maps
    each side onto a coarse grid key and composes ``bucketed_hash_join``.
    """
    import ray

    r = ranges.sort_values(lo_col, kind="stable").reset_index(drop=True)
    los = r[lo_col].to_numpy(dtype=np.float64)
    his = r[hi_col].to_numpy(dtype=np.float64)
    if (los[1:] < his[:-1]).any():
        raise ValueError("range_join: ranges overlap")
    label_cols = [c for c in r.columns if c not in (lo_col, hi_col)]
    ref = ray.put((los, his, {c: r[c].to_numpy() for c in label_cols}))

    def lookup(batch: pd.DataFrame) -> pd.DataFrame:
        lo_arr, hi_arr, labels = ray.get(ref)
        v = batch[value_col].to_numpy(dtype=np.float64)
        idx = np.searchsorted(lo_arr, v, side="right") - 1
        ok = (idx >= 0) & (v < hi_arr[np.clip(idx, 0, None)])
        out = batch if how == "left" else batch.loc[ok]
        out = out.copy()
        sel = idx[ok] if how != "left" else idx
        for c, vals in labels.items():
            if how == "left":
                col = pd.Series(vals[np.clip(idx, 0, None)], index=out.index)
                col[~ok] = None
                out[c] = col
            else:
                out[c] = vals[sel]
        return out

    return ds.map_batches(lookup, batch_format="pandas")


def point_in_interval_join(
    points,
    intervals,
    key: str,
    ts: str,
    lo: str,
    hi: str,
    grid_seconds: int = 86_400,
    num_buckets: int = 16,
):
    """Big×big range join: each point row matched to every interval row of
    the same ``key`` with ``lo <= ts < hi`` — the composition path
    ``range_join`` documents for when NEITHER side fits a broadcast.

    Both sides map onto a coarse time grid: an interval emits one row per
    covered grid cell (replication factor = interval span / grid), a point
    lands in exactly ONE cell, and a ``bucketed_hash_join`` on the composite
    (key, cell) co-locates candidates; the exact containment predicate then
    filters per batch. A point matches each qualifying interval exactly once
    (its single cell meets each interval's covering row once) — no dedup
    pass needed. Pick ``grid_seconds`` near the typical interval span: the
    replication factor is span/grid while cell population is points/grid.
    """
    import pyarrow.compute as pc

    grid_us = np.int64(grid_seconds) * 1_000_000

    def _us(col: pa.ChunkedArray) -> np.ndarray:
        return pc.cast(col, pa.timestamp("us")).cast(pa.int64()).to_numpy()

    def _cell_key(keys: pa.ChunkedArray | pa.Array, cell: np.ndarray) -> pa.Array:
        return pc.binary_join_element_wise(
            pc.cast(keys, pa.string()),
            pc.cast(pa.array(cell, pa.int64()), pa.string()),
            "|",
        )

    def point_cells(t: pa.Table) -> pa.Table:
        cell = _us(t.column(ts)) // grid_us
        return t.append_column("_cell_key", _cell_key(t.column(key), cell))

    def interval_cells(t: pa.Table) -> pa.Table:
        lo_us = _us(t.column(lo))
        hi_us = _us(t.column(hi))
        c_lo = lo_us // grid_us
        # hi is exclusive: the last covered cell holds hi-1
        c_hi = np.maximum(c_lo, (hi_us - 1) // grid_us)
        n = (c_hi - c_lo + 1).astype(np.int64)
        idx = np.repeat(np.arange(t.num_rows), n)
        ends = np.cumsum(n)
        cell = np.arange(int(ends[-1]) if len(ends) else 0, dtype=np.int64) - np.repeat(
            ends - n, n
        ) + np.repeat(c_lo, n)
        rep = t.take(pa.array(idx))
        return rep.append_column("_cell_key", _cell_key(rep.column(key), cell))

    p = points.map_batches(point_cells, batch_format="pyarrow", zero_copy_batch=True)
    iv = intervals.map_batches(
        interval_cells, batch_format="pyarrow", zero_copy_batch=True
    )
    # the interval side's key column would collide with the point side's —
    # drop it (the join key carries it via _cell_key)
    iv = iv.map_batches(
        lambda t: t.drop_columns([key]), batch_format="pyarrow", zero_copy_batch=True
    )
    joined = bucketed_hash_join(p, iv, on="_cell_key", num_buckets=num_buckets)

    def contained(df: pd.DataFrame) -> pd.DataFrame:
        keep = (df[ts] >= df[lo]) & (df[ts] < df[hi])
        return df.loc[keep].drop(columns=["_cell_key"])

    return joined.map_batches(contained, batch_format="pandas")
