"""Windowed / per-group ordered operators.

The reference's only windowing is the per-entity confidence ranking
(``count(*) over (partition by customer360_id, value)`` +
``max(...) over (...)`` then dense_rank/row_number —
/root/reference/models/output/customer360__email.sql:95-110). Ray Data has no
window functions; we express them as COARSE-bucket shuffles with fully
vectorized per-bucket kernels: per-key ``map_groups`` pays pandas overhead per
tiny group (measured 3-9 s for ~30k single-row groups at sf0.1), while 64
hash buckets amortize it to one sort + one C-level groupby per bucket. The
per-key semantics are identical because every key's rows share a bucket.

Sessionization is the stream-shaped extension a transcript/event pipeline needs
(gap-based sessions per user); same primitive.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _bucket_of(values, num_buckets: int) -> np.ndarray:
    from ..hashing import stable_hash

    return (stable_hash(values) % np.uint64(num_buckets)).astype(np.int64)


def _resolve_buckets(ds, num_buckets, rows_per_bucket: int):
    """num_buckets=None → derive from the input's row count
    (blocks.adaptive_buckets; floor 64 — measured per-group pandas overhead
    argues for fat groups at small scale, see module docstring). Returns
    (ds, num_buckets); the count pass materializes so the shuffle reuses the
    cached blocks."""
    if num_buckets is not None:
        return ds, num_buckets
    from ..blocks import adaptive_buckets, counted

    ds, n = counted(ds)
    return ds, adaptive_buckets(n, rows_per_bucket, lo=64)


def sessionize(
    ds,
    key: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    gap_seconds: int = 1800,
    num_buckets: int | None = 64,
    rows_per_bucket: int = 250_000,
):
    """Per key: count gap-based sessions and events.

    Returns a Dataset with (key, n_events:int64, n_sessions:int64).
    Partitioning assumption: one BUCKET of keys fits in a worker's heap
    (``num_buckets=None`` derives the count from input rows via
    blocks.adaptive_buckets); all rows of a key land in one bucket, so
    per-key results are exact.
    """
    ds, num_buckets = _resolve_buckets(ds, num_buckets, rows_per_bucket)

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df["_b"] = _bucket_of(df[key], num_buckets)
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # one stable sort, then vectorized session-boundary detection: a row
        # starts a session iff it's the key's first row or follows a gap
        g = g.sort_values([key, ts_col, tie_col], kind="stable")
        first_of_key = g[key].ne(g[key].shift()).to_numpy()
        gaps = g[ts_col].diff().dt.total_seconds().to_numpy()
        with np.errstate(invalid="ignore"):
            new_session = first_of_key | (gaps > gap_seconds)
        agg = (
            pd.DataFrame({key: g[key].to_numpy(), "_new": new_session})
            .groupby(key, sort=False)
            .agg(n_events=("_new", "size"), n_sessions=("_new", "sum"))
            .reset_index()
        )
        agg["n_events"] = agg["n_events"].astype(np.int64)
        agg["n_sessions"] = agg["n_sessions"].astype(np.int64)
        return agg

    return (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pandas")
    )


def rolling_window(
    ds,
    key: str = "user_id",
    ts_col: str = "ts",
    value_cents_col: str = "value_cents",
    out_cols: tuple[str, str] = ("n_window", "cents_window"),
    window_seconds: int = 3600,
    num_buckets: int | None = 64,
    keep_cols: tuple[str, ...] = (),
    rows_per_bucket: int = 250_000,
    axis_limit: int = 2**62,
):
    """Sliding event-time windowed aggregate: for EVERY row, the count and
    value sum of the key's rows in the trailing window [ts−W, ts] — SQL
    ``RANGE BETWEEN INTERVAL W PRECEDING AND CURRENT ROW`` semantics
    (equal-timestamp rows are peers: all included regardless of order, so the
    result is deterministic under ties).

    Same coarse-bucket shape as ``sessionize``; within a bucket the window is
    ONE vectorized pass, not a per-key loop: keys are spread along a synthetic
    int64 axis (factorized key code × stride, stride > ts range + W) so a
    single pair of ``np.searchsorted`` calls yields every row's window
    [lo, hi) without windows ever crossing a key boundary. Sums are int64
    cents via prefix sums — exact, no float drift vs the SQL oracle.
    """

    import functools

    ds, num_buckets = _resolve_buckets(ds, num_buckets, rows_per_bucket)

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df["_b"] = _bucket_of(df[key], num_buckets)
        return df

    kernel = functools.partial(
        rolling_kernel,
        key=key,
        ts_col=ts_col,
        value_cents_col=value_cents_col,
        out_cols=out_cols,
        w_us=np.int64(window_seconds) * 1_000_000,
        keep_cols=keep_cols,
        axis_limit=axis_limit,
    )
    return (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("_b")
        .map_groups(kernel, batch_format="pandas")
    )


def rolling_kernel(
    g: pd.DataFrame,
    key: str,
    ts_col: str,
    value_cents_col: str,
    out_cols: tuple[str, str],
    w_us: np.int64,
    keep_cols: tuple[str, ...],
    axis_limit: int,
) -> pd.DataFrame:
    """Per-bucket trailing-window kernel (module-level so property tests can
    drive it directly; all keys of a row's group must be in ``g``)."""
    g = g.sort_values([key, ts_col], kind="stable")
    ts = g[ts_col].astype("datetime64[us]").to_numpy().view(np.int64)
    ts = ts - (ts.min() if len(ts) else 0)  # shrink the stride base
    codes = pd.factorize(g[key], sort=False)[0].astype(np.int64)
    stride = (ts.max() + w_us + np.int64(2)) if len(ts) else np.int64(1)
    n_keys = int(codes[-1]) + 1 if len(codes) else 0
    if n_keys * int(stride) < axis_limit:
        axis = ts + codes * stride
        lo = np.searchsorted(axis, axis - w_us, side="left")
        hi = np.searchsorted(axis, axis, side="right")
    else:
        # strided-axis product would overflow int64 (extreme key
        # cardinality × time range in one bucket): per-key-segment
        # searchsorted — same semantics, one pair of calls per key
        lo = np.empty(len(ts), dtype=np.int64)
        hi = np.empty(len(ts), dtype=np.int64)
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        ends = np.r_[starts[1:], len(codes)]
        for s, e in zip(starts, ends):
            seg = ts[s:e]
            lo[s:e] = s + np.searchsorted(seg, seg - w_us, side="left")
            hi[s:e] = s + np.searchsorted(seg, seg, side="right")
    cum = np.concatenate(
        [[0], np.cumsum(g[value_cents_col].to_numpy(dtype=np.int64))]
    )
    out = g[[key, ts_col, *keep_cols]].copy()
    out[out_cols[0]] = (hi - lo).astype(np.int64)
    out[out_cols[1]] = cum[hi] - cum[lo]
    return out.drop(columns=[c for c in ("_b",) if c in out.columns])


def rank_survivors(
    ds,
    entity_key: str,
    value_col: str,
    count_col: str = "value_count",
    recency_col: str = "last_seen",
    num_buckets: int | None = 64,
    rows_per_bucket: int = 250_000,
):
    """customer360-style survivorship: per entity keep the value with the
    highest (frequency, recency) — 'recency and frequency'
    (/root/reference/README.md:48; customer360__email.sql:109-110). Expects a
    pre-aggregated Dataset of (entity_key, value_col, count_col, recency_col);
    emits the index=1 row per entity with deterministic tie-break on value.

    Two-stage argmax under one total order (best-per-entity is associative):
    a per-batch vectorized partial prunes to one candidate row per entity
    before the coarse bucket shuffle; the per-bucket final applies the same
    rule, so the distributed result equals a single global pass."""
    ds, num_buckets = _resolve_buckets(ds, num_buckets, rows_per_bucket)

    def best(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            [entity_key, count_col, recency_col, value_col],
            ascending=[True, False, False, True],
            kind="stable",
        )
        return df.drop_duplicates(entity_key, keep="first")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = best(df)
        df["_b"] = _bucket_of(df[entity_key], num_buckets)
        return df

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return best(g).drop(columns="_b")

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_b")
        .map_groups(final, batch_format="pandas")
    )


def grouped_quantiles(
    ds,
    key: str,
    value_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
    out_names: tuple[str, ...] = ("p25", "p50", "p75"),
    num_buckets: int | None = 64,
    rows_per_bucket: int = 250_000,
):
    """Exact per-key quantiles (SQL ``quantile_cont`` / numpy 'linear'
    interpolation) — the coarse-bucket window shape: all rows of a key share
    a bucket, one sort + ONE fully segmented-vectorized interpolation pass
    per bucket (no per-key Python loop).

    Exactness note: with int64 inputs (e.g. cents) and dyadic quantile
    fractions (0.25/0.5/0.75) the interpolation arithmetic is exact in
    float64, so the result is bit-identical to DuckDB's quantile_cont — the
    operator is oracle-checkable without rounding."""
    ds, num_buckets = _resolve_buckets(ds, num_buckets, rows_per_bucket)

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df["_b"] = _bucket_of(df[key], num_buckets)
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, value_col], kind="stable")
        vals = g[value_col].to_numpy(dtype=np.float64)
        keys = g[key].to_numpy()
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        lens = np.diff(np.r_[starts, len(keys)])
        out = {key: keys[starts]}
        for q, name in zip(qs, out_names):
            h = (lens - 1) * q
            lo = np.floor(h).astype(np.int64)
            hi = np.ceil(h).astype(np.int64)
            frac = h - lo
            vlo = vals[starts + lo]
            vhi = vals[starts + hi]
            out[name] = vlo + (vhi - vlo) * frac
        return pd.DataFrame(out)

    return (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pandas")
    )


def lead_lag_gaps(
    ds,
    key: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    num_buckets: int | None = None,
    rows_per_bucket: int = 250_000,
):
    """Per-row lead/lag window: for every event, the whole seconds since the
    key's PREVIOUS event and until its NEXT one (null at the edges) — the
    lag()/lead() primitive under the same bucket-by-key partitioning as
    ``sessionize`` (all rows of a key meet in one bucket, one stable sort per
    bucket, vectorized shift). Seconds are floored to int64 so the values are
    exactly SQL's date_diff('second', ...) — no float in the output.

    Returns (tie_col, key, gap_prev_s, gap_next_s).
    """
    ds, num_buckets = _resolve_buckets(ds, num_buckets, rows_per_bucket)

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df["_b"] = _bucket_of(df[key], num_buckets)
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col, tie_col], kind="stable").reset_index(drop=True)
        same_prev = g[key].eq(g[key].shift()).to_numpy()
        same_next = g[key].eq(g[key].shift(-1)).to_numpy()
        us = g[ts_col].astype("datetime64[us]").astype(np.int64).to_numpy()
        prev_s = (us - np.roll(us, 1)) // 1_000_000
        next_s = (np.roll(us, -1) - us) // 1_000_000
        # float64 with NaN at the partition edges — the dtype a nullable
        # BIGINT window lands on in pandas on both engine and oracle sides
        return pd.DataFrame(
            {
                tie_col: g[tie_col].to_numpy(),
                key: g[key].to_numpy(),
                "gap_prev_s": np.where(same_prev, prev_s.astype(np.float64), np.nan),
                "gap_next_s": np.where(same_next, next_s.astype(np.float64), np.nan),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pandas")
    )


def lead_lag_gaps_oracle_sql(
    table: str, key: str = "user_id", ts_col: str = "ts", tie_col: str = "event_id"
) -> str:
    """DuckDB mirror of ``lead_lag_gaps`` (same order, same whole-second
    floor via microsecond epoch arithmetic)."""
    return f"""
        SELECT {tie_col}, {key},
               (epoch_us({ts_col}) - lag(epoch_us({ts_col})) OVER w) // 1000000
                   AS gap_prev_s,
               (lead(epoch_us({ts_col})) OVER w - epoch_us({ts_col})) // 1000000
                   AS gap_next_s
        FROM {table}
        WINDOW w AS (PARTITION BY {key} ORDER BY {ts_col}, {tie_col})
    """


def global_row_number(ds, keys: list[str], descending=None, out_col: str = "rn"):
    """Exact GLOBAL row_number over a distributed sort — the primitive behind
    unpartitioned SQL windows (ntile/percent_rank/global rank), which Ray Data
    lacks. Three steps, driver memory O(blocks):

    1. distributed ``ds.sort(keys)`` (the one unavoidable all-to-all);
    2. one metadata row PER BLOCK (its first sort key + row count) — the
       driver orders the B block rows and prefix-sums the offsets;
    3. broadcast the first-key→offset map; each block emits offset + arange.

    The composite key must be UNIQUE per row (append a unique id as the last
    key — the standard deterministic-window contract); uniqueness is what
    makes block first-keys distinct and the offset lookup exact.
    """
    import json

    import pyarrow as pa
    import ray

    desc = descending if descending is not None else [False] * len(keys)
    s = ds.sort(keys, descending=desc).materialize()

    def _first_key(t: pa.Table) -> str:
        return json.dumps(
            [str(t.column(k)[0].as_py()) for k in keys]
        )

    def block_meta(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            cols = {k: t.column(k) for k in keys}
            cols["_n"] = pa.array([], pa.int64())
            return pa.table(cols)
        cols = {k: t.column(k).slice(0, 1) for k in keys}
        cols["_n"] = pa.array([t.num_rows], pa.int64())
        return pa.table(cols)

    meta = s.map_batches(block_meta, batch_size=None, batch_format="pyarrow").to_pandas()
    meta = meta.sort_values(
        keys, ascending=[not d for d in desc], kind="stable"
    ).reset_index(drop=True)
    offs = meta["_n"].cumsum().shift(fill_value=0)
    lookup = {
        json.dumps([str(v) for v in row]): int(off)
        for row, off in zip(meta[keys].itertuples(index=False, name=None), offs)
    }
    total = int(meta["_n"].sum())
    lookup_ref = ray.put(lookup)

    def number(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        off = ray.get(lookup_ref)[_first_key(t)]
        rn = np.arange(off + 1, off + t.num_rows + 1, dtype=np.int64)
        return t.append_column(out_col, pa.array(rn))

    return s.map_batches(number, batch_size=None, batch_format="pyarrow"), total


def with_ntile(ds, n: int, keys: list[str], descending=None, out_col: str = "tile"):
    """SQL NTILE(n) OVER (ORDER BY keys): the first (total % n) tiles get
    ⌈total/n⌉ rows, the rest ⌊total/n⌋ — computed from the exact global row
    number (same uniqueness contract)."""
    import pyarrow as pa

    numbered, total = global_row_number(ds, keys, descending, out_col="_rn")
    q, r = divmod(total, n)

    def tile(t: pa.Table) -> pa.Table:
        rn = t.column("_rn").to_numpy(zero_copy_only=False)
        big = (q + 1) * r  # rows covered by the r larger tiles
        in_big = rn <= big
        tl = np.where(
            in_big,
            (rn - 1) // max(q + 1, 1) + 1,
            r + (np.maximum(rn - big, 1) - 1) // max(q, 1) + 1,
        ).astype(np.int64)
        return t.drop_columns(["_rn"]).append_column(out_col, pa.array(tl))

    return numbered.map_batches(tile, batch_format="pyarrow", zero_copy_batch=True)


def grouped_row_number(
    ds,
    part_col: str,
    keys: list[str],
    descending=None,
    out_col: str = "rn",
):
    """Exact ``row_number() OVER (PARTITION BY part ORDER BY keys)`` at scale —
    the partitioned generalization of ``global_row_number``. Same three-step
    shape: one distributed sort on ``[part] + keys``, O(blocks × parts-per-
    block) driver metadata (each block's first composite key + its per-part
    segment counts, in block order), broadcast offsets, map-only numbering.
    Driver memory is O(blocks + distinct parts), never O(rows) — unlike a
    ``groupby(part).map_groups`` rank, no single task ever holds a whole
    partition's rows. Same uniqueness contract: ``keys`` must end in a
    per-row-unique id so block first-keys are distinct.

    Returns ``(numbered_ds, totals)`` where ``totals`` maps part → row count
    (tiles and percent ranks need it)."""
    import json

    import pyarrow as pa
    import ray

    desc = [False] + list(descending if descending is not None else [False] * len(keys))
    sort_cols = [part_col] + keys
    s = ds.sort(sort_cols, descending=desc).materialize()

    def _first_key(t: pa.Table) -> str:
        return json.dumps([str(t.column(k)[0].as_py()) for k in sort_cols])

    def block_meta(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            cols = {k: t.column(k) for k in sort_cols}
            cols["_part"] = t.column(part_col)
            cols["_n"] = pa.array([], pa.int64())
            return pa.table(cols)
        parts = t.column(part_col).to_pandas()
        seg = parts.ne(parts.shift()).cumsum()
        counts = parts.groupby(seg, sort=False).agg(["first", "size"])
        cols = {
            k: pa.concat_arrays(
                [t.column(k).slice(0, 1).combine_chunks()] * len(counts)
            )
            for k in sort_cols
        }
        cols["_part"] = pa.array(counts["first"])
        cols["_n"] = pa.array(counts["size"].to_numpy(np.int64))
        return pa.table(cols)

    meta = s.map_batches(block_meta, batch_size=None, batch_format="pyarrow").to_pandas()
    # block order = composite-first-key order (blocks are ranges of the global
    # sort and first keys are distinct); within a block the emitted segment
    # rows are already in order, and a stable sort keeps them there
    meta = meta.sort_values(
        sort_cols, ascending=[not d for d in desc], kind="stable"
    ).reset_index(drop=True)
    running: dict = {}
    offsets = np.empty(len(meta), dtype=np.int64)
    for i, (p, n) in enumerate(zip(meta["_part"], meta["_n"])):
        offsets[i] = running.get(p, 0)
        running[p] = offsets[i] + int(n)
    # first-key → [(part, offset), ...] in block-segment order
    lookup: dict = {}
    for row, off in zip(meta[sort_cols + ["_part"]].itertuples(index=False, name=None), offsets):
        fk = json.dumps([str(v) for v in row[: len(sort_cols)]])
        lookup.setdefault(fk, []).append((row[-1], int(off)))
    totals = {p: int(n) for p, n in running.items()}
    lookup_ref = ray.put(lookup)

    def number(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        segs = ray.get(lookup_ref)[_first_key(t)]
        parts = t.column(part_col).to_pandas()
        change = parts.ne(parts.shift()).to_numpy()
        starts = np.flatnonzero(change)
        seg_off = np.array([o for _, o in segs], dtype=np.int64)
        idx = np.cumsum(change) - 1  # segment index per row
        pos_in_seg = np.arange(t.num_rows, dtype=np.int64) - starts[idx]
        rn = seg_off[idx] + pos_in_seg + 1
        return t.append_column(out_col, pa.array(rn))

    return s.map_batches(number, batch_size=None, batch_format="pyarrow"), totals


def with_grouped_ntile(
    ds,
    n: int,
    part_col: str,
    keys: list[str],
    descending=None,
    out_col: str = "tile",
):
    """``NTILE(n) OVER (PARTITION BY part ORDER BY keys)`` — SQL remainder
    rule per partition (first ``total % n`` tiles get the extra row), computed
    from the exact grouped row number. Broadcast state is O(distinct parts)."""
    import pyarrow as pa
    import ray

    numbered, totals = grouped_row_number(ds, part_col, keys, descending, out_col="_rn")
    qr_ref = ray.put(
        (
            {p: t // n for p, t in totals.items()},
            {p: t % n for p, t in totals.items()},
        )
    )

    def tile(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.drop_columns(["_rn"]).append_column(out_col, pa.array([], pa.int64()))
        q_map, r_map = ray.get(qr_ref)
        parts = t.column(part_col).to_pandas()
        rn = t.column("_rn").to_numpy(zero_copy_only=False)
        q = parts.map(q_map).to_numpy(np.int64)
        r = parts.map(r_map).to_numpy(np.int64)
        big = (q + 1) * r
        in_big = rn <= big
        tl = np.where(
            in_big,
            (rn - 1) // np.maximum(q + 1, 1) + 1,
            r + (np.maximum(rn - big, 1) - 1) // np.maximum(q, 1) + 1,
        ).astype(np.int64)
        return t.drop_columns(["_rn"]).append_column(out_col, pa.array(tl))

    return numbered.map_batches(tile, batch_size=None, batch_format="pyarrow")
