"""Incremental materialized views: a derived CdcLake kept in sync from the
source lake's change feed (CDC-out → CDC-in).

The reference rebuilds every downstream table with a full `dbt run`
(/root/reference/dbt_project.yml:11); the engine equivalent maintains a
filtered/projected derived table INCREMENTALLY: each source epoch's
change_feed (a per-partition, shuffle-free snapshot diff) is translated into
upsert/delete events and applied to the view lake through the same
exactly-once manifest sink — so view maintenance inherits replay dedup,
crash resume (a re-sync skips view epochs already committed), time travel,
and metrics for free.

Determinism contract: event offsets are (epoch+1)·2^40 + hash(key) — unique
across epochs by construction, collision-free in expectation within one, and
independent of feed row order, so a re-executed sync writes byte-identical
events. The view's LWW ts is a per-epoch watermark (later syncs always win);
the source timestamp rides along as the payload column ``src_ts``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..hashing import stable_hash
from .engine import CdcLake

_WATERMARK_BASE = np.datetime64("2000-01-01T00:00:00", "us")

_VIEW_EVENT_SCHEMA = pa.schema(
    [
        ("offset", pa.int64()),
        ("op", pa.string()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
        ("src_ts", pa.timestamp("us")),
    ]
)


def sync_view(
    src: CdcLake,
    dst: CdcLake,
    keep,
    upto_epoch: int | None = None,
) -> list[dict]:
    """Advance the view lake ``dst`` through every source epoch committed
    since the last sync (view epoch e mirrors source epoch e). ``keep`` is a
    vectorized predicate ``pd.DataFrame -> bool mask`` over post-image rows;
    rows it rejects — including updates that USED to satisfy it — become
    deletes in the view, so the view always equals ``filter(source state)``.

    Returns the per-epoch apply metrics. Idempotent/resumable: already-
    committed view epochs are skipped by the manifest.
    """
    import ray.data

    last_src = src.manifest.last_epoch if upto_epoch is None else upto_epoch
    out = []
    for epoch in range(dst.manifest.last_epoch + 1, last_src + 1):
        if dst.manifest.epoch_committed(epoch):
            continue
        feed = src.change_feed(
            from_epoch=epoch - 1, to_epoch=epoch
        ) if epoch > 0 else src.change_feed(from_version=0, to_epoch=0)
        watermark = _WATERMARK_BASE + np.timedelta64(epoch + 1, "s")

        def to_events(batch: pd.DataFrame, wm=watermark, ep=epoch) -> pd.DataFrame:
            post = batch[batch["change_type"] != "delete"]
            kept = keep(post).to_numpy() if len(post) else np.array([], bool)
            ev = batch.copy()
            ev["op"] = "D"
            ev.loc[post.index[kept], "op"] = "U"
            key = ev["conv_id"].astype(str) + "\x1f" + ev["turn_idx"].astype(str)
            ev["offset"] = (
                np.int64(ep + 1) * np.int64(1 << 40)
                + (stable_hash(key) % np.uint64(1 << 39)).astype(np.int64)
            )
            ev["src_ts"] = ev["ts"]
            ev["ts"] = pd.Timestamp(wm)
            drop = ev["op"] == "D"
            for c in ("role", "text", "tool"):
                ev.loc[drop, c] = None
            ev.loc[drop, "src_ts"] = pd.NaT
            # explicit Arrow schema: all-null object columns would otherwise
            # break downstream schema inference
            return pa.Table.from_pandas(
                ev[list(_VIEW_EVENT_SCHEMA.names)],
                schema=_VIEW_EVENT_SCHEMA,
                preserve_index=False,
            )

        events = feed.map_batches(to_events, batch_format="pandas")
        out.append(dst.apply(events, epoch=epoch))
    return out


# -- incremental AGGREGATE view: per-conversation headers ----------------------

_HEADER_EVENT_SCHEMA = pa.schema(
    [
        ("offset", pa.int64()),
        ("op", pa.string()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("n_turns", pa.int64()),
        ("n_tool_turns", pa.int64()),
        ("first_ts", pa.timestamp("us")),
        ("last_ts", pa.timestamp("us")),
        ("ts", pa.timestamp("us")),
    ]
)


def sync_headers_view(
    src: CdcLake,
    dst: CdcLake,
    upto_epoch: int | None = None,
) -> list[dict]:
    """Incremental AGGREGATE view maintenance (classic IVM by dirty keys):
    keep a per-conversation header table (n_turns, n_tool_turns, first/last
    ts) in sync with the source lake, recomputing ONLY conversations the
    epoch's change feed touched — per-epoch work is O(changed conversations'
    turns), never O(lake).

    Shape: the change feed (already per-partition, shuffle-free) → distinct
    dirty conv_ids grouped by owner pid → one task per dirty PARTITION reads
    that partition's runs at the epoch snapshot, aggregates just its dirty
    conversations, and emits U events (D when a conversation lost its last
    turn). Events flow through the exactly-once sink, so aggregate
    maintenance inherits replay dedup, crash resume, and time travel. Offsets
    and ts follow sync_view's determinism contract. View key:
    (conv_id, turn_idx=0)."""
    import ray.data

    from ..hashing import partition_ids
    from ..schemas import conform_batch
    from .engine import drop_tombstones

    last_src = src.manifest.last_epoch if upto_epoch is None else upto_epoch
    out = []
    for epoch in range(dst.manifest.last_epoch + 1, last_src + 1):
        if dst.manifest.epoch_committed(epoch):
            continue
        feed = (
            src.change_feed(from_epoch=epoch - 1, to_epoch=epoch)
            if epoch > 0
            else src.change_feed(from_version=0, to_epoch=0)
        )
        m = src._manifest_at(epoch=epoch)
        P = m.num_partitions or src.P
        files_by_pid = tuple(
            (pid, tuple(m.live_files(pid))) for pid in range(P)
        )
        state_schema = m.schema
        watermark = _WATERMARK_BASE + np.timedelta64(epoch + 1, "s")
        merge_mode = src.merge_mode

        def tag_pid(t: pa.Table, P=P) -> pa.Table:
            conv = t.column("conv_id")
            return pa.table(
                {
                    "conv_id": conv,
                    "pid": pa.array(partition_ids(conv, P), pa.int32()),
                }
            )

        def headers_for_dirty(
            grp: pd.DataFrame,
            files=files_by_pid,
            schema=state_schema,
            wm=watermark,
            ep=epoch,
            mode=merge_mode,
        ) -> pa.Table:
            import pyarrow.parquet as _pq

            from .engine import _resolve_latest

            pid = int(grp["pid"].iloc[0])
            dirty = pd.unique(grp["conv_id"])
            paths = dict(files).get(pid, ())
            if paths:
                tables = [conform_batch(_pq.read_table(f), schema) for f in paths]
                state = drop_tombstones(
                    _resolve_latest(pa.concat_tables(tables), mode)
                ).to_pandas()
                state = state[state["conv_id"].isin(set(dirty))]
            else:
                state = pd.DataFrame(columns=["conv_id", "ts", "tool"])
            if "tool" not in state.columns:
                state["tool"] = None
            g = state.groupby("conv_id", sort=True)
            agg = pd.DataFrame(
                {
                    "n_turns": g.size().astype("int64"),
                    "n_tool_turns": g["tool"].count().astype("int64"),
                    "first_ts": g["ts"].min(),
                    "last_ts": g["ts"].max(),
                }
            )
            ev = agg.reindex(pd.Index(sorted(dirty), name="conv_id")).reset_index()
            dead = ev["n_turns"].isna()
            ev["op"] = np.where(dead, "D", "U")
            ev.loc[dead, ["n_turns", "n_tool_turns"]] = None
            ev["turn_idx"] = np.int32(0)
            ev["ts"] = pd.Timestamp(wm)
            ev["offset"] = (
                np.int64(ep + 1) * np.int64(1 << 40)
                + (
                    stable_hash(ev["conv_id"].astype(str).to_numpy())
                    % np.uint64(1 << 39)
                ).astype(np.int64)
            )
            return pa.Table.from_pandas(
                ev[list(_HEADER_EVENT_SCHEMA.names)],
                schema=_HEADER_EVENT_SCHEMA,
                preserve_index=False,
            )

        events = (
            feed.map_batches(tag_pid, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("pid")
            .map_groups(headers_for_dirty, batch_format="pandas")
        )
        out.append(dst.apply(events, epoch=epoch))
    return out


# -- incremental SECONDARY INDEX view: inverted token postings -----------------

TOKEN_RE = r"[a-z0-9]+"

_INDEX_EVENT_SCHEMA = pa.schema(
    [
        ("offset", pa.int64()),
        ("op", pa.string()),
        ("conv_id", pa.string()),  # composite "token\x1fsrc_conv" — collision-free key
        ("turn_idx", pa.int32()),  # always 0; the composite key carries identity
        ("token", pa.string()),
        ("src_conv", pa.string()),
        ("n", pa.int64()),
        ("ts", pa.timestamp("us")),
    ]
)


def _token_counts(frame: pd.DataFrame, text_col: str, sign: int) -> pd.DataFrame:
    """(token, src_conv) occurrence counts × sign for one side of the feed —
    vectorized: one lowered findall pass, explode, groupby size."""
    if not len(frame):
        return pd.DataFrame(columns=["token", "src_conv", "delta"])
    toks = frame[text_col].fillna("").str.lower().str.findall(TOKEN_RE)
    e = pd.DataFrame({"src_conv": frame["conv_id"], "token": toks}).explode("token")
    e = e.dropna(subset=["token"])
    if not len(e):
        return pd.DataFrame(columns=["token", "src_conv", "delta"])
    g = e.groupby(["token", "src_conv"], sort=False).size().astype("int64") * sign
    return g.rename("delta").reset_index()


def sync_token_index(
    src: CdcLake,
    dst: CdcLake,
    upto_epoch: int | None = None,
) -> list[dict]:
    """Incrementally-maintained SECONDARY INDEX (inverted token postings):
    keep a (token, conversation) → occurrence-count table in sync with the
    source lake — the engine analogue of maintaining a derived search table
    downstream of the reference's rebuilt models, without ever re-scanning
    the lake.

    Pure DELTA maintenance (no dirty-key recompute of the source): each
    epoch's change feed WITH PRE-IMAGES yields exact token count deltas —
    +tokens(new text) − tokens(old text) per changed row — which are summed
    per (token, conversation), hash-shuffled ONCE to their index partitions,
    and folded into the stored counts by one task per touched partition
    (new = old + delta; a count reaching 0 deletes the posting). Per-epoch
    work is O(changed rows' tokens + touched partitions' runs), independent
    of lake size. Events flow through the exactly-once sink, so the index
    inherits replay dedup, crash resume, and time travel. Offsets/ts follow
    sync_view's determinism contract; the index key is the composite
    ``token\\x1fsrc_conv`` (turn_idx pinned 0)."""
    import functools

    import ray.data

    from ..hashing import partition_ids, stable_hash
    from ..schemas import conform_batch

    last_src = src.manifest.last_epoch if upto_epoch is None else upto_epoch
    out = []
    for epoch in range(dst.manifest.last_epoch + 1, last_src + 1):
        if dst.manifest.epoch_committed(epoch):
            continue
        feed = (
            src.change_feed(from_epoch=epoch - 1, to_epoch=epoch, include_preimage=True)
            if epoch > 0
            else src.change_feed(from_version=0, to_epoch=0, include_preimage=True)
        )
        P = dst.P
        files_by_pid = tuple(
            (pid, tuple(dst.manifest.live_files(pid))) for pid in range(P)
        )
        dst_schema = dst.manifest.schema  # None on the first epoch
        watermark = _WATERMARK_BASE + np.timedelta64(epoch + 1, "s")
        merge_mode = dst.merge_mode

        def to_deltas(t: pa.Table, P=P) -> pa.Table:
            df = t.to_pandas()
            new = df[df["change_type"] != "delete"]
            old = df[df["change_type"] != "insert"]
            d = pd.concat(
                [_token_counts(new, "text", 1), _token_counts(old, "old_text", -1)]
            )
            if not len(d):
                return pa.table(
                    {
                        "key": pa.array([], pa.string()),
                        "token": pa.array([], pa.string()),
                        "src_conv": pa.array([], pa.string()),
                        "delta": pa.array([], pa.int64()),
                        "pid": pa.array([], pa.int32()),
                    }
                )
            d = d.groupby(["token", "src_conv"], sort=False, as_index=False)["delta"].sum()
            d = d[d["delta"] != 0]
            key = d["token"] + "\x1f" + d["src_conv"]
            return pa.table(
                {
                    "key": pa.array(key, pa.string()),
                    "token": pa.array(d["token"], pa.string()),
                    "src_conv": pa.array(d["src_conv"], pa.string()),
                    "delta": pa.array(d["delta"].to_numpy(), pa.int64()),
                    "pid": pa.array(partition_ids(key.to_numpy(), P), pa.int32()),
                }
            )

        def fold_partition(
            grp: pd.DataFrame,
            files=files_by_pid,
            schema=dst_schema,
            wm=watermark,
            ep=epoch,
            mode=merge_mode,
        ) -> pa.Table:
            import pyarrow.parquet as _pq

            from .engine import _resolve_latest, drop_tombstones

            pid = int(grp["pid"].iloc[0])
            # a key's deltas may span feed batches: final per-epoch sum here
            d = grp.groupby(["key", "token", "src_conv"], sort=True, as_index=False)[
                "delta"
            ].sum()
            d = d[d["delta"] != 0]
            paths = dict(files).get(pid, ()) if schema is not None else ()
            if paths:
                tables = [conform_batch(_pq.read_table(f), schema) for f in paths]
                state = drop_tombstones(
                    _resolve_latest(pa.concat_tables(tables), mode)
                ).to_pandas()
                cur = state.set_index("conv_id")["n"]
                old_n = cur.reindex(d["key"]).fillna(0).to_numpy(dtype="int64")
            else:
                old_n = np.zeros(len(d), dtype="int64")
            new_n = old_n + d["delta"].to_numpy()
            if (new_n < 0).any():
                raise ValueError("token index: negative posting count — feed skew?")
            ev = pd.DataFrame(
                {
                    "conv_id": d["key"],
                    "token": d["token"],
                    "src_conv": d["src_conv"],
                    "n": new_n,
                }
            )
            # unchanged counts (delta summed to 0 already dropped) always emit
            ev["op"] = np.where(new_n > 0, "U", "D")
            dead = ev["op"] == "D"
            ev.loc[dead, ["token", "src_conv"]] = None
            ev["n"] = ev["n"].astype("int64")
            ev.loc[dead, "n"] = None
            ev["turn_idx"] = np.int32(0)
            ev["ts"] = pd.Timestamp(wm)
            ev["offset"] = (
                np.int64(ep + 1) * np.int64(1 << 40)
                + (
                    stable_hash(ev["conv_id"].astype(str).to_numpy())
                    % np.uint64(1 << 39)
                ).astype(np.int64)
            )
            return pa.Table.from_pandas(
                ev[list(_INDEX_EVENT_SCHEMA.names)],
                schema=_INDEX_EVENT_SCHEMA,
                preserve_index=False,
            )

        events = (
            feed.map_batches(to_deltas, batch_format="pyarrow")
            .groupby("pid")
            .map_groups(fold_partition, batch_format="pandas")
        )
        out.append(dst.apply(events, epoch=epoch))
    return out


def read_token_index(dst: CdcLake):
    """The index as a clean (token, conv_id, n) Dataset (composite key and
    internals dropped)."""
    return dst.read().map_batches(
        lambda t: t.select(["token", "src_conv", "n"]).rename_columns(
            ["token", "conv_id", "n"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
