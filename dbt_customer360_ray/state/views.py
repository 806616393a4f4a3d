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

Determinism contract: view events carry a PLACEHOLDER offset; the sink
assigns collision-FREE offsets after routing (``apply(assign_offsets=True)``:
(epoch+1)<<40 | salt<<34 | key rank within the partition group) — unique by
construction, monotone across epochs, and independent of feed row order, so
a re-executed sync writes byte-identical events. (The previous recipe —
(epoch+1)·2^40 + hash(key) % 2^39 — was only collision-free in expectation;
at ~10M events/epoch its birthday collisions made the sink's first-delivery
dedup silently drop distinct events, found by the r5 sf1.5 rehearsal.) Every
sync emits exactly ONE event per view key per epoch, which assign_offsets
requires. The view's LWW ts is a per-epoch watermark (later syncs always
win); the source timestamp rides along as the payload column ``src_ts``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..hashing import stable_hash
from .applier import load_run as _load_run
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
            ev["offset"] = np.int64(0)  # sink-assigned (assign_offsets)
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
        out.append(dst.apply(events, epoch=epoch, assign_offsets=True))
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
                tables = [_load_run(f, schema) for f in paths]
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
            ev["offset"] = np.int64(0)  # sink-assigned (assign_offsets)
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
        out.append(dst.apply(events, epoch=epoch, assign_offsets=True))
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
                tables = [_load_run(f, schema) for f in paths]
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
            ev["offset"] = np.int64(0)  # sink-assigned (assign_offsets)
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
        out.append(dst.apply(events, epoch=epoch, assign_offsets=True))
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


# -- incremental JOIN view: turn-grain left lake ⋈ conv-grain right lake -------

_JOIN_EVENT_SCHEMA = pa.schema(
    [
        ("offset", pa.int64()),
        ("op", pa.string()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("src_ts", pa.timestamp("us")),
        ("title", pa.string()),
        ("status", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)


def sync_join_view(
    left: CdcLake,
    right: CdcLake,
    dst: CdcLake,
    left_cols: tuple = ("role", "text", "tool"),
    right_cols: tuple = ("title", "status"),
) -> list[dict]:
    """Incremental JOIN view maintenance: keep ``dst`` equal to
    ``left LEFT JOIN right ON conv_id`` — every live turn of the turn-grain
    ``left`` lake (e.g. a MultiTableLake's ``transcripts`` table) carrying the
    conv-grain ``right`` lake's current payload (``conv_meta`` title/status,
    null when no meta row) — recomputing ONLY conversations either side's
    change feed touched since the last sync. This is the engine analogue of
    the reference's staged source-join models (user↔organization,
    ``int_customer360__zendesk.sql``) maintained without a full rebuild.

    Classic two-source IVM by dirty keys: Δview ⊆ (ΔL ⋈ R) ∪ (L ⋈ ΔR), and
    because both lakes hash-partition on the join key, each dirty
    conversation's rows live in ONE partition per side — one task per dirty
    LEFT partition reads both sides' runs for its conversations (co-partitioned
    when the lakes share P; a partition-id map otherwise) and emits the fresh
    join rows. No shuffle beyond the tiny dirty-key groupby.

    Progress is tracked as named consumer cursors ON THE VIEW's manifest
    (``src_left``/``src_right`` → last joined source manifest version), so the
    source lakes see pure reads. The view epoch is the cursor-pair sum —
    strictly monotone, so a crash between apply and cursor-ack resumes
    idempotently (the re-derived epoch is already committed and skips).
    Column-mapped (renamed) sources are not supported — sync reads physical
    names. Offsets/ts follow sync_view's determinism contract."""
    for lake in (left, right):
        if lake.manifest.column_mapping is not None:
            raise NotImplementedError(
                "sync_join_view over column-mapped sources is unsupported"
            )
    import pyarrow.compute as pc
    import ray.data  # noqa: F401

    from ..hashing import partition_ids
    from ..schemas import conform_batch
    from .engine import drop_tombstones

    cursors = dst.manifest.consumers
    lv0, rv0 = cursors.get("src_left", 0), cursors.get("src_right", 0)
    lv1, rv1 = left.manifest.version, right.manifest.version
    if (lv0, rv0) == (lv1, rv1):
        return []  # true no-op: nothing committed on either source
    epoch = lv1 + rv1  # strictly monotone across syncs
    out = []
    if not dst.manifest.epoch_committed(epoch):
        feeds = []
        if lv1 > lv0:
            feeds.append(("L", left.change_feed(from_version=lv0, to_version=lv1)))
        if rv1 > rv0:
            feeds.append(("R", right.change_feed(from_version=rv0, to_version=rv1)))

        lm, rm = left.manifest.at_version(lv1), right.manifest.at_version(rv1)
        LP = lm.num_partitions or left.P
        RP = rm.num_partitions or right.P
        lfiles = tuple((pid, tuple(lm.live_files(pid))) for pid in range(LP))
        rfiles = tuple((pid, tuple(rm.live_files(pid))) for pid in range(RP))
        lschema, rschema = lm.schema, rm.schema
        lmode, rmode = left.merge_mode, right.merge_mode
        watermark = _WATERMARK_BASE + np.timedelta64(epoch + 1, "s")

        def to_dirty(t: pa.Table, side: str, P=LP) -> pa.Table:
            """Dirty marks, routed by LEFT-lake pid. Left-side deletes keep
            their turn_idx so the join task can emit view deletes for keys no
            longer live (a delete+reinsert within the window stays a U)."""
            conv = t.column("conv_id")
            is_del = (
                pc.equal(t.column("change_type"), "delete")
                if side == "L"
                else pa.array([False] * t.num_rows)
            )
            turn = (
                t.column("turn_idx")
                if side == "L"
                else pa.nulls(t.num_rows, pa.int32())
            )
            return pa.table(
                {
                    "conv_id": conv,
                    "pid": pa.array(partition_ids(conv, P), pa.int32()),
                    "del_turn": pc.if_else(is_del, turn, pa.nulls(t.num_rows, pa.int32())),
                }
            )

        def _partition_state(paths, schema, mode, keep_convs, empty_cols):
            import pyarrow.parquet as _pq

            if not paths or schema is None:  # empty partition / never-written lake
                return pd.DataFrame(columns=list(empty_cols))
            tables = [_load_run(f, schema) for f in paths]
            st = drop_tombstones(_resolve_latest_mt(pa.concat_tables(tables), mode))
            df = st.to_pandas()
            return df[df["conv_id"].isin(keep_convs)]

        def join_for_dirty(
            grp: pd.DataFrame,
            lf=lfiles, rf=rfiles, ls=lschema, rs=rschema,
            lmode=lmode, rmode=rmode, RP=RP, wm=watermark, ep=epoch,
            lcols=tuple(left_cols), rcols=tuple(right_cols),
        ) -> pa.Table:
            pid = int(grp["pid"].iloc[0])
            dirty = set(pd.unique(grp["conv_id"]))
            lempty = ("conv_id", "turn_idx", "ts", *lcols)
            rempty = ("conv_id", *rcols)
            lstate = _partition_state(dict(lf).get(pid, ()), ls, lmode, dirty, lempty)
            # right side: this group's conversations may map to several right
            # partitions (LP != RP); read exactly the ones needed
            need_rp = set(int(p) for p in partition_ids(sorted(dirty), RP))
            rframes = [
                _partition_state(dict(rf).get(rp, ()), rs, rmode, dirty, rempty)
                for rp in sorted(need_rp)
            ]
            rstate = (
                pd.concat(rframes, ignore_index=True)
                if rframes
                else pd.DataFrame(columns=["conv_id", *rcols])
            )
            joined = lstate.merge(
                rstate[["conv_id", *rcols]], on="conv_id", how="left", sort=False
            )
            ev = pd.DataFrame(
                {
                    "conv_id": joined["conv_id"],
                    "turn_idx": joined["turn_idx"],
                    "src_ts": joined["ts"],
                }
            )
            for c in lcols:
                ev[c] = joined[c] if c in joined.columns else None
            for c in rcols:
                ev[c] = joined[c] if c in joined.columns else None
            ev["op"] = "U"
            # view deletes: left-feed delete keys whose (conv, turn) is no
            # longer live (delete+reinsert in-window stays a plain U above)
            dels = grp.dropna(subset=["del_turn"])[["conv_id", "del_turn"]]
            if len(dels):
                dels = dels.rename(columns={"del_turn": "turn_idx"}).drop_duplicates()
                dels["turn_idx"] = dels["turn_idx"].astype("int32")
                live_idx = pd.MultiIndex.from_arrays(
                    [joined["conv_id"], joined["turn_idx"].astype("int64")]
                )
                del_idx = pd.MultiIndex.from_arrays(
                    [dels["conv_id"], dels["turn_idx"].astype("int64")]
                )
                dead = dels[~del_idx.isin(live_idx)]
                if len(dead):
                    dd = pd.DataFrame({"conv_id": dead["conv_id"],
                                       "turn_idx": dead["turn_idx"]})
                    dd["op"] = "D"
                    ev = pd.concat([ev, dd], ignore_index=True)
            ev["ts"] = pd.Timestamp(wm)
            ev["offset"] = np.int64(0)  # sink-assigned (assign_offsets)
            ev["turn_idx"] = ev["turn_idx"].astype("int32")
            for f in _JOIN_EVENT_SCHEMA:
                if f.name not in ev.columns:
                    ev[f.name] = None
            return pa.Table.from_pandas(
                ev[list(_JOIN_EVENT_SCHEMA.names)],
                schema=_JOIN_EVENT_SCHEMA,
                preserve_index=False,
            )

        marks = [
            f.map_batches(
                lambda t, s=side: to_dirty(t, s),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            for side, f in feeds
        ]
        dirty_ds = marks[0] if len(marks) == 1 else marks[0].union(*marks[1:])
        events = dirty_ds.groupby("pid").map_groups(
            join_for_dirty, batch_format="pandas"
        )
        out.append(dst.apply(events, epoch=epoch, assign_offsets=True))
    dst.manifest.commit_consumer_cursor("src_left", lv1)
    dst.manifest.commit_consumer_cursor("src_right", rv1)
    return out


def _resolve_latest_mt(table: pa.Table, mode: str) -> pa.Table:
    from .engine import _resolve_latest

    return _resolve_latest(table, mode)


def read_join_view(dst: CdcLake):
    """The join view as a clean Dataset (maintenance watermark ``ts``
    dropped; ``src_ts`` is the left row's source timestamp)."""
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "src_ts",
            "title", "status"]
    return dst.read().map_batches(
        lambda t: t.select(cols),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# -- incremental EXACT-DEDUP index: member-grain postings per distinct text ----

_DEDUP_EVENT_SCHEMA = pa.schema(
    [
        ("offset", pa.int64()),
        ("op", pa.string()),
        ("conv_id", pa.string()),   # composite key: md5 \x1f conv \x1f turn
        ("turn_idx", pa.int32()),   # pinned 0 (composite carries the identity)
        ("text_md5", pa.string()),
        ("src_conv", pa.string()),
        ("src_turn", pa.int64()),
        ("ts", pa.timestamp("us")),
    ]
)


def _md5_hex(texts: pd.Series) -> pd.Series:
    import hashlib

    return texts.map(lambda t: hashlib.md5(t.encode("utf-8")).hexdigest())


def sync_dedup_index(
    src: CdcLake,
    dst: CdcLake,
    upto_epoch: int | None = None,
) -> list[dict]:
    """Incrementally-maintained EXACT-DEDUP index: one posting per live
    (distinct text, member row) — the curation keeper table as a maintained
    view instead of a per-run rescan (``stages.dedup.dedup_exact`` is the
    scratch equivalent).

    Pure delta maintenance with TRUE DELETIONS: each source epoch's change
    feed WITH PRE-IMAGES maps to member postings — an insert adds
    (md5(text), conv, turn), a delete removes (md5(old_text), conv, turn), an
    update whose text hash changed does both (hash-unchanged updates cancel
    to nothing). Per-epoch work is O(changed rows), independent of lake size;
    null-text rows carry no posting. Events flow through the exactly-once
    sink (offset/ts determinism per this module's contract), so the index
    inherits replay dedup, crash resume, and time travel."""
    import ray.data

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
        watermark = _WATERMARK_BASE + np.timedelta64(epoch + 1, "s")

        def to_events(t: pa.Table, ep=epoch, wm=watermark) -> pa.Table:
            df = t.to_pandas()
            adds = df[(df["change_type"] != "delete") & df["text"].notna()]
            drops = df[(df["change_type"] != "insert") & df["old_text"].notna()]
            frames = []
            if len(adds):
                frames.append(
                    pd.DataFrame(
                        {
                            "text_md5": _md5_hex(adds["text"]),
                            "src_conv": adds["conv_id"].to_numpy(),
                            "src_turn": adds["turn_idx"].to_numpy("int64"),
                            "sign": 1,
                        }
                    )
                )
            if len(drops):
                frames.append(
                    pd.DataFrame(
                        {
                            "text_md5": _md5_hex(drops["old_text"]),
                            "src_conv": drops["conv_id"].to_numpy(),
                            "src_turn": drops["turn_idx"].to_numpy("int64"),
                            "sign": -1,
                        }
                    )
                )
            if not frames:
                return _DEDUP_EVENT_SCHEMA.empty_table()
            d = pd.concat(frames).groupby(
                ["text_md5", "src_conv", "src_turn"], sort=False, as_index=False
            )["sign"].sum()
            d = d[d["sign"] != 0]  # hash-unchanged updates cancel
            if not len(d):
                return _DEDUP_EVENT_SCHEMA.empty_table()
            key = (
                d["text_md5"]
                + "\x1f"
                + d["src_conv"]
                + "\x1f"
                + d["src_turn"].astype(str)
            )
            dead = d["sign"] < 0
            ev = pd.DataFrame(
                {
                    "offset": np.int64(0),  # sink-assigned (assign_offsets)
                    "op": np.where(dead, "D", "I"),
                    "conv_id": key,
                    "turn_idx": np.int32(0),
                    "text_md5": d["text_md5"].where(~dead, None),
                    "src_conv": d["src_conv"].where(~dead, None),
                    "src_turn": d["src_turn"].astype("Int64").where(~dead, None),
                    "ts": pd.Timestamp(wm),
                }
            )
            return pa.Table.from_pandas(
                ev, schema=_DEDUP_EVENT_SCHEMA, preserve_index=False
            )

        events = feed.map_batches(to_events, batch_format="pyarrow")
        out.append(dst.apply(events, epoch=epoch, assign_offsets=True))
    return out


def read_dedup_keepers(dst: CdcLake, num_buckets: int | None = None):
    """The maintained index as the keeper table: one row per distinct live
    text with its first member (min (src_conv, src_turn)) and copy count —
    what ``SELECT md5(text), min-member, count(*) GROUP BY md5(text)`` derives
    from scratch, served from postings the feed kept in sync. One coarse-
    bucket shuffle of the lean posting rows (``adaptive_buckets`` sizes it);
    the member-grain postings are routed by their composite key, so same-hash
    members may span partitions — the bucket shuffle re-colocates them."""
    from ..blocks import adaptive_buckets, bucket_exchange, counted

    import ray
    import ray.data

    ds, n = counted(dst.read(columns=["text_md5", "src_conv", "src_turn"]))
    B = num_buckets if num_buckets is not None else adaptive_buckets(n)
    # shared house bucket-task exchange (blocks.bucket_exchange) instead of a
    # Dataset groupby — the sort-shuffle machinery's fixed cost dominated
    # this lean read (2.8 s → ~1 s at sf0.1 measured, BASELINE.md)
    _POSTING = pa.schema(
        [("text_md5", pa.string()), ("src_conv", pa.string()),
         ("src_turn", pa.int64())]
    )
    _KEEPER = pa.schema(
        [("text_md5", pa.string()), ("keeper_conv", pa.string()),
         ("keeper_turn", pa.int64()), ("n_copies", pa.int64())]
    )

    def _conform(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "text_md5" not in t.column_names:
            # an empty partition serves a schema-less block — type it
            return _POSTING.empty_table()
        return t.select(["text_md5", "src_conv", "src_turn"]).cast(_POSTING)

    def _bucket_of(t: pa.Table):
        return (
            stable_hash(t.column("text_md5").to_numpy(zero_copy_only=False))
            % np.uint64(B)
        ).astype(np.int64)

    def _keepers(*parts: pa.Table) -> pa.Table:
        # map_batches skips zero-row blocks, so an empty partition's
        # original-schema block can reach the fold untyped — drop it
        live = [p for p in parts if p.num_rows and "text_md5" in p.schema.names]
        if not live:
            return _KEEPER.empty_table()
        grp = pa.concat_tables(live).to_pandas()
        g = grp.sort_values(
            ["text_md5", "src_conv", "src_turn"], kind="stable"
        ).groupby("text_md5", sort=True, as_index=False)
        out = g.first()[["text_md5", "src_conv", "src_turn"]]
        out = out.rename(
            columns={"src_conv": "keeper_conv", "src_turn": "keeper_turn"}
        )
        out["n_copies"] = g.size()["size"].to_numpy("int64")
        out["keeper_turn"] = out["keeper_turn"].astype("int64")
        return pa.Table.from_pandas(out, schema=_KEEPER, preserve_index=False)

    typed = ds.map_batches(_conform, batch_format="pyarrow")
    if not typed.materialize().to_arrow_refs():
        # zero-block lake: return the KEEPER schema, not the posting input's —
        # callers select keeper_conv/keeper_turn/n_copies immediately
        return ray.data.from_arrow(_KEEPER.empty_table())
    return bucket_exchange(typed, B, _bucket_of, _keepers)


_SIG_EVENT_SCHEMA = pa.schema(
    [
        ("offset", pa.int64()),
        ("op", pa.string()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("sig_hex", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)


_HASHER_CACHE: dict = {}


def _cached_hasher(num_perm: int, shingle_n: int):
    """Per-process MinHasher cache: permutation seeds + compiled token regex
    are built once per worker process, not once per group (actor-state rule
    applied to ``map_groups`` kernels, which re-enter per bucket)."""
    from ..stages.dedup import MinHasher

    key = (num_perm, shingle_n)
    h = _HASHER_CACHE.get(key)
    if h is None:
        h = _HASHER_CACHE[key] = MinHasher(num_perm=num_perm, shingle_n=shingle_n)
    return h


def _minhash_hexsigs(texts: np.ndarray, params: dict) -> list[str]:
    """Hex MinHash signature per SFT document (per-worker cached hasher —
    SAME seeds as the scratch pipeline)."""
    hasher = _cached_hasher(params["num_perm"], params["shingle_n"])
    sigs = hasher(
        pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    )["sig"]
    return [s.tobytes().hex() for s in sigs]


_PLANES_CACHE: dict = {}


def _cached_planes(dim: int, out_dim: int, seed: int):
    from ..stages.similarity import rp_sign_planes

    key = (dim, out_dim, seed)
    R = _PLANES_CACHE.get(key)
    if R is None:
        R = _PLANES_CACHE[key] = rp_sign_planes(dim, out_dim, seed)
    return R


def _ann_hexsigs(texts: np.ndarray, params: dict) -> list[str]:
    """Hex embedding sketch per SFT document: hashed-token count vector
    (md5 first-13-hex % dim — the dsir/_permille_sql bucket recipe, so
    DuckDB reproduces it verbatim) projected through the seeded Achlioptas
    sign matrix (``stages.similarity.rp_sign_planes``). All-integer after
    hashing, so the stored sketch is bit-exactly oracle-checkable."""
    import hashlib

    dim, salt = params["dim"], params["salt"]
    R = _cached_planes(dim, params["out_dim"], params["seed"])
    toks_per = [("" if t is None else t).split(" ") for t in texts]
    n = np.fromiter((len(t) for t in toks_per), np.int64, len(toks_per))
    flat = pd.Series([tok for toks in toks_per for tok in toks], dtype=object)
    uniq = pd.unique(flat.to_numpy(dtype=object))
    lut = {
        g: int(hashlib.md5(f"{salt}{g}".encode("utf-8")).hexdigest()[:13], 16)
        % dim
        for g in uniq
    }
    bucket = flat.map(lut).to_numpy(np.int64)
    doc = np.repeat(np.arange(len(texts), dtype=np.int64), n)
    C = np.zeros((len(texts), dim), np.int64)
    np.add.at(C, (doc, bucket), 1)
    proj = C @ R.T
    return [row.astype("<i8").tobytes().hex() for row in proj]


def sync_minhash_index(
    src: CdcLake,
    dst: CdcLake,
    upto_epoch: int | None = None,
    num_perm: int = 64,
    shingle_n: int = 3,
    num_buckets: int | None = None,
) -> list[dict]:
    """Incrementally-maintained MinHash SIGNATURE index: one row per live
    conversation holding its ``num_perm``-permutation signature over the SFT
    assembly (``engine._assemble_partition``'s ``role: text`` document, the
    same text the scratch near-dup pipeline hashes) — LSH candidate
    generation served from stored signatures instead of re-hashing the
    corpus per curation run.

    DIRTY-KEY maintenance (a turn change invalidates its whole conversation's
    signature, so token-count-style pure deltas cannot apply): each source
    epoch's change feed names the dirty conversations; their AS-OF-EPOCH
    turns come back through ``lookup_many(..., epoch=…)`` — point reads of
    O(dirty conversations), never a lake scan. The re-assembly + re-hash
    stays DISTRIBUTED: the lookup result is bucketed by conv_id hash and
    each bucket's ``map_groups`` kernel assembles its conversations and
    MinHashes them with ``stages.dedup.MinHasher`` (SAME seeds as the
    scratch pipeline, so index-served candidates equal scratch candidates
    bit-for-bit). The driver only ever holds the dirty conv_id LIST (lean
    strings, needed to route the point reads) — never conversation text —
    so a backfill/bulk epoch that dirties the whole lake streams through
    workers instead of materializing the corpus in driver memory. Vanished
    conversations surface inside their own bucket: a probe row per dirty id
    rides the same shuffle, and a conv with probes but no turns emits a
    delete. Signatures travel hex-encoded (num_perm × uint64 → fixed-width
    string — LWW/evolution-safe payload). Events flow through the
    exactly-once sink with deterministic offsets/ts, so the index inherits
    replay dedup, crash resume, and time travel."""
    return _sync_conv_sig_index(
        src, dst, _minhash_hexsigs,
        {"num_perm": num_perm, "shingle_n": shingle_n},
        upto_epoch, num_buckets,
    )


def sync_ann_index(
    src: CdcLake,
    dst: CdcLake,
    upto_epoch: int | None = None,
    dim: int = 64,
    out_dim: int = 8,
    seed: int = 29,
    salt: str = "ann",
    num_buckets: int | None = None,
) -> list[dict]:
    """Incrementally-maintained EMBEDDING-SKETCH index — the semantic sibling
    of ``sync_minhash_index`` (r4 VERDICT Next #6): one row per live
    conversation holding a deterministic ``out_dim``-component integer
    embedding of its SFT document, so semantic near-dup curation off the CDC
    lake is served from STORED sketches instead of re-embedding the corpus
    per run.

    The embedding is the house deterministic composition: hashed-token count
    vector (md5-13-hex % ``dim`` — the dsir bucket recipe) projected through
    the seeded Achlioptas sign matrix (the ``rp_sketch`` kernel shape) —
    all-integer after hashing, so the stored sketch is bit-exactly
    reproducible in SQL AND at any cluster size. A deployment with a real
    model swaps ``_ann_hexsigs`` for a batched-inference actor pool; the
    maintenance machinery (dirty-key as-of lookups, bucketed distributed
    re-embed, probe-row deletes, exactly-once sink) is shared and unchanged:
    O(changed conversations) per epoch, never a corpus scan, no text on the
    driver."""
    return _sync_conv_sig_index(
        src, dst, _ann_hexsigs,
        {"dim": dim, "out_dim": out_dim, "seed": seed, "salt": salt},
        upto_epoch, num_buckets,
    )


def _sync_conv_sig_index(
    src: CdcLake,
    dst: CdcLake,
    hexsig_fn,
    params: dict,
    upto_epoch: int | None = None,
    num_buckets: int | None = None,
) -> list[dict]:
    """Shared dirty-key per-conversation signature maintenance loop (see
    ``sync_minhash_index`` for the full design notes): change feed names the
    dirty conversations → as-of point lookups → conv-bucketed distributed
    re-assembly → ``hexsig_fn(texts, params)`` per bucket → upsert/delete
    events through the exactly-once sink. The bucket exchange is the house
    split→fold raw-task pattern (one argsort split per lookup block + one
    fold task per bucket) — the Dataset groupby sort-shuffle's fixed
    aggregator cost dominated this lean exchange (~1 s/epoch at sf0.1,
    same finding as read_dedup_keepers per BASELINE.md)."""
    import ray
    import ray.data

    from ..blocks import adaptive_buckets

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
        dirty = sorted(
            set(feed.select_columns(["conv_id"]).to_pandas()["conv_id"])
        )
        if not dirty:
            continue
        nb = num_buckets or adaptive_buckets(len(dirty), rows_per_bucket=25_000)
        watermark = _WATERMARK_BASE + np.timedelta64(epoch + 1, "s")

        def project(t: pa.Table, nb=nb) -> pa.Table:
            cols = {
                "conv_id": t.column("conv_id"),
                "turn_idx": t.column("turn_idx").cast(pa.int64()),
            }
            for c in ("role", "text"):
                cols[c] = (
                    t.column(c).cast(pa.string())
                    if c in t.column_names
                    else pa.nulls(len(t), pa.string())
                )
            slim = pa.table(cols)
            b = (
                stable_hash(slim.column("conv_id").to_numpy(zero_copy_only=False))
                % np.uint64(nb)
            ).astype(np.int64)
            return slim.append_column("bucket", pa.array(b, pa.int64()))

        # probe rows (turn_idx = -1): one per dirty conv so a conversation
        # whose turns all vanished still reaches its bucket and emits a D
        probes = pa.table(
            {
                "conv_id": pa.array(dirty, pa.string()),
                "turn_idx": pa.array(np.full(len(dirty), -1, np.int64)),
                "role": pa.nulls(len(dirty), pa.string()),
                "text": pa.nulls(len(dirty), pa.string()),
            }
        )
        slim = src.lookup_many(dirty, epoch=epoch).map_batches(
            project, batch_format="pyarrow"
        )
        both = slim.union(
            ray.data.from_arrow(probes).map_batches(
                project, batch_format="pyarrow"
            )
        )

        def _sig_fold(
            *parts: pa.Table, ep=epoch, wm=watermark, fn=hexsig_fn, prm=params
        ) -> pa.Table:
            live = [p for p in parts if p.num_rows]
            if not live:
                return _SIG_EVENT_SCHEMA.empty_table()
            grp = pa.concat_tables(live).to_pandas()
            turns = grp[grp["turn_idx"] >= 0].sort_values(
                ["conv_id", "turn_idx"], kind="stable"
            )
            piece = turns["role"].fillna("") + ": " + turns["text"].fillna("")
            sft = piece.groupby(
                turns["conv_id"].to_numpy(), sort=True
            ).agg("\n".join)
            alive = list(sft.index)
            alive_set = set(alive)
            dead = sorted(set(grp["conv_id"]) - alive_set)
            sig_hex = fn(sft.to_numpy(), prm) if alive else []
            rows = pd.DataFrame(
                {
                    "op": ["I"] * len(alive) + ["D"] * len(dead),
                    "conv_id": alive + dead,
                    "sig_hex": sig_hex + [None] * len(dead),
                }
            )
            rows["offset"] = np.int64(0)  # sink-assigned (assign_offsets)
            rows["turn_idx"] = np.int32(0)
            rows["ts"] = pd.Timestamp(wm)
            return pa.Table.from_pandas(
                rows[[f.name for f in _SIG_EVENT_SCHEMA]],
                schema=_SIG_EVENT_SCHEMA,
                preserve_index=False,
            )

        from ..blocks import bucket_exchange

        events = bucket_exchange(
            both, nb,
            lambda t: t.column("bucket").to_numpy(zero_copy_only=False),
            _sig_fold,
        )
        out.append(
            dst.apply(
                events, epoch=epoch, assign_offsets=True,
                _schema=_SIG_EVENT_SCHEMA,
            )
        )
    return out


def read_minhash_sigs(dst: CdcLake):
    """The maintained signature index as a (conv_id, sig) Dataset — ``sig``
    decoded back to the ``num_perm``-long uint64 array the dedup stages'
    banding/est-filter kernels consume (``minhash_candidates(sigs=…)``)."""

    def decode(df: pd.DataFrame) -> pd.DataFrame:
        sigs = [
            np.frombuffer(bytes.fromhex(h), dtype=np.uint64)
            for h in df["sig_hex"]
        ]
        return pd.DataFrame({"conv_id": df["conv_id"].to_numpy(), "sig": sigs})

    return dst.read(columns=["sig_hex"]).map_batches(decode, batch_format="pandas")


def read_ann_sketch(dst: CdcLake, out_dim: int = 8):
    """The maintained embedding-sketch index as long-format
    ``(conv_id, proj_idx, value)`` rows — the ``rp_sketch`` output shape, so
    downstream ANN/clustering stages (and the SQL oracle) consume it
    unchanged. Map-only decode of the stored hex sketches."""

    def decode(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        vals = (
            np.concatenate(
                [
                    np.frombuffer(bytes.fromhex(h), dtype="<i8")
                    for h in df["sig_hex"]
                ]
            )
            if n
            else np.array([], np.int64)
        )
        return pd.DataFrame(
            {
                "conv_id": np.repeat(df["conv_id"].to_numpy(), out_dim),
                "proj_idx": np.tile(np.arange(out_dim, dtype=np.int64), n),
                "value": vals,
            }
        )

    return dst.read(columns=["sig_hex"]).map_batches(decode, batch_format="pandas")
