"""CdcLake — the Ray-Data-native CDC/upsert engine.

Replaces the reference's full-refresh ``dbt run`` materialization
(/root/reference/dbt_project.yml:11) with incremental, exactly-once epoch
application per BASELINE.json's north rule:

    read changes (Dataset) → conform/evolve schema (map_batches, zero-copy Arrow)
    → route: pid = stable_hash(conv_id) % P, hot keys salted (map_batches)
    → hash shuffle: groupby("pid") → EpochApplier per partition (LWW + sorted
      runs on disk) → driver commits the manifest atomically.

Everything streams: the only driver-side materialization is the per-partition
stats table (P rows). State lives in committed parquet runs + the manifest, so
any task retry or process crash replays idempotently (deterministic file paths,
offset-checkpoint dedup, manifest as the single commit point).
"""

from __future__ import annotations

import functools
import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.lww import drop_tombstones, lww_latest, patch_collapse, patch_latest
from ..schemas import KEY_COLUMNS, conform_batch, evolve_schema, rename_columns_map
from .applier import EpochApplier, apply_dv, atomic_parquet, load_run, load_run_key_filtered, run_ts_stats
from .manifest import Manifest, _atomic_write
from .router import AssignPartitions, estimate_hot_keys


def _collapse_runs(table: pa.Table, merge_mode: str = "lww") -> pa.Table:
    """Storage-side collapse (runs keep tombstones): row-level LWW winners, or
    in patch mode the minimal event set with the same merge-at-read."""
    return patch_collapse(table) if merge_mode == "patch" else lww_latest(table)


def _resolve_latest(table: pa.Table, merge_mode: str = "lww") -> pa.Table:
    """Read-side resolve to ONE row per key (op column kept for
    drop_tombstones): row-level LWW, or column-level LWW in patch mode."""
    return patch_latest(table) if merge_mode == "patch" else lww_latest(table)

REQUIRED_EVENT_COLUMNS = ("offset", "op", "conv_id", "turn_idx", "ts")
INTERNAL_COLUMNS = ("op", "offset", "pid")
# columns column-mapping evolution must not touch: keys (routing/LWW), the
# LWW clock, and the engine internals
_NO_MAP_COLUMNS = frozenset({"conv_id", "turn_idx", "ts", "op", "offset", "pid"})


def _mapped_public(state_schema: pa.Schema, cm: dict | None):
    """Public read projection of a snapshot under its (optional) column
    mapping: ``(physical select list, logical output names)``. Without a
    mapping both are the plain public column list (identity). With one,
    physicals whose logical was DROPPED are excluded and the rest are renamed
    physical → logical at the output boundary."""
    phys_all = [f.name for f in state_schema if f.name not in INTERNAL_COLUMNS]
    if not cm:
        return phys_all, phys_all
    phys2log = {p: l for l, p in cm["logical"].items()}
    phys = [n for n in phys_all if n in _NO_MAP_COLUMNS or n in phys2log]
    return phys, [phys2log.get(n, n) for n in phys]


def _select_renamed(t: pa.Table, phys, logical) -> pa.Table:
    """Project to ``phys`` (in order) and present as ``logical`` (zero-copy)."""
    t = t.select(list(phys))
    return t.rename_columns(list(logical)) if list(phys) != list(logical) else t


def _ts_to_us(ts) -> int | None:
    """Normalize a user-facing time bound (str / datetime / np.datetime64 /
    pd.Timestamp) to epoch microseconds — the unit of the lake's ``ts`` column
    and of the manifest's per-run stats."""
    if ts is None:
        return None
    import pandas as pd

    return int(pd.Timestamp(ts).value // 1_000)


def _apply_group(group: pa.Table, applier: EpochApplier) -> pa.Table:
    return applier(group)


def _make_slots(P: int, S: int, hot_pids: set[int]) -> tuple[list, "np.ndarray"]:
    """Enumerate active apply slots and the skey→slot lookup table.

    Cold partitions get one slot; hot partitions get S slots (one per salt) so a
    skewed partition's apply work fans out across workers. Slot enumeration is
    deterministic, so replays schedule identically. The last slot is the
    dead-letter group (skey = P*S, pid -1): malformed rows routed there are
    written under ``deadletter/`` instead of applied (its task is a no-op on
    clean streams — ``_apply_slot`` short-circuits empty chunk lists).
    """
    import numpy as np

    slots: list[tuple[int, int]] = []
    slot_of_skey = np.zeros(P * S + 1, dtype=np.int64)
    for p in range(P):
        base = len(slots)
        slots.append((p, 0))
        slot_of_skey[p * S : (p + 1) * S] = base
        if p in hot_pids and S > 1:
            for s in range(1, S):
                slot_of_skey[p * S + s] = len(slots)
                slots.append((p, s))
    slot_of_skey[P * S] = len(slots)
    slots.append((-1, 0))
    return slots, slot_of_skey


def _cluster_partition(
    lake_dir: str,
    pid: int,
    files: list[str],
    state_schema: pa.Schema,
    version: int,
    merge_mode: str,
    rows_per_file: int,
    bits: int,
) -> dict | None:
    """One-partition OPTIMIZE ZORDER task: merge the partition's live runs
    (exactly like a full compaction), order the state rows by the Morton key
    of (hash(conv_id), ts), and rewrite them as MULTIPLE run files of at most
    ``rows_per_file`` rows. Each output file is both KEY-local and TIME-local,
    so the per-run ts stats and bloom sidecars the lake already records turn
    into effective intra-partition data skipping: a ``since_ts`` read prunes
    the old-time files, a point lookup's bloom probe prunes the
    other-conversations files (``explain_read`` shows both). Content is
    untouched — LWW merge-at-read is indifferent to how state rows are split
    across runs. No shuffle: clustering is per-partition, one task each."""
    import numpy as np

    from ..hashing import stable_hash
    from ..stages.layout import _interleave, _quantize

    tables = [load_run(f, state_schema) for f in files]
    merged = _collapse_runs(pa.concat_tables(tables), merge_mode)
    if merged.num_rows == 0:
        return None
    a = (stable_hash(merged.column("conv_id")) >> np.uint64(1)).astype(np.int64)
    b = merged.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    a_lo, b_lo = int(a.min()), int(b.min())
    a_step = ((int(a.max()) - a_lo) >> bits) + 1
    b_step = ((int(b.max()) - b_lo) >> bits) + 1
    z = _interleave(_quantize(a, a_lo, a_step), _quantize(b, b_lo, b_step), bits)
    conv = merged.column("conv_id").to_numpy(zero_copy_only=False)
    turn = merged.column("turn_idx").to_numpy(zero_copy_only=False)
    order = np.lexsort((turn, conv, z))
    merged = merged.take(pa.array(order))
    runs = []
    for j, start in enumerate(range(0, merged.num_rows, rows_per_file)):
        chunk = merged.slice(start, rows_per_file)
        path = os.path.join(
            "data", f"part-{pid:05d}", f"zord-v{version:08d}-{j:04d}.parquet"
        )
        atomic_parquet(chunk, os.path.join(lake_dir, path))
        tomb = int(pc.sum(pc.equal(chunk.column("op"), "D")).as_py() or 0)
        runs.append(
            {"path": path, "rows": chunk.num_rows, "tombstones": tomb}
            | dict(run_ts_stats(chunk))
        )
    return {"pid": pid, "runs": runs}


def _compact_partition(
    lake_dir: str,
    pid: int,
    files: list[str],
    state_schema: pa.Schema,
    version: int,
    prefix: str = "base",
    merge_mode: str = "lww",
    tombstone_horizon_us: int | None = None,
) -> dict:
    """One-partition compaction task: read the selected runs (conforming old
    schemas), LWW-merge, write one merged run at a deterministic versioned
    path (``base-v…`` for full merges, ``tier-v…`` for L0→L1 merges).

    ``tombstone_horizon_us`` (FULL merges on lateness-bounded lakes only):
    physically drop tombstones with ts below the horizon (watermark −
    allowed_lateness) — no run older than this merge survives for them to
    mask, a redelivery of the deleted key's events is caught by the offset
    checkpoint, and a NEW event old enough to resurrect the key would be
    quarantined as too_late. The RocksDB/Cassandra gc_grace rule."""
    tables = [load_run(f, state_schema) for f in files]
    merged = _collapse_runs(pa.concat_tables(tables), merge_mode)
    if tombstone_horizon_us is not None and prefix == "base":
        gc = pc.and_(
            pc.equal(merged.column("op"), "D"),
            pc.less(
                merged.column("ts").cast(pa.int64()), tombstone_horizon_us
            ),
        )
        merged = merged.filter(pc.invert(pc.fill_null(gc, False)))
    path = os.path.join("data", f"part-{pid:05d}", f"{prefix}-v{version:08d}.parquet")
    atomic_parquet(merged, os.path.join(lake_dir, path))
    tomb = int(pc.sum(pc.equal(merged.column("op"), "D")).as_py() or 0)
    return {
        "pid": pid,
        "rows": merged.num_rows,
        "tombstones": tomb,
        "path": path,
        "ts_stats": run_ts_stats(merged),
    }


def _drop_purged(t: pa.Table, purged: tuple) -> pa.Table:
    """Filter erased conversations (``purge_key``) out of any table that
    carries ``conv_id`` — applied in EVERY read kernel, so purged keys are
    unreadable even from historical files that still hold their bytes."""
    if not purged or "conv_id" not in t.column_names or not t.num_rows:
        return t
    hit = pc.fill_null(
        pc.is_in(t.column("conv_id"), value_set=pa.array(list(purged), pa.string())),
        False,
    )
    return t.filter(pc.invert(hit))


def _diff_partition(
    files_a: list[str],
    files_b: list[str],
    state_schema: pa.Schema,
    public_cols: list[str],
    preimage: bool = False,
    merge_mode: str = "lww",
    purged: tuple = (),
    purged_b: tuple | None = None,
) -> pa.Table:
    """change_feed kernel for one partition: LWW-merge each snapshot's runs
    (both conformed to the TO-version schema), then classify per KEY_COLUMNS
    key — right-only → insert, left-only → delete (null post-image payload),
    value change (null-safe) → update with post-image. With ``preimage`` the
    FROM side's payload rides along as ``old_*`` columns (Delta CDF's
    update_preimage, flattened onto the same row — null for inserts). Runs as
    one plain Ray task per partition; both snapshots use the same partitioner
    so no key can cross partitions between versions."""
    import numpy as np
    import pandas as pd  # noqa: F401 — merge kernel

    def _state(files: list[str], side_purged: tuple):
        if not files:
            return state_schema.empty_table()
        tables = [load_run(f, state_schema) for f in files]
        return _drop_purged(
            drop_tombstones(_resolve_latest(pa.concat_tables(tables), merge_mode)),
            side_purged,
        )

    a = _state(files_a, purged).select(public_cols).to_pandas()
    b = _state(
        files_b, purged if purged_b is None else purged_b
    ).select(public_cols).to_pandas()
    payload = [c for c in public_cols if c not in KEY_COLUMNS]
    m = a.merge(b, on=KEY_COLUMNS, how="outer", suffixes=("__a", ""), indicator=True)
    ins = (m["_merge"] == "right_only").to_numpy()
    dele = (m["_merge"] == "left_only").to_numpy()
    changed = np.zeros(len(m), dtype=bool)
    for c in payload:
        x, y = m[f"{c}__a"], m[c]
        changed |= ((x != y) & ~(x.isna() & y.isna())).to_numpy()
    upd = (m["_merge"] == "both").to_numpy() & changed
    keep = ins | dele | upd
    pre_cols = [f"{c}__a" for c in payload] if preimage else []
    out = m.loc[keep, KEY_COLUMNS + payload + pre_cols].copy()
    out.insert(
        0,
        "change_type",
        np.where(ins[keep], "insert", np.where(upd[keep], "update", "delete")),
    )
    for c in payload:  # deletes carry a null post-image
        out.loc[out["change_type"] == "delete", c] = None
    out = out.rename(columns={f"{c}__a": f"old_{c}" for c in payload})
    out = out.sort_values(KEY_COLUMNS, kind="stable")
    out_schema = pa.schema(
        [pa.field("change_type", pa.string())]
        + [state_schema.field(c) for c in public_cols]
        + [
            pa.field(f"old_{c}", state_schema.field(c).type)
            for c in payload
            if preimage
        ]
    )
    return pa.Table.from_pandas(out, schema=out_schema, preserve_index=False)


def _diff_count_partition(*args, **kwargs) -> int:
    """repair_from probe: the diff row count for one partition — the driver
    needs only 'differs or not' per partition, never the rows themselves."""
    return _diff_partition(*args, **kwargs).num_rows


def _reshard_partition(
    group: pa.Table, lake_dir: str, epoch: int, merge_mode: str = "lww"
) -> pa.Table:
    """reshard kernel for one NEW partition: every (conv_id, turn_idx) key's
    full retained history (winners per old run, INCLUDING tombstones — late
    events must stay unable to resurrect deletes after the rewrite) meets here
    via the new-pid shuffle; LWW-merge it and write one base run."""
    import numpy as np

    pid = int(group.column("pid")[0].as_py())
    merged = _collapse_runs(group, merge_mode)
    path = os.path.join("data", f"part-{pid:05d}", f"run-{epoch:06d}.parquet")
    atomic_parquet(merged, os.path.join(lake_dir, path))
    tomb = int(pc.sum(pc.equal(merged.column("op"), "D")).as_py() or 0)
    return pa.table(
        {
            "pid": pa.array([pid], pa.int32()),
            "rows": pa.array([merged.num_rows], pa.int64()),
            "tombstones": pa.array([tomb], pa.int64()),
            "path": pa.array([path], pa.string()),
            "ts_stats_json": pa.array([json.dumps(run_ts_stats(merged))], pa.string()),
        }
    )


SENTINEL_TURN = -1  # marks injected per-partition presence rows in snapshot_sync


def _snapshot_diff_partition(
    group: pa.Table,
    files_by_pid: tuple,  # ((pid, (file, ...)), ...) — hashable for Ray's fn cache
    state_schema: pa.Schema,
    sync_ts_us: int,
    base_offset: int,
    merge_mode: str = "lww",
) -> pa.Table:
    """snapshot_sync kernel for one partition: LWW-merge the partition's
    committed runs, diff them against this partition's snapshot slice, and emit
    the MINIMAL change events — 'I' for snapshot-only keys, 'D' tombstones for
    lake-only keys, 'U' where any payload column differs (null-safe); identical
    rows emit NOTHING, so an idempotent re-sync is a zero-event epoch. Offsets
    are ``base_offset + rank(key)`` (deterministic), ts is the sync timestamp
    (validated by the caller to exceed every committed ts, so the events always
    win LWW). A sentinel row per partition (turn_idx = -1) guarantees every
    partition reaches this kernel even when its snapshot slice is empty — the
    all-rows-deleted case."""
    import numpy as np
    import pandas as pd

    pid = int(group.column("pid")[0].as_py())
    group = group.filter(pc.not_equal(group.column("turn_idx"), SENTINEL_TURN))
    payload = [
        f.name
        for f in state_schema
        if f.name not in KEY_COLUMNS and f.name not in INTERNAL_COLUMNS and f.name != "ts"
    ]
    event_schema = pa.schema([f for f in state_schema if f.name != "pid"])

    files = dict(files_by_pid).get(pid, ())
    if files:
        tables = [load_run(f, state_schema) for f in files]
        state = drop_tombstones(_resolve_latest(pa.concat_tables(tables), merge_mode))
        lake = state.select(list(KEY_COLUMNS) + payload).to_pandas()
    else:
        lake = pd.DataFrame(columns=list(KEY_COLUMNS) + payload)

    snap = group.select(list(KEY_COLUMNS) + payload).to_pandas()
    if snap.duplicated(list(KEY_COLUMNS)).any():
        raise ValueError("snapshot_sync: snapshot has duplicate (conv_id, turn_idx) keys")

    m = lake.merge(
        snap, on=list(KEY_COLUMNS), how="outer", suffixes=("__l", ""), indicator=True
    )
    ins = (m["_merge"] == "right_only").to_numpy()
    dele = (m["_merge"] == "left_only").to_numpy()
    changed = np.zeros(len(m), dtype=bool)
    for c in payload:
        x, y = m[f"{c}__l"], m[c]
        changed |= ((x != y) & ~(x.isna() & y.isna())).to_numpy()
    upd = (m["_merge"] == "both").to_numpy() & changed
    keep = ins | dele | upd
    out = m.loc[keep, list(KEY_COLUMNS) + payload].copy()
    out.insert(0, "op", np.where(ins[keep], "I", np.where(upd[keep], "U", "D")))
    for c in payload:  # tombstones carry a null payload
        out.loc[out["op"] == "D", c] = None
    out = out.sort_values(list(KEY_COLUMNS), kind="stable").reset_index(drop=True)
    out.insert(0, "offset", base_offset + np.arange(len(out), dtype=np.int64))
    out["ts"] = pd.Timestamp(sync_ts_us, unit="us")
    return pa.Table.from_pandas(out, preserve_index=False).select(
        [f.name for f in event_schema]
    ).cast(event_schema)


def _merge_into_partition(
    group: pa.Table,
    files_by_pid: tuple,
    state_schema: pa.Schema,
    sync_ts_us: int,
    base_offset: int,
    when_matched: str = "update",
    when_not_matched: str = "insert",
    matched_predicate=None,
    merge_mode: str = "lww",
) -> pa.Table:
    """merge_into kernel for one partition: LWW-merge the partition's committed
    runs, LEFT-join this partition's source slice against them, and emit the
    minimal change events per the merge clauses. Unlike
    ``_snapshot_diff_partition`` only SOURCE keys can produce events — lake
    keys absent from the source are untouched (the defining difference between
    MERGE INTO and a full-snapshot re-sync). The source may carry a SUBSET of
    payload columns: updates splice source values into the lake row's full
    image (unprovided columns keep their lake value), inserts null-fill them.
    ``matched_predicate`` (optional) gates the matched clause; it receives a
    DataFrame with ``s_<col>`` source columns, ``t_<col>`` lake columns, and
    the key columns, and returns a boolean mask. Idempotent by construction:
    an update whose spliced image equals the lake row emits nothing."""
    import numpy as np
    import pandas as pd

    event_schema = pa.schema([f for f in state_schema if f.name != "pid"])
    if group.num_rows == 0:
        return event_schema.empty_table()
    pid = int(group.column("pid")[0].as_py())
    payload = [
        f.name
        for f in state_schema
        if f.name not in KEY_COLUMNS and f.name not in INTERNAL_COLUMNS and f.name != "ts"
    ]
    src_payload = [c for c in group.column_names if c not in KEY_COLUMNS and c != "pid"]

    files = dict(files_by_pid).get(pid, ())
    if files:
        tables = [load_run(f, state_schema) for f in files]
        state = drop_tombstones(_resolve_latest(pa.concat_tables(tables), merge_mode))
        lake = state.select(list(KEY_COLUMNS) + payload).to_pandas()
    else:
        lake = pd.DataFrame(columns=list(KEY_COLUMNS) + payload)

    src = group.select(list(KEY_COLUMNS) + src_payload).to_pandas()
    if src.duplicated(list(KEY_COLUMNS)).any():
        raise ValueError("merge_into: source has duplicate (conv_id, turn_idx) keys")

    m = src.merge(
        lake, on=list(KEY_COLUMNS), how="left", suffixes=("", "__t"), indicator=True
    )
    # lake's value for column c: suffixed iff the source also carries c
    def t_col(c):
        return m[f"{c}__t"] if c in src_payload else m[c]

    matched = (m["_merge"] == "both").to_numpy()
    if matched_predicate is not None:
        pred_df = pd.DataFrame(
            {
                **{k: m[k] for k in KEY_COLUMNS},
                **{f"s_{c}": m[c] for c in src_payload},
                **{f"t_{c}": t_col(c) for c in payload},
            }
        )
        matched &= np.asarray(matched_predicate(pred_df), dtype=bool)

    changed = np.zeros(len(m), dtype=bool)
    for c in src_payload:  # only provided columns can change the image
        x, y = t_col(c), m[c]
        changed |= ((x != y) & ~(x.isna() & y.isna())).to_numpy()
    upd = matched & changed if when_matched == "update" else np.zeros(len(m), bool)
    dele = matched if when_matched == "delete" else np.zeros(len(m), bool)
    ins = (
        (m["_merge"] == "left_only").to_numpy()
        if when_not_matched == "insert"
        else np.zeros(len(m), bool)
    )
    keep = ins | dele | upd
    out = pd.DataFrame({k: m.loc[keep, k] for k in KEY_COLUMNS})
    ins_k, upd_k = ins[keep], upd[keep]
    for c in payload:
        if c in src_payload:
            # updates and inserts both take the source value
            out[c] = m.loc[keep, c]
        else:
            # unprovided: lake value on update, null on insert
            vals = t_col(c)[keep].copy()
            vals[ins_k] = None
            out[c] = vals
    out.insert(0, "op", np.where(ins_k, "I", np.where(upd_k, "U", "D")))
    for c in payload:  # tombstones carry a null payload
        out.loc[out["op"] == "D", c] = None
    out = out.sort_values(list(KEY_COLUMNS), kind="stable").reset_index(drop=True)
    out.insert(0, "offset", base_offset + np.arange(len(out), dtype=np.int64))
    out["ts"] = pd.Timestamp(sync_ts_us, unit="us")
    return (
        pa.Table.from_pandas(out, preserve_index=False)
        .select([f.name for f in event_schema])
        .cast(event_schema)
    )


def _expire_partition(
    files: list[str],
    state_schema: pa.Schema,
    cutoff_us: int,
    sync_ts_us: int,
    base_offset: int,
    merge_mode: str = "lww",
) -> pa.Table:
    """expire_rows kernel for one partition: LWW-merge the runs and emit a 'D'
    tombstone for every LIVE key whose winning ts is below the cutoff — row
    TTL / retention, expressed as ordinary change events so the deletion is
    change-feed-visible, time-travelable, and exactly-once like any epoch.
    No shuffle: the scan stays on the partition that owns the keys."""
    import numpy as np
    import pandas as pd

    event_schema = pa.schema([f for f in state_schema if f.name != "pid"])
    payload = [
        f.name
        for f in state_schema
        if f.name not in KEY_COLUMNS and f.name not in INTERNAL_COLUMNS and f.name != "ts"
    ]
    if not files:
        return event_schema.empty_table()
    tables = [load_run(f, state_schema) for f in files]
    state = drop_tombstones(_resolve_latest(pa.concat_tables(tables), merge_mode))
    old = state.filter(pc.less(state.column("ts"), pa.scalar(cutoff_us, pa.timestamp("us"))))
    if old.num_rows == 0:
        return event_schema.empty_table()
    out = old.select(list(KEY_COLUMNS)).to_pandas()
    out = out.sort_values(list(KEY_COLUMNS), kind="stable").reset_index(drop=True)
    out.insert(0, "op", "D")
    for c in payload:
        out[c] = None
    out.insert(0, "offset", base_offset + np.arange(len(out), dtype=np.int64))
    out["ts"] = pd.Timestamp(sync_ts_us, unit="us")
    return (
        pa.Table.from_pandas(out, preserve_index=False)
        .select([f.name for f in event_schema])
        .cast(event_schema)
    )


def _backfill_partition(
    runs: tuple, lake_dir: str, specs: tuple, version: int
) -> dict:
    """backfill_computed kernel for one partition: rewrite every live run
    whose stored computed columns differ from (or predate) the declared
    derivations — GENERATED ALWAYS semantics, so recomputing is idempotent
    and a run already carrying correct values is skipped without a write.
    Tombstones/offsets/ts are byte-preserved; only the computed columns
    change. No shuffle — each run rewrites in place under a new name."""
    from .applier import atomic_parquet, run_ts_stats
    from .computed import apply_computed

    new_runs: list[dict] = []
    replaced: list[str] = []
    for run in runs:
        ap = os.path.join(lake_dir, run["path"])
        # deletion-vector'd runs fold their mask into the rewrite (the fresh
        # file has no sidecar, so carrying masked rows would resurrect them);
        # if the run ends up skipped it keeps its old name + sidecar — fine
        t = load_run(ap)
        t2 = apply_computed(t, list(specs))
        if t2.schema == t.schema and t2.equals(t):
            continue  # already backfilled (or ingested post-declaration)
        rel = _rehome(run["path"], f"bf{version}")
        atomic_parquet(t2, os.path.join(lake_dir, rel))
        replaced.append(run["path"])
        tomb = int(pc.sum(pc.equal(t2.column("op"), "D")).as_py() or 0)
        new_runs.append(
            {"path": rel, "rows": t2.num_rows, "tombstones": tomb}
            | run_ts_stats(t2)
        )
    return {"new_runs": new_runs, "replaced": replaced}


def _sft_jsonl_partition(
    files: list[str], state_schema: pa.Schema, path: str,
    merge_mode: str = "lww", purged: tuple = (),
) -> int:
    """export_sft_jsonl kernel for one partition: assemble the partition's
    conversations (the ``_assemble_partition`` kernel) and write one JSONL
    shard atomically (tmp → rename). Returns the shard's row count."""
    import pandas as pd

    t = _assemble_partition(files, state_schema, merge_mode, purged)
    df = t.to_pandas().sort_values("conv_id", kind="stable")
    tmp = f"{path}.tmp.{os.getpid()}"
    df.to_json(tmp, orient="records", lines=True, force_ascii=True)
    if df.empty:  # to_json writes nothing for an empty frame — pin the file
        open(tmp, "w").close()
    os.replace(tmp, path)
    return int(len(df))


def _audit_partition(
    files: list[str], state_schema: pa.Schema, specs: tuple,
    merge_mode: str = "lww", purged: tuple = (),
) -> pa.Table:
    """audit_state kernel for one partition: LWW-merge the runs and count the
    live rows that DEFINITIVELY violate each constraint-shaped audit spec
    (CHECK semantics — null passes), one count per spec. No shuffle; the
    driver sums P small tables."""
    from .constraints import _predicate_false

    out_schema = pa.schema([("name", pa.string()), ("violations", pa.int64())])
    names = [s["name"] for s in specs]
    if not files:
        return pa.table({"name": names, "violations": [0] * len(names)}, schema=out_schema)
    tables = [load_run(f, state_schema) for f in files]
    state = _drop_purged(
        drop_tombstones(_resolve_latest(pa.concat_tables(tables), merge_mode)),
        purged,
    )
    counts = []
    for spec in specs:
        col = state.column(spec["column"])
        if spec["op"] == "not_null":
            bad = pc.is_null(col)
        else:
            bad = _predicate_false(col, spec)
        counts.append(int(pc.sum(bad).as_py() or 0))
    return pa.table({"name": names, "violations": counts}, schema=out_schema)


def _rehome(run_path: str, prefix: str) -> str:
    """New RELATIVE path (same partition dir, prefixed name) for a run a
    rewrite/rename replaces — always under THIS lake's own data dir. A
    shallow clone references its source's files by ABSOLUTE path; deriving
    the new name from that path verbatim would land the rewrite in the
    SOURCE lake's directory (which the clone contract forbids and the
    source's vacuum would treat as orphans)."""
    part = os.path.basename(os.path.dirname(run_path))
    return os.path.join("data", part, f"{prefix}-{os.path.basename(run_path)}")


def _link_or_copy(src: str, dst: str) -> None:
    """Hardlink (zero-copy) with a copy fallback for cross-device links —
    a shallow clone's source may live on another filesystem."""
    import shutil

    try:
        os.link(src, dst)
    except FileExistsError:
        pass  # identical bytes from a retried task
    except OSError:
        shutil.copy2(src, dst)


def _masked_run_read(path: str, state_schema: pa.Schema) -> pa.Table:
    """Per-file read task for a deletion-vector'd run on the streaming read
    path: column-pruned decode, positional mask, conform. (The plain
    ``read_parquet`` scan can't host the mask — batches there don't know their
    file-absolute row offsets.)"""
    avail = set(pq.ParquetFile(path).schema_arrow.names)
    cols = [n for n in state_schema.names if n in avail]
    t = apply_dv(pq.read_table(path, columns=cols), path)
    return conform_batch(t, state_schema)


def _dv_partition(
    lake_dir: str,
    pid: int,
    runs: list[dict],
    state_schema: pa.Schema,
    spec: dict,
    version: int,
    merge_mode: str = "lww",
) -> dict | None:
    """delete_where(mode="dv") kernel for one partition — the merge-on-read
    twin of ``_delete_where_partition``: instead of emitting tombstone events,
    mark the doomed rows' POSITIONS in per-run deletion-vector sidecars.

    Every stored version of a hit key is masked in every run (masking only
    the LWW winner would resurrect the key's older rows at merge), so the key
    vanishes from the commit version onward. No data bytes move: each
    affected run is HARDLINKED to a fresh ``dv-v{V}-…`` name (bloom sidecar
    linked along) and the ``.dv`` sidecar attaches to the new name only — the
    old path stays sidecar-free, so time travel below the commit reads the
    exact pre-delete rows and ``change_feed`` across it classifies the
    deletes. A fully-dead run is simply dropped from the manifest. The next
    compaction folds vectors into rewritten bytes."""
    import numpy as np
    import pandas as pd

    from .constraints import _predicate_true

    files = [os.path.join(lake_dir, r["path"]) for r in runs]
    if not files:
        return None
    tables = [load_run(f, state_schema) for f in files]
    state = drop_tombstones(_resolve_latest(pa.concat_tables(tables), merge_mode))
    if spec["column"] not in state.column_names or state.num_rows == 0:
        return None
    hit = state.filter(_predicate_true(state.column(spec["column"]), spec))
    if hit.num_rows == 0:
        return None
    kill = pd.MultiIndex.from_arrays(
        [hit.column(c).to_pandas() for c in KEY_COLUMNS]
    )
    new_runs: list[dict] = []
    replaced: list[str] = []
    masked = 0
    for run, ap in zip(runs, files):
        raw = pq.read_table(ap)  # positions are file-absolute: RAW read
        keys = pd.MultiIndex.from_arrays(
            [raw.column(c).to_pandas() for c in KEY_COLUMNS]
        )
        pos = np.flatnonzero(keys.isin(kill)).astype(np.int64)
        if len(pos) == 0:
            continue  # untouched: entry stays as-is via replaced_paths rebase
        masked += int(len(pos))
        if os.path.exists(ap + ".dv"):
            # re-DV of an already-vector'd run: union in file-absolute coords
            prev = pq.read_table(ap + ".dv").column("pos").to_numpy(
                zero_copy_only=False
            )
            pos = np.union1d(pos, prev).astype(np.int64)
        replaced.append(run["path"])
        if len(pos) == raw.num_rows:
            continue  # fully dead: drop the run entirely
        rel = _rehome(run["path"], f"dv-v{version:08d}")
        new_ap = os.path.join(lake_dir, rel)
        os.makedirs(os.path.dirname(new_ap), exist_ok=True)
        _link_or_copy(ap, new_ap)  # zero-copy rename-for-versioning
        if os.path.exists(ap + ".bloom") and not os.path.exists(new_ap + ".bloom"):
            _link_or_copy(ap + ".bloom", new_ap + ".bloom")
        atomic_parquet(pa.table({"pos": pa.array(pos, pa.int64())}), new_ap + ".dv")
        keep = np.ones(raw.num_rows, dtype=bool)
        keep[pos] = False
        surv = raw.filter(pa.array(keep))
        tomb = (
            int(pc.sum(pc.equal(surv.column("op"), "D")).as_py() or 0)
            if "op" in surv.column_names
            else 0
        )
        new_runs.append(
            {
                "path": rel,
                "rows": surv.num_rows,
                "tombstones": tomb,
                "dv_rows": int(len(pos)),
            }
            | dict(run_ts_stats(surv))
        )
    if not replaced:
        return None
    return {"pid": pid, "runs": new_runs, "replaced": replaced, "masked": masked}


def _delete_where_partition(
    files: list[str],
    state_schema: pa.Schema,
    spec: dict,
    sync_ts_us: int,
    base_offset: int,
    merge_mode: str = "lww",
) -> pa.Table:
    """delete_where kernel for one partition: LWW-merge the runs and emit a
    'D' tombstone for every LIVE key whose converged row makes the predicate
    definitively TRUE (``coalesce(pred, FALSE)`` — SQL DELETE WHERE
    semantics). Same exactly-once epoch shape as ``_expire_partition``: the
    deletion is change-feed-visible and time-travelable, and the scan never
    leaves the partition that owns the keys."""
    import numpy as np
    import pandas as pd

    from .constraints import _predicate_true

    event_schema = pa.schema([f for f in state_schema if f.name != "pid"])
    payload = [
        f.name
        for f in state_schema
        if f.name not in KEY_COLUMNS and f.name not in INTERNAL_COLUMNS and f.name != "ts"
    ]
    if not files:
        return event_schema.empty_table()
    tables = [load_run(f, state_schema) for f in files]
    state = drop_tombstones(_resolve_latest(pa.concat_tables(tables), merge_mode))
    if spec["column"] not in state.column_names or state.num_rows == 0:
        return event_schema.empty_table()
    hit = state.filter(_predicate_true(state.column(spec["column"]), spec))
    if hit.num_rows == 0:
        return event_schema.empty_table()
    out = hit.select(list(KEY_COLUMNS)).to_pandas()
    out = out.sort_values(list(KEY_COLUMNS), kind="stable").reset_index(drop=True)
    out.insert(0, "op", "D")
    for c in payload:
        out[c] = None
    out.insert(0, "offset", base_offset + np.arange(len(out), dtype=np.int64))
    out["ts"] = pd.Timestamp(sync_ts_us, unit="us")
    return (
        pa.Table.from_pandas(out, preserve_index=False)
        .select([f.name for f in event_schema])
        .cast(event_schema)
    )


def _update_where_partition(
    files: list[str],
    state_schema: pa.Schema,
    spec: dict,
    set_values: dict,
    sync_ts_us: int,
    base_offset: int,
    merge_mode: str = "lww",
) -> pa.Table:
    """update_where kernel for one partition: LWW-merge the runs and emit a
    FULL-IMAGE 'U' event for every LIVE key whose converged row makes the
    predicate definitively TRUE (``coalesce(pred, FALSE)`` — SQL UPDATE WHERE
    semantics), with the SET assignments overriding the row's current
    payload. Same exactly-once epoch shape as ``_delete_where_partition``:
    the update is change-feed-visible and time-travelable, and the scan never
    leaves the partition that owns the keys."""
    import numpy as np
    import pandas as pd

    from .constraints import _predicate_true

    event_schema = pa.schema([f for f in state_schema if f.name != "pid"])
    payload = [
        f.name
        for f in state_schema
        if f.name not in KEY_COLUMNS and f.name not in INTERNAL_COLUMNS and f.name != "ts"
    ]
    if not files:
        return event_schema.empty_table()
    tables = [load_run(f, state_schema) for f in files]
    state = drop_tombstones(_resolve_latest(pa.concat_tables(tables), merge_mode))
    if spec["column"] not in state.column_names or state.num_rows == 0:
        return event_schema.empty_table()
    hit = state.filter(_predicate_true(state.column(spec["column"]), spec))
    if hit.num_rows == 0:
        return event_schema.empty_table()
    out = hit.select(list(KEY_COLUMNS) + payload).to_pandas()
    out = out.sort_values(list(KEY_COLUMNS), kind="stable").reset_index(drop=True)
    out.insert(0, "op", "U")
    for c, v in set_values.items():
        out[c] = v  # constant broadcast; None = SET col = NULL
    out.insert(0, "offset", base_offset + np.arange(len(out), dtype=np.int64))
    out["ts"] = pd.Timestamp(sync_ts_us, unit="us")
    return (
        pa.Table.from_pandas(out, preserve_index=False)
        .select([f.name for f in event_schema])
        .cast(event_schema)
    )


def _export_partition(
    files: list[str],
    state_schema: pa.Schema,
    public: tuple,
    path: str,
    merge_mode: str = "lww",
    out_names: tuple | None = None,
    purged: tuple = (),
) -> str:
    """export_snapshot kernel: LWW-merge one partition's runs and write the
    key-sorted public rows to a single shard file, atomically. ``out_names``
    presents the columns under their logical (column-mapped) names."""
    from .applier import atomic_parquet

    if files:
        tables = [load_run(f, state_schema) for f in files]
        merged = _drop_purged(
            drop_tombstones(_resolve_latest(pa.concat_tables(tables), merge_mode)),
            purged,
        )
        order = pc.sort_indices(
            merged, sort_keys=[(c, "ascending") for c in KEY_COLUMNS]
        )
        out = merged.take(order)
    else:
        out = state_schema.empty_table()
    atomic_parquet(_select_renamed(out, public, out_names or public), path)
    return path


def apply_row_filters(table: pa.Table, filters: tuple) -> pa.Table:
    """Apply row access policies to a LOGICAL-named result table: a row is
    served unless a policy predicate is definitively FALSE (the same SQL
    CHECK semantics as ingest constraints — ``constraints._predicate_false``
    is the shared kernel); ``not_null`` policies drop null rows. A policy on
    a column absent from a pre-evolution snapshot sees an all-null column."""
    if not filters or not table.num_rows:
        return table
    import numpy as np

    from .constraints import _predicate_false

    keep = np.ones(table.num_rows, dtype=bool)
    for spec in filters:
        present = spec["column"] in table.column_names
        if spec["op"] == "not_in":
            # internal form (the purge list): drop rows whose value is in the
            # set; nulls are served
            if present:
                hit = pc.fill_null(
                    pc.is_in(
                        table.column(spec["column"]),
                        value_set=pa.array(spec["value"], pa.string()),
                    ),
                    False,
                )
                keep &= ~hit.to_numpy(zero_copy_only=False)
            continue
        if spec["op"] == "not_null":
            if not present:
                keep[:] = False
            else:
                keep &= pc.is_valid(table.column(spec["column"])).to_numpy(
                    zero_copy_only=False
                )
            continue
        if not present:
            continue  # all-null column: predicate NULL → served
        keep &= ~_predicate_false(
            table.column(spec["column"]), spec
        ).to_numpy(zero_copy_only=False)
    return table.filter(pa.array(keep))


def apply_masks(table: pa.Table, masks: tuple) -> pa.Table:
    """Apply column masking policies to a LOGICAL-named result table (the
    dynamic-masking read hook): kind "null" redacts the column wholesale;
    kind "hash" replaces each non-null string with its md5 hex digest — a
    deterministic token that joins/groups consistently across reads without
    revealing the value (and is mirror-able by an independent engine's
    ``md5()``); kind "redact" scrubs PII in place (emails then phone-shaped
    digit runs, the ``stages.text.redact_pii`` RE2 pass — mirror-able by
    ``regexp_replace``). Unknown columns are skipped (pre-evolution
    snapshots)."""
    if not masks:
        return table
    import hashlib

    for m in masks:
        col = m["column"]
        if col not in table.column_names:
            continue
        i = table.schema.get_field_index(col)
        c = table.column(col)
        if m["kind"] == "null":
            table = table.set_column(
                i, pa.field(col, c.type), pa.nulls(len(table), c.type)
            )
        elif m["kind"] == "redact":
            from ..stages.text import PII_EMAIL_RE, PII_PHONE_RE

            scrubbed = pc.replace_substring_regex(
                pc.replace_substring_regex(c, PII_EMAIL_RE, "<EMAIL>"),
                PII_PHONE_RE,
                "<PHONE>",
            )
            table = table.set_column(i, pa.field(col, pa.string()), scrubbed)
        else:  # hash — add_mask only admits string columns for this kind
            hashed = [
                None if v is None else hashlib.md5(v.encode("utf-8")).hexdigest()
                for v in c.to_pylist()
            ]
            table = table.set_column(
                i, pa.field(col, pa.string()), pa.array(hashed, pa.string())
            )
    return table


def _lookup_partition(
    files: list[str],
    state_schema: pa.Schema,
    conv_ids: tuple,
    public: tuple,
    merge_mode: str = "lww",
    out_names: tuple | None = None,
    masks: tuple = (),
    row_filters: tuple = (),
) -> pa.Table:
    """lookup_many kernel for one touched partition: bloom-skip runs that
    provably lack every requested id, parquet-filter the survivors to the id
    set, LWW-merge only the matching rows. ``out_names`` presents the columns
    under their logical (column-mapped) names."""
    from .applier import bloom_may_contain

    id_list = list(conv_ids)
    tables = []
    for f in files:
        if not any(bloom_may_contain(f, cid) for cid in id_list):
            continue
        t = load_run_key_filtered(f, id_list)
        tables.append(conform_batch(t, state_schema))
    if not tables:
        return apply_masks(
            _select_renamed(state_schema.empty_table(), public, out_names or public),
            masks,
        )
    merged = drop_tombstones(_resolve_latest(pa.concat_tables(tables), merge_mode))
    order = pc.sort_indices(merged, sort_keys=[(c, "ascending") for c in KEY_COLUMNS])
    return apply_masks(
        apply_row_filters(
            _select_renamed(merged.take(order), public, out_names or public),
            row_filters,
        ),
        masks,
    )


def _headers_partition(
    files: list[str], state_schema: pa.Schema, merge_mode: str = "lww",
    purged: tuple = (),
) -> pa.Table:
    """conversation_headers kernel for one partition: LWW-merge the runs,
    then one pandas groupby over conv_id (every turn of a conversation lives
    in this partition by routing, so the aggregate is exact with NO shuffle)."""
    import pandas as pd

    if not files:
        tables = []
    else:
        tables = [load_run(f, state_schema) for f in files]
    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("n_turns", pa.int64()),
            ("n_tool_turns", pa.int64()),
            ("first_ts", pa.timestamp("us")),
            ("last_ts", pa.timestamp("us")),
        ]
    )
    if not tables:
        return out_schema.empty_table()
    state = _drop_purged(
        drop_tombstones(_resolve_latest(pa.concat_tables(tables), merge_mode)),
        purged,
    )
    df = state.select(
        [c for c in ("conv_id", "ts", "tool") if c in state.column_names]
    ).to_pandas()
    if "tool" not in df.columns:  # pre-evolution snapshot
        df["tool"] = None
    g = df.groupby("conv_id", sort=True)
    agg = pd.DataFrame(
        {
            "n_turns": g.size().astype("int64"),
            "n_tool_turns": g["tool"].count().astype("int64"),
            "first_ts": g["ts"].min(),
            "last_ts": g["ts"].max(),
        }
    ).reset_index()
    return pa.Table.from_pandas(agg, schema=out_schema, preserve_index=False)


def _assemble_partition(
    files: list[str], state_schema: pa.Schema, merge_mode: str = "lww",
    purged: tuple = (),
) -> pa.Table:
    """assemble_conversations kernel for one partition: LWW-merge the runs,
    order each conversation by turn_idx, and concatenate its turns into one
    training-ready document (``role: text`` lines). Routing co-locates every
    turn of a conversation, so the assembly is exact with NO shuffle."""
    import pandas as pd

    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("sft_text", pa.string()),
            ("n_turns", pa.int64()),
            ("n_tokens", pa.int64()),
        ]
    )
    if not files:
        return out_schema.empty_table()
    tables = [load_run(f, state_schema) for f in files]
    state = _drop_purged(
        drop_tombstones(_resolve_latest(pa.concat_tables(tables), merge_mode)),
        purged,
    )
    cols = [c for c in ("conv_id", "turn_idx", "role", "text") if c in state.column_names]
    df = state.select(cols).to_pandas()
    for c in ("role", "text"):
        if c not in df.columns:
            df[c] = None
    df = df.sort_values(["conv_id", "turn_idx"], kind="stable")
    piece = df["role"].fillna("") + ": " + df["text"].fillna("")
    g = piece.groupby(df["conv_id"].to_numpy(), sort=True)
    sft = g.agg("\n".join)
    agg = pd.DataFrame(
        {
            "conv_id": sft.index,
            "sft_text": sft.to_numpy(),
            "n_turns": g.size().to_numpy("int64"),
        }
    )
    # token convention: single-space split of the assembled document — the
    # same grid as string_split(sft_text, ' ') in the SQL oracle
    agg["n_tokens"] = agg["sft_text"].str.split(" ").str.len().astype("int64")
    return pa.Table.from_pandas(agg, schema=out_schema, preserve_index=False)


def _merged_turns_partition(
    files: list[str], state_schema: pa.Schema, merge_mode: str = "lww",
    purged: tuple = (),
) -> pa.Table:
    """merged_turns kernel for one partition: LWW-merge the runs, then coalesce
    CONSECUTIVE same-role turns of each conversation into one turn (the
    standard chat-data repair before SFT formatting — alternation-broken
    transcripts merge their runs-of-role into single messages). Gaps-and-
    islands, vectorized: an island breaks where conv_id or role changes
    between turn_idx-adjacent rows. Routing co-locates a conversation's turns,
    so the pass is exact with NO shuffle."""
    import pandas as pd

    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int64()),
            ("role", pa.string()),
            ("text", pa.string()),
            ("n_merged", pa.int64()),
            ("ts", pa.timestamp("us")),
        ]
    )
    if not files:
        return out_schema.empty_table()
    tables = [load_run(f, state_schema) for f in files]
    state = _drop_purged(
        drop_tombstones(_resolve_latest(pa.concat_tables(tables), merge_mode)),
        purged,
    )
    cols = [c for c in ("conv_id", "turn_idx", "role", "text", "ts") if c in state.column_names]
    df = state.select(cols).to_pandas()
    for c in ("role", "text"):
        if c not in df.columns:
            df[c] = None
    df = df.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)
    # island break where the conversation or the role changes (NULL-safe:
    # NULL role compares equal to NULL, mirroring IS DISTINCT FROM in SQL)
    role_key = df["role"].fillna("\x00")
    brk = (df["conv_id"] != df["conv_id"].shift()) | (role_key != role_key.shift())
    island = brk.cumsum()
    piece = df["text"].fillna("")
    g_txt = piece.groupby(island.to_numpy(), sort=True)
    g = df.groupby(island.to_numpy(), sort=True)
    agg = pd.DataFrame(
        {
            "conv_id": g["conv_id"].first(),
            "turn_idx": g["turn_idx"].min().astype("int64"),
            "role": g["role"].first(),
            "text": g_txt.agg("\n".join),
            "n_merged": g.size().astype("int64"),
            "ts": g["ts"].max(),
        }
    )
    return pa.Table.from_pandas(agg, schema=out_schema, preserve_index=False)


def _context_pairs_partition(
    files: list[str], state_schema: pa.Schema, merge_mode: str = "lww",
    purged: tuple = (), k: int = 4,
) -> pa.Table:
    """context_pairs kernel for one partition: LWW-merge the runs, then for
    every assistant turn with at least one preceding turn emit a training pair
    (context = the up-to-``k`` preceding turns as ``role: text`` lines, target
    = the assistant text). Vectorized: k shifted line columns concatenated
    oldest-first — no per-row Python. NO shuffle (conversations are
    co-located by routing)."""
    import numpy as np
    import pandas as pd

    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int64()),
            ("context", pa.string()),
            ("target", pa.string()),
        ]
    )
    if not files:
        return out_schema.empty_table()
    tables = [load_run(f, state_schema) for f in files]
    state = _drop_purged(
        drop_tombstones(_resolve_latest(pa.concat_tables(tables), merge_mode)),
        purged,
    )
    cols = [c for c in ("conv_id", "turn_idx", "role", "text") if c in state.column_names]
    df = state.select(cols).to_pandas()
    for c in ("role", "text"):
        if c not in df.columns:
            df[c] = None
    df = df.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)
    line = df["role"].fillna("") + ": " + df["text"].fillna("")
    conv = df["conv_id"]
    # context = join of the previous ≤k lines, oldest first: build k shifted
    # copies (shift j valid only while still inside the same conversation)
    parts: list[pd.Series] = []
    for j in range(k, 0, -1):
        shifted = line.shift(j)
        valid = conv.shift(j) == conv
        parts.append(shifted.where(valid))
    ctx = pd.Series(np.full(len(df), "", dtype=object))
    started = pd.Series(np.zeros(len(df), dtype=bool))
    for p in parts:
        has = p.notna()
        ctx = ctx.where(~(started & has), ctx + "\n" + p.fillna(""))
        ctx = ctx.where(~(~started & has), p.fillna(""))
        started = started | has
    keep = (df["role"] == "assistant") & started
    out = pd.DataFrame(
        {
            "conv_id": conv[keep],
            "turn_idx": df["turn_idx"][keep].astype("int64"),
            "context": ctx[keep],
            "target": df["text"][keep].fillna(""),
        }
    )
    return pa.Table.from_pandas(out, schema=out_schema, preserve_index=False)


_KMV_HEX = 16  # 64-bit hex prefix, matching stages.sketches
_KMV_FRAC = 13  # 52 bits — exact in a float64 significand


def _analyze_partition(
    files: list[str], state_schema: pa.Schema, merge_mode: str, k: int
) -> pa.Table:
    """ANALYZE kernel for one partition: per public column, exact live/null
    counts plus a deterministic KMV bottom-k sketch of md5(str(value)) — the
    sufficient statistic for distinct-count estimation, unionable across
    partitions (Bar-Yossef et al. 2002; same hash grid as stages.sketches,
    so the estimate is oracle-checkable in SQL)."""
    import hashlib

    import pandas as pd

    out_schema = pa.schema(
        [
            ("column", pa.string()),
            ("n_live", pa.int64()),
            ("null_count", pa.int64()),
            ("hashes", pa.list_(pa.string())),
        ]
    )
    if not files:
        return out_schema.empty_table()
    tables = [load_run(f, state_schema) for f in files]
    state = drop_tombstones(_resolve_latest(pa.concat_tables(tables), merge_mode))
    public = [
        c for c in state.column_names if c not in ("op", "offset", "pid")
    ]
    rows = []
    for c in public:
        col = state.column(c)
        nulls = int(pc.sum(pc.is_null(col).cast(pa.int64())).as_py() or 0)
        if pa.types.is_timestamp(col.type):
            # hash epoch-µs integers: timestamp→string formatting differs
            # between pandas and DuckDB (trailing-zero trimming), ints don't
            col = col.cast(pa.timestamp("us")).cast(pa.int64())
        vals = pd.Series(col.drop_null().to_pandas()).astype(str).unique()
        hs = sorted(
            hashlib.md5(v.encode("utf-8")).hexdigest()[:_KMV_HEX] for v in vals
        )[:k]
        rows.append(
            {
                "column": c,
                "n_live": state.num_rows,
                "null_count": nulls,
                "hashes": hs,
            }
        )
    return pa.Table.from_pylist(rows, schema=out_schema)


def _route_and_slice(table: pa.Table, event_schema, assigner, slot_of_skey, nslots: int, enrich=None):
    """Fused shuffle-map body: (optionally) enrich the raw rows, conform to the
    evolved schema, route (append skey), then one stable argsort by slot +
    zero-copy slices."""
    import numpy as np

    if enrich is not None:
        table = enrich(table)
    table = assigner(conform_batch(table, event_schema))
    skey = table.column("skey").to_numpy(zero_copy_only=False)
    slot = slot_of_skey[skey]
    idx = np.argsort(slot, kind="stable")
    t = table.take(pa.array(idx))
    bounds = np.searchsorted(slot[idx], np.arange(nslots + 1))
    out = [t.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(nslots)]
    return out if nslots > 1 else out[0]


def _split_block(table: pa.Table, event_schema, assigner, slot_of_skey, nslots: int, enrich=None):
    """Shuffle-map over an in-store Arrow block (Dataset inputs)."""
    return _route_and_slice(table, event_schema, assigner, slot_of_skey, nslots, enrich)


def _split_file_unit(
    path: str, row_groups: list[int], event_schema, assigner, slot_of_skey,
    nslots: int, enrich=None, offset: int = 0, length: int | None = None,
):
    """Shuffle-map that reads its parquet row-groups straight from storage —
    raw bytes never round-trip through the object store (the only in-store
    intermediate is the routed slices the appliers consume). ``offset``/
    ``length`` select a row range within the row groups (sub-row-group
    parallelism for fused enrichment)."""
    table = pq.ParquetFile(path).read_row_groups(row_groups)
    if length is not None:
        table = table.slice(offset, length)
    return _route_and_slice(table, event_schema, assigner, slot_of_skey, nslots, enrich)


def _read_unit_slices(path: str, row_groups: list[int], bounds: list[tuple]):
    """Stage-A reader for fused-enrichment applies: decode the row groups ONCE
    and return zero-copy row-range slices (one object-store block per range).
    Stage B (_split_block) then enriches + routes each slice independently, so
    enrich parallelism is bounded by row ranges, not the file's row-group
    count — without re-decoding a shared row group per range."""
    table = pq.ParquetFile(path).read_row_groups(row_groups)
    slices = [
        table.slice(off, ln) if ln is not None else table.slice(off)
        for off, ln in bounds
    ]
    return slices[0] if len(slices) == 1 else tuple(slices)


def _apply_slot(applier: EpochApplier, *chunks):
    """Shuffle-reduce side: concat this slot's chunks and run the applier."""
    chunks = [c for c in chunks if c.num_rows > 0]
    if not chunks:
        return None
    return applier(pa.concat_tables(chunks))


_TXN_BUCKETS = 64  # coarse txn-id exchange fan for transaction completion counts


def _txn_split(t: pa.Table, nb: int):
    """Shuffle-map for the transaction-completion exchange: one stable argsort
    by ``txn_id & (nb-1)`` + zero-copy slices (same shape as _route_and_slice)."""
    import numpy as np

    b = (
        t.column("txn_id").to_numpy(zero_copy_only=False).astype(np.int64)
        & (nb - 1)
    )
    idx = np.argsort(b, kind="stable")
    tt = t.take(pa.array(idx))
    bounds = np.searchsorted(b[idx], np.arange(nb + 1))
    out = [tt.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(nb)]
    return out if nb > 1 else out[0]


def _txn_count_split(t: pa.Table, nb: int):
    """Fused shuffle-map for the completion exchange: the per-block distinct
    (txn_id, offset, txn_n) reduction runs INSIDE the split task (one task
    layer over the materialized epoch blocks instead of a separate Dataset
    execution for the partial-dedup pass — measured, the per-execution fixed
    cost dominated at sf0.1)."""
    tr = (
        t.select(["txn_id", "offset", "txn_n"])
        .group_by(["txn_id", "offset"])
        .aggregate([("txn_n", "max")])
    )
    return _txn_split(tr, nb)


def _txn_partition(t: pa.Table, held_ids):
    """One task per epoch block: split into (complete, held) in a single
    pass — complete events drop the stream-metadata txn columns; held events
    keep them for the pending sidecar. ``held_ids`` None = nothing cut."""
    import pyarrow.compute as pc

    if held_ids is not None:
        mask = pc.is_in(t.column("txn_id"), value_set=held_ids)
        held = t.filter(mask)
        comp = t.filter(pc.invert(mask))
    else:
        held, comp = t.schema.empty_table(), t
    comp = comp.drop_columns(
        [c for c in ("txn_id", "txn_n") if c in comp.column_names]
    )
    return comp, held


def _txn_bucket_stats(*chunks):
    """Shuffle-reduce: exact per-transaction completion stats for one bucket —
    global offset dedup (a duplicate may straddle batches) then one vectorized
    pandas groupby over every transaction in the bucket."""
    import pandas as pd

    chunks = [c for c in chunks if c.num_rows > 0]
    if not chunks:
        return None
    df = pa.concat_tables(chunks).to_pandas().drop_duplicates(["txn_id", "offset"])
    g = df.groupby("txn_id", sort=False)
    sizes = g.size()
    return pa.table(
        {
            "txn_id": pa.array(sizes.index.to_numpy(dtype="int64"), pa.int64()),
            "seen": pa.array(sizes.to_numpy(dtype="int64"), pa.int64()),
            "expected": pa.array(
                g["txn_n_max"].max().to_numpy(dtype="int64"), pa.int64()
            ),
        }
    )


def _dataset_schema(ds) -> pa.Schema:
    s = ds.schema()
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    return pa.schema(list(zip(s.names, s.types)))


def _plan_file_units(
    paths: list[str], target_bytes: int = 32 << 20, max_rows: int | None = None
):
    """Group parquet row-groups into ~target_bytes read units; returns
    ([(path, [row_group_idx...], offset, length)], unified arrow schema).

    ``max_rows`` further subdivides a unit into row ranges (the task reads its
    row groups and slices before processing). Used for fused-enrichment
    applies, where split-stage parallelism would otherwise be capped at the
    file's ROW GROUP count — a 2-row-group epoch pinned the whole compute-
    bound enrich stage to 2 tasks regardless of cluster size (measured: the
    1→4 cpu scaling wall). The extra cost is re-decoding a shared row group
    per range, which the fused per-event compute dwarfs."""
    units: list[tuple[str, list[int], int, int | None]] = []
    schemas = []
    for path in paths:
        f = pq.ParquetFile(path)
        schemas.append(f.schema_arrow)
        cur: list[int] = []
        cur_bytes = 0
        cur_rows = 0

        def emit(rgs: list[int], n_rows: int):
            if max_rows is None or n_rows <= max_rows:
                units.append((path, rgs, 0, None))
                return
            off = 0
            while off < n_rows:
                ln = min(max_rows, n_rows - off)
                units.append((path, rgs, off, ln))
                off += ln

        for rg in range(f.metadata.num_row_groups):
            meta = f.metadata.row_group(rg)
            cur.append(rg)
            cur_bytes += meta.total_byte_size
            cur_rows += meta.num_rows
            if cur_bytes >= target_bytes:
                emit(cur, cur_rows)
                cur, cur_bytes, cur_rows = [], 0, 0
        if cur:
            emit(cur, cur_rows)
    schema = schemas[0]
    for sc in schemas[1:]:
        schema = pa.unify_schemas([schema, sc])
    return units, schema


def _estimate_hot_files(paths: list[str], hot_threshold: float) -> set[str]:
    """Prepass histogram straight off the conv_id column of the files."""
    import pandas as pd

    counts: dict[str, int] = {}
    total = 0
    for path in paths:
        col = pq.read_table(path, columns=["conv_id"]).column("conv_id").to_pandas()
        total += len(col)
        for k, v in col.value_counts().head(64).items():
            counts[k] = counts.get(k, 0) + int(v)
    if total == 0:
        return set()
    return {k for k, v in counts.items() if v / total >= hot_threshold}


class CdcLake:
    def __init__(
        self,
        lake_dir: str,
        num_partitions: int = 32,
        max_runs: int = 4,
        num_salts: int = 8,
        hot_threshold: float = 0.05,
        exchange: bool = True,
        allowed_lateness: str | None = None,
        compaction_policy: str = "full",
        merge_mode: str = "lww",
        window: str | None = None,
        schema_mode: str = "additive",
        log_store=None,
    ):
        self.lake_dir = lake_dir
        os.makedirs(lake_dir, exist_ok=True)
        if merge_mode not in ("lww", "patch"):
            raise ValueError(f"unknown merge_mode {merge_mode!r}")
        if schema_mode not in ("additive", "strict"):
            raise ValueError(f"unknown schema_mode {schema_mode!r}")
        # merge_mode and window size are pinned at creation (mixing collapse
        # disciplines or window grids across runs would be undefined) —
        # persisted beside the manifest, reopen wins
        window_us: int | None = None
        if window is not None:
            import pandas as pd

            window_us = int(pd.Timedelta(window).value // 1_000)
            if window_us <= 0:
                raise ValueError(f"window {window!r} must be positive")
            if allowed_lateness is None:
                raise ValueError(
                    "windowed aggregation needs allowed_lateness: without a "
                    "lateness bound no window could ever finalize"
                )
        cfg_path = os.path.join(lake_dir, "CONFIG.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                cfg = json.load(f)
            merge_mode = cfg.get("merge_mode", merge_mode)
            window_us = cfg.get("window_us", window_us)
            schema_mode = cfg.get("schema_mode", schema_mode)
        elif merge_mode != "lww" or window_us is not None or schema_mode != "additive":
            tmp = cfg_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(
                    {
                        "merge_mode": merge_mode,
                        "window_us": window_us,
                        "schema_mode": schema_mode,
                    },
                    f,
                )
            os.replace(tmp, cfg_path)
        self.merge_mode = merge_mode
        self.window_us = window_us
        # schema_mode="strict": after the first apply pins the schema, a batch
        # carrying UNKNOWN columns is rejected (ValueError naming them) instead
        # of auto-evolving — the production guardrail against upstream schema
        # drift (type WIDENING is still allowed; it is lossless)
        self.schema_mode = schema_mode
        # log_store plugs the commit-arbitration strategy (None = the default
        # PosixLogStore): pass manifest.FileCasLogStore / MemoryCasLogStore to
        # run the whole lake on a conditional-put arbiter — the Delta-on-S3
        # deployment shape, exercised end-to-end by test_log_stores
        self.manifest = Manifest(lake_dir, log_store=log_store)
        if self.manifest.num_partitions is not None:
            if self.manifest.num_partitions != num_partitions:
                # partition count is pinned at creation so checkpoints line up
                num_partitions = self.manifest.num_partitions
        self.P = num_partitions
        self.max_runs = max_runs
        if compaction_policy not in ("full", "tiered"):
            raise ValueError(f"unknown compaction policy {compaction_policy!r}")
        self.compaction_policy = compaction_policy
        self.num_salts = num_salts
        self.hot_threshold = hot_threshold
        # exchange=True routes events to appliers with an explicit two-stage
        # task exchange (split-by-slot → per-slot apply) instead of Ray Data's
        # sort-based groupby — same semantics, far lower constant cost per
        # micro-batch epoch (SURVEY.md §7.4 point 2 anticipated this choice)
        self.exchange = exchange
        # observability for the last _read_manifest call: how many runs the
        # per-run ts stats let the read skip without opening
        self.last_read_stats: dict = {}
        # resolved FK key sets, keyed (ref_dir, ref manifest version, column)
        self._fk_cache: dict = {}
        # allowed_lateness (anything pandas.Timedelta accepts): events with
        # ts < watermark − lateness are quarantined as 'too_late' instead of
        # applied. The watermark is the max committed ts, read from the
        # manifest's per-run stats at each apply — deterministic per epoch
        # (batch semantics: fixed for the whole epoch, advanced by its commit)
        self.allowed_lateness_us: int | None = None
        if allowed_lateness is not None:
            import pandas as pd

            self.allowed_lateness_us = int(
                pd.Timedelta(allowed_lateness).value // 1_000
            )

    def _watermark_us(self) -> int | None:
        """Event-time watermark: max committed ts, from the manifest's per-run
        stats (no data files opened). None for an empty/stat-less lake."""
        w = None
        for p in range(self.P):
            for run in self.manifest.partition(p)["runs"]:
                if "ts_max" in run:
                    w = int(run["ts_max"]) if w is None else max(w, int(run["ts_max"]))
        return w

    @property
    def _valid_ops(self) -> tuple:
        from .router import PATCH_VALID_OPS, VALID_OPS

        return PATCH_VALID_OPS if self.merge_mode == "patch" else VALID_OPS

    # -- schema ------------------------------------------------------------
    def _event_schema(self) -> pa.Schema | None:
        """Current lake event schema (state schema minus pid)."""
        s = self.manifest.schema
        if s is None:
            return None
        return pa.schema([f for f in s if f.name != "pid"])

    # -- write path --------------------------------------------------------
    def apply(
        self,
        changes,
        epoch: int | None = None,
        hot_keys: set[str] | None = None,
        detect_hot: str = "carryover",  # "carryover" | "prepass" | "off"
        enrich=None,
        enrich_schema: pa.Schema | None = None,
        _physical_names: bool = False,
        _exempt_offsets: frozenset | None = None,
        _pending_txns: list | None = None,
        _schema: pa.Schema | None = None,
        assign_offsets: bool = False,
    ) -> dict:
        """Apply one epoch of change events; returns this epoch's metrics.

        ``assign_offsets``: derived-view mode — the caller emits a
        placeholder ``offset`` column and the applier assigns collision-free
        offsets AFTER routing ((epoch+1)<<40 | salt<<34 | key rank within the
        partition group). Requires keys unique per epoch; replaces hash-based
        view offsets whose birthday collisions drop events at 10M+ rows/epoch.

        ``enrich``: optional vectorized per-batch transform run inside the
        shuffle-map task (e.g. transcript text analysis); the columns it adds
        must be declared in ``enrich_schema`` so they join the lake schema.

        ``_physical_names`` (internal): the events already carry PHYSICAL
        column names (they were derived from lake runs — merge_into,
        expire_rows, snapshot_sync, retry_deadletter), so skip the
        logical→physical column-mapping translation."""
        import ray
        import ray.data

        ds = None
        file_units = None
        if isinstance(changes, (str, list)):
            paths = [changes] if isinstance(changes, str) else list(changes)
            if self.exchange:
                # plan (path, row-group) read units from the footers: split
                # tasks read their row groups straight from storage, so raw
                # bytes never double-buffer through the object store. With
                # fused enrichment the split stage carries the per-event
                # compute, so units subdivide below row-group granularity.
                file_units, incoming = _plan_file_units(
                    paths, max_rows=250_000 if enrich is not None else None
                )
            else:
                # groupby mode: apply parallelism tracks blocks — up to #cpus
                # blocks (≥2 MB each), ~32 MB blocks for large epochs
                total = sum(os.path.getsize(p) for p in paths if os.path.exists(p))
                cpus = int(ray.cluster_resources().get("CPU", 8))
                nb = max(1, min(cpus, total // (2 << 20)), total // (32 << 20))
                ds = ray.data.read_parquet(paths, override_num_blocks=int(nb))
                incoming = _dataset_schema(ds)
        else:
            ds = changes
            # an internal caller that already knows the event schema (e.g.
            # apply_transactional's prepared block refs) skips the schema
            # peek — a Dataset.schema() spins a small execution per call
            incoming = _schema if _schema is not None else _dataset_schema(ds)
        missing = [c for c in REQUIRED_EVENT_COLUMNS if c not in incoming.names]
        if missing:
            raise ValueError(f"change stream missing required columns: {missing}")

        # generated columns ride the enrich hook (fused into the shuffle-map
        # task), declared on LOGICAL names — before the mapping translation
        enrich, enrich_schema = self._compose_computed(enrich, enrich_schema)

        cm = self.manifest.column_mapping
        mapping_update = None
        if cm is not None and not _physical_names:
            # column mapping active: incoming events carry LOGICAL names —
            # translate to the storage (physical) namespace before evolution.
            cm = {"logical": dict(cm["logical"]), "used": list(cm["used"])}
            log2phys, used = cm["logical"], set(cm["used"])
            fields = list(incoming) + (
                list(enrich_schema) if enrich_schema is not None else []
            )
            for f in fields:
                if f.name in _NO_MAP_COLUMNS or f.name in log2phys:
                    continue
                # unseen logical column: allocate a FRESH physical, so a
                # dropped column re-added under the same name never
                # resurrects the old data (Delta column-mapping semantics)
                phys, k = f.name, 1
                while phys in used:
                    phys = f"{f.name}__{k}"
                    k += 1
                log2phys[f.name] = phys
                used.add(phys)
                cm["used"].append(phys)
            mapping_update = cm
            ren = {l: p for l, p in log2phys.items() if l != p}
            incoming = pa.schema(
                [pa.field(log2phys.get(f.name, f.name), f.type) for f in incoming]
            )
            if enrich_schema is not None:
                enrich_schema = pa.schema(
                    [
                        pa.field(log2phys.get(f.name, f.name), f.type)
                        for f in enrich_schema
                    ]
                )
            if ren:
                # batch-side translation rides the existing enrich hook (it
                # runs before conform in both apply paths); renames are
                # applied simultaneously, so swapped names are safe
                base_enrich = enrich

                def enrich(t, _b=base_enrich, _r=ren):
                    if _b is not None:
                        t = _b(t)
                    return rename_columns_map(t, _r)

        current = self._event_schema()
        if self.schema_mode == "strict" and current is not None:
            known = {f.name for f in current}
            unknown = [f.name for f in incoming if f.name not in known]
            if unknown:
                raise ValueError(
                    f"schema_mode='strict': change stream carries unknown "
                    f"columns {unknown} — evolve explicitly or fix the producer"
                )
        event_schema = (
            evolve_schema(current, incoming) if current is not None else incoming
        )
        if enrich_schema is not None:
            event_schema = evolve_schema(event_schema, enrich_schema)
        state_schema = pa.schema(list(event_schema) + [pa.field("pid", pa.int32())])

        if epoch is None:
            epoch = self.manifest.last_epoch + 1
        if self.manifest.epoch_committed(epoch):
            return {"epoch": epoch, "skipped": True}

        if hot_keys is None:
            if detect_hot == "prepass":
                if ds is not None:
                    hot_keys = estimate_hot_keys(ds, hot_threshold=self.hot_threshold)
                else:
                    hot_keys = _estimate_hot_files(paths, self.hot_threshold)
            elif detect_hot == "carryover":
                hot_keys = self.manifest_hot_keys()
            else:
                hot_keys = set()

        committed = self.manifest.committed_offsets()
        late_cutoff_us = None
        if self.allowed_lateness_us is not None:
            w = self._watermark_us()
            if w is not None:
                late_cutoff_us = w - self.allowed_lateness_us
        applier = EpochApplier(
            self.lake_dir,
            epoch,
            state_schema,
            committed,
            num_salts=self.num_salts,
            quarantine_skey=self.P * max(1, self.num_salts),
            late_cutoff_us=late_cutoff_us,
            merge_mode=self.merge_mode,
            exempt_offsets=_exempt_offsets,
            constraints=self._active_constraints(),
            window_us=self.window_us,
            assign_offsets=assign_offsets,
        )

        event_only = pa.schema(list(event_schema))
        if self.exchange:
            stats = self._exchange_apply(
                file_units if file_units is not None else ds,
                event_only,
                applier,
                hot_keys,
                from_files=file_units is not None,
                enrich=enrich,
            )
        else:
            # enrich BEFORE conform, mirroring the exchange path's fused
            # _route_and_slice ordering (enrich columns are part of the
            # evolved event schema; conforming first would null-backfill them)
            if enrich is not None:
                ds = ds.map_batches(
                    enrich, batch_format="pyarrow", zero_copy_batch=True
                )
            routed = ds.map_batches(
                lambda t, s=event_only: conform_batch(t, s),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ).map_batches(
                AssignPartitions(
                    self.P, hot_keys, self.num_salts, late_cutoff_us,
                    valid_ops=self._valid_ops,
                    constraints=applier.constraints,
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            stats = (
                routed.groupby("skey")
                .map_groups(
                    functools.partial(_apply_group, applier=applier),
                    batch_format="pyarrow",
                )
                .to_pandas()
            )

        # aggregate per owner pid (hot partitions emit one stats row per salt)
        partition_updates: dict[int, dict] = {}
        key_counts: dict[str, int] = {}
        if stats.empty:  # zero-row epoch still commits (advances the epoch log)
            self.manifest.commit_epoch(
                epoch, {}, state_schema, self.P,
                {"events_in": 0, "events_deduped": 0, "upserts": 0,
                 "deletes": 0, "late_events": 0, "events_quarantined": 0},
                column_mapping=mapping_update,
                pending_txns=_pending_txns,
            )
            return {"epoch": epoch, "skipped": False, "events_in": 0,
                    "events_deduped": 0, "upserts": 0, "deletes": 0,
                    "late_events": 0, "events_quarantined": 0}
        deadletter_runs: list[dict] = []
        quarantined = 0
        for row in stats.itertuples(index=False):
            pid = int(row.pid)
            if pid < 0:  # dead-letter group: lineage only, no partition state
                quarantined += int(row.events_in)
                deadletter_runs.extend(json.loads(row.runs_json))
                continue
            upd = partition_updates.setdefault(
                pid,
                {"runs": [], "replaces": False, "max_offset": -1, "rows": 0},
            )
            upd["runs"].extend(json.loads(row.runs_json))
            upd["max_offset"] = max(upd["max_offset"], int(row.max_offset))
            for k, v in json.loads(row.top_keys_json).items():
                key_counts[k] = key_counts.get(k, 0) + v
        windows_delta: dict[str, int] = {}
        if self.window_us and "windows_json" in stats.columns:
            for wj in stats["windows_json"]:
                for k, v in json.loads(wj).items():
                    windows_delta[k] = windows_delta.get(k, 0) + int(v)
        for pid, upd in partition_updates.items():
            prev = self.manifest.partition(pid)
            # approximate until next compaction recounts exactly
            upd["rows"] = prev["rows"] + sum(
                r["rows"] - r["tombstones"] for r in upd["runs"]
            )

        events_in = int(stats["events_in"].sum())
        metrics_delta = {
            "events_in": events_in,
            "events_deduped": int(stats["events_deduped"].sum()),
            "upserts": int(stats["upserts"].sum()),
            "deletes": int(stats["deletes"].sum()),
            "late_events": int(stats["late_events"].sum()),
            "events_quarantined": quarantined,
        }
        next_hot = sorted(
            k
            for k, v in key_counts.items()
            if events_in > 0 and v / events_in >= self.hot_threshold
        )
        self.manifest.commit_epoch(
            epoch,
            partition_updates,
            state_schema,
            self.P,
            metrics_delta,
            hot_keys=next_hot,
            deadletter=deadletter_runs or None,
            column_mapping=mapping_update,
            pending_txns=_pending_txns,
            windows_delta=windows_delta or None,
        )
        self.compact()  # merges any partition whose run count exceeds max_runs
        return {"epoch": epoch, "skipped": False, **metrics_delta}

    def apply_transactional(
        self,
        changes,
        epoch: int | None = None,
        detect_hot: str = "carryover",
    ) -> dict:
        """Apply one epoch under upstream TRANSACTION-BOUNDARY atomicity
        (Debezium's transaction-metadata contract): events carry two stream
        metadata columns — ``txn_id`` (int64, the source transaction) and
        ``txn_n`` (int64, the transaction's total event count, Debezium's
        transaction-block ``event_count``) — and an epoch makes visible ONLY
        transactions whose events are ALL present. Events of transactions cut
        by the epoch boundary are parked in a ``pending/`` sidecar recorded in
        the SAME atomic manifest commit (so a crash never strands them: the
        sidecar is either pending or consumed, never both) and re-applied once
        the rest arrives. Parked offsets sit below the advanced checkpoints,
        so their replay rides the applier's ``exempt_offsets`` dedup bypass —
        exactly-once overall because consumption and the exempting commit are
        the same commit.

        Scale shape: one extra counting pass over the epoch (the price of not
        having Debezium's separate transaction topic) whose shuffle moves only
        per-batch-distinct ``(txn_id, offset, txn_n)`` triples — counting is
        by DISTINCT offset, so at-least-once duplicates inside an epoch never
        fake completion; a broadcast of the cut-transaction id set
        (O(transactions in flight at the boundary) — small by nature); and the
        normal exactly-once apply for the complete part. The txn columns are
        stream metadata: they are dropped before storage and never join the
        lake schema."""
        import numpy as np
        import ray.data

        if isinstance(changes, (str, list)):
            paths = [changes] if isinstance(changes, str) else list(changes)
            ds = ray.data.read_parquet(paths)
        else:
            ds = changes
        schema = _dataset_schema(ds)
        for c in ("txn_id", "txn_n"):
            if c not in schema.names:
                raise ValueError(
                    f"apply_transactional: events must carry {c!r} "
                    "(Debezium transaction metadata)"
                )

        # drop redelivered events up front (offset ≤ the owner partition's
        # committed checkpoint — the same rule the applier enforces): they were
        # already applied, so they must not count toward transaction
        # completion. Without this, a redelivered fragment of a long-finished
        # transaction would park forever as an incomplete residue.
        committed = self.manifest.committed_offsets()
        if committed:
            from ..hashing import partition_ids

            comm_arr = np.full(self.P, -1, dtype=np.int64)
            for p, o in committed.items():
                comm_arr[int(p)] = o

            def drop_replayed(t: pa.Table, _c=comm_arr, _P=self.P) -> pa.Table:
                off = t.column("offset").to_numpy(zero_copy_only=False)
                pids = partition_ids(t.column("conv_id"), _P)
                return t.filter(pa.array(off > _c[pids]))

            ds = ds.map_batches(
                drop_replayed, batch_format="pyarrow", zero_copy_batch=True
            )

        # fold the previous holdback back in. Its offsets are exempt from the
        # redelivery dedup (they were parked, never applied); a redelivered
        # epoch may re-contain parked events, so drop those from the fresh
        # stream first — the union then holds each offset at most once, which
        # keeps the completion counts exact.
        prev = self.manifest.pending_txns
        exempt: frozenset = frozenset()
        if prev:
            pend_tbl = pa.concat_tables(
                [
                    pq.read_table(os.path.join(self.lake_dir, r["path"]))
                    for r in prev
                ]
            )
            exempt = frozenset(pend_tbl.column("offset").to_pylist())
            off_arr = pa.array(sorted(exempt), pa.int64())

            def drop_parked(t: pa.Table, _o=off_arr) -> pa.Table:
                return t.filter(
                    pc.invert(pc.is_in(t.column("offset"), value_set=_o))
                )

            ds = ds.map_batches(
                drop_parked, batch_format="pyarrow", zero_copy_batch=True
            )
            # additive evolution may have widened the schema since the parked
            # epoch: conform both sides to the union schema
            target = evolve_schema(pend_tbl.schema, schema)
            pend_tbl = conform_batch(pend_tbl, target)
            if target != schema:
                ds = ds.map_batches(
                    lambda t, _s=target: conform_batch(t, _s),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                )
                schema = target
            ds = ds.union(ray.data.from_arrow(pend_tbl))
        # materialize the prepared epoch ONCE (filters + parked union); every
        # later pass runs as raw tasks over these block refs — no further
        # Dataset executions, whose per-execution fixed cost dominated the
        # txn-vs-plain gap at sf0.1 (an epoch is a bounded micro-batch, and
        # the object store spills if it doesn't fit)
        ds = ds.materialize()
        refs = ds.to_arrow_refs()

        # pass 1 — completion counts by DISTINCT offset (at-least-once
        # duplicates must not fake completion): the per-block distinct
        # (txn_id, offset, txn_n) reduction is FUSED into the split task
        # (_txn_count_split), exchanged to COARSE txn-id buckets with the
        # same two-stage task exchange the apply path uses (no sort
        # machinery — a per-transaction groupby would pay one Python group
        # call per transaction, millions at scale; a bucket task does one
        # vectorized pandas groupby over thousands of transactions); only the
        # tiny (txn_id, seen, expected) table reaches the driver
        nb = _TXN_BUCKETS
        split_task = ray.remote(_txn_count_split).options(num_returns=nb)
        srefs = [split_task.remote(r, nb) for r in refs]
        stat_task = ray.remote(_txn_bucket_stats)
        stat_tbls = ray.get(
            [
                stat_task.remote(*[srefs[i][b] for i in range(len(srefs))])
                for b in range(nb)
            ]
        ) if srefs else []
        stat_tbls = [t for t in stat_tbls if t is not None]
        parts = (
            pa.concat_tables(stat_tbls).to_pandas()
            if stat_tbls
            else __import__("pandas").DataFrame(
                columns=["txn_id", "seen", "expected"]
            )
        )
        agg = parts.set_index("txn_id")
        over = agg[agg["seen"] > agg["expected"]]
        if len(over):
            raise ValueError(
                f"apply_transactional: {len(over)} transactions carry more "
                f"events than their txn_n (duplicate offsets in the stream?)"
            )
        incomplete = agg.index[agg["seen"] < agg["expected"]]
        held_txns = [int(t) for t in incomplete]

        # pass 2 — ONE task per block splits (complete, held) in a single
        # filter pass; held fragments (small by nature — transactions in
        # flight at the boundary) gather to the driver for the sidecar,
        # complete refs feed the apply exchange directly
        label = epoch if epoch is not None else self.manifest.last_epoch + 1
        pending_list: list[dict] = []
        held_rows = 0
        inc_arr = pa.array(sorted(held_txns), pa.int64()) if held_txns else None
        part_task = ray.remote(_txn_partition).options(num_returns=2)
        pairs = [part_task.remote(r, inc_arr) for r in refs]
        complete_refs = [p[0] for p in pairs]
        if held_txns:
            held_tbls = [t for t in ray.get([p[1] for p in pairs]) if t.num_rows]
            held_tbl = (
                pa.concat_tables(held_tbls) if held_tbls else schema.empty_table()
            )
            held_rows = held_tbl.num_rows
            rel = os.path.join("pending", f"epoch-{label:06d}.parquet")
            atomic_parquet(held_tbl, os.path.join(self.lake_dir, rel))
            pending_list = [
                {"path": rel, "rows": held_rows, "txns": len(held_txns)}
            ]

        complete_schema = pa.schema(
            [f for f in schema if f.name not in ("txn_id", "txn_n")]
        )
        m = self.apply(
            ray.data.from_arrow_refs(complete_refs)
            if complete_refs
            else ray.data.from_arrow(complete_schema.empty_table()),
            epoch=epoch,
            detect_hot=detect_hot,
            _exempt_offsets=exempt or None,
            _pending_txns=pending_list,
            _schema=complete_schema,
        )
        return {**m, "held_events": held_rows, "held_txns": len(held_txns)}

    def _exchange_apply(
        self, source, event_schema: pa.Schema, applier: EpochApplier, hot_keys,
        from_files: bool = False, enrich=None,
    ) -> "pd.DataFrame":
        """Two-stage task exchange: every raw block is conformed + routed +
        split by slot in one fused task (one argsort + zero-copy slices), then
        one task per active slot concats its chunks and applies. Object refs
        are the only intermediate — no sort machinery, no disk. Task retries
        are safe: appliers write deterministic files and the manifest commit is
        driver-side."""
        import pandas as pd
        import ray

        from ..hashing import partition_ids

        hot_pids: set[int] = set()
        if hot_keys:
            hot_pids = set(int(p) for p in partition_ids(sorted(hot_keys), self.P))
        slots, slot_of_skey = _make_slots(self.P, self.num_salts, hot_pids)
        nslots = len(slots)

        apply_slot = ray.remote(_apply_slot)
        applier_ref = ray.put(applier)
        schema_ref = ray.put(event_schema)
        assigner_ref = ray.put(
            AssignPartitions(
                self.P, hot_keys, self.num_salts, applier.late_cutoff_us,
                valid_ops=self._valid_ops,
                constraints=applier.constraints,
            )
        )
        slot_lookup_ref = ray.put(slot_of_skey)
        if from_files:
            units = source
            if not units:
                return pd.DataFrame()
            if enrich is None:
                # one fused read→route task per row-group unit
                split = ray.remote(_split_file_unit)
                split_refs = [
                    split.options(num_returns=nslots).remote(
                        path, rgs, schema_ref, assigner_ref, slot_lookup_ref,
                        nslots, None, off, ln
                    )
                    for path, rgs, off, ln in units
                ]
                n_inputs = len(units)
            else:
                # fused enrichment: decode each row-group unit once (stage A),
                # enrich+route per row-range slice (stage B) — compute
                # parallelism tracks the row ranges, decode stays single-pass
                groups: dict[tuple, list[tuple]] = {}
                for path, rgs, off, ln in units:
                    groups.setdefault((path, tuple(rgs)), []).append((off, ln))
                read = ray.remote(_read_unit_slices)
                block_refs = []
                for (path, rgs), bounds in groups.items():
                    if len(bounds) == 1:
                        block_refs.append(read.remote(path, list(rgs), bounds))
                    else:
                        block_refs.extend(
                            read.options(num_returns=len(bounds)).remote(
                                path, list(rgs), bounds
                            )
                        )
                split = ray.remote(_split_block)
                split_refs = [
                    split.options(num_returns=nslots).remote(
                        r, schema_ref, assigner_ref, slot_lookup_ref, nslots, enrich
                    )
                    for r in block_refs
                ]
                n_inputs = len(block_refs)
        else:
            refs = source.to_arrow_refs()
            if not refs:
                return pd.DataFrame()
            split = ray.remote(_split_block)
            split_refs = [
                split.options(num_returns=nslots).remote(
                    r, schema_ref, assigner_ref, slot_lookup_ref, nslots, enrich
                )
                for r in refs
            ]
            n_inputs = len(refs)
        if nslots == 1:
            split_refs = [[r] for r in split_refs]
        stats_refs = [
            apply_slot.remote(applier_ref, *[split_refs[b][s] for b in range(n_inputs)])
            for s in range(nslots)
        ]
        tables = [t for t in ray.get(stats_refs) if t is not None]
        if not tables:
            return pd.DataFrame()
        return pa.concat_tables(tables).to_pandas()

    def compact(
        self,
        force: bool = False,
        policy: str | None = None,
        rewrite_single: bool = False,
    ) -> int:
        """Merge run files of partitions with more than ``max_runs`` runs
        (LSM compaction). A partition's runs are already co-located on disk,
        so compaction is one plain Ray task per partition — embarrassingly
        parallel, NO shuffle. Crash-safe: base files are written under the
        next manifest version's name and are invisible until the compaction
        commit; a crash leaves vacuumable orphans.

        ``policy`` (default: the lake's ``compaction_policy``):
        - ``"full"``  — merge ALL runs into one base (max read speed, but
          rewrites the whole partition every time: O(partition) write
          amplification per compaction).
        - ``"tiered"`` — leveled LSM merge: keep every run whose row count
          exceeds the SUM of all smaller runs (it dominates its level), merge
          the rest. A settled base is never rewritten by delta compactions;
          similar-sized runs merge together; each byte is rewritten O(log)
          times instead of O(ingests). Sound because LWW winner-merge is
          associative — subset-then-rest at read equals one-shot merge — and
          tombstones are retained in the tier. The partition ``rows`` lineage
          counter becomes an upper bound (keys present in both tier and base
          count twice) until a major merge. At 100 TB this is the difference
          between compaction cost tracking the INGEST rate vs the LAKE size.

        ``rewrite_single=True`` additionally rewrites partitions that hold a
        SINGLE run — a pure copy, useless for read speed, but it re-homes
        every live byte under this lake's own dir (severs a shallow clone's
        dependency on its source files).

        Returns the number of partitions compacted.
        """
        import ray

        policy = policy or self.compaction_policy
        min_runs = 0 if rewrite_single else (1 if force else self.max_runs)
        pids = [
            p
            for p in range(self.P)
            if len(self.manifest.partition(p)["runs"]) > min_runs
            # a lone run carrying a deletion vector still wants its fold —
            # rewriting it drops the merge-on-read mask from the hot path
            or any(r.get("dv_rows") for r in self.manifest.partition(p)["runs"])
        ]
        if not pids:
            return 0
        state_schema = self.manifest.schema
        version = self.manifest.version + 1
        lake_dir = self.lake_dir

        compact_task = ray.remote(_compact_partition)
        schema_ref = ray.put(state_schema)
        inputs: dict[int, list[str]] = {}
        for pid in pids:
            runs = self.manifest.partition(pid)["runs"]
            if policy == "tiered":
                # merge the smallest-run prefix; stop at the first run that
                # DOMINATES everything smaller (rows > sum below) — that run
                # and all larger ones are settled levels, left untouched
                by_size = sorted(runs, key=lambda r: (r["rows"], r["path"]))
                sel, below = [], 0
                for r in by_size:
                    if below > 0 and r["rows"] > below:
                        break
                    sel.append(r)
                    below += r["rows"]
            else:
                sel = list(runs)
            need = 1 if rewrite_single or any(
                r.get("dv_rows") for r in sel
            ) else 2  # a lone DV'd run still folds its merge-on-read mask
            if len(sel) >= need:
                inputs[pid] = [r["path"] for r in sel]
        if not inputs:
            return 0
        prefix = "tier" if policy == "tiered" else "base"
        # tombstone GC (full merges only): safe exactly when the lateness
        # watermark guarantees no applicable event can still target the
        # deleted key's pre-horizon past
        horizon = None
        if prefix == "base" and self.allowed_lateness_us is not None:
            w = self._watermark_us()
            if w is not None:
                horizon = w - self.allowed_lateness_us
        stats_refs = [
            compact_task.remote(
                lake_dir,
                pid,
                [os.path.join(lake_dir, p) for p in paths],
                schema_ref,
                version,
                prefix,
                self.merge_mode,
                horizon,
            )
            for pid, paths in inputs.items()
        ]
        updates = {}
        for row in ray.get(stats_refs):
            pid = int(row["pid"])
            updates[pid] = {
                "runs": [
                    {
                        "path": row["path"],
                        "rows": int(row["rows"]),
                        "tombstones": int(row["tombstones"]),
                    }
                    | dict(row["ts_stats"])
                ],
                "replaces": True,
                "max_offset": self.manifest.partition(pid)["max_offset"],
                "rows": int(row["rows"]) - int(row["tombstones"]),
                # exact inputs merged: the commit keeps every run NOT in this
                # list (the tiered base, plus anything a concurrent writer
                # appended since — see Manifest.commit_compaction)
                "replaced_paths": inputs[pid],
            }
        self.manifest.commit_compaction(updates)
        return len(updates)

    def cluster_zorder(self, rows_per_file: int = 4096, bits: int = 12) -> int:
        """OPTIMIZE ... ZORDER BY (conv_id, ts) — Delta/Iceberg layout
        clustering for this lake. Per partition (one plain Ray task, NO
        shuffle — the hash partitioning already co-locates each key), merge
        the live runs and rewrite them as multiple Morton-ordered run files of
        ``rows_per_file`` rows, each carrying the ts stats + key bloom every
        run already gets. The SAME manifest machinery then skips files:
        ``read(since_ts=…)`` prunes old-time files, ``lookup``/
        ``explain_read(probe_blooms=True)`` prunes other-key files — pruning
        a single merged base could never do. Atomic swap via
        ``commit_compaction`` (concurrent ingest survives via
        ``replaced_paths``); serving content is provably unchanged (LWW
        merge-at-read is split-agnostic). Returns partitions rewritten."""
        import ray

        version = self.manifest.version + 1
        task = ray.remote(_cluster_partition)
        schema_ref = ray.put(self.manifest.schema)
        inputs = {
            pid: [r["path"] for r in self.manifest.partition(pid)["runs"]]
            for pid in range(self.P)
            if self.manifest.partition(pid)["runs"]
        }
        refs = [
            task.remote(
                self.lake_dir,
                pid,
                [os.path.join(self.lake_dir, p) for p in paths],
                schema_ref,
                version,
                self.merge_mode,
                rows_per_file,
                bits,
            )
            for pid, paths in inputs.items()
        ]
        updates = {}
        for row in ray.get(refs):
            if row is None:
                continue
            pid = int(row["pid"])
            rows = sum(int(r["rows"]) for r in row["runs"])
            tombs = sum(int(r["tombstones"]) for r in row["runs"])
            updates[pid] = {
                "runs": row["runs"],
                "max_offset": self.manifest.partition(pid)["max_offset"],
                "rows": rows - tombs,
                "replaced_paths": inputs[pid],
            }
        if updates:
            self.manifest.commit_compaction(updates, op="CLUSTER")
        return len(updates)

    def snapshot_sync(self, snapshot, sync_ts, detect_hot: str = "off") -> dict:
        """MERGE-style re-sync from a FULL snapshot of the source table — the
        classic snapshot-diff CDC connector (and the reference's
        ``--full-refresh`` rebuild, dbt_project.yml:11, expressed as a minimal
        incremental epoch instead of a rewrite).

        ``snapshot`` (Dataset | pa.Table | parquet path) holds the desired
        content: key columns plus every payload column EXCEPT ``ts`` — content
        provenance stays with the engine: rows whose payload is unchanged keep
        their original ts; inserted/updated rows get ``sync_ts``; missing keys
        become tombstones. Per partition, one kernel LWW-merges the committed
        runs and diffs them against the routed snapshot slice
        (`_snapshot_diff_partition`), emitting ONLY the changed rows, which
        then flow through the normal exactly-once ``apply`` epoch — resumable,
        manifest-committed, change_feed-visible. Scale shape: the snapshot
        pays one hash shuffle (unavoidable — it must meet its partitions); the
        re-apply exchange moves only the diff, O(change rate).

        ``sync_ts`` must exceed every committed row's ts (checked against the
        manifest's per-run ts stats) so the sync events always win LWW.
        Returns the apply metrics; an identical snapshot is a zero-event epoch.
        """
        import ray.data

        from ..hashing import partition_ids

        sync_us = _ts_to_us(sync_ts)
        for p in range(self.P):
            for run in self.manifest.partition(p)["runs"]:
                if "ts_max" in run and int(run["ts_max"]) >= sync_us:
                    raise ValueError(
                        f"snapshot_sync: sync_ts {sync_ts} does not exceed the "
                        f"lake's max committed ts — sync events would lose LWW"
                    )
        if isinstance(snapshot, str):
            snap_ds = ray.data.read_parquet(snapshot)
        elif isinstance(snapshot, pa.Table):
            snap_ds = ray.data.from_arrow(snapshot)
        else:
            snap_ds = snapshot
        snap_schema = _dataset_schema(snap_ds)

        state_schema = self.manifest.schema
        if state_schema is None:
            # initial load into an empty lake: the snapshot defines the payload
            payload_fields = [f for f in snap_schema if f.name not in KEY_COLUMNS]
            state_schema = pa.schema(
                [("offset", pa.int64()), ("op", pa.string())]
                + [snap_schema.field(c) for c in KEY_COLUMNS]
                + payload_fields
                + [("ts", pa.timestamp("us")), ("pid", pa.int32())]
            )
        cm_sync = self.manifest.column_mapping
        if cm_sync is not None:
            # snapshot arrives under LOGICAL names: validate against the live
            # logical surface, then rename + conform into the full physical
            # payload (dropped physicals null-backfill — their data is
            # invisible either way)
            l2p = dict(cm_sync["logical"])
            exp_fields = [
                f
                for f in state_schema
                if f.name not in INTERNAL_COLUMNS and f.name != "ts"
            ]
            p2l = {p: l for l, p in l2p.items()}
            expected_log = {
                p2l[f.name] if f.name not in _NO_MAP_COLUMNS else f.name
                for f in exp_fields
                if f.name in _NO_MAP_COLUMNS or f.name in p2l
            }
            got_log = set(snap_schema.names)
            if got_log != expected_log:
                raise ValueError(
                    f"snapshot_sync: snapshot columns {sorted(got_log)} != lake "
                    f"public columns minus ts {sorted(expected_log)}"
                )
            snap_phys = pa.schema(exp_fields)

            def _to_phys(t: pa.Table, _r=l2p, _s=snap_phys) -> pa.Table:
                return conform_batch(rename_columns_map(t, _r), _s)

            snap_ds = snap_ds.map_batches(
                _to_phys, batch_format="pyarrow", zero_copy_batch=True
            )
            snap_schema = snap_phys
        expected = {
            f.name
            for f in state_schema
            if f.name not in INTERNAL_COLUMNS and f.name != "ts"
        }
        got = set(snap_schema.names)
        if got != expected:
            raise ValueError(
                f"snapshot_sync: snapshot columns {sorted(got)} != lake public "
                f"columns minus ts {sorted(expected)}"
            )

        P = self.P
        files_by_pid = tuple(
            (p, tuple(self.manifest.live_files(p))) for p in range(P)
        )
        base_offset = max(self.manifest.committed_offsets().values(), default=-1) + 1

        def assign(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "pid", pa.array(partition_ids(batch.column("conv_id"), P), pa.int32())
            )

        # one sentinel row per partition so empty snapshot slices still diff
        # (the all-rows-deleted partition); the kernel drops them by turn_idx
        sent = pa.table(
            {
                "conv_id": pa.array([""] * P, snap_schema.field("conv_id").type),
                "turn_idx": pa.array(
                    [SENTINEL_TURN] * P, snap_schema.field("turn_idx").type
                ),
                **{
                    f.name: pa.nulls(P, f.type)
                    for f in snap_schema
                    if f.name not in KEY_COLUMNS
                },
                "pid": pa.array(range(P), pa.int32()),
            }
        ).select(list(snap_schema.names) + ["pid"])
        routed = snap_ds.map_batches(
            assign, batch_format="pyarrow", zero_copy_batch=True
        ).union(ray.data.from_arrow(sent))

        import functools as _ft

        kernel = _ft.partial(
            _snapshot_diff_partition,
            files_by_pid=files_by_pid,
            state_schema=state_schema,
            sync_ts_us=sync_us,
            base_offset=base_offset,
            merge_mode=self.merge_mode,
        )
        events = routed.groupby("pid").map_groups(
            kernel, batch_format="pyarrow"
        ).materialize()
        return self.apply(events, detect_hot=detect_hot, _physical_names=True)

    def _require_sync_ts_above_committed(self, label: str, sync_us: int) -> None:
        """Events minted at sync_us must win LWW over everything committed —
        checked against the manifest's per-run ts stats (no files opened)."""
        for p in range(self.P):
            for run in self.manifest.partition(p)["runs"]:
                if "ts_max" in run and int(run["ts_max"]) >= sync_us:
                    raise ValueError(
                        f"{label}: sync_ts does not exceed the lake's max "
                        f"committed ts — the minted events would lose LWW"
                    )

    def merge_into(
        self,
        source,
        sync_ts,
        *,
        when_matched: str = "update",
        when_not_matched: str = "insert",
        matched_predicate=None,
        detect_hot: str = "off",
    ) -> dict:
        """Delta-style predicate MERGE INTO: apply a keyed ``source``
        (Dataset | pa.Table | parquet path) against the lake under explicit
        clauses — the engine analogue of the reference's incremental merge
        models (``dbt_project.yml`` incremental materializations) generalized
        to arbitrary upstream deltas, and the missing middle between plain
        ``apply`` (caller supplies ops) and ``snapshot_sync`` (full desired
        state, absent keys deleted).

        Semantics per source key:
          matched  → ``when_matched``: 'update' (splice the source's columns
                     into the lake row's full image; emit 'U' only if it
                     actually changed, null-safe), 'delete' ('D' tombstone),
                     or 'skip'; gated by ``matched_predicate`` if given (a
                     callable over a DataFrame with ``s_<col>``/``t_<col>``
                     columns returning a bool mask).
          unmatched → ``when_not_matched``: 'insert' (unprovided payload
                     columns null) or 'skip'.
        Lake keys absent from the source are NEVER touched.

        The source may carry any SUBSET of the lake's payload columns
        (column-subset UPDATE). Scale shape: the source pays one hash shuffle
        to meet its partitions; each partition merges its runs once and the
        re-apply exchange moves only the emitted events, O(change rate).
        Exactly-once: the events flow through the normal ``apply`` epoch.
        Returns the apply metrics; an idempotent re-merge is a zero-event
        epoch."""
        import ray.data

        from ..hashing import partition_ids

        if when_matched not in ("update", "delete", "skip"):
            raise ValueError(f"merge_into: unknown when_matched {when_matched!r}")
        if when_not_matched not in ("insert", "skip"):
            raise ValueError(
                f"merge_into: unknown when_not_matched {when_not_matched!r}"
            )
        if when_matched == "skip" and when_not_matched == "skip":
            raise ValueError("merge_into: both clauses are 'skip' — nothing to do")
        state_schema = self.manifest.schema
        if state_schema is None:
            raise ValueError(
                "merge_into: lake is empty — use apply() or snapshot_sync() "
                "for the initial load"
            )
        sync_us = _ts_to_us(sync_ts)
        self._require_sync_ts_above_committed("merge_into", sync_us)

        if isinstance(source, str):
            src_ds = ray.data.read_parquet(source)
        elif isinstance(source, pa.Table):
            src_ds = ray.data.from_arrow(source)
        else:
            src_ds = source
        src_schema = _dataset_schema(src_ds)
        cm_mi = self.manifest.column_mapping
        if cm_mi is not None:
            # source arrives under LOGICAL names (live columns only); move it
            # into the physical namespace before the payload checks
            l2p = dict(cm_mi["logical"])
            live_log = set(l2p) | set(KEY_COLUMNS)
            bad = [n for n in src_schema.names if n not in live_log]
            if bad:
                raise ValueError(
                    f"merge_into: source columns {sorted(bad)} are not lake "
                    f"columns {sorted(live_log)}"
                )
            src_ds = src_ds.map_batches(
                lambda t, _r=l2p: rename_columns_map(t, _r),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            src_schema = pa.schema(
                [pa.field(l2p.get(f.name, f.name), f.type) for f in src_schema]
            )
        payload = {
            f.name
            for f in state_schema
            if f.name not in KEY_COLUMNS
            and f.name not in INTERNAL_COLUMNS
            and f.name != "ts"
        }
        got = set(src_schema.names)
        if not set(KEY_COLUMNS) <= got:
            raise ValueError(f"merge_into: source must carry key columns {KEY_COLUMNS}")
        extra = got - set(KEY_COLUMNS) - payload
        if extra:
            raise ValueError(
                f"merge_into: source columns {sorted(extra)} are not lake "
                f"payload columns {sorted(payload)}"
            )
        if not (got - set(KEY_COLUMNS)):
            raise ValueError("merge_into: source carries no payload columns")

        P = self.P
        files_by_pid = tuple((p, tuple(self.manifest.live_files(p))) for p in range(P))
        base_offset = max(self.manifest.committed_offsets().values(), default=-1) + 1

        def assign(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "pid", pa.array(partition_ids(batch.column("conv_id"), P), pa.int32())
            )

        kernel = functools.partial(
            _merge_into_partition,
            files_by_pid=files_by_pid,
            state_schema=state_schema,
            sync_ts_us=sync_us,
            base_offset=base_offset,
            when_matched=when_matched,
            when_not_matched=when_not_matched,
            matched_predicate=matched_predicate,
            merge_mode=self.merge_mode,
        )
        events = (
            src_ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("pid")
            .map_groups(kernel, batch_format="pyarrow")
            .materialize()
        )
        return self.apply(events, detect_hot=detect_hot, _physical_names=True)

    def expire_rows(self, before_ts, sync_ts, detect_hot: str = "off") -> dict:
        """Row TTL / retention: tombstone every live row whose winning ts is
        below ``before_ts`` — GDPR-style retention expressed as ordinary 'D'
        change events through the exactly-once epoch path, so the deletion is
        change-feed-visible and time-travelable (the rows stay reconstructable
        until ``vacuum``-after-``compact`` reclaims their runs). One Ray task
        per partition, NO shuffle (routing owns the keys); the re-apply
        exchange moves only the tombstones. Returns the apply metrics."""
        import ray
        import ray.data

        state_schema = self.manifest.schema
        if state_schema is None:
            raise ValueError("expire_rows: lake is empty")
        cutoff_us = _ts_to_us(before_ts)
        sync_us = _ts_to_us(sync_ts)
        self._require_sync_ts_above_committed("expire_rows", sync_us)
        base_offset = max(self.manifest.committed_offsets().values(), default=-1) + 1
        task = ray.remote(_expire_partition)
        schema_ref = ray.put(state_schema)
        refs = [
            task.remote(
                self.manifest.live_files(pid),
                schema_ref,
                cutoff_us,
                sync_us,
                base_offset,
                self.merge_mode,
            )
            for pid in range(self.P)
        ]
        return self.apply(
            ray.data.from_arrow_refs(refs),
            detect_hot=detect_hot,
            _physical_names=True,
        )

    def delete_where(
        self,
        spec: dict,
        sync_ts=None,
        detect_hot: str = "off",
        mode: str = "tombstone",
    ) -> dict:
        """Predicate DELETE (the Delta ``DELETE FROM t WHERE …`` DML verb):
        tombstone every live row whose converged state satisfies the
        constraint-shaped predicate spec — ``{"name": …, "column": …, "op":
        "=="|"!="|"<"|"<="|">"|">="|"in"|"matches"|"not_null", "value": …}``,
        the same grammar (and SQL translation) as CHECK constraints and row
        policies, with DML WHERE semantics (a NULL comparison deletes
        nothing). Two physical modes, same logical result:

        - ``mode="tombstone"`` (default): ordinary 'D' change events through
          the exactly-once epoch path (needs ``sync_ts``) — change-feed rows
          carry the delete explicitly, and the tombstones block late
          lower-ts events for the deleted keys.
        - ``mode="dv"``: Delta-style DELETION VECTORS — per-run positional
          sidecars on hardlink-renamed run names, NO data bytes moved and NO
          events written (``sync_ts`` unused). Reads merge-on-read the mask;
          the next compaction folds it into rewritten bytes. Snapshot diffs
          (``change_feed``) still classify the deletes because both versions
          resolve their own run names. Unlike tombstone mode the keys vanish
          entirely, so a genuinely NEW event for a deleted key recreates it
          (Delta semantics).

        One Ray task per partition, NO shuffle (routing owns the keys).
        Returns the apply metrics (tombstone) or the vectorize summary (dv)."""
        import ray
        import ray.data

        from .constraints import validate_spec

        state_schema = self.manifest.schema
        if state_schema is None:
            raise ValueError("delete_where: lake is empty")
        spec = validate_spec(spec)
        if spec["op"] == "fk":
            raise ValueError("delete_where: fk specs are constraint-only")
        cm = self.manifest.column_mapping
        if cm:
            spec = {**spec, "column": dict(cm["logical"]).get(
                spec["column"], spec["column"]
            )}
        if mode == "dv":
            version = self.manifest.version + 1
            task = ray.remote(_dv_partition)
            schema_ref = ray.put(state_schema)
            refs = [
                task.remote(
                    self.lake_dir,
                    pid,
                    self.manifest.partition(pid)["runs"],
                    schema_ref,
                    spec,
                    version,
                    self.merge_mode,
                )
                for pid in range(self.P)
            ]
            updates = {}
            rows_masked = 0
            for row in ray.get(refs):
                if row is None:
                    continue
                pid = int(row["pid"])
                updates[pid] = {
                    "runs": row["runs"],
                    "max_offset": self.manifest.partition(pid)["max_offset"],
                    "rows": sum(
                        int(r["rows"]) - int(r["tombstones"]) for r in row["runs"]
                    ),
                    "replaced_paths": row["replaced"],
                }
                rows_masked += int(row["masked"])
            if updates:
                self.manifest.commit_compaction(updates, op="DELETE_DV")
            return {
                "partitions_vectorized": len(updates),
                "rows_masked": rows_masked,
            }
        if mode != "tombstone":
            raise ValueError(f"delete_where: unknown mode {mode!r}")
        if sync_ts is None:
            raise ValueError("delete_where: tombstone mode needs sync_ts")
        sync_us = _ts_to_us(sync_ts)
        self._require_sync_ts_above_committed("delete_where", sync_us)
        base_offset = max(self.manifest.committed_offsets().values(), default=-1) + 1
        task = ray.remote(_delete_where_partition)
        schema_ref = ray.put(state_schema)
        refs = [
            task.remote(
                self.manifest.live_files(pid),
                schema_ref,
                spec,
                sync_us,
                base_offset,
                self.merge_mode,
            )
            for pid in range(self.P)
        ]
        return self.apply(
            ray.data.from_arrow_refs(refs),
            detect_hot=detect_hot,
            _physical_names=True,
        )

    def update_where(
        self,
        spec: dict,
        set_values: dict,
        sync_ts=None,
        detect_hot: str = "off",
    ) -> dict:
        """Predicate UPDATE (the Delta ``UPDATE t SET … WHERE …`` DML verb):
        emit a FULL-IMAGE 'U' change event through the exactly-once epoch
        path for every live row whose converged state satisfies the
        constraint-shaped predicate spec — the same grammar (and SQL
        translation) as CHECK constraints, row policies and ``delete_where``,
        with DML WHERE semantics (a NULL comparison updates nothing).

        ``set_values`` maps payload columns to constant new values
        (``None`` = ``SET col = NULL``). The key columns (conv_id, turn_idx)
        and the LWW ordering column ``ts`` cannot be assigned: the update
        event carries ``sync_ts``, so it wins LWW over every stored version
        of the key, is change-feed-visible and time-travelable, and a later
        (higher-ts) event for the key overrides it exactly like any upsert.
        Logical (column-mapped) names are accepted in both the predicate and
        the SET keys.

        One Ray task per partition, NO shuffle (routing owns the keys).
        Returns the apply metrics."""
        import ray
        import ray.data

        from .constraints import validate_spec

        state_schema = self.manifest.schema
        if state_schema is None:
            raise ValueError("update_where: lake is empty")
        spec = validate_spec(spec)
        if spec["op"] == "fk":
            raise ValueError("update_where: fk specs are constraint-only")
        if not isinstance(set_values, dict) or not set_values:
            raise ValueError("update_where: set_values must be a non-empty dict")
        cm = self.manifest.column_mapping
        logical = dict(cm["logical"]) if cm else {}
        if cm:
            spec = {**spec, "column": logical.get(spec["column"], spec["column"])}
            set_values = {
                logical.get(c, c): v for c, v in set_values.items()
            }
        frozen = set(KEY_COLUMNS) | set(INTERNAL_COLUMNS) | {"ts"}
        for c, v in set_values.items():
            if c in frozen:
                raise ValueError(
                    f"update_where: column {c!r} is a key / LWW-order / "
                    "internal column and cannot be assigned"
                )
            idx = state_schema.get_field_index(c)
            if idx < 0:
                raise ValueError(f"update_where: unknown column {c!r}")
            if v is not None:
                pa.scalar(v, state_schema.field(idx).type)  # type-check now
        if sync_ts is None:
            raise ValueError("update_where: needs sync_ts")
        sync_us = _ts_to_us(sync_ts)
        self._require_sync_ts_above_committed("update_where", sync_us)
        base_offset = max(self.manifest.committed_offsets().values(), default=-1) + 1
        task = ray.remote(_update_where_partition)
        schema_ref = ray.put(state_schema)
        refs = [
            task.remote(
                self.manifest.live_files(pid),
                schema_ref,
                spec,
                set_values,
                sync_us,
                base_offset,
                self.merge_mode,
            )
            for pid in range(self.P)
        ]
        return self.apply(
            ray.data.from_arrow_refs(refs),
            detect_hot=detect_hot,
            _physical_names=True,
        )

    def reshard(self, dest_dir: str, num_partitions: int) -> "CdcLake":
        """Rewrite the lake under a new partition count — the scale-the-lake
        operation (P is otherwise pinned at creation so checkpoints line up).

        One streaming pass: read every live run (winners + tombstones, so late
        events still cannot resurrect deletes after the move), recompute
        ``pid = stable_hash(conv_id) % new_P``, hash-shuffle, and write one
        LWW-merged base run per NEW partition into ``dest_dir``, committed
        atomically through a fresh manifest (same exactly-once property: a
        crashed reshard leaves an uncommitted dest that simply re-runs).

        Checkpoints: every new partition's max_offset becomes the GLOBAL
        high-water mark (offsets are a monotone stream position, so any event
        at or below it was delivered somewhere pre-reshard; replaying an old
        epoch into the new lake dedups everything, and genuinely new events
        are above it). Epoch numbering continues from the source so resumed
        producers line up. The source lake is not touched.
        """
        import functools as _ft

        import ray.data

        from ..hashing import partition_ids

        if Manifest(dest_dir).schema is not None:
            raise ValueError(f"reshard: destination {dest_dir} is not empty")
        state_schema = self.manifest.schema
        if state_schema is None:
            raise ValueError("reshard: source lake is empty")
        files: list[str] = []
        dv_files: list[str] = []
        for _pid in range(self.P):
            for run in self.manifest.partition(_pid)["runs"]:
                (dv_files if run.get("dv_rows") else files).append(
                    os.path.join(self.lake_dir, run["path"])
                )
        epoch = max(self.manifest.last_epoch, 0)
        global_hw = max(self.manifest.committed_offsets().values(), default=-1)

        def assign(batch: pa.Table, P=num_partitions) -> pa.Table:
            return batch.set_column(
                batch.schema.get_field_index("pid"),
                "pid",
                pa.array(partition_ids(batch.column("conv_id"), P), pa.int32()),
            )

        scan = ray.data.read_parquet(files, schema=state_schema) if files else None
        if dv_files:
            import ray

            _mt = ray.remote(_masked_run_read)
            _sr = ray.put(state_schema)
            dv_ds = ray.data.from_arrow_refs([_mt.remote(f, _sr) for f in dv_files])
            scan = dv_ds if scan is None else scan.union(dv_ds)
        stats = (
            scan
            .map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("pid")
            .map_groups(
                _ft.partial(
                    _reshard_partition, lake_dir=dest_dir, epoch=epoch,
                    merge_mode=self.merge_mode,
                ),
                batch_format="pyarrow",
            )
            .to_pandas()
        )
        updates = {}
        for row in stats.itertuples():
            updates[int(row.pid)] = {
                "runs": [
                    {
                        "path": row.path,
                        "rows": int(row.rows),
                        "tombstones": int(row.tombstones),
                    }
                    | json.loads(row.ts_stats_json)
                ],
                "replaces": True,
                "max_offset": global_hw,
                "rows": int(row.rows) - int(row.tombstones),
            }
        # partitions that received no keys still need their checkpoint row
        for p in range(num_partitions):
            updates.setdefault(
                p, {"runs": [], "replaces": True, "max_offset": global_hw, "rows": 0}
            )
        dest = CdcLake(
            dest_dir, num_partitions=num_partitions, merge_mode=self.merge_mode
        )
        dest.manifest.commit_epoch(
            epoch,
            updates,
            schema=state_schema,
            num_partitions=num_partitions,
            metrics_delta={"resharded_rows": int(stats["rows"].sum())},
        )
        return dest

    # -- read path ---------------------------------------------------------
    def _public_columns(self) -> list[str]:
        s = self._event_schema()
        return [f.name for f in s if f.name not in INTERNAL_COLUMNS]

    def _manifest_at(
        self,
        epoch: int | None = None,
        version: int | None = None,
        offset: int | None = None,
    ):
        """Resolve a pinned snapshot manifest from exactly one of
        epoch/version/offset (offset = binlog position: the newest snapshot
        whose committed watermark is ≤ it)."""
        given = sum(x is not None for x in (epoch, version, offset))
        if given != 1:
            raise ValueError("pass exactly one of epoch= / version= / offset=")
        if offset is not None:
            version = self.manifest.version_for_offset(offset)
        elif version is None:
            version = self.manifest.version_for_epoch(epoch)
        return self.manifest.at_version(version)

    def read(
        self,
        columns: list[str] | None = None,
        since_ts=None,
        until_ts=None,
        where: dict | None = None,
    ):
        """Converged lake state as a streaming Dataset: one merged, tombstone-free,
        ``(conv_id, turn_idx)``-sorted group per partition. ``columns`` prunes
        the projection AT THE PARQUET READ (plus the key/LWW internals the
        merge needs) — a 2-column scan of a wide transcript lake never decodes
        the text payload. ``since_ts``/``until_ts`` (inclusive bounds, anything
        ``pandas.Timestamp`` accepts) filter the CONVERGED rows on ``ts`` and
        use the manifest's per-run ts stats to skip whole runs (see
        ``_read_manifest`` for which bound may prune and why). ``where`` is a
        constraint-shaped predicate spec (the delete_where / row-policy
        grammar, LOGICAL column names) applied to the CONVERGED rows with SQL
        WHERE semantics — a NULL comparison drops the row; the predicate
        column rides the pruned scan even when not projected."""
        return self._read_manifest(
            self.manifest, columns, since_ts, until_ts, where=where
        )

    def explain_read(
        self,
        since_ts=None,
        conv_ids=None,
        epoch: int | None = None,
        version: int | None = None,
        probe_blooms: bool = False,
    ) -> pa.Table:
        """EXPLAIN for a serving read: the per-partition plan — runs kept vs
        pruned — WITHOUT reading any data. Mirrors ``_read_manifest``'s
        ``since_ts`` stats pruning and ``lookup_many``'s partition routing;
        ``probe_blooms=True`` additionally consults the per-run key blooms
        (sidecar reads only, still no data I/O) the way ``lookup_many`` will.
        One row per partition: planned counts and the max rows a scan could
        touch. Metadata-only by design — not SQL-expressible, covered by
        tests asserting the plan equals the executed read's stats."""
        from ..hashing import partition_ids
        from .applier import bloom_may_contain

        m = (
            self.manifest
            if epoch is None and version is None
            else self._manifest_at(epoch, version)
        )
        since_us = _ts_to_us(since_ts)
        touched: set[int] | None = None
        ids_by_pid: dict[int, list] = {}
        if conv_ids is not None:
            ids = list(conv_ids)
            pids = partition_ids(ids, m.num_partitions or self.P)
            touched = set(int(p) for p in pids)
            for c, p in zip(ids, pids):
                ids_by_pid.setdefault(int(p), []).append(c)
        rows = []
        for pid in range(m.num_partitions or self.P):
            part = m.partition(pid)
            runs_total = len(part["runs"])
            if touched is not None and pid not in touched:
                # the whole partition is skipped by key routing
                rows.append((pid, runs_total, 0, runs_total, 0, 0, 0))
                continue
            planned = pruned_ts = pruned_bloom = 0
            rows_max = 0
            for run in part["runs"]:
                if (
                    since_us is not None
                    and self.merge_mode != "patch"
                    and "ts_max" in run
                    and int(run["ts_max"]) < since_us
                ):
                    pruned_ts += 1
                    continue
                if probe_blooms and ids_by_pid.get(pid):
                    ap = os.path.join(m.lake_dir, run["path"])
                    if not any(
                        bloom_may_contain(ap, c) for c in ids_by_pid[pid]
                    ):
                        pruned_bloom += 1
                        continue
                planned += 1
                rows_max += int(run["rows"])
            rows.append(
                (pid, runs_total, planned, 0, pruned_ts, pruned_bloom, rows_max)
            )
        schema = pa.schema(
            [
                ("pid", pa.int32()),
                ("runs_total", pa.int64()),
                ("runs_planned", pa.int64()),
                ("pruned_by_routing", pa.int64()),
                ("pruned_by_ts", pa.int64()),
                ("pruned_by_bloom", pa.int64()),
                ("rows_max", pa.int64()),
            ]
        )
        cols = list(zip(*rows)) if rows else [[] for _ in schema]
        return pa.table(
            {f.name: pa.array(c, f.type) for f, c in zip(schema, cols)},
            schema=schema,
        )

    def tag(self, name: str, version: int | None = None) -> int:
        """Name a snapshot (git-tag / Iceberg-ref semantics): records
        ``name → version`` (default: CURRENT) in a sidecar, atomic-replaced.
        Tags are aliases, not commits — no new manifest version; re-tagging an
        existing name raises (delete via ``untag``). The tagged version stays
        readable until ``vacuum`` (same retention rule as any time travel)."""
        import json as _json

        v = int(version if version is not None else self.manifest.version)
        if v < 1 or v > self.manifest.version:
            raise ValueError(f"tag {name!r}: no committed version {v}")
        path = os.path.join(self.manifest.dir, "TAGS.json")
        tags = self.tags()
        if name in tags:
            raise ValueError(f"tag {name!r} already exists (version {tags[name]})")
        tags[name] = v
        _atomic_write(path, _json.dumps(tags))
        return v

    def untag(self, name: str) -> None:
        import json as _json

        tags = self.tags()
        if name not in tags:
            raise KeyError(name)
        del tags[name]
        _atomic_write(os.path.join(self.manifest.dir, "TAGS.json"), _json.dumps(tags))

    def tags(self) -> dict[str, int]:
        import json as _json

        path = os.path.join(self.manifest.dir, "TAGS.json")
        if not os.path.exists(path):
            return {}
        with open(path) as f:
            return {k: int(v) for k, v in _json.load(f).items()}

    def read_as_of(
        self,
        epoch: int | None = None,
        version: int | None = None,
        offset: int | None = None,
        tag: str | None = None,
        columns: list[str] | None = None,
        since_ts=None,
        until_ts=None,
        where: dict | None = None,
    ):
        """Time-travel read: the converged lake AS OF a committed epoch (or a
        raw manifest version, binlog offset, or named tag), with the schema as
        of that snapshot — columns added by later additive evolution are
        absent, exactly as a reader at that point in time saw the lake.
        Snapshots stay readable until ``vacuum()`` removes data files the
        current manifest no longer references (vacuum is the retention
        horizon, the standard Delta/Iceberg rule)."""
        if tag is not None:
            if any(x is not None for x in (epoch, version, offset)):
                raise ValueError("pass exactly one of epoch/version/offset/tag")
            version = self.tags().get(tag)
            if version is None:
                raise KeyError(f"unknown tag {tag!r}")
        return self._read_manifest(
            self._manifest_at(epoch, version, offset), columns, since_ts,
            until_ts, where=where,
        )

    def _read_manifest(
        self,
        m,
        columns: list[str] | None = None,
        since_ts=None,
        until_ts=None,
        where: dict | None = None,
    ):
        """Manifest-driven merged read with stats-based data skipping.

        A run whose recorded ``ts_max`` is below ``since_ts`` is skipped
        WITHOUT being opened. That is sound: every row in such a run has
        ts < since_ts, so if one of its rows is the LWW winner for a key the
        merged row fails the filter anyway, and if it loses, the winner lives
        in a kept run and is unaffected; a skipped tombstone that wins only
        shadows rows with even lower (ts, offset), which also fail the filter.
        The UPPER bound must NOT prune runs — dropping a run whose rows all
        have ts > until_ts could un-shadow an older row that passes the
        filter — so ``until_ts`` only filters merged rows. Skip counts land in
        ``self.last_read_stats`` for observability/tests.
        """
        import ray.data

        since_us = _ts_to_us(since_ts)
        until_us = _ts_to_us(until_ts)
        if where is not None:
            from .constraints import validate_spec

            where = validate_spec(where)
            if where["op"] == "fk":
                raise ValueError("read(where=…): fk specs are constraint-only")
            cm0 = m.column_mapping
            if cm0:  # caller speaks logical names; rows carry physical ones
                where = {
                    **where,
                    "column": dict(cm0["logical"]).get(
                        where["column"], where["column"]
                    ),
                }
        P_stats = m.num_partitions or self.P
        files: list[str] = []
        dv_files: list[str] = []
        kept_per_pid: dict[int, int] = {}
        total_runs = 0
        for p in range(P_stats):
            for run in m.partition(p)["runs"]:
                total_runs += 1
                # patch mode: NO run pruning — an old run may hold the latest
                # setter of a column whose merged row passes the ts filter
                if (
                    since_us is not None
                    and self.merge_mode != "patch"
                    and "ts_max" in run
                    and int(run["ts_max"]) < since_us
                ):
                    continue
                kept_per_pid[p] = kept_per_pid.get(p, 0) + 1
                # deletion-vector'd runs can't ride the plain column scan —
                # positions need the whole file decoded; they read via
                # dedicated per-file tasks unioned in below (transient: the
                # next compaction folds vectors in and they rejoin the scan)
                (dv_files if run.get("dv_rows") else files).append(
                    os.path.join(m.lake_dir, run["path"])
                )
        self.last_read_stats = {
            "runs_total": total_runs,
            "runs_pruned": total_runs - len(files) - len(dv_files),
        }
        state_schema = m.schema
        if (not files and not dv_files) or state_schema is None:
            empty = pa.schema([("conv_id", pa.string()), ("turn_idx", pa.int32())])
            return ray.data.from_arrow(empty.empty_table())

        # physical select list + logical output names under the snapshot's
        # column mapping (identity when the lake never renamed/dropped)
        public, out_names = _mapped_public(state_schema, m.column_mapping)
        if columns is not None:
            unknown = [c for c in columns if c not in out_names]
            if unknown:
                raise KeyError(
                    f"unknown lake columns: {unknown} (have {out_names})"
                )
            # the key columns always ride along — a keyed lake read without
            # its key is never what a caller wants
            keep = [
                (p, l)
                for p, l in zip(public, out_names)
                if p in KEY_COLUMNS or l in columns
            ]
            public = [p for p, _ in keep]
            out_names = [l for _, l in keep]
            # the merge itself needs keys + LWW/tombstone internals (and the
            # where-predicate's column, even unprojected); prune everything
            # else at the decoder
            needed = list(
                dict.fromkeys(
                    KEY_COLUMNS
                    + ["ts", "offset", "op", "pid"]
                    + public
                    + ([where["column"]] if where is not None else [])
                )
            )
            state_schema = pa.schema([f for f in state_schema if f.name in needed])
        # projection travels via schema= ONLY: the Arrow dataset scanner
        # projects to the declared schema and null-fills evolution-missing
        # columns; passing columns= besides would make v0 fragments (without
        # e.g. `tool`) fail the reader's schema check
        ds = ray.data.read_parquet(files, schema=state_schema) if files else None
        if dv_files:
            import ray

            task = ray.remote(_masked_run_read)
            schema_ref = ray.put(state_schema)
            dv_ds = ray.data.from_arrow_refs(
                [task.remote(f, schema_ref) for f in dv_files]
            )
            ds = dv_ds if ds is None else ds.union(dv_ds)

        def ts_filter(t: pa.Table) -> pa.Table:
            # post-merge row filter: both bounds apply here; only the lower
            # bound was allowed to skip runs above
            if since_us is not None:
                t = t.filter(pc.greater_equal(t.column("ts").cast(pa.int64()), since_us))
            if until_us is not None:
                t = t.filter(pc.less_equal(t.column("ts").cast(pa.int64()), until_us))
            if where is not None:
                from .constraints import _predicate_true

                if where["column"] not in t.column_names:
                    return t.slice(0, 0)  # pre-evolution rows: NULL → dropped
                t = t.filter(_predicate_true(t.column(where["column"]), where))
            return t

        masks = self._active_masks()
        rfs = self._active_row_filters()
        single_run = (
            all(n <= 1 for n in kept_per_pid.values())
            and self.merge_mode != "patch"
        )
        if single_run:
            # each kept file is already LWW-resolved and key-sorted (a key in a
            # pruned sibling run either loses to this file's row or fails the
            # ts filter — _read_manifest docstring): filter + project
            def finalize(
                t: pa.Table, cols=tuple(public), outs=tuple(out_names),
                mk=masks, rf=rfs,
            ) -> pa.Table:
                return apply_masks(
                    apply_row_filters(
                        _select_renamed(ts_filter(drop_tombstones(t)), cols, outs),
                        rf,
                    ),
                    mk,
                )

            return ds.map_batches(
                finalize, batch_format="pyarrow", zero_copy_batch=True
            )

        def merge(
            group: pa.Table,
            cols=tuple(public),
            outs=tuple(out_names),
            mode=self.merge_mode,
            mk=masks,
            rf=rfs,
        ) -> pa.Table:
            merged = ts_filter(drop_tombstones(_resolve_latest(group, mode)))
            order = pc.sort_indices(
                merged, sort_keys=[(c, "ascending") for c in KEY_COLUMNS]
            )
            return apply_masks(
                apply_row_filters(
                    _select_renamed(merged.take(order), cols, outs), rf
                ),
                mk,
            )

        return ds.groupby("pid").map_groups(merge, batch_format="pyarrow")

    def change_feed(
        self,
        from_epoch: int | None = None,
        to_epoch: int | None = None,
        from_version: int | None = None,
        to_version: int | None = None,
        include_preimage: bool = False,
    ):
        """CDC-out (Delta-CDF-style change feed): per-key deltas between two
        committed snapshots as a Dataset of
        ``(change_type ∈ {insert,update,delete}, conv_id, turn_idx, <post-image
        payload — null for deletes>)``. ``include_preimage`` adds the FROM
        side's payload as ``old_*`` columns (null for inserts) — Delta CDF's
        update_preimage flattened onto the row, so a downstream consumer can
        reverse or audit the change without a second snapshot read.

        Both snapshots share the lake's partitioner (P is pinned at creation),
        so the diff is ONE plain Ray task per partition with NO shuffle: each
        task LWW-merges its partition's run files at both versions (the FROM
        side conformed to the TO schema — evolution is additive, so missing
        columns null-backfill) and classifies keys. ``from_version=0`` diffs
        against the empty lake (everything is an insert)."""
        import ray
        import ray.data

        ma = self._manifest_at(from_epoch, from_version)
        mb = self._manifest_at(to_epoch, to_version)
        state_schema = mb.schema
        if state_schema is None:
            raise ValueError("change_feed: the TO snapshot is an empty lake")
        # diff runs in the physical namespace; the TO snapshot's column
        # mapping names the output (old_* preimages follow their column)
        public, out_names = _mapped_public(state_schema, mb.column_mapping)
        P = mb.num_partitions or self.P
        diff_task = ray.remote(_diff_partition)
        schema_ref = ray.put(state_schema)
        refs = [
            diff_task.remote(
                ma.live_files(pid), mb.live_files(pid), schema_ref, public,
                include_preimage, self.merge_mode,
                tuple(self.manifest.purged_keys),
            )
            for pid in range(P)
        ]
        feed = ray.data.from_arrow_refs(refs)
        if list(public) != list(out_names):
            ren = dict(zip(public, out_names))
            ren.update(
                {f"old_{p}": f"old_{l}" for p, l in zip(public, out_names)}
            )
            feed = feed.map_batches(
                lambda t, _r=ren: rename_columns_map(t, _r),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        return feed

    def _diff_lake_args(self, other: "CdcLake"):
        """Shared validation for diff_lake / repair_from: the two lakes must
        be comparable replicas — same partition count (same key routing, so
        the diff never crosses partitions), same merge mode, same public
        column set, same column mapping. Returns (schema, public, out_names,
        purged_self, purged_other)."""
        if other.P != self.P:
            raise ValueError(
                f"diff_lake: partition counts differ ({self.P} vs {other.P}); "
                "reshard one side first — the per-partition diff needs both "
                "lakes to route keys identically"
            )
        if other.merge_mode != self.merge_mode:
            raise ValueError("diff_lake: merge modes differ")
        sa, sb = self.manifest.schema, other.manifest.schema
        if sa is None and sb is None:
            raise ValueError("diff_lake: both lakes are empty")
        schema = sb if sb is not None else sa
        if sa is not None and sb is not None and set(sa.names) != set(sb.names):
            raise ValueError(
                "diff_lake: column sets differ "
                f"({sorted(set(sa.names) ^ set(sb.names))}); evolve the "
                "narrower lake first"
            )
        cma, cmb = self.manifest.column_mapping, other.manifest.column_mapping
        if (cma or None) != (cmb or None):
            raise ValueError("diff_lake: column mappings differ")
        public, out_names = _mapped_public(schema, cmb if sb is not None else cma)
        return (
            schema,
            public,
            out_names,
            tuple(self.manifest.purged_keys),
            tuple(other.manifest.purged_keys),
        )

    def diff_lake(self, other: "CdcLake", include_preimage: bool = False):
        """Anti-entropy DIFF between two replica lakes (the cross-lake
        generalization of ``change_feed``, which only compares versions of
        ONE manifest lineage): per-key deltas that would turn SELF's served
        state into OTHER's, as a Dataset of ``(change_type ∈
        {insert,update,delete}, conv_id, turn_idx, <OTHER's post-image
        payload — null for deletes>)``. Use it to verify that two
        independently-built replicas (batch replay vs streaming ingest, a
        restored backup, a resharded twin written back at the same P)
        converged to identical state — an empty diff IS the equality proof —
        or to see exactly what diverged before ``repair_from``.

        Both lakes must share P (the partitioner is pinned by P, so a key
        lives in the same pid on both sides), merge mode, column set and
        column mapping. Each side's GDPR purge list applies to its OWN rows
        (the diff compares SERVED state). One plain Ray task per partition,
        NO shuffle."""
        import ray
        import ray.data

        schema, public, out_names, pu_a, pu_b = self._diff_lake_args(other)
        diff_task = ray.remote(_diff_partition)
        schema_ref = ray.put(schema)
        refs = [
            diff_task.remote(
                self.manifest.live_files(pid),
                other.manifest.live_files(pid),
                schema_ref,
                public,
                include_preimage,
                self.merge_mode,
                pu_a,
                pu_b,
            )
            for pid in range(self.P)
        ]
        feed = ray.data.from_arrow_refs(refs)
        if list(public) != list(out_names):
            ren = dict(zip(public, out_names))
            ren.update(
                {f"old_{p}": f"old_{l}" for p, l in zip(public, out_names)}
            )
            feed = feed.map_batches(
                lambda t, _r=ren: rename_columns_map(t, _r),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        return feed

    def repair_from(self, other: "CdcLake") -> dict:
        """Anti-entropy REPAIR: make SELF's served state equal OTHER's, by
        ADOPTING other's run files (absolute references, zero bytes copied —
        the shallow-clone / merge_branch file-sharing pattern) for exactly
        the partitions whose converged states differ. Identical partitions
        are untouched, so a mostly-in-sync replica repairs in O(diverged
        partitions) metadata. Checkpoints advance to the elementwise max, so
        a change stream already applied to either side fully dedupes if
        replayed after the repair. Timestamps, tombstones and time-travel
        history BELOW the repair commit are preserved on self; the repair
        itself is one atomic ``REPAIR`` commit.

        Like a shallow clone, the adopted files live in OTHER's directory
        until self's next compaction rewrites them locally — vacuuming OTHER
        before then invalidates them. Purge lists must match (a purge is a
        legal erasure, not divergence to repair). One diff task per
        partition, NO shuffle, no data movement."""
        import ray

        schema, public, _out, pu_a, pu_b = self._diff_lake_args(other)
        if set(pu_a) != set(pu_b):
            raise ValueError(
                "repair_from: purge lists differ; apply the missing "
                "purge_key calls first (erasure must not be repaired away)"
            )
        count_task = ray.remote(_diff_count_partition)
        schema_ref = ray.put(schema)
        counts = ray.get(
            [
                count_task.remote(
                    self.manifest.live_files(pid),
                    other.manifest.live_files(pid),
                    schema_ref,
                    public,
                    False,
                    self.merge_mode,
                    pu_a,
                    pu_b,
                )
                for pid in range(self.P)
            ]
        )
        my_offsets = self.manifest.committed_offsets()
        updates = {}
        rows_changed = 0
        for pid, n in enumerate(counts):
            if n == 0:
                continue
            rows_changed += int(n)
            theirs = other.manifest.partition(pid)
            updates[pid] = {
                "runs": [
                    {**run, "path": os.path.join(other.lake_dir, run["path"])}
                    for run in theirs["runs"]
                ],
                "max_offset": max(
                    my_offsets.get(pid, -1), theirs["max_offset"]
                ),
                "rows": theirs["rows"],
            }
        if updates:
            self.manifest.commit_compaction(updates, schema=schema, op="REPAIR")
        return {"partitions_repaired": len(updates), "rows_changed": rows_changed}

    def consume_changes(self, consumer: str, include_preimage: bool = False):
        """Incremental change-feed consumption for a NAMED consumer (the
        Kafka-consumer-group analogue for the lake's CDC-out): returns
        ``(feed, token)`` where ``feed`` is the change feed from the
        consumer's last ACKed snapshot to the CURRENT one, and ``token`` must
        be passed to ``ack_changes`` AFTER the downstream effect is durable.
        Until the ack commits, re-consuming returns the same window —
        at-least-once delivery downstream, with the cursor itself versioned in
        the manifest (crash-safe, shared across processes). A consumer that
        has never acked starts at version 0: its first window is the whole
        lake as inserts."""
        frm = self.manifest.consumers.get(consumer, 0)
        to = self.manifest.version
        if self.manifest.schema is None:
            raise ValueError("consume_changes: lake is empty")
        feed = self.change_feed(
            from_version=frm, to_version=to, include_preimage=include_preimage
        )
        return feed, {"consumer": consumer, "from_version": frm, "to_version": to}

    def ack_changes(self, token: dict) -> int:
        """Commit a consumption window: advances the named consumer's cursor
        to the window's TO version (monotone — a stale/duplicate ack is a
        no-op). Returns the new manifest version."""
        return self.manifest.commit_consumer_cursor(
            token["consumer"], int(token["to_version"])
        )

    def read_local_table(self, manifest: Manifest | None = None) -> pa.Table:
        """Pure-pyarrow converged state (no Ray) — for tests and small oracles."""
        m = manifest if manifest is not None else self.manifest
        state_schema = m.schema
        if state_schema is None:
            return pa.schema([("conv_id", pa.string())]).empty_table()
        tables = [
            load_run(f, state_schema) for f in m.live_files()
        ]
        if not tables:
            return state_schema.empty_table()
        merged = drop_tombstones(
            _resolve_latest(pa.concat_tables(tables), self.merge_mode)
        )
        order = pc.sort_indices(
            merged, sort_keys=[(c, "ascending") for c in KEY_COLUMNS]
        )
        public, out_names = _mapped_public(state_schema, m.column_mapping)
        return _select_renamed(merged.take(order), public, out_names)

    def read_local_table_as_of(
        self,
        epoch: int | None = None,
        version: int | None = None,
        offset: int | None = None,
    ) -> pa.Table:
        return self.read_local_table(self._manifest_at(epoch, version, offset))

    # -- ops ---------------------------------------------------------------
    def manifest_hot_keys(self) -> set[str]:
        return set(self.manifest._state.get("hot_keys", []))

    def checkpoints(self) -> dict[int, int]:
        return self.manifest.committed_offsets()

    def metrics(self) -> dict:
        return self.manifest.metrics

    def lineage(self) -> list[dict]:
        return list(self.manifest._state["epochs"])

    def conversation_headers(
        self, epoch: int | None = None, version: int | None = None
    ):
        """Per-conversation summary rows (conv_id, n_turns, n_tool_turns,
        first_ts, last_ts) — the engine analogue of the reference's org-header
        aggregate rows (customer360__mapping.sql:147-199), per SURVEY §7.0's
        semantic bridge. Routing co-locates a conversation's turns, so this is
        one plain Ray task per partition with NO shuffle; pass epoch/version
        for a time-traveled header table."""
        import ray
        import ray.data

        m = (
            self.manifest
            if epoch is None and version is None
            else self._manifest_at(epoch, version)
        )
        state_schema = m.schema
        if state_schema is None:
            return ray.data.from_arrow(
                pa.schema([("conv_id", pa.string())]).empty_table()
            )
        P = m.num_partitions or self.P
        task = ray.remote(_headers_partition)
        schema_ref = ray.put(state_schema)
        refs = [
            task.remote(
                m.live_files(pid), schema_ref, self.merge_mode,
                tuple(self.manifest.purged_keys),
            )
            for pid in range(P)
        ]
        return ray.data.from_arrow_refs(refs)

    def assemble_conversations(
        self, epoch: int | None = None, version: int | None = None
    ):
        """Training export: each conversation's converged turns concatenated
        into one SFT-ready document (``role: text`` lines in turn order) with
        turn/token counts — the lake-to-training-corpus bridge. Routing
        co-locates conversations, so this is one plain Ray task per partition
        with NO shuffle; pass epoch/version to export a snapshot."""
        import ray
        import ray.data

        m = (
            self.manifest
            if epoch is None and version is None
            else self._manifest_at(epoch, version)
        )
        state_schema = m.schema
        if state_schema is None:
            return ray.data.from_arrow(
                pa.schema([("conv_id", pa.string())]).empty_table()
            )
        P = m.num_partitions or self.P
        task = ray.remote(_assemble_partition)
        schema_ref = ray.put(state_schema)
        refs = [
            task.remote(
                m.live_files(pid), schema_ref, self.merge_mode,
                tuple(self.manifest.purged_keys),
            )
            for pid in range(P)
        ]
        return ray.data.from_arrow_refs(refs)

    def merged_turns(self, epoch: int | None = None, version: int | None = None):
        """Chat-data repair: coalesce CONSECUTIVE same-role turns of each
        conversation into one message (text lines joined, first turn_idx kept,
        latest ts) — the alternation fix applied before SFT formatting. One
        plain Ray task per partition, NO shuffle (routing co-locates every
        turn of a conversation)."""
        import ray
        import ray.data

        m = (
            self.manifest
            if epoch is None and version is None
            else self._manifest_at(epoch, version)
        )
        state_schema = m.schema
        if state_schema is None:
            return ray.data.from_arrow(
                pa.schema([("conv_id", pa.string())]).empty_table()
            )
        P = m.num_partitions or self.P
        task = ray.remote(_merged_turns_partition)
        schema_ref = ray.put(state_schema)
        refs = [
            task.remote(
                m.live_files(pid), schema_ref, self.merge_mode,
                tuple(self.manifest.purged_keys),
            )
            for pid in range(P)
        ]
        return ray.data.from_arrow_refs(refs)

    def context_pairs(
        self, k: int = 4, epoch: int | None = None, version: int | None = None
    ):
        """Training-pair export: for every assistant turn with at least one
        preceding turn, (context = up-to-``k`` preceding ``role: text`` lines,
        target = the assistant text) — the next-turn-prediction dataset a chat
        lake feeds to SFT. One plain Ray task per partition, NO shuffle."""
        import ray
        import ray.data

        m = (
            self.manifest
            if epoch is None and version is None
            else self._manifest_at(epoch, version)
        )
        state_schema = m.schema
        if state_schema is None:
            return ray.data.from_arrow(
                pa.schema([("conv_id", pa.string())]).empty_table()
            )
        P = m.num_partitions or self.P
        task = ray.remote(_context_pairs_partition)
        schema_ref = ray.put(state_schema)
        refs = [
            task.remote(
                m.live_files(pid), schema_ref, self.merge_mode,
                tuple(self.manifest.purged_keys), k,
            )
            for pid in range(P)
        ]
        return ray.data.from_arrow_refs(refs)

    def analyze(self, k: int = 64) -> pa.Table:
        """ANALYZE TABLE: per-column statistics of the CURRENT live state —
        exact row/null counts and a deterministic KMV distinct estimate
        (``n_sketch < k`` means the count was exact). One Ray task per
        partition emits ≤ k hashes + two counters per column; the driver
        merge is O(columns · k). Logical column names (post-RENAME)."""
        import ray

        state_schema = self.manifest.schema
        if state_schema is None:
            raise ValueError("analyze: lake is empty")
        task = ray.remote(_analyze_partition)
        schema_ref = ray.put(state_schema)
        parts = ray.get(
            [
                task.remote(
                    self.manifest.live_files(pid), schema_ref, self.merge_mode, k
                )
                for pid in range(self.P)
            ]
        )
        merged: dict[str, dict] = {}
        order: list[str] = []
        for t in parts:
            for r in t.to_pylist():
                c = r["column"]
                if c not in merged:
                    merged[c] = {"n_live": 0, "null_count": 0, "hashes": set()}
                    order.append(c)
                m = merged[c]
                m["null_count"] += r["null_count"]
                m["hashes"].update(r["hashes"])
        # n_live is per-partition state rows — identical for every column of a
        # partition; sum over partitions via any one column's contributions
        n_live = sum(
            t.column("n_live")[0].as_py() if t.num_rows else 0 for t in parts
        )
        phys, names = _mapped_public(
            pa.schema(
                [state_schema.field(c) for c in order if c in state_schema.names]
            ),
            self.manifest.column_mapping,
        )
        ren = dict(zip(phys, names))
        rows = []
        for c in order:
            hs = sorted(merged[c]["hashes"])[:k]
            if len(hs) < k:
                est = float(len(hs))
            else:
                est = (k - 1) / (int(hs[-1][:_KMV_FRAC], 16) / float(16 ** _KMV_FRAC))
            rows.append(
                {
                    "column": ren.get(c, c),
                    "n_live": int(n_live),
                    "null_count": int(merged[c]["null_count"]),
                    "n_sketch": len(hs),
                    "n_distinct_est": est,
                }
            )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [
                    ("column", pa.string()),
                    ("n_live", pa.int64()),
                    ("null_count", pa.int64()),
                    ("n_sketch", pa.int64()),
                    ("n_distinct_est", pa.float64()),
                ]
            ),
        )

    def lookup(self, conv_id: str) -> pa.Table:
        """Point lookup: one conversation's converged turns, reading ONLY the
        owner partition's run files (hash routing makes key→partition exact,
        so a lookup costs O(one partition's runs), never a scan — the serving
        path a transcript lake needs). Local pyarrow; no Ray session."""
        from ..hashing import partition_ids

        state_schema = self.manifest.schema
        if state_schema is None:
            return pa.schema([("conv_id", pa.string())]).empty_table()
        from .applier import bloom_may_contain

        pid = int(partition_ids([conv_id], self.P)[0])
        files = self.manifest.live_files(pid)
        tables = []
        for f in files:
            # sidecar bloom: skip runs that provably lack this conv_id without
            # touching the parquet footer (~1% false-positive opens)
            if not bloom_may_contain(f, conv_id):
                continue
            t = load_run_key_filtered(f, [conv_id])
            tables.append(conform_batch(t, state_schema))
        if not tables:
            return state_schema.empty_table()
        merged = drop_tombstones(
            _resolve_latest(pa.concat_tables(tables), self.merge_mode)
        )
        order = pc.sort_indices(
            merged, sort_keys=[(c, "ascending") for c in KEY_COLUMNS]
        )
        public, out_names = _mapped_public(
            state_schema, self.manifest.column_mapping
        )
        return apply_masks(
            apply_row_filters(
                _select_renamed(merged.take(order), public, out_names),
                self._active_row_filters(),
            ),
            self._active_masks(),
        )

    def export_snapshot(self, dest_dir: str) -> dict:
        """Export the converged state to plain partitioned parquet for
        downstream (training) consumers that don't speak the manifest — one
        merged file per partition, written atomically (tmp → rename) and
        RESUMABLE: shards that already exist are skipped, so a crashed export
        re-run finishes only the missing partitions; ``_SUCCESS`` (written
        last, with per-shard row counts) marks completion. One Ray task per
        partition, no shuffle. Returns {written, skipped, rows}."""
        import ray

        state_schema = self.manifest.schema
        if state_schema is None:
            raise ValueError("export_snapshot: lake is empty")
        os.makedirs(dest_dir, exist_ok=True)
        public, out_names = _mapped_public(
            state_schema, self.manifest.column_mapping
        )
        task = ray.remote(_export_partition)
        schema_ref = ray.put(state_schema)
        refs, skipped = [], 0
        for pid in range(self.P):
            path = os.path.join(dest_dir, f"part-{pid:05d}.parquet")
            if os.path.exists(path):
                skipped += 1
                continue
            refs.append(
                task.remote(
                    self.manifest.live_files(pid),
                    schema_ref,
                    tuple(public),
                    path,
                    self.merge_mode,
                    tuple(out_names),
                    tuple(self.manifest.purged_keys),
                )
            )
        written = ray.get(refs)
        counts = {}
        for pid in range(self.P):
            path = os.path.join(dest_dir, f"part-{pid:05d}.parquet")
            counts[f"part-{pid:05d}.parquet"] = pq.read_metadata(path).num_rows
        tmp = os.path.join(dest_dir, "_SUCCESS.tmp")
        with open(tmp, "w") as f:
            json.dump({"rows": counts, "epoch": self.manifest.last_epoch}, f)
        os.replace(tmp, os.path.join(dest_dir, "_SUCCESS"))
        return {
            "written": len(written),
            "skipped": skipped,
            "rows": int(sum(counts.values())),
        }

    def _partition_content_token(self, pid: int) -> str:
        """Content fingerprint of one partition's SERVED state, from METADATA
        only: the live run list (paths + per-run dv_rows) plus the purge
        list. Any commit that can change what this partition serves — apply,
        compaction, DV delete, purge, backfill, zorder — changes its run
        list, so a stale token is sufficient for re-export (compaction /
        zorder rewrite content-identically and cost one spurious refresh —
        safe, never stale)."""
        import hashlib as _hl

        runs = [
            (r["path"], int(r.get("dv_rows", 0)))
            for r in self.manifest.partition(pid)["runs"]
        ]
        payload = json.dumps([runs, sorted(self.manifest.purged_keys)])
        return _hl.md5(payload.encode()).hexdigest()

    def export_sft_jsonl(self, dest_dir: str) -> dict:
        """Training-ready egress: the SFT conversation assembly
        (``assemble_conversations`` — role-prefixed turn lines, token counts)
        exported as sharded JSONL, the format SFT tooling actually ingests.
        One Ray task per partition (no shuffle), one ``shard-<pid>.jsonl``
        each, written atomically. INCREMENTAL: ``_SUCCESS`` records each
        shard's partition content token, so a re-export rewrites ONLY shards
        whose partition changed since (new epochs, DML, purges) — a crashed
        run resumes (missing shards rewrite) and an unchanged lake re-exports
        as a metadata-only no-op. Returns {written, skipped, rows}."""
        import ray

        state_schema = self.manifest.schema
        if state_schema is None:
            raise ValueError("export_sft_jsonl: lake is empty")
        os.makedirs(dest_dir, exist_ok=True)
        prev_tokens = {}
        success_path = os.path.join(dest_dir, "_SUCCESS")
        if os.path.exists(success_path):
            with open(success_path) as f:
                prev_tokens = json.load(f).get("tokens", {})
        task = ray.remote(_sft_jsonl_partition)
        schema_ref = ray.put(state_schema)
        refs, skipped, tokens = [], 0, {}
        for pid in range(self.P):
            name = f"shard-{pid:05d}.jsonl"
            path = os.path.join(dest_dir, name)
            tokens[name] = self._partition_content_token(pid)
            if os.path.exists(path) and prev_tokens.get(name) == tokens[name]:
                skipped += 1
                continue
            refs.append(
                task.remote(
                    self.manifest.live_files(pid), schema_ref, path,
                    self.merge_mode, tuple(self.manifest.purged_keys),
                )
            )
        written = ray.get(refs)
        counts = {}
        for pid in range(self.P):
            path = os.path.join(dest_dir, f"shard-{pid:05d}.jsonl")
            with open(path) as f:
                counts[f"shard-{pid:05d}.jsonl"] = sum(1 for _ in f)
        tmp = os.path.join(dest_dir, "_SUCCESS.tmp")
        with open(tmp, "w") as f:
            json.dump(
                {"rows": counts, "epoch": self.manifest.last_epoch,
                 "tokens": tokens},
                f,
            )
        os.replace(tmp, success_path)
        return {
            "written": len(written),
            "skipped": skipped,
            "rows": int(sum(counts.values())),
        }

    def lookup_many(self, conv_ids, epoch: int | None = None):
        """Batch point lookups: the serving path for a SET of conversations.
        Routes the requested ids to their owner partitions and runs ONE Ray
        task per TOUCHED partition — each task bloom-skips runs that provably
        lack all of its ids, reads the survivors with a parquet ``conv_id IN``
        row filter, and LWW-merges only the matching rows. Cost is
        O(touched partitions' matching row groups), never a lake scan;
        untouched partitions are never visited. ``epoch`` serves the lookup
        AS OF that committed epoch's snapshot (point lookup + time travel —
        what an incremental view needs to resolve dirty keys per source
        epoch). Returns a Dataset of the converged turns (same shape as
        ``read()``)."""
        import ray
        import ray.data

        from ..hashing import partition_ids

        m = self.manifest if epoch is None else self._manifest_at(epoch, None)
        state_schema = m.schema
        ids = sorted({str(c) for c in conv_ids})
        if state_schema is None or not ids:
            return ray.data.from_arrow(
                pa.schema([("conv_id", pa.string())]).empty_table()
            )
        pids = partition_ids(ids, self.P)
        by_pid: dict[int, list[str]] = {}
        for cid, pid in zip(ids, pids):
            by_pid.setdefault(int(pid), []).append(cid)
        public, out_names = _mapped_public(state_schema, m.column_mapping)
        task = ray.remote(_lookup_partition)
        schema_ref = ray.put(state_schema)
        refs = [
            task.remote(
                m.live_files(pid),
                schema_ref,
                tuple(cids),
                tuple(public),
                self.merge_mode,
                tuple(out_names),
                self._active_masks(),
                self._active_row_filters(),
            )
            for pid, cids in sorted(by_pid.items())
        ]
        return ray.data.from_arrow_refs(refs)

    def _seed_mapping(self) -> dict:
        """Explicit identity column mapping over the current event schema —
        materialized lazily by the first RENAME/DROP so never-altered lakes
        pay zero mapping overhead."""
        s = self._event_schema()
        if s is None:
            raise ValueError("column mapping: lake has no schema yet")
        logical = {f.name: f.name for f in s if f.name not in _NO_MAP_COLUMNS}
        return {"logical": logical, "used": sorted(logical.values())}

    def rename_column(self, old: str, new: str) -> int:
        """``ALTER TABLE … RENAME COLUMN`` via Delta-style column mapping: a
        METADATA-ONLY commit — no data files are rewritten; the physical
        (storage) name is pinned forever and reads present the logical name.
        Subsequent change events must carry the NEW name; an event batch still
        carrying the old name is treated as a brand-new column (exactly
        Delta's semantics). Time travel / RESTORE see the names as of each
        snapshot; derived surfaces keyed off physical columns (e.g.
        ``conversation_headers``'s tool count) are unaffected by renames.
        Returns the new manifest version."""
        if old in _NO_MAP_COLUMNS or new in _NO_MAP_COLUMNS:
            raise ValueError(
                f"cannot rename system/key columns ({sorted(_NO_MAP_COLUMNS)})"
            )
        cm = self.manifest.column_mapping or self._seed_mapping()
        cm = {"logical": dict(cm["logical"]), "used": list(cm["used"])}
        if old not in cm["logical"]:
            raise KeyError(
                f"rename_column: no column {old!r} (have {sorted(cm['logical'])})"
            )
        if new in cm["logical"]:
            raise ValueError(f"rename_column: column {new!r} already exists")
        cm["logical"][new] = cm["logical"].pop(old)
        return self.manifest.commit_schema_change(cm)

    def drop_column(self, name: str) -> int:
        """``ALTER TABLE … DROP COLUMN`` (metadata-only): the physical column
        and its data stay in the run files — time travel before this version
        still shows them — but every read surface at or after this version
        excludes it. Re-adding the same logical name later allocates a FRESH
        physical column, so the dropped data never resurrects. Returns the
        new manifest version."""
        if name in _NO_MAP_COLUMNS:
            raise ValueError(
                f"cannot drop system/key columns ({sorted(_NO_MAP_COLUMNS)})"
            )
        cm = self.manifest.column_mapping or self._seed_mapping()
        cm = {"logical": dict(cm["logical"]), "used": list(cm["used"])}
        if name not in cm["logical"]:
            raise KeyError(
                f"drop_column: no column {name!r} (have {sorted(cm['logical'])})"
            )
        del cm["logical"][name]
        return self.manifest.commit_schema_change(cm)

    def _active_masks(self) -> tuple:
        """CURRENT masking policies as a hashable tuple for task closures."""
        return tuple(
            {"column": m["column"], "kind": m["kind"]}
            for m in self.manifest.masks
        )

    def _active_row_filters(self) -> tuple:
        fl = list(self.manifest.row_filters)
        purged = self.manifest.purged_keys
        if purged:
            fl.append(
                {"name": "__purged__", "column": "conv_id", "op": "not_in",
                 "value": purged}
            )
        return tuple(fl)

    def purge_key(self, conv_id: str, rewrite: bool = True) -> dict:
        """GDPR-style ERASURE of one conversation — permanent and physical,
        unlike the reversible governance of masks/row policies.

        Two stages, each an atomic commit: (1) the key joins the manifest's
        purge list, which EVERY read surface filters — serving reads, time
        travel, lookups, change feed, export, SFT assembly — so the data is
        unreadable immediately, including from historical snapshots whose
        files still hold the bytes; (2) with ``rewrite=True`` (default) the
        owner partition's live runs containing the key are rewritten without
        it (bloom-targeted — untouched runs are skipped without opening; new
        blooms no longer witness the key), committed as a compaction-style
        replace. ``vacuum()`` then physically reclaims the replaced files and
        any historical versions, completing the erasure. O(one partition's
        matching runs) local I/O, no Ray session. A later re-ingest of the
        same conv_id stores but never serves it (the purge list is permanent);
        block it at ingest with a CHECK constraint if the upstream can
        re-emit purged keys. Returns {version, runs_rewritten, rows_removed}."""
        from ..hashing import partition_ids
        from .applier import atomic_parquet, bloom_may_contain, run_ts_stats

        v = self.manifest.commit_purge([conv_id])
        out = {"version": v, "runs_rewritten": 0, "rows_removed": 0}
        if not rewrite or self.manifest.schema is None:
            return out
        pid = int(partition_ids([conv_id], self.P)[0])
        part = self.manifest.partition(pid)
        new_runs: list[dict] = []
        replaced: list[str] = []
        for run in part["runs"]:
            ap = os.path.join(self.lake_dir, run["path"])
            if not bloom_may_contain(ap, conv_id):
                continue
            # a DV'd run folds its mask into the purge rewrite (the fresh file
            # carries no sidecar)
            t = load_run(ap)
            keep = pc.fill_null(pc.not_equal(t.column("conv_id"), conv_id), True)
            kept_n = int(pc.sum(keep).as_py() or 0)
            if kept_n == t.num_rows:
                continue  # bloom false positive
            replaced.append(run["path"])
            out["runs_rewritten"] += 1
            out["rows_removed"] += t.num_rows - kept_n
            if kept_n == 0:
                continue  # run was entirely this key — replaced by nothing
            t2 = t.filter(keep)
            rel = _rehome(run["path"], f"purge{v}")
            atomic_parquet(t2, os.path.join(self.lake_dir, rel))
            tomb = (
                int(pc.sum(pc.equal(t2.column("op"), "D")).as_py() or 0)
                if "op" in t2.column_names
                else 0
            )
            new_runs.append(
                {"path": rel, "rows": t2.num_rows, "tombstones": tomb}
                | run_ts_stats(t2)
            )
        if replaced:
            self.manifest.commit_compaction(
                {
                    pid: {
                        "runs": new_runs,
                        "replaced_paths": replaced,
                        "rows": sum(r["rows"] - r["tombstones"] for r in new_runs),
                        "max_offset": part["max_offset"],
                    }
                }
            )
            out["version"] = self.manifest.version
        return out

    def add_row_filter(self, spec: dict) -> int:
        """Declare a ROW ACCESS POLICY: every serving read (``read`` /
        ``read_as_of`` / ``lookup`` / ``lookup_many``) drops rows whose
        predicate is definitively FALSE (SQL CHECK semantics — the same
        constraint-shaped spec dict, evaluated by the same kernel as ingest
        constraints, e.g. ``{"name": "no_system", "column": "role",
        "op": "!=", "value": "system"}``). Metadata-only commit; governance
        state like masks — covers time travel, bypassed by producer surfaces.
        Re-adding a policy with the same name replaces it. Returns the new
        manifest version."""
        from .constraints import validate_spec

        spec = validate_spec(spec)
        if spec["op"] == "fk":
            raise ValueError("row policies cannot reference another lake (fk)")
        s = self.manifest.schema
        if s is None:
            raise ValueError("add_row_filter: lake has no schema yet")
        _public, out_names = _mapped_public(s, self.manifest.column_mapping)
        if spec["column"] not in out_names:
            raise KeyError(
                f"unknown lake column {spec['column']!r} (have {out_names})"
            )
        filters = [
            f for f in self.manifest.row_filters if f["name"] != spec["name"]
        ]
        filters.append(spec)
        return self.manifest.commit_row_filters(filters)

    def drop_row_filter(self, name: str) -> int:
        """Remove the named row policy; raises KeyError if none exists."""
        filters = self.manifest.row_filters
        kept = [f for f in filters if f["name"] != name]
        if len(kept) == len(filters):
            raise KeyError(f"no row policy named {name!r}")
        return self.manifest.commit_row_filters(kept)

    def add_mask(self, column: str, kind: str) -> int:
        """Declare a COLUMN MASK (dynamic data masking): every SERVING read
        (``read`` / ``read_as_of`` / ``lookup`` / ``lookup_many``) presents
        ``column`` masked — ``kind="null"`` redacts it wholesale,
        ``kind="hash"`` replaces each string with its md5 hex token
        (deterministic, so masked reads still join/group on the column), and
        ``kind="redact"`` scrubs PII in place (emails → <EMAIL>, then
        phone-shaped digit runs → <PHONE> — the same RE2 pass as
        ``stages.text.redact_pii``, so non-PII text stays readable). Metadata-only commit; policies
        are governance state, applying to EVERY snapshot including time
        travel (revoking access must cover history). Producer-side surfaces
        (``export_snapshot``, ``change_feed``, ``assemble_conversations``)
        bypass masks by design — they feed trusted downstream systems; gate
        them at the process level. Re-adding a mask for the same column
        replaces it. Returns the new manifest version."""
        if kind not in ("null", "hash", "redact"):
            raise ValueError(
                f"unknown mask kind {kind!r} (use 'null', 'hash' or 'redact')"
            )
        s = self.manifest.schema
        if s is None:
            raise ValueError("add_mask: lake has no schema yet")
        public, out_names = _mapped_public(s, self.manifest.column_mapping)
        if column not in out_names:
            raise KeyError(f"unknown lake column {column!r} (have {out_names})")
        if column in KEY_COLUMNS:
            raise ValueError(f"cannot mask key column {column!r}")
        if kind in ("hash", "redact"):
            phys = dict(zip(out_names, public))[column]
            if s.field(phys).type != pa.string():
                raise ValueError(
                    f"{kind} mask requires a string column; {column!r} is "
                    f"{s.field(phys).type}"
                )
        masks = [m for m in self.manifest.masks if m["column"] != column]
        masks.append({"column": column, "kind": kind})
        return self.manifest.commit_masks(masks)

    def drop_mask(self, column: str) -> int:
        """Remove the mask on ``column``; raises KeyError if none exists."""
        masks = self.manifest.masks
        kept = [m for m in masks if m["column"] != column]
        if len(kept) == len(masks):
            raise KeyError(f"no mask declared on {column!r}")
        return self.manifest.commit_masks(kept)

    def add_check_constraint(
        self, name: str, column: str, op: str, value=None, validate: bool = True
    ) -> int:
        """``ALTER TABLE … ADD CONSTRAINT`` (Delta-style): persist a CHECK /
        NOT NULL constraint in the manifest; every subsequent ``apply`` routes
        violating I/U events (and, for comparison constraints, patch rows that
        SET the column to a violating value) to the dead-letter queue with
        reason ``chk:<name>`` instead of applying them — the lake can never
        hold a violating live row from that point on.

        ``validate=True`` (the default, Delta semantics) scans the CURRENT
        live state first and refuses the ADD if any existing row violates —
        one streaming pass, a per-batch count, no driver materialization.
        Returns the new manifest version."""
        from .constraints import validate_spec, violation_any

        if op == "fk":
            raise ValueError("use add_fk_constraint for foreign keys")
        spec = validate_spec(
            {"name": name, "column": column, "op": op, "value": value}
        )
        existing = self.manifest.constraints
        if any(c["name"] == name for c in existing):
            raise ValueError(f"constraint {name!r} already exists")
        if validate and self.manifest.schema is not None:

            def count_viol(t: pa.Table, _s=spec) -> pa.Table:
                # live rows are images: evaluate as an upsert would see them
                probe = t.append_column("op", pa.array(["U"] * t.num_rows))
                return pa.table(
                    {"n": pa.array([int(violation_any(probe, [_s]).sum())], pa.int64())}
                )

            counts = (
                self.read()
                .map_batches(count_viol, batch_format="pyarrow", zero_copy_batch=True)
                .to_pandas()  # one count row per scanned batch — tiny
            )
            bad = int(counts["n"].sum()) if len(counts) else 0
            if bad:
                raise ValueError(
                    f"add_check_constraint({name!r}): {bad} existing live rows "
                    "violate — repair the data or add with validate=False"
                )
        return self.manifest.commit_constraints(existing + [spec])

    def add_computed_column(self, name: str, kind: str, source: str) -> int:
        """``ALTER TABLE … ADD COLUMN <name> GENERATED ALWAYS AS <kind>(<source>)``:
        persist a generated-column spec; every subsequent apply derives the
        value vectorized inside the shuffle-map task (fused with any enrich),
        so it is stored with the row, versioned, and never recomputed at read.
        Producer-supplied values for the column are overwritten. Returns the
        new manifest version."""
        from .computed import validate_computed

        spec = validate_computed({"name": name, "kind": kind, "source": source})
        if name in _NO_MAP_COLUMNS:
            raise ValueError(f"cannot shadow system/key column {name!r}")
        existing = self.manifest.computed_columns
        if any(c["name"] == name for c in existing):
            raise ValueError(f"computed column {name!r} already exists")
        return self.manifest.commit_computed_columns(existing + [spec])

    def backfill_computed(self, names: list[str] | None = None) -> dict:
        """BACKFILL generated columns into HISTORY: rows ingested before
        ``add_computed_column`` carry nulls (the derivation runs at ingest);
        this rewrites every live run still missing the derivations —
        recompute is deterministic (GENERATED ALWAYS), so the result equals
        having had the column since the first epoch. One Ray task per
        partition, no shuffle; runs already correct are skipped without a
        write; the swap (plus any schema evolution the new columns need)
        lands in ONE atomic compaction-style commit, and ``vacuum`` reclaims
        the replaced files. Returns {version, runs_rewritten}."""
        import ray

        from .computed import computed_fields

        specs = [
            s
            for s in self.manifest.computed_columns
            if names is None or s["name"] in names
        ]
        if not specs:
            raise ValueError("backfill_computed: no matching computed columns")
        state_schema = self.manifest.schema
        if state_schema is None:
            raise ValueError("backfill_computed: lake is empty")
        target = pa.unify_schemas(
            [state_schema, pa.schema(computed_fields(specs))]
        )
        version = self.manifest.version
        task = ray.remote(_backfill_partition)
        results = ray.get(
            [
                task.remote(
                    tuple(self.manifest.partition(pid)["runs"]),
                    self.lake_dir,
                    tuple(specs),
                    version,
                )
                for pid in range(self.P)
            ]
        )
        updates: dict[int, dict] = {}
        rewritten = 0
        for pid, res in enumerate(results):
            if not res["replaced"]:
                continue
            part = self.manifest.partition(pid)
            untouched = {r["path"] for r in part["runs"]} - set(res["replaced"])
            kept_rows = sum(
                r["rows"] - r["tombstones"]
                for r in part["runs"]
                if r["path"] in set(res["replaced"])
            )
            updates[pid] = {
                "runs": res["new_runs"],
                "replaced_paths": res["replaced"],
                "rows": kept_rows,
                "max_offset": part["max_offset"],
            }
            rewritten += len(res["replaced"])
        if updates or target != state_schema:
            self.manifest.commit_compaction(
                updates, schema=target if target != state_schema else None
            )
        return {"version": self.manifest.version, "runs_rewritten": rewritten}

    def drop_computed_column(self, name: str) -> int:
        """Stop deriving ``name`` (metadata-only). Already-stored values stay
        in the lake schema — drop_column removes them from the read surface."""
        existing = self.manifest.computed_columns
        kept = [c for c in existing if c["name"] != name]
        if len(kept) == len(existing):
            raise KeyError(f"drop_computed_column: no computed column {name!r}")
        return self.manifest.commit_computed_columns(kept)

    def _compose_computed(self, enrich, enrich_schema):
        """Fuse the generated-column pass onto the apply path's enrich hook
        (computed AFTER user enrich, so an enrich output can be a source)."""
        specs = self.manifest.computed_columns
        if not specs:
            return enrich, enrich_schema
        from .computed import apply_computed, computed_fields

        base = enrich

        def fused(t, _b=base, _s=tuple(specs)):
            if _b is not None:
                t = _b(t)
            return apply_computed(t, list(_s))

        fields = list(enrich_schema) if enrich_schema is not None else []
        have = {f.name for f in fields}
        fields += [f for f in computed_fields(specs) if f.name not in have]
        return fused, pa.schema(fields)

    def drop_constraint(self, name: str) -> int:
        """``ALTER TABLE … DROP CONSTRAINT`` — metadata-only commit; already
        quarantined violators stay in the DLQ (retry_deadletter replays them).
        Returns the new manifest version."""
        existing = self.manifest.constraints
        kept = [c for c in existing if c["name"] != name]
        if len(kept) == len(existing):
            raise KeyError(f"drop_constraint: no constraint {name!r}")
        return self.manifest.commit_constraints(kept)

    def _active_constraints(self) -> tuple:
        """Constraint specs in the PHYSICAL column namespace (constraints are
        declared on logical names; routing/conform run post-translation).
        Foreign-key specs resolve here to concrete ``in``-sets read from the
        referenced lake's CURRENT state."""
        cons = self.manifest.constraints
        if not cons:
            return ()
        cm = self.manifest.column_mapping
        if cm is not None:
            log2phys = cm["logical"]
            cons = [
                {**c, "column": log2phys.get(c["column"], c["column"])}
                for c in cons
            ]
        cons = [self._resolve_fk(c) if c["op"] == "fk" else c for c in cons]
        return tuple(cons)

    def _resolve_fk(self, spec: dict) -> dict:
        """Resolve a persisted FK spec to a runtime ``in``-set spec: the
        DISTINCT referenced-column values of the referenced lake's CURRENT
        live state (tombstones excluded). Cached per (ref lake, manifest
        version) — a parent commit invalidates naturally. The resolved set
        ships in the apply task closures (O(distinct parent keys) per task;
        for a parent beyond broadcast size, swap in the bucketed semi-join
        the same way ``ngram_jaccard_pairs`` gates its LUT)."""
        ref_dir = spec["value"]["ref_dir"]
        ref_col = spec["value"]["ref_column"]
        ref = CdcLake(ref_dir)
        key = (ref_dir, ref.manifest.version, ref_col)
        if key not in self._fk_cache:
            state = ref.read_local_table()
            if ref_col not in state.column_names:
                raise ValueError(
                    f"fk constraint {spec['name']!r}: referenced lake has no "
                    f"column {ref_col!r}"
                )
            vals = pc.unique(state.column(ref_col)).drop_null().to_pylist()
            if not vals:
                raise ValueError(
                    f"fk constraint {spec['name']!r}: referenced lake "
                    f"{ref_dir} has no live {ref_col!r} values"
                )
            self._fk_cache[key] = vals
        return {
            "name": spec["name"],
            "column": spec["column"],
            "op": "in",
            "value": self._fk_cache[key],
            "kind": "fk",
        }

    def add_fk_constraint(
        self,
        name: str,
        column: str,
        ref_dir: str,
        ref_column: str | None = None,
        validate: bool = True,
    ) -> int:
        """``ALTER TABLE … ADD CONSTRAINT <name> FOREIGN KEY (column)
        REFERENCES <ref lake>(ref_column)``: referential integrity across
        lakes, enforced at ingest. Every subsequent apply resolves the parent
        lake's CURRENT live key set and quarantines I/U/P events whose value
        is absent (reason ``fk:<name>``) — the CDC analogue of dbt's
        relationships test. Late parent arrivals do NOT retro-admit earlier
        children (check-at-apply semantics, like every ingest constraint);
        replay the quarantined rows via ``retry_deadletter`` once the parent
        lands. ``validate=True`` refuses the ADD if existing live rows
        violate. Returns the new manifest version."""
        from .constraints import validate_spec, violation_any

        spec = validate_spec(
            {
                "name": name,
                "column": column,
                "op": "fk",
                "value": {
                    "ref_dir": os.path.abspath(ref_dir),
                    "ref_column": ref_column or column,
                },
            }
        )
        existing = self.manifest.constraints
        if any(c["name"] == name for c in existing):
            raise ValueError(f"constraint {name!r} already exists")
        if validate and self.manifest.schema is not None:
            resolved = self._resolve_fk(spec)

            def count_viol(t: pa.Table, _s=resolved) -> pa.Table:
                probe = t.append_column("op", pa.array(["U"] * t.num_rows))
                return pa.table(
                    {"n": pa.array([int(violation_any(probe, [_s]).sum())], pa.int64())}
                )

            counts = (
                self.read()
                .map_batches(count_viol, batch_format="pyarrow", zero_copy_batch=True)
                .to_pandas()
            )
            bad = int(counts["n"].sum()) if len(counts) else 0
            if bad:
                raise ValueError(
                    f"add_fk_constraint({name!r}): {bad} existing live rows "
                    "violate — repair the data or add with validate=False"
                )
        return self.manifest.commit_constraints(existing + [spec])

    def clone(self, dest_dir: str) -> "CdcLake":
        """Delta-style SHALLOW CLONE: a new, fully independent lake whose
        manifest references the source's data files by ABSOLUTE path —
        metadata-only, zero bytes of data copied, O(manifest) work. The whole
        version log comes along (rewritten to absolute paths), so the clone
        time-travels, resumes from the same checkpoints, and keeps the exactly-
        once epoch line; new writes land under the clone's own dir and never
        touch the source. ``vacuum`` on the clone walks only ITS data dir, so
        shared source files are never deleted from the clone side.

        Caveat (identical to Delta shallow clones): vacuuming the SOURCE can
        reclaim files a clone still references — keep source retention ≥ the
        clone's lifetime, or ``compact(force=True, rewrite_single=True)`` the
        clone (rewrites its live state under its own dir) to sever the
        dependency."""
        dest_dir = os.path.abspath(dest_dir)
        src_root = os.path.abspath(self.lake_dir)
        if dest_dir == src_root:
            raise ValueError("clone destination is the source lake")
        if not os.path.exists(self.manifest._current_path()):
            raise ValueError("clone: source lake has no committed version yet")
        if os.path.exists(os.path.join(dest_dir, "_manifest", "CURRENT")):
            raise ValueError(f"clone destination {dest_dir} is already a lake")

        def absify(obj):
            if isinstance(obj, dict):
                out = {}
                for k, v in obj.items():
                    if k == "path" and isinstance(v, str) and not os.path.isabs(v):
                        out[k] = os.path.join(src_root, v)
                    else:
                        out[k] = absify(v)
                return out
            if isinstance(obj, list):
                return [absify(v) for v in obj]
            return obj

        dest_mdir = os.path.join(dest_dir, "_manifest")
        os.makedirs(dest_mdir, exist_ok=True)
        for name in sorted(os.listdir(self.manifest.dir)):
            if not (name.startswith("MANIFEST-") and name.endswith(".json")):
                continue
            with open(os.path.join(self.manifest.dir, name)) as f:
                state = json.load(f)
            _atomic_write(os.path.join(dest_mdir, name), json.dumps(absify(state)))
        cfg = os.path.join(self.lake_dir, "CONFIG.json")
        if os.path.exists(cfg):
            with open(cfg) as f:
                _atomic_write(os.path.join(dest_dir, "CONFIG.json"), f.read())
        # CURRENT last — the commit point; a crash mid-clone leaves no lake
        with open(self.manifest._current_path()) as f:
            _atomic_write(os.path.join(dest_mdir, "CURRENT"), f.read())
        lateness = (
            f"{self.allowed_lateness_us}us"
            if self.allowed_lateness_us is not None
            else None
        )
        return CdcLake(
            dest_dir,
            num_partitions=self.P,
            max_runs=self.max_runs,
            num_salts=self.num_salts,
            hot_threshold=self.hot_threshold,
            exchange=self.exchange,
            allowed_lateness=lateness,
            compaction_policy=self.compaction_policy,
            merge_mode=self.merge_mode,
            schema_mode=self.schema_mode,
        )

    def merge_branch(self, other: "CdcLake", fork_version: int = 0) -> dict:
        """Merge a diverged branch (a ``clone`` that has applied its own
        epochs) back into this lake — the git-merge face of shallow clone.

        Metadata-only and O(manifest): per partition, the branch's run files
        NOT already live here (shared pre-fork files dedupe by resolved path)
        are appended by reference — zero bytes copied, no Ray session.
        Checkpoints advance to the elementwise max, the branch's epoch records
        become committed here (so a change stream applied on the branch never
        re-applies on the parent — the exactly-once line survives the merge),
        and schema evolution from either side unifies additively. Rows both
        branches touched are resolved by the engine's ordinary LWW
        merge-at-read on (conv_id, turn_idx, ts) — the merged state is
        identical to one lake having applied BOTH change streams, which is
        exactly what the oracle asserts. ``fork_version`` (the source version
        ``clone`` was taken at) scopes the branch's metric deltas; merging
        across column-mapping changes (RENAME/DROP on either side since the
        fork) is refused — rewrite first.

        Caveat (same as shallow clone): the parent now references files under
        the branch's directory; ``compact(force=True, rewrite_single=True)``
        severs the dependency, and ``vacuum`` on either side never deletes
        the other's files."""
        if other.P != self.P:
            raise ValueError(
                f"merge_branch: partition counts differ ({other.P} vs {self.P})"
            )
        if other.merge_mode != self.merge_mode:
            raise ValueError("merge_branch: merge modes differ")
        if self.manifest.column_mapping or other.manifest.column_mapping:
            raise ValueError(
                "merge_branch across column-mapping changes is not supported; "
                "compact(force=True, rewrite_single=True) the renamed side first"
            )
        sa, sb = self.manifest.schema, other.manifest.schema
        if sa is None or sb is None:
            raise ValueError("merge_branch: one side is an empty lake")
        schema = pa.unify_schemas([sa, sb])
        updates: dict[int, dict] = {}
        added_runs = added_rows = 0
        for pid in range(self.P):
            mine = {
                os.path.abspath(os.path.join(self.lake_dir, r["path"]))
                for r in self.manifest.partition(pid)["runs"]
            }
            new_runs = []
            for r in other.manifest.partition(pid)["runs"]:
                ap = os.path.abspath(os.path.join(other.lake_dir, r["path"]))
                if ap in mine:
                    continue
                e = dict(r)
                e["path"] = ap
                new_runs.append(e)
            if new_runs:
                updates[pid] = {
                    "runs": new_runs,
                    "max_offset": other.manifest.partition(pid)["max_offset"],
                }
                added_runs += len(new_runs)
                added_rows += sum(int(r["rows"]) for r in new_runs)
        base_metrics = (
            other.manifest.at_version(fork_version).metrics if fork_version else {}
        )
        mdelta = {
            k: int(v) - int(base_metrics.get(k, 0))
            for k, v in other.manifest.metrics.items()
        }
        mdelta = {k: v for k, v in mdelta.items() if v}
        new_epochs = [
            int(e["epoch"])
            for e in other.manifest._state["epochs"]
            if not self.manifest.epoch_committed(int(e["epoch"]))
        ]
        version = self.manifest.commit_merge(
            updates, schema, new_epochs, mdelta,
            source=os.path.abspath(other.lake_dir),
        )
        return {
            "version": version,
            "merged_runs": added_runs,
            "merged_rows": added_rows,
            "epochs_added": new_epochs,
        }

    def audit_state(self, specs: list[dict]) -> dict:
        """Count live converged rows that DEFINITIVELY violate each
        constraint-shaped spec (CHECK semantics — null passes), the audit half
        of write-audit-publish. One Ray task per partition, NO shuffle; the
        driver sums P tiny tables. Returns ``{name: violation_count}``."""
        import ray

        from .constraints import validate_spec

        state_schema = self.manifest.schema
        if state_schema is None:
            raise ValueError("audit_state: lake is empty")
        vspecs = []
        l2p = dict((self.manifest.column_mapping or {}).get("logical", {}))
        for s in specs:
            v = validate_spec(s)
            if v["op"] == "fk":
                raise ValueError("audit_state: fk specs are constraint-only")
            v["column"] = l2p.get(v["column"], v["column"])
            vspecs.append(v)
        task = ray.remote(_audit_partition)
        schema_ref = ray.put(state_schema)
        parts = ray.get(
            [
                task.remote(
                    self.manifest.live_files(pid), schema_ref, tuple(vspecs),
                    self.merge_mode, tuple(self.manifest.purged_keys),
                )
                for pid in range(self.P)
            ]
        )
        out = {v["name"]: 0 for v in vspecs}
        for t in parts:
            for name, n in zip(t.column("name").to_pylist(), t.column("violations").to_pylist()):
                out[name] += int(n)
        return out

    def write_audit_publish(
        self, changes, audits: list[dict], branch_dir: str | None = None
    ) -> dict:
        """Iceberg-style WAP (write-audit-publish): stage ``changes`` on a
        metadata-only branch (``clone``), run the constraint-shaped audits
        over the branch's STAGED state, and publish via ``merge_branch`` only
        if every audit counts zero violations — a poisoned epoch never becomes
        visible to readers of this lake. The abandoned branch directory is
        left for inspection (the WAP equivalent of a failed audit snapshot);
        exactly-once carries through publish (the staged epoch's offsets
        commit here with the merge, so a redelivery is a no-op)."""
        import tempfile

        fork_version = self.manifest.version
        branch = self.clone(branch_dir or tempfile.mkdtemp(prefix="wap-branch-"))
        staged = branch.apply(changes)
        violations = branch.audit_state(audits)
        out = {
            "published": all(v == 0 for v in violations.values()),
            "violations": violations,
            "staged": staged,
            "branch_dir": branch.lake_dir,
        }
        if out["published"]:
            out["merge"] = self.merge_branch(branch, fork_version=fork_version)
        return out

    def restore(self, epoch: int | None = None, version: int | None = None) -> int:
        """Roll the lake back to a committed snapshot as a NEW commit
        (Delta-style RESTORE — the engine analogue of re-running the reference
        from an earlier warehouse state, `dbt run --full-refresh` without the
        recompute). Resolve the target with exactly one of ``epoch=`` /
        ``version=``; afterwards ``read()`` equals ``read_as_of`` of the
        target, checkpoints are rolled back so the undone epochs re-apply
        (resume-from-restore-point), and the pre-restore version stays
        time-travelable until ``vacuum()`` reclaims its files. Returns the new
        manifest version."""
        target = self._manifest_at(epoch, version)
        return self.manifest.commit_restore(target.version)

    def window_counts(self, final_only: bool = False) -> pa.Table:
        """Tumbling event-time window aggregate with WATERMARK FINALIZATION:
        per (window_start, op) counts of applied change events, maintained
        additively at every commit from the appliers' per-batch partials (the
        manifest carries the folded state — no data files re-read, no shuffle).

        ``final=True`` rows can never change again: the lake's lateness
        watermark quarantines any event with ts below (watermark − lateness),
        so a window whose END is at or below that cutoff is closed — the
        streaming emit-on-watermark contract. ``final_only=True`` returns just
        the closed windows. Requires the lake to have been created with
        ``window=`` (and therefore ``allowed_lateness=``)."""
        if self.window_us is None:
            raise ValueError("lake was created without window= — no aggregate kept")
        w = self.manifest.windows
        wins, ops, ns = [], [], []
        for k, n in w.items():
            us, op = k.split("|", 1)
            wins.append(int(us))
            ops.append(op)
            ns.append(int(n))
        order = sorted(range(len(wins)), key=lambda i: (wins[i], ops[i]))
        wins = [wins[i] for i in order]
        ops = [ops[i] for i in order]
        ns = [ns[i] for i in order]
        cutoff = None
        wm = self._watermark_us()
        if wm is not None and self.allowed_lateness_us is not None:
            cutoff = wm - self.allowed_lateness_us
        final = [
            cutoff is not None and (s + self.window_us) <= cutoff for s in wins
        ]
        t = pa.table(
            {
                "window_start": pa.array(wins, pa.int64()).cast(pa.timestamp("us")),
                "op": pa.array(ops, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "final": pa.array(final, pa.bool_()),
            }
        )
        return t.filter(t.column("final")) if final_only else t

    def read_deadletter(self) -> pa.Table:
        """All quarantined (malformed) events with their ``dl_reason`` — the
        ops-side view of the dead-letter queue."""
        files = [
            os.path.join(self.lake_dir, r["path"])
            for r in self.manifest._state.get("deadletter", [])
        ]
        if not files:
            return pa.schema(
                [("conv_id", pa.string()), ("dl_reason", pa.string())]
            ).empty_table()
        return pa.concat_tables(
            [pq.read_table(f) for f in files], promote_options="permissive"
        )

    def retry_deadletter(self, fix, epoch: int | None = None) -> dict:
        """Repair-and-replay the dead-letter queue: ``fix(table) -> table``
        returns corrected events in the lake's event schema (the fix owns
        offset assignment for null-offset rows — fresh offsets beyond the
        committed watermark keep them from being deduped as redeliveries).
        Rows the fix leaves invalid raise — a repair must be total. The fixed
        rows apply as a NORMAL epoch (same exactly-once/LWW path), then the
        drained DLQ records leave the manifest and their files become
        vacuumable."""
        import ray.data

        from .router import invalid_event_mask

        dl = self.read_deadletter()
        if dl.num_rows == 0:
            return {"repaired": 0, "skipped": True}
        rows = dl
        if "dl_reason" in rows.column_names:
            rows = rows.drop_columns(["dl_reason"])
        fixed = fix(rows)
        bad = invalid_event_mask(fixed, None, self._valid_ops)
        if bad.any():
            raise ValueError(
                f"retry_deadletter: fix left {int(bad.sum())} invalid rows"
            )
        metrics = self.apply(
            ray.data.from_arrow(fixed), epoch=epoch, _physical_names=True
        )
        drained = [r["path"] for r in self.manifest._state.get("deadletter", [])]
        self.manifest.commit_deadletter_clear(drained)
        return {"repaired": fixed.num_rows, **metrics}

    def fsck(self, check_rows: bool = True, check_constraints: bool = False) -> dict:
        """Manifest ↔ storage integrity check (the ops `fsck`): every live
        run file must exist and (``check_rows``) its parquet footer row count
        must match the manifest's record; dead-letter files checked too; bloom
        sidecar absences reported informationally (lookups fall back to
        reading the run). Footer-only local reads — no Ray session, O(runs)
        metadata I/O. ``check_constraints=True`` additionally LWW-merges the
        live state locally and counts rows violating the declared constraints
        (FKs resolved against their parents) — O(lake) I/O, opt-in; a nonzero
        count means a constraint was added with ``validate=False`` over dirty
        data or a parent lake shrank after admission."""
        report: dict = {
            "runs_checked": 0,
            "missing_files": [],
            "row_mismatches": [],
            "missing_blooms": 0,
            "missing_deadletter_files": [],
        }
        if check_constraints:
            from .constraints import violation_any

            # logical namespace: read_local_table surfaces post-RENAME names
            cons = [
                self._resolve_fk(c) if c["op"] == "fk" else c
                for c in self.manifest.constraints
            ]
            viol = 0
            if cons and self.manifest.schema is not None:
                state = self.read_local_table()
                if state.num_rows:
                    probe = state.append_column(
                        "op", pa.array(["U"] * state.num_rows)
                    )
                    viol = int(violation_any(probe, cons).sum())
            report["constraint_violations"] = viol
        for pid in range(self.P):
            for run in self.manifest.partition(pid)["runs"]:
                p = os.path.join(self.lake_dir, run["path"])
                if not os.path.exists(p):
                    report["missing_files"].append(run["path"])
                    continue
                report["runs_checked"] += 1
                if check_rows:
                    n = pq.ParquetFile(p).metadata.num_rows
                    # a DV'd run serves rows − dv_rows of its physical rows
                    expect = int(run["rows"]) + int(run.get("dv_rows", 0))
                    if n != expect:
                        report["row_mismatches"].append(
                            {"path": run["path"], "manifest": expect, "file": n}
                        )
                    if run.get("dv_rows") and not os.path.exists(p + ".dv"):
                        report["missing_files"].append(run["path"] + ".dv")
                if not os.path.exists(p + ".bloom"):
                    report["missing_blooms"] += 1
        for r in self.manifest._state.get("deadletter", []):
            if not os.path.exists(os.path.join(self.lake_dir, r["path"])):
                report["missing_deadletter_files"].append(r["path"])
        report["ok"] = not (
            report["missing_files"]
            or report["row_mismatches"]
            or report["missing_deadletter_files"]
        )
        return report

    def describe_files(self, version: int | None = None) -> pa.Table:
        """The Iceberg ``files`` metadata table / Delta DESCRIBE DETAIL
        analogue: one row per live run file of the (optionally historical)
        snapshot — partition, path, physical size, served rows, tombstones,
        deletion-vector rows, ts min/max, and sidecar presence. METADATA +
        ``os.stat`` only (no data decode, no Ray); the ops surface behind
        ``explain_read``'s planning numbers."""
        m = self.manifest if version is None else self._manifest_at(None, version)
        rows = []
        for pid in range(m.num_partitions or self.P):
            for run in m.partition(pid)["runs"]:
                ap = os.path.join(m.lake_dir, run["path"])
                rows.append(
                    {
                        "pid": pid,
                        "path": run["path"],
                        "bytes": os.path.getsize(ap) if os.path.exists(ap) else None,
                        "rows": int(run["rows"]),
                        "tombstones": int(run["tombstones"]),
                        "dv_rows": int(run.get("dv_rows", 0)),
                        "ts_min": run.get("ts_min"),
                        "ts_max": run.get("ts_max"),
                        "has_bloom": os.path.exists(ap + ".bloom"),
                        "has_dv": os.path.exists(ap + ".dv"),
                    }
                )
        schema = pa.schema(
            [
                ("pid", pa.int32()),
                ("path", pa.string()),
                ("bytes", pa.int64()),
                ("rows", pa.int64()),
                ("tombstones", pa.int64()),
                ("dv_rows", pa.int64()),
                ("ts_min", pa.int64()),
                ("ts_max", pa.int64()),
                ("has_bloom", pa.bool_()),
                ("has_dv", pa.bool_()),
            ]
        )
        return pa.table(
            {f.name: pa.array([r[f.name] for r in rows], f.type) for f in schema},
            schema=schema,
        )

    def describe_history(self) -> pa.Table:
        """Delta-style DESCRIBE HISTORY: one row per committed manifest
        version — the operation that created it (stamped at commit), the
        epoch for APPLY commits, and the apply metrics. Metadata-only
        (O(versions) small-JSON reads, no data files touched, no Ray);
        versions whose manifest file is gone (pre-upgrade lakes) surface as
        UNKNOWN rather than erroring."""
        rows = []
        for v in range(1, self.manifest.version + 1):
            path = os.path.join(self.manifest.dir, f"MANIFEST-{v:08d}.json")
            try:
                with open(path) as f:
                    state = json.load(f)
            except FileNotFoundError:
                rows.append({"version": v, "operation": "UNKNOWN"})
                continue
            op = state.get("operation") or {}
            row = {"version": v, "operation": op.get("op", "UNKNOWN")}
            if op.get("op") == "APPLY":
                row["epoch"] = int(op["epoch"])
                em = next(
                    (e for e in state.get("epochs", [])
                     if e.get("version") == v),
                    None,
                )
                for k in ("events_in", "events_deduped", "upserts", "deletes",
                          "events_quarantined"):
                    if em and k in em.get("metrics", {}):
                        row[k] = int(em["metrics"][k])
            rows.append(row)
        schema = pa.schema(
            [
                ("version", pa.int64()),
                ("operation", pa.string()),
                ("epoch", pa.int32()),
                ("events_in", pa.int64()),
                ("events_deduped", pa.int64()),
                ("upserts", pa.int64()),
                ("deletes", pa.int64()),
                ("events_quarantined", pa.int64()),
            ]
        )
        cols = {
            f.name: pa.array([r.get(f.name) for r in rows], f.type)
            for f in schema
        }
        return pa.table(cols)

    def expire_snapshots(self, keep_last: int = 10) -> int:
        """Trim the version log to the newest ``keep_last`` manifest versions
        (Iceberg ``expire_snapshots`` / Delta logRetention): bounds manifest
        growth on a long-lived lake; time travel below the horizon raises a
        clear error afterwards. Pair with ``vacuum()`` to also reclaim the
        data files only historical versions referenced. Returns the number of
        manifest files removed."""
        return self.manifest.expire_snapshots(keep_last)

    def vacuum(self) -> int:
        """Delete data files no longer referenced by the current manifest."""
        live = {os.path.abspath(p) for p in self.manifest.live_files()}
        removed = 0
        data_dir = os.path.join(self.lake_dir, "data")
        for root, _dirs, names in os.walk(data_dir):
            for name in names:
                p = os.path.abspath(os.path.join(root, name))
                if p.endswith(".bloom"):
                    if p[: -len(".bloom")] not in live:  # sidecar of a dead run
                        os.remove(p)
                        removed += 1
                elif p.endswith(".dv"):
                    if p[: -len(".dv")] not in live:  # deletion vector of a dead run
                        os.remove(p)
                        removed += 1
                elif p not in live and (name.endswith(".parquet") or name.endswith(".tmp")):
                    os.remove(p)
                    removed += 1
        # consumed transaction-holdback sidecars (kept until vacuum so RESTORE
        # to a version that still references them keeps working)
        pend_live = {
            os.path.abspath(os.path.join(self.lake_dir, r["path"]))
            for r in self.manifest.pending_txns
        }
        pend_dir = os.path.join(self.lake_dir, "pending")
        if os.path.isdir(pend_dir):
            for name in os.listdir(pend_dir):
                p = os.path.abspath(os.path.join(pend_dir, name))
                if p not in pend_live:
                    os.remove(p)
                    removed += 1
        return removed
