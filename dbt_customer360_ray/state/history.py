"""SCD Type-2 history view: the engine analogue of a dbt snapshot.

The reference keeps only current-state tables and rebuilds them per run
(`/root/reference/dbt_project.yml:11`); dbt itself covers "how did this row
look last month?" with snapshots — SCD2 tables carrying
``dbt_valid_from / dbt_valid_to`` per row version under the `check` strategy
(compare current source state against the snapshot, close changed rows, open
new versions). This module maintains that table INCREMENTALLY from the lake's
own epoch line, one snapshot comparison per committed epoch, without ever
re-scanning the lake:

- **Sync** (`sync_history_view`): for each source epoch not yet in the view,
  run the lake's per-partition snapshot diff (`_diff_partition` — the
  change-feed kernel: one plain Ray task per partition, both snapshots share
  the partitioner, no shuffle) and append its rows as an immutable
  co-partitioned run ``data/part-<pid>/run-<epoch>.parquet`` tagged
  ``valid_from = epoch``. Nothing is ever updated in place — a version is
  CLOSED lazily at read by the next change row for the same key (LEAD), so
  the store is append-only and each epoch's work is O(changed rows).
- **Commit** (`_commits/epoch-<e>.json`, written tmp→``os.replace`` AFTER the
  epoch's data files): exactly-once per epoch. A re-sync skips committed
  epochs; a crash between data files and the commit re-executes the
  deterministic diff and rewrites byte-identical files (same contract as the
  lake's manifest sink).
- **Read** (`read_history`): one Ray task per partition concatenates that
  partition's runs across all epochs (conformed to the latest schema —
  additive evolution null-backfills, type widening casts up), sorts by
  ``(conv_id, turn_idx, valid_from)`` and derives ``valid_to`` as the NEXT
  change's ``valid_from`` (delete markers close their predecessor and are
  dropped from the output); ``is_current = valid_to IS NULL``. No shuffle:
  every version of a key lives in one partition by construction.

Scale posture: sync moves only changed rows; the read is a per-partition
streaming merge whose cost is O(history rows in that partition). At 10^10
events the history table itself is large, but it is partitioned, append-only,
and read partition-parallel — never driver-materialized (the local reader is
a test convenience).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..schemas import KEY_COLUMNS, conform_batch
from .applier import atomic_parquet
from .engine import CdcLake, _diff_partition, _mapped_public
from .manifest import _schema_from_json, _schema_to_json


def _commits_dir(view_dir: str) -> str:
    return os.path.join(view_dir, "_commits")


def _committed_epochs(view_dir: str) -> dict[int, dict]:
    d = _commits_dir(view_dir)
    if not os.path.isdir(d):
        return {}
    out = {}
    for name in os.listdir(d):
        if name.startswith("epoch-") and name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                rec = json.load(f)
            out[int(rec["epoch"])] = rec
    return out


def _history_epoch_task(
    files_a: list[str],
    files_b: list[str],
    state_schema: pa.Schema,
    public_cols: list[str],
    merge_mode: str,
    epoch: int,
    view_dir: str,
    pid: int,
) -> dict | None:
    """Sync kernel for one (epoch, partition): snapshot-diff → history run.
    Deterministic (the diff sorts by key), so crash-replay rewrites the same
    bytes. Returns the run record, or None when the partition had no changes
    (no file written — absent runs cost nothing at read)."""
    diff = _diff_partition(
        files_a, files_b, state_schema, public_cols, False, merge_mode
    )
    if diff.num_rows == 0:
        return None
    n = diff.num_rows
    is_delete = np.asarray(diff.column("change_type").to_numpy(zero_copy_only=False) == "delete")
    rows = diff.drop_columns(["change_type"])
    rows = rows.append_column("valid_from", pa.array(np.full(n, epoch, np.int32)))
    rows = rows.append_column("is_delete", pa.array(is_delete))
    rel = os.path.join("data", f"part-{pid:05d}", f"run-{epoch:06d}.parquet")
    atomic_parquet(rows, os.path.join(view_dir, rel))
    return {"pid": pid, "path": rel, "rows": n}


def sync_history_view(
    src: CdcLake, view_dir: str, upto_epoch: int | None = None
) -> list[dict]:
    """Advance the SCD2 history view through every source epoch committed
    since the last sync. Idempotent and resumable: committed epochs skip;
    the per-epoch commit file lands only after its data files. Returns one
    metrics dict per epoch synced."""
    import ray

    os.makedirs(_commits_dir(view_dir), exist_ok=True)
    done = _committed_epochs(view_dir)
    last_src = src.manifest.last_epoch if upto_epoch is None else upto_epoch
    task = ray.remote(_history_epoch_task)
    out = []
    for epoch in range(last_src + 1):
        if epoch in done:
            continue
        ma = src._manifest_at(version=0) if epoch == 0 else src._manifest_at(
            epoch=epoch - 1
        )
        mb = src._manifest_at(epoch=epoch)
        state_schema = mb.schema
        # physical column names: stable across RENAME (column mapping is
        # metadata-only), so history runs never need rewriting on rename
        public, _ = _mapped_public(state_schema, mb.column_mapping)
        P = mb.num_partitions or src.P
        schema_ref = ray.put(state_schema)
        refs = [
            task.remote(
                ma.live_files(pid) if ma.schema is not None else [],
                mb.live_files(pid),
                schema_ref,
                public,
                src.merge_mode,
                epoch,
                view_dir,
                pid,
            )
            for pid in range(P)
        ]
        runs = [r for r in ray.get(refs) if r is not None]
        rec = {
            "epoch": epoch,
            "runs": runs,
            "rows": int(sum(r["rows"] for r in runs)),
            "num_partitions": P,
            "schema": _schema_to_json(
                pa.schema([state_schema.field(c) for c in public])
            ),
        }
        path = os.path.join(_commits_dir(view_dir), f"epoch-{epoch:06d}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
        out.append({k: rec[k] for k in ("epoch", "rows")})
    return out


def _finalize_history(
    files: list[str], read_schema: pa.Schema, out_names: list[str]
) -> pa.Table:
    """Read kernel for one partition: append-only change rows → SCD2 versions.
    ``valid_to`` = the next change's ``valid_from`` within the key (delete
    markers close their predecessor, then drop); ``is_current`` = open AND the
    key's final change was not a delete. Vectorized — one sort + shifted
    compares, no per-row Python."""
    import pyarrow.compute as pc

    if not files:
        t = read_schema.empty_table()
    else:
        t = pa.concat_tables(
            [conform_batch(pq.read_table(f), read_schema) for f in files]
        )
    order = pc.sort_indices(
        t,
        sort_keys=[(k, "ascending") for k in KEY_COLUMNS] + [("valid_from", "ascending")],
    )
    t = t.take(order)
    n = t.num_rows
    conv = t.column("conv_id").to_numpy(zero_copy_only=False)
    turn = t.column("turn_idx").to_numpy(zero_copy_only=False)
    vfrom = t.column("valid_from").to_numpy(zero_copy_only=False).astype(np.int64)
    is_del = t.column("is_delete").to_numpy(zero_copy_only=False).astype(bool)
    same_next = np.zeros(n, dtype=bool)
    if n > 1:
        same_next[:-1] = (conv[:-1] == conv[1:]) & (turn[:-1] == turn[1:])
    valid_to = np.full(n, -1, np.int64)
    if n > 1:
        valid_to[:-1] = np.where(same_next[:-1], vfrom[1:], -1)
    open_mask = valid_to < 0
    keep = ~is_del
    out_payload = [
        f.name for f in read_schema
        if f.name not in ("valid_from", "is_delete")
    ]
    cols: dict[str, pa.Array] = {}
    for name, out_name in zip(out_payload, out_names):
        cols[out_name] = t.column(name).filter(pa.array(keep))
    cols["valid_from"] = pa.array(vfrom[keep].astype(np.int32))
    cols["valid_to"] = pa.array(
        [None if v < 0 else int(v) for v in valid_to[keep]], pa.int32()
    )
    cols["is_current"] = pa.array(open_mask[keep])
    return pa.table(cols)


def _read_plan(view_dir: str):
    """(files per pid, latest read schema, current logical names) from the
    commit log — the view is self-describing, no source lake needed."""
    done = _committed_epochs(view_dir)
    if not done:
        raise ValueError(f"history view at {view_dir} has no committed epochs")
    latest = done[max(done)]
    phys = _schema_from_json(latest["schema"])
    read_schema = pa.schema(
        list(phys)
        + [pa.field("valid_from", pa.int32()), pa.field("is_delete", pa.bool_())]
    )
    P = int(latest["num_partitions"])
    per_pid: list[list[str]] = [[] for _ in range(P)]
    for rec in done.values():
        for run in rec["runs"]:
            per_pid[int(run["pid"])].append(os.path.join(view_dir, run["path"]))
    for lst in per_pid:
        lst.sort()
    return per_pid, read_schema, [f.name for f in phys]


def read_history(view_dir: str, src: CdcLake | None = None):
    """The SCD2 table as a Dataset: one task per partition, no shuffle. Pass
    ``src`` to surface the lake's CURRENT logical column names (post-RENAME);
    physical names otherwise."""
    import ray
    import ray.data

    per_pid, read_schema, names = _read_plan(view_dir)
    if src is not None:
        _, names = _mapped_public(
            pa.schema([read_schema.field(n) for n in names]),
            src.manifest.column_mapping,
        )
    task = ray.remote(_finalize_history)
    schema_ref = ray.put(read_schema)
    refs = [task.remote(files, schema_ref, names) for files in per_pid]
    return ray.data.from_arrow_refs(refs)


def _temporal_join_group(
    group: pa.Table,
    files_by_pid: list[list[str]],
    read_schema: pa.Schema,
    names: list[str],
    as_of_col: str,
) -> pa.Table:
    """temporal_join kernel for one partition's probe group: SCD2-finalize the
    partition's local version runs, then ONE sorted ``merge_asof`` (greatest
    ``valid_from`` ≤ as_of, per key) with the range check ``valid_to`` NULL or
    > as_of — probes whose key did not exist at that epoch keep NULL payload.
    Vectorized; duplicate probe keys are deduped here (post-shuffle, so the
    distinct never needs its own all-to-all)."""
    import pandas as pd

    pid = int(group.column("pid")[0].as_py())
    probes = (
        group.select(KEY_COLUMNS + [as_of_col])
        .to_pandas()
        .drop_duplicates(KEY_COLUMNS + [as_of_col])
        .sort_values(as_of_col, kind="stable")
        .reset_index(drop=True)
    )
    payload = [n for n in names if n not in KEY_COLUMNS]
    versions = _finalize_history(files_by_pid[pid], read_schema, names)
    vdf = versions.to_pandas().sort_values("valid_from", kind="stable")
    merged = pd.merge_asof(
        probes.assign(_asof64=probes[as_of_col].astype("int64")),
        vdf.assign(_vfrom64=vdf["valid_from"].astype("int64")),
        left_on="_asof64",
        right_on="_vfrom64",
        by=KEY_COLUMNS,
        direction="backward",
    )
    valid = merged["_vfrom64"].notna() & (
        merged["valid_to"].isna() | (merged["valid_to"] > merged[as_of_col])
    )
    out_schema = pa.schema(
        [group.schema.field(c) for c in KEY_COLUMNS]
        + [group.schema.field(as_of_col)]
        + [read_schema.field(c) for c in payload]
        + [pa.field("matched", pa.bool_())]
    )
    for c in payload:
        merged.loc[~valid, c] = None
    merged["matched"] = valid.to_numpy()
    out = merged[KEY_COLUMNS + [as_of_col] + payload + ["matched"]]
    out = out.sort_values(KEY_COLUMNS, kind="stable").reset_index(drop=True)
    return pa.Table.from_pandas(out, schema=out_schema, preserve_index=False)


def temporal_join(
    view_dir: str,
    probes,
    as_of_col: str = "as_of",
    src: CdcLake | None = None,
):
    """Flink-style TEMPORAL TABLE JOIN against the SCD2 history view: enrich
    each probe row ``(conv_id, turn_idx, <as_of_col> = epoch)`` with the
    dimension version that was valid AT that epoch — the row a consumer
    joining the change stream at epoch e would have seen, not the current
    one. Probes whose key did not exist (or was deleted) at their epoch get
    NULL payload and ``matched = false`` (LEFT temporal join).

    Shuffle shape: only the probe side moves. Probes hash-route to the
    view's partitions with the lake's own partitioner (``pid =
    stable_hash(conv_id) % P``), and each partition task runs one sorted
    ``merge_asof`` against its LOCAL version runs — the history (the big
    side, O(all versions)) never leaves its partition, and the per-task cost
    is O(local versions + local probes). Returns a Dataset."""
    import ray.data

    from ..hashing import partition_ids

    per_pid, read_schema, names = _read_plan(view_dir)
    if src is not None:
        _, names = _mapped_public(
            pa.schema([read_schema.field(n) for n in names]),
            src.manifest.column_mapping,
        )
    P = len(per_pid)

    def assign(batch: pa.Table) -> pa.Table:
        # batch-level partial dedup (exact (key, as_of) duplicates) shrinks
        # the probe shuffle; the group task finishes the distinct after
        # co-location
        import pandas as pd  # noqa: F401

        df = batch.to_pandas().drop_duplicates(KEY_COLUMNS + [as_of_col])
        t = pa.Table.from_pandas(df, schema=batch.schema, preserve_index=False)
        return t.append_column(
            "pid", pa.array(partition_ids(t.column("conv_id"), P), pa.int32())
        )

    import functools as _ft

    return (
        probes.map_batches(assign, batch_format="pyarrow")
        .groupby("pid")
        .map_groups(
            _ft.partial(
                _temporal_join_group,
                files_by_pid=per_pid,
                read_schema=read_schema,
                names=names,
                as_of_col=as_of_col,
            ),
            batch_format="pyarrow",
        )
    )


def read_history_local(view_dir: str, src: CdcLake | None = None) -> pa.Table:
    """Pure-pyarrow twin of ``read_history`` (tests / small oracles)."""
    per_pid, read_schema, names = _read_plan(view_dir)
    if src is not None:
        _, names = _mapped_public(
            pa.schema([read_schema.field(n) for n in names]),
            src.manifest.column_mapping,
        )
    parts = [_finalize_history(files, read_schema, names) for files in per_pid]
    return pa.concat_tables([p for p in parts if p.num_rows] or parts[:1])
