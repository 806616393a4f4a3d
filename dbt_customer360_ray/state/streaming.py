"""Streaming ingest: a FIXED actor pool of stateful partition appliers tailing
a change stream in micro-batches (the north-star shape: binlog tail →
``ray.data`` batches → hash routing → stateful appliers with RocksDB-like
sorted upsert state → exactly-once manifest commits).

Differences from the epoch path (engine.apply):
- State lives IN the actors between micro-batches (an LWW-resolved memtable per
  owned partition), flushed to sorted runs only at ``checkpoint()``. Partition →
  actor affinity is fixed for the session (pid round-robin over the pool) —
  the explicit ray.remote routing SURVEY.md §7.4 point 2 calls for, since Ray
  Data's groupby cannot pin groups to named actors across batches.
- Exactly-once: ``ingest()`` mutates only actor memory; ``checkpoint()`` makes
  runs + offsets durable via the same atomic manifest commit. A crash between
  checkpoints loses memtables only — resume re-tails the stream from
  ``lake.checkpoints()`` (per-partition committed offsets) and the offset
  dedup + LWW idempotence absorb any overlap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.lww import lww_latest, patch_collapse
from ..hashing import partition_ids
from ..schemas import conform_batch, evolve_schema, rename_columns_map
from .applier import atomic_parquet, run_ts_stats
from .engine import CdcLake, REQUIRED_EVENT_COLUMNS, _NO_MAP_COLUMNS


def _concat_evolving(chunks: list[pa.Table]) -> pa.Table:
    """Concat memtable chunks that may straddle an additive schema evolution:
    unify to the evolved schema (old chunks get null-backfilled columns — same
    semantics as the lake's evolution rule) instead of letting concat_tables
    reject the mixed schemas."""
    if len(chunks) == 1:
        return chunks[0]
    schema = chunks[0].schema
    for t in chunks[1:]:
        schema = evolve_schema(schema, t.schema)
    if all(t.schema == schema for t in chunks):
        return pa.concat_tables(chunks)
    return pa.concat_tables([conform_batch(t, schema) for t in chunks])


class _PartitionApplier:
    """Actor body: owns a set of partitions; memtable = LWW winners per pid
    (patch mode: the GC-collapsed event set — patch_collapse is associative,
    so memtable compaction and flush compose exactly like the epoch path)."""

    def __init__(
        self,
        lake_dir: str,
        pids: list[int],
        committed: dict[int, int],
        merge_mode: str = "lww",
        window_us: int | None = None,
    ):
        self.merge_mode = merge_mode
        self._collapse = patch_collapse if merge_mode == "patch" else lww_latest
        self.lake_dir = lake_dir
        self.pids = set(pids)
        self.committed = dict(committed)
        self.mem: dict[int, list[pa.Table]] = {}
        self.pending_max: dict[int, int] = {}
        self.counts = {"events_in": 0, "events_deduped": 0, "upserts": 0, "deletes": 0}
        self.window_us = window_us
        self.window_counts: dict[str, int] = {}

    def ingest(self, pid: int, chunk: pa.Table, exempt: bool = False) -> int:
        """``exempt=True`` marks a chunk released from the transaction
        holdback: its events were NEVER applied even though the partition
        checkpoint may have advanced past their offsets, so they bypass the
        redelivery dedup (the session guarantees each held offset is released
        exactly once — absorb filters by checkpoint and parked-set first)."""
        assert pid in self.pids
        self.counts["events_in"] += chunk.num_rows
        committed = self.committed.get(pid, -1)
        if exempt:
            new = chunk
        else:
            # dedup floor = max(checkpointed, pending-in-memtable) offset: a
            # binlog tail's positions are monotone per partition, so any
            # redelivery — across OR within a checkpoint interval — sits at or
            # below the floor (same assumption the checkpoint resume makes);
            # intra-chunk duplicate offsets are dropped first-delivery-wins
            floor = max(committed, self.pending_max.get(pid, -1))
            new = chunk.filter(pc.greater(chunk.column("offset"), floor))
            off = new.column("offset").to_numpy(zero_copy_only=False)
            if len(off) and len(np.unique(off)) < len(off):
                _, first_idx = np.unique(off, return_index=True)
                new = new.take(pa.array(np.sort(first_idx)))
        self.counts["events_deduped"] += chunk.num_rows - new.num_rows
        if new.num_rows == 0:
            return 0
        deletes = int(pc.sum(pc.equal(new.column("op"), "D")).as_py() or 0)
        self.counts["deletes"] += deletes
        self.counts["upserts"] += new.num_rows - deletes
        if self.window_us:
            from .applier import window_count_delta

            for k, v in window_count_delta(new, self.window_us).items():
                self.window_counts[k] = self.window_counts.get(k, 0) + v
        winners = self._collapse(new)
        bucket = self.mem.setdefault(pid, [])
        bucket.append(winners)
        if len(bucket) > 8:  # in-memory compaction keeps the memtable bounded
            self.mem[pid] = [self._collapse(_concat_evolving(bucket))]
        self.pending_max[pid] = max(
            self.pending_max.get(pid, -1), int(pc.max(new.column("offset")).as_py())
        )
        return new.num_rows

    def flush(self, epoch: int) -> list[dict]:
        """Write one sorted run per dirty partition; returns manifest updates."""
        out = []
        import os

        for pid, chunks in sorted(self.mem.items()):
            merged = self._collapse(_concat_evolving(chunks))
            path = os.path.join(
                "data", f"part-{pid:05d}", f"run-{epoch:06d}-stream.parquet"
            )
            atomic_parquet(merged, os.path.join(self.lake_dir, path))
            tomb = int(pc.sum(pc.equal(merged.column("op"), "D")).as_py() or 0)
            max_off = self.pending_max.get(pid, self.committed.get(pid, -1))
            out.append(
                {
                    "pid": pid,
                    "runs": [
                        {"path": path, "rows": merged.num_rows, "tombstones": tomb}
                        | run_ts_stats(merged)
                    ],
                    "max_offset": max_off,
                }
            )
            self.committed[pid] = max_off
        self.mem.clear()
        self.pending_max.clear()
        return out

    def take_metrics(self) -> dict:
        """Per-epoch counters: returned and reset at each checkpoint."""
        out = dict(self.counts)
        if self.window_us:
            out["windows"] = dict(self.window_counts)
            self.window_counts = {}
        self.counts = {"events_in": 0, "events_deduped": 0, "upserts": 0, "deletes": 0}
        return out


class StreamingSession:
    """Fixed applier pool over a CdcLake; driver routes micro-batches."""

    def __init__(
        self,
        lake: CdcLake,
        pool_size: int | None = None,
        txn_boundaries: bool = False,
    ):
        import ray

        self.lake = lake
        self.P = lake.P
        pool_size = pool_size or min(self.P, max(2, int(ray.cluster_resources().get("CPU", 8)) // 2))
        committed = lake.checkpoints()
        self.pid_to_actor: dict[int, int] = {p: p % pool_size for p in range(self.P)}
        Actor = ray.remote(_PartitionApplier)
        self.actors = []
        for a in range(pool_size):
            pids = [p for p in range(self.P) if self.pid_to_actor[p] == a]
            self.actors.append(
                Actor.remote(
                    lake.lake_dir, pids,
                    {p: committed.get(p, -1) for p in pids},
                    lake.merge_mode,
                    lake.window_us,
                )
            )
        self._schema: pa.Schema | None = lake._event_schema()
        # column mapping (rename/drop evolution): session-held copy, extended
        # when a micro-batch introduces new logical columns and persisted at
        # each checkpoint's commit
        cm = lake.manifest.column_mapping
        self._colmap = (
            {"logical": dict(cm["logical"]), "used": list(cm["used"])}
            if cm is not None
            else None
        )
        self._pending_refs: list = []
        # dead-letter buffer: malformed rows held like memtables (durable only
        # at checkpoint — a crash between checkpoints re-tails them anyway)
        self._dlq: list[pa.Table] = []
        # lateness watermark, frozen per checkpoint interval: the cutoff is the
        # lake's committed watermark (per-run ts stats) minus allowed_lateness,
        # refreshed after each commit — deterministic for a given micro-batch/
        # checkpoint sequence, mirroring the epoch path's batch semantics
        self._late_cutoff_us: int | None = None
        self._refresh_late_cutoff()
        # transaction-boundary atomicity (the streaming twin of
        # CdcLake.apply_transactional): micro-batches carry txn_id/txn_n;
        # complete transactions release into the normal routed path, cut ones
        # are held driver-side and made durable as a pending/ sidecar at each
        # checkpoint. Holdback state is per-session; a crash loses only what
        # the sidecar already covers plus re-tailed events (monotone offsets).
        self._txn = bool(txn_boundaries)
        if self._txn:
            self._txn_rows: dict[int, list[pa.Table]] = {}
            self._txn_seen: dict[int, set] = {}
            self._txn_expected: dict[int, int] = {}
            self._parked_offsets: set = set()
            # duplicates of a transaction completed THIS checkpoint interval
            # (their offsets outrun the committed watermark); cleared at each
            # checkpoint, when the refreshed committed filter takes over
            self._done_txns: set = set()
            self._committed_arr = np.full(self.P, -1, dtype=np.int64)
            for p, o in committed.items():
                self._committed_arr[int(p)] = o
            # reload the durable holdback (resume-from-checkpoint)
            import os as _os

            import pyarrow.parquet as _pq

            for r in lake.manifest.pending_txns:
                for rel in self._txn_absorb(
                    _pq.read_table(_os.path.join(lake.lake_dir, r["path"])),
                    from_sidecar=True,
                ):
                    self._ingest_routed(rel, exempt=True)

    def _refresh_late_cutoff(self) -> None:
        self._late_cutoff_us = None
        if getattr(self.lake, "allowed_lateness_us", None) is not None:
            w = self.lake._watermark_us()
            if w is not None:
                self._late_cutoff_us = w - self.lake.allowed_lateness_us

    def ingest(self, batch: pa.Table) -> None:
        """One micro-batch: conform/evolve (driver-side, vectorized), route by
        pid, ship each slice to its owner actor. Malformed rows (null keys/
        ts/offset, unknown ops) go to the dead-letter buffer instead of an
        applier — same rules as the epoch path's quarantine slot. Under
        ``txn_boundaries`` the batch first passes the transaction holdback:
        only complete transactions reach the appliers."""
        missing = [c for c in REQUIRED_EVENT_COLUMNS if c not in batch.column_names]
        if missing:
            raise ValueError(f"micro-batch missing required columns: {missing}")
        if self._txn:
            for released in self._txn_absorb(batch):
                self._ingest_routed(released, exempt=True)
            return
        self._ingest_routed(batch)

    def _txn_absorb(self, batch: pa.Table, from_sidecar: bool = False):
        """Transaction holdback: absorb a batch carrying txn_id/txn_n, return
        the event tables (txn metadata stripped) of transactions that just
        COMPLETED. Absorb drops redelivered events first (offset ≤ the owner
        partition's committed checkpoint, already-parked offsets, duplicates
        of transactions completed this interval), then counts DISTINCT offsets
        per transaction — at-least-once delivery never fakes completion."""
        for c in ("txn_id", "txn_n"):
            if c not in batch.column_names:
                raise ValueError(f"txn_boundaries: micro-batch missing {c!r}")
        if batch.num_rows == 0:
            return []
        if not from_sidecar:
            off = batch.column("offset").to_numpy(zero_copy_only=False)
            pids = partition_ids(batch.column("conv_id"), self.P)
            keep = off > self._committed_arr[pids]
            if self._parked_offsets:
                keep &= ~np.isin(
                    off, np.fromiter(self._parked_offsets, dtype=np.int64)
                )
            if self._done_txns:
                txn_all = batch.column("txn_id").to_numpy(zero_copy_only=False)
                keep &= ~np.isin(
                    txn_all, np.fromiter(self._done_txns, dtype=np.int64)
                )
            if not keep.all():
                batch = batch.filter(pa.array(keep))
            if batch.num_rows == 0:
                return []
        txn = batch.column("txn_id").to_numpy(zero_copy_only=False)
        exp = batch.column("txn_n").to_numpy(zero_copy_only=False)
        off = batch.column("offset").to_numpy(zero_copy_only=False)
        order = np.argsort(txn, kind="stable")
        t_sorted = batch.take(pa.array(order))
        txn_s, exp_s, off_s = txn[order], exp[order], off[order]
        bounds = np.searchsorted(
            txn_s, np.unique(txn_s), side="left"
        ).tolist() + [len(txn_s)]
        released = []
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            tid = int(txn_s[lo])
            seen = self._txn_seen.setdefault(tid, set())
            g_off = off_s[lo:hi]
            fresh = np.array([o not in seen for o in g_off])
            if not fresh.any():
                continue
            g = t_sorted.slice(lo, hi - lo)
            if not fresh.all():
                g = g.filter(pa.array(fresh))
            new_offsets = {int(o) for o in g_off[fresh]}
            seen.update(new_offsets)
            self._parked_offsets.update(new_offsets)
            self._txn_expected[tid] = max(
                self._txn_expected.get(tid, 0), int(exp_s[lo:hi].max())
            )
            self._txn_rows.setdefault(tid, []).append(g)
            if len(seen) > self._txn_expected[tid]:
                raise ValueError(
                    f"txn {tid}: more distinct events than txn_n "
                    f"({len(seen)} > {self._txn_expected[tid]})"
                )
            if len(seen) == self._txn_expected[tid]:
                tbl = _concat_evolving(self._txn_rows.pop(tid))
                tbl = tbl.drop_columns(
                    [c for c in ("txn_id", "txn_n") if c in tbl.column_names]
                )
                self._parked_offsets.difference_update(self._txn_seen.pop(tid))
                del self._txn_expected[tid]
                self._done_txns.add(tid)
                released.append(tbl)
        return released

    def _ingest_routed(self, batch: pa.Table, exempt: bool = False) -> None:
        from .router import invalid_event_mask

        computed = self.lake.manifest.computed_columns
        if computed:
            from .computed import apply_computed

            batch = apply_computed(batch, computed)
        if self._colmap is not None:
            # logical → physical translation (same rules as the epoch path:
            # unseen logical columns allocate a FRESH physical name)
            log2phys, used = self._colmap["logical"], set(self._colmap["used"])
            for f in batch.schema:
                if f.name in _NO_MAP_COLUMNS or f.name in log2phys:
                    continue
                phys, k = f.name, 1
                while phys in used:
                    phys = f"{f.name}__{k}"
                    k += 1
                log2phys[f.name] = phys
                used.add(phys)
                self._colmap["used"].append(phys)
            batch = rename_columns_map(batch, log2phys)
        incoming = batch.schema
        if self.lake.schema_mode == "strict" and self._schema is not None:
            known = {f.name for f in self._schema}
            known |= {c["name"] for c in computed}  # lake-derived, not drift
            unknown = [f.name for f in incoming if f.name not in known]
            if unknown:
                raise ValueError(
                    f"schema_mode='strict': micro-batch carries unknown "
                    f"columns {unknown} — evolve explicitly or fix the producer"
                )
        self._schema = (
            evolve_schema(self._schema, incoming) if self._schema is not None else incoming
        )
        conformed = conform_batch(batch, self._schema)
        bad = invalid_event_mask(
            conformed, self._late_cutoff_us, self.lake._valid_ops,
            self.lake._active_constraints(),
        )
        if bad.any():
            self._dlq.append(conformed.filter(pa.array(bad)))
            conformed = conformed.filter(pa.array(~bad))
        pids = partition_ids(conformed.column("conv_id"), self.P)
        order = np.argsort(pids, kind="stable")
        t = conformed.take(pa.array(order))
        sorted_pids = pids[order]
        bounds = np.searchsorted(sorted_pids, np.arange(self.P + 1))
        state_schema = pa.schema(list(self._schema) + [pa.field("pid", pa.int32())])
        for p in range(self.P):
            lo, hi = bounds[p], bounds[p + 1]
            if hi <= lo:
                continue
            chunk = t.slice(lo, hi - lo)
            chunk = conform_batch(chunk, state_schema).set_column(
                state_schema.get_field_index("pid"),
                "pid",
                pa.array([p] * chunk.num_rows, pa.int32()),
            )
            ref = self.actors[self.pid_to_actor[p]].ingest.remote(p, chunk, exempt)
            self._pending_refs.append(ref)

    def checkpoint(self) -> dict:
        """Flush all appliers and atomically commit one epoch."""
        import ray

        ray.get(self._pending_refs)  # drain in-flight ingests
        self._pending_refs = []
        epoch = self.lake.manifest.last_epoch + 1
        updates_nested = ray.get([a.flush.remote(epoch) for a in self.actors])
        partition_updates: dict[int, dict] = {}
        for lst in updates_nested:
            for u in lst:
                prev = self.lake.manifest.partition(u["pid"])
                partition_updates[u["pid"]] = {
                    "runs": u["runs"],
                    "replaces": False,
                    "max_offset": u["max_offset"],
                    "rows": prev["rows"]
                    + sum(r["rows"] - r["tombstones"] for r in u["runs"]),
                }
        metrics = ray.get([a.take_metrics.remote() for a in self.actors])
        delta = {
            k: int(sum(m[k] for m in metrics)) for k in
            ("events_in", "events_deduped", "upserts", "deletes")
        }
        windows_delta: dict[str, int] = {}
        for m in metrics:
            for k, v in m.get("windows", {}).items():
                windows_delta[k] = windows_delta.get(k, 0) + int(v)
        delta["late_events"] = 0  # streaming mode: late events counted at read

        deadletter = None
        if self._dlq:
            import os

            from .router import quarantine_reasons

            rows = pa.concat_tables(
                [conform_batch(t, self._schema) for t in self._dlq]
            )
            rows = rows.append_column(
                "dl_reason",
                pa.array(
                    quarantine_reasons(
                        rows, self._late_cutoff_us, self.lake._valid_ops,
                        self.lake._active_constraints(),
                    ),
                    pa.string(),
                ),
            )
            path = os.path.join("deadletter", f"epoch-{epoch:06d}-stream.parquet")
            atomic_parquet(rows, os.path.join(self.lake.lake_dir, path))
            deadletter = [{"path": path, "rows": rows.num_rows}]
            delta["events_quarantined"] = rows.num_rows
            delta["events_in"] += rows.num_rows
            self._dlq = []
        else:
            delta["events_quarantined"] = 0

        # transaction holdback: make the still-incomplete transactions durable
        # as ONE sidecar, replaced atomically with this commit (the same
        # pending_txns contract as the epoch path — pending or consumed,
        # never both)
        pending_list = None
        if self._txn:
            held = [t for lst in self._txn_rows.values() for t in lst]
            pending_list = []
            if held:
                import os

                tbl = _concat_evolving(held)
                rel = os.path.join(
                    "pending", f"epoch-{epoch:06d}-stream.parquet"
                )
                atomic_parquet(tbl, os.path.join(self.lake.lake_dir, rel))
                pending_list = [
                    {
                        "path": rel,
                        "rows": tbl.num_rows,
                        "txns": len(self._txn_rows),
                    }
                ]
        state_schema = pa.schema(
            list(self._schema) + [pa.field("pid", pa.int32())]
        ) if self._schema is not None else self.lake.manifest.schema
        self.lake.manifest.commit_epoch(
            epoch, partition_updates, state_schema, self.P, delta,
            deadletter=deadletter, column_mapping=self._colmap,
            pending_txns=pending_list, windows_delta=windows_delta or None,
        )
        self.lake.compact()
        self._refresh_late_cutoff()  # the commit advanced the watermark
        if self._txn:
            # committed watermarks advanced: the checkpoint filter now owns
            # redelivery dedup, so the per-interval done-txn set can reset
            for p, o in self.lake.checkpoints().items():
                self._committed_arr[int(p)] = max(
                    self._committed_arr[int(p)], o
                )
            self._done_txns.clear()
            # levels, not deltas — reported per checkpoint, never summed into
            # the manifest metrics
            return {
                "epoch": epoch,
                **delta,
                "held_events": int(
                    sum(t.num_rows for lst in self._txn_rows.values() for t in lst)
                ),
                "held_txns": len(self._txn_rows),
            }
        return {"epoch": epoch, **delta}

    def close(self) -> None:
        import ray

        for a in self.actors:
            ray.kill(a)
        self.actors = []
