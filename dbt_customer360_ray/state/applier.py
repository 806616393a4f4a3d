"""Per-partition epoch applier — the stateful heart of the upsert pipeline.

Runs inside ``ds.groupby("skey").map_groups(...)``: one invocation per shuffle
group per epoch, over zero-copy Arrow. The shuffle key ``skey = pid * S + salt``
encodes an OWNER partition (``pid = stable_hash(conv_id) % P``, stable forever)
plus a salt that spreads a hot conversation's events over up to S parallel
appliers. Every applier writes its LWW-resolved sorted run under the OWNER's
directory, so a key's whole history always lives in one partition no matter how
the hot-key set evolves — salting parallelizes compute, never ownership
(SURVEY.md §7.4 point 4). Because the salt is a pure function of ``turn_idx``,
sub-runs of one epoch are key-disjoint and the owner's runs merge by plain LWW.

State is the owner partition's committed runs on disk (LSM-flavored: each epoch
appends runs; a separate compaction step merges them). State is rebuildable from
(manifest + committed files) — the exactly-once property SURVEY.md §7.4 point 1
requires: a re-executed applier task rewrites byte-identical files at
deterministic paths; the driver-side manifest commit is the only visible effect.

Replay dedup: events with ``offset <= committed max_offset(owner pid)`` are
dropped (the per-partition checkpoint) — exact when routing is unchanged (the
crash-replay case); if the hot-key set changed between deliveries a re-routed
duplicate can slip through and is absorbed by LWW idempotence. Late events
(ts older than an already-applied event for the same key) are counted for
lineage and resolved by LWW at merge; tombstones are persisted in runs so late
events can never resurrect a deleted row.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.lww import lww_latest, patch_collapse
from ..schemas import conform_batch

STATS_SCHEMA = pa.schema(
    [
        ("pid", pa.int32()),
        ("salt", pa.int32()),
        ("epoch", pa.int64()),
        ("events_in", pa.int64()),
        ("events_deduped", pa.int64()),
        ("upserts", pa.int64()),
        ("deletes", pa.int64()),
        ("late_events", pa.int64()),
        ("max_offset", pa.int64()),
        ("runs_json", pa.string()),  # [{"path","rows","tombstones"}], lake-relative
        ("top_keys_json", pa.string()),  # {"conv_id": count} for next-epoch hot set
        ("windows_json", pa.string()),  # {"<win_start_us>|<op>": n} applied-event counts
    ]
)


def window_count_delta(new: pa.Table, window_us: int) -> dict[str, int]:
    """Per-(tumbling event-time window, op) counts of APPLIED events (post
    offset-dedup, post quarantine) — the partial aggregate each applier ships
    to the manifest. Key is ``"<window_start_us>|<op>"`` so the deltas are
    plain-JSON addable across partitions, salts and epochs."""
    if new.num_rows == 0:
        return {}
    ts = new.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    win = (ts // window_us) * window_us
    ops = new.column("op").to_pandas().to_numpy(dtype=object)
    g = pd.DataFrame({"w": win, "op": ops}).groupby(["w", "op"], sort=False).size()
    return {f"{int(w)}|{o}": int(n) for (w, o), n in g.items()}


def apply_dv(table: pa.Table, run_path: str) -> pa.Table:
    """Merge-on-read DELETION VECTOR: drop the row POSITIONS listed in the
    ``<run>.dv`` sidecar (a one-column ``pos`` parquet). Only runs a DV commit
    hardlink-RENAMED carry a sidecar — older manifest versions still reference
    the original path, whose bytes have no sidecar — so time travel, change
    feeds and RESTORE read the exact pre-delete state with zero data copied.
    (On object storage the rename would be a server-side copy; the manifest's
    per-run ``dv_rows`` already records which runs carry vectors.)"""
    dvp = run_path + ".dv"
    if table.num_rows == 0 or not os.path.exists(dvp):
        return table
    pos = pq.read_table(dvp).column("pos").to_numpy(zero_copy_only=False)
    keep = np.ones(table.num_rows, dtype=bool)
    keep[pos[pos < table.num_rows]] = False
    return table.filter(pa.array(keep))


def load_run(run_path: str, state_schema: pa.Schema | None = None) -> pa.Table:
    """The ONE way to read a committed run file: parquet read, deletion-vector
    mask, then (optionally) conform to the lake schema. Every serving /
    maintenance surface that opens runs goes through here so a DV'd run is
    indistinguishable from a rewritten one."""
    from ..schemas import conform_batch

    t = apply_dv(pq.read_table(run_path), run_path)
    return conform_batch(t, state_schema) if state_schema is not None else t


def load_run_key_filtered(run_path: str, keys: list) -> pa.Table:
    """Point-lookup read of one run: parquet predicate pushdown on the clean
    path; a DV'd run must decode fully first (the sidecar positions are
    file-absolute, so they cannot compose with a filtered read) — acceptable:
    DVs are transient until the next compaction folds them in."""
    if os.path.exists(run_path + ".dv"):
        t = apply_dv(pq.read_table(run_path), run_path)
        return t.filter(pc.is_in(t.column("conv_id"), pa.array(keys)))
    return pq.read_table(run_path, filters=[("conv_id", "in", keys)])


def atomic_parquet(table: pa.Table, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    # run files (under data/) get a conv_id bloom sidecar so point lookups can
    # skip whole files without a footer read — hash routing scatters conv ids
    # across each partition's full key range, so min/max zone maps prune
    # nothing for point keys; a bloom does (the Iceberg/Delta file-skipping
    # idea, keyed for the lake's lookup path)
    if f"{os.sep}data{os.sep}" in path and "conv_id" in table.column_names:
        write_key_bloom(table, path)


_BLOOM_HASHES = 4
_BLOOM_BITS_PER_KEY = 10


def write_key_bloom(table: pa.Table, run_path: str, col: str = "conv_id") -> None:
    """Sidecar ``<run>.bloom``: 4-hash bloom over the run's distinct keys
    (md5-derived positions — deterministic across processes), ~1% false
    positives at 10 bits/key. Cost is one md5 per DISTINCT key at write time;
    the payoff is one tiny sequential read instead of a parquet footer+page
    fetch per non-matching run on the lookup path."""
    uniq = [u for u in pc.unique(table.column(col)).to_pylist() if u is not None]
    if not uniq:
        return
    m = 1 << max(10, (len(uniq) * _BLOOM_BITS_PER_KEY - 1).bit_length())
    bits = np.zeros(m // 8, np.uint8)
    pos = np.empty(len(uniq) * _BLOOM_HASHES, np.int64)
    for i, key in enumerate(uniq):
        d = hashlib.md5(key.encode("utf-8")).digest()
        for j in range(_BLOOM_HASHES):
            pos[i * _BLOOM_HASHES + j] = int.from_bytes(d[4 * j : 4 * j + 4], "little") % m
    np.bitwise_or.at(bits, pos // 8, (1 << (pos % 8)).astype(np.uint8))
    tmp = run_path + ".bloom.tmp"  # ends in .tmp → vacuum removes orphans
    with open(tmp, "wb") as f:
        f.write(m.to_bytes(8, "little"))
        f.write(bits.tobytes())
    os.replace(tmp, run_path + ".bloom")


def bloom_may_contain(run_path: str, key: str) -> bool:
    """False ⇒ the run definitely does not contain ``key``. Missing or
    unreadable sidecar ⇒ True (blooms are an optimization, never load-bearing
    for correctness)."""
    try:
        with open(run_path + ".bloom", "rb") as f:
            raw = f.read()
        m = int.from_bytes(raw[:8], "little")
        if m <= 0 or len(raw) < 8 + m // 8:
            return True
        d = hashlib.md5(key.encode("utf-8")).digest()
        for j in range(_BLOOM_HASHES):
            p = int.from_bytes(d[4 * j : 4 * j + 4], "little") % m
            if not (raw[8 + p // 8] >> (p % 8)) & 1:
                return False
        return True
    except OSError:
        return True


def run_ts_stats(table: pa.Table) -> dict:
    """Per-run ``ts`` min/max (epoch microseconds) recorded in the manifest —
    the Delta/Iceberg file-stats pattern that lets time-bounded reads skip
    whole runs without opening them (see CdcLake._read_manifest for the
    soundness argument: only the LOWER bound may prune)."""
    if table.num_rows == 0:
        return {}
    col = table.column("ts").cast(pa.int64())
    lo, hi = pc.min(col).as_py(), pc.max(col).as_py()
    if lo is None:
        return {}
    return {"ts_min": int(lo), "ts_max": int(hi)}


def _count_late(events: pa.Table) -> int:
    """Events applied out of ts order within their key: ts < running max ts of
    earlier-offset events for the same (conv_id, turn_idx). Pure numpy:
    lexsort on integer codes + segmented running max."""
    import pyarrow.compute as pc2

    n = events.num_rows
    if n == 0:
        return 0
    conv = events.column("conv_id")
    if isinstance(conv, pa.ChunkedArray):
        conv = conv.combine_chunks()
    conv_codes = pc2.dictionary_encode(conv).indices.to_numpy(zero_copy_only=False)
    turn = events.column("turn_idx").to_numpy(zero_copy_only=False).astype(np.int64)
    off = events.column("offset").to_numpy(zero_copy_only=False)
    ts = events.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
    order = np.lexsort((off, turn, conv_codes))
    cc, tt, tss = conv_codes[order], turn[order], ts[order]
    new_seg = np.ones(n, dtype=bool)
    new_seg[1:] = (cc[1:] != cc[:-1]) | (tt[1:] != tt[:-1])
    seg_id = np.cumsum(new_seg) - 1
    # segmented running max (int64-keyed pandas cummax runs in C)
    runmax = pd.Series(tss).groupby(pd.Series(seg_id), sort=False).cummax().to_numpy()
    return int((tss < runmax).sum())


class EpochApplier:
    """Callable for ``groupby("skey").map_groups``; emits one stats row per group."""

    def __init__(
        self,
        lake_dir: str,
        epoch: int,
        state_schema: pa.Schema,  # event columns + pid
        committed_offsets: dict[int, int],
        num_salts: int,
        topk_keys: int = 16,
        quarantine_skey: int | None = None,
        late_cutoff_us: int | None = None,
        merge_mode: str = "lww",
        exempt_offsets: frozenset | None = None,
        constraints: tuple = (),
        window_us: int | None = None,
        assign_offsets: bool = False,
    ):
        self.assign_offsets = assign_offsets
        self.merge_mode = merge_mode
        self.constraints = tuple(constraints)
        self.window_us = window_us
        self.lake_dir = lake_dir
        self.epoch = epoch
        self.state_schema = state_schema
        self.committed_offsets = committed_offsets
        self.S = max(1, num_salts)
        self.topk_keys = topk_keys
        self.quarantine_skey = quarantine_skey
        self.late_cutoff_us = late_cutoff_us
        # transaction holdback replay: these offsets were NEVER applied (their
        # transaction was cut by an earlier epoch boundary and parked in the
        # pending sidecar) even though the partition checkpoint has advanced
        # past them — they bypass the redelivery dedup exactly once, because
        # the sidecar leaves the manifest in the same commit that applies them
        self.exempt_offsets = exempt_offsets

    def _quarantine(self, group: pa.Table) -> pa.Table:
        """Dead-letter branch: persist malformed rows (plus a reason column)
        under ``deadletter/`` for lineage — never applied, never advances a
        checkpoint. Deterministic path → idempotent on replay."""
        from .router import PATCH_VALID_OPS, VALID_OPS, quarantine_reasons

        ops = PATCH_VALID_OPS if self.merge_mode == "patch" else VALID_OPS
        rows = group.drop_columns(["skey"])
        rows = rows.append_column(
            "dl_reason",
            pa.array(
                quarantine_reasons(
                    rows, self.late_cutoff_us, ops, self.constraints
                ),
                pa.string(),
            ),
        )
        path = os.path.join("deadletter", f"epoch-{self.epoch:06d}.parquet")
        atomic_parquet(rows, os.path.join(self.lake_dir, path))
        return pa.table(
            {
                "pid": pa.array([-1], pa.int32()),
                "salt": pa.array([0], pa.int32()),
                "epoch": pa.array([self.epoch], pa.int64()),
                "events_in": pa.array([rows.num_rows], pa.int64()),
                "events_deduped": pa.array([0], pa.int64()),
                "upserts": pa.array([0], pa.int64()),
                "deletes": pa.array([0], pa.int64()),
                "late_events": pa.array([0], pa.int64()),
                "max_offset": pa.array([-1], pa.int64()),
                "runs_json": pa.array(
                    [json.dumps([{"path": path, "rows": rows.num_rows}])], pa.string()
                ),
                "top_keys_json": pa.array(["{}"], pa.string()),
                "windows_json": pa.array(["{}"], pa.string()),
            },
            schema=STATS_SCHEMA,
        )

    def __call__(self, group: pa.Table) -> pa.Table:
        skey = int(group.column("skey")[0].as_py())
        if self.quarantine_skey is not None and skey == self.quarantine_skey:
            return self._quarantine(group)
        pid, salt = divmod(skey, self.S)
        group = conform_batch(group, self.state_schema).set_column(
            self.state_schema.get_field_index("pid"),
            "pid",
            pa.array([pid] * group.num_rows, pa.int32()),
        )
        if self.assign_offsets and group.num_rows:
            # Collision-FREE derived-view offsets, assigned AFTER routing:
            # (epoch+1)<<40 | skey<<rank_bits | rank-of-key within this
            # (pid, salt) group, keys sorted — globally unique (the skey
            # field separates partitions/salts), deterministic (routing +
            # sort are key functions of the event content), monotone across
            # epochs, and exact at any scale. Replaces the caller-side hash
            # recipe whose 39-bit birthday collisions silently dropped
            # distinct events at ~10M+ rows/epoch (first-delivery dedup ate
            # them — found by the r5 sf1.5 rehearsal, 5 missing keepers in
            # 2.77M). Callers emit a placeholder offset and must guarantee
            # UNIQUE keys per epoch (every sync_* view does: one event per
            # key per feed).
            n = group.num_rows
            if self.quarantine_skey is None:
                # rank_bits must derive from the TOTAL group count, which
                # only the caller knows — a per-group guess (e.g. skey+1)
                # would give different layouts per group and collide across
                # them, re-creating the silent-drop bug this mode fixes
                raise ValueError(
                    "assign_offsets requires quarantine_skey (= P * S, the "
                    "total routing-group count) so every group shares one "
                    "offset layout"
                )
            nsk = self.quarantine_skey
            rank_bits = 40 - (max(nsk - 1, 0)).bit_length()
            if rank_bits < 20:
                raise ValueError(
                    f"assign_offsets: {nsk} partition groups leave only "
                    f"2^{rank_bits} offsets per group — the 40-bit "
                    "intra-epoch budget is too small for this layout"
                )
            if n >= (1 << rank_bits):
                raise ValueError(
                    f"assign_offsets: partition group exceeds 2^{rank_bits} "
                    "events — raise num_partitions"
                )
            order = pc.sort_indices(
                group,
                sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")],
            )
            group = group.take(order)
            base = (np.int64(self.epoch + 1) << np.int64(40)) | (
                np.int64(skey) << np.int64(rank_bits)
            )
            group = group.set_column(
                group.schema.get_field_index("offset"),
                "offset",
                pa.array(base + np.arange(n, dtype=np.int64), pa.int64()),
            )
        events_in = group.num_rows
        committed = self.committed_offsets.get(pid, -1)
        fresh = pc.greater(group.column("offset"), committed)
        if self.exempt_offsets:
            fresh = pc.or_(
                fresh,
                pc.is_in(
                    group.column("offset"),
                    value_set=pa.array(sorted(self.exempt_offsets), pa.int64()),
                ),
            )
        new = group.filter(fresh)
        # first-delivery-wins WITHIN the epoch too: an at-least-once stream can
        # redeliver an offset inside one epoch file, where the committed-offset
        # floor can't see it — np.unique keeps the first occurrence, so event
        # counts (and window aggregates) are exact, not just the LWW state
        off = new.column("offset").to_numpy(zero_copy_only=False)
        if len(off) and len(np.unique(off)) < len(off):
            _, first_idx = np.unique(off, return_index=True)
            new = new.take(pa.array(np.sort(first_idx)))
        deduped = events_in - new.num_rows
        late = _count_late(new)
        deletes = int(pc.sum(pc.equal(new.column("op"), "D")).as_py() or 0)
        upserts = new.num_rows - deletes

        # winners incl. tombstones, key-sorted; patch-mode runs instead keep
        # the minimal event set whose merge-at-read is unchanged (latest D,
        # latest full image, trailing patches — see lww.patch_collapse)
        if self.merge_mode == "patch":
            run_table = patch_collapse(new)
        else:
            run_table = lww_latest(new)
        new_runs: list[dict] = []
        if run_table.num_rows > 0:
            name = (
                f"run-{self.epoch:06d}.parquet"
                if salt == 0
                else f"run-{self.epoch:06d}-s{salt:03d}.parquet"
            )
            path = os.path.join("data", f"part-{pid:05d}", name)
            atomic_parquet(run_table, os.path.join(self.lake_dir, path))
            tomb = int(pc.sum(pc.equal(run_table.column("op"), "D")).as_py() or 0)
            new_runs = [
                {"path": path, "rows": run_table.num_rows, "tombstones": tomb}
                | run_ts_stats(run_table)
            ]

        max_offset = committed
        if new.num_rows > 0:
            max_offset = max(max_offset, int(pc.max(new.column("offset")).as_py()))

        vc = (
            pd.Series(new.column("conv_id").to_pandas())
            .value_counts()
            .head(self.topk_keys)
        )
        return pa.table(
            {
                "pid": pa.array([pid], pa.int32()),
                "salt": pa.array([salt], pa.int32()),
                "epoch": pa.array([self.epoch], pa.int64()),
                "events_in": pa.array([events_in], pa.int64()),
                "events_deduped": pa.array([deduped], pa.int64()),
                "upserts": pa.array([upserts], pa.int64()),
                "deletes": pa.array([deletes], pa.int64()),
                "late_events": pa.array([late], pa.int64()),
                "max_offset": pa.array([max_offset], pa.int64()),
                "runs_json": pa.array([json.dumps(new_runs)], pa.string()),
                "top_keys_json": pa.array(
                    [json.dumps({str(k): int(v) for k, v in vc.items()})], pa.string()
                ),
                "windows_json": pa.array(
                    [
                        json.dumps(window_count_delta(new, self.window_us))
                        if self.window_us
                        else "{}"
                    ],
                    pa.string(),
                ),
            },
            schema=STATS_SCHEMA,
        )
