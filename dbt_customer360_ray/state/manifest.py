"""Two-phase manifest commit — the exactly-once sink.

The reference has no incremental path at all (every model is a full-refresh
``CREATE TABLE AS``, /root/reference/dbt_project.yml:11); exactly-once under
replay is new design per BASELINE.json north_rule. Protocol (SURVEY.md §4.2):

1. Appliers write data files to deterministic final paths
   (``data/part=<pid>/run-<epoch>.parquet``). A crashed epoch leaves orphans that
   an identical replay simply overwrites byte-for-byte (LWW is deterministic);
   orphans are invisible to readers because reads go through the manifest.
2. The committer writes ``_manifest/MANIFEST-<version>.json`` to a temp name,
   fsyncs, atomically renames, then atomically updates ``_manifest/CURRENT``.
   The rename of CURRENT is the commit point.

The manifest records, per partition: live run files, row counts, max committed
offset (the per-partition checkpoint used for resume + replay dedup), and
cumulative lineage metrics. It also records the current evolved lake schema.
"""

from __future__ import annotations

import contextlib
import json
import os
import threading
import time
import pyarrow as pa


class CommitConflictError(RuntimeError):
    """Another writer committed a manifest version we did not base on.

    Raised by ``Manifest._persist`` when, under the commit lock, CURRENT no
    longer points at the version this commit was computed against. Callers
    (``commit_epoch`` / ``commit_compaction``) catch it, ``reload()``, rebase
    their delta onto the fresh state and retry — optimistic concurrency
    control, the Delta-style protocol for multiple writers sharing one lake.
    """


def _atomic_write(path: str, data: str) -> None:
    # pid+tid-suffixed temp name: concurrent writers must never share a temp
    tmp = f"{path}.tmp.{os.getpid()}.{threading.get_ident()}"
    with open(tmp, "w") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


# Rebase attempts per commit: each CommitConflictError round has exactly one
# winner among the contenders, so a writer fails only by losing every round —
# 20 rounds + linear backoff makes that negligible even for bursty thread
# pools (the liveness bound stays the commit lock's LOCK_WAIT_S).
_COMMIT_RETRIES = 20


def _schema_to_json(schema: pa.Schema) -> str:
    return schema.serialize().to_pybytes().hex()


def _schema_from_json(hexstr: str) -> pa.Schema:
    return pa.ipc.read_schema(pa.py_buffer(bytes.fromhex(hexstr)))


class LogStore:
    """Commit-arbitration interface for the manifest critical section — the
    pluggable piece Delta Lake calls the LogStore in its S3 multi-writer
    design: object stores without atomic create-if-absent cannot host a
    POSIX lock-file mutex, so deployments there swap in an external CAS
    arbiter (a DynamoDB/etcd/ZooKeeper conditional-put cell) while manifest
    BODIES stay in the lake directory (data plane vs control plane).

    Contract: ``read_current()`` returns the committed version pointer
    (0 = empty lake). ``try_commit(version, state_json)`` durably writes
    MANIFEST-<version> and THEN atomically advances the pointer
    version-1 → version; it returns False — with NO pointer side effect —
    if another writer advanced it first. The pointer swap is the
    linearization point; False means rebase-and-retry (``Manifest``'s
    commit loops already do). An orphaned MANIFEST body from a writer that
    lost the race is unreachable and harmless (same-version bodies are
    byte-divergent only if the loser also lost the CAS, in which case its
    file is overwritten by the winner's next write or vacuumed)."""

    #: True when the store publishes the canonical MANIFEST body AFTER the
    #: pointer swap (CAS stores: the winner publishes post-CAS). Readers then
    #: retry a missing body briefly; pointer-last stores (Posix) must instead
    #: fail fast — a missing body there is genuine corruption.
    publish_after_pointer = False

    def read_current(self) -> int:
        raise NotImplementedError

    def try_commit(self, version: int, state_json: str) -> bool:
        raise NotImplementedError

    def recover_body(self, version: int) -> bool:
        """Attempt to complete a crashed winner's publish of
        ``MANIFEST-<version>`` (stores that stage durably before the CAS can
        finish the copy — Delta's S3 recovery step). Returns True when the
        canonical body now exists."""
        return False


class PosixLogStore(LogStore):
    """Default arbiter for shared POSIX filesystems: O_EXCL lock-file mutex
    around (pointer check → body write → pointer rename). A crashed
    holder's lock is broken after ``LOCK_STALE_S`` (the critical section is
    two small file writes — milliseconds; 10 s is orders of magnitude past
    it).

    Fencing: the lock file carries a unique HOLDER TOKEN. A holder paused
    past ``LOCK_STALE_S`` (GC, VM freeze) can have its lock broken and
    re-acquired; when it wakes it re-verifies ownership immediately before
    each irreversible step (canonical body publish, pointer rename) and
    surfaces ``CommitConflictError`` instead of double-committing — the
    lost-update window the unfenced ordering had. The residual race is the
    microseconds between the ownership check and the rename (POSIX rename
    cannot be made conditional); deployments needing a hard guarantee use a
    CAS store (``MemoryCasLogStore`` / ``FileCasLogStore``)."""

    LOCK_STALE_S = 10.0
    LOCK_WAIT_S = 30.0

    def __init__(self, manifest_dir: str):
        self.dir = manifest_dir

    def _current_path(self) -> str:
        return os.path.join(self.dir, "CURRENT")

    def read_current(self) -> int:
        try:
            with open(self._current_path()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0

    def _lock_path(self) -> str:
        return os.path.join(self.dir, "COMMIT.lock")

    def _owns_lock(self, token: str) -> bool:
        try:
            with open(self._lock_path()) as f:
                return f.read() == token
        except FileNotFoundError:
            return False  # broken and released by another writer

    @contextlib.contextmanager
    def _commit_lock(self):
        import uuid

        path = self._lock_path()
        token = f"{os.getpid()}.{threading.get_ident()}.{uuid.uuid4().hex}\n"
        deadline = time.monotonic() + self.LOCK_WAIT_S
        while True:
            try:
                fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, token.encode())
                os.close(fd)
                break
            except FileExistsError:
                try:
                    if time.time() - os.path.getmtime(path) > self.LOCK_STALE_S:
                        os.unlink(path)  # break a dead holder's lock
                        continue
                except FileNotFoundError:
                    continue
                if time.monotonic() > deadline:
                    raise CommitConflictError(
                        f"commit lock {path} held past {self.LOCK_WAIT_S}s"
                    )
                time.sleep(0.005)
        try:
            yield token
        finally:
            # release only OUR lock — a broken-and-reacquired lock belongs
            # to the new holder now
            if self._owns_lock(token):
                with contextlib.suppress(FileNotFoundError):
                    os.unlink(path)

    def _pre_publish_pause(self) -> None:
        """Test seam: monkeypatched to simulate a holder pausing (GC / VM
        freeze) between staging the body and publishing it."""

    def try_commit(self, version: int, state_json: str) -> bool:
        with self._commit_lock() as token:
            if self.read_current() != version - 1:
                return False
            body = os.path.join(self.dir, f"MANIFEST-{version:08d}.json")
            tmp = f"{body}.tmp.{os.getpid()}.{threading.get_ident()}"
            with open(tmp, "w") as f:
                f.write(state_json)
                f.flush()
                os.fsync(f.fileno())
            self._pre_publish_pause()
            # fence: a stale-broken lock means another writer owns this
            # version now — abort BEFORE touching the canonical body
            if not self._owns_lock(token):
                with contextlib.suppress(FileNotFoundError):
                    os.unlink(tmp)
                raise CommitConflictError(
                    f"commit lock for v{version} was broken while this "
                    "holder was paused; another writer owns the commit"
                )
            os.replace(tmp, body)
            if not self._owns_lock(token):
                raise CommitConflictError(
                    f"commit lock for v{version} was broken before the "
                    "pointer rename; aborting without advancing CURRENT"
                )
            _atomic_write(self._current_path(), str(version))
            return True


class CasCell:
    """Process-local atomic compare-and-swap integer cell — the test double
    for the external arbiter's conditional put. Shared between LogStore
    instances to model multiple writers against one arbiter."""

    def __init__(self, value: int = 0):
        import threading

        self._value = int(value)
        self._lock = threading.Lock()

    @property
    def value(self) -> int:
        with self._lock:
            return self._value

    def compare_and_swap(self, expected: int, new: int) -> bool:
        with self._lock:
            if self._value != expected:
                return False
            self._value = new
            return True


class MemoryCasLogStore(LogStore):
    """The Delta-on-S3 log-store pattern, coded: the version pointer lives
    in an external CAS cell (here ``CasCell``; in production a DynamoDB
    conditional put / etcd txn) and manifest bodies live in the directory.
    No filesystem atomicity is assumed beyond single-object PUT (atomic
    rename here).

    Ordering is the load-bearing part: the body is staged under a UNIQUE
    temp name, the CAS decides the winner, and only the winner publishes
    the canonical MANIFEST-<v> — a loser that wrote canonical BEFORE the
    CAS would clobber the winner's same-version body (a real lost update,
    caught by the concurrent-writer test). Readers that observe the pointer
    inside the winner's publish window retry briefly (``Manifest._load``),
    mirroring Delta's recovery-copy step.

    Limitation (test double only): a winner crashing between the CAS and the
    publish leaves its version unreadable — the staged temp name is random,
    so readers cannot complete the copy. ``FileCasLogStore`` records the
    staged path in the marker and IS recoverable; use it for anything beyond
    in-process tests."""

    publish_after_pointer = True

    def __init__(self, manifest_dir: str, cell: CasCell | None = None):
        self.dir = manifest_dir
        self.cell = cell if cell is not None else CasCell()

    def read_current(self) -> int:
        return self.cell.value

    def try_commit(self, version: int, state_json: str) -> bool:
        import uuid

        if self.cell.value != version - 1:
            return False  # cheap pre-check; the CAS below is authoritative
        tmp = os.path.join(
            self.dir, f".MANIFEST-{version:08d}-{uuid.uuid4().hex}.tmp"
        )
        with open(tmp, "w") as f:
            f.write(state_json)
            f.flush()
            os.fsync(f.fileno())
        if not self.cell.compare_and_swap(version - 1, version):
            with contextlib.suppress(FileNotFoundError):
                os.unlink(tmp)
            return False
        # sole CAS winner for this version → the one canonical publish
        os.replace(tmp, os.path.join(self.dir, f"MANIFEST-{version:08d}.json"))
        return True


class FileCasLogStore(LogStore):
    """File-backed conditional-put arbiter — the deployable emulation of the
    DynamoDB/etcd cell the Delta-on-S3 LogStore design assumes, with no
    external service: the pointer advances by CREATE-IF-ABSENT
    (``O_CREAT|O_EXCL``) of a ``v<N>`` marker file in a dedicated arbiter
    directory (pass a path on a filesystem where exclusive create is atomic
    — a local disk or a real POSIX NFS v4 mount; manifest BODIES stay in the
    lake's ``_manifest`` directory, the data-plane/control-plane split).

    Ordering (the same winner-only-publish discipline the CAS store's test
    caught a lost update without):

    1. stage the body durably under a unique temp name,
    2. conditional put: exclusive-create ``arbiter/v<N>`` whose CONTENT is
       the staged temp path — the linearization point; losers see
       FileExistsError, clean up, return False,
    3. the winner renames its staged body onto canonical ``MANIFEST-<N>``.

    Crash recovery: a winner dying between (2) and (3) leaves the marker
    pointing at a durably-staged body, so ANY later reader/writer completes
    the copy (``recover_body`` — Delta's S3 recovery-copy step); the staged
    file is never deleted by the winner's publish (rename consumes it).
    Duplicate attempts at the same version are harmless: exactly one
    exclusive create succeeds."""

    publish_after_pointer = True

    def __init__(self, manifest_dir: str, arbiter_dir: str):
        self.dir = manifest_dir
        self.arbiter_dir = arbiter_dir
        self._cur = 0  # monotone cached floor (markers are never removed)
        os.makedirs(arbiter_dir, exist_ok=True)

    def _marker(self, version: int) -> str:
        return os.path.join(self.arbiter_dir, f"v{version:08d}")

    def read_current(self) -> int:
        # markers are created strictly sequentially (v N commits only when
        # CURRENT == N-1), so probing FORWARD from the cached floor is
        # complete — O(delta) stat calls per read instead of an O(versions)
        # directory listing (which compounds quadratically over a lake's
        # lifetime of frequent read_current calls)
        cur = self._cur
        while os.path.exists(self._marker(cur + 1)):
            cur += 1
        self._cur = cur
        return cur

    def try_commit(self, version: int, state_json: str) -> bool:
        import uuid

        if self.read_current() != version - 1:
            return False  # cheap pre-check; the exclusive create arbitrates
        tmp = os.path.join(
            self.dir, f".MANIFEST-{version:08d}-{uuid.uuid4().hex}.staged"
        )
        with open(tmp, "w") as f:
            f.write(state_json)
            f.flush()
            os.fsync(f.fileno())
        try:
            fd = os.open(
                self._marker(version), os.O_CREAT | os.O_EXCL | os.O_WRONLY
            )
        except FileExistsError:
            with contextlib.suppress(FileNotFoundError):
                os.unlink(tmp)
            return False
        os.write(fd, tmp.encode())
        os.fsync(fd)
        os.close(fd)
        # sole marker creator for this version → the one canonical publish
        os.replace(
            tmp, os.path.join(self.dir, f"MANIFEST-{version:08d}.json")
        )
        return True

    def recover_body(self, version: int) -> bool:
        """Complete a crashed winner's publish: copy the marker's staged body
        onto the canonical name if the canonical is missing. Idempotent and
        safe under races — the canonical content is identical either way."""
        canon = os.path.join(self.dir, f"MANIFEST-{version:08d}.json")
        if os.path.exists(canon):
            return True
        try:
            with open(self._marker(version)) as f:
                staged = f.read().strip()
        except FileNotFoundError:
            return False
        if not staged:
            return False  # winner died inside the marker write itself
        try:
            with open(staged) as f:
                body = f.read()
        except FileNotFoundError:
            # another recoverer won the copy (rename consumed the staged
            # file) — or genuine corruption; re-check the canonical
            return os.path.exists(canon)
        _atomic_write(canon, body)
        with contextlib.suppress(FileNotFoundError):
            os.unlink(staged)  # recovered — don't leak the staged body
        return True


class Manifest:
    """Versioned lake manifest with atomic CURRENT pointer. ``log_store``
    plugs the commit-arbitration strategy (default: ``PosixLogStore``)."""

    def __init__(self, lake_dir: str, log_store: LogStore | None = None):
        self.lake_dir = lake_dir
        self.dir = os.path.join(lake_dir, "_manifest")
        os.makedirs(self.dir, exist_ok=True)
        self.log_store = log_store if log_store is not None else PosixLogStore(self.dir)
        self._state = self._load()

    # -- load/save ---------------------------------------------------------
    def _current_path(self) -> str:
        return os.path.join(self.dir, "CURRENT")

    def _load(self) -> dict:
        version = self.log_store.read_current()
        if version == 0:
            return {
                "version": 0,
                "last_epoch": -1,
                "schema": None,
                "num_partitions": None,
                "partitions": {},
                "metrics": {},
                "epochs": [],
            }
        path = os.path.join(self.dir, f"MANIFEST-{version:08d}.json")
        # CAS log stores advance the pointer before publishing the canonical
        # body (the winner-only publish ordering); a reader landing in that
        # millisecond window first attempts the store's crash recovery
        # (FileCasLogStore completes the staged copy), then retries briefly.
        # Pointer-LAST stores (Posix) write the body before CURRENT, so a
        # missing body there is genuine corruption — fail fast, no busy-wait.
        attempts = (
            200 if getattr(self.log_store, "publish_after_pointer", False) else 1
        )
        for attempt in range(attempts):
            try:
                with open(path) as f:
                    return json.load(f)
            except FileNotFoundError:
                if self.log_store.recover_body(version):
                    continue
                if attempt >= attempts - 1:
                    raise
                time.sleep(0.005)
        # recover_body succeeded on the final attempt but the body still
        # would not open — surface it instead of falling through to None
        raise FileNotFoundError(
            f"manifest body {path} unreadable after recovery attempts"
        )

    def reload(self) -> None:
        self._state = self._load()

    # -- accessors ---------------------------------------------------------
    @property
    def version(self) -> int:
        return self._state["version"]

    @property
    def last_epoch(self) -> int:
        return self._state["last_epoch"]

    @property
    def num_partitions(self) -> int | None:
        return self._state["num_partitions"]

    @property
    def schema(self) -> pa.Schema | None:
        s = self._state["schema"]
        return _schema_from_json(s) if s else None

    @property
    def metrics(self) -> dict:
        return dict(self._state["metrics"])

    @property
    def consumers(self) -> dict[str, int]:
        """Named change-feed consumer cursors: consumer → last ACKed manifest
        version. A consumer that has never acked reads from version 0 (the
        empty lake — everything is an insert)."""
        return {k: int(v) for k, v in self._state.get("consumers", {}).items()}

    def commit_consumer_cursor(self, consumer: str, version: int) -> int:
        """Advance a named consumer's cursor (monotone — a stale ack can never
        move it backwards). A new manifest version, CAS-retried like every
        commit; returns the new manifest version."""
        for attempt in range(_COMMIT_RETRIES):
            state = json.loads(json.dumps(self._state))
            cur = int(state.get("consumers", {}).get(consumer, 0))
            state.setdefault("consumers", {})[consumer] = max(cur, int(version))
            state["operation"] = {"op": "CONSUMER_ACK", "consumer": consumer}
            state["version"] += 1
            try:
                self._persist(state)
                return state["version"]
            except CommitConflictError:
                if attempt == _COMMIT_RETRIES - 1:
                    raise
                time.sleep(0.001 * attempt)  # drain a contended writer burst
                self.reload()

    @property
    def pending_txns(self) -> list[dict]:
        """Transaction-holdback sidecars still awaiting completion:
        ``[{"path": lake-relative, "rows": n, "txns": k}]``. Replaced (not
        appended) by each transactional apply's commit — a sidecar is either
        pending or consumed, never both."""
        return list(self._state.get("pending_txns", []))

    @property
    def windows(self) -> dict[str, int]:
        """Cumulative tumbling-window applied-event counts
        (``"<window_start_us>|<op>"`` → n), folded additively per commit."""
        return {k: int(v) for k, v in self._state.get("windows", {}).items()}

    @property
    def constraints(self) -> list[dict]:
        """Declared table constraints (CHECK / NOT NULL), enforced at every
        apply — per-version like the schema, so time travel / RESTORE see the
        constraint set a writer at that snapshot enforced."""
        return [dict(c) for c in self._state.get("constraints", [])]

    def commit_constraints(self, constraints: list[dict]) -> int:
        """Metadata-only commit replacing the constraint list (ADD / DROP
        CONSTRAINT) — a new manifest version, no data files touched."""
        for attempt in range(_COMMIT_RETRIES):
            state = json.loads(json.dumps(self._state))
            state["constraints"] = json.loads(json.dumps(constraints))
            state["operation"] = {"op": "SET_CONSTRAINTS", "n": len(constraints)}
            state["version"] += 1
            try:
                self._persist(state)
                return state["version"]
            except CommitConflictError:
                if attempt == _COMMIT_RETRIES - 1:
                    raise
                time.sleep(0.001 * attempt)  # drain a contended writer burst
                self.reload()

    @property
    def masks(self) -> list[dict]:
        """Column masking policies (``{"column", "kind"}``, kind ∈ {"null",
        "hash"}), applied at the SERVING read surfaces (read / read_as_of /
        lookup / lookup_many). Policies are governance state, not data state:
        the CURRENT mask set applies to every snapshot read, including time
        travel — revoking access must cover history too."""
        return [dict(m) for m in self._state.get("masks", [])]

    def commit_masks(self, masks: list[dict]) -> int:
        """Metadata-only commit replacing the mask list (ADD / DROP MASK)."""
        for attempt in range(_COMMIT_RETRIES):
            state = json.loads(json.dumps(self._state))
            state["masks"] = json.loads(json.dumps(masks))
            state["operation"] = {"op": "SET_MASKS", "n": len(masks)}
            state["version"] += 1
            try:
                self._persist(state)
                return state["version"]
            except CommitConflictError:
                if attempt == _COMMIT_RETRIES - 1:
                    raise
                time.sleep(0.001 * attempt)  # drain a contended writer burst
                self.reload()

    @property
    def purged_keys(self) -> list[str]:
        """Conversations erased by ``purge_key`` (GDPR right-to-be-forgotten):
        every read surface — serving, time travel, change feed, export,
        assembly — filters these keys, regardless of which historical files
        still hold their bytes until ``vacuum``."""
        return list(self._state.get("purged_keys", []))

    def commit_purge(self, keys: list[str]) -> int:
        """Add keys to the purge list (set-union, never removed — erasure is
        permanent). One atomic version bump, operation PURGE_KEY."""
        for attempt in range(_COMMIT_RETRIES):
            state = json.loads(json.dumps(self._state))
            cur = list(state.get("purged_keys", []))
            merged = sorted(set(cur) | set(map(str, keys)))
            state["purged_keys"] = merged
            state["operation"] = {"op": "PURGE_KEY", "n": len(merged)}
            state["version"] += 1
            try:
                self._persist(state)
                return state["version"]
            except CommitConflictError:
                if attempt == _COMMIT_RETRIES - 1:
                    raise
                time.sleep(0.001 * attempt)  # drain a contended writer burst
                self.reload()

    @property
    def row_filters(self) -> list[dict]:
        """Row access policies (constraint-shaped specs) applied at the
        SERVING read surfaces: a row is served unless a policy predicate is
        definitively FALSE (SQL CHECK semantics — nulls pass, except
        ``not_null`` which demands a value). Governance state like masks:
        the CURRENT set covers every snapshot."""
        return [dict(f) for f in self._state.get("row_filters", [])]

    def commit_row_filters(self, filters: list[dict]) -> int:
        """Metadata-only commit replacing the row-policy list."""
        for attempt in range(_COMMIT_RETRIES):
            state = json.loads(json.dumps(self._state))
            state["row_filters"] = json.loads(json.dumps(filters))
            state["operation"] = {"op": "SET_ROW_FILTERS", "n": len(filters)}
            state["version"] += 1
            try:
                self._persist(state)
                return state["version"]
            except CommitConflictError:
                if attempt == _COMMIT_RETRIES - 1:
                    raise
                time.sleep(0.001 * attempt)  # drain a contended writer burst
                self.reload()

    @property
    def computed_columns(self) -> list[dict]:
        """Generated-column specs (``{"name","kind","source"}``) derived at
        every apply — per-version like the schema."""
        return [dict(c) for c in self._state.get("computed_columns", [])]

    def commit_computed_columns(self, specs: list[dict]) -> int:
        """Metadata-only commit replacing the generated-column list."""
        for attempt in range(_COMMIT_RETRIES):
            state = json.loads(json.dumps(self._state))
            state["computed_columns"] = json.loads(json.dumps(specs))
            state["operation"] = {"op": "SET_COMPUTED_COLUMNS", "n": len(specs)}
            state["version"] += 1
            try:
                self._persist(state)
                return state["version"]
            except CommitConflictError:
                if attempt == _COMMIT_RETRIES - 1:
                    raise
                time.sleep(0.001 * attempt)  # drain a contended writer burst
                self.reload()

    @property
    def column_mapping(self) -> dict | None:
        """Delta-style column mapping: ``{"logical": {logical→physical},
        "used": [every physical ever allocated]}`` — or None when the lake has
        never renamed/dropped a column (identity namespace, zero overhead).
        Per-version like the schema, so time travel and RESTORE see the names
        a reader at that snapshot saw."""
        return self._state.get("column_mapping")

    def partition(self, pid: int) -> dict:
        return self._state["partitions"].get(
            str(pid), {"runs": [], "max_offset": -1, "rows": 0}
        )

    def live_files(self, pid: int | None = None) -> list[str]:
        parts = self._state["partitions"]
        pids = [str(pid)] if pid is not None else sorted(parts, key=int)
        out = []
        for p in pids:
            for run in parts.get(p, {}).get("runs", []):
                out.append(os.path.join(self.lake_dir, run["path"]))
        return out

    def committed_offsets(self) -> dict[int, int]:
        """Per-partition max committed offset — the resume checkpoint."""
        return {
            int(p): info["max_offset"]
            for p, info in self._state["partitions"].items()
        }

    def epoch_committed(self, epoch: int) -> bool:
        return any(e["epoch"] == epoch for e in self._state["epochs"])

    # -- time travel ---------------------------------------------------------
    def version_for_epoch(self, epoch: int) -> int:
        """Manifest version created by the commit of ``epoch`` — the time-travel
        anchor. (A compaction that follows the epoch bumps the version WITHOUT
        an epoch record, so this always resolves to the pre-compaction snapshot
        whose run files are still on disk until ``vacuum``.)"""
        for e in self._state["epochs"]:
            if e["epoch"] == epoch:
                return int(e["version"])
        raise KeyError(
            f"epoch {epoch} has no committed manifest version "
            f"(committed epochs: {[e['epoch'] for e in self._state['epochs']]})"
        )

    def version_for_offset(self, offset: int) -> int:
        """Greatest committed epoch version whose global offset watermark
        (max over partitions' ``max_offset``) is ≤ ``offset`` — binlog-POSITION
        time travel, the coordinate a CDC consumer actually has. Offsets are
        monotone across epochs (a binlog position), so the scan early-exits."""
        best = None
        for e in self._state["epochs"]:
            snap = self.at_version(int(e["version"]))
            w = max(
                (int(p["max_offset"]) for p in snap._state["partitions"].values()),
                default=-1,
            )
            if w <= offset:
                best = int(e["version"])
            else:
                break
        if best is None:
            raise KeyError(f"no committed snapshot at or below offset {offset}")
        return best

    def expire_snapshots(self, keep_last: int = 10) -> int:
        """Iceberg-style ``expire_snapshots``: delete manifest versions older
        than the newest ``keep_last`` (CURRENT always survives), bounding the
        version log's growth. Time travel below the horizon raises a clear
        KeyError afterwards; data files referenced ONLY by expired versions
        are already what ``vacuum()`` reclaims (it keys off CURRENT), so the
        pair (expire_snapshots → vacuum) is the complete retention story.
        Returns the number of manifest files removed."""
        if keep_last < 1:
            raise ValueError("expire_snapshots: keep_last must be >= 1")
        horizon = self.version - keep_last
        removed = 0
        for name in sorted(os.listdir(self.dir)):
            if not (name.startswith("MANIFEST-") and name.endswith(".json")):
                continue
            v = int(name[len("MANIFEST-"):-len(".json")])
            if v <= horizon:
                os.remove(os.path.join(self.dir, name))
                removed += 1
        return removed

    def at_version(self, version: int) -> "Manifest":
        """Read-only snapshot pinned at ``version``. Every commit retains its
        ``MANIFEST-<version>.json`` (the Delta/Iceberg log pattern), so any
        historical snapshot is reconstructable until ``vacuum`` removes data
        files it references — vacuum is the retention horizon, exactly the
        standard lake semantics. Version 0 is the empty pre-creation state."""
        snap = Manifest.__new__(Manifest)
        snap.lake_dir = self.lake_dir
        snap.dir = self.dir
        if version == 0:
            snap._state = {
                "version": 0, "last_epoch": -1, "schema": None,
                "num_partitions": self._state["num_partitions"],
                "partitions": {}, "metrics": {}, "epochs": [],
            }
            return snap
        path = os.path.join(self.dir, f"MANIFEST-{version:08d}.json")
        try:
            with open(path) as f:
                snap._state = json.load(f)
        except FileNotFoundError:
            raise KeyError(
                f"manifest version {version} is expired or was never "
                f"committed (expire_snapshots trims the log; current "
                f"version is {self.version})"
            ) from None
        return snap

    # -- commit ------------------------------------------------------------
    def commit_epoch(
        self,
        epoch: int,
        partition_updates: dict[int, dict],
        schema: pa.Schema,
        num_partitions: int,
        metrics_delta: dict,
        hot_keys: list[str] | None = None,
        deadletter: list[dict] | None = None,
        column_mapping: dict | None = None,
        pending_txns: list[dict] | None = None,
        windows_delta: dict | None = None,
    ) -> None:
        """Atomically commit one applied epoch.

        ``partition_updates[pid]`` = {"runs": [{"path","rows","tombstones"}],
        "max_offset": int, "rows": int, "replaces": bool} — ``replaces=True``
        (compaction) swaps the partition's run list instead of appending.

        Concurrency: if another writer commits first (``CommitConflictError``
        from the CAS in ``_persist``), the update is rebased onto the fresh
        state and retried — append updates carry their caller-computed ``rows``
        as a DELTA against the base the caller read, so the rebase composes
        with the other writer's counts instead of clobbering them. Writers
        must use disjoint run-file path namespaces (the epoch/stream/job
        suffixes already do); ``replaces=True`` updates assume no concurrent
        appends to the same partition.
        """
        # caller-absolute rows → deltas against the base the caller read
        # (== self._state right now), so a rebase re-adds them correctly
        rows_delta = {
            pid: upd.get("rows", 0) - self.partition(pid)["rows"]
            for pid, upd in partition_updates.items()
            if not upd.get("replaces") and "rows" in upd
        }
        for attempt in range(_COMMIT_RETRIES):
            state = json.loads(json.dumps(self._state))  # deep copy
            for pid, upd in partition_updates.items():
                cur = state["partitions"].get(
                    str(pid), {"runs": [], "max_offset": -1, "rows": 0}
                )
                if upd.get("replaces"):
                    cur["runs"] = list(upd["runs"])
                    cur["rows"] = upd.get("rows", cur["rows"])
                elif pid in rows_delta:
                    cur["runs"] = cur["runs"] + list(upd["runs"])
                    cur["rows"] = cur["rows"] + rows_delta[pid]
                else:
                    cur["runs"] = cur["runs"] + list(upd["runs"])
                cur["max_offset"] = max(cur["max_offset"], upd.get("max_offset", -1))
                state["partitions"][str(pid)] = cur
            m = state["metrics"]
            for k, v in metrics_delta.items():
                m[k] = m.get(k, 0) + v
            if hot_keys is not None:
                state["hot_keys"] = list(hot_keys)
            if deadletter:
                # lake-relative quarantine files, appended for lineage — the DLQ
                # never contributes to partitions/checkpoints
                state["deadletter"] = state.get("deadletter", []) + list(deadletter)
            if column_mapping is not None:
                # epoch introduced new logical columns → persist their
                # physical allocations atomically with the data commit
                state["column_mapping"] = column_mapping
            if pending_txns is not None:
                # transactional apply: REPLACE the holdback list atomically
                # with the commit that consumed the old sidecars ([] clears)
                state["pending_txns"] = list(pending_txns)
            if windows_delta:
                # tumbling-window applied-event counts: additive fold, keyed
                # "<window_start_us>|<op>" — versioned with the data, so time
                # travel / RESTORE see the counts as of each snapshot
                w = state.get("windows", {})
                for k, v in windows_delta.items():
                    w[k] = w.get(k, 0) + int(v)
                state["windows"] = w
            state["schema"] = _schema_to_json(schema)
            state["num_partitions"] = num_partitions
            state["last_epoch"] = max(state["last_epoch"], epoch)
            state["epochs"].append(
                {"epoch": epoch, "version": state["version"] + 1, "metrics": metrics_delta}
            )
            state["operation"] = {"op": "APPLY", "epoch": epoch}
            state["version"] += 1
            try:
                self._persist(state)
                return
            except CommitConflictError:
                if attempt == _COMMIT_RETRIES - 1:
                    raise
                time.sleep(0.001 * attempt)  # drain a contended writer burst
                self.reload()

    def commit_compaction(
        self,
        partition_updates: dict[int, dict],
        schema: pa.Schema | None = None,
        op: str = "COMPACT",
    ) -> None:
        """Swap compacted partitions' run lists atomically (no epoch record).

        ``partition_updates[pid]`` may carry ``replaced_paths`` — the
        lake-relative paths of the runs the compactor actually merged. On a
        rebase after a concurrent commit, runs appended since the compactor
        read its inputs are KEPT (new base first, then the survivors), so a
        concurrent ingest epoch is never silently dropped; LWW merge-at-read
        makes the overlap harmless. Without ``replaced_paths`` the swap is
        wholesale (single-writer behavior, unchanged). ``schema`` lets a
        rewrite that materialized NEW columns (``backfill_computed``) evolve
        the lake schema in the same atomic commit."""
        for attempt in range(_COMMIT_RETRIES):
            state = json.loads(json.dumps(self._state))
            if schema is not None:
                state["schema"] = _schema_to_json(schema)
            for pid, upd in partition_updates.items():
                cur = state["partitions"].get(
                    str(pid), {"runs": [], "max_offset": -1, "rows": 0}
                )
                if "replaced_paths" in upd:
                    replaced = set(upd["replaced_paths"])
                    kept = [r for r in cur["runs"] if r["path"] not in replaced]
                else:
                    kept = []
                cur["runs"] = list(upd["runs"]) + kept
                cur["max_offset"] = max(cur["max_offset"], upd.get("max_offset", -1))
                cur["rows"] = upd["rows"] + sum(
                    r["rows"] - r["tombstones"] for r in kept
                )
                state["partitions"][str(pid)] = cur
            state["operation"] = {"op": op, "partitions": len(partition_updates)}
            state["version"] += 1
            try:
                self._persist(state)
                return
            except CommitConflictError:
                if attempt == _COMMIT_RETRIES - 1:
                    raise
                time.sleep(0.001 * attempt)  # drain a contended writer burst
                self.reload()

    def commit_merge(
        self,
        partition_updates: dict[int, dict],
        schema: pa.Schema,
        new_epochs: list[int],
        metrics_delta: dict,
        source: str,
    ) -> int:
        """Commit a BRANCH MERGE: append the diverged branch's run files to
        each partition's live list (``partition_updates[pid]["runs"]`` —
        already absolute paths into the branch's directory), advance
        checkpoints to the elementwise max, record the branch's epochs as
        committed (exactly-once: a stream already applied on the branch will
        not re-apply on the parent), and fold the branch's metric DELTAS in.
        One atomic version bump, operation ``MERGE_BRANCH``; conflicts between
        the branches' rows are resolved by the engine's ordinary LWW
        merge-at-read, exactly as if both change streams had been applied to
        one lake."""
        for attempt in range(_COMMIT_RETRIES):
            state = json.loads(json.dumps(self._state))
            for pid, upd in partition_updates.items():
                cur = state["partitions"].get(
                    str(pid), {"runs": [], "max_offset": -1, "rows": 0}
                )
                cur["runs"] = cur["runs"] + list(upd["runs"])
                cur["max_offset"] = max(cur["max_offset"], upd.get("max_offset", -1))
                cur["rows"] = cur["rows"] + sum(
                    int(r["rows"]) - int(r.get("tombstones", 0))
                    for r in upd["runs"]
                )
                state["partitions"][str(pid)] = cur
            m = state["metrics"]
            for k, v in metrics_delta.items():
                m[k] = m.get(k, 0) + v
            for ep in new_epochs:
                state["epochs"].append(
                    {"epoch": int(ep), "version": state["version"] + 1,
                     "metrics": {}}
                )
                state["last_epoch"] = max(state["last_epoch"], int(ep))
            state["schema"] = _schema_to_json(schema)
            state["operation"] = {
                "op": "MERGE_BRANCH", "source": source,
                "epochs": [int(e) for e in new_epochs],
            }
            state["version"] += 1
            try:
                self._persist(state)
                return state["version"]
            except CommitConflictError:
                if attempt == _COMMIT_RETRIES - 1:
                    raise
                time.sleep(0.001 * attempt)  # drain a contended writer burst
                self.reload()

    def commit_schema_change(self, column_mapping: dict) -> int:
        """Metadata-only commit of a column-mapping change (RENAME / DROP
        COLUMN): a new manifest version with the same data files — no bytes
        rewritten, exactly Delta's column-mapping ALTER. No epoch record (like
        compaction); returns the new version."""
        for attempt in range(_COMMIT_RETRIES):
            state = json.loads(json.dumps(self._state))
            state["column_mapping"] = json.loads(json.dumps(column_mapping))
            state["operation"] = {"op": "SCHEMA_CHANGE"}
            state["version"] += 1
            try:
                self._persist(state)
                return state["version"]
            except CommitConflictError:
                if attempt == _COMMIT_RETRIES - 1:
                    raise
                time.sleep(0.001 * attempt)  # drain a contended writer burst
                self.reload()

    def commit_restore(self, target_version: int) -> int:
        """Delta-style RESTORE: publish a NEW manifest version whose live state
        (run lists, checkpoints, schema, epoch records, metrics) is the
        ``target_version`` snapshot's — rollback as a forward commit.

        Run files are shared by reference, never copied, and history is
        preserved: the pre-restore version stays time-travelable until
        ``vacuum`` (which keys off the CURRENT manifest, so it reclaims the
        rolled-back epochs' files — the standard retention rule). Rolling the
        epoch records and per-partition ``max_offset`` back WITH the data is
        what makes the lake resumable from the restore point: re-applying an
        undone epoch is not skipped by exactly-once, and its events clear the
        restored offset checkpoints again. Returns the new version."""
        target = self.at_version(target_version)._state
        for attempt in range(_COMMIT_RETRIES):
            state = json.loads(json.dumps(self._state))
            prev = state["version"]
            for k in ("partitions", "schema", "num_partitions", "last_epoch",
                      "metrics", "epochs"):
                state[k] = json.loads(json.dumps(target[k]))
            state["hot_keys"] = list(target.get("hot_keys", []))
            state["deadletter"] = list(target.get("deadletter", []))
            # column mapping rolls back WITH the data (a post-target RENAME /
            # DROP is undone; absent at target → restored to identity)
            state.pop("column_mapping", None)
            if target.get("column_mapping") is not None:
                state["column_mapping"] = json.loads(
                    json.dumps(target["column_mapping"])
                )
            # constraints roll back WITH the data (a post-target ADD / DROP
            # CONSTRAINT is undone, same rule as column mapping)
            state.pop("constraints", None)
            if target.get("constraints"):
                state["constraints"] = json.loads(json.dumps(target["constraints"]))
            # window counts roll back WITH the data (undone epochs' events
            # re-count when re-applied)
            state.pop("windows", None)
            if target.get("windows"):
                state["windows"] = json.loads(json.dumps(target["windows"]))
            # generated-column specs roll back WITH the data too
            state.pop("computed_columns", None)
            if target.get("computed_columns"):
                state["computed_columns"] = json.loads(
                    json.dumps(target["computed_columns"])
                )
            state["restores"] = state.get("restores", []) + [
                {"from_version": prev, "to_version": target_version,
                 "version": prev + 1}
            ]
            state["operation"] = {"op": "RESTORE", "to_version": target_version}
            state["version"] = prev + 1
            try:
                self._persist(state)
                return state["version"]
            except CommitConflictError:
                if attempt == _COMMIT_RETRIES - 1:
                    raise
                time.sleep(0.001 * attempt)  # drain a contended writer burst
                self.reload()

    def commit_deadletter_clear(self, paths: list[str]) -> None:
        """Drain repaired dead-letter records from the manifest (a new
        version; the drained files become vacuumable). Used by
        ``CdcLake.retry_deadletter`` after the fixed rows commit."""
        drop = set(paths)
        for attempt in range(_COMMIT_RETRIES):
            state = json.loads(json.dumps(self._state))
            state["deadletter"] = [
                r for r in state.get("deadletter", []) if r["path"] not in drop
            ]
            state["operation"] = {"op": "DLQ_CLEAR", "n": len(drop)}
            state["version"] += 1
            try:
                self._persist(state)
                return
            except CommitConflictError:
                if attempt == _COMMIT_RETRIES - 1:
                    raise
                time.sleep(0.001 * attempt)  # drain a contended writer burst
                self.reload()

    def _read_current(self) -> int:
        return self.log_store.read_current()

    def _persist(self, state: dict) -> None:
        """Publish ``state`` as the next manifest version — the CAS commit
        point, delegated to ``self.log_store``. The store must advance the
        pointer version-1 → version atomically; a False return means
        another writer got there first and ``CommitConflictError`` tells
        the caller to rebase (every commit call-site loops with reload).
        A stale MANIFEST-<v> body from a writer that lost the race is
        unreachable, so overwriting it is safe."""
        version = int(state["version"])
        if not self.log_store.try_commit(version, json.dumps(state, indent=1)):
            raise CommitConflictError(
                f"manifest advanced past v{version - 1} while this commit "
                "was being prepared"
            )
        self._state = state
