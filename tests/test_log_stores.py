"""Commit-arbitration log stores: the fenced POSIX lock, the file-backed
conditional-put arbiter (FileCasLogStore), and the per-store reader retry
policy (r4 VERDICT Next #3/#5, ADVICE manifest._load item).

No Ray involvement — pure manifest/LogStore protocol tests.
"""

import json
import os
import threading
import time

import pyarrow as pa
import pytest

from dbt_customer360_ray.state.manifest import (
    CasCell,
    CommitConflictError,
    FileCasLogStore,
    Manifest,
    MemoryCasLogStore,
    PosixLogStore,
)

SCHEMA = pa.schema([("conv_id", pa.string())])


def _commit(m: Manifest, epoch: int, path: str, rows: int = 1) -> None:
    m.commit_epoch(
        epoch,
        {0: {"runs": [{"path": path, "rows": rows, "tombstones": 0}],
             "max_offset": epoch, "rows": m.partition(0)["rows"] + rows}},
        SCHEMA, 2, {"events_in": rows},
    )


# -- fenced POSIX lock -------------------------------------------------------

def test_paused_holder_lock_break_exactly_one_commit_wins(tmp_path):
    """The r4 double-commit window: holder A pauses between body staging and
    publish; writer B breaks the stale lock and commits the same version.
    With the holder-token fence, A's woken commit observes the broken lock,
    raises CommitConflictError WITHOUT touching the canonical body or the
    pointer, and A's outer loop rebases — both epochs land, exactly one
    committed body per version."""
    lake = str(tmp_path / "lake")
    a = Manifest(lake)
    b = Manifest(lake)
    fired = []

    def pause_and_lose_lock():
        if fired:
            return
        fired.append(1)
        # simulate "A froze >LOCK_STALE_S": B sees the lock as stale,
        # breaks it, and commits its own epoch 1 at the same base version
        b.log_store.LOCK_STALE_S = -1.0
        _commit(b, 1, "b.parquet")

    a.log_store._pre_publish_pause = pause_and_lose_lock
    _commit(a, 0, "a.parquet")  # internally: conflict → rebase → retry

    fresh = Manifest(lake)
    assert sorted(r["path"] for r in fresh.partition(0)["runs"]) == [
        "a.parquet", "b.parquet"
    ]
    assert sorted(e["epoch"] for e in fresh._state["epochs"]) == [0, 1]
    assert fresh.metrics["events_in"] == 2
    # one body per version, and the v1 body is B's (the legitimate winner)
    v1 = json.load(open(os.path.join(fresh.dir, "MANIFEST-00000001.json")))
    assert [r["path"] for r in v1["partitions"]["0"]["runs"]] == ["b.parquet"]


def test_fence_aborts_before_canonical_body_write(tmp_path):
    """A paused holder whose lock was broken must not clobber the new
    winner's already-published canonical body: the ownership re-check fires
    BEFORE os.replace onto MANIFEST-<v>."""
    lake = str(tmp_path / "lake")
    a = Manifest(lake)
    store = a.log_store
    state = dict(a._state, version=1)
    payload_a = json.dumps(state)

    def break_lock_and_let_b_win():
        # B breaks the stale lock and fully commits v1 with ITS body
        bstore = PosixLogStore(store.dir)
        bstore.LOCK_STALE_S = -1.0
        with bstore._commit_lock():
            pass  # the break alone re-keys the lock; release it
        assert bstore.try_commit(1, json.dumps(dict(state, winner="b")))

    store._pre_publish_pause = break_lock_and_let_b_win
    with pytest.raises(CommitConflictError):
        store.try_commit(1, payload_a)
    body = json.load(open(os.path.join(store.dir, "MANIFEST-00000001.json")))
    assert body.get("winner") == "b"  # A never overwrote it
    assert store.read_current() == 1


def test_lock_release_skips_foreign_lock(tmp_path):
    """A holder whose lock was broken and re-acquired must not unlink the
    NEW holder's lock on exit."""
    mdir = str(tmp_path / "m")
    os.makedirs(mdir)
    store = PosixLogStore(mdir)
    with store._commit_lock():
        # break + re-acquire from a second store while the first holds it
        other = PosixLogStore(mdir)
        other.LOCK_STALE_S = -1.0
        ctx = other._commit_lock()
        ctx.__enter__()
    # first holder exited; the second's lock must still be present
    assert os.path.exists(os.path.join(mdir, "COMMIT.lock"))
    ctx.__exit__(None, None, None)
    assert not os.path.exists(os.path.join(mdir, "COMMIT.lock"))


# -- file-backed conditional-put arbiter ------------------------------------

def test_file_cas_threads_all_survive(tmp_path):
    """The 8x4 no-coordination hammer arbitrated by create-if-absent marker
    files — every run file and metric increment lands exactly once."""
    lake = str(tmp_path / "lake")
    mdir = os.path.join(lake, "_manifest")
    arb = str(tmp_path / "arbiter")
    errs = []

    def worker(w: int):
        try:
            m = Manifest(lake, log_store=FileCasLogStore(mdir, arb))
            for i in range(4):
                m.reload()
                m.commit_epoch(
                    w * 4 + i,
                    {w % 4: {"runs": [
                        {"path": f"w{w}-{i}.parquet", "rows": 1, "tombstones": 0}],
                        "max_offset": w * 4 + i,
                        "rows": m.partition(w % 4)["rows"] + 1}},
                    SCHEMA, 4, {"events_in": 1},
                )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(w,)) for w in range(8)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    assert not errs
    fresh = Manifest(lake, log_store=FileCasLogStore(mdir, arb))
    paths = [r["path"] for p in range(4) for r in fresh.partition(p)["runs"]]
    assert sorted(paths) == sorted(
        f"w{w}-{i}.parquet" for w in range(8) for i in range(4)
    )
    assert fresh.metrics["events_in"] == 32
    assert fresh.version == 32 and fresh.log_store.read_current() == 32


def test_file_cas_duplicate_attempt_single_winner(tmp_path):
    """Two writers racing the same version number: exactly one exclusive
    create succeeds; the loser's staged body is cleaned up and the canonical
    body is the winner's."""
    mdir = str(tmp_path / "m")
    arb = str(tmp_path / "arb")
    os.makedirs(mdir)
    s1 = FileCasLogStore(mdir, arb)
    s2 = FileCasLogStore(mdir, arb)
    # force s2 past the cheap pre-check so the marker itself arbitrates
    s2.read_current = lambda: 0
    assert s1.try_commit(1, '{"who": "s1"}')
    assert not s2.try_commit(1, '{"who": "s2"}')
    body = json.load(open(os.path.join(mdir, "MANIFEST-00000001.json")))
    assert body["who"] == "s1"
    staged = [n for n in os.listdir(mdir) if n.endswith(".staged")]
    assert staged == []  # loser cleaned up; winner's was consumed by rename


def test_file_cas_crashed_winner_recovered_by_reader(tmp_path):
    """Winner dies between the conditional put and the canonical publish:
    the marker records the durably-staged body path, so the NEXT reader
    completes the copy (Delta's S3 recovery step) instead of hanging or
    failing."""
    lake = str(tmp_path / "lake")
    mdir = os.path.join(lake, "_manifest")
    arb = str(tmp_path / "arb")
    m = Manifest(lake, log_store=FileCasLogStore(mdir, arb))
    _commit(m, 0, "a.parquet")

    # hand-craft the crashed v2: staged body + marker, NO canonical file
    state = json.loads(json.dumps(m._state))
    state["version"] = 2
    state["crashed_winner"] = True
    staged = os.path.join(mdir, ".MANIFEST-00000002-deadbeef.staged")
    with open(staged, "w") as f:
        f.write(json.dumps(state))
    with open(os.path.join(arb, "v00000002"), "w") as f:
        f.write(staged)

    t0 = time.monotonic()
    fresh = Manifest(lake, log_store=FileCasLogStore(mdir, arb))
    assert time.monotonic() - t0 < 0.5  # recovery, not a 1 s busy-wait
    assert fresh.version == 2 and fresh._state["crashed_winner"] is True
    assert os.path.exists(os.path.join(mdir, "MANIFEST-00000002.json"))


def test_file_cas_transient_rejection_exactly_once(tmp_path):
    """An arbiter whose conditional put transiently refuses (create raced,
    no side effect): the commit loop rebases and retries; the manifest
    advances exactly one version per logical commit."""
    lake = str(tmp_path / "lake")
    mdir = os.path.join(lake, "_manifest")
    arb = str(tmp_path / "arb")

    class FlakyStore(FileCasLogStore):
        rejections = 0

        def try_commit(self, version, state_json):
            if FlakyStore.rejections < 3:
                FlakyStore.rejections += 1
                return False  # refused, no side effect
            return super().try_commit(version, state_json)

    m = Manifest(lake, log_store=FlakyStore(mdir, arb))
    _commit(m, 0, "a.parquet")
    assert FlakyStore.rejections == 3
    fresh = Manifest(lake, log_store=FileCasLogStore(mdir, arb))
    assert fresh.version == 1
    assert [r["path"] for r in fresh.partition(0)["runs"]] == ["a.parquet"]


def _proc_worker(args):
    """Module-level worker for the cross-process hammer (picklable)."""
    lake, mdir, arb, w = args
    from dbt_customer360_ray.state.manifest import FileCasLogStore, Manifest

    m = Manifest(lake, log_store=FileCasLogStore(mdir, arb))
    for i in range(4):
        m.reload()
        m.commit_epoch(
            w * 4 + i,
            {w % 4: {"runs": [
                {"path": f"w{w}-{i}.parquet", "rows": 1, "tombstones": 0}],
                "max_offset": w * 4 + i,
                "rows": m.partition(w % 4)["rows"] + 1}},
            SCHEMA, 4, {"events_in": 1},
        )
    return w


def test_file_cas_processes_all_survive(tmp_path):
    """The same hammer across PROCESSES: exclusive create is the arbiter's
    atomicity claim, and O_EXCL is a kernel-level guarantee — verify it
    outside the GIL with 4 concurrent committer processes."""
    import multiprocessing as mp

    lake = str(tmp_path / "lake")
    mdir = os.path.join(lake, "_manifest")
    arb = str(tmp_path / "arbiter")
    os.makedirs(mdir, exist_ok=True)
    ctx = mp.get_context("spawn")
    with ctx.Pool(4) as pool:
        done = pool.map(_proc_worker, [(lake, mdir, arb, w) for w in range(4)])
    assert sorted(done) == [0, 1, 2, 3]
    fresh = Manifest(lake, log_store=FileCasLogStore(mdir, arb))
    paths = [r["path"] for p in range(4) for r in fresh.partition(p)["runs"]]
    assert sorted(paths) == sorted(
        f"w{w}-{i}.parquet" for w in range(4) for i in range(4)
    )
    assert fresh.metrics["events_in"] == 16 and fresh.version == 16


def test_lake_end_to_end_on_file_cas_store(tmp_path, ray_session):
    """The WHOLE engine on the conditional-put arbiter: replay the fixture
    into a CdcLake whose manifest commits through FileCasLogStore, converge
    to the oracle, resume-skip a redelivered epoch, and time-travel —
    the Delta-on-S3 deployment shape end-to-end."""
    import pyarrow.parquet as pq
    import ray.data

    from dbt_customer360_ray.gen import gen_changes, oracle_lake, split_epochs
    from dbt_customer360_ray.state.engine import CdcLake

    lake_dir = str(tmp_path / "lake")
    arb = str(tmp_path / "arbiter")
    store = FileCasLogStore(os.path.join(lake_dir, "_manifest"), arb)
    lake = CdcLake(lake_dir, num_partitions=8, log_store=store)
    changes = gen_changes(4_000, 200, seed=91)
    epochs = split_epochs(changes, 3)
    for part in epochs:
        lake.apply(ray.data.from_arrow(part))
    assert store.read_current() == lake.manifest.version > 0

    import pandas as pd

    got = (
        lake.read().to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    want = oracle_lake(*epochs)
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False
    )
    # exactly-once: a redelivered epoch is skipped by the committed log
    m = lake.apply(ray.data.from_arrow(epochs[1]), epoch=1)
    assert m.get("skipped") is True
    # time travel reads a historical snapshot through the same store
    old = lake.read_as_of(epoch=0).to_pandas()
    want0 = oracle_lake(epochs[0])
    assert len(old) == len(want0)


# -- per-store reader retry policy ------------------------------------------

def test_posix_missing_body_fails_fast(tmp_path):
    """Under PosixLogStore the body is written BEFORE the pointer, so a
    missing body is corruption — the reader must raise immediately, not
    busy-wait ~1 s (r4 ADVICE)."""
    lake = str(tmp_path / "lake")
    mdir = os.path.join(lake, "_manifest")
    os.makedirs(mdir)
    with open(os.path.join(mdir, "CURRENT"), "w") as f:
        f.write("3")
    t0 = time.monotonic()
    with pytest.raises(FileNotFoundError):
        Manifest(lake)
    assert time.monotonic() - t0 < 0.3


def test_memory_cas_missing_body_still_retries(tmp_path):
    """MemoryCas publishes after the pointer swap, so a reader in the window
    retries until the body lands (publish from another thread here)."""
    lake = str(tmp_path / "lake")
    mdir = os.path.join(lake, "_manifest")
    os.makedirs(mdir, exist_ok=True)
    cell = CasCell(1)  # pointer already advanced, body not yet published
    state = {"version": 1, "last_epoch": -1, "schema": None,
             "num_partitions": 2, "partitions": {}, "metrics": {},
             "epochs": []}

    def publish_late():
        time.sleep(0.05)
        with open(os.path.join(mdir, "MANIFEST-00000001.json"), "w") as f:
            f.write(json.dumps(state))

    t = threading.Thread(target=publish_late)
    t.start()
    m = Manifest(lake, log_store=MemoryCasLogStore(mdir, cell))
    t.join()
    assert m.version == 1
