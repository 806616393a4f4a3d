"""End-to-end engine tests: replay vs. oracle, idempotence, resume, evolution,
salting equivalence (SURVEY.md §5 strategy items 2-4)."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dbt_customer360_ray.gen import gen_changes, oracle_lake, split_epochs
from dbt_customer360_ray.state.engine import CdcLake

pytestmark = pytest.mark.usefixtures("ray_session")


def _replay(tmp_path, epochs, lake_kwargs=None, **apply_kwargs):
    import ray.data

    lake = CdcLake(str(tmp_path / "lake"), **(lake_kwargs or {"num_partitions": 8}))
    for part in epochs:
        lake.apply(ray.data.from_arrow(part), **apply_kwargs)
    return lake


def _assert_matches_oracle(lake, *changes):
    got = lake.read_local_table().to_pandas()
    want = oracle_lake(*changes)
    got = got[want.columns.tolist()].sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_single_epoch_matches_oracle(tmp_path):
    changes = gen_changes(5_000, 300, seed=7)
    lake = _replay(tmp_path, [changes])
    _assert_matches_oracle(lake, changes)


def test_multi_epoch_with_schema_evolution(tmp_path):
    changes = gen_changes(8_000, 500, seed=11)
    epochs = split_epochs(changes, 4)  # epoch 0 lacks `tool` (schema v0)
    assert "tool" not in epochs[0].column_names
    lake = _replay(tmp_path, epochs)
    # evolved schema includes tool; v0-era winners read back as null tool
    assert "tool" in lake.read_local_table().column_names
    _assert_matches_oracle(lake, *epochs)


def test_replay_same_epoch_is_idempotent(tmp_path):
    import ray.data

    changes = gen_changes(3_000, 200, seed=13)
    # detect_hot="off" pins routing: offset-checkpoint dedup is then exact.
    # (With an evolving hot-key set a re-routed duplicate can slip the offset
    # check; LWW idempotence still converges the state — covered below.)
    lake = _replay(tmp_path, [changes], detect_hot="off")
    before = lake.read_local_table()
    m = lake.apply(ray.data.from_arrow(changes), detect_hot="off")
    assert m["events_deduped"] == changes.num_rows
    after = lake.read_local_table()
    assert before.equals(after)
    _assert_matches_oracle(lake, changes)

    # replay again with salted routing: dedup may be partial, state identical
    lake.apply(ray.data.from_arrow(changes), detect_hot="prepass")
    assert lake.read_local_table().equals(before)


def test_crash_and_resume_mid_epoch(tmp_path):
    """Epoch files written but manifest not committed → rerun converges identically."""
    import ray.data

    changes = gen_changes(4_000, 250, seed=17)
    e0, e1 = split_epochs(changes, 2)
    lake = _replay(tmp_path, [e0])

    # simulate crash: run epoch 1's appliers but revert the manifest commit
    manifest_dir = tmp_path / "lake" / "_manifest"
    current = (manifest_dir / "CURRENT").read_text()
    lake.apply(ray.data.from_arrow(e1))
    (manifest_dir / "CURRENT").write_text(current)  # roll back commit point

    resumed = CdcLake(str(tmp_path / "lake"))
    assert resumed.manifest.last_epoch == 0  # epoch 1 invisible
    resumed.apply(ray.data.from_arrow(e1))  # replay over orphaned files
    _assert_matches_oracle(resumed, e0, e1)


def test_checkpoints_and_metrics(tmp_path):
    import pyarrow.compute as pc

    changes = gen_changes(3_000, 200, seed=19)
    lake = _replay(tmp_path, [changes])
    cps = lake.checkpoints()
    assert max(cps.values()) == pc.max(changes.column("offset")).as_py()
    m = lake.metrics()
    assert m["events_in"] == changes.num_rows
    assert m["upserts"] + m["deletes"] + m["events_deduped"] == changes.num_rows
    assert m["late_events"] > 0
    assert len(lake.lineage()) == 1


def test_salting_equivalent_to_unsalted(tmp_path):
    """Hot-key salted replay must produce identical state to unsalted replay."""
    import ray.data

    changes = gen_changes(6_000, 50, seed=23, zipf_a=1.05)  # few convs → hot keys
    lake_a = CdcLake(str(tmp_path / "a" / "lake"), num_partitions=8)
    lake_a.apply(ray.data.from_arrow(changes), detect_hot="off")
    lake_b = CdcLake(str(tmp_path / "b" / "lake"), num_partitions=8, num_salts=4)
    lake_b.apply(ray.data.from_arrow(changes), detect_hot="prepass")
    a = lake_a.read_local_table().to_pandas()
    b = lake_b.read_local_table().to_pandas()
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_compaction_preserves_state_and_vacuum(tmp_path):
    changes = gen_changes(6_000, 300, seed=29)
    epochs = split_epochs(changes, 6)  # > max_runs → compaction kicks in
    lake = _replay(
        tmp_path, epochs, lake_kwargs={"num_partitions": 4, "max_runs": 3}
    )
    # compaction happened: some partition has a base run
    runs = [r["path"] for p in range(4) for r in lake.manifest.partition(p)["runs"]]
    assert any("base-" in r for r in runs)
    _assert_matches_oracle(lake, *epochs)
    removed = lake.vacuum()
    assert removed > 0
    _assert_matches_oracle(lake, *epochs)  # vacuum never touches live files


def test_ray_read_path_matches_local(tmp_path):
    changes = gen_changes(4_000, 300, seed=31)
    epochs = split_epochs(changes, 3)
    lake = _replay(tmp_path, epochs)
    via_ray = (
        lake.read()
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    local = lake.read_local_table().to_pandas()
    pd.testing.assert_frame_equal(via_ray[local.columns.tolist()], local, check_dtype=False)


def test_enrich_applies_on_both_exchange_modes(tmp_path):
    """enrich columns must carry computed values (not null backfill) on the
    groupby path too — exchange=True and exchange=False lakes must converge to
    identical enriched state."""
    from dbt_customer360_ray.stages.text import ENRICH_SCHEMA, TranscriptEnricher

    changes = gen_changes(3_000, 200, seed=43)
    epochs = split_epochs(changes, 2)
    lakes = {}
    for mode in (True, False):
        lakes[mode] = _replay(
            tmp_path / f"ex{mode}",
            epochs,
            lake_kwargs={"num_partitions": 8, "exchange": mode},
            enrich=TranscriptEnricher(),
            enrich_schema=ENRICH_SCHEMA,
        )
    frames = {}
    for mode, lake in lakes.items():
        df = lake.read_local_table().to_pandas()
        assert {"n_tokens", "lang_pred", "quality_score"} <= set(df.columns)
        assert df["n_tokens"].notna().all()
        frames[mode] = (
            df.sort_values(["conv_id", "turn_idx"], kind="stable")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(
        frames[True][frames[False].columns.tolist()], frames[False], check_dtype=False
    )


def test_enriched_file_apply_matches_dataset_apply(tmp_path):
    """The two-stage file path (decode-once → per-slice enrich+route) must
    produce the same enriched lake as applying the same events as a Dataset."""
    import pyarrow.parquet as pq

    from dbt_customer360_ray.gen import write_fixture
    from dbt_customer360_ray.stages.text import ENRICH_SCHEMA, TranscriptEnricher

    fx = write_fixture(str(tmp_path / "changes"), sf=0.001, num_epochs=2)
    frames = {}
    for mode in ("files", "dataset"):
        import ray.data

        lake = CdcLake(str(tmp_path / f"lake-{mode}"), num_partitions=8)
        for p in fx["paths"]:
            src = p if mode == "files" else ray.data.from_arrow(pq.read_table(p))
            lake.apply(src, enrich=TranscriptEnricher(), enrich_schema=ENRICH_SCHEMA)
        frames[mode] = (
            lake.read_local_table()
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"], kind="stable")
            .reset_index(drop=True)
        )
    assert frames["files"]["n_tokens"].notna().all()
    pd.testing.assert_frame_equal(
        frames["files"][frames["dataset"].columns.tolist()], frames["dataset"],
        check_dtype=False,
    )


def test_replay_oracle_sql_matches_engine(tmp_path, monkeypatch):
    """The driver-gate SQL oracle (exactly-once on offset + LWW window
    functions over the fixture parquet) re-derives exactly the engine's
    converged lake state, including the v0 epoch's evolved ``tool`` column."""
    import duckdb

    from dbt_customer360_ray.pipelines import cdc_replay

    monkeypatch.setattr(cdc_replay, "FIXTURE_ROOT", str(tmp_path / "fx"))
    lake, _metrics = cdc_replay.replay(sf=0.001, lake_dir=str(tmp_path / "lk"))
    got = (
        lake.read_local_table()
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(cdc_replay.replay_oracle_sql(sf=0.001))
        .df()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want, check_dtype=False)


def test_concurrent_commits_rebase_not_clobber(tmp_path):
    """Two writers sharing one lake: the loser of the CAS rebases and retries,
    so BOTH epochs' runs, offsets, and metrics survive (no lost update)."""
    from dbt_customer360_ray.state.manifest import Manifest

    schema = pa.schema([("conv_id", pa.string())])
    a = Manifest(str(tmp_path / "lake"))
    b = Manifest(str(tmp_path / "lake"))  # loaded at the same base version

    a.commit_epoch(
        0,
        {0: {"runs": [{"path": "data/p0/run-0-a.parquet", "rows": 10, "tombstones": 1}],
             "max_offset": 9, "rows": 9}},
        schema, 4, {"events_in": 10},
    )
    # b is stale (still at version 0) — its commit must rebase onto a's
    b.commit_epoch(
        1,
        {0: {"runs": [{"path": "data/p0/run-1-b.parquet", "rows": 5, "tombstones": 0}],
             "max_offset": 14, "rows": 5}},  # rows vs b's stale base 0 → delta 5
        schema, 4, {"events_in": 5},
    )
    fresh = Manifest(str(tmp_path / "lake"))
    part = fresh.partition(0)
    assert [r["path"] for r in part["runs"]] == [
        "data/p0/run-0-a.parquet", "data/p0/run-1-b.parquet"
    ]
    assert part["rows"] == 9 + 5 and part["max_offset"] == 14
    assert fresh.metrics["events_in"] == 15
    assert [e["epoch"] for e in fresh._state["epochs"]] == [0, 1]


def test_compaction_rebase_keeps_concurrent_appends(tmp_path):
    """A compaction that raced with an ingest epoch keeps the runs appended
    after it read its inputs — the swap replaces only ``replaced_paths``."""
    from dbt_customer360_ray.state.manifest import Manifest

    schema = pa.schema([("conv_id", pa.string())])
    compactor = Manifest(str(tmp_path / "lake"))
    compactor.commit_epoch(
        0,
        {0: {"runs": [{"path": "r0.parquet", "rows": 10, "tombstones": 2},
                      {"path": "r1.parquet", "rows": 4, "tombstones": 0}],
             "max_offset": 13, "rows": 12}},
        schema, 2, {"events_in": 14},
    )
    inputs = [r["path"] for r in compactor.partition(0)["runs"]]

    writer = Manifest(str(tmp_path / "lake"))  # concurrent ingest commits now
    writer.commit_epoch(
        1,
        {0: {"runs": [{"path": "r2.parquet", "rows": 3, "tombstones": 0}],
             "max_offset": 16, "rows": 15}},
        schema, 2, {"events_in": 3},
    )
    compactor.commit_compaction(
        {0: {"runs": [{"path": "base.parquet", "rows": 12, "tombstones": 0}],
             "rows": 12, "max_offset": 13, "replaced_paths": inputs}}
    )
    fresh = Manifest(str(tmp_path / "lake"))
    part = fresh.partition(0)
    assert [r["path"] for r in part["runs"]] == ["base.parquet", "r2.parquet"]
    assert part["rows"] == 12 + 3 and part["max_offset"] == 16


def test_concurrent_commit_threads_all_survive(tmp_path):
    """8 threads × 4 commits against one lake dir, no coordination: every
    run file and every metric increment lands exactly once."""
    import threading

    from dbt_customer360_ray.state.manifest import Manifest

    schema = pa.schema([("conv_id", pa.string())])
    errs = []

    def worker(w: int):
        try:
            m = Manifest(str(tmp_path / "lake"))
            for i in range(4):
                m.commit_epoch(
                    w * 4 + i,
                    {w % 4: {"runs": [
                        {"path": f"w{w}-{i}.parquet", "rows": 1, "tombstones": 0}],
                        "max_offset": w * 4 + i, "rows": m.partition(w % 4)["rows"] + 1}},
                    schema, 4, {"events_in": 1},
                )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(w,)) for w in range(8)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    assert not errs
    fresh = Manifest(str(tmp_path / "lake"))
    paths = [r["path"] for p in range(4) for r in fresh.partition(p)["runs"]]
    assert sorted(paths) == sorted(f"w{w}-{i}.parquet" for w in range(8) for i in range(4))
    assert fresh.metrics["events_in"] == 32
    assert sum(fresh.partition(p)["rows"] for p in range(4)) == 32


def test_lookup_bloom_skips_files(tmp_path, monkeypatch):
    """Every run gets a conv_id bloom sidecar; lookup returns identical
    results while opening only the (few) runs whose bloom may contain the
    key; vacuum removes sidecars of dead runs."""
    import ray.data

    from dbt_customer360_ray.state import applier as A

    changes = gen_changes(6_000, 400, seed=29)
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=8, max_runs=1 << 30)
    for part in split_epochs(changes, 6):
        lake.apply(ray.data.from_arrow(part))

    files = lake.manifest.live_files()
    assert files and all(os.path.exists(f + ".bloom") for f in files)

    # rarest conv (Zipf tail): present in few epochs, so blooms have bite —
    # the head key would genuinely be in every run
    vc = changes.column("conv_id").to_pandas().value_counts()
    key = vc.index[-1]
    want = lake.lookup(key)

    opened = []
    real = A.bloom_may_contain

    def spy(path, k):
        r = real(path, k)
        if r:
            opened.append(path)
        return r

    monkeypatch.setattr(A, "bloom_may_contain", spy)
    got = lake.lookup(key)
    assert got.equals(want) and want.num_rows > 0
    pid_files = lake.manifest.live_files(
        int(__import__("dbt_customer360_ray.hashing", fromlist=["partition_ids"])
            .partition_ids([key], lake.P)[0])
    )
    # the key appears in a subset of epochs; blooms must have pruned the rest
    assert len(opened) < len(pid_files)

    # negative lookup: a key that exists nowhere opens ~no files
    opened.clear()
    assert lake.lookup("conv-does-not-exist").num_rows == 0
    assert len(opened) <= 1  # allow a rare false positive

    # compaction rewrites runs (bloom'd) and vacuum drops dead sidecars
    lake.compact(force=True)
    n_removed = lake.vacuum()
    assert n_removed > 0
    for f in lake.manifest.live_files():
        assert os.path.exists(f + ".bloom")
    for f in files:
        if f not in set(lake.manifest.live_files()):
            assert not os.path.exists(f + ".bloom")
    assert lake.lookup(key).equals(want)


def test_tiered_compaction_state_equal_and_base_untouched(tmp_path):
    """Size-tiered compaction (merge all runs but the largest) yields the
    exact same converged state as full compaction, while leaving the base
    run file untouched — write amplification O(delta), not O(partition)."""
    import ray.data

    def data_bytes(lake):
        total = 0
        for root, _d, names in os.walk(os.path.join(lake.lake_dir, "data")):
            total += sum(
                os.path.getsize(os.path.join(root, n))
                for n in names
                if n.endswith(".parquet")
            )
        return total  # live + not-yet-vacuumed = everything ever written

    changes = gen_changes(8_000, 300, seed=31)
    epochs = split_epochs(changes, 8)

    full = CdcLake(str(tmp_path / "full"), num_partitions=8, max_runs=2)
    tier = CdcLake(
        str(tmp_path / "tier"), num_partitions=8, max_runs=2,
        compaction_policy="tiered",
    )
    for e in epochs:
        full.apply(ray.data.from_arrow(e))
        tier.apply(ray.data.from_arrow(e))

    a = full.read_local_table()
    assert a.equals(tier.read_local_table())
    _assert_matches_oracle(tier, *epochs)
    runs_now = [r for p in range(tier.P) for r in tier.manifest.partition(p)["runs"]]
    assert any("tier-v" in r["path"] for r in runs_now)  # tiered merges happened
    # same ingest, fewer bytes ever written: tiered skips the base rewrite
    assert data_bytes(tier) < data_bytes(full)

    # single-step guarantee: a tiered compaction never rewrites a run that
    # dominates all smaller ones — settle a base, add two deltas, compact
    solo = CdcLake(
        str(tmp_path / "solo"), num_partitions=4, max_runs=1 << 30,
        compaction_policy="tiered",
    )
    for e in epochs[:4]:
        solo.apply(ray.data.from_arrow(e))
    assert solo.compact(force=True, policy="full") > 0  # settle the base
    for e in epochs[4:6]:
        solo.apply(ray.data.from_arrow(e))
    largest = {
        p: max(solo.manifest.partition(p)["runs"], key=lambda r: r["rows"])["path"]
        for p in range(solo.P)
        if len(solo.manifest.partition(p)["runs"]) >= 3
    }
    assert largest and solo.compact(force=True) > 0
    for p, base_path in largest.items():
        # the dominant base is never rewritten; deltas may or may not have
        # merged depending on whether one of them dominates the other
        paths = [r["path"] for r in solo.manifest.partition(p)["runs"]]
        assert base_path in paths
    all_paths = [
        r["path"] for p in range(solo.P) for r in solo.manifest.partition(p)["runs"]
    ]
    assert any("tier-v" in q for q in all_paths)
    _assert_matches_oracle(solo, *epochs[:6])

    # time travel across tiered compactions still resolves old snapshots
    v = tier.manifest.version_for_epoch(2)
    snap = tier.manifest.at_version(v)
    assert snap.last_epoch == 2


def test_multitable_routing_isolated_and_resumable(tmp_path):
    """One interleaved two-table stream: each table converges independently
    (own schema, own checkpoints), column sets don't bleed, reopening adopts
    the on-disk tables, and replaying an epoch is a per-table no-op."""
    import ray.data

    from dbt_customer360_ray.gen import gen_multitable_changes
    from dbt_customer360_ray.state.multitable import MultiTableLake

    t = gen_multitable_changes(6_000, 300, seed=9)
    cols_t = ["offset", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"]
    cols_m = ["offset", "op", "conv_id", "turn_idx", "title", "status", "ts"]
    mt = MultiTableLake(
        str(tmp_path / "mt"),
        tables={"transcripts": {"columns": cols_t}},  # conv_meta auto-registers
        num_partitions=4,
    )
    half = t.num_rows // 2
    m1 = mt.apply(ray.data.from_arrow(t.slice(0, half)))
    m2 = mt.apply(ray.data.from_arrow(t.slice(half)))
    assert set(m1) == {"transcripts", "conv_meta"} == set(m2)

    # no column bleed: transcripts lake has no title/status; meta (auto) keeps
    # only its non-discriminator columns
    tr_cols = set(mt.lake("transcripts").read_local_table().column_names)
    assert "title" not in tr_cols and "status" not in tr_cols
    assert "table_name" not in set(mt.lake("conv_meta").read_local_table().column_names)

    # per-table LWW convergence vs the pandas oracle
    df = t.to_pandas()
    for name, keyfilter in (("transcripts", "transcripts"), ("conv_meta", "conv_meta")):
        sub = pa.Table.from_pandas(
            df[df["table_name"] == keyfilter].drop(columns=["table_name"]),
            preserve_index=False,
        )
        want = oracle_lake(sub)
        got = mt.lake(name).read_local_table().to_pandas()
        got = (
            got[want.columns.tolist()]
            .sort_values(["conv_id", "turn_idx"], kind="stable")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # resume: reopening adopts both tables; replay dedups everything
    mt2 = MultiTableLake(str(tmp_path / "mt"), num_partitions=4)
    assert set(mt2.tables) == {"transcripts", "conv_meta"}
    m3 = mt2.apply(ray.data.from_arrow(t.slice(half)))
    for name, m in m3.items():
        assert m["events_deduped"] == m["events_in"], name


def test_multitable_read_consistent(tmp_path, ray_session):
    """Cross-table consistent cut at a binlog position: both tables resolve to
    the same epoch boundary."""
    from dbt_customer360_ray.gen import gen_multitable_changes
    from dbt_customer360_ray.state.multitable import MultiTableLake

    changes = gen_multitable_changes(6_000, 300, seed=45)
    import numpy as np

    n = changes.num_rows
    bounds = np.linspace(0, n, 4).astype(int)
    mt = MultiTableLake(str(tmp_path / "mt"), num_partitions=4)
    parts = [changes.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(3)]
    import ray.data

    for i, part in enumerate(parts):
        mt.apply(ray.data.from_arrow(part), epoch=i)
    cut = int(max(parts[1].column("offset").to_pylist()))
    snap = mt.read_consistent(cut)
    assert set(snap) == set(mt.tables)
    for name, ds in snap.items():
        got = len(ds.to_pandas())
        want = len(mt.lake(name).read_local_table_as_of(epoch=1).to_pandas())
        assert got == want, (name, got, want)


# -- merge_into / expire_rows ------------------------------------------------


def _merge_base(tmp_path):
    changes = gen_changes(4_000, 250, seed=23)
    lake = _replay(tmp_path, [changes])
    state = (
        lake.read_local_table()
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    return lake, state


def test_merge_into_update_subset_and_insert(tmp_path):
    lake, st = _merge_base(tmp_path)
    upd = st[st.turn_idx % 3 == 1][["conv_id", "turn_idx", "text"]].copy()
    upd["text"] = upd["text"] + " [m]"
    ins = pd.DataFrame(
        {"conv_id": st.conv_id.unique(), "turn_idx": 7777, "text": "new"}
    )
    src = pa.Table.from_pandas(pd.concat([upd, ins]), preserve_index=False)
    lake.merge_into(src, "2025-06-01 00:00:00")
    got = (
        lake.read_local_table()
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    exp = st.copy()
    m = exp.turn_idx % 3 == 1
    exp.loc[m, "text"] = exp.loc[m, "text"] + " [m]"
    exp.loc[m, "ts"] = pd.Timestamp("2025-06-01")
    add = pd.DataFrame(
        {
            "conv_id": st.conv_id.unique(),
            "turn_idx": 7777,
            "role": None,
            "text": "new",
            "tool": None,
            "ts": pd.Timestamp("2025-06-01"),
        }
    )
    exp = (
        pd.concat([exp, add])
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False)
    # unprovided columns (role/tool) kept their lake values on update
    assert got.loc[got.turn_idx % 3 == 1, "role"].notna().any()


def test_merge_into_is_idempotent_and_predicate_gates(tmp_path):
    lake, st = _merge_base(tmp_path)
    src = st[st.turn_idx % 3 == 1][["conv_id", "turn_idx", "text"]].copy()
    src["text"] = src["text"] + " [m]"
    src_t = pa.Table.from_pandas(src, preserve_index=False)
    pred = lambda df: df["t_role"] == "user"  # noqa: E731
    m1 = lake.merge_into(
        src_t, "2025-06-01", matched_predicate=pred, when_not_matched="skip"
    )
    n_user = int((st[st.turn_idx % 3 == 1].role == "user").sum())
    assert m1["upserts"] == n_user
    # non-user matched rows untouched
    got = lake.read_local_table().to_pandas()
    untouched = got[(got.turn_idx % 3 == 1) & (got.role != "user")]
    assert not untouched.text.str.endswith(" [m]").any()
    # re-merge: spliced image already equals the lake row -> zero events
    m2 = lake.merge_into(src_t, "2025-06-02", matched_predicate=pred)
    assert m2["events_in"] == 0


def test_merge_into_delete_arm(tmp_path):
    lake, st = _merge_base(tmp_path)
    doomed = st[st.turn_idx % 5 == 2][["conv_id", "turn_idx"]].copy()
    doomed["text"] = "x"  # any payload column; delete ignores the values
    lake.merge_into(
        pa.Table.from_pandas(doomed, preserve_index=False),
        "2025-06-01",
        when_matched="delete",
        when_not_matched="skip",
    )
    got = lake.read_local_table().to_pandas()
    assert not (got.turn_idx % 5 == 2).any()
    assert len(got) == int((st.turn_idx % 5 != 2).sum())


def test_merge_into_validates(tmp_path):
    lake, st = _merge_base(tmp_path)
    good = st.head(4)[["conv_id", "turn_idx", "text"]]
    with pytest.raises(ValueError, match="duplicate"):
        lake.merge_into(
            pa.Table.from_pandas(pd.concat([good, good]), preserve_index=False),
            "2025-06-01",
        )
    with pytest.raises(ValueError, match="not lake payload"):
        lake.merge_into(
            pa.Table.from_pandas(good.rename(columns={"text": "bogus"}), preserve_index=False),
            "2025-06-01",
        )
    with pytest.raises(ValueError, match="does not exceed"):
        lake.merge_into(
            pa.Table.from_pandas(good, preserve_index=False), "2020-01-01"
        )
    with pytest.raises(ValueError, match="nothing to do"):
        lake.merge_into(
            pa.Table.from_pandas(good, preserve_index=False),
            "2025-06-01",
            when_matched="skip",
            when_not_matched="skip",
        )


def test_expire_rows_matches_filter_and_feeds_change_feed(tmp_path):
    lake, st = _merge_base(tmp_path)
    epoch0 = lake.manifest.last_epoch
    cut = st.ts.quantile(0.4)
    m = lake.expire_rows(cut, "2025-06-01")
    got = lake.read_local_table().to_pandas()
    exp = st[st.ts >= cut]
    assert len(got) == len(exp)
    assert m["deletes"] == len(st) - len(exp)
    # the expiry is an ordinary epoch: change-feed-visible as deletes
    feed = lake.change_feed(
        from_epoch=epoch0, to_epoch=lake.manifest.last_epoch
    ).to_pandas()
    assert set(feed["change_type"].unique()) == {"delete"}
    assert len(feed) == len(st) - len(exp)
    # idempotent: nothing left below the cutoff
    m2 = lake.expire_rows(cut, "2025-06-02")
    assert m2["events_in"] == 0


def test_delete_where_matches_predicate_and_feeds_change_feed(tmp_path):
    lake, st = _merge_base(tmp_path)
    epoch0 = lake.manifest.last_epoch
    n_tool = int((st.role == "tool").sum())
    assert n_tool > 0
    m = lake.delete_where(
        {"name": "drop_tool", "column": "role", "op": "==", "value": "tool"},
        "2025-06-01",
    )
    got = lake.read_local_table().to_pandas()
    exp = st[~st.role.eq("tool").fillna(False)]
    assert len(got) == len(exp) and m["deletes"] == n_tool
    assert not got.role.eq("tool").any()
    # the DELETE is an ordinary epoch: change-feed-visible and time-travelable
    feed = lake.change_feed(
        from_epoch=epoch0, to_epoch=lake.manifest.last_epoch
    ).to_pandas()
    assert set(feed["change_type"].unique()) == {"delete"} and len(feed) == n_tool
    assert len(lake.read_local_table_as_of(epoch=epoch0)) == len(st)
    # idempotent; and a NULL comparison deletes nothing (DML WHERE semantics)
    assert lake.delete_where(
        {"name": "again", "column": "role", "op": "==", "value": "tool"},
        "2025-06-02",
    )["events_in"] == 0
    n_null_tool = int(lake.read_local_table().to_pandas()["tool"].isna().sum())
    assert n_null_tool > 0
    assert lake.delete_where(
        {"name": "lt_null", "column": "tool", "op": "<", "value": "zzz"},
        "2025-06-03",
    )["deletes"] == len(exp) - n_null_tool


def test_delete_where_matches_regex_and_column_mapping(tmp_path):
    lake, st = _merge_base(tmp_path)
    lake.rename_column("role", "speaker")
    m = lake.delete_where(
        {"name": "rx", "column": "speaker", "op": "matches", "value": "^(tool|system)$"},
        "2025-06-01",
    )
    want_gone = st.role.isin(["tool", "system"]).sum()
    assert m["deletes"] == want_gone
    got = lake.read().to_pandas()
    assert "speaker" in got.columns
    assert not got.speaker.isin(["tool", "system"]).any()
    assert len(got) == len(st) - want_gone


def test_lookup_many_matches_filtered_read(tmp_path):
    changes = gen_changes(5_000, 300, seed=41)
    lake = _replay(tmp_path, split_epochs(changes, 2))
    st = lake.read_local_table().to_pandas()
    ids = sorted(st.conv_id.unique())[::7]  # a scattered subset
    got = (
        lake.lookup_many(ids)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    want = (
        st[st.conv_id.isin(set(ids))]
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want, check_dtype=False)
    # unknown ids and empty requests are safe
    assert lake.lookup_many(["no-such-conv"]).to_pandas().empty
    assert lake.lookup_many([]).to_pandas().empty


def test_export_snapshot_resumable_and_equal(tmp_path):
    changes = gen_changes(4_000, 250, seed=53)
    lake = _replay(tmp_path, split_epochs(changes, 2))
    dest = str(tmp_path / "export")
    m1 = lake.export_snapshot(dest)
    assert m1["skipped"] == 0 and m1["written"] == lake.P
    got = (
        pd.concat(
            [pq.read_table(os.path.join(dest, f)).to_pandas()
             for f in sorted(os.listdir(dest)) if f.endswith(".parquet")]
        )
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    want = lake.read_local_table().to_pandas()
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want, check_dtype=False)
    assert os.path.exists(os.path.join(dest, "_SUCCESS"))
    # crash-resume: delete one shard + _SUCCESS, re-export fills only the hole
    os.remove(os.path.join(dest, "part-00003.parquet"))
    os.remove(os.path.join(dest, "_SUCCESS"))
    m2 = lake.export_snapshot(dest)
    assert m2["written"] == 1 and m2["skipped"] == lake.P - 1
    assert m2["rows"] == m1["rows"]
    assert os.path.exists(os.path.join(dest, "_SUCCESS"))


def test_hot_key_detection_records_planted_conv(ray_session):
    import duckdb

    from dbt_customer360_ray.pipelines.cdc_replay import (
        hot_keys_lake,
        hot_keys_oracle_sql,
    )

    got = hot_keys_lake(sf=0.001).to_pandas()
    want = duckdb.connect().execute(hot_keys_oracle_sql(sf=0.001)).df()
    assert got["conv_id"].tolist() == want["conv_id"].tolist()
    assert "conv-00000001" in set(got["conv_id"])


def test_conversation_boilerplate_matches_oracle(ray_session):
    """Boilerplate-turn detection: per-conversation stats equal the SQL
    re-derivation over the converged state; the fixture's planted repeated
    text is flagged (some conversation has n_boilerplate > 0) and every
    permille is an exact integer floor of 1000·b/n."""
    import duckdb

    from dbt_customer360_ray.pipelines.cdc_replay import (
        boilerplate_oracle_sql,
        conversation_boilerplate,
    )

    got = (
        conversation_boilerplate(sf=0.001, min_convs=2)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    want = (
        duckdb.connect()
        .execute(boilerplate_oracle_sql(sf=0.001, min_convs=2))
        .df()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got, want[got.columns.tolist()], check_dtype=False
    )
    assert got["n_boilerplate"].sum() > 0
    assert (got["n_boilerplate"] <= got["n_turns"]).all()
    exp = (got["n_boilerplate"] * 1000) // got["n_turns"]
    assert (got["boilerplate_permille"] == exp).all()


def test_export_sft_jsonl_resumable_and_parses_back(tmp_path):
    import json as _json
    import os

    changes = gen_changes(3_000, 180, seed=59)
    lake = _replay(tmp_path, split_epochs(changes, 2))
    dest = str(tmp_path / "sft")
    m1 = lake.export_sft_jsonl(dest)
    assert m1["written"] == lake.P and m1["skipped"] == 0

    shards = sorted(f for f in os.listdir(dest) if f.endswith(".jsonl"))
    assert len(shards) == lake.P
    with open(os.path.join(dest, "_SUCCESS")) as f:
        counts = _json.load(f)["rows"]
    assert sum(counts.values()) == m1["rows"]

    # parse-back equals the in-memory assembly
    rows = []
    for s in shards:
        with open(os.path.join(dest, s)) as f:
            rows.extend(_json.loads(line) for line in f if line.strip())
    got = (
        pd.DataFrame(rows)
        .sort_values("conv_id", kind="stable")
        .reset_index(drop=True)
    )
    want = (
        lake.assemble_conversations()
        .to_pandas()
        .sort_values("conv_id", kind="stable")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)

    # resume: a lost shard is rewritten byte-identically, others skip
    victim = os.path.join(dest, shards[3])
    orig = open(victim, "rb").read()
    os.unlink(victim)
    m2 = lake.export_sft_jsonl(dest)
    assert m2["written"] == 1 and m2["skipped"] == lake.P - 1
    assert open(victim, "rb").read() == orig


def test_explain_read_matches_executed_plan(tmp_path):
    changes = gen_changes(4_000, 250, seed=61)
    lake = _replay(tmp_path, split_epochs(changes, 3))
    st = lake.read_local_table().to_pandas()
    cut = st.ts.quantile(0.7)

    plan = lake.explain_read(since_ts=cut).to_pandas()
    lake.read(since_ts=cut).count()
    assert plan["runs_total"].sum() == lake.last_read_stats["runs_total"]
    assert plan["pruned_by_ts"].sum() == lake.last_read_stats["runs_pruned"]
    assert (
        plan["runs_planned"].sum() + plan["pruned_by_ts"].sum()
        == plan["runs_total"].sum()
    )

    # point-lookup plan: only the owner partition scans; bloom probing can
    # only prune further; the actual lookup fits under the planned row bound
    conv = st["conv_id"].iloc[0]
    lp = lake.explain_read(conv_ids=[conv]).to_pandas()
    assert (lp["runs_planned"] > 0).sum() == 1
    assert lp["pruned_by_routing"].sum() == lp[lp["runs_planned"] == 0]["runs_total"].sum()
    lpb = lake.explain_read(conv_ids=[conv], probe_blooms=True).to_pandas()
    assert lpb["runs_planned"].sum() <= lp["runs_planned"].sum()
    assert lake.lookup(conv).num_rows <= lpb["rows_max"].sum()


def test_export_sft_jsonl_incremental_refresh(tmp_path):
    """A re-export after new commits rewrites ONLY the partitions whose
    content changed (the _SUCCESS content tokens), never serving stale
    shards the way blind skip-if-exists would."""
    import json as _json
    import os

    import numpy as np
    import pyarrow as pa
    import ray.data

    changes = gen_changes(3_000, 180, seed=69)
    lake = _replay(tmp_path, split_epochs(changes, 2))
    dest = str(tmp_path / "sft")
    lake.export_sft_jsonl(dest)

    # touch exactly one conversation → exactly one partition changes
    st = lake.read_local_table().to_pandas()
    victim = st.conv_id.iloc[0]
    ev = pd.DataFrame(
        {
            "offset": [50_000_000],
            "op": ["U"],
            "conv_id": [victim],
            "turn_idx": np.array([st[st.conv_id == victim].turn_idx.iloc[0]], "int32"),
            "role": ["user"],
            "text": ["refreshed text for the incremental export test"],
            "tool": [None],
            "ts": pd.Series([pd.Timestamp("2025-07-02")], dtype="datetime64[us]"),
        }
    )
    lake.apply(ray.data.from_arrow(pa.Table.from_pandas(ev, preserve_index=False)))
    m = lake.export_sft_jsonl(dest)
    assert m["written"] == 1 and m["skipped"] == lake.P - 1

    # the refreshed shard carries the new text; totals match the assembly
    rows = []
    for s in sorted(f for f in os.listdir(dest) if f.endswith(".jsonl")):
        with open(os.path.join(dest, s)) as f:
            rows.extend(_json.loads(line) for line in f if line.strip())
    got = pd.DataFrame(rows).sort_values("conv_id", kind="stable").reset_index(drop=True)
    want = (
        lake.assemble_conversations()
        .to_pandas()
        .sort_values("conv_id", kind="stable")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)
    # an untouched lake re-exports as a pure metadata no-op
    m2 = lake.export_sft_jsonl(dest)
    assert m2["written"] == 0 and m2["skipped"] == lake.P


def test_read_where_predicate_serving(tmp_path):
    """read(where=…): constraint-grammar predicate with SQL WHERE semantics
    at the serving read — column-mapping aware, projection-independent,
    composing with since_ts and deletion vectors."""
    changes = gen_changes(4_000, 250, seed=73)
    lake = _replay(tmp_path, split_epochs(changes, 2))
    st = lake.read_local_table().to_pandas()

    spec = {"name": "w", "column": "role", "op": "==", "value": "assistant"}
    got = lake.read(where=spec).to_pandas()
    exp = st[st.role.eq("assistant").fillna(False)]
    assert len(got) == len(exp) and got.role.eq("assistant").all()

    # predicate column rides the scan even when not projected
    got2 = lake.read(columns=["text"], where=spec).to_pandas()
    assert len(got2) == len(exp) and "role" not in got2.columns

    # composes with the ts bound
    cut = st.ts.quantile(0.5)
    got3 = lake.read(since_ts=cut, where=spec).to_pandas()
    exp3 = exp[exp.ts >= pd.Timestamp(cut)]
    assert len(got3) == len(exp3)

    # logical names after a RENAME
    lake.rename_column("role", "speaker")
    got4 = lake.read(
        where={"name": "w", "column": "speaker", "op": "==", "value": "assistant"}
    ).to_pandas()
    assert len(got4) == len(exp) and got4.speaker.eq("assistant").all()

    # NULL comparisons drop (DML WHERE semantics)
    n_tool_null = int(st.tool.isna().sum())
    assert n_tool_null > 0
    got5 = lake.read(
        where={"name": "t", "column": "tool", "op": "<", "value": "zzz"}
    ).to_pandas()
    assert len(got5) == len(st) - n_tool_null


def test_memory_cas_log_store_threads_all_survive(tmp_path):
    """The same 8x4 no-coordination hammer, arbitrated by the pluggable
    CAS log store (the Delta-on-S3 pattern: pointer in an external CAS
    cell, bodies in the directory, no filesystem lock) — every run file
    and metric increment lands exactly once (VERDICT r3 Next #5)."""
    import threading

    from dbt_customer360_ray.state.manifest import (
        CasCell,
        Manifest,
        MemoryCasLogStore,
    )

    schema = pa.schema([("conv_id", pa.string())])
    mdir = str(tmp_path / "lake" / "_manifest")
    cell = CasCell()
    errs = []

    def worker(w: int):
        try:
            m = Manifest(
                str(tmp_path / "lake"), log_store=MemoryCasLogStore(mdir, cell)
            )
            for i in range(4):
                m.reload()
                m.commit_epoch(
                    w * 4 + i,
                    {w % 4: {"runs": [
                        {"path": f"w{w}-{i}.parquet", "rows": 1, "tombstones": 0}],
                        "max_offset": w * 4 + i,
                        "rows": m.partition(w % 4)["rows"] + 1}},
                    schema, 4, {"events_in": 1},
                )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(w,)) for w in range(8)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    assert not errs
    fresh = Manifest(
        str(tmp_path / "lake"), log_store=MemoryCasLogStore(mdir, cell)
    )
    paths = [r["path"] for p in range(4) for r in fresh.partition(p)["runs"]]
    assert sorted(paths) == sorted(
        f"w{w}-{i}.parquet" for w in range(8) for i in range(4)
    )
    assert fresh.metrics["events_in"] == 32


def test_lost_cas_retries_land_commit_exactly_once(tmp_path):
    """A CAS arbiter that transiently rejects (conditional put refused, no
    side effect — the retryable arbiter-error case): the commit loop
    rebases and retries until the swap lands; the manifest advances exactly
    one version per logical commit, never two."""
    from dbt_customer360_ray.state.manifest import (
        CasCell,
        Manifest,
        MemoryCasLogStore,
    )

    class FlakyCell(CasCell):
        def __init__(self, reject_first: int):
            super().__init__()
            self.reject_first = reject_first
            self.attempts = 0

        def compare_and_swap(self, expected: int, new: int) -> bool:
            self.attempts += 1
            if self.attempts <= self.reject_first:
                return False  # transient rejection, pointer untouched
            return super().compare_and_swap(expected, new)

    schema = pa.schema([("conv_id", pa.string())])
    mdir = str(tmp_path / "lake" / "_manifest")
    cell = FlakyCell(reject_first=3)
    m = Manifest(str(tmp_path / "lake"), log_store=MemoryCasLogStore(mdir, cell))
    m.commit_epoch(
        0,
        {0: {"runs": [{"path": "a.parquet", "rows": 7, "tombstones": 0}],
             "max_offset": 6, "rows": 7}},
        schema, 2, {"events_in": 7},
    )
    assert cell.attempts == 4  # 3 rejections + the landing swap
    assert cell.value == 1  # exactly one version advance
    fresh = Manifest(
        str(tmp_path / "lake"), log_store=MemoryCasLogStore(mdir, CasCell(1))
    )
    assert [r["path"] for r in fresh.partition(0)["runs"]] == ["a.parquet"]
    assert fresh.metrics["events_in"] == 7
