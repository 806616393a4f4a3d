"""Incremental materialized views: derived lake maintained from the change
feed, equal to filter(source state) after every sync."""

import pandas as pd
import pytest

from dbt_customer360_ray.gen import gen_changes, oracle_lake, split_epochs
from dbt_customer360_ray.state.engine import CdcLake
from dbt_customer360_ray.state.views import sync_view

pytestmark = pytest.mark.usefixtures("ray_session")

KEEP = ["conv_id", "turn_idx", "role", "text", "tool"]


def _view_state(dst: CdcLake) -> pd.DataFrame:
    df = dst.read_local_table().to_pandas()
    return (
        df[KEEP + ["src_ts"]]
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )


def _want(epochs, upto) -> pd.DataFrame:
    state = oracle_lake(*epochs[: upto + 1])
    out = state[state["role"] == "assistant"].rename(columns={"ts": "src_ts"})
    return out[KEEP + ["src_ts"]].reset_index(drop=True)


def test_view_tracks_source_epoch_by_epoch(tmp_path):
    import ray.data

    changes = gen_changes(6_000, 200, seed=61)  # updates flip roles in/out
    epochs = split_epochs(changes, 3)
    src = CdcLake(str(tmp_path / "src"), num_partitions=8)
    dst = CdcLake(str(tmp_path / "dst"), num_partitions=8)
    for e, part in enumerate(epochs):
        src.apply(ray.data.from_arrow(part))
        sync_view(src, dst, keep=lambda df: df["role"].eq("assistant"))
        pd.testing.assert_frame_equal(
            _view_state(dst), _want(epochs, e), check_dtype=False
        )
    # a key that left the view via an update must have become a delete there
    assert dst.metrics()["deletes"] > 0


def test_sync_view_is_resumable_and_idempotent(tmp_path):
    import ray.data

    changes = gen_changes(3_000, 150, seed=67)
    epochs = split_epochs(changes, 3)
    src = CdcLake(str(tmp_path / "src"), num_partitions=4)
    dst = CdcLake(str(tmp_path / "dst"), num_partitions=4)
    for part in epochs:
        src.apply(ray.data.from_arrow(part))
    sync_view(src, dst, keep=lambda df: df["role"].eq("assistant"), upto_epoch=1)
    before = _view_state(dst)
    pd.testing.assert_frame_equal(before, _want(epochs, 1), check_dtype=False)
    # catch up the remaining epoch, then re-sync everything: no-op
    sync_view(src, dst, keep=lambda df: df["role"].eq("assistant"))
    after = _view_state(dst)
    pd.testing.assert_frame_equal(after, _want(epochs, 2), check_dtype=False)
    metrics = sync_view(src, dst, keep=lambda df: df["role"].eq("assistant"))
    assert metrics == []  # all view epochs committed — nothing to do


def test_incremental_headers_view_matches_full_recompute(tmp_path, ray_session):
    """The dirty-key aggregate view after each epoch equals a full header
    recompute over the converged source state — and only touched convs emit
    events (work ∝ epoch deltas)."""
    import pandas as pd
    import ray.data

    from dbt_customer360_ray.gen import gen_changes, split_epochs
    from dbt_customer360_ray.state.engine import CdcLake
    from dbt_customer360_ray.state.views import sync_headers_view

    epochs = split_epochs(gen_changes(6_000, 150, seed=71), 3)
    src = CdcLake(str(tmp_path / "src"), num_partitions=6)
    dst = CdcLake(str(tmp_path / "hdr"), num_partitions=6)
    for part in epochs:
        src.apply(ray.data.from_arrow(part))
        ms = sync_headers_view(src, dst)
        assert len(ms) == 1
        got = (
            dst.read_local_table()
            .to_pandas()
            .drop(columns=["turn_idx", "ts"])
            .sort_values("conv_id")
            .reset_index(drop=True)
        )
        state = src.read_local_table().to_pandas()
        if "tool" not in state.columns:  # epoch-0 snapshot predates `tool`
            state["tool"] = None
        g = state.groupby("conv_id", sort=True)
        want = pd.DataFrame(
            {
                "n_turns": g.size().astype("int64"),
                "n_tool_turns": g["tool"].count().astype("int64"),
                "first_ts": g["ts"].min(),
                "last_ts": g["ts"].max(),
            }
        ).reset_index()
        pd.testing.assert_frame_equal(
            got[want.columns.tolist()], want, check_dtype=False
        )
    # resumable: re-sync is a no-op (epochs already committed)
    assert sync_headers_view(src, dst) == []


def _rebuild_postings(src: CdcLake) -> pd.DataFrame:
    from dbt_customer360_ray.state.views import TOKEN_RE

    st = src.read_local_table().to_pandas()
    toks = st["text"].fillna("").str.lower().str.findall(TOKEN_RE)
    e = (
        pd.DataFrame({"conv_id": st["conv_id"], "token": toks})
        .explode("token")
        .dropna(subset=["token"])
    )
    want = (
        e.groupby(["token", "conv_id"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
    )
    return want.sort_values(["token", "conv_id"]).reset_index(drop=True)


def _postings(dst: CdcLake) -> pd.DataFrame:
    from dbt_customer360_ray.state.views import read_token_index

    return (
        read_token_index(dst)
        .to_pandas()
        .sort_values(["token", "conv_id"])
        .reset_index(drop=True)
    )


def test_token_index_tracks_source_epoch_by_epoch(tmp_path):
    import ray.data

    from dbt_customer360_ray.state.views import sync_token_index

    epochs = split_epochs(gen_changes(6_000, 250, seed=67), 3)
    src = CdcLake(str(tmp_path / "src"), num_partitions=8)
    dst = CdcLake(str(tmp_path / "idx"), num_partitions=8)
    for part in epochs:
        src.apply(ray.data.from_arrow(part))
        sync_token_index(src, dst)
        # after EVERY incremental sync the index equals a full rebuild
        got = _postings(dst)
        pd.testing.assert_frame_equal(got, _rebuild_postings(src), check_dtype=False)


def test_token_index_resumes_after_rollback(tmp_path):
    import os

    import ray.data

    from dbt_customer360_ray.state.views import sync_token_index

    epochs = split_epochs(gen_changes(5_000, 200, seed=71), 3)
    src = CdcLake(str(tmp_path / "src"), num_partitions=4)
    dst = CdcLake(str(tmp_path / "idx"), num_partitions=4)
    for part in epochs:
        src.apply(ray.data.from_arrow(part))
    sync_token_index(src, dst)
    want = _postings(dst)
    # crash simulation: roll the index manifest back one committed version
    cur = os.path.join(dst.lake_dir, "_manifest", "CURRENT")
    v = int(open(cur).read().strip())
    with open(cur, "w") as f:
        f.write(str(v - 1))
    dst2 = CdcLake(dst.lake_dir, num_partitions=4)
    assert sync_token_index(src, dst2), "rollback should leave epochs to redo"
    pd.testing.assert_frame_equal(_postings(dst2), want, check_dtype=False)
    # and a further sync is a no-op
    assert sync_token_index(src, dst2) == []


def _want_keepers(epochs, upto) -> pd.DataFrame:
    import hashlib

    state = oracle_lake(*epochs[: upto + 1])
    h = state[state["text"].notna()].copy()
    h["text_md5"] = h["text"].map(lambda t: hashlib.md5(t.encode()).hexdigest())
    h = h.sort_values(["text_md5", "conv_id", "turn_idx"], kind="stable")
    g = h.groupby("text_md5", sort=True, as_index=False)
    out = g.first()[["text_md5", "conv_id", "turn_idx"]].rename(
        columns={"conv_id": "keeper_conv", "turn_idx": "keeper_turn"}
    )
    out["keeper_turn"] = out["keeper_turn"].astype("int64")
    out["n_copies"] = g.size()["size"].to_numpy("int64")
    return out.reset_index(drop=True)


def test_dedup_index_tracks_source_epoch_by_epoch(tmp_path):
    import ray.data

    from dbt_customer360_ray.state.views import read_dedup_keepers, sync_dedup_index

    changes = gen_changes(6_000, 200, seed=67)  # updates + deletes churn texts
    epochs = split_epochs(changes, 3)
    src = CdcLake(str(tmp_path / "src"), num_partitions=8)
    dst = CdcLake(str(tmp_path / "dst"), num_partitions=8)
    for e, part in enumerate(epochs):
        src.apply(ray.data.from_arrow(part))
        sync_dedup_index(src, dst)
        got = (
            read_dedup_keepers(dst, num_buckets=4)
            .to_pandas()
            .sort_values("text_md5", kind="stable")
            .reset_index(drop=True)
        )
        want = _want_keepers(epochs, e)
        pd.testing.assert_frame_equal(got[want.columns.tolist()], want)
    # deletions really flow through: some postings were tombstoned
    assert dst.metrics()["deletes"] > 0
    # and maintenance is delta-sized: far fewer events than a full rescan
    assert dst.metrics()["events_in"] < 3 * len(_want_keepers(epochs, 2))


def test_dedup_index_resumes_and_dedups_resync(tmp_path):
    import ray.data

    from dbt_customer360_ray.state.views import read_dedup_keepers, sync_dedup_index

    changes = gen_changes(3_000, 120, seed=71)
    epochs = split_epochs(changes, 2)
    src = CdcLake(str(tmp_path / "src"), num_partitions=8)
    dst = CdcLake(str(tmp_path / "dst"), num_partitions=8)
    for part in epochs:
        src.apply(ray.data.from_arrow(part))
    sync_dedup_index(src, dst)
    before = read_dedup_keepers(dst, num_buckets=4).to_pandas()
    # a re-sync is a no-op (epochs already committed on the view)
    assert sync_dedup_index(src, dst) == []
    after = (
        read_dedup_keepers(dst, num_buckets=8).to_pandas()  # bucket-count invariant
        .sort_values("text_md5", kind="stable").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        before.sort_values("text_md5", kind="stable").reset_index(drop=True), after
    )


def test_assign_offsets_survives_placeholder_collisions(tmp_path):
    """The r5 sf1.5 rehearsal bug, pinned at unit scale: view events all
    carry the SAME placeholder offset (worst-case total collision — the old
    hash recipe's birthday collisions, taken to the limit); with
    ``apply(assign_offsets=True)`` every distinct key must survive the
    sink's first-delivery dedup with a unique, epoch-monotone offset."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    lake = CdcLake(str(tmp_path / "lake"), num_partitions=4)
    n = 5_000
    for epoch in range(2):
        ev = pa.table(
            {
                "offset": pa.array(np.zeros(n, np.int64)),  # ALL colliding
                "op": pa.array(["I"] * n),
                "conv_id": pa.array([f"k-{epoch}-{i:06d}" for i in range(n)]),
                "turn_idx": pa.array(np.zeros(n, np.int32)),
                "text": pa.array([f"v{i}" for i in range(n)]),
                "ts": pa.array(
                    np.full(n, np.datetime64("2025-01-01", "us")
                            + np.timedelta64(epoch, "s"))
                ),
            }
        )
        m = lake.apply(ray.data.from_arrow(ev), epoch=epoch, assign_offsets=True)
        assert m["events_deduped"] == 0, m  # no silent drops

    import pyarrow.parquet as pq

    def _runs_df(lk):
        return pd.concat(
            [pq.read_table(f).to_pandas() for f in lk.manifest.live_files()],
            ignore_index=True,
        )

    st = _runs_df(lake)
    assert len(st) == 2 * n  # every distinct key survived
    offs = st["offset"].to_numpy()
    assert len(np.unique(offs)) == len(offs)  # collision-free
    # epoch-monotone: epoch-1 offsets all above epoch-0's envelope
    e0 = st["conv_id"].str.startswith("k-0-").to_numpy()
    assert offs[~e0].min() > offs[e0].max()
    # deterministic: a second lake replaying the same events writes the
    # same offsets (rank is a key function, not an arrival-order function)
    lake2 = CdcLake(str(tmp_path / "lake2"), num_partitions=4)
    for epoch in range(2):
        ev = pa.table(
            {
                "offset": pa.array(np.zeros(n, np.int64)),
                "op": pa.array(["I"] * n),
                "conv_id": pa.array([f"k-{epoch}-{i:06d}" for i in range(n)]),
                "turn_idx": pa.array(np.zeros(n, np.int32)),
                "text": pa.array([f"v{i}" for i in range(n)]),
                "ts": pa.array(
                    np.full(n, np.datetime64("2025-01-01", "us")
                            + np.timedelta64(epoch, "s"))
                ),
            }
        )
        # reversed arrival order must not change the assigned offsets
        lake2.apply(
            ray.data.from_arrow(ev.take(pa.array(range(n - 1, -1, -1)))),
            epoch=epoch, assign_offsets=True,
        )
    st2 = _runs_df(lake2)
    a = st.sort_values(["conv_id"], kind="stable").reset_index(drop=True)
    b = st2.sort_values(["conv_id"], kind="stable").reset_index(drop=True)
    pd.testing.assert_series_equal(a["offset"], b["offset"])


def test_assign_offsets_unique_under_hot_key_salting(tmp_path):
    """A hot key fans one partition's events across salts; salted groups
    rank independently, so the salt field in the offset layout must keep
    them disjoint (same pid, same epoch, different salt)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    lake = CdcLake(str(tmp_path / "lake"), num_partitions=2, num_salts=4)
    n = 2_000
    # one hot conversation (same conv_id, distinct turns) + cold background;
    # explicit hot_keys skips the estimator
    ev = pa.table(
        {
            "offset": pa.array(np.zeros(2 * n, np.int64)),
            "op": pa.array(["I"] * (2 * n)),
            "conv_id": pa.array(["hot"] * n + [f"c-{i:05d}" for i in range(n)]),
            "turn_idx": pa.array(
                np.concatenate([np.arange(n), np.zeros(n)]).astype(np.int32)
            ),
            "text": pa.array([f"v{i}" for i in range(2 * n)]),
            "ts": pa.array(np.full(2 * n, np.datetime64("2025-01-01", "us"))),
        }
    )
    m = lake.apply(
        ray.data.from_arrow(ev), epoch=0, hot_keys={"hot"}, assign_offsets=True
    )
    assert m["events_deduped"] == 0, m
    st = pd.concat(
        [pq.read_table(f).to_pandas() for f in lake.manifest.live_files()],
        ignore_index=True,
    )
    assert len(st) == 2 * n
    offs = st["offset"].to_numpy()
    assert len(np.unique(offs)) == len(offs)
    # the hot conversation really was salted into >1 group (else vacuous)
    hot_offs = st.loc[st["conv_id"] == "hot", "offset"].to_numpy()
    nsk = 2 * 4  # P * S
    skey_bits = (nsk - 1).bit_length()
    rank_bits = 40 - skey_bits
    skeys = (hot_offs >> rank_bits) & ((1 << skey_bits) - 1)
    assert len(np.unique(skeys)) > 1


def test_dedup_keepers_empty_lake_serves_keeper_schema(tmp_path):
    """A zero-block index lake must serve the KEEPER schema (keeper_conv /
    keeper_turn / n_copies), not the posting input's — callers select keeper
    columns immediately (r4 ADVICE)."""
    from dbt_customer360_ray.state.views import read_dedup_keepers

    dst = CdcLake(str(tmp_path / "dst"), num_partitions=4)
    got = read_dedup_keepers(dst, num_buckets=4)
    assert got.count() == 0
    # dataset-level schema is the contract (Ray's to_pandas drops columns on
    # any zero-row dataset); selecting keeper columns must succeed
    assert got.schema().names == [
        "text_md5", "keeper_conv", "keeper_turn", "n_copies"
    ]
    assert got.select_columns(["keeper_conv", "n_copies"]).count() == 0
