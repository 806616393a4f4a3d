"""Flagship pipeline: deterministic CDC replay → converged transcript lake.

Generates (once, cached) the seeded change-stream fixture for a scale factor,
replays it epoch-by-epoch through CdcLake into a fresh lake directory, and
returns the converged state as a streaming Dataset. This is the end-state the
reference reaches with a full `dbt run` rebuild (dbt_project.yml:11), produced
incrementally with exactly-once semantics instead.
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd

from ..gen import SF_SIZES, write_fixture
from ..state.engine import CdcLake

FIXTURE_ROOT = os.environ.get("GRAFT_FIXTURE_DIR", "/tmp/dbt_c360_ray_fixtures")


def sf_from_dir(sf_dir: str, default: float = 0.001) -> float:
    """Parse '.../sf0.01' → 0.01 (driver passes sf dirs; our CDC fixture scales
    to match)."""
    base = os.path.basename(os.path.normpath(sf_dir))
    if base.startswith("sf"):
        try:
            sf = float(base[2:])
            if sf in SF_SIZES:
                return sf
        except ValueError:
            pass
    return default


def changes_fixture(sf: float, num_epochs: int | None = None) -> dict:
    if num_epochs is None:
        num_epochs = 2 if sf >= 1 else 4  # big scaling fixtures: fewer barriers
    out_dir = os.path.join(FIXTURE_ROOT, f"changes-sf{sf}")
    return write_fixture(out_dir, sf=sf, num_epochs=num_epochs)


def replay(
    sf: float = 0.001,
    lake_dir: str | None = None,
    num_partitions: int = 32,
    num_epochs: int = 4,
    detect_hot: str = "carryover",
):
    """Replay the sf fixture into a (fresh) lake; returns (lake, metrics list)."""
    fx = changes_fixture(sf, num_epochs)
    if lake_dir is None:
        lake_dir = tempfile.mkdtemp(prefix=f"cdc-lake-sf{sf}-")
    lake = CdcLake(os.path.join(lake_dir, "lake"), num_partitions=num_partitions)
    metrics = [lake.apply(p, detect_hot=detect_hot) for p in fx["paths"]]
    return lake, metrics


def flagship(sf: float = 0.001):
    """entry() surface: replay and return the converged lake as a Dataset."""
    lake, _metrics = replay(sf=sf)
    return lake.read()


_REPLAYED: dict = {}


def replayed_lake(sf: float = 0.01):
    """One shared replayed lake per sf (process-lifetime cache) for the
    snapshot / change-feed queries — they read different manifest versions of
    the SAME lake, so one replay serves all of them."""
    if sf not in _REPLAYED:
        lake, _metrics = replay(sf=sf)
        _REPLAYED[sf] = lake
    return _REPLAYED[sf]


def clustered_lake(sf: float = 0.01, rows_per_file: int = 2048):
    """Full replay into a FRESH lake (cluster commits a new manifest version,
    so the shared ``replayed_lake`` must stay un-mutated), then OPTIMIZE
    ZORDER: every partition's live runs merged and rewritten as multiple
    Morton-ordered (key, ts) run files. Serving content is layout-invariant,
    so the oracle is the plain replay oracle — the same contract the reshard
    entry pins for partition-count invariance."""
    lake, _metrics = replay(sf=sf)
    lake.cluster_zorder(rows_per_file=rows_per_file)
    return lake


def restored_lake(sf: float = 0.01, epoch: int = 1):
    """Full replay into a FRESH lake (the shared ``replayed_lake`` must stay
    un-mutated — restore commits a new version), then RESTORE to ``epoch``'s
    snapshot. The rolled-back state must equal the time-travel read, so the
    oracle is ``timetravel_oracle_sql`` at the same epoch."""
    lake, _metrics = replay(sf=sf)
    lake.restore(epoch=epoch)
    return lake


def _renamed_epoch_path(src: str, old: str = "tool", new: str = "tool_label") -> str:
    """Derived fixture (cached, atomic): ``src`` with one column renamed — the
    post-ALTER producer's output for the column-mapping driver entry."""
    import pyarrow.parquet as pq

    dst = src[: -len(".parquet")] + f"-{new}.parquet"
    if not os.path.exists(dst):
        t = pq.read_table(src)
        t = t.rename_columns([new if n == old else n for n in t.column_names])
        tmp = f"{dst}.tmp-{os.getpid()}"
        pq.write_table(t, tmp)
        os.replace(tmp, dst)
    return dst


def renamed_lake(sf: float = 0.01):
    """Column-mapping driver surface (``CdcLake.rename_column``): replay all
    but the last fixture epoch, RENAME ``tool`` → ``tool_label`` (a
    metadata-only commit — no data files rewritten), then apply the last epoch
    with events carrying the NEW name, as the post-ALTER upstream producer
    would emit them. The converged state must equal the plain replay with the
    column presented under its new name — which is exactly what
    ``renamed_oracle_sql`` asserts from the ORIGINAL fixture bytes."""
    fx = changes_fixture(sf)
    lake_dir = tempfile.mkdtemp(prefix=f"cdc-renamed-sf{sf}-")
    lake = CdcLake(os.path.join(lake_dir, "lake"), num_partitions=32)
    paths = fx["paths"]
    for p in paths[:-1]:
        lake.apply(p)
    lake.rename_column("tool", "tool_label")
    lake.apply(_renamed_epoch_path(paths[-1]))
    return lake.read()


def renamed_oracle_sql(sf: float = 0.01) -> str:
    """Oracle for ``renamed_lake``: the plain LWW replay of the ORIGINAL
    fixture files with the final projection aliased ``tool AS tool_label`` —
    a rename is metadata-only, so values must be byte-identical."""
    return _lww_sql(
        _epoch_selects(sf),
        out_cols="conv_id, turn_idx, role, text, tool AS tool_label, ts",
    )


def consumer_feed(sf: float = 0.01):
    """Named-consumer CDC-out driver surface: replay epochs 0-1 into a fresh
    lake, have a downstream consumer consume + ACK that window (cursor commits
    to the manifest), apply epochs 2-3, and return the consumer's NEXT window —
    which must be exactly the change feed between the epoch-1 and epoch-3
    snapshots (``change_feed_oracle_sql(from_epoch=1, to_epoch=3)``)."""
    fx = changes_fixture(sf)
    lake_dir = tempfile.mkdtemp(prefix=f"cdc-consumer-sf{sf}-")
    lake = CdcLake(os.path.join(lake_dir, "lake"), num_partitions=32)
    for p in fx["paths"][:2]:
        lake.apply(p)
    _feed, tok = lake.consume_changes("downstream")
    lake.ack_changes(tok)
    for p in fx["paths"][2:]:
        lake.apply(p)
    feed2, _tok2 = lake.consume_changes("downstream")
    return feed2


TXN_GROUP = 5  # events per upstream transaction in the derived txn fixture


def _txn_epoch_paths(sf: float, group: int = TXN_GROUP) -> list[str]:
    """Derived fixture (cached, atomic): the sf fixture's epoch files with
    Debezium transaction metadata appended — ``txn_id = offset // group`` and
    ``txn_n`` = the transaction's TRUE distinct-event count over the whole
    stream. Epoch boundaries cut transactions mid-flight, which is the point."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    fx = changes_fixture(sf)
    # true per-transaction totals from the DISTINCT offsets of the full stream
    all_off = np.unique(
        np.concatenate(
            [pq.read_table(p, columns=["offset"]).column("offset").to_numpy() for p in fx["paths"]]
        )
    )
    tot = np.bincount(all_off // group)
    out = []
    for p in fx["paths"]:
        dst = p[: -len(".parquet")] + f"-txn{group}.parquet"
        if not os.path.exists(dst):
            t = pq.read_table(p)
            off = t.column("offset").to_numpy()
            txn = off // group
            t = t.append_column("txn_id", pa.array(txn, pa.int64())).append_column(
                "txn_n", pa.array(tot[txn], pa.int64())
            )
            tmp = f"{dst}.tmp-{os.getpid()}"
            pq.write_table(t, tmp)
            os.replace(tmp, dst)
        out.append(dst)
    return out


def txn_lake(sf: float = 0.01, upto: int = 2):
    """Transaction-boundary atomicity driver surface: replay epochs 0..upto of
    the txn-metadata fixture through ``apply_transactional`` — transactions cut
    by the last epoch boundary are parked in the pending sidecar, so the
    visible lake holds ONLY complete transactions. ``txn_oracle_sql`` asserts
    exactly that from the same fixture bytes."""
    paths = _txn_epoch_paths(sf)
    lake_dir = tempfile.mkdtemp(prefix=f"cdc-txn-sf{sf}-")
    lake = CdcLake(os.path.join(lake_dir, "lake"), num_partitions=32)
    for p in paths[: upto + 1]:
        lake.apply_transactional(p)
    return lake.read()


def txn_oracle_sql(sf: float = 0.01, upto: int = 2, group: int = TXN_GROUP) -> str:
    """Oracle for ``txn_lake``: LWW replay of epochs 0..upto restricted to
    transactions (offset // group) whose DISTINCT-offset count within those
    epochs equals their true total over the whole stream — the engine's
    completion rule in SQL."""
    all_sel = "\n            UNION ALL\n            ".join(_epoch_selects(sf))
    sub_sel = "\n            UNION ALL\n            ".join(_epoch_selects(sf, upto=upto))
    return f"""
        WITH all_ev AS (
            {all_sel}
        ), sub AS (
            {sub_sel}
        ), tot AS (
            SELECT "offset" // {group} AS txn, count(DISTINCT "offset") AS n
            FROM all_ev GROUP BY 1
        ), seen AS (
            SELECT "offset" // {group} AS txn, count(DISTINCT "offset") AS s
            FROM sub GROUP BY 1
        ), ok AS (
            SELECT t.txn FROM tot t JOIN seen se USING (txn) WHERE se.s = t.n
        ), first_seen AS (
            SELECT * FROM sub
            WHERE "offset" // {group} IN (SELECT txn FROM ok)
            QUALIFY row_number() OVER (
                PARTITION BY "offset" ORDER BY epoch, file_rn) = 1
        ), winners AS (
            SELECT * FROM first_seen
            QUALIFY row_number() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, "offset" DESC) = 1
        )
        SELECT conv_id, turn_idx, role, text, tool, ts
        FROM winners WHERE op <> 'D'
    """


def stream_fixture_path(num_events: int = 20_000, num_convs: int = 1_000, seed: int = 42) -> str:
    """Write (once) the streaming-ingest fixture change table to parquet so the
    engine and the DuckDB oracle read the SAME bytes; returns the path."""
    import pyarrow.parquet as pq

    from ..gen import gen_changes

    out_dir = os.path.join(FIXTURE_ROOT, "stream")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"changes-{num_events}-{num_convs}-s{seed}.parquet")
    if not os.path.exists(path):
        tmp = path + ".tmp"
        pq.write_table(gen_changes(num_events, num_convs, seed=seed), tmp)
        os.replace(tmp, path)
    return path


def dlq_fixture_path(num_events: int = 5_000, num_convs: int = 300, seed: int = 77) -> str:
    """Write (once) a change table with deterministically injected malformed
    rows — bad ops, null keys/ts/offsets — so the dead-letter queue itself is
    oracle-checkable (engine and DuckDB read the SAME corrupted bytes)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..gen import gen_changes

    out_dir = os.path.join(FIXTURE_ROOT, "dlq")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"changes-{num_events}-{num_convs}-s{seed}.parquet")
    if not os.path.exists(path):
        df = gen_changes(num_events, num_convs, seed=seed).to_pandas()
        i = np.arange(len(df))
        df.loc[i % 101 == 5, "op"] = "Z"
        df.loc[i % 103 == 7, "op"] = None
        df.loc[i % 107 == 9, "conv_id"] = None
        df.loc[i % 109 == 11, "ts"] = pd.NaT
        df.loc[i % 113 == 13, "turn_idx"] = None
        df.loc[i % 127 == 17, "offset"] = None
        t = pa.Table.from_pandas(df, preserve_index=False)
        t = t.set_column(
            t.schema.get_field_index("turn_idx"),
            "turn_idx",
            t.column("turn_idx").cast(pa.int32()),
        )
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
    return path


def deadletter_oracle_sql() -> str:
    """DuckDB oracle for the DLQ entry: the corrupted fixture's invalid rows
    with the engine's reason priority (conv_id/turn_idx null → null_key, then
    null_ts, null_offset, else bad_op — mirroring ``quarantine_reasons``'s
    override order)."""
    p = dlq_fixture_path()
    return f"""
        SELECT "offset", op, conv_id, turn_idx, role, text, tool, ts,
               CASE WHEN conv_id IS NULL OR turn_idx IS NULL THEN 'null_key'
                    WHEN ts IS NULL THEN 'null_ts'
                    WHEN "offset" IS NULL THEN 'null_offset'
                    ELSE 'bad_op' END AS dl_reason
        FROM read_parquet('{p}')
        WHERE conv_id IS NULL OR turn_idx IS NULL OR ts IS NULL
           OR "offset" IS NULL OR op IS NULL OR op NOT IN ('I', 'U', 'D')
    """


# Demo table-constraint set for the driver entries: declared BEFORE replay, so
# the engine must quarantine every violating I/U event across all epochs.
# role_allowed excludes the fixture's 'tool'-role turns, text_nonempty its
# empty-string texts (reference analogue: dbt accepted_values / not_null tests
# gating the staged models); turn_nonneg never fires — the pass-through proof.
CHECK_CONSTRAINTS = [
    {"name": "role_allowed", "column": "role", "op": "in",
     "value": ["user", "assistant", "system"]},
    {"name": "text_nonempty", "column": "text", "op": "matches", "value": "."},
    {"name": "turn_nonneg", "column": "turn_idx", "op": ">=", "value": 0},
]

_CONSTRAINED: dict = {}


def constrained_lake(sf: float = 0.01):
    """Replay the fixture into a fresh lake that declared CHECK_CONSTRAINTS
    up front: violating change events land in the DLQ with ``chk:<name>``
    reasons, the converged state holds only passing rows. Cached per sf —
    the state entry and the DLQ entry read the same lake."""
    if sf not in _CONSTRAINED:
        fx = changes_fixture(sf)
        lake_dir = tempfile.mkdtemp(prefix=f"cdc-constrained-sf{sf}-")
        lake = CdcLake(os.path.join(lake_dir, "lake"), num_partitions=32)
        for c in CHECK_CONSTRAINTS:
            lake.add_check_constraint(
                c["name"], c["column"], c["op"], c.get("value")
            )
        for p in fx["paths"]:
            lake.apply(p)
        _CONSTRAINED[sf] = lake
    return _CONSTRAINED[sf]


_REDRIVEN: dict = {}


def redriven_lake(sf: float = 0.01):
    """DLQ redrive (the Kafka dead-letter redrive ops story): replay under
    CHECK_CONSTRAINTS (violators quarantine), ``DROP CONSTRAINT`` them all,
    then ``retry_deadletter`` replays the quarantined events through the
    SAME exactly-once epoch path — the fix dedups duplicate deliveries by
    offset and assigns deterministic FRESH offsets beyond the stream's max
    (ranked by original offset) so the committed-offset watermark cannot
    swallow them; the drained DLQ files leave the manifest. Returns the
    post-redrive converged state."""
    import numpy as np
    import pyarrow as pa

    if sf not in _REDRIVEN:
        fx = changes_fixture(sf)
        root = tempfile.mkdtemp(prefix=f"cdc-redriven-sf{sf}-")
        lake = CdcLake(os.path.join(root, "lake"), num_partitions=32)
        for c in CHECK_CONSTRAINTS:
            lake.add_check_constraint(
                c["name"], c["column"], c["op"], c.get("value")
            )
        for p in fx["paths"]:
            lake.apply(p)
        for c in CHECK_CONSTRAINTS:
            lake.drop_constraint(c["name"])
        max_off = _max_offset(fx["paths"])

        def fix(rows: pa.Table) -> pa.Table:
            # EXPLICIT delivery-order tiebreak (r3 advice): DLQ files concat
            # in manifest (epoch) order with in-file row order preserved, so
            # the positional index IS the (epoch, file_rn) delivery key the
            # oracle's row_number() keeps. Duplicate deliveries are NOT
            # byte-identical — a redelivery after additive evolution carries
            # the new column (tool) where the first delivery has NULL — so
            # keep-first must be pinned to delivery order, not left to
            # incidental sort stability.
            df = rows.to_pandas()
            df["_delivery_rank"] = np.arange(len(df), dtype=np.int64)
            df = (
                df.sort_values(["offset", "_delivery_rank"], kind="stable")
                .drop_duplicates("offset", keep="first")
                .drop(columns="_delivery_rank")
            )
            df["offset"] = max_off + 1 + np.arange(len(df), dtype=np.int64)
            return pa.Table.from_pandas(df, preserve_index=False)

        r = lake.retry_deadletter(fix)
        assert r.get("repaired", 0) > 0, r
        assert lake.read_deadletter().num_rows == 0
        _REDRIVEN[sf] = lake
    return _REDRIVEN[sf].read()


def _max_offset(paths) -> int:
    """Max offset across the stream from parquet footer stats (zero data
    read; same pattern as ``_epoch_ts_maxes``)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    out = []
    for p in paths:
        md = pq.ParquetFile(p).metadata
        idx = md.schema.to_arrow_schema().get_field_index("offset")
        stats = [
            md.row_group(rg).column(idx).statistics
            for rg in range(md.num_row_groups)
        ]
        if any(s is None or not s.has_min_max for s in stats):
            out.append(
                pc.max(pq.read_table(p, columns=["offset"]).column("offset")).as_py()
            )
        else:
            out.append(max(s.max for s in stats))
    return int(max(out))


def redriven_oracle_sql(sf: float = 0.01) -> str:
    """Oracle for the redriven lake: passing events as delivered, violators
    deduped by offset and re-offset to max+rank (the fix's recipe), both arms
    through the shared exactly-once + LWW window SQL."""
    from ..state.constraints import keep_sql, validate_spec

    specs = [validate_spec(c) for c in CHECK_CONSTRAINTS]
    keep = keep_sql(specs)
    union = "\n            UNION ALL\n            ".join(_epoch_selects(sf))
    arms = f"""
            SELECT * FROM (
                {union}
            ) WHERE ({keep})
            UNION ALL
            SELECT (SELECT max("offset") FROM ({union}))
                       + row_number() OVER (ORDER BY "offset") AS "offset",
                   op, conv_id, turn_idx, role, text, tool, ts,
                   1000000 AS epoch, 0 AS file_rn
            FROM (
                SELECT * FROM (
                    {union}
                ) WHERE NOT ({keep})
                QUALIFY row_number() OVER (
                    PARTITION BY "offset" ORDER BY epoch, file_rn) = 1
            )
    """
    return _lww_sql([arms])


def constrained_oracle_sql(sf: float = 0.01) -> str:
    """Oracle for the constrained lake: the plain LWW replay over only the
    events that pass every constraint (SQL CHECK semantics — NULL passes,
    deletes exempt)."""
    from ..state.constraints import keep_sql, validate_spec

    specs = [validate_spec(c) for c in CHECK_CONSTRAINTS]
    return _lww_sql(_epoch_selects(sf), pre_filter=keep_sql(specs))


def constraint_dlq_oracle_sql(sf: float = 0.01) -> str:
    """Oracle for the constrained lake's DLQ: every violating event with the
    first-declared-violation reason (``quarantine_reasons`` priority)."""
    from ..state.constraints import keep_sql, reason_case_sql, validate_spec

    specs = [validate_spec(c) for c in CHECK_CONSTRAINTS]
    union = "\n            UNION ALL\n            ".join(_epoch_selects(sf))
    return f"""
        SELECT "offset", op, conv_id, turn_idx, role, text, tool, ts,
               {reason_case_sql(specs)} AS dl_reason
        FROM (
            {union}
        )
        WHERE NOT ({keep_sql(specs)})
    """


def _lww_sql(
    select_epochs: list[str],
    out_cols: str = "conv_id, turn_idx, role, text, tool, ts",
    pre_filter: str = "TRUE",
) -> str:
    """Shared oracle shape for a replayed lake: exactly-once on ``offset``
    (first delivery in file order wins — a redelivered duplicate, even one
    re-encoded under an evolved schema, is a no-op), then LWW per
    (conv_id, turn_idx) on (ts, offset) with delete winners dropped — the
    semantics of gen.oracle_lake expressed in SQL. ``out_cols`` lets a
    column-mapped lake's oracle alias the final projection; ``pre_filter``
    drops events the engine quarantines before they reach an applier
    (table-constraint violations — they never compete for LWW or dedup)."""
    union = "\n            UNION ALL\n            ".join(select_epochs)
    return f"""
        WITH all_ev AS (
            {union}
        ), first_seen AS (
            SELECT * FROM all_ev
            WHERE {pre_filter}
            QUALIFY row_number() OVER (
                PARTITION BY "offset" ORDER BY epoch, file_rn) = 1
        ), winners AS (
            SELECT * FROM first_seen
            QUALIFY row_number() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, "offset" DESC) = 1
        )
        SELECT {out_cols}
        FROM winners WHERE op <> 'D'
    """


def _epoch_selects(sf: float, upto: int | None = None) -> list[str]:
    """Per-epoch-file SELECTs for the LWW oracle (epoch 0 is schema v0: no
    ``tool`` — null-injected exactly as the engine's additive evolution
    backfills it). ``upto`` truncates to epochs ≤ upto for snapshot oracles."""
    fx = changes_fixture(sf)
    paths = fx["paths"] if upto is None else fx["paths"][: upto + 1]
    selects = []
    for i, p in enumerate(paths):
        tool = "CAST(NULL AS VARCHAR) AS tool" if i == 0 else "tool"
        selects.append(
            f'SELECT "offset", op, conv_id, turn_idx, role, text, {tool}, ts, '
            f"{i} AS epoch, file_row_number AS file_rn "
            f"FROM read_parquet('{p}', file_row_number=true)"
        )
    return selects


def replay_oracle_sql(sf: float = 0.01) -> str:
    """DuckDB oracle for ``flagship(sf)``: reads the SAME fixture parquet
    (written as a side effect) and re-derives the converged lake state with
    window functions."""
    return _lww_sql(_epoch_selects(sf))


def timetravel_oracle_sql(sf: float, epoch: int) -> str:
    """Oracle for ``CdcLake.read_as_of(epoch=…)``: the converged state derived
    from only the epoch files ≤ ``epoch`` — a prefix replay in SQL."""
    return _lww_sql(_epoch_selects(sf, upto=epoch))


def view_oracle_sql(sf: float = 0.01, role: str = "assistant") -> str:
    """Oracle for the incrementally-maintained view: it must equal the
    FILTERED converged source state (ts surfaces as the view's src_ts)."""
    inner = _lww_sql(_epoch_selects(sf))
    return f"""
        SELECT conv_id, turn_idx, role, text, tool, ts AS src_ts
        FROM ({inner}) WHERE role = '{role}'
    """


def headers_oracle_sql(sf: float = 0.01) -> str:
    """Oracle for ``CdcLake.conversation_headers``: GROUP BY over the
    converged prefix-replay state."""
    inner = _lww_sql(_epoch_selects(sf))
    return f"""
        SELECT conv_id,
               count(*) AS n_turns,
               count(tool) AS n_tool_turns,
               min(ts) AS first_ts,
               max(ts) AS last_ts
        FROM ({inner})
        GROUP BY conv_id
    """


SYNC_TS = "2025-06-01 00:00:00"  # beyond every fixture ts — snapshot_sync requires it


def snapshot_synced_lake(sf: float = 0.01):
    """Driver surface for ``CdcLake.snapshot_sync``: replay the fixture into a
    fresh lake, derive a deterministic 'desired snapshot' from the converged
    state (drop every turn_idx % 5 == 3, edit user texts, add one marker turn
    per conversation), MERGE-sync it, and return the post-sync lake read. The
    snapshot derivation is Dataset-native and mirrored verbatim in
    ``snapshot_sync_oracle_sql``."""
    import numpy as np
    import pyarrow as pa

    snap_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("role", pa.string()),
            ("text", pa.string()),
            ("tool", pa.string()),
        ]
    )

    def to_snapshot(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["turn_idx"] % 5 != 3].copy()
        m = df["role"] == "user"
        df.loc[m, "text"] = df.loc[m, "text"] + " [edited]"
        return pa.Table.from_pandas(
            df[[f.name for f in snap_schema]], schema=snap_schema, preserve_index=False
        )

    def to_marker(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "conv_id": t.column("conv_id"),
                "turn_idx": pa.array(np.full(n, 9999, np.int32)),
                "role": pa.array(["system"] * n),
                "text": pa.array(["snapshot marker"] * n),
                "tool": pa.nulls(n, pa.string()),
            },
            schema=snap_schema,
        )

    lake, _ = replay(sf=sf)
    body = lake.read().map_batches(to_snapshot, batch_format="pyarrow")
    markers = (
        lake.conversation_headers()
        .select_columns(["conv_id"])
        .map_batches(to_marker, batch_format="pyarrow")
    )
    lake.snapshot_sync(body.union(markers), SYNC_TS)
    return lake.read()


def snapshot_sync_oracle_sql(sf: float = 0.01, sync_ts: str = SYNC_TS) -> str:
    """Oracle for ``snapshot_synced_lake``: the same desired snapshot derived
    in SQL, with MERGE ts-provenance semantics — payload-identical rows keep
    the lake ts, inserted/updated rows carry the sync timestamp, dropped keys
    are simply absent."""
    inner = _lww_sql(_epoch_selects(sf))
    return f"""
        WITH state AS ({inner}),
        snap AS (
            SELECT conv_id, turn_idx, role,
                   CASE WHEN role = 'user' THEN text || ' [edited]' ELSE text END AS text,
                   tool
            FROM state WHERE turn_idx % 5 <> 3
            UNION ALL
            SELECT DISTINCT conv_id, CAST(9999 AS INTEGER) AS turn_idx,
                   'system' AS role, 'snapshot marker' AS text,
                   CAST(NULL AS VARCHAR) AS tool
            FROM state
        )
        SELECT s.conv_id, s.turn_idx, s.role, s.text, s.tool,
               CASE WHEN l.conv_id IS NOT NULL
                     AND l.role IS NOT DISTINCT FROM s.role
                     AND l.text IS NOT DISTINCT FROM s.text
                     AND l.tool IS NOT DISTINCT FROM s.tool
                    THEN l.ts ELSE TIMESTAMP '{sync_ts}' END AS ts
        FROM snap s LEFT JOIN state l
          ON s.conv_id = l.conv_id AND s.turn_idx = l.turn_idx
    """


LATENESS = "30 minutes"


def late_quarantined_lake(sf: float = 0.01):
    """Driver surface for the lateness watermark: replay the fixture into a
    fresh lake with ``allowed_lateness=LATENESS`` and return the dead-letter
    rows — every event whose ts fell below (watermark − lateness) at its
    epoch's apply time, where the watermark is the max committed ts read from
    the manifest's per-run stats."""
    import tempfile

    lake = CdcLake(
        tempfile.mkdtemp(prefix="late-lake-") + "/lake",
        num_partitions=32,
        allowed_lateness=LATENESS,
    )
    for p in changes_fixture(sf)["paths"]:
        lake.apply(p)
    return lake.read_deadletter()


def late_quarantine_oracle_sql(sf: float = 0.01, lateness: str = LATENESS) -> str:
    """DuckDB oracle for the lateness watermark: the epoch-batch semantics
    unrolled as iterative CTEs — watermark before epoch i = max ts of all KEPT
    events of epochs < i (the engine reads it from run ts stats; a kept event's
    ts is committed, a quarantined one's never is). Epoch 0 has no watermark."""
    selects = _epoch_selects(sf)
    ctes = [f"ev AS ({' UNION ALL '.join(selects)})"]
    ctes.append("k0 AS (SELECT * FROM ev WHERE epoch = 0)")
    ctes.append("w1 AS (SELECT max(ts) AS w FROM k0)")
    late_parts = []
    for i in range(1, len(selects)):
        ctes.append(
            f"l{i} AS (SELECT e.* FROM ev e, w{i} "
            f"WHERE e.epoch = {i} AND e.ts < w{i}.w - INTERVAL '{lateness}')"
        )
        ctes.append(
            f"k{i} AS (SELECT e.* FROM ev e, w{i} "
            f"WHERE e.epoch = {i} AND e.ts >= w{i}.w - INTERVAL '{lateness}')"
        )
        if i + 1 < len(selects):
            ctes.append(
                f"w{i + 1} AS (SELECT greatest(w{i}.w, "
                f"coalesce((SELECT max(ts) FROM k{i}), w{i}.w)) AS w FROM w{i})"
            )
        late_parts.append(f"SELECT * FROM l{i}")
    union = " UNION ALL ".join(late_parts)
    return f"""
        WITH {', '.join(ctes)}
        SELECT "offset", op, conv_id, turn_idx, role, text, tool, ts,
               'too_late' AS dl_reason
        FROM ({union})
    """


# demo generated-column set (reference analogue: the staged models' derived
# expressions, e.g. lowered emails in stg_customer360__marketo.sql)
COMPUTED_COLUMNS = [
    ("n_chars", "length", "text"),
    ("text_lc", "lower", "text"),
    ("n_tokens", "token_count", "text"),
]


def computed_lake(sf: float = 0.01):
    """Driver surface for generated columns: a fresh lake declares
    COMPUTED_COLUMNS before replay; every apply derives them vectorized in
    the shuffle-map task and stores them with the row."""
    import tempfile

    lake = CdcLake(
        tempfile.mkdtemp(prefix="computed-lake-") + "/lake", num_partitions=32
    )
    for name, kind, source in COMPUTED_COLUMNS:
        lake.add_computed_column(name, kind, source)
    for p in changes_fixture(sf)["paths"]:
        lake.apply(p)
    return lake.read()


def computed_oracle_sql(sf: float = 0.01) -> str:
    """Oracle: the derivations are deterministic per-row functions, so
    applying them to the converged LWW winners in SQL equals storing them at
    ingest."""
    from ..state.computed import computed_sql, validate_computed

    exprs = ", ".join(
        f"{computed_sql(validate_computed(dict(name=n, kind=k, source=s)))} AS {n}"
        for n, k, s in COMPUTED_COLUMNS
    )
    return _lww_sql(
        _epoch_selects(sf),
        out_cols=f"conv_id, turn_idx, role, text, tool, ts, {exprs}",
    )


def backfilled_lake(sf: float = 0.01):
    """Driver surface for ``CdcLake.backfill_computed``: epochs 0-1 replay
    BEFORE the generated columns are declared (their winners store nulls),
    epochs 2-3 after; the backfill rewrites exactly the pre-declaration runs
    (asserted), after which every converged row carries the derivations —
    the same oracle as ``computed_lake`` (declared-from-birth) must hold."""
    lake = CdcLake(
        tempfile.mkdtemp(prefix="backfill-lake-") + "/lake", num_partitions=32
    )
    paths = changes_fixture(sf)["paths"]
    for p in paths[:2]:
        lake.apply(p)
    for name, kind, source in COMPUTED_COLUMNS:
        lake.add_computed_column(name, kind, source)
    for p in paths[2:]:
        lake.apply(p)
    m = lake.backfill_computed()
    assert m["runs_rewritten"] > 0, m
    return lake.read()


WINDOW = "1 minute"
WINDOW_LATENESS = "2 minutes"


def windowed_lake(sf: float = 0.01):
    """Driver surface for the tumbling-window aggregate with watermark
    finalization: replay the fixture into a fresh lake created with
    ``window=WINDOW, allowed_lateness=WINDOW_LATENESS`` and return
    ``window_counts()`` — per-(window, op) applied-event counts, with
    ``final=True`` on every window closed under the final watermark."""
    import tempfile

    lake = CdcLake(
        tempfile.mkdtemp(prefix="window-lake-") + "/lake",
        num_partitions=32,
        allowed_lateness=WINDOW_LATENESS,
        window=WINDOW,
    )
    for p in changes_fixture(sf)["paths"]:
        lake.apply(p)
    return lake.window_counts()


def window_counts_oracle_sql(
    sf: float = 0.01, window: str = WINDOW, lateness: str = WINDOW_LATENESS
) -> str:
    """DuckDB oracle for the windowed aggregate: per-epoch lateness cutoffs
    unrolled exactly like ``late_quarantine_oracle_sql`` (kept side), then
    first-delivery offset dedup, then the tumbling-window GROUP BY; a window
    is final iff its end ≤ final watermark − lateness."""
    import pandas as pd

    selects = _epoch_selects(sf)
    ctes = [f"ev AS ({' UNION ALL '.join(selects)})"]
    ctes.append("k0 AS (SELECT * FROM ev WHERE epoch = 0)")
    ctes.append("w1 AS (SELECT max(ts) AS w FROM k0)")
    kept_parts = ["SELECT * FROM k0"]
    for i in range(1, len(selects)):
        ctes.append(
            f"k{i} AS (SELECT e.* FROM ev e, w{i} "
            f"WHERE e.epoch = {i} AND e.ts >= w{i}.w - INTERVAL '{lateness}')"
        )
        if i + 1 < len(selects):
            ctes.append(
                f"w{i + 1} AS (SELECT greatest(w{i}.w, "
                f"coalesce((SELECT max(ts) FROM k{i}), w{i}.w)) AS w FROM w{i})"
            )
        kept_parts.append(f"SELECT * FROM k{i}")
    kept = " UNION ALL ".join(kept_parts)
    W = int(pd.Timedelta(window).value // 1_000)
    L = int(pd.Timedelta(lateness).value // 1_000)
    return f"""
        WITH {', '.join(ctes)}, kept AS ({kept}),
        first_seen AS (
            SELECT * FROM kept
            QUALIFY row_number() OVER (
                PARTITION BY "offset" ORDER BY epoch, file_rn) = 1
        ),
        wm AS (SELECT max(epoch_us(ts)) AS w FROM kept),
        counts AS (
            SELECT make_timestamp((epoch_us(ts) // {W}) * {W}) AS window_start,
                   op, count(*) AS n
            FROM first_seen GROUP BY 1, 2
        )
        SELECT c.window_start, c.op, c.n,
               (epoch_us(c.window_start) + {W}) <= (wm.w - {L}) AS final
        FROM counts c, wm
    """


def since_oracle_sql(sf: float, cutoff: str) -> str:
    """Oracle for the stats-pruned time-bounded read: the converged state
    filtered on ts — DuckDB scans everything; the engine must skip whole runs
    via the manifest's per-run ts_max stats and still agree."""
    inner = _lww_sql(_epoch_selects(sf))
    return f"SELECT * FROM ({inner}) WHERE ts >= TIMESTAMP '{cutoff}'"


MERGE_TS = "2025-06-01 00:00:00"  # beyond every fixture ts — merge_into requires it


def merged_into_lake(sf: float = 0.01):
    """Driver surface for ``CdcLake.merge_into`` (Delta-style predicate MERGE):
    replay the fixture into a fresh lake, derive a deterministic keyed source
    from the converged state — a column-subset UPDATE arm (turn_idx % 7 == 2,
    text gets a ' [MERGED]' suffix, gated by ``t_role == 'user'``) plus an
    INSERT arm (one turn 8888 marker per conversation) — merge it, and return
    the post-merge lake. Matched non-user rows and every lake key absent from
    the source stay untouched (the semantics snapshot_sync cannot express).
    Mirrored verbatim in ``merge_into_oracle_sql``."""
    import numpy as np
    import pyarrow as pa

    src_schema = pa.schema(
        [("conv_id", pa.string()), ("turn_idx", pa.int32()), ("text", pa.string())]
    )

    def to_updates(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["turn_idx"] % 7 == 2].copy()
        df["text"] = df["text"] + " [MERGED]"
        return pa.Table.from_pandas(
            df[["conv_id", "turn_idx", "text"]], schema=src_schema, preserve_index=False
        )

    def to_inserts(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "conv_id": t.column("conv_id"),
                "turn_idx": pa.array(np.full(n, 8888, np.int32)),
                "text": pa.array(["merged row"] * n),
            },
            schema=src_schema,
        )

    lake, _ = replay(sf=sf)
    updates = lake.read().map_batches(to_updates, batch_format="pyarrow")
    inserts = (
        lake.conversation_headers()
        .select_columns(["conv_id"])
        .map_batches(to_inserts, batch_format="pyarrow")
    )
    lake.merge_into(
        updates.union(inserts),
        MERGE_TS,
        matched_predicate=lambda df: df["t_role"] == "user",
    )
    return lake.read()


def merge_into_oracle_sql(sf: float = 0.01, merge_ts: str = MERGE_TS) -> str:
    """Oracle for ``merged_into_lake``: the same source derived in SQL, the
    matched-update arm applied only where the predicate holds AND the spliced
    image changes (ts provenance: untouched rows keep their lake ts), plus the
    unmatched-insert arm with null-filled unprovided columns."""
    inner = _lww_sql(_epoch_selects(sf))
    return f"""
        WITH state AS ({inner}),
        src AS (
            SELECT conv_id, turn_idx, text || ' [MERGED]' AS text
            FROM state WHERE turn_idx % 7 = 2
            UNION ALL
            SELECT DISTINCT conv_id, CAST(8888 AS INTEGER) AS turn_idx,
                   'merged row' AS text
            FROM state
        )
        SELECT l.conv_id, l.turn_idx, l.role,
               CASE WHEN s.conv_id IS NOT NULL AND l.role = 'user'
                     AND s.text IS DISTINCT FROM l.text
                    THEN s.text ELSE l.text END AS text,
               l.tool,
               CASE WHEN s.conv_id IS NOT NULL AND l.role = 'user'
                     AND s.text IS DISTINCT FROM l.text
                    THEN TIMESTAMP '{merge_ts}' ELSE l.ts END AS ts
        FROM state l LEFT JOIN src s
          ON s.conv_id = l.conv_id AND s.turn_idx = l.turn_idx
        UNION ALL
        SELECT s.conv_id, s.turn_idx, CAST(NULL AS VARCHAR) AS role, s.text,
               CAST(NULL AS VARCHAR) AS tool, TIMESTAMP '{merge_ts}' AS ts
        FROM src s LEFT JOIN state l
          ON s.conv_id = l.conv_id AND s.turn_idx = l.turn_idx
        WHERE l.conv_id IS NULL
    """


EXPIRE_CUTOFF = "2025-01-01 00:07:30"  # inside the fixture's ts range


def retention_expired_lake(sf: float = 0.01):
    """Driver surface for ``CdcLake.expire_rows`` (row TTL / retention):
    replay the fixture into a fresh lake, tombstone every live row whose
    winning ts predates ``EXPIRE_CUTOFF`` through the exactly-once epoch path
    (one task per partition, no shuffle), and return the post-expiry lake."""
    lake, _ = replay(sf=sf)
    lake.expire_rows(EXPIRE_CUTOFF, SYNC_TS)
    return lake.read()


def retention_oracle_sql(sf: float = 0.01, cutoff: str = EXPIRE_CUTOFF) -> str:
    """Oracle for ``retention_expired_lake``: rows at/above the cutoff survive
    with their original ts (the tombstones only remove, never rewrite)."""
    inner = _lww_sql(_epoch_selects(sf))
    return f"SELECT * FROM ({inner}) WHERE ts >= TIMESTAMP '{cutoff}'"


_PII_SUFFIX = " reach me at bob.smith+hr@example-corp.com or +1 (415) 555-0199"


def _gapped_epoch_path(src: str) -> str:
    """Derived fixture (cached, atomic): the epoch with a deterministic
    1-in-64 slice of offsets DROPPED (``offset & 63 == 17``) — planted
    delivery gaps, since the pristine stream is gap-free and the audit would
    otherwise be vacuous. (A dropped offset whose duplicate delivery landed
    in another epoch is legitimately healed — both sides see that.)"""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    dst = src[: -len(".parquet")] + "-gapped.parquet"
    if not os.path.exists(dst):
        t = pq.read_table(src)
        keep = pc.not_equal(
            pc.bit_wise_and(t.column("offset"), pa.scalar(63, pa.int64())),
            pa.scalar(17, pa.int64()),
        )
        tmp = f"{dst}.tmp-{os.getpid()}"
        pq.write_table(t.filter(keep), tmp)
        os.replace(tmp, dst)
    return dst



def _gap_audit_paths(fx: dict) -> list[str]:
    """Epoch paths with the gap planted into epoch min(1, last) — derived
    from len(fx["paths"]) instead of hard-coding indices 2/3, so the audit
    works at any epoch count (changes_fixture defaults to 2 epochs at
    sf >= 1; the r3 advice flagged the IndexError)."""
    paths = list(fx["paths"])
    gi = min(1, len(paths) - 1)
    paths[gi] = _gapped_epoch_path(paths[gi])
    return paths


def _widened_paths(fx: dict) -> list[tuple[str, bool | None]]:
    """(path, score_arm) per epoch for the type-widening fixture: the LAST
    two epochs carry the planted score column (narrow int32 then wide
    int64); earlier epochs have none. Derived from the epoch count (same
    advice as _gap_audit_paths); a single-epoch fixture gets the wide arm
    only."""
    paths = list(fx["paths"])
    out: list[tuple[str, bool | None]] = [(p, None) for p in paths]
    if len(paths) >= 2:
        out[-2] = (_score_epoch_path(paths[-2], wide=False), False)
    out[-1] = (_score_epoch_path(paths[-1], wide=True), True)
    return out


def offset_gap_report(sf: float = 0.01, target_buckets: int | None = None):
    """Offset sequence-gap audit over the change stream — the ingest monitor
    that catches LOST events (a binlog tailer that skipped a range) before
    they silently become missing turns: every maximal run of offsets absent
    from the stream, as (gap_start, gap_end, n_missing) rows. Epoch 1 is the
    planted-gap derivative; duplicates delivered in other epochs legitimately
    heal their offsets.

    Shape: offsets range-bucketed by value (width from footer-stats max /
    ``target_buckets`` — scales with the stream, no magic constant) through
    the house split→fold exchange; each bucket task dedups + sorts its slice
    and emits intra-bucket gaps plus its (min, max) edge row; the driver
    stitches ONLY the O(buckets) edge rows into cross-bucket gaps."""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data

    fx = changes_fixture(sf)
    paths = _gap_audit_paths(fx)
    max_off = _max_offset(paths)
    if target_buckets is None:
        # bucket count grows with the offset space (≈ event count) so each
        # fold's slice stays bounded at any stream size; gaps are
        # bucket-count-invariant (stitched from O(buckets) edge rows)
        from ..blocks import adaptive_buckets

        target_buckets = adaptive_buckets(max_off, rows_per_bucket=250_000, lo=64)
    width = max(1, (max_off + target_buckets) // target_buckets)
    B = max_off // width + 1

    ds = ray.data.read_parquet(paths, columns=["offset"]).materialize()

    def _split(t: pa.Table) -> list:
        o = t.column("offset").to_numpy(zero_copy_only=False)
        b = o // width
        order = np.argsort(b, kind="stable")
        tt, sb = t.take(pa.array(order)), b[order]
        cuts = np.searchsorted(sb, np.arange(B + 1))
        return [tt.slice(cuts[i], cuts[i + 1] - cuts[i]) for i in range(B)]

    def _fold(*parts: pa.Table) -> pa.Table:
        o = np.unique(
            np.concatenate(
                [p.column("offset").to_numpy(zero_copy_only=False) for p in parts]
            )
        )
        if not len(o):
            return pa.table(
                {"lo": pa.array([], pa.int64()), "hi": pa.array([], pa.int64()),
                 "gs": pa.array([], pa.int64()), "ge": pa.array([], pa.int64())}
            )
        d = np.diff(o)
        at = np.nonzero(d > 1)[0]
        return pa.table(
            {
                "lo": pa.array([int(o[0])] + [-1] * len(at), pa.int64()),
                "hi": pa.array([int(o[-1])] + [-1] * len(at), pa.int64()),
                "gs": pa.array(
                    np.concatenate([[-1], o[at] + 1]).astype(np.int64)
                ),
                "ge": pa.array(
                    np.concatenate([[-1], o[at + 1] - 1]).astype(np.int64)
                ),
            }
        )

    split = ray.remote(num_returns=B)(_split)
    fold = ray.remote(_fold)
    cols = [split.remote(r) for r in ds.to_arrow_refs()]
    folded = ray.data.from_arrow_refs(
        [fold.remote(*[c[b] for c in cols]) for b in range(B)]
    ).to_pandas()  # O(buckets + gaps) rows — the audit's result set, not data

    gaps = folded.loc[folded["gs"] >= 0, ["gs", "ge"]].to_numpy(np.int64)
    edges = folded.loc[folded["lo"] >= 0, ["lo", "hi"]].to_numpy(np.int64)
    edges = edges[np.argsort(edges[:, 0])]
    cross = [
        (int(edges[i, 1]) + 1, int(edges[i + 1, 0]) - 1)
        for i in range(len(edges) - 1)
        if edges[i + 1, 0] - edges[i, 1] > 1
    ]
    allg = sorted([tuple(g) for g in gaps] + cross)
    return pa.table(
        {
            "gap_start": pa.array([g[0] for g in allg], pa.int64()),
            "gap_end": pa.array([g[1] for g in allg], pa.int64()),
            "n_missing": pa.array([g[1] - g[0] + 1 for g in allg], pa.int64()),
        }
    )


def offset_gap_oracle_sql(sf: float = 0.01) -> str:
    """Oracle: distinct offsets, lag adjacency, every diff > 1 is a gap."""
    fx = changes_fixture(sf)
    paths = _gap_audit_paths(fx)
    union = "\n            UNION ALL\n            ".join(
        f"SELECT \"offset\" FROM read_parquet('{p}')" for p in paths
    )
    return f"""
        WITH offs AS (
            SELECT DISTINCT "offset" FROM (
            {union}
            )
        ), adj AS (
            SELECT "offset" AS o,
                   lag("offset") OVER (ORDER BY "offset") AS prev
            FROM offs
        )
        SELECT prev + 1 AS gap_start, o - 1 AS gap_end,
               o - prev - 1 AS n_missing
        FROM adj WHERE o - prev > 1
    """


def _score_epoch_path(src: str, wide: bool) -> str:
    """Derived fixture (cached, atomic): the epoch with a ``score`` column
    planted — int32 ``offset & 1023`` when ``wide`` is False (additive
    evolution), int64 ``(offset & 1023) * 5_000_000_000`` when True (values
    beyond int32 range, so the widening is load-bearing, not a formality)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    dst = src[: -len(".parquet")] + ("-score64.parquet" if wide else "-score32.parquet")
    if not os.path.exists(dst):
        t = pq.read_table(src)
        base = pc.cast(pc.bit_wise_and(t.column("offset"), pa.scalar(1023, pa.int64())), pa.int64())
        if wide:
            score = pc.multiply(base, pa.scalar(5_000_000_000, pa.int64()))
        else:
            score = pc.cast(base, pa.int32())
        tmp = f"{dst}.tmp-{os.getpid()}"
        pq.write_table(t.append_column("score", score), tmp)
        os.replace(tmp, dst)
    return dst


_WIDENED: dict = {}


def widened_lake(sf: float = 0.01):
    """Type-widening schema evolution end to end (Delta type widening): epochs
    0-1 have no ``score``; epoch 2 introduces it as int32 (additive
    evolution); epoch 3 delivers int64 values beyond int32 range — the lake
    schema widens in place, int32 runs cast up losslessly at read, earlier
    rows serve NULL. Cached per sf."""
    if sf not in _WIDENED:
        fx = changes_fixture(sf)
        root = tempfile.mkdtemp(prefix=f"cdc-widened-sf{sf}-")
        lake = CdcLake(os.path.join(root, "lake"), num_partitions=32)
        for p, _arm in _widened_paths(fx):
            lake.apply(p)
        import pyarrow as pa

        assert lake.manifest.schema.field("score").type == pa.int64()
        _WIDENED[sf] = lake
    return _WIDENED[sf].read()


def widened_oracle_sql(sf: float = 0.01) -> str:
    """Oracle for the widened lake: the shared LWW SQL with ``score`` riding
    each arm — NULL for pre-introduction epochs, CAST to BIGINT everywhere
    (SQL has no narrow/wide distinction, which is exactly the point: the
    widened engine read must equal the always-wide relational answer)."""
    fx = changes_fixture(sf)
    paths = [
        (p, "CAST(NULL AS BIGINT)" if arm is None else "CAST(score AS BIGINT)")
        for p, arm in _widened_paths(fx)
    ]
    selects = []
    for i, (p, expr) in enumerate(paths):
        tool = "CAST(NULL AS VARCHAR) AS tool" if i == 0 else "tool"
        selects.append(
            f'SELECT "offset", op, conv_id, turn_idx, role, text, {tool}, ts, '
            f"{expr} AS score, {i} AS epoch, file_row_number AS file_rn "
            f"FROM read_parquet('{p}', file_row_number=true)"
        )
    return _lww_sql(
        selects, out_cols="conv_id, turn_idx, role, text, tool, ts, score"
    )


def _pii_epoch_path(src: str) -> str:
    """Derived fixture (cached, atomic): the epoch with PII planted into a
    deterministic ~1-in-8 sample of image-carrying events' texts — the
    fixture corpus is PII-free, so the redaction mask would otherwise be
    vacuously oracled."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    dst = src[: -len(".parquet")] + "-pii.parquet"
    if not os.path.exists(dst):
        t = pq.read_table(src)
        # plant into image-carrying events whose offset has its low 3 bits
        # set (deterministic ~1-in-8 sample, cheap to mirror anywhere)
        hit = pc.and_(
            pc.is_in(t.column("op"), value_set=pa.array(["I", "U"], pa.string())),
            pc.equal(
                pc.bit_wise_and(t.column("offset"), pa.scalar(7, pa.int64())), 7
            ),
        )
        planted = pc.if_else(
            pc.and_(hit, pc.is_valid(t.column("text"))),
            pc.binary_join_element_wise(
                t.column("text"), pa.scalar(_PII_SUFFIX, pa.string()), ""
            ),
            t.column("text"),
        )
        tmp = f"{dst}.tmp-{os.getpid()}"
        pq.write_table(
            t.set_column(t.schema.get_field_index("text"), "text", planted), tmp
        )
        os.replace(tmp, dst)
    return dst


def redacted_lake(sf: float = 0.01):
    """Driver surface for the redact mask kind: replay epochs 0-2 plus a
    PII-planted epoch 3, declare ``add_mask("text", "redact")``, and read —
    every serving read scrubs emails/phones in place (asserted non-vacuous:
    the plant guarantees matches). Oracled — the same LWW replay over the
    planted files with DuckDB's regexp_replace (both engines run RE2)."""
    import pyarrow.compute as pc

    fx = changes_fixture(sf)
    lake = CdcLake(
        os.path.join(tempfile.mkdtemp(prefix=f"redact-lake-sf{sf}-"), "lake"),
        num_partitions=32,
    )
    for p in fx["paths"][:3]:
        lake.apply(p)
    lake.apply(_pii_epoch_path(fx["paths"][3]))
    lake.add_mask("text", "redact")

    def _hits(t):
        import pyarrow as pa

        return pa.table(
            {"hits": pc.count_substring(t.column("text"), "<EMAIL>").cast(pa.int64())}
        )

    n_hits = lake.read().map_batches(_hits, batch_format="pyarrow").sum("hits")
    assert n_hits and n_hits > 0, "redaction plant missed"
    return lake.read()


def redacted_oracle_sql(sf: float = 0.01) -> str:
    """Oracle for ``redacted_lake``: the LWW replay over epochs 0-2 + the
    planted epoch-3 FILE (oracle and engine read the same derived bytes),
    then the same two regexp_replace passes over the winning text."""
    from ..stages.text import PII_EMAIL_RE, PII_PHONE_RE

    fx = changes_fixture(sf)
    selects = _epoch_selects(sf)
    pii = _pii_epoch_path(fx["paths"][3])
    selects[3] = (
        f'SELECT "offset", op, conv_id, turn_idx, role, text, tool, ts, '
        f"3 AS epoch, file_row_number AS file_rn "
        f"FROM read_parquet('{pii}', file_row_number=true)"
    )
    inner = _lww_sql(selects)
    return f"""
        SELECT conv_id, turn_idx, role,
               regexp_replace(
                   regexp_replace(text, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
                   '{PII_PHONE_RE}', '<PHONE>', 'g') AS text,
               tool, ts
        FROM ({inner})
    """


def dedup_index_lake(sf: float = 0.01):
    """Driver surface for the incrementally-maintained exact-dedup index
    (``state/views.py: sync_dedup_index``): replay the fixture, fold each
    epoch's change feed (with pre-images) into member-grain postings of a
    derived lake, and serve the keeper table (first member + copy count per
    distinct live text). Per-epoch work O(changed rows), never O(lake)."""
    from ..state.views import read_dedup_keepers, sync_dedup_index

    src = replayed_lake(sf)
    dst = CdcLake(
        os.path.join(tempfile.mkdtemp(prefix="dedup-idx-"), "lake"),
        num_partitions=16,
    )
    sync_dedup_index(src, dst)
    return read_dedup_keepers(dst)


def dedup_index_oracle_sql(sf: float = 0.01) -> str:
    """Oracle for ``dedup_index_lake``: the keeper table derived from scratch
    — GROUP BY md5(text) over the converged LWW state, min (conv, turn)
    member, copy count; null-text rows carry no posting."""
    inner = _lww_sql(_epoch_selects(sf))
    return f"""
        WITH st AS ({inner}), h AS (
            SELECT md5(text) AS text_md5, conv_id, turn_idx
            FROM st WHERE text IS NOT NULL
        )
        SELECT text_md5, conv_id AS keeper_conv,
               CAST(turn_idx AS BIGINT) AS keeper_turn, n_copies
        FROM (
            SELECT text_md5, conv_id, turn_idx,
                   CAST(count(*) OVER (PARTITION BY text_md5) AS BIGINT) AS n_copies,
                   row_number() OVER (
                       PARTITION BY text_md5 ORDER BY conv_id, turn_idx) AS rn
            FROM h
        ) WHERE rn = 1
    """


_DUP_CONVS = ("conv-00000001", "conv-00000002", "conv-00000003")


_PLANTED: dict = {}


def _planted_dup_lake(sf: float = 0.01):
    """Replay the fixture, then clone three conversations' live turns under
    ``<id>-dup`` keys (fresh offsets, ordinary I events — the fixture has no
    natural near-dups, so the plant keeps both near-dup oracles non-vacuous).
    Shared fixture arm for the scratch AND index-served near-dup surfaces —
    process-lifetime cached like ``replayed_lake``: every consumer (near-dup
    groups, the three index entries, semantic search) only READS it or syncs
    a separate derived lake from it, so one plant serves all five."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    if sf in _PLANTED:
        return _PLANTED[sf]
    lake, _ = replay(sf=sf)
    src = (
        lake.lookup_many(list(_DUP_CONVS))
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    ev = src.copy()
    ev["conv_id"] = ev["conv_id"] + "-dup"
    ev.insert(0, "op", "I")
    ev.insert(0, "offset", 30_000_000 + np.arange(len(ev), dtype=np.int64))
    lake.apply(
        ray.data.from_arrow(
            pa.Table.from_pandas(
                ev[["offset", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"]],
                preserve_index=False,
            )
        )
    )
    _PLANTED[sf] = lake
    return lake


# The dedup stages key documents by int64 ids (sig matrices, union-find).
# The fixture's id grammar (conv-%08d[-dup]) admits an ORDER-PRESERVING int
# codec — num·2 + dup_flag — so min-id group labels decode to exactly the SQL
# oracle's least(conv_id). A deployment with opaque string ids would
# dense-rank them first (one sort) instead.
def _encode_conv_ids(s: "pd.Series") -> "pd.Series":
    num = s.str.slice(5, 13).astype("int64")
    return num * 2 + s.str.endswith("-dup").astype("int64")


def _decode_conv_col(col: pd.Series) -> pd.Series:
    base = (col // 2).map("conv-{:08d}".format)
    return base.where(col % 2 == 0, base + "-dup")


def _decode_groups(groups):
    import pyarrow as pa

    def _decode(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "conv_id": _decode_conv_col(df["doc_id"]),
                "dup_group": _decode_conv_col(df["dup_group"]),
            }
        )

    if isinstance(groups, pa.Table):  # driver union-find path (small pair set)
        return pa.Table.from_pandas(_decode(groups.to_pandas()), preserve_index=False)
    return groups.map_batches(_decode, batch_format="pandas")


def near_dup_convs_lake(sf: float = 0.01):
    """Conversation-grain near-dup detection over the lake — the lake→curation
    bridge: plant clones (``_planted_dup_lake``), assemble SFT documents (one
    task per partition, no shuffle), then run the MinHash+LSH → exact-verify
    → connected-components near-dup pipeline over the conversation texts.
    Oracled — the all-pairs shingle-Jaccard + recursive-closure SQL over the
    same converged state with the same clone arm."""
    import pyarrow as pa

    from ..stages.dedup import dup_groups, verified_near_dup_pairs

    lake = _planted_dup_lake(sf=sf)

    def _encode(t: pa.Table) -> pa.Table:
        doc = _encode_conv_ids(t.column("conv_id").to_pandas())
        return pa.table({"doc_id": doc.to_numpy(), "text": t.column("sft_text")})

    docs = lake.assemble_conversations().map_batches(
        _encode, batch_format="pyarrow"
    )
    groups = dup_groups(verified_near_dup_pairs(docs, jaccard_threshold=0.8))
    return _decode_groups(groups)


def minhash_index_near_dups(sf: float = 0.01):
    """Near-dup groups served from the INCREMENTALLY-MAINTAINED MinHash
    signature index (``state/views.py:sync_minhash_index``): the planted lake
    syncs per-epoch signature upserts into a derived index lake (dirty-key
    recompute via as-of point lookups — O(changed conversations) per epoch,
    never a rescan), then candidate generation runs off the STORED signatures
    (``minhash_candidates(sigs=…)``); only the exact-Jaccard verify touches
    conversation texts. Same hasher seeds and thresholds as the scratch
    pipeline, so the groups — and the oracle — are identical to
    ``cdc_near_dup_convs``."""
    import tempfile

    import pyarrow as pa

    from ..state.engine import CdcLake
    from ..state.views import read_minhash_sigs, sync_minhash_index
    from ..stages.dedup import dup_groups, verified_near_dup_pairs

    lake = _planted_dup_lake(sf=sf)
    dst = CdcLake(
        tempfile.mkdtemp(prefix="minhash-index-") + "/index", num_partitions=8
    )
    sync_minhash_index(lake, dst)

    def _encode_sig(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": _encode_conv_ids(df["conv_id"]).to_numpy(),
                "sig": df["sig"].to_numpy(),
            }
        )

    sigs = read_minhash_sigs(dst).map_batches(_encode_sig, batch_format="pandas")

    def _encode(t: pa.Table) -> pa.Table:
        doc = _encode_conv_ids(t.column("conv_id").to_pandas())
        return pa.table({"doc_id": doc.to_numpy(), "text": t.column("sft_text")})

    docs = lake.assemble_conversations().map_batches(
        _encode, batch_format="pyarrow"
    )
    groups = dup_groups(
        verified_near_dup_pairs(docs, jaccard_threshold=0.8, sigs=sigs)
    )
    return _decode_groups(groups)


def _planted_asm_ctes(sf: float) -> str:
    """Shared oracle CTE prefix: converged LWW state + the ``-dup`` clone arm
    → per-conversation SFT assembly (``asm(conv_id, sft_text)``) — the SQL
    twin of ``_planted_dup_lake`` + ``assemble_conversations``."""
    ids = ", ".join(f"'{c}'" for c in _DUP_CONVS)
    inner = _lww_sql(_epoch_selects(sf))
    return f"""base AS ({inner}), full_st AS (
            SELECT conv_id, turn_idx, role, text FROM base
            UNION ALL
            SELECT conv_id || '-dup', turn_idx, role, text
            FROM base WHERE conv_id IN ({ids})
        ), asm AS (
            SELECT conv_id,
                   string_agg(
                       coalesce(role, '') || ': ' || coalesce(text, ''),
                       chr(10) ORDER BY turn_idx
                   ) AS sft_text
            FROM full_st GROUP BY conv_id
        )"""


def near_dup_convs_oracle_sql(sf: float = 0.01) -> str:
    """Oracle for ``near_dup_convs_lake``: converged LWW state + the same
    clone arm → SFT assembly in SQL → the all-pairs trigram-shingle Jaccard
    recursive closure (``MINHASH_GROUPS_CTES`` — its ``documents`` CTE name
    shadows the registered view)."""
    from .analytics import MINHASH_GROUPS_CTES

    return f"""
        WITH RECURSIVE {_planted_asm_ctes(sf)}, documents AS (
            SELECT conv_id AS doc_id, sft_text AS text FROM asm
        ), {MINHASH_GROUPS_CTES}
        SELECT node AS conv_id, least(node, min(x)) AS dup_group
        FROM reach GROUP BY node
    """


_ANN_DIM, _ANN_OUT_DIM, _ANN_SEED, _ANN_SALT = 64, 8, 29, "ann"

_ANN_INDEX: dict = {}


def _ann_index_for(sf: float):
    """One synced sketch index per sf (process-lifetime cache, like
    ``_PLANTED``): the three ANN entries (index read, near-dup groups,
    semantic search) all consume the SAME maintained index read-only, so one
    sync serves them all."""
    import tempfile

    from ..state.engine import CdcLake
    from ..state.views import sync_ann_index

    if sf not in _ANN_INDEX:
        lake = _planted_dup_lake(sf=sf)
        dst = CdcLake(
            tempfile.mkdtemp(prefix="ann-index-") + "/index", num_partitions=8
        )
        sync_ann_index(
            lake, dst, dim=_ANN_DIM, out_dim=_ANN_OUT_DIM,
            seed=_ANN_SEED, salt=_ANN_SALT,
        )
        _ANN_INDEX[sf] = dst
    return _ANN_INDEX[sf]


def ann_index_lake(sf: float = 0.01):
    """The INCREMENTALLY-MAINTAINED embedding-sketch index off the CDC lake
    (``state/views.py:sync_ann_index`` — the semantic sibling of the minhash
    index, r4 VERDICT Next #6): per-epoch dirty-conversation sketch upserts
    (as-of point lookups, O(changed convs)/epoch) into a derived lake, read
    back as the long-format ``(conv_id, proj_idx, value)`` sketch table.
    Oracled — hashed-token counts × the seeded sign matrix over the SAME
    converged SFT assembly in SQL, bit-exact (all-integer after hashing)."""
    from ..state.views import read_ann_sketch

    return read_ann_sketch(_ann_index_for(sf), out_dim=_ANN_OUT_DIM)


_ANN_QUERY = "assistant: turn text 17 / 3 @4242 lorem ipsum dolor sit amet"


def ann_search_index(dst, query: str, k: int = 20):
    """Serving half of ``ann_search_lake``: rank an ALREADY-SYNCED sketch
    index against a query text. One O(1) driver-side query sketch, a
    map-only integer-cosine pass with per-batch partial top-k, one
    tree-reduced k-row result."""
    import numpy as np

    from ..blocks import topk_kernel, tree_reduce
    from ..state.views import _ann_hexsigs

    params = {
        "dim": _ANN_DIM, "out_dim": _ANN_OUT_DIM,
        "seed": _ANN_SEED, "salt": _ANN_SALT,
    }
    q = np.frombuffer(
        bytes.fromhex(_ann_hexsigs(np.array([query], dtype=object), params)[0]),
        dtype="<i8",
    ).astype(np.float64)
    qn = float(np.dot(q, q))
    if qn == 0.0:
        # a zero query sketch has no cosine direction — NaN/inf scores cast
        # to garbage int64 silently; refuse loudly instead
        raise ValueError(
            "ann_search: the query text sketches to the zero vector — "
            "cosine ranking is undefined for it"
        )

    def score(df: pd.DataFrame, q=q, qn=qn, k=k) -> pd.DataFrame:
        M = (
            np.stack(
                [np.frombuffer(bytes.fromhex(h), dtype="<i8") for h in df["sig_hex"]]
            ).astype(np.float64)
            if len(df)
            else np.zeros((0, len(q)))
        )
        nrm = (M * M).sum(axis=1)
        keep = nrm > 0.0
        # dot / sqrt(qn) / sqrt(nc) — the SQL mirror's exact operand order
        cos = (M[keep] @ q) / np.sqrt(qn) / np.sqrt(nrm[keep])
        out = pd.DataFrame(
            {
                "conv_id": df["conv_id"].to_numpy()[keep],
                "cosine_pm": np.floor(cos * 1000.0 + 0.5).astype(np.int64),
            }
        )
        return out.sort_values(
            ["cosine_pm", "conv_id"], ascending=[False, True], kind="stable"
        ).head(k)

    partial = dst.read(columns=["sig_hex"]).map_batches(
        score, batch_format="pandas"
    )
    top = tree_reduce(
        partial,
        topk_kernel(
            ["cosine_pm", "conv_id"], [False, True], k, str_cols=("conv_id",)
        ),
    ).to_pandas()
    top.insert(0, "rank", np.arange(1, len(top) + 1, dtype=np.int64))
    return top[["rank", "conv_id", "cosine_pm"]]


def ann_search_lake(sf: float = 0.01, query: str = _ANN_QUERY, k: int = 20):
    """SEMANTIC ranked retrieval served from the maintained sketch index —
    the embedding twin of ``token_search``: the query text runs through the
    SAME deterministic sketch kernel (one driver-side call, O(1)), then one
    map-only pass scores every stored conversation sketch by integer cosine
    (exact int dot/norms; float64 sqrt/divide correctly rounded both
    engines) with per-batch partial top-k under (cosine_pm DESC, conv_id
    ASC), merged by ``blocks.tree_reduce`` — no shuffle, no corpus
    re-embedding, driver sees ONE k-row table. Returns (rank, conv_id,
    cosine_pm); zero-norm sketches are unrankable and excluded."""
    return ann_search_index(_ann_index_for(sf), query, k=k)


def ann_search_oracle_sql(
    sf: float = 0.01, query: str = _ANN_QUERY, k: int = 20
) -> str:
    """Oracle for ``ann_search_lake``: sketches from scratch, the QUERY's
    sketch inlined as a VALUES relation (deterministic from the query text),
    integer-cosine scoring, row_number ranking under the shared total order."""
    import numpy as np

    from ..state.views import _ann_hexsigs

    params = {
        "dim": _ANN_DIM, "out_dim": _ANN_OUT_DIM,
        "seed": _ANN_SEED, "salt": _ANN_SALT,
    }
    q = np.frombuffer(
        bytes.fromhex(_ann_hexsigs(np.array([query], dtype=object), params)[0]),
        dtype="<i8",
    )
    qn = int(np.dot(q.astype(object), q.astype(object)))
    qrows = ", ".join(f"({j}, {int(q[j])})" for j in range(_ANN_OUT_DIM))
    return f"""
        WITH {_ann_sketch_ctes(sf)}, q(proj_idx, qv) AS (
            VALUES {qrows}
        ), nrm AS (
            SELECT conv_id, CAST(sum(value * value) AS BIGINT) AS n2
            FROM sk GROUP BY 1
        ), dots AS (
            SELECT sk.conv_id, CAST(sum(sk.value * q.qv) AS BIGINT) AS dot
            FROM sk JOIN q ON q.proj_idx = sk.proj_idx
            GROUP BY 1
        ), scored AS (
            SELECT d.conv_id,
                   CAST(floor(CAST(d.dot AS DOUBLE)
                              / sqrt(CAST({qn} AS DOUBLE))
                              / sqrt(CAST(n.n2 AS DOUBLE))
                              * 1000.0 + 0.5) AS BIGINT) AS cosine_pm
            FROM dots d JOIN nrm n ON n.conv_id = d.conv_id
            WHERE n.n2 > 0
        )
        SELECT CAST(row_number() OVER (
                   ORDER BY cosine_pm DESC, conv_id) AS BIGINT) AS rank,
               conv_id, cosine_pm
        FROM scored
        ORDER BY cosine_pm DESC, conv_id
        LIMIT {k}
    """


def _ann_token_bucket_sql(tok_expr: str) -> str:
    """md5 first-13-hex % dim of ``salt || token`` — the dsir/_permille_sql
    52-bit parse, so DuckDB reproduces ``_ann_hexsigs``'s bucketing."""
    return (
        f"list_reduce(list_transform(range(1, 14), "
        f"i -> CAST(strpos('0123456789abcdef', substr(md5('{_ANN_SALT}' || "
        f"{tok_expr}), CAST(i AS INT), 1)) AS BIGINT) - 1), "
        f"(a, b) -> a * 16 + b) % {_ANN_DIM}"
    )


def _ann_sketch_ctes(sf: float) -> str:
    """Oracle CTE chain ending in ``sk(conv_id, proj_idx, value)`` — the SQL
    twin of the maintained sketch: SFT assembly → single-space token split →
    hashed-bucket counts → seeded sign-matrix projection (integer SUM)."""
    from ..stages.similarity import rp_sign_planes

    R = rp_sign_planes(_ANN_DIM, _ANN_OUT_DIM, _ANN_SEED)
    rows = ", ".join(
        f"({j}, {i}, {int(R[j, i])})"
        for j in range(_ANN_OUT_DIM)
        for i in range(_ANN_DIM)
    )
    return f"""{_planted_asm_ctes(sf)}, toks AS (
            SELECT conv_id, unnest(string_split(sft_text, ' ')) AS tok FROM asm
        ), tb AS (
            SELECT conv_id, ({_ann_token_bucket_sql("tok")}) AS bucket FROM toks
        ), counts AS (
            SELECT conv_id, bucket, CAST(count(*) AS BIGINT) AS c
            FROM tb GROUP BY 1, 2
        ), planes(proj_idx, dim_idx, s) AS (
            VALUES {rows}
        ), sk AS (
            SELECT c.conv_id, CAST(p.proj_idx AS BIGINT) AS proj_idx,
                   CAST(sum(c.c * p.s) AS BIGINT) AS value
            FROM counts c JOIN planes p ON p.dim_idx = c.bucket
            GROUP BY 1, 2
        )"""


def ann_index_oracle_sql(sf: float = 0.01) -> str:
    """Oracle for ``ann_index_lake``: the sketch table derived from scratch
    over the converged state + clone arm."""
    return f"""
        WITH {_ann_sketch_ctes(sf)}
        SELECT conv_id, proj_idx, value FROM sk
    """


def ann_index_near_dups(sf: float = 0.01, threshold_pm: int = 999):
    """SEMANTIC near-dup groups served from the maintained sketch index —
    ``cdc_semantic_near_dup_convs`` without re-embedding the corpus: stored
    sketches bucket by their 8-bit SIGN pattern (hyperplane LSH for free —
    identical sketches always collide), per-bucket pairwise integer-cosine ≥
    ``threshold_pm`` permille, then the shared least-id closure. Cosine =
    floor(dot/√na/√nb·1000+0.5) with exact integer dot/norms (float64 sqrt
    and divide are correctly rounded in both numpy and DuckDB), so the
    approximate answer itself is oracled. The default threshold is TIGHT
    (999‰): 8-dim sketches of short templated texts correlate heavily, and a
    looser cut (990‰ admits ~6× the pairs on this fixture) floods the
    closure with sketch-level false positives — a deployment doing real
    semantic dedup would raise ``out_dim`` and drop the threshold."""
    import numpy as np
    import ray.data  # noqa: F401

    from ..stages.dedup import dup_groups

    dst = _ann_index_for(sf)
    od = _ANN_OUT_DIM

    def _vecrows(df: pd.DataFrame) -> pd.DataFrame:
        vals = (
            np.stack(
                [
                    np.frombuffer(bytes.fromhex(h), dtype="<i8")
                    for h in df["sig_hex"]
                ]
            )
            if len(df)
            else np.zeros((0, od), np.int64)
        )
        cols = {"doc_id": _encode_conv_ids(df["conv_id"]).to_numpy()}
        for j in range(od):
            cols[f"v{j}"] = vals[:, j]
        cols["bucket"] = (vals >= 0).astype(np.int64) @ (
            np.int64(1) << np.arange(od, dtype=np.int64)
        )
        return pd.DataFrame(cols)

    vecs = dst.read(columns=["sig_hex"]).map_batches(
        _vecrows, batch_format="pandas"
    )

    def pair_kernel(grp: pd.DataFrame, od=od, thr=threshold_pm) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64")}
        )
        ids = grp["doc_id"].to_numpy(np.int64)
        M = grp[[f"v{j}" for j in range(od)]].to_numpy(np.float64)
        nrm = (M * M).sum(axis=1)  # exact: integer-valued float64 sums
        keep = nrm > 0.0
        ids, M, nrm = ids[keep], M[keep], nrm[keep]
        if len(ids) < 2:
            return empty
        order = np.argsort(ids, kind="stable")
        ids, M, nrm = ids[order], M[order], nrm[order]
        # dot / sqrt(na) / sqrt(nb) — the SQL mirror's exact operand order
        cos = (M @ M.T) / np.sqrt(nrm)[:, None] / np.sqrt(nrm)[None, :]
        pm = np.floor(cos * 1000.0 + 0.5)
        ia, ib = np.triu_indices(len(ids), k=1)
        hit = pm[ia, ib] >= thr
        return pd.DataFrame(
            {"doc_a": ids[ia[hit]], "doc_b": ids[ib[hit]]}
        )

    pairs = vecs.groupby("bucket").map_groups(pair_kernel, batch_format="pandas")
    return _decode_groups(dup_groups(pairs))


def ann_near_dups_oracle_sql(sf: float = 0.01, threshold_pm: int = 999) -> str:
    """Oracle for ``ann_index_near_dups``: sketches from scratch → sign
    buckets → per-bucket integer-cosine pairs → recursive least-id closure
    (string least == min encoded id: the conv-id codec is order-preserving)."""
    return f"""
        WITH RECURSIVE {_ann_sketch_ctes(sf)}, nrm AS (
            SELECT conv_id, CAST(sum(value * value) AS BIGINT) AS n2
            FROM sk GROUP BY 1
        ), bkt AS (
            SELECT conv_id,
                   sum(CASE WHEN value >= 0
                       THEN (CAST(1 AS BIGINT) << CAST(proj_idx AS INT))
                       ELSE 0 END) AS bucket
            FROM sk GROUP BY 1
        ), cand AS (
            SELECT a.conv_id AS ca, b.conv_id AS cb
            FROM bkt a JOIN bkt b
              ON a.bucket = b.bucket AND a.conv_id < b.conv_id
        ), dots AS (
            SELECT c.ca, c.cb, CAST(sum(x.value * y.value) AS BIGINT) AS dot
            FROM cand c
            JOIN sk x ON x.conv_id = c.ca
            JOIN sk y ON y.conv_id = c.cb AND y.proj_idx = x.proj_idx
            GROUP BY 1, 2
        ), pairs AS (
            SELECT d.ca AS doc_a, d.cb AS doc_b
            FROM dots d
            JOIN nrm na ON na.conv_id = d.ca
            JOIN nrm nb ON nb.conv_id = d.cb
            WHERE na.n2 > 0 AND nb.n2 > 0
              AND CAST(floor(CAST(d.dot AS DOUBLE)
                             / sqrt(CAST(na.n2 AS DOUBLE))
                             / sqrt(CAST(nb.n2 AS DOUBLE))
                             * 1000.0 + 0.5) AS BIGINT) >= {threshold_pm}
        ), edges AS (
            SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION ALL SELECT doc_b, doc_a FROM pairs
        ), reach(node, x) AS (
            SELECT a, b FROM edges
            UNION
            SELECT r.node, e2.b FROM reach r JOIN edges e2 ON e2.a = r.x
        )
        SELECT node AS conv_id, least(node, min(x)) AS dup_group
        FROM reach GROUP BY node
    """


WAP_AUDITS = [
    {"name": "role_domain", "column": "role", "op": "in",
     "value": ["user", "assistant", "system", "tool"]},
    {"name": "ts_present", "column": "ts", "op": "not_null"},
]


def wap_lake(sf: float = 0.01):
    """Driver surface for write-audit-publish: replay epochs 0-2 into a fresh
    lake, WAP-publish epoch 3 (clean → audits pass → merge_branch), then WAP a
    POISONED epoch (role rewritten to an out-of-domain value under fresh
    offsets) which the audit must reject — the poison never becomes visible,
    so the final state equals the plain full replay (replay_oracle_sql)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data

    fx = changes_fixture(sf)
    lake = CdcLake(
        os.path.join(tempfile.mkdtemp(prefix=f"wap-lake-sf{sf}-"), "lake"),
        num_partitions=32,
    )
    for p in fx["paths"][:3]:
        lake.apply(p)
    r1 = lake.write_audit_publish(fx["paths"][3], WAP_AUDITS)
    assert r1["published"], r1
    t = pq.read_table(fx["paths"][3])
    is_img = pc.is_in(t.column("op"), value_set=pa.array(["I", "U"], pa.string()))
    poisoned = (
        t.set_column(
            t.schema.get_field_index("offset"),
            "offset",
            pc.add(t.column("offset"), pa.scalar(10_000_000, pa.int64())),
        )
        .set_column(
            t.schema.get_field_index("role"),
            "role",
            pc.if_else(is_img, pa.scalar("robot", pa.string()), t.column("role")),
        )
    )
    r2 = lake.write_audit_publish(ray.data.from_arrow(poisoned), WAP_AUDITS)
    assert not r2["published"] and r2["violations"]["role_domain"] > 0, r2
    return lake.read()


DELETE_SPEC = {"name": "drop_tool_turns", "column": "role", "op": "==", "value": "tool"}


def deleted_where_lake(sf: float = 0.01):
    """Driver surface for ``CdcLake.delete_where`` (predicate DELETE DML):
    replay the fixture into a fresh lake, tombstone every live tool-role turn
    through the exactly-once epoch path (one task per partition, no shuffle),
    and return the post-delete lake."""
    lake, _ = replay(sf=sf)
    lake.delete_where(DELETE_SPEC, SYNC_TS)
    return lake.read()


def dv_deleted_lake(sf: float = 0.01):
    """Driver surface for ``delete_where(mode="dv")`` — Delta-style DELETION
    VECTORS: replay the fixture into a fresh lake, vector-mask every live
    tool-role turn (per-run positional ``.dv`` sidecars on hardlink-renamed
    run names; NO data bytes moved, NO events written), and return the merged
    read THROUGH the vectors. Same logical result as the tombstone mode, so
    the same oracle holds — the driver thereby exercises the masked
    per-file read path end-to-end at sf0.01."""
    lake, _ = replay(sf=sf)
    lake.delete_where(DELETE_SPEC, mode="dv")
    return lake.read()


def delete_where_oracle_sql(sf: float = 0.01, spec: dict = DELETE_SPEC) -> str:
    """Oracle for ``deleted_where_lake``: converged rows where the predicate
    is NOT definitively TRUE survive with their original ts — the engine's
    ``predicate_sql`` translation keeps both sides on one grammar."""
    from ..state.constraints import predicate_sql, validate_spec

    pred = predicate_sql(validate_spec(spec))
    inner = _lww_sql(_epoch_selects(sf))
    return f"SELECT * FROM ({inner}) WHERE NOT coalesce(({pred}), FALSE)"


UPDATE_SET = {"text": "[tool output redacted]", "tool": "redactor"}


def updated_where_lake(sf: float = 0.01):
    """Driver surface for ``CdcLake.update_where`` (predicate UPDATE DML —
    ``UPDATE lake SET text = …, tool = … WHERE role = 'tool'``): replay the
    fixture into a fresh lake, rewrite every live tool-role turn's payload
    through the exactly-once epoch path as full-image 'U' events at SYNC_TS
    (one task per partition, no shuffle), and return the post-update lake."""
    lake, _ = replay(sf=sf)
    lake.update_where(DELETE_SPEC, UPDATE_SET, SYNC_TS)
    return lake.read()


def update_where_oracle_sql(
    sf: float = 0.01, spec: dict = DELETE_SPEC, set_values: dict = UPDATE_SET
) -> str:
    """Oracle for ``updated_where_lake``: SQL UPDATE semantics over the
    converged LWW state — matching rows take the SET constants AND the
    update event's ts (it wins LWW, so the served ts is SYNC_TS); rows where
    the predicate is NULL or FALSE are untouched."""
    from ..state.constraints import predicate_sql, validate_spec

    pred = predicate_sql(validate_spec(spec))
    inner = _lww_sql(_epoch_selects(sf))

    def lit(v) -> str:
        if v is None:
            return "NULL"
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return repr(v)

    assigned = {
        c: f"CASE WHEN coalesce(({pred}), FALSE) THEN {lit(v)} ELSE {c} END"
        for c, v in set_values.items()
    }
    assigned["ts"] = (
        f"CASE WHEN coalesce(({pred}), FALSE) "
        f"THEN TIMESTAMP '{SYNC_TS}' ELSE ts END"
    )
    cols = ", ".join(
        f"{assigned[c]} AS {c}" if c in assigned else c
        for c in ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    return f"SELECT {cols} FROM ({inner})"


DIFF_DELETE_SPEC = {
    "name": "drop_system", "column": "role", "op": "==", "value": "system",
}
DIFF_SYNC_TS2 = "2025-06-02 00:00:00"
DIFF_INSERTS = [
    ("diff-new-0", 0, "user", "a brand new conversation", None),
    ("diff-new-0", 1, "assistant", "only on the diverged side", None),
    ("diff-new-1", 0, "user", "second inserted conversation", None),
]
DIFF_INSERT_TS = "2025-06-03 00:00:00"


def lake_diff(sf: float = 0.01):
    """Driver surface for ``CdcLake.diff_lake`` (anti-entropy diff between
    two replica lakes): replay the fixture twice into two independent lakes,
    diverge the second with an UPDATE (tool turns redacted), a DELETE (system
    turns dropped) and an insert-only epoch of brand-new conversations, and
    return the per-key deltas that would turn replica A into replica B —
    one task per partition, no shuffle. Oracled: the three change classes
    re-derived from the converged state in SQL."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    lake_a, _ = replay(sf=sf)
    lake_b, _ = replay(sf=sf)
    lake_b.update_where(DELETE_SPEC, UPDATE_SET, SYNC_TS)
    lake_b.delete_where(DIFF_DELETE_SPEC, DIFF_SYNC_TS2)
    base = max(lake_b.manifest.committed_offsets().values()) + 1
    ev = pa.table(
        {
            "offset": pa.array(
                [base + i for i in range(len(DIFF_INSERTS))], pa.int64()
            ),
            "op": pa.array(["I"] * len(DIFF_INSERTS), pa.string()),
            "conv_id": pa.array([r[0] for r in DIFF_INSERTS], pa.string()),
            "turn_idx": pa.array([r[1] for r in DIFF_INSERTS], pa.int32()),
            "role": pa.array([r[2] for r in DIFF_INSERTS], pa.string()),
            "text": pa.array([r[3] for r in DIFF_INSERTS], pa.string()),
            "tool": pa.array([r[4] for r in DIFF_INSERTS], pa.string()),
            "ts": pa.array(
                [pd.Timestamp(DIFF_INSERT_TS)] * len(DIFF_INSERTS),
                pa.timestamp("us"),
            ),
        }
    )
    lake_b.apply(ray.data.from_arrow(ev))
    return lake_a.diff_lake(lake_b)


def lake_diff_oracle_sql(sf: float = 0.01) -> str:
    """Oracle for ``lake_diff``: each change class re-derived from the
    converged LWW state — updates carry B's post-image (the UPDATE SET
    constants and its LWW-winning ts), deletes a null post-image, inserts the
    literal new rows."""
    inner = _lww_sql(_epoch_selects(sf))
    ins = "\n            UNION ALL\n            ".join(
        f"SELECT 'insert' AS change_type, '{cid}' AS conv_id, "
        f"CAST({ti} AS INTEGER) AS turn_idx, '{role}' AS role, "
        f"'{text}' AS text, CAST(NULL AS VARCHAR) AS tool, "
        f"TIMESTAMP '{DIFF_INSERT_TS}' AS ts"
        for cid, ti, role, text, _tool in DIFF_INSERTS
    )
    return f"""
        WITH state AS ({inner})
        SELECT 'update' AS change_type, conv_id, turn_idx, role,
               '{UPDATE_SET["text"]}' AS text, '{UPDATE_SET["tool"]}' AS tool,
               TIMESTAMP '{SYNC_TS}' AS ts
        FROM state WHERE coalesce((role = 'tool'), FALSE)
        UNION ALL
        SELECT 'delete', conv_id, turn_idx, NULL, NULL, NULL, NULL
        FROM state WHERE coalesce((role = 'system'), FALSE)
        UNION ALL
        {ins}
    """


def token_index_lake(sf: float = 0.01):
    """Driver surface for the incrementally-maintained inverted token index
    (``state/views.py: sync_token_index``): replay the fixture, then fold each
    epoch's change feed (with pre-images) into a derived postings lake as pure
    count DELTAS — no source re-scan — and return the index as a clean
    (token, conv_id, n) Dataset."""
    import tempfile

    from ..state.views import read_token_index, sync_token_index

    src = replayed_lake(sf=sf)
    dst = CdcLake(tempfile.mkdtemp(prefix="tokidx-") + "/lake", num_partitions=32)
    sync_token_index(src, dst)
    return read_token_index(dst)


def token_index_oracle_sql(sf: float = 0.01) -> str:
    """Oracle for ``token_index_lake``: the postings rebuilt from scratch by
    tokenizing the converged state in SQL — the incremental maintenance must
    agree with a full rebuild exactly."""
    inner = _lww_sql(_epoch_selects(sf))
    return f"""
        WITH state AS ({inner}),
        tok AS (
            SELECT conv_id,
                   unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS token
            FROM state WHERE text IS NOT NULL
        )
        SELECT token, conv_id, count(*) AS n
        FROM tok WHERE token <> ''
        GROUP BY token, conv_id
    """


_SEARCH_TERMS = ("turn", "text", "17")


def token_search(sf: float = 0.01, terms: tuple = _SEARCH_TERMS, k: int = 25):
    """Ranked retrieval SERVED FROM the maintained token index (never the
    lake): conversations scored by their summed postings count over the query
    terms, top-k under (score DESC, conv_id ASC). One map-only filter over
    the postings + a tiny per-block partial-top-k combine — the payoff of
    keeping the index in sync instead of rescanning transcripts per query."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..state.views import read_token_index, sync_token_index

    src = replayed_lake(sf)
    dst = CdcLake(tempfile.mkdtemp(prefix="tokidx-q-") + "/lake", num_partitions=32)
    sync_token_index(src, dst)
    idx = read_token_index(dst)

    term_arr = list(terms)

    def score(t: pa.Table) -> pa.Table:
        hit = t.filter(
            pc.is_in(t.column("token"), value_set=pa.array(term_arr, pa.string()))
        )
        df = hit.select(["conv_id", "n"]).to_pandas()
        agg = df.groupby("conv_id", sort=True, as_index=False)["n"].sum()
        return pa.table(
            {
                "conv_id": pa.array(agg["conv_id"], pa.string()),
                "score": pa.array(agg["n"].to_numpy("int64"), pa.int64()),
            }
        )

    partial = idx.map_batches(score, batch_format="pyarrow").repartition(1)

    def final(t: pa.Table) -> pa.Table:
        df = t.to_pandas().groupby("conv_id", sort=True, as_index=False)["score"].sum()
        df = df.sort_values(
            ["score", "conv_id"], ascending=[False, True], kind="stable"
        ).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    return partial.map_batches(final, batch_format="pyarrow")


def token_search_oracle_sql(
    sf: float = 0.01, terms: tuple = _SEARCH_TERMS, k: int = 25
) -> str:
    """Oracle for ``token_search``: the from-scratch postings (token index
    oracle CTEs) filtered to the query terms, summed per conversation, ranked
    under the same total order."""
    inner = _lww_sql(_epoch_selects(sf))
    in_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
        WITH state AS ({inner}),
        tok AS (
            SELECT conv_id,
                   unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS token
            FROM state WHERE text IS NOT NULL
        )
        SELECT conv_id, CAST(count(*) AS BIGINT) AS score
        FROM tok WHERE token IN ({in_list})
        GROUP BY conv_id
        ORDER BY score DESC, conv_id ASC
        LIMIT {k}
    """


def debezium_fixture_paths(sf: float = 0.01) -> list[str]:
    """Re-encode (once, atomically) each fixture epoch as Debezium-style JSONL
    so the JSON ingest path replays the SAME events as the parquet path."""
    import pyarrow.parquet as pq

    from ..sources.binlog_json import changes_to_debezium_jsonl

    fx = changes_fixture(sf)
    out_dir = os.path.join(FIXTURE_ROOT, f"debezium-sf{sf}")
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, p in enumerate(fx["paths"]):
        dst = os.path.join(out_dir, f"epoch-{i}.jsonl")
        if not os.path.exists(dst):
            changes_to_debezium_jsonl(pq.read_table(p), dst)
        paths.append(dst)
    return paths


def debezium_replayed_lake(sf: float = 0.01):
    """Driver surface for the Debezium-JSONL ingest source: decode each
    epoch's JSON envelope tail (op c/u/d, before/after images, binlog pos)
    with vectorized pyarrow kernels and replay it through the normal
    exactly-once apply path. The converged state must equal the parquet
    replay byte-for-byte, so the oracle is the plain replay oracle."""
    import tempfile

    import pyarrow.parquet as pq

    from ..sources.binlog_json import read_debezium_jsonl

    fx = changes_fixture(sf)
    lake = CdcLake(tempfile.mkdtemp(prefix="dbz-") + "/lake", num_partitions=32)
    for pq_path, jl in zip(fx["paths"], debezium_fixture_paths(sf)):
        lake.apply(read_debezium_jsonl(jl, schema=pq.read_schema(pq_path)))
    return lake.read()


def lookup_oracle_sql(sf: float, conv_id: str) -> str:
    """Oracle for ``CdcLake.lookup``: the converged state filtered to one
    conversation."""
    inner = _lww_sql(_epoch_selects(sf))
    return f"SELECT * FROM ({inner}) WHERE conv_id = '{conv_id}'"


def lookup_many_oracle_sql(sf: float, suffix: str) -> str:
    """Oracle for ``CdcLake.lookup_many`` over every conversation whose id
    ends in ``suffix``: the converged state filtered the slow way — the
    engine must agree while visiting only the owner partitions."""
    inner = _lww_sql(_epoch_selects(sf))
    return f"SELECT * FROM ({inner}) WHERE conv_id LIKE '%{suffix}'"


def change_feed_oracle_sql(sf: float, from_epoch: int, to_epoch: int) -> str:
    """Oracle for ``CdcLake.change_feed``: FULL OUTER JOIN of the two prefix
    states on the key, null-safe payload comparison, post-image output
    (deletes carry nulls) — the CDF semantics in ANSI SQL."""
    a = _lww_sql(_epoch_selects(sf, upto=from_epoch))
    b = _lww_sql(_epoch_selects(sf, upto=to_epoch))
    return f"""
        WITH state_a AS ({a}), state_b AS ({b})
        SELECT CASE WHEN a.conv_id IS NULL THEN 'insert'
                    WHEN b.conv_id IS NULL THEN 'delete'
                    ELSE 'update' END AS change_type,
               coalesce(a.conv_id, b.conv_id) AS conv_id,
               coalesce(a.turn_idx, b.turn_idx) AS turn_idx,
               b.role AS role, b.text AS text, b.tool AS tool, b.ts AS ts
        FROM state_a a FULL OUTER JOIN state_b b
          ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
        WHERE a.conv_id IS NULL OR b.conv_id IS NULL
           OR a.role IS DISTINCT FROM b.role
           OR a.text IS DISTINCT FROM b.text
           OR a.tool IS DISTINCT FROM b.tool
           OR a.ts   IS DISTINCT FROM b.ts
    """


def redelivered_lake(sf: float = 0.01):
    """At-least-once producer simulation: full replay, then RE-DELIVER epochs
    1-2's event files under NEW epoch ids (a retry after a lost ack — the
    epoch-skip guard doesn't apply, so dedup must come from the per-partition
    offset checkpoints). Every redelivered row is deduped (asserted here) and
    the converged state must equal the plain replay oracle."""
    fx = changes_fixture(sf)
    lake = CdcLake(
        os.path.join(tempfile.mkdtemp(prefix="cdc-redeliver-"), "lake"),
        num_partitions=32,
    )
    for p in fx["paths"]:
        lake.apply(p)
    base = lake.manifest.last_epoch
    for i, p in enumerate(fx["paths"][1:3]):
        m = lake.apply(p, epoch=base + 1 + i)
        assert m["events_deduped"] == m["events_in"], m
    return lake


# -- patch mode (partial-image upserts) ---------------------------------------

PATCH_EVENTS, PATCH_CONVS, PATCH_SEED = 20_000, 800, 63
PATCH_EPOCHS, PATCH_FRAC = 3, 0.45


def patch_fixture_paths() -> list[str]:
    """Write (once) the patch-op fixture epochs (45% of updates become partial
    'P' images; epoch 0 is schema v0 without ``tool``) so the engine and the
    DuckDB oracle read the SAME bytes. tmp→replace, _DONE last."""
    import pyarrow.parquet as pq

    from ..gen import gen_changes, split_epochs

    out_dir = os.path.join(FIXTURE_ROOT, "patch")
    paths = [
        os.path.join(out_dir, f"changes-{i:05d}.parquet") for i in range(PATCH_EPOCHS)
    ]
    done = os.path.join(out_dir, "_DONE")
    if not (os.path.exists(done) and all(os.path.exists(p) for p in paths)):
        os.makedirs(out_dir, exist_ok=True)
        changes = gen_changes(
            PATCH_EVENTS, PATCH_CONVS, seed=PATCH_SEED, patch_frac=PATCH_FRAC
        )
        for i, part in enumerate(split_epochs(changes, PATCH_EPOCHS)):
            tmp = paths[i] + ".tmp"
            pq.write_table(part, tmp)
            os.replace(tmp, paths[i])
        with open(done, "w") as f:
            f.write(f"events={PATCH_EVENTS} seed={PATCH_SEED} frac={PATCH_FRAC}\n")
    return paths


_PATCHED: dict = {}


def patched_lake():
    """Replay the patch fixture into a merge_mode='patch' lake (process-lifetime
    cache, like ``replayed_lake``)."""
    if "lake" not in _PATCHED:
        lake = CdcLake(
            os.path.join(tempfile.mkdtemp(prefix="cdc-patch-"), "lake"),
            num_partitions=16,
            merge_mode="patch",
        )
        for p in patch_fixture_paths():
            lake.apply(p)
        _PATCHED["lake"] = lake
    return _PATCHED["lake"]


def _selects_for_paths_v0(paths: list[str]) -> list[str]:
    """Per-epoch-file SELECTs (epoch 0 is schema v0: ``tool`` null-injected,
    exactly as the engine's additive evolution backfills it)."""
    selects = []
    for i, p in enumerate(paths):
        tool = "CAST(NULL AS VARCHAR) AS tool" if i == 0 else "tool"
        selects.append(
            f'SELECT "offset", op, conv_id, turn_idx, role, text, {tool}, ts, '
            f"{i} AS epoch, file_row_number AS file_rn "
            f"FROM read_parquet('{p}', file_row_number=true)"
        )
    return selects


def patch_oracle_sql(upto: int | None = None) -> str:
    """DuckDB oracle for the patch-mode lake: column-level LWW in ANSI SQL.

    Per key: drop everything at/below the latest tombstone; the row exists iff
    any event survives; each payload column comes from the latest surviving
    event that SET it (full images set every column, patches only their
    non-null ones) — a per-column QUALIFY, one CTE per column. A deliberately
    different algorithm than the engine's segmented reduceat kernels AND than
    gen.oracle_patch_lake's sequential application, so three-way agreement is
    strong evidence. ``upto`` truncates to epochs ≤ upto (snapshot oracles)."""
    paths = patch_fixture_paths()
    if upto is not None:
        paths = paths[: upto + 1]
    union = "\n            UNION ALL\n            ".join(
        _selects_for_paths_v0(paths)
    )
    col_cte = """col_{c} AS (
            SELECT conv_id, turn_idx, {c} FROM live_ev
            WHERE op IN ('I', 'U') OR {c} IS NOT NULL
            QUALIFY row_number() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, "offset" DESC) = 1
        )"""
    ctes = ", ".join(col_cte.format(c=c) for c in ("role", "text", "tool"))
    return f"""
        WITH all_ev AS (
            {union}
        ), first_seen AS (
            SELECT * FROM all_ev
            QUALIFY row_number() OVER (
                PARTITION BY "offset" ORDER BY epoch, file_rn) = 1
        ), last_d AS (
            SELECT conv_id, turn_idx, ts AS d_ts, "offset" AS d_off
            FROM first_seen WHERE op = 'D'
            QUALIFY row_number() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, "offset" DESC) = 1
        ), live_ev AS (
            SELECT f.* FROM first_seen f
            LEFT JOIN last_d d USING (conv_id, turn_idx)
            WHERE f.op <> 'D'
              AND (d.d_ts IS NULL OR (f.ts, f."offset") > (d.d_ts, d.d_off))
        ), latest AS (
            SELECT conv_id, turn_idx, ts FROM live_ev
            QUALIFY row_number() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, "offset" DESC) = 1
        ), {ctes}
        SELECT l.conv_id, l.turn_idx, r.role, t.text, tl.tool, l.ts
        FROM latest l
        LEFT JOIN col_role r USING (conv_id, turn_idx)
        LEFT JOIN col_text t USING (conv_id, turn_idx)
        LEFT JOIN col_tool tl USING (conv_id, turn_idx)
    """


def patch_change_feed_oracle_sql(from_epoch: int, to_epoch: int) -> str:
    """Oracle for ``change_feed`` on the PATCH-mode lake: the CDF join over two
    column-level-LWW prefix states (each a nested patch_oracle_sql)."""
    a = patch_oracle_sql(upto=from_epoch)
    b = patch_oracle_sql(upto=to_epoch)
    return f"""
        WITH state_a AS ({a}), state_b AS ({b})
        SELECT CASE WHEN a.conv_id IS NULL THEN 'insert'
                    WHEN b.conv_id IS NULL THEN 'delete'
                    ELSE 'update' END AS change_type,
               coalesce(a.conv_id, b.conv_id) AS conv_id,
               coalesce(a.turn_idx, b.turn_idx) AS turn_idx,
               b.role AS role, b.text AS text, b.tool AS tool, b.ts AS ts
        FROM state_a a FULL OUTER JOIN state_b b
          ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
        WHERE a.conv_id IS NULL OR b.conv_id IS NULL
           OR a.role IS DISTINCT FROM b.role
           OR a.text IS DISTINCT FROM b.text
           OR a.tool IS DISTINCT FROM b.tool
           OR a.ts   IS DISTINCT FROM b.ts
    """


def change_feed_images_oracle_sql(sf: float, from_epoch: int, to_epoch: int) -> str:
    """Oracle for ``change_feed(include_preimage=True)``: the CDF join with the
    FROM side's payload surfaced as ``old_*`` (null for inserts)."""
    a = _lww_sql(_epoch_selects(sf, upto=from_epoch))
    b = _lww_sql(_epoch_selects(sf, upto=to_epoch))
    return f"""
        WITH state_a AS ({a}), state_b AS ({b})
        SELECT CASE WHEN a.conv_id IS NULL THEN 'insert'
                    WHEN b.conv_id IS NULL THEN 'delete'
                    ELSE 'update' END AS change_type,
               coalesce(a.conv_id, b.conv_id) AS conv_id,
               coalesce(a.turn_idx, b.turn_idx) AS turn_idx,
               b.role AS role, b.text AS text, b.tool AS tool, b.ts AS ts,
               a.role AS old_role, a.text AS old_text, a.tool AS old_tool,
               a.ts AS old_ts
        FROM state_a a FULL OUTER JOIN state_b b
          ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
        WHERE a.conv_id IS NULL OR b.conv_id IS NULL
           OR a.role IS DISTINCT FROM b.role
           OR a.text IS DISTINCT FROM b.text
           OR a.tool IS DISTINCT FROM b.tool
           OR a.ts   IS DISTINCT FROM b.ts
    """


def stream_oracle_sql() -> str:
    """DuckDB oracle for the streaming actor-pool ingest of the stream fixture
    (single full-schema file; same LWW/exactly-once rules)."""
    p = stream_fixture_path()
    return _lww_sql(
        [
            f'SELECT "offset", op, conv_id, turn_idx, role, text, tool, ts, '
            f"0 AS epoch, file_row_number AS file_rn "
            f"FROM read_parquet('{p}', file_row_number=true)"
        ]
    )


# -- multi-table binlog routing ----------------------------------------------

MT_EVENTS, MT_CONVS, MT_SEED, MT_EPOCHS = 20_000, 800, 55, 3

TRANSCRIPT_COLS = ["offset", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"]
META_COLS = ["offset", "op", "conv_id", "turn_idx", "title", "status", "ts"]


def multitable_fixture_path() -> str:
    """Write (once) the interleaved two-table binlog fixture so engine and
    DuckDB oracle read the SAME bytes."""
    import pyarrow.parquet as pq

    from ..gen import gen_multitable_changes

    out_dir = os.path.join(FIXTURE_ROOT, "multitable")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(
        out_dir, f"changes-{MT_EVENTS}-{MT_CONVS}-s{MT_SEED}.parquet"
    )
    if not os.path.exists(path):
        tmp = path + f".tmp.{os.getpid()}"
        pq.write_table(
            gen_multitable_changes(MT_EVENTS, MT_CONVS, seed=MT_SEED), tmp
        )
        os.replace(tmp, path)
    return path


_MT_LAKE = {}


def multitable_lake():
    """Replay the multi-table fixture once per process: the stream is split
    into epochs by offset range and routed through MultiTableLake (explicit
    per-table column sets, so neither lake carries the other's columns)."""
    import tempfile

    import pyarrow.parquet as pq
    import ray.data

    from ..state.multitable import MultiTableLake

    path = multitable_fixture_path()
    if path not in _MT_LAKE:
        t = pq.read_table(path)
        n = t.num_rows
        mt = MultiTableLake(
            tempfile.mkdtemp(prefix="mt-lake-"),
            tables={
                "transcripts": {"columns": TRANSCRIPT_COLS},
                "conv_meta": {"columns": META_COLS},
            },
            num_partitions=8,
        )
        step = (n + MT_EPOCHS - 1) // MT_EPOCHS
        for i in range(MT_EPOCHS):
            mt.apply(ray.data.from_arrow(t.slice(i * step, step)))
        _MT_LAKE[path] = mt
    return _MT_LAKE[path]


def _mt_lww_sql(table_name: str, out_cols: str) -> str:
    path = multitable_fixture_path()
    return f"""
        WITH ev AS (
            SELECT * FROM read_parquet('{path}')
            WHERE table_name = '{table_name}'
        ), winners AS (
            SELECT * FROM ev
            QUALIFY row_number() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, "offset" DESC) = 1
        )
        SELECT {out_cols} FROM winners WHERE op <> 'D'
    """


_MT_JOIN = {}


def multitable_join_lake():
    """Incrementally-maintained JOIN view over the multi-table lake:
    ``transcripts LEFT JOIN conv_meta ON conv_id``, synced after EVERY epoch
    (never rebuilt) — per-epoch work is O(touched conversations), the classic
    two-source IVM. Fresh lakes per process (the shared ``multitable_lake``
    applies all epochs at once; here the interleaving matters)."""
    import tempfile

    import pyarrow.parquet as pq
    import ray.data

    from ..state.engine import CdcLake
    from ..state.multitable import MultiTableLake
    from ..state.views import sync_join_view

    path = multitable_fixture_path()
    if path not in _MT_JOIN:
        t = pq.read_table(path)
        n = t.num_rows
        mt = MultiTableLake(
            tempfile.mkdtemp(prefix="mt-join-src-"),
            tables={
                "transcripts": {"columns": TRANSCRIPT_COLS},
                "conv_meta": {"columns": META_COLS},
            },
            num_partitions=8,
        )
        view = CdcLake(tempfile.mkdtemp(prefix="mt-join-view-"), num_partitions=8)
        step = (n + MT_EPOCHS - 1) // MT_EPOCHS
        for i in range(MT_EPOCHS):
            mt.apply(ray.data.from_arrow(t.slice(i * step, step)))
            sync_join_view(mt.lake("transcripts"), mt.lake("conv_meta"), view)
        _MT_JOIN[path] = view
    return _MT_JOIN[path]


def multitable_join_oracle_sql() -> str:
    """Oracle for the join view: converged transcripts LEFT JOIN converged
    conv_meta — the view maintained incrementally must equal the join of the
    final states."""
    tr = _mt_lww_sql("transcripts", "conv_id, turn_idx, role, text, tool, ts")
    meta = _mt_lww_sql("conv_meta", "conv_id, title, status")
    return f"""
        WITH tr AS ({tr}), meta AS ({meta})
        SELECT tr.conv_id, tr.turn_idx, tr.role, tr.text, tr.tool,
               tr.ts AS src_ts, meta.title, meta.status
        FROM tr LEFT JOIN meta USING (conv_id)
    """


def multitable_transcripts_oracle_sql() -> str:
    return _mt_lww_sql("transcripts", "conv_id, turn_idx, role, text, tool, ts")


def multitable_meta_oracle_sql() -> str:
    return _mt_lww_sql("conv_meta", "conv_id, turn_idx, title, status, ts")


# -- SCD2 history view (dbt snapshot semantics) --------------------------------


def scd2_history(sf: float = 0.01):
    """Driver surface for the SCD2 history view: replay the fixture, sync the
    append-only history store (one snapshot diff per epoch), read it back as
    versions with valid_from/valid_to/is_current. Idempotent per process —
    committed epochs skip on re-entry."""
    from ..state.history import read_history, sync_history_view

    lake = replayed_lake(sf)
    view_dir = lake.lake_dir + "-scd2"
    sync_history_view(lake, view_dir)
    return read_history(view_dir, src=lake)


def scd2_oracle_sql(sf: float = 0.01) -> str:
    """Oracle for the SCD2 history view: per-epoch prefix states (keeping
    delete winners as present=false so a deletion CLOSES its version), LAG
    change detection, LEAD validity ranges — dbt's snapshot `check` strategy
    expressed over the raw change events."""
    selects = _epoch_selects(sf)
    union = "\n            UNION ALL\n            ".join(selects)
    state_sels = []
    for e in range(len(selects)):
        state_sels.append(f"""
            SELECT {e} AS as_of, conv_id, turn_idx, role, text, tool, ts,
                   (op <> 'D') AS present
            FROM first_seen WHERE epoch <= {e}
            QUALIFY row_number() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, "offset" DESC) = 1
        """)
    states_union = "\n            UNION ALL\n            ".join(state_sels)
    return f"""
        WITH all_ev AS (
            {union}
        ), first_seen AS (
            SELECT * FROM all_ev
            QUALIFY row_number() OVER (
                PARTITION BY "offset" ORDER BY epoch, file_rn) = 1
        ), states AS (
            {states_union}
        ), flagged AS (
            SELECT *,
                   LAG(present) OVER w AS prev_present,
                   LAG(role) OVER w AS prev_role,
                   LAG(text) OVER w AS prev_text,
                   LAG(tool) OVER w AS prev_tool,
                   LAG(ts) OVER w AS prev_ts
            FROM states
            WINDOW w AS (PARTITION BY conv_id, turn_idx ORDER BY as_of)
        ), chg AS (
            SELECT * FROM flagged
            WHERE (prev_present IS NULL AND present)
               OR (prev_present IS NOT NULL AND present <> prev_present)
               OR (present AND prev_present AND (
                       role IS DISTINCT FROM prev_role
                    OR text IS DISTINCT FROM prev_text
                    OR tool IS DISTINCT FROM prev_tool
                    OR ts   IS DISTINCT FROM prev_ts))
        ), vers AS (
            SELECT conv_id, turn_idx, role, text, tool, ts, present,
                   as_of AS valid_from,
                   LEAD(as_of) OVER (
                       PARTITION BY conv_id, turn_idx ORDER BY as_of) AS valid_to
            FROM chg
        )
        SELECT conv_id, turn_idx, role, text, tool, ts,
               CAST(valid_from AS INTEGER) AS valid_from,
               CAST(valid_to AS INTEGER) AS valid_to,
               (valid_to IS NULL) AS is_current
        FROM vers WHERE present
    """


def temporal_joined(sf: float = 0.01):
    """Driver surface for the Flink-style TEMPORAL TABLE JOIN
    (``state/history.py: temporal_join``): replay the fixture, sync the SCD2
    history view, then enrich a probe stream — every key the change stream
    ever mentioned, asking for epoch ``turn_idx % num_epochs`` — with the
    dimension version valid AT that epoch. Keys absent (or deleted) at their
    probe epoch come back with NULL payload and matched=false. Only the probe
    side shuffles; the history never leaves its partition."""
    import numpy as np
    import ray.data

    from ..state.history import sync_history_view, temporal_join

    lake = replayed_lake(sf)
    view_dir = lake.lake_dir + "-scd2"
    sync_history_view(lake, view_dir)
    fx = changes_fixture(sf)
    n_epochs = len(fx["paths"])

    def add_as_of(t):
        import numpy as np
        import pyarrow as pa

        ti = t.column("turn_idx").to_numpy(zero_copy_only=False)
        return t.append_column(
            "as_of", pa.array((ti % n_epochs).astype(np.int32))
        )

    probes = ray.data.read_parquet(
        fx["paths"], columns=["conv_id", "turn_idx"]
    ).map_batches(add_as_of, batch_format="pyarrow", zero_copy_batch=True)
    return temporal_join(view_dir, probes, src=lake)


def temporal_join_oracle_sql(sf: float = 0.01) -> str:
    """Oracle for ``temporal_joined``: the converged prefix state at each
    probe's epoch (present flag keeps deletions nulling the payload), LEFT
    JOINed on (key, as_of) — SQL's point-in-time join over the same change
    events."""
    selects = _epoch_selects(sf)
    union = "\n            UNION ALL\n            ".join(selects)
    n_epochs = len(selects)
    state_sels = []
    for e in range(n_epochs):
        state_sels.append(f"""
            SELECT {e} AS as_of, conv_id, turn_idx, role, text, tool, ts,
                   (op <> 'D') AS present
            FROM first_seen WHERE epoch <= {e}
            QUALIFY row_number() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, "offset" DESC) = 1
        """)
    states_union = "\n            UNION ALL\n            ".join(state_sels)
    return f"""
        WITH all_ev AS (
            {union}
        ), first_seen AS (
            SELECT * FROM all_ev
            QUALIFY row_number() OVER (
                PARTITION BY "offset" ORDER BY epoch, file_rn) = 1
        ), probes AS (
            SELECT DISTINCT conv_id, turn_idx,
                   CAST(turn_idx % {n_epochs} AS INTEGER) AS as_of
            FROM first_seen
        ), states AS (
            {states_union}
        )
        SELECT p.conv_id, p.turn_idx, p.as_of,
               CASE WHEN s.present THEN s.role END AS role,
               CASE WHEN s.present THEN s.text END AS text,
               CASE WHEN s.present THEN s.tool END AS tool,
               CASE WHEN s.present THEN s.ts END AS ts,
               coalesce(s.present, FALSE) AS matched
        FROM probes p
        LEFT JOIN states s
          ON s.conv_id = p.conv_id AND s.turn_idx = p.turn_idx
         AND s.as_of = p.as_of
    """


# -- shallow clone --------------------------------------------------------------

_CLONED: dict = {}


def cloned_lake(sf: float = 0.01):
    """Driver surface for ``CdcLake.clone``: replay epochs 0-2 into a fresh
    source lake, shallow-clone it (metadata-only — asserted: zero data files
    under the clone before divergence), apply epoch 3 ONLY to the clone. The
    clone must then equal the full 4-epoch replay (the plain replay oracle)
    while the source stays pinned at epoch 2."""
    import glob
    import tempfile

    if sf in _CLONED:
        return _CLONED[sf].read()
    fx = changes_fixture(sf)
    root = tempfile.mkdtemp(prefix="clone-")
    src = CdcLake(os.path.join(root, "src"), num_partitions=32)
    for p in fx["paths"][:3]:
        src.apply(p)
    clone = src.clone(os.path.join(root, "clone"))
    copied = glob.glob(os.path.join(root, "clone", "data", "**", "*.parquet"),
                       recursive=True)
    assert copied == [], f"shallow clone copied data files: {copied[:3]}"
    clone.apply(fx["paths"][3])
    assert src.manifest.last_epoch == 2, "divergent apply leaked to the source"
    _CLONED[sf] = clone
    return clone.read()


_MASKED: dict = {}


def masked_lake(sf: float = 0.01):
    """Driver surface for ``CdcLake.add_mask`` (dynamic data masking): a fresh
    full replay with ``text`` hash-masked (md5 token — still joinable) and
    ``tool`` null-masked; the serving read must present exactly the masked
    converged state, which ``masked_oracle_sql`` re-derives independently."""
    import tempfile

    if sf not in _MASKED:
        lake, _metrics = replay(sf=sf, lake_dir=tempfile.mkdtemp(prefix="masked-"))
        lake.add_mask("text", "hash")
        lake.add_mask("tool", "null")
        _MASKED[sf] = lake
    return _MASKED[sf].read()


def masked_oracle_sql(sf: float = 0.01) -> str:
    """Oracle for ``masked_lake``: the plain converged state with the same
    masks applied in SQL (md5 ↔ md5, NULL ↔ NULL)."""
    inner = _lww_sql(_epoch_selects(sf))
    return f"""
        SELECT conv_id, turn_idx, role,
               md5(text) AS text,
               CAST(NULL AS VARCHAR) AS tool,
               ts
        FROM ({inner})
    """


_HOT_THRESHOLD = 0.05


def _skewed_epoch_path(src: str, conv: str = "conv-00000001", factor: int = 30) -> str:
    """Derived fixture (cached, atomic): epoch 0 with ``conv``'s events
    replicated ``factor``× under fresh offsets — a planted hot conversation
    holding a clear double-digit share of the epoch."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    dst = src[: -len(".parquet")] + f"-skew{factor}.parquet"
    if not os.path.exists(dst):
        t = pq.read_table(src)
        hot = t.filter(pc.equal(t.column("conv_id"), conv))
        max_off = pc.max(t.column("offset")).as_py()
        parts = [t]
        for i in range(factor - 1):
            off = pc.add(
                hot.column("offset"),
                pa.scalar((i + 1) * (max_off + 1), pa.int64()),
            )
            parts.append(hot.set_column(
                hot.schema.get_field_index("offset"), "offset", off
            ))
        tmp = f"{dst}.tmp-{os.getpid()}"
        pq.write_table(pa.concat_tables(parts), tmp)
        os.replace(tmp, dst)
    return dst


_HOT: dict = {}


def hot_keys_lake(sf: float = 0.01):
    """Driver surface for hot-key detection (the north rule's skew handling):
    apply a derived epoch with one planted heavy conversation under
    ``detect_hot="prepass"`` (exact per-file counts) — the manifest must
    record exactly the conv_ids whose event share meets ``hot_threshold``,
    and those conversations are salted across sub-partitions during the
    apply. Returns the recorded hot-key set as a one-column table; the SQL
    oracle re-derives it from the same derived parquet."""
    import pyarrow as pa
    import tempfile

    if sf not in _HOT:
        fx = changes_fixture(sf)
        skew = _skewed_epoch_path(fx["paths"][0])
        lake = CdcLake(
            tempfile.mkdtemp(prefix="hot-") + "/lake",
            num_partitions=16,
            hot_threshold=_HOT_THRESHOLD,
            num_salts=4,
        )
        m = lake.apply(skew, detect_hot="prepass")
        assert m["events_in"] > 0
        _HOT[sf] = pa.table(
            {"conv_id": pa.array(sorted(lake.manifest_hot_keys()), pa.string())}
        )
    return _HOT[sf]


def hot_keys_oracle_sql(sf: float = 0.01) -> str:
    """Oracle for ``hot_keys_lake``: conv_ids whose share of the derived
    epoch's events ≥ hot_threshold (the planted key's margin is wide, so the
    float comparison form cannot flip the set)."""
    fx = changes_fixture(sf)
    skew = _skewed_epoch_path(fx["paths"][0])
    return f"""
        SELECT conv_id FROM read_parquet('{skew}')
        GROUP BY conv_id
        HAVING count(*) >= {_HOT_THRESHOLD} * (
            SELECT count(*) FROM read_parquet('{skew}')
        )
        ORDER BY conv_id
    """


_EXPIRED: dict = {}


def expired_lake(sf: float = 0.01):
    """Driver surface for ``CdcLake.expire_snapshots`` + ``vacuum``: a fresh
    full replay with the version log trimmed to the CURRENT version only and
    unreferenced files reclaimed — the serving read must be byte-identical to
    the untrimmed replay (the plain oracle), while time travel below the
    horizon now raises (asserted) and fsck stays clean."""
    import tempfile

    if sf not in _EXPIRED:
        lake, _metrics = replay(sf=sf, lake_dir=tempfile.mkdtemp(prefix="expired-"))
        removed = lake.expire_snapshots(keep_last=1)
        assert removed > 0, "expected historical manifest versions to expire"
        lake.vacuum()
        try:
            lake.read_as_of(epoch=0)
            raise AssertionError("time travel below the horizon must raise")
        except KeyError:
            pass
        assert lake.fsck()["ok"]
        _EXPIRED[sf] = lake
    return _EXPIRED[sf].read()


_PURGED: dict = {}

_PURGE_CONVS = ("conv-00000003", "conv-00000007")


def purged_lake(sf: float = 0.01):
    """Driver surface for ``CdcLake.purge_key`` (GDPR erasure): a fresh full
    replay with two conversations purged — list-committed (unreadable
    everywhere immediately) AND physically rewritten out of the owner
    partition's live runs (asserted: no live run parquet holds the keys, and
    fsck stays clean after the rewrite)."""
    import tempfile

    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq

    if sf not in _PURGED:
        lake, _metrics = replay(sf=sf, lake_dir=tempfile.mkdtemp(prefix="purged-"))
        for cid in _PURGE_CONVS:
            res = lake.purge_key(cid)
            assert res["rows_removed"] > 0, res
        for f in lake.manifest.live_files():
            t = _pq.read_table(f, columns=["conv_id"])
            for cid in _PURGE_CONVS:
                assert not _pc.any(
                    _pc.equal(t.column("conv_id"), cid)
                ).as_py(), f"purged key {cid} survives in live run {f}"
        assert lake.fsck()["ok"]
        _PURGED[sf] = lake
    return _PURGED[sf].read()


def purged_oracle_sql(sf: float = 0.01) -> str:
    """Oracle for ``purged_lake``: the plain converged state minus the purged
    conversations."""
    inner = _lww_sql(_epoch_selects(sf))
    keys = ", ".join(f"'{c}'" for c in _PURGE_CONVS)
    return f"""
        SELECT * FROM ({inner}) WHERE conv_id NOT IN ({keys})
    """


_ROW_POLICY: dict = {}

_ROW_POLICY_SPEC = {
    "name": "no_system", "column": "role", "op": "!=", "value": "system",
}


def row_policy_lake(sf: float = 0.01):
    """Driver surface for ``CdcLake.add_row_filter`` (row access policies): a
    fresh full replay with system-role turns hidden from every serving read;
    the oracle re-derives the converged state and applies the same predicate
    with identical CHECK semantics (FALSE drops, NULL serves)."""
    import tempfile

    if sf not in _ROW_POLICY:
        lake, _metrics = replay(sf=sf, lake_dir=tempfile.mkdtemp(prefix="rowpol-"))
        lake.add_row_filter(dict(_ROW_POLICY_SPEC))
        _ROW_POLICY[sf] = lake
    return _ROW_POLICY[sf].read()


def row_policy_oracle_sql(sf: float = 0.01) -> str:
    """Oracle for ``row_policy_lake``: the plain converged state filtered by
    the policy predicate under CHECK semantics."""
    from ..state.constraints import predicate_sql

    inner = _lww_sql(_epoch_selects(sf))
    return f"""
        SELECT * FROM ({inner})
        WHERE ({predicate_sql(_ROW_POLICY_SPEC)}) IS NOT FALSE
    """


_BRANCH_MERGED: dict = {}


def branch_merged_lake(sf: float = 0.01):
    """Driver surface for ``CdcLake.merge_branch``: replay epochs 0-1 into a
    parent lake, shallow-clone it, DIVERGE (parent applies epoch 2, the branch
    applies epoch 3 — disjoint offset ranges, overlapping keys), then merge
    the branch back. The merged lake must equal one lake that applied all four
    epochs — the plain replay oracle — because the merge unions live runs and
    LWW merge-at-read resolves cross-branch writes exactly like same-lake
    writes."""
    import tempfile

    if sf in _BRANCH_MERGED:
        return _BRANCH_MERGED[sf].read()
    fx = changes_fixture(sf)
    root = tempfile.mkdtemp(prefix="branch-")
    parent = CdcLake(os.path.join(root, "parent"), num_partitions=32)
    for p in fx["paths"][:2]:
        parent.apply(p)
    fork_version = parent.manifest.version
    branch = parent.clone(os.path.join(root, "branch"))
    parent.apply(fx["paths"][2])
    branch.apply(fx["paths"][3])
    res = parent.merge_branch(branch, fork_version=fork_version)
    assert res["merged_runs"] > 0 and res["merged_rows"] > 0, res
    # exactly-once across the merge: checkpoints advanced to the branch's
    # offsets, so redelivering the branch's stream fully dedupes
    m = parent.apply(fx["paths"][3])
    assert m["events_deduped"] == m["events_in"] > 0, m
    _BRANCH_MERGED[sf] = parent
    return parent.read()


# -- DESCRIBE HISTORY -----------------------------------------------------------

_HISTORY_LAKE: dict = {}


def described_history(sf: float = 0.01):
    """Driver surface for ``CdcLake.describe_history``: a FRESH 4-epoch replay
    (isolated from the shared replayed lake — other entries must not add
    versions under this one) described as one row per manifest version."""
    if sf not in _HISTORY_LAKE:
        fx = changes_fixture(sf)
        # max_runs high: no auto-compaction commits, so version k+1 == APPLY of
        # epoch k and the whole history is derivable from the fixture in SQL
        lake = CdcLake(
            tempfile.mkdtemp(prefix="describe-") + "/lake",
            num_partitions=32,
            max_runs=1_000,
        )
        for p in fx["paths"]:
            lake.apply(p)
        _HISTORY_LAKE[sf] = lake
    return _HISTORY_LAKE[sf].describe_history()


def describe_history_oracle_sql(sf: float = 0.01) -> str:
    """Oracle for DESCRIBE HISTORY on a plain replay: version k+1 is the APPLY
    of epoch k; events_in = raw epoch rows, deduped = raw − first deliveries,
    upserts/deletes = first deliveries by op — all re-derived from the fixture
    files alone."""
    union = "\n            UNION ALL\n            ".join(_epoch_selects(sf))
    return f"""
        WITH all_ev AS (
            {union}
        ), first_seen AS (
            SELECT * FROM all_ev
            QUALIFY row_number() OVER (
                PARTITION BY "offset" ORDER BY epoch, file_rn) = 1
        ), applied AS (
            SELECT epoch,
                   count(*) FILTER (op <> 'D') AS upserts,
                   count(*) FILTER (op = 'D') AS deletes,
                   count(*) AS n_applied
            FROM first_seen GROUP BY epoch
        ), raw AS (
            SELECT epoch, count(*) AS events_in FROM all_ev GROUP BY epoch
        )
        SELECT CAST(r.epoch + 1 AS BIGINT) AS version,
               'APPLY' AS operation,
               CAST(r.epoch AS INTEGER) AS epoch,
               r.events_in,
               r.events_in - a.n_applied AS events_deduped,
               a.upserts, a.deletes,
               CAST(0 AS BIGINT) AS events_quarantined
        FROM raw r JOIN applied a USING (epoch)
    """


# -- training export: conversation assembly --------------------------------------


def sft_export(sf: float = 0.01):
    """Driver surface for ``CdcLake.assemble_conversations``: the replayed
    lake's conversations flattened into SFT-ready documents (role-prefixed
    turn lines in turn order, token counts) — one task per partition, no
    shuffle, because the lake is already conv-partitioned."""
    return replayed_lake(sf).assemble_conversations()


def sft_oracle_sql(sf: float = 0.01) -> str:
    """Oracle for the SFT export: string_agg ORDER BY turn_idx over the
    converged LWW state, token counts in the same single-space split grid."""
    inner = _lww_sql(_epoch_selects(sf))
    return f"""
        WITH asm AS (
            SELECT conv_id,
                   string_agg(
                       coalesce(role, '') || ': ' || coalesce(text, ''),
                       chr(10) ORDER BY turn_idx
                   ) AS sft_text,
                   CAST(count(*) AS BIGINT) AS n_turns
            FROM ({inner})
            GROUP BY conv_id
        )
        SELECT conv_id, sft_text, n_turns,
               CAST(len(string_split(sft_text, ' ')) AS BIGINT) AS n_tokens
        FROM asm
    """


WATERMARK_LAG_S = 900  # bounded out-of-orderness allowance — mirrored in the oracle


def _epoch_ts_maxes(paths) -> "list":
    """Per-epoch max ts from PARQUET FOOTER STATISTICS — zero data bytes read
    (the same stats the manifest sink records per run). One footer per file on
    the driver; at fleet scale the footer reads fan out per epoch shard, but
    they are O(row-groups) metadata either way. Falls back to a ts-pruned
    column read for a file whose writer omitted stats."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    out = []
    for p in paths:
        md = pq.ParquetFile(p).metadata
        idx = md.schema.to_arrow_schema().get_field_index("ts")
        maxes = []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                maxes = None
                break
            maxes.append(st.max)
        if maxes is None:  # stats-less writer: one pruned column scan
            out.append(pc.max(pq.read_table(p, columns=["ts"]).column("ts")).as_py())
        else:
            out.append(max(maxes))
    return out


def late_event_report(sf: float = 0.01, lag_s: int = WATERMARK_LAG_S):
    """Event-time watermark audit over the raw change stream — Flink-style
    bounded out-of-orderness: the watermark in force while epoch ``e`` arrives
    is ``max(ts over epochs < e) − lag_s``; an epoch-``e`` event is LATE iff
    its ts is below that watermark. (The lake itself applies late events fine
    — LWW keys on (ts, offset) — this is the monitoring signal a streaming
    deployment alerts on before lateness silently reorders winners.)

    Shape: pass 1 reads each epoch's max ts from parquet FOOTER statistics
    (``_epoch_ts_maxes`` — zero data rows read; falls back to a ts-only
    pruned scan when a footer lacks min/max); pass 2 tags lateness per batch
    against the scalar watermark and folds per-block (n, late) partials.
    Driver holds only O(epochs) rows. Returns (epoch, events_in,
    late_events, watermark)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    fx = changes_fixture(sf)
    paths = fx["paths"]
    ts_max = _epoch_ts_maxes(paths)
    run_max = np.maximum.accumulate(np.array(ts_max, dtype="datetime64[us]"))
    lag = np.timedelta64(lag_s, "s")

    wm_arr = run_max - lag  # wm in force AFTER each epoch

    def tagged(e: int):
        def partial(t: pa.Table) -> pa.Table:
            ts = t.column("ts").to_numpy(zero_copy_only=False)
            late = 0 if e == 0 else int((ts < wm_arr[e - 1]).sum())
            return pa.table(
                {
                    "epoch": pa.array([e], pa.int64()),
                    "n": pa.array([t.num_rows], pa.int64()),
                    "late": pa.array([late], pa.int64()),
                }
            )

        return ray.data.read_parquet(paths[e], columns=["ts"]).map_batches(
            partial, batch_format="pyarrow"
        )

    parts = [tagged(e) for e in range(len(paths))]
    pdf = parts[0].union(*parts[1:]).to_pandas()
    rows = [
        (
            e,
            int(pdf.loc[pdf["epoch"] == e, "n"].sum()),
            int(pdf.loc[pdf["epoch"] == e, "late"].sum()),
            wm_arr[e - 1] if e > 0 else None,
        )
        for e in range(len(paths))
    ]

    return pa.table(
        {
            "epoch": pa.array([r[0] for r in rows], pa.int64()),
            "events_in": pa.array([r[1] for r in rows], pa.int64()),
            "late_events": pa.array([r[2] for r in rows], pa.int64()),
            "watermark": pa.array(
                [r[3] for r in rows], pa.timestamp("us")
            ),
        }
    )


def late_event_oracle_sql(sf: float = 0.01, lag_s: int = WATERMARK_LAG_S) -> str:
    """Oracle for the watermark audit: running max ts per epoch, lagged one
    epoch, minus the allowance — same strict ``ts < watermark`` test."""
    union = "\n            UNION ALL\n            ".join(_epoch_selects(sf))
    return f"""
        WITH all_ev AS (
            {union}
        ), mx AS (
            SELECT epoch, max(ts) AS ts_max, count(*) AS events_in
            FROM all_ev GROUP BY epoch
        ), run AS (
            SELECT epoch, events_in,
                   max(ts_max) OVER (ORDER BY epoch) AS run_max
            FROM mx
        ), wmk AS (
            SELECT epoch, events_in,
                   lag(run_max) OVER (ORDER BY epoch)
                       - INTERVAL '{lag_s} seconds' AS watermark
            FROM run
        )
        SELECT CAST(w.epoch AS BIGINT) AS epoch,
               CAST(w.events_in AS BIGINT) AS events_in,
               CAST(coalesce(
                   sum(CASE WHEN e.ts < w.watermark THEN 1 ELSE 0 END), 0
               ) AS BIGINT) AS late_events,
               w.watermark
        FROM wmk w JOIN all_ev e USING (epoch)
        GROUP BY w.epoch, w.events_in, w.watermark
    """


SESSION_GAP_S = 300  # event-time session gap — mirrored in the oracle


def watermarked_sessions(
    sf: float = 0.01,
    gap_s: int = SESSION_GAP_S,
    lag_s: int = WATERMARK_LAG_S,
    num_buckets: int | None = None,
):
    """Watermark-finalized event-time sessionization of the change stream —
    the Flink session-window trigger story: a FIRST-DELIVERY event (offset
    dedup, exactly-once grain) is ADMITTED iff it is not late under the
    watermark in force when its epoch arrives (``ts >= wm[epoch-1]``; epoch 0
    has no watermark); sessions are gap-``gap_s`` islands per conversation
    over admitted events; and a session FINALIZES at the first epoch whose
    watermark passes ``ts_end + gap`` — the epoch a streaming engine would
    emit it, after which nothing can extend it. ``finalized_epoch`` is NULL
    for sessions still open at stream end.

    Shape: per-epoch max ts from parquet footer statistics
    (``_epoch_ts_maxes``, O(epochs) driver scalars, zero data rows read),
    then ONE conv-bucketed split→fold task exchange carrying only
    (offset, conv_id, ts, epoch) — dedup, admission, islands, per-session
    aggregates and the searchsorted finalization all happen inside the
    bucket's fold task."""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data

    from ..hashing import stable_hash

    fx = changes_fixture(sf)
    paths = fx["paths"]
    ts_max = _epoch_ts_maxes(paths)
    run_max = np.maximum.accumulate(np.array(ts_max, dtype="datetime64[us]"))
    wm_us = (run_max - np.timedelta64(lag_s, "s")).astype(np.int64)
    gap_us = gap_s * 1_000_000

    parts = []
    for e, p in enumerate(paths):
        ds = ray.data.read_parquet(p, columns=["offset", "conv_id", "ts"])
        parts.append(
            ds.map_batches(
                lambda t, e=e: t.append_column(
                    "epoch", pa.array(np.full(t.num_rows, e, np.int64))
                ),
                batch_format="pyarrow",
            )
        )
    ev = parts[0].union(*parts[1:]).materialize()

    # bucket count grows with the stream (a fixed count would make each fold
    # kernel's pandas frame grow linearly with the data); results are
    # bucket-count-invariant — sessions live entirely within a conversation
    from ..blocks import adaptive_buckets

    B = num_buckets if num_buckets is not None else adaptive_buckets(
        ev.count(), rows_per_bucket=250_000, lo=32
    )
    empty = pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "session_idx": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "ts_start": pa.array([], pa.timestamp("us")),
            "ts_end": pa.array([], pa.timestamp("us")),
            "finalized_epoch": pa.array([], pa.int64()),
        }
    )

    def _split(t: pa.Table) -> list:
        b = (stable_hash(t.column("conv_id")) % np.uint64(B)).astype(np.int64)
        order = np.argsort(b, kind="stable")
        tt, sb = t.take(pa.array(order)), b[order]
        cuts = np.searchsorted(sb, np.arange(B + 1))
        return [tt.slice(cuts[i], cuts[i + 1] - cuts[i]) for i in range(B)]

    def _fold(*parts: pa.Table) -> pa.Table:
        df = pa.concat_tables(parts).to_pandas()
        if not len(df):
            return empty
        # exactly-once grain: first delivery per offset; admission uses the
        # FIRST arrival's epoch. Duplicate deliveries must be identical
        # redeliveries — asserted (r3 advice: the oracle's min-per-column
        # pick coincides with keep-first only under this invariant)
        dup = df[df.duplicated("offset", keep=False)]
        if len(dup) and not dup.drop_duplicates(["offset", "conv_id", "ts"])[
            "offset"
        ].is_unique:
            # ValueError (not assert): the invariant must survive python -O
            raise ValueError("divergent duplicate deliveries")
        df = df.sort_values(["offset", "epoch"], kind="stable").drop_duplicates(
            "offset", keep="first"
        )
        ts = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        ep = df["epoch"].to_numpy(np.int64)
        admitted = (ep == 0) | (ts >= wm_us[np.maximum(ep - 1, 0)])
        # offset tiebreak: equal-ts rows straddling a break boundary need a
        # deterministic total order or session membership is ambiguous
        df = df.loc[admitted].sort_values(
            ["conv_id", "ts", "offset"], kind="stable"
        )
        if not len(df):
            return empty
        ts = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        first = df["conv_id"].ne(df["conv_id"].shift()).to_numpy()
        gaps = np.diff(ts, prepend=ts[0])
        brk = first | (gaps > gap_us)
        sg = np.cumsum(brk)  # global session id within the bucket
        g = pd.DataFrame({"conv_id": df["conv_id"].to_numpy(), "sg": sg, "ts": ts})
        base = g.groupby("conv_id", sort=False)["sg"].transform("min").to_numpy()
        g["session_idx"] = g["sg"] - base + 1
        agg = (
            g.groupby(["conv_id", "session_idx"], sort=False)
            .agg(n_events=("ts", "size"), s=("ts", "min"), e=("ts", "max"))
            .reset_index()
        )
        end_us = agg["e"].to_numpy(np.int64)
        fin = np.searchsorted(wm_us, end_us + gap_us, side="right")
        fin_col = pa.array(
            [int(f) if f < len(wm_us) else None for f in fin], pa.int64()
        )
        return pa.table(
            {
                "conv_id": pa.array(agg["conv_id"].to_numpy(dtype=object), pa.string()),
                "session_idx": pa.array(agg["session_idx"].to_numpy(np.int64)),
                "n_events": pa.array(agg["n_events"].to_numpy(np.int64)),
                "ts_start": pa.array(agg["s"].to_numpy(np.int64).view("datetime64[us]")),
                "ts_end": pa.array(agg["e"].to_numpy(np.int64).view("datetime64[us]")),
                "finalized_epoch": fin_col,
            }
        )

    split = ray.remote(num_returns=B)(_split)
    fold = ray.remote(_fold)
    cols = [split.remote(r) for r in ev.to_arrow_refs()]
    return ray.data.from_arrow_refs(
        [fold.remote(*[c[b] for c in cols]) for b in range(B)]
    )


def watermarked_sessions_oracle_sql(
    sf: float = 0.01, gap_s: int = SESSION_GAP_S, lag_s: int = WATERMARK_LAG_S
) -> str:
    """Oracle: first deliveries by min arrival epoch, the same admission test
    against the lagged running-max watermark, gaps-and-islands sessions, and
    finalization as the min epoch whose watermark strictly passes end + gap."""
    union = "\n            UNION ALL\n            ".join(_epoch_selects(sf))
    return f"""
        WITH all_ev AS (
            {union}
        ), first_del AS (
            SELECT "offset", min(epoch) AS epoch, min(conv_id) AS conv_id,
                   min(ts) AS ts
            FROM all_ev GROUP BY "offset"
        ), mx AS (
            SELECT epoch, max(ts) AS ts_max FROM all_ev GROUP BY epoch
        ), wmk AS (
            SELECT epoch,
                   max(ts_max) OVER (ORDER BY epoch)
                       - INTERVAL '{lag_s} seconds' AS wm
            FROM mx
        ), adm AS (
            SELECT f.conv_id, f.ts, f."offset"
            FROM first_del f LEFT JOIN wmk w ON w.epoch = f.epoch - 1
            WHERE f.epoch = 0 OR f.ts >= w.wm
        ), brk AS (
            -- offset tiebreak: equal-ts rows straddling a break boundary need
            -- a deterministic total order or session membership is ambiguous
            SELECT conv_id, ts, "offset",
                   CASE WHEN lag(ts) OVER (
                            PARTITION BY conv_id ORDER BY ts, "offset")
                            IS NULL
                        OR ts - lag(ts) OVER (
                            PARTITION BY conv_id ORDER BY ts, "offset")
                            > INTERVAL '{gap_s} seconds'
                        THEN 1 ELSE 0 END AS b
            FROM adm
        ), isl AS (
            SELECT conv_id, ts,
                   sum(b) OVER (PARTITION BY conv_id ORDER BY ts, "offset"
                                ROWS UNBOUNDED PRECEDING) AS session_idx
            FROM brk
        ), ses AS (
            SELECT conv_id, CAST(session_idx AS BIGINT) AS session_idx,
                   CAST(count(*) AS BIGINT) AS n_events,
                   min(ts) AS ts_start, max(ts) AS ts_end
            FROM isl GROUP BY conv_id, session_idx
        )
        SELECT s.*,
               (SELECT CAST(min(w.epoch) AS BIGINT) FROM wmk w
                WHERE w.wm > s.ts_end + INTERVAL '{gap_s} seconds'
               ) AS finalized_epoch
        FROM ses s
    """


PACK_BUDGET = 512  # tokens per packed pretraining sequence — mirrored in the oracle


def packed_sft_export(sf: float = 0.01, budget: int = PACK_BUDGET):
    """Driver surface for sequence packing (``stages/packing``): the SFT
    assembly's docs assigned to fixed token-budget bins by md5-bucketed
    next-fit in conv_id order — the step before fixed-length pretraining
    egress. One fold task per bucket; only (conv_id, n_tokens) rows move."""
    from ..stages.packing import pack_next_fit

    return pack_next_fit(sft_export(sf), "conv_id", "n_tokens", budget)


def packed_sft_oracle_sql(sf: float = 0.01, budget: int = PACK_BUDGET) -> str:
    """Oracle for packed_sft: the next-fit recurrence stepped exactly by a
    recursive CTE over the SFT oracle's (conv_id, n_tokens)."""
    from ..stages.packing import pack_next_fit_oracle_sql

    return pack_next_fit_oracle_sql(
        sft_oracle_sql(sf), "conv_id", "n_tokens", budget
    )


def merged_turns_export(sf: float = 0.01):
    """Driver surface for ``CdcLake.merged_turns``: consecutive same-role
    turns of each conversation coalesced into one message (the alternation
    repair chat corpora apply before SFT formatting) — one task per
    partition, no shuffle."""
    return replayed_lake(sf).merged_turns()


def merged_turns_oracle_sql(sf: float = 0.01) -> str:
    """Oracle for merged_turns: gaps-and-islands over the converged LWW state
    — an island breaks where the role changes (NULL-safe) between
    turn_idx-adjacent rows of a conversation."""
    inner = _lww_sql(_epoch_selects(sf))
    return f"""
        WITH st AS ({inner}), ord AS (
            SELECT *,
                   CASE WHEN lag(role) OVER (
                            PARTITION BY conv_id ORDER BY turn_idx
                        ) IS NOT DISTINCT FROM role THEN 0 ELSE 1 END AS brk
            FROM st
        ), isl AS (
            SELECT *, sum(brk) OVER (
                       PARTITION BY conv_id ORDER BY turn_idx) AS island
            FROM ord
        )
        SELECT conv_id,
               CAST(min(turn_idx) AS BIGINT) AS turn_idx,
               min(role) AS role,
               string_agg(coalesce(text, ''), chr(10) ORDER BY turn_idx) AS text,
               CAST(count(*) AS BIGINT) AS n_merged,
               max(ts) AS ts
        FROM isl
        GROUP BY conv_id, island
    """


CONTEXT_K = 4  # preceding turns per training pair — mirrored in the oracle


def context_pairs_export(sf: float = 0.01, k: int = CONTEXT_K):
    """Driver surface for ``CdcLake.context_pairs``: next-turn-prediction
    training pairs (context = up-to-k preceding ``role: text`` lines, target =
    the assistant text) — one task per partition, no shuffle."""
    return replayed_lake(sf).context_pairs(k=k)


def context_pairs_oracle_sql(sf: float = 0.01, k: int = CONTEXT_K) -> str:
    """Oracle for context_pairs: a windowed string_agg with a ROWS frame of
    the k preceding turns over the converged LWW state."""
    inner = _lww_sql(_epoch_selects(sf))
    return f"""
        WITH st AS ({inner}), lined AS (
            SELECT conv_id, turn_idx, role, text,
                   row_number() OVER (
                       PARTITION BY conv_id ORDER BY turn_idx) AS rn,
                   string_agg(
                       coalesce(role, '') || ': ' || coalesce(text, ''), chr(10)
                   ) OVER (
                       PARTITION BY conv_id ORDER BY turn_idx
                       ROWS BETWEEN {k} PRECEDING AND 1 PRECEDING) AS context
            FROM st
        )
        SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx, context,
               coalesce(text, '') AS target
        FROM lined
        WHERE role = 'assistant' AND rn > 1
    """


# -- foreign-key constraint (cross-lake referential integrity) -------------------

_FK_LAKES: dict = {}


def sft_jsonl_export(sf: float = 0.01):
    """Driver surface for ``CdcLake.export_sft_jsonl``: export the replayed
    lake's SFT assembly as sharded JSONL, then parse the shards back
    (``ray.data.read_json``) — the round trip proves the egress bytes carry
    the exact assembly, so the oracle is the SAME sft oracle."""
    import ray.data

    lake = replayed_lake(sf)
    dest = tempfile.mkdtemp(prefix="sft-jsonl-")
    m = lake.export_sft_jsonl(dest)
    assert m["rows"] > 0, m
    shards = [
        os.path.join(dest, f) for f in sorted(os.listdir(dest))
        if f.endswith(".jsonl") and os.path.getsize(os.path.join(dest, f))
    ]
    return ray.data.read_json(shards)


def _fk_pair(sf: float = 0.01):
    if sf not in _FK_LAKES:
        fx = changes_fixture(sf)
        root = tempfile.mkdtemp(prefix="fk-")
        parent = CdcLake(os.path.join(root, "parent"), num_partitions=16)
        parent.apply(fx["paths"][0])  # parent universe = epoch 0's live convs
        child = CdcLake(os.path.join(root, "child"), num_partitions=32)
        child.add_fk_constraint(
            "conv_known", "conv_id", parent.lake_dir, validate=False
        )
        for p in fx["paths"]:
            child.apply(p)
        _FK_LAKES[sf] = (parent, child)
    return _FK_LAKES[sf]


def fk_constrained_lake(sf: float = 0.01):
    """Driver surface for ``add_fk_constraint``: parent lake = epoch 0 only;
    the child replays all 4 epochs under FOREIGN KEY (conv_id) REFERENCES
    parent — I/U events for conversations the parent has never seen quarantine
    as fk:conv_known."""
    return _fk_pair(sf)[1].read()


def fk_deadletter(sf: float = 0.01):
    """The FK-constrained child's DLQ: every rejected event with its reason."""
    return _fk_pair(sf)[1].read_deadletter()


def _fk_dim_sql(sf: float) -> str:
    """The parent's live conv set (epoch-0 prefix replay) as a subquery."""
    return _lww_sql(_epoch_selects(sf, upto=0), out_cols="conv_id")


def fk_oracle_sql(sf: float = 0.01) -> str:
    """Oracle for the FK-constrained child: the plain LWW replay over only
    events that pass referential integrity (deletes exempt, like CHECK)."""
    pre = (
        "NOT (op IN ('I', 'U') AND conv_id NOT IN "
        f"(SELECT conv_id FROM ({_fk_dim_sql(sf)})))"
    )
    return _lww_sql(_epoch_selects(sf), pre_filter=pre)


def fk_dlq_oracle_sql(sf: float = 0.01) -> str:
    """Oracle for the FK child's DLQ: every I/U event whose conv_id the
    parent's live state lacks, reason fk:conv_known."""
    union = "\n            UNION ALL\n            ".join(_epoch_selects(sf))
    return f"""
        SELECT "offset", op, conv_id, turn_idx, role, text, tool, ts,
               'fk:conv_known' AS dl_reason
        FROM (
            {union}
        )
        WHERE op IN ('I', 'U') AND conv_id NOT IN
              (SELECT conv_id FROM ({_fk_dim_sql(sf)}))
    """


# -- ANALYZE TABLE ----------------------------------------------------------------


def analyzed_lake(sf: float = 0.01, k: int = 64):
    """Driver surface for ``CdcLake.analyze``: per-column exact live/null
    counts + deterministic KMV distinct estimates over the replayed lake."""
    return replayed_lake(sf).analyze(k=k)


def analyze_oracle_sql(sf: float = 0.01, k: int = 64) -> str:
    """Oracle for ANALYZE: the same md5 bottom-k estimator per column over
    the converged LWW state (same 64-bit hex grid, same (k-1)/h_k float64
    math as ``stages.sketches``)."""
    inner = _lww_sql(_epoch_selects(sf))
    parse = (
        "list_reduce(list_transform(range(1, 14), "
        "i -> CAST(strpos('0123456789abcdef', substr(hk_max, CAST(i AS INT), 1)) "
        "AS BIGINT) - 1), (a, b) -> a * 16 + b)"
    )
    den = float(16 ** 13)
    arms = []
    for c in ("conv_id", "turn_idx", "role", "text", "tool", "ts"):
        # timestamps hash their epoch-µs integer (string formats diverge)
        probe = (
            f"CAST(CAST(epoch_us({c}) AS BIGINT) AS VARCHAR)"
            if c == "ts"
            else f"CAST({c} AS VARCHAR)"
        )
        arms.append(f"""
        SELECT '{c}' AS "column",
               (SELECT count(*) FROM state) AS n_live,
               (SELECT count(*) FROM state WHERE {c} IS NULL) AS null_count,
               CAST(n AS BIGINT) AS n_sketch,
               CASE WHEN n < {k} THEN CAST(n AS DOUBLE)
                    ELSE ({k} - 1) / (({parse}) / {den}) END AS n_distinct_est
        FROM (
            SELECT count(*) AS n, max(hk) AS hk_max FROM (
                SELECT substr(md5({probe}), 1, 16) AS hk
                FROM state WHERE {c} IS NOT NULL
                GROUP BY 1 ORDER BY hk LIMIT {k}
            )
        )""")
    body = "\n        UNION ALL\n        ".join(arms)
    return f"""
        WITH state AS ({inner})
        {body}
    """


def sft_split(sf: float = 0.01, test_permille: int = 200):
    """Train/val split of the SFT export at CONVERSATION grain — the
    correctness rule an LLM pipeline must honor (splitting at turn grain
    leaks a conversation across sets). Deterministic md5-permille on conv_id,
    id-stable at any cluster size."""
    from ..stages.sampling import hash_split

    return hash_split(sft_export(sf), "conv_id", test_permille=test_permille)


def sft_split_oracle_sql(sf: float = 0.01, test_permille: int = 200) -> str:
    from ..stages.sampling import _permille_sql

    inner = sft_oracle_sql(sf)
    return f"""
        SELECT *,
               CASE WHEN {_permille_sql("conv_id", "split")} < {test_permille}
                    THEN 'test' ELSE 'train' END AS split
        FROM ({inner})
    """


def conversation_boilerplate(sf: float = 0.01, min_convs: int = 2):
    """Boilerplate-turn detection over the converged transcript lake — the
    chat-log curation signal: a turn's text is BOILERPLATE iff the identical
    text occurs in at least ``min_convs`` DISTINCT conversations (canned
    greetings, templated tool banners, repeated system disclaimers). Returns
    per-conversation curation stats: turn count, boilerplate-turn count, and
    an integer permille ratio a downstream filter thresholds on.

    Distributed shape: one map pass hashes each turn's text to md5 (unique
    texts hashed once per batch; only 32-byte hashes shuffle, never the
    texts), a (hash, conv_id) groupby dedups occurrences, a second groupby
    counts distinct conversations per hash, and the qualifying hash set —
    small by construction (texts repeated across many conversations) — is
    broadcast for the final per-conversation aggregate. Same size-gated
    broadcast posture as the curation keeper set (pipelines/curate.py)."""
    import hashlib

    import numpy as np
    import pandas as pd
    import ray
    import ray.data

    lake = replayed_lake(sf=sf)
    ds = lake.read(columns=["conv_id", "text"])

    def hash_turns(batch: pd.DataFrame) -> pd.DataFrame:
        txt = batch["text"]
        uniq = pd.Series(txt.dropna().unique(), dtype=object)
        hs = {
            t: hashlib.md5(t.encode("utf-8")).hexdigest() for t in uniq
        }
        return pd.DataFrame(
            {"conv_id": batch["conv_id"], "h": txt.map(hs)}
        )

    turns = ds.map_batches(hash_turns, batch_format="pandas").materialize()

    per_conv_hash = turns.groupby(["h", "conv_id"]).count()
    counts = per_conv_hash.groupby("h").count()
    boiler = counts.map_batches(
        lambda df: df[df["count()"] >= min_convs][["h"]].dropna(),
        batch_format="pandas",
    ).to_pandas()
    boiler_set = frozenset(boiler["h"])
    ref = ray.put(boiler_set)

    def flag(batch: pd.DataFrame) -> pd.DataFrame:
        bs = ray.get(ref)
        return pd.DataFrame(
            {
                "conv_id": batch["conv_id"],
                "n": np.ones(len(batch), np.int64),
                "b": batch["h"].isin(bs).to_numpy().astype(np.int64),
            }
        )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["sum(n)"].to_numpy().astype(np.int64)
        b = batch["sum(b)"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "conv_id": batch["conv_id"],
                "n_turns": n,
                "n_boilerplate": b,
                "boilerplate_permille": (b * 1000) // n,
            }
        )

    return (
        turns.map_batches(flag, batch_format="pandas")
        .groupby("conv_id")
        .sum(["n", "b"])
        .map_batches(finish, batch_format="pandas")
    )


def boilerplate_oracle_sql(sf: float = 0.01, min_convs: int = 2) -> str:
    """Oracle for ``conversation_boilerplate``: the same ≥min_convs distinct-
    conversation rule re-derived by SQL over the converged prefix-replay
    state (DuckDB's md5 is the identical lowercase hex of the UTF-8 text)."""
    inner = _lww_sql(_epoch_selects(sf))
    flagged = (
        "text IS NOT NULL AND md5(text) IN (SELECT h FROM boiler)"
    )
    return f"""
        WITH state AS ({inner}),
        boiler AS (
            SELECT md5(text) AS h
            FROM state WHERE text IS NOT NULL
            GROUP BY 1 HAVING count(DISTINCT conv_id) >= {min_convs}
        )
        SELECT conv_id,
               count(*) AS n_turns,
               count(*) FILTER (WHERE {flagged}) AS n_boilerplate,
               (count(*) FILTER (WHERE {flagged})) * 1000 // count(*)
                   AS boilerplate_permille
        FROM state GROUP BY conv_id
    """
