"""Deterministic synthetic transcript + CDC change-stream generator (FIXTURES.md).

Everything is seeded numpy — no external data, byte-stable across runs. The
change stream exercises every engine feature: Zipf-skewed hot conv_ids (salting),
late events and exact ts duplicates (LWW tie-break), duplicate offsets (replay
idempotence), deletes (tombstones), and a schema-v0 file without the ``tool``
column (additive schema evolution, cf. the reference's null-injection at
/root/reference/models/cleaning/int_customer360__zendesk.sql:17-19).

``oracle_lake`` is the independent trivial oracle (pandas full sort) that the
engine's converged state must equal per BASELINE.json's correctness gate.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

ROLES = np.array(["user", "assistant", "system", "tool"], dtype=object)
TOOLS = np.array(["search", "code", "browser", "calculator", None], dtype=object)

BASE_TS = np.datetime64("2025-01-01T00:00:00", "us")

# scale factor → (#conversations K, #change events N)
SF_SIZES = {
    0.001: (1_000, 10_000),
    0.01: (10_000, 100_000),
    0.1: (100_000, 2_000_000),
    # scaling-bench sizes: epochs large enough that per-epoch compute dominates
    # the fixed micro-batch pipeline floor (~1-2 s) — smaller fixtures make the
    # two-cluster-size comparison measure only that floor
    0.25: (200_000, 4_000_000),
    0.5: (300_000, 8_000_000),
    1.5: (600_000, 20_000_000),
}


def _texts(conv_k: np.ndarray, turn: np.ndarray, offsets: np.ndarray, flavor: np.ndarray) -> pa.Array:
    """Deterministic pseudo-text incl. empty strings, accents, 'Last, First'
    tokens. Built with Arrow string kernels (np.char is ~10x slower at 10^7+)."""
    import pyarrow.compute as pc

    n = len(conv_k)
    base = pc.binary_join_element_wise(
        "turn text ",
        pc.cast(pa.array(conv_k), pa.string()),
        " / ",
        pc.cast(pa.array(turn), pa.string()),
        " @",
        pc.cast(pa.array(offsets), pa.string()),
        "",
    )
    suffix = np.full(n, "", dtype=object)
    suffix[(flavor >= 2) & (flavor < 4)] = " — café naïve façade Ångström"
    suffix[(flavor >= 4) & (flavor < 6)] = " Smith, John said hello"
    suffix[flavor >= 94] = " lorem ipsum dolor sit amet " * 40  # big-payload tail
    out = pc.binary_join_element_wise(base, pa.array(suffix, pa.string()), "")
    return pc.if_else(pa.array(flavor < 2), "", out)  # empty strings


def gen_changes(
    num_events: int,
    num_convs: int,
    seed: int = 42,
    zipf_a: float = 1.2,
    max_turns: int = 64,
    p_ops: tuple[float, float, float] = (0.55, 0.35, 0.10),
    late_frac: float = 0.05,
    dup_frac: float = 0.02,
    patch_frac: float = 0.0,
) -> pa.Table:
    """One deterministic change-event table with global monotone ``offset``.

    ``patch_frac`` converts that fraction of the U events into partial-image
    'P' patches (each payload column independently kept or nulled-as-unchanged)
    for patch-mode lakes. The extra draws happen AFTER all base draws, so
    patch_frac=0 streams are bit-identical to pre-patch fixtures."""
    rng = np.random.default_rng(seed)
    conv_k = (rng.zipf(zipf_a, num_events) - 1) % num_convs
    turn = rng.integers(0, max_turns, num_events).astype(np.int32)
    # one 63-bit draw per event, bit-sliced for all categorical/mask decisions
    # (separate rng.choice/random calls dominated gen time at 10^7+ events)
    bits = rng.integers(0, 1 << 62, num_events, dtype=np.int64)
    op_pick = bits % 1000
    op = np.full(num_events, "I", dtype=object)
    op[op_pick >= int(p_ops[0] * 1000)] = "U"
    op[op_pick >= int((p_ops[0] + p_ops[1]) * 1000)] = "D"
    offsets = np.arange(num_events, dtype=np.int64)

    # event time: loosely increasing with offset, with jitter; a late fraction
    # jumps far into the past; exact-duplicate timestamps on purpose
    step_us = np.int64(1_000_0)
    jitter = ((bits >> 10) % 10_000_000) - 5_000_000
    ts_us = offsets * step_us + jitter
    late = (bits >> 34) % 1000 < int(late_frac * 1000)
    ts_us[late] -= 3_600_000_000 + ((bits[late] >> 44) % 3_600_000_000)
    dup_ts = (bits >> 54) % 100 < 3
    ts_us[dup_ts] = (ts_us[dup_ts] // 10_000_000) * 10_000_000  # collide on coarse grid
    ts = BASE_TS + ts_us.astype("timedelta64[us]")

    import pyarrow.compute as pc

    conv_id = pc.binary_join_element_wise(
        "conv-", pc.ascii_lpad(pc.cast(pa.array(conv_k), pa.string()), 8, "0"), ""
    )
    role = pa.array(ROLES[(bits >> 3) % len(ROLES)], pa.string())
    tool = pa.array(TOOLS[(bits >> 6) % len(TOOLS)], pa.string())
    text = _texts(conv_k, turn, offsets, (bits >> 24) % 100)

    is_delete = pa.array(op == "D")
    null_str = pa.scalar(None, pa.string())
    table = pa.table(
        {
            "offset": pa.array(offsets, pa.int64()),
            "op": pa.array(op, pa.string()),
            "conv_id": conv_id,
            "turn_idx": pa.array(turn, pa.int32()),
            "role": pc.if_else(is_delete, null_str, role),
            "text": pc.if_else(is_delete, null_str, text),
            "tool": pc.if_else(is_delete, null_str, tool),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
    if patch_frac > 0:
        pbits = rng.integers(0, 1 << 62, num_events, dtype=np.int64)
        to_patch = pa.array((op == "U") & ((pbits % 1000) < int(patch_frac * 1000)))
        null_s = pa.scalar(None, pa.string())
        cols = {}
        for i, c in enumerate(("role", "text", "tool")):
            drop = pa.array(((pbits >> (10 + i)) & 1) == 1)
            cols[c] = pc.if_else(pc.and_(to_patch, drop), null_s, table.column(c))
        op_col = pc.if_else(to_patch, "P", table.column("op"))
        table = pa.table(
            {
                "offset": table.column("offset"),
                "op": op_col,
                "conv_id": table.column("conv_id"),
                "turn_idx": table.column("turn_idx"),
                "role": cols["role"],
                "text": cols["text"],
                "tool": cols["tool"],
                "ts": table.column("ts"),
            }
        )
    # exact-duplicate events (same offset, same payload) for idempotence tests
    n_dup = int(num_events * dup_frac)
    if n_dup:
        dup_idx = rng.integers(0, num_events, n_dup)
        table = pa.concat_tables([table, table.take(pa.array(dup_idx))])
    return table


def split_epochs(changes: pa.Table, num_epochs: int) -> list[pa.Table]:
    """Split a change table into contiguous offset ranges (binlog epochs).
    Epoch 0 is emitted in schema v0 (no ``tool`` column) for the evolution test."""
    n = changes.num_rows
    bounds = np.linspace(0, n, num_epochs + 1).astype(int)
    parts = []
    for i in range(num_epochs):
        part = changes.slice(bounds[i], bounds[i + 1] - bounds[i])
        if i == 0 and num_epochs > 1:
            part = part.drop_columns(["tool"])
        parts.append(part)
    return parts


def write_fixture(out_dir: str, sf: float = 0.001, seed: int = 42, num_epochs: int = 4) -> dict:
    """Write changes-<i>.parquet epoch files under ``out_dir``; returns paths info.

    Idempotent: skips generation when the directory is already complete.
    """
    K, N = SF_SIZES[sf]
    os.makedirs(out_dir, exist_ok=True)
    paths = [os.path.join(out_dir, f"changes-{i:05d}.parquet") for i in range(num_epochs)]
    done = os.path.join(out_dir, "_DONE")
    if not (os.path.exists(done) and all(os.path.exists(p) for p in paths)):
        changes = gen_changes(N, K, seed=seed)
        for i, part in enumerate(split_epochs(changes, num_epochs)):
            tmp = paths[i] + ".tmp"
            pq.write_table(part, tmp)
            os.replace(tmp, paths[i])
        with open(done, "w") as f:
            f.write(f"sf={sf} seed={seed} events={changes.num_rows}\n")
    return {"paths": paths, "num_convs": K, "num_events": N}


def oracle_lake(*change_tables: pa.Table) -> pd.DataFrame:
    """Trivial independent oracle (FIXTURES.md §3): full-sort LWW in pandas.

    Concat all events, keep per (conv_id, turn_idx) the max-(ts, offset) event,
    drop delete winners, sort by (conv_id, turn_idx)."""
    frames = []
    for t in change_tables:
        df = t.to_pandas()
        if "tool" not in df.columns:
            df["tool"] = pd.Series([None] * len(df), dtype=object)
        frames.append(df)
    df = pd.concat(frames, ignore_index=True)
    # exactly-once: the offset IS the event identity — a re-delivered duplicate
    # (even one re-encoded under an evolved schema) must be a no-op
    df = df.drop_duplicates("offset", keep="first")
    df = df.sort_values(["ts", "offset"], kind="stable")
    df = df.drop_duplicates(["conv_id", "turn_idx"], keep="last")
    df = df[df["op"] != "D"]
    return (
        df.sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
    )


def oracle_patch_lake(*change_tables: pa.Table) -> pd.DataFrame:
    """Independent patch-mode oracle: SEQUENTIAL per-key application (FIXTURES.md
    §3 discipline — a different algorithm than the engine's per-column
    latest-setter formula, so agreement is evidence). Test-scale only."""
    frames = []
    for t in change_tables:
        df = t.to_pandas()
        if "tool" not in df.columns:
            df["tool"] = pd.Series([None] * len(df), dtype=object)
        frames.append(df)
    df = pd.concat(frames, ignore_index=True)
    df = df.drop_duplicates("offset", keep="first")
    df = df.sort_values(["ts", "offset"], kind="stable")
    payload = ["role", "text", "tool"]
    rows: dict = {}
    for r in df.itertuples(index=False):
        k = (r.conv_id, r.turn_idx)
        if r.op == "D":
            rows.pop(k, None)
            continue
        if r.op in ("I", "U"):
            rows[k] = {c: getattr(r, c) for c in payload}
        else:  # 'P': non-null columns overwrite, nulls mean unchanged
            cur = rows.get(k, {c: None for c in payload})
            for c in payload:
                v = getattr(r, c)
                if v is not None and not (isinstance(v, float) and np.isnan(v)):
                    cur[c] = v
            rows[k] = cur
        rows[k]["ts"] = r.ts
    out = pd.DataFrame(
        [{"conv_id": k[0], "turn_idx": k[1], **v} for k, v in rows.items()],
        columns=["conv_id", "turn_idx", *payload, "ts"],
    )
    return (
        out.sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
    )


def gen_multitable_changes(
    num_events: int, num_convs: int, seed: int = 42, meta_frac: float = 0.2
) -> pa.Table:
    """One interleaved TWO-TABLE binlog stream, the multi-table form a real
    WAL tail arrives in: ``transcripts`` events (``gen_changes``) plus
    ``conv_meta`` events — per-conversation title/status upserts with
    ``turn_idx`` pinned to 0 so the lake's (conv_id, turn_idx) key degenerates
    to conv_id for that table. Columns are the union schema with nulls in the
    foreign slots, discriminated by ``table_name``; offsets are reassigned in
    (ts, original-order) so the two tables genuinely interleave."""
    tr = gen_changes(num_events, num_convs, seed=seed).to_pandas()
    tr["table_name"] = "transcripts"

    m = max(int(num_events * meta_frac), 1)
    rng = np.random.default_rng(seed + 101)
    conv_k = (rng.zipf(1.3, m) - 1) % num_convs
    bits = rng.integers(0, 1 << 62, m, dtype=np.int64)
    op = np.full(m, "U", dtype=object)
    op[bits % 100 < 25] = "I"
    op[bits % 100 >= 95] = "D"
    ts_us = rng.integers(0, num_events * 10_000, m, dtype=np.int64)
    statuses = np.array(["open", "active", "closed", "archived"], dtype=object)
    meta = pd.DataFrame(
        {
            "op": op,
            "conv_id": pd.Series(conv_k).map(lambda k: f"conv-{k:08d}"),
            "turn_idx": np.zeros(m, np.int32),
            "ts": BASE_TS + ts_us.astype("timedelta64[us]"),
            "title": pd.Series(conv_k).map(lambda k: f"conversation {k}")
            + " rev " + pd.Series((bits >> 7) % 7).astype(str),
            "status": statuses[(bits >> 3) % 4],
            "table_name": "conv_meta",
        }
    )
    both = pd.concat([tr, meta], ignore_index=True)
    both = both.sort_values("ts", kind="stable").reset_index(drop=True)
    both["offset"] = np.arange(len(both), dtype=np.int64)
    cols = [
        "offset", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts",
        "title", "status", "table_name",
    ]
    out = pa.Table.from_pandas(both[cols], preserve_index=False)
    return out.set_column(
        out.schema.get_field_index("turn_idx"),
        "turn_idx",
        out.column("turn_idx").cast(pa.int32()),
    )
