"""Debezium-style JSONL change-stream source.

The engine's native ingest is columnar (parquet epoch files / Arrow
Datasets), but real CDC tails are usually JSON envelopes — Debezium/Kafka
emit one record per change with ``op`` (c/u/d/r), the row's ``before`` and
``after`` images, and a source position. This module decodes that envelope
into the engine's flat event schema entirely with vectorized pyarrow kernels
(ray.data.read_json parses the nested structs via Arrow's JSON reader; no
per-row Python), so a JSONL tail replays through the exact same
``CdcLake.apply`` path as parquet — same exactly-once, same converged state.

Envelope (one JSON object per line):

    {"op": "u", "pos": 1234,
     "after": {"conv_id": "c1", "turn_idx": 3, "ts_us": 1735689600000000,
               "role": "user", "text": "...", "tool": null},
     "before": null}

``op``: c=create, u=update, d=delete, r=snapshot-read (treated as insert).
``pos`` is the binlog position → the engine's ``offset``. Deletes carry the
key in ``before`` (``after`` null), everything else in ``after``. Event time
rides INSIDE the image as epoch-microseconds ``ts_us`` (JSON has no timestamp
type; integer micros round-trip exactly).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

_OP_FROM = pa.array(["c", "u", "d", "r"])
_OP_TO = pa.array(["I", "U", "D", "I"])


def changes_to_debezium_jsonl(changes: pa.Table, path: str) -> str:
    """Fixture/test writer: re-encode a flat change table (offset, op,
    conv_id, turn_idx, payload…, ts) as Debezium-style JSONL, atomically
    (tmp → rename). Row-wise by design — this is the fixture side, never the
    ingest hot path."""
    import json

    df = changes.to_pandas()
    op_map = {"I": "c", "U": "u", "D": "d"}
    image_cols = [c for c in df.columns if c not in ("offset", "op")]
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        for row in df.itertuples(index=False):
            d = row._asdict()
            img = {}
            for c in image_cols:
                v = d[c]
                if c == "ts":
                    img["ts_us"] = None if v is None else int(v.value // 1_000)
                else:
                    img[c] = None if (v is None or v != v) else v
            env = {"op": op_map[d["op"]], "pos": int(d["offset"])}
            if d["op"] == "D":
                env["before"], env["after"] = img, None
            else:
                env["before"], env["after"] = None, img
            f.write(json.dumps(env) + "\n")
    os.replace(tmp, path)
    return path


def read_debezium_jsonl(path: str, schema: pa.Schema | None = None):
    """Decode a Debezium-style JSONL tail into a Dataset of engine change
    events. One vectorized map_batches pass: the op code maps through a
    take-lookup, every image column resolves ``before`` for deletes and
    ``after`` otherwise via ``pc.if_else`` (struct_field of a null struct is
    null, so no row branching anywhere). ``schema`` (optional) pins the
    output event schema — pass it when the lake's column types must match a
    columnar source exactly (JSON infers int64 where parquet had int32)."""
    import ray.data

    ds = ray.data.read_json(path)

    def decode(t: pa.Table, target=schema) -> pa.Table:
        n = t.num_rows
        op_idx = pc.index_in(t.column("op"), value_set=_OP_FROM)
        op = pc.take(_OP_TO, op_idx)
        is_d = pc.equal(op, pa.scalar("D"))
        after, before = t.column("after"), t.column("before")
        a_type = after.type if pa.types.is_struct(after.type) else None
        b_type = before.type if pa.types.is_struct(before.type) else None
        names: list[str] = []
        for st in (a_type, b_type):
            if st is not None:
                names += [f.name for f in st if f.name not in names]

        def image(name: str):
            def side(col, st):
                if st is not None and st.get_field_index(name) >= 0:
                    return pc.struct_field(col, name)
                return None

            a, b = side(after, a_type), side(before, b_type)
            if a is None and b is None:
                raise ValueError(f"debezium decode: no image carries {name!r}")
            if a is None:
                return b
            if b is None:
                return a
            return pc.if_else(is_d, b, a)

        cols: dict = {
            "offset": t.column("pos").cast(pa.int64()),
            "op": op,
        }
        for name in names:
            if name == "ts_us":
                continue
            cols[name] = image(name)
        cols["ts"] = image("ts_us").cast(pa.int64()).cast(pa.timestamp("us"))
        out = pa.table(cols)
        if target is not None:
            out = out.select([f.name for f in target]).cast(target)
        return out

    return ds.map_batches(decode, batch_format="pyarrow")


def export_change_feed_jsonl(
    lake,
    out_dir: str,
    pos_base: int,
    from_epoch: int | None = None,
    to_epoch: int | None = None,
    from_version: int | None = None,
    to_version: int | None = None,
) -> str:
    """CDC-out EGRESS: re-encode the lake's change feed between two snapshots
    as Debezium-style JSONL part files — the exact inverse of
    ``read_debezium_jsonl``, so a downstream consumer (or another lake) can
    tail this lake like a database binlog. Fully distributed: the feed is
    already one block per partition; each block is struct-assembled with
    pyarrow kernels (no per-row Python) and ``Dataset.write_json`` writes one
    part file per block.

    ``pos_base``: the producer's position epoch — emitted positions are
    ``pos_base + stable_hash(key) % 2^40``, so the caller MUST hand
    consecutive exports increasing bases (e.g. ``segment << 41``) for
    downstream offset ordering to reflect feed order (the same contract a
    real binlog's monotone positions give; within one feed each key appears
    once, so the hash only needs per-feed uniqueness — 2^-40-scale collision
    odds, deterministic for a fixed corpus).

    Update envelopes carry both ``before`` and ``after`` (Debezium 'u');
    deletes carry the pre-image in ``before`` with ``after`` null."""
    import numpy as np

    from ..hashing import stable_hash

    if to_epoch is None and to_version is None:
        to_version = lake.manifest.version  # default: egress up to HEAD
    feed = lake.change_feed(
        from_epoch=from_epoch,
        to_epoch=to_epoch,
        from_version=from_version,
        to_version=to_version,
        include_preimage=True,
    )

    def encode(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ct = t.column("change_type")
        op = pc.take(
            pa.array(["c", "u", "d"]),
            pc.index_in(ct, value_set=pa.array(["insert", "update", "delete"])),
        )
        is_d = pc.equal(ct, pa.scalar("delete")).to_numpy(zero_copy_only=False)
        is_c = pc.equal(ct, pa.scalar("insert")).to_numpy(zero_copy_only=False)
        conv = t.column("conv_id").to_pandas().astype(str).to_numpy(dtype=object)
        turn = t.column("turn_idx").to_numpy(zero_copy_only=False)
        key = np.char.add(
            np.char.add(conv.astype(str), "\x1f"), turn.astype(np.int64).astype(str)
        )
        pos = np.int64(pos_base) + (
            stable_hash(key.astype(object)) % np.uint64(1 << 40)
        ).astype(np.int64)
        payload = [
            f.name
            for f in t.schema
            if f.name not in ("change_type", "conv_id", "turn_idx")
            and not f.name.startswith("old_")
        ]

        def image(cols: dict, null_mask: np.ndarray) -> pa.StructArray:
            arrays, names = [], []
            for name, col in cols.items():
                if name == "ts":
                    col, name = pc.cast(pc.cast(col, pa.int64()), pa.int64()), "ts_us"
                arrays.append(
                    col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                )
                names.append(name)
            return pa.StructArray.from_arrays(
                arrays, names, mask=pa.array(null_mask)
            )

        after = image(
            {"conv_id": t.column("conv_id"), "turn_idx": t.column("turn_idx")}
            | {c: t.column(c) for c in payload},
            is_d,  # deletes: after = null
        )
        before = image(
            {"conv_id": t.column("conv_id"), "turn_idx": t.column("turn_idx")}
            | {c: t.column(f"old_{c}") for c in payload},
            is_c,  # inserts: before = null
        )
        return pa.table(
            {
                "op": op,
                "pos": pa.array(pos, pa.int64()),
                "before": before,
                "after": after,
            }
        )

    os.makedirs(out_dir, exist_ok=True)
    feed.map_batches(encode, batch_format="pyarrow").write_json(out_dir)
    return out_dir
