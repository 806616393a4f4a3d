"""Training-sink egress formats.

``export_token_bin`` writes the Megatron-LM-style INDEXED BINARY dataset
shape — one flat little-endian uint32 token stream per shard
(``shard-K.bin``) plus an index of (doc_id, offset, n_tokens)
(``shard-K.idx.parquet``) — the memory-mappable layout pretraining loaders
consume (the public Megatron-LM ``indexed_dataset`` idea, re-expressed with a
parquet index so the bytes stay independently checkable). Documents shard by
``stable_hash(doc_id)`` and sort by doc_id within a shard, so a re-run is
BYTE-IDENTICAL; each shard lands atomically (tmp → rename, existing shards
skip — crash resume), and a ``_SUCCESS`` manifest with per-shard counts
commits last. ``read_token_bin`` parses the bytes back to
(doc_id, ord, token_id) rows — the driver oracles the EGRESS BYTES
themselves against the tokenization SQL."""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..hashing import stable_hash


def _atomic_bytes(data: bytes, path: str) -> None:
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def _write_shard(shard: int, dest_dir: str, *parts: pa.Table) -> dict:
    """One shard's writer task: concat its addressed doc batches, sort by
    doc_id (deterministic layout), lay the token stream + index down
    atomically. An already-written shard is left untouched (resume) — its
    counts are re-read from the index footer, no data decode."""
    bin_path = os.path.join(dest_dir, f"shard-{shard:05d}.bin")
    idx_path = os.path.join(dest_dir, f"shard-{shard:05d}.idx.parquet")
    if os.path.exists(bin_path) and os.path.exists(idx_path):
        meta = pq.ParquetFile(idx_path)
        n_tokens = os.path.getsize(bin_path) // 4
        return {"shard": shard, "docs": meta.metadata.num_rows,
                "tokens": n_tokens, "resumed": True}
    t = pa.concat_tables([p for p in parts if p.num_rows], promote_options="none") \
        if any(p.num_rows for p in parts) else parts[0]
    df = t.to_pandas().sort_values("doc_id", kind="stable").reset_index(drop=True)
    streams = [np.asarray(x, dtype=np.int32) for x in df["ids"]]
    flat = (
        np.concatenate(streams) if streams else np.empty(0, np.int32)
    ).astype("<u4")
    lens = np.array([len(s) for s in streams], np.int64)
    offsets = np.concatenate([[0], np.cumsum(lens)[:-1]]) if len(lens) else lens
    _atomic_bytes(flat.tobytes(), bin_path)
    idx = pa.table(
        {
            "doc_id": pa.array(df["doc_id"].to_numpy()),
            "offset": pa.array(offsets, pa.int64()),
            "n_tokens": pa.array(lens, pa.int64()),
        }
    )
    tmp = f"{idx_path}.tmp.{os.getpid()}"
    pq.write_table(idx, tmp)
    os.replace(tmp, idx_path)
    return {"shard": shard, "docs": len(df), "tokens": int(lens.sum()),
            "resumed": False}


def export_token_bin(encoded, dest_dir: str, num_shards: int = 8) -> dict:
    """Write an encoded (doc_id, ids list<int32>, n_tokens) Dataset — the
    ``stages.text.encode_documents`` shape — as the indexed binary layout.
    One bucket-exchange pass: per-block splits address each doc to its shard
    writer; S writer tasks run in parallel, nothing lands on the driver but
    the per-shard counts. Returns the _SUCCESS manifest dict."""
    import ray

    os.makedirs(dest_dir, exist_ok=True)
    enc = encoded.materialize()
    S = num_shards

    def _split(t: pa.Table) -> list:
        b = (
            stable_hash(t.column("doc_id").to_numpy(zero_copy_only=False))
            % np.uint64(S)
        ).astype(np.int64)
        order = np.argsort(b, kind="stable")
        tt, sb = t.take(pa.array(order)), b[order]
        cuts = np.searchsorted(sb, np.arange(S + 1))
        return [tt.slice(cuts[i], cuts[i + 1] - cuts[i]) for i in range(S)]

    split = ray.remote(num_returns=S)(_split)
    writer = ray.remote(_write_shard)
    cols = [split.remote(r) for r in enc.to_arrow_refs()]
    stats = ray.get(
        [writer.remote(s, dest_dir, *[c[s] for c in cols]) for s in range(S)]
    )
    persisted = {
        "num_shards": S,
        "docs": sum(s["docs"] for s in stats),
        "tokens": sum(s["tokens"] for s in stats),
        # the resumed flag is run-local observability, not layout — keeping
        # it out of _SUCCESS makes a resumed run byte-identical to a clean one
        "shards": [{k: v for k, v in s.items() if k != "resumed"} for s in stats],
    }
    tmp = os.path.join(dest_dir, f"_SUCCESS.tmp.{os.getpid()}")
    with open(tmp, "w") as f:
        json.dump(persisted, f)
    os.replace(tmp, os.path.join(dest_dir, "_SUCCESS"))
    return persisted | {"shards": stats}


def read_token_bin(dest_dir: str):
    """Parse the egress bytes back: (doc_id, ord, token_id) rows — ord is the
    1-based position within the document, exactly the
    ``encode_documents_flat`` / SQL-oracle shape. One Ray task per shard reads
    bin + index and expands via the offsets; no driver materialization."""
    import ray
    import ray.data

    with open(os.path.join(dest_dir, "_SUCCESS")) as f:
        manifest = json.load(f)

    def _read(shard: int) -> pa.Table:
        binp = os.path.join(dest_dir, f"shard-{shard:05d}.bin")
        idx = pq.read_table(
            os.path.join(dest_dir, f"shard-{shard:05d}.idx.parquet")
        ).to_pandas()
        toks = np.frombuffer(open(binp, "rb").read(), dtype="<u4").astype(np.int32)
        lens = idx["n_tokens"].to_numpy(np.int64)
        doc = np.repeat(idx["doc_id"].to_numpy(), lens)
        ord_ = (
            np.arange(int(lens.sum()), dtype=np.int64)
            - np.repeat(np.concatenate([[0], np.cumsum(lens)[:-1]]) if len(lens) else lens, lens)
            + 1
        )
        return pa.table(
            {
                "doc_id": pa.array(doc),
                "ord": pa.array(ord_),
                "token_id": pa.array(toks),
            }
        )

    task = ray.remote(_read)
    return ray.data.from_arrow_refs(
        [task.remote(s) for s in range(int(manifest["num_shards"]))]
    )
