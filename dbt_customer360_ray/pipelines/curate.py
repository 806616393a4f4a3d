"""Corpus curation: the composed training-data pipeline — language filter →
quality filter → exact-dup keeper → resumable partitioned parquet sink.

This is the flagship COMPOSITION of the stage library (stages/text,
stages/dedup): each step is a vectorized map or a hash aggregate already
proven against its own SQL oracle, and the curated output itself is
oracle-checked end to end (``curate_oracle_sql`` — lang/quality CTE +
keeper join + the same float thresholds).

Scale shape: the only shuffle is the exact-dup keeper aggregate; filters are
map-only; the sink writes one directory per doc-id-hash shard with an atomic
tmp→rename and a ``_SUCCESS.<shard>`` marker, so a crashed run resumes by
skipping finished shards — the lightweight cousin of the CDC lake's two-phase
manifest (state/manifest.py).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa

from ..hashing import stable_hash


def _fp(t: pa.Table) -> pa.Table:
    """md5(text) content key — portable to the SQL oracle (same as
    q_dedup_exact_documents)."""
    hashes = [
        hashlib.md5(s.encode("utf-8")).hexdigest() if s is not None else None
        for s in t.column("text").to_pylist()
    ]
    return pa.table({"fp": pa.array(hashes, pa.string()), "doc_id": t.column("doc_id")})


def curate_documents(
    ds, quality_threshold: float = 0.5, broadcast_keeper_ids: int = 100_000_000
):
    """documents → curated (doc_id, lang_pred, quality_score).

    Keeps docs that (a) get a language prediction (not 'und'), (b) clear the
    quality bar, and (c) are their exact-dup group's keeper (min doc_id per
    md5(text)). Below ``broadcast_keeper_ids`` the keeper id set is collected
    once and broadcast via ``ray.put`` — O(#distinct texts) ids, the map-only
    path; above it the membership test becomes a bucketed hash semi-join on
    doc_id (stages/joins.py) so nothing O(corpus) lands on the driver.
    """
    import ray
    from ray.data.aggregate import Min

    from ..stages.text import analyze_text

    keepers = (
        ds.map_batches(_fp, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("fp")
        .aggregate(Min("doc_id", alias_name="doc_id"))
        .materialize()
    )

    def lang_quality(t: pa.Table) -> pa.Table:
        lang = np.asarray(t.column("lang_pred").to_pylist(), dtype=object)
        q = t.column("quality_score").to_numpy()
        mask = (lang != "und") & (q >= quality_threshold)
        return t.filter(pa.array(mask)).select(
            ["doc_id", "lang_pred", "quality_score"]
        )

    analyzed = analyze_text(ds).map_batches(lang_quality, batch_format="pyarrow")

    if keepers.count() > broadcast_keeper_ids:
        from ..stages.joins import bucketed_hash_join

        keeper_ids_ds = keepers.map_batches(
            lambda t: t.select(["doc_id"]), batch_format="pyarrow",
            zero_copy_batch=True,
        )
        return bucketed_hash_join(analyzed, keeper_ids_ds, on="doc_id")

    keeper_ids = np.sort(keepers.to_pandas()["doc_id"].to_numpy())
    ref = ray.put(keeper_ids)

    def keeper_filt(t: pa.Table) -> pa.Table:
        ids = ray.get(ref)
        did = t.column("doc_id").to_numpy()
        pos = np.clip(np.searchsorted(ids, did), 0, max(len(ids) - 1, 0))
        is_keeper = (ids[pos] == did) if len(ids) else np.zeros(len(did), bool)
        return t.filter(pa.array(is_keeper))

    return analyzed.map_batches(keeper_filt, batch_format="pyarrow")


def curate_oracle_sql(quality_threshold: float = 0.5) -> str:
    """DuckDB mirror: the lang/quality CTE (same generated SQL as the
    lang_quality_documents oracle — bit-identical float arithmetic) joined to
    the exact-dup keeper set, with the same filters."""
    from .analytics import _lang_quality_sql

    return f"""
        SELECT lq.doc_id, lq.lang_pred, lq.quality_score
        FROM ({_lang_quality_sql()}) lq
        JOIN (
            SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
        ) k USING (doc_id)
        WHERE lq.lang_pred != 'und' AND lq.quality_score >= {quality_threshold!r}
    """


def write_curated(ds, out_dir: str, num_shards: int = 16):
    """Resumable partitioned sink: shard = hash(doc_id) % num_shards, one
    ``shard=K/part.parquet`` per shard written via atomic tmp→rename, then a
    ``_SUCCESS.K`` marker. A re-run drops finished shards' rows BEFORE the
    shuffle (map-side filter) and rewrites only the missing ones — per-shard
    exactly-once without any global coordination. Returns a per-shard stats
    Dataset (shard, rows); finished shards simply don't reappear.
    """
    os.makedirs(out_dir, exist_ok=True)
    done = sorted(
        int(name.split(".")[-1])
        for name in os.listdir(out_dir)
        if name.startswith("_SUCCESS.")
    )
    done_arr = np.array(done, dtype=np.int64)

    def shard_and_prune(t: pa.Table) -> pa.Table:
        sh = (stable_hash(t.column("doc_id")) % np.uint64(num_shards)).astype(np.int64)
        t = t.append_column("shard", pa.array(sh))
        if len(done_arr):
            t = t.filter(pa.array(~np.isin(sh, done_arr)))
        return t

    def writer(t: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        shard = int(t.column("shard")[0].as_py())
        shard_dir = os.path.join(out_dir, f"shard={shard:05d}")
        os.makedirs(shard_dir, exist_ok=True)
        tmp = os.path.join(shard_dir, "part.parquet.tmp")
        pq.write_table(t.drop_columns(["shard"]), tmp)
        os.replace(tmp, os.path.join(shard_dir, "part.parquet"))
        # marker AFTER the data rename: a crash in between re-writes the
        # (deterministic) shard next run — idempotent, never partial
        with open(os.path.join(out_dir, f"_SUCCESS.{shard}"), "w") as f:
            f.write(str(t.num_rows))
        return pa.table(
            {"shard": pa.array([shard], pa.int64()),
             "rows": pa.array([t.num_rows], pa.int64())}
        )

    return (
        ds.map_batches(shard_and_prune, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(writer, batch_format="pyarrow")
    )


def read_curated(out_dir: str):
    """Read the sharded curated output back as one Dataset."""
    import ray.data

    paths = [
        os.path.join(out_dir, d, "part.parquet")
        for d in sorted(os.listdir(out_dir))
        if d.startswith("shard=")
    ]
    ds = ray.data.read_parquet(paths)
    # the hive-style shard=K dirs make the reader re-infer a partition
    # column; the shard is layout, not data
    if "shard" in ds.schema().names:
        ds = ds.drop_columns(["shard"])
    return ds
