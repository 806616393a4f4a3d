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


def fineweb_audit(ds, jaccard_threshold: float = 0.8):
    """FineWeb/RefinedWeb-style curation AUDIT: one row per document with
    every stage's verdict and their conjunction — the per-stage removal
    attribution those pipelines publish as ablations (Penedo et al. 2024 §3):

      ok_lang             language identified (lang_pred != 'und')
      gopher_pass         Rae et al. 2021 §A1.1 word-level quality rules
      ok_repetition       Gopher repetition thresholds
      is_exact_keeper     min doc_id of its md5(text) group
      is_near_dup_keeper  not a non-representative member of a verified
                          MinHash near-dup component
      kept                AND of the five

    Emitting verdicts instead of filtering keeps the audit total — every
    document appears exactly once whatever it fails — and each boolean is
    reproduced verbatim by the stage's own oracle SQL (fineweb_audit_oracle_sql
    composes them), so the composed pipeline is end-to-end oracled.

    Scale shape: the three text signals fuse into ONE map-only actor pass
    (TextQuality state built per actor); the exact-keeper set and near-dup
    drop set are the designed small sides (O(#distinct texts) / O(dup
    members)) broadcast once — above ~10^8 ids each swaps to the bucketed
    semi-join like ``curate_documents``' keeper membership."""
    import ray
    from ray.data.aggregate import Min

    from ..stages.dedup import dup_groups, verified_near_dup_pairs
    from ..stages.text import TextQuality, gopher_rules, repetition_batch

    keepers = (
        ds.map_batches(_fp, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("fp")
        .aggregate(Min("doc_id", alias_name="doc_id"))
    )
    keeper_ids = np.sort(keepers.to_pandas()["doc_id"].to_numpy())
    groups = dup_groups(
        verified_near_dup_pairs(ds, jaccard_threshold=jaccard_threshold)
    ).to_pandas()
    nd_drops = np.sort(
        groups.loc[groups["doc_id"] != groups["dup_group"], "doc_id"].to_numpy(
            dtype=np.int64
        )
    )
    ek_ref = ray.put(keeper_ids)
    nd_ref = ray.put(nd_drops)

    def _member(ids: np.ndarray, sorted_set: np.ndarray) -> np.ndarray:
        if not len(sorted_set):
            return np.zeros(len(ids), dtype=bool)
        pos = np.clip(np.searchsorted(sorted_set, ids), 0, len(sorted_set) - 1)
        return sorted_set[pos] == ids

    class Audit:
        def __init__(self):
            self.tq = TextQuality()

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            lang = np.asarray(
                self.tq(batch).column("lang_pred").to_pylist(), dtype=object
            )
            ok_lang = lang != "und"
            gopher = gopher_rules(batch).column("gopher_pass").to_numpy(
                zero_copy_only=False
            )
            rep = repetition_batch(batch).column("keep").to_numpy(
                zero_copy_only=False
            )
            is_ek = _member(ids, ray.get(ek_ref))
            is_ndk = ~_member(ids, ray.get(nd_ref))
            return pa.table(
                {
                    "doc_id": batch.column("doc_id"),
                    "ok_lang": pa.array(ok_lang),
                    "gopher_pass": pa.array(gopher),
                    "ok_repetition": pa.array(rep),
                    "is_exact_keeper": pa.array(is_ek),
                    "is_near_dup_keeper": pa.array(is_ndk),
                    "kept": pa.array(ok_lang & gopher & rep & is_ek & is_ndk),
                }
            )

    return ds.map_batches(
        Audit, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=4096, concurrency=(1, 4),
    )


def fineweb_audit_oracle_sql(jaccard_threshold: float = 0.8) -> str:
    """DuckDB mirror of ``fineweb_audit``: each verdict column is the
    corresponding stage oracle verbatim (lang/gopher/repetition CTEs, the
    md5(text) keeper group, the recursive near-dup closure of the
    minhash_near_dups oracle), conjoined the same way."""
    from .analytics import MINHASH_GROUPS_CTES, _lang_quality_sql
    from ..stages.text import gopher_oracle_sql, repetition_oracle_sql

    return f"""
        WITH RECURSIVE {MINHASH_GROUPS_CTES},
        nd AS (
            SELECT node AS doc_id, least(node, min(x)) AS dup_group
            FROM reach GROUP BY node
        ), lq AS ({_lang_quality_sql()}),
        g AS ({gopher_oracle_sql("documents")}),
        rep AS ({repetition_oracle_sql("documents")}),
        ek AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text))
        SELECT d.doc_id,
               (lq.lang_pred <> 'und') AS ok_lang,
               g.gopher_pass,
               rep.keep AS ok_repetition,
               (ek.doc_id IS NOT NULL) AS is_exact_keeper,
               (nd.dup_group IS NULL OR nd.dup_group = d.doc_id)
                   AS is_near_dup_keeper,
               ((lq.lang_pred <> 'und') AND g.gopher_pass AND rep.keep
                AND ek.doc_id IS NOT NULL
                AND (nd.dup_group IS NULL OR nd.dup_group = d.doc_id)) AS kept
        FROM documents d
        JOIN lq USING (doc_id)
        JOIN g USING (doc_id)
        JOIN rep USING (doc_id)
        LEFT JOIN ek ON ek.doc_id = d.doc_id
        LEFT JOIN nd ON nd.doc_id = d.doc_id
    """
