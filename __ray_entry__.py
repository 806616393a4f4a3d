"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01 and
compares it against the matching ``oracle_sql()[name]`` via DuckDB. Neither this
module nor the library calls ``ray.init()`` — sessions are owned by the driver,
bench.py, and the test fixture.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship CDC replay at sf0.001: deterministic change stream → converged
    transcript lake, returned as a streaming ray.data.Dataset."""
    from dbt_customer360_ray.pipelines.cdc_replay import flagship

    return flagship(sf=0.001)


def _cdc_replay_lake(sf_dir: str):
    """Flagship pipeline: full CDC replay (exactly-once manifest sink, schema
    evolution, tombstones). Oracled — replay_oracle_sql re-derives the
    converged lake state from the same fixture parquet with window functions.
    Pinned to sf0.01 (the driver's correctness scale) so the oracle reads the
    same fixture regardless of sf_dir."""
    from dbt_customer360_ray.pipelines.cdc_replay import flagship

    return flagship(sf=0.01)


def _cdc_timetravel_lake(sf_dir: str):
    """Time-travel read: converged lake state AS OF epoch 1 of the 4-epoch
    sf0.01 replay, resolved through the retained manifest-version log.
    Oracled — timetravel_oracle_sql re-derives the prefix state from only the
    first two epoch files."""
    from dbt_customer360_ray.pipelines.cdc_replay import replayed_lake

    return replayed_lake(sf=0.01).read_as_of(epoch=1)


def _cdc_change_feed(sf_dir: str):
    """CDC-out change feed between the epoch-0 (schema v0) and epoch-2
    snapshots: per-key insert/update/delete rows with post-images, computed as
    one shuffle-free diff task per partition. Oracled — change_feed_oracle_sql
    FULL-OUTER-JOINs the two prefix states in SQL."""
    from dbt_customer360_ray.pipelines.cdc_replay import replayed_lake

    return replayed_lake(sf=0.01).change_feed(from_epoch=0, to_epoch=2)


_SINCE_CUTOFF = "2025-01-01 00:10:00"  # above epochs 0-1's ts_max in the sf0.01 fixture


def _cdc_lake_since(sf_dir: str):
    """Stats-pruned time-bounded read: converged rows with ts >= cutoff, where
    the manifest's per-run ts_max stats let the engine skip whole runs
    (epochs 0-1 of the 4-epoch replay) without opening them. Oracled —
    since_oracle_sql filters the full SQL-derived state the slow way."""
    from dbt_customer360_ray.pipelines.cdc_replay import replayed_lake

    lake = replayed_lake(sf=0.01)
    ds = lake.read(since_ts=_SINCE_CUTOFF)
    assert lake.last_read_stats["runs_pruned"] > 0, lake.last_read_stats
    return ds


def _cdc_snapshot_synced(sf_dir: str):
    """MERGE-style full-snapshot re-sync (snapshot-diff CDC): replay, derive a
    deterministic desired snapshot, snapshot_sync it (minimal I/U/D events
    through the exactly-once epoch path), return the post-sync lake. Oracled —
    snapshot_sync_oracle_sql re-derives the post-state incl. ts provenance."""
    from dbt_customer360_ray.pipelines.cdc_replay import snapshot_synced_lake

    return snapshot_synced_lake(sf=0.01)


def _cdc_merged_into(sf_dir: str):
    """Delta-style predicate MERGE INTO: replay, derive a keyed source (a
    column-subset text UPDATE arm gated by target role + an INSERT arm),
    merge_into it (events through the exactly-once epoch path; unmatched lake
    keys untouched), return the post-merge lake. Oracled —
    merge_into_oracle_sql replays the clauses in SQL with ts provenance."""
    from dbt_customer360_ray.pipelines.cdc_replay import merged_into_lake

    return merged_into_lake(sf=0.01)


def _cdc_retention_lake(sf_dir: str):
    """Row TTL / retention: replay, tombstone every live row older than the
    cutoff via expire_rows (one task per partition, no shuffle, exactly-once),
    return the post-expiry lake. Oracled — retention_oracle_sql keeps rows
    at/above the cutoff with their original ts."""
    from dbt_customer360_ray.pipelines.cdc_replay import retention_expired_lake

    return retention_expired_lake(sf=0.01)


def _cdc_token_index(sf_dir: str):
    """Incrementally-maintained inverted token index (secondary-index IVM):
    each replay epoch's change feed (with pre-images) becomes exact
    (token, conversation) count deltas folded into a derived postings lake —
    per-epoch work O(changed tokens), never O(lake). Oracled —
    token_index_oracle_sql rebuilds the postings from scratch in SQL."""
    from dbt_customer360_ray.pipelines.cdc_replay import token_index_lake

    return token_index_lake(sf=0.01)


def _cdc_boilerplate_convs(sf_dir: str):
    """Boilerplate-turn curation stats over the converged transcript lake:
    a turn is boilerplate iff its exact text occurs in ≥2 distinct
    conversations; per conversation emit turn count, boilerplate count, and
    an integer permille ratio. Only md5 hashes shuffle; the qualifying hash
    set is small by construction and broadcast once."""
    from dbt_customer360_ray.pipelines.cdc_replay import conversation_boilerplate

    return conversation_boilerplate(sf=0.01)


def _cdc_debezium_replay(sf_dir: str):
    """Debezium-JSONL ingest: the fixture epochs re-encoded as JSON change
    envelopes (op c/u/d, before/after images, binlog pos), decoded with
    vectorized pyarrow kernels, replayed through the same exactly-once path.
    Oracled — the state must equal the parquet replay, so the oracle is the
    plain replay oracle."""
    from dbt_customer360_ray.pipelines.cdc_replay import debezium_replayed_lake

    return debezium_replayed_lake(sf=0.01)


def _cdc_lookup_batch(sf_dir: str):
    """Batch point-lookup serving path: every conversation whose id ends in
    '7', fetched via lookup_many — ids routed to owner partitions, one task
    per TOUCHED partition, per-run bloom skip + parquet IN-filter; untouched
    partitions never visited. Oracled — lookup_many_oracle_sql filters the
    full SQL-derived state the slow way."""
    from dbt_customer360_ray.pipelines.cdc_replay import replayed_lake

    lake = replayed_lake(sf=0.01)
    ids = [
        c
        for c in lake.conversation_headers()
        .select_columns(["conv_id"])
        .to_pandas()["conv_id"]
        if c.endswith("7")
    ]
    return lake.lookup_many(ids)


def _cdc_sft_export(sf_dir: str):
    """Training export: conversations assembled into SFT-ready documents
    (role-prefixed turn lines, token counts) — one task per partition, NO
    shuffle (the lake is already conv-partitioned). Oracled — string_agg
    ORDER BY turn_idx over the converged LWW state."""
    from dbt_customer360_ray.pipelines.cdc_replay import sft_export

    return sft_export(sf=0.01)


def _cdc_sft_split(sf_dir: str):
    """Conversation-grain train/val split of the SFT export (md5-permille on
    conv_id — splitting at turn grain would leak conversations across sets).
    Oracled — the sft oracle plus the same permille CASE."""
    from dbt_customer360_ray.pipelines.cdc_replay import sft_split

    return sft_split(sf=0.01)


def _cdc_token_search(sf_dir: str):
    """Ranked retrieval served FROM the maintained token index (no lake
    rescan): conversations scored by summed postings over the query terms,
    top-k under a total order. Oracled — the from-scratch postings filtered,
    summed and ranked identically in SQL."""
    from dbt_customer360_ray.pipelines.cdc_replay import token_search

    return token_search(sf=0.01)


def _cdc_explain_read(sf_dir: str):
    """EXPLAIN for the lake: the per-partition read plan (runs kept vs pruned
    by ts stats / routing / blooms) computed from metadata only — no data
    I/O. Rows-only entry (planning isn't SQL-expressible); tests pin the plan
    to the executed read's stats."""
    from dbt_customer360_ray.pipelines.cdc_replay import replayed_lake

    return replayed_lake(sf=0.01).explain_read(since_ts=_SINCE_CUTOFF)


def _cdc_sft_jsonl(sf_dir: str):
    """Sharded JSONL training egress: one resumable atomic shard per lake
    partition + _SUCCESS manifest; the entry parses the shards back, so the
    round trip is oracled against the SAME sft assembly SQL."""
    from dbt_customer360_ray.pipelines.cdc_replay import sft_jsonl_export

    return sft_jsonl_export(sf=0.01)


def _cdc_near_dup_convs(sf_dir: str):
    """Conversation-grain near-dup groups over the lake (the lake→curation
    bridge): SFT assembly (shuffle-free) → MinHash+LSH candidates → exact
    shingle-Jaccard verify → connected components; planted duplicate
    conversations make the answer non-vacuous. Oracled — all-pairs Jaccard +
    recursive closure in SQL over the same converged state."""
    from dbt_customer360_ray.pipelines.cdc_replay import near_dup_convs_lake

    return near_dup_convs_lake(sf=0.01)


def _cdc_minhash_index_dups(sf_dir: str):
    """Near-dup groups served from the incrementally-maintained MinHash
    signature index: per-epoch dirty-conversation signature upserts (as-of
    point lookups, O(changed convs)/epoch) into a derived lake, then LSH
    banding over the STORED signatures; only the exact verify touches texts.
    Same seeds/thresholds as the scratch pipeline — shares its oracle."""
    from dbt_customer360_ray.pipelines.cdc_replay import minhash_index_near_dups

    return minhash_index_near_dups(sf=0.01)


def _cdc_ann_index(sf_dir: str):
    """Incrementally-maintained embedding-sketch index off the CDC lake (the
    semantic sibling of the minhash index): per-epoch dirty-conversation
    sketch upserts via as-of point lookups — O(changed convs)/epoch, no text
    on the driver — into a derived lake; served back as the long-format
    (conv_id, proj_idx, value) sketch table. Oracled bit-exactly (hashed
    token counts × seeded sign matrix, all-integer after hashing)."""
    from dbt_customer360_ray.pipelines.cdc_replay import ann_index_lake

    return ann_index_lake(sf=0.01)


def _cdc_ann_index_dups(sf_dir: str):
    """Semantic near-dup conversation groups served from the MAINTAINED
    sketch index — no corpus re-embedding: sign-pattern LSH buckets over the
    stored sketches, per-bucket integer-cosine ≥ permille threshold, least-id
    closure. The approximate answer itself is oracled."""
    from dbt_customer360_ray.pipelines.cdc_replay import ann_index_near_dups

    return ann_index_near_dups(sf=0.01)


def _cdc_ann_search(sf_dir: str):
    """Semantic ranked retrieval off the MAINTAINED sketch index — the
    embedding twin of token_search: query text → deterministic sketch (one
    O(1) driver call) → map-only integer-cosine scoring of stored sketches
    with tree-reduced partial top-k. No shuffle, no corpus re-embedding;
    oracled (query sketch inlined in the SQL)."""
    from dbt_customer360_ray.pipelines.cdc_replay import ann_search_lake

    return ann_search_lake(sf=0.01)


def _cdc_redacted_lake(sf_dir: str):
    """PII-redaction mask (privacy scrub at serving reads): emails → <EMAIL>,
    phone runs → <PHONE> in place, applied at every serving surface; a
    PII-planted epoch makes the oracle non-vacuous (asserted). Oracled —
    the LWW replay over the same planted files + DuckDB regexp_replace
    (both engines run RE2)."""
    from dbt_customer360_ray.pipelines.cdc_replay import redacted_lake

    return redacted_lake(sf=0.01)


def _cdc_backfilled_lake(sf_dir: str):
    """Generated-column BACKFILL: columns declared mid-life rewrite history's
    live runs with the derivations (one task per partition, idempotent skip
    of already-correct runs, one atomic swap commit). Oracled — the state
    must equal a lake that had the columns since birth (computed oracle)."""
    from dbt_customer360_ray.pipelines.cdc_replay import backfilled_lake

    return backfilled_lake(sf=0.01)


def _cdc_dedup_index(sf_dir: str):
    """Incrementally-maintained exact-dedup index (IVM with true deletions):
    each epoch's change feed with pre-images maps to member postings of a
    derived lake — O(changed rows) per epoch — and the keeper table (first
    member + copy count per distinct live text) is served from the postings.
    Oracled — the scratch GROUP BY md5(text) over the converged state."""
    from dbt_customer360_ray.pipelines.cdc_replay import dedup_index_lake

    return dedup_index_lake(sf=0.01)


def _cdc_wap_published(sf_dir: str):
    """Write-audit-publish (Iceberg WAP): epoch 3 stages on a metadata-only
    branch, passes the audits, publishes via merge_branch; a poisoned epoch
    fails the role-domain audit and never becomes visible (asserted in the
    callable). Oracled — the final state must equal the plain full replay."""
    from dbt_customer360_ray.pipelines.cdc_replay import wap_lake

    return wap_lake(sf=0.01)


def _cdc_where_read(sf_dir: str):
    """Predicate serving read: ``read(where=…)`` filters the converged rows
    with a constraint-shaped spec (SQL WHERE semantics — NULL drops) and a
    pruned projection, the predicate column riding the scan unprojected.
    Oracled against the replay oracle wrapped in the shared ``predicate_sql``
    translation."""
    from dbt_customer360_ray.pipelines.cdc_replay import replayed_lake

    return replayed_lake(sf=0.01).read(
        columns=["role", "text"],
        where={"name": "w", "column": "role", "op": "==", "value": "assistant"},
    )


def _cdc_dv_deleted(sf_dir: str):
    """Deletion-vector DELETE: the same tool-role predicate as
    cdc_deleted_where, executed as per-run positional sidecars on
    hardlink-renamed runs (merge-on-read; zero data bytes moved, no events) —
    the served state must be identical, so both entries share one oracle."""
    from dbt_customer360_ray.pipelines.cdc_replay import dv_deleted_lake

    return dv_deleted_lake(sf=0.01)


def _cdc_deleted_where(sf_dir: str):
    """Predicate DELETE DML (DELETE FROM lake WHERE role = 'tool'): live
    matching rows tombstoned through the exactly-once epoch path — change-
    feed-visible, time-travelable, one task per partition, no shuffle.
    Oracled — the converged state minus definitively-matching rows."""
    from dbt_customer360_ray.pipelines.cdc_replay import deleted_where_lake

    return deleted_where_lake(sf=0.01)


def _cdc_updated_where(sf_dir: str):
    """Predicate UPDATE DML (UPDATE lake SET text = …, tool = … WHERE role =
    'tool'): live matching rows rewritten as full-image 'U' events through
    the exactly-once epoch path — change-feed-visible, time-travelable, one
    task per partition, no shuffle. Oracled — SQL UPDATE semantics over the
    converged state, including the LWW-visible ts change."""
    from dbt_customer360_ray.pipelines.cdc_replay import updated_where_lake

    return updated_where_lake(sf=0.01)


def _cdc_lake_diff(sf_dir: str):
    """Anti-entropy diff between two replica lakes (cross-lake change_feed):
    replica B diverged by an UPDATE, a DELETE and an insert-only epoch; the
    diff lists the per-key deltas that would turn A into B — one task per
    partition, no shuffle, empty diff = replica-equality proof. Oracled —
    the three change classes re-derived from the converged state in SQL."""
    from dbt_customer360_ray.pipelines.cdc_replay import lake_diff

    return lake_diff(sf=0.01)


def _cdc_late_events(sf_dir: str):
    """Event-time watermark audit (Flink bounded out-of-orderness): per epoch,
    how many arriving events fell below the watermark carried from prior
    epochs. Oracled — late_event_oracle_sql re-derives the running-max
    watermark and the strict lateness test in SQL."""
    from dbt_customer360_ray.pipelines.cdc_replay import late_event_report

    return late_event_report(sf=0.01)


def _cdc_offset_gaps(sf_dir: str):
    """Offset sequence-gap audit (lost-event ingest monitor): maximal runs of
    offsets absent from the stream, with a planted-gap epoch. Oracled —
    offset_gap_oracle_sql derives the same gaps from distinct-offset lag
    adjacency."""
    from dbt_customer360_ray.pipelines.cdc_replay import offset_gap_report

    return offset_gap_report(sf=0.01)


def _cdc_widened_lake(sf_dir: str):
    """Type-widening schema evolution end to end: score arrives int32, a
    later epoch delivers int64 beyond int32 range, the lake widens in place
    and old runs cast up at read. Oracled — widened_oracle_sql rides score
    through the shared LWW SQL as always-BIGINT."""
    from dbt_customer360_ray.pipelines.cdc_replay import widened_lake

    return widened_lake(sf=0.01)


def _cdc_redriven_dlq(sf_dir: str):
    """DLQ redrive: constrained replay quarantines CHECK violators, DROP
    CONSTRAINT, retry_deadletter replays them exactly-once with deterministic
    fresh offsets, DLQ drains. Oracled — redriven_oracle_sql replays both
    arms (passing events + re-offset violators) through the shared LWW SQL."""
    from dbt_customer360_ray.pipelines.cdc_replay import redriven_lake

    return redriven_lake(sf=0.01)


def _cdc_watermarked_sessions(sf_dir: str):
    """Watermark-finalized event-time sessionization: first-delivery events
    admitted under the running watermark, gap sessions per conversation, and
    the epoch each session would be EMITTED (watermark passes end + gap).
    Oracled — watermarked_sessions_oracle_sql re-derives admission, islands
    and finalization with window SQL."""
    from dbt_customer360_ray.pipelines.cdc_replay import watermarked_sessions

    return watermarked_sessions(sf=0.01)


def _cdc_packed_sft(sf_dir: str):
    """Sequence packing of the SFT export into fixed 512-token bins
    (md5-bucketed next-fit in conv_id order — cluster-size-invariant).
    Oracled — packed_sft_oracle_sql steps the same recurrence with a DuckDB
    recursive CTE."""
    from dbt_customer360_ray.pipelines.cdc_replay import packed_sft_export

    return packed_sft_export(sf=0.01)


def _cdc_merged_turns(sf_dir: str):
    """Chat-data alternation repair: consecutive same-role turns of each
    conversation coalesced into one message (gaps-and-islands, first turn_idx
    kept, latest ts) — one task per partition over the conv-partitioned lake,
    NO shuffle. Oracled — merged_turns_oracle_sql re-derives the islands with
    window functions over the converged LWW state."""
    from dbt_customer360_ray.pipelines.cdc_replay import merged_turns_export

    return merged_turns_export(sf=0.01)


def _cdc_context_pairs(sf_dir: str):
    """Next-turn-prediction training pairs: for every assistant turn with a
    preceding turn, (context = up-to-4 preceding role-prefixed lines, target =
    the assistant text) — shuffle-free per partition. Oracled — a windowed
    string_agg with a ROWS frame in SQL."""
    from dbt_customer360_ray.pipelines.cdc_replay import context_pairs_export

    return context_pairs_export(sf=0.01)


def _cdc_describe_history(sf_dir: str):
    """DESCRIBE HISTORY: one row per manifest version with the commit's
    operation + apply metrics (metadata-only, no data reads). Oracled — every
    metric re-derived from the fixture files (deduped = raw − first
    deliveries; upserts/deletes = first deliveries by op)."""
    from dbt_customer360_ray.pipelines.cdc_replay import described_history

    return described_history(sf=0.01)


def _cdc_cloned_lake(sf_dir: str):
    """Shallow clone (Delta CLONE): metadata-only copy sharing source data
    files by absolute reference; epoch 3 applied only to the clone. Oracled —
    the diverged clone must equal the plain full replay while the source
    stays at epoch 2 (asserted in the callable)."""
    from dbt_customer360_ray.pipelines.cdc_replay import cloned_lake

    return cloned_lake(sf=0.01)


def _cdc_masked_lake(sf_dir: str):
    """Dynamic data masking: metadata-committed column masks applied at every
    serving read — text hash-tokenized (md5, still joinable), tool redacted.
    Oracled against the plain replay with the same masks in SQL."""
    from dbt_customer360_ray.pipelines.cdc_replay import masked_lake

    return masked_lake(sf=0.01)


def _cdc_hot_keys(sf_dir: str):
    """Skew handling made driver-visible: a planted heavy conversation must
    be detected (exact prepass histogram) and recorded in the manifest as a
    hot key (then salted across sub-partitions). Oracled against the exact
    share computation over the same derived epoch."""
    from dbt_customer360_ray.pipelines.cdc_replay import hot_keys_lake

    return hot_keys_lake(sf=0.01)


def _cdc_expired_lake(sf_dir: str):
    """Snapshot expiry (Iceberg expire_snapshots): version log trimmed to
    CURRENT + vacuum — serving reads unchanged (oracled against the plain
    replay), sub-horizon time travel raises (asserted), fsck clean."""
    from dbt_customer360_ray.pipelines.cdc_replay import expired_lake

    return expired_lake(sf=0.01)


def _cdc_purged_lake(sf_dir: str):
    """GDPR erasure: purge list filtered at EVERY read surface (incl. time
    travel, change feed, export, SFT assembly) plus bloom-targeted physical
    rewrite of the owner partition's live runs (asserted in the callable).
    Oracled against the plain replay minus the purged conversations."""
    from dbt_customer360_ray.pipelines.cdc_replay import purged_lake

    return purged_lake(sf=0.01)


def _cdc_row_policy_lake(sf_dir: str):
    """Row access policy: constraint-shaped predicate hides system-role turns
    at every serving read (CHECK semantics — only definitively-FALSE rows
    drop). Oracled against the filtered plain replay."""
    from dbt_customer360_ray.pipelines.cdc_replay import row_policy_lake

    return row_policy_lake(sf=0.01)


def _cdc_branch_merged(sf_dir: str):
    """Branch merge (the git-merge face of CLONE): parent and clone apply
    disjoint epochs, then ``merge_branch`` unions live runs by reference —
    metadata-only, LWW resolves cross-branch rows — and the branch's epochs
    become committed on the parent (exactly-once survives the merge; the
    callable asserts a re-apply fully dedupes). Oracled against the plain
    full replay."""
    from dbt_customer360_ray.pipelines.cdc_replay import branch_merged_lake

    return branch_merged_lake(sf=0.01)


def _cdc_temporal_join(sf_dir: str):
    """Flink-style temporal table join: probe rows (key, as_of-epoch)
    enriched with the SCD2 dimension version valid AT that epoch — keys
    absent or deleted then come back NULL with matched=false. Only the probe
    side shuffles; each partition runs one sorted merge_asof against its
    local history runs. Oracled — per-epoch prefix states LEFT JOINed in
    SQL."""
    from dbt_customer360_ray.pipelines.cdc_replay import temporal_joined

    return temporal_joined(sf=0.01)


def _cdc_scd2_history(sf_dir: str):
    """SCD2 history view (the dbt-snapshot analogue): one snapshot-diff per
    epoch appended to a co-partitioned store, versions finalized at read with
    LEAD validity ranges. Oracled — scd2_oracle_sql re-derives every version
    from per-epoch prefix states with LAG change detection."""
    from dbt_customer360_ray.pipelines.cdc_replay import scd2_history

    return scd2_history(sf=0.01)


def _cdc_late_quarantined(sf_dir: str):
    """Lateness watermark: events below (watermark − 30 min) at apply time are
    quarantined as 'too_late' instead of applied. Oracled —
    late_quarantine_oracle_sql unrolls the per-epoch watermark in SQL."""
    from dbt_customer360_ray.pipelines.cdc_replay import late_quarantined_lake

    return late_quarantined_lake(sf=0.01)


def _cdc_resharded_lake(sf_dir: str):
    """Lake reshard: rewrite the replayed lake from 32 to 11 partitions in one
    hash-shuffle pass (tombstones and checkpoints carried), then read the new
    lake. Oracled — the converged state must be partition-count invariant, so
    the oracle is the plain replay oracle."""
    import tempfile

    from dbt_customer360_ray.pipelines.cdc_replay import replayed_lake

    lake = replayed_lake(sf=0.01)
    dest = lake.reshard(tempfile.mkdtemp(prefix="resharded-") + "/lake", 11)
    return dest.read()


def _cdc_change_feed_images(sf_dir: str):
    """Change feed with pre-images (Delta CDF update_preimage flattened onto
    the row as old_* columns): epoch-0 → epoch-2 deltas where every update and
    delete also carries the value it replaced. Oracled —
    change_feed_images_oracle_sql surfaces the FROM side of the same join."""
    from dbt_customer360_ray.pipelines.cdc_replay import replayed_lake

    return replayed_lake(sf=0.01).change_feed(
        from_epoch=0, to_epoch=2, include_preimage=True
    )


def _cdc_patch_change_feed(sf_dir: str):
    """Change feed over the PATCH-mode lake (epochs 0 → 2): the per-partition
    diff resolves BOTH snapshots with column-level LWW before classifying.
    Oracled — two nested patch oracles full-outer-joined in SQL."""
    from dbt_customer360_ray.pipelines.cdc_replay import patched_lake

    return patched_lake().change_feed(from_epoch=0, to_epoch=2)


def _cdc_offset_travel(sf_dir: str):
    """Binlog-position time travel: read the lake as of epoch 1's committed
    offset watermark (the coordinate a CDC consumer actually has). Must equal
    the epoch-1 snapshot, so the oracle is the epoch-1 prefix replay."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from dbt_customer360_ray.pipelines.cdc_replay import changes_fixture, replayed_lake

    fx = changes_fixture(0.01)
    w = int(pc.max(pq.read_table(fx["paths"][1], columns=["offset"]).column("offset")).as_py())
    return replayed_lake(sf=0.01).read_as_of(offset=w)


def _cdc_redelivered_lake(sf_dir: str):
    """Exactly-once under at-least-once delivery: epochs 1-2's files are
    re-delivered under NEW epoch ids after the full replay (producer retry
    after a lost ack); offset checkpoints dedup every row. Oracled — the
    state must equal the plain replay oracle."""
    from dbt_customer360_ray.pipelines.cdc_replay import redelivered_lake

    return redelivered_lake(sf=0.01).read()


def _cdc_patch_lake(sf_dir: str):
    """Patch-mode lake (partial-image upserts, column-level LWW — Debezium
    TOAST / Cassandra-cell semantics): 45% of the fixture's updates are 'P'
    events whose null payload columns mean "unchanged". Oracled —
    patch_oracle_sql re-derives column-level LWW with one QUALIFY per column;
    gen.oracle_patch_lake is a third, sequential-application derivation used in
    tests."""
    from dbt_customer360_ray.pipelines.cdc_replay import patched_lake

    return patched_lake().read()


def _cdc_clustered_lake(sf_dir: str):
    """OPTIMIZE ZORDER: full replay into a fresh lake, then every partition's
    runs merged and rewritten as Morton-ordered (key, ts) multi-file runs —
    the per-run ts stats and key blooms then prune inside a partition. Oracled
    — serving content is layout-invariant, so the plain replay oracle must
    hold (same contract the reshard entry pins)."""
    from dbt_customer360_ray.pipelines.cdc_replay import clustered_lake

    return clustered_lake(sf=0.01).read()


def _cdc_restored_lake(sf_dir: str):
    """Delta-style RESTORE: full 4-epoch replay into a fresh lake, roll back to
    epoch 1's snapshot as a NEW commit (run files shared, checkpoints rolled
    back for resume), read the rolled-back state. Oracled — rollback must equal
    the epoch-1 time-travel read, i.e. the prefix replay in SQL."""
    from dbt_customer360_ray.pipelines.cdc_replay import restored_lake

    return restored_lake(sf=0.01, epoch=1).read()


def _cdc_txn_lake(sf_dir: str):
    """Transaction-boundary atomicity: replay epochs 0-2 of the txn-metadata
    fixture — only COMPLETE upstream transactions are visible; boundary-cut
    ones are parked in the manifest-committed pending sidecar. Oracled —
    txn_oracle_sql re-derives the complete-transactions-only LWW state."""
    from dbt_customer360_ray.pipelines.cdc_replay import txn_lake

    return txn_lake(sf=0.01, upto=2)


def _cdc_consumer_feed(sf_dir: str):
    """Named change-feed consumer (CDC-out consumer group): consume + ACK the
    epochs-0-1 window, apply epochs 2-3, return the next window. Oracled —
    change_feed_oracle_sql(from_epoch=1, to_epoch=3) re-derives it."""
    from dbt_customer360_ray.pipelines.cdc_replay import consumer_feed

    return consumer_feed(sf=0.01)


def _stream_txn_lake(sf_dir: str):
    """Streaming actor-pool ingest under TRANSACTION-BOUNDARY atomicity: the
    txn-metadata fixture's epochs 0-2 tailed as micro-batches with mid-stream
    checkpoints — boundary-cut transactions hold back driver-side, persist as
    pending sidecars at checkpoints, and release when complete. Oracled — the
    SAME txn_oracle_sql as the epoch-path entry (the two ingest paths must
    converge to the identical complete-transactions-only state)."""
    import tempfile

    import numpy as np
    import pyarrow.parquet as pq

    from dbt_customer360_ray.pipelines.cdc_replay import _txn_epoch_paths
    from dbt_customer360_ray.state.engine import CdcLake
    from dbt_customer360_ray.state.streaming import StreamingSession

    lake = CdcLake(tempfile.mkdtemp(prefix="stream-txn-lake-"), num_partitions=16)
    sess = StreamingSession(lake, pool_size=4, txn_boundaries=True)
    for path in _txn_epoch_paths(0.01)[:3]:
        changes = pq.read_table(path)
        bounds = np.linspace(0, changes.num_rows, 4).astype(int)
        for i in range(3):
            sess.ingest(changes.slice(bounds[i], bounds[i + 1] - bounds[i]))
        sess.checkpoint()
    sess.close()
    return lake.read_local_table()


def _cdc_renamed_lake(sf_dir: str):
    """Column-mapping evolution (RENAME COLUMN as a metadata-only commit):
    replay all-but-last fixture epoch, rename tool → tool_label, apply the
    last epoch under the NEW name. Oracled — renamed_oracle_sql replays the
    ORIGINAL fixture and aliases the projection, since a rename rewrites no
    data."""
    from dbt_customer360_ray.pipelines.cdc_replay import renamed_lake

    return renamed_lake(sf=0.01)


def _cdc_conversation_headers(sf_dir: str):
    """Per-conversation summary rows (the org-header analogue of SURVEY §7.0)
    computed shuffle-free per partition on the replayed lake."""
    from dbt_customer360_ray.pipelines.cdc_replay import replayed_lake

    return replayed_lake(sf=0.01).conversation_headers()


def _cdc_lookup_conversation(sf_dir: str):
    """Point lookup on the replayed lake: one conversation's converged turns
    read from ONLY its owner partition's runs (no scan)."""
    from dbt_customer360_ray.pipelines.cdc_replay import replayed_lake

    return replayed_lake(sf=0.01).lookup("conv-00000002")


def _cdc_assistant_view(sf_dir: str):
    """Incremental materialized view: a derived lake holding only assistant
    turns, maintained epoch-by-epoch from the source lake's change feed
    through the same exactly-once sink. Oracled — the view state must equal
    the filtered converged source state."""
    import tempfile

    from dbt_customer360_ray.pipelines.cdc_replay import replayed_lake
    from dbt_customer360_ray.state.engine import CdcLake
    from dbt_customer360_ray.state.views import sync_view

    src = replayed_lake(sf=0.01)
    dst = CdcLake(tempfile.mkdtemp(prefix="view-lake-"), num_partitions=16)
    sync_view(src, dst, keep=lambda df: df["role"].eq("assistant"))
    return dst.read(columns=["role", "text", "tool", "src_ts"])


def _cdc_incremental_headers(sf_dir: str):
    """Incremental AGGREGATE view (IVM by dirty keys): per-conversation
    headers maintained epoch-by-epoch from the change feed — only touched
    conversations recompute. Oracled — the maintained table must equal a full
    header aggregate over the converged source state."""
    import tempfile

    from dbt_customer360_ray.pipelines.cdc_replay import replayed_lake
    from dbt_customer360_ray.state.engine import CdcLake
    from dbt_customer360_ray.state.views import sync_headers_view

    src = replayed_lake(sf=0.01)
    dst = CdcLake(tempfile.mkdtemp(prefix="hdr-view-") + "/lake", num_partitions=16)
    sync_headers_view(src, dst)
    return dst.read().drop_columns(["turn_idx", "ts"])


def _cdc_multitable_transcripts(sf_dir: str):
    """Multi-table binlog routing: the interleaved two-table stream replayed
    through MultiTableLake; the transcripts table's converged state (its own
    schema, checkpoints, manifest — offset dedup unaffected by the split)."""
    from dbt_customer360_ray.pipelines.cdc_replay import multitable_lake

    return multitable_lake().lake("transcripts").read(
        columns=["role", "text", "tool", "ts"]
    )


def _cdc_multitable_meta(sf_dir: str):
    """The same multi-table replay, conv_meta side: per-conversation
    title/status upserts keyed on (conv_id, turn_idx=0)."""
    from dbt_customer360_ray.pipelines.cdc_replay import multitable_lake

    return multitable_lake().lake("conv_meta").read(
        columns=["title", "status", "ts"]
    )


def _cdc_computed_lake(sf_dir: str):
    """Generated columns (GENERATED ALWAYS AS): the lake derives
    length/lower/token_count columns from text at ingest — vectorized in the
    shuffle-map task, stored with the row, versioned. Oracled —
    computed_oracle_sql applies the same deterministic expressions to the
    converged winners in SQL."""
    from dbt_customer360_ray.pipelines.cdc_replay import computed_lake

    return computed_lake(sf=0.01)


def _cdc_jsonl_roundtrip(sf_dir: str):
    """CDC-out egress round trip: export the replayed lake's change feed as
    Debezium-style JSONL in two position segments (0→epoch1, epoch1→latest),
    re-ingest both through read_debezium_jsonl into a FRESH lake — the
    reconstructed state must equal the original replay, so the oracle is the
    plain replay oracle. Exercises egress struct assembly, monotone position
    segments, update/delete envelopes, and decode symmetry end to end."""
    import tempfile

    from dbt_customer360_ray.pipelines.cdc_replay import replayed_lake
    from dbt_customer360_ray.sources.binlog_json import (
        export_change_feed_jsonl,
        read_debezium_jsonl,
    )
    from dbt_customer360_ray.state.engine import CdcLake

    lake = replayed_lake(sf=0.01)
    d1 = export_change_feed_jsonl(
        lake, tempfile.mkdtemp(prefix="egress1-"), pos_base=1 << 41,
        from_version=0, to_epoch=1,
    )
    d2 = export_change_feed_jsonl(
        lake, tempfile.mkdtemp(prefix="egress2-"), pos_base=2 << 41,
        from_epoch=1, to_epoch=lake.manifest.last_epoch,
    )
    schema = lake._event_schema()
    rt = CdcLake(tempfile.mkdtemp(prefix="rt-") + "/lake", num_partitions=32)
    rt.apply(read_debezium_jsonl(d1, schema=schema))
    rt.apply(read_debezium_jsonl(d2, schema=schema))
    return rt.read()


def _cdc_window_counts(sf_dir: str):
    """Tumbling event-time windows with watermark finalization: per-(window,
    op) counts of applied change events, folded additively into the manifest
    from each applier's per-batch partials; windows whose end is at or below
    (watermark − allowed lateness) are final — no event that could still
    arrive can land in them (it would be quarantined as too_late). Oracled —
    window_counts_oracle_sql unrolls the per-epoch lateness cutoffs, dedups
    first-delivery per offset, groups by window in SQL."""
    from dbt_customer360_ray.pipelines.cdc_replay import windowed_lake

    return windowed_lake(sf=0.01)


def _cdc_join_view(sf_dir: str):
    """Incrementally-maintained JOIN view (two-source IVM): transcripts LEFT
    JOIN conv_meta ON conv_id, re-synced after every multi-table epoch from
    both change feeds — per-epoch work O(touched conversations), never
    O(lake). Oracled — multitable_join_oracle_sql joins the two converged
    states in SQL."""
    from dbt_customer360_ray.pipelines.cdc_replay import multitable_join_lake
    from dbt_customer360_ray.state.views import read_join_view

    return read_join_view(multitable_join_lake())


def _cdc_deadletter(sf_dir: str):
    """Dead-letter queue, oracle-checked: replay the deterministically
    corrupted fixture and return the quarantined rows + reasons; the oracle
    re-derives the same set from the same parquet with the engine's reason
    priority in SQL."""
    import tempfile

    import ray.data

    from dbt_customer360_ray.pipelines.cdc_replay import dlq_fixture_path
    from dbt_customer360_ray.state.engine import CdcLake

    lake = CdcLake(tempfile.mkdtemp(prefix="dlq-lake-"), num_partitions=16)
    lake.apply(ray.data.read_parquet(dlq_fixture_path()))
    return lake.read_deadletter()


def _cdc_constrained_lake(sf_dir: str):
    """Table constraints (Delta-style ADD CONSTRAINT): a fresh lake declares
    CHECK / accepted-values / regex constraints BEFORE replay; violating I/U
    events are quarantined at the shuffle-map (reason ``chk:<name>``), so the
    converged state holds only passing rows. Oracled —
    constrained_oracle_sql is the LWW replay over constraint-passing events."""
    from dbt_customer360_ray.pipelines.cdc_replay import constrained_lake

    return constrained_lake(sf=0.01).read()


def _cdc_constraint_dlq(sf_dir: str):
    """The constrained lake's dead-letter queue: every constraint-violating
    event with the first-declared-violation reason. Oracled —
    constraint_dlq_oracle_sql re-derives the set + CASE reasons in SQL."""
    from dbt_customer360_ray.pipelines.cdc_replay import constrained_lake

    return constrained_lake(sf=0.01).read_deadletter()


def _cdc_analyze(sf_dir: str):
    """ANALYZE TABLE: per-column exact live/null counts + deterministic KMV
    distinct estimates (≤k hashes per column leave each partition). Oracled —
    the same md5 bottom-k estimator reproduced per column in SQL."""
    from dbt_customer360_ray.pipelines.cdc_replay import analyzed_lake

    return analyzed_lake(sf=0.01)


def _cdc_fk_lake(sf_dir: str):
    """Cross-lake FOREIGN KEY at ingest: the child lake replays under
    FK(conv_id) REFERENCES a parent loaded with epoch 0 only — the CDC
    analogue of dbt's relationships test. Oracled — the plain replay over
    only referentially-valid events."""
    from dbt_customer360_ray.pipelines.cdc_replay import fk_constrained_lake

    return fk_constrained_lake(sf=0.01)


def _cdc_fk_dlq(sf_dir: str):
    """The FK child's DLQ: rejected events with fk:<name> reasons. Oracled —
    the violating set re-derived via NOT IN the parent's live conv subquery."""
    from dbt_customer360_ray.pipelines.cdc_replay import fk_deadletter

    return fk_deadletter(sf=0.01)


def _lang_quality_documents(sf_dir: str):
    from dbt_customer360_ray.sources.readers import read_table
    from dbt_customer360_ray.stages.text import analyze_text

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], rows_per_block=2_048)
    return analyze_text(ds).select_columns(
        ["doc_id", "lang_pred", "stopword_ratio", "mean_word_len", "punct_ratio", "quality_score"]
    )


def _lm_fluency_documents(sf_dir: str):
    """CCNet-analogue LM quality score: mean conditional bigram frequency in
    permille, all-integer (division-only, no log) so it is bit-exact at any
    cluster size. Two count passes + a map-only scoring pass."""
    from dbt_customer360_ray.sources.readers import read_table
    from dbt_customer360_ray.stages.text import lm_fluency

    return lm_fluency(read_table(sf_dir, "documents", columns=["doc_id", "text"]))


_MIX_WEIGHTS = {f"src{i}": i + 1 for i in range(18)}  # src18/src19 dropped


def _mixed_corpus_documents(sf_dir: str):
    """Deterministic corpus mixing (Pile/Gopher source weighting): integer
    rate grid from per-source counts, md5-permille keep — the identical row
    set at any cluster size. Unweighted sources drop entirely."""
    from dbt_customer360_ray.sources.readers import read_table
    from dbt_customer360_ray.stages.sampling import mix_to_proportions

    return mix_to_proportions(
        read_table(sf_dir, "documents"), "doc_id", "source", _MIX_WEIGHTS
    )


def _temperature_mix_documents(sf_dir: str):
    """Temperature/alpha-sampling corpus mixing (multilingual-training
    recipe, alpha=0.5): per-source weights n_s^alpha derived by ONE
    quantized transcendental per source from the same count pass, then the
    shared integer rate grid — oracled end to end including the weight
    derivation."""
    from dbt_customer360_ray.sources.readers import read_table
    from dbt_customer360_ray.stages.sampling import temperature_mix

    return temperature_mix(
        read_table(sf_dir, "documents"), "doc_id", "source", alpha_pm=500
    )


def _bpe_encoded_documents(sf_dir: str):
    """BPE tokenizer induction (Sennrich 2016): distributed word counts →
    deterministic driver merge loop (count DESC, pair ASC ties) → map-only
    encode. Training is iterative re-segmentation — not SQL-expressible, so
    this entry is rows-only; determinism is pinned by tests (distributed ==
    no-Ray twin, layout-independent)."""
    from dbt_customer360_ray.sources.readers import read_table
    from dbt_customer360_ray.stages.bpe import encode_bpe, train_bpe

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    merges = train_bpe(ds, num_merges=60)
    return encode_bpe(ds, merges)


_DSIR_TARGET = ("src0", "src1", "src2")
_BM25_QUERY = ("hash", "merge", "scan", "batch")


def _nb_classified_documents(sf_dir: str):
    """Hashed naive-Bayes domain classifier (the fastText-style curation
    filter, closed-form counts): one count pass + one broadcast argmax pass,
    all-integer scores — bit-exact at any cluster size."""
    from dbt_customer360_ray.sources.readers import read_table
    from dbt_customer360_ray.stages.dsir import nb_classify

    ds = read_table(
        sf_dir, "documents", columns=["doc_id", "text", "source"],
        rows_per_block=2_048,
    )
    return nb_classify(ds)


def _knn_graph_embeddings(sf_dir: str):
    """Exact cosine k-NN graph (no self edges): object-store block-pair tiles,
    per-tile partial top-k, one groupby merge under the same total order —
    the neighbourhood input for graph-based curation."""
    from dbt_customer360_ray.sources.readers import read_table
    from dbt_customer360_ray.stages.similarity import knn_graph

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return knn_graph(ds, k=5)


def _knn_graph_lsh_embeddings(sf_dir: str):
    """APPROXIMATE k-NN graph — the bucketed 100 TB scale path: candidates
    only within shared hyperplane-LSH buckets (any of 4 seeded tables, jumbo
    buckets tiled), per-tile partial top-k, one groupby merge. Deterministic
    given the seeded planes, so the approximate answer itself is oracled."""
    from dbt_customer360_ray.sources.readers import read_table
    from dbt_customer360_ray.stages.similarity import knn_graph_lsh

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return knn_graph_lsh(ds, k=5, dim=64)


def _bfs_hops_lsh_embeddings(sf_dir: str):
    """Multi-source BFS hop distance over the BUCKETED approximate k-NN
    graph — the graph family consuming the LSH edge table unchanged via
    ``edges=`` (the at-scale composition; the exact-knn entries keep the
    O(N²)-tile shape for parity with the exact oracle)."""
    from dbt_customer360_ray.sources.readers import read_table
    from dbt_customer360_ray.stages.similarity import bfs_hops, knn_graph_lsh

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    edges = knn_graph_lsh(ds, k=5, dim=64)
    return bfs_hops(ds, k=5, max_hops=3, seed_permille=40, edges=edges)


def _triangle_stats_lsh_embeddings(sf_dir: str):
    """Triangle count + clustering coefficient over the BUCKETED approximate
    k-NN graph (edges= composition; the at-scale graph shape)."""
    from dbt_customer360_ray.sources.readers import read_table
    from dbt_customer360_ray.stages.similarity import knn_graph_lsh, triangle_stats

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return triangle_stats(ds, k=5, edges=knn_graph_lsh(ds, k=5, dim=64))


def _label_propagated_lsh_embeddings(sf_dir: str):
    """Seed-label propagation over the BUCKETED approximate k-NN graph."""
    from dbt_customer360_ray.sources.readers import read_table
    from dbt_customer360_ray.stages.similarity import knn_graph_lsh, label_propagate

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    edges = knn_graph_lsh(
        ds.select_columns(["vec_id", "embedding"]), k=5, dim=64
    )
    return label_propagate(ds, k=5, edges=edges)


def _pagerank_lsh_embeddings(sf_dir: str):
    """PageRank centrality over the BUCKETED approximate k-NN graph — the
    last graph op to gain an LSH-fed driver path (r4 VERDICT Next #2); the
    power-iteration rounds consume the LSH edge table unchanged via
    ``edges=`` (same schema/total order as the exact graph)."""
    from dbt_customer360_ray.sources.readers import read_table
    from dbt_customer360_ray.stages.similarity import knn_graph_lsh, pagerank

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return pagerank(ds, k=5, iters=3, edges=knn_graph_lsh(ds, k=5, dim=64))


def _adamic_adar_lsh_embeddings(sf_dir: str):
    """Adamic-Adar link prediction over the BUCKETED approximate k-NN graph
    (edges= composition — the at-scale shape for the open-wedge exchange)."""
    from dbt_customer360_ray.sources.readers import read_table
    from dbt_customer360_ray.stages.similarity import adamic_adar, knn_graph_lsh

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return adamic_adar(ds, k=5, edges=knn_graph_lsh(ds, k=5, dim=64))


def _semantic_decontaminate_embeddings(sf_dir: str):
    """Embedding-space decontamination: the md5-permille test split plays the
    benchmark set (broadcast once), one map-only matmul pass flags training
    vectors with a too-close eval witness — the fuzzy companion to n-gram
    decontamination."""
    from dbt_customer360_ray.sources.readers import read_table
    from dbt_customer360_ray.stages.decontaminate import semantic_decontaminate
    from dbt_customer360_ray.stages.sampling import _bucket_of

    import numpy as _np

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def _is_eval(df):
        return _bucket_of(df["vec_id"].to_numpy(), "split") < 100

    # eval split is small by design (10%) and must be broadcast anyway; the
    # TRAIN side stays a streaming Dataset — never collected
    eval_side = (
        ds.map_batches(lambda df: df[_is_eval(df)], batch_format="pandas")
        .to_pandas()
    )
    train = ds.map_batches(lambda df: df[~_is_eval(df)], batch_format="pandas")
    return semantic_decontaminate(
        train,
        _np.stack(eval_side["embedding"].to_numpy()),
        eval_side["vec_id"].to_numpy(),
        threshold=0.3,
    )


def _bfs_hops_embeddings(sf_dir: str):
    """Multi-source BFS hop distance over the undirected exact k-NN graph:
    md5-permille seeds at hops=0, everyone else the minimum hops to any seed
    (≤3, unreached omitted) — frontier expansion as the pagerank-style bucket
    exchange. Oracled against a DuckDB RECURSIVE CTE over the same edges."""
    from dbt_customer360_ray.sources.readers import read_table
    from dbt_customer360_ray.stages.similarity import bfs_hops

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return bfs_hops(ds, k=5, max_hops=3, seed_permille=40)


def _triangle_stats_embeddings(sf_dir: str):
    """Per-node triangle count + permille clustering coefficient over the
    undirected exact k-NN graph: distinct edges → per-node wedges (linear in N
    for fixed k) → one hash-shuffle wedge⋈edge closure join. The cluster-
    density signal that separates templated duplicate families from bridge
    nodes; integer floors end-to-end so SQL agrees bit-for-bit."""
    from dbt_customer360_ray.sources.readers import read_table
    from dbt_customer360_ray.stages.similarity import triangle_stats

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return triangle_stats(ds, k=5)


def _adamic_adar_embeddings(sf_dir: str):
    """Adamic-Adar link prediction over the undirected k-NN graph: every
    open wedge pair scored Σ 1/ln(deg(common neighbour)) — ln quantized to
    int64 at 1e6 scale, contributions floor-divided, sums exact — via the
    triangle exchange with the closure test inverted. Oracled bit-for-bit."""
    from dbt_customer360_ray.sources.readers import read_table
    from dbt_customer360_ray.stages.similarity import adamic_adar

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return adamic_adar(ds, k=5)


def _pagerank_embeddings(sf_dir: str):
    """PageRank centrality over the exact cosine k-NN graph: 3 power-iteration
    rounds in pure integer arithmetic (ranks at 1e9 scale, permille damping,
    floor divisions) so the distributed join+groupby rounds agree bit-for-bit
    with the unrolled SQL mirror. Rank state stays a Dataset — O(N) rows,
    never collected."""
    from dbt_customer360_ray.sources.readers import read_table
    from dbt_customer360_ray.stages.similarity import pagerank

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return pagerank(ds, k=5, iters=3)


def _label_propagated_embeddings(sf_dir: str):
    """One-hop label propagation: md5-permille seed subset keeps its label,
    everyone else majority-votes over its top-k seed neighbours — the k-NN
    graph composed with the hash-split recipe, fully deterministic."""
    from dbt_customer360_ray.sources.readers import read_table
    from dbt_customer360_ray.stages.similarity import label_propagate

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "label", "embedding"])
    return label_propagate(ds, k=5)


def _hard_negatives_embeddings(sf_dir: str):
    """Contrastive hard-negative mining: top-k most-similar DIFFERENT-label
    neighbours per vector — same tile/merge shape as the k-NN graph with the
    same-label mask applied inside the tile."""
    from dbt_customer360_ray.sources.readers import read_table
    from dbt_customer360_ray.stages.similarity import hard_negatives

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "label", "embedding"])
    return hard_negatives(ds, k=5)


def _bm25_topk_documents(sf_dir: str):
    """BM25 ranked retrieval for a fixed query-term bag: one stats pass
    (partial df/length totals, O(|query|) driver combine), one broadcast
    scoring pass with per-batch partial top-k — integer-exact scores, no
    shuffle."""
    from dbt_customer360_ray.sources.readers import read_table
    from dbt_customer360_ray.stages.text import bm25_topk

    ds = read_table(
        sf_dir, "documents", columns=["doc_id", "text"], rows_per_block=2_048
    )
    return bm25_topk(ds, _BM25_QUERY, k=20)


def _dsir_selected_documents(sf_dir: str):
    """DSIR data selection (Xie et al. 2023): hashed unigram+bigram
    log-likelihood-ratio importance weights toward a target-domain subset,
    quantized to int64 so the top-k is bit-exact at any cluster size. Two
    map-only passes + an O(buckets) driver combine — no shuffle."""
    from dbt_customer360_ray.sources.readers import read_table
    from dbt_customer360_ray.stages.dsir import dsir_select

    ds = read_table(
        sf_dir, "documents", columns=["doc_id", "text", "source"],
        rows_per_block=2_048,
    )
    return dsir_select(ds, _DSIR_TARGET, k=100)


def _gopher_rules_documents(sf_dir: str):
    """Gopher quality rules (word-level subset): integer-algebra thresholds so
    every boolean is bit-exact vs the SQL oracle. Map-only, zero-copy Arrow."""
    from dbt_customer360_ray.sources.readers import read_table
    from dbt_customer360_ray.stages.text import gopher_rules

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], rows_per_block=2_048)
    return ds.map_batches(gopher_rules, batch_format="pyarrow", zero_copy_batch=True)


def _window_dedup_documents(sf_dir: str):
    """C4-style duplicate-span removal at 10-token window grain: every distinct
    span survives only at its first corpus occurrence; documents reassemble
    from surviving spans. Two shuffles (span keep-first, per-doc reassembly)."""
    from dbt_customer360_ray.sources.readers import read_table
    from dbt_customer360_ray.stages.dedup import window_dedup

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], rows_per_block=2_048)
    return window_dedup(ds)


def _quota_sample_documents(sf_dir: str):
    """Per-source quota sampling (corpus balancing): the 10 smallest-md5 docs
    per source, chosen identically at any cluster size. Combiner + tiny final."""
    from dbt_customer360_ray.sources.readers import read_table
    from dbt_customer360_ray.stages.sampling import quota_sample

    ds = read_table(sf_dir, "documents", columns=["doc_id", "source"], rows_per_block=2_048)
    return quota_sample(ds, quota=10)


def _repetition_documents(sf_dir: str):
    """Gopher-style repetition quality stats + keep flag, map-only (per-doc
    aggregates need no shuffle)."""
    from dbt_customer360_ray.sources.readers import read_table
    from dbt_customer360_ray.stages.text import repetition_stats

    return repetition_stats(read_table(sf_dir, "documents", columns=["doc_id", "text"]))


def _vocab_documents(sf_dir: str):
    """Corpus vocabulary ranked by (count DESC, term ASC): one partial-count
    pass + an O(vocabulary) driver combine."""
    from dbt_customer360_ray.sources.readers import read_table
    from dbt_customer360_ray.stages.text import build_vocab

    return build_vocab(read_table(sf_dir, "documents", columns=["doc_id", "text"]))


def _megatron_export_documents(sf_dir: str):
    """Indexed-binary token egress (Megatron-LM indexed_dataset shape): encode
    against the corpus vocab, write sharded .bin token streams + parquet
    indexes atomically (resume skips finished shards), then PARSE THE BYTES
    BACK — the driver oracles the egress bytes themselves against the
    tokenization SQL (same contract as the SFT JSONL entry)."""
    import tempfile

    from dbt_customer360_ray.sources.readers import read_table
    from dbt_customer360_ray.sources.sinks import export_token_bin, read_token_bin
    from dbt_customer360_ray.stages.text import build_vocab, encode_documents

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    dest = tempfile.mkdtemp(prefix="token-bin-") + "/out"
    export_token_bin(encode_documents(ds, build_vocab(ds)), dest)
    return read_token_bin(dest)


def _encoded_documents(sf_dir: str):
    """Token-ID encoding against the corpus-built vocab (broadcast dict, OOV→0),
    order-preserving — exploded (doc, ord, token_id) rows for hash comparison;
    the list<int32> training-sink form is ``encode_documents`` (unit-tested
    equivalent)."""
    from dbt_customer360_ray.sources.readers import read_table
    from dbt_customer360_ray.stages.text import build_vocab, encode_documents_flat

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return encode_documents_flat(ds, build_vocab(ds))


def _curated_documents(sf_dir: str):
    """Flagship composed training-data pipeline: language filter → quality
    filter → exact-dup keeper, oracle-checked end to end (the resumable
    sharded sink side is exercised by tests/test_curate.py)."""
    from dbt_customer360_ray.pipelines.curate import curate_documents
    from dbt_customer360_ray.sources.readers import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], rows_per_block=2_048)
    return curate_documents(ds)


def _fineweb_audit_documents(sf_dir: str):
    """FineWeb-style curation audit: one row per document with per-stage
    verdicts (lang, Gopher quality, repetition, exact keeper, near-dup
    keeper) and their conjunction — the removal-attribution table those
    pipelines publish as ablations. Each verdict column is reproduced by its
    stage's own oracle SQL, composed."""
    from dbt_customer360_ray.pipelines.curate import fineweb_audit
    from dbt_customer360_ray.sources.readers import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], rows_per_block=2_048)
    return fineweb_audit(ds)


def _minhash_near_dups(sf_dir: str):
    """Near-dup groups: MinHash+LSH candidates → exact shingle-Jaccard verify
    → connected components (driver union-find under 100k pairs, distributed
    min-label propagation above). Oracled by an all-pairs SQL equivalent."""
    from dbt_customer360_ray.sources.readers import read_table
    from dbt_customer360_ray.stages.dedup import dup_groups, verified_near_dup_pairs

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], rows_per_block=2_048)
    return dup_groups(verified_near_dup_pairs(ds, jaccard_threshold=0.8))


def _canonical_documents(sf_dir: str):
    """Keep-best near-dup canonicalization: every doc mapped to its group's
    most-complete member (most tokens, tie lowest id); singletons to
    themselves."""
    from dbt_customer360_ray.sources.readers import read_table
    from dbt_customer360_ray.stages.dedup import canonicalize_near_dups

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], rows_per_block=2_048)
    return canonicalize_near_dups(ds)


def _simhash_documents(sf_dir: str):
    from dbt_customer360_ray.sources.readers import read_table
    from dbt_customer360_ray.stages.dedup import simhash_signatures

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], rows_per_block=2_048)
    return simhash_signatures(ds)


def _embedding_near_dups(sf_dir: str):
    """Exact cosine pairs via distributed block-pair tiles; the cosine value
    itself is float-representation-dependent, so only pair ids are emitted
    (and oracle-compared)."""
    from dbt_customer360_ray.sources.readers import read_table
    from dbt_customer360_ray.stages.dedup import embedding_near_dups

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return embedding_near_dups(ds, threshold=0.3).select_columns(["id_a", "id_b"])


def _embedding_lsh_near_dups(sf_dir: str):
    """Approximate (bucketed-LSH) cosine near-dup pairs — the 100 TB scale path
    for embedding dedup. Deterministic given the seeded planes, so the
    approximate answer itself is oracled (same planes inlined in SQL)."""
    from dbt_customer360_ray.sources.readers import read_table
    from dbt_customer360_ray.stages.dedup import embedding_near_dups_lsh

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return embedding_near_dups_lsh(ds, threshold=0.3, dim=64).select_columns(
        ["id_a", "id_b"]
    )


def _lsh_topk_embeddings(sf_dir: str):
    import numpy as np
    import pyarrow.compute as pc

    from dbt_customer360_ray.sources.readers import read_table, read_table_arrow
    from dbt_customer360_ray.stages.similarity import lsh_bucket_topk

    emb = read_table_arrow(sf_dir, "embeddings", ["vec_id", "embedding"])
    order = pc.sort_indices(emb, sort_keys=[("vec_id", "ascending")])
    head = emb.take(order).slice(0, 5)
    q_ids = head.column("vec_id").to_numpy()
    q_mat = np.stack(head.column("embedding").to_pylist())
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"], rows_per_block=2_048)
    return lsh_bucket_topk(ds, q_mat, q_ids, dim=q_mat.shape[1], k=10)


_C360_CACHE: dict = {}


def _c360_n(sf_dir: str) -> int:
    """Pinned to the oracle fixture scale (c360_oracle.ORACLE_N) so the engine
    query and the oracle SQL read the SAME fixture parquet at every sf_dir —
    the same pattern as _cdc_replay_lake pinning sf=0.01. (Scale coverage of
    the DAG itself lives in bench.py / tests, not the correctness gate.)"""
    from dbt_customer360_ray.pipelines.c360_oracle import ORACLE_N

    return ORACLE_N


def _conform_c360(df):
    """Output-boundary dtype alignment with the DuckDB oracle: nullable Int64
    ids hash as float64 (DuckDB NULL-able BIGINT → float64 in pandas), and all
    timestamps as microseconds."""
    df = df.copy()
    for c in df.columns:
        dt = str(df[c].dtype)
        if dt in ("Int64", "Int32"):
            df[c] = df[c].astype("float64")
        elif dt.startswith("datetime64") and dt != "datetime64[us]":
            df[c] = df[c].astype("datetime64[us]")
    return df


def _c360(sf_dir: str, key: str):
    """customer360 DAG over the deterministic synthetic source fixture —
    engine and DuckDB oracle read the SAME parquet bytes
    (pipelines/c360_oracle.ensure_fixture). The DAG runs once per fixture
    size; each output table is served from cache."""
    import os

    from dbt_customer360_ray.pipelines.c360_fixtures import fixture_config
    from dbt_customer360_ray.pipelines.c360_oracle import ensure_fixture
    from dbt_customer360_ray.pipelines.customer360 import run_customer360

    n = _c360_n(sf_dir)
    if _C360_CACHE.get("n") != n:
        d = ensure_fixture(n)
        # parquet PATHS, not pre-loaded tables: the DAG streams every source
        # through read_parquet, exactly the reference reading warehouse tables
        # (int_customer360__marketo.sql:24) — nothing is driver-materialized
        # before the cleaning pools
        paths = {
            name: os.path.join(d, f"{name}.parquet")
            for name in (
                "marketo_leads", "stripe_customer_overview", "zendesk_users",
                "zendesk_organizations", "marketo_metrics", "stripe_metrics",
                "zendesk_metrics",
            )
        }
        _C360_CACHE["res"] = run_customer360(paths, fixture_config())
        _C360_CACHE["n"] = n
    return _conform_c360(_C360_CACHE["res"][key])


_C360_ANALYSES = {
    "c360_analysis_email_campaign": "analysis_email_campaign_list",
    "c360_analysis_all_phones": "analysis_metrics_with_all_phones",
    "c360_analysis_monthly_metrics": "analysis_monthly_metrics",
}


def _c360_analysis(sf_dir: str, fn_name: str):
    """Analyses layer (reference analyses_old/): consumption queries over the
    cached c360 DAG outputs — O(entities) driver pandas by design."""
    from dbt_customer360_ray.pipelines import customer360 as c3

    _c360(sf_dir, key="mapping")  # populate/refresh the DAG cache
    return _conform_c360(getattr(c3, fn_name)(_C360_CACHE["res"]))


_C360_RAW_ANALYSES = {
    "c360_analysis_email_campaign_raw": "analysis_email_campaign_list_raw",
    "c360_analysis_all_phones_raw": "analysis_metrics_with_all_phones_raw",
    "c360_analysis_email_campaign_raw_delta": "analysis_email_campaign_raw_delta",
    "c360_analysis_all_phones_raw_delta": "analysis_all_phones_raw_delta",
    "c360_analysis_monthly_metrics_raw": "analysis_monthly_metrics_raw",
    "c360_analysis_monthly_metrics_raw_delta": "analysis_monthly_metrics_raw_delta",
}


def _c360_analysis_raw(sf_dir: str, fn_name: str):
    """The reference's raw-vs-360 conformance analyses (analyses_old/elan/
    *_raw.sql twins): raw-source answers over the same fixture parquet the
    DAG reads, and delta entries full-outer-joining them against the c360
    answers — the reference's own self-check pattern, mirrored."""
    import os

    import pandas as pd

    from dbt_customer360_ray.pipelines import customer360 as c3
    from dbt_customer360_ray.pipelines.c360_oracle import ensure_fixture

    d = ensure_fixture(_c360_n(sf_dir))
    tables = {
        name: pd.read_parquet(os.path.join(d, f"{name}.parquet"))
        for name in (
            "marketo_leads", "stripe_customer_overview", "zendesk_users",
            "zendesk_organizations", "stripe_metrics", "zendesk_metrics",
        )
    }
    fn = getattr(c3, fn_name)
    if fn_name.endswith("_delta"):
        _c360(sf_dir, key="mapping")  # the 360 side of the comparison
        return _conform_c360(fn(_C360_CACHE["res"], tables))
    return _conform_c360(fn(tables))


def _stream_replay_lake(sf_dir: str):
    """Streaming actor-pool ingest (micro-batch tail + checkpoints) of the
    stream fixture; returns the converged lake. Oracled — stream_oracle_sql
    reads the same fixture parquet (stream_fixture_path writes it once)."""
    import tempfile

    import numpy as np
    import pyarrow.parquet as pq

    from dbt_customer360_ray.pipelines.cdc_replay import stream_fixture_path
    from dbt_customer360_ray.state.engine import CdcLake
    from dbt_customer360_ray.state.streaming import StreamingSession

    changes = pq.read_table(stream_fixture_path())
    lake = CdcLake(tempfile.mkdtemp(prefix="stream-lake-"), num_partitions=16)
    sess = StreamingSession(lake, pool_size=4)
    bounds = np.linspace(0, changes.num_rows, 9).astype(int)
    for i in range(8):
        sess.ingest(changes.slice(bounds[i], bounds[i + 1] - bounds[i]))
        if i % 3 == 2:
            sess.checkpoint()
    sess.checkpoint()
    sess.close()
    return lake.read_local_table()


def _stream_patch_lake(sf_dir: str):
    """Streaming actor-pool ingest in PATCH mode: the patch fixture's epochs
    tailed as micro-batches with mid-stream checkpoints — memtable collapse,
    flush, and read all resolve column-level LWW. Oracled — same
    patch_oracle_sql as the epoch-path entry (the two paths must converge to
    the identical state)."""
    import tempfile

    import numpy as np
    import pyarrow.parquet as pq

    from dbt_customer360_ray.pipelines.cdc_replay import patch_fixture_paths
    from dbt_customer360_ray.state.engine import CdcLake
    from dbt_customer360_ray.state.streaming import StreamingSession

    lake = CdcLake(
        tempfile.mkdtemp(prefix="stream-patch-lake-"),
        num_partitions=16,
        merge_mode="patch",
    )
    sess = StreamingSession(lake, pool_size=4)
    for path in patch_fixture_paths():
        changes = pq.read_table(path)
        bounds = np.linspace(0, changes.num_rows, 4).astype(int)
        for i in range(3):
            sess.ingest(changes.slice(bounds[i], bounds[i + 1] - bounds[i]))
        sess.checkpoint()
    sess.close()
    return lake.read_local_table()


def _multimodal_image_features(sf_dir: str):
    """Actor-pool image decode+feature stage over the parquet media fixture —
    engine and DuckDB oracle read the SAME payload bytes (the md5-chain fake
    codec is reproduced in SQL). The list<float> histogram column stays a
    library-level output; the driver entry compares the scalar features."""
    import ray.data

    from dbt_customer360_ray.stages.multimodal import image_features, media_fixture_path

    ds = ray.data.read_parquet(media_fixture_path(128, seed=5))
    return image_features(ds).select_columns(["media_id", "mean_r", "mean_g", "mean_b"])


def _multimodal_audio_features(sf_dir: str):
    import ray.data

    from dbt_customer360_ray.stages.multimodal import audio_features, media_fixture_path

    return audio_features(ray.data.read_parquet(media_fixture_path(128, seed=5)))


def _multimodal_video_features(sf_dir: str):
    """Actor-pool video decode + frame-sample (every 3rd frame) + feature
    stage over the parquet video fixture — same md5-chain fake codec pattern
    as image/audio, reproduced bit-exactly in SQL."""
    import ray.data

    from dbt_customer360_ray.stages.multimodal import video_features, video_fixture_path

    return video_features(ray.data.read_parquet(video_fixture_path(64, seed=7)))


def queries() -> dict[str, Callable[[str], Any]]:
    import functools

    from dbt_customer360_ray.pipelines.analytics import QUERIES

    out: dict[str, Callable[[str], Any]] = dict(QUERIES)
    out["cdc_replay_lake"] = _cdc_replay_lake
    out["cdc_timetravel_lake"] = _cdc_timetravel_lake
    out["cdc_lake_since"] = _cdc_lake_since
    out["cdc_snapshot_synced"] = _cdc_snapshot_synced
    out["cdc_merged_into"] = _cdc_merged_into
    out["cdc_token_index"] = _cdc_token_index
    out["cdc_boilerplate_convs"] = _cdc_boilerplate_convs
    out["cdc_debezium_replay"] = _cdc_debezium_replay
    out["cdc_lookup_batch"] = _cdc_lookup_batch
    out["cdc_retention_lake"] = _cdc_retention_lake
    out["cdc_resharded_lake"] = _cdc_resharded_lake
    out["cdc_late_quarantined"] = _cdc_late_quarantined
    out["cdc_change_feed"] = _cdc_change_feed
    out["cdc_change_feed_images"] = _cdc_change_feed_images
    out["cdc_scd2_history"] = _cdc_scd2_history
    out["cdc_temporal_join"] = _cdc_temporal_join
    out["cdc_cloned_lake"] = _cdc_cloned_lake
    out["cdc_branch_merged"] = _cdc_branch_merged
    out["cdc_masked_lake"] = _cdc_masked_lake
    out["cdc_row_policy_lake"] = _cdc_row_policy_lake
    out["cdc_purged_lake"] = _cdc_purged_lake
    out["cdc_expired_lake"] = _cdc_expired_lake
    out["cdc_hot_keys"] = _cdc_hot_keys
    out["cdc_describe_history"] = _cdc_describe_history
    out["cdc_late_events"] = _cdc_late_events
    out["cdc_watermarked_sessions"] = _cdc_watermarked_sessions
    out["cdc_redriven_dlq"] = _cdc_redriven_dlq
    out["cdc_widened_lake"] = _cdc_widened_lake
    out["cdc_offset_gaps"] = _cdc_offset_gaps
    out["cdc_packed_sft"] = _cdc_packed_sft
    out["cdc_merged_turns"] = _cdc_merged_turns
    out["cdc_context_pairs"] = _cdc_context_pairs
    out["cdc_deleted_where"] = _cdc_deleted_where
    out["cdc_updated_where"] = _cdc_updated_where
    out["cdc_lake_diff"] = _cdc_lake_diff
    out["cdc_dv_deleted"] = _cdc_dv_deleted
    out["cdc_where_read"] = _cdc_where_read
    out["cdc_wap_published"] = _cdc_wap_published
    out["cdc_dedup_index"] = _cdc_dedup_index
    out["cdc_backfilled_lake"] = _cdc_backfilled_lake
    out["cdc_redacted_lake"] = _cdc_redacted_lake
    out["cdc_near_dup_convs"] = _cdc_near_dup_convs
    out["cdc_minhash_index_dups"] = _cdc_minhash_index_dups
    out["cdc_ann_index"] = _cdc_ann_index
    out["cdc_ann_index_dups"] = _cdc_ann_index_dups
    out["cdc_ann_search"] = _cdc_ann_search
    out["cdc_sft_jsonl"] = _cdc_sft_jsonl
    out["cdc_explain_read"] = _cdc_explain_read
    out["cdc_token_search"] = _cdc_token_search
    out["cdc_sft_export"] = _cdc_sft_export
    out["cdc_sft_split"] = _cdc_sft_split
    out["cdc_fk_lake"] = _cdc_fk_lake
    out["cdc_fk_dlq"] = _cdc_fk_dlq
    out["cdc_analyze"] = _cdc_analyze
    out["cdc_restored_lake"] = _cdc_restored_lake
    out["cdc_clustered_lake"] = _cdc_clustered_lake
    out["cdc_renamed_lake"] = _cdc_renamed_lake
    out["cdc_txn_lake"] = _cdc_txn_lake
    out["stream_txn_lake"] = _stream_txn_lake
    out["cdc_consumer_feed"] = _cdc_consumer_feed
    out["cdc_patch_lake"] = _cdc_patch_lake
    out["cdc_redelivered_lake"] = _cdc_redelivered_lake
    out["cdc_offset_travel"] = _cdc_offset_travel
    out["cdc_patch_change_feed"] = _cdc_patch_change_feed
    out["cdc_deadletter"] = _cdc_deadletter
    out["cdc_constrained_lake"] = _cdc_constrained_lake
    out["cdc_constraint_dlq"] = _cdc_constraint_dlq
    out["cdc_lookup_conversation"] = _cdc_lookup_conversation
    out["cdc_conversation_headers"] = _cdc_conversation_headers
    out["cdc_assistant_view"] = _cdc_assistant_view
    out["cdc_incremental_headers"] = _cdc_incremental_headers
    out["cdc_multitable_transcripts"] = _cdc_multitable_transcripts
    out["cdc_join_view"] = _cdc_join_view
    out["cdc_window_counts"] = _cdc_window_counts
    out["cdc_jsonl_roundtrip"] = _cdc_jsonl_roundtrip
    out["cdc_computed_lake"] = _cdc_computed_lake
    out["cdc_multitable_meta"] = _cdc_multitable_meta
    out["stream_replay_lake"] = _stream_replay_lake
    out["stream_patch_lake"] = _stream_patch_lake
    out["lang_quality_documents"] = _lang_quality_documents
    out["gopher_rules_documents"] = _gopher_rules_documents
    out["dsir_selected_documents"] = _dsir_selected_documents
    out["nb_classified_documents"] = _nb_classified_documents
    out["bm25_topk_documents"] = _bm25_topk_documents
    out["knn_graph_embeddings"] = _knn_graph_embeddings
    out["knn_graph_lsh_embeddings"] = _knn_graph_lsh_embeddings
    out["bfs_hops_lsh_embeddings"] = _bfs_hops_lsh_embeddings
    out["triangle_stats_lsh_embeddings"] = _triangle_stats_lsh_embeddings
    out["label_propagated_lsh_embeddings"] = _label_propagated_lsh_embeddings
    out["pagerank_lsh_embeddings"] = _pagerank_lsh_embeddings
    out["adamic_adar_lsh_embeddings"] = _adamic_adar_lsh_embeddings
    out["hard_negatives_embeddings"] = _hard_negatives_embeddings
    out["semantic_decontaminate_embeddings"] = _semantic_decontaminate_embeddings
    out["label_propagated_embeddings"] = _label_propagated_embeddings
    out["pagerank_embeddings"] = _pagerank_embeddings
    out["bfs_hops_embeddings"] = _bfs_hops_embeddings
    out["triangle_stats_embeddings"] = _triangle_stats_embeddings
    out["adamic_adar_embeddings"] = _adamic_adar_embeddings
    out["window_dedup_documents"] = _window_dedup_documents
    out["quota_sample_documents"] = _quota_sample_documents
    out["repetition_documents"] = _repetition_documents
    out["vocab_documents"] = _vocab_documents
    out["lm_fluency_documents"] = _lm_fluency_documents
    out["mixed_corpus_documents"] = _mixed_corpus_documents
    out["temperature_mix_documents"] = _temperature_mix_documents
    out["bpe_encoded_documents"] = _bpe_encoded_documents
    out["encoded_documents"] = _encoded_documents
    out["megatron_export_documents"] = _megatron_export_documents
    out["curated_documents"] = _curated_documents
    out["fineweb_audit_documents"] = _fineweb_audit_documents
    out["minhash_near_dups"] = _minhash_near_dups
    out["canonical_documents"] = _canonical_documents
    out["simhash_documents"] = _simhash_documents
    out["embedding_near_dups"] = _embedding_near_dups
    out["embedding_lsh_near_dups"] = _embedding_lsh_near_dups
    out["lsh_topk_embeddings"] = _lsh_topk_embeddings
    for key in (
        "mapping", "summary", "customer", "attr_email", "attr_phone",
        "attr_name", "attr_organization", "attr_address", "ip_address",
        "status", "updates",
    ):
        out[f"c360_{key}"] = functools.partial(_c360, key=key)
    for name, fn_name in _C360_ANALYSES.items():
        out[name] = functools.partial(_c360_analysis, fn_name=fn_name)
    for name, fn_name in _C360_RAW_ANALYSES.items():
        out[name] = functools.partial(_c360_analysis_raw, fn_name=fn_name)
    out["multimodal_image_features"] = _multimodal_image_features
    out["multimodal_audio_features"] = _multimodal_audio_features
    out["multimodal_video_features"] = _multimodal_video_features
    return out


def oracle_sql() -> dict[str, str]:
    from dbt_customer360_ray.pipelines.analytics import ORACLE_SQL
    from dbt_customer360_ray.pipelines.c360_oracle import oracle_entries
    from dbt_customer360_ray.pipelines.cdc_replay import (
        change_feed_images_oracle_sql,
        change_feed_oracle_sql,
        computed_oracle_sql,
        constrained_oracle_sql,
        constraint_dlq_oracle_sql,
        deadletter_oracle_sql,
        headers_oracle_sql,
        late_quarantine_oracle_sql,
        lookup_oracle_sql,
        lookup_many_oracle_sql,
        merge_into_oracle_sql,
        token_index_oracle_sql,
        window_counts_oracle_sql,
        patch_change_feed_oracle_sql,
        retention_oracle_sql,
        patch_oracle_sql,
        view_oracle_sql,
        replay_oracle_sql,
        since_oracle_sql,
        snapshot_sync_oracle_sql,
        stream_oracle_sql,
        timetravel_oracle_sql,
    )

    from dbt_customer360_ray.stages.multimodal import (
        audio_oracle_sql,
        image_oracle_sql,
        media_fixture_path,
        video_fixture_path,
        video_oracle_sql,
    )

    from dbt_customer360_ray.pipelines.curate import (
        curate_oracle_sql,
        fineweb_audit_oracle_sql,
    )
    from dbt_customer360_ray.stages.dedup import (
        canonicalize_oracle_sql,
        embedding_lsh_pairs_oracle_sql,
    )

    from dbt_customer360_ray.stages.text import (
        encode_flat_oracle_sql,
        repetition_oracle_sql,
        vocab_oracle_sql,
    )

    from dbt_customer360_ray.stages.dedup import window_dedup_oracle_sql
    from dbt_customer360_ray.stages.sampling import quota_sample_oracle_sql
    from dbt_customer360_ray.stages.text import (
        gopher_oracle_sql,
        lm_fluency_oracle_sql,
    )

    out = dict(ORACLE_SQL)
    out["gopher_rules_documents"] = gopher_oracle_sql("documents")
    from dbt_customer360_ray.stages.dsir import dsir_oracle_sql

    out["dsir_selected_documents"] = dsir_oracle_sql("documents", _DSIR_TARGET, k=100)
    from dbt_customer360_ray.stages.dsir import nb_oracle_sql

    out["nb_classified_documents"] = nb_oracle_sql("documents")
    from dbt_customer360_ray.stages.text import bm25_oracle_sql

    out["bm25_topk_documents"] = bm25_oracle_sql("documents", _BM25_QUERY, k=20)
    from dbt_customer360_ray.stages.similarity import knn_graph_oracle_sql

    out["knn_graph_embeddings"] = knn_graph_oracle_sql("embeddings", k=5)
    from dbt_customer360_ray.stages.similarity import knn_graph_lsh_oracle_sql

    out["knn_graph_lsh_embeddings"] = knn_graph_lsh_oracle_sql(
        "embeddings", k=5, dim=64
    )
    from dbt_customer360_ray.stages.similarity import hard_negatives_oracle_sql

    out["hard_negatives_embeddings"] = hard_negatives_oracle_sql("embeddings", k=5)
    from dbt_customer360_ray.stages.decontaminate import (
        semantic_decontaminate_oracle_sql,
    )

    out["semantic_decontaminate_embeddings"] = semantic_decontaminate_oracle_sql(
        "embeddings", threshold=0.3
    )
    from dbt_customer360_ray.stages.similarity import label_propagate_oracle_sql

    out["label_propagated_embeddings"] = label_propagate_oracle_sql(
        "embeddings", k=5
    )
    from dbt_customer360_ray.stages.similarity import knn_graph_lsh_oracle_sql as _lsh_sql

    out["label_propagated_lsh_embeddings"] = label_propagate_oracle_sql(
        "embeddings", k=5, knn_sql=_lsh_sql("embeddings", k=5, dim=64)
    )
    from dbt_customer360_ray.stages.similarity import pagerank_oracle_sql

    out["pagerank_embeddings"] = pagerank_oracle_sql("embeddings", k=5, iters=3)
    out["pagerank_lsh_embeddings"] = pagerank_oracle_sql(
        "embeddings", k=5, iters=3,
        knn_sql=knn_graph_lsh_oracle_sql("embeddings", k=5, dim=64),
    )
    from dbt_customer360_ray.stages.similarity import (
        bfs_hops_oracle_sql,
        triangle_stats_oracle_sql,
    )

    out["bfs_hops_embeddings"] = bfs_hops_oracle_sql(
        "embeddings", k=5, max_hops=3, seed_permille=40
    )
    out["bfs_hops_lsh_embeddings"] = bfs_hops_oracle_sql(
        "embeddings", k=5, max_hops=3, seed_permille=40,
        knn_sql=knn_graph_lsh_oracle_sql("embeddings", k=5, dim=64),
    )
    out["triangle_stats_lsh_embeddings"] = triangle_stats_oracle_sql(
        "embeddings", k=5,
        knn_sql=knn_graph_lsh_oracle_sql("embeddings", k=5, dim=64),
    )
    out["triangle_stats_embeddings"] = triangle_stats_oracle_sql("embeddings", k=5)
    from dbt_customer360_ray.stages.similarity import adamic_adar_oracle_sql

    out["adamic_adar_embeddings"] = adamic_adar_oracle_sql("embeddings", k=5)
    out["adamic_adar_lsh_embeddings"] = adamic_adar_oracle_sql(
        "embeddings", k=5,
        knn_sql=knn_graph_lsh_oracle_sql("embeddings", k=5, dim=64),
    )
    out["lm_fluency_documents"] = lm_fluency_oracle_sql("documents")
    from dbt_customer360_ray.stages.sampling import mix_oracle_sql

    out["mixed_corpus_documents"] = mix_oracle_sql(
        "documents", "doc_id", "source", _MIX_WEIGHTS
    )
    from dbt_customer360_ray.stages.sampling import temperature_mix_oracle_sql

    out["temperature_mix_documents"] = temperature_mix_oracle_sql(
        "documents", "doc_id", "source", alpha_pm=500
    )
    out["window_dedup_documents"] = window_dedup_oracle_sql("documents")
    out["quota_sample_documents"] = quota_sample_oracle_sql("documents", quota=10)
    out["repetition_documents"] = repetition_oracle_sql("documents")
    out["vocab_documents"] = vocab_oracle_sql("documents")
    out["encoded_documents"] = encode_flat_oracle_sql("documents")
    out["megatron_export_documents"] = encode_flat_oracle_sql("documents")
    out["curated_documents"] = curate_oracle_sql()
    out["fineweb_audit_documents"] = fineweb_audit_oracle_sql()
    out["canonical_documents"] = canonicalize_oracle_sql()
    out["embedding_lsh_near_dups"] = embedding_lsh_pairs_oracle_sql(
        dim=64, threshold=0.3
    )
    # c360 oracles read fixture parquet at the sf0.01 scale the driver uses;
    # oracle_entries() writes that fixture as a side effect — same pattern for
    # the two replay-lake oracles below and the media fixture
    out.update(oracle_entries())
    out["cdc_replay_lake"] = replay_oracle_sql(sf=0.01)
    out["cdc_timetravel_lake"] = timetravel_oracle_sql(sf=0.01, epoch=1)
    out["cdc_lake_since"] = since_oracle_sql(sf=0.01, cutoff=_SINCE_CUTOFF)
    out["cdc_snapshot_synced"] = snapshot_sync_oracle_sql(sf=0.01)
    out["cdc_merged_into"] = merge_into_oracle_sql(sf=0.01)
    out["cdc_token_index"] = token_index_oracle_sql(sf=0.01)
    from dbt_customer360_ray.pipelines.cdc_replay import token_search_oracle_sql

    out["cdc_token_search"] = token_search_oracle_sql(sf=0.01)
    from dbt_customer360_ray.pipelines.cdc_replay import boilerplate_oracle_sql

    out["cdc_boilerplate_convs"] = boilerplate_oracle_sql(sf=0.01, min_convs=2)
    out["cdc_debezium_replay"] = replay_oracle_sql(sf=0.01)
    out["cdc_lookup_batch"] = lookup_many_oracle_sql(sf=0.01, suffix="7")
    out["cdc_retention_lake"] = retention_oracle_sql(sf=0.01)
    out["cdc_resharded_lake"] = replay_oracle_sql(sf=0.01)
    out["cdc_clustered_lake"] = replay_oracle_sql(sf=0.01)
    out["cdc_late_quarantined"] = late_quarantine_oracle_sql(sf=0.01)
    out["cdc_change_feed"] = change_feed_oracle_sql(sf=0.01, from_epoch=0, to_epoch=2)
    out["cdc_restored_lake"] = timetravel_oracle_sql(sf=0.01, epoch=1)
    from dbt_customer360_ray.pipelines.cdc_replay import (
        renamed_oracle_sql,
        txn_oracle_sql,
    )

    out["cdc_renamed_lake"] = renamed_oracle_sql(sf=0.01)
    out["cdc_txn_lake"] = txn_oracle_sql(sf=0.01, upto=2)
    out["stream_txn_lake"] = txn_oracle_sql(sf=0.01, upto=2)
    out["cdc_consumer_feed"] = change_feed_oracle_sql(
        sf=0.01, from_epoch=1, to_epoch=3
    )
    out["cdc_change_feed_images"] = change_feed_images_oracle_sql(
        sf=0.01, from_epoch=0, to_epoch=2
    )
    from dbt_customer360_ray.pipelines.cdc_replay import (
        scd2_oracle_sql,
        temporal_join_oracle_sql,
    )

    out["cdc_scd2_history"] = scd2_oracle_sql(sf=0.01)
    out["cdc_temporal_join"] = temporal_join_oracle_sql(sf=0.01)
    out["cdc_cloned_lake"] = replay_oracle_sql(sf=0.01)
    out["cdc_branch_merged"] = replay_oracle_sql(sf=0.01)
    from dbt_customer360_ray.pipelines.cdc_replay import masked_oracle_sql

    out["cdc_masked_lake"] = masked_oracle_sql(sf=0.01)
    from dbt_customer360_ray.pipelines.cdc_replay import row_policy_oracle_sql

    out["cdc_row_policy_lake"] = row_policy_oracle_sql(sf=0.01)
    from dbt_customer360_ray.pipelines.cdc_replay import purged_oracle_sql

    out["cdc_purged_lake"] = purged_oracle_sql(sf=0.01)
    out["cdc_expired_lake"] = replay_oracle_sql(sf=0.01)
    from dbt_customer360_ray.pipelines.cdc_replay import hot_keys_oracle_sql

    out["cdc_hot_keys"] = hot_keys_oracle_sql(sf=0.01)
    from dbt_customer360_ray.pipelines.cdc_replay import describe_history_oracle_sql

    out["cdc_describe_history"] = describe_history_oracle_sql(sf=0.01)
    from dbt_customer360_ray.pipelines.cdc_replay import (
        sft_oracle_sql,
        sft_split_oracle_sql,
    )

    out["cdc_sft_export"] = sft_oracle_sql(sf=0.01)
    out["cdc_sft_jsonl"] = sft_oracle_sql(sf=0.01)
    out["cdc_sft_split"] = sft_split_oracle_sql(sf=0.01)
    from dbt_customer360_ray.pipelines.cdc_replay import (
        context_pairs_oracle_sql,
        late_event_oracle_sql,
        merged_turns_oracle_sql,
        packed_sft_oracle_sql,
        watermarked_sessions_oracle_sql,
    )

    out["cdc_late_events"] = late_event_oracle_sql(sf=0.01)
    out["cdc_watermarked_sessions"] = watermarked_sessions_oracle_sql(sf=0.01)
    from dbt_customer360_ray.pipelines.cdc_replay import (
        offset_gap_oracle_sql,
        redriven_oracle_sql,
        widened_oracle_sql,
    )

    out["cdc_redriven_dlq"] = redriven_oracle_sql(sf=0.01)
    out["cdc_widened_lake"] = widened_oracle_sql(sf=0.01)
    out["cdc_offset_gaps"] = offset_gap_oracle_sql(sf=0.01)
    out["cdc_packed_sft"] = packed_sft_oracle_sql(sf=0.01)
    out["cdc_merged_turns"] = merged_turns_oracle_sql(sf=0.01)
    out["cdc_context_pairs"] = context_pairs_oracle_sql(sf=0.01)
    from dbt_customer360_ray.pipelines.cdc_replay import (
        delete_where_oracle_sql,
        lake_diff_oracle_sql,
        update_where_oracle_sql,
    )

    out["cdc_deleted_where"] = delete_where_oracle_sql(sf=0.01)
    out["cdc_updated_where"] = update_where_oracle_sql(sf=0.01)
    out["cdc_lake_diff"] = lake_diff_oracle_sql(sf=0.01)
    out["cdc_dv_deleted"] = delete_where_oracle_sql(sf=0.01)
    from dbt_customer360_ray.state.constraints import predicate_sql, validate_spec

    _w = predicate_sql(
        validate_spec(
            {"name": "w", "column": "role", "op": "==", "value": "assistant"}
        )
    )
    out["cdc_where_read"] = (
        "SELECT conv_id, turn_idx, role, text FROM ("
        + replay_oracle_sql(sf=0.01)
        + f") WHERE coalesce(({_w}), FALSE)"
    )
    out["cdc_wap_published"] = replay_oracle_sql(sf=0.01)
    from dbt_customer360_ray.pipelines.cdc_replay import dedup_index_oracle_sql

    out["cdc_dedup_index"] = dedup_index_oracle_sql(sf=0.01)
    out["cdc_backfilled_lake"] = computed_oracle_sql(sf=0.01)
    from dbt_customer360_ray.pipelines.cdc_replay import redacted_oracle_sql

    out["cdc_redacted_lake"] = redacted_oracle_sql(sf=0.01)
    from dbt_customer360_ray.pipelines.cdc_replay import near_dup_convs_oracle_sql

    out["cdc_near_dup_convs"] = near_dup_convs_oracle_sql(sf=0.01)
    out["cdc_minhash_index_dups"] = near_dup_convs_oracle_sql(sf=0.01)
    from dbt_customer360_ray.pipelines.cdc_replay import (
        ann_index_oracle_sql,
        ann_near_dups_oracle_sql,
        ann_search_oracle_sql,
    )

    out["cdc_ann_index"] = ann_index_oracle_sql(sf=0.01)
    out["cdc_ann_index_dups"] = ann_near_dups_oracle_sql(sf=0.01)
    out["cdc_ann_search"] = ann_search_oracle_sql(sf=0.01)
    from dbt_customer360_ray.pipelines.cdc_replay import (
        fk_dlq_oracle_sql,
        fk_oracle_sql,
    )

    out["cdc_fk_lake"] = fk_oracle_sql(sf=0.01)
    out["cdc_fk_dlq"] = fk_dlq_oracle_sql(sf=0.01)
    from dbt_customer360_ray.pipelines.cdc_replay import analyze_oracle_sql

    out["cdc_analyze"] = analyze_oracle_sql(sf=0.01)
    out["cdc_patch_lake"] = patch_oracle_sql()
    out["cdc_redelivered_lake"] = replay_oracle_sql(sf=0.01)
    out["cdc_offset_travel"] = timetravel_oracle_sql(sf=0.01, epoch=1)
    out["cdc_patch_change_feed"] = patch_change_feed_oracle_sql(
        from_epoch=0, to_epoch=2
    )
    out["cdc_deadletter"] = deadletter_oracle_sql()
    out["cdc_constrained_lake"] = constrained_oracle_sql(sf=0.01)
    out["cdc_constraint_dlq"] = constraint_dlq_oracle_sql(sf=0.01)
    out["cdc_lookup_conversation"] = lookup_oracle_sql(sf=0.01, conv_id="conv-00000002")
    out["cdc_conversation_headers"] = headers_oracle_sql(sf=0.01)
    out["cdc_assistant_view"] = view_oracle_sql(sf=0.01, role="assistant")
    out["cdc_incremental_headers"] = headers_oracle_sql(sf=0.01)
    from dbt_customer360_ray.pipelines.cdc_replay import (
        multitable_join_oracle_sql,
        multitable_meta_oracle_sql,
        multitable_transcripts_oracle_sql,
    )

    out["cdc_multitable_transcripts"] = multitable_transcripts_oracle_sql()
    out["cdc_multitable_meta"] = multitable_meta_oracle_sql()
    out["cdc_join_view"] = multitable_join_oracle_sql()
    out["cdc_window_counts"] = window_counts_oracle_sql(sf=0.01)
    out["cdc_jsonl_roundtrip"] = replay_oracle_sql(sf=0.01)
    out["cdc_computed_lake"] = computed_oracle_sql(sf=0.01)
    out["stream_replay_lake"] = stream_oracle_sql()
    out["stream_patch_lake"] = patch_oracle_sql()
    media = media_fixture_path(128, seed=5)
    out["multimodal_image_features"] = image_oracle_sql(media)
    out["multimodal_audio_features"] = audio_oracle_sql(media)
    out["multimodal_video_features"] = video_oracle_sql(video_fixture_path(64, seed=7))
    return out
