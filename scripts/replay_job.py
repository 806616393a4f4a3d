"""CDC replay as a submittable Ray job — the cluster entry point the north
rule runs on fixed N / 4N-node clusters:

    ray job submit --working-dir . -- python scripts/replay_job.py \
        --input /data/changes --lake /data/lake --num-partitions 256

Locally (this sandbox) the same script runs against a generated fixture:

    python scripts/replay_job.py --sf 0.01 --lake /tmp/lake-sf001

Resumable by construction: each epoch file commits through the exactly-once
manifest sink, so re-submitting the same job after a crash skips completed
epochs (redelivered offsets are no-ops) and continues from the per-partition
checkpoint offsets. Prints one JSON line per epoch and a final summary line
(events/sec, checkpoints, lineage length).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault(
    "RAY_DATA_LOGGING_CONFIG",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "ray_data_logging.yaml"),
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", help="directory (or glob) of changes-*.parquet epoch files")
    ap.add_argument("--sf", type=float, help="generate + use the deterministic fixture at this scale factor")
    ap.add_argument("--lake", required=True, help="lake output directory")
    ap.add_argument("--num-partitions", type=int, default=64)
    ap.add_argument("--enrich", action="store_true", help="fuse per-event transcript analysis into ingest")
    ap.add_argument("--compact", action="store_true", help="compact partitions above the run threshold at the end")
    ap.add_argument("--vacuum", action="store_true", help="delete unreferenced data files at the end")
    ap.add_argument("--num-cpus", type=int, default=None, help="local-mode CPU cap (cluster mode: omit)")
    ap.add_argument("--export", help="write the converged lake state as partitioned parquet to this directory")
    ap.add_argument("--as-of", type=int, default=None, metavar="EPOCH",
                    help="with --export: export the snapshot as of this committed epoch instead of the head")
    ap.add_argument("--change-feed", nargs=2, type=int, metavar=("FROM", "TO"),
                    help="print the insert/update/delete row counts between two committed epochs")
    ap.add_argument("--deadletter-report", action="store_true",
                    help="print quarantined-event counts by reason")
    ap.add_argument("--view", help="maintain an incremental role-filtered view lake "
                                   "at this directory (ROLE:DIR, e.g. assistant:/data/view)")
    ap.add_argument("--compaction-policy", choices=("full", "tiered"), default="full",
                    help="'tiered' = leveled LSM merges: settled runs are never "
                         "rewritten, compaction cost tracks the ingest rate")
    ap.add_argument("--allowed-lateness", default=None, metavar="DUR",
                    help="quarantine events older than the committed watermark "
                         "minus DUR (e.g. '30 minutes') to the dead-letter queue")
    ap.add_argument("--merge-mode", choices=("lww", "patch"), default="lww",
                    help="patch: op 'P' partial images resolve by column-level "
                         "LWW (null payload columns mean unchanged)")
    ap.add_argument("--restore", type=int, default=None, metavar="EPOCH",
                    help="after the replay, roll the lake back to this epoch's "
                         "snapshot as a new commit (checkpoints roll back too)")
    ap.add_argument("--preimages", action="store_true",
                    help="with --change-feed: carry the replaced values as old_* columns")
    ap.add_argument("--constraint", action="append", default=[], metavar="SPEC",
                    help="CHECK constraint enforced at ingest (repeatable): "
                         "'name:column:op[:value]' — op in not_null/in/==/!=/"
                         "</<=/>/>=/matches; 'in' values comma-separated "
                         "(e.g. role_allowed:role:in:user,assistant)")
    ap.add_argument("--computed", action="append", default=[], metavar="SPEC",
                    help="generated column derived at ingest (repeatable): "
                         "'name:kind:source' — kind in length/lower/token_count")
    ap.add_argument("--window", default=None, metavar="DUR",
                    help="keep tumbling event-time window counts (e.g. '1 hour'); "
                         "requires --allowed-lateness; prints the finalized "
                         "windows at the end")
    ap.add_argument("--strict-schema", action="store_true",
                    help="reject batches carrying unknown columns instead of "
                         "auto-evolving (type widening still allowed)")
    ap.add_argument("--export-jsonl", default=None, metavar="DIR",
                    help="after the replay, export the full change feed as "
                         "Debezium-style JSONL part files to DIR")
    ap.add_argument("--scd2", default=None, metavar="DIR",
                    help="maintain the SCD2 history view (dbt snapshot "
                         "analogue) at DIR: one snapshot diff per new epoch")
    ap.add_argument("--clone", default=None, metavar="DIR",
                    help="shallow-clone the lake to DIR after the replay "
                         "(metadata-only, data files shared by reference)")
    ap.add_argument("--describe-history", action="store_true",
                    help="print one line per manifest version with the "
                         "operation that created it")
    ap.add_argument("--mask", action="append", default=[], metavar="COL:KIND",
                    help="declare a column mask applied at serving reads "
                         "(KIND: null | hash | redact); repeatable")
    ap.add_argument("--row-policy", action="append", default=[],
                    metavar="NAME:COL:OP:VALUE",
                    help="declare a row access policy applied at serving reads "
                         "(OP: !=, ==, in, matches, not_null, <, <=, >, >=); "
                         "repeatable")
    ap.add_argument("--delete-where", action="append", default=[],
                    metavar="NAME:COL:OP[:VALUE]",
                    help="predicate DELETE DML after replay: tombstone live "
                         "rows matching the constraint-shaped predicate "
                         "(op in ==,!=,<,<=,>,>=,in,matches,not_null; "
                         "'in' values comma-separated); exactly-once, "
                         "change-feed-visible")
    ap.add_argument("--delete-ts", default="2030-01-01",
                    help="sync_ts stamped on --delete-where tombstones "
                         "(must exceed every committed ts)")
    ap.add_argument("--update-where", action="append", default=[],
                    help="predicate UPDATE DML, NAME:COL:OP[:VALUE]->SETCOL=V[,SETCOL=V...] "
                         "(e.g. 'redact:role:==:tool->text=[redacted],tool=redactor'); "
                         "full-image 'U' events at --delete-ts through the "
                         "exactly-once epoch path, repeatable")
    ap.add_argument("--delete-mode", choices=["tombstone", "dv"],
                    default="tombstone",
                    help="--delete-where execution: tombstone events through "
                         "the epoch path (default), or dv = Delta-style "
                         "deletion vectors (per-run positional sidecars, no "
                         "data rewritten, folded by the next compaction)")
    ap.add_argument("--purge-key", action="append", default=[], metavar="CONV_ID",
                    help="GDPR-erase a conversation: unreadable on every "
                         "surface immediately, physically rewritten out of "
                         "live runs; repeatable")
    ap.add_argument("--expire-snapshots", type=int, default=None, metavar="N",
                    help="trim the manifest version log to the newest N "
                         "versions (run with --vacuum to also reclaim files)")
    ap.add_argument("--fsck", action="store_true",
                    help="verify manifest ↔ storage integrity at the end (missing "
                         "files, row-count mismatches) and print the report")
    ap.add_argument("--multi-table", action="store_true",
                    help="input carries a table_name column: route each table "
                         "to its own lake under LAKE/tables/<name>")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        # under `ray job submit` RAY_ADDRESS points at the cluster; standalone
        # runs get a local session
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), **kwargs)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from dbt_customer360_ray.state.engine import CdcLake

    if args.sf is not None:
        from dbt_customer360_ray.pipelines.cdc_replay import changes_fixture

        paths = changes_fixture(args.sf)["paths"]
    elif args.input:
        if os.path.isfile(args.input):
            pattern = args.input
        elif any(c in args.input for c in "*?["):
            pattern = args.input
        else:
            pattern = os.path.join(args.input, "*.parquet")
        paths = sorted(glob.glob(pattern))
        if not paths:
            ap.error(f"no parquet files match {pattern!r}")
    else:
        ap.error("one of --input / --sf is required")

    enrich = enrich_schema = None
    if args.enrich:
        from dbt_customer360_ray.stages.text import ENRICH_SCHEMA, TranscriptEnricher

        enrich, enrich_schema = TranscriptEnricher(), ENRICH_SCHEMA

    lake_kwargs = dict(
        num_partitions=args.num_partitions,
        compaction_policy=args.compaction_policy,
        allowed_lateness=args.allowed_lateness,
        merge_mode=args.merge_mode,
        window=args.window,
        schema_mode="strict" if args.strict_schema else "additive",
    )
    if args.multi_table:
        from dbt_customer360_ray.state.multitable import MultiTableLake

        mt = MultiTableLake(args.lake, **lake_kwargs)
        t0 = time.perf_counter()
        events = 0
        for i, p in enumerate(paths):
            per_table = mt.apply(p, epoch=i)
            for name, m in per_table.items():
                events += m.get("events_in", 0)
                print(json.dumps({"epoch_file": os.path.basename(p),
                                  "table": name, **m}), flush=True)
        wall = time.perf_counter() - t0
        summary = {
            "tables": sorted(mt.tables),
            "events_in": events,
            "events_per_sec": round(events / wall, 1) if wall else None,
            "wall_sec": round(wall, 3),
            "metrics": mt.metrics(),
        }
        print(json.dumps(summary, default=str), flush=True)
        return 0

    lake = CdcLake(args.lake, **lake_kwargs)
    for spec in args.constraint:
        parts = spec.split(":", 3)
        if len(parts) < 3:
            ap.error(f"--constraint needs name:column:op[:value], got {spec!r}")
        name, column, op = parts[:3]
        value = parts[3] if len(parts) == 4 else None
        if op == "in" and value is not None:
            value = value.split(",")
        elif value is not None:
            try:
                value = int(value)
            except ValueError:
                try:
                    value = float(value)
                except ValueError:
                    pass  # string comparison / regex value
        if not any(c["name"] == name for c in lake.manifest.constraints):
            lake.add_check_constraint(name, column, op, value)
    for spec in args.computed:
        parts = spec.split(":")
        if len(parts) != 3:
            ap.error(f"--computed needs name:kind:source, got {spec!r}")
        if not any(
            c["name"] == parts[0] for c in lake.manifest.computed_columns
        ):
            lake.add_computed_column(*parts)
    t0 = time.perf_counter()
    events = 0
    for i, p in enumerate(paths):
        # epoch identity = position in the binlog: a re-submitted job skips
        # epochs the manifest has already committed (true resume, no re-read)
        m = lake.apply(p, epoch=i, enrich=enrich, enrich_schema=enrich_schema)
        events += m.get("events_in", 0)
        print(json.dumps({"epoch_file": os.path.basename(p), **m}), flush=True)
    wall = time.perf_counter() - t0
    if args.restore is not None:
        v = lake.restore(epoch=args.restore)
        print(json.dumps({"restored_to_epoch": args.restore, "new_version": v}), flush=True)
    if args.compact:
        print(json.dumps({"compacted_partitions": lake.compact(force=True)}), flush=True)
    if args.export:
        ds = lake.read() if args.as_of is None else lake.read_as_of(epoch=args.as_of)
        ds.write_parquet(args.export)
        print(json.dumps({"exported": args.export, "as_of_epoch": args.as_of}), flush=True)
    if args.change_feed:
        lo, hi = args.change_feed
        feed = lake.change_feed(
            from_epoch=lo, to_epoch=hi, include_preimage=args.preimages
        )
        counts = (
            feed.groupby("change_type").count().to_pandas().set_index("change_type")["count()"].to_dict()
        )
        print(json.dumps({"change_feed": {"from": lo, "to": hi, "counts": counts}}), flush=True)
    if args.view:
        from dbt_customer360_ray.state.views import sync_view

        role, _, view_dir = args.view.partition(":")
        view = CdcLake(view_dir, num_partitions=lake.P)
        ms = sync_view(lake, view, keep=lambda df, r=role: df["role"].eq(r))
        print(json.dumps({"view": view_dir, "role": role,
                          "epochs_synced": len(ms),
                          "view_rows": view.read_local_table().num_rows}), flush=True)
    if args.deadletter_report:
        dl = lake.read_deadletter()
        by_reason: dict[str, int] = {}
        if dl.num_rows and "dl_reason" in dl.column_names:
            vc = dl.column("dl_reason").to_pandas().value_counts()
            by_reason = {str(k): int(v) for k, v in vc.items()}
        print(json.dumps({"deadletter": {"rows": dl.num_rows, "by_reason": by_reason}}), flush=True)
    if args.window:
        wc = lake.window_counts(final_only=True).to_pandas()
        print(json.dumps({
            "finalized_windows": len(wc),
            "finalized_events": int(wc["n"].sum()) if len(wc) else 0,
        }), flush=True)
    if args.export_jsonl:
        from dbt_customer360_ray.sources.binlog_json import export_change_feed_jsonl

        export_change_feed_jsonl(
            lake, args.export_jsonl,
            pos_base=(lake.manifest.version + 1) << 41, from_version=0,
        )
        print(json.dumps({"exported_jsonl": args.export_jsonl}), flush=True)
    if args.scd2:
        from dbt_customer360_ray.state.history import (
            read_history_local,
            sync_history_view,
        )

        ms = sync_history_view(lake, args.scd2)
        print(json.dumps({
            "scd2": args.scd2,
            "epochs_synced": len(ms),
            "history_rows": read_history_local(args.scd2).num_rows,
        }), flush=True)
    for spec in args.mask:
        col, _, kind = spec.partition(":")
        v = lake.add_mask(col, kind or "null")
        print(json.dumps({"masked": col, "kind": kind or "null",
                          "version": v}), flush=True)
    for cid in args.purge_key:
        print(json.dumps({"purged": cid} | lake.purge_key(cid)), flush=True)
    for spec in args.delete_where:
        parts = spec.split(":", 3)
        if len(parts) < 3:
            raise SystemExit(f"--delete-where wants NAME:COL:OP[:VALUE], got {spec!r}")
        name, col, op = parts[:3]
        value = parts[3] if len(parts) == 4 else None
        if op == "in" and value is not None:
            value = value.split(",")
        m = lake.delete_where(
            {"name": name, "column": col, "op": op, "value": value},
            args.delete_ts,
            mode=args.delete_mode,
        )
        out = (
            {"deleted_where": name, "deletes": m["deletes"]}
            if args.delete_mode == "tombstone"
            else {"deleted_where": name, "mode": "dv"} | m
        )
        print(json.dumps(out), flush=True)
    for spec in args.update_where:
        pred_part, _, set_part = spec.partition("->")
        parts = pred_part.split(":", 3)
        if len(parts) < 3 or not set_part:
            raise SystemExit(
                f"--update-where wants NAME:COL:OP[:VALUE]->SETCOL=V[,...], got {spec!r}"
            )
        name, col, op = parts[:3]
        value = parts[3] if len(parts) == 4 else None
        if op == "in" and value is not None:
            value = value.split(",")
        set_values = {}
        for kv in set_part.split(","):
            k, eq, v = kv.partition("=")
            if not eq:
                raise SystemExit(f"--update-where SET wants COL=VALUE, got {kv!r}")
            set_values[k] = None if v == "NULL" else v
        m = lake.update_where(
            {"name": name, "column": col, "op": op, "value": value},
            set_values,
            args.delete_ts,
        )
        print(json.dumps({"updated_where": name, "upserts": m["upserts"]}),
              flush=True)
    for spec in args.row_policy:
        parts = spec.split(":", 3)
        if len(parts) < 3:
            raise SystemExit(f"--row-policy wants NAME:COL:OP[:VALUE], got {spec!r}")
        name, col, op = parts[:3]
        value = parts[3] if len(parts) == 4 else None
        if op == "in" and value is not None:
            value = value.split(",")
        v = lake.add_row_filter(
            {"name": name, "column": col, "op": op, "value": value}
        )
        print(json.dumps({"row_policy": name, "version": v}), flush=True)
    if args.clone:
        c = lake.clone(args.clone)
        print(json.dumps({"cloned": args.clone,
                          "version": c.manifest.version}), flush=True)
    if args.describe_history:
        for row in lake.describe_history().to_pylist():
            print(json.dumps({"history": {
                k: v for k, v in row.items() if v is not None
            }}), flush=True)
    if args.fsck:
        print(json.dumps({"fsck": lake.fsck(
            check_constraints=bool(args.constraint)
        )}), flush=True)
    if args.expire_snapshots is not None:
        print(json.dumps({
            "expired_versions": lake.expire_snapshots(args.expire_snapshots)
        }), flush=True)
    if args.vacuum:
        print(json.dumps({"vacuumed_files": lake.vacuum()}), flush=True)
    print(
        json.dumps(
            {
                "metric": "cdc_replay_job",
                "events_in": events,
                "events_per_sec": round(events / wall, 1),
                "wall_sec": round(wall, 3),
                "num_partitions": lake.P,
                "epochs_applied": len(lake.lineage()),
                "checkpoints": {str(k): v for k, v in sorted(lake.checkpoints().items())[:4]},
                "totals": lake.metrics(),
            }
        ),
        flush=True,
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
