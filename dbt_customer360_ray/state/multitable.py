"""Multi-table binlog routing: one interleaved CDC stream → a CdcLake per
source table.

A real binlog/WAL tail carries every table of the upstream database in one
offset-ordered stream (the reference's three sources — marketo, stripe,
zendesk — arrive exactly this way before its cleaning models fan them out,
``/root/reference/models/cleaning/``). ``MultiTableLake`` keeps the engine's
single-table core untouched: events are discriminated by a ``table_name``
column and routed to an independent ``CdcLake`` under ``lake_dir/tables/<n>``,
so schema evolution, checkpoints, time travel, compaction, DLQ and metrics
all remain per-table. Offset-based exactly-once dedup is unaffected by the
split: each table sees a gappy-but-monotone offset subsequence, and the
per-partition max-offset comparison never required density.
"""

from __future__ import annotations

import os
import re

from .engine import CdcLake

_NAME_RE = re.compile(r"^[A-Za-z0-9_\-]{1,64}$")


class MultiTableLake:
    """Route a ``table_name``-discriminated change stream to per-table lakes.

    ``tables`` maps table name → CdcLake kwargs, plus an optional ``columns``
    key: the event columns belonging to that table (recommended — without it
    every table's lake evolves the union schema of the whole stream, with the
    foreign columns null). Tables seen in the stream but never registered are
    auto-registered with the default kwargs; tables already on disk are
    adopted on open (resume path).
    """

    def __init__(
        self,
        lake_dir: str,
        tables: dict[str, dict] | None = None,
        **default_lake_kwargs,
    ):
        self.lake_dir = lake_dir
        self.defaults = dict(default_lake_kwargs)
        self.tables: dict[str, CdcLake] = {}
        self.table_columns: dict[str, list[str] | None] = {}
        for name, spec in (tables or {}).items():
            spec = dict(spec)
            self._register(name, spec, spec.pop("columns", None))
        troot = os.path.join(lake_dir, "tables")
        if os.path.isdir(troot):
            for name in sorted(os.listdir(troot)):
                if name not in self.tables:
                    self._register(name, {}, None)

    def _register(self, name: str, kwargs: dict, columns: list[str] | None) -> CdcLake:
        if not _NAME_RE.match(name):
            raise ValueError(f"unroutable table name {name!r}")
        lake = CdcLake(
            os.path.join(self.lake_dir, "tables", name),
            **{**self.defaults, **kwargs},
        )
        self.tables[name] = lake
        self.table_columns[name] = list(columns) if columns else None
        return lake

    def lake(self, name: str) -> CdcLake:
        return self.tables[name]

    def apply(self, source, **apply_kwargs) -> dict[str, dict]:
        """Apply one multi-table epoch; returns per-table metric deltas.

        The input is scanned ONCE (materialized into the object store); each
        table's slice is then a map-only filter over the cached blocks — no
        re-read per table, no shuffle (the per-table lake does its own hash
        routing downstream)."""
        import ray.data

        ds = (
            ray.data.read_parquet(source) if isinstance(source, str) else source
        ).materialize()
        if "table_name" not in ds.schema().names:
            raise ValueError("multi-table stream requires a 'table_name' column")
        names = sorted(x for x in ds.unique("table_name") if x is not None)
        out: dict[str, dict] = {}
        for name in names:
            if name not in self.tables:
                self._register(name, {}, None)
            sub = ds.filter(expr=f"table_name == '{name}'")
            cols = self.table_columns.get(name)
            if cols:
                sub = sub.select_columns(cols)
            else:
                sub = sub.drop_columns(["table_name"])
            out[name] = self.tables[name].apply(sub, **apply_kwargs)
        return out

    def metrics(self) -> dict[str, dict]:
        return {name: lake.metrics() for name, lake in self.tables.items()}

    def checkpoints(self) -> dict[str, dict[int, int]]:
        return {name: lake.checkpoints() for name, lake in self.tables.items()}

    def read_consistent(self, offset: int) -> dict[str, "object"]:
        """Cross-table consistent snapshot at a binlog POSITION: each table
        read as of the newest committed snapshot whose offset watermark is
        ≤ ``offset``. Epochs are applied to every table from the same
        interleaved stream, so all tables resolve to the same epoch boundary —
        a consistent cut at epoch granularity (the granularity the exactly-once
        sink commits at)."""
        return {
            name: lake.read_as_of(offset=offset)
            for name, lake in sorted(self.tables.items())
        }
