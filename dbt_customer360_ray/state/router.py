"""Event routing: stable hash partitioning + hot-key detection + salting.

The reference delegates skew entirely to the warehouse (SURVEY.md §4.1; its only
mitigation is prune-before-join, ``int_customer360__marketo_for_matching.sql:41``).
The engine handles it explicitly per the north rule:

- ``pid = stable_hash(conv_id) % P`` routes every event of a conversation to one
  partition (P fixed across runs so checkpoints line up).
- A cheap pre-pass builds a per-batch key histogram (top-k per batch, combined on
  the driver — a tiny partial aggregation, never a full groupby over the stream).
- Conversations above ``hot_threshold`` (share of events) are salted: their
  events are spread over ``num_salts`` sub-partitions by ``hash(turn_idx)``.
  Because the salt is a pure function of ``turn_idx``, all events for one row
  identity ``(conv_id, turn_idx)`` still meet in the same partition — LWW needs
  no cross-partition re-merge, and per-conversation ordering is restored by the
  read path's per-key sort (SURVEY.md §7.4 point 4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..hashing import partition_ids, stable_hash


def estimate_hot_keys(
    ds,
    total_events: int | None = None,
    hot_threshold: float = 0.05,
    per_batch_topk: int = 64,
) -> set[str]:
    """Partial-aggregation histogram: top-k conv_ids per batch -> combine on driver.

    Returns conv_ids whose observed share exceeds ``hot_threshold``. Cost: one
    streaming pass emitting <= topk rows per batch (no shuffle).
    """

    def partial_counts(batch: pa.Table) -> pa.Table:
        vc = (
            pd.Series(batch.column("conv_id").to_pandas())
            .value_counts()
            .head(per_batch_topk)
        )
        return pa.table(
            {"conv_id": vc.index.astype(str), "n": vc.to_numpy(dtype=np.int64)}
        )

    partials = ds.map_batches(
        partial_counts, batch_format="pyarrow", batch_size=65536
    ).to_pandas()
    if partials.empty:
        return set()
    counts = partials.groupby("conv_id")["n"].sum()
    total = total_events if total_events is not None else int(partials["n"].sum())
    if total <= 0:
        return set()
    return set(counts[counts / total >= hot_threshold].index)


VALID_OPS = ("I", "U", "D")
PATCH_VALID_OPS = ("I", "U", "D", "P")  # patch-mode lakes accept partial images


def invalid_event_mask(
    batch: pa.Table,
    late_cutoff_us: int | None = None,
    valid_ops: tuple = VALID_OPS,
    constraints: tuple = (),
) -> np.ndarray:
    """Rows a binlog tail must quarantine rather than apply: null key parts
    (conv_id/turn_idx), null ts or offset (LWW and exactly-once would be
    undefined), an op outside ``valid_ops``, a declared table-constraint
    violation (``constraints`` — see ``state.constraints``), or — when a
    lateness watermark is configured — ts below ``late_cutoff_us`` (watermark
    − allowed lateness). Vectorized — five null checks, one is_in, one
    compare, one kernel chain per constraint per batch."""
    import pyarrow.compute as pc

    bad = pc.is_null(batch.column("conv_id"))
    for c in ("turn_idx", "ts", "offset"):
        bad = pc.or_(bad, pc.is_null(batch.column(c)))
    op_ok = pc.is_in(batch.column("op"), value_set=pa.array(valid_ops, pa.string()))
    bad = pc.or_(bad, pc.invert(pc.fill_null(op_ok, False)))
    if late_cutoff_us is not None:
        late = pc.fill_null(
            pc.less(batch.column("ts").cast(pa.int64()), late_cutoff_us), False
        )
        bad = pc.or_(bad, late)
    out = bad.to_numpy(zero_copy_only=False)
    if constraints:
        from .constraints import violation_any

        out = out | violation_any(batch, list(constraints))
    return out


def quarantine_reasons(
    batch: pa.Table,
    late_cutoff_us: int | None = None,
    valid_ops: tuple = VALID_OPS,
    constraints: tuple = (),
) -> np.ndarray:
    """One reason string per row (first matching rule), for dead-letter lineage.
    Otherwise-valid rows below the lateness cutoff get 'too_late' (malformed
    reasons take priority — a null-key row is null_key even if also late);
    structurally-valid, on-time rows that broke a table constraint get
    ``chk:<name>`` of the first violated constraint in declaration order."""
    import pyarrow.compute as pc

    n = batch.num_rows
    out = np.full(n, "bad_op", dtype=object)
    op_ok = pc.fill_null(
        pc.is_in(batch.column("op"), value_set=pa.array(valid_ops, pa.string())), False
    ).to_numpy(zero_copy_only=False)
    out[op_ok] = "valid"
    if constraints:
        from .constraints import violation_masks

        # reverse order + overwrite → first declared violation wins
        for spec, m in reversed(
            list(zip(constraints, violation_masks(batch, list(constraints))))
        ):
            out[op_ok & m] = f"{spec.get('kind', 'chk')}:{spec['name']}"
    if late_cutoff_us is not None:
        late = pc.fill_null(
            pc.less(batch.column("ts").cast(pa.int64()), late_cutoff_us), False
        ).to_numpy(zero_copy_only=False)
        out[op_ok & late] = "too_late"
    for col, reason in (
        ("offset", "null_offset"),
        ("ts", "null_ts"),
        ("turn_idx", "null_key"),
        ("conv_id", "null_key"),
    ):
        m = pc.is_null(batch.column(col)).to_numpy(zero_copy_only=False)
        out[m] = reason
    return out


class AssignPartitions:
    """map_batches fn: append int32 shuffle key ``skey = pid * S + salt``.

    ``pid = stable_hash(conv_id) % P`` is the permanent owner partition; ``salt``
    is 0 for cold keys and ``stable_hash(turn_idx) % S`` for hot conv_ids, which
    fans a hot conversation's events out to up to S parallel applier groups while
    keeping ownership (and therefore on-disk state) in one partition.

    Malformed rows (``invalid_event_mask``) are routed to the dedicated
    quarantine key ``P * S`` instead of a partition — the dead-letter group the
    applier side writes under ``deadletter/`` rather than applying.
    """

    def __init__(
        self,
        num_partitions: int,
        hot_keys: set[str] | frozenset[str] = frozenset(),
        num_salts: int = 8,
        late_cutoff_us: int | None = None,
        valid_ops: tuple = VALID_OPS,
        constraints: tuple = (),
    ):
        self.P = num_partitions
        self.hot = frozenset(hot_keys)
        self.S = max(1, num_salts)
        self.late_cutoff_us = late_cutoff_us
        self.valid_ops = valid_ops
        self.constraints = tuple(constraints)

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv = batch.column("conv_id")
        skey = partition_ids(conv, self.P).astype(np.int64) * self.S
        if self.hot and self.S > 1:
            conv_np = conv.to_pandas().to_numpy(dtype=object)
            hot_mask = np.isin(conv_np, list(self.hot))
            if hot_mask.any():
                turn = batch.column("turn_idx").to_numpy(zero_copy_only=False)
                salt = (
                    stable_hash(turn.astype(np.int64).astype(str))
                    % np.uint64(self.S)
                ).astype(np.int64)
                skey = np.where(hot_mask, skey + salt, skey)
        bad = invalid_event_mask(
            batch, self.late_cutoff_us, self.valid_ops, self.constraints
        )
        if bad.any():
            skey = np.where(bad, self.P * self.S, skey)
        return batch.append_column("skey", pa.array(skey.astype(np.int32), type=pa.int32()))
