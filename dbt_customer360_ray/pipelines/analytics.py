"""Driver-gate analytics battery: each ``q_*`` function is a Ray Data pipeline
over the driver's sf-dir parquet tables; ``ORACLE_SQL`` holds the DuckDB oracle
per query (same column names both sides; money summed as integer cents so
float addition order can never flip a value hash).

These re-express, over the driver's tables, the operator classes the reference
uses (SURVEY.md §2): LWW merge (the engine core), grouped aggregation with
map-side partials, broadcast dimension joins, survivorship ranking
(frequency+recency, customer360__email.sql:109), windowed sessionization,
exact dedup, top-k, text fingerprinting, similarity search.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.lww import lww_latest
from ..sources.readers import read_table, read_table_arrow
from ..stages import text as text_stage
from ..stages.windows import sessionize


def _cents(col) -> pa.Array:
    """round(x*100) as int64 — matches SQL CAST(ROUND(x*100) AS BIGINT)."""
    return pc.round(pc.multiply(col, pa.scalar(100.0))).cast(pa.int64())


# -- 1. CDC last-writer-wins over the events table --------------------------

def q_cdc_lww_events(sf_dir: str):
    """LWW winners per (user_id, event_type) keyed on (ts, event_id) — the
    engine's core merge (functions/lww.py) applied to the driver's events
    stream: per-batch partial LWW prunes before the shuffle, a per-group final
    LWW resolves across batches."""
    from ..hashing import stable_hash

    ds = read_table(sf_dir, "events", rows_per_block=50_000)
    keys = ["user_id", "event_type"]
    coarse = 64  # shuffle granularity: per-key groups would be overhead-bound

    def partial(t: pa.Table) -> pa.Table:
        t = lww_latest(t, keys, "ts", "event_id")
        bucket = (stable_hash(t.column("user_id")) % np.uint64(coarse)).astype(np.int64)
        return t.append_column("bucket", pa.array(bucket))

    def final(t: pa.Table) -> pa.Table:
        # lww_latest sorts by the full key, so one call resolves every key in
        # the bucket (all rows of a key share the bucket: hash(user_id))
        return lww_latest(t, keys, "ts", "event_id").drop_columns(["bucket"])

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(final, batch_format="pyarrow")
    )


# -- 2. grouped aggregation with map-side partials (TPC-H Q1 shape) ---------

def q_pricing_summary(sf_dir: str):
    """lineitem rollup by (returnflag, linestatus): partial aggregation inside
    map_batches (pyarrow group_by per batch), then a shuffle-free coalesced
    combine — group cardinality is CONSTANT (≤6), so the final's input is
    blocks×groups tiny rows and repartition(1) is the tree-reduce root, the
    right shape at any data size (SURVEY.md §2.5)."""
    ds = read_table(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
        rows_per_block=50_000,
    )

    def partial(t: pa.Table) -> pa.Table:
        # l_quantity is an integral double; sum as int64 to match the oracle's
        # CAST(SUM(...) AS BIGINT) dtype exactly
        t = t.set_column(
            t.schema.get_field_index("l_quantity"),
            "l_quantity",
            pc.round(t.column("l_quantity")).cast(pa.int64()),
        )
        t = t.append_column("price_cents", _cents(t.column("l_extendedprice")))
        t = t.append_column("one", pa.array(np.ones(t.num_rows, dtype=np.int64)))
        return t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("price_cents", "sum"), ("one", "sum")]
        )

    def final(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity_sum", "sum"), ("price_cents_sum", "sum"), ("one_sum", "sum")]
        )
        return pa.table(
            {
                "l_returnflag": g.column("l_returnflag"),
                "l_linestatus": g.column("l_linestatus"),
                "sum_qty": g.column("l_quantity_sum_sum"),
                "sum_base_price_cents": g.column("price_cents_sum_sum"),
                "count_order": g.column("one_sum_sum"),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


# -- 3. broadcast dimension join + rollup -----------------------------------

def q_revenue_by_nation(sf_dir: str):
    """orders ⋈ customer ⋈ nation via broadcast dict lookups inside map_batches
    (the reference's seed-join pattern, int_customer360__marketo.sql:177-207),
    then grouped cents sums."""
    import ray

    cust = read_table_arrow(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = read_table_arrow(sf_dir, "nation", ["n_nationkey", "n_name"])
    cust_np = {
        "keys": cust.column("c_custkey").to_numpy(),
        "vals": cust.column("c_nationkey").to_numpy(),
    }
    order = np.argsort(cust_np["keys"])
    cust_keys = cust_np["keys"][order]
    cust_vals = cust_np["vals"][order]
    nation_names = dict(
        zip(nation.column("n_nationkey").to_pylist(), nation.column("n_name").to_pylist())
    )
    ref = ray.put((cust_keys, cust_vals))

    def join_partial(t: pa.Table) -> pa.Table:
        keys, vals = ray.get(ref)
        ck = t.column("o_custkey").to_numpy()
        idx = np.searchsorted(keys, ck)
        idx = np.clip(idx, 0, len(keys) - 1)
        nk = np.where(keys[idx] == ck, vals[idx], -1)
        t2 = pa.table(
            {
                "n_nationkey": pa.array(nk.astype(np.int64)),
                "revenue_cents": _cents(t.column("o_totalprice")),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )
        return t2.group_by(["n_nationkey"]).aggregate(
            [("revenue_cents", "sum"), ("one", "sum")]
        )

    def final(t: pa.Table) -> pa.Table:
        # constant group cardinality (25 nations) → shuffle-free coalesced
        # combine; fold the dim-name decode into the same task
        g = t.group_by(["n_nationkey"]).aggregate(
            [("revenue_cents_sum", "sum"), ("one_sum", "sum")]
        )
        names = [nation_names.get(k, None) for k in g.column("n_nationkey").to_pylist()]
        return pa.table(
            {
                "n_name": pa.array(names, pa.string()),
                "revenue_cents": g.column("revenue_cents_sum_sum"),
                "n_orders": g.column("one_sum_sum"),
            }
        )

    return (
        read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"], rows_per_block=50_000)
        .map_batches(join_partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


# -- 4. survivorship ranking (customer360 semantics over events) -------------

def q_survivorship_events(sf_dir: str):
    """Per user, the 'best' event_type by (frequency desc, recency desc, value
    asc) — exactly the reference's confidence ranking
    (customer360__email.sql:109-110) re-keyed to the events table."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type", "ts"], rows_per_block=50_000)

    def partial(t: pa.Table) -> pa.Table:
        # pre-aggregate per block: one (count, max-ts) row per (user, type)
        t = t.append_column("one", pa.array(np.ones(t.num_rows, dtype=np.int64)))
        return t.group_by(["user_id", "event_type"]).aggregate(
            [("one", "sum"), ("ts", "max")]
        )

    def final(t: pa.Table) -> pa.Table:
        # count-sum / ts-max / best-argmax are all associative, so after the
        # per-block partial the remainder runs shuffle-free in ONE coalesced
        # task over ~|users|x|types| rows (tiny). At lake scale — entity
        # cardinality too big for one worker — swap this stage for
        # stages/windows.rank_survivors (coarse-bucket shuffle, same rule).
        g = t.group_by(["user_id", "event_type"]).aggregate(
            [("one_sum", "sum"), ("ts_max", "max")]
        )
        df = g.to_pandas().rename(
            columns={"one_sum_sum": "value_count", "ts_max_max": "last_seen"}
        )
        df = df.sort_values(
            ["user_id", "value_count", "last_seen", "event_type"],
            ascending=[True, False, False, True],
            kind="stable",
        ).drop_duplicates("user_id", keep="first")
        df["value_count"] = df["value_count"].astype(np.int64)
        return pa.Table.from_pandas(
            df.rename(columns={"event_type": "best_event_type"}), preserve_index=False
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


# -- 5. sessionization -------------------------------------------------------

def _footer_buckets(sf_dir: str, name: str) -> int:
    """Shuffle bucket count from the parquet footer's row count — the free
    version of blocks.adaptive_buckets' materialize-and-count."""
    import pyarrow.parquet as pq

    from ..blocks import adaptive_buckets
    from ..sources.readers import table_path

    return adaptive_buckets(
        pq.ParquetFile(table_path(sf_dir, name)).metadata.num_rows, lo=64
    )


def q_sessionize_events(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["user_id", "event_id", "ts"], rows_per_block=50_000)
    return sessionize(
        ds, key="user_id", ts_col="ts", tie_col="event_id", gap_seconds=1800,
        num_buckets=_footer_buckets(sf_dir, "events"),
    )


# -- 6. exact dedup ----------------------------------------------------------

def q_dedup_exact_documents(sf_dir: str):
    """Exact dedup keyed on md5(text) so the group key is portable to SQL."""
    from ray.data.aggregate import Count, Min
    import hashlib

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], rows_per_block=8_000)

    def fp(t: pa.Table) -> pa.Table:
        hashes = [
            hashlib.md5(s.encode("utf-8")).hexdigest() if s is not None else None
            for s in t.column("text").to_pylist()
        ]
        return pa.table({"fp": pa.array(hashes, pa.string()), "doc_id": t.column("doc_id")})

    return ds.map_batches(fp, batch_format="pyarrow").groupby("fp").aggregate(
        Min("doc_id", alias_name="doc_id"), Count(alias_name="n_dups")
    )


# -- 7. token stats ----------------------------------------------------------

def q_token_stats_documents(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], rows_per_block=8_000)
    return ds.map_batches(
        text_stage.token_stats, batch_format="pyarrow", zero_copy_batch=True
    ).select_columns(["doc_id", "n_tokens", "n_chars_calc"])


# -- 8. fingerprint ----------------------------------------------------------

def q_fingerprint_documents(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], rows_per_block=8_000)
    return ds.map_batches(text_stage.fingerprint, batch_format="pyarrow").select_columns(
        ["doc_id", "fp"]
    )


# -- 9. top-k ----------------------------------------------------------------

def q_top_spenders(sf_dir: str):
    """Top 100 customers by order revenue (cents), deterministic tie-break on
    custkey; per-block partial rollup → coalesced shuffle-free final (sums and
    top-k are associative). At lake scale — custkey cardinality too big for
    one worker — insert a hash groupby before the final and keep the same
    (revenue desc, custkey asc) rule; top-k of per-block top-k stays exact
    only AFTER per-key sums are complete, hence the combine-then-rank order."""

    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"], rows_per_block=50_000)

    def partial(t: pa.Table) -> pa.Table:
        t2 = pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "revenue_cents": _cents(t.column("o_totalprice")),
            }
        )
        return t2.group_by(["o_custkey"]).aggregate([("revenue_cents", "sum")])

    def final(t: pa.Table) -> pa.Table:
        g = t.group_by(["o_custkey"]).aggregate([("revenue_cents_sum", "sum")])
        g = g.rename_columns(["o_custkey", "revenue_cents"])
        order = pc.sort_indices(
            g,
            sort_keys=[("revenue_cents", "descending"), ("o_custkey", "ascending")],
        )
        return g.take(order.slice(0, 100))

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


# -- 10. similarity search ---------------------------------------------------

def q_ann_topk_embeddings(sf_dir: str, k: int = 10, num_queries: int = 5):
    """Brute-force cosine top-k for the first ``num_queries`` vectors as queries
    (broadcast query matrix; per-batch matmul partial top-k; per-query merge)."""
    from ..stages.similarity import brute_force_topk

    emb = read_table_arrow(sf_dir, "embeddings", ["vec_id", "embedding"])
    order = pc.sort_indices(emb, sort_keys=[("vec_id", "ascending")])
    emb_sorted = emb.take(order).slice(0, num_queries)
    q_ids = emb_sorted.column("vec_id").to_numpy()
    q_mat = np.stack(emb_sorted.column("embedding").to_pylist())

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"], rows_per_block=2_048)
    out = brute_force_topk(ds, q_mat, q_ids, k=k)
    return out.select_columns(["query_id", "vec_id", "cosine", "rank"])


# -- 11. date_trunc rollup ---------------------------------------------------

def q_events_daily(sf_dir: str):
    """Per-day event counts + value cents (date_trunc semantics, §2.8).
    Day cardinality is bounded (days elapsed, not data size), so the combine
    is a shuffle-free coalesced final over blocks×days partial rows."""
    ds = read_table(sf_dir, "events", columns=["ts", "value"], rows_per_block=50_000)

    def partial(t: pa.Table) -> pa.Table:
        # group on int64 epoch-us; cast back to timestamp[us] in the final so
        # the dtype matches DuckDB's CAST(date_trunc(...) AS TIMESTAMP)
        day = pc.floor_temporal(t.column("ts"), unit="day").cast(pa.int64())
        t2 = pa.table(
            {
                "day_us": day,
                "value_cents": _cents(t.column("value")),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )
        return t2.group_by(["day_us"]).aggregate([("value_cents", "sum"), ("one", "sum")])

    def final(t: pa.Table) -> pa.Table:
        g = t.group_by(["day_us"]).aggregate(
            [("value_cents_sum", "sum"), ("one_sum", "sum")]
        )
        return pa.table(
            {
                "day": g.column("day_us").cast(pa.timestamp("us")),
                "value_cents": g.column("value_cents_sum_sum"),
                "n_events": g.column("one_sum_sum"),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


# -- 12. fact⋈dim rollup on part type ---------------------------------------

def q_parts_by_type(sf_dir: str):
    """lineitem ⋈ part (broadcast) → per-type quantity and revenue cents."""
    import ray

    part = read_table_arrow(sf_dir, "part", ["p_partkey", "p_type"])
    keys = part.column("p_partkey").to_numpy()
    order = np.argsort(keys)
    types = part.column("p_type").to_pandas().to_numpy(dtype=object)[order]
    keys = keys[order]
    uniq_types, type_codes = np.unique(types, return_inverse=True)
    ref = ray.put((keys, type_codes.astype(np.int64)))

    def partial(t: pa.Table) -> pa.Table:
        k, codes = ray.get(ref)
        pk = t.column("l_partkey").to_numpy()
        idx = np.clip(np.searchsorted(k, pk), 0, len(k) - 1)
        code = np.where(k[idx] == pk, codes[idx], -1)
        t2 = pa.table(
            {
                "type_code": pa.array(code.astype(np.int64)),
                # l_quantity is an integral double; sum as int64 to match the
                # oracle's CAST(SUM(...) AS BIGINT) dtype exactly
                "sum_qty": pc.round(t.column("l_quantity")).cast(pa.int64()),
                "revenue_cents": _cents(t.column("l_extendedprice")),
            }
        )
        return t2.group_by(["type_code"]).aggregate(
            [("sum_qty", "sum"), ("revenue_cents", "sum")]
        )

    def final(t: pa.Table) -> pa.Table:
        # constant group cardinality (6 part types) → coalesced combine with
        # the dim-name decode folded in
        g = t.group_by(["type_code"]).aggregate(
            [("sum_qty_sum", "sum"), ("revenue_cents_sum", "sum")]
        )
        names = [
            uniq_types[c] if c >= 0 else None for c in g.column("type_code").to_pylist()
        ]
        return pa.table(
            {
                "p_type": pa.array(names, pa.string()),
                "sum_qty": g.column("sum_qty_sum_sum"),
                "revenue_cents": g.column("revenue_cents_sum_sum"),
            }
        )

    return (
        read_table(sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice"], rows_per_block=50_000)
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


# -- 13. segment stats -------------------------------------------------------

def q_segment_stats(sf_dir: str):
    """customer per market segment: count + balance cents (min/max/sum) —
    per-block partials, coalesced combine (5 segments, constant)."""
    ds = read_table(sf_dir, "customer", columns=["c_mktsegment", "c_acctbal"], rows_per_block=50_000)

    def partial(t: pa.Table) -> pa.Table:
        t2 = pa.table(
            {
                "c_mktsegment": t.column("c_mktsegment"),
                "bal_cents": _cents(t.column("c_acctbal")),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )
        return t2.group_by(["c_mktsegment"]).aggregate(
            [("one", "sum"), ("bal_cents", "sum"), ("bal_cents", "min"), ("bal_cents", "max")]
        )

    def final(t: pa.Table) -> pa.Table:
        g = t.group_by(["c_mktsegment"]).aggregate(
            [
                ("one_sum", "sum"),
                ("bal_cents_sum", "sum"),
                ("bal_cents_min", "min"),
                ("bal_cents_max", "max"),
            ]
        )
        return pa.table(
            {
                "c_mktsegment": g.column("c_mktsegment"),
                "n_customers": g.column("one_sum_sum"),
                "sum_bal_cents": g.column("bal_cents_sum_sum"),
                "min_bal_cents": g.column("bal_cents_min_min"),
                "max_bal_cents": g.column("bal_cents_max_max"),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


ORACLE_SQL: dict[str, str] = {
    "events_daily": """
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
               COUNT(*) AS n_events
        FROM events GROUP BY 1
    """,
    "parts_by_type": """
        SELECT p_type, CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_type
    """,
    "segment_stats": """
        SELECT c_mktsegment, COUNT(*) AS n_customers,
               CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_bal_cents,
               MIN(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS min_bal_cents,
               MAX(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS max_bal_cents
        FROM customer GROUP BY c_mktsegment
    """,
    "cdc_lww_events": """
        SELECT event_id, ts, user_id, event_type, value, props FROM events
        QUALIFY row_number() OVER (
            PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) = 1
    """,
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
               COUNT(*) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "revenue_by_nation": """
        SELECT n_name,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
               COUNT(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "survivorship_events": """
        SELECT user_id, event_type AS best_event_type,
               COUNT(*) AS value_count, MAX(ts) AS last_seen
        FROM events GROUP BY user_id, event_type
        QUALIFY row_number() OVER (
            PARTITION BY user_id
            ORDER BY value_count DESC, last_seen DESC, event_type ASC) = 1
    """,
    "sessionize_events": """
        SELECT user_id, COUNT(*) AS n_events,
               COUNT(*) FILTER (
                   WHERE prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
               ) AS n_sessions
        FROM (
            SELECT user_id, ts,
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
            FROM events
        ) GROUP BY user_id
    """,
    "dedup_exact_documents": """
        SELECT md5(text) AS fp, MIN(doc_id) AS doc_id, COUNT(*) AS n_dups
        FROM documents GROUP BY md5(text)
    """,
    "token_stats_documents": """
        SELECT doc_id,
               len(regexp_extract_all(text, '\\w+')) AS n_tokens,
               length(text) AS n_chars_calc
        FROM documents
    """,
    "fingerprint_documents": """
        SELECT doc_id, md5(lower(text)) AS fp FROM documents
    """,
    "top_spenders": """
        SELECT o_custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM orders GROUP BY o_custkey
        ORDER BY revenue_cents DESC, o_custkey ASC LIMIT 100
    """,
    "ann_topk_embeddings": """
        WITH q AS (
            SELECT vec_id AS query_id, embedding AS qe FROM embeddings
            ORDER BY vec_id LIMIT 5
        ),
        sims AS (
            SELECT q.query_id, e.vec_id,
                   ROUND(CAST(list_cosine_similarity(e.embedding, q.qe) AS DOUBLE), 2) AS cosine
            FROM embeddings e CROSS JOIN q
        )
        SELECT query_id, vec_id, cosine,
               CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
               ) AS BIGINT) AS rank
        FROM sims
        QUALIFY rank <= 10
    """,
}

def _lang_quality_sql() -> str:
    """DuckDB mirror of stages.text.TextQuality — built from the SAME
    LANG_MARKERS tables and RE2 patterns (DuckDB regexp is RE2 too), so the
    marker counts, argmax tie-break (sorted lang order) and float arithmetic
    (identical IEEE op order) reproduce the engine bit-for-bit."""
    from ..stages.text import LANG_MARKERS

    langs = sorted(LANG_MARKERS)
    hit_cols = ",\n               ".join(
        "length(regexp_extract_all(lower(t), '\\b("
        + "|".join(sorted(LANG_MARKERS[lang]))
        + ")\\b')) AS h_" + lang
        for lang in langs
    )
    mx = "greatest(" + ", ".join(f"h_{lang}" for lang in langs) + ")"
    pick = " ".join(f"WHEN h_{lang} = mx THEN '{lang}'" for lang in langs)
    return f"""
        WITH base AS (
            SELECT doc_id, coalesce(text, '') AS t FROM documents
        ), c AS (
            SELECT doc_id,
               length(regexp_extract_all(t, '\\w+')) AS n_tok,
               length(regexp_extract_all(t, '\\w')) AS word_chars,
               length(regexp_extract_all(t, '[^\\w\\s]')) AS punct,
               length(t) AS n_chars,
               {hit_cols}
            FROM base
        ), m AS (
            SELECT *, {mx} AS mx,
                   greatest(n_tok, 1) AS safe_n, greatest(n_chars, 1) AS safe_c
            FROM c
        )
        SELECT doc_id,
               CASE WHEN mx = 0 THEN 'und' {pick} END AS lang_pred,
               CAST(mx AS DOUBLE) / safe_n AS stopword_ratio,
               CAST(word_chars AS DOUBLE) / safe_n AS mean_word_len,
               CAST(punct AS DOUBLE) / safe_c AS punct_ratio,
               (least(greatest(CAST(n_tok AS DOUBLE) / 20.0, 0), 1)
                + least(greatest((CAST(word_chars AS DOUBLE) / safe_n) / 4.0, 0), 1)
                + (1.0 - least(greatest((CAST(punct AS DOUBLE) / safe_c) * 4.0, 0), 1))
               ) / 3.0 AS quality_score
        FROM m
    """


ORACLE_SQL["lang_quality_documents"] = _lang_quality_sql()
ORACLE_SQL["curriculum_phases_documents"] = f"""
    WITH q AS ({_lang_quality_sql()})
    SELECT doc_id, quality_score,
           CAST(ntile(4) OVER (ORDER BY quality_score DESC, doc_id ASC)
                AS BIGINT) AS tile
    FROM q
"""

# SimHash mirror: token hash = md5_number_lower (same bytes the engine reads),
# bit-majority per doc, bit 63 contributes the int64 sign term (two's
# complement wrap, matching the engine's uint64→int64 view).
ORACLE_SQL["simhash_documents"] = """
    WITH toks AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(coalesce(text, '')), '\\w+')) AS tok
        FROM documents
    ), scored AS (
        SELECT doc_id, j.j AS j,
               SUM(CASE WHEN (md5_number_lower(tok) >> j.j) & 1 = 1 THEN 1 ELSE -1 END) AS score
        FROM toks, (SELECT unnest(generate_series(0, 63)) AS j) j
        GROUP BY doc_id, j.j
    ), sims AS (
        SELECT doc_id,
               SUM(CASE WHEN score > 0 THEN
                     CASE WHEN j = 63 THEN CAST(-9223372036854775808 AS HUGEINT)
                          ELSE CAST(CAST(1 AS BIGINT) << j AS HUGEINT) END
                   ELSE 0 END) AS simhash
        FROM scored GROUP BY doc_id
    )
    SELECT d.doc_id, CAST(coalesce(s.simhash, 0) AS BIGINT) AS simhash
    FROM documents d LEFT JOIN sims s ON d.doc_id = s.doc_id
"""

# Near-dup groups: exact trigram-shingle Jaccard ≥ 0.8 all-pairs, connected
# components via recursive closure — the all-pairs truth the engine's
# MinHash-candidates → exact-verify → label-propagation path must reproduce.
# The CTE chain is shared with composed oracles (curate.fineweb_audit_oracle_sql).
MINHASH_GROUPS_CTES = """
    d AS (
        SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '\\w+') AS toks
        FROM documents
    ), sh AS (
        SELECT doc_id,
          list_distinct(CASE WHEN len(toks) >= 3
            THEN list_transform(generate_series(1, len(toks) - 2),
                                i -> array_to_string(toks[i:i+2], ' '))
            ELSE [array_to_string(toks, ' ')] END) AS shingles
        FROM d
    ), e AS (
        SELECT doc_id, unnest(shingles) AS s FROM sh
    ), inter AS (
        SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS n_int
        FROM e x JOIN e y ON x.s = y.s AND x.doc_id < y.doc_id
        GROUP BY 1, 2
    ), sizes AS (
        SELECT doc_id, len(shingles) AS n FROM sh
    ), pairs AS (
        SELECT doc_a, doc_b
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(n_int AS DOUBLE) / (sa.n + sb.n - n_int) >= 0.8
    ), edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs
    ), reach(node, x) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.node, e2.b FROM reach r JOIN edges e2 ON e2.a = r.x
    )
"""

ORACLE_SQL["minhash_near_dups"] = f"""
    WITH RECURSIVE {MINHASH_GROUPS_CTES}
    SELECT node AS doc_id, least(node, min(x)) AS dup_group
    FROM reach GROUP BY node
"""

def q_ngram_jaccard_docs(sf_dir: str):
    """Exact all-pairs n-gram Jaccard dedup (distributed shingle inverted
    index) — the exact baseline the MinHash+LSH path approximates."""
    from ..stages.dedup import ngram_jaccard_pairs

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], rows_per_block=2_048)
    return ngram_jaccard_pairs(ds, threshold=0.8)


# Same shingle CTEs as the minhash oracle, but emitting the qualifying pairs
# with their exact Jaccard (int/int division in DOUBLE — identical operands,
# identical IEEE result as the engine's numpy division).
ORACLE_SQL["ngram_jaccard_docs"] = """
    WITH d AS (
        SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '\\w+') AS toks
        FROM documents
    ), sh AS (
        SELECT doc_id,
          list_distinct(CASE WHEN len(toks) >= 3
            THEN list_transform(generate_series(1, len(toks) - 2),
                                i -> array_to_string(toks[i:i+2], ' '))
            ELSE [array_to_string(toks, ' ')] END) AS shingles
        FROM d
    ), e AS (
        SELECT doc_id, unnest(shingles) AS s FROM sh
    ), inter AS (
        SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS n_int
        FROM e x JOIN e y ON x.s = y.s AND x.doc_id < y.doc_id
        GROUP BY 1, 2
    ), sizes AS (
        SELECT doc_id, len(shingles) AS n FROM sh
    )
    SELECT doc_a, doc_b,
           CAST(n_int AS DOUBLE) / (sa.n + sb.n - n_int) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_int AS DOUBLE) / (sa.n + sb.n - n_int) >= 0.8
"""


# Exact cosine near-dup pairs; the float32 list_cosine_similarity vs the
# engine's float64 matmul agree on membership (fixture margin ≥ 7e-5 at the
# 0.3 threshold), so only the pair ids are compared.
ORACLE_SQL["embedding_near_dups"] = """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.3
"""


def _lsh_topk_sql() -> str:
    """LSH top-k is approximate but DETERMINISTIC given the seeded planes, so
    it is oracle-checkable: the SQL inlines the same plane literals and ranking
    rule (dim pinned to the driver testdata's 64-dim embedding column)."""
    from ..stages.similarity import lsh_topk_oracle_sql

    return lsh_topk_oracle_sql(dim=64, k=10, num_queries=5)


ORACLE_SQL["lsh_topk_embeddings"] = _lsh_topk_sql()


def q_ivf_topk_embeddings(sf_dir: str, k: int = 10, num_queries: int = 5):
    """IVF (inverted-file) ANN top-k — the similarity scale path: each query
    probes only its ``nprobe`` nearest coarse-centroid lists. The quantizer
    here is the seeded pretrained one (``ivf_seeded_centroids``) so the same
    inlined-centroid oracle SQL holds at every sf; the trained path
    (``ivf_train_centroids``) is exercised by tests/test_dedup_text.py."""
    from ..stages.similarity import ivf_seeded_centroids, ivf_topk

    emb = read_table_arrow(sf_dir, "embeddings", ["vec_id", "embedding"])
    order = pc.sort_indices(emb, sort_keys=[("vec_id", "ascending")])
    head = emb.take(order).slice(0, num_queries)
    q_ids = head.column("vec_id").to_numpy()
    q_mat = np.stack(head.column("embedding").to_pylist())
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"], rows_per_block=2_048)
    cent = ivf_seeded_centroids(dim=q_mat.shape[1], num_clusters=16)
    return ivf_topk(ds, q_mat, q_ids, k=k, nprobe=4, centroids=cent)


def _ivf_topk_sql() -> str:
    from ..stages.similarity import ivf_seeded_centroids, ivf_topk_oracle_sql

    cent = ivf_seeded_centroids(dim=64, num_clusters=16)
    return ivf_topk_oracle_sql(cent, k=10, num_queries=5, nprobe=4)


ORACLE_SQL["ivf_topk_embeddings"] = _ivf_topk_sql()


def q_simhash_near_dups(sf_dir: str, max_hamming: int = 3):
    """SimHash near-dup pairs (hamming ≤ 3) with EXACT recall via pigeonhole
    banding — verified by popcount(xor), so the output equals the all-pairs
    SQL answer."""
    from ..stages.dedup import simhash_near_dups

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], rows_per_block=2_048)
    return simhash_near_dups(ds, max_hamming=max_hamming)


def _simhash_near_dups_sql(max_hamming: int = 3) -> str:
    sig_cte = ORACLE_SQL["simhash_documents"].strip().rstrip()
    # reuse the md5-bit-exact signature derivation as a CTE
    body = sig_cte[sig_cte.index("WITH") + 4 :]
    return f"""
    WITH {body.replace('SELECT d.doc_id, CAST(coalesce(s.simhash, 0) AS BIGINT) AS simhash',
                       ', sh AS (SELECT d.doc_id, CAST(coalesce(s.simhash, 0) AS BIGINT) AS sim')
           .replace('FROM documents d LEFT JOIN sims s ON d.doc_id = s.doc_id',
                    'FROM documents d LEFT JOIN sims s ON d.doc_id = s.doc_id)')}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sim, b.sim)) <= {max_hamming}
    """


ORACLE_SQL["simhash_near_dups"] = _simhash_near_dups_sql()


def q_fold_accents_documents(sf_dir: str):
    """Exercises the accent folder (stages/normalize.fold_accents — the
    reference's macros/remove_accents.sql, unused by its models): texts are
    first DECORATED with accents (a→á … u→ú, identically in the oracle SQL)
    so the fold has real work on the all-ASCII fixture, then folded back via
    the seed table."""
    from ..stages.normalize import fold_accents

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], rows_per_block=2_048)
    deco = str.maketrans(_DECORATE)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        decorated = df["text"].map(
            lambda v: v.translate(deco) if isinstance(v, str) else v
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "decorated": decorated,
                "folded": fold_accents(decorated),
            }
        )

    return ds.map_batches(kernel, batch_format="pandas")


_DECORATE = {"a": "á", "e": "é", "i": "í", "o": "ó", "u": "ú"}


def _fold_accents_sql() -> str:
    from ..sources.seeds import ACCENT_FOLD

    one_to_one = {k: v for k, v in ACCENT_FOLD.items() if len(v) == 1}
    frm = "".join(one_to_one)
    to = "".join(one_to_one.values())
    dfrm = "".join(_DECORATE)
    dto = "".join(_DECORATE.values())
    return f"""
    SELECT doc_id,
           translate(text, '{dfrm}', '{dto}') AS decorated,
           replace(translate(translate(text, '{dfrm}', '{dto}'),
                             '{frm}', '{to}'), 'ß', 'ss') AS folded
    FROM documents
    """


ORACLE_SQL["fold_accents_documents"] = _fold_accents_sql()


def q_kmeans_clusters_embeddings(sf_dir: str):
    """Corpus clustering: every embedding assigned to its nearest seeded
    k-means centroid (map-only broadcast matmul) — the partition key a
    100 TB pipeline would use for per-topic dedup / stratified sampling."""
    from ..stages.similarity import ivf_seeded_centroids, kmeans_assign

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"], rows_per_block=2_048)
    return kmeans_assign(ds, ivf_seeded_centroids(dim=64, num_clusters=16))


def _kmeans_sql() -> str:
    from ..stages.similarity import ivf_seeded_centroids, kmeans_assign_oracle_sql

    return kmeans_assign_oracle_sql(ivf_seeded_centroids(dim=64, num_clusters=16))


ORACLE_SQL["kmeans_clusters_embeddings"] = _kmeans_sql()


def q_approx_distinct_texts(sf_dir: str, k: int = 128):
    """KMV bottom-k cardinality sketch over document texts — deterministic
    (md5), so the approximate estimate itself is oracle-checked."""
    from ..stages.sketches import kmv_distinct

    ds = read_table(sf_dir, "documents", columns=["text"])
    return kmv_distinct(ds, "text", k=k)


def _approx_distinct_sql() -> str:
    from ..stages.sketches import kmv_oracle_sql

    return kmv_oracle_sql("text", "documents", k=128)


ORACLE_SQL["approx_distinct_texts"] = _approx_distinct_sql()


def q_vocab_overlap_documents(sf_dir: str, k: int = 256):
    """KMV set operations between two corpus slices: distinct-token counts,
    union, Jaccard and intersection estimated from mergeable bottom-k
    sketches — ≤k hashes per side leave the cluster; the deterministic
    estimates themselves are oracle-checked."""
    from ..stages.sketches import kmv_vocab_overlap

    ds = read_table(sf_dir, "documents", columns=["text", "lang"])
    return kmv_vocab_overlap(ds, a="en", b="fr", k=k)


def _vocab_overlap_sql() -> str:
    from ..stages.sketches import kmv_overlap_oracle_sql

    return kmv_overlap_oracle_sql("documents", a="en", b="fr", k=256)


ORACLE_SQL["vocab_overlap_documents"] = _vocab_overlap_sql()


HH_PHI = 0.001


def q_heavy_hitter_users(sf_dir: str, phi: float = HH_PHI):
    """EXACT φ-heavy hitters over event user_ids: two-pass Misra-Gries
    (≤⌈2/φ⌉-row summaries per batch, merged candidates, exact verify scan) —
    no all-to-all on row data at any scale."""
    from ..stages.sketches import heavy_hitters

    ds = read_table(sf_dir, "events", columns=["user_id"])
    return heavy_hitters(ds, "user_id", phi)


def _heavy_hitters_sql() -> str:
    from ..stages.sketches import heavy_hitters_oracle_sql

    return heavy_hitters_oracle_sql("user_id", "events", HH_PHI)


ORACLE_SQL["heavy_hitter_users"] = _heavy_hitters_sql()


_PRICE_BANDS = [
    ("small", 0.0, 100_000.0),
    ("mid", 100_000.0, 250_000.0),
    ("large", 250_000.0, 1e12),
]


def q_orders_price_bands(sf_dir: str):
    """Range (band) join: orders matched to price tiers by
    lo <= o_totalprice < hi (broadcast ranges + searchsorted, map-only), then
    a per-band rollup (3 bands, constant → coalesced combine)."""
    import pandas as pd

    from ..stages.joins import range_join

    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"], rows_per_block=50_000)
    bands = pd.DataFrame(_PRICE_BANDS, columns=["band", "lo", "hi"])
    joined = range_join(ds, bands, "o_totalprice")

    def partial(t: pa.Table) -> pa.Table:
        t2 = pa.table(
            {
                "band": t.column("band"),
                "price_cents": _cents(t.column("o_totalprice")),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )
        return t2.group_by(["band"]).aggregate(
            [("price_cents", "sum"), ("one", "sum")]
        )

    def final(t: pa.Table) -> pa.Table:
        g = t.group_by(["band"]).aggregate(
            [("price_cents_sum", "sum"), ("one_sum", "sum")]
        )
        return pa.table(
            {
                "band": g.column("band"),
                "total_cents": g.column("price_cents_sum_sum"),
                "n_orders": g.column("one_sum_sum"),
            }
        )

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


ORACLE_SQL["orders_price_bands"] = """
    WITH bands(band, lo, hi) AS (VALUES
        ('small', 0.0, 100000.0),
        ('mid', 100000.0, 250000.0),
        ('large', 250000.0, 1e12)
    )
    SELECT band,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_cents,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band
"""


def q_split_documents(sf_dir: str):
    """Deterministic hash train/test split (id-stable across reruns and
    cluster sizes; map-only)."""
    from ..stages.sampling import hash_split

    ds = read_table(sf_dir, "documents", columns=["doc_id"], rows_per_block=8_000)
    return hash_split(ds, "doc_id", test_permille=100)


def q_sample_documents(sf_dir: str):
    """Deterministic 25% sample — same rows kept on every rerun."""
    from ..stages.sampling import hash_sample

    ds = read_table(sf_dir, "documents", columns=["doc_id"], rows_per_block=8_000)
    return hash_sample(ds, "doc_id", keep_permille=250)


def _sampling_sql():
    from ..stages.sampling import hash_sample_oracle_sql, hash_split_oracle_sql

    ORACLE_SQL["split_documents"] = hash_split_oracle_sql(
        "documents", "doc_id", test_permille=100
    )
    ORACLE_SQL["sample_documents"] = hash_sample_oracle_sql(
        "documents", "doc_id", keep_permille=250
    )


_sampling_sql()


def q_shuffle_shard_documents(sf_dir: str, num_shards: int = 8):
    """Deterministic global shuffle dealt into training shards: map-only shard
    assignment + per-shard md5 ordering — same (shard, pos) for every id at
    any cluster size."""
    from ..stages.sampling import shuffle_shard

    ds = read_table(sf_dir, "documents", columns=["doc_id"], rows_per_block=8_000)
    return shuffle_shard(ds, "doc_id", num_shards=num_shards)


def q_chunk_documents(sf_dir: str, chunk_size: int = 16):
    """Token-budget chunking of every document into 16-token pieces —
    map-only, vectorized per chunk index."""
    from ..stages.text import chunk_tokens

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], rows_per_block=2_048)
    return ds.map_batches(
        lambda t, c=chunk_size: chunk_tokens(t, chunk_size=c),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_decontaminate_documents(sf_dir: str, n: int = 4):
    """Benchmark decontamination: docs with doc_id % 37 == 0 form the eval
    set; surviving train docs share no word 4-gram with it (broadcast
    eval-gram set, one map-only pass over the corpus)."""
    from ..stages.decontaminate import decontaminate

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], rows_per_block=2_048)
    eval_ds = ds.map_batches(
        lambda b: b[b["doc_id"] % 37 == 0], batch_format="pandas"
    )
    train_ds = ds.map_batches(
        lambda b: b[b["doc_id"] % 37 != 0], batch_format="pandas"
    )
    return decontaminate(train_ds, eval_ds, n=n)


def q_pack_documents(sf_dir: str, seq_len: int = 64, num_shards: int = 4):
    """Concat-then-chunk sequence packing: documents laid end to end per shard
    in deterministic md5 order, token stream cut every 64 tokens; emits each
    doc's (shard, pos, seq_start, seq_end, offset_in_seq)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.sampling import pack_sequences

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], rows_per_block=8_000)

    def with_counts(t: pa.Table) -> pa.Table:
        n = pc.cast(
            pc.list_value_length(pc.split_pattern(t.column("text"), pattern=" ")),
            pa.int64(),
        )
        return pa.table({"doc_id": t.column("doc_id"), "n_tokens": n})

    counted = ds.map_batches(with_counts, batch_format="pyarrow", zero_copy_batch=True)
    return pack_sequences(
        counted, "doc_id", "n_tokens", seq_len=seq_len, num_shards=num_shards
    )


def q_top_terms_documents(sf_dir: str, k: int = 3):
    """Per-doc distinctive terms: top-3 by (tf desc, global df asc, term) —
    integer-ranked tf-idf stand-in, two map-only passes with a broadcast
    vocabulary df table."""
    from ..stages.text import top_terms

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], rows_per_block=2_048)
    return top_terms(ds, k=k)


def q_event_gaps(sf_dir: str):
    """lead()/lag() per-row window: whole seconds to each user's previous and
    next event — bucket-by-key, one stable sort per bucket."""
    from ..stages.windows import lead_lag_gaps

    ds = read_table(
        sf_dir, "events", columns=["event_id", "user_id", "ts"], rows_per_block=50_000
    )
    return lead_lag_gaps(ds)


def q_quantize_embeddings(sf_dir: str):
    """int8 scalar quantization of the embedding column (per-vector max-abs
    scale, floor-plus-half rounding) — map-only, bit-exactly oracled."""
    from ..stages.similarity import quantize_int8

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"], rows_per_block=2_048)
    return quantize_int8(ds)


def q_rp_sketch_embeddings(sf_dir: str):
    """Johnson-Lindenstrauss reduction as an integer sketch: int8 quantize,
    then a seeded Achlioptas sparse-sign projection (64 → 8 dims) — map-only,
    all-int64 after quantization, bit-exactly oracled with the sign matrix
    inlined into the SQL."""
    from ..stages.similarity import rp_sketch

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"], rows_per_block=2_048)
    return rp_sketch(ds, dim=64, out_dim=8, seed=29)


def _training_data_sql():
    from ..stages.decontaminate import decontaminate_oracle_sql
    from ..stages.sampling import pack_sequences_oracle_sql, shuffle_shard_oracle_sql
    from ..stages.similarity import quantize_int8_oracle_sql, rp_sketch_oracle_sql
    from ..stages.text import chunk_tokens_oracle_sql, top_terms_oracle_sql

    ORACLE_SQL["top_terms_documents"] = top_terms_oracle_sql("documents", k=3)
    ORACLE_SQL["quantize_embeddings"] = quantize_int8_oracle_sql("embeddings")
    ORACLE_SQL["rp_sketch_embeddings"] = rp_sketch_oracle_sql(
        dim=64, out_dim=8, seed=29, table="embeddings"
    )

    from ..stages.windows import lead_lag_gaps_oracle_sql

    ORACLE_SQL["event_gaps"] = lead_lag_gaps_oracle_sql("events")

    ORACLE_SQL["pack_documents"] = pack_sequences_oracle_sql(
        "documents", "doc_id", "len(string_split(text, ' '))",
        seq_len=64, num_shards=4,
    )

    ORACLE_SQL["shuffle_shard_documents"] = shuffle_shard_oracle_sql(
        "documents", "doc_id", num_shards=8
    )
    ORACLE_SQL["chunk_documents"] = chunk_tokens_oracle_sql(
        "documents", chunk_size=16
    )
    ORACLE_SQL["decontaminate_documents"] = decontaminate_oracle_sql(
        "documents", n=4
    )


_training_data_sql()


def q_orders_window_pairs(sf_dir: str):
    """Big×big range join (point_in_interval_join): orders landing inside
    ANOTHER order's 7-day window for the same customer — both sides are the
    full orders table (neither fits a broadcast at scale), composed via the
    coarse time-grid + bucketed hash join path that range_join documents."""
    from ..stages.joins import point_in_interval_join

    week_us = 7 * 86_400 * 1_000_000

    orders = read_table(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate"], rows_per_block=50_000,
    )

    def pprep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "order_a": t.column("o_orderkey"),
                "o_custkey": t.column("o_custkey"),
                "ts": t.column("o_orderdate"),
            }
        )

    def iprep(t: pa.Table) -> pa.Table:
        lo = t.column("o_orderdate")
        hi = pc.add(lo, pa.scalar(week_us, pa.duration("us")))
        return pa.table(
            {
                "order_b": t.column("o_orderkey"),
                "o_custkey": t.column("o_custkey"),
                "lo": lo,
                "hi": hi,
            }
        )

    points = orders.map_batches(pprep, batch_format="pyarrow", zero_copy_batch=True)
    intervals = orders.map_batches(iprep, batch_format="pyarrow", zero_copy_batch=True)
    joined = point_in_interval_join(
        points, intervals, key="o_custkey", ts="ts", lo="lo", hi="hi",
        grid_seconds=7 * 86_400,
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = df.loc[df["order_a"] != df["order_b"], ["order_a", "order_b"]]
        return out

    return joined.map_batches(finish, batch_format="pandas")


ORACLE_SQL["orders_window_pairs"] = """
    SELECT a.o_orderkey AS order_a, b.o_orderkey AS order_b
    FROM orders a JOIN orders b
      ON a.o_custkey = b.o_custkey AND a.o_orderkey != b.o_orderkey
     AND a.o_orderdate >= b.o_orderdate
     AND a.o_orderdate < b.o_orderdate + INTERVAL 7 DAY
"""


def q_user_value_quantiles(sf_dir: str):
    """Per-user exact value quantiles (p25/p50/p75 of event cents) — the
    grouped_quantiles window operator; int-cents inputs + dyadic fractions
    keep the interpolation bit-identical to DuckDB's quantile_cont."""
    from ..stages.windows import grouped_quantiles

    ds = read_table(sf_dir, "events", columns=["user_id", "value"], rows_per_block=50_000)

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"user_id": t.column("user_id"), "cents": _cents(t.column("value"))}
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_quantiles(
        prepped, "user_id", "cents", num_buckets=_footer_buckets(sf_dir, "events")
    )


ORACLE_SQL["user_value_quantiles"] = """
    SELECT user_id,
           quantile_cont(cents, 0.25) AS p25,
           quantile_cont(cents, 0.5) AS p50,
           quantile_cont(cents, 0.75) AS p75
    FROM (SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents FROM events)
    GROUP BY user_id
"""


def q_stratified_sample_events(sf_dir: str, n_per_key: int = 20):
    """Deterministic stratified sample: 20 events per event_type, picked by
    md5 rank — id-stable across reruns and cluster sizes (two-stage top-n,
    partial per batch then per-bucket final)."""
    from ..stages.sampling import stratified_sample

    ds = read_table(
        sf_dir, "events", columns=["event_id", "event_type"], rows_per_block=50_000
    )
    return stratified_sample(ds, "event_type", "event_id", n_per_key)


def _stratified_sql():
    from ..stages.sampling import stratified_sample_oracle_sql

    ORACLE_SQL["stratified_sample_events"] = stratified_sample_oracle_sql(
        "events", "event_type", "event_id", 20
    )


_stratified_sql()


def q_rolling_events(sf_dir: str):
    """Sliding event-time window per user: every event's trailing-1-hour count
    and value-cents sum (RANGE ... PRECEDING semantics, peers included)."""
    from ..stages.windows import rolling_window

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"], rows_per_block=50_000)

    def prep(t: pa.Table) -> pa.Table:
        return t.append_column("value_cents", _cents(t.column("value"))).drop_columns(
            ["value"]
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return rolling_window(
        prepped, keep_cols=("event_id",), window_seconds=3600,
        num_buckets=_footer_buckets(sf_dir, "events"),
    )


ORACLE_SQL["rolling_events"] = """
    SELECT user_id, ts, event_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_window,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT)
               AS cents_window
    FROM events
    WINDOW w AS (
        PARTITION BY user_id ORDER BY ts
        RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
    )
"""


def q_asof_order_events(sf_dir: str):
    """As-of join: each order matched to the customer's latest event at or
    before the order date (hash-bucketed merge_asof per key bucket). The
    right side is pre-aggregated to one row per (user_id, ts) — max cents —
    so tie-breaking is deterministic on both the engine and the oracle."""
    from ..stages.joins import asof_join

    orders = read_table(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        rows_per_block=50_000,
    )

    def oprep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "user_id": t.column("o_custkey"),
                "ts": t.column("o_orderdate"),
            }
        )

    left = orders.map_batches(oprep, batch_format="pyarrow", zero_copy_batch=True)

    events = read_table(
        sf_dir, "events", columns=["user_id", "ts", "value"], rows_per_block=50_000
    )

    def eprep(t: pa.Table) -> pa.Table:
        t2 = pa.table(
            {
                "user_id": t.column("user_id"),
                "ts": t.column("ts"),
                "cents": _cents(t.column("value")),
            }
        )
        # batch-level partial dedup: shrinks the asof shuffle input; the
        # global (user_id, ts) max runs inside the asof bucket kernel
        # (right_dedup) — no separate groupby shuffle
        g = t2.group_by(["user_id", "ts"]).aggregate([("cents", "max")])
        return pa.table(
            {
                "user_id": g.column("user_id"),
                "ts": g.column("ts"),
                "last_event_ts": g.column("ts"),
                "last_event_cents": g.column("cents_max"),
            }
        )

    right = events.map_batches(eprep, batch_format="pyarrow", zero_copy_batch=True)
    return asof_join(
        left, right, key="user_id", ts="ts", right_dedup=True,
        num_buckets=_footer_buckets(sf_dir, "events"),
    )


ORACLE_SQL["asof_order_events"] = """
    WITH ev AS (
        SELECT user_id, ts, ts AS last_event_ts,
               max(CAST(round(value * 100) AS BIGINT)) AS last_event_cents
        FROM events GROUP BY user_id, ts
    )
    SELECT o.o_orderkey, o.o_custkey AS user_id, o.o_orderdate AS ts,
           e.last_event_ts, e.last_event_cents
    FROM orders o ASOF LEFT JOIN ev e
      ON o.o_custkey = e.user_id AND e.ts <= o.o_orderdate
"""


def q_redact_pii_documents(sf_dir: str):
    """PII scrub over the documents table: map-only RE2 redaction (emails →
    <EMAIL>, phone runs → <PHONE>) with per-doc redaction counts."""
    from ..stages.text import redact_pii

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], rows_per_block=2_048)
    return ds.map_batches(redact_pii, batch_format="pyarrow", zero_copy_batch=True)


def _redact_pii_sql() -> str:
    from ..stages.text import PII_EMAIL_RE, PII_PHONE_RE

    return f"""
    WITH no_email AS (
        SELECT doc_id,
               CAST(length(regexp_extract_all(text, '{PII_EMAIL_RE}')) AS BIGINT)
                   AS n_emails,
               regexp_replace(text, '{PII_EMAIL_RE}', '<EMAIL>', 'g') AS t1
        FROM documents
    )
    SELECT doc_id,
           regexp_replace(t1, '{PII_PHONE_RE}', '<PHONE>', 'g') AS text_redacted,
           n_emails,
           CAST(length(regexp_extract_all(t1, '{PII_PHONE_RE}')) AS BIGINT)
               AS n_phones
    FROM no_email
    """


ORACLE_SQL["redact_pii_documents"] = _redact_pii_sql()


QUERIES = {
    "events_daily": q_events_daily,
    "parts_by_type": q_parts_by_type,
    "segment_stats": q_segment_stats,
    "cdc_lww_events": q_cdc_lww_events,
    "pricing_summary": q_pricing_summary,
    "revenue_by_nation": q_revenue_by_nation,
    "survivorship_events": q_survivorship_events,
    "sessionize_events": q_sessionize_events,
    "dedup_exact_documents": q_dedup_exact_documents,
    "ngram_jaccard_docs": q_ngram_jaccard_docs,
    "token_stats_documents": q_token_stats_documents,
    "fingerprint_documents": q_fingerprint_documents,
    "top_spenders": q_top_spenders,
    "ann_topk_embeddings": q_ann_topk_embeddings,
    "ivf_topk_embeddings": q_ivf_topk_embeddings,
    "approx_distinct_texts": q_approx_distinct_texts,
    "vocab_overlap_documents": q_vocab_overlap_documents,
    "heavy_hitter_users": q_heavy_hitter_users,
    "rolling_events": q_rolling_events,
    "orders_price_bands": q_orders_price_bands,
    "asof_order_events": q_asof_order_events,
    "redact_pii_documents": q_redact_pii_documents,
    "kmeans_clusters_embeddings": q_kmeans_clusters_embeddings,
    "fold_accents_documents": q_fold_accents_documents,
    "simhash_near_dups": q_simhash_near_dups,
    "split_documents": q_split_documents,
    "sample_documents": q_sample_documents,
    "shuffle_shard_documents": q_shuffle_shard_documents,
    "chunk_documents": q_chunk_documents,
    "decontaminate_documents": q_decontaminate_documents,
    "pack_documents": q_pack_documents,
    "top_terms_documents": q_top_terms_documents,
    "quantize_embeddings": q_quantize_embeddings,
    "rp_sketch_embeddings": q_rp_sketch_embeddings,
    "event_gaps": q_event_gaps,
    "stratified_sample_events": q_stratified_sample_events,
    "user_value_quantiles": q_user_value_quantiles,
    "orders_window_pairs": q_orders_window_pairs,
}


# -- 34. hierarchical ROLLUP aggregate ---------------------------------------

def q_rollup_pricing(sf_dir: str):
    """GROUP BY ROLLUP (l_returnflag, l_linestatus): all three grouping levels
    in one pass. Scale shape: the FINEST level is aggregated once with the
    partial-combine pattern of q_pricing_summary (constant cardinality), and
    the coarser levels re-aggregate that tiny table — sums of sums, never a
    second pass over the fact table (the standard reaggregability argument)."""
    ds = read_table(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
        rows_per_block=50_000,
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.set_column(
            t.schema.get_field_index("l_quantity"),
            "l_quantity",
            pc.round(t.column("l_quantity")).cast(pa.int64()),
        )
        t = t.append_column("price_cents", _cents(t.column("l_extendedprice")))
        t = t.append_column("one", pa.array(np.ones(t.num_rows, dtype=np.int64)))
        return t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("price_cents", "sum"), ("one", "sum")]
        )

    def rollup(t: pa.Table) -> pa.Table:
        finest = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity_sum", "sum"), ("price_cents_sum", "sum"), ("one_sum", "sum")]
        )
        df = finest.to_pandas().rename(
            columns={
                "l_quantity_sum_sum": "sum_qty",
                "price_cents_sum_sum": "sum_base_price_cents",
                "one_sum_sum": "count_order",
            }
        )
        measures = ["sum_qty", "sum_base_price_cents", "count_order"]
        by_flag = df.groupby("l_returnflag", as_index=False)[measures].sum()
        by_flag["l_linestatus"] = None
        total = df[measures].sum().to_frame().T
        total["l_returnflag"] = None
        total["l_linestatus"] = None
        cols = ["l_returnflag", "l_linestatus"] + measures
        out = pd.concat([df[cols], by_flag[cols], total[cols]], ignore_index=True)
        return pa.Table.from_pandas(out, preserve_index=False).cast(
            pa.schema(
                [
                    ("l_returnflag", pa.string()),
                    ("l_linestatus", pa.string()),
                    ("sum_qty", pa.int64()),
                    ("sum_base_price_cents", pa.int64()),
                    ("count_order", pa.int64()),
                ]
            )
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(rollup, batch_format="pyarrow", batch_size=None)
    )


ORACLE_SQL["rollup_pricing"] = """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS sum_base_price_cents,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# -- 35. pivot (conditional aggregation) --------------------------------------

def q_events_pivot(sf_dir: str):
    """Per-day event counts pivoted into one column per event_type —
    conditional aggregation, the warehouse PIVOT. The type set is a fixed
    enum (schema knowledge, like the reference's hardcoded source list,
    SURVEY §2.10), so the pivot is a constant-width partial aggregate with
    the same shuffle-free coalesced combine as q_events_daily."""
    types = ["click", "error", "purchase", "signup", "view"]
    ds = read_table(sf_dir, "events", columns=["ts", "event_type"], rows_per_block=50_000)

    def partial(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t.column("ts"), unit="day").cast(pa.int64())
        cols = {"day_us": day}
        et = t.column("event_type")
        for ty in types:
            cols[f"n_{ty}"] = pc.equal(et, ty).cast(pa.int64())
        return pa.table(cols).group_by(["day_us"]).aggregate(
            [(f"n_{ty}", "sum") for ty in types]
        )

    def final(t: pa.Table) -> pa.Table:
        g = t.group_by(["day_us"]).aggregate(
            [(f"n_{ty}_sum", "sum") for ty in types]
        )
        out = {"day": g.column("day_us").cast(pa.timestamp("us"))}
        for ty in types:
            out[f"n_{ty}"] = g.column(f"n_{ty}_sum_sum")
        return pa.table(out)

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


ORACLE_SQL["events_pivot"] = """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
           CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error,
           CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
           CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS n_signup,
           CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view
    FROM events
    GROUP BY 1
"""

QUERIES["rollup_pricing"] = q_rollup_pricing
QUERIES["events_pivot"] = q_events_pivot


# -- 36. global window rank: NTILE over a distributed sort --------------------

def q_user_spend_ntile(sf_dir: str, n: int = 4):
    """Spend quartiles: per-user event-value totals (distributed groupby sum)
    → exact global NTILE(4) ordered by (total DESC, user_id ASC). The global
    row number comes from one distributed sort + an O(blocks) driver offset
    pass (stages/windows.global_row_number) — no per-row driver work, the
    distributed form of the unpartitioned SQL window Ray Data lacks."""
    from ray.data.aggregate import Sum

    from ..stages.windows import with_ntile

    ds = read_table(sf_dir, "events", columns=["user_id", "value"], rows_per_block=50_000)

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"user_id": t.column("user_id"), "cents": _cents(t.column("value"))}
        )

    totals = (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(Sum("cents", alias_name="total_cents"))
    )
    return with_ntile(
        totals, n, keys=["total_cents", "user_id"], descending=[True, False]
    )


def q_curriculum_phases(sf_dir: str, n: int = 4):
    """Curriculum-learning phase assignment: quality-score the corpus
    (TextQuality actor pool — the lang_quality kernel), then exact global
    NTILE(n) ordered by (quality_score DESC, doc_id ASC) — tile 1 is the
    cleanest quarter, the 'high-quality-first' training curriculum.
    Composition of existing machinery: distributed sort + O(blocks) driver
    offset pass (stages/windows.with_ntile); the quality arithmetic is
    bit-exact vs SQL, so the phase boundaries are too."""
    from ..stages.text import analyze_text
    from ..stages.windows import with_ntile

    ds = read_table(
        sf_dir, "documents", columns=["doc_id", "text"], rows_per_block=2_048
    )
    scored = analyze_text(ds).select_columns(["doc_id", "quality_score"])
    return with_ntile(
        scored, n, keys=["quality_score", "doc_id"], descending=[True, False]
    )


QUERIES["curriculum_phases_documents"] = q_curriculum_phases


ORACLE_SQL["user_spend_ntile"] = """
    WITH totals AS (
        SELECT user_id,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
        FROM events GROUP BY 1
    )
    SELECT user_id, total_cents,
           CAST(ntile(4) OVER (ORDER BY total_cents DESC, user_id ASC) AS BIGINT)
               AS tile
    FROM totals
"""

QUERIES["user_spend_ntile"] = q_user_spend_ntile


# -- 38. token count-vector cosine near-dup -----------------------------------


def q_tf_cosine_near_dups(sf_dir: str):
    """Bag-of-words cosine near-dup pairs: corpus vocab (broadcast) → count
    vectors → distributed block-pair matmul tiles; exact integer dot/norms so
    the float64 cosines hash-match the SQL term-join oracle bit-for-bit."""
    from ..stages.dedup import tf_cosine_near_dups

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], rows_per_block=2_048)
    return tf_cosine_near_dups(ds, threshold=0.95)


def _tf_cosine_sql():
    from ..stages.dedup import tf_cosine_oracle_sql

    ORACLE_SQL["tf_cosine_near_dups"] = tf_cosine_oracle_sql(
        "documents", threshold=0.95
    )


_tf_cosine_sql()
QUERIES["tf_cosine_near_dups"] = q_tf_cosine_near_dups


# -- 39-41. inverted index / collocations / duplicated k-gram share -----------


def q_postings_documents(sf_dir: str):
    """Inverted index: exact df + first-64 ascending postings per term — one
    map-only partial pass, one vocab-sized bucketed merge shuffle."""
    from ..stages.text import inverted_index

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], rows_per_block=2_048)
    return inverted_index(ds)


def q_bigram_lift_documents(sf_dir: str):
    """Top-200 collocations by bigram count with division-only lift
    (p(x,y)/p(x)p(y)) — partial counts, one vocab²-bounded groupby."""
    from ..stages.text import bigram_lift

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], rows_per_block=2_048)
    return bigram_lift(ds)


def q_kgram_dup_documents(sf_dir: str):
    """Per-doc duplicated 5-gram share (Lee et al. exact-substring signal):
    partial dfs → duplicated-gram set broadcast → map-only membership pass."""
    from ..stages.text import kgram_dup_stats

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], rows_per_block=2_048)
    return kgram_dup_stats(ds)


def q_span_dedup_documents(sf_dir: str):
    """Exact span dedup REWRITE (Lee et al. 2022 ExactSubstr, window-
    quantized): 16-token spans, corpus-wide first occurrence survives,
    documents reassembled from surviving spans. kgram_dup_documents is the
    read-only signal twin."""
    from ..stages.dedup import span_dedup

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], rows_per_block=2_048)
    return span_dedup(ds, width=16)


def q_span_corrupt_documents(sf_dir: str):
    """T5 span-corruption pretraining pairs (Raffel et al. 2020 §3.1.4):
    deterministic md5-permille noise mask → inputs with <extra_id_k>
    sentinels + targets listing each span; map-only, id-stable across
    cluster sizes, fully SQL-oracled."""
    from ..stages.text import span_corrupt

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], rows_per_block=2_048)
    return span_corrupt(ds)


def _text_index_sql():
    from ..stages.dedup import span_dedup_oracle_sql
    from ..stages.text import (
        bigram_lift_oracle_sql,
        inverted_index_oracle_sql,
        kgram_dup_oracle_sql,
        span_corrupt_oracle_sql,
    )

    ORACLE_SQL["postings_documents"] = inverted_index_oracle_sql("documents")
    ORACLE_SQL["bigram_lift_documents"] = bigram_lift_oracle_sql("documents")
    ORACLE_SQL["kgram_dup_documents"] = kgram_dup_oracle_sql("documents")
    ORACLE_SQL["span_dedup_documents"] = span_dedup_oracle_sql("documents", width=16)
    ORACLE_SQL["span_corrupt_documents"] = span_corrupt_oracle_sql("documents")


_text_index_sql()
QUERIES["postings_documents"] = q_postings_documents
QUERIES["bigram_lift_documents"] = q_bigram_lift_documents
QUERIES["kgram_dup_documents"] = q_kgram_dup_documents
QUERIES["span_dedup_documents"] = q_span_dedup_documents
QUERIES["span_corrupt_documents"] = q_span_corrupt_documents


# -- 42. broadcast anti join --------------------------------------------------


BIG_ORDER = 350_000.0


def q_customers_without_orders(sf_dir: str):
    """Anti join: customers with NO big-ticket order (o_totalprice >
    BIG_ORDER) — the qualifying custkeys are filtered AT THE READ, made
    distinct per batch, broadcast once (ray.put), then one map-only
    membership pass over customers. No shuffle; the bucketed-join fallback
    applies when the key set outgrows broadcast."""
    from ..stages.joins import anti_join

    orders = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_totalprice"],
        rows_per_block=50_000,
    ).filter(expr=f"o_totalprice > {BIG_ORDER}")
    keys = set(orders.unique("o_custkey"))
    cust = read_table(
        sf_dir, "customer",
        columns=["c_custkey", "c_name", "c_acctbal"],
        rows_per_block=50_000,
    )
    return anti_join(cust, keys, on="c_custkey")


ORACLE_SQL["customers_without_orders"] = f"""
    SELECT c_custkey, c_name, c_acctbal FROM customer
    WHERE c_custkey NOT IN (
        SELECT o_custkey FROM orders WHERE o_totalprice > {BIG_ORDER}
    )
"""
QUERIES["customers_without_orders"] = q_customers_without_orders


# -- 43. hopping (sliding) window counts --------------------------------------


def q_events_hopping(sf_dir: str):
    """Hopping event-time window: 1-hour windows every 30 minutes (each event
    lands in exactly 2 windows). One map-only fan-out+partial-aggregate pass,
    then a window-count-bounded groupby — shuffle volume O(windows × batches),
    never O(events). Integer keys/sums only, so the oracle hash-matches."""
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "events", columns=["ts", "value"], rows_per_block=50_000)

    def partial(t: pa.Table) -> pd.DataFrame:
        sec = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False) // 1_000_000
        base = (sec // 1800) * 1800
        cents = _cents(t.column("value")).to_numpy(zero_copy_only=False)
        win = np.concatenate([base, base - 1800])
        c2 = np.concatenate([cents, cents])
        g = (
            pd.DataFrame({"win_start": win, "cents": c2})
            .groupby("win_start", sort=False)
            .agg(n=("cents", "size"), cents=("cents", "sum"))
            .reset_index()
        )
        return g

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("win_start")
        .aggregate(Sum("n", alias_name="n_events"), Sum("cents", alias_name="sum_cents"))
    )


ORACLE_SQL["events_hopping"] = """
    WITH w AS (
        SELECT unnest([
                   (CAST(floor(epoch(ts)) AS BIGINT) // 1800) * 1800,
                   (CAST(floor(epoch(ts)) AS BIGINT) // 1800) * 1800 - 1800
               ]) AS win_start,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    )
    SELECT win_start, CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM w GROUP BY 1
"""
QUERIES["events_hopping"] = q_events_hopping


# -- 44. funnel analysis (ordered stage matching per user) ---------------------

FUNNEL_STAGES = ["signup", "view", "click", "purchase"]


def q_funnel_events(sf_dir: str):
    """Funnel: per user, the earliest signup, then the earliest view STRICTLY
    AFTER it, then the earliest click after that, then the earliest purchase —
    ordered-sequence matching, the product-analytics workhorse no single SQL
    aggregate expresses (each stage's floor depends on the previous stage's
    answer).

    Shape: one shuffle by user bucket, then each stage resolved VECTORIZEDLY
    within the bucket (a filter + map + groupby-min per stage — 4 passes over
    the bucket, no per-user Python). Users who never signed up are out of the
    funnel; a user stalls at the first stage with no qualifying later event
    (comparisons against NaT are False, so stalls propagate for free)."""
    import pandas as pd

    from ..blocks import adaptive_buckets
    from ..sources.readers import read_table

    ds = read_table(
        sf_dir, "events", columns=["user_id", "event_type", "ts"],
        rows_per_block=50_000,
    )
    nb = 32

    def tag(t: pa.Table) -> pa.Table:
        b = pc.cast(
            pc.bit_wise_and(t.column("user_id"), pa.scalar(nb - 1, pa.int64())),
            pa.int32(),
        )
        return t.append_column("bucket", b)

    def funnel(df: pd.DataFrame) -> pd.DataFrame:
        users = df.loc[df["event_type"] == FUNNEL_STAGES[0], "user_id"].unique()
        if len(users) == 0:
            return pd.DataFrame(
                columns=["user_id", *(f"ts_{s}" for s in FUNNEL_STAGES), "stage"]
            )
        prev = pd.Series(pd.Timestamp.min, index=users)
        res = {}
        for st in FUNNEL_STAGES:
            sub = df.loc[df["event_type"] == st, ["user_id", "ts"]]
            floor = sub["user_id"].map(prev)
            sub = sub[sub["ts"] > floor]  # > NaT is False: stalls propagate
            first = sub.groupby("user_id")["ts"].min()
            col = pd.Series(pd.NaT, index=users, dtype="datetime64[us]")
            col.loc[first.index.intersection(users)] = first
            res[f"ts_{st}"] = col
            prev = col
        out = pd.DataFrame(res)
        out.insert(0, "user_id", users)
        out["stage"] = out[[f"ts_{s}" for s in FUNNEL_STAGES]].notna().sum(axis=1).astype("int64")
        return out.reset_index(drop=True)

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(funnel, batch_format="pandas")
    )


ORACLE_SQL["funnel_events"] = """
    WITH s0 AS (
        SELECT user_id, MIN(ts) AS ts_signup FROM events
        WHERE event_type = 'signup' GROUP BY 1
    ), s1 AS (
        SELECT e.user_id, MIN(e.ts) AS ts_view FROM events e
        JOIN s0 ON e.user_id = s0.user_id
        WHERE e.event_type = 'view' AND e.ts > s0.ts_signup GROUP BY 1
    ), s2 AS (
        SELECT e.user_id, MIN(e.ts) AS ts_click FROM events e
        JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click' AND e.ts > s1.ts_view GROUP BY 1
    ), s3 AS (
        SELECT e.user_id, MIN(e.ts) AS ts_purchase FROM events e
        JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s2.ts_click GROUP BY 1
    )
    SELECT s0.user_id, s0.ts_signup, s1.ts_view, s2.ts_click, s3.ts_purchase,
           CAST(1 + (CASE WHEN s1.user_id IS NULL THEN 0 ELSE 1 END)
                  + (CASE WHEN s2.user_id IS NULL THEN 0 ELSE 1 END)
                  + (CASE WHEN s3.user_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
               AS stage
    FROM s0
    LEFT JOIN s1 ON s0.user_id = s1.user_id
    LEFT JOIN s2 ON s0.user_id = s2.user_id
    LEFT JOIN s3 ON s0.user_id = s3.user_id
"""
QUERIES["funnel_events"] = q_funnel_events


# -- 45. cohort retention -------------------------------------------------------

def q_cohort_retention(sf_dir: str):
    """Weekly cohort retention: users grouped by the Monday week of their
    FIRST event; for each cohort, the distinct-user count active in week k
    after it. One shuffle by user bucket (per user: first week + distinct
    active weeks, vectorized), then a small (cohort, week_n) groupby — the
    per-user pass emits each (user, week) once, so the final count is a plain
    sum, never a distinct over the corpus."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from ..sources.readers import read_table

    ds = read_table(
        sf_dir, "events", columns=["user_id", "ts"], rows_per_block=50_000
    )
    nb = 32
    WEEK_US = 7 * 24 * 3600 * 1_000_000

    def tag(t: pa.Table) -> pa.Table:
        wk = pc.floor_temporal(t.column("ts"), unit="week", week_starts_monday=True)
        b = pc.cast(
            pc.bit_wise_and(t.column("user_id"), pa.scalar(nb - 1, pa.int64())),
            pa.int32(),
        )
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "wk_us": wk.cast(pa.int64()),
                "bucket": b,
            }
        )

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        pairs = df[["user_id", "wk_us"]].drop_duplicates()
        cohort = pairs.groupby("user_id")["wk_us"].transform("min")
        out = pd.DataFrame(
            {
                "cohort_us": cohort.to_numpy(),
                "week_n": (pairs["wk_us"].to_numpy() - cohort.to_numpy()) // WEEK_US,
                "n": 1,
            }
        )
        return out

    agg = (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(per_user, batch_format="pandas")
        .groupby(["cohort_us", "week_n"])
        .aggregate(Sum("n", alias_name="n_active"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort": t.column("cohort_us").cast(pa.timestamp("us")),
                "week_n": t.column("week_n").cast(pa.int64()),
                "n_active": t.column("n_active").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_SQL["cohort_retention"] = """
    WITH wk AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk
        FROM events
    ), first_wk AS (
        SELECT user_id, MIN(wk) AS cohort FROM wk GROUP BY 1
    )
    SELECT f.cohort,
           CAST((epoch(w.wk) - epoch(f.cohort)) / 604800 AS BIGINT) AS week_n,
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM wk w JOIN first_wk f ON w.user_id = f.user_id
    GROUP BY 1, 2
"""
QUERIES["cohort_retention"] = q_cohort_retention


# -- 46. SemDeDup ---------------------------------------------------------------

def q_semantic_dedup(sf_dir: str, threshold: float = 0.95):
    """SemDeDup: k-means-cluster the embeddings (seeded quantizer shared with
    the IVF entry), keep-first within each cluster at cosine ≥ 0.95."""
    from ..stages.dedup import semantic_dedup
    from ..stages.similarity import ivf_seeded_centroids

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"], rows_per_block=2_048)
    cent = ivf_seeded_centroids(dim=64, num_clusters=16)
    return semantic_dedup(ds, cent, threshold=threshold)


def _semantic_dedup_sql() -> str:
    from ..stages.dedup import semantic_dedup_oracle_sql
    from ..stages.similarity import ivf_seeded_centroids

    return semantic_dedup_oracle_sql(
        ivf_seeded_centroids(dim=64, num_clusters=16), threshold=0.95
    )


QUERIES["semantic_dedup_embeddings"] = q_semantic_dedup
ORACLE_SQL["semantic_dedup_embeddings"] = _semantic_dedup_sql()


# -- 47. exact n-gram containment (overlap coefficient) -------------------------

def q_ngram_containment(sf_dir: str):
    """Exact containment pairs at 0.8 overlap coefficient — catches short
    documents quoted inside long ones, which Jaccard's union washes out.
    Integer permille arithmetic end-to-end."""
    from ..stages.dedup import ngram_containment_pairs

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], rows_per_block=2_048)
    return ngram_containment_pairs(ds, threshold_permille=800)


ORACLE_SQL["ngram_containment_docs"] = """
    WITH d AS (
        SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '\\w+') AS toks
        FROM documents
    ), sh AS (
        SELECT doc_id,
          list_distinct(CASE WHEN len(toks) >= 3
            THEN list_transform(generate_series(1, len(toks) - 2),
                                i -> array_to_string(toks[i:i+2], ' '))
            ELSE [array_to_string(toks, ' ')] END) AS shingles
        FROM d
    ), e AS (
        SELECT doc_id, unnest(shingles) AS s FROM sh
    ), inter AS (
        SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_int
        FROM e x JOIN e y ON x.s = y.s AND x.doc_id < y.doc_id
        GROUP BY 1, 2
    ), sizes AS (
        SELECT doc_id, CAST(len(shingles) AS BIGINT) AS n FROM sh
    )
    SELECT doc_a, doc_b, n_int, sa.n AS n_a, sb.n AS n_b
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE 1000 * n_int >= 800 * least(sa.n, sb.n)
"""
QUERIES["ngram_containment_docs"] = q_ngram_containment


# -- 48. JSON field extraction + aggregate --------------------------------------

def q_props_k_stats(sf_dir: str):
    """Per-event-type stats over a field EXTRACTED from the JSON ``props``
    column (the reference builds JSON source_ids strings; this is the read
    side). Extraction is one RE2 pass (pc.extract_regex) — no per-row JSON
    parser in the hot path; rows without the key aggregate as null."""
    from ray.data.aggregate import Count, Max, Min, Sum

    ds = read_table(
        sf_dir, "events", columns=["event_type", "props"], rows_per_block=50_000
    )

    def extract(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t.column("props"), r'"k"\s*:\s*(?P<v>-?\d+)')
        k = pc.cast(pc.struct_field(m, "v"), pa.int64())
        return pa.table({"event_type": t.column("event_type"), "k": k})

    def drop_missing(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t.column("k")))

    agg = (
        ds.map_batches(extract, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(drop_missing, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n"),
            Sum("k", alias_name="sum_k"),
            Min("k", alias_name="min_k"),
            Max("k", alias_name="max_k"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "n": t.column("n").cast(pa.int64()),
                "sum_k": t.column("sum_k").cast(pa.int64()),
                "min_k": t.column("min_k").cast(pa.int64()),
                "max_k": t.column("max_k").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


ORACLE_SQL["props_k_stats"] = """
    WITH x AS (
        SELECT event_type,
               CAST(NULLIF(regexp_extract(props, '"k"\\s*:\\s*(-?\\d+)', 1), '') AS BIGINT) AS k
        FROM events
    )
    SELECT event_type, CAST(COUNT(k) AS BIGINT) AS n,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(MIN(k) AS BIGINT) AS min_k,
           CAST(MAX(k) AS BIGINT) AS max_k
    FROM x WHERE k IS NOT NULL GROUP BY 1
"""
QUERIES["props_k_stats"] = q_props_k_stats


# -- 49. per-group top-k ---------------------------------------------------------

def q_top_types_per_nation(sf_dir: str, k: int = 3):
    """Top-3 part types by revenue WITHIN each nation — grouped top-k, the
    other top-k shape (top_spenders is global). Partial (nation, type) cent
    sums combine inside map_batches; the grouped rank runs per nation bucket,
    never a global sort. Ties broken (revenue DESC, p_type ASC) so the answer
    is deterministic and hash-stable."""
    import pandas as pd

    from ray.data.aggregate import Sum

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_extendedprice"],
        rows_per_block=100_000,
    )
    part = read_table_arrow(sf_dir, "part", ["p_partkey", "p_type"])
    sup = read_table_arrow(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    nat = read_table_arrow(sf_dir, "nation", ["n_nationkey", "n_name"])
    import ray

    pref = ray.put(
        dict(zip(part.column("p_partkey").to_pylist(), part.column("p_type").to_pylist()))
    )
    s2n = dict(zip(sup.column("s_suppkey").to_pylist(), sup.column("s_nationkey").to_pylist()))
    n2name = dict(zip(nat.column("n_nationkey").to_pylist(), nat.column("n_name").to_pylist()))
    sref = ray.put({k: n2name[v] for k, v in s2n.items()})

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        p2t = ray.get(pref)
        s2name = ray.get(sref)
        out = pd.DataFrame(
            {
                "n_name": df["l_suppkey"].map(s2name),
                "p_type": df["l_partkey"].map(p2t),
                "cents": (df["l_extendedprice"] * 100).round().astype("int64"),
            }
        )
        return out.groupby(["n_name", "p_type"], sort=False, as_index=False)["cents"].sum()

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["revenue_cents", "p_type"], ascending=[False, True], kind="stable")
        return g.head(k).reset_index(drop=True)

    return (
        li.map_batches(partial, batch_format="pandas")
        .groupby(["n_name", "p_type"])
        .aggregate(Sum("cents", alias_name="revenue_cents"))
        .groupby("n_name")
        .map_groups(topk, batch_format="pandas")
    )


ORACLE_SQL["top_types_per_nation"] = """
    WITH rev AS (
        SELECT n_name, p_type,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                   AS revenue_cents
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY 1, 2
    )
    SELECT n_name, p_type, revenue_cents FROM rev
    QUALIFY row_number() OVER (
        PARTITION BY n_name ORDER BY revenue_cents DESC, p_type ASC) <= 3
"""
QUERIES["top_types_per_nation"] = q_top_types_per_nation


def q_ivf_recall_embeddings(sf_dir: str, k: int = 10, num_queries: int = 5):
    """ANN quality evaluation: recall@k of the IVF index against the exact
    brute-force answer, per query — the metric an ANN deployment is judged by.
    Both sides are the already-oracled pipelines; the overlap count is a
    50-row driver join. Oracled by composing both oracle SQLs."""
    exact = q_ann_topk_embeddings(sf_dir, k=k, num_queries=num_queries).to_pandas()
    approx = q_ivf_topk_embeddings(sf_dir, k=k, num_queries=num_queries).to_pandas()
    hit = exact.merge(approx, on=["query_id", "vec_id"])
    g = hit.groupby("query_id").size().rename("n_hits").reset_index()
    g["n_hits"] = g["n_hits"].astype("int64")
    g["k"] = np.int64(k)
    return g


def _ivf_recall_sql(k: int = 10) -> str:
    exact = ORACLE_SQL["ann_topk_embeddings"]
    approx = _ivf_topk_sql()
    return f"""
        WITH exact AS ({exact}), approx AS ({approx})
        SELECT query_id, CAST(count(*) AS BIGINT) AS n_hits,
               CAST({k} AS BIGINT) AS k
        FROM exact JOIN approx USING (query_id, vec_id)
        GROUP BY query_id
    """


QUERIES["ivf_recall_embeddings"] = q_ivf_recall_embeddings
ORACLE_SQL["ivf_recall_embeddings"] = _ivf_recall_sql()


def q_pq_topk_embeddings(sf_dir: str, k: int = 10, num_queries: int = 5):
    """PQ/ADC approximate top-k (Jégou 2011): 64-dim vectors → 8 one-byte
    codes; queries score candidates by summing 8 distance-table lookups.
    Seeded codebooks (like the IVF entry) so one inlined-codebook oracle SQL
    holds at every sf."""
    from ..stages.similarity import pq_seeded_codebooks, pq_topk

    emb = read_table_arrow(sf_dir, "embeddings", ["vec_id", "embedding"])
    order = pc.sort_indices(emb, sort_keys=[("vec_id", "ascending")])
    head = emb.take(order).slice(0, num_queries)
    q_ids = head.column("vec_id").to_numpy()
    q_mat = np.stack(head.column("embedding").to_pylist())
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"], rows_per_block=2_048)
    cbs = pq_seeded_codebooks(dim=q_mat.shape[1], m=8, codewords=16)
    return pq_topk(ds, q_mat, q_ids, cbs, k=k)


def _pq_topk_sql() -> str:
    from ..stages.similarity import pq_seeded_codebooks, pq_topk_oracle_sql

    return pq_topk_oracle_sql(pq_seeded_codebooks(dim=64, m=8, codewords=16),
                              k=10, num_queries=5)


QUERIES["pq_topk_embeddings"] = q_pq_topk_embeddings
ORACLE_SQL["pq_topk_embeddings"] = _pq_topk_sql()


def q_ivfpq_topk_embeddings(sf_dir: str, k: int = 10, num_queries: int = 5):
    """IVF-PQ (FAISS IndexIVFPQ shape): coarse probe prunes to nprobe lists,
    PQ/ADC scores the survivors — the memory-and-compute scale path combined.
    Seeded quantizer + codebooks, fully oracled."""
    from ..stages.similarity import (
        ivf_seeded_centroids,
        ivfpq_topk,
        pq_seeded_codebooks,
    )

    emb = read_table_arrow(sf_dir, "embeddings", ["vec_id", "embedding"])
    order = pc.sort_indices(emb, sort_keys=[("vec_id", "ascending")])
    head = emb.take(order).slice(0, num_queries)
    q_ids = head.column("vec_id").to_numpy()
    q_mat = np.stack(head.column("embedding").to_pylist())
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"], rows_per_block=2_048)
    cent = ivf_seeded_centroids(dim=q_mat.shape[1], num_clusters=16)
    cbs = pq_seeded_codebooks(dim=q_mat.shape[1], m=8, codewords=16)
    return ivfpq_topk(ds, q_mat, q_ids, cent, cbs, k=k, nprobe=4)


def _ivfpq_topk_sql() -> str:
    from ..stages.similarity import (
        ivf_seeded_centroids,
        ivfpq_topk_oracle_sql,
        pq_seeded_codebooks,
    )

    return ivfpq_topk_oracle_sql(
        ivf_seeded_centroids(dim=64, num_clusters=16),
        pq_seeded_codebooks(dim=64, m=8, codewords=16),
        k=10, num_queries=5, nprobe=4,
    )


QUERIES["ivfpq_topk_embeddings"] = q_ivfpq_topk_embeddings
ORACLE_SQL["ivfpq_topk_embeddings"] = _ivfpq_topk_sql()


def q_cluster_top_terms(sf_dir: str, k: int = 5):
    """Topic-cluster labeling: top-k terms per k-means cluster — documents
    joined to their embedding's cluster (bucketed hash join), per-batch
    partial term counts, one vocab×K-bounded groupby, per-cluster rank."""
    from ..stages.similarity import ivf_seeded_centroids, kmeans_assign
    from ..stages.text import cluster_top_terms

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"], rows_per_block=2_048)
    assign = kmeans_assign(emb, ivf_seeded_centroids(dim=64, num_clusters=16))
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return cluster_top_terms(docs, assign, k=k)


def _cluster_top_terms_sql(k: int = 5) -> str:
    from ..stages.similarity import ivf_seeded_centroids, kmeans_assign_oracle_sql
    from ..stages.text import cluster_top_terms_oracle_sql

    assign = kmeans_assign_oracle_sql(ivf_seeded_centroids(dim=64, num_clusters=16))
    return cluster_top_terms_oracle_sql(assign, k=k)


QUERIES["cluster_top_terms"] = q_cluster_top_terms
ORACLE_SQL["cluster_top_terms"] = _cluster_top_terms_sql()


def q_ccnet_bucket_documents(sf_dir: str):
    """CCNet's corpus organization step (Wenzek et al. 2019 §4.3): per
    LANGUAGE, rank documents by LM quality and cut into head / middle / tail
    terciles — downstream pretraining recipes keep head+middle. Scores are the
    integer lm_fluency permille (higher = more fluent, so head = tile 1 of
    NTILE(3) ... ORDER BY score DESC); language RIDES THE SCORING PASS
    (``lm_fluency(carry_cols=…)`` — batch-local reindex, which replaced a
    whole bucketed hash join back to the source); the partitioned tercile is
    the exact grouped row number (stages/windows.grouped_row_number —
    O(blocks × parts) driver metadata, never a whole language's rows in one
    task)."""
    import pyarrow as pa

    from ..stages.text import lm_fluency
    from ..stages.windows import with_grouped_ntile

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    tiled = with_grouped_ntile(
        lm_fluency(docs, carry_cols=("lang",)),
        3,
        part_col="lang",
        keys=["fluency_permille", "doc_id"],
        descending=[True, False],
    )

    def label(t: pa.Table) -> pa.Table:
        tile = t.column("tile").to_numpy(zero_copy_only=False)
        bucket = np.where(tile == 1, "head", np.where(tile == 2, "middle", "tail"))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "lang": t.column("lang"),
                "fluency_permille": t.column("fluency_permille"),
                "bucket": pa.array(bucket, pa.string()),
            }
        )

    return tiled.map_batches(label, batch_format="pyarrow", zero_copy_batch=True)


def _ccnet_bucket_sql() -> str:
    from ..stages.text import lm_fluency_oracle_sql

    return f"""
        WITH f AS ({lm_fluency_oracle_sql("documents")})
        SELECT f.doc_id, d.lang, f.fluency_permille,
               CASE ntile(3) OVER (
                   PARTITION BY d.lang
                   ORDER BY f.fluency_permille DESC, f.doc_id ASC
               ) WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
                   AS bucket
        FROM f JOIN documents d USING (doc_id)
    """


QUERIES["ccnet_bucket_documents"] = q_ccnet_bucket_documents
ORACLE_SQL["ccnet_bucket_documents"] = _ccnet_bucket_sql()


def q_priority_sample_documents(sf_dir: str, k: int = 100):
    """Weighted (by n_chars) sample of k documents without replacement —
    Duffield-Lund-Thorup priority sampling on the deterministic md5 grid, so
    the sampled set is identical at any cluster size and oracled verbatim.
    Map-only partial top-k per batch + one O(k × blocks) final merge."""
    from ..stages.sampling import priority_sample

    ds = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])
    return priority_sample(ds, "doc_id", "n_chars", k=k)


def _priority_sample_sql(k: int = 100) -> str:
    from ..stages.sampling import priority_sample_oracle_sql

    return priority_sample_oracle_sql("documents", "doc_id", "n_chars", k=k)


QUERIES["priority_sample_documents"] = q_priority_sample_documents
ORACLE_SQL["priority_sample_documents"] = _priority_sample_sql()


def q_approx_quantiles_events(sf_dir: str):
    """Approximate event-value quantiles (p10/p50/p90/p99 of cents) from a
    deterministic md5 bottom-k row sample — O(k) driver state at any corpus
    size, and the approximate answer itself is oracled (same sample, same
    order statistic, integer index arithmetic)."""
    import pyarrow as pa

    from ..stages.sketches import sample_quantiles

    ds = read_table(sf_dir, "events", columns=["event_id", "value"], rows_per_block=50_000)

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"event_id": t.column("event_id"), "cents": _cents(t.column("value"))}
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return sample_quantiles(prepped, "event_id", "cents", k=256)


def _approx_quantiles_sql() -> str:
    from ..stages.sketches import sample_quantiles_oracle_sql

    return sample_quantiles_oracle_sql(
        "events", "event_id", "CAST(round(value * 100) AS BIGINT)", k=256
    )


QUERIES["approx_quantiles_events"] = q_approx_quantiles_events
ORACLE_SQL["approx_quantiles_events"] = _approx_quantiles_sql()


# -- 46. OPTIMIZE ZORDER layout: per-file data-skipping stats ----------------

def q_zorder_layout_events(sf_dir: str, rows_per_file: int = 500, bits: int = 16):
    """Z-order (Morton) clustering of events by (user_id, ts) — the lakehouse
    ``OPTIMIZE ... ZORDER BY`` primitive. Returns the per-file min/max
    envelope a manifest would record for data skipping: one map to build the
    interleaved key, ONE distributed sort (clustering is a sort), an
    O(blocks) driver offset pass, a small per-file aggregate. Pure integer
    quantisation (step = (range >> bits) + 1) keeps numpy and DuckDB
    bit-identical."""
    from ..stages.layout import zorder_layout

    ds = read_table(
        sf_dir, "events", columns=["event_id", "user_id", "ts"],
        rows_per_block=50_000,
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts_us": t.column("ts").cast(pa.int64()),
            }
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return zorder_layout(
        prepped, "user_id", "ts_us", "event_id", rows_per_file=rows_per_file,
        bits=bits,
    )


def _zorder_layout_sql(rows_per_file: int = 500, bits: int = 16) -> str:
    from ..stages.layout import zorder_sql_expr

    return f"""
    WITH base AS (
        SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
    ), env AS (
        SELECT min(user_id) AS a_lo, max(user_id) AS a_hi,
               min(ts_us) AS b_lo, max(ts_us) AS b_hi
        FROM base
    ), q AS (
        SELECT event_id, user_id, ts_us,
               (user_id - env.a_lo) // (((env.a_hi - env.a_lo) >> {bits}) + 1) AS qa,
               (ts_us - env.b_lo) // (((env.b_hi - env.b_lo) >> {bits}) + 1) AS qb
        FROM base, env
    ), z AS (
        SELECT event_id, user_id, ts_us,
               {zorder_sql_expr('qa', 'qb', bits)} AS zval
        FROM q
    ), rn AS (
        SELECT event_id, user_id, ts_us,
               row_number() OVER (ORDER BY zval, event_id) AS rn
        FROM z
    )
    SELECT CAST((rn - 1) // {rows_per_file} AS BIGINT) AS file_idx,
           CAST(count(*) AS BIGINT) AS n_rows,
           min(user_id) AS user_id_min, max(user_id) AS user_id_max,
           min(ts_us) AS ts_us_min, max(ts_us) AS ts_us_max
    FROM rn GROUP BY 1
    """


QUERIES["zorder_layout_events"] = q_zorder_layout_events
ORACLE_SQL["zorder_layout_events"] = _zorder_layout_sql()
