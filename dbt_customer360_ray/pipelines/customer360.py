"""customer360 identity-resolution pipeline — the reference's full DAG
(SURVEY.md §3.2 stages 2-8) re-expressed Ray-Data-first.

Stage map (reference file → here):
- cleaning (models/cleaning/int_customer360__{marketo,stripe,zendesk}.sql)
    → ``CleanMarketo/CleanStripe/CleanZendesk`` actor-pool map_batches stages
      (regex/seed state compiled once per actor; vectorized pandas kernels).
      Config hooks consumed here: stripe name extractors
      (int_customer360__stripe.sql:78-90; identity by default, like the
      reference's var defaults) and internal match-id column injection with
      optional external map-table broadcast joins
      (int_customer360__marketo.sql:9-37; README.md:85-120).
- match prep (identity_resolution/prep/*_for_matching.sql)
    → ``match_candidates`` vectorized filter + ``match_keys`` blocking-key
      projection, both grain-aware (org grain swaps the name predicate,
      prep/int_customer360__marketo_for_matching.sql:53)
- pairwise matching (int_customer360__source_matches.sql:56-117)
    → ONE hash equi-join per source pair on a unified blocking key column
      ('email:<v>' / 'phone:<v>' / 'addr_cs:<line|city|state>' /
      'addr_zc:<line|zip|country>' / 'mid:<name>:<v>'), the decomposition
      SURVEY.md §2.4 maps the reference's OR-join to — never a theta join.
      Runs as ``stages.joins.bucketed_hash_join`` over Datasets.
- fuzzy confirmation (source_matches.sql:133-153 + macros/levenshtein_distance.sql)
    → vectorized batch kernel: exact email OR internal-match-id equality OR
      Levenshtein-similarity ≥ threshold over the grain-selected FULL-name set,
      both sides lowercased (source_matches.sql:151 lower(...)), nulls skipped
      ('aaa'/'bbb' sentinels can never reach the threshold).
- 3-way consolidation (source_matches.sql:319-354) → vectorized pandas
  outer-merges + groupby max/min over the (small, O(matched entities)) pair
  tables on the driver; the pair tables are the natural broadcast side.
- mapping (output/customer360__mapping.sql) → distributed fragment pass:
  every cleaned row emits a spine fragment keyed by its match-tuple position
  (or its own id when unmatched), one Ray groupby combines fragments into
  spine rows; md5 surrogate keys minted vectorized (dbt_utils recipe,
  mapping.sql:107,205 — org id is the 5-component surrogate, computed
  unconditionally, reproducing the reference's null-org header quirk).
- attribute tables (output/customer360__{email,phone,name,...}.sql)
    → per-source vectorized unpivot kernels + broadcast id→customer360_id
      lookup in map_batches, union, one groupby(bucket) with a fully
      vectorized rank kernel (value_count desc, recency desc — README.md:48
      'recency and frequency'; dense_rank + row_number,
      customer360__email.sql:95-110).
- summary (output/customer360__summary.sql) → index=1 star join on the
  (O(entities), driver-held) spine.

Scale notes: the DAG is Dataset-in/Dataset-out. Raw sources may be parquet
paths (streamed via read_parquet), the spine is minted inside the combine
groupby tasks, attribute/status/updates/ip tables and the summary/customer
star joins stay Datasets, and the source-id→customer360_id map attaches via a
size-gated CidContext (broadcast ray.put map below ~2M entities, bucketed hash
join above). The only driver-held state is the matched-pair tables + pos_maps
broadcast — O(matches), the designed small side (a distributed pair
consolidation is the noted extension if matches ever rival input size).
Shuffle bucket counts scale with input rows (``_adaptive_buckets``). pandas
conversion happens only at the run_customer360(output='pandas') boundary for
the driver correctness gate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import PipelineConfig
from ..functions.levenshtein import similar_mask, similarity
from ..hashing import render_sql_string, surrogate_key
from ..stages import normalize as N

EPOCH = pd.Timestamp("1970-01-01")
ID_COLS = {"marketo": "lead_id", "stripe": "customer_id", "zendesk": "user_id"}
SRC_RANK = {"marketo": 0, "stripe": 1, "zendesk": 2}
PHONE_COLS = {
    "marketo": ["phone", "main_phone", "mobile_phone"],
    "stripe": ["phone", "shipping_phone"],
    "zendesk": ["phone"],
}
# org-name columns per source (source_matches.sql:143-144,225; mapping.sql:107)
ORG_NAME_COLS = {
    "marketo": ["company", "inferred_company"],
    "stripe": ["organization", "shipping_organization"],
    "zendesk": ["organization"],
}
# fuzzy-confirm name sets: FULL names only, per grain
# (source_matches.sql:143-144: marketo_names/stripe_names/zendesk_names)
CONFIRM_NAME_COLS = {
    ("marketo", "individual"): ["full_name"],
    ("marketo", "organization"): ["company", "inferred_company"],
    ("stripe", "individual"): ["full_name", "shipping_name"],
    ("stripe", "organization"): ["organization", "shipping_organization"],
    ("zendesk", "individual"): ["full_name"],
    ("zendesk", "organization"): ["organization"],
}
DEFAULT_NUM_BUCKETS = 16


def _coalesce_ts(updated: pd.Series, created: pd.Series) -> pd.Series:
    return updated.fillna(created)


# ---------------------------------------------------------------------------
# cleaning
# ---------------------------------------------------------------------------


class _MatchIdMixin:
    """Internal match-id injection (int_customer360__marketo.sql:9-37): a
    direct source column copy, or a broadcast left join against an external
    map table (README.md:117-120). State (map frames) lives in the actor."""

    def _init_match_ids(self, match_id_cols=None, match_id_maps=None):
        self.match_id_cols = match_id_cols or {}
        self.match_id_maps = match_id_maps or {}

    def _apply_match_ids(self, out: pd.DataFrame, df: pd.DataFrame) -> pd.DataFrame:
        for name, col in self.match_id_cols.items():
            out[name] = (
                N.empty_to_null(df[col].astype(object))
                if col in df.columns
                else pd.Series([None] * len(df), dtype=object)
            )
        for name, (map_df, join_on, map_on, key_col) in self.match_id_maps.items():
            lk = dict(zip(map_df[map_on], map_df[key_col]))
            out[name] = df[join_on].map(lk).astype(object).where(lambda s: s.notna(), None)
        return out


class CleanMarketo(N.Cleaner, _MatchIdMixin):
    """int_customer360__marketo.sql:108-475 (standardize→tokenize→restandardize
    →add_nicknames→final) as one vectorized batch fn."""

    def __init__(self, match_id_cols=None, match_id_maps=None):
        super().__init__()
        self._init_match_ids(match_id_cols, match_id_maps)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"lead_id": df["lead_id"]})
        out["email"] = N.normalize_email(df["email"])
        out["email_local"], out["email_domain"] = N.email_local_domain(df["email"])

        first_nt, out["first_name_title"] = N.strip_title(df["first_name"], self.title_re)
        last_ns, out["name_suffix"] = N.strip_name_suffix(df["last_name"], self.name_suffix_re)
        out["first_name"] = first_nt
        out["last_name"] = last_ns
        out["full_name"] = N.recombine_name(first_nt, last_ns)
        out["possible_alt_first_names"] = N.add_nicknames(first_nt, self.nicknames)

        out["company"], out["company_suffix"] = N.strip_org_suffix(df["company"], self.org_suffix_re)
        inferred = df["inferred_company"] if "inferred_company" in df.columns else pd.Series(
            [None] * len(df), dtype=object
        )
        out["inferred_company"], _ = N.strip_org_suffix(
            N.empty_to_null(pd.Series(inferred, dtype=object)), self.org_suffix_re
        )

        out["phone"], out["phone_ext"] = N.normalize_phone(df["phone"])
        out["main_phone"], out["main_phone_ext"] = N.normalize_phone(df["main_phone"])
        out["mobile_phone"], out["mobile_phone_ext"] = N.normalize_phone(df["mobile_phone"])

        line1, line2 = N.split_address_lines(df["address"], self.unit_re)
        out["address_line_1"] = N.expand_street_suffixes(line1, self.street_re)
        out["address_line_2"] = line2
        out["city"] = N.empty_to_null(df["city"].str.strip())
        sc, sl, cc, cl = N.disambiguate_state_country(
            df["state_code"].fillna(df["state"]), df["country"]
        )
        out["country_code"] = N.resolve_country(cc, cl, self.countries)
        out["state_code"] = N.resolve_state(sc, sl, out["country_code"], self.states)
        out["postal_code"] = N.normalize_postal(df["postal_code"])
        out["anonymous_ip"] = N.empty_to_null(df["anonymous_ip"])
        out["ip_type"] = N.classify_ip(out["anonymous_ip"])
        for b in ("is_unsubscribed", "is_email_invalid", "do_not_call"):
            out[b] = df[b]
        out["updated_at"] = df["updated_timestamp"]
        out["created_at"] = df["created_timestamp"]
        return self._apply_match_ids(out, df)


def default_stripe_extractors() -> dict:
    """The reference's var defaults are the identity projections
    (int_customer360__stripe.sql:81-88: ``var(..., 'customer_name')``)."""
    return {
        "customer_full_name": lambda df: df["customer_name"],
        "shipping_full_name": lambda df: df["shipping_name"],
        "customer_organization_name": lambda df: df["customer_name"],
        "shipping_organization_name": lambda df: df["shipping_name"],
    }


class CleanStripe(N.Cleaner, _MatchIdMixin):
    """int_customer360__stripe.sql:67-550. The four name projections are
    user-splicable extractors (README.md:125-133); defaults are identity as in
    the reference."""

    def __init__(self, extractors=None, match_id_cols=None, match_id_maps=None):
        super().__init__()
        self.extractors = {**default_stripe_extractors(), **(extractors or {})}
        self._init_match_ids(match_id_cols, match_id_maps)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"customer_id": df["customer_id"]})
        out["email"] = N.normalize_email(df["email"])
        out["email_local"], out["email_domain"] = N.email_local_domain(df["email"])

        person = N.empty_to_null(pd.Series(self.extractors["customer_full_name"](df), dtype=object))
        person_nt, _title = N.strip_title(person, self.title_re)
        person_ns, out["name_suffix"] = N.strip_name_suffix(person_nt, self.name_suffix_re)
        out["first_name"], out["last_name"] = N.split_first_last(person_ns)
        out["full_name"] = N.recombine_name(out["first_name"], out["last_name"])
        out["possible_alt_first_names"] = N.add_nicknames(out["first_name"], self.nicknames)

        ship = N.empty_to_null(pd.Series(self.extractors["shipping_full_name"](df), dtype=object))
        ship_nt, _ = N.strip_title(ship, self.title_re)
        ship_ns, _ = N.strip_name_suffix(ship_nt, self.name_suffix_re)
        sf, sl = N.split_first_last(ship_ns)
        out["shipping_name"] = N.recombine_name(sf, sl)

        org_raw = N.empty_to_null(
            pd.Series(self.extractors["customer_organization_name"](df), dtype=object)
        )
        out["organization"], out["organization_suffix"] = N.strip_org_suffix(
            org_raw, self.org_suffix_re
        )
        ship_org_raw = N.empty_to_null(
            pd.Series(self.extractors["shipping_organization_name"](df), dtype=object)
        )
        out["shipping_organization"], _ = N.strip_org_suffix(ship_org_raw, self.org_suffix_re)

        out["phone"], out["phone_ext"] = N.normalize_phone(df["phone"])
        out["shipping_phone"], out["shipping_phone_ext"] = N.normalize_phone(df["shipping_phone"])

        out["address_line_1"] = N.expand_street_suffixes(
            N.trim_chars(df["customer_address_line_1"]), self.street_re
        )
        out["address_line_2"] = N.empty_to_null(df["customer_address_line_2"])
        out["city"] = N.empty_to_null(df["customer_address_city"].str.strip())
        sc, sl2, cc, cl = N.disambiguate_state_country(
            df["customer_address_state"], df["customer_address_country"]
        )
        out["country_code"] = N.resolve_country(cc, cl, self.countries)
        out["state_code"] = N.resolve_state(sc, sl2, out["country_code"], self.states)
        out["postal_code"] = N.normalize_postal(df["customer_address_postal_code"])
        out["is_delinquent"] = df["is_delinquent"]
        out["is_deleted"] = df["is_deleted"]
        out["updated_at"] = pd.Series([pd.NaT] * len(df))  # stripe has no updated ts
        out["created_at"] = df["customer_created_at"]      # (int_customer360__stripe.sql:127)
        return self._apply_match_ids(out, df)


class CleanZendesk(N.Cleaner, _MatchIdMixin):
    """int_customer360__zendesk.sql:79-369; users filtered to role='end-user'
    (:39) and left-joined to organizations (:116-118) via a broadcast dict."""

    def __init__(self, org_lookup: dict[int, str], match_id_cols=None, match_id_maps=None):
        super().__init__()
        self.org_lookup = org_lookup
        self._init_match_ids(match_id_cols, match_id_maps)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["role"] == "end-user"].reset_index(drop=True)
        out = pd.DataFrame({"user_id": df["user_id"]})
        out["organization_id"] = df["organization_id"]
        out["email"] = N.normalize_email(df["email"])
        out["email_local"], out["email_domain"] = N.email_local_domain(df["email"])

        name_nt, _ = N.strip_title(df["name"], self.title_re)
        name_ns, out["name_suffix"] = N.strip_name_suffix(name_nt, self.name_suffix_re)
        out["first_name"], out["last_name"] = N.split_first_last(name_ns)
        out["full_name"] = N.recombine_name(out["first_name"], out["last_name"])
        out["possible_alt_first_names"] = N.add_nicknames(out["first_name"], self.nicknames)

        org_name = df["organization_id"].map(self.org_lookup)
        out["organization"], out["organization_suffix"] = N.strip_org_suffix(
            pd.Series(org_name, dtype=object), self.org_suffix_re
        )
        out["phone"], out["phone_ext"] = N.normalize_phone(df["phone"])
        out["is_active"] = df["is_active"]
        out["is_suspended"] = df["is_suspended"]
        out["updated_at"] = df["updated_at"]
        out["created_at"] = df["created_at"]
        return self._apply_match_ids(out, df)


# canonical cleaned-output columns per source, used to rebuild schema for empty
# sources (a disabled source — the reference's customer360__using_* vars —
# flows through as zero rows, not a missing-column crash)
CLEANED_COLUMNS = {
    "marketo": [
        "lead_id", "email", "email_local", "email_domain", "first_name",
        "first_name_title", "last_name", "name_suffix", "full_name",
        "possible_alt_first_names", "company", "company_suffix",
        "inferred_company", "phone", "phone_ext", "main_phone",
        "main_phone_ext", "mobile_phone", "mobile_phone_ext", "address_line_1",
        "address_line_2", "city", "country_code", "state_code", "postal_code",
        "anonymous_ip", "ip_type", "is_unsubscribed", "is_email_invalid",
        "do_not_call", "updated_at", "created_at",
    ],
    "stripe": [
        "customer_id", "email", "email_local", "email_domain", "name_suffix",
        "first_name", "last_name", "full_name", "possible_alt_first_names",
        "organization", "organization_suffix", "shipping_organization",
        "shipping_name", "phone", "phone_ext", "shipping_phone",
        "shipping_phone_ext", "address_line_1", "address_line_2", "city",
        "country_code", "state_code", "postal_code", "is_delinquent",
        "is_deleted", "updated_at", "created_at",
    ],
    "zendesk": [
        "user_id", "organization_id", "email", "email_local", "email_domain",
        "name_suffix", "first_name", "last_name", "full_name",
        "possible_alt_first_names", "organization", "organization_suffix",
        "phone", "phone_ext", "is_active", "is_suspended", "updated_at",
        "created_at",
    ],
}


def _empty_cleaned(source: str, config: PipelineConfig | None = None) -> pd.DataFrame:
    cols = list(CLEANED_COLUMNS[source])
    if config is not None:
        cols += [s.name for s in config.internal_match_ids]
    return pd.DataFrame({c: pd.Series(dtype=object) for c in cols})


def _match_id_kwargs(source: str, config: PipelineConfig):
    cols, maps = {}, {}
    for spec in config.internal_match_ids:
        if source in spec.map_tables:
            mt = spec.map_tables[source]
            table = mt.table
            if isinstance(table, pa.Table):
                table = table.to_pandas()
            maps[spec.name] = (
                table, mt.join_with_map_on, mt.map_table_join_on,
                spec.source_columns[source],
            )
        elif source in spec.source_columns:
            cols[spec.name] = spec.source_columns[source]
    return cols, maps


def _from_arrow_split(table: pa.Table, rows_per_block: int = 8_192):
    """from_arrow yields ONE block; every map over it would run as one task
    (and downstream stages inherit the layout). Split by rows, capped, so the
    cleaning actor pools — and everything consuming the materialized result —
    fan out (measured: the whole 100k-row DAG serialized on 3 one-block
    sources before this)."""
    import ray.data

    n = int(max(1, min(64, -(-table.num_rows // rows_per_block))))
    ds = ray.data.from_arrow(table)
    return ds.repartition(n) if n > 1 else ds


def _as_dataset(obj, rows_per_block: int = 8_192):
    """Raw-source input surface: pa.Table | pandas.DataFrame | parquet path |
    ray.data.Dataset — the engine analogue of the reference reading warehouse
    tables (int_customer360__marketo.sql:24 ``ref('marketo__leads')``). Paths
    stream through ``read_parquet`` (never driver-materialized)."""
    import os

    import ray.data

    if isinstance(obj, (str, os.PathLike)):
        return ray.data.read_parquet(str(obj))
    if isinstance(obj, pd.DataFrame):
        obj = pa.Table.from_pandas(obj, preserve_index=False)
    if isinstance(obj, pa.Table):
        return _from_arrow_split(obj, rows_per_block)
    return obj


def _as_local_table(obj) -> pa.Table:
    """Driver-side Arrow read for DIMENSION inputs only (zendesk orgs, map
    tables) — the designed broadcast side."""
    import os

    import pyarrow.parquet as pq

    if isinstance(obj, (str, os.PathLike)):
        return pq.read_table(str(obj))
    if isinstance(obj, pd.DataFrame):
        return pa.Table.from_pandas(obj, preserve_index=False)
    if isinstance(obj, pa.Table):
        return obj
    return pa.Table.from_pandas(obj.to_pandas(), preserve_index=False)


def _adaptive_buckets(
    total_rows: int, rows_per_bucket: int = 250_000,
    lo: int = DEFAULT_NUM_BUCKETS, hi: int = 4096,
) -> int:
    """Shuffle bucket count scaled with input size (shared recipe —
    ``blocks.adaptive_buckets``); floors at DEFAULT_NUM_BUCKETS at fixture
    scale, grows linearly at 100×."""
    from ..blocks import adaptive_buckets

    return adaptive_buckets(total_rows, rows_per_bucket, lo=lo, hi=hi)


def clean_sources(
    tables: dict,
    config: PipelineConfig | None = None,
    concurrency: int = 8,
) -> dict:
    """dict of raw sources (pa.Table | Dataset | parquet path) → dict of
    cleaned, MATERIALIZED Datasets (actor pools). Materialize is deliberate:
    the cleaned tables feed 4+ downstream consumers (keys, confirm attrs,
    spine fragments, attribute unpivots) — caching the blocks in the object
    store beats re-running the cleaning actors per consumer."""
    cfg = config or PipelineConfig()
    out = {}
    if "marketo" in cfg.enabled_sources:
        cols, maps = _match_id_kwargs("marketo", cfg)
        out["marketo"] = _as_dataset(tables["marketo_leads"]).map_batches(
            CleanMarketo,
            fn_constructor_kwargs={"match_id_cols": cols, "match_id_maps": maps},
            batch_format="pandas",
            concurrency=(1, concurrency),
        )
    if "stripe" in cfg.enabled_sources:
        cols, maps = _match_id_kwargs("stripe", cfg)
        out["stripe"] = _as_dataset(tables["stripe_customer_overview"]).map_batches(
            CleanStripe,
            fn_constructor_kwargs={
                "extractors": cfg.stripe_extractors or None,
                "match_id_cols": cols,
                "match_id_maps": maps,
            },
            batch_format="pandas",
            concurrency=(1, concurrency),
        )
    if "zendesk" in cfg.enabled_sources:
        orgs = _as_local_table(tables["zendesk_organizations"]).to_pandas()
        org_lookup = dict(zip(orgs["organization_id"], orgs["name"]))
        cols, maps = _match_id_kwargs("zendesk", cfg)
        out["zendesk"] = _as_dataset(tables["zendesk_users"]).map_batches(
            CleanZendesk,
            fn_constructor_kwargs={
                "org_lookup": org_lookup,
                "match_id_cols": cols,
                "match_id_maps": maps,
            },
            batch_format="pandas",
            concurrency=(1, concurrency),
        )
    return {k: ds.materialize() for k, ds in out.items()}


# ---------------------------------------------------------------------------
# match prep: candidate filter + blocking keys + confirm attrs
# ---------------------------------------------------------------------------


def match_candidates(df: pd.DataFrame, source: str, grain: str = "individual") -> pd.DataFrame:
    """prep/int_customer360__*_for_matching.sql:42-70: keep rows usable for
    identity joins — (name OR email) AND (email OR any phone OR (address line
    AND (city+state OR zip+country))). At organization grain the name arm
    reads the org-name coalesce instead (prep/..._for_matching.sql:53)."""
    if grain == "organization":
        has_name = pd.Series(False, index=df.index)
        for c in ORG_NAME_COLS[source]:
            if c in df:
                has_name |= df[c].notna()
    else:
        has_name = df.get("full_name", pd.Series(index=df.index, dtype=object)).notna()
    has_email = df["email"].notna()
    has_phone = pd.Series(False, index=df.index)
    for c in PHONE_COLS[source]:
        if c in df:
            has_phone |= df[c].notna()
    if "address_line_1" in df:
        addr = df["address_line_1"].notna()
        cs = df["city"].notna() & df["state_code"].notna()
        zc = df["postal_code"].notna() & df["country_code"].notna()
        has_addr = addr & (cs | zc)
    else:
        has_addr = pd.Series(False, index=df.index)
    keep = (has_name | has_email) & (has_email | has_phone | has_addr)
    return df[keep].reset_index(drop=True)


def match_keys(df: pd.DataFrame, source: str, mid_names: tuple[str, ...] = ()) -> pd.DataFrame:
    """Unified blocking-key projection: one (id, key) row per usable join key.

    Nulls are simply not emitted — the equi-join equivalent of the reference's
    null-sentinel encoding (SURVEY.md §2.2): equality on null must fail.
    Internal match ids become 'mid:<name>:<value>' arms — the first OR-arm of
    the reference's blocking join (source_matches.sql:58-62)."""
    sid = ID_COLS[source]
    frames = []
    em = df[df["email"].notna()]
    if len(em):
        frames.append(pd.DataFrame({sid: em[sid], "key": "email:" + em["email"]}))
    for c in PHONE_COLS[source]:
        if c not in df:
            continue
        ph = df[df[c].notna()]
        if len(ph):
            frames.append(pd.DataFrame({sid: ph[sid], "key": "phone:" + ph[c]}))
    if "address_line_1" in df:
        a = df[df["address_line_1"].notna()]
        low = a["address_line_1"].str.lower()
        cs = a[a["city"].notna() & a["state_code"].notna()]
        if len(cs):
            frames.append(
                pd.DataFrame(
                    {
                        sid: cs[sid],
                        "key": "addr_cs:"
                        + low.loc[cs.index]
                        + "|"
                        + cs["city"].str.lower()
                        + "|"
                        + cs["state_code"].str.lower(),
                    }
                )
            )
        zc = a[a["postal_code"].notna() & a["country_code"].notna()]
        if len(zc):
            frames.append(
                pd.DataFrame(
                    {
                        sid: zc[sid],
                        "key": "addr_zc:"
                        + low.loc[zc.index]
                        + "|"
                        + zc["postal_code"]
                        + "|"
                        + zc["country_code"].str.lower(),
                    }
                )
            )
    for m in mid_names:
        if m not in df:
            continue
        mi = df[df[m].notna()]
        if len(mi):
            frames.append(
                pd.DataFrame({sid: mi[sid], "key": f"mid:{m}:" + mi[m].astype(str)})
            )
    if not frames:
        return pd.DataFrame({sid: pd.Series(dtype=df[sid].dtype), "key": pd.Series(dtype=object)})
    return pd.concat(frames, ignore_index=True).drop_duplicates()


def _to_arrow(df: pd.DataFrame, schema: pa.Schema) -> pa.Table:
    """pandas → Arrow with an EXPLICIT schema. Ray's inferred conversion maps
    an all-null column to Arrow null type, which sort shuffles won't unify and
    the acero hash join rejects outright — pinning the schema per kernel keeps
    every block of a union/join input type-identical."""
    t = pa.Table.from_pandas(df[schema.names], preserve_index=False)
    return t.cast(schema)


def _sid_type(source: str) -> pa.DataType:
    return pa.string() if source == "stripe" else pa.int64()


def _keys_schema(source: str) -> pa.Schema:
    return pa.schema([(ID_COLS[source], _sid_type(source)), ("key", pa.string())])


def _attrs_schema(source: str, mid_names: tuple[str, ...]) -> pa.Schema:
    fields = [
        (ID_COLS[source], _sid_type(source)),
        ("email", pa.string()), ("name0", pa.string()), ("name1", pa.string()),
    ]
    fields += [(f"mid_{m}", pa.string()) for m in mid_names]
    fields += [("upd", pa.timestamp("us")), ("cre", pa.timestamp("us"))]
    return pa.schema(fields)


def _frag_schema(mid_names: tuple[str, ...]) -> pa.Schema:
    fields = [
        ("spine_key", pa.string()), ("src_rank", pa.int64()),
        ("lead_id", pa.int64()), ("customer_id", pa.string()), ("user_id", pa.int64()),
        ("upd", pa.timestamp("us")), ("cre", pa.timestamp("us")),
        ("m_org", pa.string()), ("m_inferred_org", pa.string()),
        ("s_org", pa.string()), ("s_ship_org", pa.string()),
        ("z_org_id", pa.int64()), ("org_display", pa.string()),
    ]
    fields += [(f"mid_{m}", pa.string()) for m in mid_names]
    return pa.schema(fields)


def _attr_frag_schema(extra_cols: list[str]) -> pa.Schema:
    fields = [("customer360_id", pa.string()), ("value", pa.string())]
    fields += [(c, pa.string()) for c in extra_cols]
    fields += [
        ("type", pa.string()), ("source", pa.string()),
        ("last_updated", pa.timestamp("us")),
    ]
    return pa.schema(fields)


def _confirm_attrs(
    df: pd.DataFrame, source: str, grain: str, mid_names: tuple[str, ...]
) -> pd.DataFrame:
    """Narrow per-row projection feeding the fuzzy confirmation: lowercased
    FULL names of the grain-selected set (source_matches.sql:143-151), email,
    match ids, and the row's timestamps (carried through the pair CTEs like
    marketo_updated_at, source_matches.sql:41-44)."""
    sid = ID_COLS[source]
    ncols = CONFIRM_NAME_COLS[(source, grain)]
    out = pd.DataFrame({sid: df[sid]})
    # pandas "string" dtype keeps Arrow string type even for all-null blocks
    # (Arrow's hash join rejects null-typed non-key fields)
    out["email"] = df["email"].astype("string")
    out["name0"] = (
        df[ncols[0]].str.lower().astype("string")
        if ncols[0] in df
        else pd.Series([None] * len(df), dtype="string")
    )
    if len(ncols) > 1 and ncols[1] in df:
        out["name1"] = df[ncols[1]].str.lower().astype("string")
    else:
        out["name1"] = pd.Series([None] * len(df), dtype="string")
    for m in mid_names:
        # match ids compare as strings (prep/..._for_matching.sql:103 casts)
        out[f"mid_{m}"] = (
            df[m].astype("string") if m in df else pd.Series([None] * len(df), dtype="string")
        )
    out["upd"] = _coalesce_ts(df["updated_at"], df["created_at"])
    out["cre"] = df["created_at"]
    return _to_arrow(out, _attrs_schema(source, mid_names))


# ---------------------------------------------------------------------------
# pairwise matching + fuzzy confirmation (Ray joins + vectorized kernel)
# ---------------------------------------------------------------------------


def _suffixed(ds, sid: str, suffix: str):
    def rn(t: pa.Table) -> pa.Table:
        return t.rename_columns([c if c == sid else c + suffix for c in t.schema.names])

    return ds.map_batches(rn, batch_format="pyarrow", zero_copy_batch=True)


def _confirm_kernel_factory(
    id_a: str, id_b: str, mids_applicable: tuple[str, ...], threshold: float, similarity_fn=None
):
    out_cols = [id_a, id_b, "upd_a", "cre_a", "upd_b", "cre_b"]

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({c: pd.Series(dtype=object) for c in out_cols})
        ok = df["email_a"].notna() & (df["email_a"] == df["email_b"])
        for m in mids_applicable:
            ok |= df[f"mid_{m}_a"].notna() & (df[f"mid_{m}_a"] == df[f"mid_{m}_b"])
        okv = ok.to_numpy(copy=True)
        for ca in ("name0_a", "name1_a"):
            for cb in ("name0_b", "name1_b"):
                pend = np.nonzero(~okv)[0]
                if not len(pend):
                    break
                a = df[ca].to_numpy(dtype=object)[pend]
                b = df[cb].to_numpy(dtype=object)[pend]
                if similarity_fn is None:
                    okv[pend] |= similar_mask(a, b, threshold)
                else:
                    okv[pend] |= np.array(
                        [similarity_fn(x, y) >= threshold for x, y in zip(a, b)], dtype=bool
                    )
        return df.loc[okv, out_cols]

    return kernel


def _confirmed_pairs_ds(
    keys_a, keys_b, attrs_a, attrs_b, id_a: str, id_b: str,
    mids_applicable: tuple[str, ...], threshold: float, similarity_fn=None,
    num_buckets: int = DEFAULT_NUM_BUCKETS, driver_threshold: int = 500_000,
):
    """Blocking join on 'key' (the one unavoidable shuffle: both sides are
    O(input)) → per-batch pair dedup → confirm.

    The post-blocking pair set is O(candidate matches) — the designed small
    side — so below ``driver_threshold`` the confirm attrs of ONLY the
    candidate ids come back through map-only broadcast semi-join filters and
    the vectorized confirm kernel runs on the driver. Above it, two more
    bucketed hash joins attach the attrs and the kernel runs distributed."""
    from ..stages.joins import bucketed_hash_join, semi_join

    pairs = bucketed_hash_join(keys_a, keys_b, on="key", num_buckets=num_buckets)
    pairs = pairs.map_batches(
        lambda t: t.select([id_a, id_b]).group_by([id_a, id_b]).aggregate([]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    kernel = _confirm_kernel_factory(id_a, id_b, mids_applicable, threshold, similarity_fn)

    pairs = pairs.materialize()  # the blocking join must not re-execute below
    # Decide the path from count() — the per-batch dedup above makes this a
    # slight overcount across batch boundaries, fine for a threshold — so the
    # O(candidate-pairs) collection only ever happens on the small path.
    if pairs.count() > driver_threshold:
        pa_join = bucketed_hash_join(
            pairs, _suffixed(attrs_a, id_a, "_a"), on=id_a, num_buckets=num_buckets
        )
        pab = bucketed_hash_join(
            pa_join, _suffixed(attrs_b, id_b, "_b"), on=id_b, num_buckets=num_buckets
        )
        return pab.map_batches(kernel, batch_format="pandas")

    pairs_df = pairs.to_pandas().drop_duplicates([id_a, id_b])
    if pairs_df.empty:
        return kernel(pd.DataFrame())
    aa = semi_join(
        _suffixed(attrs_a, id_a, "_a"), pairs_df[id_a].tolist(), on=id_a
    ).to_pandas()
    ab = semi_join(
        _suffixed(attrs_b, id_b, "_b"), pairs_df[id_b].tolist(), on=id_b
    ).to_pandas()
    merged = pairs_df.merge(aa, on=id_a).merge(ab, on=id_b)
    return kernel(merged)


def _pair_frame(ds, id_a: str, id_b: str, tag_a: str, tag_b: str) -> pd.DataFrame:
    """Materialize a confirmed-pair Dataset (O(matched entities)) and conform
    column names/dtypes for consolidation."""
    df = ds.to_pandas() if hasattr(ds, "to_pandas") else ds
    cols = [id_a, id_b, f"{tag_a}_upd", f"{tag_a}_cre", f"{tag_b}_upd", f"{tag_b}_cre"]
    if df.empty:
        return pd.DataFrame({c: pd.Series(dtype=object) for c in cols})
    df = df.rename(
        columns={
            "upd_a": f"{tag_a}_upd", "cre_a": f"{tag_a}_cre",
            "upd_b": f"{tag_b}_upd", "cre_b": f"{tag_b}_cre",
        }
    )[cols]
    return df.drop_duplicates([id_a, id_b]).reset_index(drop=True)


def _mids_applicable(config: PipelineConfig, src_a: str, src_b: str) -> tuple[str, ...]:
    """A match-id arm participates in the confirmation filter iff its grain is
    individual OR either side runs at organization grain
    (source_matches.sql:133-140)."""
    out = []
    for spec in config.internal_match_ids:
        if (
            spec.customer_grain == "individual"
            or config.grains.get(src_a) == "organization"
            or config.grains.get(src_b) == "organization"
        ):
            out.append(spec.name)
    return tuple(out)


def source_matches(cleaned: dict, config: PipelineConfig | None = None) -> pd.DataFrame:
    """Pairwise blocking joins + fuzzy confirm + 3-way consolidation
    (int_customer360__source_matches.sql). ``cleaned`` maps source → cleaned
    Dataset (pandas frames also accepted, for unit tests). Returns one row per
    matched entity tuple: (lead_id, customer_id, user_id, updated_at,
    created_at)."""
    import ray.data

    cfg = config or PipelineConfig()
    mids = tuple(s.name for s in cfg.internal_match_ids)
    thr = cfg.similarity_threshold
    sim_fn = cfg.similarity_fn

    present = [s for s in ("marketo", "stripe", "zendesk") if s in cleaned]
    ds = {}
    for s in present:
        d = cleaned[s]
        if isinstance(d, pd.DataFrame):
            d = ray.data.from_pandas(d) if len(d) else None
        ds[s] = d

    keys, attrs = {}, {}
    for s in present:
        if ds[s] is None:
            continue
        grain = cfg.grains.get(s, "individual")
        # materialized: each source's keys/attrs feed TWO pair arms (and the
        # attrs a semi-join fetch besides); lazy Datasets would re-run the
        # candidate filter + projections once per consumer
        cand = ds[s].map_batches(
            lambda df, _s=s, _g=grain: match_candidates(df, _s, _g), batch_format="pandas"
        ).materialize()
        keys[s] = cand.map_batches(
            lambda df, _s=s: _to_arrow(match_keys(df, _s, mids), _keys_schema(_s)),
            batch_format="pandas",
        ).materialize()
        attrs[s] = cand.map_batches(
            lambda df, _s=s, _g=grain: _confirm_attrs(df, _s, _g, mids),
            batch_format="pandas",
        ).materialize()

    def _drop_addr(k):
        import pyarrow.compute as pc

        return k.map_batches(
            lambda t: t.filter(pc.invert(pc.starts_with(t.column("key"), "addr"))),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    def _pairs(sa, sb, drop_addr=False):
        if sa not in keys or sb not in keys:
            return _pair_frame(
                pd.DataFrame(), ID_COLS[sa], ID_COLS[sb], sa[0], sb[0]
            )
        ka = _drop_addr(keys[sa]) if drop_addr else keys[sa]
        kb = _drop_addr(keys[sb]) if drop_addr else keys[sb]
        conf = _confirmed_pairs_ds(
            ka, kb, attrs[sa], attrs[sb], ID_COLS[sa], ID_COLS[sb],
            _mids_applicable(cfg, sa, sb), thr, sim_fn,
        )
        return _pair_frame(conf, ID_COLS[sa], ID_COLS[sb], sa[0], sb[0])

    # marketo×stripe uses every arm; m×z and s×z have no address arms (zendesk
    # emits no address keys) — drop the marketo/stripe side's address keys
    # before those joins to cut shuffle volume (source_matches.sql:184-199,266-282)
    ms = _pairs("marketo", "stripe")
    mz = _pairs("marketo", "zendesk", drop_addr=True)
    sz = _pairs("stripe", "zendesk", drop_addr=True)
    return _consolidate(ms, mz, sz)


def _as_int64(s: pd.Series) -> pd.Series:
    return pd.Series(s).astype("Int64") if len(s) else pd.Series(s, dtype="Int64")


def _consolidate(ms: pd.DataFrame, mz: pd.DataFrame, sz: pd.DataFrame) -> pd.DataFrame:
    """3-way consolidation (source_matches.sql:319-354): full outer joins on
    the shared ids, then group by the id triple with max/min timestamps —
    fully vectorized."""
    for df in (ms, mz):
        if "lead_id" in df:
            df["lead_id"] = _as_int64(df["lead_id"])
    for df in (mz, sz):
        if "user_id" in df:
            df["user_id"] = _as_int64(df["user_id"])
    for df in (ms, sz):
        if "customer_id" in df:
            df["customer_id"] = df["customer_id"].astype(object)

    tri = ms.merge(mz, on="lead_id", how="outer", suffixes=("", "_mzj"))
    tri = tri.merge(sz, on="customer_id", how="outer", suffixes=("", "_szj"))
    if "user_id_szj" in tri:
        tri["user_id"] = tri["user_id"].combine_first(tri["user_id_szj"])
    for c in ("lead_id", "user_id"):
        if c in tri:
            tri[c] = _as_int64(tri[c])

    upd_cols = [c for c in tri.columns if "_upd" in c]
    cre_cols = [c for c in tri.columns if "_cre" in c]
    for c in upd_cols + cre_cols:
        # empty pair frames contribute object-dtype ts columns; rowwise
        # max/min needs uniform datetime64
        tri[c] = pd.to_datetime(tri[c])
    tri["updated_at"] = (
        tri[upd_cols].max(axis=1) if upd_cols else pd.Series(pd.NaT, index=tri.index)
    )
    tri["created_at"] = (
        tri[cre_cols].min(axis=1) if cre_cols else pd.Series(pd.NaT, index=tri.index)
    )
    out = (
        tri.groupby(["lead_id", "customer_id", "user_id"], dropna=False)
        .agg(updated_at=("updated_at", "max"), created_at=("created_at", "min"))
        .reset_index()
    )
    out["lead_id"] = _as_int64(out["lead_id"])
    out["user_id"] = _as_int64(out["user_id"])
    out["customer_id"] = out["customer_id"].astype(object).where(out["customer_id"].notna(), None)
    return out


# ---------------------------------------------------------------------------
# mapping: golden-record spine (customer360__mapping.sql)
# ---------------------------------------------------------------------------

_FRAG_COLS = [
    "spine_key", "src_rank", "lead_id", "customer_id", "user_id", "upd", "cre",
    "m_org", "m_inferred_org", "s_org", "s_ship_org", "z_org_id", "org_display",
]


def _fragment_kernel(
    df: pd.DataFrame, source: str, pos_map: dict, mid_names: tuple[str, ...]
) -> pd.DataFrame:
    """Every cleaned row emits one spine fragment per match-tuple position it
    belongs to (the full-outer join of mapping.sql:83-100, as a shuffle key),
    or a singleton fragment keyed by its own id when never matched."""
    sid = ID_COLS[source]
    pos = df[sid].map(pos_map)
    matched = pos.notna()

    def _mk(sub: pd.DataFrame, spine_key: pd.Series) -> pd.DataFrame:
        n = len(sub)
        nstr = pd.Series([None] * n, index=sub.index, dtype="string")
        none = pd.Series([None] * n, index=sub.index, dtype=object)
        out = pd.DataFrame(index=sub.index)
        out["spine_key"] = spine_key
        out["src_rank"] = SRC_RANK[source]
        out["lead_id"] = _as_int64(sub[sid]) if sid == "lead_id" else _as_int64(none)
        out["customer_id"] = sub[sid].astype("string") if sid == "customer_id" else nstr
        out["user_id"] = _as_int64(sub[sid]) if sid == "user_id" else _as_int64(none)
        out["upd"] = _coalesce_ts(sub["updated_at"], sub["created_at"])
        out["cre"] = sub["created_at"]
        if source == "marketo":
            out["m_org"] = sub["company"].astype("string")
            out["m_inferred_org"] = sub["inferred_company"].astype("string")
            out["s_org"] = out["s_ship_org"] = nstr
            out["z_org_id"] = _as_int64(none)
            out["org_display"] = sub["company"].fillna(sub["inferred_company"]).astype("string")
        elif source == "stripe":
            out["m_org"] = out["m_inferred_org"] = nstr
            out["s_org"] = sub["organization"].astype("string")
            out["s_ship_org"] = sub["shipping_organization"].astype("string")
            out["z_org_id"] = _as_int64(none)
            out["org_display"] = (
                sub["organization"].fillna(sub["shipping_organization"]).astype("string")
            )
        else:
            out["m_org"] = out["m_inferred_org"] = out["s_org"] = out["s_ship_org"] = nstr
            out["z_org_id"] = _as_int64(sub["organization_id"])
            out["org_display"] = sub["organization"].astype("string")
        for m in mid_names:
            out[f"mid_{m}"] = sub[m].astype("string") if m in sub else nstr
        return out

    frames = []
    um = df[~matched]
    if len(um):
        frames.append(_mk(um, source + ":" + um[sid].astype(str)))
    mt = df[matched].copy()
    if len(mt):
        mt["_pos"] = pos[matched]
        mt = mt.explode("_pos")
        frames.append(_mk(mt, "t" + mt["_pos"].astype(str)))
    schema = _frag_schema(mid_names)
    if not frames:
        return schema.empty_table()
    return _to_arrow(pd.concat(frames, ignore_index=True), schema)


def _json_str(rendered: np.ndarray) -> np.ndarray:
    """coalesce(cast(id as string), '') — the reference's individual-row JSON
    value (mapping.sql:122-126)."""
    return np.where(pd.isna(rendered), "", rendered).astype(object)


def _arr(s: pd.Series) -> str:
    """Sorted distinct '"<v>"' JSON array string, '""' for null member ids
    (mapping.sql:169-179; order pinned — SURVEY.md §2.5 caveat)."""
    vals = sorted({'""' if pd.isna(v) else f'"{v}"' for v in s})
    return "[" + ",".join(vals) + "]"


def _max_nn(s: pd.Series):
    """max over non-null values (SQL max semantics for object columns)."""
    vals = [v for v in s if pd.notna(v)]
    return max(vals) if vals else None


def _mapping_keep(mids: tuple[str, ...]) -> list[str]:
    return [
        "lead_id", "customer_id", "user_id", "updated_at", "created_at",
        "organization_name", "is_organization_header",
        "customer360_organization_id", "source_ids",
    ] + [f"mid_{m}" for m in mids] + ["customer360_id"]


def _mapping_schema(mids: tuple[str, ...]) -> pa.Schema:
    fields = [
        ("lead_id", pa.int64()), ("customer_id", pa.string()),
        ("user_id", pa.int64()), ("updated_at", pa.timestamp("us")),
        ("created_at", pa.timestamp("us")), ("organization_name", pa.string()),
        ("is_organization_header", pa.bool_()),
        ("customer360_organization_id", pa.string()), ("source_ids", pa.string()),
    ]
    fields += [(f"mid_{m}", pa.string()) for m in mids]
    fields += [("customer360_id", pa.string())]
    return pa.schema(fields)


def _bucket_on(col: str, num_buckets: int):
    """Batch kernel adding the shuffle bucket column ``_b = hash(col) % B``."""
    from ..hashing import stable_hash

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_b"] = (stable_hash(df[col]) % np.uint64(num_buckets)).astype(np.int64)
        return df

    return kernel


def _mint_individuals(spine: pd.DataFrame, mids: tuple[str, ...]) -> pd.DataFrame:
    """Per-row spine minting (fully vectorized, runs INSIDE the spine-combine
    map_groups task — never on the driver):
    - customer360_organization_id = surrogate(5 org components), computed
      unconditionally (mapping.sql:107) — rows with no org data share the
      sentinel hash and therefore one header row (reference quirk, reproduced)
    - individual-row source_ids JSON (:122-126)
    - customer360_id = surrogate(lead, customer, user, is_header, org_id,
      *match_ids) (:205)."""
    spine = spine.reset_index(drop=True)
    spine["lead_id"] = _as_int64(spine["lead_id"])
    spine["user_id"] = _as_int64(spine["user_id"])
    spine["is_organization_header"] = False
    spine["customer360_organization_id"] = surrogate_key(
        spine["m_org"], spine["m_inferred_org"], spine["s_org"],
        spine["s_ship_org"], spine["z_org_id"],
    ).to_pylist()
    r_lead = _json_str(render_sql_string(spine["lead_id"]))
    r_cust = _json_str(render_sql_string(spine["customer_id"]))
    r_user = _json_str(render_sql_string(spine["user_id"]))
    spine["source_ids"] = (
        '{"marketo":"' + r_lead + '","stripe":"' + r_cust + '","zendesk":"' + r_user + '"}'
    )
    spine["customer360_id"] = surrogate_key(
        spine["lead_id"], spine["customer_id"], spine["user_id"],
        spine["is_organization_header"], spine["customer360_organization_id"],
        *[spine[f"mid_{m}"] for m in mids],
    ).to_pylist()
    return spine


def _header_kernel(
    df: pd.DataFrame, mids: tuple[str, ...], org_grain_mids: frozenset
) -> pa.Table:
    """Org-header aggregate rows (mapping.sql:147-199) for one hash bucket of
    individual spine rows (bucket = hash(customer360_organization_id), so every
    member of an org group is co-located). organization_name aggregates as
    max-over-non-null — the oracle's ``max(organization_name)``; constant per
    group in practice since the group key is the surrogate of the very org
    columns the display name coalesces from."""
    schema = _mapping_schema(mids)
    if df.empty:
        return schema.empty_table()
    grp = df.assign(
        _rl=render_sql_string(df["lead_id"]),
        _rc=render_sql_string(df["customer_id"]),
        _ru=render_sql_string(df["user_id"]),
    ).groupby("customer360_organization_id", sort=False)
    headers = grp.agg(
        lead_arr=("_rl", _arr), cust_arr=("_rc", _arr), user_arr=("_ru", _arr),
        updated_at=("updated_at", "max"), created_at=("created_at", "min"),
        organization_name=("organization_name", _max_nn),
    ).reset_index()
    for m in mids:
        col = grp[f"mid_{m}"]
        if m in org_grain_mids:
            headers[f"mid_{m}"] = col.agg(_max_nn).to_numpy()
        else:
            # individual-grain mids aggregate to JSON arrays on header rows
            # (mapping.sql:163-167)
            headers[f"mid_{m}"] = col.agg(
                lambda s: "[" + ",".join(sorted({f'"{v}"' for v in s if pd.notna(v)})) + "]"
            ).to_numpy()
    headers["source_ids"] = (
        '{"marketo":' + headers["lead_arr"] + ',"stripe":' + headers["cust_arr"]
        + ',"zendesk":' + headers["user_arr"] + "}"
    )
    headers["is_organization_header"] = True
    n_h = len(headers)
    headers["lead_id"] = _as_int64(pd.Series([None] * n_h, dtype=object))
    headers["user_id"] = _as_int64(pd.Series([None] * n_h, dtype=object))
    headers["customer_id"] = pd.Series([None] * n_h, dtype=object)
    headers["customer360_id"] = surrogate_key(
        headers["lead_id"], headers["customer_id"], headers["user_id"],
        headers["is_organization_header"], headers["customer360_organization_id"],
        *[headers[f"mid_{m}"] for m in mids],
    ).to_pylist()
    return _to_arrow(headers[_mapping_keep(mids)], schema)


def build_mapping(
    matches: pd.DataFrame, cleaned: dict, config: PipelineConfig | None = None,
    num_buckets: int | None = None,
):
    """The golden-record spine as a ray.data.Dataset — NO O(entities) table
    lands on the driver. Every cleaned row emits a spine fragment; one Ray
    groupby (hash of the spine key) combines fragments into spine rows and
    mints surrogate keys / source_ids INSIDE the combine task; a second
    groupby (hash of the org surrogate) emits the org-header aggregate rows.
    Only the pos_maps broadcast (O(matched pairs) — the designed small side,
    like the pair tables themselves) touches the driver."""
    import ray
    import ray.data

    cfg = config or PipelineConfig()
    mids = tuple(s.name for s in cfg.internal_match_ids)
    org_grain_mids = frozenset(
        s.name for s in cfg.internal_match_ids if s.customer_grain == "organization"
    )
    schema = _mapping_schema(mids)
    tri = matches.reset_index(drop=True)

    pos_maps: dict[str, dict] = {s: {} for s in ID_COLS}
    for src, idc in (("marketo", "lead_id"), ("stripe", "customer_id"), ("zendesk", "user_id")):
        if idc not in tri:
            continue
        for p, v in zip(tri.index, tri[idc]):
            if pd.notna(v):
                pos_maps[src].setdefault(v, []).append(p)

    refs = {s: ray.put(pos_maps[s]) for s in pos_maps}

    frag_sets = []
    for s, ds in cleaned.items():
        if isinstance(ds, pd.DataFrame):
            ds = ray.data.from_pandas(ds) if len(ds) else None
        if ds is None:
            continue
        ref = refs[s]
        frag_sets.append(
            ds.map_batches(
                lambda df, _s=s, _r=ref: _fragment_kernel(df, _s, ray.get(_r), mids),
                batch_format="pandas",
            )
        )
    if not frag_sets:
        raise ValueError("no cleaned sources to map")
    frags = frag_sets[0]
    for f in frag_sets[1:]:
        frags = frags.union(f)

    nb = num_buckets or DEFAULT_NUM_BUCKETS

    agg_spec = {
        "lead_id": ("lead_id", "first"), "customer_id": ("customer_id", "first"),
        "user_id": ("user_id", "first"),
        "updated_at": ("upd", "max"), "created_at": ("cre", "min"),
        "m_org": ("m_org", "first"), "m_inferred_org": ("m_inferred_org", "first"),
        "s_org": ("s_org", "first"), "s_ship_org": ("s_ship_org", "first"),
        "z_org_id": ("z_org_id", "first"), "organization_name": ("org_display", "first"),
    }
    for m in mids:
        agg_spec[f"mid_{m}"] = (f"mid_{m}", "first")

    def _combine(g: pd.DataFrame) -> pa.Table:
        # sort by source rank so groupby.first (first NON-NULL) realizes the
        # marketo → stripe → zendesk coalesce priority of the reference
        g = g.sort_values(["spine_key", "src_rank"], kind="stable")
        out = g.groupby("spine_key", sort=False).agg(**agg_spec).reset_index()
        if out.empty:
            return schema.empty_table()
        return _to_arrow(_mint_individuals(out, mids), schema)

    spine_ind = (
        frags.map_batches(_bucket_on("spine_key", nb), batch_format="pandas")
        .groupby("_b")
        .map_groups(_combine, batch_format="pandas")
        .materialize()  # feeds both the header groupby and the final union
    )
    if spine_ind.count() == 0:
        return ray.data.from_arrow(schema.empty_table())
    headers = (
        spine_ind.map_batches(
            _bucket_on("customer360_organization_id", nb), batch_format="pandas"
        )
        .groupby("_b")
        .map_groups(
            lambda g: _header_kernel(g, mids, org_grain_mids), batch_format="pandas"
        )
    )
    return spine_ind.union(headers)


# ---------------------------------------------------------------------------
# attribute tables + survivorship (customer360__{email,phone,name}.sql)
# ---------------------------------------------------------------------------

ATTRIBUTE_SPECS = {
    # attr -> [(source, column, type_label)]
    "email": [
        ("marketo", "email", "primary"),
        ("stripe", "email", "primary"),
        ("zendesk", "email", "primary"),
    ],
    "phone": [
        ("marketo", "phone", "primary"),
        ("marketo", "main_phone", "main"),
        ("marketo", "mobile_phone", "mobile"),
        ("stripe", "phone", "primary"),
        ("stripe", "shipping_phone", "shipping"),
        ("zendesk", "phone", "primary"),
    ],
    "name": [
        ("marketo", "full_name", "individual"),
        ("stripe", "full_name", "individual"),
        ("stripe", "shipping_name", "shipping"),
        ("zendesk", "full_name", "individual"),
    ],
    "organization": [
        ("marketo", "company", "primary"),
        ("marketo", "inferred_company", "inferred"),
        ("stripe", "organization", "primary"),
        ("stripe", "shipping_organization", "shipping"),
        ("zendesk", "organization", "primary"),
    ],
}

PLACEHOLDER_NAMES = {"permanently deleted", "placeholder contact", "not available"}
DEMOTED_TYPES = {"inferred"}  # ranked last (customer360__address.sql:211-212)


def _cid_pairs(mapping_ds):
    """Unpivot the individual spine rows to ('<source>:<id>', cid) pairs —
    the raw input to the source-id → customer360_id map. A source id can
    appear in several spine rows (one row matched into two tuples); the MIN
    customer360_id wins, pinned so the assignment is deterministic regardless
    of spine row order (mirrored by the oracle's cid_* CTEs:
    ``min(customer360_id) GROUP BY id``). The min-reduce itself happens in
    CidContext — driver-side below the broadcast gate (the pairs are already
    the collected regime there; the groupby shuffle was pure overhead),
    distributed groupby above it."""
    import pyarrow.compute as pc

    empty = pa.schema([("src_key", pa.string()), ("cid", pa.string())]).empty_table()

    def unpivot(t: pa.Table) -> pa.Table:
        ind = t.filter(pc.invert(t.column("is_organization_header")))
        parts = []
        for src, idc in (
            ("marketo", "lead_id"), ("stripe", "customer_id"), ("zendesk", "user_id")
        ):
            sub = ind.filter(pc.is_valid(ind.column(idc)))
            if sub.num_rows == 0:
                continue
            key = pc.binary_join_element_wise(
                pa.array([src + ":"] * sub.num_rows, pa.string()),
                pc.cast(sub.column(idc), pa.string()),
                "",
            )
            parts.append(pa.table({"src_key": key, "cid": sub.column("customer360_id")}))
        return pa.concat_tables(parts) if parts else empty

    return mapping_ds.map_batches(
        unpivot, batch_format="pyarrow", zero_copy_batch=True
    )


class CidContext:
    """Source-id → customer360_id attachment strategy for every downstream
    table (the reference joins each unpivot to the mapping on the source id,
    customer360__email.sql:29-44).

    The (id, cid) pairs are computed distributed (``_cid_pairs``). Below
    ``broadcast_threshold`` the narrow pairs are collected once, min-reduced
    in driver pandas and broadcast via ray.put — a map-only attach, the fast
    path at fixture scale. Above it, the min-reduce is a distributed groupby
    and attach is a bucketed hash join on ``src_key`` (stages/joins.py) — the
    100 TB path where no O(entities) dict may exist on the driver or inside
    actor heaps."""

    def __init__(
        self, mapping_ds, num_buckets: int, broadcast_threshold: int = 2_000_000
    ):
        import ray

        self.num_buckets = num_buckets
        pairs = _cid_pairs(mapping_ds).materialize()
        # gate on the raw pair count (≥ distinct ids — a benign overcount for
        # a threshold): below it the pairs are the collected regime anyway,
        # so the min-per-key reduce runs in driver pandas and the distributed
        # groupby shuffle is skipped entirely
        self.n_ids = pairs.count()
        self.broadcast = self.n_ids <= broadcast_threshold
        self.ref = None
        self.map_ds = None
        if self.broadcast:
            df = (
                pairs.to_pandas()
                .groupby("src_key", as_index=False, sort=False)["cid"]
                .min()
            )
            self.ref = ray.put(dict(zip(df["src_key"], df["cid"])))
        else:
            self.map_ds = (
                pairs.groupby("src_key")
                .min("cid")
                .map_batches(
                    lambda t: t.rename_columns(["src_key", "cid"]),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                )
                .materialize()
            )

    def attach(self, ds, schema: pa.Schema):
        """``ds`` carries a ``src_key`` column; returns it with
        ``customer360_id`` attached (inner semantics — org headers have null
        source ids and are correctly excluded, SURVEY.md §2.4)."""
        import ray

        if self.broadcast:
            ref = self.ref

            def kernel(df: pd.DataFrame) -> pa.Table:
                lk = ray.get(ref)
                cid = df["src_key"].map(lk)
                keep = cid.notna()
                out = df[keep].drop(columns=["src_key"])
                out.insert(0, "customer360_id", cid[keep].astype(object))
                return _to_arrow(out, schema)

            return ds.map_batches(kernel, batch_format="pandas")

        from ..stages.joins import bucketed_hash_join

        joined = bucketed_hash_join(
            ds, self.map_ds, on="src_key", num_buckets=self.num_buckets
        )

        def fix(df: pd.DataFrame) -> pa.Table:
            out = df.drop(columns=["src_key"]).rename(columns={"cid": "customer360_id"})
            return _to_arrow(out, schema)

        return joined.map_batches(fix, batch_format="pandas")


def _pre_attach_schema(schema: pa.Schema) -> pa.Schema:
    """The fragment schema before cid attachment: src_key replaces
    customer360_id."""
    return pa.schema(
        [("src_key", pa.string())]
        + [(n, schema.field(n).type) for n in schema.names if n != "customer360_id"]
    )


def _rank_kernel(
    g: pd.DataFrame, demote_placeholder: bool, demote_types: bool, extra_cols: list[str]
) -> pd.DataFrame:
    """Vectorized confidence ranking (customer360__email.sql:95-110):
    count(*)/max(ts) over (customer360_id, value), then dense_rank over
    (demotion, value_count desc, recency desc) + row_number; tie order pinned
    to (value, source, type) for byte-stable output."""
    out_cols = (
        ["customer360_id", "value"] + extra_cols
        + ["type", "source", "value_count", "last_updated", "confidence_rank", "index"]
    )
    if g.empty:
        return pd.DataFrame({c: pd.Series(dtype=object) for c in out_cols})
    g = g.copy()
    grp = g.groupby(["customer360_id", "value"], sort=False)
    g["value_count"] = grp["value"].transform("size").astype("int64")
    g["last_updated"] = grp["last_updated"].transform("max")
    g["_ts"] = g["last_updated"].fillna(EPOCH)
    if demote_placeholder:
        g["_dem"] = g["value"].str.lower().isin(PLACEHOLDER_NAMES)
    elif demote_types:
        g["_dem"] = g["type"].isin(DEMOTED_TYPES)
    else:
        g["_dem"] = False
    g = g.sort_values(
        ["customer360_id", "_dem", "value_count", "_ts", "value", "source", "type"],
        ascending=[True, True, False, False, True, True, True],
        kind="stable",
    ).reset_index(drop=True)
    g["index"] = g.groupby("customer360_id", sort=False).cumcount() + 1
    chg = (
        g["customer360_id"].ne(g["customer360_id"].shift())
        | g["_dem"].ne(g["_dem"].shift())
        | g["value_count"].ne(g["value_count"].shift())
        | g["_ts"].ne(g["_ts"].shift())
    )
    gid = chg.cumsum()
    g["confidence_rank"] = (
        gid - g.assign(_gid=gid).groupby("customer360_id", sort=False)["_gid"].transform("min") + 1
    )
    return g[out_cols]


def _ranked_schema(extra_cols: list[str]) -> pa.Schema:
    fields = [("customer360_id", pa.string()), ("value", pa.string())]
    fields += [(c, pa.string()) for c in extra_cols]
    fields += [
        ("type", pa.string()), ("source", pa.string()),
        ("value_count", pa.int64()), ("last_updated", pa.timestamp("us")),
        ("confidence_rank", pa.int64()), ("index", pa.int64()),
    ]
    return pa.schema(fields)


def _ranked_union(
    frag_sets: list, demote_placeholder: bool, demote_types: bool,
    extra_cols: list[str], num_buckets: int | None = None,
):
    """Union fragment Datasets, shuffle once on hash(customer360_id) and run
    the vectorized rank kernel per bucket. Dataset-out — attribute tables are
    O(input rows) and never land on the driver."""
    import ray.data

    schema = _ranked_schema(extra_cols)
    frag_sets = [f for f in frag_sets if f is not None]
    if not frag_sets:
        return ray.data.from_arrow(schema.empty_table())
    ds = frag_sets[0]
    for f in frag_sets[1:]:
        ds = ds.union(f)
    nb = num_buckets or DEFAULT_NUM_BUCKETS

    def kern(g: pd.DataFrame) -> pa.Table:
        if g.empty:
            return schema.empty_table()
        out = _rank_kernel(g, demote_placeholder, demote_types, extra_cols)
        return _to_arrow(out, schema) if len(out) else schema.empty_table()

    return (
        ds.map_batches(_bucket_on("customer360_id", nb), batch_format="pandas")
        .groupby("_b")
        .map_groups(kern, batch_format="pandas")
    )


def attribute_table(
    attr: str, cid_ctx: CidContext, cleaned: dict,
    config: PipelineConfig | None = None, num_buckets: int | None = None,
):
    """Unpivot per-source values (UNION ALL, customer360__phone.sql:29-95) to
    (src_key, value, …) fragments, attach customer360_id once over the union
    via CidContext (broadcast map below the entity gate, ONE bucketed hash
    join above), then the distributed windowed confidence rank. Dataset-out."""
    import ray.data

    schema = _attr_frag_schema([])
    pre = _pre_attach_schema(schema)

    def _frag(df: pd.DataFrame, source: str, col: str, type_label: str) -> pa.Table:
        sid = ID_COLS[source]
        sub = df[df[col].notna()]
        out = pd.DataFrame(
            {
                "src_key": source + ":" + sub[sid].astype(str),
                "value": sub[col].astype(object),
                "type": type_label,
                "source": source,
                "last_updated": _coalesce_ts(sub["updated_at"], sub["created_at"]),
            }
        )
        return _to_arrow(out, pre)

    frag_sets = []
    for source, col, type_label in ATTRIBUTE_SPECS[attr]:
        ds = cleaned.get(source)
        if ds is None:
            continue
        if isinstance(ds, pd.DataFrame):
            if not len(ds):
                continue
            ds = ray.data.from_pandas(ds)
        if col not in ds.schema().names:
            continue
        frag_sets.append(
            ds.map_batches(
                lambda df, _s=source, _c=col, _t=type_label: _frag(df, _s, _c, _t),
                batch_format="pandas",
            )
        )
    if not frag_sets:
        return ray.data.from_arrow(_ranked_schema([]).empty_table())
    frags = frag_sets[0]
    for f in frag_sets[1:]:
        frags = frags.union(f)
    attached = cid_ctx.attach(frags, schema)
    return _ranked_union(
        [attached],
        demote_placeholder=(attr == "name"),
        demote_types=(attr == "organization"),
        extra_cols=[],
        num_buckets=num_buckets,
    )


def address_attribute(
    cid_ctx: CidContext, cleaned: dict, config: PipelineConfig | None = None,
    num_buckets: int | None = None,
):
    """customer360__address.sql:24-116,140-212: unpivot per-source address rows
    (line_1/line_2/city/state/zip/country + type), rank per entity by
    (non-inferred first, frequency, recency) on the line_1 value. Dataset-out."""
    import ray.data

    extra = ["address_line_2", "city", "state_code", "postal_code", "country_code"]
    schema = _attr_frag_schema(extra)
    pre = _pre_attach_schema(schema)

    def _frag(df: pd.DataFrame, source: str, type_label: str) -> pa.Table:
        sid = ID_COLS[source]
        sub = df[df["address_line_1"].notna()]
        out = pd.DataFrame(
            {
                "src_key": source + ":" + sub[sid].astype(str),
                "value": sub["address_line_1"].astype(object),
            }
        )
        for c in extra:
            out[c] = sub[c].astype(object).to_numpy()
        out["type"] = type_label
        out["source"] = source
        out["last_updated"] = _coalesce_ts(sub["updated_at"], sub["created_at"]).to_numpy()
        return _to_arrow(out, pre)

    frag_sets = []
    for source, type_label in (("marketo", "primary"), ("stripe", "customer")):
        ds = cleaned.get(source)
        if ds is None:
            continue
        if isinstance(ds, pd.DataFrame):
            if not len(ds):
                continue
            ds = ray.data.from_pandas(ds)
        if "address_line_1" not in ds.schema().names:
            continue
        frag_sets.append(
            ds.map_batches(
                lambda df, _s=source, _t=type_label: _frag(df, _s, _t),
                batch_format="pandas",
            )
        )
    if not frag_sets:
        return ray.data.from_arrow(_ranked_schema(extra).empty_table())
    frags = frag_sets[0]
    for f in frag_sets[1:]:
        frags = frags.union(f)
    attached = cid_ctx.attach(frags, schema)
    return _ranked_union(
        [attached], demote_placeholder=False, demote_types=True,
        extra_cols=extra, num_buckets=num_buckets,
    )


# ---------------------------------------------------------------------------
# ip / status / updates tables (customer360__{ip_address,status,updates}.sql)
# ---------------------------------------------------------------------------

STATUS_SPECS = [
    ("marketo", "is_unsubscribed"), ("marketo", "is_email_invalid"),
    ("marketo", "do_not_call"), ("stripe", "is_delinquent"),
    ("stripe", "is_deleted"), ("zendesk", "is_active"), ("zendesk", "is_suspended"),
]


def _fragment_union(cleaned: dict, kernels: dict, cid_ctx: CidContext, schema: pa.Schema):
    """Run one vectorized (src_key-emitting) kernel per source over its
    cleaned Dataset, union, attach customer360_id once via CidContext.
    Dataset-out — these tables are O(input rows)."""
    import ray.data

    frag_sets = []
    for source, kernel in kernels.items():
        ds = cleaned.get(source)
        if ds is None:
            continue
        if isinstance(ds, pd.DataFrame):
            if not len(ds):
                continue
            ds = ray.data.from_pandas(ds)
        frag_sets.append(
            ds.map_batches(lambda df, _k=kernel: _k(df), batch_format="pandas")
        )
    if not frag_sets:
        return ray.data.from_arrow(schema.empty_table())
    frags = frag_sets[0]
    for f in frag_sets[1:]:
        frags = frags.union(f)
    return cid_ctx.attach(frags, schema)


def ip_address_table(
    cid_ctx: CidContext, cleaned: dict, config: PipelineConfig | None = None
):
    """customer360__ip_address.sql:23-29: marketo IPs joined to the spine with
    ipv4/ipv6 classification. Dataset-out."""
    schema = pa.schema(
        [("customer360_id", pa.string()), ("ip_address", pa.string()),
         ("type", pa.string()), ("source", pa.string())]
    )
    pre = _pre_attach_schema(schema)

    def marketo(df: pd.DataFrame) -> pa.Table:
        sub = df[df["anonymous_ip"].notna()]
        out = pd.DataFrame(
            {
                "src_key": "marketo:" + sub["lead_id"].astype(str),
                "ip_address": sub["anonymous_ip"].astype(object),
                "type": sub["ip_type"].astype(object),
                "source": "marketo",
            }
        )
        return _to_arrow(out, pre)

    return _fragment_union(cleaned, {"marketo": marketo}, cid_ctx, schema)


def status_table(
    cid_ctx: CidContext, cleaned: dict, config: PipelineConfig | None = None
):
    """customer360__status.sql:39-176: per-source status flags unpivoted to
    (customer360_id, status, value, source) rows — vectorized melt per batch.
    Dataset-out."""
    schema = pa.schema(
        [("customer360_id", pa.string()), ("status", pa.string()),
         ("value", pa.bool_()), ("source", pa.string())]
    )
    pre = _pre_attach_schema(schema)
    flags: dict[str, list[str]] = {}
    for src, col in STATUS_SPECS:
        flags.setdefault(src, []).append(col)

    def make_kernel(source: str, src_flags: list[str]):
        sid = ID_COLS[source]

        def kernel(df: pd.DataFrame) -> pa.Table:
            present = [c for c in src_flags if c in df.columns]
            if not present:
                return pre.empty_table()
            sub = df[present].copy()
            sub.insert(0, "src_key", source + ":" + df[sid].astype(str))
            long = sub.melt(id_vars=["src_key"], var_name="status", value_name="value")
            long = long[long["value"].notna()]
            long["value"] = long["value"].astype(bool)
            long["source"] = source
            return _to_arrow(long, pre)

        return kernel

    return _fragment_union(
        cleaned, {s: make_kernel(s, f) for s, f in flags.items()}, cid_ctx, schema
    )


def updates_table(
    cid_ctx: CidContext, cleaned: dict, config: PipelineConfig | None = None
):
    """customer360__updates.sql:7-68: per-source recency rows
    (customer360_id, source, last_updated, created_at). Dataset-out."""
    schema = pa.schema(
        [("customer360_id", pa.string()), ("source", pa.string()),
         ("last_updated", pa.timestamp("us")), ("created_at", pa.timestamp("us"))]
    )
    pre = _pre_attach_schema(schema)

    def make_kernel(source: str):
        sid = ID_COLS[source]

        def kernel(df: pd.DataFrame) -> pa.Table:
            out = pd.DataFrame(
                {
                    "src_key": source + ":" + df[sid].astype(str),
                    "source": source,
                    "last_updated": _coalesce_ts(df["updated_at"], df["created_at"]).to_numpy(),
                    "created_at": df["created_at"].to_numpy(),
                }
            )
            return _to_arrow(out, pre)

        return kernel

    return _fragment_union(
        cleaned,
        {s: make_kernel(s) for s in ("marketo", "stripe", "zendesk")},
        cid_ctx,
        schema,
    )


# ---------------------------------------------------------------------------
# summary (customer360__summary.sql)
# ---------------------------------------------------------------------------


_SUMMARY_BASE_COLS = [
    "customer360_id", "customer360_organization_id", "organization_name",
    "is_organization_header", "lead_id", "customer_id", "user_id",
    "updated_at", "created_at",
]


def summary(mapping: pd.DataFrame, attrs: dict[str, pd.DataFrame]) -> pd.DataFrame:
    """customer360__summary.sql:46-157: best (index=1) value per attribute
    star-joined onto the spine — the driver-boundary (pandas) variant used
    below the entity gate, where mapping/attrs already sit on the driver for
    the correctness compare anyway."""
    out = mapping[_SUMMARY_BASE_COLS].copy()
    for attr, table in attrs.items():
        if table.empty:
            out[f"best_{attr}"] = None
            continue
        best = table[table["index"] == 1][["customer360_id", "value"]].rename(
            columns={"value": f"best_{attr}"}
        )
        out = out.merge(best, on="customer360_id", how="left")
    return out


def summary_ds(mapping_ds, attrs: dict, num_buckets: int | None = None):
    """Distributed summary star join (customer360__summary.sql:46-157): the
    index=1 row of each attribute Dataset left-joined onto the spine Dataset
    via bucketed hash joins on customer360_id — the scale path; both sides are
    O(entities) but neither touches the driver."""
    import pyarrow.compute as pc

    from ..stages.joins import bucketed_hash_join

    nb = num_buckets or DEFAULT_NUM_BUCKETS
    out = mapping_ds.map_batches(
        lambda t: t.select(_SUMMARY_BASE_COLS),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    for attr, table in attrs.items():
        best = table.map_batches(
            lambda t, _a=attr: t.filter(pc.equal(t.column("index"), 1))
            .select(["customer360_id", "value"])
            .rename_columns(["customer360_id", f"best_{_a}"]),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        out = bucketed_hash_join(
            out, best, on="customer360_id", how="left", num_buckets=nb
        )
    return out


# ---------------------------------------------------------------------------
# customer metrics rollup (models/customer360__customer.sql:28-337)
# ---------------------------------------------------------------------------

METRIC_SUM_COLS = {
    "marketo": ["count_campaigns", "count_email_opens", "count_email_clicks"],
    "stripe": ["total_spend", "count_charges"],
    "zendesk": ["count_tickets", "count_open_tickets", "count_replies"],
}


def _metric_partial_kernel(src: str, idc: str, sum_cols: tuple[str, ...]):
    """Per-batch metric partial aggregation (combine-before-shuffle): one
    (customer360_id, partial sums) row per entity per batch."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["customer360_id"].notna()].copy()
        if src == "zendesk":
            df["_csat_weighted"] = df["avg_csat"].fillna(0) * df["count_tickets"].fillna(0)
        g = df.groupby("customer360_id", sort=False)
        agg = g[list(sum_cols)].sum()
        if src == "stripe":
            agg["first_charge_at"] = g["first_charge_at"].min()
            agg["most_recent_charge_at"] = g["most_recent_charge_at"].max()
        return agg.reset_index()

    return partial


def _metric_combine(src: str, sum_cols: list[str], parts: pd.DataFrame) -> pd.DataFrame:
    """Final combine of metric partials for one source (runs on the driver
    below the gate, inside a map_groups bucket task above it)."""
    g = parts.groupby("customer360_id", sort=False)
    agg_df = g[sum_cols].sum()
    if src == "stripe":
        agg_df["first_charge_at"] = g["first_charge_at"].min()
        agg_df["most_recent_charge_at"] = g["most_recent_charge_at"].max()
    agg_df = agg_df.reset_index()
    if src == "zendesk":
        denom = agg_df["count_tickets"].replace(0, np.nan)
        agg_df["avg_csat"] = (agg_df["_csat_weighted"] / denom).round(6)
        agg_df = agg_df.drop(columns=["_csat_weighted"])
    return agg_df


_METRIC_IDS = (
    ("marketo", "lead_id"), ("stripe", "customer_id"), ("zendesk", "user_id")
)


def _metric_attached(src: str, idc: str, table, cid_ctx: CidContext):
    """Metric source (pa.Table | Dataset | path) → Dataset with
    customer360_id attached (metrics of unmatched ids drop, as in the
    reference's inner cid join)."""
    sum_cols = list(METRIC_SUM_COLS[src])
    if src == "zendesk":
        sum_cols = sum_cols + ["avg_csat"]
    fields = [("src_key", pa.string())]
    fields += [(c, pa.float64()) for c in sum_cols]
    if src == "stripe":
        fields += [("first_charge_at", pa.timestamp("us")),
                   ("most_recent_charge_at", pa.timestamp("us"))]
    pre = pa.schema(fields)
    schema = pa.schema(
        [("customer360_id", pa.string())] + [(n, pre.field(n).type) for n in pre.names[1:]]
    )

    def frag(df: pd.DataFrame) -> pa.Table:
        out = pd.DataFrame({"src_key": src + ":" + df[idc].astype(str)})
        for c in sum_cols:
            out[c] = df[c].astype("float64")
        if src == "stripe":
            out["first_charge_at"] = df["first_charge_at"]
            out["most_recent_charge_at"] = df["most_recent_charge_at"]
        return _to_arrow(out, pre)

    frags = _as_dataset(table).map_batches(frag, batch_format="pandas")
    return cid_ctx.attach(frags, schema)


def customer_rollup(
    summary_df: pd.DataFrame,
    metric_tables: dict,
    cid_ctx: CidContext,
) -> pd.DataFrame:
    """Per-source metric aggregation joined to the summary dims
    (customer360__customer.sql:238-324) — driver-boundary variant: Ray
    per-batch partials, O(entities × batches) driver combine, pandas merge
    onto the driver-held summary. Used below the entity gate; the scale path
    is ``customer_rollup_ds``.

    Reproduces the reference quirk (:321): org-header rows have NULL source
    ids, so their joined metrics are NULL and the rolled-up sums are 0."""
    out = summary_df.copy()
    for src, idc in _METRIC_IDS:
        table = metric_tables.get(f"{src}_metrics")
        if table is None:
            for c in METRIC_SUM_COLS[src]:
                out[c] = 0
            continue
        sum_cols = list(METRIC_SUM_COLS[src])
        if src == "zendesk":
            sum_cols.append("_csat_weighted")
        parts = (
            _metric_attached(src, idc, table, cid_ctx)
            .map_batches(
                _metric_partial_kernel(src, idc, tuple(sum_cols)),
                batch_format="pandas",
            )
            .to_pandas()
        )
        if parts.empty:
            for c in METRIC_SUM_COLS[src]:
                out[c] = 0
            continue
        out = out.merge(_metric_combine(src, sum_cols, parts), on="customer360_id", how="left")

    for src in METRIC_SUM_COLS:
        for c in METRIC_SUM_COLS[src]:
            if c in out.columns:
                # sum(coalesce(x,0)) semantics; header rows never join → 0
                out[c] = out[c].fillna(0)
    return out


def customer_rollup_ds(
    summary_d, metric_tables: dict, cid_ctx: CidContext, num_buckets: int | None = None
):
    """Distributed customer metrics rollup: per-batch partials → one bucketed
    groupby(customer360_id) combine per source → bucketed left joins onto the
    summary Dataset. No driver materialization at any size."""
    from ..stages.joins import bucketed_hash_join

    nb = num_buckets or DEFAULT_NUM_BUCKETS
    out = summary_d
    fill_zero: list[str] = []
    for src, idc in _METRIC_IDS:
        fill_zero += METRIC_SUM_COLS[src]
        table = metric_tables.get(f"{src}_metrics")
        if table is None:
            continue
        sum_cols = list(METRIC_SUM_COLS[src])
        if src == "zendesk":
            sum_cols.append("_csat_weighted")

        def combine(g: pd.DataFrame, _src=src, _sum=tuple(sum_cols)) -> pd.DataFrame:
            if g.empty:
                return g.iloc[0:0].drop(columns=["_b"], errors="ignore")
            return _metric_combine(_src, list(_sum), g.drop(columns=["_b"]))

        agg = (
            _metric_attached(src, idc, table, cid_ctx)
            .map_batches(
                _metric_partial_kernel(src, idc, tuple(sum_cols)),
                batch_format="pandas",
            )
            .map_batches(_bucket_on("customer360_id", nb), batch_format="pandas")
            .groupby("_b")
            .map_groups(combine, batch_format="pandas")
        )
        out = bucketed_hash_join(out, agg, on="customer360_id", how="left", num_buckets=nb)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        for c in fill_zero:
            if c in df.columns:
                df[c] = df[c].astype("float64").fillna(0)
        return df

    return out.map_batches(finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# analyses (consumption queries over the outputs — analyses_old/, SURVEY.md §3.3)
# ---------------------------------------------------------------------------


def analysis_email_campaign_list(res: dict[str, pd.DataFrame]) -> pd.DataFrame:
    """analyses_old/elan/email_campaign_list_360.sql:9-75: revenue buckets ×
    ticket counts → campaign segments with best email."""
    cust = res.get("customer", res["summary"]).copy()
    ind = cust[~cust["is_organization_header"]].copy()
    spend = ind.get("total_spend", pd.Series(0, index=ind.index)).fillna(0)
    ind["revenue_bucket"] = pd.cut(
        spend, bins=[-0.01, 0, 250, 1000, float("inf")],
        labels=["none", "low", "mid", "high"],
    ).astype(str)
    ind["has_open_tickets"] = ind.get(
        "count_open_tickets", pd.Series(0, index=ind.index)
    ).fillna(0) > 0
    out = ind[ind["best_email"].notna()][
        ["customer360_id", "best_email", "best_name", "revenue_bucket", "has_open_tickets"]
    ]
    return out.reset_index(drop=True)


def analysis_metrics_with_all_phones(res: dict[str, pd.DataFrame]) -> pd.DataFrame:
    """analyses_old/elan/metrics_with_all_phones_360.sql:13-135: customers
    reachable by any phone, with their metrics and every known phone."""
    phones = res["attr_phone"]
    if phones.empty:
        return pd.DataFrame(columns=["customer360_id", "phones", "best_name"])
    agg = (
        phones.sort_values(["customer360_id", "index"])
        .groupby("customer360_id")["value"]
        .apply(lambda v: ", ".join(dict.fromkeys(v)))  # distinct, rank order
        .rename("phones")
        .reset_index()
    )
    cust = res.get("customer", res["summary"])
    out = agg.merge(cust, on="customer360_id", how="left")
    keep = ["customer360_id", "phones", "best_name", "best_email"]
    keep += [c for c in ("total_spend", "count_tickets") if c in out.columns]
    return out[keep]


def _raw_sources(tables: dict[str, pd.DataFrame]):
    """Shared raw-lane prep for the *_raw analyses (reference
    email_campaign_list_raw.sql:11-36, metrics_with_all_phones_raw.sql:11-47):
    email-bearing rows per source, lower-cased email as the entity key,
    zendesk end-users joined to their org name, stripe org extracted with the
    reference's split_part(customer_name, ' (', 1) recipe."""
    mk = tables["marketo_leads"].copy()
    st = tables["stripe_customer_overview"].copy()
    zu = tables["zendesk_users"].copy()
    zo = tables["zendesk_organizations"]

    mk = mk[mk["email"].notna()].copy()
    mk["email_l"] = mk["email"].str.lower()
    mk["inferred_company"] = mk["inferred_company"].replace("", None)
    st = st[st["email"].notna()].copy()
    st["email_l"] = st["email"].str.lower()
    part = st["customer_name"].str.split(" (", regex=False).str[0]
    st["org_extract"] = part.where(part.notna() & (part != ""), st["customer_name"])
    zu = zu[(zu["role"] == "end-user") & zu["email"].notna()].copy()
    zu["email_l"] = zu["email"].str.lower()
    zu = zu.merge(
        zo[["organization_id", "name"]].rename(columns={"name": "org_name"}),
        on="organization_id",
        how="left",
    )
    return mk, st, zu


def _raw_entity_metrics(st, zu, tables):
    """Per-email raw metric attachment (the reference's zendesk_metrics /
    stripe_metrics CTEs re-keyed through raw ids)."""
    spend = (
        st[["customer_id", "email_l"]]
        .merge(tables["stripe_metrics"], on="customer_id")
        .groupby("email_l")["total_spend"]
        .sum()
    )
    zt = (
        zu[["user_id", "email_l"]]
        .merge(tables["zendesk_metrics"], on="user_id")
        .groupby("email_l")[["count_tickets", "count_open_tickets"]]
        .sum()
    )
    return spend, zt


_RAW_EPOCH = pd.Timestamp("1970-01-01")


def analysis_email_campaign_list_raw(tables: dict[str, pd.DataFrame]) -> pd.DataFrame:
    """Reference analyses_old/elan/email_campaign_list_raw.sql:11-210 — the
    RAW side of the reference's own conformance pair: entity = lower(email)
    via the email-only join (map_sources :37-71, no c360 matching), org-name
    survivorship over the unioned name lanes by (value_count desc, recency
    desc, is_inferred asc) (:73-160), metrics attached through raw per-source
    ids, then the SAME revenue bins / open-ticket flag as the _360 twin so
    the delta isolates what entity resolution adds. Determinism note: the
    reference's row_number() has no final tiebreak; organization_name ASC is
    added explicitly here AND in the oracle so both agree bit-for-bit."""
    mk, st, zu = _raw_sources(tables)

    def lane(df, org_col, seen_col, inferred):
        out = pd.DataFrame(
            {
                "email": df["email_l"],
                "organization_name": df[org_col],
                "last_seen": df[seen_col],
                "is_inferred": inferred,
            }
        )
        return out[
            out["organization_name"].notna() & (out["organization_name"] != "")
        ]

    lanes = pd.concat(
        [
            lane(mk, "company", "updated_timestamp", False),
            lane(mk, "inferred_company", "updated_timestamp", True),
            lane(st, "org_extract", "customer_created_at", False),
            lane(zu, "org_name", "updated_at", False),
        ],
        ignore_index=True,
    )
    if len(lanes):
        lanes["last_seen"] = pd.to_datetime(lanes["last_seen"]).fillna(_RAW_EPOCH)
        rank = (
            lanes.groupby(["email", "organization_name"], sort=False)
            .agg(
                value_count=("organization_name", "size"),
                value_last=("last_seen", "max"),
                inferred=("is_inferred", "min"),
            )
            .reset_index()
            .sort_values(
                ["email", "value_count", "value_last", "inferred", "organization_name"],
                ascending=[True, False, False, True, True],
                kind="stable",
            )
        )
        pick = rank.drop_duplicates("email")[["email", "organization_name"]]
    else:
        pick = pd.DataFrame(columns=["email", "organization_name"])

    emails = pd.Index(
        sorted(set(mk["email_l"]) | set(st["email_l"]) | set(zu["email_l"])),
        name="email",
    )
    spend, zt = _raw_entity_metrics(st, zu, tables)
    out = pd.DataFrame(index=emails).reset_index()
    out = out.merge(pick, on="email", how="left")
    out["total_spend"] = out["email"].map(spend).fillna(0.0)
    out["revenue_bucket"] = pd.cut(
        out["total_spend"],
        bins=[-0.01, 0, 250, 1000, float("inf")],
        labels=["none", "low", "mid", "high"],
    ).astype(str)
    out["has_open_tickets"] = (
        out["email"].map(zt["count_open_tickets"]).fillna(0) > 0
    )
    return out[
        ["email", "organization_name", "revenue_bucket", "has_open_tickets"]
    ].reset_index(drop=True)


def analysis_email_campaign_raw_delta(
    res: dict[str, pd.DataFrame], tables: dict[str, pd.DataFrame]
) -> pd.DataFrame:
    """The reference's conformance-check pattern (email_campaign_list_raw.sql
    vs _360.sql compared by hand): raw-source answer ⟗ customer360 answer by
    email — which entities only one side found, and whether the revenue
    bucket agrees where both did. The 360 side dedups shared best_emails by
    min customer360_id (deterministic)."""
    raw = analysis_email_campaign_list_raw(tables).rename(
        columns={"revenue_bucket": "raw_bucket",
                 "has_open_tickets": "raw_has_open_tickets"}
    )
    c360 = analysis_email_campaign_list(res)
    c360 = (
        c360.sort_values(["best_email", "customer360_id"], kind="stable")
        .drop_duplicates("best_email")
        .rename(
            columns={
                "best_email": "email",
                "revenue_bucket": "c360_bucket",
                "has_open_tickets": "c360_has_open_tickets",
            }
        )[["email", "c360_bucket", "c360_has_open_tickets"]]
    )
    out = raw[["email", "raw_bucket", "raw_has_open_tickets"]].merge(
        c360, on="email", how="outer", indicator=True
    )
    out["status"] = (
        out["_merge"]
        .map({"left_only": "raw_only", "right_only": "c360_only", "both": "both"})
        .astype(str)
    )
    both = out["_merge"] == "both"
    # object dtype with True/False/None: what DuckDB's nullable BOOLEAN
    # round-trips to in pandas, so engine and oracle hash identically
    out["bucket_match"] = np.array(
        [
            (a == b) if m else None
            for a, b, m in zip(out["raw_bucket"], out["c360_bucket"], both)
        ],
        dtype=object,
    )
    return (
        out.drop(columns="_merge")
        .sort_values("email", kind="stable")
        .reset_index(drop=True)
    )


_RAW_PHONE_LANES = [
    ("marketo_leads", "phone", 0),
    ("marketo_leads", "main_phone", 1),
    ("marketo_leads", "mobile_phone", 2),
    ("stripe_customer_overview", "phone", 3),
    ("stripe_customer_overview", "shipping_phone", 4),
    ("zendesk_users", "phone", 5),
]


def analysis_metrics_with_all_phones_raw(tables: dict[str, pd.DataFrame]) -> pd.DataFrame:
    """Reference analyses_old/elan/metrics_with_all_phones_raw.sql:11-573 —
    every RAW phone string per email entity (UNNORMALIZED, exactly as stored:
    the '(555) 123', '555.123 ext 7' and bare-digit spellings stay distinct —
    that formatting blindness versus the _360 twin's normalized best/all
    phones is the conformance content), with the raw-id-keyed metrics. Phone
    order: first source lane that carried the value, then value ASC — stated
    explicitly (reference leaves aggregation order undefined) so engine and
    oracle agree."""
    mk, st, zu = _raw_sources(tables)
    src = {"marketo_leads": mk, "stripe_customer_overview": st, "zendesk_users": zu}
    lanes = []
    for tname, col, lane_idx in _RAW_PHONE_LANES:
        df = src[tname]
        vals = pd.DataFrame(
            {"email": df["email_l"], "value": df[col], "lane": lane_idx}
        )
        lanes.append(vals[vals["value"].notna() & (vals["value"] != "")])
    ph = pd.concat(lanes, ignore_index=True)
    if not len(ph):
        return pd.DataFrame(
            columns=["email", "phones", "total_spend", "count_tickets"]
        )
    first = (
        ph.groupby(["email", "value"], sort=False)["lane"].min().reset_index()
    )
    agg = (
        first.sort_values(["email", "lane", "value"], kind="stable")
        .groupby("email", sort=True)["value"]
        .agg(", ".join)
        .rename("phones")
        .reset_index()
    )
    spend, zt = _raw_entity_metrics(st, zu, tables)
    agg["total_spend"] = agg["email"].map(spend)
    agg["count_tickets"] = (
        agg["email"].map(zt["count_tickets"]).fillna(0).astype(np.int64)
    )
    return agg.reset_index(drop=True)


def analysis_all_phones_raw_delta(
    res: dict[str, pd.DataFrame], tables: dict[str, pd.DataFrame]
) -> pd.DataFrame:
    """Conformance delta for the phones pair: per email, how many distinct
    phone spellings the raw side carries vs how many normalized numbers the
    customer360 side resolved (n_phones counts the ', '-joined lists), plus
    which side found the entity at all. 360 rows without a best_email cannot
    key by email and are excluded (stated; the raw side has no such rows by
    construction)."""
    raw = analysis_metrics_with_all_phones_raw(tables)
    c360 = analysis_metrics_with_all_phones(res)
    c360 = c360[c360["best_email"].notna()]
    c360 = (
        c360.sort_values(["best_email", "customer360_id"], kind="stable")
        .drop_duplicates("best_email")
        .rename(columns={"best_email": "email", "phones": "c360_phones"})
    )
    out = raw[["email", "phones"]].rename(columns={"phones": "raw_phones"}).merge(
        c360[["email", "c360_phones"]], on="email", how="outer", indicator=True
    )
    out["status"] = (
        out["_merge"]
        .map({"left_only": "raw_only", "right_only": "c360_only", "both": "both"})
        .astype(str)
    )

    def n_of(s):
        return pd.array(
            [len(v.split(", ")) if isinstance(v, str) else None for v in s],
            dtype="Int64",
        )

    out["raw_n_phones"] = n_of(out["raw_phones"])
    out["c360_n_phones"] = n_of(out["c360_phones"])
    return (
        out.drop(columns="_merge")
        .sort_values("email", kind="stable")
        .reset_index(drop=True)
    )


def analysis_monthly_metrics_raw(tables: dict[str, pd.DataFrame]) -> pd.DataFrame:
    """Reference analyses_old/drafts/monthly_metrics_raw.sql:1-240 — the raw
    side of the monthly-metrics pair: entity = lower(email) via the raw
    email-only join (join_sources CTE :11-57), first-seen month = the MIN
    created timestamp across that email's source rows, month spine ×
    new-entity counts (the same spine recipe as the customer360 twin, so the
    delta isolates entity resolution)."""
    mk, st, zu = _raw_sources(tables)
    created = pd.concat(
        [
            pd.DataFrame({"email": mk["email_l"], "created_at": mk["created_timestamp"]}),
            pd.DataFrame({"email": st["email_l"], "created_at": st["customer_created_at"]}),
            pd.DataFrame({"email": zu["email_l"], "created_at": zu["created_at"]}),
        ],
        ignore_index=True,
    ).dropna()
    if not len(created):
        return pd.DataFrame(columns=["month", "new_customers"])
    first = pd.to_datetime(created.groupby("email")["created_at"].min())
    spine = date_spine(first.min().floor("d").replace(day=1), first.max())
    months = first.dt.to_period("M").dt.to_timestamp()
    counts = months.value_counts().rename("new_customers")
    out = spine.merge(
        counts.rename_axis("month").reset_index(), on="month", how="left"
    )
    out["new_customers"] = out["new_customers"].fillna(0).astype(int)
    return out


def analysis_monthly_metrics_raw_delta(
    res: dict[str, pd.DataFrame], tables: dict[str, pd.DataFrame]
) -> pd.DataFrame:
    """Conformance delta for the monthly pair: per month, raw email-entity
    new-customer counts vs customer360 new-customer counts (full outer on
    month; the count GAP is the double-counting the raw email join cannot
    resolve — one person with distinct billing emails is several raw
    entities, one c360 customer)."""
    raw = analysis_monthly_metrics_raw(tables).rename(
        columns={"new_customers": "raw_new_customers"}
    )
    c360 = analysis_monthly_metrics(res).rename(
        columns={"new_customers": "c360_new_customers"}
    )
    out = raw.merge(c360, on="month", how="outer")
    for c in ("raw_new_customers", "c360_new_customers"):
        out[c] = out[c].fillna(0).astype(np.int64)
    out["count_gap"] = (
        out["raw_new_customers"] - out["c360_new_customers"]
    ).astype(np.int64)
    return out.sort_values("month", kind="stable").reset_index(drop=True)


def date_spine(start, end, freq: str = "MS") -> pd.DataFrame:
    """dbt_utils.date_spine equivalent (analyses_old/drafts/
    monthly_metrics_customer360.sql:3-8)."""
    return pd.DataFrame({"month": pd.date_range(start, end, freq=freq)})


def analysis_monthly_metrics(res: dict[str, pd.DataFrame]) -> pd.DataFrame:
    """monthly_metrics_customer360.sql:1-56: month spine × new-customer counts
    (date_trunc on created_at)."""
    ind = res["mapping"][~res["mapping"]["is_organization_header"]]
    created = pd.to_datetime(ind["created_at"]).dropna()
    if created.empty:
        return pd.DataFrame(columns=["month", "new_customers"])
    spine = date_spine(created.min().floor("d").replace(day=1), created.max())
    months = created.dt.to_period("M").dt.to_timestamp()
    counts = months.value_counts().rename("new_customers")
    out = spine.merge(
        counts.rename_axis("month").reset_index(), on="month", how="left"
    )
    out["new_customers"] = out["new_customers"].fillna(0).astype(int)
    return out


# ---------------------------------------------------------------------------
# end-to-end DAG
# ---------------------------------------------------------------------------


def _boundary_pandas(ds) -> pd.DataFrame:
    """THE pandas conversion site: Dataset → driver pandas, used only at the
    driver-gate/test boundary (output='pandas'). Nullable int64 columns come
    back as pandas Int64 (matching the pre-Dataset-native dtypes)."""
    df = ds.to_pandas()
    for c in ("lead_id", "user_id", "z_org_id"):
        if c in df.columns:
            df[c] = _as_int64(df[c])
    return df


def run_customer360(
    tables: dict,
    config: PipelineConfig | None = None,
    output: str = "pandas",
    cid_broadcast_threshold: int = 2_000_000,
    num_buckets: int | None = None,
) -> dict:
    """End-to-end DAG: clean (Ray actor pools) → match (Ray bucketed joins +
    vectorized confirm) → map (Ray fragment groupbys, spine minted in-task) →
    attributes (Ray unpivot + cid attach + distributed rank) → summary.

    Inputs may be pa.Tables, Datasets or parquet paths (``_as_dataset``) — the
    engine analogue of the reference reading warehouse tables. Internally the
    DAG is Dataset-in/Dataset-out: no O(input-rows) or O(entities) table lands
    on the driver; the only driver-held state is the matched-pair tables and
    the pos_maps broadcast (O(matches) — the designed small side).

    output='datasets' returns the outputs as streaming Datasets (write them
    with write_parquet). output='pandas' (default) converts every output at
    THIS boundary for the driver correctness gate and tests; below the cid
    broadcast gate the summary/customer star joins run on those already-
    collected frames, above it the distributed join path runs first.
    Shuffle bucket counts scale with input size (``_adaptive_buckets``)."""
    import ray.data

    if output not in ("pandas", "datasets"):
        raise ValueError(f"unknown output mode {output!r}")
    cfg = config or PipelineConfig()
    cleaned = clean_sources(tables, cfg)
    total_rows = sum(ds.count() for ds in cleaned.values())
    nb = num_buckets or _adaptive_buckets(total_rows)
    matches = source_matches(cleaned, cfg)
    mapping_ds = build_mapping(matches, cleaned, cfg, num_buckets=nb).materialize()
    cid_ctx = CidContext(mapping_ds, nb, cid_broadcast_threshold)
    # materialized: every attr Dataset has (at least) two consumers — the
    # summary star join and the caller's own collect/write — and a lazy
    # Dataset would re-execute its whole unpivot+rank pipeline per consumer
    attrs = {
        attr: attribute_table(attr, cid_ctx, cleaned, cfg, num_buckets=nb).materialize()
        for attr in ATTRIBUTE_SPECS
    }
    attrs["address"] = address_attribute(
        cid_ctx, cleaned, cfg, num_buckets=nb
    ).materialize()
    ip_ds = ip_address_table(cid_ctx, cleaned, cfg)
    status_ds = status_table(cid_ctx, cleaned, cfg)
    updates_ds = updates_table(cid_ctx, cleaned, cfg)
    has_metrics = any(k.endswith("_metrics") for k in tables)

    if output == "datasets":
        summary_d = summary_ds(mapping_ds, attrs, num_buckets=nb).materialize()
        out = {
            "mapping": mapping_ds, "summary": summary_d, "matches": matches,
            "ip_address": ip_ds, "status": status_ds, "updates": updates_ds,
        }
        out.update({f"attr_{k}": v for k, v in attrs.items()})
        for src in ("marketo", "stripe", "zendesk"):
            out[f"cleaned_{src}"] = (
                cleaned[src]
                if src in cleaned
                else ray.data.from_pandas(_empty_cleaned(src, cfg))
            )
        if has_metrics:
            out["customer"] = customer_rollup_ds(summary_d, tables, cid_ctx, nb)
        return out

    # pandas boundary (driver gate / tests): one conversion site
    mapping = _boundary_pandas(mapping_ds)
    attrs_df = {k: _boundary_pandas(v) for k, v in attrs.items()}
    out = {
        "mapping": mapping,
        "matches": matches,
        "ip_address": _boundary_pandas(ip_ds),
        "status": _boundary_pandas(status_ds),
        "updates": _boundary_pandas(updates_ds),
        **{f"attr_{k}": v for k, v in attrs_df.items()},
    }
    if cid_ctx.broadcast:
        summary_df = summary(mapping, attrs_df)
        if has_metrics:
            out["customer"] = customer_rollup(summary_df, tables, cid_ctx)
    else:
        summary_d = summary_ds(mapping_ds, attrs, num_buckets=nb).materialize()
        summary_df = _boundary_pandas(summary_d)
        if has_metrics:
            out["customer"] = _boundary_pandas(
                customer_rollup_ds(summary_d, tables, cid_ctx, nb)
            )
    out["summary"] = summary_df
    for src in ("marketo", "stripe", "zendesk"):
        out[f"cleaned_{src}"] = (
            cleaned[src].to_pandas() if src in cleaned else _empty_cleaned(src, cfg)
        )
    return out
