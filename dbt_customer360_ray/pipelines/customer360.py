"""customer360 identity-resolution pipeline — the reference's full DAG
(SURVEY.md §3.2 stages 2-8) re-expressed Ray-Data-first.

Stage map (reference file → here):
- cleaning (models/cleaning/int_customer360__{marketo,stripe,zendesk}.sql)
    → ``CleanMarketo/CleanStripe/CleanZendesk`` actor-pool map_batches stages
      (regex/seed state compiled once per actor; vectorized pandas kernels)
- match prep (identity_resolution/prep/*_for_matching.sql)
    → ``match_candidates`` filter + ``match_keys`` blocking-key projection
- pairwise matching (int_customer360__source_matches.sql:56-117)
    → ONE hash equi-join per source pair on a unified blocking key column
      ('email:<v>' / 'phone:<v>' / 'addr_cs:<line|city|state>' /
      'addr_zc:<line|zip|country>'), the decomposition SURVEY.md §2.4 maps the
      reference's OR-join to — never a theta join
- fuzzy confirmation (source_matches.sql:133-153 + macros/levenshtein_distance.sql)
    → ``FuzzyConfirm`` actor: exact email OR Levenshtein-similarity ≥ .95 over
      all name×name combos (null→'aaa'/'bbb' sentinels so null never matches)
- 3-way consolidation (source_matches.sql:319-354) → pandas full-outer merges
  + groupby max on the (small) pair tables; the 100 TB path is the same
  groupby hash-partitioned
- mapping (output/customer360__mapping.sql) → md5 surrogate keys
  (dbt_utils recipe), org-header aggregate rows, JSON source_ids strings
- attribute tables (output/customer360__{email,phone,name,...}.sql)
    → unpivot unions + per-entity ``map_groups`` confidence ranking
      (value_count desc, recency desc — README.md:48 'recency and frequency')
- summary (output/customer360__summary.sql) → index=1 star join
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.levenshtein import any_name_similar
from ..hashing import surrogate_key
from ..stages import normalize as N

# ---------------------------------------------------------------------------
# cleaning
# ---------------------------------------------------------------------------


def _coalesce_ts(updated: pd.Series, created: pd.Series) -> pd.Series:
    return updated.fillna(created)


class CleanMarketo(N.Cleaner):
    """int_customer360__marketo.sql:108-475 (standardize→tokenize→restandardize
    →add_nicknames→final) as one vectorized batch fn."""

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
        return out


class CleanStripe(N.Cleaner):
    """int_customer360__stripe.sql:67-550; 'Org (Person)' combined-name parse
    per the stripe extractor hooks (README.md:125-133)."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"customer_id": df["customer_id"]})
        out["email"] = N.normalize_email(df["email"])
        out["email_local"], out["email_domain"] = N.email_local_domain(df["email"])

        name = df["customer_name"].astype(object)
        has_paren = name.str.contains(r"\(", na=False)
        person = name.str.extract(r"\(([^)]*)\)", expand=False).where(has_paren, name)
        org_raw = name.str.replace(r"\s*\(.*\)\s*", "", regex=True).where(has_paren)

        person_nt, _title = N.strip_title(person, self.title_re)
        person_ns, out["name_suffix"] = N.strip_name_suffix(person_nt, self.name_suffix_re)
        out["first_name"], out["last_name"] = N.split_first_last(person_ns)
        out["full_name"] = N.recombine_name(out["first_name"], out["last_name"])
        out["possible_alt_first_names"] = N.add_nicknames(out["first_name"], self.nicknames)
        out["organization"], out["organization_suffix"] = N.strip_org_suffix(
            org_raw, self.org_suffix_re
        )
        out["shipping_name"] = N.empty_to_null(df["shipping_name"])

        out["phone"], out["phone_ext"] = N.normalize_phone(df["phone"])
        out["shipping_phone"], out["shipping_phone_ext"] = N.normalize_phone(df["shipping_phone"])

        out["address_line_1"] = N.expand_street_suffixes(
            N.trim_chars(df["customer_address_line_1"]), self.street_re
        )
        out["address_line_2"] = N.empty_to_null(df["customer_address_line_2"])
        out["city"] = N.empty_to_null(df["customer_address_city"].str.strip())
        sc, sl, cc, cl = N.disambiguate_state_country(
            df["customer_address_state"], df["customer_address_country"]
        )
        out["country_code"] = N.resolve_country(cc, cl, self.countries)
        out["state_code"] = N.resolve_state(sc, sl, out["country_code"], self.states)
        out["postal_code"] = N.normalize_postal(df["customer_address_postal_code"])
        out["is_delinquent"] = df["is_delinquent"]
        out["is_deleted"] = df["is_deleted"]
        out["updated_at"] = pd.Series([pd.NaT] * len(df))  # stripe has no updated ts
        out["created_at"] = df["customer_created_at"]      # (int_customer360__stripe.sql:127)
        return out


class CleanZendesk(N.Cleaner):
    """int_customer360__zendesk.sql:79-369; users filtered to role='end-user'
    (:39) and left-joined to organizations (:116-118) via a broadcast dict."""

    def __init__(self, org_lookup: dict[int, str]):
        super().__init__()
        self.org_lookup = org_lookup

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
        return out


def clean_sources(tables: dict[str, pa.Table], concurrency: int = 2) -> dict:
    """dict of raw Arrow tables → dict of cleaned Datasets (actor pools)."""
    import ray.data

    orgs = tables["zendesk_organizations"].to_pandas()
    org_lookup = dict(zip(orgs["organization_id"], orgs["name"]))
    return {
        "marketo": ray.data.from_arrow(tables["marketo_leads"]).map_batches(
            CleanMarketo, batch_format="pandas", concurrency=concurrency
        ),
        "stripe": ray.data.from_arrow(tables["stripe_customer_overview"]).map_batches(
            CleanStripe, batch_format="pandas", concurrency=concurrency
        ),
        "zendesk": ray.data.from_arrow(tables["zendesk_users"]).map_batches(
            CleanZendesk,
            fn_constructor_kwargs={"org_lookup": org_lookup},
            batch_format="pandas",
            concurrency=concurrency,
        ),
    }


# ---------------------------------------------------------------------------
# match prep: candidate filter + blocking keys
# ---------------------------------------------------------------------------

PHONE_COLS = {
    "marketo": ["phone", "main_phone", "mobile_phone"],
    "stripe": ["phone", "shipping_phone"],
    "zendesk": ["phone"],
}
ID_COLS = {"marketo": "lead_id", "stripe": "customer_id", "zendesk": "user_id"}

# canonical cleaned-output columns per source, used to rebuild schema for empty
# sources (a disabled source — the reference's customer360__using_* vars — must
# flow through as zero rows, not a missing-column crash)
CLEANED_COLUMNS = {
    "marketo": [
        "lead_id", "email", "email_local", "email_domain", "first_name",
        "first_name_title", "last_name", "name_suffix", "full_name",
        "possible_alt_first_names", "company", "company_suffix", "phone",
        "phone_ext", "main_phone", "main_phone_ext", "mobile_phone",
        "mobile_phone_ext", "address_line_1", "address_line_2", "city",
        "country_code", "state_code", "postal_code", "anonymous_ip", "ip_type",
        "is_unsubscribed", "is_email_invalid", "do_not_call", "updated_at",
        "created_at",
    ],
    "stripe": [
        "customer_id", "email", "email_local", "email_domain", "name_suffix",
        "first_name", "last_name", "full_name", "possible_alt_first_names",
        "organization", "organization_suffix", "shipping_name", "phone",
        "phone_ext", "shipping_phone", "shipping_phone_ext", "address_line_1",
        "address_line_2", "city", "country_code", "state_code", "postal_code",
        "is_delinquent", "is_deleted", "updated_at", "created_at",
    ],
    "zendesk": [
        "user_id", "organization_id", "email", "email_local", "email_domain",
        "name_suffix", "first_name", "last_name", "full_name",
        "possible_alt_first_names", "organization", "organization_suffix",
        "phone", "phone_ext", "is_active", "is_suspended", "updated_at",
        "created_at",
    ],
}


def _conform_cleaned(df: pd.DataFrame, source: str) -> pd.DataFrame:
    """Backfill the canonical cleaned schema (empty/partial frames)."""
    for c in CLEANED_COLUMNS[source]:
        if c not in df.columns:
            df[c] = pd.Series([None] * len(df), dtype=object)
    return df[CLEANED_COLUMNS[source]]


def match_candidates(df: pd.DataFrame, source: str) -> pd.DataFrame:
    """prep/int_customer360__*_for_matching.sql:42-70: keep rows usable for
    identity joins — (name OR email) AND (email OR any phone OR (address line
    AND (city+state OR zip+country)))."""
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


def match_keys(df: pd.DataFrame, source: str) -> pd.DataFrame:
    """Unified blocking-key projection: one (id, key) row per usable join key.

    Nulls are simply not emitted — the equi-join equivalent of the reference's
    null-sentinel encoding (SURVEY.md §2.2): equality on null must fail."""
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
    if not frames:
        return pd.DataFrame({sid: pd.Series(dtype=df[sid].dtype), "key": pd.Series(dtype=object)})
    return pd.concat(frames, ignore_index=True).drop_duplicates()


# ---------------------------------------------------------------------------
# pairwise matching + fuzzy confirmation
# ---------------------------------------------------------------------------


def _name_set(row: pd.Series) -> list:
    names = [row.get("full_name"), row.get("first_name"), row.get("last_name")]
    alts = row.get("possible_alt_first_names")
    if isinstance(alts, str):
        last = row.get("last_name") or ""
        names += [f"{a} {last}".strip() for a in alts.split(", ")]
    return [n for n in names if isinstance(n, str)]


def _pair_candidates(keys_a: pd.DataFrame, keys_b: pd.DataFrame, id_a: str, id_b: str) -> pd.DataFrame:
    """Hash equi-join on the blocking key, then pair-dedup. (Executed with
    pandas merge per bucket at demo scale; Dataset.join(num_partitions=P) is
    the drop-in at 100 TB — same key.)"""
    pairs = keys_a.merge(keys_b, on="key")[[id_a, id_b]].drop_duplicates()
    return pairs.reset_index(drop=True)


def _confirm_pairs(
    pairs: pd.DataFrame,
    side_a: pd.DataFrame,
    side_b: pd.DataFrame,
    id_a: str,
    id_b: str,
    threshold: float = 0.95,
) -> pd.DataFrame:
    """source_matches.sql:133-153: keep pair iff exact email match OR any
    name×name Levenshtein similarity ≥ threshold."""
    if pairs.empty:
        return pairs
    a = side_a.set_index(id_a)
    b = side_b.set_index(id_b)
    keep = []
    for row in pairs.itertuples(index=False):
        ra, rb = a.loc[getattr(row, id_a)], b.loc[getattr(row, id_b)]
        if isinstance(ra, pd.DataFrame):
            ra = ra.iloc[0]
        if isinstance(rb, pd.DataFrame):
            rb = rb.iloc[0]
        ea, eb = ra.get("email"), rb.get("email")
        if isinstance(ea, str) and ea == eb:
            keep.append(True)
            continue
        keep.append(any_name_similar(_name_set(ra), _name_set(rb), threshold))
    return pairs[pd.Series(keep, index=pairs.index)].reset_index(drop=True)


def source_matches(cleaned_dfs: dict[str, pd.DataFrame], threshold: float = 0.95) -> pd.DataFrame:
    """Pairwise blocking joins + fuzzy confirm + 3-way consolidation
    (int_customer360__source_matches.sql). Returns one row per matched entity
    tuple: (lead_id, customer_id, user_id, updated_at, created_at)."""
    m = match_candidates(cleaned_dfs["marketo"], "marketo")
    s = match_candidates(cleaned_dfs["stripe"], "stripe")
    z = match_candidates(cleaned_dfs["zendesk"], "zendesk")
    mk, sk, zk = match_keys(m, "marketo"), match_keys(s, "stripe"), match_keys(z, "zendesk")
    # marketo×stripe uses every arm; m×z drops address arms; s×z email+phone
    # (source_matches.sql:56-117,184-199,266-282)
    zk_np = zk[~zk["key"].str.startswith("addr")]
    sk_np = sk[~sk["key"].str.startswith("addr")]
    ms = _confirm_pairs(
        _pair_candidates(mk, sk, "lead_id", "customer_id"), m, s, "lead_id", "customer_id", threshold
    )
    mz = _confirm_pairs(
        _pair_candidates(mk[~mk["key"].str.startswith("addr")], zk_np, "lead_id", "user_id"),
        m, z, "lead_id", "user_id", threshold,
    )
    sz = _confirm_pairs(
        _pair_candidates(sk_np, zk_np, "customer_id", "user_id"), s, z, "customer_id", "user_id", threshold
    )

    # 3-way consolidation (source_matches.sql:319-354): full outer joins on the
    # shared ids, then group by the id triple with max timestamps
    tri = ms.merge(mz, on="lead_id", how="outer")
    tri = tri.merge(sz, on="customer_id", how="outer", suffixes=("", "_sz"))
    if "user_id_sz" in tri:
        tri["user_id"] = tri["user_id"].fillna(tri["user_id_sz"])
        tri = tri.drop(columns=["user_id_sz"])
    tri = tri.drop_duplicates(["lead_id", "customer_id", "user_id"]).reset_index(drop=True)

    ts = {}
    for src, df, idc in (("marketo", cleaned_dfs["marketo"], "lead_id"),
                         ("stripe", cleaned_dfs["stripe"], "customer_id"),
                         ("zendesk", cleaned_dfs["zendesk"], "user_id")):
        t = df.set_index(idc)
        ts[src] = (
            _coalesce_ts(t["updated_at"], t["created_at"]),
            t["created_at"],
        )
    upd = []
    for row in tri.itertuples(index=False):
        us = [ts["marketo"][0].get(row.lead_id), ts["stripe"][0].get(row.customer_id),
              ts["zendesk"][0].get(row.user_id)]
        cs = [ts["marketo"][1].get(row.lead_id), ts["stripe"][1].get(row.customer_id),
              ts["zendesk"][1].get(row.user_id)]
        us = [u for u in us if pd.notna(u)]
        cs = [c for c in cs if pd.notna(c)]
        upd.append((max(us) if us else pd.NaT, min(cs) if cs else pd.NaT))
    tri["updated_at"] = [u for u, _ in upd]
    tri["created_at"] = [c for _, c in upd]
    return tri


# ---------------------------------------------------------------------------
# mapping: golden-record spine (customer360__mapping.sql)
# ---------------------------------------------------------------------------


def build_mapping(matches: pd.DataFrame, cleaned_dfs: dict[str, pd.DataFrame]) -> pd.DataFrame:
    """Full-outer join matches with every cleaned source (keeps never-matched
    rows, :83-100), mint customer360_organization_id (:107) and customer360_id
    (:205), append org-header rows (:147-199), build JSON source_ids
    (:122-126,169-179)."""
    spine = matches.copy()
    for src, idc in (("marketo", "lead_id"), ("stripe", "customer_id"), ("zendesk", "user_id")):
        all_ids = cleaned_dfs[src][[idc, "updated_at", "created_at"]].copy()
        unmatched = all_ids[~all_ids[idc].isin(spine[idc].dropna())]
        if len(unmatched):
            add = pd.DataFrame({idc: unmatched[idc]})
            add["updated_at"] = _coalesce_ts(unmatched["updated_at"], unmatched["created_at"]).values
            add["created_at"] = unmatched["created_at"].values
            spine = pd.concat([spine, add], ignore_index=True)

    # organization name per row: first non-null of marketo company / stripe org / zendesk org
    org_by = {
        "marketo": cleaned_dfs["marketo"].set_index("lead_id")["company"],
        "stripe": cleaned_dfs["stripe"].set_index("customer_id")["organization"],
        "zendesk": cleaned_dfs["zendesk"].set_index("user_id")["organization"],
    }
    orgs = []
    for row in spine.itertuples(index=False):
        v = None
        for src, idc in (("marketo", "lead_id"), ("stripe", "customer_id"), ("zendesk", "user_id")):
            i = getattr(row, idc)
            if pd.notna(i):
                cand = org_by[src].get(i)
                if isinstance(cand, str):
                    v = cand
                    break
        orgs.append(v)
    spine["organization_name"] = orgs
    spine["is_organization_header"] = False

    spine["customer360_organization_id"] = pd.Series(
        surrogate_key(spine["organization_name"]).to_pylist(), index=spine.index
    ).where(spine["organization_name"].notna())

    def _render_id(v):
        if pd.isna(v):
            return None
        if isinstance(v, float) and v.is_integer():
            return str(int(v))
        return str(v)

    spine["source_ids"] = [
        json.dumps(
            {
                "marketo": _render_id(r.lead_id),
                "stripe": _render_id(r.customer_id),
                "zendesk": _render_id(r.user_id),
            },
            separators=(",", ":"),
        )
        for r in spine.itertuples(index=False)
    ]

    # org-header aggregate rows (:147-199): per org, JSON arrays of member ids
    # (string_agg distinct — order pinned to sorted, SURVEY.md §2.5 caveat)
    headers = []
    for org_id, grp in spine[spine["customer360_organization_id"].notna()].groupby(
        "customer360_organization_id"
    ):
        def _agg(col):
            vals = sorted({ _render_id(v) for v in grp[col] if pd.notna(v) })
            return json.dumps(vals, separators=(",", ":"))

        headers.append(
            {
                "lead_id": None,
                "customer_id": None,
                "user_id": None,
                "updated_at": grp["updated_at"].max(),
                "created_at": grp["created_at"].min(),
                "organization_name": grp["organization_name"].iloc[0],
                "is_organization_header": True,
                "customer360_organization_id": org_id,
                "source_ids": json.dumps(
                    {
                        "marketo": _agg("lead_id"),
                        "stripe": _agg("customer_id"),
                        "zendesk": _agg("user_id"),
                    },
                    separators=(",", ":"),
                ),
            }
        )
    if headers:
        spine = pd.concat([spine, pd.DataFrame(headers)], ignore_index=True)

    spine["customer360_id"] = surrogate_key(
        spine["lead_id"],
        spine["customer_id"],
        spine["user_id"],
        spine["is_organization_header"],
        spine["customer360_organization_id"],
    ).to_pylist()
    return spine


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
        ("stripe", "organization", "primary"),
        ("zendesk", "organization", "primary"),
    ],
}

PLACEHOLDER_NAMES = {"permanently deleted", "placeholder contact", "not available"}


def attribute_table(
    attr: str, mapping: pd.DataFrame, cleaned_dfs: dict[str, pd.DataFrame]
) -> pd.DataFrame:
    """Unpivot per-source values (UNION ALL, customer360__phone.sql:29-95),
    join to the spine on source ids (inner — org headers have null source ids
    and are correctly excluded, SURVEY.md §2.4), then the windowed confidence
    rank: count(*)/max(ts) over (customer360_id, value) → dense_rank +
    row_number (customer360__email.sql:95-110)."""
    id_to_c360 = {}
    individual = mapping[~mapping["is_organization_header"]]
    for src, idc in (("marketo", "lead_id"), ("stripe", "customer_id"), ("zendesk", "user_id")):
        for i, cid in zip(individual[idc], individual["customer360_id"]):
            if pd.notna(i):
                id_to_c360[(src, i)] = cid

    rows = []
    for src, col, type_label in ATTRIBUTE_SPECS[attr]:
        df = cleaned_dfs[src]
        if col not in df:
            continue
        sid = ID_COLS[src]
        sub = df[df[col].notna()][[sid, col, "updated_at", "created_at"]]
        for r in sub.itertuples(index=False):
            cid = id_to_c360.get((src, getattr(r, sid)))
            if cid is None:
                continue
            rows.append(
                {
                    "customer360_id": cid,
                    "value": getattr(r, col),
                    "type": type_label,
                    "source": src,
                    "last_updated": r.updated_at if pd.notna(r.updated_at) else r.created_at,
                }
            )
    if not rows:
        return pd.DataFrame(
            columns=["customer360_id", "value", "type", "source", "value_count",
                     "last_updated", "confidence_rank", "index"]
        )
    long = pd.DataFrame(rows)

    # windowed counts + recency per (entity, value)
    grp = long.groupby(["customer360_id", "value"])
    long["value_count"] = grp["value"].transform("size")
    long["last_updated"] = grp["last_updated"].transform("max")

    epoch = pd.Timestamp("1970-01-01")
    long["_ts"] = long["last_updated"].fillna(epoch)
    if attr == "name":
        long["_placeholder"] = long["value"].str.lower().isin(PLACEHOLDER_NAMES)
    else:
        long["_placeholder"] = False

    long = long.sort_values(
        ["customer360_id", "_placeholder", "value_count", "_ts", "value", "source", "type"],
        ascending=[True, True, False, False, True, True, True],
        kind="stable",
    ).reset_index(drop=True)
    long["index"] = long.groupby("customer360_id").cumcount() + 1
    # dense confidence rank over (placeholder, count, ts) triples
    key = list(zip(long["customer360_id"], long["_placeholder"], long["value_count"], long["_ts"]))
    ranks, cur_ent, cur_key, r = [], None, None, 0
    for ent, k in zip(long["customer360_id"], key):
        if ent != cur_ent:
            cur_ent, cur_key, r = ent, k, 1
        elif k != cur_key:
            cur_key = k
            r += 1
        ranks.append(r)
    long["confidence_rank"] = ranks
    return long.drop(columns=["_ts", "_placeholder"])


DEMOTED_TYPES = {"inferred"}  # ranked last (customer360__address.sql:211-212)


def _id_to_c360(mapping: pd.DataFrame) -> dict:
    out = {}
    individual = mapping[~mapping["is_organization_header"]]
    for src, idc in (("marketo", "lead_id"), ("stripe", "customer_id"), ("zendesk", "user_id")):
        for i, cid in zip(individual[idc], individual["customer360_id"]):
            if pd.notna(i):
                out[(src, i)] = cid
    return out


def address_attribute(mapping: pd.DataFrame, cleaned_dfs: dict[str, pd.DataFrame]) -> pd.DataFrame:
    """customer360__address.sql:24-116,140-212: unpivot per-source address rows
    (line_1/line_2/city/state/zip/country + type), rank per entity by
    (non-inferred first, frequency, recency) on the line_1 value."""
    lk = _id_to_c360(mapping)
    rows = []
    specs = [("marketo", "primary"), ("stripe", "customer")]
    for src, type_label in specs:
        df = cleaned_dfs[src]
        if "address_line_1" not in df:
            continue
        sid = ID_COLS[src]
        sub = df[df["address_line_1"].notna()]
        for r in sub.itertuples(index=False):
            cid = lk.get((src, getattr(r, sid)))
            if cid is None:
                continue
            rows.append(
                {
                    "customer360_id": cid,
                    "value": r.address_line_1,
                    "address_line_2": r.address_line_2,
                    "city": r.city,
                    "state_code": r.state_code,
                    "postal_code": r.postal_code,
                    "country_code": r.country_code,
                    "type": type_label,
                    "source": src,
                    "last_updated": r.updated_at if pd.notna(r.updated_at) else r.created_at,
                }
            )
    if not rows:
        return pd.DataFrame(
            columns=["customer360_id", "value", "address_line_2", "city", "state_code",
                     "postal_code", "country_code", "type", "source", "value_count",
                     "last_updated", "confidence_rank", "index"]
        )
    long = pd.DataFrame(rows)
    grp = long.groupby(["customer360_id", "value"])
    long["value_count"] = grp["value"].transform("size")
    long["last_updated"] = grp["last_updated"].transform("max")
    epoch = pd.Timestamp("1970-01-01")
    long["_ts"] = long["last_updated"].fillna(epoch)
    long["_demoted"] = long["type"].isin(DEMOTED_TYPES)
    long = long.sort_values(
        ["customer360_id", "_demoted", "value_count", "_ts", "value", "source"],
        ascending=[True, True, False, False, True, True],
        kind="stable",
    ).reset_index(drop=True)
    long["index"] = long.groupby("customer360_id").cumcount() + 1
    long["confidence_rank"] = long["index"]  # dense==row here (ties broken by value)
    return long.drop(columns=["_ts", "_demoted"])


def ip_address_table(mapping: pd.DataFrame, cleaned_dfs: dict[str, pd.DataFrame]) -> pd.DataFrame:
    """customer360__ip_address.sql:23-29: marketo IPs joined to the spine with
    ipv4/ipv6 classification."""
    lk = _id_to_c360(mapping)
    m = cleaned_dfs["marketo"]
    sub = m[m["anonymous_ip"].notna()]
    return pd.DataFrame(
        {
            "customer360_id": [lk.get(("marketo", i)) for i in sub["lead_id"]],
            "ip_address": sub["anonymous_ip"].to_numpy(),
            "type": sub["ip_type"].to_numpy(),
            "source": "marketo",
        }
    ).dropna(subset=["customer360_id"]).reset_index(drop=True)


STATUS_SPECS = [
    ("marketo", "is_unsubscribed"), ("marketo", "is_email_invalid"),
    ("marketo", "do_not_call"), ("stripe", "is_delinquent"),
    ("stripe", "is_deleted"), ("zendesk", "is_active"), ("zendesk", "is_suspended"),
]


def status_table(mapping: pd.DataFrame, cleaned_dfs: dict[str, pd.DataFrame]) -> pd.DataFrame:
    """customer360__status.sql:39-176: per-source status flags unpivoted to
    (customer360_id, status, value, source) rows."""
    lk = _id_to_c360(mapping)
    rows = []
    for src, col in STATUS_SPECS:
        df = cleaned_dfs[src]
        if col not in df:
            continue
        sid = ID_COLS[src]
        sub = df[df[col].notna()]
        for i, v in zip(sub[sid], sub[col]):
            cid = lk.get((src, i))
            if cid is not None:
                rows.append(
                    {"customer360_id": cid, "status": col, "value": bool(v), "source": src}
                )
    return pd.DataFrame(rows, columns=["customer360_id", "status", "value", "source"])


def updates_table(mapping: pd.DataFrame, cleaned_dfs: dict[str, pd.DataFrame]) -> pd.DataFrame:
    """customer360__updates.sql:7-68: per-source recency rows
    (customer360_id, source, last_updated, created_at)."""
    lk = _id_to_c360(mapping)
    rows = []
    for src, idc in (("marketo", "lead_id"), ("stripe", "customer_id"), ("zendesk", "user_id")):
        df = cleaned_dfs[src]
        for r in df.itertuples(index=False):
            cid = lk.get((src, getattr(r, idc)))
            if cid is None:
                continue
            rows.append(
                {
                    "customer360_id": cid,
                    "source": src,
                    "last_updated": r.updated_at if pd.notna(r.updated_at) else r.created_at,
                    "created_at": r.created_at,
                }
            )
    return pd.DataFrame(
        rows, columns=["customer360_id", "source", "last_updated", "created_at"]
    )


def summary(mapping: pd.DataFrame, attrs: dict[str, pd.DataFrame]) -> pd.DataFrame:
    """customer360__summary.sql:46-157: best (index=1) value per attribute
    star-joined onto the spine."""
    out = mapping[
        ["customer360_id", "customer360_organization_id", "organization_name",
         "is_organization_header", "lead_id", "customer_id", "user_id",
         "updated_at", "created_at"]
    ].copy()
    for attr, table in attrs.items():
        if table.empty:
            out[f"best_{attr}"] = None
            continue
        best = table[table["index"] == 1][["customer360_id", "value"]].rename(
            columns={"value": f"best_{attr}"}
        )
        out = out.merge(best, on="customer360_id", how="left")
    return out


# ---------------------------------------------------------------------------
# customer metrics rollup (models/customer360__customer.sql:28-337)
# ---------------------------------------------------------------------------

METRIC_SUM_COLS = {
    "marketo": ["count_campaigns", "count_email_opens", "count_email_clicks"],
    "stripe": ["total_spend", "count_charges"],
    "zendesk": ["count_tickets", "count_open_tickets", "count_replies"],
}


def customer_rollup(
    mapping: pd.DataFrame,
    summary_df: pd.DataFrame,
    metric_tables: dict[str, pa.Table],
) -> pd.DataFrame:
    """Per-source metric aggregation joined to the summary dims, plus the org
    re-aggregation (customer360__customer.sql:238-324). Aggregations run as Ray
    ``groupby(customer360_id)`` sums after a broadcast id→customer360_id lookup
    in map_batches (hash join + groupby, SURVEY.md §2.4 'Metrics joins').

    Reproduces the reference quirk (:321): the org rollup reads only
    ``is_organization_header`` rows whose source ids are NULL, so their joined
    metrics are NULL and the rolled-up sums are 0 — as-is, by design.
    """
    import ray
    import ray.data
    from ray.data.aggregate import Max, Min, Sum

    individual = mapping[~mapping["is_organization_header"]]
    lookups = {}
    for src, idc in (("marketo", "lead_id"), ("stripe", "customer_id"), ("zendesk", "user_id")):
        lookups[src] = {
            i: c for i, c in zip(individual[idc], individual["customer360_id"]) if pd.notna(i)
        }

    out = summary_df.copy()
    for src, idc in (("marketo", "lead_id"), ("stripe", "customer_id"), ("zendesk", "user_id")):
        table = metric_tables.get(f"{src}_metrics")
        if table is None or table.num_rows == 0:
            for c in METRIC_SUM_COLS[src]:
                out[f"total_{c}" if not c.startswith(("count_", "total_")) else c] = 0
            continue
        ref = ray.put(lookups[src])

        def attach(df: pd.DataFrame, _idc=idc, _ref=ref) -> pd.DataFrame:
            lk = ray.get(_ref)
            df = df.copy()
            df["customer360_id"] = df[_idc].map(lk)
            return df[df["customer360_id"].notna()]

        ds = ray.data.from_arrow(table).map_batches(attach, batch_format="pandas")
        aggs = [Sum(c, alias_name=c) for c in METRIC_SUM_COLS[src]]
        if src == "stripe":
            aggs += [
                Min("first_charge_at", alias_name="first_charge_at"),
                Max("most_recent_charge_at", alias_name="most_recent_charge_at"),
            ]
        if src == "zendesk":
            # weighted average: safe_divide(sum(avg*count), sum(count))
            # (customer360__customer.sql:92-102)
            def weight(df: pd.DataFrame) -> pd.DataFrame:
                df = df.copy()
                df["_csat_weighted"] = df["avg_csat"].fillna(0) * df["count_tickets"].fillna(0)
                return df

            ds = ds.map_batches(weight, batch_format="pandas")
            aggs += [Sum("_csat_weighted", alias_name="_csat_weighted")]
        agg_df = ds.groupby("customer360_id").aggregate(*aggs).to_pandas()
        if src == "zendesk" and not agg_df.empty:
            denom = agg_df["count_tickets"].replace(0, np.nan)
            agg_df["avg_csat"] = (agg_df["_csat_weighted"] / denom).round(6)
            agg_df = agg_df.drop(columns=["_csat_weighted"])
        out = out.merge(agg_df, on="customer360_id", how="left")

    for src in METRIC_SUM_COLS:
        for c in METRIC_SUM_COLS[src]:
            if c in out.columns:
                # sum(coalesce(x,0)) semantics for individual rows
                out[c] = out[c].fillna(0)

    # org rollup over header rows only (quirk: metrics are all NULL→0 there)
    headers = out[out["is_organization_header"]]
    if len(headers):
        roll_cols = [c for src in METRIC_SUM_COLS for c in METRIC_SUM_COLS[src]]
        rolled = headers.groupby("customer360_organization_id", dropna=False)[roll_cols].sum()
        for c in roll_cols:
            out.loc[out["is_organization_header"], c] = (
                out.loc[out["is_organization_header"], "customer360_organization_id"]
                .map(rolled[c])
                .values
            )
    return out


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
    tickets = ind.get("count_tickets", pd.Series(0, index=ind.index)).fillna(0)
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


def run_customer360(tables: dict[str, pa.Table]) -> dict[str, pd.DataFrame]:
    """End-to-end DAG: clean (Ray actor pools) → match → map → attributes →
    summary. Cleaned outputs come back to the driver as pandas for the spine
    stages (narrow tables; the 100 TB path swaps the pandas merges for
    Dataset.join / groupby on the same keys — stage semantics unchanged)."""
    cleaned = clean_sources(tables)
    cleaned_dfs = {
        k: _conform_cleaned(ds.to_pandas(), k) for k, ds in cleaned.items()
    }
    matches = source_matches(cleaned_dfs)
    mapping = build_mapping(matches, cleaned_dfs)
    attrs = {
        attr: attribute_table(attr, mapping, cleaned_dfs) for attr in ATTRIBUTE_SPECS
    }
    attrs["address"] = address_attribute(mapping, cleaned_dfs)
    summary_df = summary(mapping, attrs)
    out = {
        "mapping": mapping,
        "summary": summary_df,
        "matches": matches,
        "ip_address": ip_address_table(mapping, cleaned_dfs),
        "status": status_table(mapping, cleaned_dfs),
        "updates": updates_table(mapping, cleaned_dfs),
        **{f"attr_{k}": v for k, v in attrs.items()},
        **{f"cleaned_{k}": v for k, v in cleaned_dfs.items()},
    }
    if any(k.endswith("_metrics") for k in tables):
        out["customer"] = customer_rollup(mapping, summary_df, tables)
    return out
