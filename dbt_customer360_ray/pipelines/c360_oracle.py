"""DuckDB oracle for the customer360 DAG — an independent SQL re-derivation of
clean → match → map → attributes → summary/customer over the SAME raw fixture
parquet the engine reads.

The SQL is built programmatically from the same seed tables
(sources/seeds.py) and the same regex alternations the cleaning actors
compile, so marker sets / lookup contents / alternation preference order are
shared by construction while the EXECUTION is fully independent (DuckDB RE2 +
window functions vs Ray map_batches/groupby). Reference provenance for each
stage is documented in pipelines/customer360.py; this module mirrors that
file's semantics statement-by-statement:

- cleaning: normalize.py kernels (email/phone/name/org/address/state)
- matching: blocking OR-join + Levenshtein ≥ .95 confirm (lowercased full
  names), 3-way consolidation
- mapping: spine groups (first-non-null by source rank), md5 surrogate keys
  (dbt_utils recipe), JSON source_ids, org-header rows
- attributes: unpivot + frequency/recency windows (dense_rank + row_number)
- summary / ip / status / updates / customer rollup

RE2 note: Python's ``(?=...)`` lookahead (street-suffix expansion) is not
available in DuckDB RE2 — the SQL consumes the boundary char and re-emits it
via a backreference, which yields identical strings.
"""

from __future__ import annotations

import os
import re

from ..sources import seeds

SENT = "_dbt_utils_surrogate_key_null_"
GARBAGE = "('#ref!', '#n/a', '#value!', 'null', 'none')"
PLACEHOLDERS = "('permanently deleted', 'placeholder contact', 'not available')"

# fixture scale the driver's sf=0.01 correctness run uses (see __ray_entry__)
ORACLE_N = 300
ORACLE_SEED = 42


def fixture_dir(num_people: int = ORACLE_N, seed: int = ORACLE_SEED) -> str:
    return f"/tmp/c360_fixture_n{num_people}_s{seed}"


def ensure_fixture(num_people: int = ORACLE_N, seed: int = ORACLE_SEED) -> str:
    """Write the synthetic raw source tables to a deterministic parquet dir
    (idempotent). Both the engine queries and the oracle SQL read these
    bytes."""
    import pyarrow.parquet as pq

    from .c360_fixtures import gen_c360_sources

    d = fixture_dir(num_people, seed)
    done = os.path.join(d, "_DONE")
    if not os.path.exists(done):
        # tmp → os.replace per file, _DONE last: concurrent writers (pytest +
        # driver check) race benignly — readers never observe torn parquet
        # (same protocol as stream_fixture_path / media_fixture_path).
        tables, _ = gen_c360_sources(num_people, seed=seed)
        os.makedirs(d, exist_ok=True)
        for name, tbl in tables.items():
            tmp = os.path.join(d, f".{name}.parquet.tmp.{os.getpid()}")
            pq.write_table(tbl, tmp)
            os.replace(tmp, os.path.join(d, f"{name}.parquet"))
        tmp_done = f"{done}.tmp.{os.getpid()}"
        with open(tmp_done, "w") as f:
            f.write("ok")
        os.replace(tmp_done, done)
    return d


# ---------------------------------------------------------------------------
# expression builders (each returns a SQL snippet string)
# ---------------------------------------------------------------------------


def _alts(words) -> str:
    return "|".join(sorted(words, key=len, reverse=True))


TITLE_PAT = r"(?i)^(" + _alts(seeds.NAME_TITLES) + r")\.?\s+"
NAME_SUFFIX_PAT = r"(?i)[\s,]+(" + _alts(seeds.NAME_SUFFIXES) + r")\.?$"
ORG_SUFFIX_PAT = r"(?i)[\s,._]+(" + _alts(seeds.ORG_SUFFIXES) + r")\.?$"
UNIT_ALTS = _alts(re.escape(u) for u in seeds.UNIT_DESIGNATORS)


def _sq(pat: str) -> str:
    """Escape a regex for embedding in a single-quoted SQL literal."""
    return pat.replace("'", "''")


def _empty_null(expr: str) -> str:
    return f"NULLIF({expr}, '')"


def _email(col: str) -> str:
    return _empty_null(f"trim(lower({col}))")


def _phone_stage(col: str) -> str:
    """The shared normalized-phone string ('' possible): mask NA, lower,
    '#'→'ext', strip non-alnum, 'extension'→'ext'."""
    c = f"CAST({col} AS VARCHAR)"  # all-null parquet columns bind as non-text
    masked = f"(CASE WHEN {c} IN ('NA','na','N/A','n/a') THEN NULL ELSE {c} END)"
    return (
        f"replace(regexp_replace(replace(lower({masked}), '#', 'ext'),"
        f" '[^0-9a-z]', '', 'g'), 'extension', 'ext')"
    )


def _phone_num(p: str) -> str:
    num = (
        f"(CASE WHEN strpos({p}, 'ext') > 0 THEN substr({p}, 1, strpos({p}, 'ext') - 1)"
        f" ELSE {p} END)"
    )
    n1 = f"(CASE WHEN length({num}) = 10 THEN '+1' || {num} ELSE {num} END)"
    n2 = f"(CASE WHEN length({n1}) = 11 AND {n1} LIKE '1%' THEN '+' || {n1} ELSE {n1} END)"
    return _empty_null(n2)


def _strip_title(col: str) -> str:
    return _empty_null(f"trim(regexp_replace({col}, '{_sq(TITLE_PAT)}', ''))")


def _title_of(col: str) -> str:
    return _empty_null(f"regexp_extract({col}, '{_sq(TITLE_PAT)}', 1)")


def _strip_name_suffix(col: str) -> str:
    return _empty_null(f"trim(regexp_replace({col}, '{_sq(NAME_SUFFIX_PAT)}', ''))")


def _name_suffix_of(col: str) -> str:
    return _empty_null(f"regexp_extract({col}, '{_sq(NAME_SUFFIX_PAT)}', 1)")


def _strip_org_suffix(col: str) -> str:
    return _empty_null(f"trim(regexp_replace({col}, '{_sq(ORG_SUFFIX_PAT)}', ''), ' ,.')")


def _recombine(f: str, l: str) -> str:  # noqa: E741
    return (
        f"(CASE WHEN {f} IS NOT NULL AND {l} IS NOT NULL THEN {f} || ' ' || {l}"
        f" ELSE coalesce({f}, {l}) END)"
    )


def _split_first(s: str) -> str:
    after_comma = f"trim(substr({s}, strpos({s}, ',') + 1))"
    before_last_space = f"trim(regexp_extract({s}, '^(.*) ([^ ]*)$', 1))"
    return (
        f"(CASE WHEN {s} IS NULL THEN NULL"
        f" WHEN strpos({s}, ',') > 0 THEN {_empty_null(after_comma)}"
        f" WHEN strpos({s}, ' ') = 0 THEN {s}"
        f" ELSE {_empty_null(before_last_space)} END)"
    )


def _split_last(s: str) -> str:
    before_comma = f"trim(substr({s}, 1, strpos({s}, ',') - 1))"
    after_last_space = f"trim(regexp_extract({s}, '^(.*) ([^ ]*)$', 2))"
    return (
        f"(CASE WHEN {s} IS NULL THEN NULL"
        f" WHEN strpos({s}, ',') > 0 THEN {_empty_null(before_comma)}"
        f" WHEN strpos({s}, ' ') = 0 THEN NULL"
        f" ELSE {_empty_null(after_last_space)} END)"
    )


def _expand_street(col: str) -> str:
    """Chained global case-insensitive replaces, one per abbreviation, longest
    first — the SQL analogue of the single alternation+lookup pass (lookahead
    boundary re-emitted via backreference)."""
    expr = col
    for long_form, abbr in sorted(
        seeds.STREET_SUFFIXES.items(), key=lambda kv: len(kv[1]), reverse=True
    ):
        pat = _sq(rf"(?i)\b({re.escape(abbr)})\.?(\s|,|$)")
        expr = f"regexp_replace({expr}, '{pat}', '{long_form}\\2', 'g')"
    return expr


def _addr_line1(s: str) -> str:
    unit = _sq(rf"(?i)^(.*?)\s+(({UNIT_ALTS})[\s.#].*)$")
    return (
        f"trim(CASE WHEN strpos({s}, ',') > 0 THEN substr({s}, 1, strpos({s}, ',') - 1)"
        f" WHEN regexp_extract({s}, '{unit}', 1) <> '' THEN regexp_extract({s}, '{unit}', 1)"
        f" ELSE {s} END, ' ,')"
    )


def _addr_line2(s: str) -> str:
    unit = _sq(rf"(?i)^(.*?)\s+(({UNIT_ALTS})[\s.#].*)$")
    return _empty_null(
        f"trim(CASE WHEN strpos({s}, ',') > 0 THEN substr({s}, strpos({s}, ',') + 1)"
        f" WHEN regexp_extract({s}, '{unit}', 2) <> '' THEN regexp_extract({s}, '{unit}', 2)"
        f" ELSE NULL END)"
    )


def _degarbage(expr: str) -> str:
    return f"(CASE WHEN lower({expr}) IN {GARBAGE} THEN NULL ELSE {expr} END)"


def _sim(a: str, b: str) -> str:
    """similar_mask mirror: equal short-circuit, else 1 - lev/maxlen ≥ .95."""
    return (
        f"({a} IS NOT NULL AND {b} IS NOT NULL AND ({a} = {b} OR"
        f" (1.0 - CAST(levenshtein({a}, {b}) AS DOUBLE)"
        f" / greatest(length({a}), length({b}))) >= 0.95))"
    )


def _surrogate(components: list[str]) -> str:
    rendered = " || '-' || ".join(f"coalesce({c}, '{SENT}')" for c in components)
    return f"md5({rendered})"


def _json_arr(rendered: str) -> str:
    """sorted distinct '\"<v>\"' array string with '\"\"' for null (mapping
    header source_ids)."""
    quoted = f"coalesce('\"' || {rendered} || '\"', '\"\"')"
    return (
        f"'[' || array_to_string(list_sort(list_distinct(list({quoted}))), ',') || ']'"
    )


# ---------------------------------------------------------------------------
# the shared prologue: raw reads → cleaned → matches → mapping → cid maps
# ---------------------------------------------------------------------------


def _lookup_values() -> tuple[str, str]:
    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    c_rows = ", ".join(
        f"({q(k)}, {q(v)})" for k, v in sorted(seeds.country_lookup().items())
    )
    s_rows = ", ".join(
        f"({q(c)}, {q(k)}, {q(v)})"
        for (c, k), v in sorted(seeds.state_lookup().items())
    )
    return (
        f"country_lk(key, a2) AS (SELECT * FROM (VALUES {c_rows}))",
        f"state_lk(country, key, code) AS (SELECT * FROM (VALUES {s_rows}))",
    )


def _cleaned_marketo(d: str) -> str:
    p_phone = _phone_stage("phone")
    p_main = _phone_stage("main_phone")
    p_mobile = _phone_stage("mobile_phone")
    st_like = "(CASE WHEN state_code IS NULL THEN state ELSE state_code END)"
    return f"""
    m_raw AS (SELECT * FROM read_parquet('{d}/marketo_leads.parquet')),
    cm0 AS (
        SELECT lead_id,
            {_email("email")} AS email,
            {_strip_title("first_name")} AS c_first,
            {_title_of("first_name")} AS first_name_title,
            {_strip_name_suffix("last_name")} AS c_last,
            {_name_suffix_of("last_name")} AS name_suffix,
            {_recombine("c_first", "c_last")} AS full_name,
            {_strip_org_suffix("company")} AS company,
            {_strip_org_suffix("NULLIF(inferred_company, '')")} AS inferred_company,
            {_phone_num(p_phone)} AS phone,
            {_phone_num(p_main)} AS main_phone,
            {_phone_num(p_mobile)} AS mobile_phone,
            {_expand_street(_addr_line1("address"))} AS address_line_1,
            {_addr_line2("address")} AS address_line_2,
            {_empty_null("trim(city)")} AS city,
            {_degarbage(_empty_null(f"trim({st_like})"))} AS st,
            {_degarbage(_empty_null("trim(country)"))} AS co,
            {_empty_null("regexp_replace(CAST(postal_code AS VARCHAR), '[^0-9]', '', 'g')")} AS postal_code,
            NULLIF(anonymous_ip, '') AS anonymous_ip,
            (CASE WHEN NULLIF(anonymous_ip, '') IS NULL THEN NULL
                  WHEN strpos(anonymous_ip, ':') > 0 THEN 'ipv6' ELSE 'ipv4' END) AS ip_type,
            is_unsubscribed, is_email_invalid, do_not_call,
            updated_timestamp AS updated_at, created_timestamp AS created_at
        FROM m_raw
    ),
    cm1 AS (
        SELECT cm0.*, coalesce(ck.a2, cn.a2) AS country_code
        FROM cm0
        LEFT JOIN country_lk ck ON ck.key = (CASE WHEN length(cm0.co) <= 2 THEN upper(cm0.co) END)
        LEFT JOIN country_lk cn ON cn.key = lower(CASE WHEN length(cm0.co) > 2 THEN cm0.co END)
    ),
    cleaned_marketo AS (
        SELECT cm1.*, coalesce(sk.code, sn.code) AS state_code
        FROM cm1
        LEFT JOIN state_lk sk ON sk.country = cm1.country_code
            AND sk.key = lower(CASE WHEN length(cm1.st) <= 3 THEN upper(cm1.st) END)
        LEFT JOIN state_lk sn ON sn.country = cm1.country_code
            AND sn.key = lower(CASE WHEN length(cm1.st) > 3 THEN cm1.st END)
    )"""


def _cleaned_stripe(d: str) -> str:
    """Fixture stripe extractors: 'Org LLC (Person)' paren parse
    (c360_fixtures.fixture_stripe_extractors)."""
    p_phone = _phone_stage("phone")
    p_ship = _phone_stage("shipping_phone")
    person_raw = (
        "(CASE WHEN regexp_matches(customer_name, '\\(')"
        " THEN NULLIF(regexp_extract(customer_name, '\\(([^)]*)\\)', 1), '')"
        " ELSE NULLIF(customer_name, '') END)"
    )
    org_raw = (
        "(CASE WHEN regexp_matches(customer_name, '\\(')"
        " THEN NULLIF(regexp_replace(customer_name, '\\s*\\(.*\\)\\s*', ''), '') END)"
    )
    return f"""
    s_raw AS (SELECT * FROM read_parquet('{d}/stripe_customer_overview.parquet')),
    cs0 AS (
        SELECT customer_id,
            {_email("email")} AS email,
            {person_raw} AS person_raw,
            {_strip_title("person_raw")} AS person_nt,
            {_strip_name_suffix("person_nt")} AS person_ns,
            {_name_suffix_of("person_nt")} AS name_suffix,
            {_split_first("person_ns")} AS first_name,
            {_split_last("person_ns")} AS last_name,
            {_recombine("first_name", "last_name")} AS full_name,
            NULLIF(shipping_name, '') AS ship_raw,
            {_strip_title("ship_raw")} AS ship_nt,
            {_strip_name_suffix("ship_nt")} AS ship_ns,
            {_split_first("ship_ns")} AS ship_first,
            {_split_last("ship_ns")} AS ship_last,
            {_recombine("ship_first", "ship_last")} AS shipping_name,
            {org_raw} AS org_raw,
            {_strip_org_suffix("org_raw")} AS organization,
            CAST(NULL AS VARCHAR) AS shipping_organization,
            {_phone_num(p_phone)} AS phone,
            {_phone_num(p_ship)} AS shipping_phone,
            {_expand_street("trim(customer_address_line_1, ' ,')")} AS address_line_1,
            NULLIF(customer_address_line_2, '') AS address_line_2,
            {_empty_null("trim(customer_address_city)")} AS city,
            {_degarbage(_empty_null("trim(customer_address_state)"))} AS st,
            {_degarbage(_empty_null("trim(customer_address_country)"))} AS co,
            {_empty_null("regexp_replace(CAST(customer_address_postal_code AS VARCHAR), '[^0-9]', '', 'g')")} AS postal_code,
            is_delinquent, is_deleted,
            CAST(NULL AS TIMESTAMP) AS updated_at,
            customer_created_at AS created_at
        FROM s_raw
    ),
    cs1 AS (
        SELECT cs0.*, coalesce(ck.a2, cn.a2) AS country_code
        FROM cs0
        LEFT JOIN country_lk ck ON ck.key = (CASE WHEN length(cs0.co) <= 2 THEN upper(cs0.co) END)
        LEFT JOIN country_lk cn ON cn.key = lower(CASE WHEN length(cs0.co) > 2 THEN cs0.co END)
    ),
    cleaned_stripe AS (
        SELECT cs1.*, coalesce(sk.code, sn.code) AS state_code
        FROM cs1
        LEFT JOIN state_lk sk ON sk.country = cs1.country_code
            AND sk.key = lower(CASE WHEN length(cs1.st) <= 3 THEN upper(cs1.st) END)
        LEFT JOIN state_lk sn ON sn.country = cs1.country_code
            AND sn.key = lower(CASE WHEN length(cs1.st) > 3 THEN cs1.st END)
    )"""


def _cleaned_zendesk(d: str) -> str:
    p_phone = _phone_stage("u.phone")
    return f"""
    z_raw AS (SELECT * FROM read_parquet('{d}/zendesk_users.parquet')),
    zo_raw AS (SELECT * FROM read_parquet('{d}/zendesk_organizations.parquet')),
    cleaned_zendesk AS (
        SELECT u.user_id, u.organization_id,
            {_email("u.email")} AS email,
            {_strip_title("u.name")} AS name_nt,
            {_strip_name_suffix("name_nt")} AS name_ns,
            {_name_suffix_of("name_nt")} AS name_suffix,
            {_split_first("name_ns")} AS first_name,
            {_split_last("name_ns")} AS last_name,
            {_recombine("first_name", "last_name")} AS full_name,
            {_strip_org_suffix("o.name")} AS organization,
            {_phone_num(p_phone)} AS phone,
            u.is_active, u.is_suspended,
            u.updated_at, u.created_at
        FROM z_raw u
        LEFT JOIN zo_raw o ON o.organization_id = u.organization_id
        WHERE u.role = 'end-user'
    )"""


MARKETO_PHONES = ["phone", "main_phone", "mobile_phone"]
STRIPE_PHONES = ["phone", "shipping_phone"]
ZENDESK_PHONES = ["phone"]


def _cand(src_alias: str, phones: list[str], has_addr: bool) -> str:
    phone_any = " OR ".join(f"{p} IS NOT NULL" for p in phones)
    addr = (
        "(address_line_1 IS NOT NULL AND ((city IS NOT NULL AND state_code IS NOT NULL)"
        " OR (postal_code IS NOT NULL AND country_code IS NOT NULL)))"
        if has_addr
        else "FALSE"
    )
    return (
        f"SELECT * FROM {src_alias} WHERE (full_name IS NOT NULL OR email IS NOT NULL)"
        f" AND (email IS NOT NULL OR {phone_any} OR {addr})"
    )


def _block(a: str, b: str, phones_a: list[str], phones_b: list[str], addr: bool) -> str:
    arms = [f"({a}.email IS NOT NULL AND {a}.email = {b}.email)"]
    for pa in phones_a:
        for pb in phones_b:
            arms.append(f"({a}.{pa} IS NOT NULL AND {a}.{pa} = {b}.{pb})")
    if addr:
        arms.append(
            f"({a}.address_line_1 IS NOT NULL AND {b}.address_line_1 IS NOT NULL"
            f" AND lower({a}.address_line_1) = lower({b}.address_line_1)"
            f" AND {a}.city IS NOT NULL AND {a}.state_code IS NOT NULL"
            f" AND {b}.city IS NOT NULL AND {b}.state_code IS NOT NULL"
            f" AND lower({a}.city) = lower({b}.city)"
            f" AND lower({a}.state_code) = lower({b}.state_code))"
        )
        arms.append(
            f"({a}.address_line_1 IS NOT NULL AND {b}.address_line_1 IS NOT NULL"
            f" AND lower({a}.address_line_1) = lower({b}.address_line_1)"
            f" AND {a}.postal_code IS NOT NULL AND {a}.country_code IS NOT NULL"
            f" AND {b}.postal_code IS NOT NULL AND {b}.country_code IS NOT NULL"
            f" AND {a}.postal_code = {b}.postal_code"
            f" AND lower({a}.country_code) = lower({b}.country_code))"
        )
    return "(" + " OR ".join(arms) + ")"


def _confirm(a: str, names_a: list[str], b: str, names_b: list[str]) -> str:
    arms = [f"({a}.email IS NOT NULL AND {a}.email = {b}.email)"]
    for na in names_a:
        for nb in names_b:
            arms.append(_sim(f"lower({a}.{na})", f"lower({b}.{nb})"))
    return "(" + " OR ".join(arms) + ")"


def _matches_sql() -> str:
    ms_on = (
        _block("m", "s", MARKETO_PHONES, STRIPE_PHONES, addr=True)
        + " AND "
        + _confirm("m", ["full_name"], "s", ["full_name", "shipping_name"])
    )
    mz_on = (
        _block("m", "z", MARKETO_PHONES, ZENDESK_PHONES, addr=False)
        + " AND "
        + _confirm("m", ["full_name"], "z", ["full_name"])
    )
    sz_on = (
        _block("s", "z", STRIPE_PHONES, ZENDESK_PHONES, addr=False)
        + " AND "
        + _confirm("s", ["full_name", "shipping_name"], "z", ["full_name"])
    )
    return f"""
    cand_m AS ({_cand("cleaned_marketo", MARKETO_PHONES, True)}),
    cand_s AS ({_cand("cleaned_stripe", STRIPE_PHONES, True)}),
    cand_z AS ({_cand("cleaned_zendesk", ZENDESK_PHONES, False)}),
    ms AS (
        SELECT DISTINCT m.lead_id, s.customer_id,
            coalesce(m.updated_at, m.created_at) AS m_upd, m.created_at AS m_cre,
            coalesce(s.updated_at, s.created_at) AS s_upd, s.created_at AS s_cre
        FROM cand_m m JOIN cand_s s ON {ms_on}
    ),
    mz AS (
        SELECT DISTINCT m.lead_id, z.user_id,
            coalesce(m.updated_at, m.created_at) AS m_upd2, m.created_at AS m_cre2,
            coalesce(z.updated_at, z.created_at) AS z_upd, z.created_at AS z_cre
        FROM cand_m m JOIN cand_z z ON {mz_on}
    ),
    sz AS (
        SELECT DISTINCT s.customer_id, z.user_id,
            coalesce(s.updated_at, s.created_at) AS s_upd2, s.created_at AS s_cre2,
            coalesce(z.updated_at, z.created_at) AS z_upd2, z.created_at AS z_cre2
        FROM cand_s s JOIN cand_z z ON {sz_on}
    ),
    tri0 AS (
        SELECT coalesce(ms.lead_id, mz.lead_id) AS lead_id, ms.customer_id,
            mz.user_id, ms.m_upd, ms.m_cre, ms.s_upd, ms.s_cre,
            mz.m_upd2, mz.m_cre2, mz.z_upd, mz.z_cre
        FROM ms FULL JOIN mz ON ms.lead_id = mz.lead_id
    ),
    tri1 AS (
        SELECT tri0.lead_id, coalesce(tri0.customer_id, sz.customer_id) AS customer_id,
            coalesce(tri0.user_id, sz.user_id) AS user_id,
            greatest(m_upd, s_upd, m_upd2, z_upd, s_upd2, z_upd2) AS updated_at,
            least(m_cre, s_cre, m_cre2, z_cre, s_cre2, z_cre2) AS created_at
        FROM tri0 FULL JOIN sz ON tri0.customer_id = sz.customer_id
    ),
    tri AS (
        SELECT lead_id, customer_id, user_id,
            max(updated_at) AS updated_at, min(created_at) AS created_at,
            row_number() OVER (
                ORDER BY lead_id NULLS LAST, customer_id NULLS LAST, user_id NULLS LAST
            ) AS pos
        FROM tri1 GROUP BY lead_id, customer_id, user_id
    )"""


def _mapping_sql() -> str:
    org_sur = _surrogate(["m_org", "m_inferred_org", "s_org", "s_ship_org",
                          "CAST(z_org_id AS VARCHAR)"])
    ind_sids = (
        "'{\"marketo\":\"' || coalesce(CAST(lead_id AS VARCHAR), '')"
        " || '\",\"stripe\":\"' || coalesce(customer_id, '')"
        " || '\",\"zendesk\":\"' || coalesce(CAST(user_id AS VARCHAR), '') || '\"}'"
    )
    hdr_sids = (
        "'{\"marketo\":' || " + _json_arr("CAST(lead_id AS VARCHAR)")
        + " || ',\"stripe\":' || " + _json_arr("customer_id")
        + " || ',\"zendesk\":' || " + _json_arr("CAST(user_id AS VARCHAR)")
        + " || '}'"
    )
    cid_sur = _surrogate([
        "CAST(lead_id AS VARCHAR)", "customer_id", "CAST(user_id AS VARCHAR)",
        "(CASE WHEN is_organization_header THEN 'true' ELSE 'false' END)",
        "customer360_organization_id",
    ])

    def fnn(col: str) -> str:  # first non-null by source rank
        return f"arg_min({col}, src_rank) FILTER (WHERE {col} IS NOT NULL) AS {col.split('.')[-1]}"

    return f"""
    frag AS (
        SELECT CASE WHEN t.pos IS NOT NULL THEN 't' || CAST(t.pos AS VARCHAR)
                    ELSE 'marketo:' || CAST(c.lead_id AS VARCHAR) END AS spine_key,
            0 AS src_rank, c.lead_id, CAST(NULL AS VARCHAR) AS customer_id,
            CAST(NULL AS BIGINT) AS user_id,
            coalesce(c.updated_at, c.created_at) AS upd, c.created_at AS cre,
            c.company AS m_org, c.inferred_company AS m_inferred_org,
            CAST(NULL AS VARCHAR) AS s_org, CAST(NULL AS VARCHAR) AS s_ship_org,
            CAST(NULL AS BIGINT) AS z_org_id,
            coalesce(c.company, c.inferred_company) AS org_display
        FROM cleaned_marketo c LEFT JOIN tri t ON t.lead_id = c.lead_id
        UNION ALL
        SELECT CASE WHEN t.pos IS NOT NULL THEN 't' || CAST(t.pos AS VARCHAR)
                    ELSE 'stripe:' || c.customer_id END,
            1, CAST(NULL AS BIGINT), c.customer_id, CAST(NULL AS BIGINT),
            coalesce(c.updated_at, c.created_at), c.created_at,
            CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
            c.organization, c.shipping_organization, CAST(NULL AS BIGINT),
            coalesce(c.organization, c.shipping_organization)
        FROM cleaned_stripe c LEFT JOIN tri t ON t.customer_id = c.customer_id
        UNION ALL
        SELECT CASE WHEN t.pos IS NOT NULL THEN 't' || CAST(t.pos AS VARCHAR)
                    ELSE 'zendesk:' || CAST(c.user_id AS VARCHAR) END,
            2, CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), c.user_id,
            coalesce(c.updated_at, c.created_at), c.created_at,
            CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
            CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), c.organization_id,
            c.organization
        FROM cleaned_zendesk c LEFT JOIN tri t ON t.user_id = c.user_id
    ),
    spine AS (
        SELECT spine_key,
            {fnn("lead_id")}, {fnn("customer_id")}, {fnn("user_id")},
            max(upd) AS updated_at, min(cre) AS created_at,
            {fnn("m_org")}, {fnn("m_inferred_org")}, {fnn("s_org")},
            {fnn("s_ship_org")}, {fnn("z_org_id")},
            arg_min(org_display, src_rank) FILTER (WHERE org_display IS NOT NULL)
                AS organization_name
        FROM frag GROUP BY spine_key
    ),
    spine_ind AS (
        SELECT lead_id, customer_id, user_id, updated_at, created_at,
            organization_name, FALSE AS is_organization_header,
            {org_sur} AS customer360_organization_id,
            {ind_sids} AS source_ids
        FROM spine
    ),
    spine_hdr AS (
        SELECT CAST(NULL AS BIGINT) AS lead_id, CAST(NULL AS VARCHAR) AS customer_id,
            CAST(NULL AS BIGINT) AS user_id,
            max(updated_at) AS updated_at, min(created_at) AS created_at,
            max(organization_name) AS organization_name,
            TRUE AS is_organization_header,
            customer360_organization_id,
            {hdr_sids} AS source_ids
        FROM spine_ind GROUP BY customer360_organization_id
    ),
    mapping AS (
        SELECT *, {cid_sur} AS customer360_id
        FROM (SELECT * FROM spine_ind UNION ALL SELECT * FROM spine_hdr)
    ),
    cid_m AS (
        SELECT lead_id AS id, min(customer360_id) AS cid FROM mapping
        WHERE NOT is_organization_header AND lead_id IS NOT NULL GROUP BY lead_id
    ),
    cid_s AS (
        SELECT customer_id AS id, min(customer360_id) AS cid FROM mapping
        WHERE NOT is_organization_header AND customer_id IS NOT NULL GROUP BY customer_id
    ),
    cid_z AS (
        SELECT user_id AS id, min(customer360_id) AS cid FROM mapping
        WHERE NOT is_organization_header AND user_id IS NOT NULL GROUP BY user_id
    )"""


# attr -> list of (cleaned table, cid map, id col, value col, type label)
_ATTR_SPECS = {
    "email": [
        ("cleaned_marketo", "cid_m", "lead_id", "email", "primary"),
        ("cleaned_stripe", "cid_s", "customer_id", "email", "primary"),
        ("cleaned_zendesk", "cid_z", "user_id", "email", "primary"),
    ],
    "phone": [
        ("cleaned_marketo", "cid_m", "lead_id", "phone", "primary"),
        ("cleaned_marketo", "cid_m", "lead_id", "main_phone", "main"),
        ("cleaned_marketo", "cid_m", "lead_id", "mobile_phone", "mobile"),
        ("cleaned_stripe", "cid_s", "customer_id", "phone", "primary"),
        ("cleaned_stripe", "cid_s", "customer_id", "shipping_phone", "shipping"),
        ("cleaned_zendesk", "cid_z", "user_id", "phone", "primary"),
    ],
    "name": [
        ("cleaned_marketo", "cid_m", "lead_id", "full_name", "individual"),
        ("cleaned_stripe", "cid_s", "customer_id", "full_name", "individual"),
        ("cleaned_stripe", "cid_s", "customer_id", "shipping_name", "shipping"),
        ("cleaned_zendesk", "cid_z", "user_id", "full_name", "individual"),
    ],
    "organization": [
        ("cleaned_marketo", "cid_m", "lead_id", "company", "primary"),
        ("cleaned_marketo", "cid_m", "lead_id", "inferred_company", "inferred"),
        ("cleaned_stripe", "cid_s", "customer_id", "organization", "primary"),
        ("cleaned_stripe", "cid_s", "customer_id", "shipping_organization", "shipping"),
        ("cleaned_zendesk", "cid_z", "user_id", "organization", "primary"),
    ],
}

_ADDR_SPECS = [
    ("cleaned_marketo", "cid_m", "lead_id", "primary"),
    ("cleaned_stripe", "cid_s", "customer_id", "customer"),
]

_ADDR_EXTRAS = ["address_line_2", "city", "state_code", "postal_code", "country_code"]


def _attr_sql(attr: str) -> str:
    dem = {
        "email": "FALSE",
        "phone": "FALSE",
        "name": f"(lower(value) IN {PLACEHOLDERS})",
        "organization": "(type IN ('inferred'))",
    }[attr]
    frags = "\n        UNION ALL\n".join(
        f"""        SELECT k.cid AS customer360_id, c.{val} AS value,
            '{typ}' AS type, '{tbl.split('_')[1]}' AS source,
            coalesce(c.updated_at, c.created_at) AS last_updated
        FROM {tbl} c JOIN {cmap} k ON k.id = c.{idc} WHERE c.{val} IS NOT NULL"""
        for tbl, cmap, idc, val, typ in _ATTR_SPECS[attr]
    )
    return f"""
    att_{attr}_0 AS (
{frags}
    ),
    att_{attr}_1 AS (
        SELECT *, count(*) OVER (PARTITION BY customer360_id, value) AS value_count,
            max(last_updated) OVER (PARTITION BY customer360_id, value) AS lu
        FROM att_{attr}_0
    ),
    att_{attr} AS (
        SELECT customer360_id, value, type, source,
            CAST(value_count AS BIGINT) AS value_count, lu AS last_updated,
            CAST(dense_rank() OVER (PARTITION BY customer360_id
                ORDER BY dem, value_count DESC, ts DESC) AS BIGINT) AS confidence_rank,
            CAST(row_number() OVER (PARTITION BY customer360_id
                ORDER BY dem, value_count DESC, ts DESC, value, source, type)
                AS BIGINT) AS "index"
        FROM (SELECT *, coalesce(lu, TIMESTAMP '1970-01-01') AS ts, {dem} AS dem
              FROM att_{attr}_1)
    )"""


def _addr_attr_sql() -> str:
    extras = ", ".join(f"c.{c} AS {c}" for c in _ADDR_EXTRAS)
    frags = "\n        UNION ALL\n".join(
        f"""        SELECT k.cid AS customer360_id, c.address_line_1 AS value, {extras},
            '{typ}' AS type, '{tbl.split('_')[1]}' AS source,
            coalesce(c.updated_at, c.created_at) AS last_updated
        FROM {tbl} c JOIN {cmap} k ON k.id = c.{idc} WHERE c.address_line_1 IS NOT NULL"""
        for tbl, cmap, idc, typ in _ADDR_SPECS
    )
    ex = ", ".join(_ADDR_EXTRAS)
    return f"""
    att_address_0 AS (
{frags}
    ),
    att_address_1 AS (
        SELECT *, count(*) OVER (PARTITION BY customer360_id, value) AS value_count,
            max(last_updated) OVER (PARTITION BY customer360_id, value) AS lu
        FROM att_address_0
    ),
    att_address AS (
        SELECT customer360_id, value, {ex}, type, source,
            CAST(value_count AS BIGINT) AS value_count, lu AS last_updated,
            CAST(dense_rank() OVER (PARTITION BY customer360_id
                ORDER BY dem, value_count DESC, ts DESC) AS BIGINT) AS confidence_rank,
            CAST(row_number() OVER (PARTITION BY customer360_id
                ORDER BY dem, value_count DESC, ts DESC, value, source, type)
                AS BIGINT) AS "index"
        FROM (SELECT *, coalesce(lu, TIMESTAMP '1970-01-01') AS ts,
                     (type IN ('inferred')) AS dem
              FROM att_address_1)
    )"""


def _summary_sql() -> str:
    return """
    summary AS (
        SELECT m.customer360_id, m.customer360_organization_id, m.organization_name,
            m.is_organization_header, m.lead_id, m.customer_id, m.user_id,
            m.updated_at, m.created_at,
            e.value AS best_email, p.value AS best_phone, n.value AS best_name,
            o.value AS best_organization, a.value AS best_address
        FROM mapping m
        LEFT JOIN att_email e ON e.customer360_id = m.customer360_id AND e."index" = 1
        LEFT JOIN att_phone p ON p.customer360_id = m.customer360_id AND p."index" = 1
        LEFT JOIN att_name n ON n.customer360_id = m.customer360_id AND n."index" = 1
        LEFT JOIN att_organization o ON o.customer360_id = m.customer360_id AND o."index" = 1
        LEFT JOIN att_address a ON a.customer360_id = m.customer360_id AND a."index" = 1
    )"""


def _customer_sql(d: str) -> str:
    return f"""
    met_m AS (
        SELECT k.cid AS customer360_id,
            CAST(sum(t.count_campaigns) AS DOUBLE) AS count_campaigns,
            CAST(sum(t.count_email_opens) AS DOUBLE) AS count_email_opens,
            CAST(sum(t.count_email_clicks) AS DOUBLE) AS count_email_clicks
        FROM read_parquet('{d}/marketo_metrics.parquet') t
        JOIN cid_m k ON k.id = t.lead_id GROUP BY 1
    ),
    met_s AS (
        SELECT k.cid AS customer360_id,
            CAST(sum(t.total_spend) AS DOUBLE) AS total_spend,
            CAST(sum(t.count_charges) AS DOUBLE) AS count_charges,
            min(t.first_charge_at) AS first_charge_at,
            max(t.most_recent_charge_at) AS most_recent_charge_at
        FROM read_parquet('{d}/stripe_metrics.parquet') t
        JOIN cid_s k ON k.id = t.customer_id GROUP BY 1
    ),
    met_z AS (
        SELECT k.cid AS customer360_id,
            CAST(sum(t.count_tickets) AS DOUBLE) AS count_tickets,
            CAST(sum(t.count_open_tickets) AS DOUBLE) AS count_open_tickets,
            CAST(sum(t.count_replies) AS DOUBLE) AS count_replies,
            round(sum(coalesce(t.avg_csat, 0) * coalesce(t.count_tickets, 0))
                  / nullif(CAST(sum(t.count_tickets) AS DOUBLE), 0), 6) AS avg_csat
        FROM read_parquet('{d}/zendesk_metrics.parquet') t
        JOIN cid_z k ON k.id = t.user_id GROUP BY 1
    ),
    customer AS (
        SELECT s.*,
            coalesce(m.count_campaigns, 0) AS count_campaigns,
            coalesce(m.count_email_opens, 0) AS count_email_opens,
            coalesce(m.count_email_clicks, 0) AS count_email_clicks,
            coalesce(st.total_spend, 0) AS total_spend,
            coalesce(st.count_charges, 0) AS count_charges,
            st.first_charge_at, st.most_recent_charge_at,
            coalesce(z.count_tickets, 0) AS count_tickets,
            coalesce(z.count_open_tickets, 0) AS count_open_tickets,
            coalesce(z.count_replies, 0) AS count_replies,
            z.avg_csat
        FROM summary s
        LEFT JOIN met_m m ON m.customer360_id = s.customer360_id
        LEFT JOIN met_s st ON st.customer360_id = s.customer360_id
        LEFT JOIN met_z z ON z.customer360_id = s.customer360_id
    )"""


# CTEs referenced more than once: force one evaluation each, or DuckDB
# re-inlines the whole upstream match join per reference (hours, not seconds)
_MATERIALIZED = [
    "cleaned_marketo", "cleaned_stripe", "cleaned_zendesk",
    "cand_m", "cand_s", "cand_z", "ms", "mz", "sz", "tri", "frag", "spine",
    "spine_ind", "mapping", "cid_m", "cid_s", "cid_z",
    "att_email", "att_phone", "att_name", "att_organization", "att_address",
    "summary",
]


def prologue(d: str) -> str:
    c_lk, s_lk = _lookup_values()
    sql = (
        "WITH " + c_lk + ",\n" + s_lk + ","
        + _cleaned_marketo(d) + ","
        + _cleaned_stripe(d) + ","
        + _cleaned_zendesk(d) + ","
        + _matches_sql() + ","
        + _mapping_sql() + ","
        + _attr_sql("email") + ","
        + _attr_sql("phone") + ","
        + _attr_sql("name") + ","
        + _attr_sql("organization") + ","
        + _addr_attr_sql() + ","
        + _summary_sql() + ","
        + _customer_sql(d)
    )
    for name in _MATERIALIZED:
        sql = re.sub(rf"\b{name} AS \(", f"{name} AS MATERIALIZED (", sql)
    return sql


def oracle_entries(num_people: int = ORACLE_N, seed: int = ORACLE_SEED) -> dict[str, str]:
    """SQL strings for every c360_* driver query. Writes the fixture parquet
    as a side effect so the SQL's read_parquet paths exist whenever the driver
    runs them."""
    d = ensure_fixture(num_people, seed)
    pro = prologue(d)
    finals = {
        "c360_mapping": """
        SELECT CAST(lead_id AS DOUBLE) AS lead_id, customer_id,
               CAST(user_id AS DOUBLE) AS user_id, updated_at, created_at,
               organization_name, is_organization_header,
               customer360_organization_id, source_ids, customer360_id
        FROM mapping""",
        "c360_summary": """
        SELECT customer360_id, customer360_organization_id, organization_name,
               is_organization_header, CAST(lead_id AS DOUBLE) AS lead_id,
               customer_id, CAST(user_id AS DOUBLE) AS user_id, updated_at,
               created_at, best_email, best_phone, best_name, best_organization,
               best_address
        FROM summary""",
        "c360_customer": """
        SELECT customer360_id, customer360_organization_id, organization_name,
               is_organization_header, CAST(lead_id AS DOUBLE) AS lead_id,
               customer_id, CAST(user_id AS DOUBLE) AS user_id, updated_at,
               created_at, best_email, best_phone, best_name, best_organization,
               best_address, count_campaigns, count_email_opens,
               count_email_clicks, total_spend, count_charges, first_charge_at,
               most_recent_charge_at, count_tickets, count_open_tickets,
               count_replies, avg_csat
        FROM customer""",
        "c360_attr_email": 'SELECT * FROM att_email',
        "c360_attr_phone": 'SELECT * FROM att_phone',
        "c360_attr_name": 'SELECT * FROM att_name',
        "c360_attr_organization": 'SELECT * FROM att_organization',
        "c360_attr_address": 'SELECT * FROM att_address',
        "c360_ip_address": """
        SELECT k.cid AS customer360_id, c.anonymous_ip AS ip_address,
               c.ip_type AS type, 'marketo' AS source
        FROM cleaned_marketo c JOIN cid_m k ON k.id = c.lead_id
        WHERE c.anonymous_ip IS NOT NULL""",
        "c360_status": """
        SELECT customer360_id, status, value, source FROM (
            SELECT k.cid AS customer360_id, 'is_unsubscribed' AS status,
                   c.is_unsubscribed AS value, 'marketo' AS source
            FROM cleaned_marketo c JOIN cid_m k ON k.id = c.lead_id
            UNION ALL
            SELECT k.cid, 'is_email_invalid', c.is_email_invalid, 'marketo'
            FROM cleaned_marketo c JOIN cid_m k ON k.id = c.lead_id
            UNION ALL
            SELECT k.cid, 'do_not_call', c.do_not_call, 'marketo'
            FROM cleaned_marketo c JOIN cid_m k ON k.id = c.lead_id
            UNION ALL
            SELECT k.cid, 'is_delinquent', c.is_delinquent, 'stripe'
            FROM cleaned_stripe c JOIN cid_s k ON k.id = c.customer_id
            UNION ALL
            SELECT k.cid, 'is_deleted', c.is_deleted, 'stripe'
            FROM cleaned_stripe c JOIN cid_s k ON k.id = c.customer_id
            UNION ALL
            SELECT k.cid, 'is_active', c.is_active, 'zendesk'
            FROM cleaned_zendesk c JOIN cid_z k ON k.id = c.user_id
            UNION ALL
            SELECT k.cid, 'is_suspended', c.is_suspended, 'zendesk'
            FROM cleaned_zendesk c JOIN cid_z k ON k.id = c.user_id
        ) WHERE value IS NOT NULL""",
        "c360_updates": """
        SELECT k.cid AS customer360_id, 'marketo' AS source,
               coalesce(c.updated_at, c.created_at) AS last_updated,
               c.created_at AS created_at
        FROM cleaned_marketo c JOIN cid_m k ON k.id = c.lead_id
        UNION ALL
        SELECT k.cid, 'stripe', coalesce(c.updated_at, c.created_at), c.created_at
        FROM cleaned_stripe c JOIN cid_s k ON k.id = c.customer_id
        UNION ALL
        SELECT k.cid, 'zendesk', coalesce(c.updated_at, c.created_at), c.created_at
        FROM cleaned_zendesk c JOIN cid_z k ON k.id = c.user_id""",
        # analyses layer (reference analyses_old/elan/email_campaign_list_360
        # .sql:9-75): revenue buckets x open-ticket flag over customer
        "c360_analysis_email_campaign": """
        SELECT customer360_id, best_email, best_name,
               CASE WHEN coalesce(total_spend, 0) <= 0 THEN 'none'
                    WHEN total_spend <= 250 THEN 'low'
                    WHEN total_spend <= 1000 THEN 'mid'
                    ELSE 'high' END AS revenue_bucket,
               coalesce(count_open_tickets, 0) > 0 AS has_open_tickets
        FROM customer
        WHERE NOT is_organization_header AND best_email IS NOT NULL""",
        # analyses_old/elan/metrics_with_all_phones_360.sql:13-135: every known
        # phone per customer, distinct in confidence-rank order
        "c360_analysis_all_phones": """
        , ph AS (
            SELECT customer360_id, value, min("index") AS first_idx
            FROM att_phone GROUP BY customer360_id, value
        ),
        ph_agg AS (
            SELECT customer360_id,
                   string_agg(value, ', ' ORDER BY first_idx, value) AS phones
            FROM ph GROUP BY customer360_id
        )
        SELECT a.customer360_id, a.phones, c.best_name, c.best_email,
               c.total_spend, c.count_tickets
        FROM ph_agg a LEFT JOIN customer c
          ON c.customer360_id = a.customer360_id""",
        # analyses_old/drafts/monthly_metrics_customer360.sql:1-56: month spine
        # x new-customer counts (dbt_utils.date_spine equivalent)
        "c360_analysis_monthly_metrics": """
        , ind_created AS (
            SELECT created_at FROM mapping
            WHERE NOT is_organization_header AND created_at IS NOT NULL
        ),
        mm_spine AS (
            SELECT unnest(generate_series(
                date_trunc('month', min(created_at)),
                date_trunc('month', max(created_at)), INTERVAL 1 MONTH)) AS month
            FROM ind_created
        ),
        mm_counts AS (
            SELECT date_trunc('month', created_at) AS month,
                   count(*) AS new_customers
            FROM ind_created GROUP BY 1
        )
        SELECT s.month,
               CAST(coalesce(c.new_customers, 0) AS BIGINT) AS new_customers
        FROM mm_spine s LEFT JOIN mm_counts c ON c.month = s.month""",
    }
    finals.update(_raw_analysis_entries(d))
    return {name: pro + "\n" + body for name, body in finals.items()}


def _raw_analysis_entries(d: str) -> dict[str, str]:
    """The reference's raw-vs-360 conformance analyses (analyses_old/elan/
    email_campaign_list_raw.sql, metrics_with_all_phones_raw.sql vs their
    _360 twins): raw side = email-only entity over the UNPROCESSED source
    parquet (no cleaning CTEs), delta side full-outer-joins it against the
    prologue-derived customer/attribute answers. Tiebreaks the reference
    leaves undefined (row_number with no final key; phone aggregation order)
    are pinned identically here and in pipelines/customer360.py."""
    raw_cte = f"""
        , rz AS (
            SELECT u.user_id, lower(u.email) AS email, o.name AS org_name,
                   u.updated_at, u.phone
            FROM read_parquet('{d}/zendesk_users.parquet') u
            LEFT JOIN read_parquet('{d}/zendesk_organizations.parquet') o
              USING (organization_id)
            WHERE u.role = 'end-user' AND u.email IS NOT NULL
        ),
        rm AS (
            SELECT lead_id, lower(email) AS email, company,
                   NULLIF(inferred_company, '') AS inferred_company,
                   phone, main_phone, mobile_phone, updated_timestamp
            FROM read_parquet('{d}/marketo_leads.parquet')
            WHERE email IS NOT NULL
        ),
        rs AS (
            SELECT customer_id, lower(email) AS email,
                   CASE WHEN NULLIF(split_part(customer_name, ' (', 1), '')
                            IS NULL
                        THEN customer_name
                        ELSE split_part(customer_name, ' (', 1)
                   END AS org_extract,
                   phone, shipping_phone, customer_created_at
            FROM read_parquet('{d}/stripe_customer_overview.parquet')
            WHERE email IS NOT NULL
        ),
        raw_emails AS (
            SELECT email FROM rm UNION SELECT email FROM rs
            UNION SELECT email FROM rz
        ),
        org_lanes AS (
            SELECT email, company AS organization_name,
                   updated_timestamp AS last_seen, FALSE AS is_inferred
            FROM rm WHERE company IS NOT NULL AND company <> ''
            UNION ALL
            SELECT email, inferred_company, updated_timestamp, TRUE
            FROM rm WHERE inferred_company IS NOT NULL
            UNION ALL
            SELECT email, org_extract, customer_created_at, FALSE
            FROM rs WHERE org_extract IS NOT NULL AND org_extract <> ''
            UNION ALL
            SELECT email, org_name, updated_at, FALSE
            FROM rz WHERE org_name IS NOT NULL AND org_name <> ''
        ),
        org_rank AS (
            SELECT email, organization_name,
                   count(*) AS value_count,
                   max(coalesce(last_seen, TIMESTAMP '1970-01-01'))
                       AS value_last,
                   min(CASE WHEN is_inferred THEN 1 ELSE 0 END) AS inferred
            FROM org_lanes GROUP BY 1, 2
        ),
        org_pick AS (
            SELECT email, organization_name FROM (
                SELECT email, organization_name,
                       row_number() OVER (
                           PARTITION BY email
                           ORDER BY value_count DESC, value_last DESC,
                                    inferred ASC, organization_name ASC
                       ) AS rn
                FROM org_rank) WHERE rn = 1
        ),
        raw_spend AS (
            SELECT rs.email, sum(m.total_spend) AS total_spend
            FROM rs JOIN read_parquet('{d}/stripe_metrics.parquet') m
              USING (customer_id)
            GROUP BY 1
        ),
        raw_tickets AS (
            SELECT rz.email,
                   CAST(sum(m.count_tickets) AS BIGINT) AS count_tickets,
                   CAST(sum(m.count_open_tickets) AS BIGINT) AS open_t
            FROM rz JOIN read_parquet('{d}/zendesk_metrics.parquet') m
              USING (user_id)
            GROUP BY 1
        ),
        raw_campaign AS (
            SELECT e.email, p.organization_name,
                   CASE WHEN coalesce(s.total_spend, 0) <= 0 THEN 'none'
                        WHEN s.total_spend <= 250 THEN 'low'
                        WHEN s.total_spend <= 1000 THEN 'mid'
                        ELSE 'high' END AS revenue_bucket,
                   coalesce(t.open_t, 0) > 0 AS has_open_tickets
            FROM raw_emails e
            LEFT JOIN org_pick p USING (email)
            LEFT JOIN raw_spend s USING (email)
            LEFT JOIN raw_tickets t USING (email)
        ),
        phone_lanes AS (
            SELECT email, 0 AS lane, phone AS value FROM rm
              WHERE phone IS NOT NULL AND phone <> ''
            UNION ALL SELECT email, 1, main_phone FROM rm
              WHERE main_phone IS NOT NULL AND main_phone <> ''
            UNION ALL SELECT email, 2, mobile_phone FROM rm
              WHERE mobile_phone IS NOT NULL AND mobile_phone <> ''
            UNION ALL SELECT email, 3, phone FROM rs
              WHERE phone IS NOT NULL AND phone <> ''
            UNION ALL SELECT email, 4, shipping_phone FROM rs
              WHERE shipping_phone IS NOT NULL AND shipping_phone <> ''
            UNION ALL SELECT email, 5, phone FROM rz
              WHERE phone IS NOT NULL AND phone <> ''
        ),
        ph_first AS (
            SELECT email, value, min(lane) AS first_lane
            FROM phone_lanes GROUP BY 1, 2
        ),
        raw_all_phones AS (
            SELECT f.email,
                   string_agg(f.value, ', ' ORDER BY f.first_lane, f.value)
                       AS phones,
                   any_value(s.total_spend) AS total_spend,
                   coalesce(any_value(t.count_tickets), 0) AS count_tickets
            FROM ph_first f
            LEFT JOIN raw_spend s ON s.email = f.email
            LEFT JOIN raw_tickets t ON t.email = f.email
            GROUP BY f.email
        )"""
    # created timestamps come straight off the parquet (rm/rs/rz project
    # only the columns the campaign CTEs use)
    raw_monthly = raw_cte + """
        , r_created AS (
            SELECT lower(email) AS email, created_timestamp AS created_at
            FROM read_parquet('{D}/marketo_leads.parquet') WHERE email IS NOT NULL
            UNION ALL
            SELECT lower(email), customer_created_at
            FROM read_parquet('{D}/stripe_customer_overview.parquet') WHERE email IS NOT NULL
            UNION ALL
            SELECT lower(email), created_at
            FROM read_parquet('{D}/zendesk_users.parquet')
            WHERE email IS NOT NULL AND role = 'end-user'
        ),
        r_first AS (
            SELECT email, min(created_at) AS created_at
            FROM r_created WHERE created_at IS NOT NULL GROUP BY 1
        ),
        r_spine AS (
            SELECT unnest(generate_series(
                date_trunc('month', min(created_at)),
                date_trunc('month', max(created_at)), INTERVAL 1 MONTH)) AS month
            FROM r_first
        ),
        r_counts AS (
            SELECT date_trunc('month', created_at) AS month, count(*) AS n
            FROM r_first GROUP BY 1
        ),
        raw_monthly AS (
            SELECT s.month,
                   CAST(coalesce(c.n, 0) AS BIGINT) AS new_customers
            FROM r_spine s LEFT JOIN r_counts c ON c.month = s.month
        )"""
    raw_monthly = raw_monthly.replace("{D}", d)
    return {
        "c360_analysis_monthly_metrics_raw": raw_monthly + """
        SELECT month, new_customers FROM raw_monthly""",
        "c360_analysis_monthly_metrics_raw_delta": raw_monthly + """
        , c_ind AS (
            SELECT created_at FROM mapping
            WHERE NOT is_organization_header AND created_at IS NOT NULL
        ),
        c_spine AS (
            SELECT unnest(generate_series(
                date_trunc('month', min(created_at)),
                date_trunc('month', max(created_at)), INTERVAL 1 MONTH)) AS month
            FROM c_ind
        ),
        c_counts AS (
            SELECT date_trunc('month', created_at) AS month, count(*) AS n
            FROM c_ind GROUP BY 1
        ),
        c360_monthly AS (
            SELECT s.month, CAST(coalesce(c.n, 0) AS BIGINT) AS new_customers
            FROM c_spine s LEFT JOIN c_counts c ON c.month = s.month
        )
        SELECT coalesce(r.month, c.month) AS month,
               CAST(coalesce(r.new_customers, 0) AS BIGINT)
                   AS raw_new_customers,
               CAST(coalesce(c.new_customers, 0) AS BIGINT)
                   AS c360_new_customers,
               CAST(coalesce(r.new_customers, 0)
                    - coalesce(c.new_customers, 0) AS BIGINT) AS count_gap
        FROM raw_monthly r FULL OUTER JOIN c360_monthly c
          ON r.month = c.month
        ORDER BY 1""",
        "c360_analysis_email_campaign_raw": raw_cte + """
        SELECT email, organization_name, revenue_bucket, has_open_tickets
        FROM raw_campaign""",
        "c360_analysis_all_phones_raw": raw_cte + """
        SELECT email, phones, total_spend,
               CAST(count_tickets AS BIGINT) AS count_tickets
        FROM raw_all_phones""",
        "c360_analysis_email_campaign_raw_delta": raw_cte + """
        , c360_camp AS (
            SELECT best_email AS email,
                   CASE WHEN coalesce(total_spend, 0) <= 0 THEN 'none'
                        WHEN total_spend <= 250 THEN 'low'
                        WHEN total_spend <= 1000 THEN 'mid'
                        ELSE 'high' END AS c360_bucket,
                   coalesce(count_open_tickets, 0) > 0
                       AS c360_has_open_tickets
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY best_email ORDER BY customer360_id) AS rn
                FROM customer
                WHERE NOT is_organization_header AND best_email IS NOT NULL
            ) WHERE rn = 1
        )
        SELECT coalesce(r.email, c.email) AS email,
               CASE WHEN c.email IS NULL THEN 'raw_only'
                    WHEN r.email IS NULL THEN 'c360_only'
                    ELSE 'both' END AS status,
               r.revenue_bucket AS raw_bucket,
               r.has_open_tickets AS raw_has_open_tickets,
               c.c360_bucket, c.c360_has_open_tickets,
               CASE WHEN r.email IS NOT NULL AND c.email IS NOT NULL
                    THEN r.revenue_bucket = c.c360_bucket END AS bucket_match
        FROM raw_campaign r FULL OUTER JOIN c360_camp c ON r.email = c.email""",
        "c360_analysis_all_phones_raw_delta": raw_cte + """
        , c_ph AS (
            SELECT customer360_id, value, min("index") AS first_idx
            FROM att_phone GROUP BY customer360_id, value
        ),
        c_ph_agg AS (
            SELECT customer360_id,
                   string_agg(value, ', ' ORDER BY first_idx, value) AS phones
            FROM c_ph GROUP BY customer360_id
        ),
        c360_phones AS (
            SELECT email, phones AS c360_phones FROM (
                SELECT c.best_email AS email, a.phones,
                       row_number() OVER (
                           PARTITION BY c.best_email
                           ORDER BY c.customer360_id) AS rn
                FROM c_ph_agg a JOIN customer c
                  ON c.customer360_id = a.customer360_id
                WHERE c.best_email IS NOT NULL
            ) WHERE rn = 1
        )
        SELECT coalesce(r.email, c.email) AS email,
               r.phones AS raw_phones, c.c360_phones,
               CASE WHEN c.email IS NULL THEN 'raw_only'
                    WHEN r.email IS NULL THEN 'c360_only'
                    ELSE 'both' END AS status,
               CAST(len(string_split(r.phones, ', ')) AS DOUBLE)
                   AS raw_n_phones,
               CAST(len(string_split(c.c360_phones, ', ')) AS DOUBLE)
                   AS c360_n_phones
        FROM raw_all_phones r FULL OUTER JOIN c360_phones c
          ON r.email = c.email"""
    }
