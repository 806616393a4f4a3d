"""customer360 identity-resolution pipeline tests against planted ground truth
(FIXTURES.md §4 generator)."""

import json

import pandas as pd
import pytest

from dbt_customer360_ray.pipelines.c360_fixtures import fixture_config, gen_c360_sources
from dbt_customer360_ray.pipelines.customer360 import run_customer360

pytestmark = pytest.mark.usefixtures("ray_session")


@pytest.fixture(scope="module")
def result():
    tables, truth = gen_c360_sources(150, seed=42)
    return run_customer360(tables, fixture_config()), truth


def _cluster_of(mapping: pd.DataFrame, col, val):
    rows = mapping[(mapping[col] == val) & (~mapping["is_organization_header"])]
    return set(rows["customer360_id"])


def test_shared_email_links_marketo_stripe(result):
    res, truth = result
    mapping = res["mapping"]
    linked = truth[
        truth["share_email"] & truth["lead_id"].notna() & truth["customer_id"].notna()
    ]
    assert len(linked) > 5
    for r in linked.itertuples(index=False):
        a = _cluster_of(mapping, "lead_id", r.lead_id)
        b = _cluster_of(mapping, "customer_id", r.customer_id)
        assert a and a == b, f"person {r.person}: email-shared ids not linked"


def test_shared_phone_links_without_email(result):
    res, truth = result
    mapping = res["mapping"]
    # phone shared but email NOT shared on stripe side: phone + fuzzy name must link
    linked = truth[
        truth["share_phone"] & ~truth["share_email"]
        & truth["lead_id"].notna() & truth["customer_id"].notna() & ~truth["near_name"]
    ]
    if len(linked) == 0:
        pytest.skip("no such fixture rows at this seed")
    hits = 0
    for r in linked.itertuples(index=False):
        a = _cluster_of(mapping, "lead_id", r.lead_id)
        b = _cluster_of(mapping, "customer_id", r.customer_id)
        hits += int(bool(a) and a == b)
    assert hits / len(linked) > 0.8  # titles/suffix noise may drop a few


def test_distinct_people_never_merge(result):
    res, truth = result
    mapping = res["mapping"]
    ind = mapping[~mapping["is_organization_header"]]
    # two people with no shared keys: their customer360_ids must differ
    t = truth[truth["lead_id"].notna()].head(30)
    for i, a in t.iterrows():
        for j, b in t.iterrows():
            if a["person"] >= b["person"]:
                continue
            ca = _cluster_of(mapping, "lead_id", a["lead_id"])
            cb = _cluster_of(mapping, "lead_id", b["lead_id"])
            assert not (ca & cb), f"people {a['person']} and {b['person']} merged"


def test_null_email_traps_do_not_explode(result):
    res, truth = result
    mapping = res["mapping"]
    ind = mapping[~mapping["is_organization_header"]]
    # every source row appears exactly once in the spine
    assert ind["lead_id"].dropna().is_unique
    assert ind["customer_id"].dropna().is_unique
    assert ind["user_id"].dropna().is_unique


def test_never_matched_rows_kept(result):
    res, truth = result
    mapping = res["mapping"]
    ind = mapping[~mapping["is_organization_header"]]
    assert set(res["cleaned_marketo"]["lead_id"]) <= set(ind["lead_id"].dropna())
    assert set(res["cleaned_stripe"]["customer_id"]) <= set(ind["customer_id"].dropna())


def test_org_headers_and_source_id_arrays(result):
    res, _ = result
    mapping = res["mapping"]
    headers = mapping[mapping["is_organization_header"]]
    assert len(headers) > 0
    for r in headers.itertuples(index=False):
        assert pd.isna(r.lead_id) and pd.isna(r.customer_id) and pd.isna(r.user_id)
        ids = json.loads(r.source_ids)
        assert sorted(ids) == ["marketo", "stripe", "zendesk"]
        for v in ids.values():
            # JSON arrays of distinct member ids (mapping.sql:169-179), pinned
            # to sorted order; '' entries stand for null ids (coalesce quirk)
            assert isinstance(v, list) and v == sorted(v)


def test_surrogate_keys_deterministic(result):
    res, truth = result
    tables, _ = gen_c360_sources(150, seed=42)
    res2 = run_customer360(tables, fixture_config())
    a = res["mapping"].sort_values("customer360_id").reset_index(drop=True)
    b = res2["mapping"].sort_values("customer360_id").reset_index(drop=True)
    pd.testing.assert_series_equal(a["customer360_id"], b["customer360_id"])


def test_attribute_ranking_index_one_per_entity(result):
    res, _ = result
    for attr in ("email", "phone", "name", "organization"):
        t = res[f"attr_{attr}"]
        if t.empty:
            continue
        firsts = t[t["index"] == 1]
        assert firsts["customer360_id"].is_unique
        # index=1 row has the max value_count within its entity (frequency wins)
        for cid, grp in t.groupby("customer360_id"):
            top = grp[grp["index"] == 1].iloc[0]
            assert top["value_count"] == grp["value_count"].max()


def test_summary_star(result):
    res, _ = result
    s = res["summary"]
    assert "best_email" in s.columns and "best_name" in s.columns
    ind = s[~s["is_organization_header"]]
    assert ind["best_email"].notna().mean() > 0.5


def test_customer_metrics_rollup(result):
    res, truth = result
    cust = res.get("customer")
    assert cust is not None
    ind = cust[~cust["is_organization_header"]]
    # a person in stripe with known metrics: total_spend = (person % 97) * 10.5
    linked = truth[truth["customer_id"].notna()].head(10)
    for r in linked.itertuples(index=False):
        rows = ind[ind["customer_id"] == r.customer_id]
        assert len(rows) == 1
        assert abs(rows["total_spend"].iloc[0] - (r.person % 97) * 10.5) < 1e-6
    # quirk reproduction: org-header rows have NULL source ids -> metrics 0
    headers = cust[cust["is_organization_header"]]
    assert (headers["total_spend"] == 0).all()
    # weighted csat within [1,5] where tickets exist
    with_t = ind[ind["count_tickets"] > 0]
    assert with_t["avg_csat"].dropna().between(1, 5).all()


# ---------------------------------------------------------------------------
# config surface: grain switch, internal match ids, external map tables
# ---------------------------------------------------------------------------

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402

from dbt_customer360_ray.config import MapTableSpec, MatchIdSpec, PipelineConfig  # noqa: E402
from dbt_customer360_ray.pipelines.c360_fixtures import fixture_stripe_extractors  # noqa: E402

_TS = pd.Timestamp("2024-06-01")


def _mini_tables(crm_marketo=None, crm_stripe=None):
    """Two-person fixture: same org, dissimilar person names, shared phone
    (blocking arm fires; individual-grain fuzzy confirm must reject)."""
    marketo = pd.DataFrame(
        {
            "lead_id": [1], "email": [None], "first_name": ["Alice"],
            "last_name": ["Jones"], "company": ["Acme Inc"], "inferred_company": [""],
            "phone": ["(415) 555-0101"], "main_phone": [None], "mobile_phone": [None],
            "address": ["1 Oak St, Austin"], "city": ["Austin"], "state_code": ["TX"],
            "state": [""], "country": ["US"], "postal_code": ["78701"],
            "anonymous_ip": [None], "is_unsubscribed": [False],
            "is_email_invalid": [False], "do_not_call": [False],
            "updated_timestamp": [_TS], "created_timestamp": [_TS],
        }
    )
    if crm_marketo is not None:
        marketo["crm_id"] = crm_marketo
    stripe = pd.DataFrame(
        {
            "customer_id": ["cus_1"], "email": [None],
            "customer_name": ["Acme Corp (Bob Stone)"], "shipping_name": ["Bob Stone"],
            "phone": ["415.555.0101"], "shipping_phone": [None],
            "customer_address_line_1": ["9 Elm Rd"], "customer_address_line_2": [""],
            "customer_address_city": ["Austin"], "customer_address_state": ["TX"],
            "customer_address_country": ["US"], "customer_address_postal_code": ["78701"],
            "is_delinquent": [False], "is_deleted": [False],
            "customer_created_at": [_TS],
        }
    )
    if crm_stripe is not None:
        stripe["crm_id"] = crm_stripe
    zusers = pd.DataFrame(
        {
            "user_id": [7], "organization_id": [100], "email": [None],
            "name": ["Cara Voss"], "phone": ["NA"], "role": ["end-user"],
            "is_active": [True], "is_suspended": [False],
            "updated_at": [_TS], "created_at": [_TS],
        }
    )
    zorgs = pd.DataFrame(
        {"organization_id": [100], "name": ["Acme Inc"],
         "updated_at": [_TS], "created_at": [_TS]}
    )
    return {
        "marketo_leads": pa.Table.from_pandas(marketo, preserve_index=False),
        "stripe_customer_overview": pa.Table.from_pandas(stripe, preserve_index=False),
        "zendesk_users": pa.Table.from_pandas(zusers, preserve_index=False),
        "zendesk_organizations": pa.Table.from_pandas(zorgs, preserve_index=False),
    }


def _n_matches(res):
    m = res["matches"]
    return len(m[m["lead_id"].notna() & m["customer_id"].notna()])


def test_org_grain_switches_fuzzy_name_set(ray_session):
    """source_matches.sql:143-153: at organization grain the confirm compares
    org names; distinct people at the same org MATCH at org grain and must NOT
    at individual grain."""
    ext = fixture_stripe_extractors()
    ind = run_customer360(
        _mini_tables(), PipelineConfig(stripe_extractors=ext)
    )
    assert _n_matches(ind) == 0
    org = run_customer360(
        _mini_tables(),
        PipelineConfig(
            stripe_extractors=ext,
            grains={"marketo": "organization", "stripe": "organization",
                    "zendesk": "organization"},
        ),
    )
    assert _n_matches(org) == 1  # 'Acme' == 'Acme' confirms the pair


def test_internal_match_id_exact_arm(ray_session):
    """README.md:85-120: a shared internal match id both blocks AND confirms,
    with no email/name/phone agreement at all."""
    tables = _mini_tables(crm_marketo=["X9"], crm_stripe=["X9"])
    # break the shared phone so ONLY the mid arm can block
    t = tables["marketo_leads"].to_pandas()
    t["phone"] = ["(212) 999-0000"]
    tables["marketo_leads"] = pa.Table.from_pandas(t, preserve_index=False)
    cfg = PipelineConfig(
        stripe_extractors=fixture_stripe_extractors(),
        internal_match_ids=(
            MatchIdSpec(name="crm", source_columns={"marketo": "crm_id", "stripe": "crm_id"}),
        ),
    )
    res = run_customer360(tables, cfg)
    assert _n_matches(res) == 1
    # without the mid config the same tables produce no match
    base = run_customer360(
        tables, PipelineConfig(stripe_extractors=fixture_stripe_extractors())
    )
    assert _n_matches(base) == 0


def test_external_map_table_supplies_match_id(ray_session):
    """int_customer360__marketo.sql:26-37: the match id can come from an
    external map table joined on the source id."""
    tables = _mini_tables(crm_stripe=["K7"])
    map_tbl = pa.table({"lead_id": pa.array([1], pa.int64()),
                        "crm_key": pa.array(["K7"], pa.string())})
    cfg = PipelineConfig(
        stripe_extractors=fixture_stripe_extractors(),
        internal_match_ids=(
            MatchIdSpec(
                name="crm",
                source_columns={"marketo": "crm_key", "stripe": "crm_id"},
                map_tables={
                    "marketo": MapTableSpec(
                        table=map_tbl, join_with_map_on="lead_id",
                        map_table_join_on="lead_id",
                    )
                },
            ),
        ),
    )
    res = run_customer360(tables, cfg)
    assert _n_matches(res) == 1
    # mapping carries the mid column for spine rows
    assert "mid_crm" in res["mapping"].columns
