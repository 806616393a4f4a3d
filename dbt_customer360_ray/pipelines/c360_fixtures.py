"""Deterministic synthetic marketo/stripe/zendesk source tables
(FIXTURES.md §4) with planted cross-source matches and known ground truth.

Each synthetic person may appear in any subset of the three sources; matches
are plantable through shared emails, shared phones (formatted differently per
source), same address spelled with abbreviations ('123 Main St' vs
'123 Main Street'), and near-names within Levenshtein ≥ .95 ('Jon'/'John').
Deliberate non-matches: null emails, empty-string traps, distinct people at
the same company. The returned ``truth`` maps person → source ids so tests
can assert the resolved clusters without re-implementing the matcher.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

FIRST_NAMES = [
    "John", "Jon", "Jane", "Robert", "William", "Elizabeth", "Katherine",
    "Michael", "Sarah", "David", "Laura", "James", "Emily", "Daniel", "Anna",
    "Thomas", "Maria", "Charles", "Sophie", "Peter",
]
LAST_NAMES = [
    "Smith", "Johnson", "Brown", "Garcia", "Miller", "Davis", "Martinez",
    "Lopez", "Wilson", "Anderson", "Taylor", "Moore", "Jackson", "White",
    "Clark", "Lewis", "Walker", "Hall", "Young", "King",
]
STREETS = ["Main", "Oak", "Pine", "Maple", "Cedar", "Elm", "Washington", "Lake"]
CITIES = [
    ("San Francisco", "CA", "94105", "US"),
    ("New York", "NY", "10001", "US"),
    ("Austin", "TX", "78701", "US"),
    ("Seattle", "WA", "98101", "US"),
    ("Chicago", "IL", "60601", "US"),
    ("Toronto", "ON", "M5H", "CA"),
]
ORGS = ["Acme", "Globex", "Initech", "Umbrella", "Stark Industries", "Wayne"]

T0 = np.datetime64("2024-06-01T00:00:00", "us")


def _extract_paren_person(df: pd.DataFrame, col: str) -> pd.Series:
    """'Org LLC (First Last)' → 'First Last'; plain names pass through."""
    name = df[col].astype(object)
    has_paren = name.str.contains(r"\(", na=False)
    return name.str.extract(r"\(([^)]*)\)", expand=False).where(has_paren, name)


def _extract_paren_org(df: pd.DataFrame, col: str) -> pd.Series:
    """'Org LLC (First Last)' → 'Org LLC'; plain names → null (no org)."""
    name = df[col].astype(object)
    has_paren = name.str.contains(r"\(", na=False)
    return name.str.replace(r"\s*\(.*\)\s*", "", regex=True).where(has_paren)


def fixture_stripe_extractors() -> dict:
    """The fixture's enforced Stripe pattern is 'Org LLC (Person)' — these
    extractors are the engine-side analogue of the reference's
    ``stripe_*_extract_sql`` vars (int_customer360__stripe.sql:81-88;
    README.md:125-133), exercising the user-extension surface."""
    return {
        "customer_full_name": lambda df: _extract_paren_person(df, "customer_name"),
        "shipping_full_name": lambda df: df["shipping_name"],
        "customer_organization_name": lambda df: _extract_paren_org(df, "customer_name"),
        "shipping_organization_name": lambda df: pd.Series([None] * len(df), dtype=object),
    }


def fixture_config(**overrides):
    """PipelineConfig wired for the synthetic fixture (paren-name extractors)."""
    from ..config import PipelineConfig

    return PipelineConfig(stripe_extractors=fixture_stripe_extractors(), **overrides)


def gen_c360_sources(num_people: int = 200, seed: int = 42, id_offset: int = 0):
    """Returns (tables: dict[str, pa.Table], truth: pd.DataFrame).

    ``id_offset`` shifts every person-derived id so large fixtures can be
    generated in bounded-memory chunks (scripts/c360_scale_demo.py) without
    id collisions. The street-number space scales with num_people so the
    address blocking key keeps a realistic collision rate instead of packing
    600k people into 999 street numbers (unchanged for num_people ≤ 999 —
    all test/oracle fixtures)."""
    rng = np.random.default_rng(seed)
    people = []
    for i in range(num_people):
        fn = FIRST_NAMES[rng.integers(len(FIRST_NAMES))]
        ln = LAST_NAMES[rng.integers(len(LAST_NAMES))]
        city, state, zip5, country = CITIES[rng.integers(len(CITIES))]
        street_num = int(rng.integers(1, max(999, num_people)))
        street = STREETS[rng.integers(len(STREETS))]
        people.append(
            {
                "person": id_offset + i,
                "first": fn,
                "last": ln,
                "email": f"{fn.lower()}.{ln.lower()}{i}@example.com",
                "phone10": f"{rng.integers(200,999)}{rng.integers(200,999):03d}{rng.integers(0,9999):04d}",
                "street_num": street_num,
                "street": street,
                "city": city,
                "state": state,
                "zip": zip5,
                "country": country,
                "org": ORGS[rng.integers(len(ORGS))],
                # which sources the person appears in + which keys are shared
                "in_marketo": rng.random() < 0.7,
                "in_stripe": rng.random() < 0.6,
                "in_zendesk": rng.random() < 0.5,
                "share_email": rng.random() < 0.6,
                "share_phone": rng.random() < 0.5,
                "share_addr": rng.random() < 0.4,
                "near_name": rng.random() < 0.3,  # 'Jon' vs 'John' style
                "null_email_trap": rng.random() < 0.05,
            }
        )
    pp = pd.DataFrame(people)
    # guarantee each source non-empty and some full-overlap rows
    pp.loc[: min(10, num_people - 1), ["in_marketo", "in_stripe", "in_zendesk", "share_email"]] = True

    def ts(i, lane):
        return T0 + np.timedelta64(int(i) * 3600 + lane * 60, "s")

    marketo, stripe, zusers, zorgs = [], [], [], []
    org_ids = {o: 9000 + i for i, o in enumerate(ORGS)}
    truth = []

    for r in pp.itertuples(index=False):
        email = None if r.null_email_trap else r.email
        phone_fmt_a = f"({r.phone10[:3]}) {r.phone10[3:6]}-{r.phone10[6:]}"
        phone_fmt_b = f"{r.phone10[:3]}.{r.phone10[3:6]}.{r.phone10[6:]} ext 7"
        phone_fmt_c = r.phone10
        addr_abbrev = f"{r.street_num} {r.street} St"
        addr_long = f"{r.street_num} {r.street} Street"
        lead_id = cust_id = user_id = None

        if r.in_marketo:
            lead_id = 1000 + r.person
            marketo.append(
                {
                    "lead_id": lead_id,
                    "email": email,
                    "first_name": f"Dr. {r.first}" if r.person % 7 == 0 else r.first,
                    "last_name": f"{r.last} Jr" if r.person % 11 == 0 else r.last,
                    "company": f"{r.org} Inc",
                    "inferred_company": "",
                    "phone": phone_fmt_a if r.share_phone else None,
                    "main_phone": None,
                    "mobile_phone": None,
                    "address": f"{addr_abbrev}, {r.city}",
                    "city": r.city,
                    "state_code": r.state if r.person % 2 else "",
                    "state": "" if r.person % 2 else r.state,
                    "country": r.country,
                    "postal_code": r.zip,
                    "anonymous_ip": f"10.0.{r.person % 255}.1" if r.person % 3 else "fe80::1",
                    "is_unsubscribed": bool(r.person % 5 == 0),
                    "is_email_invalid": False,
                    "do_not_call": bool(r.person % 9 == 0),
                    "updated_timestamp": ts(r.person, 1),
                    "created_timestamp": ts(r.person, 0),
                }
            )
        if r.in_stripe:
            cust_id = f"cus_{r.person:06d}"
            first = ("Jon" if r.first == "John" else r.first) if r.near_name else r.first
            name_style = r.person % 3
            if name_style == 0:
                cname = f"{r.last}, {first}"
            elif name_style == 1:
                cname = f"{first} {r.last}"
            else:
                cname = f"{r.org} LLC ({first} {r.last})"
            stripe.append(
                {
                    "customer_id": cust_id,
                    "email": email if r.share_email else f"billing.{r.person}@pay.example.com",
                    "customer_name": cname,
                    "shipping_name": f"{first} {r.last}",
                    "phone": phone_fmt_b if r.share_phone else None,
                    "shipping_phone": None,
                    "customer_address_line_1": addr_long if r.share_addr else f"{r.street_num+1} Other Rd",
                    "customer_address_line_2": "",
                    "customer_address_city": r.city,
                    "customer_address_state": r.state,
                    "customer_address_country": r.country,
                    "customer_address_postal_code": r.zip,
                    "is_delinquent": bool(r.person % 13 == 0),
                    "is_deleted": False,
                    "customer_created_at": ts(r.person, 2),
                }
            )
        if r.in_zendesk:
            user_id = 5000 + r.person
            zusers.append(
                {
                    "user_id": user_id,
                    "organization_id": org_ids[r.org],
                    "email": email if r.share_email else None,
                    "name": f"{r.first} {r.last}",
                    "phone": phone_fmt_c if r.share_phone else "NA",
                    "role": "end-user" if r.person % 10 else "agent",
                    "is_active": True,
                    "is_suspended": False,
                    "updated_at": ts(r.person, 3),
                    "created_at": ts(r.person, 0),
                }
            )
        truth.append(
            {
                "person": r.person,
                "lead_id": lead_id,
                "customer_id": cust_id,
                "user_id": user_id,
                "share_email": bool(r.share_email and email is not None),
                "share_phone": bool(r.share_phone),
                "share_addr": bool(r.share_addr),
                "near_name": bool(r.near_name),
                "org": r.org,
            }
        )

    for o, oid in org_ids.items():
        zorgs.append(
            {
                "organization_id": oid,
                "name": f"{o} Inc",
                "updated_at": ts(oid, 1),
                "created_at": ts(oid, 0),
            }
        )

    # per-source metric tables (customer360__customer.sql:53,73,105 inputs)
    mmet, smet, zmet = [], [], []
    for r in pp.itertuples(index=False):
        if r.in_marketo:
            mmet.append(
                {
                    "lead_id": 1000 + r.person,
                    "count_campaigns": int(r.person % 7),
                    "count_email_opens": int(r.person % 23),
                    "count_email_clicks": int(r.person % 11),
                }
            )
        if r.in_stripe:
            smet.append(
                {
                    "customer_id": f"cus_{r.person:06d}",
                    "total_spend": round(float(r.person % 97) * 10.5, 2),
                    "count_charges": int(r.person % 13),
                    "first_charge_at": ts(r.person, 4),
                    "most_recent_charge_at": ts(r.person, 5),
                }
            )
        if r.in_zendesk:
            n_tickets = int(r.person % 9)
            zmet.append(
                {
                    "user_id": 5000 + r.person,
                    "count_tickets": n_tickets,
                    "count_open_tickets": int(r.person % 3),
                    "avg_csat": round(3.0 + (r.person % 20) / 10.0, 2),
                    "count_replies": int(r.person % 17),
                }
            )

    tables = {
        "marketo_leads": pa.Table.from_pandas(pd.DataFrame(marketo), preserve_index=False),
        "stripe_customer_overview": pa.Table.from_pandas(pd.DataFrame(stripe), preserve_index=False),
        "zendesk_users": pa.Table.from_pandas(pd.DataFrame(zusers), preserve_index=False),
        "zendesk_organizations": pa.Table.from_pandas(pd.DataFrame(zorgs), preserve_index=False),
        "marketo_metrics": pa.Table.from_pandas(pd.DataFrame(mmet), preserve_index=False),
        "stripe_metrics": pa.Table.from_pandas(pd.DataFrame(smet), preserve_index=False),
        "zendesk_metrics": pa.Table.from_pandas(pd.DataFrame(zmet), preserve_index=False),
    }
    return tables, pd.DataFrame(truth)
