"""Unit tests: cleaning normalizers vs hand-written micro-tables
(SURVEY.md §5 item 1)."""

import pandas as pd
import pytest

from dbt_customer360_ray.functions.levenshtein import (
    any_name_similar,
    levenshtein,
    similarity,
)
from dbt_customer360_ray.stages import normalize as N


def S(*vals):
    return pd.Series(list(vals), dtype=object)


def test_email_normalize_and_split():
    local, domain = N.email_local_domain(S("John.Doe+x@Example.COM", "", None, "bad"))
    assert local.tolist() == ["johndoex", None, None, "bad"]
    assert domain.tolist() == ["example.com", None, None, None]


def test_phone_normalize_ten_digit_and_ext():
    num, ext = N.normalize_phone(S("(555) 123-4567", "5551234567 extension 9", "NA", "+1 555 123 4567 #22"))
    assert num.tolist() == ["+15551234567", "+15551234567", None, "+15551234567"]
    assert ext.tolist() == [None, "9", None, "22"]


def test_state_country_disambiguation():
    sc, sl, cc, cl = N.disambiguate_state_country(
        S("CA", "California", "#REF!", None), S("US", "United States", "DE", "")
    )
    assert sc.tolist() == ["CA", None, None, None]
    assert sl.tolist() == [None, "California", None, None]
    assert cc.tolist() == ["US", None, "DE", None]
    assert cl.tolist() == [None, "United States", None, None]


def test_resolve_country_and_state():
    cc = N.resolve_country(S("US", None, "gb", None), S(None, "Deutschland", None, "narnia"))
    assert cc.tolist() == ["US", "DE", "GB", None]
    st = N.resolve_state(S("ca", None, "ON"), S(None, "texas", None), S("US", "US", "CA"))
    assert st.tolist() == ["CA", "TX", "ON"]


def test_postal_strip():
    assert N.normalize_postal(S("94105-1234", "AB 12", "")).tolist() == ["941051234", "12", None]


def test_title_and_suffix_strip():
    no_title, title = N.strip_title(S("Dr. Jane Smith", "mr bob", "Plain Name"))
    assert no_title.tolist() == ["Jane Smith", "bob", "Plain Name"]
    assert title.tolist() == ["Dr", "mr", None]
    no_suf, suf = N.strip_name_suffix(S("John Smith Jr.", "Ada Lovelace", "Carl Grant III"))
    assert no_suf.tolist() == ["John Smith", "Ada Lovelace", "Carl Grant"]
    assert suf.tolist() == ["Jr", None, "III"]


def test_org_suffix_strip():
    no_suf, suf = N.strip_org_suffix(S("Acme Inc", "Widgets, LLC", "Tool GmbH.", "Plain"))
    assert no_suf.tolist() == ["Acme", "Widgets", "Tool", "Plain"]
    assert suf.tolist() == ["Inc", "LLC", "GmbH", None]


def test_street_suffix_expansion_collapsed_quirk():
    out = N.expand_street_suffixes(S("123 Main St", "9 Oak Av.", "5 Pine Street"))
    assert out.tolist() == ["123 Main Street", "9 Oak Avenue", "5 Pine Street"]


def test_split_address_lines():
    l1, l2 = N.split_address_lines(S("123 Main St, Apt 4", "77 Elm Rd STE 200", "9 Plain Way"))
    assert l1.tolist() == ["123 Main St", "77 Elm Rd", "9 Plain Way"]
    assert l2.tolist() == ["Apt 4", "STE 200", None]


def test_split_first_last_and_recombine():
    first, last = N.split_first_last(S("Smith, John", "Jane Doe", "Cher"))
    assert first.tolist() == ["John", "Jane", "Cher"]
    assert last.tolist() == ["Smith", "Doe", None]
    combined = N.recombine_name(first, last)
    assert combined.tolist() == ["John Smith", "Jane Doe", "Cher"]


def test_nicknames_pinned_order():
    out = N.add_nicknames(S("Bill", "jack", "zzz"))
    assert out.tolist() == ["william", "john, jonathan", None]


def test_empty_to_null_and_trim():
    assert N.empty_to_null(S("", "x")).tolist() == [None, "x"]
    assert N.trim_chars(S(" ,hello, ", ",,")).tolist() == ["hello", None]


def test_ip_classifier():
    assert N.classify_ip(S("1.2.3.4", "::1", None)).tolist() == ["ipv4", "ipv6", None]


def test_accent_fold():
    assert N.fold_accents(S("café", "Ångström", None)).tolist() == ["cafe", "Angstrom", None]


def test_levenshtein_similarity():
    assert levenshtein("kitten", "sitting") == 3
    assert similarity("Jon Smith", "John Smith") >= 0.9
    assert similarity(None, None) < 0.5  # sentinel: null never matches null
    assert any_name_similar(["Jon Smith"], ["John Smith"], threshold=0.9)
    assert not any_name_similar([None], [None])
