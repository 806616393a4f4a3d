"""Cleaning normalizers — Ray-Data re-expressions of the reference's cleaning
models (/root/reference/models/cleaning/int_customer360__{marketo,stripe,
zendesk}.sql and macros/). Each kernel is vectorized (pandas C string ops /
pyarrow compute); the ``Cleaner`` actor compiles every regex + seed dict once
per actor (__init__) and applies whole column groups per batch (__call__) —
the reference's standardize → tokenize → restandardize CTE chain as one
actor-pool map_batches stage.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ..sources import seeds

# ---------------------------------------------------------------------------
# scalar-column kernels (each takes/returns a pandas Series of strings)
# ---------------------------------------------------------------------------


def empty_to_null(s: pd.Series) -> pd.Series:
    """`case when x = '' then null` applied to every output column
    (int_customer360__marketo.sql:383-475 `final` CTE). All missing values
    normalized to None (not NaN) so Arrow round-trips them as proper nulls."""
    out = s.astype(object).copy()
    out[(s == "") | s.isna()] = None
    return out


def normalize_email(s: pd.Series) -> pd.Series:
    """lower; '' → null (int_customer360__marketo.sql:117,392-394)."""
    return empty_to_null(s.str.lower().str.strip())


def email_local_domain(s: pd.Series) -> tuple[pd.Series, pd.Series]:
    """split at '@'; local part stripped of non-alphanumerics
    (int_customer360__marketo.sql:220-221,298)."""
    email = normalize_email(s)
    parts = email.str.split("@", n=1, expand=True)
    if parts.shape[1] < 2:
        parts[1] = pd.Series([None] * len(parts), index=parts.index)
    local = parts[0].str.replace(r"[^0-9a-z]", "", regex=True)
    return empty_to_null(local), empty_to_null(parts[1])


_PHONE_EXT_HASH = re.compile(r"#")
_PHONE_NON_ALNUM = re.compile(r"[^0-9a-zA-Z]")
_PHONE_EXTENSION = re.compile(r"extension")


def normalize_phone(s: pd.Series) -> tuple[pd.Series, pd.Series]:
    """'#'→'ext'; strip non-alphanumerics; 'extension'→'ext'; split number/ext
    at 'ext'; '+1' prefix when exactly 10 digits; 'NA'→null
    (int_customer360__marketo.sql:129-131,236-241,320-333; zendesk :99 maps NA)."""
    p = s.mask(s.isin(["NA", "na", "N/A", "n/a"]))
    p = p.str.lower()
    p = p.str.replace("#", "ext", regex=False)
    p = p.str.replace(_PHONE_NON_ALNUM, "", regex=True)
    p = p.str.replace("extension", "ext", regex=False)
    parts = p.str.split("ext", n=1, expand=True)
    if parts.shape[1] < 2:
        parts[1] = pd.Series([None] * len(parts), index=parts.index)
    number, extension = parts[0], parts[1]
    ten = number.str.len() == 10
    number = number.mask(ten, "+1" + number)
    eleven = (number.str.len() == 11) & number.str.startswith("1")
    number = number.mask(eleven, "+" + number)
    return empty_to_null(number), empty_to_null(extension)


_GARBAGE = {"#ref!", "#n/a", "#value!", "null", "none"}


def _degarbage(s: pd.Series) -> pd.Series:
    """#REF! spreadsheet garbage → null (int_customer360__marketo.sql:44-103)."""
    return s.mask(s.str.lower().isin(_GARBAGE))


def disambiguate_state_country(
    state_like: pd.Series, country_like: pd.Series
) -> tuple[pd.Series, pd.Series, pd.Series, pd.Series]:
    """Length heuristic (int_customer360__marketo.sql:44-103): a value with
    ≤3 chars is a code (uppercased), longer is a long name. Returns
    (state_code, state_long, country_code, country_long)."""
    st = _degarbage(empty_to_null(state_like.str.strip()))
    co = _degarbage(empty_to_null(country_like.str.strip()))
    st_is_code = st.str.len() <= 3
    co_is_code = co.str.len() <= 2
    state_code = empty_to_null(st.where(st_is_code).str.upper())
    state_long = empty_to_null(st.where(~st_is_code.fillna(True)))
    country_code = empty_to_null(co.where(co_is_code).str.upper())
    country_long = empty_to_null(co.where(~co_is_code.fillna(True)))
    return state_code, state_long, country_code, country_long


def normalize_postal(s: pd.Series) -> pd.Series:
    """REGEXP_REPLACE(cast(x as string),'[^0-9]','')
    (int_customer360__marketo.sql:142,151,159)."""
    return empty_to_null(s.astype("string").str.replace(r"[^0-9]", "", regex=True))


def trim_chars(s: pd.Series, chars: str = " ,") -> pd.Series:
    """adapter-dispatched trim(' ,') (macros/trim.sql:1-23)."""
    return empty_to_null(s.str.strip(chars))


def classify_ip(s: pd.Series) -> pd.Series:
    """like '%:%' → 'ipv6' else 'ipv4' (customer360__ip_address.sql:23-25)."""
    return pd.Series(
        np.where(s.isna(), None, np.where(s.str.contains(":", na=False), "ipv6", "ipv4")),
        index=s.index,
        dtype=object,
    )


def fold_accents(s: pd.Series) -> pd.Series:
    """Accent → ASCII fold (macros/remove_accents.sql — unused by the reference
    models; optional normalizer here)."""
    table = str.maketrans(seeds.ACCENT_FOLD)
    return s.map(lambda v: v.translate(table) if isinstance(v, str) else v)


# ---------------------------------------------------------------------------
# compiled-pattern kernels (regexes built from seed tables)
# ---------------------------------------------------------------------------


def _title_regex() -> re.Pattern:
    alts = "|".join(sorted(seeds.NAME_TITLES, key=len, reverse=True))
    return re.compile(rf"^({alts})\.?\s+", re.IGNORECASE)


def _name_suffix_regex() -> re.Pattern:
    alts = "|".join(sorted(seeds.NAME_SUFFIXES, key=len, reverse=True))
    return re.compile(rf"[\s,]+({alts})\.?$", re.IGNORECASE)


def _org_suffix_regex() -> re.Pattern:
    # ' X' / ',X' / '.X' / '_X' trailing variants (macros/org_suffixes.sql:1-75)
    alts = "|".join(sorted(seeds.ORG_SUFFIXES, key=len, reverse=True))
    return re.compile(rf"[\s,._]+({alts})\.?$", re.IGNORECASE)


def _street_suffix_regex() -> re.Pattern:
    # abbreviation → long form, word-boundary, optional trailing '.'
    alts = "|".join(
        sorted((re.escape(a) for a in seeds.STREET_SUFFIXES.values()), key=len, reverse=True)
    )
    return re.compile(rf"\b({alts})\.?(?=\s|,|$)", re.IGNORECASE)


def _unit_regex() -> re.Pattern:
    alts = "|".join(
        re.escape(u) for u in sorted(seeds.UNIT_DESIGNATORS, key=len, reverse=True)
    )
    return re.compile(rf"\s+({alts})[\s.#]", re.IGNORECASE)


def strip_title(s: pd.Series, pattern: re.Pattern | None = None) -> tuple[pd.Series, pd.Series]:
    """→ (name_no_title, name_title) (macros/name_titles.sql:1-132)."""
    pat = pattern or _title_regex()
    extracted = s.str.extract(pat, expand=False)
    stripped = s.str.replace(pat, "", regex=True).str.strip()
    return empty_to_null(stripped), empty_to_null(extracted)


def strip_name_suffix(s: pd.Series, pattern: re.Pattern | None = None) -> tuple[pd.Series, pd.Series]:
    """→ (name_no_suffix, name_suffix) (macros/name_suffixes.sql:1-37)."""
    pat = pattern or _name_suffix_regex()
    extracted = s.str.extract(pat, expand=False)
    stripped = s.str.replace(pat, "", regex=True).str.strip()
    return empty_to_null(stripped), empty_to_null(extracted)


def strip_org_suffix(s: pd.Series, pattern: re.Pattern | None = None) -> tuple[pd.Series, pd.Series]:
    """→ (org_no_suffix, org_suffix) (macros/org_suffixes.sql:1-75)."""
    pat = pattern or _org_suffix_regex()
    extracted = s.str.extract(pat, expand=False)
    stripped = s.str.replace(pat, "", regex=True).str.strip(" ,.")
    return empty_to_null(stripped), empty_to_null(extracted)


def expand_street_suffixes(s: pd.Series, pattern: re.Pattern | None = None) -> pd.Series:
    """Abbreviation → long form ('123 Main St' → '123 Main Street'), driven by
    the COLLAPSED dict (macros/street_suffixes.sql:518-526 quirk: only the last
    abbreviation per long name is normalized)."""
    pat = pattern or _street_suffix_regex()
    lookup = {v.lower(): k for k, v in seeds.STREET_SUFFIXES.items()}
    return s.str.replace(
        pat, lambda m: lookup.get(m.group(1).lower(), m.group(1)), regex=True
    )


def split_address_lines(s: pd.Series, pattern: re.Pattern | None = None) -> tuple[pd.Series, pd.Series]:
    """Full address → (line_1, line_2): split at comma, else at a secondary-unit
    designator (macros/split_address_lines.sql:1-64)."""
    pat = pattern or _unit_regex()
    line1 = s.copy()
    line2 = pd.Series([None] * len(s), index=s.index, dtype=object)

    has_comma = s.str.contains(",", na=False)
    comma_parts = s.str.split(",", n=1, expand=True)
    if comma_parts.shape[1] < 2:
        comma_parts[1] = None
    line1 = line1.mask(has_comma, comma_parts[0])
    line2 = line2.mask(has_comma, comma_parts[1])

    no_comma = ~has_comma & s.notna()
    m = s.where(no_comma).str.extract(pat, expand=False)
    has_unit = no_comma & m.notna()
    if has_unit.any():
        def _split_at_unit(v: str) -> tuple[str, str | None]:
            mm = pat.search(v)
            if not mm:
                return v, None
            return v[: mm.start()].strip(), v[mm.start() :].strip()

        splits = s[has_unit].map(_split_at_unit)
        line1.loc[has_unit] = splits.map(lambda t: t[0])
        line2.loc[has_unit] = splits.map(lambda t: t[1])
    return trim_chars(line1.str.strip()), empty_to_null(line2.str.strip())


def split_first_last(s: pd.Series) -> tuple[pd.Series, pd.Series]:
    """'Last, First' vs 'First Last' (int_customer360__stripe.sql:315-335)."""
    comma = s.str.contains(",", na=False)
    cp = s.str.split(",", n=1, expand=True)
    if cp.shape[1] < 2:
        cp[1] = None
    sp = s.str.rsplit(" ", n=1, expand=True)
    if sp.shape[1] < 2:
        sp[1] = None
    first = sp[0].mask(comma, cp[1].str.strip() if cp[1] is not None else None)
    last = sp[1].mask(comma, cp[0].str.strip())
    one_token = ~comma & ~s.str.contains(" ", na=False)
    first = first.mask(one_token, s)
    last = last.mask(one_token)
    return empty_to_null(first.str.strip()), empty_to_null(last.str.strip())


def recombine_name(first: pd.Series, last: pd.Series) -> pd.Series:
    """coalesce(first,'') || ' ' || coalesce(last,'') with conditional space
    (int_customer360__marketo.sql:302,307)."""
    f = first.fillna("")
    l = last.fillna("")  # noqa: E741
    both = (f != "") & (l != "")
    out = f.mask(both, f + " " + l)
    out = out.mask((f == "") & (l != ""), l)
    return empty_to_null(out)


def add_nicknames(first_name: pd.Series, lookup: dict[str, list[str]] | None = None) -> pd.Series:
    """lower(first_name) → ', '-joined canonical names; the fan-out+collapse
    nickname join (int_customer360__marketo.sql:469-475) as a broadcast
    multimap lookup — no shuffle, pinned sort order."""
    lk = lookup if lookup is not None else seeds.nickname_lookup()
    return first_name.str.lower().map(
        lambda v: ", ".join(lk[v]) if isinstance(v, str) and v in lk else None
    )


def resolve_country(code: pd.Series, long_name: pd.Series, lookup: dict[str, str] | None = None) -> pd.Series:
    """Broadcast OR-join on (code | name | alt name) → alpha-2, keys tried in
    order (int_customer360__marketo.sql:177-186)."""
    lk = lookup if lookup is not None else seeds.country_lookup()

    def _resolve(c, n):
        if isinstance(c, str) and c.upper() in lk:
            return lk[c.upper()]
        if isinstance(n, str) and n.lower() in lk:
            return lk[n.lower()]
        return None

    return pd.Series(
        [_resolve(c, n) for c, n in zip(code, long_name)], index=code.index, dtype=object
    )


def resolve_state(
    state_code: pd.Series,
    state_long: pd.Series,
    country_a2: pd.Series,
    lookup: dict[tuple[str, str], str] | None = None,
) -> pd.Series:
    """Two-level broadcast join {(country, code-or-name) → code}
    (int_customer360__marketo.sql:189-196)."""
    lk = lookup if lookup is not None else seeds.state_lookup()

    def _resolve(sc, sl, ca):
        if not isinstance(ca, str):
            return None
        if isinstance(sc, str) and (ca, sc.lower()) in lk:
            return lk[(ca, sc.lower())]
        if isinstance(sl, str) and (ca, sl.lower()) in lk:
            return lk[(ca, sl.lower())]
        return None

    return pd.Series(
        [_resolve(sc, sl, ca) for sc, sl, ca in zip(state_code, state_long, country_a2)],
        index=state_code.index,
        dtype=object,
    )


class Cleaner:
    """Actor-pool stage bundling the compiled state (SURVEY.md §2.3): seed
    dicts + regexes built once per actor. Subclasses / callers pick which
    kernels to apply per source table (see pipelines/customer360.py)."""

    def __init__(self):
        self.title_re = _title_regex()
        self.name_suffix_re = _name_suffix_regex()
        self.org_suffix_re = _org_suffix_regex()
        self.street_re = _street_suffix_regex()
        self.unit_re = _unit_regex()
        self.countries = seeds.country_lookup()
        self.states = seeds.state_lookup()
        self.nicknames = seeds.nickname_lookup()
