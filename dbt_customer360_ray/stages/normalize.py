"""Cleaning normalizers — Ray-Data re-expressions of the reference's cleaning
models (/root/reference/models/cleaning/int_customer360__{marketo,stripe,
zendesk}.sql and macros/). Each kernel is vectorized; the hot string chains
run on pyarrow.compute (RE2 + C string kernels — measured ~2x the whole
cleaning stage vs the pandas object-dtype originals, whose str accessor is a
per-row Python loop), with pandas kept only where RE2 cannot express the
semantics (the street-suffix lookahead + callable replacement, the
unit-designator address split) or where a dict map is the right tool (the
broadcast seed lookups). The ``Cleaner`` actor compiles every regex + seed
dict once per actor (__init__) and applies whole column groups per batch
(__call__) — the reference's standardize → tokenize → restandardize CTE chain
as one actor-pool map_batches stage.

Kernel contract: pandas Series[str] in → object-dtype Series (None for null)
out, so DataFrames round-trip to Arrow with proper nulls either way.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..sources import seeds

# ---------------------------------------------------------------------------
# pyarrow bridge helpers
# ---------------------------------------------------------------------------


def _arr(s: pd.Series) -> pa.Array:
    """Series → string Array (NaN/None → null)."""
    return pa.Array.from_pandas(s, type=pa.string())


def _ser(a, index) -> pd.Series:
    """Array → object-dtype Series (null → None), preserving the index."""
    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    return pd.Series(a.to_pandas().to_numpy(dtype=object, na_value=None), index=index)


def _obj(s: pd.Series) -> pd.Series:
    """NaN → None in an object Series (post-``map`` cleanup)."""
    return s.astype(object).where(s.notna(), None)


def _empty_to_null_arr(a: pa.Array) -> pa.Array:
    return pc.if_else(pc.equal(a, ""), pa.scalar(None, pa.string()), a)


# ---------------------------------------------------------------------------
# scalar-column kernels (each takes/returns a pandas Series of strings)
# ---------------------------------------------------------------------------


def empty_to_null(s: pd.Series) -> pd.Series:
    """`case when x = '' then null` applied to every output column
    (int_customer360__marketo.sql:383-475 `final` CTE). All missing values
    normalized to None (not NaN) so Arrow round-trips them as proper nulls."""
    return _ser(_empty_to_null_arr(_arr(s)), s.index)


def normalize_email(s: pd.Series) -> pd.Series:
    """lower; '' → null (int_customer360__marketo.sql:117,392-394)."""
    return _ser(
        _empty_to_null_arr(pc.utf8_trim_whitespace(pc.utf8_lower(_arr(s)))), s.index
    )


def email_local_domain(s: pd.Series) -> tuple[pd.Series, pd.Series]:
    """split at '@'; local part stripped of non-alphanumerics
    (int_customer360__marketo.sql:220-221,298)."""
    email = _empty_to_null_arr(pc.utf8_trim_whitespace(pc.utf8_lower(_arr(s))))
    parts = pc.split_pattern(email, "@", max_splits=1)
    local = pc.replace_substring_regex(pc.list_element(parts, 0), "[^0-9a-z]", "")
    # rows without '@' have a 1-element split: the joined empty slice is ''
    # → null, exactly the pandas expand-split's missing second column
    domain = pc.binary_join(pc.list_slice(parts, 1, 2), "")
    return (
        _ser(_empty_to_null_arr(local), s.index),
        _ser(_empty_to_null_arr(domain), s.index),
    )


_PHONE_NA = ("NA", "na", "N/A", "n/a")


def normalize_phone(s: pd.Series) -> tuple[pd.Series, pd.Series]:
    """'#'→'ext'; strip non-alphanumerics; 'extension'→'ext'; split number/ext
    at 'ext'; '+1' prefix when exactly 10 digits; 'NA'→null
    (int_customer360__marketo.sql:129-131,236-241,320-333; zendesk :99 maps NA)."""
    a = _arr(s)
    a = pc.if_else(
        pc.is_in(a, value_set=pa.array(_PHONE_NA, pa.string())),
        pa.scalar(None, pa.string()),
        a,
    )
    p = pc.utf8_lower(a)
    p = pc.replace_substring(p, "#", "ext")
    p = pc.replace_substring_regex(p, "[^0-9a-z]", "")
    p = pc.replace_substring(p, "extension", "ext")
    parts = pc.split_pattern(p, "ext", max_splits=1)
    number = pc.list_element(parts, 0)
    extension = pc.binary_join(pc.list_slice(parts, 1, 2), "")
    ten = pc.equal(pc.utf8_length(number), 10)
    number = pc.if_else(
        ten, pc.binary_join_element_wise(pa.scalar("+1"), number, ""), number
    )
    eleven = pc.and_(
        pc.equal(pc.utf8_length(number), 11), pc.starts_with(number, "1")
    )
    number = pc.if_else(
        eleven, pc.binary_join_element_wise(pa.scalar("+"), number, ""), number
    )
    return (
        _ser(_empty_to_null_arr(number), s.index),
        _ser(_empty_to_null_arr(extension), s.index),
    )


_GARBAGE = ("#ref!", "#n/a", "#value!", "null", "none")


def _degarbage_arr(a: pa.Array) -> pa.Array:
    """#REF! spreadsheet garbage → null (int_customer360__marketo.sql:44-103)."""
    return pc.if_else(
        pc.is_in(pc.utf8_lower(a), value_set=pa.array(_GARBAGE, pa.string())),
        pa.scalar(None, pa.string()),
        a,
    )


def disambiguate_state_country(
    state_like: pd.Series, country_like: pd.Series
) -> tuple[pd.Series, pd.Series, pd.Series, pd.Series]:
    """Length heuristic (int_customer360__marketo.sql:44-103): a value with
    ≤3 chars is a code (uppercased), longer is a long name. Returns
    (state_code, state_long, country_code, country_long)."""
    null = pa.scalar(None, pa.string())
    st = _degarbage_arr(_empty_to_null_arr(pc.utf8_trim_whitespace(_arr(state_like))))
    co = _degarbage_arr(_empty_to_null_arr(pc.utf8_trim_whitespace(_arr(country_like))))
    st_is_code = pc.less_equal(pc.utf8_length(st), 3)
    co_is_code = pc.less_equal(pc.utf8_length(co), 2)
    state_code = pc.utf8_upper(pc.if_else(st_is_code, st, null))
    state_long = pc.if_else(pc.invert(pc.fill_null(st_is_code, True)), st, null)
    country_code = pc.utf8_upper(pc.if_else(co_is_code, co, null))
    country_long = pc.if_else(pc.invert(pc.fill_null(co_is_code, True)), co, null)
    ix = state_like.index
    return (
        _ser(_empty_to_null_arr(state_code), ix),
        _ser(_empty_to_null_arr(state_long), ix),
        _ser(_empty_to_null_arr(country_code), ix),
        _ser(_empty_to_null_arr(country_long), ix),
    )


def normalize_postal(s: pd.Series) -> pd.Series:
    """REGEXP_REPLACE(cast(x as string),'[^0-9]','')
    (int_customer360__marketo.sql:142,151,159)."""
    s = s.astype("string")  # SQL-style cast first; the regex runs in RE2
    return _ser(
        _empty_to_null_arr(pc.replace_substring_regex(_arr(s), "[^0-9]", "")), s.index
    )


def trim_chars(s: pd.Series, chars: str = " ,") -> pd.Series:
    """adapter-dispatched trim(' ,') (macros/trim.sql:1-23)."""
    return _ser(_empty_to_null_arr(pc.utf8_trim(_arr(s), chars)), s.index)


def classify_ip(s: pd.Series) -> pd.Series:
    """like '%:%' → 'ipv6' else 'ipv4' (customer360__ip_address.sql:23-25)."""
    a = _arr(s)
    return _ser(
        pc.if_else(pc.match_substring(a, ":"), pa.scalar("ipv6"), pa.scalar("ipv4")),
        s.index,
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
    # (lookahead — NOT RE2-portable, so this one stays a pandas kernel)
    alts = "|".join(
        sorted((re.escape(a) for a in seeds.STREET_SUFFIXES.values()), key=len, reverse=True)
    )
    return re.compile(rf"\b({alts})\.?(?=\s|,|$)", re.IGNORECASE)


def _unit_regex() -> re.Pattern:
    alts = "|".join(
        re.escape(u) for u in sorted(seeds.UNIT_DESIGNATORS, key=len, reverse=True)
    )
    return re.compile(rf"\s+({alts})[\s.#]", re.IGNORECASE)


def _re2(pat: re.Pattern) -> tuple[str, str]:
    """Compiled (IGNORECASE) pattern → equivalent RE2 strings for
    (replace, extract). The three strip patterns each have exactly ONE group,
    and its '(' is the first in the pattern string; extract_regex needs it
    named. All three bodies are RE2-safe (alternations of literals, anchors,
    character classes — no lookaround)."""
    return "(?i)" + pat.pattern, "(?i)" + pat.pattern.replace("(", "(?P<g>", 1)


def _strip_extract(
    s: pd.Series, pat: re.Pattern, trim: str | None
) -> tuple[pd.Series, pd.Series]:
    """Shared RE2 body for the title/suffix strippers: extract the single
    group, delete the match, trim."""
    rep, ext = _re2(pat)
    a = _arr(s)
    extracted = pc.struct_field(pc.extract_regex(a, ext), "g")
    stripped = pc.replace_substring_regex(a, rep, "")
    stripped = pc.utf8_trim(stripped, trim) if trim else pc.utf8_trim_whitespace(stripped)
    return (
        _ser(_empty_to_null_arr(stripped), s.index),
        _ser(_empty_to_null_arr(extracted), s.index),
    )


def strip_title(s: pd.Series, pattern: re.Pattern | None = None) -> tuple[pd.Series, pd.Series]:
    """→ (name_no_title, name_title) (macros/name_titles.sql:1-132)."""
    return _strip_extract(s, pattern or _title_regex(), None)


def strip_name_suffix(s: pd.Series, pattern: re.Pattern | None = None) -> tuple[pd.Series, pd.Series]:
    """→ (name_no_suffix, name_suffix) (macros/name_suffixes.sql:1-37)."""
    return _strip_extract(s, pattern or _name_suffix_regex(), None)


def strip_org_suffix(s: pd.Series, pattern: re.Pattern | None = None) -> tuple[pd.Series, pd.Series]:
    """→ (org_no_suffix, org_suffix) (macros/org_suffixes.sql:1-75)."""
    return _strip_extract(s, pattern or _org_suffix_regex(), " ,.")


def expand_street_suffixes(s: pd.Series, pattern: re.Pattern | None = None) -> pd.Series:
    """Abbreviation → long form ('123 Main St' → '123 Main Street'), driven by
    the COLLAPSED dict (macros/street_suffixes.sql:518-526 quirk: only the last
    abbreviation per long name is normalized). Pandas kernel: the pattern's
    lookahead and per-match dict replacement are outside RE2."""
    pat = pattern or _street_suffix_regex()
    lookup = {v.lower(): k for k, v in seeds.STREET_SUFFIXES.items()}
    return s.str.replace(
        pat, lambda m: lookup.get(m.group(1).lower(), m.group(1)), regex=True
    )


def split_address_lines(s: pd.Series, pattern: re.Pattern | None = None) -> tuple[pd.Series, pd.Series]:
    """Full address → (line_1, line_2): split at comma, else at a secondary-unit
    designator (macros/split_address_lines.sql:1-64). Pandas kernel: the
    unit-designator fallback needs match positions."""
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
    f = pc.fill_null(_arr(first), "")
    l = pc.fill_null(_arr(last), "")  # noqa: E741
    f_has, l_has = pc.not_equal(f, ""), pc.not_equal(l, "")
    out = pc.if_else(
        pc.and_(f_has, l_has),
        pc.binary_join_element_wise(f, l, " "),
        pc.if_else(pc.and_(pc.invert(f_has), l_has), l, f),
    )
    return _ser(_empty_to_null_arr(out), first.index)


def add_nicknames(first_name: pd.Series, lookup: dict[str, list[str]] | None = None) -> pd.Series:
    """lower(first_name) → ', '-joined canonical names; the fan-out+collapse
    nickname join (int_customer360__marketo.sql:469-475) as a broadcast
    multimap lookup — a vectorized dict map, no shuffle, pinned sort order."""
    lk = lookup if lookup is not None else seeds.nickname_lookup()
    joined = {k: ", ".join(v) for k, v in lk.items()}
    return _obj(first_name.str.lower().map(joined))


def resolve_country(code: pd.Series, long_name: pd.Series, lookup: dict[str, str] | None = None) -> pd.Series:
    """Broadcast OR-join on (code | name | alt name) → alpha-2, keys tried in
    order (int_customer360__marketo.sql:177-186). Two vectorized dict maps."""
    lk = lookup if lookup is not None else seeds.country_lookup()
    by_code = code.str.upper().map(lk)
    by_name = long_name.str.lower().map(lk)
    return _obj(by_code.where(by_code.notna(), by_name))


def resolve_state(
    state_code: pd.Series,
    state_long: pd.Series,
    country_a2: pd.Series,
    lookup: dict[tuple[str, str], str] | None = None,
) -> pd.Series:
    """Two-level broadcast join {(country, code-or-name) → code}
    (int_customer360__marketo.sql:189-196). Tuple-keyed dict maps (misses —
    including null country — fall through, exactly the per-row original)."""
    lk = lookup if lookup is not None else seeds.state_lookup()
    ca = country_a2.to_numpy(dtype=object)
    k1 = pd.Series(
        list(zip(ca, state_code.str.lower().to_numpy(dtype=object))),
        index=state_code.index,
    )
    k2 = pd.Series(
        list(zip(ca, state_long.str.lower().to_numpy(dtype=object))),
        index=state_code.index,
    )
    by_code = k1.map(lk)
    return _obj(by_code.where(by_code.notna(), k2.map(lk)))


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
