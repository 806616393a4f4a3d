"""Seed lookup dictionaries — the engine's own compact equivalents of the
reference's three seed CSVs (/root/reference/seeds/: customer360__country_codes
249 rows, customer360__state_territory_codes 1,677 rows, customer360__nicknames
2,673 rows) plus the Jinja constant tables expanded in macros
(name_titles.sql, name_suffixes.sql, org_suffixes.sql, street_suffixes.sql,
split_address_lines.sql).

These are original, representative dictionaries covering the same semantics
(NOT copies of the reference data): broadcast-joined lookups for country/state
canonicalization, nickname fan-out, and the regex alternation tables the
cleaning models compile. At runtime each is loaded once per actor / broadcast
via ray.put (SURVEY.md §2.3).

The street-suffix table deliberately mirrors the reference's collapsed-dict
behavior (macros/street_suffixes.sql:3-516 has duplicate Jinja keys, so only
the LAST abbreviation per long name survives compilation — e.g. only 'St' maps
to 'Street'): one abbreviation per long form.
"""

from __future__ import annotations

# (country_name, alternative_country_name, alpha_2) — seed customer360__country_codes shape
COUNTRY_CODES: list[tuple[str, str | None, str]] = [
    ("United States of America", "United States", "US"),
    ("United Kingdom of Great Britain and Northern Ireland", "United Kingdom", "GB"),
    ("Canada", None, "CA"),
    ("Australia", None, "AU"),
    ("Germany", "Deutschland", "DE"),
    ("France", None, "FR"),
    ("Spain", "España", "ES"),
    ("Italy", "Italia", "IT"),
    ("Netherlands", "Holland", "NL"),
    ("Belgium", None, "BE"),
    ("Switzerland", None, "CH"),
    ("Austria", "Österreich", "AT"),
    ("Sweden", None, "SE"),
    ("Norway", None, "NO"),
    ("Denmark", None, "DK"),
    ("Finland", None, "FI"),
    ("Ireland", None, "IE"),
    ("Portugal", None, "PT"),
    ("Poland", "Polska", "PL"),
    ("Czechia", "Czech Republic", "CZ"),
    ("Japan", "Nippon", "JP"),
    ("China", "People's Republic of China", "CN"),
    ("India", "Bharat", "IN"),
    ("Brazil", "Brasil", "BR"),
    ("Mexico", "México", "MX"),
    ("Argentina", None, "AR"),
    ("Chile", None, "CL"),
    ("Colombia", None, "CO"),
    ("Peru", "Perú", "PE"),
    ("South Africa", None, "ZA"),
    ("Nigeria", None, "NG"),
    ("Egypt", None, "EG"),
    ("Kenya", None, "KE"),
    ("Israel", None, "IL"),
    ("Saudi Arabia", None, "SA"),
    ("United Arab Emirates", "UAE", "AE"),
    ("Turkey", "Türkiye", "TR"),
    ("Russian Federation", "Russia", "RU"),
    ("Ukraine", None, "UA"),
    ("South Korea", "Republic of Korea", "KR"),
    ("Singapore", None, "SG"),
    ("Malaysia", None, "MY"),
    ("Thailand", None, "TH"),
    ("Vietnam", "Viet Nam", "VN"),
    ("Philippines", None, "PH"),
    ("Indonesia", None, "ID"),
    ("New Zealand", "Aotearoa", "NZ"),
    ("Greece", "Hellas", "GR"),
    ("Hungary", "Magyarország", "HU"),
    ("Romania", None, "RO"),
]

# (state_territory, state_code, alpha2_country_code)
STATE_CODES: list[tuple[str, str, str]] = [
    ("Alabama", "AL", "US"), ("Alaska", "AK", "US"), ("Arizona", "AZ", "US"),
    ("Arkansas", "AR", "US"), ("California", "CA", "US"), ("Colorado", "CO", "US"),
    ("Connecticut", "CT", "US"), ("Delaware", "DE", "US"), ("Florida", "FL", "US"),
    ("Georgia", "GA", "US"), ("Hawaii", "HI", "US"), ("Idaho", "ID", "US"),
    ("Illinois", "IL", "US"), ("Indiana", "IN", "US"), ("Iowa", "IA", "US"),
    ("Kansas", "KS", "US"), ("Kentucky", "KY", "US"), ("Louisiana", "LA", "US"),
    ("Maine", "ME", "US"), ("Maryland", "MD", "US"), ("Massachusetts", "MA", "US"),
    ("Michigan", "MI", "US"), ("Minnesota", "MN", "US"), ("Mississippi", "MS", "US"),
    ("Missouri", "MO", "US"), ("Montana", "MT", "US"), ("Nebraska", "NE", "US"),
    ("Nevada", "NV", "US"), ("New Hampshire", "NH", "US"), ("New Jersey", "NJ", "US"),
    ("New Mexico", "NM", "US"), ("New York", "NY", "US"), ("North Carolina", "NC", "US"),
    ("North Dakota", "ND", "US"), ("Ohio", "OH", "US"), ("Oklahoma", "OK", "US"),
    ("Oregon", "OR", "US"), ("Pennsylvania", "PA", "US"), ("Rhode Island", "RI", "US"),
    ("South Carolina", "SC", "US"), ("South Dakota", "SD", "US"), ("Tennessee", "TN", "US"),
    ("Texas", "TX", "US"), ("Utah", "UT", "US"), ("Vermont", "VT", "US"),
    ("Virginia", "VA", "US"), ("Washington", "WA", "US"), ("West Virginia", "WV", "US"),
    ("Wisconsin", "WI", "US"), ("Wyoming", "WY", "US"),
    ("District of Columbia", "DC", "US"), ("Puerto Rico", "PR", "US"),
    ("Ontario", "ON", "CA"), ("Quebec", "QC", "CA"), ("British Columbia", "BC", "CA"),
    ("Alberta", "AB", "CA"), ("Manitoba", "MB", "CA"), ("Saskatchewan", "SK", "CA"),
    ("Nova Scotia", "NS", "CA"), ("New Brunswick", "NB", "CA"),
    ("Newfoundland and Labrador", "NL", "CA"), ("Prince Edward Island", "PE", "CA"),
]

# (canonical_name, nickname) — many-to-many like the reference's nicknames seed
NICKNAMES: list[tuple[str, str]] = [
    ("william", "bill"), ("william", "will"), ("william", "billy"), ("william", "liam"),
    ("robert", "bob"), ("robert", "rob"), ("robert", "bobby"), ("robert", "bert"),
    ("richard", "rick"), ("richard", "dick"), ("richard", "rich"),
    ("james", "jim"), ("james", "jimmy"), ("james", "jamie"),
    ("john", "jack"), ("john", "johnny"), ("jonathan", "jon"), ("jonathan", "jack"),
    ("michael", "mike"), ("michael", "mick"), ("michael", "mikey"),
    ("christopher", "chris"), ("christopher", "kit"),
    ("joseph", "joe"), ("joseph", "joey"),
    ("thomas", "tom"), ("thomas", "tommy"),
    ("charles", "charlie"), ("charles", "chuck"),
    ("daniel", "dan"), ("daniel", "danny"),
    ("matthew", "matt"), ("anthony", "tony"), ("andrew", "andy"), ("andrew", "drew"),
    ("steven", "steve"), ("stephen", "steve"), ("edward", "ed"), ("edward", "ted"),
    ("edward", "eddie"), ("benjamin", "ben"), ("samuel", "sam"), ("alexander", "alex"),
    ("nicholas", "nick"), ("zachary", "zach"), ("patrick", "pat"), ("timothy", "tim"),
    ("gregory", "greg"), ("kenneth", "ken"), ("ronald", "ron"), ("donald", "don"),
    ("elizabeth", "liz"), ("elizabeth", "beth"), ("elizabeth", "betty"), ("elizabeth", "eliza"),
    ("margaret", "peggy"), ("margaret", "maggie"), ("margaret", "meg"),
    ("katherine", "kate"), ("katherine", "kathy"), ("katherine", "katie"),
    ("catherine", "cathy"), ("catherine", "kate"),
    ("jennifer", "jen"), ("jennifer", "jenny"),
    ("jessica", "jess"), ("patricia", "pat"), ("patricia", "tricia"), ("patricia", "patty"),
    ("barbara", "barb"), ("susan", "sue"), ("susan", "susie"), ("deborah", "deb"),
    ("deborah", "debbie"), ("rebecca", "becky"), ("victoria", "vicky"), ("victoria", "tori"),
    ("kimberly", "kim"), ("michelle", "shelly"), ("stephanie", "steph"),
    ("samantha", "sam"), ("alexandra", "alex"), ("natalie", "nat"), ("nathaniel", "nat"),
    ("abigail", "abby"), ("amanda", "mandy"), ("melissa", "mel"), ("christina", "chris"),
    ("christina", "tina"), ("veronica", "ronnie"), ("gabriella", "gabby"),
]

# leading honorifics, matched case-insensitively with optional trailing '.'
NAME_TITLES: list[str] = [
    "mr", "mrs", "ms", "miss", "mx", "dr", "doctor", "prof", "professor",
    "rev", "reverend", "fr", "father", "sr", "sister", "capt", "captain",
    "col", "colonel", "cpl", "corporal", "maj", "major", "gen", "general",
    "lt", "lieutenant", "sgt", "sergeant", "cmdr", "commander", "adm", "admiral",
    "hon", "honorable", "judge", "justice", "pres", "president", "gov", "governor",
    "sen", "senator", "rep", "representative", "amb", "ambassador", "sir", "dame",
    "lord", "lady", "rabbi", "imam", "pastor", "deacon", "elder", "chief",
]

# trailing generational / professional suffixes
NAME_SUFFIXES: list[str] = [
    "jr", "sr", "ii", "iii", "iv", "v", "esq", "esquire", "phd", "md", "dds",
    "dvm", "jd", "cpa", "rn", "do", "od", "pe", "cfa", "mba", "ma", "mf",
]

# trailing legal entity suffixes (matched with ' X', ',X', '.X', '_X' variants)
ORG_SUFFIXES: list[str] = [
    "inc", "incorporated", "llc", "llp", "lp", "ltd", "limited", "co", "corp",
    "corporation", "company", "plc", "gmbh", "ag", "sa", "srl", "sarl", "bv",
    "nv", "oy", "ab", "as", "aps", "kk", "pty", "pte", "pllc", "pc", "sc",
    "group", "holdings", "international", "intl", "enterprises", "ventures",
]

# long form → single abbreviation (COLLAPSED, reproducing the reference quirk)
STREET_SUFFIXES: dict[str, str] = {
    "Street": "St", "Avenue": "Av", "Boulevard": "Blvd", "Drive": "Dr",
    "Lane": "Ln", "Road": "Rd", "Court": "Ct", "Circle": "Cir", "Place": "Pl",
    "Terrace": "Ter", "Trail": "Trl", "Parkway": "Pkwy", "Highway": "Hwy",
    "Square": "Sq", "Loop": "Lp", "Alley": "Aly", "Crossing": "Xing",
    "Expressway": "Expy", "Freeway": "Fwy", "Junction": "Jct", "Point": "Pt",
    "Ridge": "Rdg", "Station": "Sta", "Summit": "Smt", "Turnpike": "Tpke",
    "Valley": "Vly", "View": "Vw", "Village": "Vlg", "Way": "Wy",
}

# secondary-unit designators for address line splitting
UNIT_DESIGNATORS: list[str] = [
    "APT", "APARTMENT", "STE", "SUITE", "FL", "FLOOR", "UNIT", "RM", "ROOM",
    "BLDG", "BUILDING", "DEPT", "DEPARTMENT", "LOT", "SPC", "SPACE", "TRLR",
    "TRAILER", "BSMT", "BASEMENT", "FRNT", "FRONT", "LBBY", "LOBBY", "LOWR",
    "LOWER", "OFC", "OFFICE", "PH", "PENTHOUSE", "REAR", "SIDE", "UPPR", "UPPER",
    "#",
]

# accented char → ascii fold (macros/remove_accents.sql — defined but unused in
# the reference; provided here as an optional normalizer)
ACCENT_FOLD: dict[str, str] = {
    "á": "a", "à": "a", "â": "a", "ä": "a", "ã": "a", "å": "a",
    "é": "e", "è": "e", "ê": "e", "ë": "e",
    "í": "i", "ì": "i", "î": "i", "ï": "i",
    "ó": "o", "ò": "o", "ô": "o", "ö": "o", "õ": "o", "ø": "o",
    "ú": "u", "ù": "u", "û": "u", "ü": "u",
    "ý": "y", "ÿ": "y", "ñ": "n", "ç": "c", "ß": "ss",
    "Á": "A", "À": "A", "Â": "A", "Ä": "A", "Ã": "A", "Å": "A",
    "É": "E", "È": "E", "Ê": "E", "Ë": "E",
    "Í": "I", "Ì": "I", "Î": "I", "Ï": "I",
    "Ó": "O", "Ò": "O", "Ô": "O", "Ö": "O", "Õ": "O", "Ø": "O",
    "Ú": "U", "Ù": "U", "Û": "U", "Ü": "U",
    "Ý": "Y", "Ñ": "N", "Ç": "C",
}


def country_lookup() -> dict[str, str]:
    """Try-keys-in-order lookup used by the broadcast OR-join
    (int_customer360__marketo.sql:177-186): code, long name, alt name → alpha-2."""
    out: dict[str, str] = {}
    for name, alt, a2 in COUNTRY_CODES:
        out[a2.upper()] = a2
        out[name.lower()] = a2
        if alt:
            out[alt.lower()] = a2
    return out


def state_lookup() -> dict[tuple[str, str], str]:
    """(country_a2, code-or-long-name-lower) → canonical state code
    (int_customer360__marketo.sql:189-196 two-key join)."""
    out: dict[tuple[str, str], str] = {}
    for long_name, code, country in STATE_CODES:
        out[(country, code.lower())] = code
        out[(country, long_name.lower())] = code
    return out


def nickname_lookup() -> dict[str, list[str]]:
    """lower(nickname) → sorted canonical names. Sort order pinned so the
    joined string is byte-stable (SURVEY.md §2.5 ordering caveat)."""
    out: dict[str, list[str]] = {}
    for canonical, nick in NICKNAMES:
        out.setdefault(nick, []).append(canonical)
    return {k: sorted(set(v)) for k, v in out.items()}
