"""PipelineConfig — the engine's user-extension surface (SURVEY.md §2.10).

Replaces the reference's Jinja vars with a plain dataclass consumed by stages:
- ``customer360__using_{marketo,stripe,zendesk}``  → ``enabled_sources`` (2-of-3
  required, compile error otherwise — int_customer360__source_matches.sql:373)
- ``customer360_grain_<source>``                    → ``grains`` ('individual'
  switches person-name matching, 'organization' switches to org names —
  README.md:64-73; source_matches.sql:143-144)
- ``customer360_internal_match_ids``                → ``internal_match_ids``
  (extra exact-match key columns injected through the DAG — README.md:85-120)
- ``stripe_*_extract_sql`` custom extractors        → ``stripe_extractors``
  (callables splicing user logic into the Stripe name projection —
  int_customer360__stripe.sql:81-88)
- ``adapter.dispatch`` per-warehouse impls          → plain Python callables
  (``similarity_fn`` for the fuzzy scorer)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

VALID_SOURCES = ("marketo", "stripe", "zendesk")
VALID_GRAINS = ("individual", "organization")


@dataclass(frozen=True)
class MapTableSpec:
    """Optional external map table joined in to fetch a match key
    (int_customer360__marketo.sql:26-37; README.md:117-120): the source row is
    left-joined to ``table`` on ``join_with_map_on = map_table_join_on`` and
    the match id is read from the map side's ``match_key`` column."""

    table: object  # pyarrow.Table (read via ray.data.read_parquet(...).to_arrow_refs or readers)
    join_with_map_on: str
    map_table_join_on: str


@dataclass(frozen=True)
class MatchIdSpec:
    """One internal match-id set: a name plus the per-source column holding it
    (README.md:85-120). Rows sharing a non-null value on these columns match
    exactly — injected as the first OR-arm of the blocking join
    (int_customer360__source_matches.sql:58-62) and, when ``customer_grain``
    is 'individual' (or either side runs at organization grain), as an extra
    OR-arm of the confirmation filter (:133-140)."""

    name: str
    source_columns: dict[str, str] = field(default_factory=dict)
    customer_grain: str = "individual"
    map_tables: dict[str, MapTableSpec] = field(default_factory=dict)


@dataclass
class PipelineConfig:
    enabled_sources: tuple[str, ...] = VALID_SOURCES
    grains: dict[str, str] = field(
        default_factory=lambda: {s: "individual" for s in VALID_SOURCES}
    )
    internal_match_ids: tuple[MatchIdSpec, ...] = ()
    stripe_extractors: dict[str, Callable] = field(default_factory=dict)
    similarity_threshold: float = 0.95
    similarity_fn: Callable | None = None  # default: functions.levenshtein

    # CDC engine knobs
    num_partitions: int = 32
    num_salts: int = 8
    hot_threshold: float = 0.05
    max_runs: int = 4

    def __post_init__(self):
        bad = [s for s in self.enabled_sources if s not in VALID_SOURCES]
        if bad:
            raise ValueError(f"unknown sources: {bad}")
        if len(self.enabled_sources) < 2:
            # the reference compiles to an error with <2 sources
            # (int_customer360__source_matches.sql:358-375)
            raise ValueError("customer360 requires at least 2 enabled sources")
        for s, g in self.grains.items():
            if g not in VALID_GRAINS:
                raise ValueError(f"invalid grain {g!r} for source {s!r}")
