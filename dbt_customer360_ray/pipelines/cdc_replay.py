"""Flagship pipeline: deterministic CDC replay → converged transcript lake.

Generates (once, cached) the seeded change-stream fixture for a scale factor,
replays it epoch-by-epoch through CdcLake into a fresh lake directory, and
returns the converged state as a streaming Dataset. This is the end-state the
reference reaches with a full `dbt run` rebuild (dbt_project.yml:11), produced
incrementally with exactly-once semantics instead.
"""

from __future__ import annotations

import os
import tempfile

from ..gen import SF_SIZES, write_fixture
from ..state.engine import CdcLake

FIXTURE_ROOT = os.environ.get("GRAFT_FIXTURE_DIR", "/tmp/dbt_c360_ray_fixtures")


def sf_from_dir(sf_dir: str, default: float = 0.001) -> float:
    """Parse '.../sf0.01' → 0.01 (driver passes sf dirs; our CDC fixture scales
    to match)."""
    base = os.path.basename(os.path.normpath(sf_dir))
    if base.startswith("sf"):
        try:
            sf = float(base[2:])
            if sf in SF_SIZES:
                return sf
        except ValueError:
            pass
    return default


def changes_fixture(sf: float, num_epochs: int | None = None) -> dict:
    if num_epochs is None:
        num_epochs = 2 if sf >= 1 else 4  # big scaling fixtures: fewer barriers
    out_dir = os.path.join(FIXTURE_ROOT, f"changes-sf{sf}")
    return write_fixture(out_dir, sf=sf, num_epochs=num_epochs)


def replay(
    sf: float = 0.001,
    lake_dir: str | None = None,
    num_partitions: int = 32,
    num_epochs: int = 4,
    detect_hot: str = "carryover",
):
    """Replay the sf fixture into a (fresh) lake; returns (lake, metrics list)."""
    fx = changes_fixture(sf, num_epochs)
    if lake_dir is None:
        lake_dir = tempfile.mkdtemp(prefix=f"cdc-lake-sf{sf}-")
    lake = CdcLake(os.path.join(lake_dir, "lake"), num_partitions=num_partitions)
    metrics = [lake.apply(p, detect_hot=detect_hot) for p in fx["paths"]]
    return lake, metrics


def flagship(sf: float = 0.001):
    """entry() surface: replay and return the converged lake as a Dataset."""
    lake, _metrics = replay(sf=sf)
    return lake.read()
