"""Parquet sources with pruning — the engine equivalent of the reference's
``ref()``/``source()`` reads (SURVEY.md §2.1).

Always pass ``columns``: a read that loads all columns for a 2-column transform
ships needless bytes through the object store at 100 TB.
"""

from __future__ import annotations

import os


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def read_table(sf_dir: str, name: str, columns: list[str] | None = None, **kwargs):
    # NOTE: blocks read from pandas-written parquet carry a `pandas` schema
    # metadata blob, which makes their pyarrow schema unhashable and triggers
    # Ray Data's (cosmetic) "Failed to hash the schemas" warning on block
    # merges. Stripping it here would need an extra map_batches stage — a
    # measured ~2s/query regression on groupby paths — so the warning is
    # silenced via logging config instead (scripts/ray_data_logging.yaml).
    import ray.data

    return ray.data.read_parquet(table_path(sf_dir, name), columns=columns, **kwargs)


def read_table_arrow(sf_dir: str, name: str, columns: list[str] | None = None):
    """Driver-side Arrow read for small dimension tables (broadcast sides)."""
    import pyarrow.parquet as pq

    return pq.read_table(table_path(sf_dir, name), columns=columns)
