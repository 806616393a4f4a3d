"""Parquet sources with pruning — the engine equivalent of the reference's
``ref()``/``source()`` reads (SURVEY.md §2.1).

Always pass ``columns``: a read that loads all columns for a 2-column transform
ships needless bytes through the object store at 100 TB.
"""

from __future__ import annotations

import os


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def read_table(
    sf_dir: str,
    name: str,
    columns: list[str] | None = None,
    rows_per_block: int | None = None,
    **kwargs,
):
    # NOTE: blocks read from pandas-written parquet carry a `pandas` schema
    # metadata blob, which makes their pyarrow schema unhashable and triggers
    # Ray Data's (cosmetic) "Failed to hash the schemas" warning on block
    # merges. Stripping it here would need an extra map_batches stage — a
    # measured ~2s/query regression on groupby paths — so the warning is
    # silenced via logging config instead (scripts/ray_data_logging.yaml).
    #
    # rows_per_block: opt-in block sizing for CHEAP vectorized pipelines. Ray's
    # default fans a small table into 2*cpus tiny blocks; with per-task launch
    # overhead ~50ms, a 3-operator query over 64 near-empty blocks spends
    # seconds scheduling microseconds of compute (measured 3.7s -> 1.0s on the
    # band-join rollup at sf0.1). The parquet footer gives the row count for
    # free; block count = rows/rows_per_block clamped to [1, 4*cpus], so it
    # still scales out with data volume. Leave unset for compute-heavy
    # per-row stages (regex/hashing/matmul) — they want max fan-out even on
    # small tables.
    import ray
    import ray.data

    path = table_path(sf_dir, name)
    if rows_per_block and "override_num_blocks" not in kwargs:
        import pyarrow.parquet as pq

        rows = pq.ParquetFile(path).metadata.num_rows
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        kwargs["override_num_blocks"] = int(
            max(1, min(4 * cpus, -(-rows // rows_per_block)))
        )
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def read_table_arrow(sf_dir: str, name: str, columns: list[str] | None = None):
    """Driver-side Arrow read for small dimension tables (broadcast sides)."""
    import pyarrow.parquet as pq

    return pq.read_table(table_path(sf_dir, name), columns=columns)
