"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry that has an ``oracle_sql()`` entry at the given
sf dir, converts both sides to pandas, sorts columns by name and rows by value,
and compares (a) row count, (b) column names, (c) exact values, and (d) pandas
DTYPES — the driver's value hash is dtype-sensitive (DuckDB HUGEINT hashes as
float64; timestamp[s] != timestamp[us]), so a dtype mismatch here predicts a
``hash_match: false`` in CORRECTNESS_r{N}.json even when values are equal.

    python scripts/driver_check.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault(
    "RAY_DATA_LOGGING_CONFIG",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "ray_data_logging.yaml"),
)

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            logging_level="ERROR",
        )
    import logging

    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __ray_entry__

    qs = __ray_entry__.queries()
    oracles = __ray_entry__.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    failures = []
    for name in sorted(oracles):
        if only and name not in only:
            continue
        got = qs[name](sf_dir)
        if hasattr(got, "to_pandas"):
            got = got.to_pandas()
        want = con.sql(oracles[name]).df()
        problems = []
        if sorted(got.columns) != sorted(want.columns):
            problems.append(f"cols {sorted(got.columns)} vs {sorted(want.columns)}")
        if len(got) != len(want):
            problems.append(f"rows {len(got)} vs {len(want)}")
        if not problems:
            g, w = normalize(got), normalize(want)
            dt_diff = {
                c: (str(g[c].dtype), str(w[c].dtype))
                for c in g.columns
                if str(g[c].dtype) != str(w[c].dtype)
            }
            if dt_diff:
                problems.append(f"dtypes {dt_diff}")
            try:
                pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
            except AssertionError as e:
                problems.append(f"values: {str(e).splitlines()[-1][:200]}")
        status = "OK " if not problems else "FAIL"
        print(f"{status} {name}" + ("" if not problems else f" — {'; '.join(problems)}"))
        if problems:
            failures.append(name)
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
