"""Stable hashing: partition routing hash + md5 surrogate keys.

Routing hash must be identical across processes, runs and cluster sizes so that
checkpointed partitions line up on resume (SURVEY.md §4.2). Python's builtin
``hash`` is salted per process — never use it for routing. We use
``pandas.util.hash_array`` (SipHash-1-3 with pandas' fixed default key), which is
deterministic, vectorized in C, and platform-stable.

Surrogate keys replicate the reference's ``dbt_utils.generate_surrogate_key``
recipe (md5 of '-'-joined coalesced string casts; see
/root/reference/models/output/customer360__mapping.sql:107,205) so identity
outputs are deterministic and replay-safe.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def stable_hash(values) -> np.ndarray:
    """Vectorized stable uint64 hash of a string (or any) array.

    Accepts a pyarrow Array/ChunkedArray, numpy array, pandas Series or list.
    """
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_pandas()
    if not isinstance(values, pd.Series):
        values = pd.Series(values)
    return pd.util.hash_array(np.asarray(values.to_numpy(dtype=object), dtype=object))


def partition_ids(conv_ids, num_partitions: int) -> np.ndarray:
    """Stable ``hash(conv_id) % P`` as int32 (the engine's one partitioning key)."""
    return (stable_hash(conv_ids) % np.uint64(num_partitions)).astype(np.int32)


_MISSING = "_dbt_utils_surrogate_key_null_"  # the dbt_utils null sentinel


def render_sql_string(col) -> np.ndarray:
    """SQL-style cast-to-string of a column (object ndarray, None for null).

    Matches warehouse ``cast(x as string)`` semantics so surrogate keys
    reproduce dbt_utils outputs: booleans render 'true'/'false' (not Python
    'True'), integral floats / nullable Int64 render '123' (not '123.0'),
    everything else str()s.
    """
    if isinstance(col, (pa.Array, pa.ChunkedArray)):
        col = col.to_pandas()
    s = pd.Series(col)
    mask = pd.isna(s).to_numpy()
    if s.dtype == bool:
        out = np.where(s.to_numpy(), "true", "false").astype(object)
    elif str(s.dtype) in ("Int64", "Int32", "int64", "int32"):
        out = s.astype(object).to_numpy(dtype=object)
        out = np.array(
            [None if v is None or v is pd.NA else str(int(v)) for v in out], dtype=object
        )
    else:
        vals = s.to_numpy(dtype=object)
        out = np.empty(len(vals), dtype=object)
        for i, v in enumerate(vals):
            if v is None:
                continue
            if isinstance(v, bool) or isinstance(v, np.bool_):
                out[i] = "true" if v else "false"
            elif isinstance(v, float) and v.is_integer():
                out[i] = str(int(v))
            elif isinstance(v, (int, np.integer)):
                out[i] = str(int(v))
            else:
                out[i] = str(v)
    out[mask] = None
    return out


def surrogate_key(*columns) -> pa.Array:
    """md5 of '-'-joined coalesced string casts, one per row.

    Mirrors dbt_utils.generate_surrogate_key semantics (customer360__mapping
    .sql:107,205): each column is SQL-cast to string (``render_sql_string``),
    nulls become the dbt_utils sentinel, values joined with '-', md5-hexed.
    The join is vectorized (numpy object concat); only the md5 itself is
    per-row, as in any engine.
    """
    rendered = []
    n = 0
    for col in columns:
        r = render_sql_string(col)
        r = np.where(pd.isna(r), _MISSING, r)
        rendered.append(r.astype(object))
        n = len(r)
    if len(rendered) == 1:
        joined = rendered[0]
    else:
        sep = np.full(n, "-", dtype=object)
        joined = rendered[0]
        for r in rendered[1:]:
            joined = joined + sep + r
    out = np.empty(n, dtype=object)
    for i in range(n):
        out[i] = hashlib.md5(joined[i].encode("utf-8")).hexdigest()
    return pa.array(out, type=pa.string())
