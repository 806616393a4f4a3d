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


def surrogate_key(*columns) -> pa.Array:
    """md5 of '-'-joined coalesced string casts, one per row.

    Mirrors dbt_utils.generate_surrogate_key semantics: each column is cast to
    string, nulls become the dbt_utils sentinel, values joined with '-', md5-hexed.
    """
    series = []
    n = None
    for col in columns:
        if isinstance(col, (pa.Array, pa.ChunkedArray)):
            col = col.to_pandas()
        s = pd.Series(col).astype(object)
        mask = pd.isna(s)
        s = s.astype(str)
        s[mask] = _MISSING
        series.append(s.to_numpy(dtype=object))
        n = len(s)
    out = np.empty(n, dtype=object)
    for i in range(n):
        joined = "-".join(str(series[j][i]) for j in range(len(series)))
        out[i] = hashlib.md5(joined.encode("utf-8")).hexdigest()
    return pa.array(out, type=pa.string())
