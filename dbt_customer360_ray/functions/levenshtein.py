"""Edit-distance similarity scorer — the engine's version of the reference's
warehouse Levenshtein (macros/levenshtein_distance.sql:12-35; the Redshift
Python-UDF install hook at dbt_project.yml:5-6 becomes plain Python here).

The fuzzy confirmation rule (int_customer360__source_matches.sql:133-153):
a candidate pair is kept iff exact email match OR
``1 - levenshtein(a, b) / greatest(len(a), len(b)) >= threshold`` for any
name×name combination, with nulls coalesced to distinct sentinels ('aaa'/'bbb')
so null never matches null.
"""

from __future__ import annotations

import numpy as np


def levenshtein(a: str, b: str) -> int:
    """Iterative two-row DP; O(len(a)*len(b))."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def similarity(a: str | None, b: str | None, a_sentinel: str = "aaa", b_sentinel: str = "bbb") -> float:
    """1 - dist/maxlen with per-side null sentinels (null ≠ null)."""
    a = a if a else a_sentinel
    b = b if b else b_sentinel
    m = max(len(a), len(b))
    if m == 0:
        return 1.0
    return 1.0 - levenshtein(a, b) / m


def any_name_similar(
    names_a: list[str | None], names_b: list[str | None], threshold: float = 0.95
) -> bool:
    """OR over every name×name combination (source_matches.sql:141-153)."""
    for a in names_a:
        for b in names_b:
            if similarity(a, b) >= threshold:
                return True
    return False


def similar_mask(a: np.ndarray, b: np.ndarray, threshold: float = 0.95) -> np.ndarray:
    """Batched element-wise fuzzy confirm: out[i] = similarity(a[i], b[i]) >= t.

    The per-row DP is the operator itself (the reference runs a warehouse
    Levenshtein UDF per row, macros/levenshtein_distance.sql:12-35); the batch
    layer adds two exact prunes so the DP runs only where it can matter:
    - null/sentinel skip: sim('aaa','bbb')=0, so any null side can never pass
      (null ≠ null by construction);
    - length prune: |len(a)-len(b)| <= dist, so if 1-|la-lb|/max < t the pair
      can't pass — at t=.95 this skips nearly every non-match.
    """
    n = len(a)
    out = np.zeros(n, dtype=bool)
    allow = (1.0 - threshold)
    for i in range(n):
        x, y = a[i], b[i]
        if not isinstance(x, str) or not x or not isinstance(y, str) or not y:
            continue
        if x == y:
            out[i] = True
            continue
        la, lb = len(x), len(y)
        m = la if la > lb else lb
        if (m - (lb if la > lb else la)) > m * allow:
            continue
        out[i] = (1.0 - levenshtein(x, y) / m) >= threshold
    return out


def pairwise_similarity_matrix(names_a: list[str], names_b: list[str]) -> np.ndarray:
    out = np.zeros((len(names_a), len(names_b)))
    for i, a in enumerate(names_a):
        for j, b in enumerate(names_b):
            out[i, j] = similarity(a, b)
    return out
