"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes (ray_guide.md "Aggregation at scale"):
- exact: content-hash in map_batches → hash-partitioned groupby → first-per-group
- MinHash/SimHash: signatures per batch (vectorized) → explode to
  (band, band_hash, doc_id) → groupby bands → candidate pairs → verify →
  connected components. Union-find runs on the driver ONLY over the candidate
  pair set (provably small after banding); the 100 TB path swaps it for a few
  rounds of min-label propagation with groupby, same candidate table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..hashing import stable_hash

# -- exact ------------------------------------------------------------------


def add_content_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """uint64 stable content hash (vectorized) for exact-dup grouping."""
    h = stable_hash(batch.column(text_col))
    return batch.append_column("content_hash", pa.array(h.astype(np.int64)))


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Keep min-id doc per distinct text; emit (content_hash, keeper id, n_dups)."""
    from ray.data.aggregate import Count, Min

    hashed = ds.map_batches(
        lambda t: add_content_hash(t, text_col).select(["content_hash", id_col]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return hashed.groupby("content_hash").aggregate(
        Min(id_col, alias_name=id_col), Count(alias_name="n_dups")
    )


# -- MinHash + LSH ----------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


class MinHasher:
    """Actor-pool stage: per-doc MinHash signature over token shingles.

    Permutation params are derived from a fixed seed in __init__ (once per
    actor); per doc the hashing is vectorized over its shingle set.
    """

    def __init__(self, num_perm: int = 64, shingle_n: int = 3, seed: int = 7):
        import re

        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.n = shingle_n
        self.word_re = re.compile(r"\w+")

    def signature(self, text: str) -> np.ndarray:
        toks = self.word_re.findall((text or "").lower())
        if len(toks) < self.n:
            shingles = [" ".join(toks)] if toks else [""]
        else:
            shingles = [" ".join(toks[i : i + self.n]) for i in range(len(toks) - self.n + 1)]
        h = stable_hash(np.array(shingles, dtype=object)).astype(np.uint64)
        # (num_perm, n_shingles) universal hashing, min over shingles
        vals = (self.a[:, None] * h[None, :] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # batch-level hashing: ONE stable_hash call over all shingles in the
        # batch (per-doc hash_array calls dominated wall time), then per-doc
        # minima over slices
        texts = batch["text"].tolist()
        shingle_lists = []
        for t in texts:
            toks = self.word_re.findall((t or "").lower())
            if len(toks) < self.n:
                shingle_lists.append([" ".join(toks)] if toks else [""])
            else:
                shingle_lists.append(
                    [" ".join(toks[i : i + self.n]) for i in range(len(toks) - self.n + 1)]
                )
        lengths = np.array([len(s) for s in shingle_lists])
        flat = np.concatenate([np.array(s, dtype=object) for s in shingle_lists])
        h = stable_hash(flat).astype(np.uint64)
        starts = np.concatenate([[0], np.cumsum(lengths)])
        sigs = np.empty((len(texts), self.num_perm), dtype=np.uint64)
        for i in range(len(texts)):
            hh = h[starts[i] : starts[i + 1]]
            sigs[i] = ((self.a[:, None] * hh[None, :] + self.b[:, None]) % _MERSENNE).min(axis=1)
        out = pd.DataFrame({"doc_id": batch["doc_id"].to_numpy()})
        out["sig"] = list(sigs)
        return out


def estimated_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float((sig_a == sig_b).mean())


def minhash_candidates(
    ds,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.7,
    concurrency: int = 4,
):
    """documents → candidate near-dup pairs (doc_a, doc_b, est_jaccard ≥ threshold).

    Pipeline: MinHasher actor pool → explode signatures to (band, band_hash,
    doc_id, sig) → groupby band buckets → pairs within bucket verified by
    signature-estimated Jaccard.
    """
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands

    coarse_buckets = 1024  # shuffle granularity: thousands of groups, not one
    # map_groups invocation per LSH bucket (hundreds of thousands of tiny
    # groups made the shuffle overhead-dominated)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack(batch["sig"].to_numpy())  # (n, num_perm)
        n = len(batch)
        band_hashes = np.empty((n, bands), dtype=np.int64)
        for b in range(bands):
            chunk = sigs[:, b * rows_per_band : (b + 1) * rows_per_band]
            acc = np.full(n, np.uint64(b + 1), dtype=np.uint64)
            for r in range(rows_per_band):  # mix rows of the band
                acc = acc * np.uint64(1099511628211) + chunk[:, r]
            band_hashes[:, b] = acc.astype(np.int64)
        out = pd.DataFrame(
            {
                "band_hash": band_hashes.T.reshape(-1),  # band id mixed in
                "doc_id": np.tile(batch["doc_id"].to_numpy(), bands),
            }
        )
        out["bucket"] = (out["band_hash"].to_numpy().astype(np.uint64) % np.uint64(coarse_buckets)).astype(np.int32)
        out["sig"] = list(np.tile(sigs, (bands, 1)))
        return out

    def _empty_pairs() -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_a": pd.Series([], dtype="int64"),
             "doc_b": pd.Series([], dtype="int64"),
             "est_jaccard": pd.Series([], dtype="float64")}
        )

    def coarse_bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """One shuffle group = many LSH buckets; pandas groupby inside."""
        rows = []
        for _bh, grp in g.groupby("band_hash", sort=False):
            if len(grp) < 2:
                continue
            grp = grp.sort_values("doc_id").drop_duplicates("doc_id")
            ids = grp["doc_id"].to_numpy()
            sigs = np.stack(grp["sig"].to_numpy())
            for i in range(len(ids)):
                eq = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
                hits = np.nonzero(eq >= threshold)[0]
                for j in hits:
                    rows.append((ids[i], ids[i + 1 + j], float(eq[j])))
        if not rows:
            return _empty_pairs()
        out = pd.DataFrame(rows, columns=["doc_a", "doc_b", "est_jaccard"])
        # dedupe within the group; cross-band duplicates of the same pair land
        # in different groups and are deduped in the final stage
        return out.drop_duplicates(["doc_a", "doc_b"])

    def dedupe_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["doc_a", "doc_b"])

    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "shingle_n": shingle_n},
        batch_format="pandas",
        batch_size=2048,
        concurrency=concurrency,
    )
    exploded = sigs.map_batches(explode, batch_format="pandas")
    pairs = exploded.groupby("bucket").map_groups(
        coarse_bucket_pairs, batch_format="pandas"
    )

    def add_pair_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["pbucket"] = (
            (batch["doc_a"].to_numpy().astype(np.uint64) * np.uint64(2654435761)
             + batch["doc_b"].to_numpy().astype(np.uint64))
            % np.uint64(coarse_buckets)
        ).astype(np.int32)
        return batch

    return (
        pairs.map_batches(add_pair_bucket, batch_format="pandas")
        .groupby("pbucket")
        .map_groups(dedupe_pairs, batch_format="pandas")
        .drop_columns(["pbucket"])
    )


def connected_groups(pairs_df: pd.DataFrame) -> pa.Table:
    """Union-find over candidate pairs (driver-side; pairs are post-banding small).
    Returns (doc_id, dup_group=min doc id of component)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs_df["doc_a"], pairs_df["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    ids = sorted(parent)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "dup_group": pa.array([find(i) for i in ids], pa.int64()),
        }
    )


# -- SimHash ----------------------------------------------------------------


class SimHasher:
    """Actor-pool stage: 64-bit SimHash per doc (token-hash bit majority)."""

    def __init__(self):
        import re

        self.word_re = re.compile(r"\w+")
        self.bit_idx = np.arange(64, dtype=np.uint64)

    def simhash(self, text: str) -> np.uint64:
        toks = self.word_re.findall((text or "").lower())
        if not toks:
            return np.uint64(0)
        uniq, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
        h = stable_hash(uniq).astype(np.uint64)
        bits = ((h[:, None] >> self.bit_idx[None, :]) & np.uint64(1)).astype(np.int64)
        score = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
        out = np.uint64(0)
        for i in np.nonzero(score > 0)[0]:
            out |= np.uint64(1) << np.uint64(i)
        return out

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(),
                "simhash": np.array(
                    [self.simhash(t) for t in batch["text"].tolist()], dtype=np.uint64
                ).astype(np.int64),
            }
        )


def simhash_signatures(ds, concurrency: int = 4):
    return ds.map_batches(
        SimHasher, batch_format="pandas", batch_size=2048, concurrency=concurrency
    )


# -- n-gram Jaccard (verification kernel) -----------------------------------


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    """Exact token-shingle Jaccard — the verifier for candidate pairs."""
    import re

    ta = re.findall(r"\w+", (a or "").lower())
    tb = re.findall(r"\w+", (b or "").lower())
    sa = {" ".join(ta[i : i + n]) for i in range(max(len(ta) - n + 1, 1))}
    sb = {" ".join(tb[i : i + n]) for i in range(max(len(tb) - n + 1, 1))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(len(sa | sb), 1)


# -- embedding cosine near-dup ----------------------------------------------


def embedding_near_dups(ds, threshold: float = 0.95, id_col: str = "vec_id"):
    """Pairs of rows with cosine ≥ threshold.

    Sandbox path: broadcast the full normalized matrix (ray.put once), each batch
    matmuls against it — O(N·B) per batch, vectorized. 100 TB path: LSH-bucket
    by random-hyperplane signature first (see similarity.lsh_bucket_topk), then
    run this within buckets.
    """
    import ray

    all_rows = ds.select_columns([id_col, "embedding"]).to_pandas()
    ids = all_rows[id_col].to_numpy()
    mat = np.stack(all_rows["embedding"].to_numpy()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, mat))

    def per_batch(batch: pd.DataFrame) -> pd.DataFrame:
        g_ids, g_mat = ray.get(ref)
        q = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        sims = q @ g_mat.T
        qa_ids = batch[id_col].to_numpy()
        rows_a, rows_b, vals = [], [], []
        for i in range(len(qa_ids)):
            hits = np.nonzero((sims[i] >= threshold) & (g_ids > qa_ids[i]))[0]
            rows_a.extend([qa_ids[i]] * len(hits))
            rows_b.extend(g_ids[hits])
            vals.extend(sims[i][hits])
        return pd.DataFrame(
            {"id_a": np.array(rows_a, dtype=np.int64),
             "id_b": np.array(rows_b, dtype=np.int64),
             "cosine": np.array(vals, dtype=np.float64)}
        )

    return ds.map_batches(per_batch, batch_format="pandas", batch_size=1024)
