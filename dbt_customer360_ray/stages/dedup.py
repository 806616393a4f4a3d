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

import hashlib

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
    broadcast_sig_bytes: int = 256 << 20,
    sigs=None,
):
    """documents → candidate near-dup pairs (doc_a, doc_b, est_jaccard ≥ threshold).

    ``sigs`` (optional): a precomputed (doc_id, sig) Dataset — e.g. the
    incrementally-maintained signature index (``state/views.py:
    sync_minhash_index``) — skips the MinHasher stage entirely; everything
    downstream (banding, pair gen, est filter) is signature-driven anyway.

    Pipeline: MinHasher actor pool → explode signatures to LEAN
    (band_hash, doc_id) rows — signatures themselves never enter the shuffle
    (they multiplied exchange volume by num_perm×bands; measured ~2x on the
    whole operator) → groupby band buckets → within-bucket candidate pairs →
    pair dedup → est-Jaccard filter. Below ``broadcast_sig_bytes`` the filter
    reads the signature matrix broadcast once via ray.put (n_docs × num_perm
    ints — the small side by construction); above it, two bucketed hash joins
    attach each side's signature to the pair rows instead, so nothing
    O(corpus) is ever broadcast (same size-gated pattern as
    ``ngram_jaccard_pairs``).
    """
    import ray
    import ray.data

    assert num_perm % bands == 0
    rows_per_band = num_perm // bands

    # shuffle granularity: map_groups invokes the UDF once per GROUP, so
    # per-group overhead (~1 ms of pandas frame setup) argues for hundreds of
    # fat groups, not hundreds of thousands of tiny ones (measured: 1024
    # buckets ≈ +1 s per shuffle vs 128 at sf0.1; the within-group kernels are
    # segment-vectorized so group size is cheap). Floor 128, grows with the
    # exploded row count (n_docs × bands) so one bucket keeps fitting a
    # worker's heap at 100× — assigned after the signature count below.
    coarse_buckets = 128

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
        return out

    def _empty_pairs() -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_a": pd.Series([], dtype="int64"),
             "doc_b": pd.Series([], dtype="int64"),
             "est_jaccard": pd.Series([], dtype="float64")}
        )

    def _empty_cand() -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_a": pd.Series([], dtype="int64"),
             "doc_b": pd.Series([], dtype="int64")}
        )

    def coarse_bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """One shuffle group = many LSH buckets. Fully vectorized: one sort
        finds the band_hash segments, within-segment (i<j) pair indices are
        built per segment (index arithmetic only) — no per-group pandas loop
        and no signature work here (est filtering happens after pair dedup,
        against the broadcast signature matrix)."""
        g = g.sort_values(["band_hash", "doc_id"], kind="stable").drop_duplicates(
            ["band_hash", "doc_id"]
        )
        bh = g["band_hash"].to_numpy()
        ids = g["doc_id"].to_numpy()
        if len(bh) < 2:
            return _empty_cand()
        starts = np.flatnonzero(np.r_[True, bh[1:] != bh[:-1]])
        lens = np.diff(np.r_[starts, len(bh)])
        ia_parts, ib_parts = [], []
        for s, ln in zip(starts, lens):
            if ln < 2:
                continue
            iu, ju = np.triu_indices(ln, k=1)
            ia_parts.append(s + iu)
            ib_parts.append(s + ju)
        if not ia_parts:
            return _empty_cand()
        ia = np.concatenate(ia_parts)
        ib = np.concatenate(ib_parts)
        out = pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]})
        # dedupe within the group; cross-band duplicates of the same pair land
        # in different groups and are deduped in the final stage
        return out.drop_duplicates(["doc_a", "doc_b"])

    def dedupe_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["doc_a", "doc_b"])

    if sigs is None:
        sigs = ds.map_batches(
            MinHasher,
            fn_constructor_kwargs={"num_perm": num_perm, "shingle_n": shingle_n},
            batch_format="pandas",
            batch_size=2048,
            concurrency=(1, concurrency),
        )
    sigs = sigs.materialize()  # consumed twice: banding shuffle + est broadcast
    from ..blocks import adaptive_buckets

    n_docs = sigs.count()
    coarse_buckets = adaptive_buckets(n_docs * bands, lo=coarse_buckets)
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

    deduped = (
        pairs.map_batches(add_pair_bucket, batch_format="pandas")
        .groupby("pbucket")
        .map_groups(dedupe_pairs, batch_format="pandas")
        .drop_columns(["pbucket"])
    )

    sig_matrix_bytes = n_docs * num_perm * 8
    if sig_matrix_bytes > broadcast_sig_bytes:
        return _est_filter_joined(deduped, sigs, threshold, _empty_pairs)

    sig_pdf = sigs.to_pandas().sort_values("doc_id", kind="stable")
    sig_ref = ray.put(
        (sig_pdf["doc_id"].to_numpy(), np.stack(sig_pdf["sig"].to_numpy()))
    )

    def est_filter(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return _empty_pairs()
        ids_sorted, mat = ray.get(sig_ref)
        ia = np.searchsorted(ids_sorted, b["doc_a"].to_numpy())
        ib = np.searchsorted(ids_sorted, b["doc_b"].to_numpy())
        est = (mat[ia] == mat[ib]).mean(axis=1)
        keep = est >= threshold
        out = b.loc[keep, ["doc_a", "doc_b"]].copy()
        out["est_jaccard"] = est[keep].astype(np.float64)
        return out if len(out) else _empty_pairs()

    return deduped.map_batches(est_filter, batch_format="pandas")


def _est_filter_joined(pairs, sigs, threshold: float, empty_fn):
    """Scale path for the est-Jaccard filter: attach each pair side's
    signature via bucketed hash joins (nothing O(corpus) broadcast), then the
    same vectorized estimate per batch. Signatures ride the join as binary
    blobs — Acero can't carry the tensor-extension column as a join payload."""
    from .joins import bucketed_hash_join

    def _side(name: str):
        def enc(df: pd.DataFrame) -> pa.Table:
            m = np.ascontiguousarray(np.stack(df["sig"].to_numpy()), dtype=np.uint64)
            width = m.shape[1] * 8
            offsets = (np.arange(len(df) + 1, dtype=np.int32) * width)
            blob = pa.Array.from_buffers(
                pa.binary(), len(df),
                [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(m.tobytes())],
            )
            return pa.table(
                {f"doc_{name}": pa.array(df["doc_id"].to_numpy()),
                 f"sig_{name}": blob}
            )

        return sigs.map_batches(enc, batch_format="pandas")

    j = bucketed_hash_join(pairs, _side("a"), on="doc_a")
    j = bucketed_hash_join(j, _side("b"), on="doc_b")

    def _mat(col: pd.Series) -> np.ndarray:
        flat = np.frombuffer(b"".join(col.to_numpy()), dtype=np.uint64)
        return flat.reshape(len(col), -1)

    def est_filter(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return empty_fn()
        est = (_mat(b["sig_a"]) == _mat(b["sig_b"])).mean(axis=1)
        keep = est >= threshold
        out = b.loc[keep, ["doc_a", "doc_b"]].copy()
        out["est_jaccard"] = est[keep].astype(np.float64)
        return out if len(out) else empty_fn()

    return j.map_batches(est_filter, batch_format="pandas")


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


def connected_groups_ds(pairs_ds, num_partitions: int = 16, max_rounds: int = 64):
    """Distributed connected components by min-label propagation — the 100 TB
    path: the pair graph never leaves the cluster.

    Each round: propagate every node's current label across edges (one hash
    join), take the per-node min (one groupby). Labels are monotonically
    non-increasing, so the global label sum strictly decreases until the
    component minima have propagated everywhere (O(diameter) rounds) — sum
    equality is the convergence test, no extra comparison join. Returns a
    Dataset (doc_id, dup_group=min doc id of component) over all nodes that
    appear in ``pairs_ds`` (doc_a, doc_b).
    """
    from ray.data.aggregate import Min

    def symmetrize(t: pa.Table) -> pa.Table:
        a = t.column("doc_a").combine_chunks()
        b = t.column("doc_b").combine_chunks()
        return pa.table(
            {
                "src": pa.chunked_array([a, b]).combine_chunks().cast(pa.int64()),
                "dst": pa.chunked_array([b, a]).combine_chunks().cast(pa.int64()),
            }
        )

    edges = (
        pairs_ds.select_columns(["doc_a", "doc_b"])
        .map_batches(symmetrize, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )

    def seed_labels(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t.column("src"),
                "label": pc.min_element_wise(t.column("src"), t.column("label")),
            }
        )

    labels = (
        edges.groupby("src")
        .aggregate(Min("dst", alias_name="label"))
        .map_batches(seed_labels, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )
    prev_sum = labels.sum("label")
    for _ in range(max_rounds):
        prop = edges.join(
            labels,
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("node",),
            aggregator_ray_remote_args={"num_cpus": 0.1},
        ).map_batches(
            lambda t: pa.table({"node": t.column("dst"), "label": t.column("label")}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        labels = (
            labels.union(prop)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.map_batches(
        lambda t: pa.table({"doc_id": t.column("node"), "dup_group": t.column("label")}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).sort("doc_id")


def dup_groups(pairs_ds, driver_threshold: int = 100_000):
    """Connected components over a candidate-pair Dataset: driver union-find
    when the pair set is provably small, min-label propagation otherwise."""
    n = pairs_ds.count()
    if n <= driver_threshold:
        return connected_groups(pairs_ds.to_pandas())
    return connected_groups_ds(pairs_ds)


# -- SimHash ----------------------------------------------------------------


class SimHasher:
    """Actor-pool stage: 64-bit SimHash per doc (token-hash bit majority).

    Token hash = lower 8 bytes (little-endian) of md5, bit-identical to
    DuckDB's ``md5_number_lower`` — so the whole stage is oracle-checkable in
    SQL. Hashing is batch-vectorized: ONE md5 pass over the batch's UNIQUE
    tokens, then per-doc bit-majority via segmented reduction (np.add.reduceat)
    — no per-doc hash calls. A token occurring k times in a doc contributes
    ±k to each bit score, so summing over occurrences equals the classic
    unique-token × count formulation.
    """

    def __init__(self):
        import re

        self.word_re = re.compile(r"\w+")
        self.bit_idx = np.arange(64, dtype=np.uint64)

    @staticmethod
    def _md5_u64(uniq: np.ndarray) -> np.ndarray:
        out = np.empty(len(uniq), dtype=np.uint64)
        for i, s in enumerate(uniq):
            out[i] = np.frombuffer(hashlib.md5(s.encode("utf-8")).digest()[8:16], "<u8")[0]
        return out

    def simhash(self, text: str) -> np.uint64:
        """Single-doc reference path (tests); the batch path is __call__."""
        df = self(pd.DataFrame({"doc_id": [0], "text": [text]}))
        return np.uint64(df["simhash"].to_numpy().astype(np.uint64)[0])

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].tolist()
        tok_lists = [self.word_re.findall((t or "").lower()) for t in texts]
        lengths = np.array([len(t) for t in tok_lists], dtype=np.int64)
        n = len(texts)
        sims = np.zeros(n, dtype=np.int64)
        if n and lengths.sum():
            flat = np.concatenate(
                [np.array(t, dtype=object) for t in tok_lists if t]
            )
            uniq, inv = np.unique(flat, return_inverse=True)
            hu = self._md5_u64(uniq)
            bits = ((hu[:, None] >> self.bit_idx[None, :]) & np.uint64(1)).astype(np.int8)
            tok_pm = bits[inv] * np.int8(2) - np.int8(1)  # (n_flat, 64) of ±1
            starts = np.zeros(n, dtype=np.int64)
            np.cumsum(lengths[:-1], out=starts[1:])
            nz = np.nonzero(lengths > 0)[0]
            scores = np.add.reduceat(
                tok_pm.astype(np.int64), starts[nz], axis=0
            )  # (n_nonempty, 64)
            sh = (scores > 0).astype(np.uint64)
            vals = (sh << self.bit_idx[None, :]).sum(axis=1, dtype=np.uint64)
            sims[nz] = vals.view(np.int64)
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy(), "simhash": sims}
        )


def simhash_signatures(ds, concurrency: int = 4):
    return ds.map_batches(
        SimHasher, batch_format="pandas", batch_size=2048, concurrency=(1, concurrency)
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


class _PrefixShingleExploder:
    """Actor-pool stage: (doc_id, text) → PREFIX-FILTERED inverted-index rows
    (doc_id, sh, bucket). Shingle definition matches ngram_jaccard / the SQL
    oracle (\\w+ tokens of lower(text), n-gram join by space, docs with < n
    tokens contribute the single all-tokens shingle); shingles are carried as
    stable 64-bit hashes (ONE vectorized hash pass per batch; collision
    probability ~N²·2⁻⁶⁴ — negligible).

    AllPairs/PPJoin prefix filter (Bayardo/Ma/Srikant WWW'07; Xiao et al.
    WWW'08 — public algorithms): under ANY global total order of shingles
    (here: hash value ascending), J(A,B) ≥ t implies the first
    |S| − ⌈t·|S|⌉ + 1 shingles of A and of B share an element — so only that
    prefix of each doc is indexed. Exact recall, ~(1−t)² of the
    inverted-index join volume; the survivors are re-verified exactly, so a
    too-short prefix could only lose pairs, never invent them."""

    BUCKETS = 128

    def __init__(self, threshold: float, shingle_n: int = 3):
        import re

        self.tok = re.compile(r"\w+")
        self.n = shingle_n
        self.t = threshold

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = self.n
        ids, lists = [], []
        for did, text in zip(batch["doc_id"], batch["text"]):
            toks = self.tok.findall((text or "").lower())
            if len(toks) < n:
                s = [" ".join(toks)]
            else:
                s = list({" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)})
            ids.append(did)
            lists.append(s)
        if not lists:
            return pd.DataFrame(
                {"doc_id": pd.Series(dtype="int64"), "sh": pd.Series(dtype="int64"),
                 "bucket": pd.Series(dtype="int32")}
            )
        lengths = np.array([len(s) for s in lists], dtype=np.int64)
        flat = np.concatenate([np.array(s, dtype=object) for s in lists])
        h = stable_hash(flat)  # one vectorized pass over the whole batch
        out_ids, out_h = [], []
        off = 0
        for did, ln in zip(ids, lengths):
            seg = np.sort(h[off : off + ln])
            off += ln
            p = ln - int(np.ceil(self.t * ln)) + 1  # AllPairs prefix length
            out_ids.append(np.full(p, did, dtype=np.int64))
            out_h.append(seg[:p])
        doc = np.concatenate(out_ids)
        sh = np.concatenate(out_h)
        return pd.DataFrame(
            {
                "doc_id": doc,
                "sh": sh.astype(np.int64),
                "bucket": (sh % np.uint64(self.BUCKETS)).astype(np.int32),
            }
        )


def ngram_jaccard_pairs(
    ds,
    threshold: float = 0.8,
    shingle_n: int = 3,
    concurrency: int = 4,
    driver_threshold: int = 200_000,
):
    """EXACT all-pairs n-gram Jaccard near-dup pairs (doc_a < doc_b,
    jaccard ≥ threshold) — the exact counterpart of the MinHash path:

      prefix-filtered inverted index (_PrefixShingleExploder: only each doc's
      first |S|−⌈t·|S|⌉+1 shingle hashes are indexed — exact recall) →
      coarse-bucket shuffle → per-shingle candidate pairs (vectorized pandas
      self-merge, the SQL inter CTE restricted to prefixes) → global pair
      dedup → exact ngram_jaccard verification (broadcast text fetch under
      driver_threshold candidates, bucketed hash joins above — shared with
      verified_near_dup_pairs).

    Unlike MinHash+LSH (probabilistic recall) this is exact end to end: the
    prefix theorem guarantees every qualifying pair shares an indexed
    shingle, and every candidate is re-verified with the exact kernel.
    """
    import ray
    import ray.data

    empty = pd.DataFrame(
        {"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64"),
         "jaccard": pd.Series(dtype="float64")}
    )

    docs = ds.select_columns(["doc_id", "text"])
    exploded = docs.map_batches(
        _PrefixShingleExploder,
        fn_constructor_kwargs={"threshold": threshold, "shingle_n": shingle_n},
        batch_format="pandas",
        batch_size=2048,
        concurrency=(1, concurrency),
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """Distinct candidate pairs within one shuffle bucket (vectorized
        self-merge on the shingle hash; still deduped globally below since a
        pair can share prefix shingles across buckets)."""
        m = g.merge(g, on="sh")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        return (
            m[["doc_id_x", "doc_id_y"]]
            .drop_duplicates()
            .rename(columns={"doc_id_x": "doc_a", "doc_id_y": "doc_b"})
        )

    cands = exploded.groupby("bucket").map_groups(
        bucket_pairs, batch_format="pandas"
    ).materialize()
    n_cands = cands.count()
    if n_cands == 0:
        return ray.data.from_pandas(empty)
    if n_cands > driver_threshold:
        # distributed: pair-hash-bucketed global dedup, then distributed
        # verify. Verification needs each pair's two texts: when the doc
        # table fits a broadcast (ray.put once, read per task — the
        # small-side rule), verify is a map over pair batches with zero
        # joins; above that, fall back to the shared two-shuffle-join verify
        # (its cost is two hash-join barriers — measured 9.5 s of an 18 s
        # sf0.1 run — so the broadcast path is the default whenever it fits).
        def add_pair_bucket(batch: pd.DataFrame) -> pd.DataFrame:
            h = (
                batch["doc_a"].to_numpy().astype(np.uint64)
                * np.uint64(0x9E3779B97F4A7C15)
            ) ^ batch["doc_b"].to_numpy().astype(np.uint64)
            out = batch.copy()
            out["pb"] = (h % np.uint64(512)).astype(np.int32)
            return out

        deduped = (
            cands.map_batches(add_pair_bucket, batch_format="pandas")
            .groupby("pb")
            .map_groups(
                lambda g: g.drop_duplicates(["doc_a", "doc_b"])[["doc_a", "doc_b"]],
                batch_format="pandas",
            )
        )
        if (docs.size_bytes() or 0) > 256 << 20:
            return _verified_pairs_joined(docs, deduped, threshold, shingle_n)

        texts_df = docs.to_pandas()
        lut_ref = ray.put(dict(zip(texts_df["doc_id"], texts_df["text"])))
        # map tasks are per-block: spread the candidate pairs so the
        # per-pair verify kernel uses the whole pool (measured 3 blocks →
        # 3 tasks → 7 s serial tail without this)
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        deduped = deduped.repartition(2 * cpus)

        def verify_batch(b: pd.DataFrame) -> pd.DataFrame:
            lut = ray.get(lut_ref)
            jac = np.array(
                [
                    ngram_jaccard(lut.get(a), lut.get(bb), shingle_n)
                    for a, bb in zip(b["doc_a"], b["doc_b"])
                ],
                dtype=np.float64,
            )
            keep = jac >= threshold
            out = b.loc[keep, ["doc_a", "doc_b"]].copy()
            out["jaccard"] = jac[keep]
            return out

        return deduped.map_batches(
            verify_batch, batch_format="pandas", batch_size=8192
        )

    pairs = cands.to_pandas().drop_duplicates(["doc_a", "doc_b"])
    from .joins import semi_join

    wanted = pd.unique(pd.concat([pairs["doc_a"], pairs["doc_b"]]))
    texts = semi_join(docs, wanted, on="doc_id").to_pandas()
    lut = dict(zip(texts["doc_id"], texts["text"]))
    jac = np.array(
        [
            ngram_jaccard(lut.get(a), lut.get(b), shingle_n)
            for a, b in zip(pairs["doc_a"], pairs["doc_b"])
        ]
    )
    keep = jac >= threshold
    out = pairs.loc[keep, ["doc_a", "doc_b"]].reset_index(drop=True)
    out["jaccard"] = jac[keep]
    return ray.data.from_pandas(out if len(out) else empty)


def verified_near_dup_pairs(
    ds,
    jaccard_threshold: float = 0.8,
    est_threshold: float = 0.5,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    driver_threshold: int = 200_000,
    sigs=None,
):
    """MinHash+LSH candidates verified by EXACT shingle Jaccard — the
    oracle-checkable near-dup operator: candidates are recalled loosely
    (est ≥ est_threshold, generous banding) and only exact-Jaccard ≥
    jaccard_threshold pairs survive, so the output equals the all-pairs SQL
    answer up to banding recall (≥ 0.999 at the default margin).

    The candidate set is the small, post-banding table by design: it lands on
    the driver (same assumption as the union-find grouping path), the texts of
    ONLY the candidate docs come back through a broadcast semi-join filter
    (map-only — no shuffle), and the exact Jaccard kernel runs per pair.
    Above ``driver_threshold`` pairs the path switches to two bucketed hash
    joins + a distributed verify kernel.
    """
    import ray
    import ray.data

    empty = pd.DataFrame(
        {"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64"),
         "jaccard": pd.Series(dtype="float64")}
    )

    docs = ds.select_columns(["doc_id", "text"])
    cands = minhash_candidates(
        ds, num_perm=num_perm, bands=bands, shingle_n=shingle_n,
        threshold=est_threshold, sigs=sigs,
    ).map_batches(
        lambda t: t.select(["doc_a", "doc_b"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    # Materialize once, decide the path from count(): the candidate Dataset
    # never lands on the driver unless it is under the threshold, and the
    # MinHash stage never re-executes for the joined fallback.
    cands = cands.materialize()
    n_cands = cands.count()
    if n_cands == 0:
        return ray.data.from_pandas(empty)
    if n_cands > driver_threshold:
        return _verified_pairs_joined(docs, cands, jaccard_threshold, shingle_n)
    pairs = cands.to_pandas()

    from .joins import semi_join

    wanted = pd.unique(pd.concat([pairs["doc_a"], pairs["doc_b"]]))
    texts = semi_join(docs, wanted, on="doc_id").to_pandas()
    lut = dict(zip(texts["doc_id"], texts["text"]))
    jac = np.array(
        [
            ngram_jaccard(lut.get(a), lut.get(b), shingle_n)
            for a, b in zip(pairs["doc_a"], pairs["doc_b"])
        ]
    )
    keep = jac >= jaccard_threshold
    out = pairs.loc[keep, ["doc_a", "doc_b"]].copy()
    out["jaccard"] = jac[keep]
    return ray.data.from_pandas(out.reset_index(drop=True) if len(out) else empty)


def _verified_pairs_joined(docs, cands, jaccard_threshold: float, shingle_n: int):
    """Distributed verify for huge candidate sets: two bucketed hash joins to
    attach both texts, exact-Jaccard kernel per batch."""
    from .joins import bucketed_hash_join

    def _side(name: str):
        return docs.map_batches(
            lambda t, _n=name: t.rename_columns([f"doc_{_n}", f"text_{_n}"]),
            batch_format="pyarrow", zero_copy_batch=True,
        )

    j1 = bucketed_hash_join(cands, _side("a"), on="doc_a")
    j2 = bucketed_hash_join(j1, _side("b"), on="doc_b")

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64"),
                 "jaccard": pd.Series(dtype="float64")}
            )
        jac = np.array(
            [
                ngram_jaccard(a, b, shingle_n)
                for a, b in zip(df["text_a"].to_numpy(), df["text_b"].to_numpy())
            ]
        )
        keep = jac >= jaccard_threshold
        out = df.loc[keep, ["doc_a", "doc_b"]].copy()
        out["jaccard"] = jac[keep]
        return out

    return j2.map_batches(verify, batch_format="pandas")


# -- embedding cosine near-dup ----------------------------------------------


def _list_matrix(tbl: pa.Table, col: str) -> np.ndarray:
    """Zero-copy-ish list<float> column → (n, dim) float64 matrix."""
    c = tbl.column(col).combine_chunks()
    flat = c.values.to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(c), -1) if len(c) else flat.reshape(0, 0)


def _pair_tile(
    ta: pa.Table, tb: pa.Table, same: bool, thr: float, idc: str
) -> pa.Table:
    """One matmul tile of the all-pairs cosine comparison (runs as a Ray task;
    blocks arrive zero-copy from the object store)."""
    empty = pa.table(
        {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
         "cosine": pa.array([], pa.float64())}
    )
    if ta.num_rows == 0 or tb.num_rows == 0:
        return empty
    ia = ta.column(idc).to_numpy(zero_copy_only=False).astype(np.int64)
    ib = tb.column(idc).to_numpy(zero_copy_only=False).astype(np.int64)
    ma = _list_matrix(ta, "embedding")
    mb = _list_matrix(tb, "embedding")
    na = np.maximum(np.linalg.norm(ma, axis=1), 1e-300)
    nb = np.maximum(np.linalg.norm(mb, axis=1), 1e-300)
    sims = (ma @ mb.T) / (na[:, None] * nb[None, :])
    mask = sims >= thr
    if same:
        mask &= ia[:, None] < ib[None, :]  # each unordered pair once, no self
    ii, jj = np.nonzero(mask)
    if not len(ii):
        return empty
    a, b, v = ia[ii], ib[jj], sims[ii, jj]
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    order = np.lexsort((hi, lo))
    return pa.table(
        {"id_a": pa.array(lo[order]), "id_b": pa.array(hi[order]),
         "cosine": pa.array(v[order], pa.float64())}
    )


def embedding_near_dups(
    ds, threshold: float = 0.95, id_col: str = "vec_id", num_blocks: int | None = None
):
    """Exact cosine near-dup pairs (id_a < id_b, cosine ≥ threshold).

    Distributed block-pair tiling: the table is packed into B blocks pinned in
    the object store; one Ray task per block pair (B·(B+1)/2 tiles) matmuls its
    tile and emits qualifying pairs. The driver holds only block refs — no
    whole-table materialization. Cosine is dot/(‖a‖·‖b‖) in float64, the same
    formulation as DuckDB's list_cosine_similarity, so the stage is
    oracle-checkable. O(N²) compute is inherent to EXACT all-pairs; the
    approximate 100 TB path buckets by HyperplaneLsh signature
    (stages/similarity.py) and runs these tiles within buckets.
    """
    import ray
    import ray.data

    if num_blocks is None:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        num_blocks = max(2, min(16, cpus))
    packed = (
        ds.select_columns([id_col, "embedding"]).repartition(num_blocks).materialize()
    )
    refs = packed.to_arrow_refs()
    tile = ray.remote(_pair_tile)
    out = [
        tile.remote(refs[i], refs[j], i == j, threshold, id_col)
        for i in range(len(refs))
        for j in range(i, len(refs))
    ]
    return ray.data.from_arrow_refs(out)


class _LshBucketer:
    """Actor-pool stage: each vector → ``num_tables`` rows (gkey, id, embedding)
    where gkey = table_id·2^bits + hyperplane bucket. Carrying the embedding
    multiplies shuffle volume by num_tables — the price of comparing only
    within buckets instead of all-pairs (N·T·dim shipped vs N²·dim compared)."""

    def __init__(self, dim: int, num_bits: int, num_tables: int, id_col: str):
        from .similarity import HyperplaneLsh

        self.hashers = [
            HyperplaneLsh(dim, num_bits, seed=11 + 7 * t) for t in range(num_tables)
        ]
        self.num_bits = num_bits
        self.id_col = id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        emb = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        ids = batch[self.id_col].to_numpy().astype(np.int64)
        frames = []
        for t, h in enumerate(self.hashers):
            b = (((emb @ h.planes.T) > 0) @ h.weights).astype(np.int64)
            frames.append(
                pd.DataFrame(
                    {
                        "gkey": (t << self.num_bits) + b,
                        self.id_col: ids,
                        "embedding": list(emb),
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)


def lsh_tiles(
    ds,
    id_col: str = "vec_id",
    dim: int = 64,
    num_bits: int = 8,
    num_tables: int = 4,
    jumbo_threshold: int = 8192,
    tile_rows: int = 4096,
):
    """Shared LSH bucket fan-out + jumbo-tile assignment: the candidate-
    generation front half of every bucketed embedding pipeline
    (``embedding_near_dups_lsh`` pair-gen, ``similarity.knn_graph_lsh``
    neighbourhood-gen). Returns a Dataset of (gkey, id, embedding, tkey, sub)
    rows where every within-bucket pair co-occurs in exactly the tiles its
    sub-blocks touch; ``groupby("tkey")`` downstream sees heap-sized groups
    even for duplicate-heavy jumbo buckets (see ``embedding_near_dups_lsh``'s
    docstring for the tiling maths)."""
    import ray

    bucketed = ds.map_batches(
        _LshBucketer,
        fn_constructor_kwargs={
            "dim": dim, "num_bits": num_bits,
            "num_tables": num_tables, "id_col": id_col,
        },
        batch_format="pandas",
        batch_size=4096,
        concurrency=(1, 8),
    ).materialize()  # consumed twice: count pre-pass + tile shuffle

    # bucket-size pre-pass: per-batch partial counts tree-merged worker-side
    # (the gkey domain is num_tables * 2^num_bits, constant in N — but the
    # per-batch partial count is O(#batches x domain), so the merge must not
    # land on the driver wholesale)
    from ..blocks import sum_kernel, tree_reduce

    counts = (
        tree_reduce(
            bucketed.map_batches(
                lambda df: df.groupby("gkey").size().rename("n").reset_index(),
                batch_format="pandas",
            ),
            sum_kernel(["gkey"], ["n"]),
        )
        .to_pandas()
        .set_index("gkey")["n"]
    )
    splits = {
        int(g): int(-(-n // tile_rows))
        for g, n in counts.items()
        if n > jumbo_threshold
    }
    max_tiles = max(
        (s * (s + 1) // 2 for s in splits.values()), default=1
    )
    splits_ref = ray.put(splits)

    def assign_tiles(df: pd.DataFrame) -> pd.DataFrame:
        """Row → one row per upper-triangle tile its sub-block touches.
        Non-jumbo buckets: sub=0, single tile 0 — no replication."""
        sp = ray.get(splits_ref)
        df = df.reset_index(drop=True)
        if not sp:
            out = df.copy()
            out["tkey"] = out["gkey"].to_numpy(np.int64) * max_tiles
            out["sub"] = np.zeros(len(out), dtype=np.int64)
            return out
        gk = df["gkey"].to_numpy(np.int64)
        lut = np.ones(int(gk.max()) + 1, dtype=np.int64)
        for g, s in sp.items():
            if g < len(lut):
                lut[g] = s
        s_per_row = lut[gk]
        idv = df[id_col].to_numpy(np.int64)
        sub = ((idv * np.int64(0x9E3779B1)) & np.int64(0x7FFFFFFF)) % s_per_row
        rep_idx = np.repeat(np.arange(len(df)), s_per_row)
        sub_r = np.repeat(sub, s_per_row)
        s_r = np.repeat(s_per_row, s_per_row)
        # enumerate the S tiles touching sub b: (i, b) for i in [0, b] then
        # (b, j) for j in (b, S)
        ends = np.cumsum(s_per_row)
        k = np.arange(int(ends[-1]), dtype=np.int64) - np.repeat(
            ends - s_per_row, s_per_row
        )
        i = np.where(k <= sub_r, k, sub_r)
        j = np.where(k <= sub_r, sub_r, k)
        tidx = i * s_r - (i * (i - 1)) // 2 + (j - i)
        out = df.iloc[rep_idx].reset_index(drop=True)
        out["tkey"] = out["gkey"].to_numpy(np.int64) * max_tiles + tidx
        out["sub"] = sub_r.astype(np.int64)
        return out

    return bucketed.map_batches(assign_tiles, batch_format="pandas")


def embedding_near_dups_lsh(
    ds,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    dim: int = 64,
    num_bits: int = 8,
    num_tables: int = 4,
    jumbo_threshold: int = 8192,
    tile_rows: int = 4096,
):
    """Approximate cosine near-dup pairs — the 100 TB path ``embedding_near_dups``
    documents: vectors are compared ONLY within shared hyperplane-LSH buckets
    (any of ``num_tables`` seeded tables), so compute drops from O(N²) to
    Σ|bucket|² while recall < 1 by construction (miss prob ≈ (1-p^bits)^tables
    per pair). Bucket membership is deterministic given the seeded planes, so
    the approximate answer is oracle-checkable via
    ``embedding_lsh_pairs_oracle_sql`` (same planes inlined as SQL literals).

    Pipeline: bucket fan-out (actor pool) → jumbo split → groupby(tile key)
    all-pairs within tile (vectorized matmul per group) → groupby(pair) dedup
    across tables/tiles.

    Jumbo buckets (duplicate-heavy corpora produce them) are the skew hazard:
    a bucket over ``jumbo_threshold`` rows is split into S = ceil(n/tile_rows)
    deterministic sub-blocks, and each row is replicated into the S
    upper-triangle tiles its sub-block touches, so no single task ever holds
    (or matmuls) a whole hot bucket — the same block-pair shape as
    ``embedding_near_dups``'s ``_pair_tile``. Bucket sizes come from a
    constant-size count pre-pass (≤ num_tables·2^num_bits rows on the driver);
    buckets at or under the threshold keep the replication-free single-tile
    path, so at uniform scale the plan is unchanged."""
    from ray.data.aggregate import Max

    tiled = lsh_tiles(
        ds,
        id_col=id_col,
        dim=dim,
        num_bits=num_bits,
        num_tables=num_tables,
        jumbo_threshold=jumbo_threshold,
        tile_rows=tile_rows,
    )

    def pairs_in_tile(g: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(g["embedding"].to_numpy())
        ids = g[id_col].to_numpy().astype(np.int64)
        n = np.maximum(np.linalg.norm(m, axis=1), 1e-300)
        subs = g["sub"].to_numpy()
        lo_sub = subs.min()
        if subs.max() == lo_sub:  # diagonal tile (or unsplit bucket)
            sims = (m @ m.T) / (n[:, None] * n[None, :])
            mask = (sims >= threshold) & (ids[:, None] < ids[None, :])
            ii, jj = np.nonzero(mask)
            a, b, v = ids[ii], ids[jj], sims[ii, jj]
        else:  # cross tile: sub-block i rows × sub-block j rows
            am = subs == lo_sub
            ma, mb_ = m[am], m[~am]
            ia, ib = ids[am], ids[~am]
            sims = (ma @ mb_.T) / (n[am][:, None] * n[~am][None, :])
            mask = (sims >= threshold) & (ia[:, None] != ib[None, :])
            ii, jj = np.nonzero(mask)
            a0, b0, v = ia[ii], ib[jj], sims[ii, jj]
            a, b = np.minimum(a0, b0), np.maximum(a0, b0)
        return pd.DataFrame(
            {"id_a": a, "id_b": b, "cosine": v.astype(np.float64)}
        )

    pairs = tiled.groupby("tkey").map_groups(pairs_in_tile, batch_format="pandas")
    # a pair found in several tables appears once per table; cosine is the
    # same value each time, so max == the value
    return pairs.groupby(["id_a", "id_b"]).aggregate(Max("cosine", alias_name="cosine"))


def embedding_lsh_pairs_oracle_sql(
    dim: int = 64,
    threshold: float = 0.95,
    num_bits: int = 8,
    num_tables: int = 4,
    table: str = "embeddings",
) -> str:
    """DuckDB mirror of ``embedding_near_dups_lsh``: the SAME seeded planes are
    inlined as literals, candidate membership is shared-bucket-in-any-table,
    and cosine is the same float64 dot/(‖a‖·‖b‖) formulation."""
    from .similarity import HyperplaneLsh

    hashers = [HyperplaneLsh(dim, num_bits, seed=11 + 7 * t) for t in range(num_tables)]

    def bucket_expr(t: int) -> str:
        terms = []
        for j in range(num_bits):
            vec = ", ".join(repr(float(x)) for x in hashers[t].planes[j])
            terms.append(
                f"(CASE WHEN list_dot_product(de, [{vec}]) > 0 THEN {1 << j} ELSE 0 END)"
            )
        return " + ".join(terms)

    buckets = ",\n               ".join(
        f"({bucket_expr(t)}) AS b{t}" for t in range(num_tables)
    )
    on = " OR ".join(f"x.b{t} = y.b{t}" for t in range(num_tables))
    return f"""
        WITH b AS (
            SELECT vec_id, de,
               {buckets}
            FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS de FROM {table})
        )
        SELECT x.vec_id AS id_a, y.vec_id AS id_b
        FROM b x JOIN b y ON x.vec_id < y.vec_id AND ({on})
        WHERE list_dot_product(x.de, y.de)
              / (sqrt(list_dot_product(x.de, x.de))
                 * sqrt(list_dot_product(y.de, y.de))) >= {threshold}
    """


def simhash_near_dups(
    ds,
    max_hamming: int = 3,
    coarse_buckets: int | None = None,
    broadcast_sig_bytes: int = 256 << 20,
    concurrency: int = 4,
):
    """SimHash near-dup pairs with EXACT recall: (doc_a, doc_b, hamming ≤ k).

    Pigeonhole banding: the 64-bit signature splits into k+1 bands, and any
    pair within hamming k must agree EXACTLY on at least one band — so
    candidates are one lean (band_key, doc_id) shuffle (the same
    coarse-bucket segment pair-gen as MinHash banding) and the band pass
    misses nothing. Candidates are then verified by exact hamming
    (popcount of xor), so the output EQUALS the all-pairs SQL answer
    (``simhash_near_dups_oracle_sql`` — same md5-bit-exact signature CTE as
    the simhash oracle, bit_count(xor) filter). Verification reads the
    signature array broadcast via ray.put below ``broadcast_sig_bytes``
    (N × 8 B — the small side by construction); above it two bucketed hash
    joins attach the int64 signatures instead.
    """
    import ray
    import ray.data

    from ..blocks import adaptive_buckets
    from ..hashing import stable_hash

    bands = max_hamming + 1
    width = 64 // bands
    widths = [width] * (bands - 1) + [64 - width * (bands - 1)]
    offsets = np.cumsum([0] + widths[:-1])

    sigs = simhash_signatures(ds, concurrency=concurrency).materialize()
    n_docs = sigs.count()
    nb = coarse_buckets or adaptive_buckets(n_docs * bands, lo=128)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["simhash"].to_numpy().view(np.uint64)
        ids = batch["doc_id"].to_numpy()
        frames = []
        for b in range(bands):
            val = (s >> np.uint64(offsets[b])) & np.uint64((1 << widths[b]) - 1)
            # band id folded into the key so equal values in different bands
            # never collide
            key = (np.uint64(b) << np.uint64(58)) | val
            frames.append(pd.DataFrame({"bkey": key.view(np.int64), "doc_id": ids}))
        out = pd.concat(frames, ignore_index=True)
        out["bucket"] = (
            stable_hash(out["bkey"]) % np.uint64(nb)
        ).astype(np.int32)
        return out

    def _empty() -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_a": pd.Series([], dtype="int64"),
             "doc_b": pd.Series([], dtype="int64"),
             "hamming": pd.Series([], dtype="int64")}
        )

    def band_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["bkey", "doc_id"], kind="stable").drop_duplicates(
            ["bkey", "doc_id"]
        )
        bk = g["bkey"].to_numpy()
        ids = g["doc_id"].to_numpy()
        if len(bk) < 2:
            return _empty()[["doc_a", "doc_b"]]
        starts = np.flatnonzero(np.r_[True, bk[1:] != bk[:-1]])
        lens = np.diff(np.r_[starts, len(bk)])
        ia, ib = [], []
        for s, ln in zip(starts, lens):
            if ln < 2:
                continue
            iu, ju = np.triu_indices(ln, k=1)
            ia.append(s + iu)
            ib.append(s + ju)
        if not ia:
            return _empty()[["doc_a", "doc_b"]]
        out = pd.DataFrame(
            {"doc_a": ids[np.concatenate(ia)], "doc_b": ids[np.concatenate(ib)]}
        )
        return out.drop_duplicates(["doc_a", "doc_b"])

    cands = (
        sigs.map_batches(explode, batch_format="pandas")
        .groupby("bucket")
        .map_groups(band_pairs, batch_format="pandas")
    )

    def add_pbucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["pbucket"] = (
            (batch["doc_a"].to_numpy().astype(np.uint64) * np.uint64(2654435761)
             + batch["doc_b"].to_numpy().astype(np.uint64))
            % np.uint64(nb)
        ).astype(np.int32)
        return batch

    deduped = (
        cands.map_batches(add_pbucket, batch_format="pandas")
        .groupby("pbucket")
        .map_groups(
            lambda g: g.drop_duplicates(["doc_a", "doc_b"]), batch_format="pandas"
        )
        .drop_columns(["pbucket"])
    )

    def _ham(sa: np.ndarray, sb: np.ndarray) -> np.ndarray:
        x = sa ^ sb
        cnt = np.zeros(len(x), dtype=np.int64)
        for _ in range(64):
            cnt += (x & np.uint64(1)).astype(np.int64)
            x = x >> np.uint64(1)
        return cnt

    if n_docs * 8 > broadcast_sig_bytes:
        from .joins import bucketed_hash_join

        def _side(name: str):
            return sigs.map_batches(
                lambda df, _n=name: df.rename(
                    columns={"doc_id": f"doc_{_n}", "simhash": f"sig_{_n}"}
                ),
                batch_format="pandas",
            )

        j = bucketed_hash_join(deduped, _side("a"), on="doc_a")
        j = bucketed_hash_join(j, _side("b"), on="doc_b")

        def verify_joined(b: pd.DataFrame) -> pd.DataFrame:
            if not len(b):
                return _empty()
            ham = _ham(
                b["sig_a"].to_numpy().view(np.uint64),
                b["sig_b"].to_numpy().view(np.uint64),
            )
            keep = ham <= max_hamming
            out = b.loc[keep, ["doc_a", "doc_b"]].copy()
            out["hamming"] = ham[keep]
            return out if len(out) else _empty()

        return j.map_batches(verify_joined, batch_format="pandas")

    sp = sigs.to_pandas().sort_values("doc_id", kind="stable")
    ref = ray.put(
        (sp["doc_id"].to_numpy(), sp["simhash"].to_numpy().view(np.uint64))
    )

    def verify(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return _empty()
        ids_sorted, mat = ray.get(ref)
        sa = mat[np.searchsorted(ids_sorted, b["doc_a"].to_numpy())]
        sb = mat[np.searchsorted(ids_sorted, b["doc_b"].to_numpy())]
        ham = _ham(sa, sb)
        keep = ham <= max_hamming
        out = b.loc[keep, ["doc_a", "doc_b"]].copy()
        out["hamming"] = ham[keep]
        return out if len(out) else _empty()

    return deduped.map_batches(verify, batch_format="pandas")


def canonicalize_near_dups(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.8,
):
    """Map every document to its near-dup group REPRESENTATIVE — the member
    with the most whitespace tokens (tie → lowest id); singletons map to
    themselves. The keep-best flavour of dedup a curation pipeline wants when
    duplicates differ in truncation.

    Composition: verified MinHash near-dup pairs → connected groups (the
    designed small side — only near-dup members appear) → driver-side
    representative election over that small set → ONE map-only pass over the
    corpus with the broadcast {dup doc → rep} dict. Above ~10^8 dup members
    the rep join swaps to the bucketed-hash-join path like curate's keeper
    membership."""
    import ray

    groups = dup_groups(
        verified_near_dup_pairs(ds, jaccard_threshold=jaccard_threshold)
    ).to_pandas()

    def rep_of(doc_ids: set):
        from .joins import semi_join

        members = semi_join(
            ds, np.array(sorted(doc_ids)), on=id_col
        ).to_pandas()
        toks = members[text_col].str.split(" ").str.len()
        members = members.assign(_ntok=toks)[[id_col, "_ntok"]]
        return members

    if len(groups):
        members = rep_of(set(groups[id_col]))
        g = groups.merge(members, on=id_col)
        g = g.sort_values(
            ["dup_group", "_ntok", id_col], ascending=[True, False, True],
            kind="stable",
        )
        reps = g.groupby("dup_group", sort=False).first()[id_col]
        rep_map = dict(zip(g["dup_group"], g["dup_group"].map(reps)))
        doc_to_rep = {
            d: rep_map[grp] for d, grp in zip(groups[id_col], groups["dup_group"])
        }
    else:
        doc_to_rep = {}
    map_ref = ray.put(doc_to_rep)

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        lut = ray.get(map_ref)
        ids = batch[id_col]
        return pd.DataFrame(
            {
                id_col: ids.to_numpy(),
                "canonical_id": ids.map(lut).fillna(ids).astype(np.int64),
            }
        )

    return ds.map_batches(assign, batch_format="pandas")


def canonicalize_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB mirror of ``canonicalize_near_dups``: the minhash-groups CTE
    (same exact-Jaccard ≥ .8 + transitive closure as the minhash_near_dups
    oracle), then per-group representative by (token count DESC, id)."""
    return f"""
    WITH RECURSIVE d AS (
        SELECT {id_col}, regexp_extract_all(lower(coalesce({text_col}, '')), '\\w+') AS toks
        FROM {table}
    ), sh AS (
        SELECT {id_col},
          list_distinct(CASE WHEN len(toks) >= 3
            THEN list_transform(generate_series(1, len(toks) - 2),
                                i -> array_to_string(toks[i:i+2], ' '))
            ELSE [array_to_string(toks, ' ')] END) AS shingles
        FROM d
    ), e AS (
        SELECT {id_col}, unnest(shingles) AS s FROM sh
    ), inter AS (
        SELECT x.{id_col} AS doc_a, y.{id_col} AS doc_b, count(*) AS n_int
        FROM e x JOIN e y ON x.s = y.s AND x.{id_col} < y.{id_col}
        GROUP BY 1, 2
    ), sizes AS (
        SELECT {id_col}, len(shingles) AS n FROM sh
    ), pairs AS (
        SELECT doc_a, doc_b
        FROM inter
        JOIN sizes sa ON sa.{id_col} = doc_a
        JOIN sizes sb ON sb.{id_col} = doc_b
        WHERE CAST(n_int AS DOUBLE) / (sa.n + sb.n - n_int) >= 0.8
    ), edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs
    ), reach(node, x) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.node, e2.b FROM reach r JOIN edges e2 ON e2.a = r.x
    ), groups AS (
        SELECT node AS {id_col}, least(node, min(x)) AS grp
        FROM reach GROUP BY node
    ), ntok AS (
        SELECT {id_col}, len(string_split({text_col}, ' ')) AS n FROM {table}
    ), reps AS (
        SELECT grp, {id_col} AS rep_id FROM (
            SELECT g.grp, g.{id_col},
                   row_number() OVER (
                       PARTITION BY g.grp ORDER BY t.n DESC, g.{id_col}
                   ) AS rn
            FROM groups g JOIN ntok t USING ({id_col})
        ) WHERE rn = 1
    )
    SELECT t.{id_col},
           coalesce(r.rep_id, t.{id_col}) AS canonical_id
    FROM ntok t
    LEFT JOIN groups g USING ({id_col})
    LEFT JOIN reps r ON r.grp = g.grp
    """


# -- token count-vector cosine near-dup ---------------------------------------


def tf_cosine_near_dups(
    ds,
    threshold: float = 0.95,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_vocab: int = 100_000,
):
    """Exact cosine near-dup pairs in TOKEN space: each document becomes its
    term-frequency count vector over the corpus vocabulary, then the same
    distributed block-pair matmul tiles as ``embedding_near_dups`` emit pairs
    with cosine ≥ threshold (doc_a < doc_b).

    This is the bag-of-words cousin of the embedding near-dup: no model
    needed, catches token-permutation near-copies MinHash shingles miss.
    Vocabulary is built once (``build_vocab``: map-only partials, O(vocab)
    combine, capped at ``max_vocab`` by (count DESC, term) — rarer terms are
    dropped from the vectors on overflow) and broadcast via ``ray.put``;
    featurization is one map-only pass (np.add.at scatter per batch, no
    Python row loop). Counts are small integers, so every float64 dot/norm
    is exact and the stage is oracle-checkable bit-for-bit against the SQL
    term-join formulation (``tf_cosine_oracle_sql``) — the tiles never pay
    the O(Σ df²) term-join blowup the SQL oracle does.
    """
    import ray

    from .text import build_vocab

    vocab = build_vocab(ds, text_col=text_col, max_size=max_vocab)
    vidx = {t: i for i, t in enumerate(vocab["term"])}
    dim = max(len(vidx), 1)
    vref = ray.put(vidx)

    def featurize(batch: pa.Table) -> pa.Table:
        lut = ray.get(vref)
        toks = pc.split_pattern(batch.column(text_col), pattern=" ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = (
            toks.combine_chunks().flatten()
            if isinstance(toks, pa.ChunkedArray)
            else toks.flatten()
        )
        cols = pd.Series(flat.to_pandas().to_numpy(dtype=object)).map(lut)
        rows = np.repeat(np.arange(len(lens)), lens)
        keep = cols.notna().to_numpy()  # OOV terms (vocab overflow) drop out
        mat = np.zeros((len(lens), dim), np.float64)
        np.add.at(mat, (rows[keep], cols.to_numpy(np.float64, na_value=-1)[keep].astype(np.int64)), 1.0)
        emb = pa.FixedSizeListArray.from_arrays(pa.array(mat.ravel()), dim)
        return pa.table({id_col: batch.column(id_col), "embedding": emb})

    vecs = ds.map_batches(featurize, batch_format="pyarrow", zero_copy_batch=True)
    pairs = embedding_near_dups(vecs, threshold=threshold, id_col=id_col)
    return pairs.map_batches(
        lambda t: t.rename_columns(["doc_a", "doc_b", "cosine"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def tf_cosine_oracle_sql(
    table: str = "documents",
    threshold: float = 0.95,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB mirror of ``tf_cosine_near_dups``: term-join dot products over
    the same space-split tokens; integer dot/norm sums cast to DOUBLE at the
    same points as the engine's float64 kernel (sqrt, sqrt, multiply, divide
    in the same order), so the cosine values hash-match exactly."""
    return f"""
        WITH tok AS (
            SELECT {id_col}, unnest(string_split({text_col}, ' ')) AS term
            FROM {table}
        ), tf AS (
            SELECT {id_col}, term, count(*) AS c FROM tok GROUP BY 1, 2
        ), nrm AS (
            SELECT {id_col}, sum(c * c) AS n2 FROM tf GROUP BY 1
        ), dot AS (
            SELECT a.{id_col} AS doc_a, b.{id_col} AS doc_b,
                   sum(a.c * b.c) AS d
            FROM tf a JOIN tf b
              ON a.term = b.term AND a.{id_col} < b.{id_col}
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               CAST(d AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE))
                                    * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine
        FROM dot
        JOIN nrm na ON na.{id_col} = doc_a
        JOIN nrm nb ON nb.{id_col} = doc_b
        WHERE CAST(d AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE))
                                   * sqrt(CAST(nb.n2 AS DOUBLE))) >= {threshold}
    """


# -- C4-style duplicate-span removal (window dedup) ---------------------------


def _explode_windows(
    batch: pa.Table, id_col: str, text_col: str, window: int
) -> pd.DataFrame:
    """(doc_id, widx, win, pk) rows: consecutive ``window``-token spans.
    Vectorized: one RE2 findall, numpy repeat for doc ids, pandas groupby-join
    per (doc, widx) — no per-document Python loop."""
    df = batch.select([id_col, text_col]).to_pandas()
    toks = df[text_col].str.findall(r"\w+")
    lens = toks.str.len().fillna(0).astype(np.int64).to_numpy()
    doc_rep = np.repeat(df[id_col].to_numpy(), lens)
    pos = np.concatenate([np.arange(n) for n in lens]) if len(lens) else np.array([], np.int64)
    flat = np.concatenate([np.asarray(t, dtype=object) for t in toks if len(t)]) if lens.sum() else np.array([], object)
    out = pd.DataFrame({id_col: doc_rep, "widx": pos // window, "tok": flat})
    wins = (
        out.groupby([id_col, "widx"], sort=False)["tok"]
        .agg(" ".join)
        .reset_index()
        .rename(columns={"tok": "win"})
    )
    wins["pk"] = wins[id_col].to_numpy(np.int64) * 1_000_000 + wins["widx"].to_numpy(np.int64)
    return wins


def window_dedup(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 10,
):
    """C4-style duplicate-span removal (C4 drops repeated three-sentence spans;
    Lee et al. 2022 dedups exact substrings): split each document into
    consecutive ``window``-token spans, keep each DISTINCT span only at its
    first corpus occurrence (min (doc_id, widx)), and reassemble the surviving
    spans per document in order. Documents whose every span is a duplicate
    vanish.

    Two shuffles, no joins, nothing on the driver: explode (map, vectorized) →
    coarse-bucket groupby on span hash, keep-first VECTORIZED within each
    bucket (one pandas idxmin per bucket, not one Python call per span — the
    repo's coarse-bucket pattern; a per-span map_groups costs ~0.3 ms × spans)
    → coarse-bucket groupby on doc, ordered reassembly. At 100 TB the span
    shuffle carries the corpus once (the cost every exact-substring dedup
    pays), hash-bucketed so hot spans skew at most one reducer."""
    num_buckets = 64

    def explode(batch: pa.Table) -> pd.DataFrame:
        wins = _explode_windows(batch, id_col, text_col, window)
        h = stable_hash(pa.array(wins["win"], pa.string()))
        wins["bucket"] = (h % np.uint64(num_buckets)).astype(np.int64)
        return wins

    def keep_first(grp: pd.DataFrame) -> pd.DataFrame:
        # one bucket = many spans: winner per span in ONE vectorized idxmin
        keep = grp.loc[grp.groupby("win", sort=False)["pk"].idxmin()]
        out = keep[[id_col, "widx", "win"]].copy()
        out["dbucket"] = out[id_col].to_numpy(np.int64) % num_buckets
        return out

    def reassemble(grp: pd.DataFrame) -> pd.DataFrame:
        g = grp.sort_values([id_col, "widx"], kind="stable")
        agg = g.groupby(id_col, sort=False)["win"].agg(" ".join)
        return pd.DataFrame({id_col: agg.index, "text": agg.to_numpy()})

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(keep_first, batch_format="pandas")
        .groupby("dbucket")
        .map_groups(reassemble, batch_format="pandas")
    )


def window_dedup_oracle_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text", window: int = 10
) -> str:
    """DuckDB mirror of ``window_dedup``: list_transform windowing, QUALIFY
    keep-first per span, ordered string_agg reassembly."""
    return f"""
        WITH toks AS (
            SELECT {id_col}, regexp_extract_all({text_col}, '\\w+') AS tks
            FROM {table}
        ), sized AS (
            SELECT {id_col}, tks,
                   CAST(ceil(len(tks) / {window}.0) AS BIGINT) AS nw
            FROM toks WHERE len(tks) > 0
        ), wins AS (
            SELECT {id_col},
                   UNNEST(list_transform(generate_series(1, nw), i -> i - 1)) AS widx,
                   UNNEST(list_transform(generate_series(1, nw),
                       i -> array_to_string(tks[(i-1)*{window}+1 : i*{window}], ' '))) AS win
            FROM sized
        ), kept AS (
            SELECT {id_col}, widx, win FROM wins
            QUALIFY row_number() OVER (
                PARTITION BY win
                ORDER BY {id_col} * 1000000 + widx) = 1
        )
        SELECT {id_col}, string_agg(win, ' ' ORDER BY widx) AS text
        FROM kept GROUP BY {id_col}
    """


# -- SemDeDup (semantic dedup within k-means clusters) -------------------------


def semantic_dedup(
    ds,
    centroids: np.ndarray,
    threshold: float = 0.95,
    id_col: str = "vec_id",
):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): assign every embedding
    to its nearest k-means centroid, then WITHIN each cluster drop any vector
    that has an earlier-id neighbor at cosine ≥ threshold. Keep-first on the
    pairwise relation (not the paper's arbitrary representative) makes the
    answer deterministic and SQL-expressible. Output (vec_id, cluster, keep).

    Scale shape: assignment is a map-only pass against the broadcast centroid
    matrix; the quadratic sim matrix is confined to one cluster per task
    (cluster count scales with N, so |cluster| ≈ N/C stays bounded — the whole
    point of the cluster stage in the paper)."""
    import ray

    cref = ray.put(np.asarray(centroids, np.float64)) if ray.is_initialized() else None
    cmat = np.asarray(centroids, np.float64)

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cref) if cref is not None else cmat
        x = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        cluster = np.argmax(x @ c.T, axis=1).astype(np.int64)
        return pd.DataFrame(
            {id_col: batch[id_col].to_numpy(), "cluster": cluster,
             "ne": list(x)}
        )

    def dedup_cluster(grp: pd.DataFrame, tile: int = 2048) -> pd.DataFrame:
        g = grp.sort_values(id_col, kind="stable").reset_index(drop=True)
        x = np.stack(g["ne"].to_numpy())
        n = len(x)
        # tiled over id-ordered chunks: peak memory is O(n·tile), never the
        # full n² sim matrix — the jumbo-cluster guard (duplicate-heavy
        # corpora produce hot clusters; compute stays O(n²·dim), memory
        # doesn't). drop[i] = any EARLIER row at sim ≥ t — earlier dropped
        # rows count too (pairwise keep-first, matching the SQL oracle).
        drop = np.zeros(n, dtype=bool)
        for s0 in range(0, n, tile):
            blk = x[s0 : s0 + tile]
            if s0 > 0:
                hit = (x[:s0] @ blk.T) >= threshold
                drop[s0 : s0 + len(blk)] |= hit.any(axis=0)
            intra = np.triu(blk @ blk.T >= threshold, k=1)
            drop[s0 : s0 + len(blk)] |= intra.any(axis=0)
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                "cluster": g["cluster"].to_numpy(),
                "keep": ~drop,
            }
        )

    return (
        ds.map_batches(assign, batch_format="pandas")
        .groupby("cluster")
        .map_groups(dedup_cluster, batch_format="pandas")
    )


def semantic_dedup_oracle_sql(
    centroids: np.ndarray,
    threshold: float = 0.95,
    table: str = "embeddings",
    id_col: str = "vec_id",
) -> str:
    """DuckDB mirror of ``semantic_dedup``: centroids inlined as literals
    (the ivf_topk_oracle_sql pattern), argmax via list_position-of-list_max
    (first occurrence on ties = np.argmax), keep = no earlier-id same-cluster
    neighbor at cosine ≥ threshold (correlated NOT EXISTS)."""

    def lit(v) -> str:
        return "[" + ", ".join(repr(float(x)) for x in v) + "]"

    dots = ", ".join(
        f"list_dot_product(ne, {lit(c)})" for c in np.asarray(centroids, np.float64)
    )
    return f"""
        WITH v AS (
            SELECT {id_col},
                   list_transform(CAST(embedding AS DOUBLE[]),
                                  x -> x / sqrt(list_dot_product(
                                      CAST(embedding AS DOUBLE[]),
                                      CAST(embedding AS DOUBLE[])))) AS ne
            FROM {table}
        ), a AS (
            SELECT {id_col}, ne,
                   CAST(list_position(dl, list_max(dl)) - 1 AS BIGINT) AS cluster
            FROM (SELECT {id_col}, ne, [{dots}] AS dl FROM v)
        )
        SELECT a.{id_col}, a.cluster,
               NOT EXISTS (
                   SELECT 1 FROM a b
                   WHERE b.cluster = a.cluster AND b.{id_col} < a.{id_col}
                     AND list_dot_product(a.ne, b.ne) >= {threshold}
               ) AS keep
        FROM a
    """


# -- exact n-gram containment (overlap coefficient) ----------------------------


class _AllShingleExploder(_PrefixShingleExploder):
    """Like _PrefixShingleExploder but indexes EVERY shingle plus the doc's
    set size: containment (overlap coefficient) has no symmetric prefix bound —
    a tiny doc fully contained in a huge one shares only the tiny side's
    shingles, so nothing can be skipped. Emits (doc_id, sh, n, bucket)."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = self.n
        ids, lists = [], []
        for did, text in zip(batch["doc_id"], batch["text"]):
            toks = self.tok.findall((text or "").lower())
            if len(toks) < n:
                s = [" ".join(toks)]
            else:
                s = list({" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)})
            ids.append(did)
            lists.append(s)
        if not lists:
            return pd.DataFrame(
                {"doc_id": pd.Series(dtype="int64"), "sh": pd.Series(dtype="int64"),
                 "n": pd.Series(dtype="int64"), "bucket": pd.Series(dtype="int32")}
            )
        lengths = np.array([len(s) for s in lists], dtype=np.int64)
        flat = np.concatenate([np.array(s, dtype=object) for s in lists])
        h = stable_hash(flat).astype(np.int64)
        doc = np.repeat(np.asarray(ids, dtype=np.int64), lengths)
        size = np.repeat(lengths, lengths)
        return pd.DataFrame(
            {
                "doc_id": doc,
                "sh": h,
                "n": size,
                "bucket": (h % self.BUCKETS).astype(np.int32),
            }
        )


def ngram_containment_pairs(
    ds,
    threshold_permille: int = 800,
    shingle_n: int = 3,
    concurrency: int = 4,
):
    """EXACT overlap-coefficient (containment) pairs:
    ``1000·|A∩B| ≥ threshold_permille·min(|A|,|B|)`` — catches a short document
    quoted inside a long one, which Jaccard misses (the union washes it out).

    Same shingle definition as ngram_jaccard. All integer arithmetic (permille
    cross-multiplication), so the SQL oracle matches bit-for-bit. Shape:
    all-shingle inverted index → coarse-bucket shuffle → per-bucket pair
    PARTIAL intersection counts (a pair's shingles span buckets) → one
    (doc_a, doc_b) sum groupby → integer threshold. The shuffle carries
    (doc_id, sh) once — the standard exact-containment cost; candidate volume
    is bounded by shingle co-occurrence, the same profile as the jaccard
    index without its prefix cut."""
    docs = ds.select_columns(["doc_id", "text"])
    exploded = docs.map_batches(
        _AllShingleExploder,
        fn_constructor_kwargs={"threshold": 0.0, "shingle_n": shingle_n},
        batch_format="pandas",
        batch_size=2048,
        concurrency=(1, concurrency),
    )

    _PAIR_BUCKETS = 64

    def bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="sh")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        if m.empty:
            return pd.DataFrame(
                {"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64"),
                 "n_int": pd.Series(dtype="int64"), "n_a": pd.Series(dtype="int64"),
                 "n_b": pd.Series(dtype="int64"), "pb": pd.Series(dtype="int32")}
            )
        agg = (
            m.groupby(["doc_id_x", "doc_id_y", "n_x", "n_y"], sort=False)
            .size()
            .reset_index(name="n_int")
        )
        agg = agg.rename(
            columns={"doc_id_x": "doc_a", "doc_id_y": "doc_b", "n_x": "n_a", "n_y": "n_b"}
        )[["doc_a", "doc_b", "n_int", "n_a", "n_b"]]
        # coarse pair-bucket for the cross-bucket sum: Ray's groupby().aggregate
        # degrades to per-group Python at high group cardinality (measured:
        # >200 s for 1.3M pair groups where this whole operator is ~4 s), so
        # the final sum runs as a VECTORIZED pandas groupby inside 64 coarse
        # groups instead — the window_dedup pattern.
        pb = (agg["doc_a"].to_numpy() * np.int64(1_000_003) + agg["doc_b"].to_numpy())
        agg["pb"] = (pb % _PAIR_BUCKETS).astype(np.int32)
        return agg

    def pair_sum(g: pd.DataFrame, tp=threshold_permille) -> pd.DataFrame:
        # a pair's partials (one per shingle bucket) all share its pb, so the
        # sum inside one coarse group is the pair's EXACT intersection size
        agg = g.groupby(["doc_a", "doc_b"], sort=False, as_index=False).agg(
            n_int=("n_int", "sum"), n_a=("n_a", "max"), n_b=("n_b", "max")
        )
        mn = np.minimum(agg["n_a"].to_numpy(), agg["n_b"].to_numpy())
        keep = 1000 * agg["n_int"].to_numpy() >= tp * mn
        out = agg.loc[keep].reset_index(drop=True)
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out

    return (
        exploded.groupby("bucket")
        .map_groups(bucket_counts, batch_format="pandas")
        .groupby("pb")
        .map_groups(pair_sum, batch_format="pandas")
        .map_batches(
            lambda t: t.select(["doc_a", "doc_b", "n_int", "n_a", "n_b"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


# -- exact span dedup (ExactSubstr-style rewrite) -----------------------------

_SPAN_IDX_BITS = 20  # combo key = doc_id << 20 | span_idx; docs < 2^20 spans


def _doc_spans(batch: pa.Table, id_col: str, text_col: str, width: int):
    """Vectorized non-overlapping ``width``-token spans for one batch:
    (doc_ids_per_span, span_idx_per_span, span_texts). The trailing partial
    span is included, so every token belongs to exactly one span and every
    document has >= 1 span (split('') == [''])."""
    toks = pc.split_pattern(batch.column(text_col), pattern=" ")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = (
        toks.combine_chunks().flatten()
        if isinstance(toks, pa.ChunkedArray)
        else toks.flatten()
    ).to_pandas().to_numpy(dtype=object)
    n_spans = -(-lens // width) if len(lens) else lens
    if len(n_spans) and int(n_spans.max()) >= (1 << _SPAN_IDX_BITS):
        raise ValueError(
            f"document has >= 2^{_SPAN_IDX_BITS} spans; raise _SPAN_IDX_BITS"
        )
    # global span id per token -> one ' '.join per span (C string work)
    tok_in_doc = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(lens)[:-1]]) if len(lens) else [], lens
    )
    span_base = np.concatenate([[0], np.cumsum(n_spans)[:-1]]) if len(n_spans) else n_spans
    sg = np.repeat(span_base, lens) + tok_in_doc // width
    texts = (
        pd.Series(flat).groupby(sg, sort=True).agg(" ".join).to_numpy(dtype=object)
        if len(flat)
        else np.array([], dtype=object)
    )
    ids = np.repeat(batch.column(id_col).to_numpy(zero_copy_only=False), n_spans)
    span_idx = np.arange(int(n_spans.sum()), dtype=np.int64) - np.repeat(span_base, n_spans)
    return ids, span_idx, texts


def _span_fp(texts: np.ndarray) -> np.ndarray:
    """md5 hex per span (unique-value cache), portable to DuckDB md5()."""
    uniq, inv = np.unique(texts.astype(str), return_inverse=True)
    hashes = np.array(
        [hashlib.md5(s.encode("utf-8")).hexdigest() for s in uniq], dtype=object
    )
    return hashes[inv]


def span_dedup(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 16,
    broadcast_threshold: int = 20_000_000,
):
    """Cross-corpus EXACT SPAN DEDUP — the rewrite side of Lee et al. 2022's
    exact substring dedup, window-quantized to be shuffle-friendly: each
    document is cut into consecutive non-overlapping ``width``-token spans;
    a span occurrence survives only if it is the corpus-wide FIRST occurrence
    of that span text (order = (doc_id, span_idx)); surviving spans are
    re-joined in document order. Returns (doc_id, text, n_spans,
    n_spans_kept) for every input document (text='' when nothing survives).

    Shape: pass 1 pre-mins (span md5 -> combo key) per batch (combiner), then
    a BUCKET TASK EXCHANGE takes the global min per span — per-block pre-min
    tables split by hash(fp), one reduce task per bucket (the Dataset
    hash-groupby here cost ~17 s of aggregator-actor fixed overhead at sf0.1
    against ~0.4 s of actual kernel work; same lesson as pagerank /
    triangle_stats: lean tables want the exchange, not the shuffle op). The
    winner combos — O(unique spans) int64s — broadcast once via ray.put
    (above ``broadcast_threshold`` raise — the bucketed semi-join fallback on
    the combo key is the documented swap, stages/decontaminate.py pattern);
    pass 2 re-derives spans and keeps winners via one searchsorted.
    kgram_dup_stats is the read-only signal twin of this operator."""
    import ray

    from ..hashing import stable_hash as _sh

    def pre_min(batch: pa.Table) -> pd.DataFrame:
        ids, span_idx, texts = _doc_spans(batch, id_col, text_col, width)
        if not len(ids):
            return pd.DataFrame({"fp": pd.Series([], dtype=object), "combo": pd.Series([], dtype=np.int64)})
        combo = (ids.astype(np.int64) << _SPAN_IDX_BITS) | span_idx
        df = pd.DataFrame({"fp": _span_fp(texts), "combo": combo})
        return df.groupby("fp", sort=False, as_index=False)["combo"].min()

    pre = ds.map_batches(pre_min, batch_format="pyarrow").materialize()
    B = 16

    def _split(t: pa.Table) -> list:
        b = (
            _sh(t.column("fp").to_numpy(zero_copy_only=False)) % np.uint64(B)
        ).astype(np.int64)
        order = np.argsort(b, kind="stable")
        tt, sb = t.take(pa.array(order)), b[order]
        cuts = np.searchsorted(sb, np.arange(B + 1))
        return [tt.slice(cuts[i], cuts[i + 1] - cuts[i]) for i in range(B)]

    def _reduce(*parts) -> np.ndarray:
        df = pa.concat_tables(parts).to_pandas()
        if not len(df):
            return np.empty(0, np.int64)
        return df.groupby("fp", sort=False)["combo"].min().to_numpy(np.int64)

    split = ray.remote(num_returns=B)(_split)
    reduce_t = ray.remote(_reduce)
    cols = [split.remote(r) for r in pre.to_arrow_refs()]
    buckets = ray.get([reduce_t.remote(*[c[b] for c in cols]) for b in range(B)])
    n_winners = sum(len(w) for w in buckets)
    if n_winners > broadcast_threshold:
        raise NotImplementedError(
            "winner set exceeds the broadcast budget; use the bucketed "
            "semi-join fallback on the combo key (stages/decontaminate.py "
            "pattern)"
        )
    keep = np.sort(np.concatenate(buckets)) if buckets else np.empty(0, np.int64)
    keep_ref = ray.put(keep)

    def rewrite(batch: pa.Table) -> pa.Table:
        kset = ray.get(keep_ref)
        ids, span_idx, texts = _doc_spans(batch, id_col, text_col, width)
        combo = (ids.astype(np.int64) << _SPAN_IDX_BITS) | span_idx
        pos = np.clip(np.searchsorted(kset, combo), 0, max(len(kset) - 1, 0))
        kept = kset[pos] == combo if len(kset) else np.zeros(len(combo), bool)
        doc_ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        per = pd.DataFrame({"doc": ids, "kept": kept})
        g = per.groupby("doc", sort=False)["kept"]
        counts = pd.DataFrame({"n_spans": g.size(), "n_spans_kept": g.sum()})
        counts = counts.reindex(doc_ids, fill_value=0)
        joined = (
            pd.Series(texts[kept]).groupby(ids[kept], sort=False).agg(" ".join)
            if kept.any()
            else pd.Series([], dtype=object)
        )
        joined = joined.reindex(doc_ids).fillna("")
        return pa.table(
            {
                id_col: batch.column(id_col),
                "text": pa.array(joined.to_numpy(dtype=object), pa.string()),
                "n_spans": pa.array(counts["n_spans"].to_numpy(np.int64)),
                "n_spans_kept": pa.array(counts["n_spans_kept"].to_numpy(np.int64)),
            }
        )

    return ds.map_batches(rewrite, batch_format="pyarrow")


def span_dedup_oracle_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text", width: int = 16
) -> str:
    """DuckDB mirror of ``span_dedup`` (same space split, same inclusive-end
    list slice as kgram_dup_oracle_sql, same (doc_id, span_idx) first-
    occurrence order via the identical combo key)."""
    return f"""
        WITH l AS (
            SELECT {id_col}, string_split({text_col}, ' ') AS l FROM {table}
        ), sp AS (
            SELECT {id_col},
                   CAST((i - 1) / {width} AS BIGINT) AS span_idx,
                   array_to_string(l[i:i + {width - 1}], ' ') AS span
            FROM l, UNNEST(range(1, len(l) + 1, {width})) AS t(i)
        ), win AS (
            SELECT md5(span) AS fp,
                   MIN({id_col} * {1 << _SPAN_IDX_BITS} + span_idx) AS combo
            FROM sp GROUP BY 1
        ), agg AS (
            SELECT sp.{id_col},
                   count(*) AS n_spans,
                   count(*) FILTER (
                       WHERE sp.{id_col} * {1 << _SPAN_IDX_BITS} + sp.span_idx
                             = win.combo
                   ) AS n_spans_kept,
                   coalesce(string_agg(sp.span, ' ' ORDER BY sp.span_idx)
                            FILTER (
                       WHERE sp.{id_col} * {1 << _SPAN_IDX_BITS} + sp.span_idx
                             = win.combo
                   ), '') AS text
            FROM sp JOIN win ON md5(sp.span) = win.fp
            GROUP BY 1
        )
        SELECT {id_col}, text,
               CAST(n_spans AS BIGINT) AS n_spans,
               CAST(n_spans_kept AS BIGINT) AS n_spans_kept
        FROM agg
    """
