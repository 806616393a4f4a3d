"""DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS 2023,
arXiv:2302.03169) — pick raw-corpus documents whose hashed n-gram profile
looks like a TARGET domain.

The reference has nothing like this (it is a training-data op, added per the
round brief); the distributed shape is the same two-pass recipe as
``stages/text.py::lm_fluency``:

1. one map-only COUNT pass — per-batch partial (bucket → target count, raw
   count) frames that sum exactly on the driver (the feature space is a fixed
   ``num_buckets`` grid, so the combine is O(buckets), never O(corpus));
2. a broadcast SCORE pass — the per-bucket log-likelihood-ratio table ships
   once via ``ray.put`` and every batch scores its documents with one numpy
   gather; top-k select is per-batch partial top-k under a total order
   (score DESC, id ASC) then one tiny driver merge — identical at any
   cluster size.

Determinism contract (the house integer style): the only non-rational step,
``ln``, is quantized to an int64 at 1e6 scale with ties away from zero —
after that every per-document score is an exact integer sum, so the result
is bit-identical across block layouts AND across engines (numpy vs DuckDB
evaluate ``ln`` within an ulp; a mismatch needs the true value within ~1e-10
of a half-micro boundary).

Features are the paper's hashed unigrams + bigrams: md5(salt ‖ gram) first 13
hex chars (52 bits, float64-exact) mod ``num_buckets`` — the same md5-parse
recipe as ``stages/sampling.py::_permille_sql`` so DuckDB reproduces the
bucketing verbatim.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

_FRAC_BITS = 13
_SCALE = 1_000_000


def _round_half_away(x: np.ndarray) -> np.ndarray:
    """DuckDB ``round()`` semantics (ties away from zero) — np.rint is
    half-to-even and would disagree on exact halves."""
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))


def _grams(texts: pd.Series) -> list[list[str]]:
    """Unigrams + space-joined bigrams per doc, split on single space (the
    corpus tokenizer every oracled text op here shares)."""
    out = []
    for t in texts.fillna("").to_numpy(dtype=object):
        toks = t.split(" ")
        grams = list(toks)
        grams.extend(f"{a} {b}" for a, b in zip(toks, toks[1:]))
        out.append(grams)
    return out


def _bucket_lut(grams_flat: pd.Series, salt: str, num_buckets: int) -> pd.Series:
    """bucket id per gram — md5 only the UNIQUE grams of the batch."""
    uniq = pd.unique(grams_flat.to_numpy(dtype=object))
    lut = {
        g: int(hashlib.md5(f"{salt}{g}".encode("utf-8")).hexdigest()[:_FRAC_BITS], 16)
        % num_buckets
        for g in uniq
    }
    return grams_flat.map(lut)


def dsir_select(
    ds,
    target_sources: tuple[str, ...],
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    num_buckets: int = 4096,
    salt: str = "dsir",
):
    """Top-``k`` documents by DSIR importance weight toward ``target_sources``.

    Weight(d) = Σ_b c_{d,b} · λ_b with
    λ_b = round(1e6 · (ln((t_b+1)/(T+B)) − ln((r_b+1)/(R+B)))) — the
    add-one-smoothed hashed-n-gram log-likelihood ratio of the target
    distribution vs the full raw corpus. Returns (rank, doc_id, dsir_score),
    rank 1..k by (score DESC, id ASC).
    """
    import ray

    tset = set(target_sources)

    def count_partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.select([text_col, source_col]).to_pandas()
        grams = _grams(df[text_col])
        n = np.fromiter((len(g) for g in grams), np.int64, len(grams))
        flat = pd.Series(
            [g for gs in grams for g in gs], dtype=object
        )
        bucket = _bucket_lut(flat, salt, num_buckets).to_numpy(np.int64)
        is_t = np.repeat(df[source_col].isin(tset).to_numpy(), n)
        out = pd.DataFrame({"bucket": bucket, "t": is_t.astype(np.int64), "r": 1})
        return out.groupby("bucket", as_index=False).sum()

    from ..blocks import sum_kernel, tree_reduce

    # task-tree merge: driver sees ONE <=num_buckets-row table, independent
    # of batch count (the per-batch-partials collection scale-bug class)
    counts = tree_reduce(
        ds.map_batches(count_partial, batch_format="pyarrow"),
        sum_kernel(["bucket"], ["t", "r"]),
    ).to_pandas().set_index("bucket")
    t = np.zeros(num_buckets, np.int64)
    r = np.zeros(num_buckets, np.int64)
    t[counts.index.to_numpy()] = counts["t"].to_numpy()
    r[counts.index.to_numpy()] = counts["r"].to_numpy()
    T, R = int(t.sum()), int(r.sum())
    lam = _round_half_away(
        _SCALE
        * (
            np.log((t + 1.0) / (T + num_buckets))
            - np.log((r + 1.0) / (R + num_buckets))
        )
    ).astype(np.int64)
    lam_ref = ray.put(lam)

    def score_partial(batch: pa.Table) -> pd.DataFrame:
        lam_ = ray.get(lam_ref)
        df = batch.select([id_col, text_col]).to_pandas()
        grams = _grams(df[text_col])
        n = np.fromiter((len(g) for g in grams), np.int64, len(grams))
        flat = pd.Series([g for gs in grams for g in gs], dtype=object)
        bucket = _bucket_lut(flat, salt, num_buckets).to_numpy(np.int64)
        doc_ix = np.repeat(np.arange(len(df)), n)
        score = np.zeros(len(df), np.int64)
        np.add.at(score, doc_ix, lam_[bucket])
        out = pd.DataFrame({id_col: df[id_col].to_numpy(), "dsir_score": score})
        out = out.sort_values(
            ["dsir_score", id_col], ascending=[False, True], kind="stable"
        )
        return out.head(k)

    from ..blocks import topk_kernel

    # tree top-k under the shared total order: driver sees <=k rows
    top = tree_reduce(
        ds.map_batches(score_partial, batch_format="pyarrow"),
        topk_kernel(["dsir_score", id_col], [False, True], k),
    ).to_pandas()
    top.insert(0, "rank", np.arange(1, len(top) + 1, dtype=np.int64))
    return pa.Table.from_pandas(top.reset_index(drop=True), preserve_index=False)


def _bucket_sql(expr: str, salt: str, num_buckets: int) -> str:
    parse = (
        f"list_reduce(list_transform(range(1, {_FRAC_BITS + 1}), "
        f"i -> CAST(strpos('0123456789abcdef', substr(md5('{salt}' || {expr}), "
        f"CAST(i AS INT), 1)) AS BIGINT) - 1), (a, b) -> a * 16 + b)"
    )
    return f"({parse}) % {num_buckets}"


def dsir_oracle_sql(
    table: str,
    target_sources: tuple[str, ...],
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    num_buckets: int = 4096,
    salt: str = "dsir",
) -> str:
    """DuckDB mirror of ``dsir_select`` — same md5 bucketing, same smoothing,
    same 1e6 ``round`` quantization of the log-ratio, same (score DESC, id)
    rank."""
    src_list = ", ".join(f"'{s}'" for s in sorted(target_sources))
    B = num_buckets
    return f"""
        WITH toks AS (
            SELECT {id_col}, {source_col},
                   string_split(coalesce({text_col}, ''), ' ') AS tk
            FROM {table}
        ), grams AS (
            SELECT {id_col}, {source_col},
                   unnest(
                       tk || CASE WHEN len(tk) >= 2
                           THEN list_transform(
                               generate_series(1, len(tk) - 1),
                               i -> tk[i] || ' ' || tk[i + 1])
                           ELSE [] END
                   ) AS g
            FROM toks
        ), bg AS (
            SELECT {id_col},
                   {source_col} IN ({src_list}) AS is_t,
                   {_bucket_sql('g', salt, B)} AS bucket
            FROM grams
        ), tot AS (
            SELECT count(*) FILTER (is_t) AS t_total, count(*) AS r_total
            FROM bg
        ), bc AS (
            SELECT bucket,
                   count(*) FILTER (is_t) AS t_cnt,
                   count(*) AS r_cnt
            FROM bg GROUP BY 1
        ), lam AS (
            SELECT bucket,
                   CAST(round({_SCALE} * (
                       ln((t_cnt + 1.0) / (t_total + {B}))
                       - ln((r_cnt + 1.0) / (r_total + {B}))
                   )) AS BIGINT) AS lam
            FROM bc, tot
        ), scored AS (
            SELECT bg.{id_col}, CAST(sum(lam.lam) AS BIGINT) AS dsir_score
            FROM bg JOIN lam USING (bucket)
            GROUP BY 1
        )
        SELECT CAST(row_number() OVER (
                   ORDER BY dsir_score DESC, {id_col} ASC) AS BIGINT) AS rank,
               {id_col}, dsir_score
        FROM scored
        QUALIFY rank <= {k}
        ORDER BY rank
    """


# -- hashed naive-Bayes domain classifier -------------------------------------


def nb_classify(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "source",
    num_buckets: int = 4096,
    salt: str = "dsir",
):
    """Multinomial naive-Bayes domain/quality classifier over the same hashed
    unigram+bigram features as DSIR — the fastText-style linear filter a
    curation pipeline trains on weak domain labels and applies corpus-wide
    (Joulin et al. 2016 shape, closed-form counts instead of SGD so training
    is one exact aggregation).

    Train: per-class bucket counts (one map-only partial pass, O(buckets ×
    classes) driver combine). Quantize per-class log-likelihoods and priors
    to int64 at 1e6 scale (the dsir determinism contract). Predict: broadcast
    the λ matrix, one map-only pass scores every document against every
    class — score(c) = prior_c + Σ_b c_{d,b}·λ_{b,c}, all-integer — and the
    argmax (ties → lexicographically smallest class) is bit-identical at any
    cluster size and vs the SQL oracle. Returns (id, predicted, nb_score).
    """
    import ray

    def count_partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.select([text_col, label_col]).to_pandas()
        grams = _grams(df[text_col])
        n = np.fromiter((len(g) for g in grams), np.int64, len(grams))
        flat = pd.Series([g for gs in grams for g in gs], dtype=object)
        bucket = _bucket_lut(flat, salt, num_buckets).to_numpy(np.int64)
        out = pd.DataFrame(
            {
                "bucket": bucket,
                "label": np.repeat(df[label_col].to_numpy(dtype=object), n),
                "n": 1,
            }
        ).groupby(["label", "bucket"], as_index=False).sum()
        docs = df.groupby(label_col, as_index=False).size()
        docs = pd.DataFrame(
            {"bucket": -1, "label": docs[label_col], "n": docs["size"]}
        )
        return pd.concat([out, docs], ignore_index=True)

    from ..blocks import sum_kernel, tree_reduce

    # task-tree merge: driver sees O(classes x buckets) rows, independent of
    # batch count
    counts = tree_reduce(
        ds.map_batches(count_partial, batch_format="pyarrow"),
        sum_kernel(["label", "bucket"], ["n"]),
    ).to_pandas()
    classes = sorted(counts["label"].unique())
    cix = {c: i for i, c in enumerate(classes)}
    C = len(classes)
    tok = np.zeros((C, num_buckets), np.int64)
    ndocs = np.zeros(C, np.int64)
    for r in counts.itertuples(index=False):
        if r.bucket < 0:
            ndocs[cix[r.label]] = r.n
        else:
            tok[cix[r.label], r.bucket] = r.n
    tot = tok.sum(axis=1)
    lam = _round_half_away(
        _SCALE * np.log((tok + 1.0) / (tot + num_buckets)[:, None])
    ).astype(np.int64)
    prior = _round_half_away(
        _SCALE * np.log((ndocs + 1.0) / (ndocs.sum() + C))
    ).astype(np.int64)
    ref = ray.put((classes, lam, prior))

    def predict(batch: pa.Table) -> pd.DataFrame:
        classes_, lam_, prior_ = ray.get(ref)
        df = batch.select([id_col, text_col]).to_pandas()
        grams = _grams(df[text_col])
        n = np.fromiter((len(g) for g in grams), np.int64, len(grams))
        flat = pd.Series([g for gs in grams for g in gs], dtype=object)
        bucket = _bucket_lut(flat, salt, num_buckets).to_numpy(np.int64)
        doc_ix = np.repeat(np.arange(len(df)), n)
        scores = np.tile(prior_, (len(df), 1))  # (D, C)
        # lam_.T[bucket] is (grams, C); accumulate each gram row into its doc
        np.add.at(scores, doc_ix, lam_.T[bucket])
        best = scores.argmax(axis=1)  # first max = smallest class index = lex tiebreak
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "predicted": np.array(classes_, dtype=object)[best],
                "nb_score": scores[np.arange(len(df)), best],
            }
        )

    return ds.map_batches(predict, batch_format="pyarrow")


def nb_oracle_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "source",
    num_buckets: int = 4096,
    salt: str = "dsir",
) -> str:
    """DuckDB mirror of ``nb_classify`` — same buckets, same add-one
    smoothing, same 1e6 quantization, argmax with lexicographic tiebreak."""
    B = num_buckets
    return f"""
        WITH toks AS (
            SELECT {id_col}, {label_col},
                   string_split(coalesce({text_col}, ''), ' ') AS tk
            FROM {table}
        ), grams AS (
            SELECT {id_col}, {label_col},
                   unnest(
                       tk || CASE WHEN len(tk) >= 2
                           THEN list_transform(
                               generate_series(1, len(tk) - 1),
                               i -> tk[i] || ' ' || tk[i + 1])
                           ELSE [] END
                   ) AS g
            FROM toks
        ), bg AS (
            SELECT {id_col}, {label_col},
                   {_bucket_sql('g', salt, B)} AS bucket
            FROM grams
        ), classes AS (
            SELECT {label_col} AS label, count(DISTINCT {id_col}) AS ndocs
            FROM {table} GROUP BY 1
        ), class_tot AS (
            SELECT {label_col} AS label, count(*) AS tot FROM bg GROUP BY 1
        ), cell AS (
            SELECT {label_col} AS label, bucket, count(*) AS n
            FROM bg GROUP BY 1, 2
        ), lam AS (
            SELECT ct.label, b.bucket,
                   CAST(round({_SCALE} * ln(
                       (coalesce(cell.n, 0) + 1.0) / (ct.tot + {B})
                   )) AS BIGINT) AS lam
            FROM (SELECT DISTINCT bucket FROM bg) b
            CROSS JOIN class_tot ct
            LEFT JOIN cell ON cell.label = ct.label AND cell.bucket = b.bucket
        ), prior AS (
            SELECT label,
                   CAST(round({_SCALE} * ln(
                       (ndocs + 1.0)
                       / ((SELECT sum(ndocs) FROM classes)
                          + (SELECT count(*) FROM classes))
                   )) AS BIGINT) AS prior
            FROM classes
        ), doc_class AS (
            SELECT bg.{id_col}, lam.label,
                   CAST(sum(lam.lam) AS BIGINT) + any_value(p.prior) AS score
            FROM bg
            JOIN lam ON lam.bucket = bg.bucket
            JOIN prior p ON p.label = lam.label
            GROUP BY 1, 2
        )
        SELECT {id_col}, label AS predicted, CAST(score AS BIGINT) AS nb_score
        FROM doc_class
        QUALIFY row_number() OVER (
            PARTITION BY {id_col} ORDER BY score DESC, label ASC
        ) = 1
    """
