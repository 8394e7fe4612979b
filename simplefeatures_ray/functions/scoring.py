"""Model scoring as a streaming batch transform.

The lightest rung of the model-inference ladder in a training-data
pipeline: a fixed-weight linear / logistic scorer over numeric feature
columns (fastText-style quality classifiers, importance-resampling
weights, contamination priors all take this shape once featurized).
Pure map_batches — no state, no shuffle; heavier models follow the same
contract but live in an actor pool (see stages/multimodal.py for the
actor-pool pattern with per-actor setup in __init__).

Determinism contract: z is accumulated in float64 in a fixed column
order, probabilities use 1/(1+exp(-z)), and the driver oracle recomputes
the identical expression in SQL — so scores match the DuckDB twin
bit-for-bit (modulo the shared ROUND at the gate boundary).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def logistic_score(ds, weights: dict[str, float], bias: float = 0.0,
                   out_col: str = "score", keep_col: str | None = "keep",
                   threshold: float = 0.5, log1p_cols: tuple[str, ...] = ()):
    """Add sigmoid(bias + sum_i w_i * x_i) per row.

    weights: feature column -> coefficient, applied in dict order.
    log1p_cols: columns fed as log(1 + x) (long-tailed counts). Uses
    np.log(x + 1.0) — NOT log1p — so SQL ln(1 + x) reproduces the same
    double rounding.
    keep_col: optional boolean column `score >= threshold`.
    """

    def kernel(t: pa.Table) -> pa.Table:
        z = np.full(len(t), float(bias), dtype=np.float64)
        for col, w in weights.items():
            x = np.asarray(t[col], dtype=np.float64)
            if col in log1p_cols:
                x = np.log(x + 1.0)
            z += float(w) * x
        p = 1.0 / (1.0 + np.exp(-z))
        t = t.append_column(out_col, pa.array(p, pa.float64()))
        if keep_col:
            t = t.append_column(keep_col, pa.array(p >= threshold, pa.bool_()))
        return t

    return ds.map_batches(kernel, batch_format="pyarrow")


# Fixed demo weights for the gated docs classifier: reward stopword
# density and length, punish punctuation soup (Gopher/C4-style signals).
QUALITY_WEIGHTS = {
    "n_chars": 0.55,       # via log(1+x)
    "punct_ratio": -40.0,
    "stop_ratio": 18.0,
}
QUALITY_BIAS = -3.2


# --------------------------------------------------------------------------- #
# bigram language-model perplexity (CCNet-style corpus filter)
# --------------------------------------------------------------------------- #


def _bigram_tables(batch: pa.Table, id_col: str, text_col: str):
    """Per-batch (doc, prev, cur) bigram rows + (doc, term) unigram rows
    with the corpus-standard tokenization (text._word_table: RE2 word
    runs, lowercased) — order-preserving so bigrams are consecutive."""
    import pyarrow.compute as pc

    words = pc.split_pattern_regex(batch[text_col], pattern=r"[^\w']+")
    flat = pc.utf8_lower(pc.list_flatten(words))
    parents = np.asarray(pc.list_parent_indices(words))
    terms = np.asarray(flat, dtype=object)
    keep = terms != ""
    terms, parents = terms[keep], parents[keep]
    ids = np.asarray(batch[id_col])[parents]
    same = parents[:-1] == parents[1:] if len(parents) else np.array([], bool)
    return (
        {"doc": ids[:-1][same] if len(ids) else ids,
         "prev": terms[:-1][same] if len(terms) else terms,
         "cur": terms[1:][same] if len(terms) else terms},
        {"doc": ids, "term": terms},
    )


def bigram_lm_perplexity(ds, id_col: str = "doc_id", text_col: str = "text",
                         alpha: float = 0.5, round_to: int = 4,
                         min_count: int = 1):
    """Per-document perplexity under an add-alpha-smoothed bigram LM
    trained on the corpus itself (the CCNet / Wenzek et al. 2020 quality
    signal: high-perplexity documents are boilerplate/noise candidates).

    Two passes, both streaming:
      1. LM stats — per-batch PARTIAL unigram/bigram counts (combiner),
         summed through one coarse grouped shuffle each; shuffle volume
         is bounded by distinct vocabulary/bigram types per block, never
         token count.
      2. Scoring — the count tables are broadcast (ray.put once) and each
         batch scores its documents with two vectorized merges. At
         100 TB, prune the broadcast with min_count > 1 (rare types fall
         back to count 0, the same smoothed formula applies) — the
         estimate stays well-defined because alpha > 0.

    p(w|v) = (c(v,w) + alpha) / (c(v) + alpha * V), V = |vocab|;
    ppl(doc) = exp(-mean ln p over its bigrams), ROUNDed (default 4 dp —
    the only order-dependent float step is the per-doc log sum, absorbed
    by the shared rounding). Documents with < 2 tokens are dropped (no
    bigrams), mirroring the SQL twin's natural GROUP BY semantics.

    Returns a Dataset (id_col, ppl, n_bigrams).
    """
    import pandas as pd

    import ray

    from .agg import grouped_agg
    from ._pdarrow import arrow_groups
    from .relational import collect_table

    # ONE pass + ONE shuffle for both count tables: each batch tokenizes
    # once and emits its bigram partials (kind=0) unioned with its
    # unigram partials (kind=1, cur='' — tokenization drops empty terms,
    # so '' can never collide with a real token)
    def counts_partial(t: pa.Table) -> pa.Table:
        bi, uni = _bigram_tables(t, id_col, text_col)
        db = pd.DataFrame({"prev": bi["prev"], "cur": bi["cur"]})
        gb = db.groupby(["prev", "cur"], sort=False).size().rename("n").reset_index()
        gb.insert(0, "kind", np.int64(0))
        du = pd.DataFrame({"prev": uni["term"]})
        gu = du.groupby("prev", sort=False).size().rename("n").reset_index()
        gu.insert(1, "cur", "")
        gu.insert(0, "kind", np.int64(1))
        out = pd.concat([gb, gu], ignore_index=True)
        return pa.Table.from_pandas(out, preserve_index=False)

    counts = collect_table(grouped_agg(
        ds.map_batches(counts_partial, batch_format="pyarrow"),
        ["kind", "prev", "cur"], {"n": ("n", "sum")},
        combine="shuffle")).to_pandas()
    bi_counts = (counts[counts["kind"] == 0][["prev", "cur", "n"]]
                 .reset_index(drop=True))
    uni_counts = (counts[counts["kind"] == 1][["prev", "n"]]
                  .rename(columns={"prev": "term"}).reset_index(drop=True))

    vocab_size = int(len(uni_counts))
    if min_count > 1:
        bi_counts = bi_counts[bi_counts["n"] >= min_count]
        uni_counts = uni_counts[uni_counts["n"] >= min_count]

    bi_ref = ray.put(bi_counts)
    uni_ref = ray.put(uni_counts)
    a = float(alpha)
    aV = a * float(vocab_size)

    def score(t: pa.Table) -> pa.Table:
        bi_c = ray.get(bi_ref)
        uni_c = ray.get(uni_ref)
        bi, _ = _bigram_tables(t, id_col, text_col)
        df = pd.DataFrame(bi)
        if not len(df):
            return pa.table({id_col: pa.array([], pa.int64()),
                             "ppl": pa.array([], pa.float64()),
                             "n_bigrams": pa.array([], pa.int64())})
        df = df.merge(bi_c, on=["prev", "cur"], how="left")
        df = df.merge(uni_c.rename(columns={"term": "prev", "n": "cn"}),
                      on="prev", how="left")
        cb = df["n"].fillna(0).to_numpy(dtype=np.float64)
        cu = df["cn"].fillna(0).to_numpy(dtype=np.float64)
        lp = np.log((cb + a) / (cu + aV))
        g = pd.DataFrame({"doc": df["doc"], "lp": lp}).groupby("doc", sort=True)
        s = g["lp"].sum()
        nb = g.size()
        ppl = np.round(np.exp(-s.to_numpy() / nb.to_numpy(dtype=np.float64)),
                       round_to) + 0.0
        return pa.table({id_col: pa.array(s.index.to_numpy(), pa.int64()),
                         "ppl": pa.array(ppl, pa.float64()),
                         "n_bigrams": pa.array(nb.to_numpy(), pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow")


def bigram_lm_sql(table: str = "documents", id_col: str = "doc_id",
                  text_col: str = "text", alpha: float = 0.5,
                  round_to: int = 4) -> str:
    """DuckDB twin of bigram_lm_perplexity (min_count=1): identical
    tokenization, identical smoothed probability, shared final ROUND."""
    return rf"""
        WITH w AS (
          SELECT {id_col} AS doc,
                 list_transform(regexp_extract_all({text_col}, '[\w'']+'),
                                x -> lower(x)) AS ws
          FROM {table}),
        uni AS (
          SELECT unnest(ws) AS term, doc FROM w),
        cu AS (SELECT term, COUNT(*)::BIGINT AS n FROM uni GROUP BY term),
        v AS (SELECT COUNT(*)::DOUBLE AS v FROM cu),
        bi AS (
          SELECT doc, unnest(list_transform(range(1, len(ws)),
                             i -> struct_pack(p := ws[i], c := ws[i + 1]))) AS pc
          FROM w),
        dbi AS (SELECT doc, pc.p AS prev, pc.c AS cur FROM bi),
        cb AS (SELECT prev, cur, COUNT(*)::BIGINT AS n
               FROM dbi GROUP BY prev, cur),
        scored AS (
          SELECT d.doc,
                 SUM(ln((cb.n + {alpha!r}) / (cu.n + {alpha!r} * v.v))) AS lp,
                 COUNT(*)::BIGINT AS nb
          FROM dbi d
          JOIN cb ON cb.prev = d.prev AND cb.cur = d.cur
          JOIN cu ON cu.term = d.prev, v
          GROUP BY d.doc)
        SELECT doc AS {id_col},
               ROUND(exp(-lp / nb), {round_to}) + 0.0 AS ppl,
               nb AS n_bigrams
        FROM scored
    """
