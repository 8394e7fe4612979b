"""BPE tokenizer induction (Sennrich et al. 2016) as a Ray Data loop.

The missing rung between text analysis and model training in a
training-data pipeline: learn the byte-pair-encoding merge table from
the corpus itself. Distributed shape per iteration:

  map_batches    per-batch DISTINCT-word frequencies (pandas
                 value_counts bounds the Python symbolization loop to
                 the batch's vocabulary, not its token count), current
                 merge list applied in rank order, adjacent-symbol-pair
                 counts weighted by word frequency -> partial rows
  grouped_agg    combiner sum of the partials through one coarse
                 shuffle (volume = distinct pair types per block,
                 never token count)
  top-1/part     each co-partition emits its single best pair under
                 the total order (count DESC, left ASC, right ASC)
  driver         argmax over <= n_partitions candidate rows -> next
                 merge (the pair table itself never leaves the
                 cluster; VERDICT r4 #3)

The merge list is O(num_merges) and ships with the task closure; the
corpus is never collected. The corpus is read ONCE: train_bpe first
reduces it to the distinct (word, freq) table through one shuffle and
pins that — every merge iteration then re-symbolizes the VOCABULARY
(sublinear in corpus size; the standard word-frequency-dict BPE
formulation), not the corpus. The word table stays a distributed
Dataset end-to-end, so a web-scale vocabulary never lands on the
driver.

Tokenization matches the corpus standard elsewhere in the engine
(functions/scoring._bigram_tables): RE2 word runs `[\\w']+`,
lowercased, empties dropped.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _word_freqs(t: pa.Table, text_col: str) -> pd.Series:
    import pyarrow.compute as pc

    words = pc.split_pattern_regex(t[text_col], pattern=r"[^\w']+")
    flat = pc.utf8_lower(pc.list_flatten(words))
    s = pd.Series(np.asarray(flat, dtype=object))
    s = s[s != ""]
    return s.value_counts(sort=False)


def _apply_merges(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Symbolize one word: chars, then each learned merge in rank order,
    each applied left-to-right everywhere it occurs (greedy BPE)."""
    syms = list(word)
    for a, b in merges:
        if len(syms) < 2:
            break
        out = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _pair_counts_kernel(text_col: str, merges: list[tuple[str, str]]):
    merges = list(merges)

    def kernel(t: pa.Table) -> pa.Table:
        freqs = _word_freqs(t, text_col)
        counts: dict[tuple[str, str], int] = {}
        for word, n in freqs.items():
            syms = _apply_merges(word, merges)
            for i in range(len(syms) - 1):
                key = (syms[i], syms[i + 1])
                counts[key] = counts.get(key, 0) + int(n)
        if not counts:
            return pa.table({"left": pa.array([], pa.string()),
                             "right": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        items = list(counts.items())
        return pa.table({
            "left": pa.array([k[0] for k, _ in items], pa.string()),
            "right": pa.array([k[1] for k, _ in items], pa.string()),
            "n": pa.array([v for _, v in items], pa.int64()),
        })

    return kernel


def pair_counts(ds, text_col: str = "text",
                merges: list[tuple[str, str]] | None = None):
    """Corpus-wide adjacent-symbol-pair counts under the given merge
    list (empty list = initial character symbolization). Returns a
    small pyarrow Table (left, right, n) — bounded by pair types."""
    from .agg import grouped_agg
    from .relational import collect_table

    partial = ds.map_batches(_pair_counts_kernel(text_col, merges or []),
                             batch_format="pyarrow")
    return collect_table(grouped_agg(partial, ["left", "right"],
                                     {"n": ("n", "sum")}, combine="shuffle"))


def word_freq_dataset(ds, text_col: str = "text"):
    """One corpus pass -> distributed distinct (word, freq) table,
    pinned so the merge loop never re-reads the input. The vocabulary
    stays sharded in the object store (web-scale vocab is 10^8+ rows —
    never driver-collected)."""
    from .agg import grouped_agg

    def partial(t: pa.Table) -> pa.Table:
        f = _word_freqs(t, text_col)
        return pa.table({"word": pa.array(f.index, pa.string()),
                         "n": pa.array(f.to_numpy(np.int64))})

    p = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_agg(p, "word", {"freq": ("n", "sum")},
                       combine="shuffle").materialize()


def _local_top_pair(t: pa.Table) -> pa.Table:
    """Top-1 row of a pair-count block under the total order
    (n DESC, left ASC, right ASC)."""
    if not len(t):
        return t
    df = t.to_pandas().sort_values(
        ["n", "left", "right"], ascending=[False, True, True],
        kind="mergesort").head(1)
    return pa.Table.from_pandas(df, preserve_index=False)


def _vocab_top_pair(words_ds, merges: list[tuple[str, str]]):
    """Distributed argmax pair from the pinned (word, freq) table under
    `merges` (VERDICT r4 #3): per-block partial pair counts -> shuffle
    combine co-partitioned by pair (each pair's total lands in exactly
    one partition) -> per-partition top-1 under the total tie-break ->
    the driver collects only <= n_partitions candidate rows and takes
    their max. The vocabulary-scale pair table never reaches the
    driver."""
    from .agg import grouped_agg

    ms = list(merges)

    def kernel(t: pa.Table) -> pa.Table:
        counts: dict[tuple[str, str], int] = {}
        freqs = np.asarray(t["freq"], dtype=np.int64)
        for word, n in zip(t["word"].to_pylist(), freqs):
            syms = _apply_merges(word, ms)
            for i in range(len(syms) - 1):
                key = (syms[i], syms[i + 1])
                counts[key] = counts.get(key, 0) + int(n)
        items = list(counts.items())
        return pa.table({
            "left": pa.array([k[0] for k, _ in items], pa.string()),
            "right": pa.array([k[1] for k, _ in items], pa.string()),
            "n": pa.array([v for _, v in items], pa.int64()),
        })

    from .relational import collect_table

    partial = words_ds.map_batches(kernel, batch_format="pyarrow")
    agg = grouped_agg(partial, ["left", "right"], {"n": ("n", "sum")},
                      combine="shuffle")
    tops = collect_table(agg.map_batches(_local_top_pair,
                                         batch_format="pyarrow"))
    return _top_pair(tops)


def _top_pair(tbl: pa.Table) -> tuple[str, str, int] | None:
    df = tbl.to_pandas()
    if not len(df):
        return None
    df = df.sort_values(["n", "left", "right"],
                        ascending=[False, True, True], kind="mergesort")
    r = df.iloc[0]
    return str(r["left"]), str(r["right"]), int(r["n"])


def train_bpe(ds, num_merges: int = 8, text_col: str = "text") -> pa.Table:
    """Learn num_merges BPE merges. Returns (rank, left, right, n) with
    rank 0-based in learning order; n is the pair's corpus count at the
    time it was chosen. Deterministic at any parallelism: counts are
    exact integers and the tie-break is total."""
    words = word_freq_dataset(ds, text_col)
    merges: list[tuple[str, str]] = []
    rows = []
    for rank in range(num_merges):
        top = _vocab_top_pair(words, merges)
        if top is None or top[2] < 1:
            break
        left, right, n = top
        rows.append({"rank": rank, "left": left, "right": right, "n": n})
        merges.append((left, right))
    if not rows:
        return pa.table({"rank": pa.array([], pa.int64()),
                         "left": pa.array([], pa.string()),
                         "right": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    df = pd.DataFrame(rows)
    df["rank"] = df["rank"].astype("int64")
    df["n"] = df["n"].astype("int64")
    return pa.Table.from_pandas(df[["rank", "left", "right", "n"]],
                                preserve_index=False)


def reference_bpe(texts: list[str], num_merges: int = 8) -> list[dict]:
    """Single-process reference implementation (for tests): identical
    tokenization, symbolization, counting, and tie-break — written
    independently of the distributed path (dict-of-words fold)."""
    import re

    # tokenization parity with the distributed path (and the SQL twin):
    # Arrow/DuckDB RE2 \w is ASCII-only, and lowercasing happens AFTER
    # the split — re.ASCII + per-token lower() reproduces both
    freqs: dict[str, int] = {}
    for txt in texts:
        for w in re.split(r"[^\w']+", txt or "", flags=re.ASCII):
            if w:
                w = w.lower()
                freqs[w] = freqs.get(w, 0) + 1
    merges: list[tuple[str, str]] = []
    out = []
    for rank in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, n in freqs.items():
            syms = _apply_merges(w, merges)
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                counts[k] = counts.get(k, 0) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (a, b), n = best
        out.append({"rank": rank, "left": a, "right": b, "n": n})
        merges.append((a, b))
    return out


def bpe_encode(ds, merges, id_col: str = "doc_id", text_col: str = "text",
               out_col: str = "n_bpe_tokens"):
    """APPLY a learned merge table to the corpus — the tokenizer-
    application pass a training pipeline runs after train_bpe: per
    document, the BPE token count under `merges` (the number a data
    loader needs for packing/budgeting).

    Distributed shape: the merge list is tiny and ships with the task
    closure; each batch symbolizes only its DISTINCT words (the same
    vocabulary-bounded trick as the trainer), maps each distinct word
    to its post-merge token count, then scatters the counts back to
    documents with one vectorized groupby — no per-token Python, no
    shuffle at all (a pure map stage).

    merges: list of (left, right) pairs in rank order, or the pa.Table
    produced by train_bpe (columns left, right, rank).
    """
    import pyarrow.compute as pc

    if isinstance(merges, pa.Table):
        order = np.argsort(np.asarray(merges["rank"]))
        merges = [(merges["left"][int(i)].as_py(),
                   merges["right"][int(i)].as_py()) for i in order]
    merges = [tuple(m) for m in merges]

    def kernel(t: pa.Table) -> pa.Table:
        words = pc.split_pattern_regex(t[text_col], pattern=r"[^\w']+")
        flat = pc.utf8_lower(pc.list_flatten(words))
        parents = np.asarray(pc.list_parent_indices(words))
        terms = np.asarray(flat, dtype=object)
        keep = terms != ""
        terms, parents = terms[keep], parents[keep]
        uniq, inv = np.unique(terms, return_inverse=True)
        tok_per_word = np.fromiter(
            (len(_apply_merges(w, merges)) for w in uniq),
            dtype=np.int64, count=len(uniq))
        per_tok = tok_per_word[inv]
        counts = np.zeros(len(t), dtype=np.int64)
        np.add.at(counts, parents, per_tok)
        return pa.table({id_col: t[id_col],
                         out_col: pa.array(counts, pa.int64())})

    return ds.map_batches(kernel, batch_format="pyarrow")
