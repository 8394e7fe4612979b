"""BPE tokenizer induction: distributed trainer vs independent
single-process reference, plus kernel unit behavior."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from simplefeatures_ray.functions.bpe import (
    _apply_merges, pair_counts, reference_bpe, train_bpe)


def test_apply_merges_greedy_left_to_right():
    # merge ('a','b') twice in 'ababa' -> ab ab a (left-to-right)
    assert _apply_merges("ababa", [("a", "b")]) == ["ab", "ab", "a"]
    # rank order: later merges see earlier results
    assert _apply_merges("abc", [("a", "b"), ("ab", "c")]) == ["abc"]
    # a merge that no longer matches after an earlier merge is a no-op
    assert _apply_merges("abc", [("a", "b"), ("b", "c")]) == ["ab", "c"]
    assert _apply_merges("x", [("a", "b")]) == ["x"]


def test_train_bpe_matches_reference_synthetic(ray_session):
    texts = [
        "the cat sat on the mat",
        "the THEME theorem is there",
        "low lower lowest newer newest",
        "ab ab ab abab",
        "",  # empty doc
        "o'clock isn't won't",  # apostrophe stays in-word
    ] * 3
    ds = rd.from_arrow(pa.table({"text": pa.array(texts, pa.string())}))
    got = train_bpe(ds, num_merges=6).to_pandas().to_dict("records")
    want = reference_bpe(texts, num_merges=6)
    assert got == want


def test_train_bpe_nonascii_tokenization_parity(ray_session):
    # Arrow RE2's \w is ASCII-only and lowercasing happens AFTER the
    # split; the reference must reproduce both (café -> 'caf' + 've')
    texts = ["café naïve CAFÉ straße Nation", "cafe cafe naive café"] * 4
    ds = rd.from_arrow(pa.table({"text": pa.array(texts, pa.string())}))
    got = train_bpe(ds, num_merges=4).to_pandas().to_dict("records")
    want = reference_bpe(texts, num_merges=4)
    assert got == want and len(got) == 4


def test_train_bpe_matches_reference_corpus(ray_session):
    tbl = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                        columns=["text"])
    ds = rd.from_arrow(tbl)
    got = train_bpe(ds, num_merges=5).to_pandas().to_dict("records")
    want = reference_bpe(tbl["text"].to_pylist(), num_merges=5)
    assert got == want
    assert len(got) == 5 and all(r["n"] >= 1 for r in got)


def test_train_bpe_parallelism_invariant(ray_session):
    tbl = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                        columns=["text"])
    a = train_bpe(rd.from_arrow(tbl).repartition(1), num_merges=3).to_pandas()
    b = train_bpe(rd.from_arrow(tbl).repartition(7), num_merges=3).to_pandas()
    assert a.equals(b)


def test_pair_counts_weighted_by_frequency(ray_session):
    # 'aa' x3 and 'ab' x1: pair (a,a) count 3, (a,b) count 1
    ds = rd.from_arrow(pa.table({"text": ["aa aa", "aa ab"]}))
    t = pair_counts(ds, "text", []).to_pandas().set_index(["left", "right"])
    assert int(t.loc[("a", "a"), "n"]) == 3
    assert int(t.loc[("a", "b"), "n"]) == 1


def test_bpe_encode_counts_match_reference(ray_session):
    """bpe_encode token counts == per-document reference application of
    the trained merge table."""
    import ray.data as rd

    from simplefeatures_ray.functions.bpe import (_apply_merges, bpe_encode,
                                                  train_bpe)

    texts = ["the cat sat on the mat", "the THE the cats",
             "concatenation of catastrophic categories",
             "", "unrelated words entirely",
             "don't can't won't", "mat mat mat cat cat the"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ds = rd.from_arrow(t).repartition(3)
    merges_tbl = train_bpe(ds, num_merges=6)
    order = np.argsort(np.asarray(merges_tbl["rank"]))
    merges = [(merges_tbl["left"][int(i)].as_py(),
               merges_tbl["right"][int(i)].as_py()) for i in order]
    out = bpe_encode(rd.from_arrow(t).repartition(3), merges_tbl).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    import re

    for i, text in enumerate(texts):
        words = [w.lower() for w in re.findall(r"[\w']+", text)]
        want = sum(len(_apply_merges(w, merges)) for w in words)
        assert int(out["n_bpe_tokens"][i]) == want, (i, text)
