"""Seeded adversarial-unicode fuzz: byte-class fast paths vs each
kernel's own per-row reference (the 'bit-identical semantics' contract
— the fast path plus the non-ASCII/apostrophe fallback must equal the
naive regex result on EVERY row, including empty/None batch tails)."""
import random
import re

import numpy as np
import pyarrow as pa
import pytest

from simplefeatures_ray.functions.text import (
    LangId, QualityScore, TokenCount, _TOKEN_RE)

PIECES = ["hello", "WORLD", "42", "!?;", "o'clock", "'", "''", "café",
          "北京", "🌍", " ", "\t", "\n", "a", "", "naïve", "x" * 300,
          "don't", "1e9", "%$#", "ß", "—", "…", "\r\n"]


@pytest.fixture(scope="module")
def batch():
    rng = random.Random(9)
    texts = ["".join(rng.choice(PIECES) for _ in range(rng.randint(0, 12)))
             for _ in range(300)]
    texts += ["", None, "x!", "", None]  # adversarial batch tails
    return pa.table({"text": pa.array(texts, pa.string())}), texts


def test_token_count_matches_regex(batch):
    tbl, texts = batch
    tok_re = re.compile(_TOKEN_RE)
    out = TokenCount()(tbl)
    for i, t in enumerate(texts):
        t = t or ""
        assert out["n_tokens"][i].as_py() == len(tok_re.findall(t)), repr(t)
        assert out["n_ws_tokens"][i].as_py() == len(t.split()), repr(t)


def test_langid_matches_reference(batch):
    tbl, texts = batch
    li = LangId()
    out = li(tbl)
    for i, t in enumerate(texts):
        assert out["lang_pred"][i].as_py() == li.classify(t or ""), repr(t)


def test_quality_matches_reference(batch):
    tbl, texts = batch
    qs = QualityScore()
    out = qs(tbl)
    for i, t in enumerate(texts):
        n_chars, pr, sr, mw = qs._row_reference(t or "")
        assert out["n_chars_q"][i].as_py() == n_chars, repr(t)
        assert out["punct_ratio"][i].as_py() == pytest.approx(pr, abs=1e-12)
        assert out["stop_ratio"][i].as_py() == pytest.approx(sr, abs=1e-12)


def test_line_dedup_reference_parity(ray_session):
    """line_dedup vs a driver-side reference (line df counts, removal,
    sha of reassembly) on a corpus engineered for heavy cross-doc
    duplication, across parallelism levels."""
    import collections
    import hashlib
    import re

    import ray.data as rd

    from simplefeatures_ray.functions.text import line_dedup

    rng = np.random.default_rng(6)
    vocab = [f"w{i}" for i in range(12)]
    texts = [" ".join(rng.choice(vocab, int(rng.integers(0, 40))))
             for _ in range(120)]
    t = pa.table({"doc_id": pa.array(range(120), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    lines_by_doc = {}
    for did, txt in zip(range(120), texts):
        ws = [w.lower() for w in re.findall(r"[\w']+", txt, re.ASCII)]
        lines_by_doc[did] = [" ".join(ws[i:i + 3])
                             for i in range(0, len(ws), 3)]
    df = collections.Counter()
    for ls in lines_by_doc.values():
        for l in set(ls):
            df[l] += 1
    for parts in (2, 9):
        out = (line_dedup(rd.from_arrow(t).repartition(parts))
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert len(out) == 120
        for _, row in out.iterrows():
            ls = lines_by_doc[row["doc_id"]]
            kept = [l for l in ls if df[l] < 2]
            sha = hashlib.sha256("\n".join(kept).encode()).hexdigest()[:16]
            assert row["n_lines"] == len(ls)
            assert row["n_kept"] == len(kept)
            assert row["n_dropped"] == len(ls) - len(kept)
            assert row["clean_sha"] == sha
