"""Analysis kernels on non-ASCII rows: the codepoint-domain vectorized
path must be bit-identical to the per-row reference implementations
(the regexes / str methods themselves)."""
import hashlib
import re

import numpy as np
import pyarrow as pa
import pytest

from simplefeatures_ray.functions import _bytetext as bt
from simplefeatures_ray.functions.text import (
    AnalyzeText, Fingerprint, LangId, QualityScore, SharedMasks, TokenCount,
    _LANG_PROFILES,
)


def _sh(rows):
    return SharedMasks(bt.BatchText(pa.array(rows, pa.string())))


POOL = (
    list("abc AB'tz.19 _") +
    ["don't", "l'équipe", "น้ำ", "中文字", "café", "Привет", "и", "é",
     "ʼn", "１２３", "٣٤", "𝕒𝕓", "😀", "—", "«", " ", " ", "　",
     " ", "ﬁn", "Straße", "ÉÉÉÉ", "K", "Ɐɐ", "le", "la", "est", "und",
     "der", "que", "para", "é ", "'", "''", "x'abC'd", "a'b'c"]
)

SPECIAL = ["İstanbul", "ΣΙΓΜΑ τελικός", "ΟΔΥΣΣΕΥΣ"]


def _rand_rows(rng, n_special=0):
    rows = ["".join(POOL[i] for i in rng.randint(0, len(POOL),
                                                 rng.randint(0, 40)))
            for _ in range(rng.randint(1, 10))]
    for _ in range(n_special):
        rows[rng.randint(len(rows))] += " " + SPECIAL[rng.randint(len(SPECIAL))]
    return rows


def test_tokencount_unicode_fuzz():
    tc = TokenCount()
    rng = np.random.RandomState(101)
    for _ in range(120):
        rows = _rand_rows(rng, n_special=1)
        out = tc.columns(_sh(rows))
        for i, t in enumerate(rows):
            assert out["n_tokens"][i].as_py() == len(tc.re.findall(t)), repr(t)
            assert out["n_ws_tokens"][i].as_py() == len(t.split()), repr(t)


def test_quality_unicode_fuzz():
    q = QualityScore()
    rng = np.random.RandomState(103)
    for _ in range(120):
        rows = _rand_rows(rng, n_special=1)
        out = q.columns(_sh(rows))
        for i, t in enumerate(rows):
            nc, pr, sr, mw = q._row_reference(t)
            assert out["n_chars_q"][i].as_py() == nc, repr(t)
            assert out["punct_ratio"][i].as_py() == pytest.approx(pr, abs=0), repr(t)
            assert out["stop_ratio"][i].as_py() == pytest.approx(sr, abs=0), repr(t)
            assert out["mean_word_len"][i].as_py() == pytest.approx(mw, abs=0), repr(t)


def test_langid_unicode_fuzz():
    lid = LangId()
    rng = np.random.RandomState(107)
    for _ in range(120):
        rows = _rand_rows(rng, n_special=1)
        out = lid.columns(_sh(rows))
        for i, t in enumerate(rows):
            assert out["lang_pred"][i].as_py() == lid.classify(t), repr(t)


def test_langid_accented_stopword():
    """'é' is a pt stopword — the old byte path dropped it; the cp path
    must match it, including from the cased variant 'É'."""
    lid = LangId()
    rows = ["é um uma café", "É UM UMA CAFÉ", "thé est le motif"]
    out = lid.columns(_sh(rows))
    for i, t in enumerate(rows):
        assert out["lang_pred"][i].as_py() == lid.classify(t)
    assert out["lang_pred"][0].as_py() == "pt"


def test_fingerprint_unicode_fuzz():
    fp = Fingerprint()
    rng = np.random.RandomState(109)
    for _ in range(80):
        rows = _rand_rows(rng, n_special=1)
        out = fp.columns(_sh(rows))
        for i, t in enumerate(rows):
            data = " ".join(t.lower().split()).encode()
            ref_full = int.from_bytes(
                hashlib.blake2b(data, digest_size=8).digest(), "little")
            assert out["fingerprint"][i].as_py() == ref_full, repr(t)
            assert out["kgram_min"][i].as_py() == fp.rolling_min(data), repr(t)


def test_no_per_row_fallback_for_plain_unicode(monkeypatch):
    """classify()/rolling_min() per-row paths fire ONLY for rows with
    U+0130/U+03A3 — ordinary multilingual text stays vectorized."""
    lid = LangId()
    calls = []
    orig = lid.classify
    monkeypatch.setattr(lid, "classify",
                        lambda t: (calls.append(t), orig(t))[1])
    rows = ["café très bon", "中文内容", "plain ascii", "İzmir here"]
    lid.columns(_sh(rows))
    assert calls == ["İzmir here"]


def test_analyze_fused_matches_singles():
    """AnalyzeText (shared masks + shared CPText) == running each kernel
    separately, on a mixed ASCII / non-ASCII / special batch."""
    rows = ["don't stop", "l'équipe a gagné", "İstanbul ΣΙΓΜΑ",
            "中文 test 123", "", "the and of to a in"]
    tbl = pa.table({"text": pa.array(rows, pa.string())})
    fused = AnalyzeText()(tbl)
    singles = tbl
    for k in (TokenCount(), QualityScore(), LangId(), Fingerprint()):
        singles = k(singles)
    for col in ("n_tokens", "n_ws_tokens", "quality", "lang_pred",
                "fingerprint", "kgram_min"):
        assert fused[col].to_pylist() == singles[col].to_pylist(), col
