"""Text-analysis kernels for large-scale training-data pipelines.

All stages are map_batches kernels; the regex/stopword state is compiled
once per actor (callable classes). Tokenization is a BPE-ish regex plus
whitespace fallback; language ID is an n-gram/stopword heuristic (no
external models in this environment).
"""
from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

# tiny per-language stopword profiles for the heuristic language ID
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "for", "it"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "de", "que", "pour"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "de", "que", "por"},
    "pt": {"o", "a", "os", "e", "é", "um", "uma", "de", "que", "para"},
}

_TOKEN_RE = r"[A-Za-z]+(?:'[a-z]+)?|\d+|[^\sA-Za-z\d]"


class TokenCount:
    """Adds n_tokens (BPE-ish regex) and n_ws_tokens (whitespace split)."""

    def __init__(self, text_col: str = "text"):
        self.re = re.compile(_TOKEN_RE)
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        n_tok = np.fromiter(
            (len(self.re.findall(t or "")) for t in texts), dtype=np.int64, count=len(texts)
        )
        n_ws = np.fromiter(
            (len((t or "").split()) for t in texts), dtype=np.int64, count=len(texts)
        )
        return batch.append_column("n_tokens", pa.array(n_tok)).append_column(
            "n_ws_tokens", pa.array(n_ws)
        )


class LangId:
    """Heuristic language ID: argmax stopword-hit ratio over profiles;
    'und' (undetermined) when no profile scores."""

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred"):
        self.word = re.compile(r"[\w']+", re.U)
        self.text_col = text_col
        self.out_col = out_col
        self.profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}

    def classify(self, text: str) -> str:
        words = [w.lower() for w in self.word.findall(text or "")[:200]]
        if not words:
            return "und"
        best, best_score = "und", 0
        for lang, stop in self.profiles.items():
            score = sum(1 for w in words if w in stop)
            if score > best_score:
                best, best_score = lang, score
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self.classify(t) for t in batch[self.text_col].to_pylist()]
        return batch.append_column(self.out_col, pa.array(preds, pa.string()))


class QualityScore:
    """Heuristic quality features: length, punctuation ratio, stopword
    ratio, mean word length, and a composite [0,1] score."""

    def __init__(self, text_col: str = "text"):
        self.word = re.compile(r"[A-Za-z']+")
        self.punct = re.compile(r"[^\w\s]")
        self.stop = _LANG_PROFILES["en"]
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        n = len(texts)
        n_chars = np.zeros(n, dtype=np.int64)
        punct_ratio = np.zeros(n)
        stop_ratio = np.zeros(n)
        mean_wlen = np.zeros(n)
        for i, t in enumerate(texts):
            t = t or ""
            n_chars[i] = len(t)
            if not t:
                continue
            words = self.word.findall(t)
            puncts = self.punct.findall(t)
            punct_ratio[i] = len(puncts) / max(1, len(t))
            if words:
                stop_ratio[i] = sum(1 for w in words if w.lower() in self.stop) / len(words)
                mean_wlen[i] = sum(len(w) for w in words) / len(words)
        score = (
            np.clip(n_chars / 500.0, 0, 1) * 0.3
            + np.clip(stop_ratio * 4, 0, 1) * 0.4
            + np.clip(1.0 - punct_ratio * 5, 0, 1) * 0.3
        )
        out = batch
        for name, arr in [
            ("n_chars_q", n_chars),
            ("punct_ratio", punct_ratio),
            ("stop_ratio", stop_ratio),
            ("mean_word_len", mean_wlen),
            ("quality", score),
        ]:
            out = out.append_column(name, pa.array(arr))
        return out


class Fingerprint:
    """Document fingerprint: 64-bit FNV-1a of the normalized text, plus a
    winnowed rolling-hash (Karp-Rabin) min-sketch over character k-grams.
    Deterministic across runs/processes (no PYTHONHASHSEED dependence)."""

    def __init__(self, text_col: str = "text", k: int = 8):
        self.text_col = text_col
        self.k = k

    @staticmethod
    def fnv1a(data: bytes) -> int:
        # blake2b/8: process-stable and C-speed (a python FNV byte loop
        # dominated the per-page analysis cost)
        import hashlib

        return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "little")

    def rolling_min(self, data: bytes) -> int:
        k = self.k
        if len(data) < k:
            return self.fnv1a(data)
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
        base = np.uint64(257)
        # vectorized k-gram polynomial hashes via cumulative powers
        with np.errstate(over="ignore"):
            n = len(arr)
            h = np.zeros(n - k + 1, dtype=np.uint64)
            for j in range(k):  # k is small (8): k passes, each vectorized
                h = h * base + arr[j : n - k + 1 + j]
        return int(h.min())

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        full = np.zeros(len(texts), dtype=np.uint64)
        kmin = np.zeros(len(texts), dtype=np.uint64)
        for i, t in enumerate(texts):
            data = " ".join((t or "").lower().split()).encode()
            full[i] = self.fnv1a(data)
            kmin[i] = self.rolling_min(data)
        return batch.append_column("fingerprint", pa.array(full, pa.uint64())).append_column(
            "kgram_min", pa.array(kmin, pa.uint64())
        )
