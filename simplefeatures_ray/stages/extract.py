"""Page extraction stage: html -> text + geotags.

Stateless-per-row but stateful-per-actor (compiled regexes), so it runs
as an actor pool: ds.map_batches(ExtractGeotags, concurrency=N,
batch_format="pyarrow"). Extraction is a pure function of the html bytes
(BASELINE.json per-row invariant: byte-identical text per url at any
parallelism) — it reuses the same normalization as the fixture generator.

Output drops the wide `html` column immediately (projection pushdown:
html dominates memory; SURVEY.md §7 'wide binary rows').
"""
from __future__ import annotations

import re

import numpy as np
import pyarrow as pa


class ExtractGeotags:
    """Actor-pool batch kernel. pyarrow in / pyarrow out.

    Emits one row per input page:
      url, warc_ts, lang, text, has_geo (bool), lat, lon (first geotag,
      NaN when absent), n_geotags — and, with analyze=True (the flagship
    default), the per-page text-analysis columns a training-data
    pipeline computes in the same pass over the decoded text:
    n_tokens, quality, lang_pred, fingerprint.
    """

    def __init__(self, analyze: bool = True, geo_only: bool = False):
        # compiled once per actor (reference pattern: PreparedGeometry-style
        # amortized setup, SURVEY.md §2.3)
        self.comment = re.compile(rb"<!--.*?-->", re.S)
        self.tag = re.compile(rb"<[^>]*>")
        self.geo_meta = re.compile(
            rb'<meta\s+name="geo\.position"\s+content="([-0-9.]+);([-0-9.]+)"'
        )
        self.icbm = re.compile(rb"ICBM:\s*([-0-9.]+),\s*([-0-9.]+)")
        self.analyze = analyze
        # geo_only: drop rows without geotags INSIDE the kernel, before
        # analysis — the analysis columns are per-row pure, so filtering
        # first yields identical values for surviving rows at a fraction
        # of the cost (and with no extra text copies between operators)
        self.geo_only = geo_only
        if analyze:
            from ..functions.text import AnalyzeText

            self.analyzer = AnalyzeText()

    def extract_one(self, html: bytes):
        tags = [(float(a), float(b)) for a, b in self.geo_meta.findall(html)]
        tags += [(float(a), float(b)) for a, b in self.icbm.findall(html)]
        text_bytes = self.tag.sub(b" ", self.comment.sub(b" ", html))
        text = " ".join(text_bytes.decode("utf-8", errors="replace").split())
        return text, tags

    def __call__(self, batch: pa.Table) -> pa.Table:
        htmls = batch["html"].to_pylist()
        texts = []
        lats = np.full(len(htmls), np.nan)
        lons = np.full(len(htmls), np.nan)
        n_tags = np.zeros(len(htmls), dtype=np.int32)
        for i, h in enumerate(htmls):
            text, tags = self.extract_one(h)
            texts.append(text)
            if tags:
                lats[i], lons[i] = tags[0]
                n_tags[i] = len(tags)
        keep = slice(None)
        if self.geo_only:
            keep = np.nonzero(n_tags > 0)[0]
            texts = [texts[i] for i in keep]
            lats = lats[keep]
            lons = lons[keep]
            n_tags = n_tags[keep]
        out = pa.table(
            {
                "url": batch["url"] if not self.geo_only else batch["url"].take(keep),
                "warc_ts": (batch["warc_ts"] if not self.geo_only
                            else batch["warc_ts"].take(keep)),
                "lang": batch["lang"] if not self.geo_only else batch["lang"].take(keep),
                "text": pa.array(texts, pa.string()),
                "has_geo": pa.array(n_tags > 0),
                "lat": pa.array(lats),
                "lon": pa.array(lons),
                "n_geotags": pa.array(n_tags),
            }
        )
        if self.analyze:
            out = self.analyzer(out)
        return out


def extract_geotags_batch(batch: pa.Table) -> pa.Table:
    """Task-function variant of ExtractGeotags: regex state built once per
    worker process (see stages/worker_cache.py)."""
    from .worker_cache import get_cached

    ex = get_cached("extract-geotags-singleton", build=lambda _: ExtractGeotags())
    return ex(batch)


def extract_geo_batch(batch: pa.Table) -> pa.Table:
    """Extraction that drops geotag-less rows in-kernel BEFORE analysis —
    the flagship path: only ~1/5 of pages carry geotags, and analysing
    the rest is pure waste. One task, no extra text copies between
    operators."""
    from .worker_cache import get_cached

    ex = get_cached("extract-geo-singleton",
                    build=lambda _: ExtractGeotags(analyze=True, geo_only=True))
    return ex(batch)
