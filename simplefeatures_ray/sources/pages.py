"""Deterministic synthetic Common-Crawl-style pages table.

Schema matches BASELINE.json input_hint exactly:
  (url: string, warc_ts: timestamp[us], html: binary, text: string, lang: string)

Every column is a pure function of the page index via splitmix64, so the
table is identical at any parallelism and any partitioning — generation
happens distributed via ray.data.range(n).map_batches(gen), never on the
driver. `text` holds the reference extraction of `html` (the byte-identical
per-url invariant the engine's extractor must reproduce).

Geotag distribution is deliberately skewed: ~30% of geotagged pages land
in a handful of "urban" hot cells (BASELINE north_rule: salting / skew
handling must be exercised).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

# (name, lon, lat) hot cities — dense cells for skew testing
CITIES = [
    ("tokyo", 139.6917, 35.6895),
    ("delhi", 77.1025, 28.7041),
    ("shanghai", 121.4737, 31.2304),
    ("saopaulo", -46.6333, -23.5505),
    ("mexicocity", -99.1332, 19.4326),
    ("cairo", 31.2357, 30.0444),
    ("nyc", -74.0060, 40.7128),
    ("paris", 2.3522, 48.8566),
]

LANGS = ["en", "de", "ja", "fr", "es", "pt", "zh", "ar"]

_EPOCH_2023 = 1672531200_000_000  # 2023-01-01 in microseconds

_WORDS = (
    "the quick brown fox jumps over a lazy dog while researchers map urban "
    "growth using open data tiles and satellite imagery across many regions "
    "local news reports describe travel guides covering museums parks rivers "
    "mountains markets transit housing climate history food culture sports"
).split()

# multilingual pool for the intl corpus variant (>= 50% non-ASCII pages:
# the real-Common-Crawl shape the vectorized Unicode path exists for).
# Deliberately includes accents, CJK, Cyrillic, Arabic, Thai, emoji,
# apostrophes and a couple of Unicode whitespace separators.
_INTL_WORDS = (
    "café naïve résumé l'équipe déjà voilà señor año niño "
    "straße größe müller über schön zürich "
    "東京 日本語 中文 北京 漢字 文字 "
    "москва привет россия язык "
    "القاهرة العربية نص "
    "กรุงเทพ ภาษาไทย น้ำ "
    "don't it's l'amour d'état qu'est-ce "
    "😀 🗼 ☕ – — « » π Ω"
).split() + ["a b", "x　y", "fin de"]


def _splitmix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def _hash_stream(idx: np.ndarray, stream: int) -> np.ndarray:
    offset = np.uint64((stream * 0xA5A5A5A5A5A5A5A5) % (1 << 64))
    with np.errstate(over="ignore"):
        return _splitmix64(idx.astype(np.uint64) + offset)


def _uniform(idx: np.ndarray, stream: int) -> np.ndarray:
    """Deterministic U[0,1) per index."""
    return (_hash_stream(idx, stream) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def page_coords(idx: np.ndarray):
    """(has_geo, lon, lat) for each page index — the ground-truth geotags.

    70% of pages carry a geotag; of those, 30% cluster tightly around
    CITIES (skew), the rest are uniform over inhabited latitudes.
    """
    has_geo = _uniform(idx, 1) < 0.7
    urban = _uniform(idx, 2) < 0.3
    city_pick = (_hash_stream(idx, 3) % np.uint64(len(CITIES))).astype(np.int64)
    city_lon = np.array([c[1] for c in CITIES])[city_pick]
    city_lat = np.array([c[2] for c in CITIES])[city_pick]
    # tight jitter ~0.05 deg inside cities
    jlon = (_uniform(idx, 4) - 0.5) * 0.1
    jlat = (_uniform(idx, 5) - 0.5) * 0.1
    ulon = _uniform(idx, 6) * 360.0 - 180.0
    ulat = _uniform(idx, 7) * 140.0 - 70.0
    lon = np.where(urban, city_lon + jlon, ulon)
    lat = np.where(urban, city_lat + jlat, ulat)
    # round to fixed precision so WKT/text embedding is byte-stable
    lon = np.round(lon, 4)
    lat = np.round(lat, 4)
    return has_geo, lon, lat


def extract_text(html: bytes) -> str:
    """Reference text extraction: strip tags, collapse whitespace.

    MUST stay a pure function of the html bytes (per-row invariant from
    BASELINE.json). The engine re-runs this in its extract stage; the
    generator stores the same value in the `text` column.
    """
    import re

    s = html.decode("utf-8", errors="replace")
    s = re.sub(r"<!--.*?-->", " ", s, flags=re.S)
    s = re.sub(r"<[^>]*>", " ", s)
    return " ".join(s.split())


def gen_pages_batch(batch, n_words: int = 270, intl: bool = False) -> pa.Table:
    """map_batches kernel: {'id': int64 array} -> pages Arrow table.

    Pages average ~1-2 KB of html (30..300 words) — sized so per-page
    extraction work is representative of real web corpora rather than
    degenerate few-byte documents. intl=True draws ~60% of pages from a
    multilingual word pool (accents, CJK, Cyrillic, Arabic, emoji,
    apostrophes, Unicode whitespace) — the >=50%-non-ASCII shape of real
    Common Crawl; still a pure function of the page index."""
    idx = np.asarray(batch["id"], dtype=np.uint64)
    has_geo, lon, lat = page_coords(idx)
    lang_pick = (_hash_stream(idx, 8) % np.uint64(len(LANGS))).astype(np.int64)
    nwords = 30 + (_hash_stream(idx, 9) % np.uint64(n_words)).astype(np.int64)
    word_seed = _hash_stream(idx, 10)
    ts = (_EPOCH_2023 + (_hash_stream(idx, 11) % np.uint64(365 * 86400)) * np.uint64(1_000_000)).astype(
        "int64"
    )
    extra_tag = _uniform(idx, 12) < 0.2  # some pages carry a second ICBM tag

    urls, htmls, texts, langs = [], [], [], []
    nw = len(_WORDS)
    nwi = len(_INTL_WORDS)
    intl_page = _uniform(idx, 13) < 0.6 if intl else np.zeros(len(idx), bool)
    for k in range(len(idx)):
        i = int(idx[k])
        url = f"https://site-{i % 9973}.example.com/page/{i}"
        seed = int(word_seed[k])
        if intl_page[k]:
            words = [_INTL_WORDS[(seed + j * 2654435761) % nwi]
                     for j in range(int(nwords[k]))]
        else:
            words = [_WORDS[(seed + j * 2654435761) % nw] for j in range(int(nwords[k]))]
        body = " ".join(words)
        meta = ""
        if has_geo[k]:
            meta = (
                f'<meta name="geo.position" content="{lat[k]};{lon[k]}">'
            )
            if extra_tag[k]:
                meta += f"<!-- ICBM: {lat[k]}, {lon[k]} -->"
        html = (
            f"<html><head><title>Page {i}</title>{meta}</head>"
            f"<body><h1>Page {i}</h1><p>{body}</p></body></html>"
        ).encode()
        urls.append(url)
        htmls.append(html)
        texts.append(extract_text(html))
        langs.append(LANGS[int(lang_pick[k])])
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def pages_dataset(n: int, *, override_num_blocks: int | None = None,
                  intl: bool = False):
    """Distributed deterministic pages table as a ray.data.Dataset."""
    import ray.data as rd

    ds = rd.range(n, override_num_blocks=override_num_blocks)
    return ds.map_batches(gen_pages_batch, fn_kwargs={"intl": intl},
                          batch_format="numpy", batch_size=4096)


def write_pages_parquet(n: int, path: str, *,
                        override_num_blocks: int | None = None,
                        intl: bool = False):
    pages_dataset(n, override_num_blocks=override_num_blocks,
                  intl=intl).write_parquet(path)
    return path


def pages_parquet_cached(n: int, cache_root: str = "/tmp/sfr_pages",
                         intl: bool = False) -> str:
    """Generate-once parquet cache for the synthetic pages table.

    The engine's real input is a Parquet pages table (BASELINE input_hint);
    benchmarks should measure read_parquet -> pipeline, not the synthetic
    generator. Deterministic per n, so the cache is safe to reuse.
    """
    import os

    path = f"{cache_root}_{n}" + ("_intl" if intl else "")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        write_pages_parquet(n, path, intl=intl)
        with open(marker, "w") as f:
            f.write("ok")
    return path


def read_pages(n: int, intl: bool = False, **read_kwargs):
    """Dataset over the cached parquet pages table (the bench input)."""
    import ray.data as rd

    return rd.read_parquet(pages_parquet_cached(n, intl=intl), **read_kwargs)
