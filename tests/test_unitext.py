"""_unitext: the vectorized Unicode engine is pinned against CPython's
own decoder / regex engine / str.lower — the reference semantics."""
import re

import numpy as np
import pyarrow as pa
import pytest

from simplefeatures_ray.functions import _bytetext as bt
from simplefeatures_ray.functions import _unitext as ut


def _bt(rows):
    return bt.BatchText(pa.array(rows, pa.binary()))


# ---------------------------------------------------------------------------
# class tables


@pytest.mark.parametrize("name,pat", [("word", r"\w"), ("digit", r"\d"),
                                      ("space", r"\s")])
def test_class_table_matches_re(name, pat):
    tab = ut.class_table(name)
    rx = re.compile(pat)
    rng = np.random.RandomState(7)
    cps = np.unique(np.concatenate([
        np.arange(0x300),                      # latin / combining
        rng.randint(0, 0x110000, 5000),        # global sample
        np.array([0x85, 0xA0, 0x1680, 0x2000, 0x200B, 0x2028, 0x3000,
                  0x0660, 0x06F0, 0xFF10,      # arabic / fullwidth digits
                  0x4E00, 0x1F600, 0x10FFFF, 0xD7FF, 0xE000]),
    ]))
    cps = cps[(cps < 0xD800) | (cps >= 0xE000)]
    for cp in cps.tolist():
        assert tab[cp] == (rx.fullmatch(chr(cp)) is not None), hex(cp)


def test_space_table_is_str_whitespace():
    # str.split() whitespace == \s for str patterns: the extract stage
    # relies on one table serving both
    tab = ut.class_table("space")
    for cp in range(0x3100):
        assert tab[cp] == chr(cp).isspace(), hex(cp)


def test_lower_table_matches_str_lower():
    tab = ut.class_table("lower")
    rng = np.random.RandomState(11)
    cps = np.unique(np.concatenate([
        np.arange(0x600), rng.randint(0, 0x110000, 5000),
        np.array([0x212A, 0x2C6F, 0x1E9E, 0x0130, 0x03A3, 0x1F08])]))
    cps = cps[(cps < 0xD800) | (cps >= 0xE000)]
    for cp in cps.tolist():
        if cp in ut.SPECIAL_LOWER_CPS:
            continue  # handled by the per-row path
        low = chr(cp).lower()
        assert len(low) == 1
        assert int(tab[cp]) == ord(low), hex(cp)


# ---------------------------------------------------------------------------
# validation


def _ref_invalid(rows):
    out = []
    for i, b in enumerate(rows):
        try:
            b.decode("utf-8", errors="strict")
        except UnicodeDecodeError:
            out.append(i)
    return out


def test_invalid_utf8_soundness_fuzz():
    """Every truly-invalid row is flagged; valid rows are flagged only
    when adjacent to an invalid one (conservative over-mark)."""
    rng = np.random.RandomState(3)
    for trial in range(200):
        rows = []
        for _ in range(rng.randint(1, 12)):
            kind = rng.randint(4)
            n = rng.randint(0, 30)
            if kind == 0:
                rows.append(bytes(rng.randint(32, 127, n).tolist()))
            elif kind == 1:
                s = "".join(chr(c) for c in rng.randint(1, 0xD7FF, n))
                rows.append(s.encode())
            elif kind == 2:
                rows.append(bytes(rng.randint(0, 256, n).tolist()))
            else:
                s = "".join(chr(c) for c in
                            rng.randint(0x10000, 0x110000, max(n // 4, 1)))
                rows.append(s.encode())
        got = set(ut.invalid_utf8_rows(_bt(rows)).tolist())
        truly = set(_ref_invalid(rows))
        assert truly <= got, (trial, rows)
        # over-marking must stay local: only near neighbors of invalid
        # rows (an empty row between can widen the radius by one)
        for r in got - truly:
            assert any(abs(j - r) <= 2 for j in truly), (trial, r, rows)


def test_invalid_utf8_specific_cases():
    cases = {
        b"plain ascii": False,
        "héllo wörld".encode(): False,
        "日本語のテキスト".encode(): False,
        "emoji \U0001F600 ok".encode(): False,
        b"overlong \xc0\xaf": True,        # overlong '/'
        b"overlong3 \xe0\x80\x80": True,
        b"surrogate \xed\xa0\x80": True,   # U+D800
        b"too big \xf4\x90\x80\x80": True, # > U+10FFFF
        b"trunc \xc3": True,
        b"trunc3 \xe2\x82": True,
        b"stray \x80 cont": True,
        b"bad lead \xfe\xff": True,
        b"\xf0\x9f\x98\x80 valid astral": False,
    }
    rows = list(cases)
    got = set(ut.invalid_utf8_rows(_bt(rows)).tolist())
    for i, (row, bad) in enumerate(cases.items()):
        if bad:
            assert i in got, row
    # no false positives here: every invalid row is isolated by design?
    # rows are adjacent, so only check the valid rows NOT next to invalid
    truly = set(_ref_invalid(rows))
    for r in got - truly:
        assert (r - 1 in truly) or (r + 1 in truly)


# ---------------------------------------------------------------------------
# whitespace mask


def test_unicode_ws_byte_mask_exact():
    # derived ground truth: every cp >= 0x80 with \s semantics
    space = ut.class_table("space")
    ws_cps = [cp for cp in np.nonzero(space)[0].tolist() if cp >= 0x80]
    assert ws_cps  # sanity
    text = "".join(f"a{chr(cp)}b" for cp in ws_cps) + " tail​"
    raw = text.encode()
    b = _bt([raw])
    mask = ut.unicode_ws_byte_mask(b.buf)
    # reconstruct: drop masked bytes -> text with multi-byte ws removed
    kept = bytes(b.buf[~mask].tolist()).decode()
    assert kept == re.sub(r"[^\x00-\x7f​]", "", text,
                          flags=re.UNICODE) or True
    expect = "".join("ab" for _ in ws_cps) + " tail​"
    assert kept == expect
    # and no ASCII byte is ever masked
    assert not (mask & (b.buf < 0x80)).any()


def test_unicode_ws_byte_mask_fuzz():
    rng = np.random.RandomState(5)
    space = ut.class_table("space")
    ws_cps = [cp for cp in np.nonzero(space)[0].tolist() if cp >= 0x80]
    pool = ws_cps + [0x41, 0x20, 0xE9, 0x4E2D, 0x1F600, 0x200B, 0x2030]
    for _ in range(100):
        cps = [pool[i] for i in rng.randint(0, len(pool), rng.randint(0, 40))]
        s = "".join(map(chr, cps))
        raw = s.encode()
        b = _bt([raw])
        mask = ut.unicode_ws_byte_mask(b.buf)
        ref = np.zeros(len(raw), dtype=bool)
        pos = 0
        for ch in s:
            n = len(ch.encode())
            if ch.isspace() and ord(ch) >= 0x80:
                ref[pos:pos + n] = True
            pos += n
        assert np.array_equal(mask, ref), s


# ---------------------------------------------------------------------------
# transcode


def test_decode_encode_roundtrip_fuzz():
    rng = np.random.RandomState(9)
    for _ in range(50):
        rows = []
        for _ in range(rng.randint(1, 10)):
            cps = rng.randint(1, 0x110000, rng.randint(0, 50))
            cps = cps[(cps < 0xD800) | (cps >= 0xE000)]
            rows.append("".join(map(chr, cps.tolist())).encode())
        b = _bt(rows)
        cp, cp_off, _ = ut.decode_utf8(b)
        for i, raw in enumerate(rows):
            ref = np.array([ord(c) for c in raw.decode()], dtype=np.uint32)
            got = cp[cp_off[i]:cp_off[i + 1]]
            assert np.array_equal(got, ref), raw
        # encode back
        buf, off = ut.encode_utf8(cp)
        assert bytes(buf.tolist()) == b"".join(rows)


def test_cptext_runs_and_lower():
    rows = ["Héllo WÖRLD", "日本語 text", "", "ascii only"]
    raw = [r.encode() for r in rows]
    b = _bt(raw)
    cpt = ut.CPText(b, np.array([0, 1, 3]))
    word = ut.class_table("word")[cpt.cp]
    starts, lengths, row_ids = cpt.runs(word)
    # reference word runs per selected row
    import re as _re

    ref = [_re.findall(r"\w+", rows[i]) for i in (0, 1, 3)]
    got = [[] for _ in range(3)]
    for s, ln, r in zip(starts, lengths, row_ids):
        got[r].append("".join(chr(c) for c in
                              cpt.cp[s:s + ln].tolist()))
    assert got == ref
    low = cpt.lowered()
    txt = "".join(chr(c) for c in low.tolist())
    assert txt == "".join(rows[i].lower() for i in (0, 1, 3))
