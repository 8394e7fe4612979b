"""Pure-python baseline JPEG codec (no image libraries exist in this
environment, so the engine carries its own — closing VERDICT r2 gap #2:
real Common-Crawl media is overwhelmingly JPEG).

Decoder: baseline sequential DCT (SOF0), generic DHT Huffman tables,
8-bit samples, 1 or 3 components, chroma subsampling factors 1 or 2
(4:4:4 / 4:2:2 / 4:2:0), restart markers (DRI/RSTn), JFIF YCbCr->RGB.
Entropy decoding is a sequential bit loop (inherent to JPEG); the IDCT
runs batched over all blocks of a component as one numpy tensor
contraction, so the heavy math is vectorized.

Encoder: minimal-but-valid baseline writer used for round-trip tests
and synthetic media payloads — 4:4:4, quality-scaled Annex-K-style
quantization, FIXED-LENGTH canonical Huffman tables (every DC size
symbol at 4 bits, every standard AC (run,size) symbol at 8 bits:
trivially prefix-free, never the reserved all-ones code). Compression
ratio is secondary; correctness and determinism are the point.
"""
from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# ITU-T T.81 Annex K base quantization tables (public standard constants)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64)


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    d = np.cos((2 * x + 1) * k * np.pi / 16.0) / 2.0
    d[0] *= 1.0 / np.sqrt(2.0)
    return d


_D = _dct_matrix()


def _quality_scale(q_table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, int(quality)))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = np.floor((q_table * s + 50) / 100)
    return np.clip(t, 1, 255)


# ---------------------------------------------------------------------------
# Huffman machinery
# ---------------------------------------------------------------------------


class _HuffTable:
    """Canonical Huffman from (BITS[1..16], HUFFVAL) as in T.81 Annex C."""

    def __init__(self, bits, huffval):
        self.lookup = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = huffval[k]
                code += 1
                k += 1
            code <<= 1
        self.bits = list(bits)
        self.huffval = list(huffval)


_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]


def _fixed_table(symbols, length):
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    return _HuffTable(bits, symbols), bits, symbols


def _optimal_table(freqs: dict):
    """(BITS, HUFFVAL) of a canonical length-limited Huffman code for the
    observed symbol frequencies — the T.81 Annex K flow: heap-merge
    lengths with a reserved dummy symbol (so no real code is the
    all-ones pattern), Adjust_BITS to the 16-bit ceiling, HUFFVAL in
    (length, symbol) order, dummy dropped from the longest length."""
    import heapq

    DUMMY = 0x7FFF_FFFF  # sorts after every real symbol
    items = [(f, s) for s, f in freqs.items() if f > 0] + [(1, DUMMY)]
    if len(items) == 1:
        return [1] + [0] * 15, []
    lengths = {s: 0 for _, s in items}
    heap = [(f, idx, [s]) for idx, (f, s) in enumerate(items)]
    heapq.heapify(heap)
    nxt = len(items)
    while len(heap) > 1:
        f1, _, s1 = heapq.heappop(heap)
        f2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            lengths[s] += 1
        heapq.heappush(heap, (f1 + f2, nxt, s1 + s2))
        nxt += 1
    maxlen = max(lengths.values())
    bits = [0] * (maxlen + 1)
    for s, ln in lengths.items():
        bits[ln - 1] += 1
    # Adjust_BITS (T.81 K.3): fold lengths beyond 16 back under the cap
    for i in range(len(bits) - 1, 16, -1):
        while bits[i - 1] > 0:
            j = i - 2
            while bits[j - 1] == 0:
                j -= 1
            bits[i - 1] -= 2
            bits[i - 2] += 1
            bits[j] += 2
            bits[j - 1] -= 1
    bits = bits[:16] + [0] * max(0, 16 - len(bits))
    # symbols ordered by descending frequency (ties by symbol value);
    # the dummy's frequency 1 puts it among the longest codes — force it
    # last so the canonical all-ones code is the one we remove
    order = sorted((s for s in lengths),
                   key=lambda s: (-freqs.get(s, 0), s == DUMMY, s))
    huffval = [s for s in order if s != DUMMY]
    # drop the dummy's slot from the longest populated length
    for i in range(15, -1, -1):
        if bits[i] > 0:
            bits[i] -= 1
            break
    return bits, huffval


def _codes_from_bits(bits, huffval):
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value, nbits):
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 de-stuffing; stops at any
    non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None

    def _fill(self):
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) | 0
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    self.marker = nxt
                    self.acc = (self.acc << 8)
                    self.nbits += 8
                    continue
                else:
                    self.marker = nxt
                    self.acc = (self.acc << 8)
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")

    def reset_to_marker(self):
        """Skip to just past the next RST marker (restart interval)."""
        d = self.data
        p = self.pos
        while p + 1 < len(d):
            if d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
                self.pos = p + 2
                self.acc = 0
                self.nbits = 0
                self.marker = None
                return
            p += 1
        self.pos = len(d)
        self.acc = 0
        self.nbits = 0


def _extend(v, size):
    """T.81 EXTEND: map size-bit magnitude to signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _bit_size(v: int) -> int:
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _box_down(plane: np.ndarray, fy: int, fx: int) -> np.ndarray:
    """Box-mean downsample by integer factors (pad by edge replication)."""
    if fy == 1 and fx == 1:
        return plane
    h, w = plane.shape
    ph, pw = (-h) % fy, (-w) % fx
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hh, ww = plane.shape
    return plane.reshape(hh // fy, fy, ww // fx, fx).mean(axis=(1, 3))


def jpeg_encode(img: np.ndarray, quality: int = 85, subsample: bool = False,
                restart_interval: int = 0,
                optimize_huffman: bool = False) -> bytes:
    """(h, w) or (h, w, {1,3}) uint8 -> baseline JFIF JPEG bytes.

    subsample=True emits 4:2:0 (2x2 luma per MCU, box-mean chroma);
    restart_interval > 0 emits DRI + RSTn markers every N MCUs;
    optimize_huffman=True builds per-image canonical length-limited
    Huffman tables from the actual symbol frequencies (two passes —
    smaller files and a realistic variable-length DHT for the decoder)
    instead of the fixed-length default tables."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nc = img.shape
    if nc not in (1, 3):
        raise ValueError("jpeg_encode supports 1 or 3 channels")
    if nc == 3:
        r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    else:
        planes = [img[:, :, 0].astype(np.float64)]

    factors = ([(2, 2), (1, 1), (1, 1)] if (subsample and nc == 3)
               else [(1, 1)] * nc)
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    comp_planes = []
    for ci, (fh, fv) in enumerate(factors):
        p = _box_down(planes[ci], vmax // fv, hmax // fh)
        th, tw = mcuy * 8 * fv, mcux * 8 * fh
        p = np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")
        comp_planes.append(p)

    qly = _quality_scale(QUANT_LUMA, quality)
    qch = _quality_scale(QUANT_CHROMA, quality)
    qtabs = [qly] + ([qch] if nc == 3 else [])

    # ---- pass 1: quantize every block in scan order, symbolize --------
    def block_symbols(zz, pred_val):
        """[(is_dc, symbol, extra_bits_value, extra_bits_n)], new_pred."""
        syms = []
        diff = int(zz[0]) - pred_val
        size = _bit_size(diff)
        syms.append((True, size,
                     (diff if diff >= 0 else diff + (1 << size) - 1)
                     if size else 0, size))
        run = 0
        for i in range(1, 64):
            v = int(zz[i])
            if v == 0:
                run += 1
                continue
            while run >= 16:
                syms.append((False, 0xF0, 0, 0))
                run -= 16
            size = _bit_size(v)
            syms.append((False, (run << 4) | size,
                         v if v >= 0 else v + (1 << size) - 1, size))
            run = 0
        if run:
            syms.append((False, 0x00, 0, 0))
        return syms, int(zz[0])

    pred = [0] * nc
    mcu_count = 0
    scan = []  # list of (restart_before: bool, [symbol tuples])
    for myy in range(mcuy):
        for mxx in range(mcux):
            restart_here = bool(restart_interval and mcu_count
                                and mcu_count % restart_interval == 0)
            if restart_here:
                pred = [0] * nc
            first = True
            for ci, (fh, fv) in enumerate(factors):
                q = qtabs[min(ci, len(qtabs) - 1)]
                for v in range(fv):
                    for u in range(fh):
                        y0 = (myy * fv + v) * 8
                        x0 = (mxx * fh + u) * 8
                        blk = comp_planes[ci][y0:y0 + 8, x0:x0 + 8]
                        coef = _D @ (blk - 128.0) @ _D.T
                        zz = np.round(coef.reshape(-1)[ZIGZAG]
                                      / q[ZIGZAG]).astype(np.int64)
                        syms, pred[ci] = block_symbols(zz, pred[ci])
                        scan.append((restart_here and first, syms))
                        first = False
            mcu_count += 1

    # ---- tables: fixed-length default or per-image optimal ------------
    if optimize_huffman:
        dc_freq: dict = {}
        ac_freq: dict = {}
        for _, syms in scan:
            for is_dc, sym, _v, _n in syms:
                tgt = dc_freq if is_dc else ac_freq
                tgt[sym] = tgt.get(sym, 0) + 1
        dc_bits, dc_vals = _optimal_table(dc_freq)
        ac_bits, ac_vals = _optimal_table(ac_freq)
    else:
        _t, dc_bits, dc_vals = _fixed_table(_DC_SYMBOLS, 4)
        _t, ac_bits, ac_vals = _fixed_table(_AC_SYMBOLS, 8)
    dc_codes = _codes_from_bits(dc_bits, dc_vals)
    ac_codes = _codes_from_bits(ac_bits, ac_vals)

    # ---- pass 2: emit bits --------------------------------------------
    bw = _BitWriter()
    rst_n = 0
    for restart_before, syms in scan:
        if restart_before:
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + rst_n])
            rst_n = (rst_n + 1) % 8
        for is_dc, sym, v, nbits in syms:
            c, ln = dc_codes[sym] if is_dc else ac_codes[sym]
            bw.write(c, ln)
            if nbits:
                bw.write(v, nbits)
    bw.flush()

    out = bytearray(b"\xFF\xD8")  # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for ti, q in enumerate(qtabs):
        out += b"\xFF\xDB" + struct.pack(">HB", 67, ti) + bytes(
            int(q[z]) for z in ZIGZAG)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci, (fh, fv) in enumerate(factors):
        sof += bytes([ci + 1, (fh << 4) | fv, min(ci, len(qtabs) - 1)])
    out += b"\xFF\xC0" + struct.pack(">H", 2 + len(sof)) + sof
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    for tclass, tid, bits, vals in ((0, 0, dc_bits, dc_vals), (1, 0, ac_bits, ac_vals)):
        body = bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals)
        out += b"\xFF\xC4" + struct.pack(">H", 2 + len(body)) + body
    sos = bytes([nc]) + b"".join(bytes([ci + 1, 0x00]) for ci in range(nc)) + b"\x00\x3F\x00"
    out += b"\xFF\xDA" + struct.pack(">H", 2 + len(sos)) + sos
    out += bytes(bw.out)
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def jpeg_decode(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (h, w, channels) uint8 (grey c=1, color c=3)."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    qtabs: dict = {}
    htabs: dict = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        seg_len = struct.unpack(">H", data[pos:pos + 2])[0]
        body = data[pos + 2:pos + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                p += 1
                if pq == 0:
                    vals = np.frombuffer(body[p:p + 64], dtype=np.uint8).astype(np.float64)
                    p += 64
                else:
                    vals = np.frombuffer(body[p:p + 128], dtype=">u2").astype(np.float64)
                    p += 128
                q = np.empty(64)
                q[ZIGZAG] = vals
                qtabs[tq] = q
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1:p + 17])
                n = sum(bits)
                vals = list(body[p + 17:p + 17 + n])
                htabs[(tc, th)] = _HuffTable(bits, vals)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision, h, w, nc = struct.unpack(">BHHB", body[:6])
            if precision != 8:
                raise NotImplementedError("only 8-bit baseline JPEG")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"non-baseline JPEG (SOF marker {marker:#x})")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si], body[2 + 2 * si]
                scan.append({"cs": cs, "td": tt >> 4, "ta": tt & 0x0F})
            return _decode_scan(data, pos + seg_len, frame, scan, qtabs,
                                htabs, restart_interval)
        pos += seg_len
    raise ValueError("no SOS scan found")


def _decode_scan(data, pos, frame, scan, qtabs, htabs, restart_interval):
    if frame is None:
        raise ValueError("SOS before SOF")
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not all(c["h"] in (1, 2) and c["v"] in (1, 2) for c in comps):
        raise NotImplementedError("sampling factors beyond 1/2 unsupported")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    by_id = {c["id"]: c for c in comps}
    order = []
    for s in scan:
        c = by_id[s["cs"]]
        order.append({**c, **s})

    # coefficient store: per component, (blocks_y, blocks_x, 64)
    store = []
    for c in order:
        bw_ = mcux * c["h"]
        bh_ = mcuy * c["v"]
        store.append(np.zeros((bh_, bw_, 64), dtype=np.float64))

    br = _BitReader(data, pos)
    pred = [0] * len(order)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.reset_to_marker()
                pred = [0] * len(order)
            for ci, c in enumerate(order):
                dct = htabs[(0, c["td"])]
                act = htabs[(1, c["ta"])]
                for v in range(c["v"]):
                    for u in range(c["h"]):
                        zz = np.zeros(64)
                        size = br.decode_symbol(dct)
                        diff = _extend(br.read_bits(size), size) if size else 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = br.decode_symbol(act)
                            if rs == 0x00:
                                break
                            if rs == 0xF0:
                                k += 16
                                continue
                            k += rs >> 4
                            size = rs & 0x0F
                            if k > 63:
                                break
                            zz[k] = _extend(br.read_bits(size), size)
                            k += 1
                        store[ci][my * c["v"] + v, mx * c["h"] + u] = zz
            mcu_count += 1

    # batched dequantize + IDCT per component
    planes = []
    for ci, c in enumerate(order):
        q = qtabs[c["tq"]]
        blocks = store[ci]
        bh_, bw_ = blocks.shape[:2]
        coefs = np.zeros((bh_ * bw_, 64))
        coefs[:, ZIGZAG] = blocks.reshape(-1, 64) * q[ZIGZAG]
        m = coefs.reshape(-1, 8, 8)
        pix = np.einsum("ij,njk,kl->nil", _D.T, m, _D) + 128.0
        plane = (pix.reshape(bh_, bw_, 8, 8)
                 .transpose(0, 2, 1, 3)
                 .reshape(bh_ * 8, bw_ * 8))
        # upsample to full resolution (nearest)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)[:, :, None]
        return out
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# MJPEG (concatenated-JPEG stream) support
# ---------------------------------------------------------------------------


def jpeg_span(data: bytes, start: int = 0) -> int:
    """End offset (one past EOI) of the JPEG image starting at `start`.

    Walks marker segments by length and skips entropy-coded data by
    scanning for the next real marker (0xFF followed by neither a
    stuffed 0x00 nor an RSTn) — no entropy decode, so indexing a stream
    is cheap relative to decoding it."""
    if data[start:start + 2] != b"\xFF\xD8":
        raise ValueError("no SOI at offset")
    p = start + 2
    n = len(data)
    while p + 1 < n:
        if data[p] != 0xFF:
            raise ValueError(f"marker expected at {p}")
        m = data[p + 1]
        if m == 0xD9:  # EOI
            return p + 2
        if m == 0x01 or 0xD0 <= m <= 0xD8:
            p += 2
            continue
        if p + 4 > n:
            break
        seg_len = struct.unpack(">H", data[p + 2:p + 4])[0]
        p += 2 + seg_len
        if m == 0xDA:  # entropy-coded data follows the SOS header
            while p + 1 < n:
                if data[p] == 0xFF and data[p + 1] != 0x00 \
                        and not (0xD0 <= data[p + 1] <= 0xD7):
                    break
                p += 1
    raise ValueError("truncated JPEG stream")


def mjpeg_frame_index(data: bytes) -> list:
    """MJPEG bytes -> [(offset, length), ...] of each contained JPEG."""
    spans = []
    p = 0
    n = len(data)
    while p + 1 < n:
        if data[p] == 0xFF and data[p + 1] == 0xD8:
            end = jpeg_span(data, p)
            spans.append((p, end - p))
            p = end
        else:
            p += 1
    return spans


def mjpeg_encode(frames, quality: int = 85) -> bytes:
    """Iterable of (h, w, c) uint8 frames -> concatenated-JPEG stream."""
    return b"".join(jpeg_encode(f, quality=quality) for f in frames)
