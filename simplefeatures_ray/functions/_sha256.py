"""Batched SHA-256 in numpy for the deterministic-hash kernels.

The split/sample/fingerprint operators derive per-row buckets from
sha256 of short keys ("salt:key") so a SQL oracle can recompute them —
but hashlib forces a Python call per row on corpus-wide paths. Messages
up to 55 bytes fit one SHA-256 block, so the whole batch compresses as
64 rounds of uint32 vector ops over an (n, 16) schedule: one numpy pass
instead of n hashlib calls. Longer messages fall back to hashlib
(identical digests — SHA-256 is SHA-256; parity is pinned against
hashlib in tests/test_sha256_batch.py).

FIPS 180-4 public constants and round functions.
"""
from __future__ import annotations

import numpy as np

_K = np.array([
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5,
    0x3956c25b, 0x59f111f1, 0x923f82a4, 0xab1c5ed5,
    0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174,
    0xe49b69c1, 0xefbe4786, 0x0fc19dc6, 0x240ca1cc,
    0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7,
    0xc6e00bf3, 0xd5a79147, 0x06ca6351, 0x14292967,
    0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85,
    0xa2bfe8a1, 0xa81a664b, 0xc24b8b70, 0xc76c51a3,
    0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5,
    0x391c0cb3, 0x4ed8aa4a, 0x5b9cca4f, 0x682e6ff3,
    0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2,
], dtype=np.uint32)

_H0 = np.array([
    0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
    0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19,
], dtype=np.uint32)


def _rotr(x: np.ndarray, r: int) -> np.ndarray:
    return (x >> np.uint32(r)) | (x << np.uint32(32 - r))


def sha256_single_block(blocks: np.ndarray) -> np.ndarray:
    """(n, 64) uint8 padded single blocks -> (n, 32) uint8 digests."""
    n = len(blocks)
    w = np.zeros((n, 64), dtype=np.uint32)
    # big-endian 32-bit words
    b = blocks.reshape(n, 16, 4).astype(np.uint32)
    w[:, :16] = ((b[:, :, 0] << 24) | (b[:, :, 1] << 16)
                 | (b[:, :, 2] << 8) | b[:, :, 3])
    with np.errstate(over="ignore"):
        for t in range(16, 64):
            s0 = (_rotr(w[:, t - 15], 7) ^ _rotr(w[:, t - 15], 18)
                  ^ (w[:, t - 15] >> np.uint32(3)))
            s1 = (_rotr(w[:, t - 2], 17) ^ _rotr(w[:, t - 2], 19)
                  ^ (w[:, t - 2] >> np.uint32(10)))
            w[:, t] = w[:, t - 16] + s0 + w[:, t - 7] + s1
        a, bb, c, d, e, f, g, h = (np.broadcast_to(_H0[i], n).copy()
                                   for i in range(8))
        for t in range(64):
            S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
            ch = (e & f) ^ (~e & g)
            t1 = h + S1 + ch + _K[t] + w[:, t]
            S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
            maj = (a & bb) ^ (a & c) ^ (bb & c)
            t2 = S0 + maj
            h, g, f, e, d, c, bb, a = g, f, e, d + t1, c, bb, a, t1 + t2
        out_words = np.stack([a + _H0[0], bb + _H0[1], c + _H0[2],
                              d + _H0[3], e + _H0[4], f + _H0[5],
                              g + _H0[6], h + _H0[7]], axis=1)
    dig = np.zeros((n, 32), dtype=np.uint8)
    for i in range(4):
        dig[:, i::4] = ((out_words >> np.uint32(24 - 8 * i))
                        & np.uint32(0xFF)).astype(np.uint8)
    return dig


def _pad_blocks(msgs: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """(n, <=55)-byte message matrix + lengths -> (n, 64) padded blocks."""
    n, width = msgs.shape
    blocks = np.zeros((n, 64), dtype=np.uint8)
    blocks[:, :width] = msgs
    # zero bytes beyond each message's length, set the 0x80 terminator
    cols = np.arange(width)
    blocks[:, :width] = np.where(cols[None, :] < lengths[:, None],
                                 blocks[:, :width], 0)
    blocks[np.arange(n), lengths] = 0x80
    bitlen = lengths.astype(np.uint64) * 8
    for i in range(8):
        blocks[:, 63 - i] = ((bitlen >> np.uint64(8 * i))
                             & np.uint64(0xFF)).astype(np.uint8)
    return blocks


def sha256_batch_short(messages) -> np.ndarray:
    """bytes-like messages (each <= 55 bytes) -> (n, 32) uint8 digests.
    Accepts a list of bytes or an (msgs_matrix, lengths) pair."""
    if isinstance(messages, tuple):
        msgs, lengths = messages
    else:
        lengths = np.array([len(m) for m in messages], dtype=np.int64)
        width = max(1, int(lengths.max()) if len(lengths) else 1)
        msgs = np.zeros((len(messages), width), dtype=np.uint8)
        for i, m in enumerate(messages):
            msgs[i, : len(m)] = np.frombuffer(m, dtype=np.uint8)
    if msgs.shape[1] > 55 or (len(lengths) and int(lengths.max()) > 55):
        raise ValueError("sha256_batch_short handles <= 55-byte messages")
    return sha256_single_block(_pad_blocks(msgs, lengths))


def _int_key_messages(prefix: bytes, keys: np.ndarray):
    """(msgs, lengths) for b'prefix' + decimal(keys) — vectorized
    decimal rendering (no per-row formatting)."""
    keys = keys.astype(np.int64)
    neg = keys < 0
    mag = np.abs(keys).astype(np.uint64)
    # 20 digits covers uint64
    digits = np.zeros((len(keys), 20), dtype=np.uint8)
    x = mag.copy()
    for j in range(19, -1, -1):
        digits[:, j] = (x % 10).astype(np.uint8) + 48
        x //= 10
    first_sig = np.argmax(digits != 48, axis=1)
    all_zero = ~np.any(digits != 48, axis=1)
    first_sig = np.where(all_zero, 19, first_sig)
    ndig = 20 - first_sig
    p = len(prefix)
    width = p + 1 + 20
    msgs = np.zeros((len(keys), width), dtype=np.uint8)
    msgs[:, :p] = np.frombuffer(prefix, dtype=np.uint8)
    lengths = p + ndig + neg.astype(np.int64)
    # write sign + digits right after the prefix
    for j in range(20):
        src_col = first_sig + j
        valid = src_col < 20
        dst = p + neg.astype(np.int64) + j
        rows = np.flatnonzero(valid)
        msgs[rows, dst[rows]] = digits[rows, src_col[rows]]
    msgs[neg, p] = 45  # '-'
    return msgs, lengths


def sha256_mod100_int_keys(salt: str, keys: np.ndarray) -> np.ndarray:
    """Vectorized twin of
    int(sha256(f"{salt}:{k}").hexdigest()[:16], 16) % 100 —
    the deterministic bucket rule of hash_split / stratified_sample."""
    msgs, lengths = _int_key_messages(f"{salt}:".encode(), keys)
    dig = sha256_single_block(_pad_blocks(msgs, lengths))
    hi = np.zeros(len(keys), dtype=np.uint64)
    for i in range(8):
        hi = (hi << np.uint64(8)) | dig[:, i].astype(np.uint64)
    return (hi % np.uint64(100)).astype(np.int64)


_HEX = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)


def digests_hex_prefix(dig: np.ndarray, n_bytes: int = 8) -> "object":
    """(n, 32) digests -> Arrow string array of the first n_bytes as
    lowercase hex (the fp_sha / hexdigest()[:2*n_bytes] rule), built
    straight from buffers — no per-row formatting."""
    import pyarrow as pa

    n = len(dig)
    chars = np.zeros((n, 2 * n_bytes), dtype=np.uint8)
    chars[:, 0::2] = _HEX[dig[:, :n_bytes] >> 4]
    chars[:, 1::2] = _HEX[dig[:, :n_bytes] & 0x0F]
    offsets = np.arange(0, (n + 1) * 2 * n_bytes, 2 * n_bytes,
                        dtype=np.int32)
    return pa.Array.from_buffers(
        pa.string(), n,
        [None, pa.py_buffer(offsets.tobytes()),
         pa.py_buffer(chars.tobytes())])


def sha256_u64_int_keys(salt: str, keys: np.ndarray) -> np.ndarray:
    """Vectorized int(sha256(f"{salt}:{k}").hexdigest()[:16], 16) —
    the full big-endian first-8-bytes value (uint64)."""
    msgs, lengths = _int_key_messages(f"{salt}:".encode(), keys)
    dig = sha256_single_block(_pad_blocks(msgs, lengths))
    hi = np.zeros(len(keys), dtype=np.uint64)
    for i in range(8):
        hi = (hi << np.uint64(8)) | dig[:, i].astype(np.uint64)
    return hi
