"""Batched numpy SHA-256 parity against hashlib (the oracle rule both
must reproduce: int(sha256(f"{salt}:{k}").hexdigest()[:16], 16))."""
import hashlib

import numpy as np
import pytest

from simplefeatures_ray.functions._sha256 import (digests_hex_prefix,
                                                  sha256_batch_short,
                                                  sha256_mod100_int_keys,
                                                  sha256_u64_int_keys)


def test_digest_parity_random_messages():
    rng = np.random.default_rng(1)
    msgs = [bytes(rng.integers(0, 256, int(rng.integers(0, 56)))
                  .astype(np.uint8)) for _ in range(300)]
    msgs += [b"", b"a", b"x" * 55]
    dig = sha256_batch_short(msgs)
    for i, m in enumerate(msgs):
        assert bytes(dig[i]) == hashlib.sha256(m).digest(), (i, m)


def test_message_too_long_rejected():
    with pytest.raises(ValueError):
        sha256_batch_short([b"y" * 56])


@pytest.mark.parametrize("salt", ["split", "sample", "s"])
def test_int_key_rules(salt):
    keys = np.concatenate([
        np.array([0, 1, -1, 9, 10, 99, 100, 12345, -987654321,
                  2 ** 62, -(2 ** 62)], dtype=np.int64),
        np.random.default_rng(7).integers(-2 ** 60, 2 ** 60, 500),
    ])
    m100 = sha256_mod100_int_keys(salt, keys)
    u64 = sha256_u64_int_keys(salt, keys)
    for k, a, b in zip(keys, m100, u64):
        want = int(hashlib.sha256(f"{salt}:{k}".encode())
                   .hexdigest()[:16], 16)
        assert int(b) == want, k
        assert int(a) == want % 100, k


def test_hex_prefix():
    msgs = [f"doc{i}".encode() for i in range(64)]
    dig = sha256_batch_short(msgs)
    arr = digests_hex_prefix(dig, 8)
    for i, m in enumerate(msgs):
        assert arr[i].as_py() == hashlib.sha256(m).hexdigest()[:16]
