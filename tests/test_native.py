"""Native C++ host-crypto library vs the Python reference implementations."""

import hashlib

import numpy as np
import pytest

from secp256k1_tpu import native
from secp256k1_tpu.models.rfc6979 import DrbgRFC6979
from secp256k1_tpu.models.schnorr import tagged_hash

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_sha256_batch():
    msgs = np.frombuffer(b"".join(bytes([i]) * 40 for i in range(8)),
                         dtype=np.uint8).reshape(8, 40)
    got = native.sha256_batch(msgs)
    for i in range(8):
        assert got[i].tobytes() == hashlib.sha256(msgs[i].tobytes()).digest()


def test_rfc6979_batch_matches_python():
    rng = np.random.default_rng(5)
    keys = rng.integers(0, 256, (6, 32), dtype=np.uint8)
    digs = rng.integers(0, 256, (6, 32), dtype=np.uint8)
    out, sv, sk = native.rfc6979_nonce_batch(keys, digs)
    for i in range(6):
        d = DrbgRFC6979(keys[i].tobytes(), digs[i].tobytes())
        assert out[i].tobytes() == d.read(32)
        # two continuation reads exercise the state machine
        assert native.rfc6979_continue(sv, sk, i).tobytes() == d.read(32)
        assert native.rfc6979_continue(sv, sk, i).tobytes() == d.read(32)


def test_tagged_hash_batch():
    rng = np.random.default_rng(6)
    p1 = rng.integers(0, 256, (5, 32), dtype=np.uint8)
    p2 = rng.integers(0, 256, (5, 32), dtype=np.uint8)
    got = native.tagged_hash_batch(b"BIP0340/nonce", p1, p2, None, 5)
    for i in range(5):
        assert got[i].tobytes() == tagged_hash(
            "BIP0340/nonce", p1[i].tobytes(), p2[i].tobytes())


def test_native_sign_path_matches_python_drbg():
    """sign_batch with RFC6979 sentinel must give identical sigs whether the
    native DRBG or the Python DRBG derives the nonces."""
    from secp256k1_tpu.models import ecdsa, keys
    from secp256k1_tpu.models.rfc6979 import RFC6979SHA256

    privs = [keys.PrivateKey(i + 1) for i in range(3)]
    digests = [hashlib.sha256(bytes([i])).digest() for i in range(3)]
    native_sigs = ecdsa.sign_batch(privs, digests, rand=RFC6979SHA256())
    # Force the Python path by monkeypatching availability.
    import secp256k1_tpu.native as nat
    orig = nat.available
    try:
        nat.available = lambda: False
        python_sigs = ecdsa.sign_batch(privs, digests, rand=RFC6979SHA256())
    finally:
        nat.available = orig
    assert native_sigs == python_sigs
